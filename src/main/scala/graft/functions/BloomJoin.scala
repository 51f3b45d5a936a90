package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column wrappers over Spark's internal bloom-filter sketch pair
  * (`BloomFilterAggregate` / `BloomFilterMightContain`) — the exact
  * machinery Catalyst's runtime row-level filtering injects when
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` fires, exposed as
  * an EXPLICIT operator so a pipeline can pre-filter a huge probe side
  * before its shuffle even when the optimizer can't see the join (e.g.
  * the selective side arrives from a different job).
  *
  * Usage shape (kept one lazy plan — the sketch is a 1-row DataFrame
  * crossJoin(broadcast(...))'d into the probe, never collected):
  * bloom prune (no false negatives) → exact join to drop the false
  * positives. At 100 TB the win is shuffle bytes: the fact table is cut
  * to ~selectivity·|fact| BEFORE the exchange, for one broadcast of
  * `numBits/8` bytes.
  */
object BloomJoin {

  /** Aggregate a bloom sketch over `xxhash64`-hashed keys (LongType). */
  def bloomAgg(hashedKey: Column, estItems: Long, numBits: Long): Column =
    GraftShim.toColumn(new BloomFilterAggregate(
      GraftShim.toExpression(hashedKey),
      Literal(estItems), Literal(numBits), 0, 0).toAggregateExpression())

  /** Membership probe. `might_contain` requires its sketch side to be a
    * constant or a SCALAR SUBQUERY (never a joined attribute), so the
    * 1-row sketch DataFrame is embedded as a subquery — Catalyst plans
    * it as a ReusedSubquery broadcast, evaluated once per stage, which
    * is exactly the runtime-filter shape. NULL sketch or NULL key
    * yields NULL (kept by neither filter nor join, matching semi-join
    * null semantics). */
  def mightContain(bloomDf: DataFrame, hashedKey: Column): Column =
    GraftShim.toColumn(BloomFilterMightContain(
      ScalarSubquery(bloomDf.queryExecution.logical),
      GraftShim.toExpression(hashedKey)))
}
