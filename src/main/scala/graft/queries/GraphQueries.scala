package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryUtil._

/** Graph analytics over the TPC-H-ish relations — SURVEY.md §2.2 [E]
  * "analytics" extensions beyond the connected-components operator
  * (`graft.operators.DedupClusters`): a fixed-iteration PageRank.
  *
  * The graph is the undirected customer↔supplier trade graph derived
  * from lineitem⋈orders (distinct pairs; node ids prefixed `c`/`s` so
  * the two key spaces cannot collide).
  *
  * Determinism contract: ranks are FIXED-POINT BIGINT micro-units
  * (1e6 = 1.0) and every step is integer arithmetic — floor division
  * for the per-edge share (`DIV` here, `//` in DuckDB) and for the 0.85
  * damping — so partial-aggregation order cannot perturb a single bit
  * and the DuckDB twin unrolls the same three iterations exactly.
  * Dangling mass is dropped (the standard simplification; every node
  * still receives the 0.15 base).
  *
  * Scale shape (100 TB): per iteration one shuffle — contributions
  * grouped by destination (map-side partial sums over BIGINTs) — plus a
  * join of ranks to edges on the source key. Edges/outdeg are computed
  * once and reused across iterations; iteration count is fixed (3), so
  * the whole job is 3 bounded shuffles, not a convergence loop. At
  * billions of edges this is exactly GraphX/Pregel's data layout
  * expressed relationally, with AQE handling hub-node skew.
  */
object GraphQueries {

  private val Iters = 3
  private val Unit = 1000000L // 1.0 in micro-units
  private val Base = 150000L  // 0.15 * Unit

  /** Distinct undirected trade edges, both directions materialized. */
  private def edges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val cs = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("cust"),
        concat(lit("s"), col("l_suppkey")).as("supp"))
      .distinct()
    cs.select(col("cust").as("src"), col("supp").as("dst"))
      .unionAll(cs.select(col("supp").as("src"), col("cust").as("dst")))
  }

  private[graft] def pagerank(s: SparkSession, d: String): DataFrame = {
    // Materialize (src, dst, outdeg) ONCE (localCheckpoint truncates
    // the lineage, same as operators.DedupClusters): without it every
    // iteration's plan re-derives the join+distinct edge derivation
    // from the base tables. Per iteration the ranks side is O(nodes) —
    // ~1% of edges — so AQE converts the join to broadcast at runtime
    // (no hint: at extreme node counts the shuffle join on src is the
    // correct Pregel shape, and AQE makes that call per scale).
    val e = edges(s, d)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ew = e.join(deg, Seq("src")).localCheckpoint()
    val nodes = ew.select(col("src").as("node")).distinct().localCheckpoint()
    var ranks = nodes.withColumn("r", lit(Unit))
    for (_ <- 0 until Iters) {
      val contrib = ew
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("r DIV outdeg").as("share"))
        .groupBy(col("node"))
        .agg(sum(col("share")).as("inflow"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(Base) + expr(s"85 * coalesce(inflow, 0L) DIV 100")).as("r"))
    }
    ranks
      .select(col("node"), col("r").as("rank_micro"))
      .orderBy(col("rank_micro").desc, col("node"))
      .limit(100)
  }

  val defs: Map[String, Q] = Map(
    "q_pagerank" -> ((s, d) => pagerank(s, d))
  )

  /** The twin unrolls the three iterations as CTEs; `//` is DuckDB's
    * floor division on BIGINTs, matching Spark's `DIV`. */
  val oracle: Map[String, String] = Map(
    "q_pagerank" -> {
      // DuckDB's SUM over BIGINT widens to HUGEINT, which the pandas
      // boundary renders as float64 — CAST back to BIGINT each
      // iteration so rank_micro stays integral end to end.
      def iter(prev: String, cur: String): String =
        s"""$cur AS (
           |  SELECT n.node,
           |    CAST($Base + 85 * COALESCE((
           |      SELECT SUM($prev.r // deg.outdeg)
           |      FROM edges JOIN $prev ON $prev.node = edges.src
           |                 JOIN deg ON deg.src = edges.src
           |      WHERE edges.dst = n.node), 0) // 100 AS BIGINT) AS r
           |  FROM nodes n)""".stripMargin
      s"""WITH cs AS (
         |  SELECT DISTINCT 'c' || o_custkey AS cust, 's' || l_suppkey AS supp
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS (
         |  SELECT cust AS src, supp AS dst FROM cs
         |  UNION ALL
         |  SELECT supp AS src, cust AS dst FROM cs),
         |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |r0 AS (SELECT node, CAST($Unit AS BIGINT) AS r FROM nodes),
         |${iter("r0", "r1")},
         |${iter("r1", "r2")},
         |${iter("r2", "r3")}
         |SELECT node, r AS rank_micro FROM r3
         |ORDER BY rank_micro DESC, node LIMIT 100""".stripMargin
    }
  )
}
