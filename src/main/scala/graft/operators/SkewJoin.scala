package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §7 "salting skewed keys";
  * SCALE.md "Joins").
  *
  * AQE's skew-join split handles most skew automatically, but it only
  * fires on sort-merge joins and after a shuffle has already produced
  * skewed map output. Salting is the explicit form: the skewed (fact)
  * side scatters each key over `saltBuckets` sub-keys derived
  * deterministically from the row itself, and the build (dim) side
  * replicates each key once per bucket — turning one hot reducer into
  * `saltBuckets` even ones. Semantics are exactly those of the plain
  * inner equi-join (property-tested in SkewJoinSpec).
  */
object SkewJoin {

  /** Inner equi-join of `fact` (skewed) with `dim` on `key`, salted over
    * `saltBuckets` partitions per key. `saltSource` must be a
    * deterministic expression over fact columns (any hashable column
    * set; uniformity, not secrecy, is the goal). */
  def saltedInnerJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, saltBuckets: Int): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(hash(saltSource), lit(saltBuckets)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
