package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Same-JVM alternating A/B for the LSH candidate-pair stage
  * ([[DedupQueries.cappedBucketPairs]]): the round-9 MinKBy aggregate
  * form against the pre-round-9 two-window + in-bucket-self-join form.
  *
  * Fresh-JVM cross-session solo comparisons of queries in this weight
  * class are noise (SCALE.md "measurement honesty": ±20% between
  * sessions); alternating both forms inside one JVM against one
  * checkpointed banded frame is the instrument that isolates the plan
  * difference. The banded frame is localCheckpoint'd so shingling and
  * minhashing — identical in both forms — stay out of the timed region.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.queries.AbBucketPairs
  * /root/scale100x 3"` — prints one line per (rep, form) plus the
  * kept-pair-count sanity check (the forms must agree exactly).
  */
object AbBucketPairs {

  /** The pre-round-9 shape, kept verbatim for the A/B: bucket size and
    * representative via two whole-bucket windows, small-bucket pairs via
    * an in-bucket self-join, the star fallback reading the sized frame. */
  private def windowForm(banded: DataFrame): DataFrame = {
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("band_key"))
    val sized = banded
      .withColumn("bsz", count(lit(1)).over(wB))
      .withColumn("rep", min(col("doc_id")).over(wB))
    val small = sized.filter(col("bsz") <= DedupQueries.BUCKET_CAP)
      .select(col("band"), col("band_key"), col("doc_id"))
    val smallPairs = small.toDF("band", "band_key", "id_a")
      .join(small.toDF("band", "band_key", "id_b"), Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val starPairs = sized
      .filter(col("bsz") > DedupQueries.BUCKET_CAP && col("doc_id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("doc_id").as("id_b"))
    smallPairs.union(starPairs).distinct()
  }

  /** Synthetic hub-skew banded frame: `hub` rows share ONE (band,
    * band_key) bucket — the boilerplate/identical-doc cluster LSH is
    * guaranteed to produce on dup-saturated corpora — over a uniform
    * background of 4-member buckets. The driver corpus never exceeds
    * BUCKET_CAP, so this is the only way to measure the hub path. */
  private def skewedBanded(spark: SparkSession, hub: Long, bg: Long): DataFrame = {
    val hubRows = spark.range(hub)
      .select(col("id").as("doc_id"), lit(0).as("band"), lit("HUB").as("band_key"))
    val bgRows = spark.range(hub, hub + bg)
      .select(col("id").as("doc_id"), lit(0).as("band"),
        concat(lit("b"), (col("id") / 4).cast("long")).as("band_key"))
    hubRows.unionAll(bgRows)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/scale100x")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = AbHarness.session()

    val banded = DedupQueries
      .bandedSignaturesOf(Tables.documentsSpread(spark, dir))
      .localCheckpoint()

    def forms(b: DataFrame): Seq[(String, () => DataFrame)] = Seq(
      // Sanity inside the harness: identical kept pair set sizes (the
      // set itself is pinned equal by MinKPairsSpec; the count agreeing
      // checks the wiring).
      "minkby" -> (() => DedupQueries.cappedBucketPairs(b)),
      "window" -> (() => windowForm(b)))

    AbHarness.run(forms(banded), reps)

    // The hub-skew case: one 2M-member bucket over a 6M-row uniform
    // background. The window form computes bsz/rep with FULL-bucket
    // count/min windows (not rank functions — WindowGroupLimit cannot
    // partial-limit them), so the hub's entire membership flows through
    // one window task; the aggregate form caps the hub's shuffle
    // contribution at (CAP+1) rows per map partition.
    val hubN = if (args.length > 2) args(2).toLong else 2000000L
    val skew = skewedBanded(spark, hub = hubN, bg = 6000000L).localCheckpoint()
    AbHarness.run(forms(skew), reps, tag = "skew")
    spark.stop()
  }
}
