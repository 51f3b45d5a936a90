package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Pins q_window_dist's second-key FALLBACK branch (round-13 advice):
  * when a status's FIRST price bucket has exactly one row, the
  * decomposed form serves nth_value(o_orderkey, 2) via
  * element_at(lead(min2, 1), 1) — the next bucket's smallest key —
  * and a single-row status must yield NULL everywhere. TPC-H-shaped
  * data never exercises either branch (every status's first bucket is
  * large), so this synthetic frame does: status A's first bucket has
  * one row, status B is a single row total, status C is dense. The
  * reference is the naive percent_rank/cume_dist/nth_value window form
  * (the oracle twin's SQL, verbatim in DataFrame terms).
  */
class WindowDistEdgeSpec extends SparkTestBase {
  import spark.implicits._

  test("decomposed q_window_dist equals the naive windows on edge buckets") {
    val rows = Seq(
      // status A: bucket 0 has EXACTLY one row (orderkey 10), bucket 1
      // has three, bucket 3 has two (gap in bucket ids is deliberate)
      (10L, "A", 10000.0), (11L, "A", 60000.0), (12L, "A", 70000.0),
      (13L, "A", 99000.0), (14L, "A", 160000.0), (15L, "A", 170000.0),
      // status B: single row total -> pct_rank 0.0, second_key NULL
      (20L, "B", 123000.0),
      // status C: dense first bucket (the common case)
      (30L, "C", 1000.0), (31L, "C", 2000.0), (32L, "C", 52000.0),
      (33L, "C", 101000.0))
    val dir = java.nio.file.Files.createTempDirectory("wdist_edge").toString
    rows.toDF("o_orderkey", "o_orderstatus", "o_totalprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val got = graft.SparkEntry.queries("q_window_dist")(spark, dir)

    val bucket = floor(col("o_totalprice") / 50000).cast("int")
    val wTies = Window.partitionBy(col("o_orderstatus")).orderBy(bucket)
    val wUniq = Window.partitionBy(col("o_orderstatus"))
      .orderBy(bucket, col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = rows.toDF("o_orderkey", "o_orderstatus", "o_totalprice")
      .select(col("o_orderkey"), col("o_orderstatus"),
        bucket.as("price_bucket"),
        percent_rank().over(wTies).as("pct_rank"),
        cume_dist().over(wTies).as("cume"),
        nth_value(col("o_orderkey"), 2).over(wUniq).as("second_key"))
      .orderBy(col("o_orderstatus"), col("price_bucket"), col("o_orderkey"))

    val g = got.collect().toSeq
    val r = ref.collect().toSeq
    assert(g == r, s"mismatch:\ngot ${g.mkString("\n    ")}\nref ${r.mkString("\n    ")}")
    // the fallback branch must actually fire: status A's rows past the
    // first must carry second_key = 11 (the NEXT bucket's min), and
    // status B all-NULL
    assert(g.exists(row => row.getString(1) == "A" && !row.isNullAt(5)
      && row.getLong(5) == 11L))
    assert(g.filter(_.getString(1) == "B").forall(_.isNullAt(5)))
  }
}
