package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Pins the round-9 segment form of q_interpolate against the
  * dense-grid reference (the pre-round-9 implementation, kept verbatim
  * here) on randomized series. The equivalence argument being tested:
  * the per-user range is [min observed bucket, max observed bucket],
  * so every gap lies strictly between two observations and the grid
  * never needs to exist as a frame — and the float formula
  * v0 + (v1 − v0)·k/span uses the identical expression tree, so the
  * match must be BIT-exact on the doubles, not approximate.
  */
class InterpolateSpec extends SparkTestBase {
  import spark.implicits._

  /** The dense-grid reference: explode the [t0, t1] grid, left-join the
    * observations back, run backward last() / forward first() windows. */
  private def denseGridReference(agg: DataFrame): DataFrame = {
    val bounds = agg.groupBy(col("user_id"))
      .agg(min(col("bucket")).as("t0"), max(col("bucket")).as("t1"))
    val grid = bounds.select(col("user_id"),
      explode(expr("sequence(t0, t1, INTERVAL 4 HOURS)")).as("bucket"))
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("bucket"))
    val back = ord.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val fwd = ord.rowsBetween(
      0, org.apache.spark.sql.expressions.Window.unboundedFollowing)
    grid.join(agg, Seq("user_id", "bucket"), "left")
      .withColumn("idx", row_number().over(ord))
      .withColumn("prev_v", last(col("sv"), ignoreNulls = true).over(back))
      .withColumn("prev_i",
        last(when(col("sv").isNotNull, col("idx")), ignoreNulls = true).over(back))
      .withColumn("next_v", first(col("sv"), ignoreNulls = true).over(fwd))
      .withColumn("next_i",
        first(when(col("sv").isNotNull, col("idx")), ignoreNulls = true).over(fwd))
      .select(col("user_id"), col("bucket"),
        col("sv").isNull.as("was_gap"),
        when(col("sv").isNotNull, col("sv"))
          .otherwise(col("prev_v") +
            (col("next_v") - col("prev_v"))
              * (col("idx") - col("prev_i")).cast(DoubleType)
              / (col("next_i") - col("prev_i")).cast(DoubleType))
          .as("sv_interp"))
  }

  /** Random observed frames: per user a random subset of an aligned
    * bucket range with random values — multi-bucket gaps, adjacent
    * observations, and single-observation users all occur. */
  private def randomObserved(seed: Long): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val rows = (1L to 20L).flatMap { u =>
      val span = 1 + rnd.nextInt(40)
      val offset = rnd.nextInt(1000)
      (0 until span).flatMap { i =>
        if (rnd.nextDouble() < 0.4)
          Some((u, (offset + i).toLong * 14400L, rnd.nextDouble() * 1000 - 500))
        else None
      }
    }
    // Every user needs >= 1 observation for the frame to mention it at
    // all; drop-everything users simply don't appear (same in both
    // forms). timestamp_seconds keeps buckets 4h-aligned.
    rows.toDF("user_id", "secs", "sv")
      .select(col("user_id"), timestamp_seconds(col("secs")).as("bucket"),
        col("sv"))
  }

  private def canon(df: DataFrame): Seq[(Long, Long, Boolean, Double)] =
    df.select(col("user_id"), unix_timestamp(col("bucket")).as("b"),
        col("was_gap"), col("sv_interp"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
      .toSeq

  test("segment form == dense-grid reference, bit-exact, on random series") {
    for (seed <- Seq(1L, 7L, 42L)) {
      val obs = randomObserved(seed)
        .repartition(5) // multi-partition input: the lead() window must shuffle
      val got = canon(EventQueries.interpolateSegments(obs))
      val want = canon(denseGridReference(obs))
      assert(got.size === want.size, s"row count differs for seed $seed")
      got.zip(want).foreach { case (g, w) =>
        assert(g === w, s"seed $seed: $g != $w") // == on Double: bit-exact
      }
    }
  }

  test("single observation per user: one non-gap row, no segments") {
    val obs = Seq((1L, 14400L * 10, 3.5), (2L, 14400L * 99, -1.0))
      .toDF("user_id", "secs", "sv")
      .select(col("user_id"), timestamp_seconds(col("secs")).as("bucket"), col("sv"))
    val out = canon(EventQueries.interpolateSegments(obs))
    assert(out === Seq((1L, 14400L * 10, false, 3.5), (2L, 14400L * 99, false, -1.0)))
  }

  test("adjacent observations produce no gap rows; interior buckets interpolate") {
    val obs = Seq((1L, 0L, 0.0), (1L, 14400L, 10.0), (1L, 14400L * 4, 40.0))
      .toDF("user_id", "secs", "sv")
      .select(col("user_id"), timestamp_seconds(col("secs")).as("bucket"), col("sv"))
    val out = canon(EventQueries.interpolateSegments(obs))
    assert(out === Seq(
      (1L, 0L, false, 0.0),
      (1L, 14400L, false, 10.0),
      (1L, 14400L * 2, true, 10.0 + 30.0 * 1.0 / 3.0),
      (1L, 14400L * 3, true, 10.0 + 30.0 * 2.0 / 3.0),
      (1L, 14400L * 4, false, 40.0)))
  }
}
