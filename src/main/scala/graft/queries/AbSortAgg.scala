package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Prices the CodegenAudit SORT-AGG class: `max_by`/`min_by` with a
  * struct ordering key carries a var-length aggregation buffer, which
  * HashAggregateExec cannot hold in its fixed-width hash map, so the
  * planner falls back to SortAggregateExec — every task sorts its rows
  * by grouping key before aggregating.
  *
  * The candidate fix, priced here on the family's largest raw-fact
  * member (q_event_dedup_first, one min_by over every event row):
  * pack the (ts, event_id) ordering struct into one fixed-width
  * DECIMAL(38,0) — `ts_micros · 10¹⁹ + event_id`, order-isomorphic to
  * the struct's lexicographic order since 0 ≤ event_id < 10¹⁹ (any
  * non-negative int64 id) — take a plain `min`, decode. Fixed-
  * precision decimals ARE mutable buffer types, so the packed form
  * hash-aggregates.
  * Run: `runMain graft.queries.AbSortAgg <dir> [reps]`.
  */
object AbSortAgg {

  /** Current gated form (SortAggregate). */
  private def structForm(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        min_by(col("event_id"), struct(col("ts"), col("event_id")))
          .as("first_event_id"),
        min(col("ts")).as("first_ts"),
        count(lit(1)).as("n_total"))

  /** Packed-decimal candidate (HashAggregate) — the form shipped in
    * q_event_dedup_first: 10¹⁹ multiplier covers ANY non-negative
    * int64 id (the 100 TB contract, guarded at the production query
    * with a raise_error branch), still inside DECIMAL(38); pmod makes
    * the decode sign-safe for pre-epoch (negative) timestamps. */
  private def packedForm(s: SparkSession, d: String): DataFrame = {
    val packBase = expr("CAST(10000000000000000000 AS DECIMAL(38,0))")
    Tables.events(s, d)
      .withColumn("pk",
        // ts is TIMESTAMP_NTZ; the cast to TIMESTAMP is UTC-session
        // exact, so unix_micros is lossless and order-preserving
        unix_micros(col("ts").cast("timestamp")).cast("decimal(38,0)") *
          packBase + col("event_id"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        min(col("pk")).as("pk_min"),
        min(col("ts")).as("first_ts"),
        count(lit(1)).as("n_total"))
      .select(col("user_id"), col("event_type"),
        pmod(col("pk_min"), packBase).cast("long").as("first_event_id"),
        col("first_ts"), col("n_total"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = AbHarness.session()
    // result equality, not just count: the packed decode must give the
    // same argmin ids
    val a = structForm(spark, dir)
    val b = packedForm(spark, dir)
    val diff = a.join(b, Seq("user_id", "event_type"))
      .filter(a("first_event_id") =!= b("first_event_id")).count()
    require(diff == 0, s"forms disagree on $diff argmin rows — A/B void")
    println(s"[ab] sortagg argmin agreement: exact")
    AbHarness.run(Seq(
      "struct" -> (() => structForm(spark, dir)),
      "packed" -> (() => packedForm(spark, dir))), reps, "sortagg")
    spark.stop()
  }
}
