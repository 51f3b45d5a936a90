package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the EA1141 clinical CSV tables (S5) and the file-order
  * row_id the J4 fold depends on.
  *
  * The reference splits lines naively on ',' (`generate_mapping.py:6-13,
  * 59-60`); a proper CSV parse produces identical values for every column
  * it consumes because the unquoted-comma free-text only occurs in later
  * columns (SURVEY.md §1.3) — so Spark's CSV reader is used, NOT a
  * replica of the naive splitter.
  *
  * Sentinel codes (`N`, `.N`, `.M`, `.F`) are NOT decoded here: the
  * reference passes them through as text (SURVEY.md §1.2), and the
  * substring classifier maps them to UNKNOWN. [[decodeSentinels]] is the
  * opt-in helper for consumers that do want SQL NULLs.
  */
object ClinicalCsv {

  val Sentinels: Seq[String] = Seq("N", ".N", ".M", ".F")

  /** CASE WHEN v IN ('N','.N','.M','.F') THEN NULL ELSE v END */
  def decodeSentinels(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c.isin(Sentinels: _*), lit(null: String)).otherwise(c)

  /** Attach a file-order row_id. The clinical tables are single small
    * files, so the CSV scan is one partition and
    * monotonically_increasing_id() is sequential within it.
    *
    * 100 TB note: for big ordered inputs this idiom does NOT hold across
    * partitions — there the stable id comes from parquet
    * `_metadata.row_index` (+ file ordering), or the order column is
    * explicit in the data. The J4 fold itself is already order-safe
    * aggregation; only row_id derivation is format-specific.
    */
  def withRowId(df: DataFrame): DataFrame = {
    // Guard the idiom's precondition: above maxPartitionBytes the scan
    // splits, and split packing orders by length descending — coalesce(1)
    // would then concatenate out of file order and silently corrupt the
    // order-sensitive J4 fold. Fail loudly instead; the multi-split path
    // is parquet `_metadata.row_index` (see OrderedFoldSpec).
    require(df.rdd.getNumPartitions == 1,
      s"file-order row_id requires a single-split scan (got " +
        s"${df.rdd.getNumPartitions} partitions); use _metadata.row_index " +
        "over parquet for multi-split inputs")
    df.coalesce(1).withColumn("row_id", monotonically_increasing_id())
  }

  /** Header CSV scan, all columns as strings (the reference types nothing
    * up front — SURVEY.md §1.2), plus file-order row_id. */
  def read(spark: SparkSession, path: String): DataFrame =
    withRowId(spark.read.option("header", true)
      .option("inferSchema", false).csv(path))

  /** The 100 TB row-id path: stable (file, row) order for MULTI-FILE
    * parquet inputs, independent of split packing and partition count —
    * `row_id = fileRank(_metadata.file_path) << 40 | _metadata.row_index`.
    * File rank comes from sorting the (small) distinct file list, which
    * broadcasts back onto the scan; `row_index` is the reader-provided
    * within-file position, so no ordering ever depends on task layout.
    * Proven against the sequential reference fold in OrderedFoldSpec
    * (multi-partition, shuffled split order, no coalesce). */
  def withParquetRowId(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
      .withColumn("_fp", col("_metadata.file_path"))
      .withColumn("_ri", col("_metadata.row_index"))
    val files = df.select(col("_fp")).distinct()
      .withColumn("_fidx", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("_fp")))
        .cast("long") - 1)
    df.join(broadcast(files), Seq("_fp"))
      .withColumn("row_id", shiftleft(col("_fidx"), 40) + col("_ri"))
      .drop("_fp", "_ri", "_fidx")
  }
}
