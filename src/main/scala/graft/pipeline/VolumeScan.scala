package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S1/S3/S4: hierarchical scan of an image tree
  * `<root>/<PatientID>/<StudyDate>/<uid>.dcm` with earliest-study
  * pruning per patient (`generate_mapping.py:16-28`; the comment there
  * says "last study" but the code takes `min` — SURVEY.md §2.1 S3
  * follows the code).
  *
  * Spark-first shape: one `binaryFile` scan (glob-filtered at listing
  * time = partition-prune equivalent), patient/study derived from the
  * path, and the per-patient min-study prune as a window filter.
  *
  * Scale note: at 100 TB the tree would be listed once by the source;
  * the window shuffles only (path-derived cols, length) — not content —
  * because Spark prunes the binary column until it is referenced.
  */
object VolumeScan {

  def scan(spark: SparkSession, imageRoot: String,
      withContent: Boolean = true): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.dcm")
      .option("recursiveFileLookup", "true")
      .load(imageRoot)
    val parts = split(col("path"), "/")
    val base = files.select(
      (Seq(col("path"), col("length")) ++
        (if (withContent) Seq(col("content")) else Nil)): _*)
      .withColumn("patient", element_at(parts, -3))
      .withColumn("study_date", element_at(parts, -2))
    val w = Window.partitionBy(col("patient"))
    base
      .withColumn("min_study", min(col("study_date")).over(w))
      .filter(col("study_date") === col("min_study"))
      .drop("min_study")
  }
}
