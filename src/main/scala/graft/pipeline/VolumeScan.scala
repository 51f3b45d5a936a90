package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    val parts = split(col("path"), "/")
    // UNFILTERED recursive listing for the min-study aggregate only —
    // its content column is never referenced, so binaryFile prunes it
    // and this scan is pure listing metadata (no file IO, no 2 GB cap).
    val listed = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(imageRoot)
      .withColumn("patient", element_at(parts, -3))
      .withColumn("study_date", element_at(parts, -2))
    // Volume rows read through a SECOND, glob-filtered load: binaryFile
    // pushes only length/modificationTime filters, so a relational
    // path-suffix filter would still materialize content for (and fail
    // on >2 GiB) non-.dcm files when withContent=true. The glob excludes
    // them at listing time; the extra driver-side listing of the tree is
    // the price of never touching non-volume bytes.
    val base = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.dcm")
      .option("recursiveFileLookup", "true")
      .load(imageRoot)
      .withColumn("patient", element_at(parts, -3))
      .withColumn("study_date", element_at(parts, -2))
      .select(
        (Seq(col("path"), col("length")) ++
          (if (withContent) Seq(col("content")) else Nil) ++
          Seq(col("patient"), col("study_date"))): _*)
    // The reference takes min over the patient's study DIRECTORIES and
    // then lists only that one (`generate_mapping.py:20-24`) — a patient
    // whose earliest study dir holds no .dcm files yields ZERO volumes,
    // not the next study's. So min_study derives from the UNFILTERED
    // listing, not from the suffix-matched files. Residual divergence: a
    // study dir with no files at all is invisible to any file listing
    // (documented; HDFS-style listings see files only).
    val minStudy = listed
      .select(col("patient"), col("study_date"))
      .groupBy(col("patient"))
      .agg(min(col("study_date")).as("min_study"))
    // No broadcast hint: the per-patient min table scales with the data
    // (one row per patient), so AQE picks broadcast vs shuffle at runtime.
    base
      .join(minStudy, Seq("patient"))
      .filter(col("study_date") === col("min_study"))
      .drop("min_study")
  }
}
