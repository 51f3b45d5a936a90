package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IO for the uid -> record JSON document map (S6 parse, S8 sink) —
  * the shape of `ea1141-mapping.json` (FIXTURES.md §A).
  */
object Ea1141Json {

  /** Spark schema of one mapping record (FIXTURES.md §A). */
  val recordSchema: StructType = StructType(Seq(
    StructField("PatientID", StringType),
    StructField("StudyInstanceUID", StringType),
    StructField("SeriesInstanceUID", StringType),
    StructField("ImageShape", ArrayType(IntegerType)),
    StructField("SeriesDescription", StringType),
    StructField("FrameLaterality", StringType),
    StructField("ImagePath", StringType),
    StructField("Subject_DE", StringType),
    StructField("DBT_BIRADS", StringType),
    StructField("MRI_BIRADS", StringType),
    StructField("DBT_Outcome", StringType),
    StructField("MRI_Outcome", StringType)))

  /** Parse a whole-file JSON map into one row per volume: the top-level
    * map explodes into (uid, fields...) — `json.loads(...).items()` in
    * the reference (`load_ground_truths.py:23`).
    *
    * Scale note: a single JSON document is inherently one task; at scale
    * the mapping would be stored as JSONL/parquet (one record per line)
    * and this becomes a plain parallel scan — the downstream plan is
    * identical either way.
    */
  def readMappingJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", true).text(path)
      .select(from_json(col("value"), MapType(StringType, recordSchema)).as("m"))
      .select(explode(col("m")).as(Seq("uid", "r")))
      .select(col("uid") +: recordSchema.fieldNames.toIndexedSeq.map(f => col(s"r.$f")): _*)

  /** Production shape: one record per line (`{"uid": ..., fields...}`),
    * read as a plain parallel JSON scan — the scale path documented on
    * [[readMappingJson]] (a single JSON map document is inherently one
    * task; JSONL splits across the cluster). */
  def readMappingJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(recordSchema.add(StructField("uid", StringType))).json(path)
      .select(col("uid") +: recordSchema.fieldNames.toIndexedSeq.map(col): _*)

  /** Sink the mapping back to a single JSON map document (S8,
    * `generate_mapping.py:168-169`) — golden-format compatible. */
  def writeMappingJson(mapping: DataFrame, path: String): Unit = {
    // ignoreNullFields=false: the reference's json.dump writes explicit
    // nulls (28 DBT_BIRADS / 2000 DBT_Outcome nulls in the golden file).
    val entries = mapping
      .select(col("uid"),
        to_json(struct(recordSchema.fieldNames.toIndexedSeq.map(col): _*),
          Map("ignoreNullFields" -> "false")).as("j"))
      .orderBy(col("uid"))
      .collect()
      .map(r => s""""${r.getString(0)}": ${r.getString(1)}""")
    val out = entries.mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), out)
  }
}
