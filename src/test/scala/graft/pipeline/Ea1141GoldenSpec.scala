package graft.pipeline

import java.nio.file.{Files, Path}
import java.util.zip.ZipFile

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Golden replication against the reference's published artifacts
  * (SURVEY.md §5): the real clinical CSVs (from the zip shipped with the
  * reference repo) and the committed `ea1141-mapping.json` (2,030
  * records — the output of running the reference ETL on the private
  * image set).
  *
  * The volume-side inputs (subject, laterality) are recovered FROM the
  * golden mapping (no DICOM files exist); the truth-label derivation is
  * recomputed by the Spark pipeline from the raw CSVs and compared
  * field-by-field against the golden labels, and the label query is
  * compared against the sequential oracle for all 24 parameterizations.
  */
class Ea1141GoldenSpec extends SparkTestBase {
  import spark.implicits._

  private val refRoot = "/root/reference"
  private val zipPath = s"$refRoot/EA1141-Reviewed-Clinical-Data-and-Data-Dictionaries.zip"
  private val mappingJson = s"$refRoot/ea1141-mapping.json"

  private def available: Boolean =
    Files.exists(Path.of(zipPath)) && Files.exists(Path.of(mappingJson))

  private lazy val csvDir: Path = {
    val dir = Files.createTempDirectory("ea1141_csv")
    val zf = new ZipFile(zipPath)
    try {
      zf.entries().asScala
        .filter(e => !e.isDirectory && e.getName.endsWith(".csv"))
        .foreach { e =>
          val target = dir.resolve(Path.of(e.getName).getFileName.toString)
          val in = zf.getInputStream(e)
          try Files.copy(in, target) finally in.close()
        }
    } finally zf.close()
    dir
  }

  private lazy val golden = Ea1141Json.readMappingJson(spark, mappingJson).cache()

  private lazy val computed = {
    val screening = ClinicalCsv.read(spark, csvDir.resolve("ea1141_year0_screening_derived.csv").toString)
    val tomoL = ClinicalCsv.read(spark, csvDir.resolve("ea1141_year0_tomolesions_outcome.csv").toString)
    val mriL = ClinicalCsv.read(spark, csvDir.resolve("ea1141_year0_mrilesions_outcome.csv").toString)
    Ea1141Pipeline.truthLabels(screening, tomoL, mriL)
  }

  test("golden: recomputed truth labels match ea1141-mapping.json for all 2,030 volumes") {
    assume(available)
    val vols = golden.select(
      col("uid"), col("Subject_DE"),
      coalesce(col("FrameLaterality"), lit(Ea1141Pipeline.NoLaterality)).as("img_lat"),
      col("DBT_BIRADS").as("g_db"), col("DBT_Outcome").as("g_do"),
      col("MRI_BIRADS").as("g_mb"), col("MRI_Outcome").as("g_mo"))
    val joined = vols.join(computed, Seq("Subject_DE", "img_lat"), "left")
    assert(joined.count() === 2030)
    val mismatches = joined.filter(
      !(col("g_db") <=> col("DBT_BIRADS")) ||
        !(col("g_do") <=> col("DBT_Outcome")) ||
        !(col("g_mb") <=> col("MRI_BIRADS")) ||
        !(col("g_mo") <=> col("MRI_Outcome")))
    val bad = mismatches.limit(5).collect()
    assert(bad.isEmpty,
      s"label mismatches: ${bad.map(_.toString).mkString("; ")}")
  }

  test("golden: observed null/label distributions (FIXTURES.md §A)") {
    assume(available)
    assert(golden.count() === 2030)
    assert(golden.filter(col("DBT_BIRADS").isNull).count() === 28)
    assert(golden.filter(col("MRI_BIRADS").isNull).count() === 157)
    val dbtOut = golden.groupBy("DBT_Outcome").count()
      .collect().map(r => Option(r.getString(0)).getOrElse("null") -> r.getLong(1)).toMap
    assert(dbtOut === Map("BENIGN" -> 21L, "MALIGNANT" -> 4L, "UNKNOWN" -> 5L, "null" -> 2000L))
  }

  test("JSONL mapping reader ≡ map-document reader on the golden file") {
    assume(available)
    val jsonl = java.nio.file.Files.createTempDirectory("gj").resolve("m.jsonl")
    val lines = golden.toJSON.collect()
    java.nio.file.Files.write(jsonl, String.join("\n", lines: _*).getBytes)
    val viaJsonl = Ea1141Json.readMappingJsonl(spark, jsonl.toString)
    assert(viaJsonl.count() === 2030)
    val a = golden.orderBy("uid").collect().toSeq
    val b = viaJsonl.orderBy("uid").collect().toSeq
    assert(a === b)
  }

  test("golden: label query matches sequential oracle for all 24 parameterizations") {
    assume(available)
    val records = golden.select("uid", "Subject_DE", "FrameLaterality",
      "ImagePath", "DBT_BIRADS", "MRI_BIRADS", "DBT_Outcome", "MRI_Outcome")
      .collect()
      .map(r => SequentialReference.MappingRecord(
        r.getString(0), r.getString(1), Option(r.getString(2)), r.getString(3),
        Option(r.getString(4)), Option(r.getString(5)),
        Option(r.getString(6)), Option(r.getString(7))))
      .toSeq
    for {
      gtType <- Seq("biopsy", "acr4+")
      scope <- Seq("volume-wise", "breast-wise", "patient-wise")
      dbtOnly <- Seq(true, false)
      mriExcluded <- Seq(true, false)
    } {
      val want = SequentialReference
        .groundTruths(records, gtType, scope, dbtOnly, mriExcluded)
        .map { case (k, uids, truths) =>
          k -> (uids.sorted, uids.zip(truths).sortBy(_._1).map(_._2))
        }.toMap
      val got = Ea1141Pipeline.groundTruths(golden, gtType, scope, dbtOnly, mriExcluded)
        .collect()
        .map(r => r.getString(0) ->
          (r.getSeq[String](1).toSeq,
            r.getSeq[scala.collection.Seq[Int]](2).map(_.toSeq).toSeq))
        .toMap
      assert(got.keySet === want.keySet,
        s"[$gtType/$scope/$dbtOnly/$mriExcluded] key sets differ: " +
          s"onlySpark=${(got.keySet -- want.keySet).take(3)} onlyRef=${(want.keySet -- got.keySet).take(3)}")
      want.foreach { case (k, (u, t)) =>
        assert(got(k)._1 === u, s"[$gtType/$scope/$dbtOnly/$mriExcluded] uids differ at $k")
        assert(got(k)._2 === t, s"[$gtType/$scope/$dbtOnly/$mriExcluded] truths differ at $k")
      }
    }
  }
}
