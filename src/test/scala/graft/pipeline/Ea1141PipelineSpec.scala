package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Fixture tests for the EA1141 pipeline semantics — each test pins one
  * correctness trap documented in SURVEY.md §2.1.
  */
class Ea1141PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def screening(rows: (String, String, String)*): DataFrame =
    rows.toSeq.zipWithIndex
      .map { case ((s, d, m), i) => (s, d, m, i.toLong) }
      .toDF("SUBJECT_DE", "TOMO_BIRADS_YR0", "MRI_BIRADS_YR0", "row_id")

  private def tomo(rows: (String, String, String)*): DataFrame =
    rows.toSeq.zipWithIndex
      .map { case ((s, l, o), i) => (s, l, o, i.toLong) }
      .toDF("SUBJECT_DE", "TOMO_LESIONBREAST_YR0", "TOMO_LESIONOUTCOME_YR0", "row_id")

  private def mri(rows: (String, String, String)*): DataFrame =
    rows.toSeq.zipWithIndex
      .map { case ((s, l, o), i) => (s, l, o, i.toLong) }
      .toDF("SUBJECT_DE", "MRI_LESIONBREAST_YR0", "MRI_LESIONOUTCOME_YR0", "row_id")

  private val emptyTomo = tomo()
  private val emptyMri = mri()

  private def labelsFor(df: DataFrame, subject: String, lat: String): Row =
    df.filter($"Subject_DE" === subject && $"img_lat" === lat)
      .select("DBT_BIRADS", "DBT_Outcome", "MRI_BIRADS", "MRI_Outcome")
      .head()

  test("no lesion rows: screening BIRADS pass through, outcomes null") {
    val t = Ea1141Pipeline.truthLabels(screening(("s1", "2", "3")), emptyTomo, emptyMri)
    assert(labelsFor(t, "s1", "R") === Row("2", null, "3", null))
    assert(labelsFor(t, "s1", "L") === Row("2", null, "3", null))
    assert(labelsFor(t, "s1", "?") === Row("2", null, "3", null))
  }

  test("J2 first-row-wins screening dedup (setdefault)") {
    val t = Ea1141Pipeline.truthLabels(
      screening(("s1", "1", "1"), ("s1", "5", "5")), emptyTomo, emptyMri)
    assert(labelsFor(t, "s1", "R") === Row("1", null, "1", null))
  }

  test("J3/C1: matching laterality classifies the outcome") {
    val t = Ea1141Pipeline.truthLabels(
      screening(("s1", "4", "2")),
      tomo(("s1", "1", "Invasive carcinoma")), emptyMri)
    // Right breast lesion ('1') matches img R: classified; BIRADS kept.
    assert(labelsFor(t, "s1", "R") === Row("4", "MALIGNANT", "2", null))
    // img L mismatches -> DBT BIRADS erased AND biopsy null.
    assert(labelsFor(t, "s1", "L") === Row(null, null, "2", null))
    // null laterality volume mismatches everything.
    assert(labelsFor(t, "s1", "?") === Row(null, null, "2", null))
  }

  test("J4 trap: later wrong-laterality row erases an earlier match") {
    val t = Ea1141Pipeline.truthLabels(
      screening(("s1", "4", "2")),
      tomo(("s1", "1", "Benign"), ("s1", "2", "Invasive")), emptyMri)
    // For img R: row1 matches (BENIGN), row2 mismatches -> both erased.
    assert(labelsFor(t, "s1", "R") === Row(null, null, "2", null))
    // For img L: row1 mismatches (erases BIRADS), row2 matches
    // (last-write biopsy) -> BIRADS stays erased, biopsy MALIGNANT.
    assert(labelsFor(t, "s1", "L") === Row(null, "MALIGNANT", "2", null))
  }

  test("J4: last matching row wins the classification") {
    val t = Ea1141Pipeline.truthLabels(
      screening(("s1", "4", "2")),
      tomo(("s1", "1", "Benign"), ("s1", "1", "DCIS found")), emptyMri)
    assert(labelsFor(t, "s1", "R") === Row("4", "MALIGNANT", "2", null))
  }

  test("C1: benign markers tested before malignant; unknown fallback") {
    assert(SequentialReference.classify("BIRADS 2 @ 6 months") === "BENIGN")
    // benign-first: a text containing both marker families is BENIGN
    assert(SequentialReference.classify("No biopsy but Invasive suspected") === "BENIGN")
    assert(SequentialReference.classify("Invasive ductal") === "MALIGNANT")
    assert(SequentialReference.classify(".F") === "UNKNOWN")
    val t = Ea1141Pipeline.truthLabels(
      screening(("s1", "4", "2")),
      tomo(("s1", "1", "No biopsy but Invasive suspected")), emptyMri)
    assert(labelsFor(t, "s1", "R") === Row("4", "BENIGN", "2", null))
  }

  test("DBT and MRI folds are independent") {
    val t = Ea1141Pipeline.truthLabels(
      screening(("s1", "4", "5")),
      tomo(("s1", "2", "Benign")),
      mri(("s1", "1", "DCIS")))
    // img R: tomo row mismatches (DBT erased); mri row matches.
    assert(labelsFor(t, "s1", "R") === Row(null, null, "5", "MALIGNANT"))
    // img L: tomo matches (BENIGN); mri mismatches (MRI erased).
    assert(labelsFor(t, "s1", "L") === Row("4", "BENIGN", null, null))
  }

  private def mapping(rows: (String, String, String, String, String, String, String)*): DataFrame =
    rows.toSeq.map { case (uid, subj, lat, dbtB, mriB, dbtO, mriO) =>
      (uid, subj, lat, s"$$ROOT$$/EA1141-$subj/19400604/$uid.dcm", dbtB, mriB, dbtO, mriO)
    }.toDF("uid", "Subject_DE", "FrameLaterality", "ImagePath",
      "DBT_BIRADS", "MRI_BIRADS", "DBT_Outcome", "MRI_Outcome")

  test("D2: mri_excluded nulls out global birads when MRI > DBT (string compare)") {
    val m = mapping(
      ("u1", "s1", "R", "2", "3", null, null),  // mri>dbt -> dropped
      ("u2", "s2", "R", "2", "2", null, null))  // kept, birads 2<3 benign
    val out = Ea1141Pipeline.groundTruths(m, "biopsy", "volume-wise",
      dbtOnly = true, mriExcluded = true).collect()
    assert(out.map(_.getString(0)).toSet === Set("u2"))
    val notExcluded = Ea1141Pipeline.groundTruths(m, "biopsy", "volume-wise",
      dbtOnly = true, mriExcluded = false).collect()
    assert(notExcluded.map(_.getString(0)).toSet === Set("u1", "u2"))
  }

  test("D4 biopsy derivation: birads<3 benign; both-unknown dropped; malignant") {
    val m = mapping(
      ("u1", "s1", "R", "2", "1", null, null),          // <3 -> [1,0]
      ("u2", "s2", "R", "4", "1", "UNKNOWN", null),     // undesirable both -> drop
      ("u3", "s3", "R", "4", "1", "MALIGNANT", null),   // -> [0,1]
      ("u4", "s4", "R", "4", "1", "BENIGN", null))      // -> [1,0]
    val out = Ea1141Pipeline.groundTruths(m, "biopsy", "volume-wise", true, true)
      .collect().map(r => r.getString(0) ->
        r.getSeq[Seq[Int]](2).head).toMap
    assert(out === Map("u1" -> Seq(1, 0), "u3" -> Seq(0, 1), "u4" -> Seq(1, 0)))
  }

  test("D5 acr4+: birads>3 malignant else benign") {
    val m = mapping(
      ("u1", "s1", "R", "4", "1", null, null),
      ("u2", "s2", "R", "3", "1", null, null))
    val out = Ea1141Pipeline.groundTruths(m, "acr4+", "volume-wise", true, true)
      .collect().map(r => r.getString(0) -> r.getSeq[Seq[Int]](2).head).toMap
    assert(out === Map("u1" -> Seq(0, 1), "u2" -> Seq(1, 0)))
  }

  test("K1 keys: breast-wise and patient-wise grouping") {
    val m = mapping(
      ("u1", "s1", "R", "2", "1", null, null),
      ("u2", "s1", "r", "2", "1", null, null),  // lower-case lat upper()d
      ("u3", "s1", "L", "2", "1", null, null))
    val breast = Ea1141Pipeline.groundTruths(m, "biopsy", "breast-wise", true, true)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(breast === Map(
      "s1_19400604_R" -> Set("u1", "u2"),
      "s1_19400604_L" -> Set("u3")))
    val patient = Ea1141Pipeline.groundTruths(m, "biopsy", "patient-wise", true, true)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(patient === Map("s1_19400604" -> Set("u1", "u2", "u3")))
  }

  test("D6: unknown gt_type / scope rejected at plan build") {
    val m = mapping(("u1", "s1", "R", "2", "1", null, null))
    intercept[IllegalArgumentException] {
      Ea1141Pipeline.groundTruths(m, "nope", "volume-wise", true, true)
    }
    intercept[IllegalArgumentException] {
      Ea1141Pipeline.groundTruths(m, "biopsy", "nope", true, true)
    }
  }

  test("F1/F2 volume filters: null-keeping inequality") {
    val vols = Seq(
      // (uid, modality, ndim, desc, thickness, modifier) -> kept?
      ("v1", "MG", Seq(60, 100, 100), "R CC Breast Tomosynthesis", null, null, true),
      ("v2", "MR", Seq(60, 100, 100), "R CC", null, null, false),           // F1 modality
      ("v3", "MG", Seq(100, 100), "R CC", null, null, false),               // F1 ndim
      ("v4", "MG", Seq(60, 100, 100), "R CC Projection Views", null, null, false), // F1 desc
      ("v5", "MG", Seq(60, 100, 100), "R CC", Integer.valueOf(10), null, false),   // F2 thickness
      ("v6", "MG", Seq(60, 100, 100), "R CC", Integer.valueOf(1), null, true),
      ("v7", "MG", Seq(60, 100, 100), "R CC", null, "Spot Compression", false),    // F2 modifier
      ("v8", "MG", Seq(60, 100, 100), "R CC", null, "Magnification", true))
      .map { case (uid, mod, shape, desc, th, vm, _) =>
        (uid, s"EA1141-s1", "st1", "se1", shape, desc, mod,
          Option(th).map(_.intValue), Option(vm), Some("R"), s"/img/EA1141-s1/19400604/$uid.dcm")
      }
      .toDF("SOPInstanceUID", "PatientID", "StudyInstanceUID", "SeriesInstanceUID",
        "ImageShape", "SeriesDescription", "Modality", "SliceThickness",
        "ViewModifier", "FrameLaterality", "ImagePath")
    val out = Ea1141Pipeline.buildMapping(vols, screening(("s1", "2", "2")),
      emptyTomo, emptyMri, imageRoot = "/img/")
    // the truth dimension joins as a broadcast (zero volume-side shuffle)
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(out.select("uid").as[String].collect().toSet === Set("v1", "v6", "v8"))
    // P2 rebase applied
    assert(out.filter($"uid" === "v1").select("ImagePath").head().getString(0)
      === "$ROOT$/EA1141-s1/19400604/v1.dcm")
    // P1 Subject_DE + truth join worked
    assert(out.filter($"uid" === "v1").select("DBT_BIRADS").head().getString(0) === "2")
  }
}
