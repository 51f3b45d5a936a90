package graft.pipeline

import graft.SparkTestBase

/** Randomized-equivalence tests (SURVEY.md §5): the Spark J4 fold ≡ the
  * sequential row-at-a-time reference semantics on randomized lesion
  * tables (seeded — reproducible).
  */
class Ea1141PropertySpec extends SparkTestBase {
  import spark.implicits._

  private val latCodes = Array("1", "2", "3", "")
  private val outcomes = Array(
    "Benign", "Invasive", "DCIS with atypia", "No biopsy",
    "BIRADS 2 @ 6 months", ".F", "something else",
    "BI-RADS score downgraded after review")
  private val biradsVals = Array("1", "2", "3", "4", "5")
  private val subjectPool = Array("s1", "s2", "s3")

  test("Spark truthLabels ≡ sequential fold on random tables (30 seeded trials)") {
    for (seed <- 0 until 30) {
      val rnd = new scala.util.Random(seed)
      def pick[T](a: Array[T]): T = a(rnd.nextInt(a.length))
      val screen = (0 until 1 + rnd.nextInt(4)).map(_ =>
        SequentialReference.ScreenRow(pick(subjectPool), pick(biradsVals), pick(biradsVals)))
      val dbtRows = (0 until rnd.nextInt(7)).map(_ =>
        SequentialReference.LesionRow(pick(subjectPool), pick(latCodes), pick(outcomes)))
      val mriRows = (0 until rnd.nextInt(7)).map(_ =>
        SequentialReference.LesionRow(pick(subjectPool), pick(latCodes), pick(outcomes)))

      val screenDf = screen.zipWithIndex
        .map { case (r, i) => (r.subject, r.dbt, r.mri, i.toLong) }
        .toDF("SUBJECT_DE", "TOMO_BIRADS_YR0", "MRI_BIRADS_YR0", "row_id")
      val tomoDf = dbtRows.zipWithIndex
        .map { case (r, i) => (r.subject, r.latCode, r.outcome, i.toLong) }
        .toDF("SUBJECT_DE", "TOMO_LESIONBREAST_YR0", "TOMO_LESIONOUTCOME_YR0", "row_id")
      val mriDf = mriRows.zipWithIndex
        .map { case (r, i) => (r.subject, r.latCode, r.outcome, i.toLong) }
        .toDF("SUBJECT_DE", "MRI_LESIONBREAST_YR0", "MRI_LESIONOUTCOME_YR0", "row_id")

      val got = Ea1141Pipeline.truthLabels(screenDf, tomoDf, mriDf)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (Option(r.getString(2)), Option(r.getString(3)),
            Option(r.getString(4)), Option(r.getString(5))))
        .toMap

      for {
        subject <- screen.map(_.subject).distinct
        lat <- Seq(Some("R"), Some("L"), None)
      } {
        val want = SequentialReference.truthLabels(subject, lat, screen, dbtRows, mriRows)
        val key = (subject, lat.getOrElse(Ea1141Pipeline.NoLaterality))
        assert(got(key) === want,
          s"seed=$seed divergence at subject=$subject lat=$lat: got=${got(key)} want=$want")
      }
    }
  }
}
