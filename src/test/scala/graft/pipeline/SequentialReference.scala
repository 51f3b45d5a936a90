package graft.pipeline

/** Row-at-a-time re-derivation of the reference pipeline's semantics
  * (`/root/reference/src/generate_mapping.py:31-108`,
  * `/root/reference/src/load_ground_truths.py:3-81`), used as the
  * property/golden-test oracle for the Spark implementation. This is an
  * independent Scala encoding of the documented behavior (SURVEY.md
  * §2.1 J1-J4, C1, D1-D5, K1, G1), not a translation unit of the repo.
  */
object SequentialReference {

  case class LesionRow(subject: String, latCode: String, outcome: String)
  case class ScreenRow(subject: String, dbt: String, mri: String)

  def checkLaterality(imageLat: Option[String], truthLat: String): Boolean =
    (imageLat.contains("R") && truthLat == "1") ||
      (imageLat.contains("L") && truthLat == "2")

  private val benign = Seq("BIRADS 1", "BIRADS 2", "BIRADS 3", "Benign",
    "No biopsy", "BI-RADS score downgraded")
  private val malignant = Seq("Invasive", "DCIS")

  def classify(outcome: String): String =
    if (benign.exists(outcome.contains)) "BENIGN"
    else if (malignant.exists(outcome.contains)) "MALIGNANT"
    else "UNKNOWN"

  /** First-row-wins screening map (setdefault semantics). */
  def globalBirads(rows: Seq[ScreenRow]): Map[String, (String, String)] =
    rows.foldLeft(Map.empty[String, (String, String)]) { (m, r) =>
      if (m.contains(r.subject)) m else m + (r.subject -> (r.dbt, r.mri))
    }

  /** One modality's sequential fold for one (subject, laterality). */
  def foldOne(subject: String, imageLat: Option[String],
      screenValue: Option[String], rows: Seq[LesionRow])
      : (Option[String], Option[String]) = {
    var birads: Option[String] = screenValue
    var biopsy: Option[String] = None
    rows.foreach { r =>
      if (r.subject == subject) {
        if (checkLaterality(imageLat, r.latCode)) {
          biopsy = Some(classify(r.outcome))
        } else {
          birads = None
          biopsy = None
        }
      }
    }
    (birads, biopsy)
  }

  /** get_truth_labels twin: (dbt_birads, dbt_biopsy, mri_birads, mri_biopsy). */
  def truthLabels(subject: String, imageLat: Option[String],
      screening: Seq[ScreenRow], dbtRows: Seq[LesionRow],
      mriRows: Seq[LesionRow])
      : (Option[String], Option[String], Option[String], Option[String]) = {
    val screen = globalBirads(screening).get(subject)
    val (db, dbx) = foldOne(subject, imageLat, screen.map(_._1), dbtRows)
    val (mb, mbx) = foldOne(subject, imageLat, screen.map(_._2), mriRows)
    (db, dbx, mb, mbx)
  }

  case class MappingRecord(
      uid: String,
      subject: String,
      laterality: Option[String],
      imagePath: String,
      dbtBirads: Option[String],
      mriBirads: Option[String],
      dbtOutcome: Option[String],
      mriOutcome: Option[String])

  /** get_ea1141_dbt_truths twin: key -> (uids, one-hot truths), insertion
    * order preserved like the Python dict. */
  def groundTruths(records: Seq[MappingRecord], gtType: String,
      scope: String, dbtOnly: Boolean, mriExcluded: Boolean)
      : Seq[(String, Seq[String], Seq[Seq[Int]])] = {
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[String, (scala.collection.mutable.ArrayBuffer[String],
        scala.collection.mutable.ArrayBuffer[Seq[Int]])]
    records.foreach { r =>
      (r.dbtBirads, r.mriBirads) match {
        case (Some(bd), Some(bm)) =>
          // D1/D2: Python string max / string > (single-digit domain)
          val global: Option[String] =
            if (!dbtOnly) Some(if (bd >= bm) bd else bm)
            else if (mriExcluded) { if (bm > bd) None else Some(bd) }
            else Some(bd)
          global.filter(_.nonEmpty).foreach { gs =>
            val gb = gs.toInt
            val truth: Option[Seq[Int]] = gtType match {
              case "biopsy" =>
                val undesirable = (o: Option[String]) =>
                  o.isEmpty || o.contains("UNKNOWN")
                val outcome: Option[Int] =
                  if (gb < 3) Some(0)
                  else if (undesirable(r.dbtOutcome) && undesirable(r.mriOutcome)) None
                  else {
                    val d = if (r.dbtOutcome.contains("MALIGNANT")) 1 else 0
                    val m = if (r.mriOutcome.contains("MALIGNANT")) 1 else 0
                    if (!dbtOnly) Some(math.max(d, m))
                    else if (mriExcluded) { if (m > d) None else Some(d) }
                    else Some(d)
                  }
                outcome.map(o => if (o == 1) Seq(0, 1) else Seq(1, 0))
              case "acr4+" =>
                Some(if (gb > 3) Seq(0, 1) else Seq(1, 0))
            }
            truth.foreach { t =>
              val studyDir = r.imagePath.split("/").dropRight(1).last
              val key = scope match {
                case "volume-wise"  => r.uid
                case "breast-wise"  =>
                  s"${r.subject}_${studyDir}_${r.laterality.get.toUpperCase}"
                case "patient-wise" => s"${r.subject}_$studyDir"
              }
              val e = acc.getOrElseUpdate(key,
                (scala.collection.mutable.ArrayBuffer.empty,
                  scala.collection.mutable.ArrayBuffer.empty))
              e._1 += r.uid
              e._2 += t
            }
          }
        case _ => ()
      }
    }
    acc.toSeq.map { case (k, (u, t)) => (k, u.toSeq, t.toSeq) }
  }
}
