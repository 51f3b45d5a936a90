package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The EA1141 ETL + label-query pipeline, recomposed from relational
  * operators (SURVEY.md §3, entry points 1-3).
  *
  * Reference: `/root/reference/src/generate_mapping.py` (ETL) and
  * `/root/reference/src/load_ground_truths.py` (label query). This is a
  * re-derivation of the reference's SEMANTICS as Spark DataFrame
  * programs; the reference's per-volume re-scan of every CSV
  * (`generate_mapping.py:39-44` inside the loop at `:115-142`,
  * O(volumes × rows)) is replaced by a truth-label dimension computed
  * once and joined (SURVEY.md §2.1 "anti-pattern").
  *
  * Faithfulness notes (each encodes an observed reference behavior):
  *   - F2 null-KEEPING filter: Python `SliceThickness != 10` keeps None;
  *     the Spark form is the negated null-safe equality `!(a <=> 10)`
  *     (`generate_mapping.py:135`).
  *   - J4 fold (`generate_mapping.py:59-92`): every lesion row of a
  *     subject either classifies (laterality match, LAST write wins) or
  *     erases BOTH the screening BIRADS and the biopsy (mismatch). Net
  *     semantics: BIRADS survives iff NO mismatching row exists; biopsy
  *     comes from the final row iff that row matches. Both reductions
  *     are order-safe aggregates (`bool_or`, `max_by(_, row_id)`), so no
  *     sequential scan is needed — but `row_id` must reflect CSV file
  *     order (see [[ClinicalCsv.withRowId]]).
  *   - D1/D2 string comparison: BIRADS codes compare LEXICOGRAPHICALLY
  *     (`load_ground_truths.py:29,32` uses Python `max`/`>` on strings).
  *     Kept as string comparison here — identical to Python because the
  *     observed domain is single-digit strings.
  *   - Python truthiness (`load_ground_truths.py:36`): `if global_birads`
  *     drops None AND empty string — both encoded.
  */
object Ea1141Pipeline {

  /** Laterality bucket for volumes whose FrameLaterality is null or not
    * L/R: `check_laterality` (`generate_mapping.py:31-34`) returns False
    * for every lesion row, which this sentinel key reproduces. */
  val NoLaterality = "?"

  val BenignMarkers: Seq[String] = Seq(
    "BIRADS 1", "BIRADS 2", "BIRADS 3", "Benign", "No biopsy",
    "BI-RADS score downgraded")
  val MalignantMarkers: Seq[String] = Seq("Invasive", "DCIS")

  /** C1 substring-set classifier (`generate_mapping.py:52-55,63-70`):
    * benign markers tested first, then malignant, else UNKNOWN. */
  def classifyOutcome(outcome: Column): Column =
    when(BenignMarkers.map(outcome.contains).reduce(_ || _), "BENIGN")
      .when(MalignantMarkers.map(outcome.contains).reduce(_ || _), "MALIGNANT")
      .otherwise("UNKNOWN")

  /** J3 laterality decode (`generate_mapping.py:31-34`): lesion code '1'
    * means Right, '2' means Left (NCI data dictionary). */
  private def lateralityMatches(imgLat: Column, code: Column): Column =
    (imgLat === "R" && code === "1") || (imgLat === "L" && code === "2")

  /** J4 fold over one modality's lesion table, evaluated for every
    * image-laterality bucket at once.
    *
    * Input columns: SUBJECT_DE, `latCol` (code '1'/'2'), `outcomeCol`
    * (free text), row_id (file order). Output per (subject, img_lat):
    *   - has_mismatch: a lesion row with non-matching laterality exists
    *     (=> the screening BIRADS is erased, `generate_mapping.py:74-75`)
    *   - biopsy: classified outcome of the LAST row iff it matches
    *     (`generate_mapping.py:63-70`, last write wins)
    */
  def foldLesions(lesions: DataFrame, latCol: String, outcomeCol: String): DataFrame = {
    lesions
      .select(col("SUBJECT_DE").as("subject"), col(latCol).as("lat_code"),
        col(outcomeCol).as("outcome"), col("row_id"))
      .withColumn("img_lat", explode(array(lit("R"), lit("L"), lit(NoLaterality))))
      .withColumn("matched",
        coalesce(lateralityMatches(col("img_lat"), col("lat_code")), lit(false)))
      .groupBy(col("subject"), col("img_lat"))
      .agg(
        max(when(!col("matched"), lit(1)).otherwise(lit(0))).as("has_mismatch"),
        max_by(struct(col("matched"), col("outcome")), col("row_id")).as("last"))
      .select(col("subject"), col("img_lat"), col("has_mismatch") === 1,
        col("last.matched"), col("last.outcome"))
      .toDF("subject", "img_lat", "has_mismatch", "last_matched", "last_outcome")
      .withColumn("biopsy",
        when(col("last_matched"), classifyOutcome(col("last_outcome"))))
      .drop("last_matched", "last_outcome")
  }

  /** The truth-label dimension: (Subject_DE, img_lat) ->
    * (DBT_BIRADS, DBT_Outcome, MRI_BIRADS, MRI_Outcome).
    *
    * Computed ONCE from the three clinical tables (vs the reference's
    * per-volume rescan) and broadcast-joined to the volume stream.
    * Build side: J2 first-row-wins screening dedup
    * (`generate_mapping.py:106` setdefault) via min_by(row_id).
    */
  def truthLabels(screening: DataFrame, tomoLesions: DataFrame,
      mriLesions: DataFrame): DataFrame = {
    val firstScreen = screening
      .groupBy(col("SUBJECT_DE").as("subject"))
      .agg(
        min_by(struct(col("TOMO_BIRADS_YR0"), col("MRI_BIRADS_YR0")), col("row_id"))
          .as("s"))
      .select(col("subject"),
        col("s.TOMO_BIRADS_YR0").as("screen_dbt"),
        col("s.MRI_BIRADS_YR0").as("screen_mri"))
      .withColumn("img_lat", explode(array(lit("R"), lit("L"), lit(NoLaterality))))

    val dbt = foldLesions(tomoLesions, "TOMO_LESIONBREAST_YR0", "TOMO_LESIONOUTCOME_YR0")
      .toDF("subject", "img_lat", "dbt_mismatch", "dbt_biopsy")
    val mri = foldLesions(mriLesions, "MRI_LESIONBREAST_YR0", "MRI_LESIONOUTCOME_YR0")
      .toDF("subject", "img_lat", "mri_mismatch", "mri_biopsy")

    firstScreen
      .join(dbt, Seq("subject", "img_lat"), "left")
      .join(mri, Seq("subject", "img_lat"), "left")
      .select(
        col("subject").as("Subject_DE"), col("img_lat"),
        when(coalesce(col("dbt_mismatch"), lit(false)), lit(null: String))
          .otherwise(col("screen_dbt")).as("DBT_BIRADS"),
        col("dbt_biopsy").as("DBT_Outcome"),
        when(coalesce(col("mri_mismatch"), lit(false)), lit(null: String))
          .otherwise(col("screen_mri")).as("MRI_BIRADS"),
        col("mri_biopsy").as("MRI_Outcome"))
  }

  /** Entry point 1 (`get_ea1141_dbt_mapping`, `generate_mapping.py:111-156`):
    * volume metadata -> filters F1+F2 -> Subject_DE/laterality derivation
    * -> broadcast join against the truth dimension -> mapping records.
    *
    * `volumes` carries the extracted DICOM metadata columns:
    * SOPInstanceUID, PatientID, StudyInstanceUID, SeriesInstanceUID,
    * ImageShape (array<int>), SeriesDescription, Modality,
    * SliceThickness (int, nullable), ViewModifier (string, nullable),
    * FrameLaterality (string, nullable), ImagePath.
    *
    * Scale: the truth dimension is O(subjects) rows — broadcast; the
    * volume side streams through map-side with zero shuffles.
    */
  def buildMapping(volumes: DataFrame, screening: DataFrame,
      tomoLesions: DataFrame, mriLesions: DataFrame,
      imageRoot: String = ""): DataFrame = {
    val truth = truthLabels(screening, tomoLesions, mriLesions)
    val filtered = volumes
      // F1 (`generate_mapping.py:118`)
      .filter(col("Modality") === "MG" && size(col("ImageShape")) === 3 &&
        !col("SeriesDescription").contains("Projection"))
      // F2 null-KEEPING (`generate_mapping.py:135`)
      .filter(!(col("SliceThickness") <=> 10) &&
        !(col("ViewModifier") <=> "Spot Compression"))
      // P1 (`generate_mapping.py:141`)
      .withColumn("Subject_DE", substring_index(col("PatientID"), "-", -1))
      .withColumn("img_lat",
        when(col("FrameLaterality").isin("R", "L"), col("FrameLaterality"))
          .otherwise(NoLaterality))
      // P2 path rebase (`generate_mapping.py:149`, str.replace semantics)
      .withColumn("ImagePath",
        if (imageRoot.nonEmpty)
          regexp_replace(col("ImagePath"),
            lit(java.util.regex.Pattern.quote(imageRoot)),
            lit(java.util.regex.Matcher.quoteReplacement("$ROOT$/")))
        else col("ImagePath"))
    filtered
      .join(broadcast(truth), Seq("Subject_DE", "img_lat"), "left")
      .select(
        col("SOPInstanceUID").as("uid"), col("PatientID"),
        col("StudyInstanceUID"), col("SeriesInstanceUID"), col("ImageShape"),
        col("SeriesDescription"), col("FrameLaterality"), col("ImagePath"),
        col("Subject_DE"), col("DBT_BIRADS"), col("MRI_BIRADS"),
        col("DBT_Outcome"), col("MRI_Outcome"))
  }

  /** Entry point 3 (`get_ea1141_dbt_truths`, `load_ground_truths.py:3-81`):
    * the label query over the mapping, 2 gt_types × 3 scopes × dbt_only ×
    * mri_excluded = 24 parameterizations.
    *
    * Output: key, uids (array, sorted by uid for determinism — the
    * reference preserves insertion order; multiset-equal), truth
    * (array of [benign=1,0]/[malignant=0,1] one-hot pairs, co-sorted).
    */
  def groundTruths(mapping: DataFrame, gtType: String = "biopsy",
      scope: String = "volume-wise", dbtOnly: Boolean = true,
      mriExcluded: Boolean = true): DataFrame = {
    require(gtType == "biopsy" || gtType == "acr4+",
      s"The gt_type:$gtType is not yet handle.") // D6 (`load_ground_truths.py:64-65`)
    require(Seq("volume-wise", "breast-wise", "patient-wise").contains(scope),
      s"The scope: $scope is not yet handle.")

    // F3 (`load_ground_truths.py:27`)
    val m = mapping.filter(col("DBT_BIRADS").isNotNull && col("MRI_BIRADS").isNotNull)

    // D1/D2 — STRING comparisons, as in Python (`load_ground_truths.py:28-34`)
    val gBiradsS =
      if (!dbtOnly) greatest(col("DBT_BIRADS"), col("MRI_BIRADS"))
      else if (mriExcluded)
        when(col("MRI_BIRADS") > col("DBT_BIRADS"), lit(null: String))
          .otherwise(col("DBT_BIRADS"))
      else col("DBT_BIRADS")

    // F4 Python truthiness + D3 cast (`load_ground_truths.py:36-38`)
    val g1 = m.withColumn("gb_s", gBiradsS)
      .filter(col("gb_s").isNotNull && col("gb_s") =!= "")
      .withColumn("global_birads", col("gb_s").cast(IntegerType))

    // D4 / D5 (`load_ground_truths.py:40-63`)
    val outcome: Column = {
      val dbtO = when(col("DBT_Outcome") === "MALIGNANT", 1).otherwise(0)
      val mriO = when(col("MRI_Outcome") === "MALIGNANT", 1).otherwise(0)
      val undesirable = (c: Column) => c.isNull || c === "UNKNOWN"
      val combined =
        if (!dbtOnly) greatest(dbtO, mriO)
        else if (mriExcluded) when(mriO > dbtO, lit(null: Integer)).otherwise(dbtO)
        else dbtO
      when(col("global_birads") < 3, lit(0))
        .when(undesirable(col("DBT_Outcome")) && undesirable(col("MRI_Outcome")),
          lit(null: Integer))
        .otherwise(combined)
    }
    val truth = gtType match {
      case "biopsy" =>
        when(outcome === 1, array(lit(0), lit(1)))
          .when(outcome === 0, array(lit(1), lit(0)))
      case "acr4+" =>
        when(col("global_birads") > 3, array(lit(0), lit(1)))
          .otherwise(array(lit(1), lit(0)))
    }
    val g2 = g1.withColumn("truth", truth).filter(col("truth").isNotNull)

    // K1 re-key (`load_ground_truths.py:68-77`) — key format follows the
    // CODE (underscores + study dir), not the docstring (SURVEY.md §2.1).
    val studyDir = element_at(split(col("ImagePath"), "/"), -2)
    val key = scope match {
      case "volume-wise"  => col("uid")
      case "breast-wise"  =>
        // The reference raises AttributeError on a null laterality
        // (`load_ground_truths.py:73`, laterality.upper() on None); fail
        // loudly too rather than silently emitting a patient-wise-shaped
        // key (concat_ws would skip the null).
        concat_ws("_", col("Subject_DE"), studyDir,
          when(col("FrameLaterality").isNull,
            raise_error(lit("breast-wise scope requires non-null FrameLaterality")))
            .otherwise(upper(col("FrameLaterality"))))
      case "patient-wise" => concat_ws("_", col("Subject_DE"), studyDir)
    }

    // G1 group-collect (`load_ground_truths.py:78-80`)
    g2.withColumn("key", key)
      .groupBy(col("key"))
      .agg(sort_array(collect_list(struct(col("uid"), col("truth")))).as("entries"))
      .select(
        col("key"),
        transform(col("entries"), e => e.getField("uid")).as("uids"),
        transform(col("entries"), e => e.getField("truth")).as("truth"))
  }
}
