package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryUtil._

/** Oracle-verified queries over the four clinical tables the reference
  * code never reads but publishes as part of its data model
  * (`EA1141-...-Dictionaries.zip`; FIXTURES.md §A): baseline
  * demographics, the BCSC risk model (the only true-float table), and
  * the 6-/12-month follow-up tables with their `*_DAYS` day-offset
  * pairs — the first things a real EA1141 user would query next.
  *
  * Parsing follows the REFERENCE's own semantic (naive comma split,
  * `SUBJECT_DE` = last field — `generate_mapping.py:61,79,103`), applied
  * identically on both engines: Spark reads raw lines (`spark.read.text`)
  * and splits; the DuckDB twin reads raw lines (`delim='', quote=''`)
  * and splits. This sidesteps CSV-dialect divergence on the demog
  * table's two ragged free-text rows — for which naive splitting is
  * exactly what the reference would have computed.
  *
  * The day columns carry non-numeric sentinels (`N`, `M`); both sides
  * gate on the same `^-?[0-9]+$` regex before casting.
  *
  * The CSVs live only inside the reference zip; [[fixturePath]] is the
  * one-time extraction to a fixed temp dir (driver-side, idempotent — a
  * source-acquisition step, not distributed compute). It is a cached
  * lazy val invoked from job SETUP (Verify/Bench call it before their
  * query loops), so building a query plan performs no filesystem
  * writes; the oracle twin reads the same extracted files.
  *
  * Scale notes: these are classic small-dimension flows. The risk join
  * is dim ⋈ dim at test scale; at 100 TB the same query joins a
  * billion-row fact against these dims — the join keys and aggregate
  * contract (exact DECIMAL sums for the float columns) are unchanged.
  * The as-of join is an equi-join on subject plus a range predicate and
  * a per-key window top-1 — SortMergeJoin on the key, no cartesian.
  */
object ClinicalQueries {

  private[graft] val zipPath =
    "/root/reference/EA1141-Reviewed-Clinical-Data-and-Data-Dictionaries.zip"
  private[graft] val extractDir = "/tmp/graft_ea1141_clinical"

  /** zip entry base name → extracted file name (the demog file is
    * renamed space-free so Hadoop path handling stays trivial). */
  private val tableNames = Map(
    "ea1141_baseline_demog_derived_ birth-year-removed.csv" ->
      "ea1141_baseline_demog_derived.csv",
    "ea1141_bcsc_risk_model.csv" -> "ea1141_bcsc_risk_model.csv",
    "ea1141_6month_fup.csv" -> "ea1141_6month_fup.csv",
    "ea1141_12month_fup.csv" -> "ea1141_12month_fup.csv")

  private val demogCsv = "ea1141_baseline_demog_derived.csv"

  /** Extracted-fixture directory. Evaluating this (once per JVM) is the
    * ONLY filesystem write in this object; call it from job setup. */
  private[graft] lazy val fixturePath: String = { ensureExtracted(); extractDir }

  /** One-time extraction of the clinical CSVs from the reference zip to
    * [[extractDir]] (skipping Mac resource-fork shadows). Idempotent and
    * cheap; synchronized so concurrent callers don't race. */
  private def ensureExtracted(): Unit = synchronized {
    val dir = new java.io.File(extractDir)
    if (tableNames.values.forall(t => new java.io.File(dir, t).exists())) return
    dir.mkdirs()
    val zf = new java.util.zip.ZipFile(zipPath)
    try {
      val entries = zf.entries()
      while (entries.hasMoreElements) {
        val e = entries.nextElement()
        val base = e.getName.split("/").last
        if (!e.isDirectory && !e.getName.contains("__MACOSX")
            && tableNames.contains(base)) {
          val out = new java.io.File(dir, tableNames(base))
          java.nio.file.Files.copy(zf.getInputStream(e), out.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }
    } finally zf.close()
  }

  /** Raw-line scan + naive comma split: one row per data line, column
    * `f` = array of fields (1-based via element_at; -1 = SUBJECT_DE). */
  private def rawFields(s: SparkSession, file: String, headerPrefix: String): DataFrame = {
    s.read.text(s"$fixturePath/$file")
      .filter(!col("value").startsWith(headerPrefix))
      .select(split(col("value"), ",").as("f"))
  }

  private def fld(i: Int): Column = element_at(col("f"), i)
  private val subjectDe: Column = element_at(col("f"), -1)

  /** Day-offset columns hold `N`/`M` sentinels; gate on the numeric
    * regex (identical in Java and RE2) before the int cast. */
  private def numDays(c: Column): Column =
    when(c.rlike("^-?[0-9]+$"), c.cast(IntegerType))

  private def sqlLines(file: String, headerPrefix: String): String =
    s"""SELECT string_split(value, ',') AS f
       |  FROM read_csv('$extractDir/$file', delim='', quote='', header=false, columns={'value':'VARCHAR'})
       |  WHERE value NOT LIKE '$headerPrefix%'""".stripMargin

  private def sqlNum(x: String): String =
    s"CASE WHEN regexp_matches($x, '^-?[0-9]+$$') THEN CAST($x AS INTEGER) END"

  private def sqlDec(x: String): String =
    s"CASE WHEN $x IN ('N','.N','.M','.F') THEN NULL ELSE $x END"

  val defs: Map[String, Q] = Map(
    // Demographics ⋈ BCSC risk model on SUBJECT_DE: per (arm, breast
    // density) cohort sizes, family-history counts, and the 5/10-year
    // risk-score means — floats routed through exact DECIMAL(28,12) sums
    // (the scores carry 10 fractional digits; the (18,4) dsum contract
    // would round them).
    "q_risk_join" -> ((s, d) => {
      val demog = rawFields(s, demogCsv, "ENROLLING_IN_DE")
        .select(fld(6).as("arm"), fld(15).as("density"), subjectDe.as("subject_de"))
      val dec = graft.pipeline.ClinicalCsv.decodeSentinels _
      val risk = rawFields(s, "ea1141_bcsc_risk_model.csv", "BCSC_AGE")
        .select(dec(fld(6)).as("r5"), dec(fld(7)).as("r10"),
          fld(3).as("fd"), subjectDe.as("subject_de"))
      demog.join(risk, Seq("subject_de"))
        .groupBy(col("arm"), col("density"))
        .agg(
          count(lit(1)).as("n_subjects"),
          sum(when(col("fd") === "1", 1).otherwise(0)).as("n_firstdegree"),
          (sum(col("r5").cast(DecimalType(28, 12))).cast(DoubleType) / count(col("r5")))
            .as("avg_5yr"),
          (sum(col("r10").cast(DecimalType(28, 12))).cast(DoubleType) / count(col("r10")))
            .as("avg_10yr"))
        .orderBy(col("arm"), col("density"))
    }),

    // As-of join across the follow-up tables: every 12-month-window
    // event (visit / year-1 tomo / year-1 MRI / cancer date) matched to
    // the LATEST 6-month-window event at or before it (per subject),
    // with the day gap. Left join keeps events with no prior record.
    "q_fup_asof" -> ((s, d) => {
      def events(file: String, hdr: String, out: String,
          cols: Seq[(String, Int)]): DataFrame = {
        val raw = rawFields(s, file, hdr)
        cols.map { case (etype, i) =>
          raw.select(subjectDe.as("subject_de"),
            lit(etype).as(s"${out}_type"), numDays(fld(i)).as(s"${out}_days"))
        }.reduce(_ unionAll _).filter(col(s"${out}_days").isNotNull)
      }
      val e6 = events("ea1141_6month_fup.csv", "FUP_6MO", "asof",
        Seq("visit_6mo" -> 5, "ra_6mo" -> 7, "cancer_6mo" -> 10))
        .withColumnRenamed("subject_de", "subject_de_6")
      val e12 = events("ea1141_12month_fup.csv", "FUP_12MO", "event",
        Seq("visit_12mo" -> 5, "tomo_yr1" -> 21, "mri_yr1" -> 26, "cancer_12mo" -> 12))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("subject_de"), col("event_type"))
        .orderBy(col("asof_days").desc, col("asof_type").desc)
      e12.join(e6, col("subject_de_6") === col("subject_de") &&
          col("asof_days") <= col("event_days"), "left")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("subject_de"), col("event_type"), col("event_days"),
          col("asof_type"), col("asof_days"),
          (col("event_days") - col("asof_days")).as("gap_days"))
        .orderBy(col("subject_de"), col("event_type"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_risk_join" ->
      s"""WITH demog_raw AS (${sqlLines(demogCsv, "ENROLLING_IN_DE")}),
         |demog AS (SELECT f[6] AS arm, f[15] AS density, f[-1] AS subject_de FROM demog_raw),
         |risk_raw AS (${sqlLines("ea1141_bcsc_risk_model.csv", "BCSC_AGE")}),
         |risk AS (SELECT ${sqlDec("f[6]")} AS r5, ${sqlDec("f[7]")} AS r10,
         |  f[3] AS fd, f[-1] AS subject_de FROM risk_raw)
         |SELECT arm, density, COUNT(*) AS n_subjects,
         |  CAST(SUM(CASE WHEN fd = '1' THEN 1 ELSE 0 END) AS BIGINT) AS n_firstdegree,
         |  CAST(SUM(CAST(r5 AS DECIMAL(28,12))) AS DOUBLE) / COUNT(r5) AS avg_5yr,
         |  CAST(SUM(CAST(r10 AS DECIMAL(28,12))) AS DOUBLE) / COUNT(r10) AS avg_10yr
         |FROM demog JOIN risk USING (subject_de)
         |GROUP BY arm, density
         |ORDER BY arm NULLS FIRST, density NULLS FIRST""".stripMargin,

    "q_fup_asof" ->
      s"""WITH f6_raw AS (${sqlLines("ea1141_6month_fup.csv", "FUP_6MO")}),
         |f12_raw AS (${sqlLines("ea1141_12month_fup.csv", "FUP_12MO")}),
         |e6 AS (
         |  SELECT f[-1] AS subject_de, t.asof_type, t.d AS asof_days
         |  FROM f6_raw, LATERAL (VALUES
         |    ('visit_6mo', ${sqlNum("f[5]")}),
         |    ('ra_6mo', ${sqlNum("f[7]")}),
         |    ('cancer_6mo', ${sqlNum("f[10]")})) t(asof_type, d)
         |  WHERE t.d IS NOT NULL),
         |e12 AS (
         |  SELECT f[-1] AS subject_de, t.event_type, t.d AS event_days
         |  FROM f12_raw, LATERAL (VALUES
         |    ('visit_12mo', ${sqlNum("f[5]")}),
         |    ('tomo_yr1', ${sqlNum("f[21]")}),
         |    ('mri_yr1', ${sqlNum("f[26]")}),
         |    ('cancer_12mo', ${sqlNum("f[12]")})) t(event_type, d)
         |  WHERE t.d IS NOT NULL),
         |joined AS (
         |  SELECT e12.subject_de, e12.event_type, e12.event_days, e6.asof_type, e6.asof_days
         |  FROM e12 LEFT JOIN e6 ON e6.subject_de = e12.subject_de
         |    AND e6.asof_days <= e12.event_days),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY subject_de, event_type
         |    ORDER BY asof_days DESC, asof_type DESC) AS rn
         |  FROM joined)
         |SELECT subject_de, event_type, event_days, asof_type, asof_days,
         |  event_days - asof_days AS gap_days
         |FROM ranked WHERE rn = 1
         |ORDER BY subject_de, event_type""".stripMargin
  )
}
