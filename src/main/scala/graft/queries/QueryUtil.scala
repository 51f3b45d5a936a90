package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for the oracle-checked query library.
  *
  * Determinism contract with the DuckDB oracle (driver compares parquet
  * outputs value-by-value after sorting columns by name):
  *   - Every query ends in a total ORDER BY (unique key last) and the SQL
  *     twin carries the identical ORDER BY with explicit NULLS FIRST to
  *     match Spark's asc default.
  *   - Floating aggregates go through exact DECIMAL sums and are cast to
  *     DOUBLE only at the end: decimal -> double conversion is
  *     round-to-nearest in both engines, so results are bit-identical and
  *     independent of partial-aggregation order (a plain sum(double) is
  *     NOT reproducible across partitionings).
  *   - No raw TIMESTAMP columns in outputs (Spark writes UTC-adjusted
  *     micros, DuckDB naive micros); dates/strings/epoch instead.
  *   - Integer sums are BIGINT on both sides (DuckDB's sum(BIGINT) is
  *     HUGEINT, so the SQL twin casts).
  */
object QueryUtil {
  /** (SparkSession, sfDir) => result — the driver's query signature. */
  type Q = (SparkSession, String) => DataFrame

  /** Exact per-value decimal view of a double column: deterministic
    * (round-half-up at 4 fractional digits, never an exact tie for binary
    * doubles) and makes downstream sums order-independent. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Exact decimal sum surfaced as DOUBLE. Routed through INTEGER CENTS
    * with a SCALE-0 decimal sum: every dsum'd column is 2-decimal money/
    * quantity data, so `round(x*100)` is an exact integral double, the
    * sum is exact, and the final decimal→double conversion has no
    * scaling division — which is what made the old DECIMAL(18,4) form
    * diverge from DuckDB by 1 ulp once sums passed 2^53 ulps (DuckDB
    * converts scaled decimals via multiply-by-inverse, Java by exact
    * rounding; observed on the 10× replica, SCALE.md). The trailing
    * /100.0 divides the SAME exact double in both engines. */
  def dsum(c: Column): Column =
    sum(round(c * 100).cast(DecimalType(38, 0))).cast(DoubleType) / 100.0

  /** Deterministic average: exact cents sum, double division. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Exact discounted-revenue sum Σ price·(1−disc) for 2-decimal price
    * and discount: integer units of 10⁻⁴ dollars (cents × percent), same
    * scale-0 route as [[dsum]] — this product was the one remaining
    * scale-4 sum and the source of both 1-ulp 10× residuals. */
  def dsumRev(price: Column, disc: Column): Column =
    sum((round(price * 100) * (lit(100) - round(disc * 100)))
      .cast(DecimalType(38, 0))).cast(DoubleType) / 10000.0

  /** Two-pass exact cumulative sums over a per-distinct-key frame —
    * the scale-safe replacement for a single-task global
    * `Window.orderBy(key)` cumsum. Keys range-bucket by a FIXED width
    * (`key DIV bucketWidth`; keys must be non-negative so DIV == floor):
    * pass 1 cumsums WITHIN each bucket through a window PARTITIONED on
    * the bucket (parallel across B = domain/width buckets); pass 2 adds
    * each bucket's offset — the sum of every earlier bucket's total —
    * computed WINDOW-FREE by exploding each bucket total onto all later
    * buckets (O(B²/2) rows; B is a domain constant, ~60 for the cent
    * domains here, independent of row count) and broadcast-joined back.
    * The 1-row max-bucket broadcast is the same named crossJoin shape as
    * the drift family's (n1,n2) totals frame; the `bkt < maxbkt` filter
    * guards Spark's sequence(a,b) DESCENDING-when-a>b trap for the last
    * bucket. Identical exchanges under the three uses of the input
    * (within / totals / max) collapse via ReuseExchange, so the fact
    * scan below the per-key aggregate still runs once.
    * Output = the input columns + `cum_<c>` for each requested column. */
  def rangeCumsum(perKey: DataFrame, key: String, sumCols: Seq[String],
      bucketWidth: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = perKey.withColumn("_rc_bkt", expr(s"$key DIV $bucketWidth"))
    val wIn = Window.partitionBy(col("_rc_bkt")).orderBy(col(key))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = sumCols.foldLeft(b) { (df, c) =>
      df.withColumn(s"cum_$c", sum(col(c)).over(wIn))
    }
    val tAggs = sumCols.map(c => sum(col(c)).as(s"_rc_t_$c"))
    val totals = b.groupBy(col("_rc_bkt")).agg(tAggs.head, tAggs.tail: _*)
    val mx = b.agg(max(col("_rc_bkt")).as("_rc_maxbkt"))
    val oAggs = sumCols.map(c => sum(col(s"_rc_t_$c")).as(s"_rc_o_$c"))
    val offs = totals.crossJoin(broadcast(mx))
      .filter(col("_rc_bkt") < col("_rc_maxbkt"))
      .select(explode(sequence(col("_rc_bkt") + 1, col("_rc_maxbkt")))
        .as("_rc_bkt") +: sumCols.map(c => col(s"_rc_t_$c")): _*)
      .groupBy(col("_rc_bkt")).agg(oAggs.head, oAggs.tail: _*)
    val outCols = perKey.columns.toSeq.map(col) ++
      sumCols.map(c =>
        (col(s"cum_$c") + coalesce(col(s"_rc_o_$c"), lit(0L))).as(s"cum_$c"))
    within.join(broadcast(offs), Seq("_rc_bkt"), "left").select(outCols: _*)
  }

  /** Write-once shared bucketed layout: persists `build` as a parquet
    * table bucketed (32) + sorted on `bucketCol`, idempotent per sf dir
    * and JVM. Promoted here from GraphQueries in round 8 so any family
    * can amortize an expensive derived frame across its consumers (the
    * graph family's edge projections, the triangle family's support
    * frame, the dedup family's CC labels). At 100 TB this is the
    * standard pre-bucketed derived-table design — the CTAS cost pays
    * once and every downstream reader gets bucket-aligned, exchange-
    * free access; in one local JVM the first query to touch a layout
    * pays the write under this object's lock (reps=2 best-of-best
    * benching excludes it, as documented in SCALE.md). */
  /** Content version of the shared derived layouts. BUMP whenever any
    * sharedTable build recipe changes its OUTPUT (not just its plan):
    * the tag is part of the table/directory name, so a new code
    * version never trusts a warehouse dir built by an older recipe
    * (the reuse path below deliberately skips rebuilding). */
  private val LayoutVersion = "v9"

  private def sharedTableName(d: String, suffix: String): String =
    "graft_" + suffix + "_" + LayoutVersion + "_" +
      d.replaceAll("[^0-9a-zA-Z]", "_")

  def sharedTable(s: SparkSession, d: String, suffix: String,
      bucketCol: String, sortCols: Seq[String])(build: => DataFrame)
      : DataFrame = {
    val tbl = sharedTableName(d, suffix)
    synchronized {
      if (!s.catalog.tableExists(tbl)) {
        // Cross-JVM idempotence protocol (round 9; the old
        // delete-then-CTAS raced when two JVMs — a bench and a verify —
        // both saw tableExists=false in their own in-memory catalogs):
        //   1. each writer stages the bucketed data under a UNIQUE
        //      external location (UUID suffix) — never the final path;
        //   2. the staging dir is atomically RENAMED into the final
        //      location; rename is the commit point, so the final path
        //      either doesn't exist or holds a COMPLETE table —
        //      interrupted runs leave only orphan staging dirs;
        //   3. the rename loser (destination already exists) deletes
        //      its staging dir and registers over the winner's data.
        // Registration is an EXTERNAL bucketed table over the final
        // location, so a later JVM that finds the data in place skips
        // the build entirely (SharedTableSpec pins skip-rebuild,
        // bucket-pruned reads and content equality).
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), tbl.toLowerCase)
        val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        val schemaDdl =
          if (fs.exists(loc)) s.read.parquet(loc.toString).schema.toDDL
          else {
            val stg = tbl + "_stg_" +
              java.util.UUID.randomUUID.toString.replace("-", "")
            val stgLoc = new org.apache.hadoop.fs.Path(
              loc.getParent, stg.toLowerCase)
            val df = build
            df.write.bucketBy(32, bucketCol)
              .sortBy(sortCols.head, sortCols.tail: _*)
              .format("parquet").option("path", stgLoc.toString)
              .saveAsTable(stg)
            s.sql(s"DROP TABLE $stg") // metadata only — table is external
            commitStaged(fs, stgLoc, loc)
            df.schema.toDDL
          }
        s.sql(
          s"""CREATE TABLE $tbl ($schemaDdl) USING parquet
             |CLUSTERED BY ($bucketCol)
             |SORTED BY (${sortCols.mkString(", ")}) INTO 32 BUCKETS
             |LOCATION '${loc.toString}'""".stripMargin)
      }
    }
    s.table(tbl)
  }

  /** Metadata-blind read of a [[sharedTable]] layout: ensures the table
    * exists (building it if needed), then reads its parquet files
    * DIRECTLY by path, discarding the catalog's bucket metadata. The
    * scan returns identical rows but reports no output partitioning, so
    * every downstream join/aggregate must Exchange it — the deliberate
    * anti-lever shape of the flat graph teaching forms. Round-12
    * verdict item 2: the flat q_pagerank/q_ppr used to pay the full
    * lineitem⋈orders edge re-DERIVATION (plus an 80 M-row
    * localCheckpoint) per run — ~20% of the 100× fleet wall and the
    * locus of the GCLocker crashes. Now both twins share ONE
    * materialization and differ only in the per-iteration plan shape,
    * which is the actual lesson the pair exists to teach. */
  def sharedTableUnbucketed(s: SparkSession, d: String, suffix: String,
      bucketCol: String, sortCols: Seq[String])(build: => DataFrame)
      : DataFrame = {
    sharedTable(s, d, suffix, bucketCol, sortCols)(build)
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"),
      sharedTableName(d, suffix).toLowerCase)
    s.read.parquet(loc.toString)
  }

  /** The commit point of the sharedTable protocol: atomically rename
    * the staged dir into the final location, or — having lost the race
    * to another JVM — clean up the loser's data. Package-private so
    * SharedTableSpec can drive the lost-race interleavings directly.
    *
    * The subtle case (round-10 advice): local-FS rename onto a
    * destination that APPEARED between the exists check and the rename
    * call MOVES the source INTO the destination and reports SUCCESS —
    * the lost race is then only visible as our staged dir nested inside
    * the winner's table, where a recursive parquet listing would double
    * every row for all later readers. So the nested-orphan scrub runs
    * UNCONDITIONALLY after every commit attempt, not just on the
    * exists/rename-failure branch (where it was dead code).
    */
  private[queries] def commitStaged(
      fs: org.apache.hadoop.fs.FileSystem,
      stgLoc: org.apache.hadoop.fs.Path,
      loc: org.apache.hadoop.fs.Path): Unit = {
    if (fs.exists(loc) || !fs.rename(stgLoc, loc)) {
      // another JVM committed first; its data is complete
      fs.delete(stgLoc, true)
    }
    val nested = new org.apache.hadoop.fs.Path(loc, stgLoc.getName)
    if (fs.exists(nested)) fs.delete(nested, true)
  }

  /** SQL-side twin fragments (kept next to the Scala forms above). */
  def sqlDsum(x: String): String =
    s"(CAST(SUM(CAST(round(($x) * 100) AS DECIMAL(38,0))) AS DOUBLE) / 100.0)"
  def sqlDavg(x: String): String = s"${sqlDsum(x)} / COUNT($x)"
  def sqlDsumRev(p: String, dc: String): String =
    s"(CAST(SUM(CAST(round(($p) * 100) * (100 - round(($dc) * 100)) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0)"
}
