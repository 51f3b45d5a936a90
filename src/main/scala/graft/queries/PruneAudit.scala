package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkEntry

/** Dev diagnostic, the column/predicate sibling of [[ScanAudit]]: for
  * every query's executed plan, inspect each parquet scan node and
  * flag
  *
  *   - FULL-WIDTH: the scan reads EVERY column of a table with >= 5
  *     columns (column pruning failed or the query genuinely needs the
  *     whole row — triage decides; at 100 TB an unpruned lineitem or
  *     documents scan reads multiples of the needed bytes),
  *   - UNPUSHED: the scan carries post-scan data filters but the
  *     parquet reader received NO pushed filters (predicate pushdown
  *     failed entirely — row-group min/max skipping is lost),
  *   - WIDE-TEXT: the scan reads `documents.text` (the corpus-mass
  *     column); legitimate for tokenizing queries, a defect for any
  *     query that only needs metadata.
  *
  * Per scan it prints table, readCols/totalCols, #dataFilters,
  * #pushedFilters so un-flagged rows are auditable too. ReusedExchange
  * subtrees are collected once by `collect` on the reused child, so
  * shared scans are not double-counted. Run:
  * `runMain graft.queries.PruneAudit [sfDir] [-v]`.
  */
object PruneAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val verbose = args.contains("-v")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE wraps the physical plan in AdaptiveSparkPlanExec, whose
      // inner plan `collect` does not traverse; this audit only PLANS
      // (never runs) the queries, so turning AQE off just exposes the
      // scan nodes without changing what is audited.
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ClinicalQueries.fixturePath
    graft.sources.DicomFixtures.ensure()
    try graft.Tables.documentsSpread(spark, sfDir) catch { case _: Throwable => () }
    val table = "([A-Za-z0-9_]+)\\.(parquet|csv|orc)".r

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val scans = plan.collectWithSubqueries {
          case f: FileSourceScanExec => f
        }
        val rows = scans.map { f =>
          val paths = f.relation.location.rootPaths.map(_.toString).mkString(",")
          val tbl = table.findFirstMatchIn(paths).map(_.group(1))
            .getOrElse(paths.split('/').lastOption.getOrElse("?"))
          val total = f.relation.dataSchema.size
          val read = f.requiredSchema.size
          val readNames = f.requiredSchema.fieldNames.toSet
          val pushed = f.metadata.getOrElse("PushedFilters", "[]")
          // count TOP-LEVEL commas only: a filter whose rendering
          // itself contains commas (In(x, [1,2,3])) must count once
          // (round-10 advice; the UNPUSHED flag is nPushed==0 either way)
          val nPushed =
            if (pushed == "[]") 0
            else {
              var depth = 0; var n = 1
              pushed.drop(1).dropRight(1).foreach {
                case '(' | '[' => depth += 1
                case ')' | ']' => depth -= 1
                case ',' if depth == 0 => n += 1
                case _ => ()
              }
              n
            }
          val flags = Seq(
            if (read == total && total >= 5) Some("FULL-WIDTH") else None,
            if (f.dataFilters.nonEmpty && nPushed == 0) Some("UNPUSHED") else None,
            if (tbl == "documents" && readNames.contains("text")) Some("WIDE-TEXT") else None
          ).flatten
          // the unpushed predicates themselves — what triage reads
          val dfSql =
            if (flags.contains("UNPUSHED"))
              f.dataFilters.map(_.sql).mkString(" && ").take(120)
            else ""
          (tbl, read, total, f.dataFilters.size, nPushed, flags, dfSql)
        }
        val flagged = rows.filter(_._6.nonEmpty)
        val v2 = plan.collect { case b: BatchScanExec => b }
        if (flagged.nonEmpty)
          println(s"[prune-audit] $name: " + flagged.map {
            case (t, r, tot, df, pf, fl, sql) =>
              s"$t $r/$tot cols df=$df pushed=$pf ${fl.mkString("+")}" +
                (if (sql.nonEmpty) s" <$sql>" else "")
          }.mkString(" | "))
        else if (verbose)
          println(s"[prune-audit] $name ok: " + rows.map {
            case (t, r, tot, df, pf, _, _) => s"$t $r/$tot pushed=$pf"
          }.mkString(" | ") +
            (if (v2.nonEmpty) s" | v2 scans=${v2.size}" else ""))
      } catch {
        case e: Throwable => println(s"[prune-audit] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
