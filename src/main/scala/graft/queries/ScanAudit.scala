package graft.queries

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev diagnostic: count FileScan nodes PER SOURCE TABLE in every
  * query's executed plan and print queries that scan one parquet more
  * than once. A duplicate scan is legitimate for self-joins (both
  * sides genuinely need the rows) but is a planning smell when two
  * union/join branches re-derive the same aggregate and exchange reuse
  * fails to canonicalize them — the q_interpolate round-9 finding
  * (5.8 → 3.14 s at 100× from removing one such scan). ReusedExchange
  * subtrees print their child once, so reused scans are not counted
  * twice.
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ClinicalQueries.fixturePath
    graft.sources.DicomFixtures.ensure()
    try graft.Tables.documentsSpread(spark, sfDir) catch { case _: Throwable => () }
    val table = "([A-Za-z0-9_]+)\\.(parquet|csv|orc)".r
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val scans = plan.linesIterator.filter(_.contains("FileScan")).toSeq
        val byTable = scans.flatMap(l => table.findFirstMatchIn(l).map(_.group(1)))
          .groupBy(identity).view.mapValues(_.size).toMap
        val dups = byTable.filter(_._2 > 1)
        if (dups.nonEmpty)
          println(s"[scan-audit] $name: " +
            dups.toSeq.sortBy(-_._2).map { case (t, n) => s"$t x$n" }.mkString(", "))
      } catch {
        case e: Throwable => println(s"[scan-audit] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
