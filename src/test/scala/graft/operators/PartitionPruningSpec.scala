package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Partitioned layout + partition pruning (SCALE.md "Ground rules"): at
  * 100 TB lineitem would be laid out by ship-month; a month-filtered
  * query must touch only that month's files. Proven here by writing a
  * partitioned copy and inspecting the scan.
  */
class PartitionPruningSpec extends SparkTestBase {

  test("month-partitioned layout prunes the scan to the filtered partition") {
    val dir = java.nio.file.Files.createTempDirectory("li_part").toString
    Tables.lineitem(spark, sf())
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .write.mode("overwrite").partitionBy("ship_month").parquet(dir)

    val months = spark.read.parquet(dir)
      .select("ship_month").distinct().count()
    assert(months > 10, s"expected many month partitions, got $months")

    val q = spark.read.parquet(dir)
      .filter(col("ship_month") === "2000-06")
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = q.queryExecution.executedPlan.toString
    // partition filter present, and file selection restricted to 1 of N
    assert(plan.contains("PartitionFilters: [isnotnull(ship_month"),
      s"no partition filter:\n$plan")
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(scanned.contains(1), s"expected exactly 1 partition scanned, got $scanned")
  }
}
