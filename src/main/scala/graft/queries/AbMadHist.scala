package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Stage pricing for the round-14 q_mad_outliers histogram re-shape:
  * times each building block in isolation (noop sink) so the slow leg
  * is identified by measurement, not guesswork.
  * Run: `runMain graft.queries.AbMadHist <dir> [reps]`.
  */
object AbMadHist {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        sec
      }
      println(f"[ab] $name%-28s ${ts.min}%6.2f s  (all: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    def hist = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(count(lit(1)).as("cnt"))

    time("hist-agg")(hist)
    time("hist-checkpoint") { hist.localCheckpoint() }
    time("freq-percentile-med") {
      val h = hist.localCheckpoint()
      h.groupBy(col("l_returnflag"))
        .agg(percentile(col("l_extendedprice"), lit(0.5), col("cnt"))
          .as("med"))
    }
    time("old-median-form") {
      Tables.lineitem(spark, dir)
        .select(col("l_returnflag"), col("l_extendedprice"))
        .groupBy(col("l_returnflag"))
        .agg(median(col("l_extendedprice")).as("med"))
    }
    time("full-q_mad_outliers") {
      graft.SparkEntry.queries("q_mad_outliers")(spark, dir)
    }
    spark.stop()
  }
}
