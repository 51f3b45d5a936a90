package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables
import graft.functions.GraftFunctions

/** Same-JVM A/B for the round-10 squared-L2 kernel swap (composed
  * `aggregate(zip_with((x-y)²))` → fused codegen
  * [[graft.functions.SquaredL2]]) on its hot shape: the recall gates'
  * exact ground-truth ranking — |probes| × |corpus| L2 products through
  * a broadcast nested loop, then the per-probe top-K window (the
  * exactL2TopK form, reconstructed verbatim with each kernel).
  * Run: `runMain graft.queries.AbSqL2 <dir> [reps] [nProbes]`.
  */
object AbSqL2 {

  private def composedD2(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b,
        (x, y) => (x.cast(DoubleType) - y.cast(DoubleType)) *
          (x.cast(DoubleType) - y.cast(DoubleType))),
      lit(0.0), (acc, x) => acc + x)

  private def topK(s: SparkSession, d: String, nProbes: Int,
      d2: (Column, Column) => Column): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a")).orderBy(col("d2"), col("id_b"))
    b.join(broadcast(q), col("id_a") =!= col("id_b"))
      .withColumn("d2", d2(col("emb_a"), col("emb_b")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("id_a"), col("rn"), col("id_b"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val nProbes = args.lift(2).map(_.toInt).getOrElse(40)
    val spark = AbHarness.session()
    AbHarness.run(Seq(
      "composed" -> (() => topK(spark, dir, nProbes, composedD2)),
      "native" -> (() => topK(spark, dir, nProbes,
        (a, b) => GraftFunctions.sq_l2(a, b)))), reps, "sql2")
    spark.stop()
  }
}
