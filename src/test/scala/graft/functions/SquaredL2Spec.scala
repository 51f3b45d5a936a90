package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.SparkTestBase

/** Pins [[SquaredL2]] against the composed form it replaced in the
  * ANN family's exact-L2 reference ranking and PQ assignment. */
class SquaredL2Spec extends SparkTestBase {
  import spark.implicits._

  /** The composed reference: zip_with((cast(x)-cast(y))²) then a
    * left-to-right double fold — exactly the exactL2TopK original. */
  private def composed(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b,
        (x, y) => (x.cast(DoubleType) - y.cast(DoubleType)) *
          (x.cast(DoubleType) - y.cast(DoubleType))),
      lit(0.0), (acc, x) => acc + x)

  test("native == composed on the real embedding domain (float × float)") {
    val e = spark.read.parquet(sf() + "/embeddings.parquet").limit(200)
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("embedding").as("eb")))
      .filter(col("ia") < col("ib")).limit(5000)
    val both = pairs.select(
      GraftFunctions.sq_l2(col("ea"), col("eb")).as("a"),
      composed(col("ea"), col("eb")).as("b"))
    assert(both.filter(not(col("a") <=> col("b"))).count() === 0)
    assert(both.count() > 0)
  }

  test("native == composed on float × double mixes (the PQ assignment shape)") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300)((
      Seq.fill(8)(rnd.nextFloat()),
      Seq.fill(8)(rnd.nextDouble()))).toDF("fv", "dv")
    val both = rows.select(
      GraftFunctions.sq_l2(col("fv"), col("dv")).as("a"),
      composed(col("fv"), col("dv")).as("b"),
      GraftFunctions.sq_l2(col("dv"), col("fv")).as("c"),
      composed(col("dv"), col("fv")).as("d"))
    assert(both.filter(not(col("a") <=> col("b")) ||
      not(col("c") <=> col("d"))).count() === 0)
  }

  test("identity distance is exactly 0.0 and participates in codegen") {
    val df = spark.read.parquet(sf() + "/embeddings.parquet")
      .select(GraftFunctions.sq_l2(col("embedding"), col("embedding")).as("d2"))
    assert(df.filter(col("d2") =!= 0.0).count() === 0)
    val wscg = df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }
    assert(wscg.nonEmpty)
  }
}
