package graft.functions

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins [[SetIntersectSize]] against `size(array_intersect(a, b))` —
  * including the duplicate-element and null-element semantics the
  * general contract promises, not just the distinct shingle domain. */
class SetIntersectSizeSpec extends SparkTestBase {
  import spark.implicits._

  test("== size(array_intersect) on random arrays with duplicates and nulls") {
    val rnd = new scala.util.Random(11)
    def arr(): Seq[Option[Long]] = Seq.fill(rnd.nextInt(30))(
      if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(12).toLong))
    val rows = Seq.fill(800)((arr(), arr())).toDF("a", "b")
    val both = rows.select(
      GraftFunctions.set_intersect_size(col("a"), col("b")).as("x"),
      size(array_intersect(col("a"), col("b"))).as("y"))
    assert(both.filter(not(col("x") <=> col("y"))).count() === 0)
  }

  test("== size(array_intersect) on the real shingle domain") {
    val sh = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), GraftFunctions.hashed_shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val pairs = sh.limit(60).select(col("sh").as("a"))
      .crossJoin(sh.limit(60).select(col("sh").as("b")))
    val both = pairs.select(
      GraftFunctions.set_intersect_size(col("a"), col("b")).as("x"),
      size(array_intersect(col("a"), col("b"))).as("y"))
    assert(both.filter(not(col("x") <=> col("y"))).count() === 0)
    assert(both.count() > 0)
  }

  test("self-intersection = distinct cardinality; codegen participates") {
    val df = spark.read.parquet(sf() + "/documents.parquet")
      .select(GraftFunctions.hashed_shingles(col("text")).as("sh"))
      .select(
        GraftFunctions.set_intersect_size(col("sh"), col("sh")).as("x"),
        size(array_distinct(col("sh"))).as("y"))
    assert(df.filter(col("x") =!= col("y")).count() === 0)
    assert(df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }.nonEmpty)
  }
}
