package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins [[MinHashSlots]] against the composed reference form it
  * replaced in the MinHash family's signature step. */
class MinHashSlotsSpec extends SparkTestBase {
  import spark.implicits._

  private val N = 8

  /** The composed form: slot j = array_min(transform(sh, h =>
    * (hashA(j)*(h%P)+hashB(j))%P)), assembled with the SAME constants
    * object the native expression reads. */
  private def composed(sh: Column): Column = {
    import MinHashSlots.{P, hashA, hashB}
    array((0 until N).map(j =>
      array_min(transform(sh, h => (lit(hashA(j)) * (h % P) + hashB(j)) % P))): _*)
  }

  test("native == composed on random long arrays, bit-exact") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(500)(
      Seq.fill(rnd.nextInt(40) + 1)(rnd.nextLong())).toDF("sh")
    val both = rows.select(
      GraftFunctions.min_hash_slots(col("sh"), N).as("a"),
      composed(col("sh")).as("b"))
    assert(both.filter(not(col("a") <=> col("b"))).count() === 0)
  }

  test("native == composed on the real shingle domain (documents text)") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(GraftFunctions.hashed_shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val both = docs.select(
      GraftFunctions.min_hash_slots(col("sh"), N).as("a"),
      composed(col("sh")).as("b"))
    assert(both.filter(not(col("a") <=> col("b"))).count() === 0)
    assert(both.count() > 0)
  }

  test("empty array yields N null slots, matching the composed form") {
    val row = Seq(Seq.empty[Long]).toDF("sh")
      .select(GraftFunctions.min_hash_slots(col("sh"), N).as("a"),
        composed(col("sh")).as("b"))
      .collect().head
    assert(row.getSeq[Any](0) === Seq.fill(N)(null))
    assert(row.getSeq[Any](0) === row.getSeq[Any](1))
  }

  test("participates in whole-stage codegen") {
    // parquet-backed input: a literal would be constant-folded away
    val df = spark.read.parquet(sf() + "/documents.parquet")
      .select(GraftFunctions.min_hash_slots(
        GraftFunctions.hashed_shingles(col("text")), N).as("sig"))
    val wscg = df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }
    assert(wscg.nonEmpty, df.queryExecution.executedPlan.toString)
    // and it is not a CodegenFallback (the point of the expression)
    assert(!MinHashSlots(
      org.apache.spark.sql.catalyst.expressions.Literal(null),
      N).isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback])
  }
}
