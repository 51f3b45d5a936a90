package graft.functions

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins [[SquashNonAlnum]] and [[StripNonAlnumPrefix]] bit-identical to
  * the composed regex forms they replace (q_text_normalize /
  * q_sorted_neighborhood key derivation) — on adversarial random
  * strings (multi-byte Unicode, edge whitespace, empty, NULL) and on
  * the real document corpus. */
class SquashNonAlnumSpec extends SparkTestBase {
  import spark.implicits._

  private def squashRegex(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(regexp_replace(c, "[^a-z0-9 ]", " "), " +", " "))

  private def stripRegex(c: org.apache.spark.sql.Column, n: Int) =
    substring(regexp_replace(c, "[^a-z0-9 ]", ""), 1, n)

  /** Random strings over a pool that exercises every equivalence-proof
    * branch: kept runs, ASCII separators, multi-byte codepoints
    * (2/3/4-byte UTF-8), leading/trailing junk, long space runs. */
  private def adversarial(): Seq[String] = {
    val rnd = new scala.util.Random(13)
    val pool = "abz09 AZ!@.,é世界😀K   --\n\t"
    Seq.fill(2000)(Seq.fill(rnd.nextInt(60))(
      pool(rnd.nextInt(pool.length))).mkString) ++
      Seq("", " ", "   ", "a", "!a!", "éé", "aéb",
        " leading", "trailing ", "a  b   c")
  }

  test("squash == trim(regexp_replace(regexp_replace(...))) on adversarial strings") {
    val df = adversarial().toDF("s")
      .select(lower(col("s")).as("t"))
      .select(
        GraftFunctions.squash_non_alnum(col("t")).as("x"),
        squashRegex(col("t")).as("y"))
    assert(df.filter(not(col("x") <=> col("y"))).count() === 0)
  }

  test("strip-prefix == substring(regexp_replace(...), 1, n) on adversarial strings") {
    for (n <- Seq(1, 4, 24)) {
      val df = adversarial().toDF("s")
        .select(lower(col("s")).as("t"))
        .select(
          GraftFunctions.strip_non_alnum_prefix(col("t"), n).as("x"),
          stripRegex(col("t"), n).as("y"))
      assert(df.filter(not(col("x") <=> col("y"))).count() === 0,
        s"mismatch at n=$n")
    }
  }

  test("both == regex forms on the real document corpus; NULL propagates; codegen participates") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
      .select(lower(col("text")).as("t"))
    val df = docs.select(
      GraftFunctions.squash_non_alnum(col("t")).as("x1"),
      squashRegex(col("t")).as("y1"),
      GraftFunctions.strip_non_alnum_prefix(col("t"), 24).as("x2"),
      stripRegex(col("t"), 24).as("y2"))
    assert(df.filter(not(col("x1") <=> col("y1"))
      || not(col("x2") <=> col("y2"))).count() === 0)
    assert(df.count() > 0)
    assert(df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }.nonEmpty)
    val nulls = Seq[Option[String]](None, Some("a!b")).toDF("t")
      .select(GraftFunctions.squash_non_alnum(col("t")).as("x"),
        GraftFunctions.strip_non_alnum_prefix(col("t"), 24).as("p"))
    assert(nulls.filter(col("x").isNull && col("p").isNull).count() === 1)
  }
}
