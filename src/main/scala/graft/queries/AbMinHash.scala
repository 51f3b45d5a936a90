package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables
import graft.functions.{GraftFunctions, MinHashSlots}

/** Same-JVM A/B for the round-10 MinHash signature kernel swap
  * (composed `array((0..n).map(j => array_min(transform(sh, ...))))` →
  * fused codegen [[graft.functions.MinHashSlots]]).
  *
  * Sections (`runMain graft.queries.AbMinHash <section> <dir> [reps]`):
  *   - `kernel`: doc_id + signature only — the isolated expression
  *     cost, downstream noise excluded.
  *   - `e2e`: the full verifiedPairs LSH pipeline (banding → capped
  *     bucket pairs → exact-jaccard verify) with each signature form —
  *     what the gated queries actually pay.
  *
  * The composed form is reconstructed verbatim from the constants
  * object, so the A/B stays honest if the constants ever change.
  */
object AbMinHash {

  private val NUM_HASHES = 8
  private val BANDS = 4

  private def composedSig(sh: Column): Column = {
    import MinHashSlots.{P, hashA, hashB}
    array((0 until NUM_HASHES).map(j =>
      array_min(transform(sh, h => (lit(hashA(j)) * (h % P) + hashB(j)) % P))): _*)
  }

  private def nativeSig(sh: Column): Column =
    GraftFunctions.min_hash_slots(sh, NUM_HASHES)

  private def shingled(s: SparkSession, d: String): DataFrame =
    DedupQueries.docShinglesOf(Tables.documentsSpread(s, d))

  /** bandedSignaturesOf with a pluggable signature expression. */
  private def banded(docs: DataFrame, sig: Column => Column): DataFrame =
    docs
      .withColumn("sig", sig(col("sh")))
      .select(col("doc_id"),
        explode(array((0 until BANDS).map(b => struct(
          lit(b).as("band"),
          concat_ws("_", element_at(col("sig"), 2 * b + 1),
            element_at(col("sig"), 2 * b + 2)).as("band_key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.band_key"))

  /** verifiedPairsOf with pluggable signature AND intersect kernels. */
  private def e2e(s: SparkSession, d: String, sig: Column => Column,
      interOf: (Column, Column) => Column =
        GraftFunctions.set_intersect_size): DataFrame = {
    val docs = shingled(s, d)
    val pairs = DedupQueries.cappedBucketPairs(banded(docs, sig))
    val sh = docs.select(col("doc_id"), col("sh"))
    val joined = pairs
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
    val inter = interOf(col("sh_a"), col("sh_b"))
    val uni = size(col("sh_a")) + size(col("sh_b")) - inter
    joined.select(col("id_a"), col("id_b"),
        (inter.cast(DoubleType) / uni.cast(DoubleType)).as("jaccard"))
      .filter(col("jaccard") >= 0.2)
  }

  def main(args: Array[String]): Unit = {
    val section = args.headOption.getOrElse("kernel")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = AbHarness.session()
    val forms: Seq[(String, () => DataFrame)] = section match {
      case "kernel" => Seq(
        "composed" -> (() => shingled(spark, dir).select(col("doc_id"),
          composedSig(col("sh")).as("sig"))),
        "native" -> (() => shingled(spark, dir).select(col("doc_id"),
          nativeSig(col("sh")).as("sig"))))
      case "e2e" => Seq(
        "composed" -> (() => e2e(spark, dir, composedSig)),
        "native" -> (() => e2e(spark, dir, nativeSig)))
      // verify-kernel A/B: identical candidates (native sig both
      // sides), composed size(array_intersect) vs fused membership
      // count (round-10 SetIntersectSize)
      case "verify" => Seq(
        "composed" -> (() => e2e(spark, dir, nativeSig,
          (a, b) => size(array_intersect(a, b)))),
        "native" -> (() => e2e(spark, dir, nativeSig)))
      case other => sys.error(s"unknown section $other")
    }
    AbHarness.run(forms, reps, section)
    spark.stop()
  }
}
