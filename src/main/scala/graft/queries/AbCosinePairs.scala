package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.Tables

/** Same-JVM alternating A/B for q_cosine_pairs (round 9): the
  * broadcast-join + single-undirected-distinct form against the
  * pre-round-9 shape (directed distinct inside lshCandidates, a second
  * undirected distinct, and UNHINTED embedding joins that shuffle the
  * ~n·TABLES·CAND_CAP candidate frame twice — the second time with the
  * 64-float emb_a array already attached). Same instrument and same
  * honesty protocol as [[AbBucketPairs]].
  */
object AbCosinePairs {

  /** The pre-round-9 q_cosine_pairs, kept verbatim. */
  private def oldForm(e: DataFrame): DataFrame = {
    val pairs = SimilarityQueries.lshCandidatesForAb(e)
      .distinct()
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
    pairs
      .join(e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
        col("label").as("label_a")), Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
        col("label").as("label_b")), Seq("id_b"))
      .withColumn("cos",
        round(graft.functions.GraftFunctions.cosine_sim(col("emb_a"), col("emb_b")), 6))
      .filter(col("cos") >= 0.85)
      .select(col("id_a"), col("id_b"), col("cos"),
        (col("label_a") === col("label_b")).cast(IntegerType).as("same_label"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** The round-9 → round-13 form, kept verbatim: undirected distinct
    * on the FULL candidate frame BEFORE the broadcast joins + verify.
    * Round-13 A/B at 100× (3 alternating same-JVM reps, counts equal):
    * this form 120.7/171.3/260.7 s vs the live late-distinct form's
    * 23.3/41.8/44.6 s — the ~10⁸-row distinct exchange costs far more
    * than re-verifying ≤LSH_TABLES× duplicate candidates map-side, so
    * the verify moved AHEAD of the distinct (the q_embed_dedup
    * treatment). */
  private def r9Form(e: DataFrame): DataFrame = {
    val pairs = SimilarityQueries.lshCandidatesForAb(e)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
    pairs
      .join(broadcast(e.select(col("vec_id").as("id_a"),
        col("embedding").as("emb_a"), col("label").as("label_a"))), Seq("id_a"))
      .join(broadcast(e.select(col("vec_id").as("id_b"),
        col("embedding").as("emb_b"), col("label").as("label_b"))), Seq("id_b"))
      .withColumn("cos",
        round(graft.functions.GraftFunctions.cosine_sim(col("emb_a"), col("emb_b")), 6))
      .filter(col("cos") >= 0.85)
      .select(col("id_a"), col("id_b"), col("cos"),
        (col("label_a") === col("label_b")).cast(IntegerType).as("same_label"))
      .orderBy(col("id_a"), col("id_b"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/scale100x")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = AbHarness.session()
    AbHarness.run(Seq(
      "new" -> (() => SimilarityQueries.defs("q_cosine_pairs")(spark, dir)),
      "r9" -> (() => r9Form(Tables.embeddings(spark, dir))),
      "old" -> (() => oldForm(Tables.embeddings(spark, dir)))), reps)
    spark.stop()
  }
}
