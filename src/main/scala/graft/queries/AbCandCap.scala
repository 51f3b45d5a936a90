package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Makes `q_cosine_pairs`' CAND_CAP a MEASURED contract (round-10
  * verdict item 4): the cap bounds each LSH bucket's index side, so the
  * candidate count — and the exact-verify cost, the heaviest
  * non-deliberate row in the 100× fleet — is linear in it, but until
  * this harness nothing showed what RECALL the cap buys (the trained-ANN
  * caps have CurationOpsSpec's recall floors; this had nothing).
  *
  * Protocol (the `q_trunc_recall` pattern — exact ground truth, integer
  * recall):
  *   1. deterministic probe sample: every M-th vec_id, M sized for
  *      ~2000 probes;
  *   2. TRUTH = exact brute-force partners of each probe with
  *      cosine ≥ 0.85 (broadcast probes × corpus scan — the proven
  *      cosineTopK shape, linear in corpus);
  *   3. for each cap c: the undirected candidate pairs that
  *      [[SimilarityQueries.lshCandidatesRawAtCap]] generates at c,
  *      restricted to pairs touching a probe; recall(c) = found/truth.
  *
  * Prints one line per cap: `cap n_true n_found recall n_cand_total`
  * (n_cand_total = the full undirected candidate-frame size at c — the
  * COST axis of the curve; the verify stage is linear in it). The
  * chosen CAND_CAP is re-affirmed or re-chosen from the printed curve
  * in SCALE.md. Run: `runMain graft.queries.AbCandCap <dir> [caps]`.
  */
object AbCandCap {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val caps = args.lift(1)
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(25, 50, 100, 200, 400))
    val spark = AbHarness.session()
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val n = e.count()
    val mod = math.max(1L, n / 2000L)
    val probes = e.filter(pmod(col("vec_id"), lit(mod)) === 0)
    println(s"[ab-candcap] dir=$dir corpus=$n probes=${probes.count()} (mod=$mod)")

    // exact truth: directed (probe, partner) with cosine >= 0.85 —
    // probes broadcast (≤2k × 64 doubles), one corpus scan.
    val truth = broadcast(probes
        .select(col("vec_id").as("p"), col("embedding").as("emb_p")))
      .join(e.select(col("vec_id").as("q"), col("embedding").as("emb_q")))
      .filter(col("p") =!= col("q"))
      .filter(graft.functions.GraftFunctions
        .cosine_sim(col("emb_p"), col("emb_q")) >= 0.85)
      .select(least(col("p"), col("q")).as("a"),
        greatest(col("p"), col("q")).as("b"),
        col("p"))
      .localCheckpoint()
    val nTrue = truth.count()
    println(s"[ab-candcap] exact true probe-pairs (cos>=0.85): $nTrue")

    // probes with at least one true partner — the denominator of the
    // VECTOR-level recall (a dedup pipeline collapses clusters through
    // connected components, so a vector is served as long as ANY ONE of
    // its true partners is found; pair recall understates that)
    val nVecTrue = truth.select(col("p")).distinct().count()

    caps.foreach { c =>
      val cand = SimilarityQueries.lshCandidatesRawAtCap(e, c)
        .select(least(col("id_a"), col("id_b")).as("a"),
          greatest(col("id_a"), col("id_b")).as("b"))
        .distinct()
      val nCand = cand.count()
      val foundPairs = truth.join(cand, Seq("a", "b"), "left_semi")
        .localCheckpoint()
      val found = foundPairs.count()
      val foundVec = foundPairs.select(col("p")).distinct().count()
      val recall = if (nTrue == 0) 1.0 else found.toDouble / nTrue
      val vRecall = if (nVecTrue == 0) 1.0 else foundVec.toDouble / nVecTrue
      println(f"[ab-candcap] cap=$c%-4d n_true=$nTrue n_found=$found " +
        f"pair_recall=$recall%.4f vec_recall=$vRecall%.4f " +
        f"(n_vec_true=$nVecTrue) n_cand_total=$nCand")
    }
    spark.stop()
  }
}
