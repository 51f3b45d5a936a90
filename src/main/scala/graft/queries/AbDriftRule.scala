package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkEntry

/** Dispositions the round-10 verdict's "family-shaped sf0.1 drift"
  * (item 1): q_ppr / q_pagerank(_bucketed) / q_ppr_bucketed / q_kcore /
  * q_ngram_jaccard / q_containment ran +20–40% vs r9's clean pass in
  * EVERY clean r10 run while the fleet median stayed flat (+0.015 s).
  *
  * Why this family and this suspect: no graph code changed in round 10,
  * and flat q_ppr — which touches neither [[QueryUtil.sharedTable]] nor
  * DedupQueries — drifted too, so the shared-CTAS substrate is NOT the
  * common dependency. What IS common to every member is the largest
  * LOGICAL PLANS in the fleet (iterative fixed-point unions, shingle
  * explode/semi-join chains), and the one round-10 change that taxes a
  * plan proportionally to its SIZE is the new optimizer rule
  * [[graft.functions.SimplifyCaseWhenPredicates]]: it joined the
  * operator-optimization FIXED-POINT batch, so its blanket
  * `plan.transform` re-walked every node of every plan once per batch
  * iteration — pure overhead wherever no Filter carries a CASE.
  *
  * This A/B alternates the rule's three modes (off / round-10 blanket /
  * round-11 pruned traversal) on each family member inside ONE warmed
  * JVM (the AbHarness protocol; the mode conf is read at optimization
  * time, so setting it in the thunk re-plans the same query under each
  * mode). A small-plan control (q_parquet_scan) pins the fleet-median
  * behavior. Expected if the hypothesis holds: blanket ≫ off on the
  * family, pruned ≈ off everywhere, control flat across modes.
  * Run: `runMain graft.queries.AbDriftRule <sfDir> [reps]`.
  */
object AbDriftRule {
  private val Family = Seq(
    "q_ppr", "q_pagerank", "q_pagerank_bucketed", "q_ppr_bucketed",
    "q_kcore", "q_ngram_jaccard", "q_containment",
    // small-plan control: the canary query, where the rule never fires
    "q_parquet_scan")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = AbHarness.session()
    val mode = graft.functions.SimplifyCaseWhenPredicates.ModeConf
    try graft.Tables.documentsSpread(spark, dir) catch { case _: Throwable => () }
    Family.foreach { name =>
      val fn = SparkEntry.queries(name)
      def form(m: String): () => DataFrame = () => {
        spark.conf.set(mode, m)
        fn(spark, dir)
      }
      AbHarness.run(
        Seq("off" -> form("off"), "blanket" -> form("blanket"),
          "pruned" -> form("pruned")),
        reps, tag = name)
      spark.conf.set(mode, "pruned")
    }
    spark.stop()
  }
}
