package graft.queries

/** Same-JVM alternating A/B for q_lsh_ann's candidate handling
  * (round-10, verdict item 4): the raw-candidate dense_rank rerank
  * (no candidate distinct; the rank window's exchange partial-limits
  * map-side) against the round-9 shape (full-frame candidate distinct,
  * then row_number rerank). Both forms share the identical
  * lshCandidatesRaw recipe; the harness's count check plus the
  * sf0.01/10× hash gates pin the kept set equal.
  *
  * OUTCOME (run at 100×, 3 reps): distinct 86.3/39.6/37.3 beat raw
  * 129.5/47.5/62.5 on every rep — the raw form was REJECTED and
  * q_lsh_ann keeps the distinct form (see rerankTopKRaw's scaladoc
  * and SCALE.md round 10 for the analysis).
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.queries.AbLshAnn
  * /root/scale100x 3"`.
  */
object AbLshAnn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/scale100x")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = AbHarness.session()
    AbHarness.run(SimilarityQueries.lshAnnFormsForAb(spark, dir), reps)
    spark.stop()
  }
}
