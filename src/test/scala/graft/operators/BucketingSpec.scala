package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Bucketing removes the fact-to-fact shuffle (SCALE.md "Joins": at
  * 100 TB lineitem⋈orders would be bucketed on orderkey at write time).
  * This proves the claim end-to-end on the real tables: bucketed copies
  * join with NO Exchange in the physical plan, and results match the
  * shuffled join.
  */
class BucketingSpec extends SparkTestBase {

  test("bucketed lineitem⋈orders plans without a shuffle and matches the shuffled join") {
    // tables land in the default ./spark-warehouse (gitignored); the
    // in-memory catalog forgets tables between JVM runs but the
    // directories persist, so clean both catalog AND disk.
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    Seq("li_b", "o_b").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
    }
    Tables.lineitem(spark, sf()).write.bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").format("parquet").saveAsTable("li_b")
    Tables.orders(spark, sf()).write.bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").format("parquet").saveAsTable("o_b")

    val joined = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"fact side still shuffles:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"orders side still shuffles:\n$plan")

    val want = Tables.lineitem(spark, sf())
      .join(Tables.orders(spark, sf()), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("bucketed-edge PageRank: edge side joins from buckets with no Exchange; ranks match") {
    // Locally AQE broadcasts the tiny ranks side, which would hide the
    // layout difference this test demonstrates — force the shuffle-join
    // shape the 1000-executor case takes (ranks too big to broadcast).
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bucketed = graft.queries.GraphQueries.pagerankBucketed(spark, sf())
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"), s"no bucketed scan:\n$plan")
      // Every per-iteration ranks⋈edges join consumes the edge table
      // straight from its buckets: the ONLY src-keyed exchanges are the
      // O(nodes) ranks side — one per iteration, none above a FileScan.
      val srcExchanges =
        "Exchange hashpartitioning\\(src".r.findAllIn(plan).size
      assert(srcExchanges <= graft.queries.GraphQueries.ItersForTest,
        s"edge side still shuffles ($srcExchanges src exchanges):\n$plan")
      // The unbucketed plan over the same data shuffles the edge side
      // too — strictly more src exchanges than the bucketed layout.
      val flat = graft.queries.GraphQueries.pagerank(spark, sf())
        .queryExecution.executedPlan.toString
      val flatSrcExchanges =
        "Exchange hashpartitioning\\(src".r.findAllIn(flat).size
      assert(flatSrcExchanges > srcExchanges,
        s"expected the unbucketed plan to carry more src exchanges " +
          s"($flatSrcExchanges vs $srcExchanges)")
      // identical ranks, row for row
      val want = graft.queries.GraphQueries.pagerank(spark, sf())
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val gotB = bucketed.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(gotB === want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    }
  }

  test("graph family reads the shared bucketed tables, never the fact chain") {
    // Round-6/7 promotion: every graph query sources its heavy edge
    // frame from a write-once bucketed table (graft_pairs_b_* /
    // graft_copair_bi_* / graft_lpa_b_* / graft_edges_b_*) instead of
    // re-running the lineitem⋈orders + window-cap + self-join +
    // distinct derivation per query. Two plan facts prove it, per
    // query: (a) the final physical plan never scans the fact
    // parquet (lineitem/orders) — the derivation chain is gone;
    // (b) where the final plan still reads edges from storage (i.e.
    // the query is not checkpoint-terminal), that read is a bucketed
    // scan (SelectedBucketsCount). Checkpoint-terminal queries
    // (k-truss, SSSP, k-hop) consume the bucketed table upstream of a
    // localCheckpoint, so their final plan legitimately shows neither.
    val expectScan = Seq(
      "q_triangle_count" -> true,
      "q_clustering_coeff" -> true,
      "q_assortativity" -> true,
      "q_link_predict" -> true,
      // k-core checkpoints the surviving edge set between peel rounds
      // (round 8, with the dead-set anti-join peel), so its final plan
      // reads the round-2 checkpoint, not the pairs_b table
      "q_kcore" -> false,
      // label-prop checkpoints the label frame per round, so its final
      // plan reads the round-3 checkpoint, not the lpa_b table
      "q_label_prop" -> false,
      "q_ktruss" -> false,
      "q_sssp" -> false,
      "q_khop_frontier" -> false,
      // round 13: the flat teaching twins read the SAME shared edge
      // table metadata-blind (plain parquet path read — deliberately no
      // SelectedBucketsCount), so the fact-chain derivation is gone
      // from them too; their per-iteration edge Exchange is asserted in
      // the bucketed-PageRank test above.
      "q_pagerank" -> false,
      "q_ppr" -> false)
    for ((name, wantsBucketScan) <- expectScan) {
      val df = graft.SparkEntry.queries(name)(spark, sf())
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("lineitem"),
        s"$name still derives edges from the fact tables:\n$plan")
      if (wantsBucketScan)
        assert(plan.contains("SelectedBucketsCount"),
          s"$name does not read a bucketed edge table:\n$plan")
    }
  }
}
