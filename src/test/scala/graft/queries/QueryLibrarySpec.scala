package graft.queries

import graft.{SparkTestBase, Tables}
import graft.SparkEntry
import org.apache.spark.sql.functions._

/** Specs for the query-library entries WITHOUT a DuckDB oracle (the
  * driver only rows-checks these), plus cross-query invariants the
  * oracle can't see.
  */
class QueryLibrarySpec extends SparkTestBase {
  import spark.implicits._

  test("every oracleSql key has a queries entry; flagship returns rows") {
    val qs = SparkEntry.queries
    val missing = SparkEntry.oracleSql.keySet -- qs.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("EVERY gated query has an oracle twin — the hash gate is total") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle twin: $noOracle")
  }

  test("approx_count_distinct: exact counts right, error bound hash-gated") {
    val rows = SparkEntry.queries("q_approx_count_distinct")(spark, sf())
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val exact = Tables.lineitem(spark, sf())
      .groupBy("l_returnflag").agg(countDistinct("l_orderkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      assert(rows(k)._1 === n, s"flag $k exact count")
      assert(rows(k)._2, s"flag $k: HLL estimate outside the 5% bound")
    }
  }

  test("binary scan matches the independently generated Python golden") {
    // The oracle twin replays tools/golden/binary_scan_golden.parquet
    // (written by tools/gen_binary_golden.py — container byte math
    // reimplemented with no shared code). Compare cell-for-cell here so
    // the parity holds in-repo, not only at driver gate time.
    val got = SparkEntry.queries("q_binary_scan")(spark, sf())
      .collect()
    val want = spark.read.parquet("/root/repo/tools/golden/binary_scan_golden.parquet")
      .orderBy(col("file_name")).collect()
    assert(got.length === want.length)
    val cols = SparkEntry.queries("q_binary_scan")(spark, sf()).columns
    got.zip(want).foreach { case (g, w) =>
      for (i <- cols.indices)
        assert(Option(g.get(i)).map(_.toString) === Option(w.get(i)).map(_.toString),
          s"${cols(i)} of ${g.getString(0)}")
    }
  }

  test("LSH ANN recall vs brute-force top-k (same bucket ⇒ found)") {
    // bruteForceTopK is the test-only unbounded all-pairs reference —
    // the gated q_cosine_topk bounds its probe set by design.
    val exact = SimilarityQueries.bruteForceTopK(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = SparkEntry.queries("q_lsh_ann")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    // 4 tables × 4 bits over 64-dim embeddings: for neighbors at
    // cosine≈0.3, per-table hit ≈ 0.6^4 ≈ 0.13, multi-table ≈ 0.42.
    assert(recall > 0.2, s"recall collapsed: $recall")
    assert(ann.nonEmpty)
    info(f"LSH multi-table recall@5 = $recall%.3f")
  }

  test("IVF ANN recall vs brute-force top-k") {
    val exact = SimilarityQueries.bruteForceTopK(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = SparkEntry.queries("q_ivf_ann")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    // 16 centroids / probe 4 on near-random embeddings: neighbors are
    // weakly clustered, so recall is the probed fraction (~4/16) plus
    // the cluster signal.
    assert(recall > 0.2, s"IVF recall collapsed: $recall")
    info(f"IVF recall@5 = $recall%.3f (16 centroids, nprobe=4)")
  }

  test("Lloyd-refined IVF quantizer improves recall over the seeded one") {
    val exact = SimilarityQueries.bruteForceTopK(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val base = SparkEntry.queries("q_ivf_ann")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lloyd = SimilarityQueries.ivfAnnLloyd(spark, sf(), iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val rBase = (exact & base).size.toDouble / exact.size
    val rLloyd = (exact & lloyd).size.toDouble / exact.size
    info(f"IVF recall@5: seeded = $rBase%.3f, 2-iter Lloyd = $rLloyd%.3f")
    // 2 Lloyd iterations must not LOSE recall, and on this corpus they
    // measurably gain it (centroids move from arbitrary seed vectors to
    // actual density centers).
    assert(rLloyd >= rBase, f"Lloyd refinement lost recall: $rLloyd%.3f < $rBase%.3f")
  }

  test("PQ/ADC ranking recalls exact-L2 neighbors (same metric)") {
    val e = Tables.embeddings(spark, sf())
    // exact squared-L2 top-5 for the same probe set, same tie order
    val a = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    val d2 = aggregate(
      zip_with(col("emb_a"), col("emb_b"),
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a")).orderBy(col("d2"), col("id_b"))
    val exact = b.join(broadcast(a), col("id_a") =!= col("id_b"))
      .withColumn("d2", d2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val pq = SparkEntry.queries("q_pq_ann")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    info(f"PQ/ADC recall@5 vs exact L2 = $recall%.3f (8 subspaces × 16 codes)")
    // 8×16 random-projection codebook over 64 dims: coarse, but ADC must
    // rank far better than chance (random top-5 of n≈500 ⇒ recall ≈ 0.01).
    assert(recall > 0.1, s"PQ recall collapsed: $recall")
  }

  test("trained PQ codebooks improve recall over the md5-seeded gate variant") {
    val e = Tables.embeddings(spark, sf())
    val a = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    val d2 = aggregate(
      zip_with(col("emb_a"), col("emb_b"),
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a")).orderBy(col("d2"), col("id_b"))
    val exact = b.join(broadcast(a), col("id_a") =!= col("id_b"))
      .withColumn("d2", d2).withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val base = SparkEntry.queries("q_pq_ann")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val trained = SimilarityQueries.pqAnnTrained(spark, sf(), iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val rBase = (exact & base).size.toDouble / exact.size
    val rTrained = (exact & trained).size.toDouble / exact.size
    info(f"PQ recall@5: md5 codebook = $rBase%.3f, 2-iter Lloyd-trained = $rTrained%.3f")
    assert(rTrained >= rBase, f"training lost recall: $rTrained%.3f < $rBase%.3f")
  }

  test("cosineTopK accepts a non-dense probe table, matches exact top-k") {
    val e = Tables.embeddings(spark, sf())
    val probes = e.filter(col("vec_id") % 41 === 3) // sparse, non-prefix ids
    val probeIds = probes.select("vec_id").as[Long].collect().toSet
    assert(probeIds.nonEmpty && !probeIds.contains(0L))
    val got = SimilarityQueries.cosineTopK(e, probes).collect()
    assert(got.map(_.getLong(0)).toSet === probeIds)
    // exact per-probe agreement with the unbounded brute-force reference
    val want = SimilarityQueries.bruteForceTopK(spark, sf())
      .filter(col("id_a").isin(probeIds.toSeq: _*)).collect()
    assert(got.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq ===
      want.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq)
  }

  test("minhash LSH candidates contain every truly-similar pair (jaccard ≥ 0.5)") {
    // Ground truth: brute-force jaccard over all pairs.
    val docs = Tables.documents(spark, sf())
      .select($"doc_id", split($"text", " ").as("toks"))
      .withColumn("sh", array_distinct(transform(
        sequence(lit(0), size($"toks") - 3),
        i => concat_ws(" ", slice($"toks", i + 1, lit(3))))))
      .select($"doc_id", $"sh")
    val a = docs.select($"doc_id".as("id_a"), $"sh".as("sh_a"))
    val b = docs.select($"doc_id".as("id_b"), $"sh".as("sh_b"))
    val inter = size(array_intersect($"sh_a", $"sh_b"))
    val truth = a.join(b, $"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        (inter.cast("double") / (size($"sh_a") + size($"sh_b") - inter).cast("double")).as("j"))
      .filter($"j" >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val candidates = SparkEntry.queries("q_minhash_lsh_pairs")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 4 bands × 2 rows: P(catch | j=0.5) per band = 0.25, overall ~68%;
    // on this data all high-sim pairs must be caught or nearly so.
    val caught = (truth & candidates).size
    assert(truth.isEmpty || caught.toDouble / truth.size >= 0.5,
      s"minhash missed too many: caught=$caught of ${truth.size}")
  }

  test("explain: broadcast join query uses BroadcastHashJoin, no shuffle of fact side") {
    val plan = SparkEntry.queries("q_join_broadcast")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }

  test("explain: merge hint yields SortMergeJoin; top-k gets WindowGroupLimit pushdown") {
    val smj = SparkEntry.queries("q_join_sortmerge")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(smj.contains("SortMergeJoin"), s"plan:\n$smj")
    val topk = SparkEntry.queries("q_topk_per_group")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(topk.contains("WindowGroupLimit"), s"plan:\n$topk")
  }

  test("explain: bucketed range join plans BroadcastHashJoin, not nested loop") {
    val plan = SparkEntry.queries("q_join_range")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
  }

  test("explain: no gated query plans an unblocked cartesian/nested-loop product") {
    // The scale contract of SCALE.md: fuzzy matching, simhash-near and
    // every similarity query generate candidates through equi-join
    // blocking — a CartesianProduct or BroadcastNestedLoopJoin anywhere
    // means a blocking key fell out of the plan.
    for (name <- Seq("q_fuzzy_match", "q_simhash_near", "q_cosine_pairs",
        "q_embed_dedup", "q_lsh_ann", "q_ivf_ann", "q_minhash_lsh_pairs",
        "q_pagerank", "q_correlation", "q_histogram", "q_interpolate",
        "q_window_range_agg", "q_sql_recursive",
        // round-4b: every new pairwise/join-bearing operator blocks on
        // an equi-key (gram hash, pair key, salt, source) — only the
        // 1-row corpus-stats broadcasts may cross-join
        "q_substr_dedup", "q_containment",
        "q_salted_join", "q_khop_frontier", "q_markov_transitions",
        "q_mad_outliers", "q_winsorize", "q_attribution",
        // round-4c: CDC joins on the key, incremental dedup on digests /
        // band keys, prefix-filter on posting hashes, semdedup on cid
        "q_snapshot_diff", "q_incremental_dedup", "q_prefix_filter_join",
        "q_semdedup", "q_quality_classifier", "q_pit_join", "q_ohlc_resample",
        "q_dq_audit", "q_dedup_survivor", "q_impute_missing",
        "q_interval_merge", "q_kcore", "q_embed_project",
        // final-round: LPA joins labels to edges on the node key
        "q_label_prop",
        // round-5: wedge/pair enumeration blocks on the center node,
        // chunk dedup on the chunk digest, basket pairs on l_orderkey,
        // sketch-audit on the verified pair ids, bucketed pagerank on
        // the bucketed src key
        "q_link_predict", "q_chunk_dedup", "q_minhash_jaccard_est",
        "q_clustering_coeff", "q_pagerank_bucketed",
        // round-5b: sliding distinct joins on the window-end day,
        // bigram novelty on the bigram string, ER on the block key,
        // dow-anomaly's baseline is a 7-row broadcast HASH join on dow
        "q_sliding_distinct", "q_bigram_novelty", "q_er_multifield",
        "q_dow_anomaly",
        // round-5c: pareto joins brand totals on p_brand, new-vs-
        // returning on o_custkey; session paths/readability are
        // window/map-side only
        "q_pareto_coverage", "q_new_vs_returning", "q_session_paths",
        "q_readability",
        // round-5d: group-p90 joins its offsets/totals on (grp, bkt),
        // the cohort matrix on user_id / cohort week
        "q_group_p90", "q_cohort_matrix", "q_trend_slope",
        // round-5e: the Lindley-scan and feature-backfill are pure
        // user-keyed windows; blocking-quality's truth/candidate sides
        // block on shingle hash / band key like the dedup family
        "q_clamped_runsum", "q_lag_features",
        // round-5f: FIFO meets on (partkey, grid bucket); the interval
        // join explodes sessions onto the hour grid and hash-joins the
        // broadcast incident hours; time-in-state / winnow are pure
        // user-/doc-keyed windows; FD audit is aggregate-only; trunc
        // recall is two broadcast-probe scans + a pair-keyed semi-join
        "q_fifo_match", "q_interval_join", "q_time_in_state",
        "q_fd_violations", "q_winnow")) {
      val plan = SparkEntry.queries(name)(spark, sf())
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin") ||
        name == "q_ivf_ann" ||
        name == "q_semdedup", // centroid broadcast (16 rows) is a deliberate BNL
        s"$name plans a nested loop:\n$plan")
    }
    // the 1-row-broadcast exceptions: BNL against a literal 1-row stats
    // subtree is the intended shape for bm25/pmi (corpus N / avgdl)
    for (name <- Seq("q_bm25", "q_cooccur_pmi", "q_bpe_merges", "q_hll_intersect",
        // drift-test family: the only BNL is the 1-row (n1, n2) /
        // contingency-total broadcast; PPR's is the 1-row seed share
        "q_ks_test", "q_rank_sum", "q_chi_square", "q_ppr", "q_gini_split",
        // round-5 1-row broadcasts: basket rules' order count,
        // equi-depth's total + rangeCumsum max-bucket, assortativity's
        // single moments row feeding the closed form
        "q_basket_rules", "q_equidepth_hist", "q_assortativity",
        // Welch t: the two 1-row moment frames cross-joined; MMR: the
        // probe broadcast + the 20-row candidate sim matrix
        "q_t_test", "q_mmr_rerank",
        // same 1-row seed-share broadcast as q_ppr
        "q_ppr_bucketed",
        // round-5b 1-row broadcasts: weighted median's ⌈W/2⌉ threshold,
        // freshness's global high-water mark; RFM's high-water date
        "q_weighted_median", "q_freshness_lag", "q_rfm_segments",
        // Benford's 1-row digit-total broadcast
        "q_benford_deviation",
        // blocking-quality: the four 1-row count frames cross-join into
        // the single metrics row; both pair generators are equi-keyed
        "q_blocking_quality",
        // kendall-tau: the C(25,2) pair join over the 25-row per-nation
        // aggregate (dimension-bound, same class as the cohort matrix);
        // bigram-LM: the 1-row vocab-size broadcast; trunc-recall rides
        // cosineTopK's deliberate 50-row broadcast-probe scan twice
        "q_kendall_tau", "q_bigram_lm", "q_trunc_recall",
        // 1-row totals broadcasts: apportionment's (n_total, n_cells),
        // Wilson's distinct-user count
        "q_alloc_budget", "q_wilson_ci")) {
      val plan = SparkEntry.queries(name)(spark, sf())
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian:\n$plan")
    }
  }

  test("explain: drift/split family plans no unpartitioned window (two-pass cumsum)") {
    // The round-4 single-task risk: a global Window.orderBy(v) cumsum
    // funnels every distinct cent through one task. rangeCumsum replaces
    // it with bucket-partitioned windows + broadcast offsets, and
    // q_gini_split's argmin row_number became a min(struct) aggregate —
    // so NO window in these plans may have an empty partition spec.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (name <- Seq("q_ks_test", "q_rank_sum", "q_gini_split",
        "q_equidepth_hist")) {
      val lp = SparkEntry.queries(name)(spark, sf()).queryExecution.optimizedPlan
      val unpart = lp.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
      assert(unpart.isEmpty,
        s"$name plans ${unpart.size} unpartitioned window(s):\n$lp")
    }
  }

  test("explain: partitioned scan prunes partitions; range-agg re-shape broadcasts") {
    val part = SparkEntry.queries("q_partitioned_scan")(spark, sf())
      .queryExecution.executedPlan.toString
    // the o_year=1995 predicate must land in PartitionFilters (listing-
    // time pruning), not as a post-scan Filter over all years
    assert(part.contains("PartitionFilters") && part.contains("o_year"),
      s"plan:\n$part")
    val agg = SparkEntry.queries("q_window_range_agg")(spark, sf())
      .queryExecution.executedPlan.toString
    // the per-(flag, quantity) band stats join back by broadcast — the
    // fact side must not shuffle for the join
    assert(agg.contains("BroadcastHashJoin"), s"plan:\n$agg")
  }

  test("approx_percentile stays within rank-error bound of the exact percentile") {
    // No oracle twin by nature (sketch internals differ per engine) —
    // the accuracy contract is asserted here instead: with accuracy A,
    // the rank error is bounded by n/A.
    val exact = Tables.lineitem(spark, sf())
      .agg(percentile($"l_quantity", lit(0.5)).as("p"))
      .head.getDouble(0)
    val approx = Tables.lineitem(spark, sf())
      .agg(percentile_approx($"l_quantity", lit(0.5), lit(100)).as("p"))
      .head.getDouble(0)
    val spread = Tables.lineitem(spark, sf())
      .agg((max($"l_quantity") - min($"l_quantity")).as("r")).head.getDouble(0)
    assert(math.abs(approx - exact) <= spread * 0.05,
      s"approx median $approx too far from exact $exact (range $spread)")
  }

  test("dsum is exact and partitioning-independent for 2-decimal money (property)") {
    // The oracle contract now routes money sums through scale-0 integer
    // cents (QueryUtil.dsum). Property: for random 2-decimal values the
    // Spark sum equals the BigDecimal ground truth bit-for-bit, at every
    // partitioning — a plain sum(double) fails this.
    val rnd = new scala.util.Random(42)
    val cents = Seq.fill(5000)(rnd.between(-10000000L, 10000000L))
    val truth = (BigDecimal(cents.sum) / 100).toDouble
    for (parts <- Seq(1, 7, 32)) {
      val df = cents.map(_.toDouble / 100).toDF("v").repartition(parts)
      val got = df.agg(graft.queries.QueryUtil.dsum(col("v")).as("s"))
        .head.getDouble(0)
      assert(got === truth, s"parts=$parts")
    }
  }

  test("sentinel decode helper maps clinical sentinels to NULL, keeps values") {
    val df = Seq("N", ".N", ".M", ".F", "1", "Benign").toDF("v")
      .select(graft.pipeline.ClinicalCsv.decodeSentinels($"v").as("d"))
    assert(df.filter($"d".isNull).count() === 4)
    assert(df.filter($"d".isNotNull).as[String].collect().toSet === Set("1", "Benign"))
  }

  test("explain: parquet scan pushes filters and prunes columns") {
    val qe = Tables.lineitem(spark, sf())
      .filter($"l_shipdate" <= lit("2001-09-02").cast("timestamp_ntz"))
      .select($"l_orderkey", $"l_quantity")
      .queryExecution
    val scan = qe.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double"),
      s"columns not pruned:\n$scan")
  }
}
