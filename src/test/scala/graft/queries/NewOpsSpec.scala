package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}
import graft.functions.BloomJoin
import org.apache.spark.sql.functions._

/** Specs for the round-4 operators: bloom-pruned join, degree-oriented
  * triangle counting, sorted-neighborhood blocking, quota sampling.
  * The DuckDB twins gate end-to-end values; these specs pin the
  * properties the hash gate can't see (no-false-negative pruning,
  * graph-theoretic ground truth, candidate bounds, quota exactness).
  */
class NewOpsSpec extends SparkTestBase {
  import spark.implicits._

  /** Chronological sort key for a TIMESTAMP_NTZ read back as LocalDateTime. */
  private def ldtKey(t: java.time.LocalDateTime): (Long, Int) =
    (t.toEpochSecond(java.time.ZoneOffset.UTC), t.getNano)

  test("triangle count matches ground truth on known graphs") {
    def tri(edges: (Int, Int)*): (Long, Long, Long) = {
      val r = GraphQueries.triangleCountFrom(edges.toDF("u", "v")).head
      (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
        r.getAs[Long]("n_triangles"))
    }
    // K4: every 3-subset closes
    assert(tri((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)) === ((4L, 6L, 4L)))
    // C4: cycles of even length have no triangles
    assert(tri((1, 2), (2, 3), (3, 4), (1, 4)) === ((4L, 4L, 0L)))
    // star: the hub closes nothing
    assert(tri((1, 2), (1, 3), (1, 4), (1, 5)) === ((5L, 4L, 0L)))
    // one triangle + pendant edge: pendant adds a node, not a triangle
    assert(tri((1, 2), (1, 3), (2, 3), (3, 9)) === ((4L, 4L, 1L)))
  }

  test("label propagation matches ground truth on known graphs") {
    def communities(edges: (Int, Int)*): Map[Long, Long] =
      GraphQueries.labelPropFrom(edges.toDF("u", "v"))
        .groupBy(col("lbl")).count().collect()
        .map(r => r.getAs[Long]("lbl") -> r.getAs[Long]("count")).toMap
    // two disjoint triangles: each collapses to its min label
    assert(communities((1, 2), (1, 3), (2, 3), (7, 8), (7, 9), (8, 9))
      === Map(1L -> 3L, 7L -> 3L))
    // one 5-clique: a single community
    val k5 = for (a <- 1 to 5; b <- (a + 1) to 5) yield (a, b)
    assert(communities(k5: _*) === Map(1L -> 5L))
    // dumbbell: two K4s + one bridge edge — the bridge cannot out-vote
    // three internal neighbors, so both sides keep their own community
    val dumbbell = (for (a <- 1 to 4; b <- (a + 1) to 4) yield (a, b)) ++
      (for (a <- 5 to 8; b <- (a + 1) to 8) yield (a, b)) :+ ((4, 5))
    assert(communities(dumbbell: _*) === Map(1L -> 4L, 5L -> 4L))
  }

  test("KS statistic replays in a sequential reference implementation") {
    val out = SparkEntry.queries("q_ks_test")(spark, sf()).head
    val joined = Tables.orders(spark, sf())
      .join(Tables.customer(spark, sf()),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(round(col("o_totalprice") * 100).cast("long").as("v"),
        (col("c_mktsegment") === "BUILDING").as("a"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val n1 = joined.count(_._2).toLong
    val n2 = joined.count(!_._2).toLong
    var (cua, cub, best) = (0L, 0L, 0L)
    joined.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, rows) =>
      cua += rows.count(_._2); cub += rows.count(!_._2)
      best = math.max(best, math.abs(cua * n2 - cub * n1))
    }
    assert(out.getAs[Long]("n1") === n1)
    assert(out.getAs[Long]("n2") === n2)
    assert(out.getAs[Long]("ks_num") === best)
    assert(out.getAs[Long]("ks_micro") === best * 1000000L / (n1 * n2))
  }

  test("Mann-Whitney U replays sequentially and satisfies the U-sum identity") {
    val out = SparkEntry.queries("q_rank_sum")(spark, sf()).head
    val joined = Tables.orders(spark, sf())
      .join(Tables.customer(spark, sf()),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(round(col("o_totalprice") * 100).cast("long").as("v"),
        (col("c_mktsegment") === "BUILDING").as("a"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val n1 = joined.count(_._2).toLong
    val n2 = joined.count(!_._2).toLong
    var (cprev, r2a) = (0L, 0L)
    joined.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, rows) =>
      val (cnt, ca) = (rows.length.toLong, rows.count(_._2).toLong)
      r2a += ca * (2 * cprev + cnt + 1)
      cprev += cnt
    }
    assert(out.getAs[Long]("r2_sum_a") === r2a)
    assert(out.getAs[Long]("u2_a") === r2a - n1 * (n1 + 1))
    // U_a + U_b = n1*n2 (doubled: 2*n1*n2) — exact by construction
    assert(out.getAs[Long]("u2_a") + out.getAs[Long]("u2_b") === 2 * n1 * n2)
    // no ties ⇒ ranks 1..n: total doubled rank mass is n(n+1)
    val n = n1 + n2
    val allDr = joined.groupBy(_._1).toSeq.sortBy(_._1)
      .foldLeft((0L, 0L)) { case ((cp, acc), (_, rows)) =>
        (cp + rows.length, acc + rows.length * (2 * cp + rows.length + 1))
      }._2
    assert(allDr === n * (n + 1))
  }

  test("best Gini split replays against an exhaustive sequential scorer") {
    val out = SparkEntry.queries("q_gini_split")(spark, sf()).head
    val rows = Tables.orders(spark, sf())
      .select(round(col("o_totalprice") * 100).cast("long").as("v"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("pos"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val n = rows.length.toLong
    val ptot = rows.count(_._2).toLong
    def nGini(nn: Long, p: Long): BigInt =
      (BigInt(nn) * nn - BigInt(p) * p - BigInt(nn - p) * (nn - p)) * 1000000 / nn
    var (nl, pl) = (0L, 0L)
    var best: (BigInt, Long) = (null, 0L)
    rows.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (v, g) =>
      nl += g.length; pl += g.count(_._2)
      if (nl < n) {
        val wg = nGini(nl, pl) + nGini(n - nl, ptot - pl)
        if (best._1 == null || wg < best._1) best = (wg, v)
      }
    }
    assert(out.getAs[Long]("threshold_cents") === best._2)
    assert(BigInt(out.getAs[Long]("wgini_micro")) === best._1)
    assert(BigInt(out.getAs[Long]("wgini_root_micro")) === nGini(n, ptot))
    // splitting can never increase weighted impurity
    assert(out.getAs[Long]("wgini_micro") <= out.getAs[Long]("wgini_root_micro"))
  }

  test("chi-square statistic replays in exact BigInt arithmetic") {
    val out = SparkEntry.queries("q_chi_square")(spark, sf()).collect()
    val cells = out.map(r => (r.getAs[String]("seg"), r.getAs[String]("prio"),
      r.getAs[Long]("n_obs")))
    val rt = cells.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val ct = cells.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    val n = cells.map(_._3).sum
    // margins are consistent with the cells the query itself emitted
    assert(rt.values.sum === n && ct.values.sum === n)
    var chi2 = BigInt(0)
    cells.foreach { case (s0, p0, o) =>
      val dnum = BigInt(o) * n - BigInt(rt(s0)) * ct(p0)
      val term = dnum * dnum * 100 / (BigInt(n) * rt(s0) * ct(p0))
      val row = out.find(r => r.getAs[String]("seg") == s0 &&
        r.getAs[String]("prio") == p0).get
      assert(BigInt(row.getAs[Long]("term_centi")) === term)
      assert(BigInt(row.getAs[Long]("exp_micro")) ===
        BigInt(rt(s0)) * ct(p0) * 1000000 / n)
      chi2 += term
    }
    out.foreach(r => assert(BigInt(r.getAs[Long]("chi2_centi")) === chi2))
  }

  test("bloom prune never drops a true match and actually prunes") {
    val li = Tables.lineitem(spark, sf())
    val selKeys = Tables.orders(spark, sf())
      .filter(col("o_orderstatus") === "F" &&
        col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloom = selKeys.agg(
      BloomJoin.bloomAgg(xxhash64(col("o_orderkey")), 100000L, 800000L).as("bf"))
    val pruned = li.filter(
      BloomJoin.mightContain(bloom, xxhash64(col("l_orderkey"))))
    val exact = li.join(selKeys, col("l_orderkey") === col("o_orderkey"), "left_semi")
    // no false negatives: every exact match survives the bloom
    assert(exact.join(pruned, Seq("l_orderkey", "l_linenumber"), "left_anti")
      .count() === 0)
    // the sketch is selective (sized for ~1% fp at this key count)
    val (total, kept) = (li.count(), pruned.count())
    assert(kept < total, s"bloom kept all $total rows")
    assert(kept >= exact.count())
  }

  test("quota sample: exactly N rows, every quota within 1 of exact share") {
    val got = SparkEntry.queries("q_quota_sample")(spark, sf()).cache()
    assert(got.count() === 100)
    val cnts = Tables.documents(spark, sf())
      .groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = cnts.values.sum
    val quotas = got.groupBy(col("source")).agg(count(lit(1)).as("q"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(quotas.values.sum === 100)
    for ((src, q) <- quotas) {
      val share = cnts(src) * 100.0 / tot
      assert(q === math.floor(share).toLong || q === math.ceil(share).toLong,
        s"$src: quota $q vs exact share $share")
    }
    got.unpersist()
  }

  test("table digest is partitioning-independent and sensitive to any row change") {
    val digestOf = (df: org.apache.spark.sql.DataFrame) => {
      import org.apache.spark.sql.types.LongType
      val canon = concat_ws("|", col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), round(col("o_totalprice") * 100).cast(LongType),
        col("o_orderdate").cast("date").cast("string"), col("o_orderpriority"))
      val h = TextQueries.phash(canon, 7)
      df.select(h.as("h"))
        .agg(sum(col("h") % 1073741824L).as("lo"), sum(expr("h DIV 1073741824")).as("hi"))
        .head
    }
    val orig = Tables.orders(spark, sf())
    // same data, adversarial partitioning -> identical digest
    assert(digestOf(orig) === digestOf(orig.repartition(7)))
    // flipping one field of one row moves at least one component
    val tampered = orig.withColumn("o_custkey",
      when(col("o_orderkey") === orig.select(min("o_orderkey")).head.getLong(0),
        col("o_custkey") + 1).otherwise(col("o_custkey")))
    assert(digestOf(orig) !== digestOf(tampered))
  }

  test("equi-depth histogram: depths within one grid cell of each other, buckets cover all rows") {
    val h = SparkEntry.queries("q_equidepth_hist")(spark, sf()).collect()
    val total = Tables.orders(spark, sf()).count()
    assert(h.map(_.getAs[Long]("n")).sum === total)
    // contiguous non-overlapping dollar ranges
    h.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi_dollars") < b.getAs[Long]("lo_dollars"))
    case _ => ()
    }
  }

  test("skyline decomposition equals the sequential prefix-min frontier") {
    val got = SparkEntry.queries("q_skyline_2d")(spark, sf()).collect()
      .map(_.getAs[Long]("o_orderkey")).toSet
    val rows = Tables.orders(spark, sf())
      .select(col("o_orderkey"),
        col("o_orderdate").cast("date").cast("string").as("dt"),
        round(col("o_totalprice") * 100).cast("long").as("pc"))
      .collect()
      .map(r => (r.getAs[String]("dt"), r.getAs[Long]("pc"), r.getAs[Long]("o_orderkey")))
      .sortBy(identity)
    var best = Long.MaxValue
    val keep = scala.collection.mutable.Set[Long]()
    for ((_, pc, k) <- rows) if (pc < best) { best = pc; keep += k }
    assert(got === keep.toSet)
  }

  test("observe() metrics: gate counters ride the SAME pass as the data") {
    // The production-observability pattern for a 100 TB curation run:
    // CollectMetrics accumulates pass/fail counters inside the one data
    // pass instead of a second counting scan over the corpus.
    val docs = Tables.documents(spark, sf())
    val observed = docs.observe("gate",
      count(lit(1)).as("n_in"),
      sum(when(length(col("text")) >= 200, 1L).otherwise(0L)).as("n_pass"),
      sum(length(col("text")).cast("long")).as("chars_seen"))
    val keptDf = observed.filter(length(col("text")) >= 200)
    val kept = keptDf.collect()
    // metrics surface on the EXECUTED query's QE (the parent Dataset
    // was never run itself)
    val m = keptDf.queryExecution.observedMetrics("gate")
    assert(m.getAs[Long]("n_in") === docs.count())
    assert(m.getAs[Long]("n_pass") === kept.length.toLong)
    assert(m.getAs[Long]("chars_seen") ===
      docs.agg(sum(length(col("text")))).head.getLong(0))
  }

  test("sorted neighborhood: ONE window pass, candidates bounded by W·n") {
    val q = SparkEntry.queries("q_sorted_neighborhood")(spark, sf())
    val plan = q.queryExecution.executedPlan.toString
    val windowOps = plan.sliding("Window [".length).count(_ == "Window [")
    assert(windowOps === 1, s"expected exactly one Window operator:\n$plan")
    val n = Tables.documents(spark, sf()).count()
    assert(q.count() <= 3 * n)
  }

  test("clamped running sum: windowed Lindley form equals the sequential fold") {
    // The query computes B_i = max(0, B_{i-1} + d_i) via the closed form
    // S_i - min(0, min prefix S); this replays the recurrence directly.
    val out = SparkEntry.queries("q_clamped_runsum")(spark, sf()).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    val events = Tables.events(spark, sf())
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "purchase",
          -round(col("value") * 100).cast("long"))
          .otherwise(round(col("value") * 100).cast("long")).as("delta"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.time.LocalDateTime]("ts"),
        r.getAs[Long]("event_id"), r.getAs[Long]("delta")))
    assert(out.size === events.map(_._1).distinct.length)
    events.groupBy(_._1).foreach { case (uid, rows) =>
      var bal = 0L; var clamps = 0L; var total = 0L
      rows.sortBy(r => (ldtKey(r._2), r._3)).foreach { r =>
        total += r._4
        if (bal + r._4 < 0) { clamps += 1; bal = 0 } else bal += r._4
      }
      val o = out(uid)
      assert(o.getAs[Long]("final_balance_cents") === bal, s"user $uid")
      assert(o.getAs[Long]("clamp_events") === clamps, s"user $uid")
      assert(o.getAs[Long]("total_delta_cents") === total, s"user $uid")
    }
  }

  test("lag features replay against a sequential per-user scan") {
    val out = SparkEntry.queries("q_lag_features")(spark, sf()).collect()
    val byKey = out.map(r =>
      (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) -> r).toMap
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.time.LocalDateTime]("ts"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
    var checked = 0
    ev.groupBy(_._1).foreach { case (uid, rows) =>
      var views = 0L
      var purchases = Vector.empty[(Long, Long, Long)] // cents, eventId, viewsAt
      rows.sortBy(r => (ldtKey(r._2), r._3)).foreach { r =>
        if (r._4 == "view") views += 1
        if (r._4 == "purchase")
          purchases = purchases :+ ((math.round(r._5 * 100), r._3, views))
      }
      purchases.zipWithIndex.foreach { case ((cents, eid, vAt), i) =>
        val o = byKey((uid, eid))
        assert(o.getAs[Long]("cents") === cents)
        val lo = math.max(0, i - 3)
        assert(o.getAs[Long]("n3") === (i - lo).toLong)
        if (i == 0) {
          assert(o.isNullAt(o.fieldIndex("prev_cents")))
          assert(o.isNullAt(o.fieldIndex("gap_days")))
          assert(o.isNullAt(o.fieldIndex("sum3_cents")))
          assert(o.getAs[Long]("views_since") === vAt)
        } else {
          assert(o.getAs[Long]("prev_cents") === purchases(i - 1)._1)
          assert(o.getAs[Long]("gap_days") >= 0L)
          assert(o.getAs[Long]("sum3_cents") ===
            (lo until i).map(purchases(_)._1).sum)
          assert(o.getAs[Long]("views_since") === vAt - purchases(i - 1)._3)
        }
        checked += 1
      }
    }
    assert(checked === out.length)
  }

  test("FIFO match: staircase bound and full-consumption invariant") {
    val rows = SparkEntry.queries("q_fifo_match")(spark, sf()).collect()
    assert(rows.nonEmpty)
    var withBoth = 0
    rows.foreach { r =>
      val lots = r.getAs[Long]("n_lots"); val dem = r.getAs[Long]("n_demands")
      val su = r.getAs[Long]("supply_units"); val du = r.getAs[Long]("demand_units")
      val m = r.getAs[Long]("matched_units"); val nm = r.getAs[Long]("n_matches")
      // FIFO consumes min(supply, demand) exactly; the cumulative-interval
      // closed form must reproduce that without ever constructing the fold.
      assert(m === math.min(su, du), s"part ${r.getAs[Long]("partkey")}")
      // matches form a monotone staircase over the two cumulative axes
      if (lots > 0 && dem > 0) {
        assert(nm <= lots + dem - 1, s"part ${r.getAs[Long]("partkey")}")
        withBoth += 1
      } else assert(nm === 0L)
    }
    assert(withBoth > 0)
  }

  test("winnowing: sequential replay and the w-gap density guarantee") {
    val out = SparkEntry.queries("q_winnow")(spark, sf()).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), split(col("text"), " ").as("a"))
      .withColumn("hs", expr("CASE WHEN size(a) > 1 THEN " +
        "transform(sequence(1, size(a) - 1), i -> " +
        "CAST(conv(substring(md5(concat_ws(':', '3', concat(element_at(a, i)," +
        " ' ', element_at(a, i + 1)))), 1, 15), 16, 10) AS BIGINT) % 1000003) " +
        "ELSE CAST(array() AS ARRAY<BIGINT>) END"))
      .collect()
    assert(out.size === docs.length)
    docs.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val hs = r.getAs[scala.collection.Seq[Long]]("hs").toArray
      val sel = scala.collection.mutable.LinkedHashSet.empty[(Int, Long)]
      for (i <- 3 until hs.length) {
        // window [i-3, i]; min, rightmost on ties
        var best = i
        for (j <- (i - 3) to i) if (hs(j) < hs(best) ||
          (hs(j) == hs(best) && j > best)) best = j
        sel += ((best + 1, hs(best))) // 1-based gram position
      }
      val o = out(id)
      assert(o.getAs[Long]("n_grams") === math.max(hs.length, 0).toLong)
      assert(o.getAs[Long]("n_fp") === sel.size.toLong, s"doc $id")
      // .toSeq first: mapping the SET to hashes would collapse equal
      // hash values selected at different positions before the sum
      assert(o.getAs[Long]("fp_sum") === sel.toSeq.map(_._2).sum, s"doc $id")
      // density guarantee: consecutive selected positions gap <= w
      val pos = sel.map(_._1).toSeq.sorted
      pos.sliding(2).foreach {
        case Seq(p1, p2) => assert(p2 - p1 <= 4, s"doc $id gap $p1->$p2")
        case _ =>
      }
    }
  }

  test("truncation recall: bounds and agreement with brute-force overlap") {
    val rows = SparkEntry.queries("q_trunc_recall")(spark, sf()).collect()
    assert(rows.length === 50)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_common")
      assert(n >= 0 && n <= 5)
      assert(r.getAs[Long]("recall_micro") === n * 1000000L / 5)
    }
    // truncating to a strict prefix must lose SOME neighbors somewhere,
    // but keep well above chance (chance overlap ≈ K²·N_QUERIES/corpus ≈ 1)
    val total = rows.map(_.getAs[Long]("n_common")).sum
    assert(total > 5, s"suspiciously low overlap: $total")
    assert(total < 250, s"truncation lost nothing: $total")
  }

  test("largest-remainder apportionment sums exactly to the budget") {
    val rows = SparkEntry.queries("q_alloc_budget")(spark, sf()).collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum === 100000L)
    rows.foreach { r =>
      val fl = r.getAs[Long]("fl"); val alloc = r.getAs[Long]("alloc")
      assert(alloc === fl || alloc === fl + 1)
    }
  }

  test("Wilson interval brackets the point estimate and stays in [0,1]") {
    val rows = SparkEntry.queries("q_wilson_ci")(spark, sf()).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val p = r.getAs[Long]("p_micro")
      val lo = r.getAs[Long]("wilson_lo_micro")
      val hi = r.getAs[Long]("wilson_hi_micro")
      assert(lo >= 0L && hi <= 1000000L)
      assert(lo <= p && p <= hi)
      assert(hi > lo)
    }
  }

  test("blocking-quality metrics are internally consistent") {
    val r = SparkEntry.queries("q_blocking_quality")(spark, sf()).head
    val nd = r.getAs[Long]("n_docs"); val nt = r.getAs[Long]("n_true")
    val nc = r.getAs[Long]("n_cand"); val nh = r.getAs[Long]("n_hit")
    assert(nd > 0)
    assert(nh <= nt && nh <= nc)
    assert(nc <= nd * (nd - 1) / 2)
    if (nt > 0) assert(r.getAs[Long]("recall_micro") === nh * 1000000L / nt)
    if (nc > 0) assert(r.getAs[Long]("precision_micro") === nh * 1000000L / nc)
    assert(r.getAs[Long]("cand_ppm") <= 1000000L)
  }
}
