package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Specs for the round-4c curation operators (CDC snapshot diff,
  * incremental dedup, lossless prefix-filtered similarity join,
  * SemDeDup, hashed linear quality classifier). The DuckDB twins gate
  * end-to-end values; these pin the properties the hash gate can't
  * see: classification completeness against independently derived
  * predicates, prefix-filter losslessness against the unfiltered join,
  * survivor invariants, and an independent JVM replay of the margin.
  */
class CurationOpsSpec extends SparkTestBase {

  test("snapshot diff: classes match the generating predicates exactly") {
    val rows = SparkEntry.queries("q_snapshot_diff")(spark, sf()).collect()
    val keys = Tables.orders(spark, sf())
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val added = keys.filter(k => k % 89 == 0 && k % 97 != 0).toSet
    val removed = keys.filter(k => k % 97 == 0 && k % 89 != 0).toSet
    val changed = keys.filter(k =>
      k % 101 == 0 && k % 89 != 0 && k % 97 != 0).toSet
    val byType = rows.groupBy(_.getAs[String]("change_type"))
      .map { case (t, rs) => t -> rs.map(_.getAs[Long]("o_orderkey")).toSet }
    assert(byType.getOrElse("added", Set.empty) === added)
    assert(byType.getOrElse("removed", Set.empty) === removed)
    assert(byType.getOrElse("changed", Set.empty) === changed)
    // delta completeness: nothing else leaks out of the join
    assert(rows.length === added.size + removed.size + changed.size)
    // changed rows carry both prices, differing by the bump (ulp-tolerant:
    // old/new round onto different binary-exponent grids near powers of 2)
    rows.filter(_.getAs[String]("change_type") == "changed").foreach { r =>
      val diff = r.getAs[Double]("new_price") - r.getAs[Double]("old_price")
      assert(math.abs(diff - 25.0) < 1e-9)
    }
  }

  test("incremental dedup: exact flags replay; exact implies near when banded") {
    val out = SparkEntry.queries("q_incremental_dedup")(spark, sf()).collect()
    val docs = Tables.documents(spark, sf())
    val baseTexts = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("text")).collect().map(_.getString(0)).toSet
    val incoming = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // every incoming doc is classified, none dropped
    assert(out.map(_.getAs[Long]("doc_id")).toSet === incoming.keySet)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expectedExact = baseTexts.contains(incoming(id))
      assert(r.getAs[Boolean]("known_exact") === expectedExact,
        s"doc $id exact flag diverges from the digest replay")
      // an exact duplicate long enough to band must also band-match:
      // identical text => identical signature => identical band keys
      if (expectedExact && incoming(id).split(" ").length >= 3)
        assert(r.getAs[Boolean]("known_near"), s"exact dup $id not band-known")
      assert(r.getAs[Boolean]("is_new") ===
        (!r.getAs[Boolean]("known_exact") && !r.getAs[Boolean]("known_near")))
    }
  }

  test("prefix filter is lossless: equals the unfiltered inverted-index join") {
    val gated = SparkEntry.queries("q_prefix_filter_join")(spark, sf())
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth inside Spark: full postings (no prefix), exact
    // jaccard >= 1/2 over the same collapsed reps
    val reps = Tables.documents(spark, sf())
      .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
    val sh = DedupQueries.docShinglesOf(reps.withColumn("source", lit("x")))
      .select(col("doc_id"), col("sh"))
    val inv = sh.select(col("doc_id"), explode(col("sh")).as("h"))
    val full = inv.toDF("id_a", "h").join(inv.toDF("id_b", "h"), Seq("h"))
      .filter(col("id_a") < col("id_b")).select(col("id_a"), col("id_b")).distinct()
      .join(sh.toDF("id_a", "sh_a"), Seq("id_a"))
      .join(sh.toDF("id_b", "sh_b"), Seq("id_b"))
      .withColumn("ninter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jm", expr(
        "CAST(ninter AS BIGINT) * 1000000 DIV (size(sh_a) + size(sh_b) - ninter)"))
      .filter(col("jm") >= 500000)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gated === full)
  }

  test("semdedup: cluster minimum survives; every dup has a close earlier member") {
    val out = SparkEntry.queries("q_semdedup")(spark, sf())
    val rows = out.collect()
    val byCluster = rows.groupBy(_.getAs[Int]("cid"))
    byCluster.foreach { case (_, members) =>
      val minId = members.map(_.getAs[Long]("vec_id")).min
      val minRow = members.find(_.getAs[Long]("vec_id") == minId).get
      assert(!minRow.getAs[Boolean]("is_dup"), s"cluster min $minId flagged dup")
    }
    // every flagged dup really has an earlier same-cluster member with
    // cos >= 0.5 (cap cannot hide one at this scale: clusters are small)
    val e = Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    byCluster.foreach { case (_, members) =>
      val ids = members.map(_.getAs[Long]("vec_id")).sorted
      members.filter(_.getAs[Boolean]("is_dup")).foreach { r =>
        val id = r.getAs[Long]("vec_id")
        val earlier = ids.filter(_ < id).take(SimilarityQueries.SEM_CAP)
        assert(earlier.exists(a => cos(e(a), e(id)) >= 0.5),
          s"dup $id has no close earlier member")
      }
    }
  }

  test("ohlc resample: bounds hold; open/close match the explicit event order") {
    val bars = SparkEntry.queries("q_ohlc_resample")(spark, sf()).collect()
    assert(bars.nonEmpty)
    var vol = 0L
    bars.foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(l <= o && o <= h && l <= c && c <= h)
      assert(r.getAs[Long]("volume") >= 1)
      vol += r.getAs[Long]("volume")
    }
    // every event lands in exactly one bar
    assert(vol === Tables.events(spark, sf()).count())
    // replay one bar's open/close from the raw events
    val first = bars.head
    val evs = Tables.events(spark, sf())
      .filter(col("event_type") === first.getAs[String]("event_type"))
      .select(col("ts").cast("string"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .filter(_._1.startsWith(first.getAs[String]("w_start").take(13)))
      .sortBy(t => (t._1, t._2))
    assert(evs.head._3 === first.getAs[Double]("open"))
    assert(evs.last._3 === first.getAs[Double]("close"))
  }

  test("minhash-lsh candidate recall measured against the prefix-filter ground truth") {
    // q_prefix_filter_join is EXACT at jaccard >= 0.5 (losslessness
    // proven above); the banded MinHash-LSH candidates are probabilistic.
    // With 4 bands x 2 rows, P(candidate | J=0.5) = 1-(1-0.25)^4 ~ 68%
    // per banding theory — but verified pairs at J >= 0.5 in this corpus
    // are near-identical docs (J ~ 1), where detection is near-certain.
    // Pin a floor well above chance and report the measured recall.
    val truth = SparkEntry.queries("q_prefix_filter_join")(spark, sf("0.01"))
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    val cand = SparkEntry.queries("q_minhash_lsh_pairs")(spark, sf("0.01"))
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = truth.count(cand.contains)
    val recall = hit.toDouble / truth.size
    info(f"LSH recall vs exact J>=0.5 ground truth: $hit/${truth.size} = $recall%.2f")
    assert(recall >= 0.8, f"LSH candidate recall $recall%.2f below floor")
  }

  test("pit join: every order matches exactly one version; bump applied iff in v1 window") {
    val rows = SparkEntry.queries("q_pit_join")(spark, sf()).collect()
    assert(rows.length === Tables.orders(spark, sf()).count())
    assert(rows.map(_.getAs[Long]("o_orderkey")).distinct.length === rows.length)
    val bal = Tables.customer(spark, sf())
      .select(col("c_custkey"), QueryUtil.dec(col("c_acctbal")).cast("double"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val ck = r.getAs[Long]("o_custkey")
      val expectV1 = ck % 10 == 0 && r.getAs[String]("order_date") >= "1998-01-01"
      assert(r.getAs[String]("valid_from") ===
        (if (expectV1) "1998-01-01" else "1995-01-01"))
      assert(r.getAs[Double]("acctbal") === bal(ck) + (if (expectV1) 100.0 else 0.0))
    }
  }

  test("dq audit: row_count replays; clean generated data passes every check") {
    val m = SparkEntry.queries("q_dq_audit")(spark, sf()).collect()
      .map(r => r.getAs[String]("check_name") -> r.getAs[Long]("value")).toMap
    assert(m("row_count") === Tables.orders(spark, sf()).count())
    // the driver data is referentially clean and in-range by construction
    for (c <- Seq("null_custkey", "dup_orderkey", "nonpos_price",
        "date_out_of_range", "orphan_custkey"))
      assert(m(c) === 0L, s"$c expected clean, got ${m(c)}")
  }

  test("dedup survivor: one survivor per cluster, highest margin wins, min-id tiebreak") {
    val rows = SparkEntry.queries("q_dedup_survivor")(spark, sf()).collect()
    val margins = SparkEntry.queries("q_quality_classifier")(spark, sf()).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("margin_micro")).toMap
    rows.foreach(r => assert(r.getAs[Long]("margin_micro") ===
      margins(r.getAs[Long]("doc_id"))))
    rows.groupBy(_.getAs[Long]("cluster_rep")).foreach { case (_, members) =>
      val survivors = members.filter(_.getAs[Boolean]("is_survivor"))
      assert(survivors.length === 1)
      val best = members.map(m =>
        (-m.getAs[Long]("margin_micro"), m.getAs[Long]("doc_id"))).min
      assert(survivors.head.getAs[Long]("doc_id") === best._2)
    }
  }

  test("impute missing: null flags match the corruption; median/mode replay per group") {
    val rows = SparkEntry.queries("q_impute_missing")(spark, sf()).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("event_id")
      assert(r.getAs[Boolean]("value_was_null") === (id % 13 == 0))
      assert(r.getAs[Boolean]("type_was_null") === (id % 17 == 0))
    }
    // driver-side replay for one user with imputed rows
    val imputed = rows.filter(_.getAs[Boolean]("value_was_null"))
    assert(imputed.nonEmpty)
    val uid = imputed.head.getAs[Long]("user_id")
    val vals = Tables.events(spark, sf())
      .filter(col("user_id") === uid && col("event_id") % 13 =!= 0)
      .select(col("value")).collect().map(_.getDouble(0)).sorted
    val n = vals.length
    val med = if (n % 2 == 1) vals(n / 2) else (vals(n / 2 - 1) + vals(n / 2)) / 2
    imputed.filter(_.getAs[Long]("user_id") == uid)
      .foreach(r => assert(r.getAs[Double]("value_imputed") === med))
  }

  test("search eval: metric identities hold; mrr matches first relevant rank") {
    val rows = SparkEntry.queries("q_search_eval")(spark, sf()).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val frr = r.getAs[Int]("first_rel_rank")
      assert(r.getAs[Long]("mrr_micro") === 1000000L / frr)
      val p5 = r.getAs[Long]("p_at_5_micro")
      assert(p5 % 200000L === 0 && p5 >= 0 && p5 <= 1000000L)
      // a relevant doc inside the top 5 forces nonzero P@5 and vice versa
      assert((frr <= 5) === (p5 > 0))
    }
  }

  test("cusum: peak position replays sequentially for every event type") {
    val rows = SparkEntry.queries("q_cusum_changepoint")(spark, sf()).collect()
    assert(rows.nonEmpty)
    val events = Tables.events(spark, sf())
      .select(col("event_type"), col("event_id"), col("ts").cast("string"),
        round(col("value") * 100).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val xs = events.filter(_._1 == t).sortBy(e => (e._3, e._2)).map(_._4)
      val n = xs.length.toLong
      val total = xs.sum
      var run = 0L; var best = -1L; var bestPos = 0L
      xs.zipWithIndex.foreach { case (x, i) =>
        run += x
        val s = math.abs(n * run - (i + 1) * total)
        if (s > best) { best = s; bestPos = i + 1 }
      }
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("cusum_pos") === bestPos)
      assert(r.getAs[Long]("cusum_peak_scaled") === best)
    }
  }

  test("ppr: restart mass concentrates on and around the seed set") {
    val rows = SparkEntry.queries("q_ppr")(spark, sf()).collect()
    assert(rows.length === 100)
    val scores = rows.map(_.getAs[Long]("ppr_micro"))
    assert(scores.forall(_ >= 0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    def isSeed(n: String) = n.startsWith("c") && n.drop(1).toLong % 50 == 0
    val seedRows = rows.filter(r => isSeed(r.getAs[String]("node")))
    assert(seedRows.nonEmpty, "seeds must hold restart mass in the top 100")
    assert(seedRows.forall(_.getAs[Long]("ppr_micro") > 0))
  }

  test("linear attribution: value conserved up to per-purchase truncation") {
    val rows = SparkEntry.queries("q_attribution_linear")(spark, sf()).collect()
      .map(r => r.getAs[String]("touch_type") ->
        (r.getAs[Long]("n_credits"), r.getAs[Long]("credited_micro"))).toMap
    val purchases = Tables.events(spark, sf())
      .filter(col("event_type") === "purchase")
      .select(round(col("value") * 100).cast("long")).collect().map(_.getLong(0))
    val totalMicro = purchases.map(_ * 10000L).sum
    val credited = rows.values.map(_._2).sum
    // each attributed purchase loses < 2 micro to the two floors
    assert(credited <= totalMicro)
    assert(credited >= totalMicro - 2L * purchases.length)
    // every purchase appears exactly once per applicable bucket
    val nDirect = rows.get("direct").map(_._1).getOrElse(0L)
    assert(rows("view")._1 === rows("click")._1)
    assert(rows("view")._1 + nDirect === purchases.length.toLong)
  }

  test("kcore: replays a sequential 3-round peel of the same projection") {
    val got = SparkEntry.queries("q_kcore")(spark, sf()).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("deg3")).toMap
    var edges = GraphQueries.copurchasePairs(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    for (_ <- 1 to 3) {
      val deg = edges.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= 3).keySet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
    }
    val want = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    assert(got === want)
  }

  test("interval merge: islands disjoint with real gaps; events conserved") {
    val rows = SparkEntry.queries("q_interval_merge")(spark, sf()).collect()
    val nEvents = Tables.events(spark, sf()).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum === nEvents)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, islands) =>
      val sorted = islands.sortBy(_.getAs[Long]("island"))
      sorted.foreach { r =>
        assert(r.getAs[Long]("span_s") >= 240L) // at least one ±120 s interval
        assert(r.getAs[Long]("merged_end") > r.getAs[Long]("merged_start"))
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("merged_start") > a.getAs[Long]("merged_end"),
            "islands must be separated by a strict gap")
        case _ =>
      }
    }
  }

  test("bpe merges: replays in an independent sequential JVM implementation") {
    val rows = SparkEntry.queries("q_bpe_merges")(spark, sf()).collect()
    assert(rows.length === 3)
    // sequential reference: greedy BPE over the same capped vocabulary
    val vocab = Tables.documents(spark, sf())
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))
      .orderBy(col("wn").desc, col("w")).limit(TextQueries.VocabCap)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    var segs: Seq[(Vector[String], Long)] =
      vocab.map { case (w, n) => (w.map(_.toString).toVector, n) }.toSeq
    val expected = (1 to 3).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      segs.foreach { case (syms, n) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + n)
      }
      val best = counts.toSeq.map { case ((a, b), n) => (-n, a, b) }.min
      val (pa, pb) = (best._2, best._3)
      segs = segs.map { case (syms, n) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == pa && syms(i + 1) == pb) {
            out += pa + pb; i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.result(), n)
      }
      (r, pa, pb, -best._1)
    }
    val got = rows.map(r => (r.getAs[Int]("round"), r.getAs[String]("pa"),
      r.getAs[String]("pb"), r.getAs[Long]("n"))).toSeq
    assert(got === expected)
    // merge frequency is non-increasing across rounds
    assert(got.map(_._4).sliding(2).forall(s => s.head >= s.last))
  }

  test("embed projection: replays in an independent JVM implementation") {
    val rows = SparkEntry.queries("q_embed_project")(spark, sf()).collect()
    val embs = Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def p60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    def w(j: Int, i: Int): Double = (p60(s"plane:$j:$i") % 1000L).toDouble / 1000.0 - 0.5
    rows.take(10).foreach { r =>
      val e = embs(r.getAs[Long]("vec_id"))
      for (j <- 0 until 8) {
        var acc = 0.0
        for (i <- e.indices) acc += e(i).toDouble * w(j, i + 1)
        val expected = BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getAs[Double](s"p$j") === expected)
      }
    }
  }

  test("quality classifier: margin replays in an independent JVM implementation") {
    val rows = SparkEntry.queries("q_quality_classifier")(spark, sf()).collect()
    val texts = Tables.documents(spark, sf())
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def p60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    def weight(tok: String): Long = {
      val bucket = p60(s"7:$tok") % 4096
      (p60(s"11:$bucket") % 2001) - 1000
    }
    rows.take(50).foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id")).split(" ").filter(_.nonEmpty)
      val expected = toks.map(weight).sum
      assert(r.getAs[Long]("margin_micro") === expected)
      assert(r.getAs[Boolean]("keep") === (expected > 0))
      assert(r.getAs[Int]("n_tokens") === toks.length)
    }
  }
}
