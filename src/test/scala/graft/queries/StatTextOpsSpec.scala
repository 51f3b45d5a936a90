package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Specs for the round-4b operators (BM25, PMI co-occurrence, shared-
  * substring coverage, priority sampling, MAD outliers, winsorize,
  * Markov transitions, k-hop BFS, embedding quantile normalization).
  * The DuckDB twins gate end-to-end values; these pin the properties
  * the hash gate can't see: ground-truth BFS distances, top-k
  * optimality of the sample, probability-simplex closure, bound
  * invariants.
  */
class StatTextOpsSpec extends SparkTestBase {

  test("bm25: only docs containing a query term appear; scores sum and are positive") {
    val rows = SparkEntry.queries("q_bm25")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s1, s2, s3) = (r.getAs[Double]("s_spark"),
        r.getAs[Double]("s_query"), r.getAs[Double]("s_fast"))
      assert(s1 >= 0 && s2 >= 0 && s3 >= 0)
      assert(r.getAs[Double]("bm25") === s1 + s2 + s3)
      assert(s1 + s2 + s3 > 0) // at least one query-term hit
    }
    // descending by total score
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("cooccur pmi: counts are consistent and pair keys canonical") {
    SparkEntry.queries("q_cooccur_pmi")(spark, sf()).collect().foreach { r =>
      val (cuv, cu, cv) = (r.getAs[Long]("c_uv"), r.getAs[Long]("c_u"), r.getAs[Long]("c_v"))
      assert(r.getAs[String]("tok_u") < r.getAs[String]("tok_v"))
      assert(cuv >= 5 && cuv <= math.min(cu, cv))
      assert(r.getAs[Double]("lift") > 0)
    }
  }

  test("substr dedup: coverage bounded; exact-duplicate docs have full coverage") {
    val res = SparkEntry.queries("q_substr_dedup")(spark, sf())
    val rows = res.collect()
    rows.foreach { r =>
      val (n, sh) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_shared_grams"))
      assert(sh >= 0 && sh <= n)
      assert(r.getAs[Double]("shared_ratio") === sh.toDouble / n.toDouble)
    }
    // any doc whose full text occurs in another doc shares every 8-gram
    val dupIds = Tables.documents(spark, sf())
      .filter(size(split(col("text"), " ")) >= 8)
      .groupBy(col("text")).agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(col("ids")).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    if (dupIds.nonEmpty) {
      val byId = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("shared_ratio")).toMap
      dupIds.foreach(id => assert(byId(id) === 1.0, s"dup doc $id not fully covered"))
    }
  }

  test("weighted sample: top-k by priority is optimal and deterministic") {
    val got = SparkEntry.queries("q_weighted_sample")(spark, sf()).collect()
    assert(got.length === 100)
    val minSelected = got.map(_.getAs[Double]("priority")).min
    // recompute all priorities; the 100th-largest must equal minSelected
    val all = SparkEntry.queries("q_weighted_sample")(spark, sf())
    val again = all.collect()
    assert(got.map(_.getLong(0)).toSeq === again.map(_.getLong(0)).toSeq)
    val kth = Tables.documents(spark, sf())
      .select((col("n_chars").cast("double") /
        ((TextQueries.phash(col("doc_id").cast("string"), 21) % 1000000L + 1L)
          .cast("double") / lit(1000000.0))).as("p"))
      .orderBy(col("p").desc).limit(100)
      .agg(min(col("p"))).head.getDouble(0)
    assert(minSelected === kth)
  }

  test("mad outliers match a driver-side recompute") {
    def medianOf(xs: Array[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    val by = Tables.lineitem(spark, sf())
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1))).toMap
    SparkEntry.queries("q_mad_outliers")(spark, sf()).collect().foreach { r =>
      val xs = by(r.getString(0))
      val med = medianOf(xs)
      val mad = medianOf(xs.map(x => math.abs(x - med)))
      assert(r.getAs[Double]("med") === med)
      assert(r.getAs[Double]("mad") === mad)
      assert(r.getAs[Long]("n_outliers") ===
        xs.count(x => math.abs(x - med) > 3.0 * mad).toLong)
    }
  }

  test("winsorize: bounds ordered, tails capped, sum within clamp range") {
    SparkEntry.queries("q_winsorize")(spark, sf()).collect().foreach { r =>
      val (p05, p95) = (r.getAs[Double]("p05"), r.getAs[Double]("p95"))
      val (n, lo, hi) = (r.getAs[Long]("n"), r.getAs[Long]("n_low"), r.getAs[Long]("n_high"))
      val sum = r.getAs[Double]("winsor_sum")
      assert(p05 <= p95)
      assert(lo + hi < n)
      // ~5% in each tail (interpolated percentile ⇒ within ±1 row)
      assert(math.abs(lo - 0.05 * n) <= 0.01 * n + 1)
      assert(math.abs(hi - 0.05 * n) <= 0.01 * n + 1)
      assert(sum >= n * p05 - 1e-6 && sum <= n * p95 + 1e-6)
    }
  }

  test("markov transitions: rows per from-state form a probability simplex") {
    val rows = SparkEntry.queries("q_markov_transitions")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val pSum = rs.map(_.getAs[Double]("p_trans")).sum
      assert(math.abs(pSum - 1.0) < 1e-9)
      val nFrom = rs.head.getAs[Long]("n_from")
      assert(rs.map(_.getAs[Long]("n_trans")).sum === nFrom)
    }
  }

  test("k-hop frontier matches a driver-side BFS") {
    val li = Tables.lineitem(spark, sf()).select(col("l_orderkey"), col("l_suppkey"))
    val o = Tables.orders(spark, sf()).select(col("o_orderkey"), col("o_custkey"))
    val cs = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("a"),
        concat(lit("s"), col("l_suppkey")).as("b"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val adj = (cs.map(e => e._1 -> e._2) ++ cs.map(e => e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = Tables.supplier(spark, sf()).filter(col("s_suppkey") % 10 === 0)
      .select(concat(lit("s"), col("s_suppkey"))).collect().map(_.getString(0)).toSet
    var visited = seeds
    var frontier = seeds
    val expect = scala.collection.mutable.Map(0 -> seeds.size.toLong)
    for (h <- 1 to 3) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- visited
      visited ++= frontier
      if (frontier.nonEmpty) expect(h) = frontier.size.toLong
    }
    val got = SparkEntry.queries("q_khop_frontier")(spark, sf())
      .collect().map(r => r.getInt(0) -> r.getAs[Long]("n_nodes")).toMap
    assert(got === expect.toMap)
  }

  test("salted join equals the plain join bit-for-bit") {
    val salted = SparkEntry.queries("q_salted_join")(spark, sf()).collect()
    val plain = Tables.lineitem(spark, sf())
      .join(Tables.supplier(spark, sf()), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_lines"), QueryUtil.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("s_nationkey")).collect()
    assert(salted.toSeq === plain.toSeq)
  }

  test("source gini: zero for single-language sources, bounded by 1 - 1/k") {
    SparkEntry.queries("q_source_gini")(spark, sf()).collect().foreach { r =>
      val (k, g) = (r.getAs[Long]("n_langs"), r.getAs[Double]("gini"))
      assert(g >= 0.0 && g <= 1.0 - 1.0 / k + 1e-12)
      if (k == 1) assert(g === 0.0)
    }
  }

  test("attribution: users and revenue both partition exactly across channels") {
    val rows = SparkEntry.queries("q_attribution")(spark, sf()).collect()
    val ev = Tables.events(spark, sf())
    assert(rows.map(_.getAs[Long]("n_users")).sum ===
      ev.select(col("user_id")).distinct().count())
    val totalCents = ev.filter(col("event_type") === "purchase")
      .agg(sum(round(col("value") * 100).cast("decimal(38,0)"))).head.getDecimal(0)
    val attributed = rows.flatMap(r => Option(r.getAs[java.lang.Double]("attributed_rev")))
      .map(v => BigDecimal(v) * 100).sum
    assert(attributed === BigDecimal(totalCents))
  }

  test("containment dominates jaccard; exact-duplicate texts collapse to one rep") {
    val rows = SparkEntry.queries("q_containment")(spark, sf()).collect()
    rows.foreach { r =>
      val (nc, na, nb) = (r.getAs[Long]("n_common"), r.getAs[Int]("n_a"), r.getAs[Int]("n_b"))
      val jac = nc.toDouble / (na + nb - nc).toDouble
      assert(r.getAs[Double]("cont_ab") >= jac && r.getAs[Double]("cont_ba") >= jac)
      assert(nc <= math.min(na, nb))
    }
    // duplicate-text classes never pair with themselves (collapsed to
    // the min-id rep), and any rep that does appear carries its class
    // size as the member count
    val dupGroups = Tables.documents(spark, sf())
      .groupBy(col("text"), col("source")).agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(array_sort(col("ids")).as("ids")).collect()
      .map(_.getSeq[Long](0))
    val pairIds = rows.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val memOf = rows.flatMap(r => Seq(
      r.getAs[Long]("id_a") -> r.getAs[Long]("n_mem_a"),
      r.getAs[Long]("id_b") -> r.getAs[Long]("n_mem_b"))).toMap
    dupGroups.foreach { ids =>
      for (a <- ids; b <- ids if a < b)
        assert(!pairIds.contains((a, b)), s"intra-class pair ($a,$b) survived collapse")
      memOf.get(ids.min).foreach(m => assert(m === ids.size.toLong))
    }
  }

  test("cluster stats: sizes partition the corpus; removable = docs - clusters") {
    val rows = SparkEntry.queries("q_cluster_stats")(spark, sf()).collect()
    val nDocs = Tables.documents(spark, sf()).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_removable") ===
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_clusters"))
    }
  }

  test("token vocab: contiguous ranks, monotone coverage curve") {
    val rows = SparkEntry.queries("q_token_vocab")(spark, sf()).collect()
    assert(rows.map(_.getAs[Int]("rnk")).toSeq === (1 to rows.length))
    val shares = rows.map(_.getAs[Double]("share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b })
    val cums = rows.map(_.getAs[Double]("cum_share"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(cums.last <= 1.0 + 1e-12)
    assert(math.abs(cums.head - shares.head) < 1e-15)
  }

  test("embedding quantile norm: each dimension spans the full [0,1] rank range") {
    val rows = SparkEntry.queries("q_embed_quantile_norm")(spark, sf()).collect()
    val byDim = rows.groupBy(_.getAs[Int]("dim"))
    assert(byDim.keySet === (0 until 8).toSet)
    byDim.foreach { case (_, rs) =>
      val prs = rs.map(_.getAs[Double]("pr"))
      assert(prs.min === 0.0 && prs.max === 1.0)
      assert(prs.forall(p => p >= 0.0 && p <= 1.0))
      // rank order agrees with value order
      val sorted = rs.sortBy(_.getAs[Double]("v"))
      assert(sorted.map(_.getAs[Double]("pr")).toSeq.sorted ===
        sorted.map(_.getAs[Double]("pr")).toSeq)
    }
  }
}
