package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Round-12 data-selection operators: DSIR-style importance weights
  * (q_dsir_weights) and contrastive hard-negative mining
  * (q_hard_negatives). The DuckDB twins hash-gate end-to-end values;
  * these specs replay each operator in a SEQUENTIAL Scala reference on
  * the sf0.001 tables — pinning that both distributed twins implement
  * the intended algorithm, not merely the same one (the LmTokenizerSpec
  * precedent).
  */
class SelectionOpsSpec extends SparkTestBase {

  /** The portable 60-bit hash both engines share: first 15 hex chars of
    * md5("seed:value") — the sequential form of QueryUtil's
    * phash/sqlPhash pair. */
  private def phash60(s: String, seed: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$s".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("q_dsir_weights replays the hashed-feature permille affinity exactly") {
    val B = 4096L
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perDoc = docs.map { case (id, lang, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      (id, lang, toks.groupBy(t => phash60(t, 29) % B)
        .map { case (b, ts) => b -> ts.length.toLong })
    }
    val srcC = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val tgtC = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    var nS = 0L
    var nT = 0L
    perDoc.foreach { case (_, lang, m) =>
      m.foreach { case (b, c) =>
        srcC(b) += c; nS += c
        if (lang == "en") { tgtC(b) += c; nT += c }
      }
    }
    def dpm(b: Long): Long =
      (tgtC(b) + 1) * 1000000L / (nT + B) - (srcC(b) + 1) * 1000000L / (nS + B)
    val expected = perDoc.map { case (id, _, m) =>
      val n = m.values.sum
      val score = m.map { case (b, c) => c * dpm(b) }.sum
      (id, n, score, score > 0L)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("q_dsir_weights")(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    assert(got === expected)
  }

  test("q_dsir_weights separates the target language from the rest") {
    // The operator's point: docs drawn from the target distribution
    // (lang = en) must score higher ON AVERAGE than the rest — a
    // selection signal, not noise.
    val langs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val scores = SparkEntry.queries("q_dsir_weights")(spark, sf())
      .filter(col("n_toks") > 0).collect()
      .map(r => (langs(r.getLong(0)), r.getLong(2)))
    val en = scores.collect { case ("en", s) => s }
    val rest = scores.collect { case (l, s) if l != "en" => s }
    assert(en.nonEmpty && rest.nonEmpty)
    assert(en.sum.toDouble / en.size > rest.sum.toDouble / rest.size,
      s"mean en ${en.sum / en.size} must exceed mean rest ${rest.sum / rest.size}")
  }

  test("q_hard_negatives replays brute-force cross-label top-k exactly") {
    val em = Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    // bit-exact replica of CosineSimilarity's sequential accumulation
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; nx += x * x; ny += y * y; i += 1
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = em.filter(_._1 < 50).sortBy(_._1).flatMap {
      case (ida, la, ea) =>
        em.filter(_._2 != la)
          .map { case (idb, _, eb) => (idb, r6(cos(eb, ea))) }
          .filter(_._2 <= 0.999)
          .sortBy { case (idb, c) => (-c, idb) }
          .take(5).zipWithIndex
          .map { case ((idb, c), i) => (ida, i + 1, idb, c) }
    }.toSeq
    val got = SparkEntry.queries("q_hard_negatives")(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === expected)
  }

  test("q_hard_negatives: every mined pair crosses labels, ranks are dense") {
    val labels = Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = SparkEntry.queries("q_hard_negatives")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, _, b, c) =>
      assert(labels(a) != labels(b), s"pair ($a, $b) shares a label")
      assert(c <= 0.999, s"pair ($a, $b) above the denoise ceiling: $c")
    }
    rows.groupBy(_._1).foreach { case (a, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1 to rs.length),
        s"anchor $a ranks not dense: ${rs.map(_._2).sorted.mkString(",")}")
    }
  }

  test("q_host_dedup replays the domain cap + mass-preserving reweight exactly") {
    // Sequential reference with an INDEPENDENT domain extraction
    // (split/takeRight instead of the query's regexp chain).
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val withDom = docs.map { case (id, src, nch) =>
      val sub = if (id % 3 == 0) "www." else "cdn."
      val url = s"https://$sub${src.toLowerCase}${id % 7}.org/p/$id"
      val host = url.drop("https://".length).takeWhile(_ != '/')
      val dom = host.split('.').takeRight(2).mkString(".")
      (id, dom, nch)
    }
    val expected = withDom.groupBy(_._2).flatMap { case (dom, rows) =>
      val n = rows.length.toLong
      val kept = rows.sortBy { case (id, _, nch) => (-nch, id) }.take(3)
      val keptN = math.min(n, 3L)
      kept.zipWithIndex.toSeq.map { case ((id, _, _), i) =>
        (id, dom, n, i + 1, 1000000L * n / keptN)
      }
    }.toSet
    val got = SparkEntry.queries("q_host_dedup")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3),
        r.getLong(4)))
      .toSet
    assert(got === expected)
    // the cap must actually bite somewhere at sf0.001, or the fixture
    // stopped exercising the operator
    assert(expected.exists(_._3 > 3L), "no domain exceeded the cap")
  }
}
