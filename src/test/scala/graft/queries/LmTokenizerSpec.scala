package graft.queries

import graft.{SparkEntry, SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Round-11 operators: BPE tokenizer application (q_bpe_encode),
  * per-doc bigram-LM scoring (q_doc_lm_score), and the truncated-window
  * EWMA user snapshot (q_ewma). The DuckDB twins hash-gate end-to-end
  * values; these specs replay each operator in a SEQUENTIAL Scala
  * reference implementation on the sf0.001 corpus — the property the
  * hash gate can't see is that BOTH distributed twins implement the
  * intended algorithm, not merely the same one.
  */
class LmTokenizerSpec extends SparkTestBase {

  /** Exhaustive left-to-right single-merge application — the semantics
    * the delimiter-string `replace` encodes in both engines. */
  private def applyMerge(seg: List[String], pa: String, pb: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < seg.length) {
      if (i + 1 < seg.length && seg(i) == pa && seg(i + 1) == pb) {
        out += (pa + pb); i += 2
      } else { out += seg(i); i += 1 }
    }
    out.toList
  }

  /** Sequential BPE trainer: top-VocabCap words by (count desc, word
    * asc), 3 rounds of (most frequent adjacent pair, ties pair-asc). */
  private def trainMerges(wordCounts: Map[String, Long]): Seq[(String, String)] = {
    val vocab = wordCounts.toSeq
      .sortBy { case (w, n) => (-n, w) }.take(TextQueries.VocabCap)
    var segs = vocab.map { case (w, n) => (w.map(_.toString).toList, n) }
    (1 to 3).map { _ =>
      val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
      segs.foreach { case (seg, n) =>
        seg.zip(seg.drop(1)).foreach { p =>
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
        }
      }
      val (pa, pb) = pairCounts.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.head._1
      segs = segs.map { case (seg, n) => (applyMerge(seg, pa, pb), n) }
      (pa, pb)
    }
  }

  private lazy val docs: Seq[(Long, String)] =
    Tables.documents(spark, sf()).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private def words(text: String): Seq[String] =
    text.split(" ", -1).filter(_.nonEmpty).toSeq

  test("q_bpe_encode replays a sequential BPE train+apply reference") {
    val wordCounts = docs.flatMap(d => words(d._2))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val merges = trainMerges(wordCounts)
    val tokCache = scala.collection.mutable.Map[String, Long]()
    def nTok(w: String): Long = tokCache.getOrElseUpdate(w, {
      var seg = w.map(_.toString).toList
      merges.foreach { case (pa, pb) => seg = applyMerge(seg, pa, pb) }
      seg.length.toLong
    })
    val expected = docs.map { case (id, text) =>
      val ws = words(text)
      val nW = ws.size.toLong
      val nT = ws.map(nTok).sum
      (id, nW, nT, if (nW == 0) 0L else nT * 100 / nW)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_bpe_encode")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
  }

  test("q_bpe_encode: merges only shrink — n_words <= n_bpe_tokens <= word chars") {
    val rows = SparkEntry.queries("q_bpe_encode")(spark, sf()).collect()
    val charsPerDoc = docs.map { case (id, t) => id -> words(t).map(_.length.toLong).sum }.toMap
    rows.foreach { r =>
      val (id, nW, nT) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nW <= nT, s"doc $id: fewer tokens than words")
      assert(nT <= charsPerDoc(id), s"doc $id: more tokens than characters")
    }
  }

  test("q_doc_lm_score replays a sequential add-one bigram LM reference") {
    // Unfiltered split — the same tokenization as q_bigram_lm, so the
    // permille estimator is the identical (c12+1)*1000 / (c1+v).
    def toks(text: String): Seq[String] = text.split(" ", -1).toSeq
    val allBigrams = docs.flatMap { case (_, t) =>
      val a = toks(t); if (a.size > 1) a.zip(a.drop(1)) else Seq.empty
    }
    val c12 = allBigrams.groupBy(identity).map { case (p, ps) => p -> ps.size.toLong }
    val c1 = allBigrams.groupBy(_._1).map { case (w, ps) => w -> ps.size.toLong }
    val v = docs.flatMap(d => toks(d._2)).distinct.size.toLong
    val expected = docs.map { case (id, t) =>
      val a = toks(t)
      val bgs = if (a.size > 1) a.zip(a.drop(1)) else Seq.empty
      if (bgs.isEmpty) (id, 0L, 0L, 0L, 0L)
      else {
        val pps = bgs.map(p => (c12(p) + 1) * 1000 / (c1(p._1) + v))
        (id, bgs.size.toLong, pps.sum, pps.min, pps.sum / bgs.size)
      }
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_doc_lm_score")(spark, sf())
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got === expected)
  }

  test("q_ewma replays the truncated-16 exact-rational recursion per user") {
    val weights = (0 to 15).map(j =>
      BigInt(3).pow(j).toLong * BigInt(4).pow(15 - j).toLong)
    val events = Tables.events(spark, sf())
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map { r =>
        val ts = r.getAs[java.time.LocalDateTime](1)
        (r.getLong(0),
          (ts.toEpochSecond(java.time.ZoneOffset.UTC), ts.getNano),
          r.getLong(2), r.getLong(3))
      }
    val expected = events.groupBy(_._1).toSeq.map { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3)).map(_._4)
      val last16 = ordered.takeRight(16)
      // last16(k), k 0-based from the oldest in the frame: lag j =
      // last16.length - 1 - k.
      val num = last16.zipWithIndex.map { case (c, k) =>
        c * weights(last16.length - 1 - k)
      }.sum
      (uid, ordered.length.toLong, num, num * 1000 / 4294967296L)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q_ewma")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
  }

  test("q_ewma enforces the |value| domain contract with raise_error") {
    // The overflow contract (|cents| < 2.1e6 keeps num·1000 < 2^63) is
    // ENFORCED, not just documented — same pattern as
    // q_event_dedup_first's negative-id guard. Out-of-contract data
    // must fail loudly instead of silently wrapping the numerator.
    import spark.implicits._
    def writeEvents(value: Double): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_ewma_guard").toString
      Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, value, "click"))
        .toDF("user_id", "ts", "event_id", "value", "event_type")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    // just inside the contract: must not trip the guard
    val ok = SparkEntry.queries("q_ewma")(spark, writeEvents(20999.99)).collect()
    assert(ok.length === 1 && ok(0).getLong(2) === 2099999L * 1073741824L)
    // out of contract: must raise, naming the query
    val ex = intercept[Throwable] {
      SparkEntry.queries("q_ewma")(spark, writeEvents(21000.01)).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("q_ewma")),
      s"expected the q_ewma contract error, got: ${chain(ex).mkString(" | ")}")
  }

  test("q_doc_lm_score internal consistency: permille bounds and DIV identities") {
    val scores = SparkEntry.queries("q_doc_lm_score")(spark, sf())
      .filter(col("n_bigrams") > 0).collect()
    assert(scores.nonEmpty)
    scores.foreach { r =>
      val (n, sum, mn, avg) = (r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("sum_permille"), r.getAs[Long]("min_permille"),
        r.getAs[Long]("avg_permille"))
      // The estimator is a probability in permille: (c12+1) <= (c1+v)
      // because c12 <= c1 and v >= 1, so every per-bigram value < 1000.
      assert(mn >= 0 && mn < 1000, s"min_permille $mn out of [0, 1000)")
      assert(mn <= avg && avg < 1000)
      // avg is the floor-DIV of sum by n.
      assert(avg === sum / n)
      assert(mn * n <= sum && sum <= avg * n + (n - 1))
    }
  }
}
