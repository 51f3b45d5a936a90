package graft.sources

import graft.{SparkEntry, SparkTestBase}

/** Audio modality — q_audio_features / q_audio_near over the WAV
  * fixture tree. The DuckDB twins replay the independent Python golden
  * (tools/gen_wav_golden.py — stdlib `wave` parse); this spec pins the
  * decode contract, the scale-invariance plant, and the banded plan.
  */
class WavSpec extends SparkTestBase {

  test("encode/decode round-trips; contract rejects non-mono-16-bit") {
    val s = Array.tabulate(256)(i => (i * 37) % 4001 - 2000)
    val wav = WavLike.decode(WavLike.encode(8000, s))
    assert(wav.isDefined)
    assert(wav.get.sample_rate === 8000)
    assert(wav.get.samples === s.toSeq)
    // corrupt container and real-but-stereo audio both decode to None
    assert(WavLike.decode(WavFixtures.corruptBytes).isEmpty)
    assert(WavLike.decode(WavFixtures.stereoBytes).isEmpty)
    // truncated header / truncated data chunk
    assert(WavLike.decode(WavLike.encode(8000, s).take(40)).isEmpty)
    assert(WavLike.decode(WavLike.encode(8000, s).dropRight(7)).isEmpty)
  }

  test("envelope hash: exact amplitude rescale is invisible, edits are not") {
    // the ×3 twin must be found at hamming 0 (winSum·64 > totalSum is
    // cross-multiplied — both sides scale by exactly 3); the window-
    // zeroed edit is near (≤3) but nonzero; the unrelated signal and
    // the undecodable files pair with nothing.
    val pairs = SparkEntry.queries("q_audio_near")(spark, sf())
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    assert(pairs.contains(("a1.wav", "a2_scaled.wav", 0)), pairs.toString)
    assert(pairs.contains(("a1.wav", "a3_copy.wav", 0)))
    assert(pairs.exists(p =>
      p._1 == "b1.wav" && p._2 == "b2_edit.wav" && p._3 > 0 && p._3 <= 3),
      "edited variant must be near but not identical")
    for (f <- Seq("c1.wav", "corrupt.wav", "d1_stereo.wav"))
      assert(!pairs.exists(p => p._1 == f || p._2 == f), s"$f must not pair")
  }

  test("features: undecodable rows are all-NULL, never -1 or partial") {
    val rows = SparkEntry.queries("q_audio_features")(spark, sf()).collect()
    assert(rows.length === 8)
    val bad = rows.filter(r =>
      Seq("corrupt.wav", "d1_stereo.wav").contains(r.getString(0)))
    assert(bad.length === 2)
    bad.foreach(r => (1 until r.length).foreach(i =>
      assert(r.isNullAt(i), s"${r.getString(0)} col $i must be NULL")))
    val a1 = rows.find(_.getString(0) == "a1.wav").get
    assert(a1.getAs[Int]("n_samples") === 4096)
    assert(a1.getAs[Long]("duration_us") === 512000L)
  }

  test("near-dup candidates come from the band equi-join, never a product") {
    val plan = SparkEntry.queries("q_audio_near")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
