package graft.sources

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** q_frame_phash_near — perceptual (aHash) image near-dup over the
  * planted fixture tree (DicomNearDupFixtures). The DuckDB twin replays
  * the independent Python golden (tools/gen_phash_golden.py); this spec
  * pins the plant itself: the brightness-shifted copies MUST be
  * recalled (the property q_frame_dedup's exact checksum provably
  * cannot see), the unrelated volume must not be, and the candidate
  * generation must be banded, never all-pairs.
  */
class PhashNearDupSpec extends SparkTestBase {

  test("ahash64 is exactly invariant under uniform brightness shift") {
    // cross-multiplied block-mean-vs-frame-mean comparison: +k moves
    // both sides by k*cellCount*N, so every bit survives any shift that
    // stays in range — checked on all fixture payloads and a sawtooth
    // that straddles block boundaries unevenly (rows=10 not divisible
    // by 8 → some 1-row and some 2-row cells).
    for (v <- DicomNearDupFixtures.volumes) {
      val px = DicomNearDupFixtures.pixels(v).map(_ & 0xff).toSeq
      val per = DicomNearDupFixtures.Shape(1) * DicomNearDupFixtures.Shape(2)
      for (s <- 0 until DicomNearDupFixtures.Shape.head) {
        val frame = px.slice(s * per, (s + 1) * per)
        val h0 = DicomLike.ahash64(frame, 16, 16)
        val h1 = DicomLike.ahash64(frame.map(_ + 16), 16, 16)
        assert(h0 === h1, s"${v.uid} slice $s not brightness-invariant")
      }
    }
    val oddFrame = (0 until 10 * 12).map(i => (i * 7 + 3) % 180)
    assert(DicomLike.ahash64(oddFrame, 10, 12) ===
      DicomLike.ahash64(oddFrame.map(_ + 60), 10, 12))
    // domain guards: wrong length / empty shape → None
    assert(DicomLike.ahash64(Seq(1, 2, 3), 16, 16).isEmpty)
    assert(DicomLike.ahash64(Seq.empty, 0, 0).isEmpty)
  }

  test("planted near-dups are recalled; the unrelated volume is not") {
    val rows = SparkEntry.queries("q_frame_phash_near")(spark, sf())
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getInt(3),
        r.getInt(4)))
      .toSet
    // brightness pairs: provably hamming 0 on BOTH slices
    for (s <- 0 to 1) {
      assert(rows.contains(("nd-a1", s, "nd-a2", s, 0)), s"a-pair slice $s")
      assert(rows.contains(("nd-b1", s, "nd-b2", s, 0)), s"b-pair slice $s")
    }
    // the spot-artifact volume: slice 0 drifted past the threshold
    // (hamming 4 — the boundary exhibit), slice 1 is bit-identical, so
    // the volume is still recalled through its untouched slice.
    assert(rows.contains(("nd-a1", 1, "nd-a3", 1, 0)))
    assert(!rows.exists(p => p._1 == "nd-a1" && p._3 == "nd-a3" &&
      p._2 == 0 && p._4 == 0), "spot slice 0 must be past the threshold")
    // true negative: nd-c1 (distinct sawtooth) pairs with nothing
    assert(!rows.exists(p => p._1 == "nd-c1" || p._3 == "nd-c1"))
  }

  test("candidates come from the band equi-join, never a product") {
    val plan = SparkEntry.queries("q_frame_phash_near")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
