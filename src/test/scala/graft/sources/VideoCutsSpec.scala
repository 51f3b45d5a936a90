package graft.sources

import graft.{SparkEntry, SparkTestBase}

/** q_frame_cuts — temporal shot-boundary detection over the planted
  * cine-loop fixture (VideoFixtures). The DuckDB twin replays the
  * independent Python golden (tools/gen_video_golden.py); this spec
  * pins the plant: cuts land EXACTLY at the segment boundaries, the
  * smooth volume contributes zero cuts, drift frames carry the exact
  * +2-per-pixel SAD, and the 2-D still never enters the frame table.
  */
class VideoCutsSpec extends SparkTestBase {

  test("cuts land exactly at the planted segment boundaries") {
    val rows = SparkEntry.queries("q_frame_cuts")(spark, sf()).collect()
    // 23 transitions per 24-frame volume, 2 temporal volumes
    assert(rows.length === 46)
    val cuts = rows.filter(_.getBoolean(3))
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(cuts === Set(("vid-cuts", 8), ("vid-cuts", 16)))
    // drift frames: +2 per pixel over 64 px, exactly 128
    rows.filter(!_.getBoolean(3)).foreach { r =>
      assert(r.getLong(2) === 128L, s"${r.getString(0)} t=${r.getInt(1)}")
    }
    // the 2-D still is excluded by the ndim==3 filter
    assert(!rows.exists(_.getString(0) == "vid-still"))
  }
}
