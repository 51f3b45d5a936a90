package graft.sources

import java.nio.file.{Files, Path, Paths}

/** Planted shot-boundary fixture tree for `q_frame_cuts` — temporal
  * scene-cut detection over a multi-frame (video-like) volume. Kept
  * SEPARATE from [[DicomFixtures]] / [[DicomNearDupFixtures]] so their
  * committed goldens stay bit-identical.
  *
  * The video story: the reference's multimodal records are 3-D tensors
  * with a leading frame axis (`generate_mapping.py:124` — ndim == 3);
  * a 100 TB video corpus runs frame-sample + temporal analysis over
  * exactly that layout. These volumes have a LONG leading axis (24
  * frames of 8×8) with a deterministic per-segment pixel schedule:
  *
  *   p(r,c)      = r*8 + c                       (0..63, the spatial ramp)
  *   px(t,r,c)   = p(r,c) * m(t/8) + t*2         (≤ 235, never wraps)
  *
  * Within a segment, consecutive frames differ by exactly +2 per pixel
  * (sum |Δ| = 128 over 64 px). At a segment boundary the multiplier
  * changes, so per-pixel Δ = p·Δm ± 2 — sum |Δ| ≥ 1890 for |Δm| = 1.
  * The cut threshold (mean |Δ| > 16 per pixel ⟺ SAD > 1024, exact
  * integers) therefore separates plants from drift with a ~8× margin
  * on BOTH sides, and the golden (`tools/gen_video_golden.py`, plain
  * Python, no shared code) recomputes the full SAD table
  * independently.
  *
  * Volumes: `vid-cuts` (multiplier schedule 1→2→3: cuts at t=8 and
  * t=16), `vid-smooth` (constant multiplier: zero cuts — the true
  * negative), plus a 2-D still (`vid-still`) that the 3-D filter must
  * exclude.
  */
object VideoFixtures {

  val Shape: Seq[Int] = Seq(24, 8, 8)

  final case class VidSpec(uid: String, mults: Seq[Int])

  /** mults(s) multiplies segment s = t/8 (three segments of 8). */
  val volumes: Seq[VidSpec] = Seq(
    VidSpec("vid-cuts", Seq(1, 2, 3)),
    VidSpec("vid-smooth", Seq(2, 2, 2)))

  def pixel(v: VidSpec, t: Int, r: Int, c: Int): Int =
    (r * 8 + c) * v.mults(t / 8) + t * 2

  def pixels(v: VidSpec): Array[Byte] = {
    val Seq(nt, rows, cols) = Shape
    Array.tabulate[Byte](nt * rows * cols) { i =>
      val t = i / (rows * cols)
      val r = (i % (rows * cols)) / cols
      val c = i % cols
      pixel(v, t, r, c).toByte
    }
  }

  def defaultRoot: Path =
    Paths.get(System.getProperty("java.io.tmpdir"), "graft_video_fixture_v1")

  /** Write the tree (idempotent; keyed on a DONE marker). */
  def ensure(root: Path = defaultRoot): Path = synchronized {
    val marker = root.resolve("_FIXTURE_COMPLETE")
    if (Files.exists(marker)) return root
    Files.createDirectories(root)
    volumes.foreach { v =>
      val meta = Map(
        "SOPInstanceUID" -> v.uid, "PatientID" -> "VID-7001",
        "StudyInstanceUID" -> "st-VID-7001",
        "SeriesInstanceUID" -> s"se-${v.uid}",
        "Modality" -> "XC", "SeriesDescription" -> "cine loop")
      Files.write(root.resolve(s"${v.uid}.dcm"),
        DicomLike.encode(meta, Shape, pixels(v)))
    }
    // a 2-D still: decodable but not temporal — the ndim==3 filter
    // must exclude it (the reference's non-tomo branch).
    val still = Map(
      "SOPInstanceUID" -> "vid-still", "PatientID" -> "VID-7001",
      "StudyInstanceUID" -> "st-VID-7001",
      "SeriesInstanceUID" -> "se-vid-still",
      "Modality" -> "XC", "SeriesDescription" -> "key frame")
    Files.write(root.resolve("vid-still.dcm"),
      DicomLike.encode(still, Seq(8, 8),
        Array.tabulate[Byte](64)(i => (i * 3 + 5).toByte)))
    Files.write(marker, Array.empty[Byte])
    root
  }
}
