package graft.sources

import java.nio.file.{Files, Path, Paths}

/** Planted-near-duplicate DICOM-like fixture tree for
  * `q_frame_phash_near` — the perceptual (aHash) image near-dup
  * operator. Kept SEPARATE from [[DicomFixtures]] so the three
  * existing golden-gated queries (`q_binary_scan` / `q_frame_stats` /
  * `q_frame_dedup`) keep their committed goldens bit-identical.
  *
  * Every payload byte is fixed by an integer formula mirrored verbatim
  * in `tools/gen_phash_golden.py` (plain Python, no shared code), which
  * computes the expected near-dup pair table and commits it as the
  * DuckDB oracle golden (`tools/golden/phash_near_golden.parquet`).
  *
  * The plant (reference intent: `generate_mapping.py:116-125` reads
  * image volumes; a 100 TB multimodal corpus near-dups them the way
  * text gets MinHash):
  *   - `nd-a2` is `nd-a1` with every pixel +40 — a uniform brightness
  *     shift. aHash compares each block mean against the frame mean,
  *     so the hash is PROVABLY identical (hamming 0) while the exact
  *     checksum differs — `q_frame_dedup` misses it, this query finds
  *     it. Likewise `nd-b2` / `nd-b1`.
  *   - `nd-a3` is `nd-a1` with one 2×2 block of slice 0 blown to 255
  *     (a local artifact: slice 0 drifts a few bits, slice 1 stays
  *     bit-identical, so the volume is still recalled through the
  *     untouched slice).
  *   - `nd-c1` shares no structure with either cluster (distinct
  *     sawtooth multiplier) — a true negative.
  *
  * Pixels stay ≤ 239 (< 255) so the +40 shift never clamps and the
  * brightness-invariance argument is exact.
  */
object DicomNearDupFixtures {

  /** Base payload byte i for sawtooth multiplier `mult`: (i*mult + 7)
    * mod 200 — mirrored verbatim in tools/gen_phash_golden.py. */
  def basePixel(mult: Int, i: Int): Int = (i * mult + 7) % 200

  /** rows × cols per slice; 2 slices per volume (shape 2×16×16). */
  val Shape: Seq[Int] = Seq(2, 16, 16)
  private val PayloadLen = Shape.product

  final case class NdSpec(patient: String, uid: String, mult: Int,
      variant: String)

  /** variant semantics: "base" = the sawtooth; "bright" = base + 40
    * (uniform brightness, aHash-invariant); "spot" = base with slice 0
    * rows 0–1 × cols 0–1 set to 255. */
  val volumes: Seq[NdSpec] = Seq(
    NdSpec("NDUP-9001", "nd-a1", 13, "base"),
    NdSpec("NDUP-9001", "nd-a2", 13, "bright"),
    NdSpec("NDUP-9001", "nd-a3", 13, "spot"),
    NdSpec("NDUP-9002", "nd-b1", 57, "base"),
    NdSpec("NDUP-9002", "nd-b2", 57, "bright"),
    NdSpec("NDUP-9003", "nd-c1", 101, "base"))

  def pixels(v: NdSpec): Array[Byte] = {
    val cols = Shape(2)
    Array.tabulate[Byte](PayloadLen) { i =>
      val base = basePixel(v.mult, i)
      val px = v.variant match {
        case "bright" => base + 40
        case "spot" =>
          val slice = i / (Shape(1) * cols)
          val r = (i % (Shape(1) * cols)) / cols
          val c = i % cols
          if (slice == 0 && r < 2 && c < 2) 255 else base
        case _ => base
      }
      px.toByte
    }
  }

  def defaultRoot: Path =
    Paths.get(System.getProperty("java.io.tmpdir"), "graft_dicom_neardup_v1")

  /** Write the tree (idempotent; keyed on a DONE marker). */
  def ensure(root: Path = defaultRoot): Path = synchronized {
    val marker = root.resolve("_FIXTURE_COMPLETE")
    if (Files.exists(marker)) return root
    volumes.foreach { v =>
      val dir = root.resolve(v.patient)
      Files.createDirectories(dir)
      val meta = Map(
        "SOPInstanceUID" -> v.uid, "PatientID" -> v.patient,
        "StudyInstanceUID" -> s"st-${v.patient}",
        "SeriesInstanceUID" -> s"se-${v.uid}",
        "Modality" -> "MG",
        "SeriesDescription" -> s"${v.variant} tomo")
      Files.write(dir.resolve(s"${v.uid}.dcm"),
        DicomLike.encode(meta, Shape, pixels(v)))
    }
    Files.write(marker, Array.empty[Byte])
    root
  }
}
