package graft.sources

import java.nio.file.{Files, Path, Paths}

/** Canonical deterministic DICOM-like fixture tree for the gated
  * `q_binary_scan` query.
  *
  * The tree (patients/studies/volumes below) and every payload byte are
  * fixed by simple integer formulas so that an INDEPENDENT generator —
  * `tools/gen_binary_golden.py`, plain Python with no knowledge of this
  * class or of [[DicomLikeSource]] — can compute the expected extracted
  * metadata/pixel-stat table and commit it as the DuckDB oracle golden
  * (`tools/golden/binary_scan_golden.parquet`). Any drift between this
  * writer, the V2 reader, or the golden breaks the driver's hash gate.
  *
  * Volume intent mirrors the reference's observed inputs
  * (`/root/reference/src/generate_mapping.py:111-156`): 3-D decodable
  * tomosynthesis volumes, a 2-D non-tomo image (the reference's
  * `ndim == 3` branch), a shape/payload-mismatched file (frames NULL),
  * a file with optional tags missing, and one corrupt non-container
  * file (metadata NULL, try/except-to-None).
  */
object DicomFixtures {

  /** payload byte i of volume `seed`: (i*31 + seed*7 + 11) mod 256 —
    * mirrored verbatim in tools/gen_binary_golden.py. */
  def pixelByte(seed: Int, i: Int): Byte = ((i * 31 + seed * 7 + 11) & 0xff).toByte

  final case class VolSpec(patient: String, study: String, uid: String,
      fields: Map[String, String], shape: Seq[Int], seed: Int, payloadLen: Int)

  /** The canonical volumes. payloadLen == product(shape) ⇒ decodable. */
  val volumes: Seq[VolSpec] = Seq(
    VolSpec("EA1141-8001", "19400101", "vol-a1",
      Map("FrameLaterality" -> "R", "SliceThickness" -> "1",
        "Modality" -> "MG", "SeriesDescription" -> "R CC Breast Tomosynthesis Image"),
      shape = Seq(4, 6, 5), seed = 1, payloadLen = 120),
    VolSpec("EA1141-8001", "19400101", "vol-a2",
      Map("FrameLaterality" -> "L", "SliceThickness" -> "2",
        "Modality" -> "MG", "SeriesDescription" -> "L MLO Breast Tomosynthesis Image"),
      shape = Seq(3, 8, 7), seed = 2, payloadLen = 168),
    // 2-D image: decodable but ndim == 2 (reference F1 would drop it).
    VolSpec("EA1141-8002", "19500101", "vol-b1",
      Map("FrameLaterality" -> "R",
        "Modality" -> "MG", "SeriesDescription" -> "R CC FFDM"),
      shape = Seq(9, 11), seed = 3, payloadLen = 99),
    // Shape/payload mismatch: metadata valid, frames NULL.
    VolSpec("EA1141-8002", "19500101", "vol-b2",
      Map("FrameLaterality" -> "L", "ViewModifier" -> "Spot Compression",
        "Modality" -> "MG", "SeriesDescription" -> "L CC Breast Tomosynthesis Image"),
      shape = Seq(5, 10, 10), seed = 4, payloadLen = 77),
    // Optional tags absent entirely (None-propagation path).
    VolSpec("EA1141-8003", "19600101", "vol-c1",
      Map("Modality" -> "MR", "SeriesDescription" -> "AX T1"),
      shape = Seq(2, 3, 4), seed = 5, payloadLen = 24))

  val corruptName = "corrupt.dcm"
  val corruptBytes: Array[Byte] = "not a GDCM container at all".getBytes("UTF-8")

  /** Default location used by the gated query — under java.io.tmpdir so
    * repeated Verify/Bench runs reuse it (content is deterministic, so
    * an existing complete tree is always valid). */
  def defaultRoot: Path =
    Paths.get(System.getProperty("java.io.tmpdir"), "graft_dicom_fixture_v1")

  /** Write the canonical tree (idempotent; keyed on a DONE marker). */
  def ensure(root: Path = defaultRoot): Path = synchronized {
    val marker = root.resolve("_FIXTURE_COMPLETE")
    if (Files.exists(marker)) return root
    volumes.foreach { v =>
      val dir = root.resolve(v.patient).resolve(v.study)
      Files.createDirectories(dir)
      val base = Map("SOPInstanceUID" -> v.uid, "PatientID" -> v.patient,
        "StudyInstanceUID" -> s"st-${v.patient}-${v.study}",
        "SeriesInstanceUID" -> s"se-${v.uid}")
      val pixels = Array.tabulate[Byte](v.payloadLen)(i => pixelByte(v.seed, i))
      Files.write(dir.resolve(s"${v.uid}.dcm"),
        DicomLike.encode(base ++ v.fields, v.shape, pixels))
    }
    val cdir = root.resolve("EA1141-8003").resolve("19600101")
    Files.createDirectories(cdir)
    Files.write(cdir.resolve(corruptName), corruptBytes)
    Files.write(marker, Array.empty[Byte])
    root
  }
}
