package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S7: multimodal record read — binary volume files with nested metadata
  * (`generate_mapping.py:116-140` reads DICOM via pydicom and plucks
  * deeply nested tags with try/except-to-None).
  *
  * No DICOM parser exists on this JVM and no `.dcm` files ship with the
  * reference (SURVEY.md §7), so the FORMAT here is a synthetic
  * DICOM-like container (`GDCM` magic + length-prefixed UTF-8 metadata
  * + opaque pixel payload). Everything around the byte-level decode —
  * the binaryFile source, the null-safe nested extraction into a typed
  * struct column, column pruning, the downstream pipeline — is the real
  * Spark plumbing and is what the tests exercise. Swapping in a real
  * DICOM tag walker changes only [[parseMeta]]'s body.
  *
  * The extraction is a Scala UDF (the reference's only non-relational
  * kernel, SURVEY.md §2.2 "UDF surface"); pixel data stays an opaque
  * binary payload whose shape metadata rides in the struct — the
  * "decode" of pixels to tensors is deliberately STUBBED as
  * shape+checksum (no imaging libs in this environment).
  */
object DicomLike {

  val Magic: Array[Byte] = "GDCM".getBytes(StandardCharsets.US_ASCII)

  /** Columns mirroring the DICOM tags the reference consumes
    * (`generate_mapping.py:118-140`); None -> SQL NULL. */
  case class Meta(
      SOPInstanceUID: String,
      PatientID: String,
      StudyInstanceUID: String,
      SeriesInstanceUID: String,
      Modality: String,
      SeriesDescription: String,
      FrameLaterality: Option[String],
      SliceThickness: Option[Int],
      ViewModifier: Option[String],
      ImageShape: Seq[Int],
      pixelBytes: Long,
      pixelChecksum: Long)

  /** Serialize a synthetic volume: magic | metaLen:int32 | meta-kv UTF-8
    * (k=v lines) | pixel payload. Deterministic given its inputs. */
  def encode(fields: Map[String, String], shape: Seq[Int],
      pixels: Array[Byte]): Array[Byte] = {
    val meta = (fields + ("ImageShape" -> shape.mkString("x")))
      .toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("\n")
    val metaBytes = meta.getBytes(StandardCharsets.UTF_8)
    val buf = ByteBuffer.allocate(Magic.length + 4 + metaBytes.length + pixels.length)
    buf.put(Magic).putInt(metaBytes.length).put(metaBytes).put(pixels)
    buf.array()
  }

  /** Null-safe decode: malformed bytes -> None (the try/except-to-None
    * idiom of the reference, lifted to Option). */
  def parseMeta(bytes: Array[Byte]): Option[Meta] = {
    try {
      if (bytes.length < Magic.length + 4) return None
      if (!bytes.take(Magic.length).sameElements(Magic)) return None
      val buf = ByteBuffer.wrap(bytes, Magic.length, 4)
      val metaLen = buf.getInt
      val metaStart = Magic.length + 4
      if (metaLen < 0 || metaStart + metaLen > bytes.length) return None
      val meta = new String(bytes, metaStart, metaLen, StandardCharsets.UTF_8)
      val kv = meta.split("\n").iterator
        .map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap
      val pixelStart = metaStart + metaLen
      val nPix = bytes.length - pixelStart
      // STUB decode: shape + byte checksum stand in for the pixel tensor.
      var sum = 0L
      var i = pixelStart
      while (i < bytes.length) { sum = sum * 31 + (bytes(i) & 0xff); i += 1 }
      if (!kv.contains("SOPInstanceUID") || !kv.contains("PatientID")) return None
      Some(Meta(
        SOPInstanceUID = kv("SOPInstanceUID"),
        PatientID = kv("PatientID"),
        StudyInstanceUID = kv.getOrElse("StudyInstanceUID", ""),
        SeriesInstanceUID = kv.getOrElse("SeriesInstanceUID", ""),
        Modality = kv.getOrElse("Modality", ""),
        SeriesDescription = kv.getOrElse("SeriesDescription", ""),
        FrameLaterality = kv.get("FrameLaterality"),
        SliceThickness = kv.get("SliceThickness").flatMap(_.toIntOption),
        ViewModifier = kv.get("ViewModifier"),
        ImageShape = kv.get("ImageShape").map(_.split("x").toSeq.flatMap(_.toIntOption))
          .getOrElse(Seq.empty),
        pixelBytes = nPix.toLong,
        pixelChecksum = sum))
    } catch { case _: Exception => None }
  }

  private val metaUdf = udf((bytes: Array[Byte]) =>
    if (bytes == null) None else parseMeta(bytes))

  /** Decorate a binaryFile scan (path, content, ...) with the extracted
    * metadata struct; undecodable files keep a NULL struct. */
  def withMeta(scanned: DataFrame, contentCol: String = "content"): DataFrame =
    scanned.withColumn("meta", metaUdf(col(contentCol)))

  /** Flattened volume-metadata view feeding
    * [[graft.pipeline.Ea1141Pipeline.buildMapping]]. */
  def volumes(scanned: DataFrame): DataFrame =
    withMeta(scanned)
      .filter(col("meta").isNotNull)
      .select(col("path").as("ImagePath"), col("meta.*"))

  /** One sampled frame: slice index + its byte range + a per-frame
    * digest standing in for decoded pixels. */
  case class Frame(slice: Int, offset: Long, nBytes: Long, digest: Long)

  /** Frame sampling over the opaque pixel payload: pick `k` evenly
    * spaced slices using the shape metadata, slice the corresponding
    * byte ranges, and emit a per-frame record. The byte geometry
    * (payload split into shape[0] equal slices) is real; the per-frame
    * "decode" is the deterministic digest stub — swapping in an image
    * lib changes only [[frameDigest]]. */
  private def frameDigest(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 1125899906842597L
    var i = from
    while (i < until && i < bytes.length) { h = h * 31 + (bytes(i) & 0xff); i += 1 }
    h
  }

  private def sampleFramesImpl(bytes: Array[Byte], shape: Seq[Int], k: Int): Seq[Frame] = {
    if (bytes == null || shape.isEmpty || shape.head <= 0) return Seq.empty
    val metaEnd = {
      if (bytes.length < Magic.length + 4) return Seq.empty
      Magic.length + 4 + ByteBuffer.wrap(bytes, Magic.length, 4).getInt
    }
    if (metaEnd < 0 || metaEnd > bytes.length) return Seq.empty
    val nSlices = shape.head
    val payload = bytes.length - metaEnd
    val perSlice = math.max(1L, payload.toLong / nSlices)
    val picks = if (k >= nSlices) 0 until nSlices
      else (0 until k).map(i => (i.toLong * nSlices / k).toInt)
    picks.map { s =>
      val from = metaEnd + s * perSlice
      val until = math.min(bytes.length.toLong, from + perSlice)
      Frame(s, from - metaEnd, until - from,
        frameDigest(bytes, from.toInt, until.toInt))
    }
  }

  private val framesUdf = udf((bytes: Array[Byte], shape: Seq[Int], k: Int) =>
    sampleFramesImpl(bytes, shape, k))

  /** Explode a decoded scan into per-sampled-frame rows. */
  def sampleFrames(scanned: DataFrame, k: Int): DataFrame =
    withMeta(scanned)
      .filter(col("meta").isNotNull)
      .select(col("path"), col("meta.SOPInstanceUID").as("uid"),
        col("meta.ImageShape").as("shape"),
        explode(framesUdf(col("content"), col("meta.ImageShape"), lit(k))).as("frame"))
      .select(col("uid"), col("shape"), col("frame.*"))

  /** Feature-extraction stub: fixed-length deterministic feature vector
    * per volume (payload digests at stratified offsets) — the schema,
    * batching and partitioning of a real embedding UDF without the
    * model. */
  private val featureUdf = udf((bytes: Array[Byte], dim: Int) =>
    if (bytes == null) null
    else Array.tabulate(dim) { i =>
      val from = (i.toLong * bytes.length / dim).toInt
      val until = ((i + 1).toLong * bytes.length / dim).toInt
      (frameDigest(bytes, from, math.max(until, from + 1)) % 1000L).toFloat / 1000f
    })

  def extractFeatures(scanned: DataFrame, dim: Int = 16): DataFrame =
    withMeta(scanned)
      .filter(col("meta").isNotNull)
      .select(col("meta.SOPInstanceUID").as("uid"),
        featureUdf(col("content"), lit(dim)).as("features"))
}
