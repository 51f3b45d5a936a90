package graft.sources

import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for the DICOM-like container (SURVEY.md §7's idiomatic
  * endpoint for S7): the reader understands the format's byte layout
  * (magic | metaLen | metadata k=v | pixel payload), so projection
  * decides HOW MUCH OF EACH FILE IS READ — a metadata-only query reads
  * just the header bytes and never touches the pixel payload, which is
  * ~all of a 100 TB corpus.
  *
  * Pruning contract (exercised by DicomLikeV2Spec):
  *   - `meta` (all tag fields + pixelBytes) needs only the header;
  *     pixelBytes derives from file length minus header length.
  *   - `frames` — the REAL pixel decode (row-major uint8 tensor →
  *     array<array<int>>, one inner array per leading-axis slice; NULL
  *     when payload length ≠ product(ImageShape)) — and
  *     `pixel_checksum` (whole-payload integrity digest) are
  *     deliberately TOP-LEVEL columns, so Spark's guaranteed top-level
  *     column pruning (SupportsPushDownRequiredColumns) makes the
  *     payload read provably skippable; DicomLikeV2Spec asserts zero
  *     payload bytes read for metadata-only queries via
  *     [[DicomLikeSource.payloadBytesRead]], and that any combination
  *     of frames/checksum/content reads the payload exactly ONCE.
  *   - `content` returns the whole file (v1-compatible escape hatch).
  *
  * Scale shape: the driver lists the tree once and greedy-packs files
  * into ≤ `maxPartitionBytes` partitions (small-volume trees don't
  * explode into per-file tasks); each task streams its files off the
  * FileSystem, seeking past payloads it does not need. Malformed files
  * yield a NULL `meta` (the reference's try/except-to-None), never an
  * error.
  */
class DicomLikeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "dicomlike"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DicomLikeSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new DicomLikeTable(properties.asScala.toMap)
}

object DicomLikeSource {
  val metaSchema: StructType = StructType(Seq(
    StructField("SOPInstanceUID", StringType),
    StructField("PatientID", StringType),
    StructField("StudyInstanceUID", StringType),
    StructField("SeriesInstanceUID", StringType),
    StructField("Modality", StringType),
    StructField("SeriesDescription", StringType),
    StructField("FrameLaterality", StringType),
    StructField("SliceThickness", IntegerType),
    StructField("ViewModifier", StringType),
    StructField("ImageShape", ArrayType(IntegerType, containsNull = false)),
    StructField("pixelBytes", LongType)))

  val fullSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("meta", metaSchema),
    StructField("frames", ArrayType(ArrayType(IntegerType, containsNull = false))),
    StructField("pixel_checksum", LongType),
    StructField("content", BinaryType)))

  /** Test hook: payload bytes actually read across all readers in this
    * JVM (local mode). A metadata-only projection must leave this at 0. */
  val payloadBytesRead = new AtomicLong(0L)

  private[sources] val defaultMaxPartitionBytes = 128L * 1024 * 1024

  /** Rebuild a Hadoop Configuration from the serialized session entries
    * (loadDefaults=false: the map already carries the driver's resolved
    * defaults, credentials, and fs.* settings — a bare `new
    * Configuration()` on an executor would silently drop them). */
  private[sources] def confFrom(entries: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

private[sources] class DicomLikeTable(properties: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"dicomlike(${properties.getOrElse("path", "")})"
  override def schema(): StructType = DicomLikeSource.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DicomLikeScanBuilder(options)
}

private[sources] class DicomLikeScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = DicomLikeSource.fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = {
    val path = Option(options.get("path"))
      .getOrElse(throw new IllegalArgumentException("dicomlike: path required"))
    val suffix = Option(options.get("suffix")).getOrElse(".dcm")
    // Capture the SESSION's Hadoop configuration (spark.hadoop.*,
    // filesystem credentials, kerberos) at plan time and ship it to the
    // executors as plain entries.
    val hadoopConf = {
      val c = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
      val b = Map.newBuilder[String, String]
      val it = c.iterator()
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    new DicomLikeScan(path, suffix, required, hadoopConf)
  }
}

/** One partition = a greedy byte-bounded pack of files (path, length). */
private[sources] case class DicomLikeInputPartition(
    files: Seq[(String, Long)]) extends InputPartition

private[sources] class DicomLikeScan(
    root: String, suffix: String, requiredSchema: StructType,
    hadoopConf: Map[String, String])
    extends Scan with Batch {

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"DicomLikeScan(root=$root, schema=${requiredSchema.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = DicomLikeSource.confFrom(hadoopConf)
    val p = new HPath(root)
    val fs = p.getFileSystem(conf)
    val out = Seq.newBuilder[FileStatus]
    def walk(dir: HPath): Unit = fs.listStatus(dir).foreach { st =>
      if (st.isDirectory) walk(st.getPath)
      else if (st.getPath.getName.endsWith(suffix)) out += st
    }
    walk(p)
    // Deterministic order, then greedy byte-bounded packing so a 100 TB
    // tree becomes O(bytes / maxPartitionBytes) tasks, not O(files).
    val files = out.result().map(st => (st.getPath.toString, st.getLen))
      .sortBy(_._1)
    val max = DicomLikeSource.defaultMaxPartitionBytes
    val parts = Seq.newBuilder[DicomLikeInputPartition]
    var cur = Seq.newBuilder[(String, Long)]
    var curBytes = 0L
    var curN = 0
    files.foreach { case (f, len) =>
      if (curN > 0 && curBytes + len > max) {
        parts += DicomLikeInputPartition(cur.result())
        cur = Seq.newBuilder[(String, Long)]; curBytes = 0L; curN = 0
      }
      cur += ((f, len)); curBytes += len; curN += 1
    }
    if (curN > 0) parts += DicomLikeInputPartition(cur.result())
    parts.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DicomLikeReaderFactory(requiredSchema, hadoopConf)
}

private[sources] class DicomLikeReaderFactory(
    requiredSchema: StructType, hadoopConf: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new DicomLikeReader(
      partition.asInstanceOf[DicomLikeInputPartition].files, requiredSchema,
      hadoopConf)
}

/** Streams the partition's files; per file reads the header always, the
  * payload only when the projection needs it. */
private[sources] class DicomLikeReader(
    files: Seq[(String, Long)], requiredSchema: StructType,
    hadoopConf: Map[String, String])
    extends PartitionReader[InternalRow] with org.apache.spark.internal.Logging {

  private val needContent = requiredSchema.fieldNames.contains("content")
  private val needFrames = requiredSchema.fieldNames.contains("frames")

  private val conf = DicomLikeSource.confFrom(hadoopConf)
  private val it = files.iterator
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (!it.hasNext) return false
    val (path, len) = it.next()
    row = readOne(path, len)
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()

  private def readOne(path: String, len: Long): InternalRow = {
    val hp = new HPath(path)
    val fs = hp.getFileSystem(conf)
    val in = fs.open(hp)
    try {
      val headerLen = DicomLike.Magic.length + 4
      val header = new Array[Byte](math.min(len, headerLen.toLong).toInt)
      in.readFully(0, header)
      val valid = header.length == headerLen &&
        header.take(DicomLike.Magic.length).sameElements(DicomLike.Magic)
      val metaLen = if (valid)
        java.nio.ByteBuffer.wrap(header, DicomLike.Magic.length, 4).getInt else -1
      val metaOk = valid && metaLen >= 0 && headerLen.toLong + metaLen <= len

      val kv: Map[String, String] = if (metaOk) {
        val metaBytes = new Array[Byte](metaLen)
        in.readFully(headerLen.toLong, metaBytes)
        new String(metaBytes, StandardCharsets.UTF_8).split("\n").iterator
          .map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap
      } else Map.empty

      val pixelStart = if (metaOk) headerLen.toLong + metaLen else len
      val pixelBytes = len - pixelStart
      // Arrays are bounded by Int.MaxValue: a >=2 GiB file cannot be
      // materialized as `content` (NULL, like malformed rows — warned
      // below so size-truncation stays distinguishable from corruption);
      // the checksum path streams and has no size limit.
      val fitsArray = len < Int.MaxValue.toLong - 8
      if (!fitsArray && needContent)
        logWarning(s"dicomlike: $path is ${len}B >= 2 GiB; content column " +
          "is NULL (array limit) — metadata/checksum remain available")

      val shape: Seq[Int] = kv.get("ImageShape")
        .map(_.split("x").toSeq.flatMap(_.toIntOption)).getOrElse(Seq.empty)
      val shapeProd: Long =
        if (shape.isEmpty || shape.exists(_ <= 0)) -1L else shape.foldLeft(1L)(_ * _)
      val decodable = metaOk && shapeProd == pixelBytes && fitsArray

      // Whole-file bytes for the `content` projection — read (and its
      // payload portion counted) at most ONCE per file, shared with the
      // frames decode and checksum so no projection combination re-reads.
      lazy val full: Array[Byte] = {
        val b = new Array[Byte](len.toInt)
        in.readFully(0, b)
        DicomLikeSource.payloadBytesRead.addAndGet(pixelBytes)
        b
      }
      // Payload region as one array: view into `full` when content is
      // materialized anyway, else a single counted payload read.
      lazy val payloadArr: Array[Byte] =
        if (needContent && fitsArray)
          java.util.Arrays.copyOfRange(full, pixelStart.toInt, len.toInt)
        else {
          val b = new Array[Byte](pixelBytes.toInt)
          in.readFully(pixelStart, b)
          DicomLikeSource.payloadBytesRead.addAndGet(pixelBytes)
          b
        }
      // Payload checksum: reuses the already-materialized bytes when the
      // content/frames projection pays for them; otherwise streams the
      // payload region in bounded chunks (never a whole-payload array).
      lazy val payloadSum: Long =
        if (fitsArray && (needContent || (needFrames && decodable))) {
          val p = if (needContent) full else payloadArr
          val from = if (needContent) pixelStart.toInt else 0
          var sum = 0L
          var i = from
          while (i < p.length) { sum = sum * 31 + (p(i) & 0xff); i += 1 }
          sum
        } else {
          val buf = new Array[Byte](1 << 20)
          var pos = pixelStart
          var sum = 0L
          while (pos < len) {
            val n = math.min(buf.length.toLong, len - pos).toInt
            in.readFully(pos, buf, 0, n)
            DicomLikeSource.payloadBytesRead.addAndGet(n.toLong)
            var i = 0
            while (i < n) { sum = sum * 31 + (buf(i) & 0xff); i += 1 }
            pos += n
          }
          sum
        }

      val metaValid = metaOk && kv.contains("SOPInstanceUID") && kv.contains("PatientID")
      val values = requiredSchema.fields.map { f =>
        f.name match {
          case "path" => UTF8String.fromString(path)
          case "length" => len
          case "content" =>
            if (fitsArray) full else null
          case "frames" =>
            // Real decode: row-major uint8 tensor, one inner array per
            // leading-axis slice. NULL when payload ≠ product(shape).
            if (!metaValid || !decodable) null
            else {
              val p = payloadArr // payload-only bytes, read/counted once
              val nSlices = shape.head
              val per = (shapeProd / nSlices).toInt
              new GenericArrayData(Array.tabulate[Any](nSlices) { s =>
                val a = new Array[Int](per)
                var i = 0
                val base = s * per
                while (i < per) { a(i) = p(base + i) & 0xff; i += 1 }
                new GenericArrayData(a)
              })
            }
          case "pixel_checksum" =>
            if (!metaValid) null
            else java.lang.Long.valueOf(payloadSum)
          case "meta" =>
            if (!metaValid) null
            else {
              val ms = f.dataType.asInstanceOf[StructType]
              new GenericInternalRow(ms.fields.map { mf =>
                (mf.name match {
                  case "SOPInstanceUID" => kv.get("SOPInstanceUID")
                  case "PatientID" => kv.get("PatientID")
                  case "StudyInstanceUID" => Some(kv.getOrElse("StudyInstanceUID", ""))
                  case "SeriesInstanceUID" => Some(kv.getOrElse("SeriesInstanceUID", ""))
                  case "Modality" => Some(kv.getOrElse("Modality", ""))
                  case "SeriesDescription" => Some(kv.getOrElse("SeriesDescription", ""))
                  case "FrameLaterality" => kv.get("FrameLaterality")
                  case "ViewModifier" => kv.get("ViewModifier")
                  case "SliceThickness" => kv.get("SliceThickness").flatMap(_.toIntOption)
                  case "ImageShape" => Some(new GenericArrayData(
                    kv.get("ImageShape").map(_.split("x").toSeq.flatMap(_.toIntOption))
                      .getOrElse(Seq.empty).toArray))
                  case "pixelBytes" => Some(pixelBytes)
                  case other => throw new IllegalArgumentException(s"unknown meta field $other")
                }).map {
                  case s: String => UTF8String.fromString(s)
                  case i: Int => java.lang.Integer.valueOf(i)
                  case l: Long => java.lang.Long.valueOf(l)
                  case x => x
                }.orNull
              }.asInstanceOf[Array[Any]])
            }
          case other => throw new IllegalArgumentException(s"unknown field $other")
        }
      }
      new GenericInternalRow(values.asInstanceOf[Array[Any]])
    } finally in.close()
  }
}
