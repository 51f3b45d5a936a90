package graft.pipeline

import graft.SparkTestBase
import java.nio.file.Files

/** The production (100 TB) row-id path: `ClinicalCsv.withParquetRowId`
  * derives `row_id` from `_metadata.file_path` rank + `_metadata
  * .row_index` on a MULTI-FILE parquet dataset, and the order-sensitive
  * J4 fold must match the sequential reference — on >1 scan partition,
  * without coalesce(1), and regardless of split packing (Spark packs
  * splits by length DESCENDING, so partition order ≠ file order here by
  * construction).
  */
class OrderedFoldSpec extends SparkTestBase {
  import spark.implicits._

  private val latCodes = Array("1", "2", "3", "")
  private val outcomes = Array(
    "Benign", "Invasive", "DCIS with atypia", "No biopsy",
    "BIRADS 2 @ 6 months", ".F", "something else",
    "BI-RADS score downgraded after review")
  private val biradsVals = Array("1", "2", "3", "4", "5")
  private val subjectPool = Array("s1", "s2", "s3")

  /** Write `chunks` as one parquet FILE each, named so lexicographic
    * file order == chunk order, all directly under one directory. */
  private def writeChunked(dir: java.io.File,
      chunks: Seq[Seq[(String, String, String)]], cols: Seq[String]): Unit = {
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val stage = new java.io.File(dir, s"_stage$i")
      chunk.toDF(cols: _*).coalesce(1)
        .write.mode("overwrite").parquet(stage.getPath)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath,
        new java.io.File(dir, f"chunk-$i%04d.parquet").toPath)
      stage.listFiles().foreach(_.delete()); stage.delete()
    }
  }

  test("J4 fold over _metadata.row_index row ids ≡ sequential reference (multi-file, multi-partition)") {
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevCost = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      // Force every file into its own split so the fold really spans
      // partitions (small files otherwise pack into one).
      spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
      spark.conf.set("spark.sql.files.openCostInBytes", "2048")
      for (seed <- 0 until 5) {
        val rnd = new scala.util.Random(1000 + seed)
        def pick[T](a: Array[T]): T = a(rnd.nextInt(a.length))
        val screen = (0 until 2 + rnd.nextInt(3)).map(_ =>
          SequentialReference.ScreenRow(pick(subjectPool), pick(biradsVals), pick(biradsVals)))
        // 3-5 chunks of varying size: concatenated in file-name order
        // they ARE the sequential table.
        val nChunks = 3 + rnd.nextInt(3)
        val dbtChunks = (0 until nChunks).map(_ =>
          (0 until 1 + rnd.nextInt(8)).map(_ =>
            (pick(subjectPool), pick(latCodes), pick(outcomes))))
        val dbtRows = dbtChunks.flatten.map {
          case (s, l, o) => SequentialReference.LesionRow(s, l, o) }
        val mriRows = (0 until rnd.nextInt(5)).map(_ =>
          SequentialReference.LesionRow(pick(subjectPool), pick(latCodes), pick(outcomes)))

        val dir = Files.createTempDirectory(s"graft_ordfold_$seed").toFile
        writeChunked(dir, dbtChunks,
          Seq("SUBJECT_DE", "TOMO_LESIONBREAST_YR0", "TOMO_LESIONOUTCOME_YR0"))

        val tomoDf = ClinicalCsv.withParquetRowId(spark, dir.getPath)
        assert(spark.read.parquet(dir.getPath).rdd.getNumPartitions > 1,
          "fixture must span multiple scan partitions")

        val screenDf = screen.zipWithIndex
          .map { case (r, i) => (r.subject, r.dbt, r.mri, i.toLong) }
          .toDF("SUBJECT_DE", "TOMO_BIRADS_YR0", "MRI_BIRADS_YR0", "row_id")
        val mriDf = mriRows.zipWithIndex
          .map { case (r, i) => (r.subject, r.latCode, r.outcome, i.toLong) }
          .toDF("SUBJECT_DE", "MRI_LESIONBREAST_YR0", "MRI_LESIONOUTCOME_YR0", "row_id")

        val got = Ea1141Pipeline.truthLabels(screenDf, tomoDf, mriDf)
          .collect()
          .map(r => (r.getString(0), r.getString(1)) ->
            (Option(r.getString(2)), Option(r.getString(3)),
              Option(r.getString(4)), Option(r.getString(5))))
          .toMap

        for {
          subject <- screen.map(_.subject).distinct
          lat <- Seq(Some("R"), Some("L"), None)
        } {
          val want = SequentialReference.truthLabels(subject, lat, screen, dbtRows, mriRows)
          val key = (subject, lat.getOrElse(Ea1141Pipeline.NoLaterality))
          assert(got(key) === want,
            s"seed=$seed divergence at subject=$subject lat=$lat: got=${got(key)} want=$want")
        }
      }
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      spark.conf.set("spark.sql.files.openCostInBytes", prevCost)
    }
  }
}
