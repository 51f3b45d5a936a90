package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-vs-batch agreement for the in-stream MinHash-LSH near-dup
  * pipeline (SURVEY.md §5 pattern: streaming rows with no DuckDB oracle
  * pin their semantics against the batch twin on identical rows).
  *
  * Fixture: 120 real sf0.001 docs (bulk agreement, organic collisions
  * included) plus 20 SYNTHETIC docs with disjoint token sets and their
  * exact copies — the controlled dups where the owner and the full
  * 8/8 signature match are known by construction (a real doc's bucket
  * may be owned by an organic near-dup, so only synthetic rows support
  * exact owner/match assertions).
  */
class NearDupStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  private lazy val realDocs: Seq[(Long, String)] =
    graft.Tables.documents(spark, sf())
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].orderBy("doc_id").limit(120).collect().toSeq

  /** 20 docs of 12 tokens each, every token suffixed with the doc index
    * — no shared 3-gram anywhere, so each doc's buckets are its own. */
  private val synthDocs: Seq[(Long, String)] = (0 until 20).map { i =>
    (5000000L + i, (0 until 12).map(t => s"tok${t}x$i").mkString(" "))
  }
  private val synthCopies: Seq[(Long, String)] =
    synthDocs.map { case (id, t) => (id + 1000000L, t) }

  private def asSet(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet

  test("single-batch streaming candidates == batch twin (min-id owners)") {
    withRocksDb {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val corpus = realDocs ++ synthDocs ++ synthCopies
      val stream = MemoryStream[(Long, String)]
      val q = NearDupStream.candidates(stream.toDF().toDF("doc_id", "text"))
        .toDF().writeStream.format("memory").queryName("neardup_out")
        .outputMode("update").start()
      try {
        stream.addData(corpus)
        q.processAllAvailable()
        val got = asSet(spark.table("neardup_out")
          .select("doc_id", "band", "owner_id", "n_sig_match").collect())
        val want = asSet(NearDupStream.batchTwin(
          corpus.toDF("doc_id", "text"))
          .select("doc_id", "band", "owner_id", "n_sig_match").collect())
        assert(want.nonEmpty, "fixture must produce near-dup candidates")
        assert(got === want)
        // controlled dups: every synthetic copy hits its base doc as the
        // bucket owner in all 4 bands at a full 8/8 signature match
        for ((copyId, _) <- synthCopies; b <- 0 until NearDupStream.Bands)
          assert(got.contains((copyId, b, copyId - 1000000L, 8)),
            s"synthetic copy $copyId band $b must full-match its base")
      } finally q.stop()
    }
  }

  test("cross-batch: owners persist, first-arrival-wins") {
    withRocksDb {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val base = realDocs.take(60) ++ synthDocs.take(1) // synth id 5000000
      // batch 2: an exact copy with a LARGER id (normal late dup) and an
      // exact copy with a SMALLER id (the retraction-impossible case —
      // the batch-1 owner must keep the bucket).
      val later = Seq((9000000L, synthDocs.head._2), (-5L, synthDocs.head._2))
      val stream = MemoryStream[(Long, String)]
      val q = NearDupStream.candidates(stream.toDF().toDF("doc_id", "text"))
        .toDF().writeStream.format("memory").queryName("neardup_cross_out")
        .outputMode("update").start()
      try {
        stream.addData(base)
        q.processAllAvailable()
        val afterB1 = spark.table("neardup_cross_out").count().toInt
        stream.addData(later)
        q.processAllAvailable()
        val all = spark.table("neardup_cross_out")
          .select("doc_id", "band", "owner_id", "n_sig_match").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
        val b2 = all.drop(afterB1).toSet
        val ownerId = synthDocs.head._1
        // both batch-2 docs emit one candidate per band against the
        // batch-1 owner — including the smaller-id doc (no retraction)
        for (d <- Seq(9000000L, -5L); b <- 0 until NearDupStream.Bands)
          assert(b2.contains((d, b, ownerId, 8)),
            s"batch-2 doc $d band $b must point at batch-1 owner $ownerId")
      } finally q.stop()
    }
  }

  test("checkpoint restart: bucket owners survive — late copies hit the pre-crash owner") {
    // Crash-recovery for the owner state (round-11 verdict item 4):
    // batch 1 claims all 20 synthetic buckets, the query is killed, a
    // FRESH query restarts from the checkpoint, and batch 2's exact
    // copies must each emit 4 candidates against the PRE-CRASH owner.
    // The failure mode this pins: a reset store lets the copies claim
    // fresh buckets and emit NOTHING — silent dup admission.
    withRocksDb {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ckpt = java.nio.file.Files.createTempDirectory("graft_neardup_ckpt").toString
      val stream = MemoryStream[(Long, String)]
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Int)]
      def start() = NearDupStream.candidates(stream.toDF().toDF("doc_id", "text"))
        .toDF().writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.select("doc_id", "band", "owner_id", "n_sig_match")
            .collect()
            .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
          out.synchronized { out ++= rows; () }
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      val q1 = start()
      try { stream.addData(synthDocs); q1.processAllAvailable() }
      finally q1.stop() // the "crash": owners exist only in the checkpoint
      assert(out.synchronized(out.isEmpty), "claims must be silent")
      val q2 = start()
      try {
        stream.addData(synthCopies)
        q2.processAllAvailable()
        val got = out.synchronized(out.toSet)
        for ((copyId, _) <- synthCopies; b <- 0 until NearDupStream.Bands)
          assert(got.contains((copyId, b, copyId - 1000000L, 8)),
            s"copy $copyId band $b must match the recovered owner " +
              s"(a reset store claims silently): $got")
      } finally q2.stop()
    }
  }

  test("short docs (no 3-gram) are dropped, not errored") {
    withRocksDb {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val stream = MemoryStream[(Long, String)]
      val q = NearDupStream.candidates(stream.toDF().toDF("doc_id", "text"))
        .toDF().writeStream.format("memory").queryName("neardup_short_out")
        .outputMode("update").start()
      try {
        stream.addData(Seq((1L, "two words"), (2L, "two words"), (3L, "")))
        q.processAllAvailable()
        assert(spark.table("neardup_short_out").count() === 0L)
      } finally q.stop()
    }
  }

  test("event-time TTL: backfill replay dedups against the DATA's horizon, not wall clock") {
    // Round-11 verdict item 5: the processing-time TTLConfig expires
    // buckets by wall clock, so a backfill replayed at full speed dedups
    // against the wrong horizon. candidatesEventTime keys retention on
    // the event-time watermark instead: this replay compresses 10 data
    // days into seconds and the 7-day horizon must still hold.
    withRocksDb {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val day = 86400000L
      val t0 = 1700000000000L
      def ts(ms: Long) = new java.sql.Timestamp(ms)
      val textA = synthDocs(0)._2
      val textB = synthDocs(1)._2
      val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
      val q = NearDupStream.candidatesEventTime(
        stream.toDF().toDF("doc_id", "text", "ts"), ttlMs = 7 * day)
        .toDF().writeStream.format("memory").queryName("neardup_et_out")
        .outputMode("update").start()
      try {
        // day 0: A and B claim their buckets
        stream.addData(Seq((100L, textA, ts(t0)), (300L, textB, ts(t0))))
        q.processAllAvailable()
        // day 3 (inside the horizon): B's copy must still match; the
        // day-10 filler advances the watermark past A/B's day-7 expiry
        stream.addData(Seq((400L, textB, ts(t0 + 3 * day)),
          (900L, synthDocs(2)._2, ts(t0 + 10 * day))))
        q.processAllAvailable()
        // watermark is now ~day 10: the expired owners' timers fire
        stream.addData(Seq((901L, synthDocs(3)._2, ts(t0 + 10 * day + 3600000L))))
        q.processAllAvailable()
        // day 10+2h: A's copy arrives PAST the retention horizon — it
        // must claim a fresh bucket, not match the expired owner
        stream.addData(Seq((200L, textA, ts(t0 + 10 * day + 7200000L))))
        q.processAllAvailable()
        val got = asSet(spark.table("neardup_et_out")
          .select("doc_id", "band", "owner_id", "n_sig_match").collect())
        for (b <- 0 until NearDupStream.Bands)
          assert(got.contains((400L, b, 300L, 8)),
            s"within-horizon copy must match its owner in band $b: $got")
        assert(!got.exists(_._1 == 200L),
          s"copy past the event-time horizon must NOT match: $got")
      } finally q.stop()
    }
  }

  test("processing-time TTL on a fast replay keeps the stale owner (the contrast event-time mode fixes)") {
    // NOTE: a TimeMode.ProcessingTime query never quiesces — its timers
    // keep the micro-batch engine scheduling, so `processAllAvailable`
    // live-locks (measured: ~11k stages in 35 min on a 1-doc batch).
    // Production streams run forever so this is only a HARNESS concern:
    // drive it with the terminating Trigger.AvailableNow, one query per
    // batch, recoverable foreachBatch sink (the restore-test shape).
    withRocksDb {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ckpt = java.nio.file.Files.createTempDirectory("graft_neardup_pt").toString
      val stream = MemoryStream[(Long, String)]
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Int)]
      def runBatch(): Unit = {
        val q = NearDupStream.candidates(
          stream.toDF().toDF("doc_id", "text"), ttlMs = 7 * 86400000L)
          .toDF().writeStream
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            val rows = df.select("doc_id", "band", "owner_id", "n_sig_match")
              .collect()
              .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
            out.synchronized { out ++= rows; () }
          }
          .option("checkpointLocation", ckpt)
          .outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination(120000) finally q.stop()
      }
      stream.addData(Seq((100L, synthDocs(0)._2)))
      runBatch()
      // the "day-10" copy replayed seconds later in wall clock: the
      // processing-time TTL has not expired, so the copy matches the
      // stale owner — correct under the within-wall-clock-window
      // contract, wrong for a backfill; the documented reason
      // candidatesEventTime exists.
      stream.addData(Seq((200L, synthDocs(0)._2)))
      runBatch()
      val got = out.synchronized(out.toSet)
      for (b <- 0 until NearDupStream.Bands)
        assert(got.contains((200L, b, 100L, 8)), s"got: $got")
    }
  }

  test("batch twin: synthetic copies full-match all bands; near-misses estimate below") {
    val corpus = synthDocs ++ synthCopies ++
      // three-tokens-changed variants: every 3-gram except the last is
      // touched, so the signature differs in >=1 slot with overwhelming
      // probability (a single changed token can leave all 8 minima
      // intact ~6% of the time — flaky); must never report 8/8
      synthDocs.take(5).zipWithIndex.map { case ((id, t), i) =>
        (id + 2000000L, t.split(" ")
          .updated(2, s"chg${i}a").updated(5, s"chg${i}b").updated(8, s"chg${i}c")
          .mkString(" "))
      }
    val twin = NearDupStream.batchTwin(corpus.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    for ((copyId, _) <- synthCopies; b <- 0 until NearDupStream.Bands)
      assert(twin.contains((copyId, b, copyId - 1000000L, 8)))
    // a changed variant that still collides on some band must carry a
    // sub-8 match count (its signature differs in >=1 slot ... it may
    // also legitimately not collide at all; only over-reporting is a bug)
    twin.filter(_._1 >= 7000000L).foreach { case (d, b, o, m) =>
      assert(m < 8, s"variant $d band $b vs $o must not report 8/8")
    }
  }
}
