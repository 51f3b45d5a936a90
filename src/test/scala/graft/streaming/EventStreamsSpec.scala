package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-vs-batch agreement on closed windows (SURVEY.md §5): the same
  * aggregation expressions run over a MemoryStream and over a batch
  * DataFrame of the identical rows must agree once the watermark has
  * closed the windows.
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

class EventStreamsSpec extends SparkTestBase {
  import spark.implicits._

  /** Real rows from the sf0.001 events table, sorted by time. */
  private lazy val realEvents: Seq[Ev] = {
    graft.Tables.events(spark, sf())
      .select(col("event_id"), col("ts").cast("timestamp"), col("user_id"),
        col("event_type"), col("value"))
      .orderBy("ts")
      .limit(300)
      .as[Ev]
      .collect()
      .toSeq
  }

  private def flushSentinel(after: Seq[Ev]): Ev = {
    val maxTs = after.map(_.ts.getTime).max
    Ev(999999L, new Timestamp(maxTs + 3 * 3600 * 1000L), -1L, "flush", 0.0)
  }

  test("streaming curation: quality gate + stateful exact-dedup == batch") {
    // The training-data flow as a STREAM: documents arrive in
    // micro-batches, a map-side quality gate filters, and the exact-dup
    // stage is streaming dropDuplicates over the content digest (first
    // arrival wins, dedup state carried across batches).
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf())
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val stream = MemoryStream[(Long, String)]
    val curated = stream.toDF().toDF("doc_id", "text")
      .filter(size(split(col("text"), " ")) >= 20)
      .withColumn("digest", sha2(col("text"), 256))
      .dropDuplicates("digest")
      .select(col("doc_id"), col("digest"))
    val q = curated.writeStream.format("memory").queryName("curation_out")
      .outputMode("append").start()
    try {
      val (c1, c2) = docs.splitAt(docs.length / 2)
      stream.addData(c1)
      q.processAllAvailable()
      stream.addData(c2) // duplicates of c1 content must NOT re-emit
      q.processAllAvailable()
      val got = spark.table("curation_out").collect()
        .map(r => r.getString(1)).toSeq
      val want = docs.toDF("doc_id", "text")
        .filter(size(split(col("text"), " ")) >= 20)
        .select(sha2(col("text"), 256)).distinct().as[String].collect().toSet
      assert(got.toSet === want, "curated digest set must match batch")
      assert(got.length === want.size, "each digest must emit exactly once")
    } finally q.stop()
  }

  test("tumbling windows: streaming append == batch on closed windows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventStreams.tumblingCounts(stream.toDF())
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("append").start()
    try {
      val (c1, c2) = realEvents.splitAt(150)
      stream.addData(c1)
      q.processAllAvailable()
      stream.addData(c2)
      q.processAllAvailable()
      stream.addData(Seq(flushSentinel(realEvents))) // advance watermark far out
      q.processAllAvailable()

      val got = spark.table("tumbling_out")
        .filter(col("event_type") =!= "flush")
        .select(col("w_start"), col("event_type"), col("n"), col("sum_value"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap

      val want = realEvents.toDF()
        .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
        .select(col("w.start"), col("event_type"), col("n"), col("sum_value"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap

      assert(got === want)
    } finally q.stop()
  }

  test("streaming incremental dedup: anti-join against the static landed-base index") {
    // The streaming form of q_incremental_dedup: the base corpus's
    // digest index is a STATIC table (re-read per micro-batch, like the
    // stream-static enrichment join); incoming docs anti-join it, and
    // the in-stream dropDuplicates handles batch-internal repeats. Only
    // genuinely novel docs reach the sink.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf())
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val base = docs.filter(_._1 % 5 != 0)
    val incoming = docs.filter(_._1 % 5 == 0)
    val baseIdx = base.toDF("doc_id", "text")
      .select(sha2(col("text"), 256).as("digest")).distinct()
    val stream = MemoryStream[(Long, String)]
    val novel = stream.toDF().toDF("doc_id", "text")
      .withColumn("digest", sha2(col("text"), 256))
      .join(baseIdx, Seq("digest"), "left_anti")
      .dropDuplicates("digest")
      .select(col("doc_id"))
    val q = novel.writeStream.format("memory").queryName("incdedup_out")
      .outputMode("append").start()
    try {
      val (c1, c2) = incoming.splitAt(incoming.length / 2)
      stream.addData(c1); q.processAllAvailable()
      stream.addData(c2); q.processAllAvailable()
      stream.addData(c1) // replays of already-seen docs must not re-emit
      q.processAllAvailable()
      val got = spark.table("incdedup_out").collect().map(_.getLong(0)).toSet
      val baseDigests = base.map(_._2).toSet
      val wantDigests = scala.collection.mutable.Set.empty[String]
      val want = incoming.filter { case (_, text) =>
        !baseDigests.contains(text) && {
          val md = java.security.MessageDigest.getInstance("SHA-256")
          val dg = md.digest(text.getBytes("UTF-8")).map(b => f"$b%02x").mkString
          wantDigests.add(dg)
        }
      }.map(_._1).toSet
      assert(got === want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("ohlc bars: streaming append == batch on closed bars") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventStreams.ohlcBars(stream.toDF())
      .writeStream.format("memory").queryName("ohlc_out")
      .outputMode("append").start()
    try {
      val (c1, c2) = realEvents.splitAt(150)
      stream.addData(c1)
      q.processAllAvailable()
      stream.addData(c2)
      q.processAllAvailable()
      stream.addData(Seq(flushSentinel(realEvents)))
      q.processAllAvailable()

      def key(r: org.apache.spark.sql.Row) =
        (r.getTimestamp(0), r.getString(1)) ->
          (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))
      val got = spark.table("ohlc_out")
        .filter(col("event_type") =!= "flush")
        .collect().map(key).toMap
      val want = realEvents.toDF()
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(
          min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
          count(lit(1)).as("volume"))
        .select(col("w.start").as("w_start"), col("event_type"),
          col("open"), col("high"), col("low"), col("close"), col("volume"))
        .collect().map(key).toMap
      assert(got === want)
      assert(want.nonEmpty)
    } finally q.stop()
  }

  test("stream-static broadcast join: enrichment agg == batch twin") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = realEvents.map(_.event_type).distinct.sorted.zipWithIndex
      .map { case (t, i) => (t, s"cat${i % 2}") }
      .toDF("event_type", "category")
    val stream = MemoryStream[Ev]
    val q = EventStreams.enrichedCounts(stream.toDF(), dim)
      .writeStream.format("memory").queryName("enriched_out")
      .outputMode("append").start()
    try {
      val (c1, c2) = realEvents.splitAt(150)
      stream.addData(c1)
      q.processAllAvailable()
      stream.addData(c2)
      q.processAllAvailable()
      stream.addData(Seq(flushSentinel(realEvents)))
      q.processAllAvailable()

      val got = spark.table("enriched_out")
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap

      val want = realEvents.toDF().join(broadcast(dim), Seq("event_type"))
        .groupBy(window(col("ts"), "15 minutes").as("w"), col("category"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
        .select(col("w.start"), col("category"), col("n"), col("sum_value"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap

      assert(got === want)
    } finally q.stop()
  }

  test("session windows: streaming append == batch sessionization") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventStreams.sessionCounts(stream.toDF())
      .writeStream.format("memory").queryName("session_out")
      .outputMode("append").start()
    try {
      stream.addData(realEvents)
      q.processAllAvailable()
      stream.addData(Seq(flushSentinel(realEvents)))
      q.processAllAvailable()

      val got = spark.table("session_out")
        .filter(col("user_id") =!= -1L)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1)) -> r.getLong(3)).toMap

      val want = realEvents.toDF()
        .groupBy(col("user_id"), session_window(col("ts"), "5 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1)) -> r.getLong(2)).toMap

      assert(got === want)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: repeated event_ids collapse to one") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventStreams.dedupEvents(stream.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val base = realEvents.take(20)
      stream.addData(base)
      q.processAllAvailable()
      stream.addData(base.take(10)) // exact duplicates within watermark
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() === 20)
      assert(spark.table("dedup_out").select("event_id").distinct().count() === 20)
    } finally q.stop()
  }

  test("stream-stream interval join == batch join on the same rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventStreams.clickViewJoin(stream.toDF(), lookback = "4 hours")
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      stream.addData(realEvents)
      q.processAllAvailable()
      stream.addData(Seq(flushSentinel(realEvents)))
      q.processAllAvailable()

      val got = spark.table("ssj_out")
        .select("click_id", "view_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val batch = realEvents.toDF()
      val clicks = batch.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      val views = batch.filter(col("event_type") === "view")
        .select(col("user_id").as("vu"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      val want = clicks.join(views,
          col("user_id") === col("vu") &&
            col("view_ts") <= col("click_ts") &&
            col("view_ts") >= col("click_ts") - expr("INTERVAL 4 HOURS"))
        .select("click_id", "view_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      assert(got === want)
      assert(want.nonEmpty, "test data produced no click-view matches")
    } finally q.stop()
  }

  test("foreachBatch parquet sink persists closed windows with batch ids") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("fb_sink").toString + "/agg"
    val stream = MemoryStream[Ev]
    val q = EventStreams.sinkCountsToParquet(stream.toDF(), out).start()
    try {
      stream.addData(realEvents.take(100))
      q.processAllAvailable()
      stream.addData(Seq(flushSentinel(realEvents)))
      q.processAllAvailable()
      val sunk = spark.read.parquet(out)
      assert(sunk.count() > 0)
      assert(sunk.columns.contains("batch_id"))
      // every persisted window is fully closed: its count matches batch
      val got = sunk.filter(col("event_type") =!= "flush")
        .select("w_start", "event_type", "n")
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      val want = realEvents.take(100).toDF()
        .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      got.foreach { case (k, n) => assert(want(k) === n, s"window $k") }
    } finally q.stop()
  }

  test("flatMapGroupsWithState: cumulative per-user counters across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Double)]
    val q = EventStreams.runningUserCounts(stream.toDS())
      .writeStream.format("memory").queryName("state_out")
      .outputMode("update").start()
    try {
      stream.addData(Seq((1L, 1.0), (1L, 2.0), (2L, 5.0)))
      q.processAllAvailable()
      stream.addData(Seq((1L, 3.0)))
      q.processAllAvailable()
      // last update per user wins
      val last = spark.table("state_out")
        .groupBy("user_id").agg(max(struct(col("n_events"), col("total_value"))).as("s"))
        .select(col("user_id"), col("s.n_events"), col("s.total_value"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(last === Map(1L -> (3L, 6.0), 2L -> (1L, 5.0)))
    } finally q.stop()
  }

  test("transformWithState: typed ValueState counters across batches (RocksDB)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = MemoryStream[(Long, Double)]
    val q = EventStreams.userStatsTws(stream.toDS())
      .toDF("user_id", "n_events", "total_cents")
      .writeStream.format("memory").queryName("tws_out")
      .outputMode("update").start()
    try {
      stream.addData(Seq((1L, 1.25), (1L, 2.50), (2L, 5.00)))
      q.processAllAvailable()
      stream.addData(Seq((1L, 3.25), (3L, 0.75)))
      q.processAllAvailable()
      val last = spark.table("tws_out")
        .groupBy("user_id").agg(max(struct(col("n_events"), col("total_cents"))).as("s"))
        .select(col("user_id"), col("s.n_events"), col("s.total_cents"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(last === Map(1L -> (3L, 700L), 2L -> (1L, 500L), 3L -> (1L, 75L)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState: RocksDB state survives a stop + checkpoint restart") {
    // The crash-recovery contract: kill the query after batch 1, start a
    // FRESH query from the same checkpoint, and the ValueState counters
    // must continue from the persisted RocksDB snapshot — batch-2
    // outputs carry batch-1 history, not reset counters.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tws_ckpt").toString
    val stream = MemoryStream[(Long, Double)]
    // The memory sink refuses checkpoint recovery by design; foreachBatch
    // is the recoverable sink shape, collecting updates into a shared
    // buffer the way a real job would upsert into a store.
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    def start() = EventStreams.userStatsTws(stream.toDS())
      .toDF("user_id", "n_events", "total_cents")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        out.synchronized { out ++= rows; () }
      }
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    val q1 = start()
    try {
      stream.addData(Seq((1L, 1.25), (1L, 2.50), (2L, 5.00)))
      q1.processAllAvailable()
    } finally q1.stop() // the "crash": query gone, state only in ckpt
    val q2 = start()
    try {
      stream.addData(Seq((1L, 3.25), (2L, 0.75)))
      q2.processAllAvailable()
      val last = out.synchronized {
        out.groupBy(_._1).map { case (u, rs) =>
          u -> rs.map(r => (r._2, r._3)).max
        }
      }
      // (3, 700) and (2, 575) are only reachable THROUGH recovered state:
      // a reset store would report (1, 325) / (1, 75)
      assert(last.get(1L).contains((3L, 700L)),
        s"user 1 state not recovered: $last")
      assert(last.get(2L).contains((2L, 575L)),
        s"user 2 state not recovered: $last")
    } finally {
      q2.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
