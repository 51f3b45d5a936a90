package graft.streaming

import graft.{SparkEntry, SparkTestBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-vs-batch parity for the EWMA user snapshot: the
  * transformWithState twin must reproduce q_ewma's exact BIGINT
  * numerators — single-batch, across arbitrary batch splits, and with
  * state provably truncated to the 16-row horizon.
  */
class EwmaStreamSpec extends SparkTestBase {
  import spark.implicits._

  /** sf0.001 events as (user_id, ts_micros, event_id, cents) rows. */
  private lazy val rows: Seq[(Long, Long, Long, Long)] =
    Tables.events(spark, sf())
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().toSeq
      .map { r =>
        val ts = r.getAs[java.time.LocalDateTime](1)
        (r.getLong(0),
          ts.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ts.getNano / 1000L,
          r.getLong(2), r.getLong(3))
      }

  private lazy val batchExpected: Map[Long, (Long, Long, Long)] =
    SparkEntry.queries("q_ewma")(spark, sf()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  /** Run the stream over the given batches and return each user's LAST
    * emission (update mode: the last row per user is the final state). */
  private def runStream(batches: Seq[Seq[(Long, Long, Long, Long)]],
      name: String): Map[Long, (Long, Long, Long)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = MemoryStream[(Long, Long, Long, Long)]
    val q = EventStreams.ewmaTws(stream.toDS())
      .toDF("user_id", "n_events", "ewma_num", "ewma_milli")
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      // n_events is strictly increasing per user, so max(struct) is the
      // final emission.
      spark.table(name)
        .groupBy("user_id")
        .agg(max(struct(col("n_events"), col("ewma_num"), col("ewma_milli"))).as("s"))
        .select(col("user_id"), col("s.n_events"), col("s.ewma_num"), col("s.ewma_milli"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("single-batch stream equals the batch q_ewma rows exactly") {
    assert(runStream(Seq(rows), "ewma_one") === batchExpected)
  }

  test("cross-batch: three ts-ordered batches converge to the batch rows") {
    val ordered = rows.sortBy(r => (r._2, r._3))
    val k = ordered.size / 3
    val batches = Seq(ordered.take(k), ordered.slice(k, 2 * k), ordered.drop(2 * k))
    assert(runStream(batches, "ewma_three") === batchExpected)
  }

  test("checkpoint restart: the 16-row ring survives bit-identically") {
    // The crash-recovery contract for the ring state (round-11 verdict
    // item 4): kill the query after a 20-event batch, start a FRESH
    // query from the same checkpoint, feed 4 more events — the final
    // row must equal an UNBROKEN run over the same two batches. A
    // restore that truncated or reordered the ring desyncs the
    // numerator; one that lost the running count desyncs n_events.
    val b1 = (1 to 20).map(i => (7L, i.toLong * 1000000L, i.toLong, i.toLong * 100))
    val b2 = (21 to 24).map(i => (7L, i.toLong * 1000000L, i.toLong, i.toLong * 100))
    val unbroken = runStream(Seq(b1, b2), "ewma_restore_ref")(7L)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ewma_ckpt").toString
      val stream = MemoryStream[(Long, Long, Long, Long)]
      // memory sink refuses checkpoint recovery by design; foreachBatch
      // is the recoverable sink shape (same as EventStreamsSpec's tws
      // restart test).
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      def start() = EventStreams.ewmaTws(stream.toDS())
        .toDF("user_id", "n_events", "ewma_num", "ewma_milli")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          out.synchronized { out ++= rows; () }
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      val q1 = start()
      try { stream.addData(b1); q1.processAllAvailable() }
      finally q1.stop() // the "crash": query gone, ring only in ckpt
      val q2 = start()
      try { stream.addData(b2); q2.processAllAvailable() } finally q2.stop()
      val last = out.synchronized { out.filter(_._1 == 7L).maxBy(_._2) }
      // n_events = 24 is only reachable THROUGH recovered state (a reset
      // store would report 4); the numerator equality pins the ring's
      // contents and order bit-for-bit.
      assert(last._2 === 24L, s"running count not recovered: $last")
      assert((last._2, last._3, last._4) === unbroken,
        "restored ring must reproduce the unbroken run exactly")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("state horizon: 20 events converge to the last-16 numerator") {
    // One user, 20 in-order events; the first 4 must not influence the
    // final numerator (weights cover only the 16 most recent).
    val evs = (1 to 20).map(i => (7L, i.toLong * 1000000L, i.toLong, i.toLong * 100))
    val full = runStream(Seq(evs), "ewma_trunc")(7L)
    val tail16 = runStream(Seq(evs.takeRight(16)), "ewma_tail")(7L)
    assert(full._1 === 20L)
    assert(tail16._1 === 16L)
    assert(full._2 === tail16._2, "numerator must be the last-16 fold")
    assert(full._3 === tail16._3)
  }
}
