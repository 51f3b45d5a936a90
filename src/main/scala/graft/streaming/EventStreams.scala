package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Structured Streaming jobs over the events stream — SURVEY.md §2.2
  * "Streaming" ([E]). Each aggregation is the SAME expression tree as its
  * batch twin in `graft.queries.EventQueries`, so stream-vs-batch
  * agreement on closed windows is a direct test (SURVEY.md §5) and the
  * DuckDB oracle covers the semantics via the batch form.
  *
  * Scale notes: state is keyed by (window[, key]) in the state store;
  * the watermark bounds state size and drops late data deterministically.
  * Skewed keys (hot users) shard across partitions by key hash exactly
  * like the batch shuffle.
  */
object EventStreams {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))

  /** Tumbling 15-minute windows per event type (twin: q_window_tumbling). */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding 30m/15m windows (twin: q_window_sliding). */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "30 minutes", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("n"))

  /** Session windows, 5-minute gap per user (twin: q_window_session). */
  def sessionCounts(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), "5 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("sess_start"),
        col("w.end").as("sess_end"), col("n_events"))

  /** OHLC hourly bars (batch twin: q_ohlc_resample): open/close at the
    * explicit (ts, event_id) order via min_by/max_by over a struct key —
    * PURE aggregates (unlike the batch twin's row_number form, which
    * exists only for DuckDB portability), so the same one-shuffle shape
    * runs unchanged under streaming append, with the watermark closing
    * bars an hour plus the lateness bound after their end. */
  def ohlcBars(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("volume"))
      .select(col("w.start").as("w_start"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))

  /** Stream-static enrichment join: every micro-batch equi-joins the
    * stream against a STATIC dimension (re-broadcast per batch, no join
    * state, no watermark requirement on the static side) before the
    * windowed aggregate — the standard fact-stream ⋈ dimension pattern.
    * At 100 TB/day the dim stays broadcastable exactly like the batch
    * J1 shape; a growing dim would switch to a stream-stream join. */
  def enrichedCounts(events: DataFrame, dim: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("event_type"))
      .groupBy(window(col("ts"), "15 minutes").as("w"), col("category"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast(DoubleType).as("sum_value"))
      .select(col("w.start").as("w_start"), col("category"), col("n"), col("sum_value"))

  /** Stateful dedup: first event per event_id within the watermark. */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each 'click' joined to 'view' events
    * of the same user within the preceding 10 minutes. Both sides are
    * watermarked so the state store can discard rows once the interval
    * can no longer match (the canonical bounded-state stream join).
    */
  def clickViewJoin(events: DataFrame, watermark: String = "10 minutes",
      lookback: String = "10 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    clicks.join(views,
      col("user_id") === col("v_user_id") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $lookback"))
      .select(col("user_id"), col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"))
  }

  /** foreachBatch sink: per-microbatch parquet append with the batchId
    * recorded per row — the idempotence hook for exactly-once sinks
    * (a restart re-delivers a batchId; a production sink would
    * MERGE/overwrite by that id instead of appending blindly). */
  def sinkCountsToParquet(events: DataFrame, outDir: String,
      watermark: String = "10 minutes"): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    tumblingCounts(events, watermark).writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
  }

  case class UserCount(user_id: Long, n_events: Long, total_value: Double)

  /** Spark 4 `transformWithState`: the arbitrary-state API that
    * supersedes flatMapGroupsWithState — typed named state slots
    * (Value/List/Map), TTL support, timers. Requires the RocksDB state
    * store provider. Cumulative per-user (count, value-cents) — cents
    * keep the running sum exactly associative, so the stream result is
    * comparable bit-for-bit with a batch aggregate regardless of batch
    * boundaries. */
  class UserStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Double), (Long, Long, Long)] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("agg",
        org.apache.spark.sql.Encoders.product[(Long, Long)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[(Long, Double)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long, Long)] = {
      var (n, cents) = if (st.exists()) st.get() else (0L, 0L)
      rows.foreach { r => n += 1; cents += math.round(r._2 * 100) }
      st.update((n, cents))
      Iterator((user, n, cents))
    }
  }

  /** (user_id, n_events, total_cents) running per-user stats via
    * transformWithState — the Spark-4 twin of [[runningUserCounts]]. */
  def userStatsTws(events: Dataset[(Long, Double)]): Dataset[(Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(new UserStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Custom keyed state via flatMapGroupsWithState: cumulative per-user
    * counters emitted on every update (the mapGroupsWithState surface of
    * SURVEY.md §2.2). */
  def runningUserCounts(events: Dataset[(Long, Double)]): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), UserCount](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (oldN, oldV) = state.getOption.getOrElse((0L, 0.0))
          var n = oldN
          var v = oldV
          rows.foreach { r => n += 1; v += r._2 }
          state.update((n, v))
          Iterator(UserCount(user, n, v))
      }
  }

  /** q_ewma's exact integer-rational weights: weight(lag j) =
    * 3^j·4^(15−j) over the fixed denominator 4^16 (α = 1/4, window
    * truncated at the 16 most recent events). Shared by the batch
    * query's sequential replay and the streaming twin below. */
  val EwmaWeights: IndexedSeq[Long] = (0 to 15).map(j =>
    BigInt(3).pow(j).toLong * BigInt(4).pow(15 - j).toLong)

  /** Last-16 retained rows (ts_micros, event_id, cents) + running event
    * count — the whole per-user EWMA state: O(1) bytes per user
    * regardless of history length, the property that lets the snapshot
    * run forever on an unbounded feed. */
  case class EwmaState(buf: Seq[(Long, Long, Long)], n: Long)

  /** Streaming twin of q_ewma (EventQueries): per-user truncated-16
    * EWMA over event value cents, emitted after every micro-batch.
    * Input rows are (user_id, ts_micros, event_id, cents); output is
    * (user_id, n_events, ewma_num, ewma_milli) — bit-identical to the
    * batch query's row for the same event set (EwmaStreamSpec pins
    * single-batch AND cross-batch parity). The invariant is stronger
    * than a watermark contract: merge-sort-takeRight(16) keeps the 16
    * globally NEWEST (ts, event_id) rows seen so far, and
    * "16-newest-so-far" is monotone under any arrival order — so the
    * final snapshot equals the batch row for ANY cross-batch disorder,
    * not just disorder within the retained horizon (this is what the
    * spec's cross-batch test actually relies on). */
  class EwmaProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long, Long, Long), (Long, Long, Long, Long)] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[EwmaState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[EwmaState]("ewma",
        org.apache.spark.sql.Encoders.product[EwmaState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(user: Long,
        rows: Iterator[(Long, Long, Long, Long)],
        tv: org.apache.spark.sql.streaming.TimerValues):
        Iterator[(Long, Long, Long, Long)] = {
      val prev = if (st.exists()) st.get() else EwmaState(Seq.empty, 0L)
      val incoming = rows.map(r => (r._2, r._3, r._4)).toSeq
      val buf = (prev.buf ++ incoming)
        .sortBy(t => (t._1, t._2)).takeRight(16)
      val n = prev.n + incoming.size
      st.update(EwmaState(buf, n))
      val m = buf.length
      val num = buf.iterator.zipWithIndex.map { case ((_, _, c), k) =>
        c * EwmaWeights(m - 1 - k)
      }.sum
      Iterator((user, n, num, num * 1000 / 4294967296L))
    }
  }

  /** (user_id, n_events, ewma_num, ewma_milli) running per-user EWMA
    * snapshot via transformWithState — the streaming twin of q_ewma. */
  def ewmaTws(events: Dataset[(Long, Long, Long, Long)]):
      Dataset[(Long, Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(new EwmaProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }
}
