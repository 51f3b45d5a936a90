package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** In-stream MinHash-LSH near-duplicate suppression — the streaming twin
  * of the batch MinHash family (`queries/DedupQueries.scala`): every
  * batch dedup operator there assumes the corpus is at rest, but a
  * 100 TB/day ingest wants near-dups suppressed AS DOCUMENTS ARRIVE,
  * before they are ever written to the corpus store.
  *
  * Shape (SURVEY.md §2.2 streaming + LLM-ops):
  *
  *   1. Stateless map stage — the SAME fused kernels as the batch path
  *      ([[graft.functions.HashedShingles]] →
  *      [[graft.functions.MinHashSlots]], bit-identical constants), then
  *      explode to `Bands` (band, band_key) rows per doc carrying the
  *      8-slot signature (64 B — the shuffle never carries shingle sets
  *      or text, the batch family's "ids only" rule).
  *   2. Stateful stage — `transformWithState` keyed by (band, band_key):
  *      the state is the bucket's OWNER `(doc_id, sig)` (~80 B/bucket);
  *      the first-arriving doc claims the bucket (min doc_id resolves
  *      ties inside a micro-batch, so a single-batch run equals the
  *      batch twin exactly), every later arrival emits ONE candidate row
  *      against the owner with its slot-match count. This is the
  *      star-link form of `DedupQueries.cappedBucketPairs` — O(1) state
  *      reads and O(1) emitted rows per arriving doc per band, never
  *      all-pairs, so a boilerplate hub bucket costs the stream nothing.
  *
  * A doc is a near-dup iff ANY of its bands emits a candidate whose
  * estimated Jaccard (`n_sig_match / NumHashes`) clears the consumer's
  * threshold — the same banding recall contract as the batch family
  * (bands=4 × rows=2 over 8 hashes).
  *
  * 100 TB scale: state is sharded by (band, band_key) hash across
  * executors in RocksDB; its size is bounded by DISTINCT CONTENT (one
  * owner per occupied bucket), not by input volume — a dup-saturated
  * feed grows state not at all (StreamBench's saturation sweep measures
  * exactly this: state_bytes flat while input multiplies). Production
  * retention uses `ttl` (dedup-within-window, e.g. 7 days) so abandoned
  * buckets age out of the store; ttl=None keeps owners forever (the
  * whole-corpus contract, still content-bounded).
  */
object NearDupStream {

  /** Must match DedupQueries' NUM_HASHES/BANDS — the banding layout IS
    * the recall contract shared by the stream and batch forms. */
  val NumHashes = 8
  val Bands = 4 // rows-per-band = 2

  case class BandedDoc(band: Int, band_key: String, doc_id: Long, sig: Array[Long])
  case class DupCandidate(doc_id: Long, band: Int, owner_id: Long, n_sig_match: Int)

  /** Stateless stage: (doc_id, text) → one [[BandedDoc]] row per band.
    * Works on both streaming and batch frames (pure projection). Docs
    * with no 3-gram shingle (under 3 tokens) can never near-dup match
    * and are dropped, exactly like the batch `docShinglesOf` gate. */
  def bandedDocs(docs: DataFrame): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    import graft.functions.GraftFunctions.{hashed_shingles, min_hash_slots}
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        hashed_shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", min_hash_slots(col("sh"), NumHashes))
      .select(col("doc_id"), col("sig"),
        explode(array((0 until Bands).map(b => struct(
          lit(b).as("band"),
          concat_ws("_", element_at(col("sig"), 2 * b + 1),
            element_at(col("sig"), 2 * b + 2)).as("band_key"))): _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.band_key").as("band_key"),
        col("doc_id"), col("sig"))
      .as[BandedDoc]
  }

  /** Keyed state: the bucket owner. First arrival claims the bucket and
    * is emitted as nothing (kept docs are the SILENT majority — the
    * output stream is only the dup candidates, the small side); later
    * arrivals emit one candidate row each. Min doc_id resolves order
    * inside a micro-batch so single-batch runs are deterministic and
    * equal [[batchTwin]]; across batches the contract is
    * first-arrival-wins (an earlier-arriving larger id keeps the bucket
    * — retracting an already-kept doc is not expressible in a stream). */
  class BucketOwnerProcessor
      extends StatefulProcessor[(Int, String), BandedDoc, DupCandidate] {
    @transient private var owner: ValueState[(Long, Array[Long])] = _

    def ttl: TTLConfig = TTLConfig.NONE

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[(Long, Array[Long])]("owner",
        Encoders.product[(Long, Array[Long])], ttl)

    override def handleInputRows(key: (Int, String), rows: Iterator[BandedDoc],
        tv: TimerValues): Iterator[DupCandidate] = {
      val batch = rows.toArray.sortBy(_.doc_id)
      val st = if (owner.exists()) owner.get() else (Long.MaxValue, null: Array[Long])
      var oid = st._1
      var osig = st._2
      val out = new scala.collection.mutable.ArrayBuffer[DupCandidate](batch.length)
      batch.foreach { d =>
        if (osig == null) { oid = d.doc_id; osig = d.sig }
        else if (d.doc_id != oid) {
          var m = 0
          var j = 0
          val n = math.min(osig.length, d.sig.length)
          while (j < n) { if (d.sig(j) == osig(j)) m += 1; j += 1 }
          out += DupCandidate(d.doc_id, d.band, oid, m)
        }
      }
      if (osig != null) owner.update((oid, osig))
      out.iterator
    }
  }

  /** TTL'd variant: owners expire `ttlMs` after their last write — the
    * dedup-within-retention-window production contract (processing-time
    * TTL is the only mode RocksDB TTL supports without event-time
    * timers; an expired bucket is simply re-claimable). WALL-CLOCK
    * expiry: a backfill replayed at full speed dedups against the wrong
    * horizon — use [[candidatesEventTime]] for replays. Harness note: a
    * ProcessingTime-mode query never quiesces (timers keep the engine
    * scheduling batches), so tests must drive it with the terminating
    * `Trigger.AvailableNow`, never `processAllAvailable` (which
    * live-locks — NearDupStreamSpec's contrast test documents this). */
  class TtlBucketOwnerProcessor(ttlMs: Long) extends BucketOwnerProcessor {
    override def ttl: TTLConfig = TTLConfig(java.time.Duration.ofMillis(ttlMs))
  }

  /** The full streaming pipeline: docs(doc_id, text) → dup-candidate
    * stream. Requires the RocksDB state store provider (transformWithState
    * contract). Update mode: candidates are emitted exactly once, in the
    * batch their doc arrives. */
  def candidates(docs: DataFrame, ttlMs: Long = 0L): Dataset[DupCandidate] = {
    import docs.sparkSession.implicits._
    val proc =
      if (ttlMs > 0L) new TtlBucketOwnerProcessor(ttlMs) else new BucketOwnerProcessor
    bandedDocs(docs)
      .groupByKey(d => (d.band, d.band_key))
      .transformWithState(proc,
        if (ttlMs > 0L) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update())
  }

  /** [[BandedDoc]] with the event-time column carried through — the
    * input row of [[candidatesEventTime]]. `ts` is the WATERMARKED
    * column itself (declared upstream by `withWatermark`; the
    * projection preserves the marker), so event-time timers and
    * late-row handling both key off it. */
  case class TsBandedDoc(band: Int, band_key: String, doc_id: Long,
      sig: Array[Long], ts: java.sql.Timestamp)

  /** [[bandedDocs]] with `ts` carried through. */
  def bandedDocsTs(docs: DataFrame): Dataset[TsBandedDoc] = {
    import docs.sparkSession.implicits._
    import graft.functions.GraftFunctions.{hashed_shingles, min_hash_slots}
    docs
      .select(col("doc_id").cast("long").as("doc_id"), col("ts"),
        hashed_shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", min_hash_slots(col("sh"), NumHashes))
      .select(col("doc_id"), col("sig"), col("ts"),
        explode(array((0 until Bands).map(b => struct(
          lit(b).as("band"),
          concat_ws("_", element_at(col("sig"), 2 * b + 1),
            element_at(col("sig"), 2 * b + 2)).as("band_key"))): _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.band_key").as("band_key"),
        col("doc_id"), col("sig"), col("ts"))
      .as[TsBandedDoc]
  }

  /** EVENT-TIME retention (round-11 verdict item 5): the
    * processing-time TTL of [[TtlBucketOwnerProcessor]] expires buckets
    * by WALL clock, so a backfill replayed at full speed dedups against
    * the wrong horizon (10 data-days replay in seconds — nothing
    * expires; NearDupStreamSpec pins that contrast). This processor
    * keys retention on the event-time watermark instead:
    *
    *   - the owner state carries its expiry (last touch ts + ttl);
    *     every touch refreshes it (mirroring TTLConfig's
    *     refresh-on-write), re-arming the bucket's ONE timer;
    *   - `handleExpiredTimer` clears the owner once the watermark
    *     passes the expiry (a stale timer from an earlier re-arm fires
    *     harmlessly: it only clears when the CURRENT expiry has passed);
    *   - arrivals ALSO check the stored expiry against the current
    *     watermark inline, so replay equivalence never depends on
    *     timer-vs-input ordering inside a batch.
    *
    * In-batch ties resolve by (ts, doc_id) — the EARLIEST event claims
    * the bucket — so re-running a backfill reproduces identical owners.
    * State stays O(occupied buckets), now additionally bounded by the
    * event-time horizon. */
  class EventTimeBucketOwnerProcessor(ttlMs: Long)
      extends StatefulProcessor[(Int, String), TsBandedDoc, DupCandidate] {
    @transient private var owner: ValueState[(Long, Array[Long], Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[(Long, Array[Long], Long)]("owner",
        Encoders.product[(Long, Array[Long], Long)], TTLConfig.NONE)

    override def handleInputRows(key: (Int, String),
        rows: Iterator[TsBandedDoc],
        tv: TimerValues): Iterator[DupCandidate] = {
      val wm = tv.getCurrentWatermarkInMs()
      val batch = rows.toArray.sortBy(d => (d.ts.getTime, d.doc_id))
      var (oid, osig, oexp) =
        if (owner.exists()) owner.get()
        else (Long.MaxValue, null: Array[Long], Long.MinValue)
      // expired by event time even if the timer hasn't fired yet
      if (osig != null && oexp <= wm) { oid = Long.MaxValue; osig = null }
      val prevExp = if (osig != null) Some(oexp) else None
      val out = new scala.collection.mutable.ArrayBuffer[DupCandidate](batch.length)
      batch.foreach { d =>
        if (osig == null) {
          oid = d.doc_id; osig = d.sig; oexp = d.ts.getTime + ttlMs
        } else {
          if (d.doc_id != oid) {
            var m = 0
            var j = 0
            val n = math.min(osig.length, d.sig.length)
            while (j < n) { if (d.sig(j) == osig(j)) m += 1; j += 1 }
            out += DupCandidate(d.doc_id, d.band, oid, m)
          }
          oexp = math.max(oexp, d.ts.getTime + ttlMs)
        }
      }
      if (osig != null) {
        if (!prevExp.contains(oexp)) {
          prevExp.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(oexp)
        }
        owner.update((oid, osig, oexp))
      }
      out.iterator
    }

    override def handleExpiredTimer(key: (Int, String), tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[DupCandidate] = {
      if (owner.exists() && owner.get()._3 <= info.getExpiryTimeInMs)
        owner.clear()
      Iterator.empty
    }
  }

  /** [[candidates]] with event-time retention: docs(doc_id, text, ts) →
    * dup-candidate stream, buckets expiring `ttlMs` after their last
    * touch IN EVENT TIME (timer on the watermark). `delay` is the
    * allowed event-time disorder, the standard watermark knob. */
  def candidatesEventTime(docs: DataFrame, ttlMs: Long,
      delay: String = "1 minute"): Dataset[DupCandidate] = {
    import docs.sparkSession.implicits._
    bandedDocsTs(docs.withWatermark("ts", delay))
      .groupByKey(d => (d.band, d.band_key))
      .transformWithState(new EventTimeBucketOwnerProcessor(ttlMs),
        TimeMode.EventTime(), OutputMode.Update())
  }

  /** Batch twin of a SINGLE-BATCH run of [[candidates]]: bucket owner =
    * min doc_id, every other bucket member emits one candidate row with
    * its positional slot-match count. Same expression tree family as the
    * batch LSH queries (min-id star-link); used by NearDupStreamSpec for
    * stream-vs-batch agreement (no DuckDB oracle — the arrival-order
    * semantics are streaming-specific, the precedent of the watermark /
    * session / tws rows). */
  def batchTwin(docs: DataFrame): DataFrame = {
    val banded = bandedDocs(docs).toDF()
    val owners = banded
      .groupBy(col("band"), col("band_key"))
      .agg(min_by(struct(col("doc_id"), col("sig")), col("doc_id")).as("o"))
      .select(col("band"), col("band_key"),
        col("o.doc_id").as("owner_id"), col("o.sig").as("owner_sig"))
    banded.join(owners, Seq("band", "band_key"))
      .filter(col("doc_id") =!= col("owner_id"))
      .select(col("doc_id"), col("band"), col("owner_id"),
        size(filter(zip_with(col("sig"), col("owner_sig"),
          (a, b) => a === b), x => x)).cast("int").as("n_sig_match"))
  }
}

