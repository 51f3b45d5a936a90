package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The equivalence pin [[MinKBy]]'s scaladoc promises: the bounded
  * bottom-k aggregate must keep EXACTLY the rows the rank-window form
  * (`row_number().over(partitionBy(key).orderBy(sortKey, id)) <= k`)
  * keeps, on multi-partition input that forces partial-aggregate
  * merges and buffer serde through the exchange — plus direct unit
  * coverage of the buffer (offer/merge/serialize/deserialize) and of
  * [[PairCombinations]] against the capped self-join pair set it
  * replaced (round-8 verdict item 1 / ADVICE medium).
  */
class MinKPairsSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic pseudo-random (key, sortKey, id) frame. Shapes the
    * window-equivalence property needs: a hub key with hundreds of
    * rows (forces merges of full buffers), keys with fewer rows than
    * k, exactly k, sortKey ties (distinct ids under one sortKey), and
    * exact duplicate rows. Spread over 7 partitions so partial
    * aggregation runs per-partition and every buffer crosses the
    * exchange through serialize/deserialize. */
  private def randomFrame(seed: Long, nKeys: Int, hubRows: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val rows = Seq.newBuilder[(Long, Long, Long)]
    for (key <- 0L until nKeys.toLong) {
      // group sizes 1..12 for normal keys; key 0 is the hub
      val n = if (key == 0L) hubRows else 1 + rnd.nextInt(12)
      for (_ <- 0 until n) {
        // small sortKey domain => frequent ties, exercising the
        // (sortKey, id) tie-break everywhere
        val sk = rnd.nextInt(8).toLong
        val id = rnd.nextInt(40).toLong
        rows += ((key, sk, id))
        if (rnd.nextInt(10) == 0) rows += ((key, sk, id)) // exact duplicate
      }
    }
    spark.createDataFrame(rnd.shuffle(rows.result()))
      .toDF("key", "sk", "id").repartition(7)
  }

  /** Per-key kept-id multiset under the rank-window form. */
  private def windowKept(df: DataFrame, k: Int): Map[Long, Seq[Long]] =
    df.withColumn("rn", row_number().over(
        Window.partitionBy($"key").orderBy($"sk", $"id")))
      .filter($"rn" <= k)
      .groupBy($"key").agg(sort_array(collect_list($"id")).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  /** Per-key kept-id multiset under the MinKBy aggregate. */
  private def aggKept(df: DataFrame, k: Int): Map[Long, Seq[Long]] =
    df.groupBy($"key")
      .agg(GraftFunctions.min_k_by($"sk", $"id", k).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  test("MinKBy == rank-window kept set on randomized multi-partition frames " +
      "(ties, duplicates, hub groups, k across <,=,> group size)") {
    for (seed <- Seq(1L, 2L, 3L); k <- Seq(1, 4, 16)) {
      val df = randomFrame(seed, nKeys = 30, hubRows = 400).localCheckpoint()
      val w = windowKept(df, k)
      val a = aggKept(df, k)
      assert(a === w, s"seed=$seed k=$k")
    }
  }

  test("MinKBy with k larger than every group keeps all rows, id-sorted") {
    val df = randomFrame(seed = 7L, nKeys = 20, hubRows = 10)
    val all = df.groupBy($"key")
      .agg(sort_array(collect_list($"id")).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(aggKept(df, 1000) === all)
  }

  test("MinKBy output is id-sorted ascending (PairCombinations precondition)") {
    val df = randomFrame(seed = 11L, nKeys = 10, hubRows = 200)
    val bad = df.groupBy($"key")
      .agg(GraftFunctions.min_k_by($"sk", $"id", 8).as("ids"))
      .filter(expr("ids != sort_array(ids)"))
      .count()
    assert(bad === 0)
  }

  test("MinKBy skips null sortKey rows — documented DIVERGENCE from the " +
      "window form (ascending sort is NULLS FIRST there)") {
    val df = Seq[(Long, Option[Long], Long)](
      (1L, None, 100L), (1L, Some(5L), 5L), (1L, Some(3L), 3L))
      .toDF("key", "sk", "id")
    val kept = df.groupBy($"key")
      .agg(GraftFunctions.min_k_by($"sk", $"id", 2).as("ids"))
      .collect().head.getSeq[Long](1)
    // the window form would keep (null, 100) FIRST; MinKBy drops it
    assert(kept === Seq(3L, 5L))
  }

  // ---- direct buffer unit coverage (offer / merge / serde) ----

  test("MinKByBuf.offer keeps the k smallest (key, id) with O(1) rejects") {
    val buf = new MinKByBuf(3)
    Seq((5L, 50L), (1L, 10L), (9L, 90L), (1L, 5L), (9L, 1L), (2L, 20L))
      .foreach { case (k, i) => buf.offer(k, i) }
    // sorted survivors: (1,5), (1,10), (2,20)
    assert(buf.n === 3)
    assert(buf.keys.take(3).toSeq === Seq(1L, 1L, 2L))
    assert(buf.ids.take(3).toSeq === Seq(5L, 10L, 20L))
    buf.offer(2L, 20L) // equal to current max on a full buffer: rejected
    assert(buf.ids.take(3).toSeq === Seq(5L, 10L, 20L))
  }

  test("MinKBy serialize/deserialize round-trips partial buffers exactly") {
    import org.apache.spark.sql.GraftShim
    val agg = MinKBy(GraftShim.toExpression(lit(0L)),
      GraftShim.toExpression(lit(0L)), k = 4)
    for (nOffers <- Seq(0, 1, 3, 4, 9)) {
      val buf = new MinKByBuf(4)
      val rnd = new scala.util.Random(nOffers)
      for (_ <- 0 until nOffers)
        buf.offer(rnd.nextInt(100).toLong, rnd.nextInt(100).toLong)
      val back = agg.deserialize(agg.serialize(buf))
      assert(back.n === buf.n)
      assert(back.keys.take(back.n).toSeq === buf.keys.take(buf.n).toSeq)
      assert(back.ids.take(back.n).toSeq === buf.ids.take(buf.n).toSeq)
    }
  }

  test("MinKByBuf.mergeIn across three partial buffers == single-pass bottom-k") {
    val rnd = new scala.util.Random(42)
    val all = Seq.fill(60)((rnd.nextInt(30).toLong, rnd.nextInt(1000).toLong))
    val parts = all.grouped(20).toSeq
    val merged = new MinKByBuf(5)
    parts.foreach { p =>
      val b = new MinKByBuf(5)
      p.foreach { case (k, i) => b.offer(k, i) }
      merged.mergeIn(b)
    }
    val expect = all.sorted.take(5)
    assert(merged.keys.take(merged.n).toSeq === expect.map(_._1))
    assert(merged.ids.take(merged.n).toSeq === expect.map(_._2))
  }

  // ---- PairCombinations ----

  test("PairCombinations == capped self-join pair set (the plan it replaced)") {
    val df = randomFrame(seed = 13L, nKeys = 25, hubRows = 300)
      // the real callers feed .distinct() projections where `id` is
      // unique per key (one sortKey per member) — mirror that, else a
      // duplicate id kept under two sortKeys self-pairs positionally
      // while the a < b join drops it
      .groupBy($"key", $"id").agg(min($"sk").as("sk"))
      .select($"key", $"sk", $"id").localCheckpoint()
    val k = 8
    val capped = df.withColumn("rn", row_number().over(
        Window.partitionBy($"key").orderBy($"sk", $"id")))
      .filter($"rn" <= k).drop("rn", "sk")
    val joinPairs = capped.select($"key", $"id".as("a"))
      .join(capped.select($"key", $"id".as("b")), Seq("key"))
      .filter($"a" < $"b")
      .select($"key", $"a", $"b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fnPairs = df.groupBy($"key")
      .agg(GraftFunctions.min_k_by($"sk", $"id", k).as("ids"))
      .select($"key", explode(GraftFunctions.pair_combinations($"ids")).as("p"))
      .select($"key", $"p.a", $"p.b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fnPairs === joinPairs)
  }

  test("PairCombinations on empty and singleton arrays is empty; every " +
      "emitted pair satisfies a < b") {
    val out = Seq(
      (0L, Seq.empty[Long]), (1L, Seq(7L)), (2L, Seq(1L, 2L, 3L, 4L)))
      .toDF("key", "ids")
      .select($"key",
        GraftFunctions.pair_combinations($"ids").as("ps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Row](1)).toMap
    assert(out(0L).isEmpty && out(1L).isEmpty)
    assert(out(2L).size === 6)
    assert(out(2L).forall(p => p.getLong(0) < p.getLong(1)))
  }
}
