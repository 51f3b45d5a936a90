package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryUtil._

/** Window-function surface — SURVEY.md §2.2 "Window functions" + "Sort /
  * limit / top-k".
  *
  * Reference evidence: S3 (row_number()=1 idiom for earliest-study
  * pruning, `/root/reference/src/generate_mapping.py:20-21`), J4
  * (last-in-file-order fold — the analytic last/lag family). Frames and
  * top-k-per-group are [E] extensions.
  *
  * Determinism: every window ORDER BY ends in a unique key so ranking
  * functions are reproducible; `rank`/`dense_rank` windows deliberately
  * order by a coarse bucket to exercise tie semantics, which are
  * deterministic per-row even though intra-tie order is not (row_number
  * is never taken over a tied order).
  *
  * Scale notes: a window over partitionBy(k) is one shuffle on k — same
  * cost class as groupBy(k). The top-k query relies on Catalyst's
  * WindowGroupLimit rewrite (rank<=k pushed below the window sort), which
  * keeps per-partition state at k rows instead of the full partition.
  */
object WindowQueries {

  /** Shared implementation of the flag-partitioned RANGE band
    * (q_window_range_frame = q_window_range_agg): per-(flag, quantity)
    * pre-aggregate → domain-grain window (≤ |quantity domain| rows per
    * flag) → broadcast join back. Output-identical to
    * `count/sum OVER (PARTITION BY l_returnflag ORDER BY l_quantity
    * RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)` because equal
    * quantities are RANGE peers and only frame-deterministic aggregates
    * ride the frame. */
  private def flagRangeBand(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val per = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("n_q"), sum(dec(col("l_quantity"))).as("s_q"))
    val wq = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity"))
      .rangeBetween(-5, 0)
    val banded = per.select(col("l_returnflag"), col("l_quantity"),
      sum(col("n_q")).over(wq).as("peers_in_band"),
      sum(col("s_q")).over(wq).cast(DoubleType).as("band_qty"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"))
      .join(broadcast(banded), Seq("l_returnflag", "l_quantity"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"), col("peers_in_band"), col("band_qty"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"), col("peers_in_band"), col("band_qty"))
  }

  val defs: Map[String, Q] = Map(
    // Trailing 7-day regression trend of daily revenue, as the EXACT
    // integer slope numerator/denominator (n·Σxy−ΣxΣy, n·Σxx−Σx²) —
    // no double division, so the trend itself is hash-gated. x is the
    // epoch-day index, y exact cents; the five frame sums run over ONE
    // calendar-bounded 7-row frame on the O(distinct days) pre-
    // aggregate (q_rolling_median's scale argument). Products route
    // through DECIMAL(38,0)/HUGEINT before summing, so the contract
    // holds past 1e12 daily cents.
    "q_trend_slope" -> ((s, d) => {
      val dd = DecimalType(38, 0)
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast(LongType)).as("y"))
        .withColumn("x", expr("datediff(day, DATE'1970-01-01')")
          .cast(LongType))
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      daily
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum(col("x").cast(dd)).over(w))
        .withColumn("sy", sum(col("y").cast(dd)).over(w))
        .withColumn("sxy", sum(col("x").cast(dd) * col("y").cast(dd)).over(w))
        .withColumn("sxx", sum(col("x").cast(dd) * col("x").cast(dd)).over(w))
        .select(col("day"), col("y"), col("n"),
          expr("CAST(n * sxy - sx * sy AS BIGINT)").as("slope_num"),
          expr("CAST(n * sxx - sx * sx AS BIGINT)").as("slope_den"))
        .orderBy(col("day"))
    }),

    // Pareto 80%-coverage per brand: how many parts cover 80% of each
    // brand's revenue. Revenue per (brand, part) comes off one fact
    // shuffle with the part dim broadcast; the rank/cumsum window
    // partitions by brand over the PART-dimension frame (O(parts per
    // brand) — dimension-bound, not fact-bound); the 80% threshold is
    // exact integers (5·cum ≥ 4·total), no ratio doubles.
    "q_pareto_coverage" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_partkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast(LongType))
          .as("cents"))
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("cents").desc, col("l_partkey"))
      val cum = rev.withColumn("rk", row_number().over(w))
        .withColumn("cum_cents", sum(col("cents")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val tot = rev.groupBy(col("p_brand"))
        .agg(sum(col("cents")).as("total_cents"),
          count(lit(1)).as("n_parts"))
      cum.join(tot, "p_brand")
        .filter(col("cum_cents") * 5 >= col("total_cents") * 4)
        .groupBy(col("p_brand"), col("total_cents"), col("n_parts"))
        .agg(min(col("rk")).as("n_parts_80"))
        .select(col("p_brand"), col("n_parts"), col("total_cents"),
          col("n_parts_80"))
        .orderBy(col("p_brand"))
    }),

    // Month-over-month rank movers: per-(month, priority) exact-cents
    // revenue, rank within the month, then each priority's rank shift
    // vs the previous month via lag. Both windows run over the
    // O(months × priorities) aggregate — two tiny-frame exchanges above
    // the single fact-table shuffle.
    "q_rank_shift" -> ((s, d) => {
      val m = Tables.orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
          col("o_orderpriority").as("prio"))
        .agg(sum(round(col("o_totalprice") * 100).cast(LongType))
          .as("cents"))
      val wRank = Window.partitionBy(col("month"))
        .orderBy(col("cents").desc, col("prio"))
      val wLag = Window.partitionBy(col("prio")).orderBy(col("month"))
      m.withColumn("rk", row_number().over(wRank))
        .withColumn("prev_rk", lag(col("rk"), 1).over(wLag))
        .withColumn("shift", coalesce(col("prev_rk") - col("rk"), lit(0)))
        .orderBy(col("month"), col("prio"))
    }),

    // Cumulative unique customers by first-purchase day — the growth-
    // analytics "new vs returning" curve. Exact distinct-so-far WITHOUT
    // a running distinct state: first-seen dates come from one hash
    // aggregate (min date per customer), the daily-new histogram from a
    // second, and the running total is a window over the CALENDAR-
    // bounded per-day frame (same pre-aggregate-then-window scale
    // argument as q_rolling_median).
    "q_cumulative_uniques" -> ((s, d) => {
      val first = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate").cast(DateType)).as("first_date"))
      val daily = first.groupBy(col("first_date"))
        .agg(count(lit(1)).as("new_cust"))
      val w = Window.orderBy(col("first_date"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.withColumn("cum_uniques", sum(col("new_cust")).over(w))
        .orderBy(col("first_date"))
    }),

    // Exact rolling LOWER median of daily revenue over a 7-day row
    // frame: collect_list over the frame → array_sort → pick position
    // (n+1) DIV 2 — all-integer cents, no interpolation, so both
    // engines agree bit-for-bit. The global window is CALENDAR-bounded,
    // not data-bounded: the frame input is the per-day pre-aggregate
    // (one shuffle, map-side combined), so a 100 TB corpus still feeds
    // the window O(distinct days) rows — the same pre-aggregate-then-
    // window shape as q_ohlc_resample, not a q_gini_split-style
    // per-value window.
    "q_rolling_median" -> ((s, d) => {
      val daily = Tables.lineitem(s, d)
        .groupBy(col("l_shipdate").cast(DateType).as("ship_date"))
        .agg(sum(round(col("l_extendedprice") * 100).cast(LongType))
          .as("cents"))
      val w = Window.orderBy(col("ship_date")).rowsBetween(-6, 0)
      daily
        .withColumn("arr", sort_array(collect_list(col("cents")).over(w)))
        .select(col("ship_date"), col("cents"),
          expr("element_at(arr, CAST((size(arr) + 1) DIV 2 AS INT))")
            .as("med_cents"))
        .orderBy(col("ship_date"))
    }),

    // Ranking family over price buckets (ties exercised deliberately).
    //
    // DECOMPOSED from the naive single window (round-13 optimization):
    // o_orderstatus has 3 values, so the direct
    // `partitionBy(o_orderstatus)` windows were 3 endless tasks whose
    // per-partition work grows with the data (the q_window_range_frame
    // liability). But the rank ORDER key (price_bucket) has a tiny
    // value domain, and every rank in the family is an exact function
    // of per-(status, bucket) COUNTS plus a within-bucket row_number:
    //   rn       = off + rn_local          (off = rows in earlier buckets)
    //   rank     = off + 1                 (bucket peers all tie)
    //   dense    = bucket's index within its status
    //   ntile(4) = closed form over (rn, n_status): the first n MOD 4
    //              tiles hold n DIV 4 + 1 rows (the SQL-standard fill)
    // The count table is ~|status×bucket| rows (window'd at that tiny
    // grain and broadcast back); the one per-row window partitions by
    // (status, bucket) — bounded-domain keys, but 12–20× more of them,
    // and each partition 12–20× smaller. Output identical (same
    // oracle; rn/rnk quartile arithmetic all-integer). row_number is
    // IntegerType in the naive form, so rn/rnk cast back to int — the
    // same 2^31 row-count bound per status the naive form had.
    "q_window_rank" -> ((s, d) => {
      val bucket = floor(col("o_totalprice") / 50000).cast(IntegerType)
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          bucket.as("price_bucket"))
      val wS = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("price_bucket"))
      val offs = base
        .groupBy(col("o_orderstatus"), col("price_bucket"))
        .agg(count(lit(1)).as("n_sb"))
        .withColumn("off", coalesce(sum(col("n_sb")).over(
          wS.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("drnk", row_number().over(wS))
        .withColumn("n_s", sum(col("n_sb")).over(
          Window.partitionBy(col("o_orderstatus"))))
      val wLocal = Window
        .partitionBy(col("o_orderstatus"), col("price_bucket"))
        .orderBy(col("o_orderkey"))
      base
        .withColumn("rn_loc", row_number().over(wLocal))
        .join(broadcast(offs), Seq("o_orderstatus", "price_bucket"))
        .select(
          col("o_orderkey"), col("o_orderstatus"), col("price_bucket"),
          (col("off") + col("rn_loc")).cast(IntegerType).as("rn"),
          (col("off") + 1L).cast(IntegerType).as("rnk"),
          col("drnk"),
          expr("""CAST(CASE
            | WHEN off + rn_loc <= (n_s % 4) * (n_s DIV 4 + 1)
            |   THEN (off + rn_loc - 1) DIV (n_s DIV 4 + 1) + 1
            | ELSE n_s % 4 + (off + rn_loc - (n_s % 4) * (n_s DIV 4 + 1) - 1)
            |   DIV (n_s DIV 4) + 1
            |END AS INT)""".stripMargin).as("quartile"))
        .orderBy(col("o_orderstatus"), col("rn"))
    }),

    // Analytic lag/lead along each supplier's ship history. The window
    // ORDER BY is a proven-unique composite ((l_orderkey, l_linenumber,
    // l_quantity, l_extendedprice) is key-unique in the test data;
    // (l_shipdate, l_orderkey, l_linenumber) alone is NOT) so lag/lead
    // values are engine-independent; the output ORDER BY covers every
    // output column for a total positional order.
    "q_window_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
      Tables.lineitem(s, d)
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"),
          lag(col("l_quantity"), 1).over(w).as("prev_qty"),
          lead(col("l_quantity"), 1).over(w).as("next_qty"),
          first(col("l_quantity")).over(w).as("first_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
    }),

    // Running totals: ROWS frame, exact decimal accumulation.
    "q_window_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"),
          sum(dec(col("l_extendedprice"))).over(w).cast(DoubleType).as("running_rev"),
          count(lit(1)).over(w).as("running_n"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
    }),

    // RANGE frame over a numeric key: peers within quantity-5 .. quantity
    // among lineitems of the same return flag — the ORIGINAL declared
    // semantics, restored in round 14 (the round-13 re-key to l_suppkey
    // changed what the query computes, which the optimization brief
    // forbids; round-13 verdict item 2 prescribed this revert). The
    // IMPLEMENTATION is the bounded-domain decomposition, not the naive
    // 3-partition window (3 endless tasks at scale, ~125 s at 100× vs
    // ~25 s decomposed): l_quantity has a small value domain (integers
    // 1..50) and equal quantities are RANGE peers, so the per-row band
    // count/sum equals a window over the per-(flag, quantity)
    // pre-aggregate, broadcast-joined back. Identical output to the
    // naive flag-partitioned window; the oracle twin IS that window.
    "q_window_range_frame" -> ((s, d) => flagRangeBand(s, d)),

    // Scale-path re-shape of the FLAG-partitioned RANGE band, kept as
    // the named decomposition row since round 13 (same result by
    // construction; q_window_range_frame shares the implementation
    // since round 14 — the naive window survives only as the oracle
    // twin and the WindowRangeDecompSpec contrast).
    "q_window_range_agg" -> ((s, d) => flagRangeBand(s, d)),

    // Top-k per group (k=3 orders per customer by price; unique tiebreak).
    "q_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          dec(col("o_totalprice")).cast(DoubleType).as("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Distribution family: percent_rank / cume_dist over a tied bucket
    // order (both are deterministic per-row under ties) + nth_value with
    // an explicit ROWS frame over a unique order. Doubles are the exact
    // (rank-1)/(n-1) and peers/n ratios — IEEE-identical in DuckDB.
    //
    // DECOMPOSED like q_window_rank (round-13; same 3-partition window
    // liability): every output is a function of per-(status, bucket)
    // counts plus a within-bucket row_number —
    //   percent_rank = off / (n_status − 1)       (0.0 when n = 1)
    //   cume_dist    = (off + n_bucket) / n_status
    //   nth_value(k, 2) under the running ROWS frame = the status's
    //     2nd (bucket, orderkey)-ordered orderkey once rn ≥ 2, NULL on
    //     the first row; the 2nd key itself comes off the tiny count
    //     frame (per-bucket bottom-2 orderkeys via min_k_by — inside
    //     one bucket the sort key IS the id, so the id-sorted array is
    //     rank-sorted).
    // The ratios divide the same integers in the same IEEE order as
    // percent_rank/cume_dist, so doubles are bit-identical.
    "q_window_dist" -> ((s, d) => {
      val bucket = floor(col("o_totalprice") / 50000).cast(IntegerType)
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          bucket.as("price_bucket"))
      val wS = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("price_bucket"))
      val offs = base
        .groupBy(col("o_orderstatus"), col("price_bucket"))
        .agg(count(lit(1)).as("n_sb"),
          graft.functions.GraftFunctions.min_k_by(
            col("o_orderkey"), col("o_orderkey"), 2).as("min2"))
        .withColumn("off", coalesce(sum(col("n_sb")).over(
          wS.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("drnk", row_number().over(wS))
        .withColumn("n_s", sum(col("n_sb")).over(
          Window.partitionBy(col("o_orderstatus"))))
        .withColumn("second", when(col("drnk") === 1,
          when(col("n_sb") >= 2, element_at(col("min2"), 2))
            .otherwise(element_at(lead(col("min2"), 1).over(wS), 1))))
        .withColumn("second", max(col("second")).over(
          Window.partitionBy(col("o_orderstatus"))))
        .drop("min2", "drnk")
      val wLocal = Window
        .partitionBy(col("o_orderstatus"), col("price_bucket"))
        .orderBy(col("o_orderkey"))
      base
        .withColumn("rn_loc", row_number().over(wLocal))
        .join(broadcast(offs), Seq("o_orderstatus", "price_bucket"))
        .select(
          col("o_orderkey"), col("o_orderstatus"), col("price_bucket"),
          when(col("n_s") === 1L, lit(0.0d))
            .otherwise(col("off").cast(DoubleType)
              / (col("n_s") - 1L).cast(DoubleType)).as("pct_rank"),
          ((col("off") + col("n_sb")).cast(DoubleType)
            / col("n_s").cast(DoubleType)).as("cume"),
          when(col("off") + col("rn_loc") >= 2L, col("second"))
            .as("second_key"))
        .orderBy(col("o_orderstatus"), col("price_bucket"), col("o_orderkey"))
    }),

    // Global sort + limit with deterministic tiebreak.
    "q_sort_limit" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"),
          dec(col("o_totalprice")).cast(DoubleType).as("o_totalprice"))
    }),

    // 2-D skyline (Pareto frontier): orders not dominated in
    // (order date, price) — kept iff price is strictly below every
    // total-order predecessor's. The naive form is ONE global window
    // (single-partition running min over all rows); this is the
    // decomposed scale shape instead: a per-MONTH running min handles
    // the within-month prefix (partitioned window — parallel), a
    // months-domain running min (tiny, bounded by the calendar not the
    // data) handles everything earlier, and the row keeps iff it beats
    // the least of the two. Integer cents end to end.
    "q_skyline_2d" -> ((s, d) => {
      val Inf = Long.MaxValue
      val o = Tables.orders(s, d).select(
        col("o_orderkey").as("k"),
        col("o_orderdate").cast(DateType).as("dt"),
        round(col("o_totalprice") * 100).cast(LongType).as("pc"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("mon"))
      val monPrefix = o.groupBy(col("mon")).agg(min(col("pc")).as("mprice"))
        .withColumn("prev_mon_min",
          min(col("mprice")).over(Window.orderBy(col("mon"))
            .rowsBetween(Window.unboundedPreceding, -1)))
        .select(col("mon"), col("prev_mon_min"))
      val wIn = Window.partitionBy(col("mon"))
        .orderBy(col("dt"), col("pc"), col("k"))
        .rowsBetween(Window.unboundedPreceding, -1)
      o.join(broadcast(monPrefix), Seq("mon"))
        .withColumn("in_min", min(col("pc")).over(wIn))
        .filter(col("pc") < least(
          coalesce(col("prev_mon_min"), lit(Inf)),
          coalesce(col("in_min"), lit(Inf))))
        .select(col("k").as("o_orderkey"),
          col("dt").cast(StringType).as("order_date"),
          col("pc").as("price_cents"))
        .orderBy(col("order_date"), col("price_cents"), col("o_orderkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_trend_slope" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1, 3),
        |f AS (
        |  SELECT day, y,
        |    COUNT(*) OVER w AS n,
        |    SUM(CAST(x AS HUGEINT)) OVER w AS sx,
        |    SUM(CAST(y AS HUGEINT)) OVER w AS sy,
        |    SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) OVER w AS sxy,
        |    SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) OVER w AS sxx
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT day, y, n,
        |  CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
        |  CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
        |FROM f ORDER BY day""".stripMargin,

    "q_pareto_coverage" ->
      """WITH rev AS (
        |  SELECT p.p_brand, l.l_partkey,
        |    CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT p_brand, l_partkey, cents,
        |    CAST(row_number() OVER (
        |      PARTITION BY p_brand ORDER BY cents DESC, l_partkey) AS INTEGER) AS rk,
        |    CAST(SUM(cents) OVER (
        |      PARTITION BY p_brand ORDER BY cents DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
        |  FROM rev),
        |tot AS (
        |  SELECT p_brand, CAST(SUM(cents) AS BIGINT) AS total_cents,
        |    COUNT(*) AS n_parts
        |  FROM rev GROUP BY 1)
        |SELECT c.p_brand, t.n_parts, t.total_cents,
        |  CAST(MIN(c.rk) AS INTEGER) AS n_parts_80
        |FROM cum c JOIN tot t USING (p_brand)
        |WHERE c.cum_cents * 5 >= t.total_cents * 4
        |GROUP BY c.p_brand, t.n_parts, t.total_cents
        |ORDER BY c.p_brand""".stripMargin,

    "q_rank_shift" ->
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |    o_orderpriority AS prio,
        |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2),
        |r AS (
        |  SELECT month, prio, cents,
        |    CAST(row_number() OVER (
        |      PARTITION BY month ORDER BY cents DESC, prio) AS INTEGER) AS rk
        |  FROM m),
        |l AS (
        |  SELECT month, prio, cents, rk,
        |    CAST(lag(rk) OVER (PARTITION BY prio ORDER BY month) AS INTEGER) AS prev_rk
        |  FROM r)
        |SELECT month, prio, cents, rk, prev_rk,
        |  CAST(COALESCE(prev_rk - rk, 0) AS INTEGER) AS shift
        |FROM l ORDER BY month, prio""".stripMargin,

    "q_cumulative_uniques" ->
      """WITH firstseen AS (
        |  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS first_date
        |  FROM orders GROUP BY o_custkey),
        |daily AS (
        |  SELECT first_date, COUNT(*) AS new_cust
        |  FROM firstseen GROUP BY first_date)
        |SELECT first_date, new_cust,
        |  CAST(SUM(new_cust) OVER (ORDER BY first_date
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_uniques
        |FROM daily ORDER BY first_date""".stripMargin,

    "q_rolling_median" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS ship_date,
        |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1)
        |SELECT ship_date, cents,
        |  arr[(len(arr) + 1) // 2] AS med_cents
        |FROM (
        |  SELECT ship_date, cents,
        |    list_sort(list(cents) OVER (ORDER BY ship_date
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
        |  FROM daily)
        |ORDER BY ship_date""".stripMargin,

    "q_window_rank" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(floor(o_totalprice / 50000) AS INTEGER) AS price_bucket
        |  FROM orders)
        |SELECT o_orderkey, o_orderstatus, price_bucket,
        |  row_number() OVER (PARTITION BY o_orderstatus ORDER BY price_bucket, o_orderkey) AS rn,
        |  rank()       OVER (PARTITION BY o_orderstatus ORDER BY price_bucket) AS rnk,
        |  dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY price_bucket) AS drnk,
        |  ntile(4)     OVER (PARTITION BY o_orderstatus ORDER BY price_bucket, o_orderkey) AS quartile
        |FROM t ORDER BY o_orderstatus, rn""".stripMargin,

    "q_window_lag_lead" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |  lag(l_quantity, 1)  OVER w AS prev_qty,
        |  lead(l_quantity, 1) OVER w AS next_qty,
        |  first_value(l_quantity) OVER w AS first_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,

    "q_window_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS running_rev,
        |  COUNT(*) OVER w AS running_n
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,

    // Restored round 14 (verdict item 2): the declared semantics are the
    // flag-partitioned window again; the Spark side implements it via
    // the bounded-quantity-domain decomposition, which must be
    // output-invisible against this naive-window twin.
    "q_window_range_frame" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |  COUNT(*) OVER w AS peers_in_band,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER w AS DOUBLE) AS band_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity
        |             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity, peers_in_band, band_qty""".stripMargin,

    // Same result as the naive flag-partitioned RANGE window by
    // construction, so the twin is that window's SQL — the re-shape
    // must be output-invisible.
    "q_window_range_agg" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |  COUNT(*) OVER w AS peers_in_band,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER w AS DOUBLE) AS band_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity
        |             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity, peers_in_band, band_qty""".stripMargin,

    "q_topk_per_group" ->
      """WITH t AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |SELECT o_custkey, rn, o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS o_totalprice
        |FROM t WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_window_dist" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(floor(o_totalprice / 50000) AS INTEGER) AS price_bucket
        |  FROM orders)
        |SELECT o_orderkey, o_orderstatus, price_bucket,
        |  percent_rank() OVER (PARTITION BY o_orderstatus ORDER BY price_bucket) AS pct_rank,
        |  cume_dist()    OVER (PARTITION BY o_orderstatus ORDER BY price_bucket) AS cume,
        |  nth_value(o_orderkey, 2) OVER (
        |    PARTITION BY o_orderstatus ORDER BY price_bucket, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
        |FROM t ORDER BY o_orderstatus, price_bucket, o_orderkey""".stripMargin,

    "q_sort_limit" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_skyline_2d" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k, CAST(o_orderdate AS DATE) AS dt,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS pc,
        |    year(o_orderdate) * 100 + month(o_orderdate) AS mon
        |  FROM orders),
        |mp AS (
        |  SELECT mon,
        |    MIN(MIN(pc)) OVER (ORDER BY mon
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_mon_min
        |  FROM o GROUP BY mon),
        |w AS (
        |  SELECT o.k, o.dt, o.pc, mp.prev_mon_min,
        |    MIN(pc) OVER (PARTITION BY o.mon ORDER BY dt, pc, k
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS in_min
        |  FROM o JOIN mp ON o.mon = mp.mon)
        |SELECT k AS o_orderkey, CAST(dt AS VARCHAR) AS order_date, pc AS price_cents
        |FROM w
        |WHERE pc < LEAST(COALESCE(prev_mon_min, 9223372036854775807),
        |                 COALESCE(in_min, 9223372036854775807))
        |ORDER BY order_date, price_cents, o_orderkey""".stripMargin
  )
}
