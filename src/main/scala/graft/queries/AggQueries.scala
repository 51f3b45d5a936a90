package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryUtil._

/** Aggregation surface — SURVEY.md §2.2 "Aggregation".
  *
  * Reference evidence: S3 (min-per-group study pruning,
  * `/root/reference/src/generate_mapping.py:20-21`), G1 (group+collect,
  * `/root/reference/src/load_ground_truths.py:78-80`), J2/J4 (first/last
  * with explicit order — `max_by`/`min_by`), D4 (conditional aggregation
  * pattern). Rollup/cube/grouping-sets, distinct counts and HLL are the
  * mandated [E] extensions.
  *
  * Scale notes (100 TB): every groupBy below is a hash aggregate with
  * map-side partial aggregation — the shuffle carries only
  * (#groups × #partitions) pre-combined rows, not raw data. Group
  * cardinalities here (returnflag×linestatus ≈ 6, custkey ≈ rows/10) keep
  * reducers balanced; for skewed keys AQE skew-split handles stragglers.
  * `collect_list` outputs are bounded per group before collection (the
  * anti-pattern at scale is collecting unbounded groups).
  */
object AggQueries {

  val defs: Map[String, Q] = Map(
    // Exact per-group p90 through the GROUPED two-pass cumulative sum —
    // the per-group generalization of q_weighted_median's rangeCumsum
    // shape, inlined with the group key carried through every stage:
    // per-(group, cent) weights on the bounded dollar domain, cumsums
    // partitioned by (group, bucket), bucket offsets exploded per group
    // and broadcast back, then the smallest cent whose cumulative count
    // reaches ⌈9n/10⌉. No global sort, no per-group single task: the
    // widest window partition is one (group, $2000-bucket) slice.
    "q_group_p90" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // localCheckpoint: the (group, cent) frame is value-domain
      // bounded but referenced 4× below (within, totals, mx, tot) —
      // un-materialized, that's 4 full lineitem scans + aggregations
      // (ScanAudit round 10: x4 → x1; the family A/B representative,
      // measured at 100× in SCALE.md round 10).
      val perKey = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("grp"),
          round(col("l_extendedprice") * 100).cast(LongType).as("cents"))
        .groupBy(col("grp"), col("cents")).agg(count(lit(1)).as("w"))
        .withColumn("bkt", expr("cents DIV 200000"))
        .localCheckpoint()
      val wIn = Window.partitionBy(col("grp"), col("bkt"))
        .orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val within = perKey.withColumn("cw_in", sum(col("w")).over(wIn))
      val totals = perKey.groupBy(col("grp"), col("bkt"))
        .agg(sum(col("w")).as("bt"))
      val mx = perKey.groupBy(col("grp")).agg(max(col("bkt")).as("maxbkt"))
      val offs = totals.join(broadcast(mx), "grp")
        .filter(col("bkt") < col("maxbkt"))
        .select(col("grp"), explode(sequence(col("bkt") + 1,
          col("maxbkt"))).as("bkt"), col("bt"))
        .groupBy(col("grp"), col("bkt")).agg(sum(col("bt")).as("off"))
      val cum = within.join(broadcast(offs), Seq("grp", "bkt"), "left")
        .withColumn("cw", col("cw_in") + coalesce(col("off"), lit(0L)))
      val tot = perKey.groupBy(col("grp"))
        .agg(sum(col("w")).as("n_rows"))
        .withColumn("thresh", expr("(9 * n_rows + 9) DIV 10"))
      cum.join(broadcast(tot), "grp")
        .filter(col("cw") >= col("thresh"))
        .groupBy(col("grp"), col("n_rows"))
        .agg(min(col("cents")).as("p90_cents"))
        .select(col("grp"), col("n_rows"), col("p90_cents"))
        .orderBy(col("grp"))
    }),

    // Benford first-digit deviation — the data-quality / fraud signal
    // over the order-total distribution: first significant digit from
    // the exact-cents BIGINT rendered as a string (no log10 doubles),
    // observed per-mille share vs the Benford expectation as FIXED
    // integer constants, absolute deviation per digit. One
    // map-side-combined 9-group aggregate + a 1-row total broadcast.
    "q_benford_deviation" -> ((s, d) => {
      val benford = "CASE digit WHEN 1 THEN 301 WHEN 2 THEN 176" +
        " WHEN 3 THEN 125 WHEN 4 THEN 97 WHEN 5 THEN 79 WHEN 6 THEN 67" +
        " WHEN 7 THEN 58 WHEN 8 THEN 51 ELSE 46 END"
      val digits = Tables.orders(s, d)
        .select(expr("CAST(substring(CAST(CAST(round(o_totalprice * 100)" +
          " AS BIGINT) AS STRING), 1, 1) AS INT)").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = digits.agg(sum(col("n")).as("total"))
      digits.crossJoin(broadcast(tot))
        .withColumn("permille", expr("n * 1000 DIV total"))
        .withColumn("benford_permille", expr(benford))
        .withColumn("dev_permille",
          abs(col("permille") - col("benford_permille")))
        .select(col("digit"), col("n"), col("permille"),
          col("benford_permille"), col("dev_permille"))
        .orderBy(col("digit"))
    }),

    // RFM customer segmentation with FIXED business tiers — the
    // quantile (ntile) scoring variant would funnel every customer
    // through one global sort task, so tiers are fixed thresholds
    // applied map-side after ONE customer-keyed aggregate: recency vs
    // the global high-water date (1-row broadcast), frequency and
    // exact-cents monetary tiers by CASE. Output is the tier lattice
    // with counts and revenue: one O(customers) shuffle, everything
    // after is O(segments).
    "q_rfm_segments" -> ((s, d) => {
      val per = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("last_date"),
          count(lit(1)).as("freq"),
          sum(round(col("o_totalprice") * 100).cast(LongType))
            .as("cents"))
      val wm = per.agg(max(col("last_date")).as("wm_date"))
      per.crossJoin(broadcast(wm))
        .withColumn("rec_days", datediff(col("wm_date"), col("last_date")))
        .withColumn("r_tier", when(col("rec_days") <= 180, 4)
          .when(col("rec_days") <= 365, 3)
          .when(col("rec_days") <= 730, 2).otherwise(1))
        .withColumn("f_tier", when(col("freq") >= 20, 4)
          .when(col("freq") >= 15, 3)
          .when(col("freq") >= 10, 2).otherwise(1))
        .withColumn("m_tier", when(col("cents") >= 300000000L, 4)
          .when(col("cents") >= 200000000L, 3)
          .when(col("cents") >= 100000000L, 2).otherwise(1))
        .groupBy(col("r_tier"), col("f_tier"), col("m_tier"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cents")).as("sum_cents"))
        .orderBy(col("r_tier"), col("f_tier"), col("m_tier"))
    }),

    // New-vs-returning monthly revenue split: first-order date per
    // customer (one key aggregate), each order tagged by comparing to
    // its customer's first date (key join — co-partitioned with the
    // aggregate, so AQE reuses the exchange), monthly rollup. Two
    // fact-keyed shuffles, O(months) output.
    "q_new_vs_returning" -> ((s, d) => {
      val first = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(min(to_date(col("o_orderdate"))).as("first_date"))
      Tables.orders(s, d).join(first, "o_custkey")
        .withColumn("is_new",
          (to_date(col("o_orderdate")) === col("first_date")).cast("int"))
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(sum(col("is_new")).as("n_new"),
          sum(lit(1) - col("is_new")).as("n_returning"),
          sum(when(col("is_new") === 1,
            round(col("o_totalprice") * 100).cast(LongType))
            .otherwise(0L)).as("new_cents"),
          sum(when(col("is_new") === 0,
            round(col("o_totalprice") * 100).cast(LongType))
            .otherwise(0L)).as("ret_cents"))
        .orderBy(col("month"))
    }),

    // Lag-1 autocorrelation of the daily revenue series — the
    // time-series persistence diagnostic. The (x_t, x_{t+1}) pair frame
    // comes from one lead() over the per-day aggregate (O(distinct
    // days) — the bounded-domain pre-aggregate-then-window argument of
    // q_rolling_median); the moments are EXACT — cents promoted to
    // DECIMAL(38,0)/HUGEINT BEFORE the cross products, so no double
    // product ever exceeds 2^53 — and the closed form runs in IEEE
    // double with the identical op order in the twin (q_correlation
    // parity contract).
    "q_autocorr" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val dd = DecimalType(38, 0)
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast(LongType)).as("x"))
      val pairs = daily
        .withColumn("y", lead(col("x"), 1).over(Window.orderBy(col("day"))))
        .filter(col("y").isNotNull)
      val m = pairs.agg(
        count(lit(1)).cast(DoubleType).as("n"),
        sum(col("x").cast(dd)).cast(DoubleType).as("sx"),
        sum(col("y").cast(dd)).cast(DoubleType).as("sy"),
        sum(col("x").cast(dd) * col("y").cast(dd)).cast(DoubleType).as("sxy"),
        sum(col("x").cast(dd) * col("x").cast(dd)).cast(DoubleType).as("sxx"),
        sum(col("y").cast(dd) * col("y").cast(dd)).cast(DoubleType).as("syy"))
      m.select(col("n").cast(LongType).as("n_pairs"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))))
          .as("autocorr_lag1"))
    }),

    // Day-of-week seasonal-baseline anomaly detection over the orders
    // revenue series: daily exact-cents totals (ONE date-keyed
    // aggregate over the fact table), per-weekday baseline mean in
    // exact micro-cents (integer DIV over the 7-row dow frame), then
    // residual = day − baseline via a 7-row broadcast join back; top-10
    // days by |residual|. Nothing after the first aggregate exceeds
    // O(distinct days). The ×1e6 product routes through DECIMAL(38,0)
    // so the all-integer contract holds to ~9e12 daily cents ($90 B/day)
    // before the final BIGINT narrows — far past any real series.
    "q_dow_anomaly" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast(LongType))
          .as("cents"))
        .withColumn("dow", expr("weekday(day)"))
      val base = daily.groupBy(col("dow"))
        .agg(expr("CAST(CAST(sum(cents) AS DECIMAL(38,0)) * 1000000" +
            " DIV count(*) AS BIGINT)").as("baseline_micro"),
          count(lit(1)).as("n_days"))
      daily.join(broadcast(base), Seq("dow"))
        .withColumn("resid_micro",
          expr("CAST(CAST(cents AS DECIMAL(38,0)) * 1000000" +
            " - baseline_micro AS BIGINT)"))
        .orderBy(abs(col("resid_micro")).desc, col("day")).limit(10)
        .select(col("day"), col("dow"), col("cents"), col("n_days"),
          col("baseline_micro"), col("resid_micro"))
        .orderBy(abs(col("resid_micro")).desc, col("day"))
    }),

    // Exact weighted LOWER median (extendedprice weighted by quantity)
    // through the two-pass range-partitioned cumulative sum
    // (QueryUtil.rangeCumsum) — no single-task global window anywhere:
    // per-cent weights live on the bounded dollar domain (~50 buckets
    // of $2,000), cumsums run parallel within buckets, bucket offsets
    // arrive by broadcast, and the answer is the smallest cent whose
    // cumulative weight reaches ⌈W/2⌉ (1-row broadcast of the total).
    "q_weighted_median" -> ((s, d) => {
      // localCheckpoint: the per-cent frame is VALUE-DOMAIN bounded
      // (~10^7 possible cents) but is referenced 3× inside rangeCumsum
      // plus once for the total — un-materialized, each reference
      // re-runs the full fact scan + aggregate (ScanAudit round 10:
      // lineitem x4 → x1; A/B'd at 100× on the q_group_p90
      // representative, see SCALE.md round 10).
      val perCent = Tables.lineitem(s, d)
        .select(round(col("l_extendedprice") * 100).cast(LongType)
            .as("cents"),
          round(col("l_quantity")).cast(LongType).as("qty"))
        .groupBy(col("cents")).agg(sum(col("qty")).as("w"))
        .localCheckpoint()
      val cum = rangeCumsum(perCent, "cents", Seq("w"), 200000L)
      val tot = perCent.agg(sum(col("w")).as("total_w"))
        .select(col("total_w"), expr("(total_w + 1) DIV 2").as("half"))
      cum.crossJoin(broadcast(tot))
        .filter(col("cum_w") >= col("half"))
        .groupBy(col("total_w"), col("half"))
        .agg(min(col("cents")).as("median_cents"))
        .select(col("total_w"), col("half"), col("median_cents"))
    }),

    // Key-skew profiler — the diagnostic an engineer runs BEFORE
    // choosing a join/partition strategy at 100 TB: per-key counts of
    // the fact key (one map-side-combined aggregate), the top-10 heavy
    // hitters (TakeOrdered, then a 10-row window for the rank), and a
    // one-row global skew summary (max/avg ratio in exact micro-units,
    // wide product through DECIMAL(38,0)/HUGEINT) broadcast onto every
    // output row. Nothing here touches more than O(distinct keys).
    "q_skew_profile" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cnts = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
      val stats = cnts.agg(
          count(lit(1)).as("n_keys"),
          sum(col("cnt")).as("n_rows"),
          max(col("cnt")).as("max_cnt"),
          min(col("cnt")).as("min_cnt"))
        .select(col("n_keys"), col("n_rows"), col("max_cnt"),
          col("min_cnt"),
          expr("CAST(CAST(max_cnt AS DECIMAL(38,0)) * n_keys * 1000000" +
            " DIV n_rows AS BIGINT)").as("skew_micro"))
      cnts.orderBy(col("cnt").desc, col("l_suppkey")).limit(10)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("cnt").desc, col("l_suppkey"))))
        .crossJoin(broadcast(stats))
        .select(col("rk"), col("l_suppkey"), col("cnt"), col("n_keys"),
          col("n_rows"), col("max_cnt"), col("min_cnt"), col("skew_micro"))
        .orderBy(col("rk"))
    }),

    // Flagship: TPC-H-Q1-style pricing summary (scan→filter→agg→sort).
    "q1_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsumRev(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // S3: min-per-group (the reference's earliest-study pruning).
    "q_min_per_group" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(
          min(col("o_orderdate")).cast(DateType).as("first_order_date"),
          max(col("o_orderdate")).cast(DateType).as("last_order_date"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_custkey"))
    }),

    // Exact + grouped distinct counts. Two count(DISTINCT) families
    // plus a plain count in ONE aggregate forces Catalyst's Expand —
    // every input row tripled before the shuffle (the
    // q_approx_count_distinct lesson, measured 4.4 s vs 1.3 s at
    // sf0.1; round 13: this query also sat 1.3–1.6× above its 100×
    // golden in every r12-tree run). Instead each family is its own
    // two-level aggregate — map-side partial dedup, then a 3-row count
    // — joined on the flag. The scan doubles (n_rows rides the orders
    // branch as Σ of the per-key counts), but each scan reads only its
    // pruned columns (disposition: plan_audit expects
    // scans=[lineitem x2]) and the shuffled bytes drop from 3×|rows|
    // to |distinct keys|: the right trade at any scale where shuffle,
    // not I/O, is the bottleneck.
    "q_count_distinct" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val orders = li
        .groupBy(col("l_returnflag"), col("l_orderkey"))
        .agg(count(lit(1)).as("_n"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_orders"), sum(col("_n")).as("n_rows"))
      val partSupp = li
        .groupBy(col("l_returnflag"), col("l_partkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("_n"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_part_supp"))
      orders.join(partSupp, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_orders"), col("n_part_supp"),
          col("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // HLL++ sketch, made oracle-checkable without faking sketch internals:
    // emit the EXACT count plus a boolean asserting the approximate count
    // is within the configured relative-error bound. The DuckDB twin
    // computes the same exact counts and a literal TRUE, so the hash gate
    // verifies the error bound itself (rsd=0.02 → assert within 5%).
    // Two-level distinct: map-side partial dedup on (flag, key) first,
    // then exact = count(*) and the HLL estimate over the already-
    // distinct keys (HLL of a set == HLL of its multiset). Mixing
    // count(DISTINCT) with a non-distinct aggregate would force
    // Catalyst's Expand (every row duplicated per aggregate family) —
    // measured 4.4 s vs 1.3 s at sf0.1 for this shape.
    "q_approx_count_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_orderkey")).agg(count(lit(1)).as("_n"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("exact_orders"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx"))
        .select(col("l_returnflag"), col("exact_orders"),
          (abs(col("approx") - col("exact_orders")).cast(DoubleType)
            / col("exact_orders").cast(DoubleType) <= 0.05).as("within_bound"))
        .orderBy(col("l_returnflag"))
    }),

    // EXACT distinct via bitmaps (Spark 4 bitmap_* aggregates): keys
    // bucket into 32k-bit bitmaps, per-bucket OR-aggregation, counts
    // summed — the high-performance exact-distinct pattern (the shuffle
    // carries fixed-size bitmaps, not keys; bucket count scales with
    // the KEY RANGE / 32k, not row count). Exact, so the twin is plain
    // COUNT(DISTINCT).
    "q_bitmap_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          expr("bitmap_bucket_number(l_orderkey)").as("bucket"),
          expr("bitmap_bit_position(l_orderkey)").as("pos"))
        .groupBy(col("l_returnflag"), col("bucket"))
        .agg(expr("bitmap_construct_agg(pos)").as("bm"))
        .groupBy(col("l_returnflag"))
        .agg(sum(expr("bitmap_count(bm)")).as("n_orders"))
        .orderBy(col("l_returnflag"))
    }),

    // Distributed SKETCH MERGE (Spark 4 DataSketches HLL): per-group
    // binary sketches unioned into one estimate — the two-level rollup
    // a 100 TB pipeline ships instead of raw values (sketches are a few
    // KB regardless of cardinality, and union is associative so partial
    // aggregation applies). Gated by the error-bound pattern: the exact
    // overall distinct comes from a separate exact aggregation (group
    // exacts cannot be summed — sets overlap); the twin computes the
    // same exacts plus literal true.
    "q_hll_union" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val perFlag = li.groupBy(col("l_returnflag"))
        .agg(expr("hll_sketch_agg(l_orderkey, 12)").as("sk"))
      val merged = perFlag.agg(
        count(lit(1)).as("n_groups"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      val overall = li.agg(countDistinct(col("l_orderkey")).as("exact_orders"))
      merged.crossJoin(overall)
        .select(col("n_groups"), col("exact_orders"),
          (abs(col("est") - col("exact_orders")).cast(DoubleType)
            / col("exact_orders").cast(DoubleType) <= 0.05).as("within_bound"))
    }),

    // Sketch ALGEBRA: set-intersection cardinality from HLL sketches by
    // inclusion–exclusion (|A∩B| = |A| + |B| − |A∪B|, the union being
    // the native mergeable op) — how overlap between two 100 TB key
    // populations is estimated without materializing either set. Gated
    // by the error-bound pattern: exact counts + a boolean asserting
    // the estimate lands within 10% of the UNION size (inclusion–
    // exclusion compounds the per-sketch error, so the bound is
    // against the larger denominator — the standard guarantee form).
    "q_hll_intersect" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val a = li.filter(col("l_returnflag") === "R").select(col("l_orderkey"))
      val b = li.filter(col("l_returnflag") === "A").select(col("l_orderkey"))
      val est = a.agg(expr("hll_sketch_agg(l_orderkey, 12)").as("ska"))
        .crossJoin(b.agg(expr("hll_sketch_agg(l_orderkey, 12)").as("skb")))
        .select(
          expr("hll_sketch_estimate(ska)").as("est_a"),
          expr("hll_sketch_estimate(skb)").as("est_b"),
          expr("hll_sketch_estimate(hll_union(ska, skb))").as("est_u"))
        .select((col("est_a") + col("est_b") - col("est_u")).as("est_i"),
          col("est_u"))
      val ex = a.intersect(b).agg(count(lit(1)).as("exact_i"))
        .crossJoin(a.union(b).distinct().agg(count(lit(1)).as("exact_u")))
      est.crossJoin(ex)
        .select(col("exact_i"), col("exact_u"),
          (abs(col("est_i") - col("exact_i")).cast(DoubleType)
            / col("exact_u").cast(DoubleType) <= 0.1).as("within_bound"))
    }),

    // Mergeable heavy-hitters sketch (Spark 4.1 approx_top_k two-phase
    // form): per-group ACCUMULATE → COMBINE → ESTIMATE — the
    // shard-then-merge layout every 100 TB frequency job uses. Gated
    // by the q_hll_union pattern: the hashed output is the EXACT
    // top-10 (deterministic total order) plus a boolean asserting the
    // sketch's estimate for each is within 5%; maxItemsTracked (16384)
    // exceeds the distinct-supplier count at every gate scale, so the
    // sketch is provably exact there and the bound must hold. The twin
    // emits the same exacts + literal true.
    "q_approx_top_k" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val est = li.groupBy(col("l_returnflag"))
        .agg(expr("approx_top_k_accumulate(l_suppkey, 16384)").as("acc"))
        .agg(expr("approx_top_k_estimate(approx_top_k_combine(acc, 16384), 16384)")
          .as("est"))
      val sketch = est.select(explode(col("est")).as("e"))
        .select(col("e.item").as("l_suppkey"), col("e.count").as("est_n"))
      val exact = li.groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("l_suppkey")).limit(10)
      exact.join(sketch, Seq("l_suppkey"), "left")
        .select(col("l_suppkey"), col("n"),
          (col("est_n").isNotNull &&
            abs(col("est_n") - col("n")).cast(DoubleType)
              / col("n").cast(DoubleType) <= lit(0.05)).as("within_bound"))
        .orderBy(col("n").desc, col("l_suppkey"))
    }),

    // Approximate percentile sketch, oracle-gated by the same
    // error-bound pattern as q_approx_count_distinct: emit the EXACT
    // median plus a boolean asserting the sketch value's RANK lies
    // within the declared error (accuracy=100 → rank ε=1/100; asserted
    // at a 0.05 margin). The rank of the approx value is its
    // (cnt_lt, cnt_le] interval — computed by a second pass over the
    // broadcast per-group sketch values, so the check is distributed
    // and the sketch's merge-order nondeterminism cannot leak into the
    // hashed output.
    "q_approx_quantile" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("c", round(col("o_totalprice") * 100))
      val stats = o.groupBy(col("o_orderpriority"))
        .agg(expr("approx_percentile(c, 0.5, 100)").as("am"))
      o.join(broadcast(stats), Seq("o_orderpriority"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          (percentile(col("c"), lit(0.5)) / 100.0).as("exact_median"),
          sum(when(col("c") <= col("am"), 1).otherwise(0)).as("cnt_le"),
          sum(when(col("c") < col("am"), 1).otherwise(0)).as("cnt_lt"))
        .select(col("o_orderpriority"), col("n"), col("exact_median"),
          (col("cnt_le").cast(DoubleType) >= lit(0.45) * col("n").cast(DoubleType) &&
            col("cnt_lt").cast(DoubleType) <= lit(0.55) * col("n").cast(DoubleType))
            .as("within_bound"))
        .orderBy(col("o_orderpriority"))
    }),

    // G1: group + ordered collect (serialized to string for a stable
    // oracle hash; DuckDB twin is string_agg ... ORDER BY).
    "q_collect_list" -> ((s, d) => {
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(
          array_join(array_sort(collect_list(col("c_name"))), "|").as("names"),
          count(lit(1)).as("n"))
        .orderBy(col("c_nationkey"))
    }),

    // Deterministic MODE: the built-in mode() returns an arbitrary
    // value under ties, so the most-frequent element is derived from
    // the count table with a total (count desc, value asc) order —
    // reproducible on any partitioning, and the twin ranks identically.
    "q_mode" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("o_orderstatus"))
        .agg(
          min_by(col("o_orderpriority"),
            struct((-col("n")).as("neg_n"), col("o_orderpriority"))).as("mode_priority"),
          max(col("n")).as("mode_n"))
        .orderBy(col("o_orderstatus"))
    }),

    // J2/J4: ordered first/last per group via max_by/min_by with a
    // composite (value, tiebreak) ordering — deterministic under ties.
    "q_max_by" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(
          max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("best_order"),
          min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("worst_order"),
          dsum(col("o_totalprice")).as("total_spent"))
        .orderBy(col("o_custkey"))
    }),

    // Rollup with grouping() indicators (NULL group rows made explicit).
    "q_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast(IntegerType).as("g_rf"),
          grouping(col("l_linestatus")).cast(IntegerType).as("g_ls"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    "q_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          dsum(col("o_totalprice")).as("sum_price"),
          count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).cast(IntegerType).as("g_st"),
          grouping(col("o_orderpriority")).cast(IntegerType).as("g_pr"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    }),

    // Explicit GROUPING SETS (Dataset.groupingSets, Spark 4.0+).
    "q_grouping_sets" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    // D4-pattern: conditional aggregation (sum/count over CASE).
    // Data-quality audit (the Deequ/expectation-suite shape): ONE
    // aggregation pass computes completeness (null counts), uniqueness
    // (count − count distinct on the key), and validity (range
    // violations) as a long-format metric table, plus one anti-join for
    // referential integrity — the audit every ingest runs before
    // publishing a partition. All metrics are exact BIGINTs. Scale:
    // the stats pass is a single map-side-combined aggregate over the
    // fact (count distinct on the key is the one shuffle); the orphan
    // check is a broadcast anti-join against the dimension's key set.
    "q_dq_audit" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val stats = o.agg(
        count(lit(1)).as("row_count"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
        (count(col("o_orderkey")) - countDistinct(col("o_orderkey")))
          .as("dup_orderkey"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("nonpos_price"),
        sum(when(year(col("o_orderdate")).between(1995, 2001), 0L).otherwise(1L))
          .as("date_out_of_range"))
      val metrics = stats.selectExpr(
        """stack(5,
          |  'date_out_of_range', date_out_of_range,
          |  'dup_orderkey', dup_orderkey,
          |  'nonpos_price', nonpos_price,
          |  'null_custkey', null_custkey,
          |  'row_count', row_count) AS (check_name, value)""".stripMargin)
      val orphans = o.filter(col("o_custkey").isNotNull)
        .join(Tables.customer(s, d)
          .select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("value"))
        .select(lit("orphan_custkey").as("check_name"), col("value"))
      metrics.unionByName(orphans).orderBy(col("check_name"))
    }),

    "q_conditional_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("l_returnflag") === "A", dec(col("l_quantity")))).cast(DoubleType).as("qty_a"),
          sum(when(col("l_returnflag") === "R", dec(col("l_quantity")))).cast(DoubleType).as("qty_r"),
          count(when(col("l_discount") > 0.05, lit(1))).as("n_discounted"))
        .orderBy(col("l_linestatus"))
    }),

    // listagg (SQL:2023, Spark 4): ordered within-group string
    // concatenation — deterministic because WITHIN GROUP fixes the order.
    "q_listagg" -> ((s, d) => {
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(
          expr("listagg(c_mktsegment, '|') WITHIN GROUP (ORDER BY c_mktsegment, c_custkey)")
            .as("segments"),
          count(lit(1)).as("n"))
        .select(col("c_nationkey"), substring(col("segments"), 1, 100).as("seg_prefix"),
          length(col("segments")).as("seg_len"), col("n"))
        .orderBy(col("c_nationkey"))
    }),

    // Pearson correlation + least-squares regression (qty vs price) per
    // group. Built-in corr()/regr_slope() are order-dependent double
    // folds — irreproducible across partitionings — so the moments
    // (n, Σx, Σy, Σxy, Σx², Σy²) are EXACT sums, and the closed forms
    // run in IEEE double with identical op order in the twin. Numeric
    // contract (same as q_zscore_outliers): INTEGER CENTS with scale-0
    // decimal sums — fractional-scale decimals would hit the
    // decimal→double multiply-by-inverse 1-ulp divergence once sums
    // exceed 2^53 ulps. corr/slope are scale-invariant; intercept is
    // rescaled at the end. One map-side-combined shuffle, O(groups).
    "q_correlation" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .withColumn("cq", round(col("l_quantity") * 100))
        .withColumn("cp", round(col("l_extendedprice") * 100))
      val m = li.groupBy(col("l_returnflag")).agg(
        count(lit(1)).cast(DoubleType).as("n"),
        sum(col("cq").cast(DecimalType(38, 0))).cast(DoubleType).as("sx"),
        sum(col("cp").cast(DecimalType(38, 0))).cast(DoubleType).as("sy"),
        sum((col("cq") * col("cp")).cast(DecimalType(38, 0))).cast(DoubleType).as("sxy"),
        sum((col("cq") * col("cq")).cast(DecimalType(38, 0))).cast(DoubleType).as("sxx"),
        sum((col("cp") * col("cp")).cast(DecimalType(38, 0))).cast(DoubleType).as("syy"))
      m.withColumn("cov_n", col("n") * col("sxy") - col("sx") * col("sy"))
        .withColumn("var_x", col("n") * col("sxx") - col("sx") * col("sx"))
        .withColumn("var_y", col("n") * col("syy") - col("sy") * col("sy"))
        .select(col("l_returnflag"), col("n").cast(LongType).as("n_rows"),
          (col("cov_n") / sqrt(col("var_x") * col("var_y"))).as("corr_qty_price"),
          (col("cov_n") / col("var_x")).as("slope"),
          // intercept back to dollars: moments are in cents
          ((col("sy") - col("cov_n") / col("var_x") * col("sx")) / col("n") / 100.0)
            .as("intercept"))
        .orderBy(col("l_returnflag"))
    }),

    // Welch's two-sample t-test (order value, BUILDING vs MACHINERY
    // segments) — the q_correlation parity contract: per-group moments
    // are EXACT (integer cents summed through DECIMAL(38,0)/HUGEINT),
    // and the t statistic + Welch–Satterthwaite df are one IEEE-double
    // closed form over the 1-row moments frame with the identical
    // operation tree in the twin (explicit se1/se2/sesum stages pin the
    // association order; x*x instead of pow). Scale: one broadcast dim
    // join + one map-side-combined moment aggregate; everything after
    // is a 2-row frame.
    "q_t_test" -> ((s, d) => {
      val j = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_mktsegment").as("seg"),
          round(col("o_totalprice") * 100).cast(LongType).as("c"))
      val m = j.groupBy(col("seg")).agg(
        count(lit(1)).as("n"),
        sum(col("c").cast(DecimalType(38, 0))).cast(DoubleType).as("sx"),
        sum((col("c") * col("c")).cast(DecimalType(38, 0)))
          .cast(DoubleType).as("sxx"))
      val a = m.filter(col("seg") === "BUILDING")
        .select(col("n").as("n1"), col("sx").as("sx1"), col("sxx").as("sxx1"))
      val b = m.filter(col("seg") === "MACHINERY")
        .select(col("n").as("n2"), col("sx").as("sx2"), col("sxx").as("sxx2"))
      a.crossJoin(broadcast(b))
        .withColumn("m1", col("sx1") / col("n1").cast(DoubleType))
        .withColumn("m2", col("sx2") / col("n2").cast(DoubleType))
        .withColumn("v1",
          (col("sxx1") - col("sx1") * col("sx1") / col("n1").cast(DoubleType))
            / (col("n1").cast(DoubleType) - 1.0))
        .withColumn("v2",
          (col("sxx2") - col("sx2") * col("sx2") / col("n2").cast(DoubleType))
            / (col("n2").cast(DoubleType) - 1.0))
        .withColumn("se1", col("v1") / col("n1").cast(DoubleType))
        .withColumn("se2", col("v2") / col("n2").cast(DoubleType))
        .withColumn("sesum", col("se1") + col("se2"))
        .select(col("n1"), col("n2"),
          (col("m1") / 100.0).as("mean1_dollars"),
          (col("m2") / 100.0).as("mean2_dollars"),
          ((col("m1") - col("m2")) / sqrt(col("sesum"))).as("t_stat"),
          ((col("sesum") * col("sesum")) /
            (col("se1") * col("se1") / (col("n1").cast(DoubleType) - 1.0) +
             col("se2") * col("se2") / (col("n2").cast(DoubleType) - 1.0)))
            .as("welch_df"))
    }),

    // Fixed-width histogram of order value: width_bucket over exact
    // integer cents (bucket edges exact in double, so the floor cannot
    // ride a rounding error). DuckDB has no width_bucket — the twin
    // emulates the same div-by-width floor on the same integers.
    "q_histogram" -> ((s, d) => {
      Tables.orders(s, d)
        .select(width_bucket(round(col("o_totalprice") * 100), lit(0),
          lit(60000000), lit(12)).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("bucket"))
    }),

    // Statistical outlier detection: per-group mean/std from EXACT
    // decimal sums (a built-in stddev is a partial-aggregation-order-
    // dependent double fold — not reproducible), then z-scores per row
    // via a broadcast of the tiny stats table, flag counts + the most
    // extreme row per group. Two shuffles on the group key; the stats
    // join is broadcast so the fact table is scanned once more, map-only.
    "q_zscore_outliers" -> ((s, d) => {
      // Numeric contract: everything runs on INTEGER CENTS with scale-0
      // decimal sums. Why not dsum(price²): the raw units exceed 2^53,
      // where DuckDB's decimal→double (int128→double, then /10^scale)
      // double-rounds vs Spark's single rounding; and any fractional
      // quantization of DERIVED doubles hits the half-up(shortest-string)
      // vs round(exact-value) cast divergence. With integral values and
      // scale 0, both engines round the same exact integer once —
      // bit-identical. c and c² are exact integral doubles (< 2^53), so
      // the decimal casts are lossless.
      val o = Tables.orders(s, d)
        .withColumn("c", round(col("o_totalprice") * 100))
      val stats = o.groupBy(col("o_orderpriority")).agg(
        count(lit(1)).as("n"),
        sum(col("c").cast(DecimalType(38, 0))).cast(DoubleType).as("s1"),
        sum((col("c") * col("c")).cast(DecimalType(38, 0))).cast(DoubleType).as("s2"))
        .withColumn("mean_c", col("s1") / col("n").cast(DoubleType))
        // Degenerate-group guards (single-row → 0/0, zero-variance → x/0):
        // Spark returns NULL on double 0/0 but DuckDB's IEEE default gives
        // nan/inf, so NULL the std explicitly here and with NULLIF-style
        // CASEs in the twin — identical on any data, not just TPC-H shapes.
        .withColumn("std_c",
          when(col("n") > 1,
            sqrt((col("s2") - col("s1") * col("s1") / col("n").cast(DoubleType))
              / (col("n") - 1).cast(DoubleType))))
      // z rounded at 1e-6 (the cosine-output precedent): at 10× the
      // Σc² decimal→double conversion crosses 2^53 and the variance
      // CANCELLATION amplifies its 1-ulp engine difference to ~5 ulps
      // in z — rounding far above that grain restores bit parity
      // without touching the exact decimal-routed stats themselves.
      val z = o.join(broadcast(stats), Seq("o_orderpriority"))
        .withColumn("z",
          when(col("std_c").isNotNull && col("std_c") =!= 0.0,
            round((col("c") - col("mean_c")) / col("std_c"), 6)))
      z.groupBy(col("o_orderpriority"), col("n"), col("mean_c"), col("std_c"))
        .agg(
          count(when(abs(col("z")) > 1.5, lit(1))).as("n_beyond_1_5"),
          // NULL ordering key for NULL z → max_by skips the row, so a fully
          // degenerate group yields NULL (mirrored by the twin's rn filter).
          max_by(col("o_orderkey"),
            when(col("z").isNotNull, struct(abs(col("z")), -col("o_orderkey"))))
            .as("extreme_orderkey"),
          max(abs(col("z"))).as("max_abs_z"))
        .select(col("o_orderpriority"), col("n"),
          round(col("mean_c") / 100.0, 6).as("mean_price"),
          round(col("std_c") / 100.0, 6).as("std_price"),
          col("n_beyond_1_5"), col("extreme_orderkey"), col("max_abs_z"))
        .orderBy(col("o_orderpriority"))
    }),

    // Equi-depth (quantile) histogram — the optimizer-stats shape. A
    // global ntile over raw rows would be a single-partition sort of
    // the whole table; instead the price is coarsened to integer
    // dollars (a VALUE-DOMAIN bounded by the price range, not the row
    // count — same re-shape as q_window_range_agg), the window runs
    // over that small domain, and rows sharing a grid cell stay in one
    // bucket. Depths are equal up to grid-tie granularity,
    // deterministically. All integer arithmetic. The cumsum runs
    // through [[QueryUtil.rangeCumsum]] (two-pass, range-partitioned
    // on 16384-dollar buckets) and the total through a 1-row broadcast
    // — no single-task window anywhere, same re-shape as the drift
    // family (q_ks_test/q_rank_sum/q_gini_split).
    "q_equidepth_hist" -> ((s, d) => {
      // localCheckpoint: bounded dollar domain, 4 references (3 in
      // rangeCumsum + the total) — same treatment and A/B as
      // q_weighted_median (ScanAudit round 10: orders x4 → x1).
      val dom = Tables.orders(s, d)
        .groupBy(floor(col("o_totalprice")).cast(LongType).as("price_d"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val tot = dom.agg(sum(col("cnt")).as("total"))
      rangeCumsum(dom, "price_d", Seq("cnt"), 1L << 14)
        .crossJoin(broadcast(tot))
        .withColumn("bucket", expr("((cum_cnt - 1) * 10) DIV total"))
        .groupBy(col("bucket"))
        .agg(sum(col("cnt")).as("n"),
          min(col("price_d")).as("lo_dollars"),
          max(col("price_d")).as("hi_dollars"))
        .orderBy(col("bucket"))
    }),

    // Market-basket association rules over order baskets: for part
    // pairs co-purchased in one order, support count, both conditional
    // confidences, and lift — all in exact micro-units (integer DIV;
    // the lift product n_ab·n_orders·1e6 routes through
    // DECIMAL(38,0)/HUGEINT since it brushes ~1e24 at 100 TB, and the
    // confidences ride the same route for uniformity). Scale shape:
    // the within-order self-join is keyed on l_orderkey and a TPC-H
    // basket holds ≤7 parts, so pairs ∝ rows·basket² with no cap
    // needed; supports join keyed on part; the 1-row order count is a
    // broadcast. Top-100 under a total order (support desc, pa, pb).
    "q_basket_rules" -> ((s, d) => {
      // materialized once (localCheckpoint, the graph-family pattern):
      // the basket frame feeds four consumers — both pair-join sides,
      // the supports, and the order count — and would otherwise
      // re-derive its distinct per consumer in the static plan.
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
        .localCheckpoint()
      val supp = items.groupBy(col("pk")).agg(count(lit(1)).as("n_one"))
      val nOrders = items.select(col("ok")).distinct()
        .agg(count(lit(1)).as("n_orders"))
      // top-100 CUT BEFORE the support joins: the ranking key (n_ab)
      // needs no support data, so the cut happens on the pair frame
      // (TakeOrderedAndProject — partial top-k per partition, no full
      // sort shuffle) and the confidence/lift joins touch a 100-row
      // broadcast side instead of re-shuffling the whole pair frame by
      // pa and again by pb. Identical rows to cutting last.
      val co = items.select(col("ok"), col("pk").as("pa"))
        .join(items.select(col("ok"), col("pk").as("pb")), Seq("ok"))
        .filter(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n_ab"))
        .orderBy(col("n_ab").desc, col("pa"), col("pb"))
        .limit(100)
      broadcast(broadcast(co)
        .join(supp.select(col("pk").as("pa"), col("n_one").as("n_a")), Seq("pa")))
        .join(supp.select(col("pk").as("pb"), col("n_one").as("n_b")), Seq("pb"))
        .crossJoin(broadcast(nOrders))
        .select(col("pa"), col("pb"), col("n_ab"), col("n_a"), col("n_b"),
          expr("CAST(CAST(n_ab AS DECIMAL(38,0)) * 1000000" +
            " DIV CAST(n_a AS DECIMAL(38,0)) AS BIGINT)").as("conf_ab_micro"),
          expr("CAST(CAST(n_ab AS DECIMAL(38,0)) * 1000000" +
            " DIV CAST(n_b AS DECIMAL(38,0)) AS BIGINT)").as("conf_ba_micro"),
          expr("CAST(CAST(n_ab AS DECIMAL(38,0)) * n_orders * 1000000" +
            " DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("lift_micro"))
        .orderBy(col("n_ab").desc, col("pa"), col("pb"))
        .limit(100)
    }),

    // Order-independent whole-table fingerprint: one map-side pass
    // computes a canonical per-row hash (integer/string/date fields
    // only — float columns go through exact cents so no float
    // formatting crosses engines) and exact commutative reductions
    // (split-half sums so no intermediate overflows BIGINT below 2^33
    // rows, min/max, count). Two runs — different partitioning,
    // different cluster, different engine — must agree bit-for-bit:
    // the cheap migration/replication parity check a 100 TB copy job
    // ends with. Embarrassingly parallel, shuffle carries one row per
    // partition.
    "q_table_digest" -> ((s, d) => {
      val canon = concat_ws("|",
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast(LongType),
        col("o_orderdate").cast(DateType).cast(StringType),
        col("o_orderpriority"))
      val h = TextQueries.phash(canon, 7)
      Tables.orders(s, d)
        .select(h.as("h"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("h") % 1073741824L).as("hash_lo_sum"),
          sum(expr("h DIV 1073741824")).as("hash_hi_sum"),
          min(col("h")).as("hash_min"),
          max(col("h")).as("hash_max"))
    }),

    // Robust outlier detection via MEDIAN ABSOLUTE DEVIATION — the
    // heavy-tail-safe twin of q_zscore_outliers (mean/stddev are
    // dragged by the outliers they're meant to find; the median pair
    // has a 50% breakdown point). Round 14 re-shape (verdict item 4):
    // the old form ran `median()` over RAW ROWS twice — Spark's exact
    // Percentile collects every group value into one final-merge task,
    // so a 3-flag column means 3 endless tasks whose state grows with
    // the data (measured core-insensitive: 3.0 s at both 8 and 32
    // cores). Both medians now run WITH THE FREQUENCY ARGUMENT over a
    // (flag, value) HISTOGRAM: `percentile(v, 0.5, cnt)` is the same
    // Percentile buffer keyed by distinct values, so the result is
    // bit-identical by construction (HistPercentileSpec pins it) —
    // but per-group state is bounded by the VALUE DOMAIN (extendedprice
    // = 2-decimal quantity×partprice grid), not the row count, and the
    // one O(rows) pass left is the parallel map-combined histogram.
    // lineitem is scanned ONCE (was 3×); the deviation frame derives
    // map-side from the checkpointed histogram.
    "q_mad_outliers" -> ((s, d) => {
      // localCheckpoint: hist feeds 4 downstream subtrees (med, the
      // dev frame under mad and under the final agg) — without the
      // barrier Catalyst re-plans scan+aggregate per reference
      // (measured 5.6 s vs ~2 s at sf0.1/32c).
      val hist = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val med = hist.groupBy(col("l_returnflag"))
        .agg(percentile(col("l_extendedprice"), lit(0.5), col("cnt"))
          .as("med"))
      val dev = hist.join(broadcast(med), Seq("l_returnflag"))
        .withColumn("adev", abs(col("l_extendedprice") - col("med")))
      val mads = dev.groupBy(col("l_returnflag"))
        .agg(percentile(col("adev"), lit(0.5), col("cnt")).as("mad"))
      dev.join(broadcast(mads), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
          sum(col("cnt")).as("n"),
          sum(when(col("adev") > lit(3.0) * col("mad"), col("cnt"))
            .otherwise(0L)).as("n_outliers"))
        .orderBy(col("l_returnflag"))
    }),

    // Winsorized aggregate: clamp each value into its group's
    // [p05, p95] before summing — the standard tail-taming step before
    // training-weight or revenue statistics. Round 14 re-shape (same
    // rows-in-one-task exact-Percentile liability as q_mad_outliers):
    // both bounds come off the (flag, value) histogram via
    // frequency-weighted `percentile(v, p, cnt)` (bit-identical buffer,
    // domain-bounded per-group state), and the clamped sum/counters
    // fold the histogram weights — sum(dec(w)·cnt) is decimal-exact,
    // so it equals the per-row sum(dec(w)) bit-for-bit; ONE lineitem
    // scan (was 2), no per-group value collection anywhere.
    "q_winsorize" -> ((s, d) => {
      // localCheckpoint for the same subtree-replication reason as
      // q_mad_outliers above.
      val hist = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val pct = hist.groupBy(col("l_returnflag")).agg(
        percentile(col("l_extendedprice"), lit(0.05), col("cnt")).as("p05"),
        percentile(col("l_extendedprice"), lit(0.95), col("cnt")).as("p95"))
      hist.join(broadcast(pct), Seq("l_returnflag"))
        .withColumn("w",
          least(greatest(col("l_extendedprice"), col("p05")), col("p95")))
        .groupBy(col("l_returnflag"))
        .agg(max(col("p05")).as("p05"), max(col("p95")).as("p95"),
          sum(col("cnt")).as("n"),
          sum(when(col("l_extendedprice") < col("p05"), col("cnt"))
            .otherwise(0L)).as("n_low"),
          sum(when(col("l_extendedprice") > col("p95"), col("cnt"))
            .otherwise(0L)).as("n_high"),
          sum(dec(col("w")) * col("cnt")).cast(DoubleType).as("winsor_sum"))
        .orderBy(col("l_returnflag"))
    }),

    // Two-sample Kolmogorov–Smirnov statistic: distribution-drift
    // detection between the order-value distributions of two customer
    // segments — the standard gate before trusting a new data slice
    // (or a re-trained sampler) against a reference population. The
    // statistic stays EXACT RATIONAL end to end: values are integer
    // cents, the ECDF difference at value v is |CA(v)·n2 − CB(v)·n1| /
    // (n1·n2), and only the BIGINT numerator is maximized; the reported
    // ks_micro floor-divides once at the end (same DIV-vs-// contract as
    // q_pagerank). sqrt-based significance thresholds are left to the
    // caller (no transcendentals in gated outputs).
    //
    // Scale shape (100 TB): one broadcast join tags orders with their
    // segment, one (value)-keyed hash aggregate with map-side combine,
    // then a TWO-PASS range-partitioned cumsum ([[QueryUtil.rangeCumsum]])
    // over the distinct cent values — bucket-partitioned within-bucket
    // windows plus broadcast per-bucket offsets, so no single-task
    // global sort remains even at tens of millions of distinct cents.
    // The final ·1e6 micro-scaling routes through DECIMAL(38,0)/HUGEINT
    // (it overflows BIGINT already at ~3e6 rows per side); the max'd
    // numerator itself is bounded by n1·n2, so BIGINT holds it to ~3e9
    // rows per side — beyond that route the numerator wide too.
    "q_ks_test" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_custkey"),
          round(col("o_totalprice") * 100).cast(LongType).as("v"))
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      val j = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("v"),
          when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L).as("a"))
      // localCheckpoint + totals-from-the-rollup: perV is bounded by
      // the distinct-cent domain and feeds rangeCumsum 3× plus the
      // totals (n1 = Σca, n2 = Σcb exactly) — one fact scan total
      // (ScanAudit round 10: orders x4 → x1, same A/B as the family).
      val perV = j.groupBy(col("v")).agg(
        sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
        .localCheckpoint()
      val cum = rangeCumsum(perV, "v", Seq("ca", "cb"), 1L << 20)
        .select(col("v"), col("cum_ca").as("cua"), col("cum_cb").as("cub"))
      val tot = perV.agg(sum(col("ca")).as("n1"), sum(col("cb")).as("n2"))
      cum.crossJoin(broadcast(tot))
        .groupBy(col("n1"), col("n2"))
        .agg(max(abs(col("cua") * col("n2") - col("cub") * col("n1")))
          .as("ks_num"))
        .select(col("n1"), col("n2"), col("ks_num"),
          expr("CAST(CAST(ks_num AS DECIMAL(38,0)) * 1000000" +
            " DIV (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)").as("ks_micro"))
        .orderBy(col("n1"))
    }),

    // Mann–Whitney U rank-sum test on the same two-segment split as
    // q_ks_test — the nonparametric "did the location shift?" gate that
    // completes the drift family (KS = shape, chi-square = categorical
    // mix, U = location). Tie-averaged ranks are half-integers, so the
    // whole statistic is carried as DOUBLED ranks and stays BIGINT: for
    // a tie group of cnt values after cprev earlier values, the doubled
    // average rank is 2·cprev + cnt + 1, R2 = Σ ca·that, and
    // u2_a = R2 − n1·(n1+1) (doubled U); u2_a + u2_b = 2·n1·n2 exactly.
    // Same scale shape as q_ks_test: one broadcast-tagged scan, one
    // per-cent-value hash aggregate, then the two-pass range-partitioned
    // cumsum ([[QueryUtil.rangeCumsum]]) over the bounded distinct-cent
    // domain — no single-task window. At >1e9 rows per side route R2
    // through DECIMAL(38,0).
    "q_rank_sum" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_custkey"),
          round(col("o_totalprice") * 100).cast(LongType).as("v"))
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      val j = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("v"),
          when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L).as("a"))
      // Same one-scan treatment as q_ks_test: checkpoint the bounded
      // per-cent frame, totals from its rollup (n1 = Σca, n2 = Σ(cnt−ca)).
      val perV = j.groupBy(col("v")).agg(
        sum(col("a")).as("ca"), count(lit(1)).as("cnt"))
        .localCheckpoint()
      val ranked = rangeCumsum(perV, "v", Seq("cnt"), 1L << 20)
        .withColumn("dr",
          lit(2L) * (col("cum_cnt") - col("cnt")) + col("cnt") + 1L)
      val tot = perV.agg(sum(col("ca")).as("n1"),
        sum(col("cnt") - col("ca")).as("n2"))
      ranked.crossJoin(broadcast(tot))
        .groupBy(col("n1"), col("n2"))
        .agg(sum(col("ca") * col("dr")).as("r2_sum_a"))
        .select(col("n1"), col("n2"), col("r2_sum_a"),
          (col("r2_sum_a") - col("n1") * (col("n1") + 1L)).as("u2_a"),
          (lit(2L) * col("n1") * col("n2") -
            (col("r2_sum_a") - col("n1") * (col("n1") + 1L))).as("u2_b"))
        .orderBy(col("n1"))
    }),

    // Best Gini split — the decision-tree / feature-importance
    // primitive: score EVERY distinct order-value threshold for how
    // well it separates high-priority orders, and return the argmin
    // weighted child impurity. The same two-pass distinct-cent cumsum
    // as q_ks_test yields (n_left, pos_left) for every candidate in one
    // pass; per child the n-scaled Gini is (n² − pos² − neg²)·1e6 // n
    // (= n·gini in micro-units — EXACT integers, wide products through
    // DECIMAL(38,0)/HUGEINT like q_chi_square since n²·1e6 brushes the
    // BIGINT ceiling at the 100× bench already), children summed, argmin
    // tie-broken by smallest threshold. Root impurity rides along in the
    // same units, so gain = root − best is directly readable.
    //
    // Scale shape (100 TB): one map-side-combined aggregate to the
    // distinct-cent frame, the range-partitioned cumsum
    // ([[QueryUtil.rangeCumsum]]), then the argmin as a lexicographic
    // min(struct(score, v, …)) AGGREGATE — map-side-combinable, no
    // global row_number sort. The fact scan is touched once; no
    // per-threshold re-scan (the naive split scorer re-scans per
    // candidate), and no unpartitioned window anywhere in the plan.
    "q_gini_split" -> ((s, d) => {
      val o = Tables.orders(s, d).select(
        round(col("o_totalprice") * 100).cast(LongType).as("v"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("pos"))
      // Same one-scan treatment as q_ks_test: checkpoint the bounded
      // per-cent frame, totals from its rollup (n = Σcnt, ptot = Σp).
      val perV = o.groupBy(col("v"))
        .agg(sum(col("pos")).as("p"), count(lit(1)).as("cnt"))
        .localCheckpoint()
      val cum = rangeCumsum(perV, "v", Seq("p", "cnt"), 1L << 20)
        .select(col("v"), col("cum_p").as("pl"), col("cum_cnt").as("nl"))
      val tot = perV.agg(sum(col("cnt")).as("n"), sum(col("p")).as("ptot"))
      def nGiniMicro(n: String, p: String): String =
        s"CAST((CAST($n AS DECIMAL(38,0)) * $n - CAST($p AS DECIMAL(38,0)) * $p" +
          s" - CAST($n - $p AS DECIMAL(38,0)) * ($n - $p)) * 1000000 DIV $n AS BIGINT)"
      val scored = cum.crossJoin(broadcast(tot))
        .filter(col("nl") < col("n")) // right child non-empty
        .withColumn("nr", col("n") - col("nl"))
        .withColumn("pr", col("ptot") - col("pl"))
        .withColumn("wgini_micro",
          expr(s"${nGiniMicro("nl", "pl")} + ${nGiniMicro("nr", "pr")}"))
        .withColumn("wgini_root_micro", expr(nGiniMicro("n", "ptot")))
      scored
        .agg(min(struct(col("wgini_micro"), col("v"), col("nl"), col("nr"),
          col("pl"), col("pr"), col("wgini_root_micro"))).as("b"))
        .select(col("b.v").as("threshold_cents"),
          col("b.nl").as("n_left"), col("b.nr").as("n_right"),
          col("b.pl").as("pos_left"), col("b.pr").as("pos_right"),
          col("b.wgini_micro"), col("b.wgini_root_micro"))
        .orderBy(col("threshold_cents"))
    }),

    // Chi-square test of independence between customer segment and
    // order priority — the categorical counterpart of q_ks_test's drift
    // gate (is the mix of one dimension stable across another?). The
    // statistic is Σ (O−E)²/E over the contingency table; every term is
    // computed in EXACT integer arithmetic: dnum = O·N − rt·ct (the
    // (O−E) numerator scaled by N), and term_centi floor-divides
    // dnum²·100 by N·rt·ct once per cell — the products route through
    // DECIMAL(38,0) (HUGEINT in the twin) because dnum² overflows BIGINT
    // already at the 10× replica. Per-cell flooring bounds the error of
    // chi2_centi at #cells·0.01 — negligible against any critical value,
    // and bit-identical across engines (DIV truncation == // flooring on
    // non-negative operands).
    //
    // Scale shape (100 TB): the contingency table is #segments×#priorities
    // rows after ONE map-side-combined shuffle of the broadcast-tagged
    // fact scan; margins and the statistic are computed on those ~25 rows
    // (broadcast joins + a window over the tiny frame). The heavy input
    // is touched exactly once.
    "q_chi_square" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val j = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"), col("o_orderpriority").as("prio"))
      val cells = j.groupBy(col("seg"), col("prio"))
        .agg(count(lit(1)).as("n_obs"))
      val rt = cells.groupBy(col("seg")).agg(sum(col("n_obs")).as("rt"))
      val ct = cells.groupBy(col("prio")).agg(sum(col("n_obs")).as("ct"))
      val tot = cells.agg(sum(col("n_obs")).as("n"))
      cells
        .join(broadcast(rt), Seq("seg"))
        .join(broadcast(ct), Seq("prio"))
        .crossJoin(broadcast(tot))
        .withColumn("dnum", col("n_obs") * col("n") - col("rt") * col("ct"))
        .withColumn("exp_micro",
          expr("CAST(CAST(rt AS DECIMAL(38,0)) * ct * 1000000 DIV n AS BIGINT)"))
        .withColumn("term_centi",
          expr("CAST(CAST(dnum AS DECIMAL(38,0)) * dnum * 100" +
            " DIV (CAST(n AS DECIMAL(38,0)) * rt * ct) AS BIGINT)"))
        .withColumn("chi2_centi",
          sum(col("term_centi")).over(Window.partitionBy()))
        .select(col("seg"), col("prio"), col("n_obs"), col("exp_micro"),
          col("term_centi"), col("chi2_centi"))
        .orderBy(col("seg"), col("prio"))
    }),

    // Functional-dependency audit — profile how close candidate A → B
    // dependencies are to holding: for each FD, count lhs keys, keys
    // with more than one distinct rhs (violations), the worst per-key
    // rhs variety, and the violation rate in ppm. The relational-theory
    // face of data quality (discovering near-keys before declaring
    // constraints). Shape per FD: one two-level hash aggregate keyed on
    // the lhs (map-side partials, no shuffle beyond the lhs key), then
    // a 4-way union of 1-row summaries — at 100 TB each FD is one
    // aggregation pass and the union is free.
    "q_fd_violations" -> ((s, d) => {
      def audit(df: DataFrame, fd: String, lhs: String, rhs: String) =
        df.groupBy(col(lhs))
          .agg(countDistinct(col(rhs)).as("n_rhs"))
          .agg(count(lit(1)).as("n_lhs"),
            sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("n_violating"),
            max(col("n_rhs")).as("max_rhs_variants"))
          .select(lit(fd).as("fd"), col("n_lhs"), col("n_violating"),
            col("max_rhs_variants"),
            expr("n_violating * 1000000 DIV n_lhs").as("violation_ppm"))
      audit(Tables.lineitem(s, d), "l_partkey->l_suppkey",
          "l_partkey", "l_suppkey")
        .unionAll(audit(Tables.lineitem(s, d), "l_orderkey->l_returnflag",
          "l_orderkey", "l_returnflag"))
        .unionAll(audit(Tables.orders(s, d), "o_custkey->o_orderpriority",
          "o_custkey", "o_orderpriority"))
        .unionAll(audit(Tables.customer(s, d), "c_nationkey->c_mktsegment",
          "c_nationkey", "c_mktsegment"))
        .orderBy(col("fd"))
    }),

    // Kendall tau-b rank correlation between two per-nation metrics
    // (total customer balance cents vs customer count): exact concordant /
    // discordant / tie counts from the C(25,2) pairs of the AGGREGATED
    // frame — the pair join is dimension-bound (nations), the same
    // named tiny-frame class as the cohort matrix; the raw table is
    // touched by exactly one keyed aggregate. tau_micro rounds
    // (nc−nd)·10⁶ / √((n0−tx)(n0−ty)): integer operands, one
    // correctly-rounded IEEE sqrt and divide — bit-identical in both
    // engines (the q_item_cosine precedent).
    "q_kendall_tau" -> ((s, d) => {
      val m = Tables.customer(s, d).groupBy(col("c_nationkey"))
        .agg(expr("CAST(sum(round(c_acctbal * 100)) AS BIGINT)").as("x"),
          count(lit(1)).as("y"))
      val a = m.select(col("c_nationkey").as("ka"), col("x").as("xa"),
        col("y").as("ya"))
      val b = m.select(col("c_nationkey").as("kb"), col("x").as("xb"),
        col("y").as("yb"))
      val pairs = a.join(broadcast(b), col("ka") < col("kb"))
        .select(
          (signum(col("xa") - col("xb")) * signum(col("ya") - col("yb")))
            .cast("long").as("sgn"),
          when(col("xa") === col("xb"), 1L).otherwise(0L).as("tx"),
          when(col("ya") === col("yb"), 1L).otherwise(0L).as("ty"))
      pairs.agg(
          count(lit(1)).as("n0"),
          sum(when(col("sgn") === 1, 1L).otherwise(0L)).as("nc"),
          sum(when(col("sgn") === -1, 1L).otherwise(0L)).as("nd"),
          sum(col("tx")).as("ties_x"),
          sum(col("ty")).as("ties_y"))
        .select(col("n0"), col("nc"), col("nd"), col("ties_x"), col("ties_y"),
          round((col("nc") - col("nd")).cast("double") * 1000000.0
            / sqrt(((col("n0") - col("ties_x"))
              * (col("n0") - col("ties_y"))).cast("double")))
            .cast("long").as("tau_micro"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_group_p90" ->
      """WITH pc AS (
        |  SELECT l_returnflag AS grp,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    COUNT(*) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS (
        |  SELECT grp, cents,
        |    CAST(SUM(w) OVER (PARTITION BY grp ORDER BY cents) AS BIGINT) AS cw
        |  FROM pc),
        |tot AS (
        |  SELECT grp, CAST(SUM(w) AS BIGINT) AS n_rows,
        |    (9 * CAST(SUM(w) AS BIGINT) + 9) // 10 AS thresh
        |  FROM pc GROUP BY 1)
        |SELECT t.grp, t.n_rows, MIN(c.cents) AS p90_cents
        |FROM cum c JOIN tot t USING (grp)
        |WHERE c.cw >= t.thresh
        |GROUP BY t.grp, t.n_rows ORDER BY t.grp""".stripMargin,

    "q_benford_deviation" ->
      """WITH d AS (
        |  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |  FROM orders),
        |g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g)
        |SELECT g.digit, g.n,
        |  g.n * 1000 // t.total AS permille,
        |  CAST(CASE g.digit WHEN 1 THEN 301 WHEN 2 THEN 176 WHEN 3 THEN 125
        |    WHEN 4 THEN 97 WHEN 5 THEN 79 WHEN 6 THEN 67 WHEN 7 THEN 58
        |    WHEN 8 THEN 51 ELSE 46 END AS INTEGER) AS benford_permille,
        |  abs(g.n * 1000 // t.total - CASE g.digit WHEN 1 THEN 301
        |    WHEN 2 THEN 176 WHEN 3 THEN 125 WHEN 4 THEN 97 WHEN 5 THEN 79
        |    WHEN 6 THEN 67 WHEN 7 THEN 58 WHEN 8 THEN 51 ELSE 46 END)
        |    AS dev_permille
        |FROM g, t ORDER BY g.digit""".stripMargin,

    "q_rfm_segments" ->
      """WITH per AS (
        |  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_date,
        |    COUNT(*) AS freq,
        |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |wm AS (SELECT MAX(last_date) AS wm_date FROM per),
        |t AS (
        |  SELECT p.*, date_diff('day', p.last_date, w.wm_date) AS rec_days
        |  FROM per p, wm w),
        |s AS (
        |  SELECT
        |    CASE WHEN rec_days <= 180 THEN 4 WHEN rec_days <= 365 THEN 3
        |         WHEN rec_days <= 730 THEN 2 ELSE 1 END AS r_tier,
        |    CASE WHEN freq >= 20 THEN 4 WHEN freq >= 15 THEN 3
        |         WHEN freq >= 10 THEN 2 ELSE 1 END AS f_tier,
        |    CASE WHEN cents >= 300000000 THEN 4 WHEN cents >= 200000000 THEN 3
        |         WHEN cents >= 100000000 THEN 2 ELSE 1 END AS m_tier,
        |    cents
        |  FROM t)
        |SELECT r_tier, f_tier, m_tier, COUNT(*) AS n_customers,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_new_vs_returning" ->
      """WITH f AS (
        |  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS first_date
        |  FROM orders GROUP BY 1)
        |SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
        |  CAST(SUM(CASE WHEN CAST(o.o_orderdate AS DATE) = f.first_date
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(SUM(CASE WHEN CAST(o.o_orderdate AS DATE) = f.first_date
        |    THEN 0 ELSE 1 END) AS BIGINT) AS n_returning,
        |  CAST(SUM(CASE WHEN CAST(o.o_orderdate AS DATE) = f.first_date
        |    THEN CAST(round(o.o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS new_cents,
        |  CAST(SUM(CASE WHEN CAST(o.o_orderdate AS DATE) = f.first_date
        |    THEN 0 ELSE CAST(round(o.o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS ret_cents
        |FROM orders o JOIN f ON o.o_custkey = f.o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_autocorr" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |pairs AS (
        |  SELECT x, lead(x) OVER (ORDER BY day) AS y FROM daily),
        |p AS (SELECT * FROM pairs WHERE y IS NOT NULL),
        |m AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS DOUBLE) AS syy
        |  FROM p)
        |SELECT CAST(n AS BIGINT) AS n_pairs,
        |  (n * sxy - sx * sy) /
        |    sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS autocorr_lag1
        |FROM m""".stripMargin,

    "q_dow_anomaly" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |    CAST(isodow(CAST(o_orderdate AS DATE)) - 1 AS INTEGER) AS dow
        |  FROM orders GROUP BY 1, 3),
        |base AS (
        |  SELECT dow,
        |    CAST(CAST(SUM(cents) AS HUGEINT) * 1000000 // COUNT(*) AS BIGINT) AS baseline_micro,
        |    COUNT(*) AS n_days
        |  FROM daily GROUP BY dow)
        |SELECT d.day, d.dow, d.cents, b.n_days, b.baseline_micro,
        |  CAST(CAST(d.cents AS HUGEINT) * 1000000 - b.baseline_micro AS BIGINT) AS resid_micro
        |FROM daily d JOIN base b USING (dow)
        |ORDER BY abs(CAST(CAST(d.cents AS HUGEINT) * 1000000 - b.baseline_micro AS BIGINT)) DESC, d.day
        |LIMIT 10""".stripMargin,

    "q_weighted_median" ->
      """WITH pc AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1),
        |cum AS (
        |  SELECT cents, CAST(SUM(w) OVER (ORDER BY cents) AS BIGINT) AS cum_w
        |  FROM pc),
        |tot AS (
        |  SELECT CAST(SUM(w) AS BIGINT) AS total_w,
        |    (CAST(SUM(w) AS BIGINT) + 1) // 2 AS half FROM pc)
        |SELECT t.total_w, t.half, MIN(c.cents) AS median_cents
        |FROM cum c, tot t WHERE c.cum_w >= t.half
        |GROUP BY t.total_w, t.half""".stripMargin,

    "q_skew_profile" ->
      """WITH cnts AS MATERIALIZED (
        |  SELECT l_suppkey, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY l_suppkey),
        |stats AS (
        |  SELECT COUNT(*) AS n_keys,
        |    CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |    MAX(cnt) AS max_cnt, MIN(cnt) AS min_cnt,
        |    CAST(CAST(MAX(cnt) AS HUGEINT) * COUNT(*) * 1000000
        |      // CAST(SUM(cnt) AS HUGEINT) AS BIGINT) AS skew_micro
        |  FROM cnts),
        |top AS (
        |  SELECT l_suppkey, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, l_suppkey) AS rk
        |  FROM cnts ORDER BY cnt DESC, l_suppkey LIMIT 10)
        |SELECT rk, l_suppkey, cnt, n_keys, n_rows, max_cnt, min_cnt,
        |  skew_micro
        |FROM top, stats ORDER BY rk""".stripMargin,

    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  ${sqlDsumRev("l_extendedprice", "l_discount")} AS sum_disc_price,
         |  ${sqlDavg("l_quantity")} AS avg_qty,
         |  ${sqlDavg("l_extendedprice")} AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2001-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_min_per_group" ->
      """SELECT o_custkey,
        |  CAST(MIN(o_orderdate) AS DATE) AS first_order_date,
        |  CAST(MAX(o_orderdate) AS DATE) AS last_order_date,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_count_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_approx_count_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_orderkey) AS exact_orders,
        |  true AS within_bound
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_bitmap_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_hll_intersect" ->
      """SELECT
        |  (SELECT COUNT(*) FROM (
        |     SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
        |     INTERSECT
        |     SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'))
        |    AS exact_i,
        |  (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem
        |   WHERE l_returnflag IN ('R', 'A')) AS exact_u,
        |  true AS within_bound""".stripMargin,

    "q_hll_union" ->
      """SELECT (SELECT COUNT(DISTINCT l_returnflag) FROM lineitem) AS n_groups,
        |  COUNT(DISTINCT l_orderkey) AS exact_orders,
        |  true AS within_bound
        |FROM lineitem""".stripMargin,

    "q_approx_top_k" ->
      """SELECT l_suppkey, COUNT(*) AS n, true AS within_bound
        |FROM lineitem GROUP BY l_suppkey
        |ORDER BY n DESC, l_suppkey LIMIT 10""".stripMargin,

    "q_approx_quantile" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  quantile_cont(round(o_totalprice * 100), 0.5) / 100.0 AS exact_median,
        |  true AS within_bound
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_collect_list" ->
      """SELECT c_nationkey,
        |  string_agg(c_name, '|' ORDER BY c_name) AS names,
        |  COUNT(*) AS n
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_mode" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderstatus
        |    ORDER BY n DESC, o_orderpriority) AS rn
        |  FROM c)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_n
        |FROM r WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,

    "q_max_by" ->
      s"""WITH ranked AS (
         |  SELECT o_custkey, o_orderkey, o_totalprice,
         |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey DESC) AS rd,
         |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC) AS ra
         |  FROM orders)
         |SELECT t.o_custkey,
         |  MAX(CASE WHEN rd = 1 THEN o_orderkey END) AS best_order,
         |  MAX(CASE WHEN ra = 1 THEN o_orderkey END) AS worst_order,
         |  ${sqlDsum("o_totalprice")} AS total_spent
         |FROM ranked t GROUP BY t.o_custkey ORDER BY t.o_custkey""".stripMargin,

    "q_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  COUNT(*) AS n,
         |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
         |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority,
         |  ${sqlDsum("o_totalprice")} AS sum_price,
         |  COUNT(*) AS n,
         |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_st,
         |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_pr
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_dq_audit" ->
      """WITH s AS (
        |  SELECT
        |    COUNT(*) AS row_count,
        |    SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_custkey,
        |    COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS dup_orderkey,
        |    SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS nonpos_price,
        |    SUM(CASE WHEN year(o_orderdate) BETWEEN 1995 AND 2001
        |             THEN 0 ELSE 1 END) AS date_out_of_range
        |  FROM orders),
        |m AS (
        |  SELECT 'date_out_of_range' AS check_name, CAST(date_out_of_range AS BIGINT) AS value FROM s
        |  UNION ALL SELECT 'dup_orderkey', CAST(dup_orderkey AS BIGINT) FROM s
        |  UNION ALL SELECT 'nonpos_price', CAST(nonpos_price AS BIGINT) FROM s
        |  UNION ALL SELECT 'null_custkey', CAST(null_custkey AS BIGINT) FROM s
        |  UNION ALL SELECT 'row_count', CAST(row_count AS BIGINT) FROM s
        |  UNION ALL
        |  SELECT 'orphan_custkey', COUNT(*) FROM orders
        |  WHERE o_custkey IS NOT NULL AND o_custkey NOT IN
        |    (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL))
        |SELECT check_name, value FROM m ORDER BY check_name""".stripMargin,

    "q_conditional_agg" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_a,
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_r,
        |  COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q_listagg" ->
      """WITH t AS (
        |  SELECT c_nationkey,
        |    string_agg(c_mktsegment, '|' ORDER BY c_mktsegment, c_custkey) AS segments,
        |    COUNT(*) AS n
        |  FROM customer GROUP BY c_nationkey)
        |SELECT c_nationkey, substring(segments, 1, 100) AS seg_prefix,
        |  CAST(length(segments) AS INTEGER) AS seg_len, n
        |FROM t ORDER BY c_nationkey""".stripMargin,

    "q_correlation" ->
      """WITH c AS (
        |  SELECT l_returnflag,
        |    round(l_quantity * 100) AS cq, round(l_extendedprice * 100) AS cp
        |  FROM lineitem),
        |m AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(cq AS DECIMAL(38,0))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(cp AS DECIMAL(38,0))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(cq * cp AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(cq * cq AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(cp * cp AS DECIMAL(38,0))) AS DOUBLE) AS syy
        |  FROM c GROUP BY l_returnflag),
        |d AS (
        |  SELECT l_returnflag, n, sx, sy,
        |    n * sxy - sx * sy AS cov_n,
        |    n * sxx - sx * sx AS var_x,
        |    n * syy - sy * sy AS var_y
        |  FROM m)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
        |  cov_n / sqrt(var_x * var_y) AS corr_qty_price,
        |  cov_n / var_x AS slope,
        |  (sy - cov_n / var_x * sx) / n / 100.0 AS intercept
        |FROM d ORDER BY l_returnflag""".stripMargin,

    "q_histogram" ->
      """WITH b AS (
        |  SELECT CAST(floor(round(o_totalprice * 100) / 5000000) + 1 AS BIGINT) AS bucket
        |  FROM orders)
        |SELECT bucket, COUNT(*) AS n_orders
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_zscore_outliers" ->
      """WITH o AS (
        |  SELECT o_orderpriority, o_orderkey, round(o_totalprice * 100) AS c FROM orders),
        |stats AS (
        |  SELECT o_orderpriority, COUNT(*) AS n,
        |    CAST(SUM(CAST(c AS DECIMAL(38,0))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(c * c AS DECIMAL(38,0))) AS DOUBLE) AS s2
        |  FROM o GROUP BY o_orderpriority),
        |m AS (
        |  SELECT o_orderpriority, n, s1 / CAST(n AS DOUBLE) AS mean_c,
        |    CASE WHEN n > 1 THEN
        |      sqrt((s2 - s1 * s1 / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
        |    END AS std_c
        |  FROM stats),
        |z AS (
        |  SELECT o.o_orderpriority, m.n, m.mean_c, m.std_c, o.o_orderkey,
        |    CASE WHEN m.std_c IS NOT NULL AND m.std_c <> 0
        |      THEN round((o.c - m.mean_c) / m.std_c, 6) END AS z
        |  FROM o JOIN m ON o.o_orderpriority = m.o_orderpriority),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
        |                               ORDER BY abs(z) DESC, o_orderkey) AS rn
        |  FROM z)
        |SELECT o_orderpriority, n, round(mean_c / 100.0, 6) AS mean_price,
        |  round(std_c / 100.0, 6) AS std_price,
        |  COUNT(CASE WHEN abs(z) > 1.5 THEN 1 END) AS n_beyond_1_5,
        |  MAX(CASE WHEN rn = 1 AND z IS NOT NULL THEN o_orderkey END) AS extreme_orderkey,
        |  MAX(abs(z)) AS max_abs_z
        |FROM r GROUP BY o_orderpriority, n, mean_c, std_c
        |ORDER BY o_orderpriority""".stripMargin,

    "q_equidepth_hist" ->
      """WITH dom AS (
        |  SELECT CAST(floor(o_totalprice) AS BIGINT) AS price_d, COUNT(*) AS cnt
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT price_d, cnt,
        |    CAST(SUM(cnt) OVER (ORDER BY price_d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(SUM(cnt) OVER () AS BIGINT) AS total
        |  FROM dom)
        |SELECT ((cum - 1) * 10) // total AS bucket,
        |  CAST(SUM(cnt) AS BIGINT) AS n,
        |  MIN(price_d) AS lo_dollars, MAX(price_d) AS hi_dollars
        |FROM c GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_t_test" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS c
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |m AS (
        |  SELECT seg, COUNT(*) AS n,
        |    CAST(SUM(CAST(c AS HUGEINT)) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(c * c AS HUGEINT)) AS DOUBLE) AS sxx
        |  FROM j GROUP BY seg),
        |ab AS (
        |  SELECT a.n AS n1, a.sx AS sx1, a.sxx AS sxx1,
        |         b.n AS n2, b.sx AS sx2, b.sxx AS sxx2
        |  FROM (SELECT * FROM m WHERE seg = 'BUILDING') a
        |  CROSS JOIN (SELECT * FROM m WHERE seg = 'MACHINERY') b),
        |s AS (
        |  SELECT n1, n2,
        |    sx1 / CAST(n1 AS DOUBLE) AS m1, sx2 / CAST(n2 AS DOUBLE) AS m2,
        |    (sxx1 - sx1 * sx1 / CAST(n1 AS DOUBLE))
        |      / (CAST(n1 AS DOUBLE) - 1.0) AS v1,
        |    (sxx2 - sx2 * sx2 / CAST(n2 AS DOUBLE))
        |      / (CAST(n2 AS DOUBLE) - 1.0) AS v2
        |  FROM ab),
        |se AS (
        |  SELECT n1, n2, m1, m2,
        |    v1 / CAST(n1 AS DOUBLE) AS se1, v2 / CAST(n2 AS DOUBLE) AS se2,
        |    v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE) AS sesum
        |  FROM s)
        |SELECT n1, n2,
        |  m1 / 100.0 AS mean1_dollars, m2 / 100.0 AS mean2_dollars,
        |  (m1 - m2) / sqrt(sesum) AS t_stat,
        |  (sesum * sesum) /
        |    (se1 * se1 / (CAST(n1 AS DOUBLE) - 1.0) +
        |     se2 * se2 / (CAST(n2 AS DOUBLE) - 1.0)) AS welch_df
        |FROM se""".stripMargin,

    // `items` is MATERIALIZED: DuckDB otherwise inlines the distinct
    // into all four references (incl. both sides of the self-join) —
    // >5 min at the 10x replica vs ~4 s materialized.
    "q_basket_rules" ->
      """WITH items AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |supp AS (SELECT pk, COUNT(*) AS n_one FROM items GROUP BY pk),
        |no AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM items),
        |co AS (
        |  SELECT a.pk AS pa, b.pk AS pb, COUNT(*) AS n_ab
        |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY a.pk, b.pk)
        |SELECT pa, pb, n_ab, sa.n_one AS n_a, sb.n_one AS n_b,
        |  CAST(CAST(n_ab AS HUGEINT) * 1000000
        |       // CAST(sa.n_one AS HUGEINT) AS BIGINT) AS conf_ab_micro,
        |  CAST(CAST(n_ab AS HUGEINT) * 1000000
        |       // CAST(sb.n_one AS HUGEINT) AS BIGINT) AS conf_ba_micro,
        |  CAST(CAST(n_ab AS HUGEINT) * n_orders * 1000000
        |       // (CAST(sa.n_one AS HUGEINT) * sb.n_one) AS BIGINT) AS lift_micro
        |FROM co JOIN supp sa ON sa.pk = co.pa
        |        JOIN supp sb ON sb.pk = co.pb
        |        CROSS JOIN no
        |ORDER BY n_ab DESC, pa, pb LIMIT 100""".stripMargin,

    // The twin recomputes the same canonical row hash; all sums CAST
    // back from DuckDB's HUGEINT widening.
    "q_table_digest" -> {
      val canon = "CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)" +
        " || '|' || o_orderstatus || '|' || CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)" +
        " || '|' || CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || '|' || o_orderpriority"
      val h = TextQueries.sqlPhash(s"($canon)", 7)
      s"""WITH t AS (SELECT $h AS h FROM orders)
         |SELECT COUNT(*) AS n_rows,
         |  CAST(SUM(h % 1073741824) AS BIGINT) AS hash_lo_sum,
         |  CAST(SUM(h // 1073741824) AS BIGINT) AS hash_hi_sum,
         |  MIN(h) AS hash_min, MAX(h) AS hash_max
         |FROM t""".stripMargin
    },

    "q_mad_outliers" ->
      """WITH med AS (
        |  SELECT l_returnflag, median(l_extendedprice) AS med
        |  FROM lineitem GROUP BY l_returnflag),
        |dev AS (
        |  SELECT l.l_returnflag, med.med,
        |    abs(l.l_extendedprice - med.med) AS adev
        |  FROM lineitem l JOIN med ON l.l_returnflag = med.l_returnflag),
        |mads AS (
        |  SELECT l_returnflag, median(adev) AS mad FROM dev GROUP BY l_returnflag)
        |SELECT dev.l_returnflag, max(dev.med) AS med, max(mads.mad) AS mad,
        |  COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN dev.adev > 3.0 * mads.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev JOIN mads ON dev.l_returnflag = mads.l_returnflag
        |GROUP BY dev.l_returnflag ORDER BY dev.l_returnflag""".stripMargin,

    "q_winsorize" ->
      """WITH pct AS (
        |  SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.05) AS p05,
        |    quantile_cont(l_extendedprice, 0.95) AS p95
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag, max(pct.p05) AS p05, max(pct.p95) AS p95,
        |  COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN l.l_extendedprice < pct.p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(SUM(CASE WHEN l.l_extendedprice > pct.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  CAST(SUM(CAST(least(greatest(l.l_extendedprice, pct.p05), pct.p95) AS DECIMAL(18,4))) AS DOUBLE) AS winsor_sum
        |FROM lineitem l JOIN pct ON l.l_returnflag = pct.l_returnflag
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,

    // Replays the exact-rational KS pipeline; SUM(BIGINT) widens to
    // HUGEINT in DuckDB so every cumulative/total is cast back, and `//`
    // floors like Spark's DIV (all operands non-negative).
    "q_ks_test" ->
      """WITH j AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS a
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |pv AS (
        |  SELECT v, CAST(SUM(a) AS BIGINT) AS ca,
        |    CAST(SUM(1 - a) AS BIGINT) AS cb
        |  FROM j GROUP BY v),
        |cum AS (
        |  SELECT v,
        |    CAST(SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS cua,
        |    CAST(SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS cub
        |  FROM pv),
        |tot AS (
        |  SELECT CAST(SUM(a) AS BIGINT) AS n1, CAST(SUM(1 - a) AS BIGINT) AS n2
        |  FROM j),
        |m AS (
        |  SELECT n1, n2,
        |    CAST(MAX(abs(cua * n2 - cub * n1)) AS BIGINT) AS ks_num
        |  FROM cum, tot GROUP BY n1, n2)
        |SELECT n1, n2, ks_num,
        |  CAST(CAST(ks_num AS HUGEINT) * 1000000
        |       // (CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS ks_micro
        |FROM m ORDER BY n1""".stripMargin,

    // Doubled-rank replay of the U statistic; SUM(BIGINT) → HUGEINT
    // widening cast back as everywhere else.
    "q_rank_sum" ->
      """WITH j AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS a
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |pv AS (
        |  SELECT v, CAST(SUM(a) AS BIGINT) AS ca, COUNT(*) AS cnt
        |  FROM j GROUP BY v),
        |rk AS (
        |  SELECT v, ca, cnt,
        |    CAST(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM pv),
        |tot AS (
        |  SELECT CAST(SUM(a) AS BIGINT) AS n1, CAST(SUM(1 - a) AS BIGINT) AS n2
        |  FROM j),
        |m AS (
        |  SELECT n1, n2,
        |    CAST(SUM(ca * (2 * (cum - cnt) + cnt + 1)) AS BIGINT) AS r2_sum_a
        |  FROM rk, tot GROUP BY n1, n2)
        |SELECT n1, n2, r2_sum_a,
        |  r2_sum_a - n1 * (n1 + 1) AS u2_a,
        |  2 * n1 * n2 - (r2_sum_a - n1 * (n1 + 1)) AS u2_b
        |FROM m ORDER BY n1""".stripMargin,

    // Same candidate-threshold chain in DuckDB; n-scaled Gini terms on
    // HUGEINTs, argmin by (wgini_micro, v) row_number.
    "q_gini_split" -> {
      def nGini(n: String, p: String): String =
        s"CAST((CAST($n AS HUGEINT) * $n - CAST($p AS HUGEINT) * $p" +
          s" - CAST($n - $p AS HUGEINT) * ($n - $p)) * 1000000 // $n AS BIGINT)"
      s"""WITH o AS (
         |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
         |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |         THEN 1 ELSE 0 END AS pos
         |  FROM orders),
         |pv AS (
         |  SELECT v, CAST(SUM(pos) AS BIGINT) AS p, COUNT(*) AS cnt
         |  FROM o GROUP BY v),
         |cum AS (
         |  SELECT v,
         |    CAST(SUM(p) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW) AS BIGINT) AS pl,
         |    CAST(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
         |      AND CURRENT ROW) AS BIGINT) AS nl
         |  FROM pv),
         |tot AS (
         |  SELECT COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS ptot FROM o),
         |sc AS (
         |  SELECT v, nl, n - nl AS nr, pl, ptot - pl AS pr, n, ptot
         |  FROM cum, tot WHERE nl < n),
         |g AS (
         |  SELECT v, nl, nr, pl, pr,
         |    ${nGini("nl", "pl")} + ${nGini("nr", "pr")} AS wgini_micro,
         |    ${nGini("n", "ptot")} AS wgini_root_micro
         |  FROM sc),
         |best AS (
         |  SELECT *, row_number() OVER (ORDER BY wgini_micro, v) AS rn FROM g)
         |SELECT v AS threshold_cents, nl AS n_left, nr AS n_right,
         |  pl AS pos_left, pr AS pos_right, wgini_micro, wgini_root_micro
         |FROM best WHERE rn = 1 ORDER BY threshold_cents""".stripMargin
    },

    // HUGEINT stands in for Spark's DECIMAL(38,0) wide-product route;
    // // on non-negative HUGEINTs floors exactly like Spark's DIV.
    "q_chi_square" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS seg, o_orderpriority AS prio
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |cells AS (
        |  SELECT seg, prio, COUNT(*) AS n_obs FROM j GROUP BY seg, prio),
        |r AS (SELECT seg, CAST(SUM(n_obs) AS BIGINT) AS rt
        |      FROM cells GROUP BY seg),
        |c AS (SELECT prio, CAST(SUM(n_obs) AS BIGINT) AS ct
        |      FROM cells GROUP BY prio),
        |t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM cells),
        |x AS (
        |  SELECT seg, prio, n_obs, rt, ct, n, n_obs * n - rt * ct AS dnum
        |  FROM cells JOIN r USING (seg) JOIN c USING (prio), t),
        |y AS (
        |  SELECT seg, prio, n_obs,
        |    CAST(CAST(rt AS HUGEINT) * ct * 1000000 // n AS BIGINT) AS exp_micro,
        |    CAST(CAST(dnum AS HUGEINT) * dnum * 100
        |      // (CAST(n AS HUGEINT) * rt * ct) AS BIGINT) AS term_centi
        |  FROM x)
        |SELECT seg, prio, n_obs, exp_micro, term_centi,
        |  CAST(SUM(term_centi) OVER () AS BIGINT) AS chi2_centi
        |FROM y ORDER BY seg, prio""".stripMargin,

    "q_fd_violations" ->
      """WITH a1 AS (
        |  SELECT l_partkey AS lhs, COUNT(DISTINCT l_suppkey) AS n_rhs
        |  FROM lineitem GROUP BY l_partkey),
        |a2 AS (
        |  SELECT l_orderkey AS lhs, COUNT(DISTINCT l_returnflag) AS n_rhs
        |  FROM lineitem GROUP BY l_orderkey),
        |a3 AS (
        |  SELECT o_custkey AS lhs, COUNT(DISTINCT o_orderpriority) AS n_rhs
        |  FROM orders GROUP BY o_custkey),
        |a4 AS (
        |  SELECT c_nationkey AS lhs, COUNT(DISTINCT c_mktsegment) AS n_rhs
        |  FROM customer GROUP BY c_nationkey),
        |u AS (
        |  SELECT 'l_partkey->l_suppkey' AS fd, * FROM a1
        |  UNION ALL SELECT 'l_orderkey->l_returnflag', * FROM a2
        |  UNION ALL SELECT 'o_custkey->o_orderpriority', * FROM a3
        |  UNION ALL SELECT 'c_nationkey->c_mktsegment', * FROM a4)
        |SELECT fd, COUNT(*) AS n_lhs,
        |  CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating,
        |  MAX(n_rhs) AS max_rhs_variants,
        |  CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // COUNT(*) AS violation_ppm
        |FROM u GROUP BY fd ORDER BY fd""".stripMargin,

    "q_kendall_tau" ->
      """WITH m AS (
        |  SELECT c_nationkey AS k,
        |    CAST(SUM(round(c_acctbal * 100)) AS BIGINT) AS x,
        |    COUNT(*) AS y
        |  FROM customer GROUP BY c_nationkey),
        |p AS (
        |  SELECT CAST(sign(a.x - b.x) * sign(a.y - b.y) AS BIGINT) AS sgn,
        |    CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
        |    CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
        |  FROM m a JOIN m b ON a.k < b.k),
        |c AS (
        |  SELECT COUNT(*) AS n0,
        |    CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |    CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS nd,
        |    CAST(SUM(tx) AS BIGINT) AS ties_x,
        |    CAST(SUM(ty) AS BIGINT) AS ties_y
        |  FROM p)
        |SELECT n0, nc, nd, ties_x, ties_y,
        |  CAST(round(CAST(nc - nd AS DOUBLE) * 1000000.0
        |    / sqrt(CAST((n0 - ties_x) * (n0 - ties_y) AS DOUBLE)))
        |    AS BIGINT) AS tau_micro
        |FROM c""".stripMargin
  )
}
