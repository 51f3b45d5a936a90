package graft.queries

import graft.Tables
import graft.functions.BloomJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryUtil._

/** Join surface — SURVEY.md §2.2 "Joins".
  *
  * Reference evidence: J1 (broadcast lookup join,
  * `/root/reference/src/generate_mapping.py:97-108` build / `:39-40`
  * probe), J2 (first-row-wins dedup of the build side, `:106`), J3
  * (laterality-decoded equi-join, `:31-34,59-63`). Semi/anti/range/as-of
  * are the mandated [E] extensions.
  *
  * Scale notes (100 TB):
  *   - Dimensions (region/nation/supplier/part at TPC-H ratios) stay under
  *     the broadcast threshold even at SF100k — `broadcast()` pins the
  *     plan to BroadcastHashJoin: zero shuffle of the fact table.
  *   - Fact-to-fact joins (lineitem⋈orders) shuffle both sides on the
  *     key; at scale bucketing both tables on orderkey would remove that
  *     shuffle entirely. AQE handles skewed keys via skew-join splitting.
  *   - The pure range join is dim-to-fact with a tiny interval dimension,
  *     so Spark plans BroadcastNestedLoop over the broadcast dim — linear
  *     in the fact, never quadratic. The as-of join avoids a per-row sort
  *     by aggregating with max_by after an interval-bounded join.
  */
object JoinQueries {

  /** Per-block serving cap for the fuzzy-match candidate generation —
    * same skew treatment as DedupQueries.BUCKET_CAP / Similarity-
    * Queries.CAND_CAP. */
  private[queries] val ER_BLOCK_CAP = 200

  val defs: Map[String, Q] = Map(
    // J1: dimension chain, explicitly broadcast (customer ⋈ nation ⋈ region).
    "q_join_broadcast" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // TPC-H Q5 shape: the full 6-table star traversal in one plan —
    // lineitem ⋈ orders ⋈ customer shuffle on their keys, supplier
    // joined on BOTH l_suppkey AND the local-nation constraint
    // c_nationkey = s_nationkey, nation/region broadcast. Revenue per
    // nation in exact cents×percent units ([[QueryUtil.dsumRev]]).
    // Scale: the three fact-side joins shuffle on their natural keys
    // (bucketing lineitem+orders on orderkey would drop the first);
    // supplier scales with SF so it shuffles too rather than pretending
    // broadcast; only the fixed-cardinality nation/region broadcast.
    // The date filter pushes to the orders scan before any join.
    "q_multijoin_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      val o = Tables.orders(s, d)
        .filter(year(col("o_orderdate")).between(1996, 1998))
        .select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))
      val su = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
      val n = Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
        .select(col("r_regionkey"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsumRev(col("l_extendedprice"), col("l_discount"))
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Fact-to-fact shuffle join (sort-merge hinted): revenue per priority.
    "q_join_sortmerge" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d).hint("merge")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          dsumRev(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("o_orderpriority"))
    }),

    // Left outer join preserving empty groups (nations without customers).
    "q_join_left" -> ((s, d) => {
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      n.join(c, n("n_nationkey") === c("c_nationkey"), "left")
        .groupBy(col("n_nationkey"), col("n_name"))
        .agg(count(col("c_custkey")).as("n_cust"))
        .orderBy(col("n_nationkey"))
    }),

    // Right outer (the mirrored preserve-side; completes the family).
    "q_join_right" -> ((s, d) => {
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      c.join(n, c("c_nationkey") === n("n_nationkey"), "right")
        .groupBy(col("n_nationkey"), col("n_name"))
        .agg(count(col("c_custkey")).as("n_cust"))
        .orderBy(col("n_nationkey"))
    }),

    // Full outer: customer-count vs supplier-count per nation key.
    "q_join_full" -> ((s, d) => {
      val c = Tables.customer(s, d).groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val sup = Tables.supplier(s, d).groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(sup, c("c_nationkey") === sup("s_nationkey"), "full")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    }),

    // Left-semi: orders having at least one high-quantity line (EXISTS).
    "q_join_semi" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val big = Tables.lineitem(s, d).filter(col("l_quantity") >= 48)
      o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    // Left-anti: customers with no orders (NOT EXISTS).
    "q_join_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // J3-style theta join: equi key + inequality residual.
    "q_join_theta" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      o.join(c, o("o_custkey") === c("c_custkey") &&
          o("o_totalprice") > c("c_acctbal") * 20)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("c_mktsegment"))
    }),

    // Range/interval join: lineitems vs a derived month-interval dim.
    // The scalable range-join shape: an equi bucket key (here the
    // interval's own granularity) turns BroadcastNestedLoop into
    // BroadcastHashJoin with the range predicate as residual — at sf0.1
    // this was 11s as a pure BNL, sub-second bucketed. For intervals
    // that span buckets, the dim explodes one row per overlapped bucket
    // (same technique; here 1:1).
    "q_join_range" -> ((s, d) => {
      val months = Tables.orders(s, d)
        .select(date_trunc("month", col("o_orderdate")).as("m_start"))
        .distinct()
        .withColumn("m_end", col("m_start") + expr("INTERVAL 1 MONTH"))
      val li = Tables.lineitem(s, d)
      li.join(broadcast(months),
          date_trunc("month", li("l_shipdate")) === months("m_start") &&
          li("l_shipdate") >= months("m_start") && li("l_shipdate") < months("m_end"))
        .groupBy(date_format(col("m_start"), "yyyy-MM").as("ship_month"))
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("ship_month"))
    }),

    // As-of join: for each order, the LAST lineitem shipped within 90 days
    // of the order date (latest-at-or-before semantics via max_by over the
    // interval-bounded join; deterministic tiebreak on linenumber).
    "q_join_asof" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      o.join(li, o("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") >= o("o_orderdate") &&
          li("l_shipdate") < o("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("o_orderkey"))
        .agg(
          max_by(col("l_linenumber"), struct(col("l_shipdate"), col("l_linenumber")))
            .as("asof_linenumber"),
          max(col("l_shipdate")).cast(DateType).as("asof_shipdate"))
        .orderBy(col("o_orderkey"))
    }),

    // POINT-IN-TIME (temporal/SCD2) join: each order enriched with the
    // dimension VERSION whose validity interval contains the order
    // date — the lakehouse dim-lookup after an SCD2 merge (q_scd2_merge
    // builds the history; this query CONSUMES one). The dim derives
    // deterministically: every customer has a v0 open at 1995-01-01;
    // keys ≡0 (mod 10) get a +100-balance v1 at 1998-01-01 that closes
    // v0. ISO date STRINGS compare lexicographically, so the interval
    // predicate is engine-portable with zero timestamp semantics.
    // Scale shape: an EQUI-join on the customer key (shuffle or bucketed
    // co-location) with the interval containment as a cheap post-join
    // filter — correct because SCD2 bounds versions-per-key (here ≤ 2);
    // a dim with hot version churn flips to the q_join_asof shape
    // (max_by over versions ≤ ts) on the same key partitioning.
    "q_pit_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val v0 = c.select(col("c_custkey"),
        dec(col("c_acctbal")).cast("double").as("acctbal"),
        lit("1995-01-01").as("valid_from"),
        when(col("c_custkey") % 10 === 0, "1998-01-01")
          .otherwise("9999-12-31").as("valid_to"))
      val v1 = c.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"),
          (dec(col("c_acctbal")) + 100).cast("double").as("acctbal"),
          lit("1998-01-01").as("valid_from"), lit("9999-12-31").as("valid_to"))
      val dim = v0.unionByName(v1)
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      o.join(dim, col("o_custkey") === col("c_custkey") &&
          col("order_date") >= col("valid_from") &&
          col("order_date") < col("valid_to"))
        .select(col("o_orderkey"), col("o_custkey"), col("order_date"),
          col("acctbal"), col("valid_from"))
        .orderBy(col("o_orderkey"))
    }),

    // Blocked fuzzy self-join (entity resolution), scale-shaped end to
    // end (same staging as q_simhash_near):
    // 1. collapse EXACT duplicates first — (name, nation) classes with a
    //    min-id representative and a count; replicated boilerplate rows
    //    become one node each (a serve-side cap alone measured 27× cost
    //    at 10× replicated data: with half the block duplicated, capping
    //    barely binds — collapsing makes the blocked join's input the
    //    distinct-entity count, which doesn't grow with replication);
    // 2. equi-join distinct entities on the (nation, name-prefix)
    //    blocking key — fixed-width prefix ⇒ bounded blocks; the
    //    ER_BLOCK_CAP serve-side cap stays as the degenerate-block
    //    backstop (probe side unrestricted, pairs normalized
    //    least/greatest + distinct, so capped-out entities still link to
    //    a low-id representative);
    // 3. levenshtein only within blocks; duplicate counts ride along as
    //    pair weights. Pairs differing inside the prefix are missed by
    //    design (the standard ER recall/cost tradeoff, documented).
    "q_fuzzy_match" -> ((s, d) => {
      val ents = Tables.customer(s, d)
        .groupBy(col("c_name"), col("c_nationkey"))
        .agg(min(col("c_custkey")).as("rep_id"), count(lit(1)).as("n_dups"))
      val block = struct(col("c_nationkey").as("bk_nat"),
        substring(col("c_name"), 1, 15).as("bk_prefix"))
      val a = ents.select(col("rep_id").as("id_a"), col("c_name").as("name_a"),
        col("n_dups").as("cnt_a"), block.as("blk"))
      val wBlk = org.apache.spark.sql.expressions.Window
        .partitionBy(col("blk")).orderBy(col("id_b"))
      val b = ents.select(col("rep_id").as("id_b"), col("c_name").as("name_b"),
        col("n_dups").as("cnt_b"), block.as("blk"))
        .withColumn("brn", row_number().over(wBlk))
        .filter(col("brn") <= ER_BLOCK_CAP)
        .drop("brn")
      a.join(b, Seq("blk"))
        .filter(col("id_a") =!= col("id_b"))
        // bounded variant: O(n·k) band instead of the full O(n²) DP,
        // -1 past the threshold (so keep the >= 0 band)
        .withColumn("lev", levenshtein(col("name_a"), col("name_b"), 1))
        .filter(col("lev") >= 0)
        .select(
          least(col("id_a"), col("id_b")).as("id_lo"),
          greatest(col("id_a"), col("id_b")).as("id_hi"),
          col("lev"),
          when(col("id_a") < col("id_b"), col("cnt_a")).otherwise(col("cnt_b")).as("n_lo"),
          when(col("id_a") < col("id_b"), col("cnt_b")).otherwise(col("cnt_a")).as("n_hi"))
        .distinct()
        .toDF("id_a", "id_b", "lev", "n_a", "n_b")
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Bloom-filter pruned join: the selective side (urgent finished
    // orders, ~1% of keys) is sketched ONCE into a 1-row bloom
    // (graft.functions.BloomJoin — Spark's own runtime-filter sketch,
    // driven explicitly), broadcast by crossJoin, and the fact table is
    // cut BEFORE its shuffle by might_contain; the exact semi-join then
    // drops the bloom's false positives, so the result is bit-identical
    // to the plain semi-join the oracle runs. At 100 TB this is the
    // pre-shuffle prune you reach for when the optimizer can't inject
    // its own runtime filter (selective keys landed by a separate job):
    // shuffle bytes drop to ~selectivity·|fact| for one numBits/8-byte
    // broadcast. Never a driver collect — the sketch stays in the plan.
    "q_bloom_prune" -> ((s, d) => {
      val sel = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F" &&
          col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val bloom = sel.agg(
        BloomJoin.bloomAgg(xxhash64(col("o_orderkey")), 100000L, 800000L)
          .as("bf"))
      Tables.lineitem(s, d)
        .filter(BloomJoin.mightContain(bloom, xxhash64(col("l_orderkey"))))
        .join(sel, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // Salted skew join, GATED: lineitem⋈supplier through
    // operators.SkewJoin (fact side scattered over 8 deterministic
    // salt buckets, dim side replicated 8×) — the explicit hot-key
    // treatment for when AQE's skew split can't fire (broadcast-able
    // dim but a reducer-melting fact key). The oracle is the PLAIN
    // join: salting is pure layout, so the twin proving value-equality
    // is exactly the operator's correctness contract.
    "q_salted_join" -> ((s, d) => {
      val joined = graft.operators.SkewJoin.saltedInnerJoin(
        Tables.lineitem(s, d).withColumnRenamed("l_suppkey", "suppkey"),
        Tables.supplier(s, d).withColumnRenamed("s_suppkey", "suppkey"),
        "suppkey",
        saltSource = struct(col("l_orderkey"), col("l_linenumber")),
        saltBuckets = 8)
      joined.groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("s_nationkey"))
    }),

    // FIFO lot matching — the inventory/cost-basis operator that looks
    // inherently sequential (consume the oldest open lot first) but has
    // an exact RELATIONAL closed form: order each part's supply lots and
    // demands by time and take per-side cumulative quantities; FIFO then
    // matches lot i to demand j with quantity
    //   max(0, min(cs_i, cd_j) − max(cs_{i−1}, cd_{j−1}))
    // i.e. the pairs are exactly the OVERLAPPING INTERVALS of the two
    // cumulative axes. The overlap join is grid-bucketed (the library's
    // range-join shape): each cumulative interval explodes onto the
    // fixed-width buckets it spans (≤ 2 here — interval length is one
    // line's quantity, ≤ 50·100 units < the 5 000-unit grid), candidates
    // meet on (partkey, bucket), the exact overlap predicate filters,
    // and DISTINCT collapses double-bucket hits. No nested-loop, no
    // per-key quadratic: work ∝ true matches, which FIFO's staircase
    // structure bounds by n_lots + n_demands − 1 per part (asserted in
    // NewOpsSpec). At 100 TB the shuffle key (partkey, bucket) also
    // splits hot parts across reducers — deep per-part histories don't
    // straggle. All-integer contract (quantity cent-units).
    "q_fifo_match" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val grid = 5000L
      val li = Tables.lineitem(s, d).select(col("l_partkey").as("pk"),
        col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
        col("l_shipdate").as("sd"), col("l_linestatus").as("st"),
        round(col("l_quantity") * 100).cast("long").as("units"))
      val w = Window.partitionBy(col("pk"))
        .orderBy(col("sd"), col("ok"), col("ln"))
        .rowsBetween(Window.unboundedPreceding, 0)
      def cumSide(status: String, pfx: String) = li.filter(col("st") === status)
        .withColumn("hi", sum(col("units")).over(w))
        .withColumn("lo", col("hi") - col("units"))
        .select(col("pk"), col("ok").as(s"${pfx}_ok"), col("ln").as(s"${pfx}_ln"),
          col("lo").as(s"${pfx}_lo"), col("hi").as(s"${pfx}_hi"))
      val sup = cumSide("F", "s")
      val dem = cumSide("O", "d")
      def onGrid(side: DataFrame, pfx: String) = side.withColumn("bkt",
        explode(expr(s"sequence(${pfx}_lo DIV $grid, (${pfx}_hi - 1) DIV $grid)")))
      // Owner-bucket dedup (round 14): a pair whose intervals both span
      // two grid buckets used to surface twice and was collapsed by a
      // DISTINCT — a full exchange of the candidate frame. Each
      // overlapping pair is instead kept ONLY in the bucket containing
      // its overlap start max(s_lo, d_lo): that bucket is within both
      // intervals' bucket ranges (overlap start < min(s_hi, d_hi)), so
      // exactly one copy survives and the exchange disappears
      // (plans/r14: 8 → 7 Exchanges; NewOpsSpec's staircase property
      // pins the output).
      val pairs = onGrid(sup, "s").join(onGrid(dem, "d"), Seq("pk", "bkt"))
        .filter(col("s_hi") > col("d_lo") && col("d_hi") > col("s_lo") &&
          col("bkt") === expr(s"greatest(s_lo, d_lo) DIV $grid"))
        .drop("bkt")
        .withColumn("m_units", least(col("s_hi"), col("d_hi"))
          - greatest(col("s_lo"), col("d_lo")))
      val perDemand = pairs.groupBy(col("pk"), col("d_ok"), col("d_ln"))
        .agg(count(lit(1)).as("n_lots_hit"), sum(col("m_units")).as("du"))
      val matchAgg = perDemand.groupBy(col("pk"))
        .agg(sum(col("n_lots_hit")).as("n_matches"),
          sum(col("du")).as("matched_units"),
          sum(when(col("n_lots_hit") > 1, 1L).otherwise(0L)).as("n_split_demands"))
      // Per-part side stats WITHOUT the windowed frames: n_lots/n_demands
      // are plain per-side counts and supply/demand_units = max of the
      // cumulative sum = the plain per-side SUM — so one conditional
      // aggregate over one scan replaces two re-plans of the windowed
      // sides (each a pk exchange + sort; branch subtrees don't get
      // exchange reuse) plus their full-outer join. The st filter keeps
      // the kept-part set identical to the old two-sided outer join on
      // any status domain. ScanAudit round-9 finding: 4 lineitem scans
      // (2 of them windowed) → 3 (1 windowed per side, 1 plain agg).
      val stats = li.filter(col("st").isin("F", "O"))
        .groupBy(col("pk")).agg(
          sum(when(col("st") === "F", 1L).otherwise(0L)).as("n_lots"),
          sum(when(col("st") === "O", 1L).otherwise(0L)).as("n_demands"),
          sum(when(col("st") === "F", col("units")).otherwise(0L))
            .as("supply_units"),
          sum(when(col("st") === "O", col("units")).otherwise(0L))
            .as("demand_units"))
      stats
        .join(matchAgg, Seq("pk"), "left")
        .select(col("pk").as("partkey"),
          coalesce(col("n_lots"), lit(0L)).as("n_lots"),
          coalesce(col("n_demands"), lit(0L)).as("n_demands"),
          coalesce(col("supply_units"), lit(0L)).as("supply_units"),
          coalesce(col("demand_units"), lit(0L)).as("demand_units"),
          coalesce(col("n_matches"), lit(0L)).as("n_matches"),
          coalesce(col("matched_units"), lit(0L)).as("matched_units"),
          coalesce(col("n_split_demands"), lit(0L)).as("n_split_demands"))
        .orderBy(col("partkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_join_broadcast" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_cust, ${sqlDsum("c_acctbal")} AS sum_bal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q_multijoin_revenue" ->
      s"""SELECT n_name,
         |  ${sqlDsumRev("l_extendedprice", "l_discount")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |              AND c_nationkey = s_nationkey
         |JOIN nation   ON s_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |WHERE year(o_orderdate) BETWEEN 1996 AND 1998
         |  AND r_name = 'ASIA'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "q_join_sortmerge" ->
      s"""SELECT o_orderpriority,
         |  ${sqlDsumRev("l_extendedprice", "l_discount")} AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join_left" ->
      """SELECT n_nationkey, n_name, COUNT(c_custkey) AS n_cust
        |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin,

    "q_join_right" ->
      """SELECT n_nationkey, n_name, COUNT(c_custkey) AS n_cust
        |FROM customer RIGHT JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin,

    "q_join_full" ->
      """WITH c AS (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
        |     s AS (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
        |SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
        |ORDER BY nationkey""".stripMargin,

    // The bloom prune is exact-verified in-plan, so the twin is the
    // plain semi-join aggregate the pruned pipeline must reproduce.
    "q_bloom_prune" ->
      s"""SELECT l_returnflag, COUNT(*) AS n_lines, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
         |                     WHERE o_orderstatus = 'F'
         |                       AND o_orderpriority = '1-URGENT')
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_join_semi" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_theta" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders JOIN customer
         |  ON o_custkey = c_custkey AND o_totalprice > c_acctbal * 20
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_join_range" ->
      s"""WITH months AS (
         |  SELECT DISTINCT date_trunc('month', o_orderdate) AS m_start,
         |    date_trunc('month', o_orderdate) + INTERVAL 1 MONTH AS m_end
         |  FROM orders)
         |SELECT strftime(m_start, '%Y-%m') AS ship_month,
         |  COUNT(*) AS n_lines, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem JOIN months
         |  ON l_shipdate >= m_start AND l_shipdate < m_end
         |GROUP BY ship_month ORDER BY ship_month""".stripMargin,

    "q_join_asof" ->
      """WITH matched AS (
        |  SELECT o_orderkey, l_linenumber, l_shipdate,
        |    row_number() OVER (PARTITION BY o_orderkey
        |                       ORDER BY l_shipdate DESC, l_linenumber DESC) AS rn
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |    AND l_shipdate >= o_orderdate
        |    AND l_shipdate < o_orderdate + INTERVAL 90 DAY)
        |SELECT o_orderkey,
        |  MAX(CASE WHEN rn = 1 THEN l_linenumber END) AS asof_linenumber,
        |  CAST(MAX(l_shipdate) AS DATE) AS asof_shipdate
        |FROM matched GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "q_pit_join" ->
      """WITH v0 AS (
        |  SELECT c_custkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,4)) AS DOUBLE) AS acctbal,
        |    '1995-01-01' AS valid_from,
        |    CASE WHEN c_custkey % 10 = 0 THEN '1998-01-01'
        |         ELSE '9999-12-31' END AS valid_to
        |  FROM customer),
        |v1 AS (
        |  SELECT c_custkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,4)) + 100 AS DOUBLE) AS acctbal,
        |    '1998-01-01' AS valid_from, '9999-12-31' AS valid_to
        |  FROM customer WHERE c_custkey % 10 = 0),
        |dim AS (SELECT * FROM v0 UNION ALL SELECT * FROM v1),
        |o AS (
        |  SELECT o_orderkey, o_custkey,
        |    strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, order_date, acctbal, valid_from
        |FROM o JOIN dim ON o_custkey = c_custkey
        |  AND order_date >= valid_from AND order_date < valid_to
        |ORDER BY o_orderkey""".stripMargin,

    "q_fuzzy_match" ->
      s"""WITH ents AS (
         |  SELECT c_name, c_nationkey, MIN(c_custkey) AS rep_id, COUNT(*) AS n_dups
         |  FROM customer GROUP BY c_name, c_nationkey),
         |e AS (
         |  SELECT rep_id, c_name, c_nationkey, n_dups,
         |    substring(c_name, 1, 15) AS bk_prefix
         |  FROM ents),
         |srv AS (
         |  SELECT * FROM (
         |    SELECT e.*, row_number() OVER (
         |      PARTITION BY c_nationkey, bk_prefix ORDER BY rep_id) AS brn
         |    FROM e)
         |  WHERE brn <= $ER_BLOCK_CAP)
         |SELECT DISTINCT
         |  least(a.rep_id, b.rep_id) AS id_a,
         |  greatest(a.rep_id, b.rep_id) AS id_b,
         |  CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS lev,
         |  CASE WHEN a.rep_id < b.rep_id THEN a.n_dups ELSE b.n_dups END AS n_a,
         |  CASE WHEN a.rep_id < b.rep_id THEN b.n_dups ELSE a.n_dups END AS n_b
         |FROM e a JOIN srv b
         |  ON a.c_nationkey = b.c_nationkey AND a.bk_prefix = b.bk_prefix
         |WHERE a.rep_id <> b.rep_id
         |  AND levenshtein(a.c_name, b.c_name) <= 1
         |ORDER BY id_a, id_b""".stripMargin,

    // The twin is the UNSALTED join — deliberately: salting must be
    // value-invisible.
    "q_salted_join" ->
      s"""SELECT s_nationkey, COUNT(*) AS n_lines, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,

    // The twin skips the grid (DuckDB's IEJoin handles the inequality
    // pair directly) — bucketing must be value-invisible, like salting.
    "q_fifo_match" ->
      """WITH li AS (
        |  SELECT l_partkey AS pk, l_orderkey AS ok, l_linenumber AS ln,
        |    l_shipdate AS sd, l_linestatus AS st,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS units
        |  FROM lineitem),
        |sup AS (
        |  SELECT pk, ok AS s_ok, ln AS s_ln,
        |    SUM(units) OVER (PARTITION BY pk ORDER BY sd, ok, ln
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_hi,
        |    SUM(units) OVER (PARTITION BY pk ORDER BY sd, ok, ln
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - units AS s_lo
        |  FROM li WHERE st = 'F'),
        |dem AS (
        |  SELECT pk, ok AS d_ok, ln AS d_ln,
        |    SUM(units) OVER (PARTITION BY pk ORDER BY sd, ok, ln
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS d_hi,
        |    SUM(units) OVER (PARTITION BY pk ORDER BY sd, ok, ln
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - units AS d_lo
        |  FROM li WHERE st = 'O'),
        |pairs AS (
        |  SELECT s.pk, d_ok, d_ln,
        |    LEAST(s_hi, d_hi) - GREATEST(s_lo, d_lo) AS m_units
        |  FROM sup s JOIN dem d ON s.pk = d.pk
        |    AND s_hi > d_lo AND d_hi > s_lo),
        |per_demand AS (
        |  SELECT pk, d_ok, d_ln, COUNT(*) AS n_lots_hit, SUM(m_units) AS du
        |  FROM pairs GROUP BY pk, d_ok, d_ln),
        |match_agg AS (
        |  SELECT pk, CAST(SUM(n_lots_hit) AS BIGINT) AS n_matches,
        |    CAST(SUM(du) AS BIGINT) AS matched_units,
        |    CAST(SUM(CASE WHEN n_lots_hit > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_split_demands
        |  FROM per_demand GROUP BY pk),
        |sup_agg AS (
        |  SELECT pk, COUNT(*) AS n_lots, MAX(s_hi) AS supply_units
        |  FROM sup GROUP BY pk),
        |dem_agg AS (
        |  SELECT pk, COUNT(*) AS n_demands, MAX(d_hi) AS demand_units
        |  FROM dem GROUP BY pk)
        |SELECT COALESCE(sup_agg.pk, dem_agg.pk) AS partkey,
        |  COALESCE(n_lots, 0) AS n_lots,
        |  COALESCE(n_demands, 0) AS n_demands,
        |  CAST(COALESCE(supply_units, 0) AS BIGINT) AS supply_units,
        |  CAST(COALESCE(demand_units, 0) AS BIGINT) AS demand_units,
        |  COALESCE(n_matches, 0) AS n_matches,
        |  COALESCE(matched_units, 0) AS matched_units,
        |  COALESCE(n_split_demands, 0) AS n_split_demands
        |FROM sup_agg
        |FULL OUTER JOIN dem_agg ON sup_agg.pk = dem_agg.pk
        |LEFT JOIN match_agg ON COALESCE(sup_agg.pk, dem_agg.pk) = match_agg.pk
        |ORDER BY partkey""".stripMargin
  )
}
