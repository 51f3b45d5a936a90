package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import QueryUtil._

/** Set operations + dedup — SURVEY.md §2.2 "Set ops".
  *
  * Reference evidence: J2 (first-row-wins dropDuplicates,
  * `/root/reference/src/generate_mapping.py:106`); union/intersect/except
  * are [E] extensions.
  *
  * Scale notes: INTERSECT/EXCEPT are aggregate-rewrites (shuffle on the
  * full row); UNION ALL is shuffle-free. `dropDuplicates(keys)` is a hash
  * aggregate on the keys — at 100 TB prefer it over `distinct()` on wide
  * rows so the shuffle carries keys + one surviving row per group.
  */
object SetOpQueries {

  val defs: Map[String, Q] = Map(
    // UNION ALL with provenance labels.
    "q_union_all" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_nationkey").as("nationkey"), lit("customer").as("src"))
      val sup = Tables.supplier(s, d)
        .select(col("s_nationkey").as("nationkey"), lit("supplier").as("src"))
      c.unionByName(sup)
        .groupBy(col("nationkey"), col("src"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("nationkey"), col("src"))
    }),

    // UNION BY NAME with schema drift: the sides name their columns in
    // different orders and the supplier side lacks `bal` entirely —
    // resolution is by NAME with NULL fill (allowMissingColumns), the
    // schema-evolution union a long-lived lakehouse needs. DuckDB's
    // `UNION ALL BY NAME` twin has the identical semantics.
    "q_union_by_name" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_custkey").as("id"), col("c_name").as("name"),
          col("c_acctbal").as("bal"), lit("c").as("src"))
      val sup = Tables.supplier(s, d)
        .select(lit("s").as("src"), col("s_name").as("name"),
          col("s_suppkey").as("id")) // different order, no bal
      c.unionByName(sup, allowMissingColumns = true)
        .orderBy(col("src"), col("id"))
    }),

    // INTERSECT: nation keys present on both sides.
    "q_intersect" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.intersect(sup).orderBy(col("nationkey"))
    }),

    // EXCEPT: nation keys with customers but no suppliers.
    "q_except" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.except(sup).orderBy(col("nationkey"))
    }),

    // Multiset variants: INTERSECT ALL / EXCEPT ALL preserve copies.
    "q_intersect_all" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.intersectAll(sup).groupBy(col("nationkey"))
        .agg(count(lit(1)).as("n_copies"))
        .orderBy(col("nationkey"))
    }),

    "q_except_all" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.exceptAll(sup).groupBy(col("nationkey"))
        .agg(count(lit(1)).as("n_copies"))
        .orderBy(col("nationkey"))
    }),

    // DISTINCT on a projection.
    "q_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // J2: deterministic first-row-wins dedup — keep the lowest orderkey
    // per customer (min_by mirrors the reference's setdefault semantics
    // once "first" is pinned to an explicit order).
    "q_dropdup_first_wins" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(
          min_by(col("o_orderkey"), col("o_orderkey")).as("first_orderkey"),
          min_by(col("o_orderstatus"), col("o_orderkey")).as("first_status"))
        .orderBy(col("o_custkey"))
    }),

    // Last-writer-wins upsert on immutable storage: current ∪ updates,
    // highest version per key survives (the MERGE-INTO-free form — at
    // 100 TB this is the compaction job that rewrites only affected
    // partitions). Updates are derived deterministically: every 10th
    // customer gets a new balance at version 1.
    "q_merge_upsert" -> ((s, d) => {
      val cur = Tables.customer(s, d).select(
        col("c_custkey"), col("c_name"),
        dec(col("c_acctbal")).cast("double").as("acctbal"), lit(0).as("version"))
      val upd = Tables.customer(s, d)
        .filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), col("c_name"),
          (dec(col("c_acctbal")) + 100).cast("double").as("acctbal"),
          lit(1).as("version"))
      // Winner by row_number over version, NOT max_by/arg_max: DuckDB's
      // arg_max skips NULL payloads while Spark's max_by returns them,
      // so the aggregate form silently diverges the moment an update
      // nulls a column — the row-wise form has identical semantics in
      // both engines by construction (and keeps the whole winning row
      // together, which is what an upsert means).
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_custkey")).orderBy(col("version").desc)
      cur.unionByName(upd)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_custkey"), col("c_name"), col("acctbal"), col("version"))
        .orderBy(col("c_custkey"))
    }),

    // SCD Type 2 merge: the same updates applied history-preserving —
    // changed keys get their current row CLOSED (valid_to stamped) plus
    // a new OPEN row; unchanged keys pass through. One shuffle on the
    // key; at scale the join is the standard dim-maintenance batch.
    "q_scd2_merge" -> ((s, d) => {
      val cur = Tables.customer(s, d).select(
        col("c_custkey"), dec(col("c_acctbal")).cast("double").as("acctbal"))
      val upd = Tables.customer(s, d)
        .filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"),
          (dec(col("c_acctbal")) + 100).cast("double").as("new_acctbal"))
      val joined = cur.join(upd, Seq("c_custkey"), "left")
      val closedOrCurrent = joined.select(
        col("c_custkey"), col("acctbal"),
        lit(0).as("valid_from"),
        when(col("new_acctbal").isNotNull, 1).as("valid_to"))
      val opened = joined.filter(col("new_acctbal").isNotNull).select(
        col("c_custkey"), col("new_acctbal").as("acctbal"),
        lit(1).as("valid_from"), lit(null).cast("int").as("valid_to"))
      closedOrCurrent.unionByName(opened)
        .orderBy(col("c_custkey"), col("valid_from"))
    }),

    // CDC snapshot diff: reconcile two snapshots of the same table into
    // the change feed a downstream consumer replays — every key
    // classified added / removed / changed by ONE full outer join on
    // the key, emitting only the delta (unchanged rows are the bulk at
    // 100 TB and never leave the join). Snapshots are derived
    // deterministically from orders: the "old" snapshot lacks keys
    // ≡0 (mod 89) (so they surface as added), the "new" one drops keys
    // ≡0 (mod 97) (removed) and bumps the price of keys ≡0 (mod 101)
    // (changed). Scale shape: both snapshots shuffle once on the key —
    // on a lakehouse both sides are bucketed on it and the join is
    // zero-shuffle; output is |delta|, not |table|.
    "q_snapshot_diff" -> ((s, d) => {
      def snap(dropMod: Int) = Tables.orders(s, d)
        .filter(col("o_orderkey") % dropMod =!= 0)
      val old = snap(89).select(
        col("o_orderkey"),
        dec(col("o_totalprice")).cast("double").as("old_price"),
        col("o_orderstatus").as("old_status"))
      val nw = snap(97).select(
        col("o_orderkey"),
        (dec(col("o_totalprice")) +
          when(col("o_orderkey") % 101 === 0, 25).otherwise(0))
          .cast("double").as("new_price"),
        col("o_orderstatus").as("new_status"))
      old.join(nw, Seq("o_orderkey"), "full_outer")
        .withColumn("change_type",
          when(col("old_price").isNull, "added")
            .when(col("new_price").isNull, "removed")
            .when(!(col("old_price") <=> col("new_price")) ||
              !(col("old_status") <=> col("new_status")), "changed"))
        .filter(col("change_type").isNotNull)
        .select(col("change_type"), col("o_orderkey"),
          col("old_price"), col("new_price"))
        .orderBy(col("change_type"), col("o_orderkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_union_all" ->
      """WITH u AS (
        |  SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier)
        |SELECT nationkey, src, COUNT(*) AS n FROM u
        |GROUP BY nationkey, src ORDER BY nationkey, src""".stripMargin,

    "q_union_by_name" ->
      """SELECT id, name, bal, src FROM (
        |  SELECT c_custkey AS id, c_name AS name, c_acctbal AS bal, 'c' AS src FROM customer
        |  UNION ALL BY NAME
        |  SELECT 's' AS src, s_name AS name, s_suppkey AS id FROM supplier)
        |ORDER BY src, id""".stripMargin,

    "q_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q_intersect_all" ->
      """WITH i AS (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT ALL
        |  SELECT s_nationkey FROM supplier)
        |SELECT nationkey, COUNT(*) AS n_copies FROM i
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,

    "q_except_all" ->
      """WITH x AS (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT ALL
        |  SELECT s_nationkey FROM supplier)
        |SELECT nationkey, COUNT(*) AS n_copies FROM x
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_dropdup_first_wins" ->
      """SELECT o_custkey,
        |  MIN(o_orderkey) AS first_orderkey,
        |  arg_min(o_orderstatus, o_orderkey) AS first_status
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_merge_upsert" ->
      """WITH cur AS (
        |  SELECT c_custkey, c_name,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,4)) AS DOUBLE) AS acctbal,
        |    0 AS version
        |  FROM customer),
        |upd AS (
        |  SELECT c_custkey, c_name,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,4)) + 100 AS DOUBLE) AS acctbal,
        |    1 AS version
        |  FROM customer WHERE c_custkey % 10 = 0),
        |u AS (SELECT * FROM cur UNION ALL SELECT * FROM upd),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY version DESC) AS rn
        |  FROM u)
        |SELECT c_custkey, c_name, acctbal, CAST(version AS INTEGER) AS version
        |FROM r WHERE rn = 1 ORDER BY c_custkey""".stripMargin,

    "q_scd2_merge" ->
      """WITH cur AS (
        |  SELECT c_custkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,4)) AS DOUBLE) AS acctbal
        |  FROM customer),
        |upd AS (
        |  SELECT c_custkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,4)) + 100 AS DOUBLE) AS new_acctbal
        |  FROM customer WHERE c_custkey % 10 = 0),
        |j AS (SELECT cur.c_custkey, cur.acctbal, upd.new_acctbal
        |      FROM cur LEFT JOIN upd ON upd.c_custkey = cur.c_custkey),
        |rows AS (
        |  SELECT c_custkey, acctbal, 0 AS valid_from,
        |    CASE WHEN new_acctbal IS NOT NULL THEN 1 END AS valid_to
        |  FROM j
        |  UNION ALL
        |  SELECT c_custkey, new_acctbal AS acctbal, 1 AS valid_from,
        |    CAST(NULL AS INTEGER) AS valid_to
        |  FROM j WHERE new_acctbal IS NOT NULL)
        |SELECT * FROM rows ORDER BY c_custkey, valid_from""".stripMargin,

    "q_snapshot_diff" ->
      """WITH old AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS old_price,
        |    o_orderstatus AS old_status
        |  FROM orders WHERE o_orderkey % 89 <> 0),
        |nw AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) +
        |      CASE WHEN o_orderkey % 101 = 0 THEN 25 ELSE 0 END AS DOUBLE) AS new_price,
        |    o_orderstatus AS new_status
        |  FROM orders WHERE o_orderkey % 97 <> 0),
        |j AS (
        |  SELECT COALESCE(old.o_orderkey, nw.o_orderkey) AS o_orderkey,
        |    old_price, old_status, new_price, new_status
        |  FROM old FULL OUTER JOIN nw ON old.o_orderkey = nw.o_orderkey)
        |SELECT
        |  CASE WHEN old_price IS NULL THEN 'added'
        |       WHEN new_price IS NULL THEN 'removed'
        |       WHEN old_price IS DISTINCT FROM new_price
        |         OR old_status IS DISTINCT FROM new_status THEN 'changed'
        |  END AS change_type,
        |  o_orderkey, old_price, new_price
        |FROM j
        |WHERE CASE WHEN old_price IS NULL THEN 'added'
        |           WHEN new_price IS NULL THEN 'removed'
        |           WHEN old_price IS DISTINCT FROM new_price
        |             OR old_status IS DISTINCT FROM new_status THEN 'changed'
        |      END IS NOT NULL
        |ORDER BY change_type, o_orderkey""".stripMargin
  )
}
