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
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin
  )
}
