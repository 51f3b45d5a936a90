package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryUtil._

/** Pivot, exact ordered-statistics, and the `spark.sql` entry surface
  * (scalar + correlated subqueries over temp views) — rounding out
  * SURVEY.md §2.2's aggregation/SQL coverage.
  */
object SqlQueries {

  /** Shared ANSI text for the subquery demo: valid verbatim in BOTH
    * Spark SQL and DuckDB (the scalar subquery routes through the
    * exact-decimal average so the threshold is bit-identical). */
  private val subquerySql =
    """SELECT c.c_mktsegment, COUNT(*) AS n_big
      |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      |WHERE o.o_totalprice >
      |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
      |   FROM orders)
      |  AND EXISTS (SELECT 1 FROM orders o2
      |              WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
      |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin

  /** Shared verbatim: EXISTS / NOT EXISTS anti-pattern pair. Catalyst
    * rewrites these to left-semi and left-anti joins (RewritePredicate-
    * Subquery) — the subqueries never materialize. */
  private val existsSql =
    """SELECT c.c_custkey, c.c_name
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderpriority = '1-URGENT')
      |  AND NOT EXISTS (SELECT 1 FROM orders o2
      |                  WHERE o2.o_custkey = c.c_custkey
      |                    AND o2.o_orderstatus = 'F')
      |ORDER BY c.c_custkey""".stripMargin

  /** Shared verbatim: WITH chain where the second CTE aggregates the
    * first and the final select joins both (revenue share per nation).
    * The exact-decimal sums keep rev and rev_share bit-identical. */
  private val cteSql =
    """WITH nat_rev AS (
      |  SELECT c.c_nationkey AS nationkey,
      |    CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY c.c_nationkey),
      |tot AS (
      |  SELECT CAST(SUM(CAST(rev AS DECIMAL(18,4))) AS DOUBLE) AS t FROM nat_rev)
      |SELECT n.n_name, nat_rev.rev, nat_rev.rev / tot.t AS rev_share
      |FROM nat_rev
      |JOIN nation n ON n.n_nationkey = nat_rev.nationkey
      |CROSS JOIN tot
      |ORDER BY n.n_name""".stripMargin

  val defs: Map[String, Q] = Map(
    // Pivot: one column per line status, exact decimal sums.
    "q_pivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity")))
        .orderBy(col("l_returnflag"))
    }),

    // Unpivot/melt: wide metric columns to (metric, value) rows.
    "q_unpivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_discount"), col("l_tax"))
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          variableColumnName = "metric",
          valueColumnName = "value")
        .groupBy(col("metric"))
        .agg(dsum(col("value")).as("sum_value"), count(lit(1)).as("n"))
        .orderBy(col("metric"))
    }),

    // Exact ordered statistics (median + interpolated percentiles).
    "q_median_percentile" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          median(col("l_quantity")).as("med_qty"),
          percentile(col("l_quantity"), lit(0.25)).as("p25_qty"),
          percentile(col("l_quantity"), lit(0.75)).as("p75_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // spark.sql entry with a scalar subquery + correlated EXISTS — the
    // SQL text is shared verbatim with the DuckDB oracle.
    "q_sql_subquery" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(subquerySql)
    }),

    // EXISTS / NOT EXISTS — planned as left-semi + left-anti joins.
    "q_sql_exists" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(existsSql)
    }),

    // Chained CTEs with a cross-joined grand total.
    "q_sql_cte" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      s.sql(cteSql)
    }),

    // LATERAL VIEW explode (HiveQL generator syntax) — the spark.sql
    // twin of the DataFrame explode; the oracle uses DuckDB's unnest.
    "q_sql_lateral" -> ((s, d) => {
      Tables.documents(s, d).createOrReplaceTempView("documents")
      s.sql(
        """SELECT doc_id, term, COUNT(*) AS n
          |FROM documents LATERAL VIEW explode(split(text, ' ')) x AS term
          |GROUP BY doc_id, term HAVING COUNT(*) >= 8
          |ORDER BY doc_id, term""".stripMargin)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_pivot" ->
      s"""SELECT l_returnflag,
         |  ${sqlDsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS "F",
         |  ${sqlDsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS "O"
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_unpivot" ->
      s"""WITH u AS (
         |  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
         |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
         |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
         |SELECT metric, ${sqlDsum("value")} AS sum_value, COUNT(*) AS n
         |FROM u GROUP BY metric ORDER BY metric""".stripMargin,

    "q_median_percentile" ->
      """SELECT l_returnflag,
        |  median(l_quantity) AS med_qty,
        |  quantile_cont(l_quantity, 0.25) AS p25_qty,
        |  quantile_cont(l_quantity, 0.75) AS p75_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_sql_subquery" -> subquerySql,

    "q_sql_exists" -> existsSql,

    "q_sql_cte" -> cteSql,

    "q_sql_lateral" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |SELECT doc_id, term, COUNT(*) AS n
        |FROM toks GROUP BY doc_id, term HAVING COUNT(*) >= 8
        |ORDER BY doc_id, term""".stripMargin
  )
}
