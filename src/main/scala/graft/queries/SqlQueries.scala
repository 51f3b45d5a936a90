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

    "q_sql_subquery" -> subquerySql
  )
}
