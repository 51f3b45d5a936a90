package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full per-operator inventory of SURVEY.md §2.2, one
  * entry per operator surface; `oracleSql` carries the DuckDB twin for
  * every SQL-expressible entry (identical column names, identical ORDER
  * BY, doubles routed through exact decimals — see
  * `graft.queries.QueryUtil` for the determinism contract).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.defs("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++
      AggQueries.defs ++
      JoinQueries.defs ++
      WindowQueries.defs ++
      SetOpQueries.defs ++
      FunctionQueries.defs ++
      EventQueries.defs ++
      TextQueries.defs ++
      TrainPrepQueries.defs ++
      DedupQueries.defs ++
      SimilarityQueries.defs ++
      ClinicalQueries.defs ++
      GraphQueries.defs ++
      SqlQueries.defs

  /** DuckDB twin for each SQL-expressible query (same parquet tables).
    * Keys absent here (approx sketches, binary scans) get the driver's
    * weaker rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++
      AggQueries.oracle ++
      JoinQueries.oracle ++
      WindowQueries.oracle ++
      SetOpQueries.oracle ++
      FunctionQueries.oracle ++
      EventQueries.oracle ++
      TextQueries.oracle ++
      TrainPrepQueries.oracle ++
      DedupQueries.oracle ++
      SimilarityQueries.oracle ++
      ClinicalQueries.oracle ++
      GraphQueries.oracle ++
      SqlQueries.oracle
}
