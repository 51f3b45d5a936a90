package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for the oracle-checked query library.
  *
  * Determinism contract with the DuckDB oracle (driver compares parquet
  * outputs value-by-value after sorting columns by name):
  *   - Every query ends in a total ORDER BY (unique key last) and the SQL
  *     twin carries the identical ORDER BY with explicit NULLS FIRST to
  *     match Spark's asc default.
  *   - Floating aggregates go through exact DECIMAL sums and are cast to
  *     DOUBLE only at the end: decimal -> double conversion is
  *     round-to-nearest in both engines, so results are bit-identical and
  *     independent of partial-aggregation order (a plain sum(double) is
  *     NOT reproducible across partitionings).
  *   - No raw TIMESTAMP columns in outputs (Spark writes UTC-adjusted
  *     micros, DuckDB naive micros); dates/strings/epoch instead.
  *   - Integer sums are BIGINT on both sides (DuckDB's sum(BIGINT) is
  *     HUGEINT, so the SQL twin casts).
  */
object QueryUtil {
  /** (SparkSession, sfDir) => result — the driver's query signature. */
  type Q = (SparkSession, String) => DataFrame

  /** Exact per-value decimal view of a double column: deterministic
    * (round-half-up at 4 fractional digits, never an exact tie for binary
    * doubles) and makes downstream sums order-independent. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Exact decimal sum surfaced as DOUBLE (bit-identical in DuckDB via
    * `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`). */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Deterministic average: exact decimal sum, double division. The SQL
    * twin is `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(x)`. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL-side twin fragments (kept next to the Scala forms above). */
  def sqlDsum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"
  def sqlDavg(x: String): String = s"${sqlDsum(x)} / COUNT($x)"
}
