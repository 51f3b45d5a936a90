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

  /** Exact decimal sum surfaced as DOUBLE. Routed through INTEGER CENTS
    * with a SCALE-0 decimal sum: every dsum'd column is 2-decimal money/
    * quantity data, so `round(x*100)` is an exact integral double, the
    * sum is exact, and the final decimal→double conversion has no
    * scaling division — which is what made the old DECIMAL(18,4) form
    * diverge from DuckDB by 1 ulp once sums passed 2^53 ulps (DuckDB
    * converts scaled decimals via multiply-by-inverse, Java by exact
    * rounding; observed on the 10× replica, SCALE.md). The trailing
    * /100.0 divides the SAME exact double in both engines. */
  def dsum(c: Column): Column =
    sum(round(c * 100).cast(DecimalType(38, 0))).cast(DoubleType) / 100.0

  /** Deterministic average: exact cents sum, double division. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Exact discounted-revenue sum Σ price·(1−disc) for 2-decimal price
    * and discount: integer units of 10⁻⁴ dollars (cents × percent), same
    * scale-0 route as [[dsum]] — this product was the one remaining
    * scale-4 sum and the source of both 1-ulp 10× residuals. */
  def dsumRev(price: Column, disc: Column): Column =
    sum((round(price * 100) * (lit(100) - round(disc * 100)))
      .cast(DecimalType(38, 0))).cast(DoubleType) / 10000.0

  /** SQL-side twin fragments (kept next to the Scala forms above). */
  def sqlDsum(x: String): String =
    s"(CAST(SUM(CAST(round(($x) * 100) AS DECIMAL(38,0))) AS DOUBLE) / 100.0)"
  def sqlDavg(x: String): String = s"${sqlDsum(x)} / COUNT($x)"
  def sqlDsumRev(p: String, dc: String): String =
    s"(CAST(SUM(CAST(round(($p) * 100) * (100 - round(($dc) * 100)) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0)"
}
