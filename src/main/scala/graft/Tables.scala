package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver test tables (`/root/repo/TESTDATA.md`,
  * `/root/repo/FIXTURES.md` §B). One parquet file per table; schemas are
  * fixed by the driver, so we read them as-is (Catalyst prunes columns and
  * pushes filters into the vectorized parquet reader — see SURVEY.md §4).
  *
  * 100 TB note: at scale these would be partitioned datasets (e.g. lineitem
  * partitioned by ship-month); `spark.read.parquet(dir)` handles either a
  * single file or a partitioned directory tree transparently, so every
  * query in this library is written against the logical table only.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** int64-nanos column → micros timestamp_ntz, by INTEGRAL division
    * (a double-routed /1000 would lose micros at nano magnitudes).
    * Shared by the read path and ScaleUp so replicas can never diverge
    * from the driver-file conversion. */
  private[graft] def nanosToNtz(colName: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(
      s"CAST(timestamp_micros($colName div 1000) AS TIMESTAMP_NTZ)")

  /** The driver's `events.ts` is parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects; read it as raw nanos and floor-convert
    * to a microsecond timestamp_ntz (identical to DuckDB's own
    * nanos->micros truncation, so oracle comparisons agree). A ScaleUp
    * replica already stores micros timestamp_ntz — pass it through. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", nanosToNtz("ts"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** The documents corpus through a MULTI-FILE layout, side-written once
    * per (sfDir, tmpdir) behind a `._COMPLETE` marker: the driver
    * fixture is one small parquet file = one scan split, which would
    * serialize the shingle/hash map stages on a single local thread. At
    * real scale the corpus is already thousands of files and this layer
    * is a pass-through — query bodies see a plain parquet scan either
    * way, so gated plans carry NO local-only repartition operator
    * (retired round 5; it previously lived inside every dedup query). */
  def documentsSpread(s: SparkSession, d: String): DataFrame = synchronized {
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_docs_spread_" +
      d.replaceAll("[^0-9a-zA-Z.]", "_")
    val marker = new java.io.File(tmp + "._COMPLETE")
    if (!marker.exists()) {
      load(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(tmp)
      marker.createNewFile()
    }
    s.read.parquet(tmp)
  }
}
