package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The sharedTable cross-JVM idempotence protocol (round-9 verdict
  * item 5): stage under a unique external location, atomic-rename as
  * the commit point, re-register over existing complete data without
  * rebuilding. A second "JVM" is simulated by dropping the external
  * table from the in-memory catalog (exactly the state a fresh JVM
  * starts in: empty catalog, surviving warehouse directory).
  */
class SharedTableSpec extends SparkTestBase {
  import spark.implicits._

  // Unique per-run suffixes: the warehouse directory SURVIVES across
  // sbt invocations (that persistence is the feature under test), so a
  // fixed suffix would hit the reuse path on the second run and make
  // the builds-once assertion vacuous.
  private val runTag =
    java.util.UUID.randomUUID.toString.replace("-", "").take(8)

  test("sharedTable builds once, then re-registers over existing data " +
      "without invoking the build again") {
    var builds = 0
    def make() = QueryUtil.sharedTable(
      spark, "/tmp/shared_spec_dir", s"spec_t1_$runTag", "k", Seq("k")) {
      builds += 1
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
    }
    val first = make().orderBy("k").collect()
    assert(builds === 1)
    // simulate a fresh JVM: catalog forgets, warehouse dir survives
    val tbl = spark.catalog.listTables()
      .filter($"name".startsWith(s"graft_spec_t1_$runTag")).collect().head.name
    spark.sql(s"DROP TABLE $tbl") // external — metadata only
    val second = make().orderBy("k").collect()
    assert(builds === 1, "second registration must NOT rebuild")
    assert(second.toSeq === first.toSeq)
  }

  test("re-registered table keeps its bucketing (bucket-aligned self-join " +
      "plans zero shuffle exchanges)") {
    def make() = QueryUtil.sharedTable(
      spark, "/tmp/shared_spec_dir", s"spec_t2_$runTag", "k", Seq("k")) {
      spark.range(0, 1000).select($"id".as("k"), ($"id" % 7).as("x"))
    }
    make()
    val tbl = spark.catalog.listTables()
      .filter($"name".startsWith(s"graft_spec_t2_$runTag")).collect().head.name
    spark.sql(s"DROP TABLE $tbl")
    val t = make()
    val joined = t.join(t.select($"k", $"x".as("y")), Seq("k"))
      .filter($"x" === $"y")
    val shuffles = "(?m)(?<!Broadcast)Exchange (hash|range|Single)".r
      .findAllIn(joined.queryExecution.executedPlan.toString).size
    assert(shuffles === 0,
      s"bucketed self-join must be exchange-free:\n" +
        joined.queryExecution.executedPlan)
  }

  test("an orphan staging directory is ignored by registration and a " +
      "rename loser cleans up after itself") {
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // leave a fake interrupted-run staging dir next to the real table
    val orphan = new org.apache.hadoop.fs.Path(
      warehouse, s"graft_spec_t3_${runTag}_stg_deadbeef")
    fs.mkdirs(orphan)
    val t = QueryUtil.sharedTable(
      spark, "/tmp/shared_spec_dir", s"spec_t3_$runTag", "k", Seq("k")) {
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    }
    assert(t.count() === 2)
    assert(fs.exists(orphan), "orphans are inert, not load-bearing")
    fs.delete(orphan, true)
  }

  test("lost race where the destination appears AFTER the exists check: " +
      "the move-into rename leaves no nested duplicate of the data") {
    import org.apache.hadoop.fs.Path
    val warehouse = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val realFs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val loc = new Path(warehouse, s"graft_spec_t4_$runTag")
    val stgLoc = new Path(warehouse, s"graft_spec_t4_${runTag}_stg_loser")
    // the winner's committed table: one data file directly under loc
    realFs.mkdirs(loc)
    val winnerFile = new Path(loc, "part-winner.parquet")
    realFs.create(winnerFile).close()
    // the loser's staged copy of the same table
    realFs.mkdirs(stgLoc)
    realFs.create(new Path(stgLoc, "part-loser.parquet")).close()
    // Simulate the TOCTOU window: the loser's exists(loc) check returns
    // a STALE false (the winner commits immediately after), so
    // commitStaged proceeds to rename — which on the local FS MOVES the
    // staging dir INTO the existing destination and reports success.
    val raceFs = new org.apache.hadoop.fs.FilterFileSystem(realFs) {
      private var stale = true
      override def exists(p: Path): Boolean =
        if (stale && p == loc) { stale = false; false } else super.exists(p)
    }
    QueryUtil.commitStaged(raceFs, stgLoc, loc)
    assert(realFs.exists(winnerFile), "winner's data must survive")
    assert(!realFs.exists(new Path(loc, stgLoc.getName)),
      "loser's staged dir must not persist nested inside the winner's " +
        "table (a recursive listing would double every row)")
    assert(!realFs.exists(stgLoc), "loser's staging dir must be gone")
    assert(realFs.listStatus(loc).map(_.getPath.getName).toSeq ===
      Seq("part-winner.parquet"))
    realFs.delete(loc, true)
  }
}
