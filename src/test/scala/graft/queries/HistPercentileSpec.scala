package graft.queries

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Pins the round-14 q_mad_outliers / q_winsorize histogram re-shape:
  * frequency-weighted `percentile(v, p, cnt)` over a (group, value)
  * histogram must equal plain `percentile(v, p)` over the raw rows
  * BIT-FOR-BIT (same Percentile buffer keyed by distinct values —
  * the claim that lets the queries scan once and keep per-group state
  * domain-bounded), and the shipped queries must equal their
  * pre-round-14 raw-row forms exactly.
  */
class HistPercentileSpec extends SparkTestBase {
  import spark.implicits._

  private def check(df: org.apache.spark.sql.DataFrame, group: String,
      value: String, ps: Seq[(String, Double)]): Unit = {
    val hist = df.groupBy(col(group), col(value))
      .agg(count(lit(1)).as("cnt"))
    val gotAggs = ps.map { case (nm, p) =>
      percentile(col(value), lit(p), col("cnt")).as(nm) }
    val got = hist.groupBy(col(group)).agg(gotAggs.head, gotAggs.tail: _*)
    val refAggs = ps.map { case (nm, p) =>
      percentile(col(value), lit(p)).as(nm) }
    val ref = df.groupBy(col(group)).agg(refAggs.head, refAggs.tail: _*)
    val cols = ps.map(_._1)
    val j = got.join(ref.toDF((group +: cols.map(_ + "_ref")): _*), group)
    val bad = j.filter(cols.map(c =>
      col(c) =!= col(c + "_ref")).reduce(_ || _)).collect()
    assert(bad.isEmpty, s"bit mismatch rows: ${bad.mkString("; ")}")
    assert(got.count() == ref.count())
  }

  test("frequency-weighted percentile over a histogram matches raw rows") {
    val rnd = new scala.util.Random(42)
    // duplicate-heavy small value domain: interpolation ranks routinely
    // straddle and land inside single histogram rows
    val rows = (1 to 4000).map { _ =>
      (s"g${rnd.nextInt(7)}", (rnd.nextInt(40) * 25).toDouble / 100.0 * 100)
    } ++ Seq(("solo", 123.25)) // 1-row group: position 0, no interpolation
    check(rows.toDF("g", "v"), "g", "v",
      Seq("p05" -> 0.05, "med" -> 0.5, "p95" -> 0.95))
  }

  test("sf0.01 lineitem price and deviation frames match raw-row percentile") {
    val li = Tables.lineitem(spark, sf("0.01"))
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    check(li, "g", "v", Seq("p05" -> 0.05, "med" -> 0.5, "p95" -> 0.95))
    // the MAD second pass: absolute deviations from the group median
    val med = li.groupBy("g").agg(median(col("v")).as("m"))
    val dev = li.join(broadcast(med), Seq("g"))
      .select(col("g"), abs(col("v") - col("m")).as("v"))
    check(dev, "g", "v", Seq("mad" -> 0.5))
  }

  test("q_mad_outliers and q_winsorize equal their pre-round-14 forms") {
    val d = sf("0.01")
    val li = Tables.lineitem(spark, d)
      .select(col("l_returnflag"), col("l_extendedprice"))
    // pre-round-14 q_mad_outliers, kept verbatim
    val medR = li.groupBy(col("l_returnflag"))
      .agg(median(col("l_extendedprice")).as("med"))
    val devR = li.join(broadcast(medR), Seq("l_returnflag"))
      .withColumn("adev", abs(col("l_extendedprice") - col("med")))
    val madsR = devR.groupBy(col("l_returnflag"))
      .agg(median(col("adev")).as("mad"))
    val madRef = devR.join(broadcast(madsR), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        sum(when(col("adev") > lit(3.0) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
    val madGot = graft.SparkEntry.queries("q_mad_outliers")(spark, d)
    assert(madGot.exceptAll(madRef).isEmpty && madRef.exceptAll(madGot).isEmpty,
      s"mad mismatch:\ngot ${madGot.collect().mkString(";")}\n" +
        s"ref ${madRef.collect().mkString(";")}")
    // pre-round-14 q_winsorize, kept verbatim
    val pctR = li.groupBy(col("l_returnflag")).agg(
      percentile(col("l_extendedprice"), lit(0.05)).as("p05"),
      percentile(col("l_extendedprice"), lit(0.95)).as("p95"))
    val winRef = li.join(broadcast(pctR), Seq("l_returnflag"))
      .withColumn("w",
        least(greatest(col("l_extendedprice"), col("p05")), col("p95")))
      .groupBy(col("l_returnflag"))
      .agg(max(col("p05")).as("p05"), max(col("p95")).as("p95"),
        count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") < col("p05"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("l_extendedprice") > col("p95"), 1L).otherwise(0L)).as("n_high"),
        sum(QueryUtil.dec(col("w"))).cast(DoubleType).as("winsor_sum"))
    val winGot = graft.SparkEntry.queries("q_winsorize")(spark, d)
    assert(winGot.exceptAll(winRef).isEmpty && winRef.exceptAll(winGot).isEmpty,
      s"winsorize mismatch:\ngot ${winGot.collect().mkString(";")}\n" +
        s"ref ${winRef.collect().mkString(";")}")
  }
}
