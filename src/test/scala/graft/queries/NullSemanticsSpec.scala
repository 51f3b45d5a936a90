package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** SURVEY.md §5 property commitment: the null-keeping inequality idiom
  * `!(a <=> v)` must agree with the reference's Python semantics
  * (`x != v` where x may be None — None rows are KEPT) on randomized
  * nullable data, where a plain SQL `<>` silently drops them.
  */
class NullSemanticsSpec extends SparkTestBase {
  import spark.implicits._

  test("!(a <=> v) ≡ Python != on nullable columns (20 seeded trials)") {
    for (seed <- 0 until 20) {
      val rnd = new scala.util.Random(seed)
      val domain = Array(Some(1), Some(10), Some(42), None)
      val rows = (0 until 50).map(i => (i, domain(rnd.nextInt(domain.length))))
      val keepPython = rows.filter { case (_, v) => v != Some(10) }.map(_._1).toSet

      val df = rows.toDF("id", "v")
      val keepSpark = df.filter(!($"v" <=> 10)).select("id").as[Int].collect().toSet
      assert(keepSpark === keepPython, s"seed=$seed")

      // and the trap the idiom avoids: plain =!= drops every NULL row
      val naive = df.filter($"v" =!= 10).select("id").as[Int].collect().toSet
      val nullIds = rows.filter(_._2.isEmpty).map(_._1).toSet
      assert(naive === keepPython -- nullIds, s"seed=$seed (naive <> semantics)")
    }
  }
}
