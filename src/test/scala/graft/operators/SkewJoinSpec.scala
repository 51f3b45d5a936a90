package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Salting preserves join semantics and spreads hot keys. */
class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("salted inner join ≡ plain inner join on skewed events⋈user-dim") {
    // events.user_id is the documented skew risk (SURVEY.md §7); build a
    // small user dim and join both ways.
    val events = Tables.events(spark, sf())
    val users = events.groupBy($"user_id").agg(count(lit(1)).as("n_events"))

    val plain = events.join(users, Seq("user_id"))
      .groupBy($"user_id").agg(count(lit(1)).as("n"), sum($"n_events").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val salted = SkewJoin.saltedInnerJoin(events, users, "user_id",
        saltSource = $"event_id", saltBuckets = 8)
      .groupBy($"user_id").agg(count(lit(1)).as("n"), sum($"n_events").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    assert(salted === plain)
  }

  test("salt scatters a hot key across buckets") {
    val hot = Seq.tabulate(1000)(i => (42L, i.toLong)).toDF("k", "payload")
    val dim = Seq((42L, "x")).toDF("k", "v")
    val joined = SkewJoin.saltedInnerJoin(hot, dim, "k", $"payload", 8)
    assert(joined.count() === 1000)
    // the salt expression itself spreads the hot key over all 8 buckets
    val buckets = hot.select(pmod(hash($"payload"), lit(8)).as("b"))
      .distinct().count()
    assert(buckets === 8)
  }
}
