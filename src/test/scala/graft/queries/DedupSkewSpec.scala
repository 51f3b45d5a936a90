package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The oversized-bucket cap promised in SCALE.md: a degenerate band
  * (many identical documents → every band hashes them into ONE bucket)
  * must complete with a LINEAR number of candidate pairs (star-linked to
  * the bucket representative), and the verified transitive-dedup result
  * must be identical to what uncapped all-pairs clustering would give.
  */
class DedupSkewSpec extends SparkTestBase {
  import spark.implicits._

  private val nDup = 150 // > BUCKET_CAP (64): forces the star fallback
  private val boiler = "the quick brown fox jumps over the lazy dog again and again"

  private def docs = {
    val dups = (0L until nDup.toLong).map(i => (i, "web", boiler))
    val uniques = Seq(
      (1000L, "web", "completely different text about spark catalyst optimizer internals"),
      (1001L, "web", "yet another unrelated document discussing parquet column pruning"),
      (1002L, "web", "a third standalone text mentioning adaptive query execution plans"))
    (dups ++ uniques).toDF("doc_id", "source", "text")
  }

  test("degenerate band: candidate pairs are star-linked and bounded") {
    val pairs = DedupQueries.cappedBucketPairs(
      DedupQueries.bandedSignaturesOf(docs)).collect()
    // Uncapped all-pairs would be 150*149/2 = 11,175 inside the bucket;
    // the star fallback emits exactly n-1 pairs, all anchored at the
    // min-id representative.
    val dupPairs = pairs.filter(_.getLong(1) < 1000L)
    assert(dupPairs.length === nDup - 1,
      s"expected ${nDup - 1} star pairs, got ${dupPairs.length}")
    assert(dupPairs.forall(_.getLong(0) === 0L),
      "star pairs must anchor at the bucket's min doc_id")
    assert(pairs.length < nDup + 10, s"pair count not bounded: ${pairs.length}")
  }

  test("degenerate band: verified clustering identical to uncapped all-pairs") {
    val verified = DedupQueries.verifiedPairsOf(docs)
    // Identical docs ⇒ jaccard 1.0 on every star pair: verification
    // keeps them all.
    assert(verified.filter($"jaccard" === 1.0).count() === (nDup - 1).toLong)
    val edges = verified.select($"id_a".as("src"), $"id_b".as("dst"))
    val nodes = docs.select($"doc_id".as("id"))
    val clusters = graft.operators.DedupClusters.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Same result as uncapped: every identical doc collapses to rep 0,
    // every unique doc survives as its own cluster.
    (0L until nDup.toLong).foreach(i => assert(clusters(i) === 0L, s"doc $i"))
    Seq(1000L, 1001L, 1002L).foreach(i => assert(clusters(i) === i, s"doc $i"))
  }
}
