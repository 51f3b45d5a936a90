package graft.operators

import graft.SparkTestBase

/** Min-label propagation CC vs a sequential union-find on random graphs. */
class DedupClustersSpec extends SparkTestBase {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to canonical min (union-by-min keeps root = min id)
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("multi-hop chains resolve to the min id across partitions") {
    // chain 0-1-2-3-4 plus isolated 5 and pair 6-7
    val edges = Seq((1L, 0L), (1L, 2L), (3L, 2L), (4L, 3L), (7L, 6L))
    val nodes = (0L to 7L).toDF("id").repartition(4)
    val got = DedupClusters.connectedComponents(nodes, edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      5L -> 5L, 6L -> 6L, 7L -> 6L))
  }

  test("a 400-node chain converges via pointer jumping (far under maxIter rounds)") {
    val n = 400
    val edges = (1 until n).map(i => (i.toLong, (i - 1).toLong))
    val nodes = (0L until n.toLong).toDF("id").repartition(8)
    val got = DedupClusters.connectedComponents(nodes, edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet === Set(0L), "every chain node must resolve to 0")
  }

  test("random graphs match sequential union-find (10 seeded trials)") {
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(seed)
      val n = 30
      val edges = (0 until 25).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val nodes = (0L until n.toLong).toDF("id").repartition(5)
      val got = DedupClusters.connectedComponents(nodes, edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === unionFind(n, edges), s"seed=$seed")
    }
  }
}
