package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive near-dup clustering: connected components over a pair
  * graph by iterative min-label propagation (SURVEY.md §2.2 "LLM ops" —
  * the step after candidate generation: MinHash pairs say "a~b, b~c";
  * dedup needs the {a,b,c} cluster and one canonical survivor).
  *
  * Each iteration is one join + aggregate over (node, label) — the
  * standard large-graph CC in the relational model (no graph library
  * needed). Iterations bound by graph diameter; the driver loop checks a
  * fixpoint via a count (an action per round, as any iterate-to-
  * convergence job). At 100 TB-scale this is the same alternating
  * join/groupBy shape used by GraphFrames' CC; labels are (id, long)
  * pairs only.
  */
object DedupClusters {

  /** Frontier size at or below which the round's delta semi-join
    * forces a broadcast: the frontier is an ids-only frame, so even
    * the cap is ~tens of MB — and past it AQE decides from runtime
    * sizes instead. */
  private val FrontierBroadcastCap = 4000000L

  /** nodes: single column `id`; edges: `src`, `dst` (undirected input —
    * symmetrized internally). Returns (id, cluster_rep) where
    * cluster_rep = min id reachable. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 25): DataFrame = {
    val spark = nodes.sparkSession
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .cache()
    // localCheckpoint (eager) per round: truncates the logical plan,
    // which otherwise deepens every iteration and blows up analysis
    // memory long before the data does.
    var labels = nodes.select(col("id"), col("id").as("label")).localCheckpoint(true)
    // DELTA propagation (round 8): labels only decrease, and each round
    // merges with least(current, incoming) — so an incoming min from a
    // node whose label did NOT change last round was already applied
    // then and can be skipped. Rounds 2+ therefore restrict the edge-
    // side join to sources in the previous round's change frontier
    // (which shrinks geometrically once the big components settle):
    // the frontier broadcast-semi-joins the cached edge frame, so the
    // 2|E|-row set is only SCANNED, never re-shuffled, and the
    // neighbor aggregate moves O(active edges) instead of O(|E|).
    // Pointer jumping always runs on the full O(nodes) frame, and a
    // jump-induced change re-enters the frontier, so the fixpoint is
    // unchanged: converged means NO label moved in a round, at which
    // point no future round (delta or full) could move one either.
    var frontierCount = -1L // <0: first round, no restriction
    var frontier: DataFrame = null
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // (1) neighbor round: label(n) <- min over CANDIDATE neighbors m
      // of label(m), candidates = all in round 1, changed-last-round
      // after.
      val active =
        if (frontierCount < 0) sym
        else if (frontierCount <= FrontierBroadcastCap)
          sym.join(broadcast(frontier.withColumnRenamed("id", "src")),
            Seq("src"), "left_semi")
        else sym.join(frontier.withColumnRenamed("id", "src"),
          Seq("src"), "left_semi")
      val viaNeighbors = active
        .join(labels, active("src") === labels("id"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nlabel"))
      val stepped = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"), col("label").as("olabel"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
      // (2) pointer-jumping round: label(n) <- label(label(n)) — halves
      // the remaining path length each iteration, so convergence is
      // O(log diameter) instead of O(diameter) (a pure neighbor loop
      // would silently return partial labels on any chain longer than
      // maxIter).
      val byId = stepped.select(col("id").as("jid"), col("label").as("jlabel"))
      // The round's OLD label rides along, so the frontier derivation
      // below is a scan of the checkpointed result — not a third
      // old-vs-new join per round.
      val next = stepped
        .join(byId, stepped("label") === byId("jid"), "left")
        .select(col("id"), col("olabel"),
          least(col("label"), coalesce(col("jlabel"), col("label"))).as("label"))
        .localCheckpoint(true)
      frontier = next
        .filter(col("label") =!= col("olabel"))
        .select(col("id"))
      // Full count (not limit(1)): the size also gates the broadcast
      // hint above; it scans the checkpointed frame only.
      frontierCount = frontier.count()
      labels = next.select(col("id"), col("label"))
      converged = frontierCount == 0
      i += 1
    }
    require(converged,
      s"connectedComponents did not converge within $maxIter rounds")
    sym.unpersist()
    labels.withColumnRenamed("label", "cluster_rep")
  }
}
