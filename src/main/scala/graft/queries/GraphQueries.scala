package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryUtil._

/** Graph analytics over the TPC-H-ish relations — SURVEY.md §2.2 [E]
  * "analytics" extensions beyond the connected-components operator
  * (`graft.operators.DedupClusters`): a fixed-iteration PageRank.
  *
  * The graph is the undirected customer↔supplier trade graph derived
  * from lineitem⋈orders (distinct pairs; node ids prefixed `c`/`s` so
  * the two key spaces cannot collide).
  *
  * Determinism contract: ranks are FIXED-POINT BIGINT micro-units
  * (1e6 = 1.0) and every step is integer arithmetic — floor division
  * for the per-edge share (`DIV` here, `//` in DuckDB) and for the 0.85
  * damping — so partial-aggregation order cannot perturb a single bit
  * and the DuckDB twin unrolls the same three iterations exactly.
  * Dangling mass is dropped (the standard simplification; every node
  * still receives the 0.15 base).
  *
  * Scale shape (100 TB): per iteration one shuffle — contributions
  * grouped by destination (map-side partial sums over BIGINTs) — plus a
  * join of ranks to edges on the source key. Edges/outdeg are computed
  * once and reused across iterations; iteration count is fixed (3), so
  * the whole job is 3 bounded shuffles, not a convergence loop. At
  * billions of edges this is exactly GraphX/Pregel's data layout
  * expressed relationally, with AQE handling hub-node skew.
  */
object GraphQueries {

  private val Iters = 3
  /** Exposed for BucketingSpec's exchange-count plan assertion. */
  private[graft] def ItersForTest: Int = Iters

  private val Unit = 1000000L // 1.0 in micro-units
  private val Base = 150000L  // 0.15 * Unit

  /** Distinct undirected trade edges, both directions materialized. */
  private def edges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val cs = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("cust"),
        concat(lit("s"), col("l_suppkey")).as("supp"))
      .distinct()
    cs.select(col("cust").as("src"), col("supp").as("dst"))
      .unionAll(cs.select(col("supp").as("src"), col("cust").as("dst")))
  }

  /** The same shared (src, dst, outdeg) edge materialization as
    * [[bucketedEdges]], read METADATA-BLIND (plain parquet by path, no
    * bucket info): identical rows, but the scan reports no output
    * partitioning, so each iteration's ranks⋈edges join must Exchange
    * the full edge side. This is the flat twins' whole point — the
    * per-iteration plan-shape contrast against the bucketed forms —
    * without re-paying the lineitem⋈orders+distinct edge DERIVATION
    * per run (round-12: that derivation plus its 80 M-row
    * localCheckpoint was ~20% of the 100× fleet wall and the locus of
    * the GCLocker OOM crashes; the `SPARK_GRAFT_FLAT_GRAPH_ITERS`
    * crutch it forced is gone with it). */
  private def flatEdges(s: SparkSession, d: String): DataFrame =
    QueryUtil.sharedTableUnbucketed(s, d, "edges_b", "src", Seq("src")) {
      edgesWithOutdeg(s, d)
    }

  private[graft] def pagerank(s: SparkSession, d: String): DataFrame = {
    // Per iteration the ranks side is O(nodes) — ~1% of edges — so AQE
    // converts the join to broadcast at runtime (no hint: at extreme
    // node counts the shuffle join on src is the correct Pregel shape,
    // and AQE makes that call per scale).
    val ew = flatEdges(s, d)
    val nodes = ew.select(col("src").as("node")).distinct()
    var ranks = nodes.withColumn("r", lit(Unit))
    for (_ <- 0 until Iters) {
      val contrib = ew
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("r DIV outdeg").as("share"))
        .groupBy(col("node"))
        .agg(sum(col("share")).as("inflow"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(Base) + expr(s"85 * coalesce(inflow, 0L) DIV 100")).as("r"))
    }
    ranks
      .select(col("node"), col("r").as("rank_micro"))
      .orderBy(col("rank_micro").desc, col("node"))
      .limit(100)
  }

  /** Write-once shared bucketed layout: persists `build` as a parquet
    * table bucketed (32) + sorted on `bucketCol`, idempotent per sf dir
    * and JVM. This is the round-6 promotion of the layout proven on
    * PageRank/PPR (−21% at 100×, per-iteration edge Exchange gone) to
    * the WHOLE graph family: every query below reads its heavy edge
    * frame from one of these tables instead of re-deriving and
    * re-shuffling it per query/iteration. At 100 TB this is the
    * standard pre-bucketed edge-table design — the CTAS cost amortizes
    * across every downstream traversal. */
  private def sharedTable(s: SparkSession, d: String, suffix: String,
      bucketCol: String, sortCols: Seq[String])(build: => DataFrame)
      : DataFrame =
    QueryUtil.sharedTable(s, d, suffix, bucketCol, sortCols)(build)

  /** Build recipe for the shared (src, dst, outdeg) edge table — ONE
    * definition so the bucketed and metadata-blind readers can never
    * drift (they share the table by name, so whichever runs first
    * materializes it for both). */
  private def edgesWithOutdeg(s: SparkSession, d: String): DataFrame = {
    val e = edges(s, d)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    e.join(deg, Seq("src"))
  }

  /** The shared bucketed (src, dst, outdeg) edge table — written once
    * per sf dir, read bucket-aligned by every bucketed graph variant. */
  private def bucketedEdges(s: SparkSession, d: String): DataFrame =
    sharedTable(s, d, "edges_b", "src", Seq("src")) {
      edgesWithOutdeg(s, d)
    }

  /** The shared capped co-purchase projection (u < v, distinct),
    * persisted bucketed+sorted on `u` — read by the triangle count,
    * clustering coefficient, k-core, k-truss, SSSP seed, assortativity
    * and link prediction instead of each re-running the
    * lineitem⋈orders + window-cap + self-join + distinct chain. */
  private[graft] def bucketedPairs(s: SparkSession, d: String): DataFrame =
    sharedTable(s, d, "pairs_b", "u", Seq("u", "v")) {
      copurchasePairs(s, d)
    }

  /** Both-direction weighted co-purchase edges bucketed on `src` — the
    * relax-join layout for SSSP: each Bellman-Ford round's
    * dist⋈edges join reads the edge side straight from its buckets
    * (only the O(nodes) dist frame moves per round). */
  private def bucketedBiPairs(s: SparkSession, d: String): DataFrame =
    sharedTable(s, d, "copair_bi", "src", Seq("src", "dst")) {
      val pairs = copurchasePairs(s, d)
      pairs.select(col("u").as("src"), col("v").as("dst"),
          expr("(u + v) % 97 + 1").as("w"))
        .unionAll(pairs.select(col("v").as("src"), col("u").as("dst"),
          expr("(u + v) % 97 + 1").as("w")))
    }

  /** Both-direction LPA edges bucketed on `dst` — the label-join key:
    * each propagation round joins labels on dst and aggregates by src,
    * so the dst-bucketed layout removes the per-round edge Exchange.
    * Since round 8 the shared [[copurchasePairs]] projection carries
    * the hash-spread cap itself (it absorbed the former lpaPairs), so
    * this is just that projection in both directions. */
  private def bucketedLpaEdges(s: SparkSession, d: String): DataFrame =
    sharedTable(s, d, "lpa_b", "dst", Seq("dst")) {
      val pairs = copurchasePairs(s, d)
      pairs.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(pairs.select(col("v").as("src"), col("u").as("dst")))
    }

  /** PageRank over a PRE-BUCKETED edge layout — the production lever
    * named in [[pagerank]]'s scale note, demonstrated end to end: the
    * derived (src, dst, outdeg) edge list persists ONCE as a parquet
    * table bucketed AND sorted on `src` (32 buckets, idempotent per sf
    * dir), so each iteration's ranks⋈edges join reads the edge side
    * straight from its buckets — NO per-iteration Exchange (or sort) of
    * the 100 TB-class side; only the O(nodes) ranks frame moves. The
    * remaining per-iteration shuffle (contributions grouped by dst) is
    * the irreducible Pregel collect step. Identical integer arithmetic
    * and output to q_pagerank — same oracle; BucketingSpec asserts the
    * plan diff (edge-side Exchange present unbucketed, absent here). */
  private[graft] def pagerankBucketed(s: SparkSession, d: String): DataFrame = {
    val ew = bucketedEdges(s, d)
    // bucket-aware distinct: the node list derives from the bucketed
    // src column, so even this aggregate plans without an exchange.
    val nodes = ew.select(col("src").as("node")).distinct()
    var ranks = nodes.withColumn("r", lit(Unit))
    for (_ <- 0 until Iters) {
      val contrib = ew
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("r DIV outdeg").as("share"))
        .groupBy(col("node"))
        .agg(sum(col("share")).as("inflow"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(Base) + expr(s"85 * coalesce(inflow, 0L) DIV 100")).as("r"))
    }
    ranks
      .select(col("node"), col("r").as("rank_micro"))
      .orderBy(col("rank_micro").desc, col("node"))
      .limit(100)
  }

  /** PPR over the SAME bucketed edge table [[bucketedEdges]] — the
    * second heavy fixed-point query moved onto the layout (identical
    * integer arithmetic and output to q_ppr, shared twin). The
    * seed-mass frame (pmu) rides in the ranks frame exactly as in
    * q_ppr; only the edge side changes, from a per-iteration shuffle
    * to bucket-aligned reads. */
  private[graft] def pprBucketed(s: SparkSession, d: String): DataFrame = {
    val ew = bucketedEdges(s, d)
    val nodes = ew.select(col("src").as("node")).distinct()
    val isSeed = col("node").startsWith("c") &&
      expr("CAST(substring(node, 2) AS BIGINT) % 50 = 0")
    val nSeeds = nodes.filter(isSeed).agg(count(lit(1)).as("ns"))
    // The checkpointed seed-mass frame is the LEFT side of every
    // iteration's rank update (round-13 optimization): the old form
    // joined `ranks.select(node, pmu)` against contrib(ranks),
    // referencing the previous iteration twice. Column pruning rescues
    // the static plan (the pmu-only re-reference prunes through the
    // outer join back to the checkpoint scan), but only because pmu
    // happens to be iteration-invariant — one added rank-dependent
    // column on the left side and the plan doubles per iteration.
    // seedNodes ⋈ contrib references ranks ONCE (inside contrib), the
    // same linear shape as q_pagerank, with nothing left for the
    // optimizer to rescue; pmu is a pure function of (node, ns), so
    // the update arithmetic — and the output — are unchanged.
    val seedNodes = nodes.crossJoin(broadcast(nSeeds))
      .select(col("node"),
        when(isSeed, expr("1000000 DIV ns")).otherwise(0L).as("pmu"))
      .localCheckpoint()
    var ranks = seedNodes.withColumn("r", col("pmu"))
    for (_ <- 0 until 3) {
      val contrib = ew
        .join(ranks.select(col("node").as("src"), col("r")), Seq("src"))
        .select(col("dst").as("node"), expr("r DIV outdeg").as("share"))
        .groupBy(col("node"))
        .agg(sum(col("share")).as("inflow"))
      ranks = seedNodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"), col("pmu"),
          expr("(15 * pmu + 85 * coalesce(inflow, 0L)) DIV 100").as("r"))
    }
    ranks
      .select(col("node"), col("r").as("ppr_micro"))
      .orderBy(col("ppr_micro").desc, col("node"))
      .limit(100)
  }

  /** Per-supplier customer-list cap for the co-purchase projection —
    * same skew treatment as DedupQueries.BUCKET_CAP: a hub supplier
    * contributes at most TriCap·(TriCap−1)/2 pairs. */
  private[queries] val TriCap = 16

  /** Peel-front size above which q_ktruss stops FORCING the dead-edge
    * broadcast and lets AQE choose from runtime sizes: 2M two-string
    * rows ≈ 100 MB serialized — comfortably inside a production
    * executor, far past anything the capped projection produces. */
  private[queries] val DeadBroadcastCap = 2000000L

  /** Per-center neighbor cap for wedge enumeration (link prediction) —
    * a hub contributes at most WedgeCap·(WedgeCap−1)/2 candidate pairs,
    * so wedge work is ≤ nodes·WedgeCap², never Σdeg². Deterministic:
    * the cap keeps the WedgeCap smallest neighbor ids. */
  private[queries] val WedgeCap = 64

  /** Triangle count over the customer co-purchase graph.
    *
    * The raw trade graph is BIPARTITE (customer↔supplier) and so
    * triangle-free; the interesting structure lives in its one-mode
    * projection. Direction matters for density: projecting onto the
    * SMALL side (suppliers sharing a customer) saturates toward the
    * complete graph — ~all C(|S|,2) pairs exist and triangle work goes
    * cubic in |S| (measured 22 s at sf0.1) — so the projection goes
    * onto the LARGE side: customers are adjacent iff they share a
    * supplier, which stays sparse (|edges| ≤ cap²·|S| ≪ C(|C|,2)) at
    * every scale. The pipeline is the standard scale shape end to end:
    *   1. distinct (supp, cust) pairs, per-supplier capped to the
    *      TriCap smallest customer ids (hub-supplier skew bound,
    *      mirrored in the twin);
    *   2. projection pairs by per-supplier self-join (quadratic only
    *      within the cap), normalized u<v + distinct;
    *   3. DEGREE-ORIENTED closing join (Suri–Vassilvitskii): each
    *      undirected edge points from its (deg, id)-smaller endpoint,
    *      so every wedge pivots on a LOW-degree node — fan-out per node
    *      is O(√m) instead of O(max-degree), the difference between a
    *      bounded shuffle and a hub blow-up at 10⁹ edges;
    *   4. wedges e1(a,b)⋈e2(b,c) closed against e3(a,c).
    * Output is one row of BIGINT graph invariants — exact in DuckDB.
    */
  private[graft] def triangles(s: SparkSession, d: String): DataFrame = {
    // Gated production path: linear reads of the two shared tables —
    // Σsup/3 over [[bucketedSupport]] (each triangle credits its three
    // edges exactly once) + two O(|E|) count/distinct aggregates. The
    // closing-join enumeration itself is amortized into the one-time
    // support_b CTAS shared with q_clustering_coeff/q_ktruss;
    // [[triangleCountOver]] keeps the from-scratch pipeline for
    // spec-driven arbitrary graphs.
    val pairs = bucketedPairs(s, d)
    val sup = bucketedSupport(s, d)
    val nNodes = pairs.select(col("u").as("n"))
      .unionAll(pairs.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("dg"))
      .agg(count(lit(1)).as("n_nodes"))
    // Σsup is exactly 3·n_triangles; DIV keeps it BIGINT end to end
    // (`/` on longs would be IEEE division).
    val tri = sup.agg(coalesce(sum(col("sup")), lit(0L)).as("s3"))
      .select(expr("s3 DIV 3").as("n_triangles"))
    nNodes
      .crossJoin(pairs.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tri)
  }

  /** Capped customer co-purchase projection (u < v, distinct) — the ONE
    * projection shared by the whole graph family (triangles, clustering
    * coefficient, k-core, k-truss, SSSP, assortativity, link prediction
    * AND label propagation). The per-supplier cap keeps a HASH-SPREAD
    * sample keyed by the (supp, cust) PAIR — (cust·40503 +
    * supp·2654435761) mod 65536, multiplicative hashing with identical
    * BIGINT arithmetic in the DuckDB twins — NOT the TriCap smallest
    * raw custkeys: a plain ascending cap makes every supplier keep the
    * same few globally-smallest customers, degenerating the projection
    * toward one dense clique (round-7 verdict: the triangle family was
    * being benchmarked on that biased, denser-than-real graph). With
    * the spread cap each supplier keeps its own pseudo-random
    * 16-clique, so density and community structure match what a real
    * capped co-occurrence projection produces at scale. */
  private[graft] def copurchasePairs(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val cs = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("supp"), col("o_custkey").as("cust"))
      .distinct()
    // The cap runs as the bounded MinKBy aggregate (round 9): a hub
    // supplier forwards at most TriCap rows per map partition instead
    // of shuffling its whole customer list through a rank window, and
    // PairCombinations emits the ca < cb pairs inline — no capped
    // self-join re-executing the cap on both input sides. Kept set is
    // identical to the old `rn <= TriCap` window over the same
    // (hash, cust) order (MinKPairsSpec pins the equivalence), so the
    // DuckDB twins keep their window form unchanged.
    cs.select(col("supp"), col("cust"),
        // pre-projected so the codegen'd Project computes the hash; the
        // aggregate's interpreted update path then reads a bound column
        expr("(cust * 40503 + supp * 2654435761) % 65536").as("hk"))
      .groupBy(col("supp"))
      .agg(graft.functions.GraftFunctions.min_k_by(
        col("hk"), col("cust"), TriCap).as("ks"))
      .select(explode(
        graft.functions.GraftFunctions.pair_combinations(col("ks"))).as("p"))
      .select(col("p.a").as("u"), col("p.b").as("v"))
      .distinct()
  }

  /** Synchronous LPA rounds over an arbitrary undirected edge frame
    * (u, v) → final (node, lbl) — factored out so specs can drive it
    * with known graphs. Mode of neighbor labels, ties to the smallest
    * label, 3 fixed rounds. The input is NORMALIZED to the simple-
    * graph contract [[labelPropOver]] requires (its closed-form round
    * 1 assumes each neighbor contributes a distinct label): order each
    * pair, drop self-loops, distinct — so a multigraph or reversed
    * frame still gets the documented mode semantics (round-7 advice). */
  private[graft] def labelPropFrom(rawPairs: DataFrame): DataFrame = {
    val pairs = rawPairs
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    val bedges = pairs.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(pairs.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint()
    labelPropOver(bedges)
  }

  /** The propagation rounds over an already-materialized both-direction
    * edge frame (bucketed table or checkpointed union). PRECONDITION
    * (simple graph): duplicate-free with both directions of each
    * undirected edge present and no self-loops — the closed-form round
    * 1 (min neighbor id) is only the mode/min-tie round under that
    * contract. Both producers guarantee it: [[bucketedLpaEdges]] unions
    * the directions of the distinct u<v projection, and
    * [[labelPropFrom]] normalizes arbitrary input first. */
  private def labelPropOver(bedges: DataFrame): DataFrame = {
    // Round 1 in closed form: initial labels are the node ids, and in
    // a simple graph each neighbor contributes a DISTINCT label, so
    // every count is 1 and the smallest-label tie-break just picks the
    // minimum neighbor id — one map-side-combined min aggregate
    // instead of a 2|E|-row (src, lbl) count shuffle.
    var labels = bedges.groupBy(col("src"))
      .agg(min(col("dst")).as("lbl"))
      .select(col("src").as("node"), col("lbl"))
      .localCheckpoint()
    for (_ <- 2 to 3) {
      // Mode-with-smallest-tie as a pure aggregate: max of
      // (count, -label) is the largest count and, on ties, the
      // SMALLEST label (node ids are numeric). Replaces the former
      // per-src row_number window, whose exchange + full sort of the
      // (src, lbl) count frame was the round's dominant cost at 100×.
      labels = bedges
        .join(labels.select(col("node").as("dst"), col("lbl")), Seq("dst"))
        .groupBy(col("src"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("src"))
        .agg(max(struct(col("c"), negate(col("lbl")).as("nl"))).as("m"))
        .select(col("src").as("node"), negate(col("m.nl")).as("lbl"))
        .localCheckpoint()
    }
    labels
  }

  /** Steps 3–4 over any normalized undirected edge set (u < v, distinct)
    * — factored out so specs can drive it with known graphs. */
  /** Degree-oriented edge list (each undirected edge points from its
    * (deg, id)-smaller endpoint) — shared by the triangle count and the
    * clustering-coefficient query. */
  private def orientedOf(pairs: DataFrame, deg: DataFrame): DataFrame = {
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    pairs
      .join(deg.select(col("n").as("u"), col("dg").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("dg").as("dv")), Seq("v"))
      .select(
        when(lowFirst, col("u")).otherwise(col("v")).as("a"),
        when(lowFirst, col("v")).otherwise(col("u")).as("b"))
  }

  private[graft] def triangleCountFrom(rawPairs: DataFrame): DataFrame =
    triangleCountOver(
      rawPairs.localCheckpoint()) // reused 4×: degree + orient + close

  /** The count pipeline over an already-materialized pair frame — a
    * bucketed table read ([[bucketedPairs]]) or a checkpointed frame;
    * re-reads of `pairs` hit storage, not the derivation lineage. */
  private def triangleCountOver(pairs: DataFrame): DataFrame = {
    val deg = pairs.select(col("u").as("n"))
      .unionAll(pairs.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("dg"))
    val oriented = orientedOf(pairs, deg)
      .localCheckpoint() // pivot of the 3-way closing join below
    val tri = oriented
      .join(oriented.select(col("a").as("b"), col("b").as("c")), Seq("b"))
      .join(oriented.select(col("a").as("wa"), col("b").as("wc")),
        col("a") === col("wa") && col("c") === col("wc"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(pairs.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tri)
  }

  /** Per-edge triangle support over a degree-oriented edge frame: the
    * closing join enumerates each triangle exactly once, explodes its
    * three (oriented) edges and hash-aggregates — triangles exist only
    * inside whole-stage codegen between the join and the map-side-
    * combined count, so the widest shuffle is the |E|-sized partial-
    * aggregate exchange (never a triangle-sized frame — the round-7
    * storage/GC killer). The oriented pair is the edge identity: every
    * undirected edge occurs in exactly one orientation and a
    * triangle's edges (a,b), (b,c), (a,c) are all oriented rows by
    * construction, so no least/greatest normalization is needed. */
  private def supportOf(o: DataFrame): DataFrame = o
    .join(o.select(col("a").as("b"), col("b").as("c")), Seq("b"))
    .join(o.select(col("a").as("wa"), col("b").as("wc")),
      col("a") === col("wa") && col("c") === col("wc"), "left_semi")
    .select(explode(array(
      struct(col("a").as("x"), col("b").as("y")),
      struct(col("b").as("x"), col("c").as("y")),
      struct(col("a").as("x"), col("c").as("y")))).as("e"))
    .select(col("e.x").as("x"), col("e.y").as("y"))
    .groupBy(col("x"), col("y")).agg(count(lit(1)).as("sup"))

  /** The shared per-edge triangle-support table (x, y, sup) — oriented
    * edge key, one row per edge that closes ≥ 1 triangle — persisted
    * bucketed+sorted on `x`. This is the round-8 amortization the
    * round-7 verdict prescribed: q_triangle_count, q_clustering_coeff
    * and q_ktruss each need exactly this ~|E|-sized aggregate, and
    * each was re-running the degree→orient→closing-join enumeration
    * (~178 s of the 100× budget spent computing the same frame three
    * times). Everything those queries derive is linear algebra over
    * support: n_triangles = Σsup/3 (each triangle credits its three
    * edges once), per-node 2·tri(n) = Σ support over incident edges
    * (each triangle at n has exactly two edges incident to n), and
    * k-truss round-1 support IS this frame. The enumeration itself
    * runs once, inside the CTAS, over [[bucketedPairs]]. */
  private[graft] def bucketedSupport(s: SparkSession, d: String): DataFrame =
    sharedTable(s, d, "support_b", "x", Seq("x", "y")) {
      val pairs = bucketedPairs(s, d)
      val deg = pairs.select(col("u").as("n"))
        .unionAll(pairs.select(col("v").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("dg"))
      supportOf(orientedOf(pairs, deg).localCheckpoint())
    }

  val defs: Map[String, Q] = Map(
    "q_pagerank" -> ((s, d) => pagerank(s, d)),
    "q_pagerank_bucketed" -> ((s, d) => pagerankBucketed(s, d)),
    "q_ppr_bucketed" -> ((s, d) => pprBucketed(s, d)),
    "q_triangle_count" -> ((s, d) => triangles(s, d)),

    // Local clustering coefficient over the co-purchase projection:
    // per-node closed-wedge fraction cc = 2·tri / (deg·(deg−1)), the
    // community-density profile of the graph family. The oriented
    // closing join yields each triangle ONCE as (a, b, c); exploding
    // the three corners + one hash aggregate credits every node —
    // no per-node neighborhood re-scan. cc is EXACT micro-units with
    // the wide products through DECIMAL(38,0)/HUGEINT; the output is
    // the decile histogram (bounded 11 rows at any scale).
    "q_clustering_coeff" -> ((s, d) => {
      val pairs = bucketedPairs(s, d)
      val deg = pairs.select(col("u").as("n"))
        .unionAll(pairs.select(col("v").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("dg"))
      // Per-node triangle credit straight from the SHARED support
      // table: each triangle at node n has exactly two edges incident
      // to n, so Σ support over incident edges = 2·tri(n) — which is
      // precisely the numerator the cc formula needs. No closing join
      // in this query's plan at all (it ran once, in the support_b
      // CTAS shared with q_triangle_count/q_ktruss).
      val sup = bucketedSupport(s, d)
      val corners = sup.select(explode(array(
          struct(col("x").as("n"), col("sup")),
          struct(col("y").as("n"), col("sup")))).as("e"))
        .select(col("e.n").as("n"), col("e.sup").as("sup"))
        .groupBy(col("n")).agg(sum(col("sup")).as("tri2")) // = 2·tri(n)
      deg.join(corners, Seq("n"), "left")
        .filter(col("dg") >= 2)
        .select(expr(
          "CAST(CAST(coalesce(tri2, 0L) AS DECIMAL(38,0)) * 1000000" +
            " DIV (CAST(dg AS DECIMAL(38,0)) * (dg - 1)) AS BIGINT)")
          .as("cc_micro"))
        .groupBy(expr("cc_micro DIV 100000").as("cc_decile"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("cc_decile"))
    }),

    // Degree assortativity (Newman's r): Pearson correlation of the
    // endpoint degrees over the DIRECTED edge list (both directions,
    // so the statistic is symmetric). Same exact-moments contract as
    // q_correlation: integer degree sums through DECIMAL(38,0), one
    // IEEE-double closed form at the end with identical op order in
    // the twin. One degree aggregate + two id-keyed joins + one
    // map-side-combined moment aggregate — the fact scan shape.
    "q_assortativity" -> ((s, d) => {
      val pairs = bucketedPairs(s, d)
      val deg = pairs.select(col("u").as("n"))
        .unionAll(pairs.select(col("v").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("dg"))
      val dir = pairs.select(col("u").as("x"), col("v").as("y"))
        .unionAll(pairs.select(col("v").as("x"), col("u").as("y")))
      val j = dir
        .join(deg.select(col("n").as("x"), col("dg").as("dx")), Seq("x"))
        .join(deg.select(col("n").as("y"), col("dg").as("dy")), Seq("y"))
      j.agg(
          count(lit(1)).cast(DoubleType).as("n"),
          sum(col("dx").cast(DecimalType(38, 0))).cast(DoubleType).as("sx"),
          sum(col("dy").cast(DecimalType(38, 0))).cast(DoubleType).as("sy"),
          sum((col("dx") * col("dy")).cast(DecimalType(38, 0)))
            .cast(DoubleType).as("sxy"),
          sum((col("dx") * col("dx")).cast(DecimalType(38, 0)))
            .cast(DoubleType).as("sxx"),
          sum((col("dy") * col("dy")).cast(DecimalType(38, 0)))
            .cast(DoubleType).as("syy"))
        .select(col("n").cast(LongType).as("n_directed_edges"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            nullif(
              sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
                (col("n") * col("syy") - col("sy") * col("sy"))),
              lit(0d)))
            .as("assortativity"))
    }),

    // K-TRUSS (K=4) peeling, 2 rounds unrolled — the EDGE-level
    // analogue of q_kcore's node peeling. Triangles are enumerated
    // ONCE PER SF DIR, inside the shared support_b CTAS
    // ([[bucketedSupport]] — the same frame q_triangle_count and
    // q_clustering_coeff read), through the degree-oriented closing
    // join; this query's own plan materializes only the O(|E|)
    // oriented frame it needs for the round-2 probes. The ORIENTED
    // pair itself is the edge identity: every undirected edge occurs
    // in exactly one orientation, and a triangle's edges (a,b),
    // (b,c), (a,c) are all oriented rows by construction of the
    // closing join, so support counts need no least/greatest
    // normalization (the gated output is a support histogram —
    // identity convention never surfaces). Peeling is set algebra
    // over the one frame: support = slot-exploded hash agg; a
    // triangle survives round 1 iff NONE of its three edges is dead
    // (one semi-join against the small dead-edge set + distinct —
    // triangle membership depends only on its edges, not the
    // enumeration orientation); round-2 support is a recount over the
    // survivors. This replaces round 5's scale-killer, which re-ran
    // the full degree/orientation/closing-join pipeline on the
    // surviving subgraph (171 s at 100×). Edges enter from the shared
    // bucketed pair table; the closing join stays O(√m)-fan-out.
    "q_ktruss" -> ((s, d) => {
      val pairs = bucketedPairs(s, d)
      val deg = pairs.select(col("u").as("n"))
        .unionAll(pairs.select(col("v").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("dg"))
      // ONLY the O(|E|) oriented frame ever materializes. The triangle
      // frame itself is never stored or shuffled raw: an earlier shape
      // localCheckpoint'd all ~|E|·cap triangle rows (3 string ids
      // each) and re-shuffled them through a distinct + anti-join —
      // at the 100× point that overran the storage pool and GC'd the
      // heap into the ground (576 s vs 171 s for the from-scratch
      // re-enumeration it replaced). Here triangles exist only inside
      // whole-stage codegen between the closing join and a map-side-
      // combined per-edge support aggregate, so the widest shuffle of
      // the query is the |E|-sized partial-aggregate exchange.
      val or = orientedOf(pairs, deg).localCheckpoint()
      // Round-1 support comes straight from the SHARED support table
      // ([[bucketedSupport]] — same pairs, same deterministic
      // orientation, so its (x, y) keys match this query's `or` frame
      // bit for bit): the closing-join enumeration runs once per sf
      // dir in the CTAS instead of once per triangle-family query.
      val sup0 = bucketedSupport(s, d)
      // Round-2 support is a DECREMENT, not a re-enumeration: edges
      // below K-2 support die, and the only triangles whose loss can
      // change any other edge's support are those TOUCHING a dead
      // edge. A dead edge has support ≤ 1, so the dead-triangle set
      // is at most |dead| rows — re-derive exactly those by closing
      // each dead edge against the oriented frame in its three
      // possible slots (the dead side rides as the runtime-small
      // build side of each join; AQE broadcasts it), then subtract
      // their slot counts from sup0. Surviving edges whose
      // decremented support drops below K-2 are dropped by the final
      // filter, closing round 2.
      // dead is BROADCAST in every step below: each dead edge (sup ≤ 1)
      // belongs to at most one triangle, so every frame in the
      // re-derivation is ≤ |dead| · cap rows and the checkpointed
      // oriented frame is only ever SCANNED, never shuffled. The hint
      // is GATED on the measured peel-front size (round-7 advice): on
      // a corpus where many support-1 edges make the front outgrow
      // executor memory, the hint is dropped and AQE picks the join
      // strategy from runtime sizes — the shape stays valid either
      // way. The count is a scan of the already-checkpointed frame.
      val dead = sup0.filter(col("sup") < 2)
        .select(col("x"), col("y")).localCheckpoint()
      val bcast: DataFrame => DataFrame =
        if (dead.count() <= DeadBroadcastCap) broadcast else identity
      // verify = keep candidate triangles whose named (e1, e2) edge
      // exists in `or`, as a broadcast INNER join probed by the `or`
      // scan (a semi-join keyed the other way would shuffle `or`
      // instead). cand rows are unique, so the inner join cannot
      // duplicate (each (e1, e2) matches at most one `or` row).
      def closedAgainstOr(cand: DataFrame, e1: String, e2: String)
          : DataFrame = or.as("w")
        .join(bcast(cand.as("t")),
          col("w.a") === col(s"t.$e1") && col("w.b") === col(s"t.$e2"))
        .select(col("t.a").as("a"), col("t.b").as("b"), col("t.c").as("c"))
      // Slot (a,b) dead: c completes via (b,c) ∈ or, verify (a,c).
      val viaAB = closedAgainstOr(
        or.as("e").join(bcast(dead), col("e.a") === col("y"))
          .select(col("x").as("a"), col("y").as("b"), col("e.b").as("c")),
        "a", "c")
      // Slot (b,c) dead: a completes via (a,b) ∈ or, verify (a,c).
      val viaBC = closedAgainstOr(
        or.as("e").join(bcast(dead), col("e.b") === col("x"))
          .select(col("e.a").as("a"), col("x").as("b"), col("y").as("c")),
        "a", "c")
      // Slot (a,c) dead: b completes via (a,b) ∈ or, verify (b,c).
      val viaAC = closedAgainstOr(
        or.as("e").join(bcast(dead), col("e.a") === col("x"))
          .select(col("x").as("a"), col("e.b").as("b"), col("y").as("c")),
        "b", "c")
      val deadTris = viaAB.unionAll(viaBC).unionAll(viaAC).distinct()
      val deadContrib = deadTris
        .select(explode(array(
          struct(col("a").as("x"), col("b").as("y")),
          struct(col("b").as("x"), col("c").as("y")),
          struct(col("a").as("x"), col("c").as("y")))).as("e"))
        .select(col("e.x").as("x"), col("e.y").as("y"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("lost"))
      sup0.join(bcast(dead), Seq("x", "y"), "left_anti")
        .join(bcast(deadContrib), Seq("x", "y"), "left")
        .select((col("sup") - coalesce(col("lost"), lit(0L))).as("sup"))
        .filter(col("sup") >= 2)
        .groupBy(col("sup")).agg(count(lit(1)).as("n_edges"))
        .orderBy(col("sup"))
    }),

    // Bounded Bellman-Ford single-source shortest paths over the
    // co-purchase graph. Edge weights are a deterministic integer
    // function of the endpoints ((u+v) % 97 + 1 — identical arithmetic
    // in both engines on non-negative keys), source = the smallest
    // node id, 4 relaxation rounds. Each round is ONE shuffle join of
    // the current distance frame against the edge list plus a min
    // re-aggregate; no per-path state ever materializes, so a 10⁹-edge
    // graph costs two bounded shuffles per round. Unreached nodes stay
    // ABSENT (no infinity sentinel to overflow). Output: the 25
    // nearest nodes under a total (dist, node) order.
    "q_sssp" -> ((s, d) => {
      // Relax-join edge side reads straight from the src-bucketed
      // table — no per-round Exchange of the edge frame; only the
      // O(nodes) dist frame moves. The source seed is min(src) over
      // the both-direction table, which equals min(u) of the u<v pair
      // set: the globally smallest node appears as `u` in its pairs.
      val edgesW = bucketedBiPairs(s, d)
      var dist = edgesW.agg(min(col("src")).as("node"))
        .select(col("node"), lit(0L).as("dist"))
      for (_ <- 0 until 4) {
        val relax = edgesW
          .join(dist.select(col("node").as("src"), col("dist")), Seq("src"))
          .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
        // checkpoint per round (the q_khop_frontier / DedupClusters
        // treatment): dist is O(nodes); without the barrier each
        // round's plan re-executes every earlier round's relax+agg.
        dist = dist.unionAll(relax)
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
          .localCheckpoint()
      }
      dist.orderBy(col("dist"), col("node")).limit(25)
    }),

    // Link prediction over the co-purchase graph: for every
    // NON-adjacent pair sharing ≥1 neighbor, the common-neighbor count
    // plus the resource-allocation index (Zhou et al. 2009: Σ over
    // shared neighbors w of 1/deg(w)) in exact micro-units
    // (1000000 DIV dg — integer both engines, no float parity risk).
    // Wedge enumeration is degree-capped per center ([[WedgeCap]],
    // smallest neighbor ids) so hub wedges are bounded; the RA
    // denominator is the TRUE degree, not the capped one. Candidates
    // aggregate BEFORE the anti-join against existing edges, so the
    // anti-join touches the O(candidate-pairs) frame only.
    "q_link_predict" -> ((s, d) => {
      val pairs = bucketedPairs(s, d)
      // Both-directions adjacency comes from the src-BUCKETED bi table
      // (round-13 optimization): the old unionAll of the two pair
      // directions reported no output partitioning, so the per-center
      // wedge aggregate below exchanged the full adjacency; the shared
      // copair_bi layout (already materialized for SSSP) carries the
      // identical (src, dst) multiset bucketed on the aggregate key —
      // the groupBy(w) plans bucket-aligned with ZERO adjacency-side
      // Exchange. Weight column ignored; rows identical by
      // construction (both derive from copurchasePairs).
      val adj = bucketedBiPairs(s, d)
        .select(col("src").as("w"), col("dst").as("n"))
      // ONE per-center aggregate does both jobs (round 9, MinKBy):
      // the capped neighbor list (bounded bottom-k — a hub center
      // forwards at most WedgeCap rows per map partition, vs the old
      // rank window shuffling its full adjacency to one reducer) AND
      // the TRUE degree for the RA denominator — the separate deg
      // aggregate + join are gone. PairCombinations then emits the
      // x < y wedge pairs inline from the id-sorted capped array:
      // no capped self-join, no second window execution. Kept set ==
      // the old `rn <= WedgeCap` window over orderBy(n)
      // (MinKPairsSpec pins the equivalence; n is unique per center),
      // so the twin keeps its window form and hashes are unchanged.
      val cand = adj.groupBy(col("w"))
        .agg(graft.functions.GraftFunctions.min_k_by(
            col("n"), col("n"), WedgeCap).as("ns"),
          count(lit(1)).as("dg"))
        .select(col("dg"), explode(
          graft.functions.GraftFunctions.pair_combinations(col("ns"))).as("p"))
        .groupBy(col("p.a").as("u"), col("p.b").as("v"))
        .agg(count(lit(1)).as("n_common"),
          sum(expr("1000000 DIV dg")).as("ra_micro"))
      cand.join(pairs, Seq("u", "v"), "left_anti")
        .orderBy(col("n_common").desc, col("ra_micro").desc,
          col("u"), col("v"))
        .limit(100)
    }),

    // PERSONALIZED PageRank (random walk with restart to a seed set) —
    // the recsys/influence form: restart mass goes only to the seeds
    // (every 50th customer), so ranks measure proximity TO THE SEEDS
    // rather than global centrality. Same fixed-point integer contract
    // and 3-iteration unroll as q_pagerank: r ← (15·p + 85·Ar) DIV 100
    // in micro-units with p = 1e6 DIV |S| on seeds; the seed share is a
    // 1-row broadcast. Same per-iteration shuffles as q_pagerank.
    "q_ppr" -> ((s, d) => {
      // Flat twin of q_ppr_bucketed: same shared edge materialization,
      // metadata-blind read (see [[flatEdges]]) — the edge side
      // Exchanges per iteration; the bucketed twin's doesn't.
      val ew = flatEdges(s, d)
      val nodes = ew.select(col("src").as("node")).distinct()
      val isSeed = col("node").startsWith("c") &&
        expr("CAST(substring(node, 2) AS BIGINT) % 50 = 0")
      val nSeeds = nodes.filter(isSeed).agg(count(lit(1)).as("ns"))
      // pmu RIDES IN the checkpointed seed-mass frame rather than
      // re-joining a seeded table each iteration — saves three O(nodes)
      // joins (measured 240 s → pagerank-parity at the 100× point).
      // seedNodes is the LEFT side of every rank update so `ranks` is
      // referenced ONCE per iteration (round-13: the old
      // ranks.select ⋈ contrib(ranks) form referenced it twice and
      // relied on column pruning to collapse the re-reference — see
      // [[pprBucketed]]).
      val seedNodes = nodes.crossJoin(broadcast(nSeeds))
        .select(col("node"),
          when(isSeed, expr("1000000 DIV ns")).otherwise(0L).as("pmu"))
        .localCheckpoint()
      var ranks = seedNodes.withColumn("r", col("pmu"))
      for (_ <- 0 until Iters) {
        val contrib = ew
          .join(ranks.select(col("node").as("src"), col("r")), Seq("src"))
          .select(col("dst").as("node"), expr("r DIV outdeg").as("share"))
          .groupBy(col("node"))
          .agg(sum(col("share")).as("inflow"))
        ranks = seedNodes
          .join(contrib, Seq("node"), "left")
          .select(col("node"), col("pmu"),
            expr("(15 * pmu + 85 * coalesce(inflow, 0L)) DIV 100").as("r"))
      }
      ranks
        .select(col("node"), col("r").as("ppr_micro"))
        .orderBy(col("ppr_micro").desc, col("node"))
        .limit(100)
    }),

    // K-CORE peeling (K=3, 3 rounds unrolled — the q_pagerank
    // fixed-iteration treatment of an iterate-to-fixpoint algorithm):
    // repeatedly drop nodes of degree < K and restrict edges to
    // surviving endpoints; the dense backbone that survives is the
    // community-detection / influence-seeding substrate. Each round is
    // one map-side-combined degree aggregate (O(nodes) rows) + two
    // ids-only semi-joins; full peeling at scale runs the same rounds
    // to fixpoint with the DedupClusters checkpoint treatment. Output:
    // surviving nodes with their round-3 degrees.
    "q_kcore" -> ((s, d) => {
      val K = 3
      var edges = bucketedPairs(s, d)
      for (r <- 1 to 3) {
        val deg = edges.select(col("u").as("n"))
          .unionAll(edges.select(col("v").as("n")))
          .groupBy(col("n")).agg(count(lit(1)).as("dg"))
        // Peel against the DEAD set, not the keep set (round 8): most
        // nodes survive each round, so restricting edges via two
        // keep-set semi-joins re-shuffled the whole edge frame twice
        // per round; the complement — nodes below K — is the SMALL
        // side, and two broadcast anti-joins drop their edges with
        // zero edge-side exchange (identical result: anti dead ≡ semi
        // keep on the same degree frame). The dead frame is the
        // checkpointed O(peeled) output of the degree aggregate; its
        // count gates the hint the DeadBroadcastCap way so a
        // pathological first round falls back to AQE-chosen joins.
        val dead = deg.filter(col("dg") < K).select(col("n"))
          .localCheckpoint()
        val bc: DataFrame => DataFrame =
          if (dead.count() <= DeadBroadcastCap) broadcast else identity
        edges = edges
          .join(bc(dead.select(col("n").as("u"))), Seq("u"), "left_anti")
          .join(bc(dead.select(col("n").as("v"))), Seq("v"), "left_anti")
        // checkpoint between rounds: each round's degree aggregate
        // otherwise re-derives every earlier round's anti-joins.
        if (r < 3) edges = edges.localCheckpoint()
      }
      edges.select(col("u").as("n")).unionAll(edges.select(col("v").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("deg3"))
        .select(col("n").as("node"), col("deg3"))
        .orderBy(col("node"))
    }),

    // LABEL PROPAGATION community detection (synchronous LPA, 3 rounds
    // unrolled — the same fixed-iteration treatment as q_pagerank): every
    // node starts in its own community; each round it adopts the MODE of
    // its neighbors' labels, ties broken by the smallest label, which
    // makes the classically nondeterministic LPA fully deterministic and
    // twin-replayable. Runs on the shared hash-spread co-purchase
    // projection ([[copurchasePairs]] — the spread cap originated here
    // as lpaPairs and was promoted family-wide in round 8: a raw-id cap
    // degenerates the graph to one ~70-node clique with nothing to
    // detect; a cust-only hash re-degenerates because every supplier
    // ranks the same global permutation of a dense bipartite graph —
    // the (supp, cust) pair hash gives each supplier its own
    // pseudo-random 16-clique so LPA resolves distinct communities
    // where cliques genuinely overlap).
    // Per round: one join of the O(nodes) label frame
    // against the edge list, one (node, label) hash aggregate with
    // map-side combine, one PER-NODE window (partition-local, never
    // global). Output: community sizes — the segmentation primitive
    // behind cohort discovery and graph-based dedup review.
    "q_label_prop" -> ((s, d) =>
      labelPropOver(bucketedLpaEdges(s, d))
        .groupBy(col("lbl")).agg(count(lit(1)).as("n_members"))
        .select(col("lbl").as("community"), col("n_members"))
        .orderBy(col("n_members").desc, col("community"))),

    // k-hop BFS frontier sizes from a seed set (every 10th supplier —
    // scale-independent and non-empty at every sf, unlike a nation
    // filter):
    // how many NEW nodes become reachable at each hop ≤ 3 — the
    // blast-radius / influence-propagation primitive. Classic
    // distributed BFS: per round ONE join of the current frontier
    // against the edge list plus an anti-join against the visited set;
    // rounds are fixed (3), each frontier/visited is localCheckpoint'd
    // so no lineage re-derivation (same treatment as
    // operators.DedupClusters and pagerank above). The twin is a
    // DuckDB recursive CTE whose UNION-dedup on (node, hop) reproduces
    // min-hop BFS exactly.
    "q_khop_frontier" -> ((s, d) => {
      // Frontier expansion reads the SHARED src-bucketed edge table
      // (same rows as the flat derivation — outdeg just ignored): the
      // per-query lineitem⋈orders+distinct chain is amortized into the
      // one-time CTAS, and each hop's frontier⋈edges join consumes the
      // edge side bucket-aligned, so only the O(frontier) side moves.
      val e = bucketedEdges(s, d).select(col("src"), col("dst"))
      val seeds = Tables.supplier(s, d)
        .filter(col("s_suppkey") % 10 === 0)
        .select(concat(lit("s"), col("s_suppkey")).as("node"))
      var visited = seeds.withColumn("hop", lit(0)).localCheckpoint()
      var frontier = visited.select(col("node"))
      for (h <- 1 to 3) {
        // distinct + anti-join FUSED into one aggregate (round 14): the
        // expansion's dedup and the visited-set subtraction both keyed
        // on node, so `union(expanded tagged 0, visited tagged 1) →
        // groupBy(node).max(tag) → tag = 0` computes them in ONE
        // exchange (map-side partial combine also shrinks the dense-
        // hop expansion before it shuffles) instead of the old
        // distinct-exchange followed by a sort-merge anti-join that
        // exchanged BOTH sides again. Same rows by construction: a
        // node survives iff it was expanded and is not in visited.
        val next = frontier.join(e, col("node") === col("src"))
          .select(col("dst").as("node"), lit(0).as("vis"))
          .unionAll(visited.select(col("node"), lit(1).as("vis")))
          .groupBy(col("node")).agg(max(col("vis")).as("vis"))
          .filter(col("vis") === 0).select(col("node"))
          .localCheckpoint()
        // The per-hop visited checkpoint looks redundant (a union of
        // already-checkpointed frames) but is measured load-bearing:
        // round-13 tried removing it and the 100× solo went 43→70 s —
        // the anti-join side then plans as a widening union of
        // UnknownPartitioning scans re-shuffled per hop instead of one
        // compact materialized frame. Kept.
        visited = visited.unionAll(next.withColumn("hop", lit(h)))
          .localCheckpoint()
        frontier = next
      }
      visited.groupBy(col("hop")).agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("hop"))
    })
  )

  /** The twin unrolls the three iterations as CTEs; `//` is DuckDB's
    * floor division on BIGINTs, matching Spark's `DIV`. */
  /** Shared twin fragment: the capped co-purchase projection CTE chain
    * ending in `pairs(u, v)` — mirrors [[copurchasePairs]]. */
  private val sqlCopurchasePairs: String =
    s"""cs AS (
       |  SELECT DISTINCT l_suppkey AS supp, o_custkey AS cust
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |capped AS MATERIALIZED (
       |  SELECT supp, cust FROM (
       |    SELECT supp, cust,
       |      row_number() OVER (PARTITION BY supp
       |        ORDER BY (cust * 40503 + supp * 2654435761) % 65536, cust) AS rn
       |    FROM cs) WHERE rn <= $TriCap),
       |pairs AS MATERIALIZED (
       |  SELECT DISTINCT a.cust AS u, b.cust AS v
       |  FROM capped a JOIN capped b ON a.supp = b.supp AND a.cust < b.cust)"""
      .stripMargin

  /** The bucketed variants compute identical results through the
    * bucketed layout, so they share the flat twins verbatim. */
  lazy val oracle: Map[String, String] = baseOracle +
    ("q_pagerank_bucketed" -> baseOracle("q_pagerank")) +
    ("q_ppr_bucketed" -> baseOracle("q_ppr"))

  private val baseOracle: Map[String, String] = Map(
    // Unrolls the three LPA rounds; the (c DESC, lbl) row_number tie
    // order makes each round's pick unique, so the twin is exact.
    "q_label_prop" -> {
      // AS MATERIALIZED on bedges and every round's label frame:
      // inlined, round 3's plan re-derives rounds 1-2 (and bedges, and
      // the projection chain) once per reference.
      def round(i: Int, prev: String) =
        s"""c$i AS (
           |  SELECT e.src, l.lbl, COUNT(*) AS c
           |  FROM bedges e JOIN $prev l ON l.node = e.dst
           |  GROUP BY e.src, l.lbl),
           |l$i AS MATERIALIZED (
           |  SELECT src AS node, lbl FROM (
           |    SELECT src, lbl,
           |      row_number() OVER (PARTITION BY src ORDER BY c DESC, lbl) AS rn
           |    FROM c$i) WHERE rn = 1)""".stripMargin
      s"""WITH $sqlCopurchasePairs,
         |bedges AS MATERIALIZED (
         |  SELECT u AS src, v AS dst FROM pairs
         |  UNION ALL
         |  SELECT v AS src, u AS dst FROM pairs),
         |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM bedges),
         |${round(1, "l0")},
         |${round(2, "l1")},
         |${round(3, "l2")}
         |SELECT lbl AS community, COUNT(*) AS n_members
         |FROM l3 GROUP BY lbl
         |ORDER BY n_members DESC, community""".stripMargin
    },

    "q_kcore" -> {
      // AS MATERIALIZED on each round's survivor edge set: e3 inlined
      // re-derives e2 re-derives e1 once per of its 4 references.
      def round(i: Int, prev: String) =
        s"""d$i AS (
           |  SELECT n, COUNT(*) AS dg FROM (
           |    SELECT u AS n FROM $prev UNION ALL SELECT v AS n FROM $prev)
           |  GROUP BY n),
           |k$i AS MATERIALIZED (SELECT n FROM d$i WHERE dg >= 3),
           |e$i AS MATERIALIZED (
           |  SELECT u, v FROM $prev
           |  WHERE u IN (SELECT n FROM k$i) AND v IN (SELECT n FROM k$i))"""
          .stripMargin
      s"""WITH $sqlCopurchasePairs,
         |${round(1, "pairs")},
         |${round(2, "e1")},
         |${round(3, "e2")}
         |SELECT n AS node, COUNT(*) AS deg3 FROM (
         |  SELECT u AS n FROM e3 UNION ALL SELECT v AS n FROM e3)
         |GROUP BY n ORDER BY node""".stripMargin
    },

    "q_ppr" -> {
      val seedCond = "node LIKE 'c%' AND CAST(substring(node, 2) AS BIGINT) % 50 = 0"
      // AS MATERIALIZED per iteration: the correlated inflow subquery
      // references the previous round per node — inlined, DuckDB
      // re-evaluates the whole previous-round tree inside it.
      def iter(prev: String, cur: String): String =
        s"""$cur AS MATERIALIZED (
           |  SELECT sd.node,
           |    CAST((15 * sd.pmu + 85 * COALESCE((
           |      SELECT SUM($prev.r // deg.outdeg)
           |      FROM edges JOIN $prev ON $prev.node = edges.src
           |                 JOIN deg ON deg.src = edges.src
           |      WHERE edges.dst = sd.node), 0)) // 100 AS BIGINT) AS r
           |  FROM seeded sd)""".stripMargin
      s"""WITH cs AS (
         |  SELECT DISTINCT 'c' || o_custkey AS cust, 's' || l_suppkey AS supp
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS MATERIALIZED (
         |  SELECT cust AS src, supp AS dst FROM cs
         |  UNION ALL
         |  SELECT supp AS src, cust AS dst FROM cs),
         |deg AS MATERIALIZED (
         |  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
         |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
         |ns AS (SELECT COUNT(*) AS n_seeds FROM nodes WHERE $seedCond),
         |seeded AS MATERIALIZED (
         |  SELECT node,
         |    CASE WHEN $seedCond THEN 1000000 // ns.n_seeds ELSE 0 END AS pmu
         |  FROM nodes, ns),
         |r0 AS (SELECT node, CAST(pmu AS BIGINT) AS r FROM seeded),
         |${iter("r0", "r1")},
         |${iter("r1", "r2")},
         |${iter("r2", "r3")}
         |SELECT node, r AS ppr_micro FROM r3
         |ORDER BY ppr_micro DESC, node LIMIT 100""".stripMargin
    },

    "q_pagerank" -> {
      // DuckDB's SUM over BIGINT widens to HUGEINT, which the pandas
      // boundary renders as float64 — CAST back to BIGINT each
      // iteration so rank_micro stays integral end to end.
      // AS MATERIALIZED per iteration + on edges/deg/nodes: the
      // correlated inflow subquery otherwise re-evaluates the whole
      // previous-round tree per node.
      def iter(prev: String, cur: String): String =
        s"""$cur AS MATERIALIZED (
           |  SELECT n.node,
           |    CAST($Base + 85 * COALESCE((
           |      SELECT SUM($prev.r // deg.outdeg)
           |      FROM edges JOIN $prev ON $prev.node = edges.src
           |                 JOIN deg ON deg.src = edges.src
           |      WHERE edges.dst = n.node), 0) // 100 AS BIGINT) AS r
           |  FROM nodes n)""".stripMargin
      s"""WITH cs AS (
         |  SELECT DISTINCT 'c' || o_custkey AS cust, 's' || l_suppkey AS supp
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS MATERIALIZED (
         |  SELECT cust AS src, supp AS dst FROM cs
         |  UNION ALL
         |  SELECT supp AS src, cust AS dst FROM cs),
         |deg AS MATERIALIZED (
         |  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
         |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
         |r0 AS (SELECT node, CAST($Unit AS BIGINT) AS r FROM nodes),
         |${iter("r0", "r1")},
         |${iter("r1", "r2")},
         |${iter("r2", "r3")}
         |SELECT node, r AS rank_micro FROM r3
         |ORDER BY rank_micro DESC, node LIMIT 100""".stripMargin
    },

    /** The twin replays cap, projection, degree orientation and the
      * closing join; all outputs are COUNT(*) BIGINTs. AS MATERIALIZED
      * on every multiply-referenced CTE: DuckDB otherwise inlines the
      * whole projection chain per reference — the closing join
      * references `ori` three times, each re-running cap + self-join +
      * distinct from the base tables, which turns a seconds query into
      * an hours query at 10×. */
    "q_triangle_count" ->
      s"""WITH cs AS (
         |  SELECT DISTINCT l_suppkey AS supp, o_custkey AS cust
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |capped AS MATERIALIZED (
         |  SELECT supp, cust FROM (
         |    SELECT supp, cust,
         |      row_number() OVER (PARTITION BY supp
         |        ORDER BY (cust * 40503 + supp * 2654435761) % 65536, cust) AS rn
         |    FROM cs) WHERE rn <= $TriCap),
         |pairs AS MATERIALIZED (
         |  SELECT DISTINCT a.cust AS u, b.cust AS v
         |  FROM capped a JOIN capped b ON a.supp = b.supp AND a.cust < b.cust),
         |deg AS MATERIALIZED (
         |  SELECT n, COUNT(*) AS dg FROM (
         |    SELECT u AS n FROM pairs UNION ALL SELECT v AS n FROM pairs)
         |  GROUP BY n),
         |ori AS MATERIALIZED (
         |  SELECT
         |    CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v)
         |         THEN u ELSE v END AS a,
         |    CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v)
         |         THEN v ELSE u END AS b
         |  FROM pairs JOIN deg du ON du.n = pairs.u
         |             JOIN deg dv ON dv.n = pairs.v),
         |tri AS (
         |  SELECT COUNT(*) AS n_triangles
         |  FROM ori e1 JOIN ori e2 ON e1.b = e2.a
         |  WHERE EXISTS (SELECT 1 FROM ori e3
         |                WHERE e3.a = e1.a AND e3.b = e2.b))
         |SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
         |       (SELECT COUNT(*) FROM pairs) AS n_edges,
         |       n_triangles
         |FROM tri""".stripMargin,

    // Same MATERIALIZED treatment as q_triangle_count (tri3 references
    // ori three times; corners references tri3 three times).
    "q_clustering_coeff" ->
      s"""WITH cs AS (
         |  SELECT DISTINCT l_suppkey AS supp, o_custkey AS cust
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |capped AS MATERIALIZED (
         |  SELECT supp, cust FROM (
         |    SELECT supp, cust,
         |      row_number() OVER (PARTITION BY supp
         |        ORDER BY (cust * 40503 + supp * 2654435761) % 65536, cust) AS rn
         |    FROM cs) WHERE rn <= $TriCap),
         |pairs AS MATERIALIZED (
         |  SELECT DISTINCT a.cust AS u, b.cust AS v
         |  FROM capped a JOIN capped b ON a.supp = b.supp AND a.cust < b.cust),
         |deg AS MATERIALIZED (
         |  SELECT n, COUNT(*) AS dg FROM (
         |    SELECT u AS n FROM pairs UNION ALL SELECT v AS n FROM pairs)
         |  GROUP BY n),
         |ori AS MATERIALIZED (
         |  SELECT
         |    CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v)
         |         THEN u ELSE v END AS a,
         |    CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v)
         |         THEN v ELSE u END AS b
         |  FROM pairs JOIN deg du ON du.n = pairs.u
         |             JOIN deg dv ON dv.n = pairs.v),
         |tri3 AS MATERIALIZED (
         |  SELECT e1.a AS a, e1.b AS b, e2.b AS c
         |  FROM ori e1 JOIN ori e2 ON e1.b = e2.a
         |  WHERE EXISTS (SELECT 1 FROM ori e3
         |                WHERE e3.a = e1.a AND e3.b = e2.b)),
         |corners AS (
         |  SELECT n, COUNT(*) AS tri FROM (
         |    SELECT a AS n FROM tri3
         |    UNION ALL SELECT b FROM tri3
         |    UNION ALL SELECT c FROM tri3)
         |  GROUP BY n),
         |cc AS (
         |  SELECT CAST(2 * CAST(COALESCE(corners.tri, 0) AS HUGEINT) * 1000000
         |    // (CAST(deg.dg AS HUGEINT) * (deg.dg - 1)) AS BIGINT) AS cc_micro
         |  FROM deg LEFT JOIN corners ON corners.n = deg.n
         |  WHERE deg.dg >= 2)
         |SELECT cc_micro // 100000 AS cc_decile,
         |  COUNT(*) AS n_nodes
         |FROM cc GROUP BY cc_decile ORDER BY cc_decile""".stripMargin,

    "q_assortativity" ->
      s"""WITH cs AS (
         |  SELECT DISTINCT l_suppkey AS supp, o_custkey AS cust
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |capped AS (
         |  SELECT supp, cust FROM (
         |    SELECT supp, cust,
         |      row_number() OVER (PARTITION BY supp
         |        ORDER BY (cust * 40503 + supp * 2654435761) % 65536, cust) AS rn
         |    FROM cs) WHERE rn <= $TriCap),
         |pairs AS MATERIALIZED (
         |  SELECT DISTINCT a.cust AS u, b.cust AS v
         |  FROM capped a JOIN capped b ON a.supp = b.supp AND a.cust < b.cust),
         |deg AS MATERIALIZED (
         |  SELECT n, COUNT(*) AS dg FROM (
         |    SELECT u AS n FROM pairs UNION ALL SELECT v AS n FROM pairs)
         |  GROUP BY n),
         |dir AS (
         |  SELECT u AS x, v AS y FROM pairs
         |  UNION ALL SELECT v AS x, u AS y FROM pairs),
         |m AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         |    CAST(SUM(CAST(dx.dg AS DECIMAL(38,0))) AS DOUBLE) AS sx,
         |    CAST(SUM(CAST(dy.dg AS DECIMAL(38,0))) AS DOUBLE) AS sy,
         |    CAST(SUM(CAST(dx.dg * dy.dg AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
         |    CAST(SUM(CAST(dx.dg * dx.dg AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
         |    CAST(SUM(CAST(dy.dg * dy.dg AS DECIMAL(38,0))) AS DOUBLE) AS syy
         |  FROM dir JOIN deg dx ON dx.n = dir.x JOIN deg dy ON dy.n = dir.y)
         |SELECT CAST(n AS BIGINT) AS n_directed_edges,
         |  (n * sxy - sx * sy) /
         |    NULLIF(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0)
         |    AS assortativity
         |FROM m""".stripMargin,

    // Unrolls the two truss-peel rounds as CTEs; each round mirrors
    // the Scala shape exactly: subgraph degrees → orientation →
    // closing join → 3-edge explode → support count → filter.
    "q_ktruss" -> {
      // AS MATERIALIZED: DuckDB inlines multiply-referenced CTEs by
      // default, which re-executes the whole oriented-triangle chain
      // once per reference (observed: minutes instead of seconds).
      def round(i: Int, in: String): String =
        s"""dg$i AS MATERIALIZED (
           |  SELECT n, COUNT(*) AS dg FROM (
           |    SELECT u AS n FROM $in UNION ALL SELECT v AS n FROM $in)
           |  GROUP BY n),
           |ori$i AS MATERIALIZED (
           |  SELECT
           |    CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v)
           |         THEN u ELSE v END AS a,
           |    CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND u < v)
           |         THEN v ELSE u END AS b
           |  FROM $in JOIN dg$i du ON du.n = $in.u
           |           JOIN dg$i dv ON dv.n = $in.v),
           |t$i AS MATERIALIZED (
           |  SELECT e1.a AS a, e1.b AS b, e2.b AS c
           |  FROM ori$i e1 JOIN ori$i e2 ON e1.b = e2.a
           |  JOIN ori$i e3 ON e3.a = e1.a AND e3.b = e2.b),
           |s$i AS MATERIALIZED (
           |  SELECT u, v, COUNT(*) AS sup FROM (
           |    SELECT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM t$i
           |    UNION ALL SELECT LEAST(b, c), GREATEST(b, c) FROM t$i
           |    UNION ALL SELECT LEAST(a, c), GREATEST(a, c) FROM t$i)
           |  GROUP BY u, v)""".stripMargin
      s"""WITH $sqlCopurchasePairs,
         |${round(1, "pairs")},
         |e1 AS MATERIALIZED (
         |  SELECT pairs.u, pairs.v FROM pairs JOIN s1 USING (u, v)
         |  WHERE sup >= 2),
         |${round(2, "e1")}
         |SELECT sup, COUNT(*) AS n_edges
         |FROM e1 JOIN s2 USING (u, v) WHERE sup >= 2
         |GROUP BY sup ORDER BY sup""".stripMargin
    },

    // Unrolls the 4 Bellman-Ford rounds as CTEs; weights and min
    // re-aggregation are pure BIGINT arithmetic in both engines.
    "q_sssp" -> {
      // AS MATERIALIZED on e and every relax round: DuckDB inlines
      // CTEs by default, and d4 references d3 references d2 … each
      // JOINing e (itself 2× pairs) — inlined, the relax tree
      // re-evaluates the co-purchase self-join exponentially in the
      // round count (observed as a stall at the 10× replica gate).
      def round(i: Int): String = {
        val p = s"d${i - 1}"
        s"""d$i AS MATERIALIZED (
           |  SELECT node, MIN(dist) AS dist FROM (
           |    SELECT node, dist FROM $p
           |    UNION ALL
           |    SELECT e.dst AS node, $p.dist + e.w AS dist
           |    FROM $p JOIN e ON $p.node = e.src)
           |  GROUP BY node)""".stripMargin
      }
      s"""WITH $sqlCopurchasePairs,
         |e AS MATERIALIZED (
         |  SELECT u AS src, v AS dst, (u + v) % 97 + 1 AS w FROM pairs
         |  UNION ALL
         |  SELECT v AS src, u AS dst, (u + v) % 97 + 1 AS w FROM pairs),
         |d0 AS (
         |  SELECT MIN(u) AS node, CAST(0 AS BIGINT) AS dist FROM pairs),
         |${(1 to 4).map(round).mkString(",\n")}
         |SELECT node, dist FROM d4 ORDER BY dist, node LIMIT 25""".stripMargin
    },

    "q_link_predict" ->
      s"""WITH $sqlCopurchasePairs,
         |adj AS MATERIALIZED (
         |  SELECT u AS w, v AS n FROM pairs
         |  UNION ALL SELECT v AS w, u AS n FROM pairs),
         |deg AS MATERIALIZED (SELECT w, COUNT(*) AS dg FROM adj GROUP BY w),
         |cap AS MATERIALIZED (
         |  SELECT w, n FROM (
         |    SELECT w, n,
         |      row_number() OVER (PARTITION BY w ORDER BY n) AS rn
         |    FROM adj) WHERE rn <= $WedgeCap),
         |cand AS (
         |  SELECT a.n AS u, b.n AS v, COUNT(*) AS n_common,
         |    CAST(SUM(1000000 // dg) AS BIGINT) AS ra_micro
         |  FROM cap a JOIN cap b ON a.w = b.w AND a.n < b.n
         |       JOIN deg ON deg.w = a.w
         |  GROUP BY a.n, b.n)
         |SELECT u, v, n_common, ra_micro FROM cand
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM pairs p WHERE p.u = cand.u AND p.v = cand.v)
         |ORDER BY n_common DESC, ra_micro DESC, u, v LIMIT 100""".stripMargin,

    "q_khop_frontier" ->
      """WITH RECURSIVE cs AS (
        |  SELECT DISTINCT 'c' || o_custkey AS cust, 's' || l_suppkey AS supp
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS MATERIALIZED (
        |  SELECT cust AS src, supp AS dst FROM cs
        |  UNION ALL
        |  SELECT supp AS src, cust AS dst FROM cs),
        |walk(node, hop) AS (
        |  SELECT 's' || s_suppkey AS node, 0 AS hop
        |  FROM supplier WHERE s_suppkey % 10 = 0
        |  UNION
        |  SELECT e.dst, w.hop + 1
        |  FROM walk w JOIN edges e ON w.node = e.src
        |  WHERE w.hop < 3),
        |md AS (SELECT node, MIN(hop) AS hop FROM walk GROUP BY node)
        |SELECT hop, COUNT(*) AS n_nodes FROM md GROUP BY hop ORDER BY hop""".stripMargin
  )
}
