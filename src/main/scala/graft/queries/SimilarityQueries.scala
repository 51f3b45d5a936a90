package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryUtil._

/** Similarity search over the `embeddings` table — SURVEY.md §2.2 "LLM
  * ops" ([E]): exact cosine top-k over a bounded probe set, LSH-bucketed
  * pair search / near-dup detection, multi-table hyperplane LSH ANN, and
  * an IVF (coarse-quantizer) ANN.
  *
  * The dot/norm arithmetic runs in DOUBLE over the float vectors with
  * strictly sequential element order (the codegen'd
  * `graft.functions.CosineSimilarity`), which is the same evaluation
  * order DuckDB's `list_cosine_similarity` uses on DOUBLE[] — results
  * are rounded at 1e-6 for the oracle hash.
  *
  * Scale notes (100 TB / billions of vectors) — no gated query here is
  * an unbounded cartesian self-join:
  *   - `q_cosine_topk` bounds the probe side to a fixed query set (in
  *     production a separate small query table): broadcast(|Q|) × one
  *     linear corpus scan, O(|Q|·n·dim).
  *   - `q_cosine_pairs` / `q_embed_dedup` generate candidates through
  *     the capped multi-table LSH index; the quadratic step runs only
  *     within buckets, and oversized buckets are capped (see
  *     [[lshCandidates]]) so a pathological bucket bounds at CAP·bucket
  *     rather than bucket².
  *   - Hyperplanes come from the portable md5 hash, not a Scala RNG, so
  *     the oracle re-derives them — and at scale they are a tiny
  *     plan-time literal, not data.
  *   - The FULL brute-force all-pairs form ([[bruteForceTopK]]) is kept
  *     as the test-only recall reference (QueryLibrarySpec), not a
  *     driver-gated query.
  */
object SimilarityQueries {

  private val DIM = 64
  private val K = 5
  /** q_hard_negatives' false-negative denoise ceiling: a cross-label
    * candidate whose ROUNDED cosine exceeds this is a probable
    * mislabeled near-dup, not a hard negative. */
  private val FalseNegCeiling = 0.999
  private val N_PLANES = 8    // single-table histogram (q_lsh_buckets)
  private val LSH_TABLES = 4  // multi-table ANN (q_lsh_ann and pair queries)
  private val LSH_BITS = 4
  /** Fixed probe-set size for the exact top-k query. */
  private val N_QUERIES = 50

  /** Per-bucket cap on the index side of LSH candidate generation
    * (SCALE.md "skewed buckets"): within a bucket only the CAP
    * smallest-id members serve as candidates, every member still probes,
    * so one degenerate bucket costs O(bucket·CAP) not O(bucket²).
    * Mirrored exactly in the DuckDB twins, so parity holds whether or
    * not the cap triggers (at sf0.01 it does not; at sf0.1 the 16-bucket
    * tables exceed it and both engines cap identically). */
  private[queries] val CAND_CAP = 200

  /** cos(a, b) in double precision, sequential element order — the
    * native codegen'd expression (graft.functions.CosineSimilarity),
    * bit-identical to DuckDB's double list_cosine_similarity on the
    * fixed-dim non-null embeddings domain (CustomFunctionsSpec), but a
    * single fused loop. */
  private[queries] def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine_sim(a, b)

  /** Deterministic pseudo-random hyperplane component in [-0.5, 0.5) for
    * plane j, dimension i (1-based) — md5-derived so the DuckDB twin
    * re-generates the identical planes. Evaluated at PLAN BUILD time
    * (the planes are constants — recomputing md5 per row × dim was the
    * dominant cost of the LSH queries). */
  private def planeComponent(j: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"plane:$j:$i".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % 1000L).toDouble / 1000.0 - 0.5
  }

  private def planeVector(j: Int): Array[Double] =
    Array.tabulate(DIM)(i => planeComponent(j, i + 1))

  private def sqlPlaneComponent(j: Int, i: String): String =
    s"CAST(CAST('0x' || substring(md5('plane' || ':' || '$j' || ':' || CAST($i AS VARCHAR)), 1, 15) AS BIGINT) % 1000 AS DOUBLE) / 1000.0 - 0.5"

  /** All-plane bucket id for table `t` (LSH_BITS planes fused): the
    * native codegen'd [[graft.functions.HyperplaneBits]] — one pass per
    * row instead of LSH_BITS × 3 interpreted higher-order traversals;
    * accumulation order identical to the SQL twin's list_sum. */
  private def tableBucket(t: Int): Column =
    graft.functions.HyperplaneBits.column(col("embedding"),
      (0 until LSH_BITS).map(k => planeVector(t * LSH_BITS + k)))

  /** (vec_id, bk) — one row per vector per LSH table, bk = (table,
    * bucket) struct. The map-side stage shared by every LSH-driven
    * query. */
  private def lshBanded(e: DataFrame): DataFrame = {
    val buckets = (0 until LSH_TABLES).map { t =>
      struct(lit(t).as("t"), tableBucket(t).as("b"))
    }
    e.select(col("vec_id"), explode(array(buckets: _*)).as("bk"))
  }

  /** Distinct directed candidate pairs (id_a, id_b), id_a ≠ id_b, from
    * the capped multi-table LSH index: every member probes its buckets;
    * only the CAND_CAP smallest-id members of each bucket serve on the
    * index side. Shuffle carries (bucket, id) pairs only — never the
    * embedding arrays. */
  /** Directed candidate pairs WITH possible cross-table duplicates (a
    * pair repeats once per LSH table that buckets it together, ≤
    * LSH_TABLES times) — for consumers whose next step absorbs
    * duplicates anyway (an aggregate, or a coarser distinct), saving
    * the full-frame distinct exchange that [[lshCandidates]] pays. */
  private def lshCandidatesRaw(e: DataFrame, cap: Int = CAND_CAP): DataFrame = {
    val banded = lshBanded(e)
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bk")).orderBy(col("vec_id"))
    val index = banded
      .withColumn("brn", row_number().over(wB))
      .filter(col("brn") <= cap)
      .select(col("bk"), col("vec_id").as("id_b"))
    banded.select(col("bk"), col("vec_id").as("id_a"))
      .join(index, Seq("bk"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"))
  }

  private def lshCandidates(e: DataFrame): DataFrame =
    lshCandidatesRaw(e).distinct()

  /** [[AbCosinePairs]]-only access to the raw candidate stream (the A/B
    * reconstructs the pre-round-9 plan outside this object). */
  private[queries] def lshCandidatesForAb(e: DataFrame): DataFrame =
    lshCandidatesRaw(e)

  /** [[AbCandCap]]-only: raw candidates at an arbitrary index-side cap
    * (the recall-vs-cap curve that makes CAND_CAP a measured contract —
    * round-10 verdict item 4). */
  private[queries] def lshCandidatesRawAtCap(e: DataFrame, cap: Int): DataFrame =
    lshCandidatesRaw(e, cap)

  /** Exact cosine re-rank of candidate pairs to top-K per id_a.
    *
    * The embedding side is broadcast under a corpus-size gate (250 k ×
    * 64 floats ≈ 64 MB, comfortable in any executor; past the cap the
    * hint drops and AQE plans from runtime sizes — at 10⁸+ vectors the
    * production shape co-partitions candidates and vectors by id).
    * Round-9 same-JVM A/B at 100× (3 alternating reps): best-of is a
    * TIE with AQE-planned shuffle joins (48.2 vs 48.6 s), but the
    * broadcast plan is far more PREDICTABLE — 48.2/48.3/48.4 vs
    * 48.6/74.5/89.4 — because the ~10⁸-row candidate frame is never
    * shuffled, so the query is insensitive to heap/spill state. The
    * fleet keeps the stable plan; fresh-JVM singles of this query
    * swing ±40% on a noisy host and must not be compared across
    * sessions (SCALE.md round 9). */
  private val RerankBroadcastCap = 250000L

  private[queries] def rerankTopK(s: SparkSession, d: String, cand: DataFrame): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val bc: DataFrame => DataFrame =
      if (embCount(s, d) <= RerankBroadcastCap) broadcast else identity
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a"))
      .orderBy(col("cos").desc, col("id_b"))
    cand
      .join(bc(emb.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))), Seq("id_a"))
      .join(bc(emb.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))), Seq("id_b"))
      .withColumn("cos", round(cosine(col("emb_a"), col("emb_b")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("id_a"), col("rn"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("rn"))
  }

  /** [[rerankTopK]] over a DUP-CARRYING candidate stream — built for
    * round-10 verdict item 4 and then MEASUREMENT REJECTED for
    * q_lsh_ann (kept only as [[AbLshAnn]]'s B form). The idea:
    * `dense_rank` in place of `row_number` makes duplicate pairs share
    * a rank — the ordering key (cos DESC, id_b) is unique per DISTINCT
    * pair — and a distinct over the already-rank-filtered output
    * absorbs them, so the kept set is IDENTICAL to
    * `rerankTopK(s, d, cand.distinct())` while the full-frame
    * candidate-distinct exchange disappears (dense_rank is rank-like,
    * so InferWindowGroupLimit partial-limits the rank window's
    * exchange map-side). The measurement (AbLshAnn, 100× dup-saturated
    * replica, 3 alternating same-JVM reps): raw 129.5/47.5/62.5 vs
    * distinct 86.3/39.6/37.3 — the distinct form wins EVERY rep and
    * best-of by ~21%, because on a dup-saturated corpus (duplication ≈
    * LSH_TABLES) the raw form pushes 4× rows through the 64-dim cosine
    * and the rank sort, and that CPU exceeds the one exchange the
    * distinct pays. Hash-equivalence of the two forms was pinned at
    * sf0.01 + 10× before the A/B. */
  private def rerankTopKRaw(s: SparkSession, d: String, cand: DataFrame): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val bc: DataFrame => DataFrame =
      if (embCount(s, d) <= RerankBroadcastCap) broadcast else identity
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a"))
      .orderBy(col("cos").desc, col("id_b"))
    cand
      .join(bc(emb.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))), Seq("id_a"))
      .join(bc(emb.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))), Seq("id_b"))
      .withColumn("cos", round(cosine(col("emb_a"), col("emb_b")), 6))
      .withColumn("rn", dense_rank().over(w))
      .filter(col("rn") <= K)
      .select(col("id_a"), col("rn"), col("id_b"), col("cos"))
      .distinct()
      .orderBy(col("id_a"), col("rn"))
  }

  /** [[AbLshAnn]]-only access to both rerank forms over the same
    * candidate recipe. */
  private[queries] def lshAnnFormsForAb(s: SparkSession, d: String)
      : Seq[(String, () => DataFrame)] = Seq(
    "raw" -> (() => rerankTopKRaw(s, d, lshCandidatesRaw(Tables.embeddings(s, d)))),
    "distinct" -> (() => rerankTopK(s, d, lshCandidates(Tables.embeddings(s, d)))))

  /** Test-only FULL brute-force top-k (unbounded O(n²) all-pairs): the
    * exact recall reference for the ANN queries (QueryLibrarySpec). Not
    * driver-gated — the shape dies at 100 TB by design. */
  private[graft] def bruteForceTopK(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a"))
      .orderBy(col("cos").desc, col("id_b"))
    a.join(b, col("id_a") =!= col("id_b"))
      .withColumn("cos", round(cosine(col("emb_a"), col("emb_b")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("id_a"), col("rn"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("rn"))
  }

  /** Exact cosine top-k for an arbitrary PROBE TABLE (vec_id,
    * embedding): broadcast(probes) × one linear corpus scan; the window
    * top-k partial-limits map-side (WindowGroupLimit). The probe set is
    * a real parameter — any small DataFrame of query vectors works, not
    * just a dense id prefix (non-dense probes tested in
    * QueryLibrarySpec). */
  private[graft] def cosineTopK(corpus: DataFrame, probes: DataFrame): DataFrame = {
    val q = probes.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a"))
      .orderBy(col("cos").desc, col("id_b"))
    b.join(broadcast(q), col("id_a") =!= col("id_b"))
      .withColumn("cos", round(cosine(col("emb_a"), col("emb_b")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("id_a"), col("rn"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("rn"))
  }

  /** Per-customer fan-out cap for the item-item co-occurrence join —
    * same hub-skew treatment as GraphQueries.TriCap. The cap keeps a
    * HASH-SPREAD sample keyed by the (cust, supp) PAIR (the lpaPairs
    * recipe: supp·40503 + cust·2654435761 mod 65536, identical BIGINT
    * arithmetic in the twin), not the smallest raw supplier ids — a
    * plain ascending cap makes every customer keep the same few
    * globally-smallest suppliers, biasing co-occurrence density toward
    * those suppliers (round-7 verdict item). */
  private[queries] val CoCap = 16

  val defs: Map[String, Q] = Map(
    // Item-item collaborative-filtering cosine over the supplier ×
    // customer bipartite purchase matrix (binary vectors): candidate
    // pairs come from the CUSTOMER-keyed inverted index — quadratic
    // only within the per-customer cap, the AllPairs shape — then one
    // hash aggregate counts co-occurrence and the true set sizes join
    // back. cos = common / √(na·nb): both operands are exact BIGINTs,
    // sqrt and the division are correctly-rounded IEEE ops, so the
    // micro-rounded value is bit-identical in both engines (the
    // library-wide cosine precedent). Output: top-30 supplier pairs.
    "q_item_cosine" -> ((s, d) => {
      val cs = Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("supp"), col("o_custkey").as("cust"))
        .distinct()
        .localCheckpoint()
      val n = cs.groupBy(col("supp")).agg(count(lit(1)).as("nv"))
      // The per-customer cap runs as the bounded MinKBy aggregate (the
      // skew-proof partial-combinable form — a hub customer forwards at
      // most CoCap rows per map partition instead of its whole supplier
      // list through a rank window), and PairCombinations emits the
      // sa < sb pairs inline — no capped self-join, no second window
      // execution on the other join side. Kept rows are identical to
      // the old rn <= CoCap window (MinKPairsSpec pins the
      // equivalence), so the twin below is unchanged.
      // the spread-hash sort key is PRE-PROJECTED so the codegen'd
      // Project computes it; a TypedImperativeAggregate evaluates its
      // children interpreted per input row, so handing it arithmetic
      // instead of a bound column would put 60 M interpreted
      // multiplications on the update path
      cs.select(col("cust"), col("supp"),
          expr("(supp * 40503 + cust * 2654435761) % 65536").as("hk"))
        .groupBy(col("cust"))
        .agg(graft.functions.GraftFunctions.min_k_by(
          col("hk"), col("supp"), CoCap).as("ss"))
        .select(explode(
          graft.functions.GraftFunctions.pair_combinations(col("ss"))).as("p"))
        .select(col("p.a").as("sa"), col("p.b").as("sb"))
        .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("common"))
        .join(n.select(col("supp").as("sa"), col("nv").as("na")), Seq("sa"))
        .join(n.select(col("supp").as("sb"), col("nv").as("nb")), Seq("sb"))
        .select(col("sa"), col("sb"), col("common"),
          expr("CAST(round(common * 1000000 / " +
            "sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) AS BIGINT)")
            .as("cos_micro"))
        .orderBy(col("cos_micro").desc, col("sa"), col("sb")).limit(30)
    }),

    // Exact cosine top-k (k=5) for a BOUNDED probe set. The gated
    // default uses the first N_QUERIES ids as the probe table so the
    // DuckDB twin can name the same set; production callers pass their
    // own query table to [[cosineTopK]].
    "q_cosine_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      cosineTopK(e, e.filter(col("vec_id") < N_QUERIES))
    }),

    // HARD-NEGATIVE mining for contrastive training (round 12) — the
    // retrieval-training data recipe (DPR/SimCSE class): for each
    // anchor, the top-K most similar vectors with a DIFFERENT label are
    // the informative negatives; candidates ABOVE the denoise ceiling
    // (cos > 0.999 after the shared 6-decimal rounding) are excluded as
    // probable false negatives (cross-label near-dups = label noise —
    // the standard top-similar filter). Exact-arithmetic contract:
    // cosine is the proven bit-parity double, rounded once, so ranks
    // and the ceiling cut are hash-exact in the twin. Shape: the
    // anchor set broadcasts (|Q| rows) against ONE linear corpus scan,
    // then a WindowGroupLimit top-K per anchor — the q_cosine_topk
    // class; at production scale the anchor batches route through the
    // recall-gated IVF/LSH candidate path exactly like q_lsh_ann, with
    // the label-disequality predicate applied post-candidate.
    "q_hard_negatives" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < N_QUERIES)
        .select(col("vec_id").as("id_a"), col("label").as("label_a"),
          col("embedding").as("emb_a"))
      val b = e.select(col("vec_id").as("id_b"), col("label").as("label_b"),
        col("embedding").as("emb_b"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id_a"))
        .orderBy(col("cos").desc, col("id_b"))
      b.join(broadcast(q), col("label_a") =!= col("label_b"))
        .withColumn("cos", round(cosine(col("emb_a"), col("emb_b")), 6))
        .filter(col("cos") <= FalseNegCeiling)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= K)
        .select(col("id_a"), col("rn"), col("id_b"), col("cos"))
        .orderBy(col("id_a"), col("rn"))
    }),

    // MMR (maximal-marginal-relevance) re-ranking — the retrieval
    // diversity pass: top-20 candidates by exact cosine to the probe,
    // then 5 greedy picks maximizing λ·rel − (1−λ)·max-sim-to-selected
    // with λ=0.7. ALL-INTEGER contract: cosines become micro-units
    // (round(cos·1e6), the proven bit-parity double → one rounding),
    // scores are 7·rel − 3·maxsim in BIGINT, ties broken by id — so
    // the greedy argmax sequence is hash-exact and the twin unrolls
    // the same 5 picks as CTEs. Scale shape: the corpus scan reduces
    // to 20 rows via TakeOrdered (partial top-k, no global sort); the
    // 20×20 sim matrix and every greedy step run on checkpointed
    // 20-row frames (deliberate tiny BNLs, the q_cosine_topk class).
    "q_mmr_rerank" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val probe = broadcast(e.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb")))
      val cand = e.filter(col("vec_id") =!= 0)
        .crossJoin(probe)
        .select(col("vec_id").as("id"), col("embedding"),
          round(cosine(col("embedding"), col("q_emb")) * 1000000)
            .cast(LongType).as("rel"))
        .orderBy(col("rel").desc, col("id")).limit(20)
        .localCheckpoint()
      val sims = cand.select(col("id").as("ia"), col("embedding").as("ea"))
        .crossJoin(cand.select(col("id").as("ib"), col("embedding").as("eb")))
        .filter(col("ia") =!= col("ib"))
        .select(col("ia"), col("ib"),
          round(cosine(col("ea"), col("eb")) * 1000000)
            .cast(LongType).as("sim"))
        .localCheckpoint()
      var sel = cand
        .orderBy(col("rel").desc, col("id")).limit(1)
        .select(col("id"), col("rel"), lit(1).as("pick"),
          (col("rel") * 7).as("mmr_score"))
        .localCheckpoint()
      for (k <- 2 to 5) {
        val pick = cand.select(col("id"), col("rel"))
          .join(sel.select(col("id")), Seq("id"), "left_anti")
          .join(sims.withColumnRenamed("ia", "id"), Seq("id"))
          .join(sel.select(col("id").as("ib")), Seq("ib"))
          .groupBy(col("id"), col("rel")).agg(max(col("sim")).as("maxsim"))
          .select(col("id"), col("rel"),
            (col("rel") * 7 - col("maxsim") * 3).as("mmr_score"))
          .orderBy(col("mmr_score").desc, col("id")).limit(1)
          .select(col("id"), col("rel"), lit(k).as("pick"), col("mmr_score"))
        sel = sel.unionByName(pick).localCheckpoint()
      }
      sel.select(col("pick"), col("id").as("vec_id"),
          col("rel").as("rel_micro"), col("mmr_score"))
        .orderBy(col("pick"))
    }),

    // Reciprocal-rank fusion (hybrid retrieval): the embedding ranking
    // (cosine to the probe) and the lexical ranking (frequency of the
    // 3 highest-df query terms) fuse as Σ 1e6 DIV (60 + rank) — the
    // standard RRF k=60, all-integer so the fused order is hash-exact.
    // vec_id and doc_id share the id space by construction, making
    // this the engine's hybrid-search shape. Scale: both rankings cut
    // to top-50 via TakeOrdered BEFORE their rank windows, so the
    // windows see 50 rows; the fusion is a 50×50 full outer on the id.
    "q_rrf_fusion" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(s, d)
      val probe = broadcast(e.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb")))
      val ra = e.filter(col("vec_id") =!= 0)
        .crossJoin(probe)
        .select(col("vec_id").as("id"),
          round(cosine(col("embedding"), col("q_emb")) * 1000000)
            .cast(LongType).as("cos_micro"))
        .orderBy(col("cos_micro").desc, col("id")).limit(50)
        .withColumn("rank_a", row_number()
          .over(Window.orderBy(col("cos_micro").desc, col("id")))
          .cast(LongType))
      val toks = Tables.documents(s, d).select(col("doc_id"),
        explode(filter(split(col("text"), " "), t => length(t) > 0)).as("tok"))
      val top3 = toks.distinct().groupBy(col("tok"))
        .agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("tok")).limit(3)
      val rb = toks.join(broadcast(top3.select(col("tok"))), Seq("tok"))
        .groupBy(col("doc_id").as("id")).agg(count(lit(1)).as("tf"))
        .orderBy(col("tf").desc, col("id")).limit(50)
        .withColumn("rank_b", row_number()
          .over(Window.orderBy(col("tf").desc, col("id")))
          .cast(LongType))
      ra.select(col("id"), col("rank_a"))
        .join(rb.select(col("id"), col("rank_b")), Seq("id"), "full_outer")
        .select(col("id").as("doc_id"), col("rank_a"), col("rank_b"),
          (coalesce(expr("1000000 DIV (60 + rank_a)"), lit(0L)) +
            coalesce(expr("1000000 DIV (60 + rank_b)"), lit(0L)))
            .as("rrf_micro"))
        .orderBy(col("rrf_micro").desc, col("doc_id")).limit(20)
    }),

    // Pairwise cosine above a threshold through the capped LSH index
    // (candidates only where some table buckets them together; exact
    // cosine verifies) — the scale shape for similarity pair search.
    // The embedding sides ride the rerankTopK broadcast gate: the
    // candidate frame is ~n·TABLES·CAND_CAP rows (10⁸ at the 100×
    // point) and was being SHUFFLED twice — by id_a, then by id_b with
    // the 64-float emb_a array already attached — while the embedding
    // table is the small side. Found by ScanAudit + the 100× probe
    // (this was the heaviest non-deliberate row in the fleet).
    "q_cosine_pairs" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val bc: DataFrame => DataFrame =
        if (embCount(s, d) <= RerankBroadcastCap) broadcast else identity
      // Raw (dup-carrying) candidates with the distinct AFTER the
      // ≥0.85 verify (the q_embed_dedup treatment, promoted here by
      // the round-13 AbCosinePairs A/B at 100×: late 23.3/41.8/44.6 s
      // vs the distinct-first form's 120.7/171.3/260.7 s, same row
      // counts, every rep) — the one full-frame exchange used to carry
      // ~10⁸ candidate id pairs into the distinct; now only the
      // threshold survivors reach it, and the ≤LSH_TABLES× duplicate
      // candidates cost re-verified cosines map-side through the
      // broadcast joins instead.
      // DETERMINISM PRECONDITION (round-13 advice): the late distinct
      // collapses duplicate LSH candidates only because cos/same_label
      // are pure functions of the (id_a, id_b) pair, evaluated
      // identically on every duplicate row. If the verify expression
      // ever becomes nondeterministic-tagged, duplicates stop matching
      // and leak as extra output rows — CosinePairsDistinctSpec pins
      // distinct-on-(id_a,id_b) count == full-row distinct count.
      val pairs = lshCandidatesRaw(e)
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"))
      pairs
        .join(bc(e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
          col("label").as("label_a"))), Seq("id_a"))
        .join(bc(e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
          col("label").as("label_b"))), Seq("id_b"))
        .withColumn("cos", round(cosine(col("emb_a"), col("emb_b")), 6))
        .filter(col("cos") >= 0.85)
        .select(col("id_a"), col("id_b"), col("cos"),
          (col("label_a") === col("label_b")).cast(IntegerType).as("same_label"))
        .distinct()
        .orderBy(col("id_a"), col("id_b"))
    }),

    // LSH bucketing: 8 hyperplane sign bits per vector (map-side stage of
    // the approximate path; bucket histogram is the oracle check).
    "q_lsh_buckets" -> ((s, d) => {
      val bits = graft.functions.HyperplaneBits.column(col("embedding"),
        (0 until N_PLANES).map(planeVector))
      Tables.embeddings(s, d)
        .withColumn("bucket", bits)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec_id"))
        .orderBy(col("bucket"))
    }),

    // Embedding-cosine near-dup with survivor policy, through the capped
    // LSH index: a vector is a duplicate if a LOWER-id candidate sits
    // within cosine >= 0.85; output every vector with its dup flag and
    // (for dups) the dominating id — the embedding-space analog of
    // q_dedup_exact's min-id survivorship.
    "q_embed_dedup" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      // Same broadcast gate as q_cosine_pairs: never shuffle the
      // candidate frame to meet the (small) embedding table.
      val bc: DataFrame => DataFrame =
        if (embCount(s, d) <= RerankBroadcastCap) broadcast else identity
      // Raw candidates: the min(id_b) aggregate absorbs cross-table
      // duplicates, so the directed distinct exchange is pure waste
      // here (duplicates only cost re-verifying a cosine map-side).
      val dups = lshCandidatesRaw(e)
        .filter(col("id_b") < col("id_a"))
        .join(bc(e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))), Seq("id_a"))
        .join(bc(e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))), Seq("id_b"))
        .withColumn("cos", round(cosine(col("emb_a"), col("emb_b")), 6))
        .filter(col("cos") >= 0.85)
        .groupBy(col("id_a"))
        .agg(min(col("id_b")).as("dup_of"))
      e.select(col("vec_id")).join(dups.toDF("vec_id", "dup_of"), Seq("vec_id"), "left")
        .select(col("vec_id"), col("dup_of").isNotNull.as("is_dup"), col("dup_of"))
        .orderBy(col("vec_id"))
    }),

    "q_ivf_ann" -> ((s, d) => ivfAnn(s, d)),

    // Within-bound recall gates for the TRAINED ANN variants (see
    // [[annRecallGate]]): the Lloyd-refined IVF quantizer vs the exact
    // cosine top-k, and the Lloyd-trained PQ codebooks vs exact L2.
    "q_ivf_lloyd_recall" -> ((s, d) => annRecallGate(s, d, "ivf_lloyd")),
    "q_pq_lloyd_recall" -> ((s, d) => annRecallGate(s, d, "pq_lloyd")),

    // Product-quantization ANN with asymmetric distance (ADC): the
    // corpus is encoded once to 8 one-byte codes per vector (a 64-byte
    // embedding becomes 8 bytes — the memory trick that lets a billion
    // vectors live in RAM); probes compare their RAW subvectors to the
    // codeword of each corpus vector's code. Encoding and ADC are both
    // per-row sequential folds over a PLAN-TIME md5 codebook, so the
    // DuckDB twin derives the identical codebook and every double
    // matches bit-for-bit. Same bounded-probe broadcast shape as
    // q_cosine_topk: broadcast(|Q|) × one linear scan of the codes.
    "q_pq_ann" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val coded = e.select(col("vec_id").as("id_b"),
        pqCodes(col("embedding")).as("codes"))
      val q = e.filter(col("vec_id") < N_QUERIES)
        .select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id_a")).orderBy(col("adc"), col("id_b"))
      coded.join(broadcast(q), col("id_a") =!= col("id_b"))
        .withColumn("adc", round(pqAdc(col("emb_a"), col("codes")), 6))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= K)
        .select(col("id_a"), col("rn"), col("id_b"), col("adc"))
        .orderBy(col("id_a"), col("rn"))
    }),

    // Approximate NN: multi-table LSH (4 tables × 4 hyperplane bits) —
    // candidates share ANY table's bucket (capped); exact cosine re-ranks
    // them. Multi-table is the standard recall lever: P(candidate) =
    // 1-(1-p^bits)^tables vs p^bits for one wide table. Compared against
    // bruteForceTopK in the ScalaTest recall test; oracle-checked for
    // parity here.
    "q_lsh_ann" -> ((s, d) =>
      rerankTopK(s, d, lshCandidates(Tables.embeddings(s, d)))),

    // The k-means UPDATE step as a gated operator: per (cell, dim)
    // exact sums of member embeddings in integer micro-units — the
    // (cid, dim)-keyed shuffle with map-side partial aggregation that
    // every broadcast-k-means iteration runs at corpus scale. Sums
    // instead of means on purpose: the mean is sum/n downstream, and
    // integer division would hit the Spark-DIV-truncates vs
    // DuckDB-//-floors split on negative components.
    "q_embed_centroid" -> ((s, d) => {
      seededScored(s, d, 16)
        .filter(col("crn") === 1)
        .select(col("cid"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("cid"), col("dim"))
        .agg(count(lit(1)).as("n_members"),
          sum(round(col("v").cast(DoubleType) * 1000000)
            .cast(DecimalType(38, 0))).cast(LongType).as("sum_micro"))
        .orderBy(col("cid"), col("dim"))
    }),

    // Per-dimension QUANTILE NORMALIZATION of the embedding space
    // (percent_rank of each component within its dimension, first 8
    // dims gated) — the rank-based whitening step that makes cosine /
    // Euclidean distances comparable across dimensions with wildly
    // different scales. pr = (rank-1)/(n-1) is an exact integer ratio;
    // values are compared, never operated on, so the float column
    // crosses engines bit-exactly (widened to DOUBLE only for output).
    //
    // Scale note: as written this is one shuffle partitioned by dim —
    // fine while #dims ≥ cores, but a single dimension's values land in
    // ONE partition. The 100 TB form range-partitions (dim, v) and
    // derives rank = per-partition offset + prefix count (exactly how
    // q_equidepth_hist re-shapes its global sort); the gated semantics
    // are unchanged, so the operator is the contract, not the layout.
    "q_embed_quantile_norm" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("dim")).orderBy(col("v"))
      Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .filter(col("dim") < 8)
        .withColumn("pr", percent_rank().over(w))
        .select(col("vec_id"), col("dim"),
          col("v").cast(DoubleType).as("v"), col("pr"))
        .orderBy(col("dim"), col("vec_id"))
    }),

    // Dense linear projection — the PCA / random-projection APPLY step
    // (dimensionality-reduction infra for ANN index build and sketching;
    // Johnson–Lindenstrauss says 8 random dims preserve pairwise
    // geometry up to ~1/√8 distortion). Every embedding is multiplied
    // through a fixed 64×8 matrix derived at PLAN time from the md5
    // hyperplane generator (a TRAINED PCA basis would broadcast the
    // same way); each output dim is one sequential zip_with·fold in
    // element order — the CosineSimilarity evaluation-order contract —
    // rounded at 1e-6 for the oracle hash. Pure map-side: no shuffle,
    // pipelines inside the scan at any scale.
    "q_embed_project" -> ((s, d) => {
      val outDims = (0 until 8).map { j =>
        val w = planeVector(j).map(lit(_))
        round(aggregate(
          zip_with(col("embedding"), array(w: _*), (a, b) => a * b),
          lit(0.0d), (acc, x) => acc + x), 6).as(s"p$j")
      }
      Tables.embeddings(s, d)
        .select(col("vec_id") +: outDims: _*)
        .orderBy(col("vec_id"))
    }),

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC dedup =
    // cluster the embedding space coarsely, then prune near-duplicates
    // WITHIN clusters only — the trick that turns a quadratic global
    // cosine search into per-cluster work. A vector is a duplicate iff
    // some EARLIER-id member of ITS cluster (earlier side capped at
    // SEM_CAP, the IVF_CAP treatment, mirrored in the twin) has cosine
    // ≥ τ; the min-id survivor stays. Candidates travel as id pairs
    // only; embeddings join back for the verify. Scale shape: the
    // assignment is a broadcast join against O(centroids) rows; the
    // pairing shuffle keys on cid with the per-cluster cap bounding a
    // degenerate cluster at cap·|cluster| — production retrains nlist ∝
    // √n so expected cluster size stays constant (same argument as
    // IVF), and τ comes from a held-out calibration, not from here.
    "q_semdedup" -> ((s, d) => {
      // The assignment table (vec_id → nearest cell) is consumed by
      // THREE branches (cap window, pair index side, final join-back);
      // un-materialized, each re-derives seededScored from its own
      // embeddings scans and re-scores n×16 cosines (ScanAudit
      // round 10: 8 scans → 2, scoring once — the q_ivf_ann fix, A/B'd
      // there; O(n) ints, the table every production IVF persists).
      val assign = seededScored(s, d, 16).filter(col("crn") === 1)
        .select(col("vec_id"), col("cid"))
        .localCheckpoint()
      val wM = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cid")).orderBy(col("vec_id"))
      val capped = assign.withColumn("mrn", row_number().over(wM))
        .filter(col("mrn") <= SEM_CAP)
        .select(col("cid"), col("vec_id").as("id_a"))
      val pairs = capped
        .join(assign.select(col("cid"), col("vec_id").as("id_b")), Seq("cid"))
        .filter(col("id_a") < col("id_b"))
      val e = Tables.embeddings(s, d)
      val dups = pairs
        .join(e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a")), Seq("id_a"))
        .join(e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b")), Seq("id_b"))
        .filter(cosine(col("emb_a"), col("emb_b")) >= SEM_TAU)
        .select(col("id_b").as("vec_id")).distinct()
        .withColumn("dup", lit(true))
      assign
        .join(dups, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cid"),
          coalesce(col("dup"), lit(false)).as("is_dup"))
        .orderBy(col("vec_id"))
    }),

    // Matryoshka-style dimension-truncation evaluation: how much
    // recall@5 survives if retrieval runs on only the FIRST 16 of the
    // 64 embedding dimensions (the storage/compute lever behind MRL
    // embeddings and PQ prefix scans). Both rankings are EXACT cosine
    // top-k — full-dim vs sliced — so unlike the trained-ANN recall
    // gates this one is fully hash-gated per probe: the overlap count
    // and recall are deterministic integers. Shape: two broadcast-probe
    // corpus scans (the proven cosineTopK shape) + one pair-keyed
    // semi-join; at 100 TB the truncated scan reads 4× fewer embedding
    // bytes — the point of the operator.
    "q_trunc_recall" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      def sliced(df: DataFrame) = df.select(col("vec_id"),
        slice(col("embedding"), 1, 16).as("embedding"))
      val probes = e.filter(col("vec_id") < N_QUERIES)
      val full = cosineTopK(e, probes)
        .select(col("id_a"), col("id_b"))
      val trunc = cosineTopK(sliced(e), sliced(probes))
        .select(col("id_a"), col("id_b"))
      val common = full.join(trunc, Seq("id_a", "id_b"), "left_semi")
        .groupBy(col("id_a")).agg(count(lit(1)).as("n_common"))
      probes.select(col("vec_id").as("id_a"))
        .join(common, Seq("id_a"), "left")
        .select(col("id_a"),
          coalesce(col("n_common"), lit(0L)).as("n_common"),
          expr(s"coalesce(n_common, 0) * 1000000 DIV $K").as("recall_micro"))
        .orderBy(col("id_a"))
    })
  )

  /** SemDeDup per-cluster earlier-member cap and cosine threshold. */
  private[queries] val SEM_CAP = 128
  private[queries] val SEM_TAU = 0.5

  /** DOUBLE[] casts are load-bearing: DuckDB's list_cosine_similarity on
    * FLOAT[] computes (and returns) float32, which diverges from Spark's
    * double accumulation well above the 1e-6 rounding grain. */
  /** IVF (inverted-file) ANN: a deterministic coarse quantizer — 16
    * seed centroids chosen by hash order of vec_id (production would run
    * k-means||; the join shape is identical) — assigns every vector to
    * its nearest centroid; queries probe their `nprobe`=4 nearest
    * centroids and exact-re-rank the union of those posting lists.
    * The quantizer is deterministic (md5 seed order), so the DuckDB twin
    * replays it exactly; recall is asserted vs the exact top-k in
    * QueryLibrarySpec.
    *
    * Scale shape: assignment is a broadcast join against O(centroids)
    * rows; the only shuffle groups by centroid id (the posting lists);
    * probing is a second broadcast join + per-query top-k.
    *
    * Posting lists are CAPPED on the serving side ([[IVF_CAP]], same
    * pattern as [[CAND_CAP]]): with a fixed quantizer, list length grows
    * ∝ corpus and every vector probes nprobe lists, which is a hidden
    * O(n²/nlist) — measured 139× cost at 10× data before the cap. With
    * it, candidates are ≤ n·nprobe·CAP (linear). Production additionally
    * retrains the quantizer with nlist ∝ √n, which keeps expected list
    * length at √n; the cap bounds the worst case either way. Mirrored in
    * the DuckDB twin; at the sf0.01 gate lists are ~31 long, so the cap
    * does not trigger and parity is unconditional. */
  private[queries] val IVF_CAP = 128

  /** Hash-seeded coarse quantizer scoring, shared by [[ivfAnn]] and the
    * centroid-update query: every vector scored against the broadcast
    * seed centroids, `crn` ranking nearest-first. */
  private[queries] def seededScored(s: SparkSession, d: String, nCent: Int): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val cents = emb
      .withColumn("h", graft.functions.GraftFunctions.portable_hash60(
        concat(lit("seed:"), col("vec_id").cast(StringType))))
      .orderBy(col("h"), col("vec_id")).limit(nCent)
      .select(col("vec_id").as("seed_id"), col("embedding").as("cent"))
      .withColumn("cid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("seed_id"))))
      .select(col("cid"), col("cent"))
    val wNear = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
    emb.join(broadcast(cents))
      .withColumn("ccos", cosine(col("embedding"), col("cent")))
      .withColumn("crn", row_number().over(wNear))
  }

  private def ivfAnn(s: SparkSession, d: String): DataFrame = {
    val nCent = 16
    val nProbe = 4
    // ONE scoring pass feeds both the posting lists and the probe
    // assignments: pruned to (cid, vec_id, crn ≤ nProbe) — O(n·nprobe)
    // ints, the assignment table every production IVF persists anyway —
    // and localCheckpoint'd, because without the materialization each
    // consumer branch re-derives seededScored from its own pair of
    // embeddings scans (round-10 ScanAudit sweep: 6 scans → 2·scoring
    // once; the n×nCent cosine scoring was running TWICE).
    val scored = seededScored(s, d, nCent)
      .filter(col("crn") <= nProbe)
      .select(col("cid"), col("vec_id"), col("crn"))
      .localCheckpoint()
    val wMember = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid")).orderBy(col("id_b"))
    val members = scored.filter(col("crn") === 1)
      .select(col("cid"), col("vec_id").as("id_b"))
      .withColumn("mrn", row_number().over(wMember))
      .filter(col("mrn") <= IVF_CAP)
      .select(col("cid"), col("id_b"))
    val probes = scored.filter(col("crn") <= nProbe)
      .select(col("cid"), col("vec_id").as("id_a"))
    // No distinct: each vector is a member of exactly ONE posting list
    // (crn=1), so a pair (a,b) arises at most once (iff cid(b) is among
    // a's probes) — a dedup here would be a wasted full shuffle of the
    // candidate set (~n·nprobe·CAP rows at scale).
    val cand = probes.join(members, Seq("cid"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"))
    rerankTopK(s, d, cand)
  }

  // ---------------------------------------------------------------
  // Product quantization (PQ/ADC)
  // ---------------------------------------------------------------

  /** PQ geometry: DIM=64 split into M=8 subspaces × SUB=8 dims, K=16
    * codewords per subspace. */
  private val PQ_M = 8
  private val PQ_SUB = DIM / PQ_M
  private val PQ_K = 16

  /** Codebook spread matched to the data domain: the embeddings are
    * unit-norm 64-dim, so components have std 1/√64; uniform [-0.5,0.5)
    * has std 1/√12 — scale by √12/8 so codewords live where the
    * subvectors live (measured recall@5 0.06 → 0.16 from this alone;
    * production trains per-subspace k-means codebooks, the
    * [[ivfAnnLloyd]] pattern applied per subspace). The constant is
    * interpolated into the twin as the same shortest round-trip double
    * literal. */
  private val PQ_SCALE = math.sqrt(12.0) / 8.0

  /** Codeword c (1-based), dimension i (1-based) — md5-derived like the
    * LSH hyperplanes, so the codebook is a plan-time literal here and a
    * 16-row CTE in the twin. */
  private def pqComponent(c: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"pq:$c:$i".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    ((java.lang.Long.parseLong(hex, 16) % 1000L).toDouble / 1000.0 - 0.5) * PQ_SCALE
  }

  private def pqCodebook: Array[Array[Double]] =
    Array.tabulate(PQ_K)(c => Array.tabulate(DIM)(i => pqComponent(c + 1, i + 1)))

  /** PQ encode / asymmetric distance: the native codegen'd kernels
    * (`graft.functions.{PqEncode, PqAdc}`) — same sequential fold
    * structure as the composed higher-order form they replace (parity
    * asserted in CustomFunctionsSpec), codebook shipped as a codegen
    * reference object. Codes are 1-based; argmin ties take the first
    * (smallest c), like array_position of array_min. */
  private[graft] def pqCodes(emb: Column): Column =
    graft.functions.PqExpressions.encode(emb, pqCodebook, PQ_M, PQ_SUB)

  private[graft] def pqAdc(qEmb: Column, codes: Column): Column =
    graft.functions.PqExpressions.adc(qEmb, codes, pqCodebook, PQ_M, PQ_SUB)

  /** Plan-time codebook accessor for the parity spec. */
  private[graft] def pqCodebookForTest: Seq[Array[Double]] = pqCodebook

  /** PQ with TRAINED per-subspace codebooks: `iters` Lloyd iterations
    * over each subspace's subvectors, seeded from the md5 codebook —
    * the production path (the scaled-random codebook is the
    * oracle-replayable gate variant). Training is distributed: one
    * explode to (vec, m, j, value) rows, one broadcast-join assignment
    * per iteration, per-(m, c, j) means with map-side combine; the
    * k×M×SUB codebook (16×8×8 doubles) collects to the driver between
    * iterations like every broadcast-k-means. Not driver-gated (double
    * means are summation-order dependent); QueryLibrarySpec measures
    * recall@5 against the exact-L2 reference. */
  private[graft] def pqAnnTrained(s: SparkSession, d: String, iters: Int = 2): DataFrame = {
    val emb = Tables.embeddings(s, d)
    var cb: Array[Array[Double]] = pqCodebook // [c][dim]
    import s.implicits._
    for (_ <- 0 until iters) {
      // (vec_id, m, subvec) rows once per iteration
      val cbRows = for {
        c <- cb.indices
        m <- 0 until PQ_M
      } yield (m, c + 1, cb(c).slice(m * PQ_SUB, (m + 1) * PQ_SUB).toSeq)
      val cbDf = broadcast(cbRows.toDF("m", "c", "cw"))
      val subs = emb.select(col("vec_id"),
        explode(sequence(lit(0), lit(PQ_M - 1))).as("m"),
        col("embedding"))
        .select(col("vec_id"), col("m"),
          slice(col("embedding"), col("m") * PQ_SUB + 1, lit(PQ_SUB)).as("sv"))
      // fused codegen form — bit-identical to the composed
      // aggregate(zip_with((cast(a)-b)²)) fold (SquaredL2Spec)
      val d2 = graft.functions.GraftFunctions.sq_l2(col("sv"), col("cw"))
      val assigned = subs.join(cbDf, Seq("m"))
        .withColumn("d2", d2)
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("vec_id"), col("m"))
            .orderBy(col("d2"), col("c"))))
        .filter(col("rn") === 1)
        .select(col("m"), col("c"), col("sv"))
      val means = assigned
        .select(col("m"), col("c"), posexplode(col("sv")))
        .groupBy(col("m"), col("c"), col("pos"))
        .agg(avg(col("col").cast(DoubleType)).as("v"))
        .collect().map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getDouble(3))).toMap
      cb = Array.tabulate(cb.length) { ci =>
        Array.tabulate(DIM) { i =>
          val m = i / PQ_SUB
          means.getOrElse((m, ci + 1, i - m * PQ_SUB), cb(ci)(i)) // empty cell keeps old value
        }
      }
    }
    val trained: Seq[Array[Double]] = cb.toSeq
    val e = Tables.embeddings(s, d)
    val coded = e.select(col("vec_id").as("id_b"),
      graft.functions.PqExpressions.encode(col("embedding"), trained, PQ_M, PQ_SUB).as("codes"))
    val q = e.filter(col("vec_id") < N_QUERIES)
      .select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a")).orderBy(col("adc"), col("id_b"))
    coded.join(broadcast(q), col("id_a") =!= col("id_b"))
      .withColumn("adc",
        graft.functions.PqExpressions.adc(col("emb_a"), col("codes"), trained, PQ_M, PQ_SUB))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("id_a"), col("rn"), col("id_b"), col("adc"))
      .orderBy(col("id_a"), col("rn"))
  }

  /** IVF with a k-means-REFINED quantizer: the hash-seeded centroids
    * above, improved by `iters` fixed Lloyd iterations (assign every
    * vector to its nearest centroid — ties broken by cid — then replace
    * each centroid with the element-wise mean of its members). The
    * iteration count is fixed and the seed set is deterministic, so runs
    * are reproducible up to double-summation order in the means.
    *
    * Scale shape per iteration: one broadcast join against O(nCent)
    * centroids + one (cid, dim)-keyed mean with map-side partial
    * aggregation — the standard broadcast-k-means pattern; the k×dim
    * centroid matrix (16×64 here) collects to the driver between
    * iterations, which is what every Lloyd-on-Spark implementation does.
    *
    * NOT driver-gated: double mean summation order is
    * partitioning-dependent, so a DuckDB twin would be fragile at the
    * hash grain. The gated `q_ivf_ann` keeps the seeded quantizer the
    * oracle can replay; QueryLibrarySpec measures this variant's
    * recall@5 uplift over it against bruteForceTopK. */
  /** Corpus-size cache for the adaptive quantizer sizing: the count is
    * a full-scan action, and ivfAnnLloyd is constructed twice per
    * annRecallGate composition (plus tests/benches) — per (sf dir) the
    * corpus is immutable, so pay the scan once per JVM (the sharedTable
    * idempotence treatment applied to a scalar; round-7 advice). */
  private val embCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def embCount(s: SparkSession, d: String): Long =
    embCounts.computeIfAbsent(d,
      _ => Long.box(Tables.embeddings(s, d).count())).longValue()

  private[graft] def ivfAnnLloyd(s: SparkSession, d: String, iters: Int = 2): DataFrame = {
    val emb = Tables.embeddings(s, d)
    // nlist ∝ √n — the standard IVF sizing law: expected posting-list
    // length stays ~√n, so the serving-side cap ([[IVF_CAP]]) is a
    // worst-case bound instead of the effective list length. With the
    // old fixed nlist=16, a 10× corpus put ~1 250 members behind a
    // 128 cap ordered by raw id — recall@5 collapsed to 7.6% on the
    // replica because probes' true neighbors (key-shifted duplicate
    // ids) were all above the cap. The one-row count is a bounded
    // driver action, same class as the Lloyd centroid collect (cached
    // per dir — see [[embCount]]). 100 TB note: the per-iteration
    // centroid assignment is a broadcast cross join scoring n·nlist =
    // n·√n cosine pairs; that is the textbook flat coarse quantizer,
    // and past ~10⁸ vectors the standard lever is pruning it with a
    // coarser quantizer level (IVF over the centroids themselves) —
    // out of scope here, noted so the n·√n term is an explicit choice.
    val nCent = math.max(16,
      math.ceil(math.sqrt(embCount(s, d).toDouble)).toInt)
    // nprobe rides nlist at a fixed 1/4: the synthetic embeddings are
    // near-isotropic (the hard case for IVF), so recall tracks the
    // PROBED FRACTION of the corpus — a fixed nprobe over a √n-sized
    // nlist silently shrinks that fraction as the corpus grows (39%
    // recall at sf0.1 with 4/45 cells). Clustered production corpora
    // can run far lower fractions; the knob is explicit here.
    val nProbe = math.max(4, nCent / 4)
    val seeded = emb
      .withColumn("h", graft.functions.GraftFunctions.portable_hash60(
        concat(lit("seed:"), col("vec_id").cast(StringType))))
      .orderBy(col("h"), col("vec_id")).limit(nCent)
      .select(col("vec_id").as("seed_id"), col("embedding"))
      .withColumn("cid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("seed_id"))))
      .select(col("cid"), col("embedding"))
    var cents: Seq[(Int, Seq[Float])] = seeded.collect()
      .map(r => r.getInt(0) ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toSeq).toSeq
    for (_ <- 0 until iters) {
      import s.implicits._
      val cdf = broadcast(cents.toDF("cid", "cent"))
      val wNear = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
      val assigned = emb.join(cdf)
        .withColumn("ccos", cosine(col("embedding"), col("cent")))
        .withColumn("crn", row_number().over(wNear))
        .filter(col("crn") === 1)
        .select(col("cid"), col("embedding"))
      val means = assigned
        .select(col("cid"), posexplode(col("embedding")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("col").cast(DoubleType)).as("v"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      val updated = means.groupBy(_._1).map { case (cid, xs) =>
        cid -> xs.sortBy(_._2).map(_._3.toFloat).toSeq
      }
      // empty clusters keep their previous centroid
      cents = cents.map { case (cid, old) => cid -> updated.getOrElse(cid, old) }
    }
    import s.implicits._
    val finalCents = broadcast(cents.toDF("cid", "cent"))
    val wNear = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
    val scored = emb.join(finalCents)
      .withColumn("ccos", cosine(col("embedding"), col("cent")))
      .withColumn("crn", row_number().over(wNear))
    // Cap order is HASH-SPREAD, not raw id: when a list does overflow
    // the cap, it keeps a deterministic pseudo-random sample of the
    // cell instead of the globally-smallest ids (which correlate with
    // insertion order and starve late-arriving near-duplicates).
    val wMember = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid"))
      .orderBy(graft.functions.GraftFunctions.portable_hash60(
        concat(lit("ivfcap:"), col("id_b").cast(StringType))), col("id_b"))
    val members = scored.filter(col("crn") === 1)
      .select(col("cid"), col("vec_id").as("id_b"))
      .withColumn("mrn", row_number().over(wMember))
      .filter(col("mrn") <= IVF_CAP)
      .select(col("cid"), col("id_b"))
    val probes = scored.filter(col("crn") <= nProbe)
      .select(col("cid"), col("vec_id").as("id_a"))
    val cand = probes.join(members, Seq("cid"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"))
    rerankTopK(s, d, cand)
  }

  /** Exact squared-L2 top-K for a bounded probe table — the ground
    * truth metric for the PQ/ADC family (same metric space), broadcast
    * probes x one linear corpus scan like [[cosineTopK]]. */
  private def exactL2TopK(corpus: DataFrame, probes: DataFrame): DataFrame = {
    val q = probes.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    // fused codegen form of aggregate(zip_with((x-y)²)) — this runs on
    // the |probes| × |corpus| product, the recall gates' exact side
    val d2 = graft.functions.GraftFunctions.sq_l2(col("emb_a"), col("emb_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a")).orderBy(col("d2"), col("id_b"))
    b.join(broadcast(q), col("id_a") =!= col("id_b"))
      .withColumn("d2", d2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("id_a"), col("rn"), col("id_b"))
  }

  /** Recall floors (micro-units) for the within-bound gates below —
    * set ~20% under the weakest measured recall so Lloyd's benign
    * last-ulp mean nondeterminism can never flip the gated boolean.
    * Measured recall@5 (micro) with the √n-adaptive nlist quantizer:
    * ivf_lloyd 572k/568k/656k/852k and pq_lloyd 192k/168k/—/1000k at
    * sf0.001/sf0.01/sf0.1/the 10x replica (recall RISES with scale:
    * cells stay ~√n so the serving cap stops truncating lists). */
  private[graft] val IVF_LLOYD_FLOOR = 450000L
  private[graft] val PQ_LLOYD_FLOOR = 120000L

  /** The within-bound gate for the TRAINED (Lloyd) ANN variants — the
    * q_hll_intersect pattern applied to recall: the variant's recall@K
    * over the bounded probe sample is compared against a fixed floor
    * INSIDE the query, and the boolean (plus the exact-side row count
    * the twin recomputes independently) is what the oracle hashes. The
    * trained variants' raw neighbor lists are not oracle-stable (double
    * mean summation order is partitioning-dependent), but the recall
    * CLAIM is — this closes the last un-gated surface.
    *
    * Scale shape (100 TB): the approx side is the capped IVF/PQ path;
    * the exact side is broadcast(|Q|) x one linear corpus scan — the
    * standard sampled recall audit, NOT the O(n²) brute force. */
  private def annRecallGate(s: SparkSession, d: String, variant: String)
      : DataFrame = {
    val e = Tables.embeddings(s, d)
    val probes = e.filter(col("vec_id") < N_QUERIES)
    val (approx, exact, floor) = variant match {
      case "ivf_lloyd" =>
        (ivfAnnLloyd(s, d).filter(col("id_a") < N_QUERIES),
          cosineTopK(e, probes), IVF_LLOYD_FLOOR)
      case "pq_lloyd" =>
        (pqAnnTrained(s, d), exactL2TopK(e, probes), PQ_LLOYD_FLOOR)
    }
    val hits = approx.select(col("id_a"), col("id_b"))
      .join(exact.select(col("id_a"), col("id_b")), Seq("id_a", "id_b"))
      .agg(count(lit(1)).as("n_hit"))
    val nEx = exact.agg(count(lit(1)).as("n_exact"))
    hits.crossJoin(broadcast(nEx))
      .select(lit(variant).as("variant"), col("n_exact"),
        lit(floor).as("floor_micro"),
        (col("n_hit") * lit(1000000L) >= lit(floor) * col("n_exact"))
          .as("within_floor"))
      .orderBy(col("variant"))
  }

  private val sqlCosine =
    "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6)"

  private def sqlBits(tbl: String): String =
    (0 until N_PLANES).map { j =>
      val proj = s"list_sum(list_transform(range(1, ${DIM + 1}), i -> $tbl.embedding[i] * (${sqlPlaneComponent(j, "i")})))"
      s"(CASE WHEN $proj > 0 THEN 1 ELSE 0 END) * ${1 << j}"
    }.mkString(" + ")

  /** CTE chain `t → banded → capped → cand(id_a, id_b)` mirroring
    * [[lshCandidates]] (including the CAND_CAP index-side cap). */
  private val sqlLshCandidates: String = {
    val bucketCols = (0 until LSH_TABLES).map { t =>
      val bits = (0 until LSH_BITS).map { k =>
        val j = t * LSH_BITS + k
        val proj = s"list_sum(list_transform(range(1, ${DIM + 1}), i -> embeddings.embedding[i] * (${sqlPlaneComponent(j, "i")})))"
        s"(CASE WHEN $proj > 0 THEN 1 ELSE 0 END) * ${1 << k}"
      }.mkString(" + ")
      s"CAST($bits AS INTEGER) AS b$t"
    }.mkString(", ")
    val bandStructs = (0 until LSH_TABLES).map(t => s"($t, b$t)").mkString(", ")
    s"""t AS (
       |  SELECT vec_id, $bucketCols FROM embeddings),
       |banded AS (
       |  SELECT vec_id, unnest([$bandStructs]) AS bk FROM t),
       |capped AS (
       |  SELECT vec_id, bk,
       |    row_number() OVER (PARTITION BY bk ORDER BY vec_id) AS brn
       |  FROM banded),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM banded x JOIN capped y
       |    ON x.bk = y.bk AND y.brn <= $CAND_CAP AND x.vec_id <> y.vec_id)""".stripMargin
  }

  private val sqlRerank: String =
    s"""scored AS (
       |  SELECT id_a, id_b,
       |    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos
       |  FROM cand JOIN embeddings a ON a.vec_id = id_a
       |            JOIN embeddings b ON b.vec_id = id_b),
       |ranked AS (
       |  SELECT id_a, id_b, cos,
       |    row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rn
       |  FROM scored)""".stripMargin

  /** Shared twin fragment: md5 seed order → 16 centroids → full
    * nearest-centroid scoring with `crn` ranking (mirrors
    * [[seededScored]] step by step). */
  private val sqlSeededCranked =
    """seeds AS (
      |  SELECT vec_id AS seed_id, embedding AS cent
      |  FROM embeddings
      |  ORDER BY CAST('0x' || substring(md5('seed:' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT), vec_id
      |  LIMIT 16),
      |cents AS (
      |  SELECT row_number() OVER (ORDER BY seed_id) AS cid, cent FROM seeds),
      |cscored AS (
      |  SELECT e.vec_id, c.cid,
      |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cent AS DOUBLE[])) AS ccos
      |  FROM embeddings e CROSS JOIN cents c),
      |cranked AS (
      |  SELECT vec_id, cid,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crn
      |  FROM cscored)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_item_cosine" ->
      s"""WITH cs AS MATERIALIZED (
         |  SELECT DISTINCT l_suppkey AS supp, o_custkey AS cust
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |n AS (SELECT supp, COUNT(*) AS nv FROM cs GROUP BY supp),
         |capped AS MATERIALIZED (
         |  SELECT supp, cust FROM (
         |    SELECT supp, cust,
         |      row_number() OVER (PARTITION BY cust
         |        ORDER BY (supp * 40503 + cust * 2654435761) % 65536, supp) AS rn
         |    FROM cs) WHERE rn <= $CoCap),
         |co AS (
         |  SELECT a.supp AS sa, b.supp AS sb, COUNT(*) AS common
         |  FROM capped a JOIN capped b
         |    ON a.cust = b.cust AND a.supp < b.supp
         |  GROUP BY sa, sb)
         |SELECT sa, sb, common,
         |  CAST(round(common * 1000000 /
         |    sqrt(CAST(na.nv AS DOUBLE) * CAST(nb.nv AS DOUBLE)))
         |    AS BIGINT) AS cos_micro
         |FROM co JOIN n na ON na.supp = co.sa
         |        JOIN n nb ON nb.supp = co.sb
         |ORDER BY cos_micro DESC, sa, sb LIMIT 30""".stripMargin,

    "q_cosine_topk" ->
      s"""WITH pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, $sqlCosine AS cos
         |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
         |  WHERE a.vec_id < $N_QUERIES),
         |ranked AS (
         |  SELECT id_a, id_b, cos,
         |    row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rn
         |  FROM pairs)
         |SELECT id_a, rn, id_b, cos FROM ranked WHERE rn <= $K
         |ORDER BY id_a, rn""".stripMargin,

    "q_hard_negatives" ->
      s"""WITH pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, $sqlCosine AS cos
         |  FROM embeddings a JOIN embeddings b ON a.label <> b.label
         |  WHERE a.vec_id < $N_QUERIES),
         |f AS (SELECT * FROM pairs WHERE cos <= $FalseNegCeiling),
         |ranked AS (
         |  SELECT id_a, id_b, cos,
         |    row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rn
         |  FROM f)
         |SELECT id_a, rn, id_b, cos FROM ranked WHERE rn <= $K
         |ORDER BY id_a, rn""".stripMargin,

    "q_rrf_fusion" -> {
      val micro = "CAST(round(list_cosine_similarity(CAST(b.embedding AS " +
        "DOUBLE[]), CAST(q.embedding AS DOUBLE[])) * 1000000) AS BIGINT)"
      s"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
         |ra AS (
         |  SELECT id, row_number() OVER (ORDER BY cos_micro DESC, id)
         |    AS rank_a
         |  FROM (
         |    SELECT b.vec_id AS id, $micro AS cos_micro
         |    FROM embeddings b, q WHERE b.vec_id <> 0
         |    ORDER BY cos_micro DESC, id LIMIT 50)),
         |toks AS (
         |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
         |    t -> len(t) > 0)) AS tok
         |  FROM documents),
         |top3 AS (
         |  SELECT tok FROM (
         |    SELECT tok, COUNT(*) AS df
         |    FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok)
         |  ORDER BY df DESC, tok LIMIT 3),
         |rb AS (
         |  SELECT id, row_number() OVER (ORDER BY tf DESC, id) AS rank_b
         |  FROM (
         |    SELECT t.doc_id AS id, COUNT(*) AS tf
         |    FROM toks t JOIN top3 USING (tok)
         |    GROUP BY t.doc_id ORDER BY tf DESC, id LIMIT 50))
         |SELECT COALESCE(ra.id, rb.id) AS doc_id, rank_a, rank_b,
         |  COALESCE(1000000 // (60 + rank_a), 0)
         |    + COALESCE(1000000 // (60 + rank_b), 0) AS rrf_micro
         |FROM ra FULL OUTER JOIN rb ON ra.id = rb.id
         |ORDER BY rrf_micro DESC, doc_id LIMIT 20""".stripMargin
    },

    // The greedy MMR argmax sequence is all-integer (micro cosines,
    // 7·rel − 3·maxsim scores, id tie-break), so the twin just unrolls
    // the 5 picks as CTE stages over the same 20-candidate frame.
    "q_mmr_rerank" -> {
      val micro = (x: String, y: String) =>
        s"CAST(round(list_cosine_similarity(CAST($x AS DOUBLE[]), " +
          s"CAST($y AS DOUBLE[])) * 1000000) AS BIGINT)"
      val steps = (2 to 5).map { k =>
        val prev = if (k == 2) "s1" else s"sel${k - 1}"
        s"""p$k AS (
           |  SELECT id, rel, $k AS pick, mmr_score FROM (
           |    SELECT c.id, c.rel, c.rel * 7 - 3 * MAX(s.sim) AS mmr_score
           |    FROM cand c JOIN sims s ON s.ia = c.id
           |    WHERE s.ib IN (SELECT id FROM $prev)
           |      AND c.id NOT IN (SELECT id FROM $prev)
           |    GROUP BY c.id, c.rel)
           |  ORDER BY mmr_score DESC, id LIMIT 1),
           |sel$k AS (SELECT * FROM $prev UNION ALL SELECT * FROM p$k)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH cand AS (
         |  SELECT b.vec_id AS id, b.embedding,
         |    ${micro("b.embedding", "q.embedding")} AS rel
         |  FROM embeddings b, embeddings q
         |  WHERE q.vec_id = 0 AND b.vec_id <> 0
         |  ORDER BY rel DESC, id LIMIT 20),
         |sims AS (
         |  SELECT a.id AS ia, b.id AS ib,
         |    ${micro("a.embedding", "b.embedding")} AS sim
         |  FROM cand a JOIN cand b ON a.id <> b.id),
         |s1 AS (
         |  SELECT id, rel, 1 AS pick, rel * 7 AS mmr_score
         |  FROM cand ORDER BY rel DESC, id LIMIT 1),
         |$steps
         |SELECT pick, id AS vec_id, rel AS rel_micro, mmr_score
         |FROM sel5 ORDER BY pick""".stripMargin
    },

    // The recall gates' twins recompute the EXACT side independently
    // (n_exact from DuckDB's own top-k) and pin the floor + the recall
    // claim as literals — the q_hll_intersect within-bound pattern.
    "q_ivf_lloyd_recall" ->
      s"""WITH pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, $sqlCosine AS cos
         |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
         |  WHERE a.vec_id < $N_QUERIES),
         |ranked AS (
         |  SELECT id_a, id_b,
         |    row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rn
         |  FROM pairs)
         |SELECT 'ivf_lloyd' AS variant, COUNT(*) AS n_exact,
         |  CAST($IVF_LLOYD_FLOOR AS BIGINT) AS floor_micro, true AS within_floor
         |FROM ranked WHERE rn <= $K ORDER BY variant""".stripMargin,

    "q_pq_lloyd_recall" ->
      s"""WITH pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    list_sum(list_transform(range(1, ${DIM + 1}), i ->
         |      (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))
         |      * (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)))) AS d2
         |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
         |  WHERE a.vec_id < $N_QUERIES),
         |ranked AS (
         |  SELECT id_a, id_b,
         |    row_number() OVER (PARTITION BY id_a ORDER BY d2, id_b) AS rn
         |  FROM pairs)
         |SELECT 'pq_lloyd' AS variant, COUNT(*) AS n_exact,
         |  CAST($PQ_LLOYD_FLOOR AS BIGINT) AS floor_micro, true AS within_floor
         |FROM ranked WHERE rn <= $K ORDER BY variant""".stripMargin,

    "q_cosine_pairs" ->
      s"""WITH $sqlLshCandidates,
         |pairs AS (
         |  SELECT DISTINCT least(id_a, id_b) AS id_a, greatest(id_a, id_b) AS id_b
         |  FROM cand)
         |SELECT p.id_a, p.id_b,
         |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos,
         |  CAST(a.label = b.label AS INTEGER) AS same_label
         |FROM pairs p JOIN embeddings a ON a.vec_id = p.id_a
         |             JOIN embeddings b ON b.vec_id = p.id_b
         |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.85
         |ORDER BY p.id_a, p.id_b""".stripMargin,

    "q_embed_dedup" ->
      s"""WITH $sqlLshCandidates,
         |dups AS (
         |  SELECT c.id_a, MIN(c.id_b) AS dup_of
         |  FROM cand c JOIN embeddings a ON a.vec_id = c.id_a
         |              JOIN embeddings b ON b.vec_id = c.id_b
         |  WHERE c.id_b < c.id_a
         |    AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.85
         |  GROUP BY c.id_a)
         |SELECT e.vec_id, dups.dup_of IS NOT NULL AS is_dup, dups.dup_of
         |FROM embeddings e LEFT JOIN dups ON e.vec_id = dups.id_a
         |ORDER BY e.vec_id""".stripMargin,

    "q_lsh_buckets" ->
      s"""WITH t AS (
         |  SELECT vec_id, CAST(${sqlBits("embeddings")} AS INTEGER) AS bucket
         |  FROM embeddings)
         |SELECT bucket, COUNT(*) AS n_vecs, MIN(vec_id) AS min_vec_id
         |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_lsh_ann" ->
      s"""WITH $sqlLshCandidates,
         |$sqlRerank
         |SELECT id_a, rn, id_b, cos FROM ranked WHERE rn <= $K
         |ORDER BY id_a, rn""".stripMargin,

    // Mirrors the PQ pipeline: 16-row codebook CTE from the same md5
    // derivation → per-vector argmin codes (list_position of list_min,
    // first-minimum ties like array_position) → ADC as the same nested
    // sequential folds. The d2 lists are written out twice (no lambda
    // let-binding in SQL) — identical values, just recomputed.
    "q_pq_ann" -> {
      def comp(c: String, i: String) =
        s"(CAST(CAST('0x' || substring(md5('pq' || ':' || CAST($c AS VARCHAR) || ':' || CAST($i AS VARCHAR)), 1, 15) AS BIGINT) % 1000 AS DOUBLE) / 1000.0 - 0.5) * $PQ_SCALE"
      val d2list =
        s"""list_transform(range(1, ${PQ_K + 1}), c ->
           |        list_sum(list_transform(range(1, ${PQ_SUB + 1}), j ->
           |          (CAST(embedding[m*$PQ_SUB+j] AS DOUBLE) - cbs[c][m*$PQ_SUB+j])
           |          * (CAST(embedding[m*$PQ_SUB+j] AS DOUBLE) - cbs[c][m*$PQ_SUB+j]))))""".stripMargin
      s"""WITH cb AS (
         |  SELECT c, list_transform(range(1, ${DIM + 1}), i -> ${comp("c", "i")}) AS v
         |  FROM range(1, ${PQ_K + 1}) t(c)),
         |cbl AS (SELECT list(v ORDER BY c) AS cbs FROM cb),
         |coded AS (
         |  SELECT vec_id AS id_b,
         |    list_transform(range(0, $PQ_M), m ->
         |      CAST(list_position($d2list, list_min($d2list)) AS INTEGER)) AS codes
         |  FROM embeddings, cbl),
         |adc AS (
         |  SELECT q.vec_id AS id_a, coded.id_b,
         |    round(list_sum(list_transform(range(0, $PQ_M), m ->
         |      list_sum(list_transform(range(1, ${PQ_SUB + 1}), j ->
         |        (CAST(q.embedding[m*$PQ_SUB+j] AS DOUBLE) - cbs[codes[m+1]][m*$PQ_SUB+j])
         |        * (CAST(q.embedding[m*$PQ_SUB+j] AS DOUBLE) - cbs[codes[m+1]][m*$PQ_SUB+j]))))), 6) AS adc
         |  FROM embeddings q, coded, cbl
         |  WHERE q.vec_id < $N_QUERIES AND q.vec_id <> coded.id_b),
         |ranked AS (
         |  SELECT id_a, id_b, adc,
         |    row_number() OVER (PARTITION BY id_a ORDER BY adc, id_b) AS rn
         |  FROM adc)
         |SELECT id_a, rn, id_b, adc FROM ranked WHERE rn <= $K
         |ORDER BY id_a, rn""".stripMargin
    },

    // Mirrors ivfAnn step by step: md5 seed order → 16 centroids → full
    // nearest-centroid scoring (crn=1 assignment, crn<=4 probes) →
    // posting-list join → exact re-rank. The centroid cosines are
    // compared UNROUNDED for ranking, exactly as the Spark side does.
    "q_ivf_ann" ->
      s"""WITH $sqlSeededCranked,
         |members AS (
         |  SELECT cid, id_b FROM (
         |    SELECT cid, vec_id AS id_b,
         |      row_number() OVER (PARTITION BY cid ORDER BY vec_id) AS mrn
         |    FROM cranked WHERE crn = 1)
         |  WHERE mrn <= 128),
         |probes AS (SELECT cid, vec_id AS id_a FROM cranked WHERE crn <= 4),
         |cand AS (
         |  SELECT id_a, id_b
         |  FROM probes JOIN members USING (cid)
         |  WHERE id_a <> id_b),
         |$sqlRerank
         |SELECT id_a, rn, id_b, cos FROM ranked WHERE rn <= $K
         |ORDER BY id_a, rn""".stripMargin,

    // unnest + generate_subscripts zip in DuckDB; dim is 0-based to
    // match posexplode. round(double) is half-away in both engines and
    // a binary double times 1e6 never lands on an exact .5 tie.
    "q_embed_centroid" ->
      s"""WITH $sqlSeededCranked,
         |m AS (
         |  SELECT c.cid, e.embedding
         |  FROM cranked c JOIN embeddings e ON c.vec_id = e.vec_id
         |  WHERE c.crn = 1),
         |u AS (
         |  SELECT cid,
         |    generate_subscripts(embedding, 1) - 1 AS dim,
         |    unnest(embedding) AS v
         |  FROM m)
         |SELECT cid, CAST(dim AS INTEGER) AS dim, COUNT(*) AS n_members,
         |  CAST(SUM(CAST(round(CAST(v AS DOUBLE) * 1000000) AS DECIMAL(38,0))) AS BIGINT) AS sum_micro
         |FROM u GROUP BY cid, dim ORDER BY cid, dim""".stripMargin,

    "q_embed_quantile_norm" ->
      """WITH u AS (
        |  SELECT vec_id,
        |    CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
        |    unnest(embedding) AS v
        |  FROM embeddings)
        |SELECT vec_id, dim, CAST(v AS DOUBLE) AS v,
        |  percent_rank() OVER (PARTITION BY dim ORDER BY v) AS pr
        |FROM u WHERE dim < 8
        |ORDER BY dim, vec_id""".stripMargin,

    "q_embed_project" -> {
      val dims = (0 until 8).map { j =>
        s"round(list_sum(list_transform(range(1, $DIM + 1), i -> " +
          s"CAST(embedding[i] AS DOUBLE) * (${sqlPlaneComponent(j, "i")}))), 6) AS p$j"
      }.mkString(",\n|  ")
      s"""SELECT vec_id,
         |  $dims
         |FROM embeddings ORDER BY vec_id""".stripMargin
    },

    "q_semdedup" ->
      s"""WITH $sqlSeededCranked,
         |assign AS (SELECT vec_id, cid FROM cranked WHERE crn = 1),
         |m AS (
         |  SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY cid ORDER BY vec_id) AS mrn
         |  FROM assign),
         |capped AS (SELECT cid, vec_id AS id_a FROM m WHERE mrn <= $SEM_CAP),
         |dup AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM capped a
         |  JOIN assign b ON b.cid = a.cid AND a.id_a < b.vec_id
         |  JOIN embeddings ea ON ea.vec_id = a.id_a
         |  JOIN embeddings eb ON eb.vec_id = b.vec_id
         |  WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
         |          CAST(eb.embedding AS DOUBLE[])) >= $SEM_TAU)
         |SELECT s.vec_id, s.cid, d.vec_id IS NOT NULL AS is_dup
         |FROM assign s LEFT JOIN dup d ON d.vec_id = s.vec_id
         |ORDER BY s.vec_id""".stripMargin,

    "q_trunc_recall" ->
      s"""WITH fullk AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY $sqlCosine DESC, b.vec_id) AS rn
         |    FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
         |    WHERE a.vec_id < $N_QUERIES) t WHERE rn <= $K),
         |trunck AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |      row_number() OVER (PARTITION BY a.vec_id
         |        ORDER BY round(list_cosine_similarity(
         |            CAST(a.embedding AS DOUBLE[])[1:16],
         |            CAST(b.embedding AS DOUBLE[])[1:16]), 6) DESC,
         |          b.vec_id) AS rn
         |    FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
         |    WHERE a.vec_id < $N_QUERIES) t WHERE rn <= $K),
         |common AS (
         |  SELECT id_a, COUNT(*) AS n_common FROM (
         |    SELECT id_a, id_b FROM fullk
         |    INTERSECT SELECT id_a, id_b FROM trunck) i
         |  GROUP BY id_a)
         |SELECT p.vec_id AS id_a,
         |  COALESCE(n_common, 0) AS n_common,
         |  COALESCE(n_common, 0) * 1000000 // $K AS recall_micro
         |FROM (SELECT vec_id FROM embeddings WHERE vec_id < $N_QUERIES) p
         |LEFT JOIN common ON common.id_a = p.vec_id
         |ORDER BY id_a""".stripMargin
  )
}
