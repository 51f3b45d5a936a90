package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryUtil._
import TextQueries.sqlPhash

/** Similarity search over the `embeddings` table — SURVEY.md §2.2 "LLM
  * ops" ([E]): brute-force cosine top-k as the exact baseline, plus a
  * random-hyperplane LSH bucketing as the approximate scale path.
  *
  * The dot/norm arithmetic runs in DOUBLE over the float vectors with
  * strictly sequential element order (`aggregate` over `zip_with`), which
  * is the same evaluation order DuckDB's `list_cosine_similarity` uses —
  * results are rounded at 1e-6 for the oracle hash.
  *
  * Scale notes (100 TB / billions of vectors):
  *   - The brute-force form is O(n²·dim) — correct but only a baseline.
  *     Its Spark plan is a broadcast-nested-loop self-join; at scale the
  *     probe side stays partitioned and only the query set broadcasts.
  *   - The LSH form is the scale path: signatures are map-side, the
  *     single shuffle groups by bucket, candidate generation is quadratic
  *     only within buckets (tunable via n_planes), and re-ranking is
  *     exact cosine on candidates. An IVF variant (k-means coarse
  *     quantizer) would replace the hash bucketing with nearest-centroid
  *     assignment — same join shape.
  *   - Hyperplanes come from the portable md5 hash, not a Scala RNG, so
  *     the oracle can re-derive them — and at scale they are a tiny
  *     broadcast literal, not data.
  */
object SimilarityQueries {

  private val DIM = 64
  private val K = 5
  private val N_PLANES = 8    // single-table histogram (q_lsh_buckets)
  private val LSH_TABLES = 4  // multi-table ANN (q_lsh_ann)
  private val LSH_BITS = 4

  /** cos(a, b) in double precision, sequential element order — the
    * native codegen'd expression (graft.functions.CosineSimilarity),
    * bit-identical to the composed aggregate(zip_with(...)) form (proven
    * in CustomFunctionsSpec) and to DuckDB's double
    * list_cosine_similarity, but a single fused loop: on the O(n²) pair
    * joins this is the difference between minutes and seconds. */
  private def cosine(a: Column, b: Column): Column =
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

  /** Sign bit of <embedding, plane_j>: sequential double accumulation
    * against the literal plane vector (same op order as the SQL twin's
    * list_sum over index order). */
  private def planeBit(j: Int): Column = {
    val plane = lit(planeVector(j))
    val proj = aggregate(
      zip_with(col("embedding"), plane, (x, p) => x.cast(DoubleType) * p),
      lit(0.0), (acc, x) => acc + x)
    when(proj > 0, lit(1)).otherwise(lit(0))
  }

  val defs: Map[String, Q] = Map(
    // Exact brute-force cosine top-k (k=5) per query vector.
    "q_cosine_topk" -> ((s, d) => {
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
    }),

    // Pairwise cosine above a threshold (self-join form of similarity).
    "q_cosine_pairs" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("label").as("label_a"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("label").as("label_b"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("cos", round(cosine(col("emb_a"), col("emb_b")), 6))
        .filter(col("cos") >= 0.85)
        .select(col("id_a"), col("id_b"), col("cos"),
          (col("label_a") === col("label_b")).cast(IntegerType).as("same_label"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // LSH bucketing: 8 hyperplane sign bits per vector (map-side stage of
    // the approximate path; bucket histogram is the oracle check).
    "q_lsh_buckets" -> ((s, d) => {
      val bits = (0 until N_PLANES).map(j => planeBit(j) * (1 << j)).reduce(_ + _)
      Tables.embeddings(s, d)
        .withColumn("bucket", bits.cast(IntegerType))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec_id"))
        .orderBy(col("bucket"))
    }),

    // Approximate NN: multi-table LSH (4 tables × 4 hyperplane bits) —
    // candidates share ANY table's bucket; exact cosine re-ranks them.
    // Multi-table is the standard recall lever: P(candidate) =
    // 1-(1-p^bits)^tables vs p^bits for one wide table. Compared against
    // q_cosine_topk in the ScalaTest recall test; oracle-checked for
    // parity here.
    // Embedding-cosine near-dup with survivor policy: a vector is a
    // duplicate if a LOWER-id vector sits within cosine >= 0.85; output
    // every vector with its dup flag and (for dups) the dominating id —
    // the embedding-space analog of q_dedup_exact's min-id survivorship.
    "q_embed_dedup" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
      val dups = a.join(b, col("id_b") < col("id_a"))
        .withColumn("cos", round(cosine(col("emb_a"), col("emb_b")), 6))
        .filter(col("cos") >= 0.85)
        .groupBy(col("id_a"))
        .agg(min(col("id_b")).as("dup_of"))
      e.select(col("vec_id")).join(dups.toDF("vec_id", "dup_of"), Seq("vec_id"), "left")
        .select(col("vec_id"), col("dup_of").isNotNull.as("is_dup"), col("dup_of"))
        .orderBy(col("vec_id"))
    }),

    "q_ivf_ann" -> ((s, d) => ivfAnn(s, d)),

    "q_lsh_ann" -> ((s, d) => {
      val buckets = (0 until LSH_TABLES).map { t =>
        struct(lit(t).as("t"),
          (0 until LSH_BITS).map(k => planeBit(t * LSH_BITS + k) * (1 << k))
            .reduce(_ + _).cast(IntegerType).as("b"))
      }
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), explode(array(buckets: _*)).as("bk"))
      val cand = e.select(col("bk"), col("vec_id").as("id_a")).join(
          e.select(col("bk"), col("vec_id").as("id_b")), Seq("bk"))
        .filter(col("id_a") =!= col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
      val emb = Tables.embeddings(s, d)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id_a"))
        .orderBy(col("cos").desc, col("id_b"))
      cand
        .join(emb.select(col("vec_id").as("id_a"), col("embedding").as("emb_a")), Seq("id_a"))
        .join(emb.select(col("vec_id").as("id_b"), col("embedding").as("emb_b")), Seq("id_b"))
        .withColumn("cos", round(cosine(col("emb_a"), col("emb_b")), 6))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= K)
        .select(col("id_a"), col("rn"), col("id_b"), col("cos"))
        .orderBy(col("id_a"), col("rn"))
    })
  )

  /** DOUBLE[] casts are load-bearing: DuckDB's list_cosine_similarity on
    * FLOAT[] computes (and returns) float32, which diverges from Spark's
    * double accumulation well above the 1e-6 rounding grain. */
  /** IVF (inverted-file) ANN: a deterministic coarse quantizer — 16
    * seed centroids chosen by hash order of vec_id (production would run
    * k-means||; the join shape is identical) — assigns every vector to
    * its nearest centroid; queries probe their `nprobe`=4 nearest
    * centroids and exact-re-rank the union of those posting lists.
    * No SQL twin (driver rows-check); recall is asserted vs the exact
    * top-k in QueryLibrarySpec.
    *
    * Scale shape: assignment is a broadcast join against O(centroids)
    * rows; the only shuffle groups by centroid id (the posting lists);
    * probing is a second broadcast join + per-query top-k. */
  private def ivfAnn(s: SparkSession, d: String): DataFrame = {
    val nCent = 16
    val nProbe = 4
    val emb = Tables.embeddings(s, d)
    val cents = emb
      .withColumn("h", conv(substring(md5(concat(lit("seed:"),
        col("vec_id").cast(StringType))), 1, 15), 16, 10).cast(LongType))
      .orderBy(col("h"), col("vec_id")).limit(nCent)
      .select(col("vec_id").as("seed_id"), col("embedding").as("cent"))
      .withColumn("cid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("seed_id"))))
      .select(col("cid"), col("cent"))
    val wNear = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
    val scored = emb.join(broadcast(cents))
      .withColumn("ccos", cosine(col("embedding"), col("cent")))
      .withColumn("crn", row_number().over(wNear))
    val members = scored.filter(col("crn") === 1)
      .select(col("cid"), col("vec_id").as("id_b"))
    val probes = scored.filter(col("crn") <= nProbe)
      .select(col("cid"), col("vec_id").as("id_a"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a")).orderBy(col("cos").desc, col("id_b"))
    val e = Tables.embeddings(s, d)
    probes.join(members, Seq("cid"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
      .join(e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a")), Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b")), Seq("id_b"))
      .withColumn("cos", round(cosine(col("emb_a"), col("emb_b")), 6))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= K)
      .select(col("id_a"), col("rn"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("rn"))
  }

  private val sqlCosine =
    "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6)"

  private def sqlBits(tbl: String): String =
    (0 until N_PLANES).map { j =>
      val proj = s"list_sum(list_transform(range(1, ${DIM + 1}), i -> $tbl.embedding[i] * (${sqlPlaneComponent(j, "i")})))"
      s"(CASE WHEN $proj > 0 THEN 1 ELSE 0 END) * ${1 << j}"
    }.mkString(" + ")

  val oracle: Map[String, String] = Map(
    "q_cosine_topk" ->
      s"""WITH pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, $sqlCosine AS cos
         |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
         |ranked AS (
         |  SELECT id_a, id_b, cos,
         |    row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rn
         |  FROM pairs)
         |SELECT id_a, rn, id_b, cos FROM ranked WHERE rn <= $K
         |ORDER BY id_a, rn""".stripMargin,

    "q_cosine_pairs" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, $sqlCosine AS cos,
         |  CAST(a.label = b.label AS INTEGER) AS same_label
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE $sqlCosine >= 0.85
         |ORDER BY id_a, id_b""".stripMargin,

    "q_embed_dedup" ->
      s"""WITH dups AS (
         |  SELECT a.vec_id AS id_a, MIN(b.vec_id) AS dup_of
         |  FROM embeddings a JOIN embeddings b ON b.vec_id < a.vec_id
         |  WHERE $sqlCosine >= 0.85
         |  GROUP BY a.vec_id)
         |SELECT e.vec_id, dups.dup_of IS NOT NULL AS is_dup, dups.dup_of
         |FROM embeddings e LEFT JOIN dups ON e.vec_id = dups.id_a
         |ORDER BY e.vec_id""".stripMargin,

    "q_lsh_buckets" ->
      s"""WITH t AS (
         |  SELECT vec_id, CAST(${sqlBits("embeddings")} AS INTEGER) AS bucket
         |  FROM embeddings)
         |SELECT bucket, COUNT(*) AS n_vecs, MIN(vec_id) AS min_vec_id
         |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_lsh_ann" -> {
      val bucketCols = (0 until LSH_TABLES).map { t =>
        val bits = (0 until LSH_BITS).map { k =>
          val j = t * LSH_BITS + k
          val proj = s"list_sum(list_transform(range(1, ${DIM + 1}), i -> embeddings.embedding[i] * (${sqlPlaneComponent(j, "i")})))"
          s"(CASE WHEN $proj > 0 THEN 1 ELSE 0 END) * ${1 << k}"
        }.mkString(" + ")
        s"CAST($bits AS INTEGER) AS b$t"
      }.mkString(", ")
      val bandStructs = (0 until LSH_TABLES).map(t => s"($t, b$t)").mkString(", ")
      s"""WITH t AS (
         |  SELECT vec_id, embedding, $bucketCols FROM embeddings),
         |banded AS (
         |  SELECT vec_id, unnest([$bandStructs]) AS bk FROM t),
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
         |  FROM banded x JOIN banded y ON x.bk = y.bk AND x.vec_id <> y.vec_id),
         |scored AS (
         |  SELECT id_a, id_b,
         |    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos
         |  FROM cand JOIN embeddings a ON a.vec_id = id_a
         |            JOIN embeddings b ON b.vec_id = id_b),
         |ranked AS (
         |  SELECT id_a, id_b, cos,
         |    row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rn
         |  FROM scored)
         |SELECT id_a, rn, id_b, cos FROM ranked WHERE rn <= $K
         |ORDER BY id_a, rn""".stripMargin
    }
  )
}
