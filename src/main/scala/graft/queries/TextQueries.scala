package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryUtil._

/** Text-analysis operators for LLM-data pipelines — SURVEY.md §2.2 "LLM
  * ops" ([E], mandated by BASELINE.json north_star): language-ID
  * heuristic, quality scoring, token counting, document fingerprinting.
  *
  * Everything is Catalyst built-ins over the `documents` table —
  * higher-order array functions (`transform`/`filter`/`aggregate`) keep
  * the per-document work inside codegen, no UDFs. Each query has an
  * exact DuckDB twin (same arithmetic, same regex subset), so these are
  * hash-verified, not spot-checked.
  *
  * Scale notes: all are embarrassingly parallel map-side operators — no
  * shuffle except the final tiny summary aggregates. At 100 TB the text
  * column dominates IO: the scan prunes to (doc_id, text) only.
  */
object TextQueries {

  /** Portable 60-bit string hash: identical in DuckDB via
    * `CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)`. Computed by the
    * native codegen expression [[graft.functions.PortableHash60]] (one
    * digest, no hex-string round-trip) — bit-identical to the composed
    * `conv(substring(md5(..), 1, 15), 16, 10)` form, which
    * CustomFunctionsSpec locks in as a property test. */
  private[queries] def phash(c: Column, seed: Int): Column =
    graft.functions.GraftFunctions.portable_hash60(
      concat_ws(":", lit(seed.toString), c))

  private[queries] def sqlPhash(x: String, seed: Int): String =
    s"CAST('0x' || substring(md5('$seed' || ':' || $x), 1, 15) AS BIGINT)"

  private val stop = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "de"),
    "es" -> Seq("el", "los", "y", "en", "de"))

  val defs: Map[String, Q] = Map(
    // Language-ID: stopword-hit scoring with deterministic argmax.
    "q_lang_id" -> ((s, d) => {
      val toks = split(col("text"), " ")
      def score(lang: String): Column =
        size(filter(toks, t => stop(lang).map(w => t === w).reduce(_ || _)))
      val scored = Tables.documents(s, d)
        .withColumn("s_en", score("en")).withColumn("s_de", score("de"))
        .withColumn("s_fr", score("fr")).withColumn("s_es", score("es"))
      val best = greatest(col("s_en"), col("s_de"), col("s_fr"), col("s_es"))
      scored
        .withColumn("pred_lang",
          when(best === 0, "und")
            .when(col("s_en") === best, "en")
            .when(col("s_de") === best, "de")
            .when(col("s_es") === best, "es")
            .otherwise("fr"))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred_lang"))
    }),

    // Quality scoring: token stats + stopword ratio + length prior.
    // Ratios are pure IEEE double arithmetic (int->double exact, same op
    // order in the SQL twin) — decimal DOWN-scaling is avoided because
    // Spark rounds half-up while DuckDB rounds half-even at exact
    // midpoints like 3/32.
    "q_quality_score" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val nTok = size(toks)
      val sw = stop("en")
      val nStop = size(filter(toks, t => sw.map(w => t === w).reduce(_ || _)))
      val avgLen = length(col("text")).cast(DoubleType) / nTok.cast(DoubleType)
      val stopRatio = nStop.cast(DoubleType) / nTok.cast(DoubleType)
      val lenScore = when(nTok.between(20, 60), lit(1.0)).otherwise(lit(0.5))
      Tables.documents(s, d).select(
        col("doc_id"),
        nTok.as("n_tokens"),
        nStop.as("n_stopwords"),
        avgLen.as("avg_token_len"),
        (lenScore * (lit(1.0) - stopRatio)).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // Token counting: whitespace words + a BPE-ish regex segmentation.
    "q_token_count" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
          .as("n_bpe_tokens"),
        length(col("text")).as("n_chars_computed"),
        col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Normalization pipeline: casefold, strip non-alphanumerics,
    // collapse whitespace, distinct-token stats — the canonicalization
    // step that feeds exact dedup.
    "q_text_normalize" -> ((s, d) => {
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
      Tables.documents(s, d).select(
        col("doc_id"),
        norm.as("norm_text"),
        size(array_distinct(split(norm, " "))).as("n_distinct_tokens"),
        length(norm).as("n_norm_chars"))
        .orderBy(col("doc_id"))
    }),

    // TF-IDF term weighting: explode tokens, tf per (doc, term), df per
    // term, weight = tf · N/df (the idf kept as an exact ratio rather
    // than ln(N/df) — IEEE-exact in both engines, same ranking order);
    // top-3 terms per doc with deterministic tiebreaks.
    "q_tfidf_top_terms" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val tf = docs.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      // N as a lazy 1-row aggregate broadcast into the plan — a driver-side
      // .count() here would run an eager extra job per invocation.
      val nDf = Tables.documents(s, d).agg(count(lit(1)).cast(DoubleType).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("weight").desc, col("term"))
      tf.join(df, Seq("term"))
        .crossJoin(broadcast(nDf))
        .withColumn("weight",
          col("tf").cast(DoubleType) * (col("n_docs") / col("df").cast(DoubleType)))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("term"), col("tf"), col("df"), col("weight"))
        .orderBy(col("doc_id"), col("rn"))
    }),

    // Document fingerprint: polynomial rolling hash over token hashes
    // (order-sensitive — reordered docs get different prints).
    "q_fingerprint" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val tokHashes = transform(toks, t => phash(t, 0) % 1000003L)
      Tables.documents(s, d).select(
        col("doc_id"),
        aggregate(tokHashes, lit(0L),
          (acc, x) => (acc * 31L + x) % 1000000007L).as("fingerprint"))
        .orderBy(col("doc_id"))
    })
  )

  private def sqlScore(lang: String): String = {
    val preds = stop(lang).map(w => s"t = '$w'").mkString(" OR ")
    s"len(list_filter(string_split(text, ' '), t -> $preds))"
  }

  val oracle: Map[String, String] = Map(
    "q_lang_id" ->
      s"""WITH scored AS (
         |  SELECT lang,
         |    ${sqlScore("en")} AS s_en, ${sqlScore("de")} AS s_de,
         |    ${sqlScore("fr")} AS s_fr, ${sqlScore("es")} AS s_es
         |  FROM documents),
         |pred AS (
         |  SELECT lang,
         |    CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
         |         WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
         |         WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
         |         WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
         |         ELSE 'fr' END AS pred_lang
         |  FROM scored)
         |SELECT lang, pred_lang, COUNT(*) AS n FROM pred
         |GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin,

    "q_quality_score" -> {
      val sw = stop("en").map(w => s"t = '$w'").mkString(" OR ")
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         |    CAST(len(list_filter(string_split(text, ' '), t -> $sw)) AS INTEGER) AS n_stopwords,
         |    CAST(length(text) AS INTEGER) AS n_len
         |  FROM documents)
         |SELECT doc_id, n_tokens, n_stopwords,
         |  CAST(n_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_token_len,
         |  (CASE WHEN n_tokens BETWEEN 20 AND 60 THEN 1.0 ELSE 0.5 END)
         |    * (1.0 - CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS quality
         |FROM t ORDER BY doc_id""".stripMargin
    },

    "q_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_bpe_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars_computed,
        |  n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_normalize" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
        |  FROM documents)
        |SELECT doc_id, norm_text,
        |  CAST(len(list_distinct(string_split(norm_text, ' '))) AS INTEGER) AS n_distinct_tokens,
        |  CAST(length(norm_text) AS INTEGER) AS n_norm_chars
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_tfidf_top_terms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |wt AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    CAST(tf.tf AS DOUBLE) * (CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE)) AS weight
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, tf, df, weight,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY weight DESC, term) AS rn
        |  FROM wt)
        |SELECT doc_id, rn, term, tf, df, weight FROM ranked
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,

    "q_fingerprint" ->
      s"""SELECT doc_id,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split(text, ' '),
         |        t -> ${sqlPhash("t", 0)} % 1000003)),
         |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin
  )
}
