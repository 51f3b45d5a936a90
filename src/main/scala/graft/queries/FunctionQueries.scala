package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QueryUtil._

/** Scalar-function surface — SURVEY.md §2.2 "Scalar functions".
  *
  * Reference evidence: string surgery P1/P2/K1
  * (`/root/reference/src/generate_mapping.py:141,149`,
  * `/root/reference/src/load_ground_truths.py:68-77`), substring
  * classification C1 (`:52-55`), casts D3; date/math/array/json families
  * are [E] extensions over the driver tables.
  *
  * All functions here are Catalyst built-ins (whole-stage-codegen'd) —
  * no UDFs in the hot path. Oracle parity notes: regex forms kept to the
  * common POSIX subset (Java regex vs RE2), doubles routed through exact
  * decimals, no raw timestamps in outputs.
  */
object FunctionQueries {

  val defs: Map[String, Q] = Map(
    // String family over part (split/element_at/substr/replace/pad/trim…).
    "q_string_funcs" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("name_u"),
        lower(col("p_brand")).as("brand_l"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 5).as("type_pfx"),
        element_at(split(col("p_type"), " "), 1).as("type_first"),
        element_at(split(col("p_type"), " "), -1).as("type_last"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("name_masked"),
        concat_ws("::", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_partkey").cast(StringType), 8, "0").as("key_padded"),
        col("p_name").contains("blue").cast(IntegerType).as("has_blue"),
        col("p_type").startsWith("STANDARD").cast(IntegerType).as("is_standard"),
        col("p_type").endsWith("BRASS").cast(IntegerType).as("is_brass"))
        .orderBy(col("p_partkey"))
    }),

    // C1: substring-set classifier (benign-first CASE chain), re-expressed
    // over part names exactly as the reference classifies outcome text.
    "q_case_classifier" -> ((s, d) => {
      val benign = Seq("green", "blue", "white")
      val malignant = Seq("red", "crimson")
      val t = col("p_name")
      Tables.part(s, d).select(
        col("p_partkey"),
        when(benign.map(t.contains).reduce(_ || _), "BENIGN")
          .when(malignant.map(t.contains).reduce(_ || _), "MALIGNANT")
          .otherwise("UNKNOWN").as("label"))
        .groupBy(col("label")).agg(count(lit(1)).as("n"))
        .orderBy(col("label"))
    }),

    // Date/time family over orders.
    "q_date_funcs" -> ((s, d) => {
      val dt = col("o_orderdate")
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(dt).cast(IntegerType).as("y"),
        month(dt).cast(IntegerType).as("m"),
        dayofmonth(dt).cast(IntegerType).as("dom"),
        quarter(dt).cast(IntegerType).as("q"),
        dt.cast(DateType).as("order_date"),
        date_add(dt.cast(DateType), 30).as("due_date"),
        last_day(dt).as("month_end"),
        datediff(lit("2025-01-01").cast(DateType), dt.cast(DateType)).cast(IntegerType).as("age_days"),
        date_format(dt, "yyyy-MM").as("ym"))
        .orderBy(col("o_orderkey"))
    }),

    // Math family over lineitem (exact decimal routing for arithmetic).
    "q_math_funcs" -> ((s, d) => {
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 1).as("price_r1"),
        floor(col("l_extendedprice")).cast(LongType).as("price_floor"),
        ceil(col("l_extendedprice")).cast(LongType).as("price_ceil"),
        abs(dec(col("l_discount")) - dec(lit(0.05))).cast(DoubleType).as("disc_dev"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        least(col("l_tax"), col("l_discount")).as("min_rate"),
        (col("l_quantity").cast(LongType) % 7).as("qty_mod7"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        (dec(col("l_extendedprice")) * dec(col("l_quantity"))).cast(DoubleType).as("gross"))
        // (l_orderkey, l_linenumber) is the lineitem primary key, so the
        // four derived columns the old ORDER BY also listed were
        // comparator dead weight — row order is identical with the
        // unique 2-key prefix alone (round 14; twin ORDER BY unchanged,
        // it sorts the same rows to the same order).
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Array family over embeddings (size/element_at/slice/filter-count).
    "q_array_funcs" -> ((s, d) => {
      val e = col("embedding")
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(e).as("dim"),
        element_at(e, 1).cast(DoubleType).as("first_elem"),
        element_at(e, -1).cast(DoubleType).as("last_elem"),
        size(filter(e, x => x > 0)).as("n_positive"),
        array_max(e).cast(DoubleType).as("vmax"),
        array_min(e).cast(DoubleType).as("vmin"))
        .orderBy(col("vec_id"))
    }),

    // Higher-order-function family over token arrays: transform /
    // filter / exists / forall / aggregate / slice, the lambda surface
    // a schema-flexible pipeline leans on (all map-side; DuckDB twins
    // are the list_* lambda equivalents).
    "q_hof_funcs" -> ((s, d) => {
      val toks = col("toks")
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          size(toks).as("n_toks"),
          size(filter(toks, t => length(t) >= 6)).as("n_long"),
          exists(toks, t => t.startsWith("a")).as("has_a"),
          forall(toks, t => length(t) > 0).as("all_nonempty"),
          aggregate(toks, lit(0), (acc, t) => acc + length(t)).as("char_sum"),
          array_join(slice(transform(toks, t => upper(t)), 1, 3), " ").as("first3_upper"))
        .orderBy(col("doc_id"))
    }),

    // explode_outer: lateral expansion that KEEPS rows whose array is
    // empty (NULL element) — the outer-unnest semantics a left-join
    // flatten needs; the twin unions the empty-list rows back with NULL.
    "q_explode_outer" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode_outer(filter(split(col("text"), " "), t => length(t) > 10)).as("tok"))
        .orderBy(col("doc_id"), asc_nulls_first("tok"))
    }),

    // Regex family: capture-group extraction + match counting (patterns
    // kept to the Java/RE2-common subset).
    "q_regexp_funcs" -> ((s, d) => {
      Tables.customer(s, d).select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "Customer#(\\d+)", 1)
          .cast(LongType).as("cust_num"),
        regexp_count(col("c_name"), lit("0")).cast(IntegerType).as("n_zeros"),
        regexp_like(col("c_name"), lit("^Customer#\\d+$")).as("well_formed"))
        .orderBy(col("c_custkey"))
    }),

    // Map family: build a map per group (map_from_entries over collected
    // pairs), consume it via element_at + explode back to rows. The
    // relational oracle sees only the exploded rows, proving the map
    // round-trip preserves content ([R] S6's uid->struct map pattern).
    "q_map_funcs" -> ((s, d) => {
      val m = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("l_returnflag"))
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("l_linestatus"), col("n"))))).as("status_counts"))
      m.select(col("l_returnflag"),
          size(col("status_counts")).as("n_statuses"),
          element_at(col("status_counts"), "F").as("n_f"),
          explode(col("status_counts")).as(Seq("l_linestatus", "n")))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // J4 ordered fold on TPC-H data (the reference's last-write-wins /
    // erase-on-mismatch reduction as a driver-verified query): per order,
    // over lines in a total deterministic order, "matched" = returnflag
    // 'R'; result = last line's status iff the last line matched, plus an
    // any-mismatch flag (`/root/reference/src/generate_mapping.py:59-75`).
    "q_ordered_fold" -> ((s, d) => {
      val ord = struct(col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(
          max(when(col("l_returnflag") =!= "R", 1).otherwise(0)).as("has_mismatch"),
          max_by(struct((col("l_returnflag") === "R").as("m"), col("l_linestatus")), ord).as("last"))
        .select(col("l_orderkey"), col("has_mismatch") === 1,
          when(col("last.m"), col("last.l_linestatus")).as("final_status"))
        .toDF("l_orderkey", "has_mismatch", "final_status")
        .orderBy(col("l_orderkey"))
    }),

    // VariantType (Spark 4): parse once into the binary variant encoding,
    // extract typed fields by path — the semi-structured column pattern
    // that replaces repeated get_json_object string re-parses. Outputs
    // are extracted to plain types (variant itself has no cross-engine
    // parquet contract to compare).
    "q_variant_funcs" -> ((s, d) => {
      val v = parse_json(col("props"))
      val doc = parse_json(concat(
        lit("{\"a\":[10,20,30],\"m\":{\"x\":\""), col("event_type"), lit("\"}}")))
      Tables.events(s, d).select(
        col("event_id"),
        variant_get(v, "$.k", "int").as("k"),
        variant_get(doc, "$.a[1]", "int").as("a1"),
        variant_get(doc, "$.m.x", "string").as("mx"))
        .orderBy(col("event_id"))
    }),

    // try_* error-safe family: NULL instead of failure for bad casts,
    // zero division, out-of-range access — the ANSI-mode-safe surface.
    "q_try_funcs" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        try_divide(lit(100.0), (col("p_size") - 10).cast(DoubleType)).as("inv_size"),
        expr("TRY_CAST(p_brand AS INT)").as("brand_num"),
        expr("TRY_CAST(CAST(p_partkey AS STRING) AS INT)").as("key_roundtrip"),
        try_element_at(split(col("p_type"), " "), lit(5)).as("type_5th"))
        .orderBy(col("p_partkey"))
    }),

    // JSON family over events.props (get_json_object / from_json).
    "q_json_funcs" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .withColumn("k_bucket", (col("k") % 10).cast(IntegerType))
        .groupBy(col("k_bucket"))
        .agg(count(lit(1)).as("n"), max(col("k")).as("max_k"))
        .orderBy(col("k_bucket"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_u,
        |  lower(p_brand) AS brand_l,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  substring(p_type, 1, 5) AS type_pfx,
        |  string_split(p_type, ' ')[1] AS type_first,
        |  string_split(p_type, ' ')[-1] AS type_last,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_masked,
        |  p_brand || '::' || p_type AS brand_type,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
        |  CAST(contains(p_name, 'blue') AS INTEGER) AS has_blue,
        |  CAST(starts_with(p_type, 'STANDARD') AS INTEGER) AS is_standard,
        |  CAST(ends_with(p_type, 'BRASS') AS INTEGER) AS is_brass
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_case_classifier" ->
      """WITH t AS (
        |  SELECT CASE
        |    WHEN contains(p_name,'green') OR contains(p_name,'blue') OR contains(p_name,'white') THEN 'BENIGN'
        |    WHEN contains(p_name,'red') OR contains(p_name,'crimson') THEN 'MALIGNANT'
        |    ELSE 'UNKNOWN' END AS label
        |  FROM part)
        |SELECT label, COUNT(*) AS n FROM t GROUP BY label ORDER BY label""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |  CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(o_orderdate AS DATE) + 30 AS due_date,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2025-01-01') AS INTEGER) AS age_days,
        |  strftime(o_orderdate, '%Y-%m') AS ym
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice, 1) AS price_r1,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  CAST(abs(CAST(l_discount AS DECIMAL(18,4)) - CAST(0.05 AS DECIMAL(18,4))) AS DOUBLE) AS disc_dev,
        |  greatest(l_tax, l_discount) AS max_rate,
        |  least(l_tax, l_discount) AS min_rate,
        |  CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4)) AS DOUBLE) AS gross
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, gross, qty_sqrt, max_rate, min_rate""".stripMargin,

    "q_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_elem,
        |  CAST(embedding[-1] AS DOUBLE) AS last_elem,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
        |  CAST(list_max(embedding) AS DOUBLE) AS vmax,
        |  CAST(list_min(embedding) AS DOUBLE) AS vmin
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_hof_funcs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS INTEGER) AS n_toks,
        |  CAST(len(list_filter(toks, t -> length(t) >= 6)) AS INTEGER) AS n_long,
        |  list_bool_or(list_transform(toks, t -> t LIKE 'a%')) AS has_a,
        |  list_bool_and(list_transform(toks, t -> length(t) > 0)) AS all_nonempty,
        |  CAST(list_sum(list_transform(toks, t -> length(t))) AS INTEGER) AS char_sum,
        |  array_to_string(list_transform(toks, t -> upper(t))[1:3], ' ') AS first3_upper
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_explode_outer" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), s -> length(s) > 10) AS ls
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, unnest(ls) AS tok FROM t WHERE len(ls) > 0
        |  UNION ALL
        |  -- explode_outer also keeps a NULL-tok row when ls itself is
        |  -- NULL (len(NULL) predicates are NULL in both branches above)
        |  SELECT doc_id, NULL AS tok FROM t WHERE len(ls) = 0 OR ls IS NULL)
        |SELECT doc_id, tok FROM u ORDER BY doc_id, tok NULLS FIRST""".stripMargin,

    "q_regexp_funcs" ->
      """SELECT c_custkey,
        |  CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS cust_num,
        |  CAST(len(regexp_extract_all(c_name, '0')) AS INTEGER) AS n_zeros,
        |  regexp_matches(c_name, '^Customer#\d+$') AS well_formed
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_map_funcs" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus),
        |s AS (SELECT l_returnflag, CAST(COUNT(*) AS INTEGER) AS n_statuses,
        |        MAX(CASE WHEN l_linestatus = 'F' THEN n END) AS n_f
        |      FROM c GROUP BY l_returnflag)
        |SELECT c.l_returnflag, s.n_statuses, s.n_f, c.l_linestatus, c.n
        |FROM c JOIN s ON c.l_returnflag = s.l_returnflag
        |ORDER BY c.l_returnflag, c.l_linestatus""".stripMargin,

    "q_ordered_fold" ->
      """WITH r AS (
        |  SELECT l_orderkey, l_returnflag, l_linestatus,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber DESC, l_quantity DESC, l_extendedprice DESC) AS rd
        |  FROM lineitem)
        |SELECT l_orderkey,
        |  MAX(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) = 1 AS has_mismatch,
        |  MAX(CASE WHEN rd = 1 AND l_returnflag = 'R' THEN l_linestatus END) AS final_status
        |FROM r GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "q_variant_funcs" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  CAST(json_extract_string(
        |    '{"a":[10,20,30],"m":{"x":"' || event_type || '"}}', '$.a[1]') AS INTEGER) AS a1,
        |  json_extract_string(
        |    '{"a":[10,20,30],"m":{"x":"' || event_type || '"}}', '$.m.x') AS mx
        |FROM events ORDER BY event_id""".stripMargin,

    "q_try_funcs" ->
      """SELECT p_partkey,
        |  CASE WHEN p_size - 10 = 0 THEN NULL
        |       ELSE 100.0 / CAST(p_size - 10 AS DOUBLE) END AS inv_size,
        |  TRY_CAST(p_brand AS INTEGER) AS brand_num,
        |  TRY_CAST(CAST(p_partkey AS VARCHAR) AS INTEGER) AS key_roundtrip,
        |  string_split(p_type, ' ')[5] AS type_5th
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_json_funcs" ->
      """WITH t AS (
        |  SELECT event_id,
        |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |  FROM events)
        |SELECT CAST(k % 10 AS INTEGER) AS k_bucket, COUNT(*) AS n, MAX(k) AS max_k
        |FROM t GROUP BY k_bucket ORDER BY k_bucket""".stripMargin
  )
}
