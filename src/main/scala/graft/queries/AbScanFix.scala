package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}

import graft.Tables

/** Same-JVM A/Bs for the round-10 ScanAudit fixes: each section pins
  * the current (fixed) query against its pre-fix form, reconstructed
  * verbatim here (the AbCosinePairs precedent). Run one section per
  * invocation: `runMain graft.queries.AbScanFix <section> <dir> [reps]`
  * with section ∈ {group_p90, ivf_ann, semdedup, cusum, attrib,
  * bpe, tfidf}.
  *
  * `tfidf` is the one PROSPECTIVE section: its B form (localCheckpoint
  * of the token-grain tf frame) was a candidate fix for the
  * tf-reused-for-df double derivation; the section measures whether
  * materializing a token-grain frame can ever beat recomputing a
  * map-side explode+agg (the r9 q_mad_outliers lesson says usually
  * not — the outcome is recorded in SCALE.md round 10 either way).
  */
object AbScanFix {

  /** Pre-round-10 q_group_p90: the per-(group,cent) frame re-derived
    * by each of its four consumers. */
  private def groupP90Old(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perKey = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("grp"),
        round(col("l_extendedprice") * 100).cast(LongType).as("cents"))
      .groupBy(col("grp"), col("cents")).agg(count(lit(1)).as("w"))
      .withColumn("bkt", expr("cents DIV 200000"))
    val wIn = Window.partitionBy(col("grp"), col("bkt"))
      .orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = perKey.withColumn("cw_in", sum(col("w")).over(wIn))
    val totals = perKey.groupBy(col("grp"), col("bkt"))
      .agg(sum(col("w")).as("bt"))
    val mx = perKey.groupBy(col("grp")).agg(max(col("bkt")).as("maxbkt"))
    val offs = totals.join(broadcast(mx), "grp")
      .filter(col("bkt") < col("maxbkt"))
      .select(col("grp"), explode(sequence(col("bkt") + 1,
        col("maxbkt"))).as("bkt"), col("bt"))
      .groupBy(col("grp"), col("bkt")).agg(sum(col("bt")).as("off"))
    val cum = within.join(broadcast(offs), Seq("grp", "bkt"), "left")
      .withColumn("cw", col("cw_in") + coalesce(col("off"), lit(0L)))
    val tot = perKey.groupBy(col("grp"))
      .agg(sum(col("w")).as("n_rows"))
      .withColumn("thresh", expr("(9 * n_rows + 9) DIV 10"))
    cum.join(broadcast(tot), "grp")
      .filter(col("cw") >= col("thresh"))
      .groupBy(col("grp"), col("n_rows"))
      .agg(min(col("cents")).as("p90_cents"))
      .select(col("grp"), col("n_rows"), col("p90_cents"))
      .orderBy(col("grp"))
  }

  /** Pre-round-10 ivfAnn: members and probes each re-derive the full
    * seededScored subtree (two embeddings scans + n×16 scoring each). */
  private def ivfAnnOld(s: SparkSession, d: String): DataFrame = {
    val scored = SimilarityQueries.seededScored(s, d, 16)
    val wMember = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid")).orderBy(col("id_b"))
    val members = scored.filter(col("crn") === 1)
      .select(col("cid"), col("vec_id").as("id_b"))
      .withColumn("mrn", row_number().over(wMember))
      .filter(col("mrn") <= SimilarityQueries.IVF_CAP)
      .select(col("cid"), col("id_b"))
    val probes = scored.filter(col("crn") <= 4)
      .select(col("cid"), col("vec_id").as("id_a"))
    val cand = probes.join(members, Seq("cid"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"))
    SimilarityQueries.rerankTopK(s, d, cand)
  }

  /** Pre-round-10 q_semdedup: assign consumed un-materialized by three
    * branches. */
  private def semdedupOld(s: SparkSession, d: String): DataFrame = {
    val scored = SimilarityQueries.seededScored(s, d, 16)
    val assign = scored.filter(col("crn") === 1)
      .select(col("vec_id"), col("cid"))
    val wM = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid")).orderBy(col("vec_id"))
    val capped = assign.withColumn("mrn", row_number().over(wM))
      .filter(col("mrn") <= SimilarityQueries.SEM_CAP)
      .select(col("cid"), col("vec_id").as("id_a"))
    val pairs = capped
      .join(assign.select(col("cid"), col("vec_id").as("id_b")), Seq("cid"))
      .filter(col("id_a") < col("id_b"))
    val e = Tables.embeddings(s, d)
    val dups = pairs
      .join(e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a")), Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b")), Seq("id_b"))
      .filter(SimilarityQueries.cosine(col("emb_a"), col("emb_b")) >= SimilarityQueries.SEM_TAU)
      .select(col("id_b").as("vec_id")).distinct()
      .withColumn("dup", lit(true))
    assign
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        coalesce(col("dup"), lit(false)).as("is_dup"))
      .orderBy(col("vec_id"))
  }

  /** Pre-round-10 q_cusum_changepoint: tot and mx each re-scan events
    * instead of rolling up from btotals. */
  private def cusumOld(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, d).select(col("event_type"), col("event_id"),
      col("ts"), round(col("value") * 100).cast("long").as("cents"))
      .withColumn("bkt", expr("unix_timestamp(ts) DIV 86400"))
    val tot = e.groupBy(col("event_type"))
      .agg(sum(col("cents")).as("t_cents"), count(lit(1)).as("n"))
    val wIn = Window.partitionBy(col("event_type"), col("bkt"))
      .orderBy(col("ts"), col("event_id"))
    val within = e
      .withColumn("rn_in", row_number().over(wIn).cast(LongType))
      .withColumn("run_in", sum(col("cents")).over(
        wIn.rowsBetween(Window.unboundedPreceding, 0)))
    val btotals = e.groupBy(col("event_type"), col("bkt"))
      .agg(count(lit(1)).as("bn"), sum(col("cents")).as("bs"))
    val mx = e.groupBy(col("event_type")).agg(max(col("bkt")).as("maxbkt"))
    val offs = btotals.join(broadcast(mx), "event_type")
      .filter(col("bkt") < col("maxbkt"))
      .select(col("event_type"),
        explode(sequence(col("bkt") + 1, col("maxbkt"))).as("bkt"),
        col("bn"), col("bs"))
      .groupBy(col("event_type"), col("bkt"))
      .agg(sum(col("bn")).as("rn_off"), sum(col("bs")).as("run_off"))
    within
      .join(broadcast(offs), Seq("event_type", "bkt"), "left")
      .withColumn("rn", col("rn_in") + coalesce(col("rn_off"), lit(0L)))
      .withColumn("running", col("run_in") + coalesce(col("run_off"), lit(0L)))
      .join(broadcast(tot), Seq("event_type"))
      .withColumn("s_scaled", expr(
        "CAST(n AS DECIMAL(38,0)) * running - CAST(rn AS DECIMAL(38,0)) * t_cents"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        max_by(
          struct(col("rn"), abs(col("s_scaled")).as("abs_s"), col("event_id")),
          struct(abs(col("s_scaled")).as("a"), (-col("rn")).as("nr"))).as("best"))
      .select(col("event_type"), col("n"),
        col("best.rn").as("cusum_pos"),
        col("best.abs_s").cast("long").as("cusum_peak_scaled"),
        col("best.event_id").as("change_event_id"))
      .orderBy(col("event_type"))
  }

  /** Pre-round-10 q_attribution_linear: the n>0 / n=0 union, each side
    * re-deriving the windowed purchase frame. */
  private def attribOld(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val e = Tables.events(s, d)
      .withColumn("k_view",
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).over(w))
      .withColumn("k_click",
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).over(w))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"),
        round(col("value") * 100).cast("long").as("cents"),
        coalesce(col("k_view"), lit(0L)).as("kv"),
        coalesce(col("k_click"), lit(0L)).as("kc"))
      .withColumn("n", col("kv") + col("kc"))
    val credits = p.filter(col("n") > 0)
      .select(explode(array(
        struct(lit("view").as("touch_type"),
          expr("cents * 10000 * kv DIV n").as("credit_micro")),
        struct(lit("click").as("touch_type"),
          expr("cents * 10000 * kc DIV n").as("credit_micro")))).as("c"))
      .select(col("c.touch_type"), col("c.credit_micro"))
      .unionByName(p.filter(col("n") === 0)
        .select(lit("direct").as("touch_type"),
          (col("cents") * 10000L).as("credit_micro")))
    credits.groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_credits"),
        sum(col("credit_micro")).as("credited_micro"))
      .orderBy(col("touch_type"))
  }

  /** Pre-round-10 q_bpe_merges: un-checkpointed vocab, each round's
    * lineage re-growing to the corpus scan. */
  private def bpeOld(s: SparkSession, d: String): DataFrame = {
    val words = Tables.documents(s, d)
      .select(explode(filter(split(col("text"), " "), t => length(t) > 0)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))
      .orderBy(col("wn").desc, col("w")).limit(TextQueries.VocabCap)
    val chars = expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
    var segs = words.select(col("w"), col("wn"),
      array_join(chars, "  ").as("seg"))
    val rounds = (1 to 3).map { r =>
      val arr = split(col("seg"), "  ")
      val pairs = segs
        .select(col("wn"), arr.as("a"))
        .select(col("wn"), explode(
          when(size(col("a")) >= 2,
            transform(sequence(lit(1), size(col("a")) - 1),
              i => struct(element_at(col("a"), i).as("pa"),
                element_at(col("a"), i + 1).as("pb"))))
            .otherwise(array().cast(ArrayType(StructType(Seq(
              StructField("pa", StringType), StructField("pb", StringType))))))).as("p"))
        .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(sum(col("wn")).as("n"))
      val top = pairs.orderBy(col("n").desc, col("pa"), col("pb")).limit(1)
        .select(col("pa"), col("pb"), col("n"), lit(r).as("round"))
      segs = segs.crossJoin(broadcast(top.select(col("pa"), col("pb"))))
        .select(col("w"), col("wn"),
          trim(expr("replace(' ' || seg || ' ', ' ' || pa || '  ' || pb || ' ', ' ' || pa || pb || ' ')"))
            .as("seg"))
      top
    }
    rounds.reduce(_ unionByName _)
      .select(col("round"), col("pa"), col("pb"), col("n"))
      .orderBy(col("round"))
  }

  /** PROSPECTIVE q_tfidf_top_terms with the token-grain tf frame
    * checkpointed (df would read it instead of re-deriving). */
  private def tfidfCheckpointed(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = docs.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
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
  }

  def main(args: Array[String]): Unit = {
    val section = args.headOption.getOrElse("group_p90")
    val dir = if (args.length > 1) args(1) else "/root/scale100x"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = AbHarness.session()
    def prod(name: String): () => DataFrame =
      () => graft.SparkEntry.queries(name)(spark, dir)
    val forms: Seq[(String, () => DataFrame)] = section match {
      case "group_p90" => Seq(
        "fixed" -> prod("q_group_p90"),
        "old" -> (() => groupP90Old(spark, dir)))
      case "ivf_ann" => Seq(
        "fixed" -> prod("q_ivf_ann"),
        "old" -> (() => ivfAnnOld(spark, dir)))
      case "semdedup" => Seq(
        "fixed" -> prod("q_semdedup"),
        "old" -> (() => semdedupOld(spark, dir)))
      case "cusum" => Seq(
        "fixed" -> prod("q_cusum_changepoint"),
        "old" -> (() => cusumOld(spark, dir)))
      case "attrib" => Seq(
        "fixed" -> prod("q_attribution_linear"),
        "old" -> (() => attribOld(spark, dir)))
      case "bpe" => Seq(
        "fixed" -> prod("q_bpe_merges"),
        "old" -> (() => bpeOld(spark, dir)))
      case "tfidf" => Seq(
        "prod" -> prod("q_tfidf_top_terms"),
        "ckpt" -> (() => tfidfCheckpointed(spark, dir)))
      case other => sys.error(s"unknown section $other")
    }
    AbHarness.run(forms, reps, tag = section)
    spark.stop()
  }
}
