package graft.functions

import graft.SparkTestBase
import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Custom Catalyst Expression + typed Aggregator surfaces
  * (SURVEY.md §2.2 "UDF/UDAF/UDTF surface").
  */
class CustomFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def composedCosine(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))
    dot / (na * nb)
  }

  test("CosineSimilarity expression == composed built-in form, bit-exact") {
    val e = Tables.embeddings(spark, sf())
    val a = e.select($"vec_id".as("id_a"), $"embedding".as("ea"))
    val b = e.select($"vec_id".as("id_b"), $"embedding".as("eb"))
    val pairs = a.join(b, $"id_a" < $"id_b").limit(5000)
      .select(
        GraftFunctions.cosine_sim($"ea", $"eb").as("custom"),
        composedCosine($"ea", $"eb").as("composed"))
    assert(pairs.filter($"custom" =!= $"composed").count() === 0)
    assert(pairs.filter($"custom".isNull).count() === 0)
  }

  test("CosineSimilarity registered for SQL; null-safe; identity == 1.0") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sf()).createOrReplaceTempView("emb_t")
    val self = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM emb_t").collect()
    assert(self.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-12))
    val nullRes = spark.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), embedding) AS c FROM emb_t LIMIT 1")
      .collect()
    assert(nullRes.head.isNullAt(0))
  }

  test("CosineSimilarity participates in whole-stage codegen") {
    val e = Tables.embeddings(spark, sf())
    val plan = e.select(GraftFunctions.cosine_sim($"embedding", $"embedding").as("c"))
      .queryExecution.executedPlan
    // The "*(n)" prefix marks operators fused into a WholeStageCodegen
    // stage; a CodegenFallback expression would strip it from Project.
    assert(plan.toString.contains("*(1) Project [cosinesimilarity"),
      s"expected codegen'd project in plan:\n$plan")
  }

  test("GraftExtensions injects cosine_sim into a fresh session's SQL") {
    import org.apache.spark.sql.SparkSession
    val base = spark // materialize the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // new SparkSession over the same SparkContext, WITH extensions
    val s2 = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      assert(s2 ne base) // really a fresh session, not the shared one
      graft.Tables.embeddings(s2, sf()).limit(5).createOrReplaceTempView("emb_ext")
      val r = s2.sql("SELECT cosine_sim(embedding, embedding) AS c FROM emb_ext").collect()
      assert(r.length === 5 && r.forall(x => math.abs(x.getDouble(0) - 1.0) < 1e-12))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("HyperplaneBits == composed zip_with/aggregate form, bit-exact + codegen") {
    // Planes deliberately include tiny components so projections can sit
    // near 0 — the sign decision must come out of identical doubles.
    val rnd = new scala.util.Random(7)
    val planes = Seq.fill(8)(Array.fill(64)(rnd.nextDouble() - 0.5))
    def composedBit(plane: Array[Double]): org.apache.spark.sql.Column = {
      val proj = aggregate(
        zip_with($"embedding", lit(plane), (x, p) => x.cast("double") * p),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1)).otherwise(lit(0))
    }
    val composed = planes.zipWithIndex
      .map { case (p, k) => composedBit(p) * (1 << k) }
      .reduce(_ + _).cast("int")
    val df = Tables.embeddings(spark, sf())
      .select(
        HyperplaneBits.column($"embedding", planes).as("custom"),
        composed.as("composed"))
    assert(df.filter($"custom" =!= $"composed").count() === 0)
    assert(df.filter($"custom".isNull).count() === 0)
    val plan = Tables.embeddings(spark, sf())
      .select(HyperplaneBits.column($"embedding", planes).as("b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [hyperplanebits"),
      s"expected codegen'd project in plan:\n$plan")
  }

  test("PqEncode/PqAdc == composed higher-order forms, bit-exact + codegen") {
    import graft.queries.SimilarityQueries
    val cb = SimilarityQueries.pqCodebookForTest
    val cbLit = typedLit(cb.map(_.toSeq))
    val M = 8; val SUB = 8; val K = cb.length
    def d2(emb: org.apache.spark.sql.Column, cw: org.apache.spark.sql.Column,
        m: org.apache.spark.sql.Column) =
      aggregate(
        zip_with(
          slice(emb, m * SUB + 1, lit(SUB)), slice(cw, m * SUB + 1, lit(SUB)),
          (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
        lit(0.0), (acc, x) => acc + x)
    val composedCodes = transform(sequence(lit(0), lit(M - 1)), m => {
      val d2s = transform(sequence(lit(1), lit(K)), c => d2($"embedding", element_at(cbLit, c), m))
      array_position(d2s, array_min(d2s)).cast("int")
    })
    val composedAdc = aggregate(sequence(lit(0), lit(M - 1)), lit(0.0),
      (acc, m) => acc + d2($"embedding",
        element_at(cbLit, element_at(composedCodes, m + 1)), m))
    val df = Tables.embeddings(spark, sf())
      .select(
        SimilarityQueries.pqCodes($"embedding").as("nc"),
        composedCodes.as("cc"),
        SimilarityQueries.pqAdc($"embedding", composedCodes).as("na"),
        composedAdc.as("ca"))
    assert(df.filter($"nc" =!= $"cc").count() === 0)
    assert(df.filter($"na" =!= $"ca").count() === 0)
    val plan = Tables.embeddings(spark, sf())
      .select(SimilarityQueries.pqCodes($"embedding").as("c"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [pqencode"),
      s"expected codegen'd project in plan:\n$plan")
  }

  test("HyperplaneBits / PqEncode / PqAdc are null-safe") {
    val planes = Seq(Array.fill(64)(0.1))
    val cb = graft.queries.SimilarityQueries.pqCodebookForTest
    val df = Seq(Tuple1(Option.empty[Seq[Float]])).toDF("embedding")
      .select(col("embedding").cast("array<float>").as("embedding"))
    assert(df.select(HyperplaneBits.column($"embedding", planes)).head.isNullAt(0))
    assert(df.select(PqExpressions.encode($"embedding", cb, 8, 8)).head.isNullAt(0))
    assert(df.select(PqExpressions.adc($"embedding",
      lit(null).cast("array<int>"), cb, 8, 8)).head.isNullAt(0))
  }

  test("null elements and out-of-range codes null-propagate instead of reading 0.0 / crashing") {
    val planes = Seq(Array.fill(64)(0.1), Array.fill(64)(-0.1))
    val cb = graft.queries.SimilarityQueries.pqCodebookForTest
    // array<float> with a null element (containsNull=true)
    val withNullElem = Seq(Tuple1(Seq[Option[Float]](Some(1.0f), None, Some(2.0f))))
      .toDF("embedding")
      .select(col("embedding").cast("array<float>").as("embedding"))
    // Both planes' projections null-propagate -> both bits 0.
    assert(withNullElem.select(HyperplaneBits.column($"embedding", planes))
      .head.getInt(0) === 0)
    assert(withNullElem.select(PqExpressions.encode($"embedding", cb, 8, 8))
      .head.isNullAt(0))
    val q = Seq(Tuple1(Seq.fill(64)(0.5f))).toDF("q")
      .select(col("q").cast("array<float>").as("q"))
    // codes containing 0 (out of 1..K range) -> NULL, not AIOOBE
    assert(q.select(PqExpressions.adc($"q",
      array((0 until 8).map(_ => lit(0)): _*), cb, 8, 8)).head.isNullAt(0))
    // codes containing a null element -> NULL
    assert(q.select(PqExpressions.adc($"q",
      array(lit(1), lit(null).cast("int")), cb, 8, 8)).head.isNullAt(0))
  }

  test("PortableHash60 == composed conv(substring(md5)) form on real + adversarial strings") {
    val docs = Tables.documents(spark, sf())
      .select(explode(split($"text", " ")).as("s"))
    val adversarial = Seq("", " ", "é∂ƒ©˙", "a" * 10000, "line\nbreak", "nul\u0000byte",
      "0123456789abcdef", "😀 emoji").toDF("s")
    for (df <- Seq(docs, adversarial)) {
      val mismatches = df
        .withColumn("fast", GraftFunctions.portable_hash60($"s"))
        .withColumn("slow",
          conv(substring(md5($"s"), 1, 15), 16, 10).cast("long"))
        .filter($"fast" =!= $"slow")
        .count()
      assert(mismatches == 0L)
    }
  }

  test("HashedShingles == composed distinct/transform/phash chain on real + adversarial text") {
    val docs = Tables.documents(spark, sf()).select($"text")
    val adversarial = Seq("", " ", "  ", "a b", "a b c", "a b c ", " a b c",
      "a  b  c", "a b c d e", "dup dup dup dup", "é∂ ƒ© ˙∆ œ∑",
      "x " * 500, "tab\tand space mix here").toDF("text")
    for (df <- Seq(docs, adversarial)) {
      val mismatches = df
        .withColumn("fast", GraftFunctions.hashed_shingles($"text"))
        .withColumn("slow", graft.queries.DedupQueries.hashedShinglesComposed($"text"))
        .filter(!($"fast" <=> $"slow"))
        .count()
      assert(mismatches == 0L)
    }
  }

  test("HashedShingles == composed chain on MALFORMED UTF-8 bytes") {
    // binary -> string cast is a raw byte copy (UTF8String.fromBytes,
    // no validation), so these rows carry genuinely malformed UTF-8
    // into both paths. Spark's `split` is Java-regex-based and decodes
    // via toString (replacement chars) BEFORE tokenizing — the fused
    // kernel's own toString round trip replicates exactly that, so the
    // two stay bit-identical on arbitrary bytes (round-7 advice: a
    // byte-level kernel was tried and diverges on every row here).
    val raw: Seq[Array[Byte]] = Seq(
      Array(0x61, 0x20, 0xff, 0x20, 0x62, 0x20, 0x63).map(_.toByte),
      Array(0xc3, 0x20, 0xe2, 0x82, 0x20, 0x80, 0x20, 0xf0).map(_.toByte),
      Array(0xff, 0xfe, 0x20, 0x00, 0x20, 0x80, 0x81, 0x20, 0x41,
        0x20, 0xff, 0xfe).map(_.toByte))
    val df = raw.map(Tuple1(_)).toDF("b")
      .select($"b".cast("string").as("text"))
    val mismatches = df
      .withColumn("fast", GraftFunctions.hashed_shingles($"text"))
      .withColumn("slow", graft.queries.DedupQueries.hashedShinglesComposed($"text"))
      .filter(!($"fast" <=> $"slow"))
      .count()
    assert(mismatches == 0L)
  }

  test("HashedShingles participates in whole-stage codegen") {
    val plan = Tables.documents(spark, sf())
      .select(GraftFunctions.hashed_shingles($"text").as("sh"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [hashedshingles"), s"plan:\n$plan")
  }

  test("PortableHash60 participates in whole-stage codegen and is SQL-callable") {
    val plan = Tables.documents(spark, sf())
      .select(GraftFunctions.portable_hash60($"text").as("h"))
      .queryExecution.executedPlan.toString
    // `*(n)` is the whole-stage-codegen marker on the Project that
    // evaluates the expression (the tree string renders stage ids, not
    // the WholeStageCodegen node name).
    assert(plan.contains("*(1) Project [portablehash60"), s"plan:\n$plan")
    GraftFunctions.register(spark)
    Tables.documents(spark, sf()).createOrReplaceTempView("docs_ph")
    val viaSql = spark.sql(
      "SELECT portable_hash60(text) AS h FROM docs_ph ORDER BY h LIMIT 1").head.getLong(0)
    assert(viaSql >= 0L)
  }

  test("LastMatchFold Aggregator == built-in fold over random partitions") {
    import LastMatchFold._
    val rnd = new scala.util.Random(7)
    val outcomes = Array("Benign", "Invasive", "No biopsy", "weird", "DCIS")
    val rows = (0 until 200).map(i =>
      In(i.toLong, rnd.nextBoolean(), outcomes(rnd.nextInt(outcomes.length))))
    // typed aggregation across many partitions (exercises merge())
    val ds = spark.createDataset(rows).repartition(7)
    val got = ds.select(LastMatchFold.column).head()
    // sequential truth
    val hasMismatch = rows.exists(!_.matched)
    val last = rows.maxBy(_.rowId)
    val wantBiopsy =
      if (last.matched) Some(SequentialClassify.classify(last.outcome)) else None
    assert(got.hasMismatch === hasMismatch)
    assert(got.biopsy === wantBiopsy)
  }

  private object SequentialClassify {
    def classify(o: String): String = graft.pipeline.SequentialReference.classify(o)
  }
}
