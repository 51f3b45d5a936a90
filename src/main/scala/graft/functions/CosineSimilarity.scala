package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two FLOAT
  * vectors, with whole-stage codegen (`doGenCode` emits a fused loop —
  * no per-element virtual calls, no lambda allocation).
  *
  * Semantics match the composed built-in form used by
  * `graft.queries.SimilarityQueries` (`aggregate(zip_with(...))` with
  * double accumulation in element order) FOR FIXED-DIMENSION,
  * NON-NULL-ELEMENT embeddings — the only inputs the library produces
  * (proven bit-identical in CustomFunctionsSpec on that domain). Outside
  * it they diverge: this loops over min(length) and reads null elements
  * as 0.0, where the composed form yields NULL for length-mismatched or
  * null-element arrays. This exists because the composed form evaluates
  * three separate higher-order traversals per pair, while this is one
  * pass — the difference matters on O(n²) similarity joins
  * (SURVEY.md §2.2 "LLM ops"; the reference's only non-relational
  * kernel pattern, `/root/reference/src/generate_mapping.py:116-140`,
  * maps to the same custom-kernel surface).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == ArrayType(FloatType, false) ||
        left.dataType == ArrayType(FloatType, true)) {
      if (right.dataType == ArrayType(FloatType, false) ||
          right.dataType == ArrayType(FloatType, true))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"right argument must be array<float>, got ${right.dataType.sql}")
    } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"left argument must be array<float>, got ${left.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the custom expressions. */
object GraftFunctions {
  def cosine_sim(a: Column, b: Column): Column =
    GraftShim.toColumn(CosineSimilarity(
      GraftShim.toExpression(a), GraftShim.toExpression(b)))

  def portable_hash60(s: Column): Column =
    GraftShim.toColumn(PortableHash60(GraftShim.toExpression(s)))

  def hashed_shingles(s: Column): Column =
    GraftShim.toColumn(HashedShingles(GraftShim.toExpression(s)))

  /** Full MinHash signature (all slots, one fused pass). */
  def min_hash_slots(sh: Column, numHashes: Int): Column =
    GraftShim.toColumn(MinHashSlots(GraftShim.toExpression(sh), numHashes))

  /** Squared L2 distance in one fused pass (float/double arrays). */
  def sq_l2(a: Column, b: Column): Column =
    GraftShim.toColumn(SquaredL2(
      GraftShim.toExpression(a), GraftShim.toExpression(b)))

  /** size(array_intersect(a, b)) without materializing the array. */
  def set_intersect_size(a: Column, b: Column): Column =
    GraftShim.toColumn(SetIntersectSize(
      GraftShim.toExpression(a), GraftShim.toExpression(b)))

  /** Bounded bottom-k cap as a partial-combinable aggregate — the
    * skew-proof form of the `row_number() <= k` fan-out caps. */
  def min_k_by(sortKey: Column, id: Column, k: Int): Column =
    GraftShim.toColumn(MinKBy(GraftShim.toExpression(sortKey),
      GraftShim.toExpression(id), k).toAggregateExpression())

  def pair_combinations(arr: Column): Column =
    GraftShim.toColumn(PairCombinations(GraftShim.toExpression(arr)))

  /** trim(regexp_replace(regexp_replace(s, "[^a-z0-9 ]", " "), " +", " "))
    * as one fused byte pass. */
  def squash_non_alnum(s: Column): Column =
    GraftShim.toColumn(SquashNonAlnum(GraftShim.toExpression(s)))

  /** substring(regexp_replace(s, "[^a-z0-9 ]", ""), 1, n) as one fused
    * byte pass that early-exits at the n-th kept byte. */
  def strip_non_alnum_prefix(s: Column, n: Int): Column =
    GraftShim.toColumn(StripNonAlnumPrefix(GraftShim.toExpression(s), n))

  /** Register the custom expressions for SQL use on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "portable_hash60", exprs => PortableHash60(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hashed_shingles", exprs => HashedShingles(exprs.head), "scala_udf")
  }
}
