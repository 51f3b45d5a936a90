package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types._

/** Native kernels for the product-quantization family
  * (`graft.queries.SimilarityQueries` q_pq_ann): the codebook is a
  * plan-time constant (md5-derived) shipped as a codegen reference
  * object, and both kernels preserve the EXACT fold structure of the
  * composed higher-order-function forms they replace — sub-distances
  * accumulate per (m, c) in element order, ADC adds per-subspace
  * subtotals in m order — so results stay bit-identical to the DuckDB
  * twin's nested list_sums while dropping the interpreted lambda
  * machinery (M×K×SUB closure calls per row).
  */
object PqKernel {
  /** Squared L2 over subspace m: Σ_j (emb[m·sub+j] − cw[m·sub+j])², in
    * j order. */
  def subD2(x: ArrayData, cw: Array[Double], m: Int, sub: Int): Double = {
    val base = m * sub
    var d = 0.0
    var j = 0
    while (j < sub && base + j < x.numElements()) {
      val diff = x.getFloat(base + j).toDouble - cw(base + j)
      d += diff * diff
      j += 1
    }
    d
  }
}

/** emb → array of per-subspace codes (1-based; first minimum wins ties,
  * like array_position(d2s, array_min(d2s))). */
case class PqEncode(child: Expression, codebook: IndexedSeq[IndexedSeq[Double]],
    m: Int, sub: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // A null ELEMENT null-propagates the whole encoding (standard SQL),
  // so the result is nullable even over a non-null input column.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == ArrayType(FloatType, false) ||
        child.dataType == ArrayType(FloatType, true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"argument must be array<float>, got ${child.dataType.sql}")

  @transient private lazy val cb: Array[Array[Double]] = codebook.map(_.toArray).toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val d = PqKernel.subD2(x, cb(c), mi, sub)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(mi) = best + 1
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("cb", cb, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val i = ctx.freshName("i")
      val hasNul = ctx.freshName("hasNul")
      s"""
         |boolean $hasNul = false;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) { $hasNul = true; break; }
         |}
         |if ($hasNul) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$m];
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    int $best = 0; double $bestD = Double.POSITIVE_INFINITY;
         |    for (int $c = 0; $c < $cbRef.length; $c++) {
         |      double $d = graft.functions.PqKernel.subD2($a, $cbRef[$c], $mi, $sub);
         |      if ($d < $bestD) { $bestD = $d; $best = $c; }
         |    }
         |    $codes[$mi] = $best + 1;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (queryEmb, codes) → asymmetric distance Σ_m subD2(q, cb[codes[m]], m),
  * per-subspace subtotals added in m order. */
case class PqAdc(left: Expression, right: Expression,
    codebook: IndexedSeq[IndexedSeq[Double]], m: Int, sub: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType != ArrayType(FloatType, false) &&
        left.dataType != ArrayType(FloatType, true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"left argument must be array<float>, got ${left.dataType.sql}")
    else if (right.dataType != ArrayType(IntegerType, false) &&
        right.dataType != ArrayType(IntegerType, true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"right argument must be array<int>, got ${right.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  // Null or out-of-range (outside 1..K) code elements null-propagate
  // the distance rather than crashing the executor, so the result is
  // nullable even when both input columns are not.
  override def nullable: Boolean = true

  @transient private lazy val cb: Array[Array[Double]] = codebook.map(_.toArray).toArray

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    var acc = 0.0
    var mi = 0
    val n = math.min(m, codes.numElements())
    while (mi < n) {
      if (codes.isNullAt(mi)) return null
      val code = codes.getInt(mi)
      if (code < 1 || code > cb.length) return null
      acc += PqKernel.subD2(q, cb(code - 1), mi, sub)
      mi += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("cb", cb, "double[][]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val mi = ctx.freshName("mi")
      val n = ctx.freshName("n")
      val code = ctx.freshName("code")
      val bad = ctx.freshName("bad")
      s"""
         |double $acc = 0.0;
         |boolean $bad = false;
         |int $n = java.lang.Math.min($m, $b.numElements());
         |for (int $mi = 0; $mi < $n; $mi++) {
         |  if ($b.isNullAt($mi)) { $bad = true; break; }
         |  int $code = $b.getInt($mi);
         |  if ($code < 1 || $code > $cbRef.length) { $bad = true; break; }
         |  $acc += graft.functions.PqKernel.subD2($a, $cbRef[$code - 1], $mi, $sub);
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqExpressions {
  def encode(emb: Column, codebook: Seq[Array[Double]], m: Int, sub: Int): Column =
    GraftShim.toColumn(PqEncode(GraftShim.toExpression(emb),
      codebook.map(_.toIndexedSeq).toIndexedSeq, m, sub))

  def adc(qEmb: Column, codes: Column, codebook: Seq[Array[Double]],
      m: Int, sub: Int): Column =
    GraftShim.toColumn(PqAdc(GraftShim.toExpression(qEmb),
      GraftShim.toExpression(codes),
      codebook.map(_.toIndexedSeq).toIndexedSeq, m, sub))
}
