package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for squared L2 distance over two
  * float/double vectors — the [[CosineSimilarity]] sibling for the
  * PQ/ADC metric space (each side independently array<float> or
  * array<double>; elements widen to double exactly, so float/double
  * mixes match the composed `cast(DoubleType)` form bit-for-bit).
  *
  * Semantics match the composed form it replaces —
  * `aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)), 0.0, _+_)` with
  * double accumulation in element order — FOR FIXED-DIMENSION,
  * NON-NULL-ELEMENT vectors, the only inputs the library produces
  * (MinHashSlotsSpec's sibling property in CustomFunctionsSpec pins the
  * cosine contract; SquaredL2Spec pins this one). Outside that domain
  * they diverge the same way CosineSimilarity documents: min(length)
  * loop, null elements read as 0.0.
  *
  * Why: the composed form is two interpreted higher-order traversals
  * plus a boxed intermediate array per pair, and it sits on the two
  * hottest L2 products in the ANN family — the exact ground-truth
  * ranking of the recall gates (|probes| x |corpus| pairs) and the PQ
  * subvector-to-centroid assignment (n x M x k rows per Lloyd
  * iteration).
  */
case class SquaredL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def okElem(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!okElem(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"left argument must be array<float|double>, got ${left.dataType.sql}")
    else if (!okElem(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"right argument must be array<float|double>, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  private def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left.dataType)
    val rf = isFloat(right.dataType)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xi - yi
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left.dataType)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right.dataType)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val dd = ctx.freshName("dd")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $dd = (double) $a.$lGet($i) - (double) $b.$rGet($i);
         |  $acc += $dd * $dd;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
