package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen form of `size(array_intersect(a, b))` for long
  * arrays — the exact-Jaccard verify kernel that runs once per LSH /
  * inverted-index candidate pair.
  *
  * Value contract: for NON-NULL input arrays this equals the composed
  * form on ANY element content — `array_intersect` returns the
  * distinct elements of `a` that occur in `b` (null counted once when
  * present in both), and this counts exactly that set without
  * materializing it (SetIntersectSizeSpec pins the equivalence on
  * random duplicate/null-element arrays and the real shingle domain).
  * On a NULL input array this is NULL where the composed
  * `size(array_intersect)` yields −1 under the legacy sizeOfNull
  * default — every call site joins or filters the arrays non-null
  * first, so the difference is unreachable and null propagation is
  * the safer behavior.
  *
  * Why: `ArrayIntersect`'s codegen builds the intersection ARRAY per
  * row (hash set + output allocation + copy) only for `size` to read
  * its length; at ~10⁶–10⁸ candidate pairs per query the allocation
  * and copy are the verify stage's constant factor. This is one
  * membership-count pass: hash set over `b`, seen-set over `a`,
  * nothing materialized.
  */
case class SetIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!ok(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"left argument must be array<bigint>, got ${left.dataType.sql}")
    else if (!ok(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"right argument must be array<bigint>, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(a: Any, b: Any): Any =
    SetIntersectSize.computeJava(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SetIntersectSize.computeJava($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SetIntersectSize {

  /** |distinct(a) ∩ set(b)|, null element counted once if in both —
    * the array_intersect cardinality (static forwarder for generated
    * Java). Probes with the SMALLER set logic left as-is: the verify
    * arrays are same-order-of-magnitude shingle sets, so asymmetry
    * buys nothing measurable. */
  def computeJava(a: ArrayData, b: ArrayData): Int = {
    val nb = b.numElements()
    val inB = new java.util.HashSet[java.lang.Long](math.max(8, nb * 2))
    var bHasNull = false
    var i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true
      else inB.add(b.getLong(i))
      i += 1
    }
    val na = a.numElements()
    val seen = new java.util.HashSet[java.lang.Long](math.max(8, na))
    var countedNull = false
    var cnt = 0
    i = 0
    while (i < na) {
      if (a.isNullAt(i)) {
        if (bHasNull && !countedNull) { cnt += 1; countedNull = true }
      } else {
        val v = a.getLong(i)
        if (inB.contains(v) && seen.add(v)) cnt += 1
      }
      i += 1
    }
    cnt
  }
}
