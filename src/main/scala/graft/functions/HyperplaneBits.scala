package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression computing an LSH bucket id: for each
  * hyperplane k, bit k = (Σ_i emb[i]·plane_k[i] > 0), bits packed as
  * Σ bit_k·2^k. One fused pass with whole-stage codegen, replacing
  * K × 3 interpreted higher-order traversals (zip_with + aggregate per
  * plane) in the LSH query family — the map-side stage every
  * LSH-driven dedup/ANN query runs over the full corpus.
  *
  * Semantics are bit-identical to the composed form for the library's
  * domain (fixed-dimension non-null float embeddings): the projection
  * accumulates in element order with double arithmetic, exactly like
  * `aggregate(zip_with(emb, plane, (x,p) => x*p), 0.0, _+_)`, so the
  * DuckDB twin's `list_sum(list_transform(...))` stays exact
  * (CustomFunctionsSpec asserts parity on random vectors).
  *
  * The plane matrix is a PLAN-TIME constant (md5-derived, SURVEY.md
  * §2.2 "LLM ops") shipped to codegen as a referenced object — never a
  * per-row literal array.
  */
case class HyperplaneBits(child: Expression, planes: IndexedSeq[IndexedSeq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == ArrayType(FloatType, false) ||
        child.dataType == ArrayType(FloatType, true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"argument must be array<float>, got ${child.dataType.sql}")

  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var bits = 0
    var k = 0
    while (k < planeArr.length) {
      val p = planeArr(k)
      val n = math.min(x.numElements(), p.length)
      var proj = 0.0
      var nul = false
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) { nul = true; i = n }
        else { proj += x.getFloat(i).toDouble * p(i); i += 1 }
      }
      // A null element null-propagates the projection in the composed
      // zip_with/aggregate form, and NULL > 0 is not true — bit stays 0.
      if (!nul && proj > 0) bits |= 1 << k
      k += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planeArr, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val bits = ctx.freshName("bits")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val proj = ctx.freshName("proj")
      s"""
         |int $bits = 0;
         |for (int $k = 0; $k < $planesRef.length; $k++) {
         |  double[] $p = $planesRef[$k];
         |  int $n = java.lang.Math.min($a.numElements(), $p.length);
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $proj += ((double) $a.getFloat($i)) * $p[$i];
         |  }
         |  if ($proj > 0) $bits |= 1 << $k;
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBits {
  def column(emb: Column, planes: Seq[Array[Double]]): Column =
    GraftShim.toColumn(HyperplaneBits(
      GraftShim.toExpression(emb),
      planes.map(_.toIndexedSeq).toIndexedSeq))
}
