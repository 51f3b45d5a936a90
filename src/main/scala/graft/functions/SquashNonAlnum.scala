package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen form of the text-normalization squash:
  *
  *   trim(regexp_replace(regexp_replace(s, "[^a-z0-9 ]", " "), " +", " "))
  *
  * Value contract (SquashNonAlnumSpec pins bit-parity against the
  * composed regex form on random ASCII + multi-byte Unicode strings):
  * keep the maximal runs of [a-z0-9], join them with single spaces.
  * The byte-level pass is EXACTLY the regex pipeline for any UTF-8
  * input: the regex replaces each non-kept CODEPOINT with one space
  * where this pass treats each non-kept BYTE as a separator — a
  * multi-byte codepoint yields several separator bytes vs one space,
  * but both collapse to a single joining space (or to nothing at the
  * edges, where the regex form's trim removes them). NULL → NULL.
  *
  * Why: the composed form runs two java.util.regex passes per document
  * (each with per-match replacement buffers) plus a trim allocation —
  * the dominant per-row cost of the corpus-wide canonicalization pass
  * that feeds exact dedup (q_text_normalize / q_curation_pipeline
  * class). This is one branch-predictable byte scan and one output
  * allocation, fused into whole-stage codegen.
  */
case class SquashNonAlnum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"argument must be string, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    SquashNonAlnum.computeJava(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SquashNonAlnum.computeJava($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SquashNonAlnum {

  /** One pass over the UTF-8 bytes: emit kept bytes, one ' ' between
    * kept runs (static forwarder is callable from generated Java). */
  def computeJava(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val out = new Array[Byte](bytes.length)
    var n = 0
    var pendingSep = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSep && n > 0) { out(n) = ' '; n += 1 }
        out(n) = b
        n += 1
        pendingSep = false
      } else {
        pendingSep = true
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, n)
  }
}
