package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen form of the sorted-neighborhood key derivation:
  *
  *   substring(regexp_replace(s, "[^a-z0-9 ]", ""), 1, n)
  *
  * Value contract (SquashNonAlnumSpec pins bit-parity against the
  * composed form on random ASCII + multi-byte Unicode strings): drop
  * every byte outside [a-z0-9 ] (spaces KEPT, nothing collapsed), keep
  * the first n surviving bytes. Byte-level equals the regex form on any
  * UTF-8 input — the regex deletes non-kept codepoints whole, this
  * pass deletes each of their bytes (all ≥ 0x80, never in the kept
  * set), and the survivor string is pure ASCII so the regex form's
  * substring-by-characters is the same cut as this pass's byte count.
  * NULL → NULL.
  *
  * Why: the composed form regex-scans the ENTIRE document to build the
  * full stripped string, then keeps 24 characters of it. This pass
  * stops at the n-th kept byte — on multi-KB documents the per-row key
  * cost drops from O(doc) regex work to O(prefix) byte reads, and the
  * whole key derivation fuses into whole-stage codegen.
  */
case class StripNonAlnumPrefix(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"argument must be string, got ${child.dataType.sql}")
    else if (n <= 0)
      TypeCheckResult.TypeCheckFailure(s"prefix length must be > 0, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    StripNonAlnumPrefix.computeJava(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.StripNonAlnumPrefix.computeJava($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StripNonAlnumPrefix {

  /** First n bytes of s with everything outside [a-z0-9 ] dropped,
    * early-exiting at the n-th kept byte (static forwarder is callable
    * from generated Java). */
  def computeJava(s: UTF8String, n: Int): UTF8String = {
    val bytes = s.getBytes
    val out = new Array[Byte](math.min(n, bytes.length))
    var kept = 0
    var i = 0
    while (i < bytes.length && kept < n) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == ' ') {
        out(kept) = b
        kept += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, kept)
  }
}
