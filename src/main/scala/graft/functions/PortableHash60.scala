package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen form of the library's portable 60-bit string hash.
  *
  * Value contract (bit-identical, oracle-checked): equals
  * `conv(substring(md5(s), 1, 15), 16, 10)` — the first 15 hex digits of
  * the md5 as a long — which DuckDB reproduces as
  * `CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)`
  * (`graft.queries.TextQueries.phash`/`sqlPhash`). The first 15 hex
  * digits are the first 7.5 bytes of the digest: big-endian first 8
  * bytes logically shifted right by one nibble.
  *
  * Why a custom expression: the composed form materializes the 32-char
  * hex string, substrings it, and re-parses it through `conv` — three
  * UTF8String allocations per value on top of the digest. This is one
  * digest call and integer arithmetic, fused into whole-stage codegen.
  * The hash runs once per shingle/token/gram, which makes it the single
  * hottest scalar in the dedup family (MinHash signatures, LSH banding,
  * SimHash, n-gram Jaccard, decontamination).
  */
case class PortableHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"argument must be string, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    PortableHash60.hashJava(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PortableHash60.hashJava($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PortableHash60 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(s) as a long (static forwarder is
    * callable from generated Java). */
  def hashJava(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    top60(md.digest(s.getBytes))
  }

  private def top60(h: Array[Byte]): Long = {
    val top =
      ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) |
      ((h(2) & 0xffL) << 40) | ((h(3) & 0xffL) << 32) |
      ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
    top >>> 4
  }
}
