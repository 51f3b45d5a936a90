package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen form of the library's hashed 3-gram shingle set.
  *
  * Value contract (bit-identical, oracle-checked against the DuckDB
  * twins and property-tested against the composed form in
  * CustomFunctionsSpec):
  *
  * {{{
  *   array_distinct(transform(
  *     when(size(split(text, " ")) >= 3,
  *       array_distinct(transform(sequence(0, size - 3),
  *         i => concat_ws(" ", slice(tokens, i + 1, 3)))))
  *       .otherwise(array()),
  *     g => portable_hash60(concat_ws(":", "0", g))))
  * }}}
  *
  * i.e. the first-occurrence-ordered distinct PortableHash60 values of
  * "0:" + each word 3-gram, where tokens come from `split(text, " ")`
  * (single-space regex, empty tokens kept — Java split semantics with
  * limit -1). Dedup before or after hashing is indistinguishable: equal
  * grams hash equal and first-occurrence order survives both routes.
  *
  * Why a custom expression: the composed form chains FIVE higher-order
  * array functions (split, sequence, transform+slice+concat_ws,
  * array_distinct, transform+hash, array_distinct), none of which
  * participate in whole-stage codegen — every element pays interpreted
  * lambda dispatch and each stage materializes an intermediate array.
  * Shingling feeds ~15 gated queries (MinHash signatures, LSH banding,
  * n-gram Jaccard, containment, prefix-filter join, winnowing), making
  * it the hottest composite in the text family; this is one fused pass
  * per document.
  */
case class HashedShingles(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"argument must be string, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    HashedShingles.computeJava(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashedShingles.computeJava($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedShingles {

  /** Ordered-distinct hashed 3-gram shingles (static forwarder callable
    * from generated Java).
    *
    * ARBITRARY-BYTE contract (round-7 advice, resolved by measurement):
    * the `toString` round trip below substitutes U+FFFD for malformed
    * UTF-8 — and that is exactly what the composed chain does too,
    * because Spark's `split` is Java-regex-based (UTF8String.split
    * decodes via toString before matching), so its tokens are already
    * replacement-substituted before concat_ws/hash ever run. A
    * byte-level kernel (0x20-run tokenizer + md5 over raw slices) was
    * tried and DIVERGES from the composed chain on every malformed
    * input; the String-based form is bit-identical on arbitrary bytes,
    * which CustomFunctionsSpec's malformed-UTF-8 test pins down. */
  def computeJava(s: UTF8String): ArrayData = {
    // Java String.split(" ", -1) = the same single-space regex split
    // Spark's `split(c, " ")` performs, empty tokens (incl. trailing)
    // kept — the token-count >= 3 gate below counts them too.
    val toks = s.toString.split(" ", -1)
    if (toks.length < 3) return new GenericArrayData(Array.emptyLongArray)
    val n = toks.length - 2
    val seen = new java.util.HashSet[java.lang.Long](math.min(n, 1024))
    val out = new Array[Long](n)
    var m = 0
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      // "0:" + gram — the phash(gram, 0) seed prefix from
      // TextQueries.phash, fused into the gram builder.
      sb.append("0:").append(toks(i)).append(' ')
        .append(toks(i + 1)).append(' ').append(toks(i + 2))
      val h = PortableHash60.hashJava(UTF8String.fromString(sb.toString))
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}
