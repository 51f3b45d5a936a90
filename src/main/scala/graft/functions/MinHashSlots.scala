package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native fused form of the library's full MinHash signature: all
  * `numHashes` slots in ONE pass over the hashed-shingle array.
  *
  * Value contract (bit-identical, property-tested against the composed
  * form in MinHashSlotsSpec, oracle-checked through the DuckDB twins of
  * every signature-fed query):
  *
  * {{{
  *   array((0 until numHashes).map(j =>
  *     array_min(transform(sh, h => (hashA(j) * (h % P) + hashB(j)) % P))))
  * }}}
  *
  * with `P`/`hashA`/`hashB` from this object (the single source of the
  * universal-hash constants — DedupQueries and the SQL twins read them
  * from here). Slot j is NULL when the array has no non-null element
  * (array_min's skip-null semantics); a NULL input array yields NULL
  * (plain null propagation — the composed outer `array(...)` would give
  * an array of NULLs instead, but every call site gates on
  * `size(sh) > 0` first, so the difference is unreachable and the
  * property test pins the non-null domain).
  *
  * Why a custom expression (the [[HashedShingles]] precedent): the
  * composed form runs `numHashes` interpreted transform+array_min
  * chains per document — 2·numHashes lambda-dispatched traversals and
  * numHashes boxed intermediate arrays. The fused loop hoists `h % P`
  * out (computed once per element, not once per slot), keeps the
  * running minima in primitive locals, and allocates only the result.
  * Signatures feed the whole MinHash family (LSH banding, candidate
  * pairs, jaccard estimation, incremental dedup).
  */
case class MinHashSlots(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument must be array<bigint>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSlots.computeJava(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSlots.computeJava($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSlots {

  /** The universal-hash family h_j(x) = (hashA(j)·(x mod P) + hashB(j))
    * mod P shared by the Scala forms and the DuckDB twin SQL. */
  val P = 1000000007L
  def hashA(j: Int): Long = 1000003L * (j + 1)
  def hashB(j: Int): Long = 7919L * (j + 1)

  /** All slots in one traversal (static forwarder callable from
    * generated Java). Products stay far from Long overflow:
    * hashA(j) ≤ 8·10⁶ for j < 8 and (x % P) < 10⁹ → ≤ 8·10¹⁵. */
  def computeJava(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val mins = new Array[Long](n)
    val has = new Array[Boolean](n)
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(i)) {
        val hp = arr.getLong(i) % P
        var j = 0
        while (j < n) {
          val v = (hashA(j) * hp + hashB(j)) % P
          if (!has(j) || v < mins(j)) { mins(j) = v; has(j) = true }
          j += 1
        }
      }
      i += 1
    }
    var allSet = true
    var j = 0
    while (j < n) { if (!has(j)) allSet = false; j += 1 }
    if (allSet) new GenericArrayData(mins)
    else new GenericArrayData(Array.tabulate[Any](n)(j =>
      if (has(j)) java.lang.Long.valueOf(mins(j)) else null))
  }
}
