package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded bottom-k aggregate: keep the `k` input rows with the
  * smallest `(sortKey, id)` and return their ids sorted ascending.
  *
  * This is the per-key fan-out cap (TriCap / CoCap / WedgeCap) as an
  * AGGREGATE instead of a rank window, and the difference is the whole
  * point at scale:
  *
  *   - the window form (`row_number().over(partitionBy(key).orderBy(h,
  *     id)) <= k`) must shuffle EVERY adjacency row of a key to one
  *     reducer and sort the full group before it can discard anything —
  *     a hub key with 10⁸ neighbors moves 10⁸ rows to one task;
  *   - this form carries O(k) state per key and participates in partial
  *     aggregation, so each map partition forwards AT MOST k rows per
  *     key it saw, no sort anywhere. The hub's 10⁸ rows become
  *     (#map-partitions · k) shuffle rows, and the reduce side merges
  *     k-bounded buffers. Skew-proof by construction.
  *
  * Equivalence contract (pinned by MinKPairsSpec against the window
  * form on randomized multi-partition frames): the kept multiset is
  * exactly the window's `rn <= k` rows — duplicate input rows are
  * kept-twice by both forms alike. Null sortKey/id rows are where the
  * forms genuinely DIVERGE: MinKBy skips them, while Spark's ascending
  * sort is NULLS FIRST so the window form would rank them ahead of
  * every non-null row. Non-null inputs are therefore a caller
  * precondition (all callers aggregate non-null key columns); the
  * divergence is itself pinned by a spec test.
  *
  * The output comes back id-sorted ascending so [[PairCombinations]]
  * can emit `a < b` pairs positionally.
  */
case class MinKBy(
    sortKey: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKByBuf] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(sortKey, id)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (sortKey.dataType == LongType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"min_k_by needs (bigint, bigint), got " +
        s"(${sortKey.dataType.sql}, ${id.dataType.sql})")

  override def createAggregationBuffer(): MinKByBuf = new MinKByBuf(k)

  override def update(buf: MinKByBuf, row: InternalRow): MinKByBuf = {
    val kv = sortKey.eval(row)
    val iv = id.eval(row)
    if (kv != null && iv != null)
      buf.offer(kv.asInstanceOf[Long], iv.asInstanceOf[Long])
    buf
  }

  override def merge(buf: MinKByBuf, other: MinKByBuf): MinKByBuf =
    buf.mergeIn(other)

  override def eval(buf: MinKByBuf): Any = {
    val ids = java.util.Arrays.copyOf(buf.ids, buf.n)
    java.util.Arrays.sort(ids)
    new GenericArrayData(ids)
  }

  override def serialize(buf: MinKByBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.keys(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKByBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MinKByBuf(k)
    // serialized buffers are already (key, id)-sorted and n <= k, so a
    // straight copy reconstructs a valid buffer.
    var i = 0
    while (i < n) { buf.keys(i) = bb.getLong; buf.ids(i) = bb.getLong; i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKBy =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MinKBy =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sortKey = newChildren(0), id = newChildren(1))
}

/** Mutable bottom-k buffer: parallel (key, id) arrays kept sorted
  * ascending by (key, id); inserts are O(k) shifts with an O(1)
  * common-case reject (new element >= current max on a full buffer). */
final class MinKByBuf(val k: Int) {
  val keys = new Array[Long](k)
  val ids = new Array[Long](k)
  var n = 0

  @inline private def lt(ka: Long, ia: Long, kb: Long, ib: Long): Boolean =
    ka < kb || (ka == kb && ia < ib)

  def offer(key: Long, id: Long): Unit = {
    if (n == k && !lt(key, id, keys(k - 1), ids(k - 1))) return
    var j = (if (n == k) k - 1 else n) - 1
    while (j >= 0 && lt(key, id, keys(j), ids(j))) {
      keys(j + 1) = keys(j); ids(j + 1) = ids(j); j -= 1
    }
    keys(j + 1) = key; ids(j + 1) = id
    if (n < k) n += 1
  }

  def mergeIn(other: MinKByBuf): MinKByBuf = {
    var i = 0
    while (i < other.n) { offer(other.keys(i), other.ids(i)); i += 1 }
    this
  }
}

/** All `i < j` element pairs of a LongType array as
  * `array<struct<a bigint, b bigint>>` — with an id-sorted input (what
  * [[MinKBy]] returns) every emitted pair satisfies `a < b`, i.e. the
  * exact row set the capped per-key self-join
  * (`capped.join(capped, key).filter(a < b)`) produces, generated
  * inline in one codegen pass instead of re-sorting and sort-merge-
  * joining the capped frame against itself (which also re-executes the
  * cap's window on BOTH join sides — only the exchange below it is
  * reused). Output size is C(n,2) <= C(cap,2) per row: bounded by
  * construction, 2016 structs at cap=64.
  */
case class PairCombinations(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"argument must be array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    PairCombinations.computeJava(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PairCombinations.computeJava($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PairCombinations {

  /** Positional i<j pairs (static forwarder callable from generated
    * Java). Null array elements are impossible from [[MinKBy]] but a
    * spec-driven array with nulls reads as 0 via ArrayData.getLong —
    * callers own the containsNull=false contract. */
  def computeJava(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var idx = 0
    var i = 0
    while (i < n) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(idx) = new GenericInternalRow(Array[Any](a, arr.getLong(j)))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
