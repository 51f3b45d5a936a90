package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` demo (SURVEY.md §2.2 "UDAF surface"):
  * the EA1141 J4 fold as a single custom aggregate.
  *
  * Semantics (`/root/reference/src/generate_mapping.py:59-75`): over a
  * subject's lesion rows in file order, a laterality-matching row sets
  * the biopsy via last-write-wins; any non-matching row erases the
  * screening BIRADS. The buffer tracks (any-mismatch, rowId-of-last-row,
  * matched?, outcome) — `merge` is order-safe because it keeps the max
  * rowId, so the aggregate distributes over partitions (this is the same
  * reduction `Ea1141Pipeline.foldLesions` spells with built-ins; the
  * Aggregator form proves the surface and is its property-tested twin).
  */
object LastMatchFold {

  case class In(rowId: Long, matched: Boolean, outcome: String)
  case class Buf(hasMismatch: Boolean, lastRowId: Long, lastMatched: Boolean,
      lastOutcome: String)
  case class Out(hasMismatch: Boolean, biopsy: Option[String])

  private val benign = Seq("BIRADS 1", "BIRADS 2", "BIRADS 3", "Benign",
    "No biopsy", "BI-RADS score downgraded")
  private val malignant = Seq("Invasive", "DCIS")

  private def classify(outcome: String): String =
    if (benign.exists(outcome.contains)) "BENIGN"
    else if (malignant.exists(outcome.contains)) "MALIGNANT"
    else "UNKNOWN"

  val aggregator: Aggregator[In, Buf, Out] = new Aggregator[In, Buf, Out] {
    def zero: Buf = Buf(hasMismatch = false, lastRowId = -1L,
      lastMatched = false, lastOutcome = null)

    def reduce(b: Buf, a: In): Buf = {
      val mismatch = b.hasMismatch || !a.matched
      if (a.rowId > b.lastRowId) Buf(mismatch, a.rowId, a.matched, a.outcome)
      else b.copy(hasMismatch = mismatch)
    }

    def merge(b1: Buf, b2: Buf): Buf = {
      val mismatch = b1.hasMismatch || b2.hasMismatch
      if (b2.lastRowId > b1.lastRowId) b2.copy(hasMismatch = mismatch)
      else b1.copy(hasMismatch = mismatch)
    }

    def finish(b: Buf): Out =
      Out(b.hasMismatch,
        if (b.lastRowId >= 0 && b.lastMatched) Some(classify(b.lastOutcome)) else None)

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }

  /** Column form for DataFrame `agg`. */
  def column: TypedColumn[In, Out] = aggregator.toColumn
}
