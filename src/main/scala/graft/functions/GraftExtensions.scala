package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point — the deployment-grade way to ship
  * the engine's custom expressions: sessions built
  * `.withExtensions(new GraftExtensions)` (or with
  * `spark.sql.extensions=graft.functions.GraftExtensions`) get
  * `cosine_sim` in SQL with no per-session registration call.
  *
  * Deliberately small: SURVEY.md §4 records that no custom
  * Rule/SparkStrategy is REQUIRED — every reference operator composes
  * from built-ins — so the extension surface carries only the two native
  * expressions that earn their place on performance
  * (`CosineSimilarity`, `PortableHash60`) and the one optimizer rule
  * that earns its place on scan pruning
  * ([[SimplifyCaseWhenPredicates]]: filters over `when(p, v)`-derived
  * columns become parquet-pushable base-column predicates — found by
  * PruneAudit, round 10). All engine session builders (Verify, Bench,
  * StreamBench, the audits, SparkTestBase) register this, so the gated
  * results and the benched plans are the extension-enabled ones.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("portable_hash60"),
      new ExpressionInfo(classOf[PortableHash60].getName, "portable_hash60"),
      (exprs: Seq[Expression]) => PortableHash60(exprs.head)))
    e.injectOptimizerRule(_ => SimplifyCaseWhenPredicates)
  }
}
