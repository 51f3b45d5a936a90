package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.aggregate.SortAggregateExec
import org.apache.spark.sql.execution.joins.CartesianProductExec

import graft.SparkEntry

/** Dev diagnostic, the third of the plan-audit instruments (ScanAudit:
  * duplicate scans; PruneAudit: pruning/pushdown; this: codegen). For
  * every query's physical plan it flags the shapes that silently fall
  * off Tungsten's fast path:
  *
  *   - FALLBACK-EXPR: a [[CodegenFallback]] expression inside a
  *     Project/Filter — the row-at-a-time hot path. The stage still
  *     codegens, but every row pays an interpreted `eval()` call with
  *     boxed inputs for that expression — a per-row tax that scales
  *     with the 100 TB row count and is invisible in `.explain`.
  *   - SORT-AGG: a SortAggregateExec — the planner couldn't use hash
  *     aggregation (immutable-buffer agg or non-orderable fallback),
  *     so every group pays a sort. Legitimate for collect_list-style
  *     buffers ONLY when ObjectHashAggregate can't apply.
  *   - CARTESIAN: CartesianProductExec — n×m row expansion with no
  *     join key; every instance must be a documented bounded case.
  *   - NO-WSCG: zero WholeStageCodegen spans in the whole plan — the
  *     query never enters generated code at all.
  *
  * AQE is off for the same reason as PruneAudit: the audit only PLANS
  * queries, and the adaptive wrapper hides the physical tree from
  * `collect`. Run: `runMain graft.queries.CodegenAudit [sfDir] [-v]`.
  */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val verbose = args.contains("-v")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ClinicalQueries.fixturePath
    graft.sources.DicomFixtures.ensure()
    try graft.Tables.documentsSpread(spark, sfDir) catch { case _: Throwable => () }

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val all: Seq[SparkPlan] = plan.collectWithSubqueries { case p => p }
        val wscg = all.count(_.isInstanceOf[WholeStageCodegenExec])
        val fallbacks = all.flatMap {
          case p @ (_: ProjectExec | _: FilterExec) =>
            p.expressions.flatMap(_.collect {
              case e: CodegenFallback => e.prettyName
            })
          case _ => Nil
        }.distinct
        val sortAggs = all.collect { case s: SortAggregateExec =>
          s.aggregateExpressions.map(_.aggregateFunction.prettyName)
            .distinct.mkString(",")
        }
        val cartesian = all.count(_.isInstanceOf[CartesianProductExec])
        val flags = Seq(
          if (fallbacks.nonEmpty) Some(s"FALLBACK-EXPR[${fallbacks.mkString(",")}]") else None,
          if (sortAggs.nonEmpty) Some(s"SORT-AGG[${sortAggs.mkString(";")}]") else None,
          if (cartesian > 0) Some(s"CARTESIAN x$cartesian") else None,
          if (wscg == 0) Some("NO-WSCG") else None
        ).flatten
        if (flags.nonEmpty)
          println(s"[codegen-audit] $name: ${flags.mkString(" | ")} (wscg=$wscg)")
        else if (verbose)
          println(s"[codegen-audit] $name ok (wscg=$wscg, ops=${all.size})")
      } catch {
        case e: Throwable => println(s"[codegen-audit] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
