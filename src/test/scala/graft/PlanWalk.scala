package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Shared AQE-aware executed-plan walkers for the specs and probes that
  * read runtime scan/exchange metrics — one body, so a Spark upgrade
  * that reshapes the adaptive node tree (the breakage class these
  * helpers exist to absorb) is fixed in one place. */
object PlanWalk {

  /** Every FileSourceScanExec under `p`, descending through adaptive
    * wrappers, query stages, and subqueries. */
  def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(scans) ++ other.subqueries.flatMap(scans)
  }

  /** Every ShuffleExchangeExec under `p` — cached-relation subtrees are
    * excluded (a persisted input's own build plan is not this query's
    * exchange). */
  def exchanges(p: SparkPlan): Seq[ShuffleExchangeExec] = p match {
    case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
    case q: QueryStageExec => exchanges(q.plan)
    case s: ShuffleExchangeExec => s +: s.children.flatMap(exchanges)
    case _: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      Seq.empty
    case other =>
      other.children.flatMap(exchanges) ++ other.subqueries.flatMap(exchanges)
  }
}
