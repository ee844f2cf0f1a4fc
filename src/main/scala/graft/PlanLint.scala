package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{BaseAggregateExec, ObjectHashAggregateExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Mechanized scale review of physical plans — the rules every
  * PlanAuditSpec test checks piecemeal, generalized so the WHOLE
  * catalogue (and any user plan) can be swept: a plan that passes the
  * linter has no structural feature that stops scaling at 100 TB.
  *
  * Rules:
  *  - `cartesian-product`: CartesianProductExec anywhere (quadratic
  *    work; only defensible for intentionally exhaustive baselines).
  *  - `single-partition-exchange`: a ShuffleExchange INTO
  *    SinglePartition — the whole upstream funnels through one task.
  *    The acceptable forms of "global" work rarely plan this: global
  *    sorts range-partition, global limits TakeOrderedAndProject, and
  *    the one structurally-safe producer — a grouping-free PARTIAL
  *    aggregate converging to its final (one row per upstream
  *    partition crosses the wire) — is recognized and exempted.
  *    Broadcast small sides use BroadcastExchange, not this node.
  *  - `unpartitioned-window`: a WindowExec whose required child
  *    distribution is all-tuples-in-one-partition (empty partition
  *    spec) — per-partition heaps (top-k after limit) are the only
  *    sanctioned use and sit behind a limit, over constant-bounded
  *    rows.
  *  - `object-hash-aggregate`: the slow object-buffer aggregate path
  *    (TypedImperativeAggregate) over an UN-pre-aggregated input is
  *    how t76 burned 25×; flagged as advisory so pre-aggregation
  *    regressions surface in review.
  *
  * The linter traverses adaptive wrappers and cached-relation
  * subtrees (a pin must not hide a hazard). Findings carry the node's
  * one-line rendering for actionable output.
  */
object PlanLint {

  final case class Finding(rule: String, node: String)

  /** A SinglePartition exchange fed by a grouping-free PARTIAL
    * aggregate is the standard global-aggregate convergence — one row
    * per upstream partition crosses the wire. That is the one
    * structurally-safe producer of a single-partition exchange. */
  private def isGlobalPartialAgg(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec => a.groupingExpressions.isEmpty
    // stop the descent at exchange boundaries: a nested exchange means
    // whatever partial agg sits BELOW it converged a different data
    // flow — exempting through it would let an unrelated
    // single-partition funnel hide behind a deep global agg (lint
    // false negative)
    case _: org.apache.spark.sql.execution.exchange.Exchange => false
    case _ if p.children.size == 1 => isGlobalPartialAgg(p.children.head)
    case _ => false
  }

  def lint(df: DataFrame): Seq[Finding] =
    lintPlan(df.queryExecution.executedPlan)

  def lintPlan(plan: SparkPlan): Seq[Finding] = {
    // expand adaptive wrappers and cached-relation inner plans so the
    // traversal sees the REAL operator tree
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
      case m: InMemoryTableScanExec =>
        m +: expand(m.relation.cachedPlan)
      case other => other +: other.children.flatMap(expand)
    }
    val nodes = expand(plan)
    def render(p: SparkPlan): String = p.simpleStringWithNodeId()
    nodes.flatMap {
      case c: CartesianProductExec =>
        Some(Finding("cartesian-product", render(c)))
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition
          && !isGlobalPartialAgg(e.child) =>
        Some(Finding("single-partition-exchange", render(e)))
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Some(Finding("unpartitioned-window", render(w)))
      case o: ObjectHashAggregateExec =>
        Some(Finding("object-hash-aggregate", render(o)))
      case _ => None
    }
  }
}
