package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, LocalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Full-sweep PHYSICAL-PLAN lint — the automated twin of a human reading
  * `explain("formatted")` for every query: walks a plan (children +
  * subqueries, through AQE wrappers) and flags the three shapes that stop
  * scaling silently long before they stop working:
  *
  *  1. `cartesian-product` — any [[CartesianProductExec]]. Every join in
  *     this engine is an equi-join or a one-row broadcast; an |A|·|B|
  *     product is always a bug.
  *  2. `global-window` — a [[WindowExec]] with an EMPTY partitionSpec
  *     moves its whole input to one task. Allowed only when the window's
  *     input is provably bounded ([[bounded]]) — a limit, a grouping-free
  *     aggregate, or an aggregate grouping by exactly a whitelisted
  *     range-marker column ([[globalWindowWhitelist]]): today that is
  *     `__rng`, the hierarchical range-base frame
  *     (`Layout.hierarchicalRank`, `Sampling.shufflePosition`/
  *     `temperatureSample`, `Selection.prCurve`) — ≤1024 rows by
  *     construction of the range key (31-bit hash >> 21, z/hilbert
  *     value >> (width−10), or an integer-division step of
  *     (span div 1024) + 1), a bound PlanLintSpec pins with a property
  *     test, not prose.
  *  3. `single-partition-exchange` — a [[ShuffleExchangeExec]] to
  *     [[SinglePartition]] whose input is not provably bounded (a
  *     grouping-free aggregate = one row per task, an explicit limit, a
  *     group-limit heap, or a whitelisted range-base frame). An unbounded
  *     one means a corpus-sized stream into one task.
  *
  * Used by PlanLintSpec over EVERY `SparkEntry.queries` entry, so the next
  * operator that sneaks in a one-task stage fails CI, not a 100 TB run.
  */
object PlanLint {

  final case class Violation(rule: String, node: String) {
    override def toString: String = s"[$rule] $node"
  }

  /** Empty-partitionSpec windows are allowed iff the window child's output
    * contains one of these marker columns; the value documents the bound
    * the marker asserts.
    */
  val globalWindowWhitelist: Map[String, String] = Map(
    "__rng" -> ("hierarchical range-base frame (Layout.hierarchicalRank / " +
      "Sampling.shufflePosition / Selection.prCurve): <= 1024 rows by " +
      "construction of the range key"))

  /** Every node of `p`, through AQE wrappers and into expression
    * subqueries.
    */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
    case q: QueryStageExec        => nodes(q.plan)
    case other =>
      other +: (other.children.flatMap(nodes) ++ other.subqueries.flatMap(nodes))
  }

  /** Is this subtree's row count provably bounded (not corpus-sized)?
    *
    * COMPOSITIONAL, not existential: a node is bounded iff it caps rows
    * itself (a grouping-free aggregate, an explicit limit, a group-limit
    * heap, an aggregate grouping by EXACTLY a whitelisted ≤1024-range
    * marker) or ALL of its inputs are bounded. The earlier rule — "any
    * descendant anywhere is an aggregate/limit, or the output merely
    * CARRIES a `__rng` column" — let two regressions pass silently: a
    * corpus-sized frame that projects `__rng` alongside per-doc rows
    * (shufflePosition's tagged frame), and a join whose BROADCAST side has
    * the bounding aggregate while the probe side streams the corpus. Now
    * the marker only counts where it provably means "one row per range"
    * (the `groupBy(__rng)` base-frame aggregate itself), and boundedness
    * must hold on every path feeding the flagged operator.
    */
  private def bounded(p: SparkPlan): Boolean = p match {
    case a: AdaptiveSparkPlanExec => bounded(a.executedPlan)
    case q: QueryStageExec        => bounded(q.plan)
    case a: BaseAggregateExec =>
      a.groupingExpressions.isEmpty ||
        (a.groupingExpressions.size == 1 && a.groupingExpressions.forall(e =>
          globalWindowWhitelist.contains(e.name))) ||
        bounded(a.child)
    case _: LocalLimitExec | _: GlobalLimitExec | _: CollectLimitExec => true
    case _: TakeOrderedAndProjectExec => true
    case _: WindowGroupLimitExec      => true
    case leaf if leaf.children.isEmpty => false
    case other => other.children.forall(bounded)
  }

  def lintPlan(plan: SparkPlan): Seq[Violation] = nodes(plan).flatMap {
    case c: CartesianProductExec =>
      Some(Violation("cartesian-product", c.simpleStringWithNodeId()))
    case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) =>
      Some(Violation("global-window",
        s"unwhitelisted empty partitionSpec over ${w.child.nodeName} " +
          s"(child output: ${w.child.output.map(_.name).mkString(", ")})"))
    case e: ShuffleExchangeExec
        if e.outputPartitioning == SinglePartition && !bounded(e.child) =>
      Some(Violation("single-partition-exchange",
        s"unbounded input ${e.child.nodeName} " +
          s"(child output: ${e.child.output.map(_.name).mkString(", ")})"))
    case _ => None
  }

  def lint(df: DataFrame): Seq[Violation] =
    lintPlan(df.queryExecution.executedPlan)
}
