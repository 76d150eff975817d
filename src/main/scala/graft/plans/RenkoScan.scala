package graft.plans

import graft.operators.{Renko, RenkoModes}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeSet, Cast, Expression, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.StringType

/** Logical placeholder for a multi-series renko scan over `child` (the
  * tick relation): carries the scan parameters and the post-mode-projection
  * output, and exists so Catalyst can reason about the scan as a UNIT
  * instead of an opaque repartition→sort→mapPartitions pipeline.
  * Specifically, the renko fold processes each series independently, so a
  * predicate on the OUTPUT `symbol` column commutes with the whole scan —
  * [[RenkoSymbolPushdown]] moves it to the tick side (where Catalyst's own
  * pushdown carries it into the source scan), and the bricks of the
  * surviving series are bit-identical to filtering after the scan, while
  * the ticks of every other series are never shuffled, sorted, or folded.
  *
  * Planned by [[RenkoScanStrategy]], which expands the node into the real
  * execution pipeline AFTER optimization (so it sees the pushed-down tick
  * plan) and re-aliases the expansion to this node's attribute ids.
  */
case class RenkoScanNode(
    brick: Double,
    mode: String,
    symbolCol: String,
    tsUnit: String,
    override val output: Seq[Attribute],
    child: LogicalPlan) extends UnaryNode {

  // the scan consumes the tick relation wholesale (the engine selects the
  // columns it needs itself) — without this, ColumnPruning would see zero
  // referenced attributes and prune the child to nothing
  override def references: AttributeSet = child.outputSet

  // the brick attributes originate HERE, not in the child — declare them
  // produced so plan-validity checks never report them as missing input
  override def producedAttributes: AttributeSet = AttributeSet(output)

  override protected def withNewChildInternal(newChild: LogicalPlan): RenkoScanNode =
    copy(child = newChild)
}

/** Push symbol-only predicates through [[RenkoScanNode]] to the tick side:
  * `Filter(symbol = 'X', RenkoScan(ticks))` becomes
  * `RenkoScan(Filter(cast(tickSymbol as string) = 'X', ticks))` — the same
  * cast the scan itself applies when deriving the output symbol, so the
  * rewrite is exact for any input type (and for string symbol columns
  * SimplifyCasts erases it, letting the predicate reach the parquet scan
  * as a pushed filter). Mixed conjunctions split: only the symbol-only
  * deterministic conjuncts move, the rest stay above the scan.
  */
object RenkoSymbolPushdown extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(cond, r: RenkoScanNode) =>
      val symOut = r.output.find(_.name == "symbol")
      val tickSym = r.child.output.find(_.name == r.symbolCol)
      (symOut, tickSym) match {
        case (Some(so), Some(ts)) =>
          val (pushable, rest) = splitConjunctivePredicates(cond).partition(c =>
            c.deterministic && c.references.subsetOf(AttributeSet(so)))
          if (pushable.isEmpty) Filter(cond, r)
          else {
            val remapped = pushable.map(_.transform {
              case a: Attribute if a.exprId == so.exprId =>
                if (ts.dataType == StringType) ts else Cast(ts, StringType)
            }).reduce((a, b) => org.apache.spark.sql.catalyst.expressions.And(a, b))
            val pushed = r.copy(child = Filter(remapped, r.child))
            if (rest.isEmpty) pushed
            else Filter(rest.reduce((a, b) =>
              org.apache.spark.sql.catalyst.expressions.And(a, b)), pushed)
          }
        case _ => Filter(cond, r)
      }
  }
}

/** Expand [[RenkoScanNode]] into the real scan pipeline at planning time:
  * rebuild `Renko.fromTicks` + mode projection over the node's (optimized,
  * possibly symbol-filtered) tick child, optimize that subtree, and
  * re-alias its output to the node's attribute ids so the parent plan's
  * references stay valid.
  */
class RenkoScanStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case r: RenkoScanNode =>
      val spark = SparkSession.active
      val ticks = org.apache.spark.sql.GraftSqlShim.ofRows(spark, r.child)
      val projected = RenkoModes.project(
        Renko.fromTicks(ticks, r.brick, symbolCol = Some(r.symbolCol), tsUnit = r.tsUnit),
        r.mode)
      val expanded = projected.queryExecution.optimizedPlan
      val aliased = Project(
        r.output.zip(expanded.output).map { case (o, e) =>
          Alias(e, o.name)(exprId = o.exprId): NamedExpression
        },
        expanded)
      Seq(planLater(aliased))
    case _ => Nil
  }
}
