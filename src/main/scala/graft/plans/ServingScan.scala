package graft.plans

import graft.operators.{IvfIndex, TextIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeSet, Expression, NamedExpression, PlanExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Logical placeholders for the SERVING table-valued functions
  * (`graft_bm25`, `graft_ann`): each carries the probe parameters and the
  * probe's output — the standard ranking columns PLUS the metadata columns
  * the index build persisted (write's `keepCols`) — so Catalyst can reason
  * about the probe as a unit.
  *
  * The point of the placeholder is [[ServingFilterPushdown]]: an outer
  * `WHERE` on a metadata column becomes the probe's serving predicate —
  * `WHERE lang = 'en'` over `graft_bm25(...)` returns k FILTERED results
  * (filtered search: serving restricted at the pruned list/bucket scan,
  * corpus statistics unmoved), not the post-rank remnant of an unfiltered
  * top-k. This is the documented semantics of the serving TVFs — the SQL
  * twin of passing `filter_sql` — and the capability a plain
  * post-`Filter` cannot express (it under-fills k). Conjuncts that touch
  * non-metadata columns (rank, score, ids) keep ordinary post-filter
  * semantics and stay above the node.
  *
  * The serving predicate travels as SQL TEXT (`predicateSql`), not as an
  * expression tree: the probe resolves it against its own relation (whose
  * attribute ids don't exist yet at optimization time), and a plan node
  * holding unresolved expressions would break `resolved` invariants.
  * Planned by [[ServingScanStrategy]], which expands the node into the
  * real probe pipeline after optimization and re-aliases the expansion to
  * the node's attribute ids.
  */
case class Bm25ScanNode(
    path: String,
    terms: Seq[String],
    k: Int,
    k1: Double,
    b: Double,
    predicateSql: Option[String],
    metaCols: Seq[String],
    override val output: Seq[Attribute],
    // MEMOIZING probe factory (built by the TVF builder): maps a serving
    // predicate to the analyzed probe plan, constructing each distinct
    // probe exactly ONCE. Probe construction pays index-metadata IO plus
    // a Spark job, and the planner invokes the strategy several times per
    // query (measured 5x) — an unmemoized rebuild multiplied that cost;
    // the lazy single-build also means a pushed WHERE never pays for the
    // unfiltered probe it replaces. Not a child: rules treat the probe as
    // opaque, and pushdown copies share the factory.
    probeFor: Option[String] => LogicalPlan) extends LeafNode {
  override def producedAttributes: AttributeSet = AttributeSet(output)
  // LeafNode's default computeStats THROWS — any stats-consuming rule
  // (join-size estimation when the TVF output is joined, e.g. the
  // semi-join a subquery WHERE rewrites to) would fail the query. The
  // probe returns at most k rows; estimate from the output schema.
  override def computeStats(): logical.Statistics = logical.Statistics(
    sizeInBytes = BigInt(k.max(1)) * output.map(_.dataType.defaultSize).sum.max(8))
}

/** The vector twin of [[Bm25ScanNode]]: `child` is the query relation
  * (vec_id, embedding); the probe consumes it wholesale.
  */
case class AnnScanNode(
    path: String,
    k: Int,
    nprobe: Int,
    predicateSql: Option[String],
    metaCols: Seq[String],
    // the index build's rung ("float" | "sq8" | "pq") — the TVF builder
    // auto-detects it (IvfIndex.kindOf) and the strategy dispatches the
    // matching probe on reconstruction
    kind: String,
    override val output: Seq[Attribute],
    probeFor: Option[String] => LogicalPlan,
    child: LogicalPlan) extends UnaryNode {
  // the probe consumes the query relation wholesale — without this,
  // ColumnPruning would see zero referenced attributes and prune the
  // child to nothing
  override def references: AttributeSet = child.outputSet
  override def producedAttributes: AttributeSet = AttributeSet(output)
  override protected def withNewChildInternal(newChild: LogicalPlan): AnnScanNode =
    copy(child = newChild)
}

/** Push metadata-only predicates through the serving nodes into the probe:
  * `Filter(lang = 'en', Bm25Scan(...))` becomes
  * `Bm25Scan(..., predicate = lang = 'en')` — a FILTERED probe returning k
  * matching results with the predicate applied directly above the pruned
  * postings/list scan (it lands in the parquet `PushedFilters`). Mixed
  * conjunctions split: only deterministic conjuncts referencing metadata
  * columns exclusively move; the rest stay above as ordinary post-filters.
  */
object ServingFilterPushdown extends Rule[LogicalPlan] with PredicateHelper {

  private def metaAttrs(output: Seq[Attribute], metaCols: Seq[String]): AttributeSet =
    AttributeSet(output.filter(a => metaCols.contains(a.name)))

  /** (pushedSql, remaining): metadata-only deterministic conjuncts as one
    * re-parseable SQL string, AND-combined with any existing predicate.
    */
  private def split(
      cond: Expression,
      existing: Option[String],
      meta: AttributeSet): Option[(Option[String], Seq[Expression])] = {
    if (meta.isEmpty) return None
    // the pushed predicate travels as SQL TEXT (Expression.sql) and is
    // re-parsed at planning time — subquery conjuncts (IN (SELECT ...),
    // EXISTS) pass the deterministic/references checks but their .sql form
    // is a plan placeholder that does not re-parse, so they must stay
    // above the node as ordinary post-filters
    val (pushable, rest) = splitConjunctivePredicates(cond).partition(c =>
      c.deterministic && c.references.nonEmpty && c.references.subsetOf(meta) &&
        c.find(_.isInstanceOf[PlanExpression[_]]).isEmpty)
    if (pushable.isEmpty) None
    else {
      val pushedSql = pushable.map(p => s"(${p.sql})").mkString(" AND ")
      val combined = existing match {
        case Some(e) => s"($e) AND ($pushedSql)"
        case None => pushedSql
      }
      Some((Some(combined), rest))
    }
  }

  private def rebuildFilter(rest: Seq[Expression], node: LogicalPlan): LogicalPlan =
    if (rest.isEmpty) node else Filter(rest.reduce(And(_, _)), node)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, n: Bm25ScanNode) =>
      split(cond, n.predicateSql, metaAttrs(n.output, n.metaCols)) match {
        case Some((pushed, rest)) => rebuildFilter(rest, n.copy(predicateSql = pushed))
        case None => f
      }
    case f @ Filter(cond, n: AnnScanNode) =>
      split(cond, n.predicateSql, metaAttrs(n.output, n.metaCols)) match {
        case Some((pushed, rest)) => rebuildFilter(rest, n.copy(predicateSql = pushed))
        case None => f
      }
  }
}

/** Expand the serving nodes into the real probe pipelines at planning time
  * (after optimization, so the pushed serving predicate is in place), and
  * re-alias the expansion to each node's attribute ids so the parent
  * plan's references stay valid.
  */
class ServingScanStrategy extends SparkStrategy {

  private def aliased(output: Seq[Attribute], expanded: LogicalPlan): LogicalPlan = {
    require(output.length == expanded.output.length,
      s"serving node declared ${output.length} columns, probe produced " +
        s"${expanded.output.length}: ${expanded.output.map(_.name)}")
    Project(
      output.zip(expanded.output).map { case (o, e) =>
        // the node's output is declared WITHOUT building the probe; if a
        // declared type ever drifts from the probe's (e.g. int vs long
        // rank), a cast keeps the parent plan's bindings valid
        val v: Expression =
          if (e.dataType == o.dataType) e
          else org.apache.spark.sql.catalyst.expressions.Cast(e, o.dataType)
        Alias(v, o.name)(exprId = o.exprId): NamedExpression
      },
      expanded)
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: Bm25ScanNode =>
      val spark = SparkSession.active
      val optimized = org.apache.spark.sql.GraftSqlShim
        .ofRows(spark, n.probeFor(n.predicateSql))
        .queryExecution.optimizedPlan
      Seq(planLater(aliased(n.output, optimized)))
    case n: AnnScanNode =>
      val spark = SparkSession.active
      val optimized = org.apache.spark.sql.GraftSqlShim
        .ofRows(spark, n.probeFor(n.predicateSql))
        .queryExecution.optimizedPlan
      Seq(planLater(aliased(n.output, optimized)))
    case _ => Nil
  }
}

object ServingScan {
  /** The ANN probe for an index rung — shared by the TVF builder and the
    * strategy so both dispatch identically.
    */
  private[graft] def annProbe(
      spark: SparkSession,
      path: String,
      queries: org.apache.spark.sql.DataFrame,
      k: Int,
      nprobe: Int,
      kind: String,
      predicate: Option[org.apache.spark.sql.Column],
      metaCols: Seq[String]): org.apache.spark.sql.DataFrame = kind match {
    case "sq8" => IvfIndex.probeQuantized(spark, path, queries, k, nprobe,
      predicate = predicate, metaCols = metaCols)
    case "pq" => IvfIndex.probePq(spark, path, queries, k, nprobe,
      predicate = predicate, metaCols = metaCols)
    case _ => IvfIndex.probe(spark, path, queries, k, nprobe,
      predicate = predicate, metaCols = metaCols)
  }
}
