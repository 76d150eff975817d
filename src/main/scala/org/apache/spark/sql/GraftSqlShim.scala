package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Expression <-> Column converters — the
  * supported way for a library to expose custom Catalyst expressions as
  * `Column`s on Spark 4 (the old public `new Column(expr)` constructor was
  * removed with the Connect-agnostic Column API).
  */
object GraftSqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A DataFrame over an arbitrary logical plan (`Dataset.ofRows` is
    * `private[sql]`) — used by planner strategies that expand a custom
    * logical node by rebuilding a DataFrame pipeline over its child.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register a table-valued function on an ALREADY-BUILT session — the
    * runtime twin of `SparkSessionExtensions.injectTableFunction`, for
    * sessions constructed without `spark.sql.extensions` (the session-state
    * registry is `private[sql]`, hence this bridge).
    */
  def registerTableFunction(
      spark: SparkSession,
      ident: FunctionIdentifier,
      info: ExpressionInfo,
      builder: Seq[Expression] => LogicalPlan): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry.registerFunction(ident, info, builder)
}
