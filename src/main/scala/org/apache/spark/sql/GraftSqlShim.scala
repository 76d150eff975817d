package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Expression <-> Column converters — the
  * supported way for a library to expose custom Catalyst expressions as
  * `Column`s on Spark 4 (the old public `new Column(expr)` constructor was
  * removed with the Connect-agnostic Column API).
  */
object GraftSqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
