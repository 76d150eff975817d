package graft

import graft.functions.expressions.FloatVectorDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions: exposes graft's custom Catalyst expressions to SQL.
  *
  * Usage:
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * spark.sql("SELECT graft_dot(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * Registered functions:
  *  - `graft_dot(array<float|double>, array<float|double>) -> double` —
  *    native codegen'd dot product (see [[graft.functions.expressions.FloatVectorDot]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.graftDot)
  }
}

object GraftExtensions {
  private[graft] val graftDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[FloatVectorDot].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_dot expects exactly 2 arguments")
      FloatVectorDot(children.head, children(1))
    })
}
