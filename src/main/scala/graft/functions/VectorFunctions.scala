package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` columns via built-in higher-order
  * functions (`zip_with` + `aggregate` — codegen-friendly, no UDF).
  *
  * Numerics contract: every element is widened to double BEFORE multiply and
  * the sum is a sequential left fold in index order — the same operation
  * order as the DuckDB oracle (`list_sum(list_transform(...))`), so scores
  * are reproducible across engines.
  */
object VectorFunctions {

  /** Dot product as double — native codegen'd expression (no intermediate
    * product array per row); bit-identical to `dotHof`.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.expressions.VectorExpressions.dotNative(a, b)

  /** Dot product via built-in higher-order functions — same numerics, used
    * as a cross-check for the native expression.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm as double. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two vectors given their precomputed norms.
    * `try_divide` because Spark 4 ANSI throws DIVIDE_BY_ZERO for double
    * division too: a zero vector (undefined cosine) yields NULL — which
    * ranking windows order last — instead of killing the whole job.
    * Identical results for any corpus without zero vectors.
    */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    try_divide(dot(a, b), normA * normB)
}
