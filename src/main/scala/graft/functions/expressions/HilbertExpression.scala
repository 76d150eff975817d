package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `graft_hilbert2(qx, qy)` → the Hilbert-curve index of a quantized 2-D
  * point — the stronger locality sibling of the Morton interleave
  * ([[graft.operators.Layout.interleave2]]): consecutive Hilbert indices
  * are ALWAYS 4-adjacent cells (Morton jumps across the plane at power-of-
  * two boundaries), so contiguous file ranges have tighter 2-D spans and a
  * box predicate prunes at least as well (HilbertSpec measures both).
  *
  * Why a native expression and not composed Columns: the classic
  * per-bit fold (Lam & Shapiro's xy→d) REWRITES x and y each step —
  * rotation state threading — so a Column-composition of `bits` steps
  * doubles the expression tree per step (x′ and y′ each reference both x
  * and y). The imperative loop below is one virtual call per row from
  * whole-stage-generated code, same shape as [[GraftQuantize]].
  *
  * Numerics contract (the DuckDB oracle replays it exactly with a packed
  * (x, y, d) `list_reduce` fold): inputs are `bits`-bit quantized
  * non-negative longs (clamped by [[graft.operators.Layout.quantize]]);
  * for s = 2^(bits−1) … 1: rx = (x & s) > 0, ry = (y & s) > 0,
  * d += s²·((3·rx) ⊕ ry), then the quadrant rotation (ry = 0: reflect
  * x,y to (n−1−x, n−1−y) when rx = 1 — n the FULL grid side 2^bits, the
  * canonical form that keeps intermediates in [0, n) — then swap x ↔ y).
  * Pure integer arithmetic — engine-exact; HilbertSpec pins bijectivity
  * and the every-step-adjacent walk exhaustively at bits = 4.
  *
  * Null contract: NULL in → NULL out (nullIntolerant).
  */
case class GraftHilbert2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hilbert2"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got (${l.simpleString}, ${r.simpleString})")
    }

  def hilbert(qx: Long, qy: Long): Long = {
    val n = 1L << bits
    var x = qx
    var y = qy
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = n - 1L - x
          y = n - 1L - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override def nullSafeEval(input1: Any, input2: Any): Any =
    hilbert(input1.asInstanceOf[Long], input2.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftHilbert", this, classOf[GraftHilbert2].getName)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $ref.hilbert($x, $y);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertExpression {
  /** `graft_hilbert2(qx, qy)` as a Column over `bits`-bit quantized dims. */
  def hilbert2Native(qx: Column, qy: Column, bits: Int): Column =
    GraftSqlShim.column(GraftHilbert2(
      GraftSqlShim.expression(qx), GraftSqlShim.expression(qy), bits))
}
