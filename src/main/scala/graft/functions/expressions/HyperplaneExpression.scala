package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.types._

/** Native hyperplane-LSH signature: the `numPlanes` sign bits of an
  * embedding's dot products with the deterministic LCG hyperplanes, packed
  * into one long, as a codegen'd expression walking the vector ONCE per
  * plane.
  *
  * Replaces `numPlanes` separate `zip_with` + `aggregate` folds per row
  * (higher-order functions run interpreted — for 8 tables x 6 planes over a
  * 64-dim vector that is ~3k closure dispatches and 48 intermediate arrays
  * PER ROW, which made signature generation the dominant cost of the
  * bucketed ANN operators).
  *
  * Arithmetic is bit-identical to the HOF form (and the DuckDB oracle,
  * PipelineOracleSql): plane p's coefficient at dimension i is
  * `((p*1000003 + i) * 2654435761 + 12345) mod 10^6 / 1e6 - 0.5`; each
  * element widens to double before the multiply; the sum folds in index
  * order; bit j is set iff the dot with plane `planeBase + j` is > 0.
  * Null/empty contract also matches: a null element nulls every plane dot
  * (`when(d > 0, ...)` then takes the otherwise-branch on every bit), and
  * an empty vector dots to 0.0 — both yield signature 0.
  */
case class HyperplaneSignature(child: Expression, planeBase: Int, numPlanes: Int)
    extends UnaryExpression {
  require(numPlanes >= 1 && numPlanes <= 62, "graft_hyperplane_sig: numPlanes must be in [1, 62]")
  require(planeBase >= 0, "graft_hyperplane_sig: planeBase must be >= 0")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hyperplane_sig"

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${child.dataType.simpleString}")
  }

  /** Shared by eval and codegen (reference-object call keeps the projection
    * inside whole-stage codegen, like [[GraftWordShingles]]).
    */
  def signature(a: ArrayData): Long = {
    val isFloat = elemType.contains(FloatType)
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return 0L; i += 1 }
    var sig = 0L
    var j = 0
    while (j < numPlanes) {
      val p = (planeBase + j).toLong
      var acc = 0.0
      i = 0
      while (i < n) {
        val coef = (((p * 1000003L + i) * 2654435761L + 12345L) % 1000000L).toDouble / 1000000.0 - 0.5
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        acc += x * coef
        i += 1
      }
      if (acc > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any = signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftHyperplaneSig", this, classOf[HyperplaneSignature].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.signature($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneExpression {
  /** `graft_hyperplane_sig(vec, planeBase, numPlanes)` as a Column. */
  def hyperplaneSigNative(c: Column, planeBase: Int, numPlanes: Int): Column =
    GraftSqlShim.column(HyperplaneSignature(GraftSqlShim.expression(c), planeBase, numPlanes))
}
