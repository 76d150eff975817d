package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.types._

/** `graft_quantize(vec)` -> struct(scale double, qvec array<tinyint>):
  * symmetric int8 scalar quantization in ONE walk per row — the hot scan
  * stage of the quantized-ANN path ([[graft.operators.Similarity.quantize]]).
  *
  * Numerics contract (identical to the built-in-function twin
  * `Similarity.quantizeHof` and the DuckDB oracle):
  * `scale = max(|x_i|) / 127` (1.0 for an all-zero vector — max over
  * double-widened floats, float→double widening is exact), element
  * `q_i = clamp(floor(x_i / scale + 0.5), -127, 127)` — floor(+0.5)
  * half-up, the rounding both engines agree on.
  *
  * The higher-order-function form costs TWO interpreted walks per row at
  * best (array_max + transform) and O(d^2) at worst (a lambda referencing
  * the scale expression re-evaluates it per element — HOFs are
  * CodegenFallback with no CSE); this expression is one virtual call per
  * ROW from generated code.
  *
  * Null contract: NULL input → NULL; a NULL element → NULL (quantized
  * vectors are dense); empty array → (NULL scale, empty qvec), matching
  * the HOF result shape.
  */
case class GraftQuantize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = true),
    StructField("qvec", ArrayType(ByteType, containsNull = false), nullable = false)))
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quantize"

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${child.dataType.simpleString}")
  }

  def quantized(a: ArrayData): InternalRow = {
    val isFloat = elemType.contains(FloatType)
    val n = a.numElements()
    if (n == 0) return new GenericInternalRow(Array[Any](null, new GenericArrayData(Array.empty[Byte])))
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val ax = math.abs(x)
      if (ax > maxabs) maxabs = ax
      i += 1
    }
    val scale = if (maxabs == 0.0) 1.0 else maxabs / 127.0
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      var q = math.floor(x / scale + 0.5).toLong
      if (q > 127L) q = 127L
      if (q < -127L) q = -127L
      out(i) = q.toByte
      i += 1
    }
    new GenericInternalRow(Array[Any](scale, new GenericArrayData(out)))
  }

  override def nullSafeEval(input: Any): Any = quantized(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftQuantize", this, classOf[GraftQuantize].getName)
    nullSafeCodeGen(ctx, ev, s => s"""
       |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.quantized($s);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeExpression {
  /** `graft_quantize(vec)` as a Column. */
  def quantizeNative(vec: Column): Column =
    GraftSqlShim.column(GraftQuantize(GraftSqlShim.expression(vec)))
}
