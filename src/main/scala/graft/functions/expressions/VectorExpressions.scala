package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.types._

/** Native dot product of two numeric arrays as a codegen'd Catalyst
  * expression.
  *
  * Numerics contract (identical to `VectorFunctions.dot` and the DuckDB
  * oracle): every element widens to double BEFORE the multiply and the sum
  * is a sequential fold in index order — results are bit-identical to the
  * `zip_with` + `aggregate` formulation, just without materializing the
  * intermediate product array per row (the higher-order-function form
  * allocates an `ArrayData` of products for every pair, which is the hot
  * allocation in the ANN inner loop).
  *
  * Null contract, also matching the HOF form: length mismatch → NULL
  * (zip_with pads the shorter side with nulls, which nulls the sum) and any
  * NULL element → NULL (null product propagates through the fold).
  */
case class FloatVectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // NULL is produced for non-null inputs too (length mismatch, null element)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    // integral elements (int8-quantized vectors etc.) widen to double like
    // the float path; every product/sum of int8 dots is integer-valued and
    // < 2^53, so the double arithmetic stays exact
    case ArrayType(et @ (FloatType | DoubleType | ByteType | ShortType | IntegerType | LongType), _) =>
      Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double|integral> inputs, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  @inline private def get(a: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType => a.getFloat(i).toDouble
    case ByteType => a.getByte(i).toDouble
    case ShortType => a.getShort(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case _ => a.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += get(a, ta, i) * get(b, tb, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(v: String, et: DataType, i: String): String = et match {
      case FloatType => s"(double) $v.getFloat($i)"
      case ByteType => s"(double) $v.getByte($i)"
      case ShortType => s"(double) $v.getShort($i)"
      case IntegerType => s"(double) $v.getInt($i)"
      case LongType => s"(double) $v.getLong($i)"
      case _ => s"$v.getDouble($i)"
    }
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += ${getter(a, ta, i)} * ${getter(b, tb, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** `graft_dot(a, b)` as a Column. */
  def dotNative(a: Column, b: Column): Column =
    GraftSqlShim.column(FloatVectorDot(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
}
