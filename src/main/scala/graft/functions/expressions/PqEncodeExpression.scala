package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.types._

/** Native product-quantization encoder: split the vector into
  * `codebook.length` contiguous subspaces and emit, per subspace, the index
  * of the L2-nearest codeword — the PQ code array (`IvfIndex.writePq`).
  * One codegen'd reference-object call, same rationale as [[NearestCentroid]]:
  * the unrolled per-codeword struct-min form blows the JIT budget at
  * M × ksub branches (the twin is retained for the bit-equality pin,
  * VectorExprSpec).
  *
  * Numerics contract (what the DuckDB oracle replays): elements widened to
  * double before arithmetic, squared-distance accumulated in index order,
  * argmin by (dist ASC, code ASC) under `java.lang.Double.compare`. A null
  * vector, length mismatch, or null element nulls every affected subspace's
  * scores, which resolves to code 0 — the output array is never null, so no
  * constraint pushdown can double-evaluate the encode.
  */
case class PqEncode(
    child: Expression,
    codebook: Array[Array[Array[Double]]]) extends UnaryExpression {
  require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
    "graft_pq_encode: codebook must have >= 1 subspace, each with >= 1 codeword")
  require(codebook.forall(_.length <= 128),
    "graft_pq_encode: at most 128 codewords per subspace (codes are bytes)")

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_pq_encode"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    elemType(child) match {
      case Some(_) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float|double> vector, got ${child.dataType.simpleString}")
    }

  @transient private lazy val isFloat: Boolean = elemType(child).contains(FloatType)
  @transient private lazy val dims: Int = codebook.map(_.head.length).sum

  @inline private def get(a: ArrayData, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Shared by eval and codegen. */
  def encode(a: ArrayData): ArrayData = {
    val m = codebook.length
    val out = new Array[Byte](m)
    val ok = a != null && a.numElements() == dims
    var lo = 0
    var s = 0
    while (s < m) {
      val words = codebook(s)
      val dsub = words.head.length
      var bestNull = true
      var bestD = 0.0
      var bestJ = 0
      if (ok) {
        var j = 0
        while (j < words.length) {
          val w = words(j)
          var dNull = false
          var acc = 0.0
          var i = 0
          while (i < dsub && !dNull) {
            if (a.isNullAt(lo + i)) dNull = true
            else {
              val d = get(a, lo + i) - w(i)
              acc += d * d
              i += 1
            }
          }
          if (!dNull && (bestNull || java.lang.Double.compare(acc, bestD) < 0)) {
            bestNull = false
            bestD = acc
            bestJ = j
          }
          j += 1
        }
      }
      out(s) = bestJ.toByte
      lo += dsub
      s += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    encode(if (v == null) null else v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("graftPqEncode", this, classOf[PqEncode].getName)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.encode(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodeExpression {
  /** `graft_pq_encode(vec)` over a driver-resident codebook
    * (`[subspace][codeword][dim]`) as a Column.
    */
  def pqEncodeNative(vec: Column, codebook: Array[Array[Array[Double]]]): Column =
    GraftSqlShim.column(PqEncode(GraftSqlShim.expression(vec), codebook))
}
