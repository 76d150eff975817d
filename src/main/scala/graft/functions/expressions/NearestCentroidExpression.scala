package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.types._

/** Native nearest-centroid argmax: the coarse-quantizer assignment of the
  * IVF family (`Similarity.ivfTopK`, `IvfIndex.write`) as ONE codegen'd
  * expression looping over the centroid matrix in compiled code.
  *
  * Replaces the unrolled `array_max(array(struct(cosine(v, lit(cv_j)), ...)))`
  * form, which is correct but degenerates once `nlist` grows: at nlist=64
  * the projection's generated method blows past the JIT/Janino budget and
  * the whole 64-branch argmax falls back to interpreted eval — measured
  * 34 s vs ~1 s for 100k x 64-dim rows. Here codegen emits a single
  * reference-object call (like [[HyperplaneSignature]]), so the projection
  * stays inside whole-stage codegen at any `nlist` and the inner loops are
  * plain JVM double arithmetic.
  *
  * Bit-equality contract with the unrolled form (pinned by PipelineSpec):
  *   - score_j = dot(v, cv_j) / (nrm * cnrm_j), elements widened to double
  *     before the multiply, sum folded in index order (same numerics as
  *     `graft_dot` and the DuckDB oracle);
  *   - `try_divide` semantics: a zero denominator nulls the branch score;
  *     a null element or length mismatch nulls it too;
  *   - argmax by (score DESC, cid ASC) under Spark's double ordering
  *     (NaN greatest, -0.0 == 0.0, nulls last) — ties and all-null rows
  *     resolve to the LOWEST cid, so the result is never null (which also
  *     means no isnotnull(cid) constraint can push the argmax into a scan
  *     filter and evaluate it twice).
  */
case class NearestCentroid(
    left: Expression,
    right: Expression,
    cids: Array[Long],
    cents: Array[Array[Double]],
    cnorms: Array[Double]) extends BinaryExpression {
  require(cids.nonEmpty && cids.length == cents.length && cids.length == cnorms.length,
    "graft_nearest_centroid: centroid arrays must be non-empty and same length")
  require(cids.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
    "graft_nearest_centroid: cids must be strictly ascending")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_nearest_centroid"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(et @ (FloatType | DoubleType | ByteType | ShortType | IntegerType | LongType), _) =>
      Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), right.dataType) match {
      case (Some(_), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<numeric> vector, double norm), " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  // hoisted element accessor switch: 0=float 1=double 2..5=integrals
  @transient private lazy val etCode: Int = elemType(left).get match {
    case FloatType => 0
    case DoubleType => 1
    case ByteType => 2
    case ShortType => 3
    case IntegerType => 4
    case LongType => 5
  }

  @inline private def get(a: ArrayData, i: Int): Double = etCode match {
    case 0 => a.getFloat(i).toDouble
    case 1 => a.getDouble(i)
    case 2 => a.getByte(i).toDouble
    case 3 => a.getShort(i).toDouble
    case 4 => a.getInt(i).toDouble
    case _ => a.getLong(i).toDouble
  }

  /** Shared by eval and codegen. `a == null` / `nrmNull` model null inputs:
    * they null every branch score, which resolves to the lowest cid exactly
    * like the unrolled struct-max (a null-scored struct is still a struct).
    */
  def assign(a: ArrayData, nrm: Double, nrmNull: Boolean): Long = {
    var bestNull = true
    var bestS = 0.0
    var bestCid = cids(0)
    var j = 0
    while (j < cids.length) {
      var sNull = a == null || nrmNull
      var s = 0.0
      if (!sNull) {
        val cv = cents(j)
        val n = a.numElements()
        if (n != cv.length) sNull = true
        else {
          var acc = 0.0
          var i = 0
          while (i < n && !sNull) {
            if (a.isNullAt(i)) sNull = true
            else { acc += get(a, i) * cv(i); i += 1 }
          }
          if (!sNull) {
            val denom = nrm * cnorms(j)
            if (denom == 0.0) sNull = true
            // + 0.0 canonicalizes -0.0 so Double.compare matches Spark's
            // double ordering (-0.0 == 0.0) as well as NaN-greatest
            else s = acc / denom + 0.0
          }
        }
      }
      if (!sNull && (bestNull || java.lang.Double.compare(s, bestS) > 0)) {
        bestNull = false
        bestS = s
        bestCid = cids(j)
      }
      j += 1
    }
    bestCid
  }

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    val nv = right.eval(input)
    assign(
      if (v == null) null else v.asInstanceOf[ArrayData],
      if (nv == null) 0.0 else nv.asInstanceOf[Double],
      nv == null)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val ref = ctx.addReferenceObj("graftNearestCentroid", this, classOf[NearestCentroid].getName)
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        long ${ev.value} = $ref.assign(
          ${l.isNull} ? null : ${l.value}, ${r.isNull} ? 0.0 : ${r.value}, ${r.isNull});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestCentroidExpression {
  /** `graft_nearest_centroid(vec, nrm)` over the collected coarse centroids
    * as a Column; `cents` in `Similarity.collectCentroids` order (cid asc).
    */
  def nearestCentroidNative(
      vec: Column,
      nrm: Column,
      cents: Array[(Long, Array[Double], Double)]): Column =
    GraftSqlShim.column(NearestCentroid(
      GraftSqlShim.expression(vec), GraftSqlShim.expression(nrm),
      cents.map(_._1), cents.map(_._2), cents.map(_._3)))
}
