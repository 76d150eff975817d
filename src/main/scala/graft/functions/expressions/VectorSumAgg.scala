package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native elementwise vector-sum aggregate over micro-quantized elements:
  * each input array's element `x` contributes `floor(x * 1e6 + 0.5)` as a
  * LONG, summed per index into one `array<bigint>` per group — the
  * repo's exact-integer scaled-sum idiom ([[graft.operators.Clustering]])
  * as a single-pass custom Catalyst aggregate.
  *
  * Why it exists: the composed formulation (`posexplode` → hash aggregate
  * on (group, pos) → `collect_list` + `array_sort` reassembly) shuffles
  * `rows × dim` exploded elements and re-packs arrays from structs; this
  * aggregate keeps each partition's partial sums in ONE `Array[Long]`
  * buffer per group (map-side combine of whole vectors), shuffling
  * `groups × dim` longs only. Integer addition is order-independent, so
  * the result is bit-identical to the exploded twin — and to the DuckDB
  * oracle — under any partitioning.
  *
  * Null contract: null arrays contribute nothing; a group with no
  * non-null input aggregates to null. Element nulls are rejected (the
  * embedding contract), and mismatched lengths within a group throw
  * rather than mis-sum.
  */
case class VectorMicroSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_vec_microsum"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input, got ${child.dataType.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val isFloat = elemType.contains(FloatType)
    val buf =
      if (buffer.length == 0) new Array[Long](n)
      else {
        require(buffer.length == n,
          s"$prettyName: vector length $n differs from the group's ${buffer.length}")
        buffer
      }
    var i = 0
    while (i < n) {
      require(!a.isNullAt(i), s"$prettyName: null element at index $i")
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      // NaN would micro-quantize to 0 and +/-Inf saturate to Long extremes,
      // silently corrupting the group sum — fail loudly like null/length do.
      require(java.lang.Double.isFinite(x),
        s"$prettyName: non-finite element $x at index $i")
      buf(i) += math.floor(x * 1e6 + 0.5).toLong
      i += 1
    }
    buf
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.length == 0) return buffer
    if (buffer.length == 0) return other
    require(buffer.length == other.length,
      s"$prettyName: merging buffers of lengths ${buffer.length} and ${other.length}")
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMicroSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMicroSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorMicroSum =
    copy(child = newChild)
}

object VectorSumAgg {
  /** `graft_vec_microsum(v)` as an aggregating Column. */
  def vectorMicroSum(c: Column): Column =
    GraftSqlShim.column(
      VectorMicroSum(GraftSqlShim.expression(c)).toAggregateExpression())
}
