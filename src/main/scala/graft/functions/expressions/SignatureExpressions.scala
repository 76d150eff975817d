package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row dedup signatures over a shingle array — MinHash and SimHash
  * computed INSIDE the scan projection (compose with
  * `graft_word_shingles`), instead of exploding one row per shingle and
  * funnelling the corpus through a 64-column (MinHash) / 62-column
  * (SimHash) aggregate. Signature generation is the all-rows stage of both
  * pipelines (verification only touches candidates), so at corpus scale
  * this removes the dominant shuffle; both folds are commutative
  * (min / sum), hence order-independent and bit-identical to the
  * relational aggregation the DuckDB oracles replay.
  *
  * Hash parity contracts (identical to `Dedup` and PipelineOracleSql):
  *  - base hash: `poly31(s) = fold (acc*31 + byte) mod 2147483647`;
  *  - MinHash permutation i: `(h*(2i + 1234567891) + (98176543i + 7))
  *    mod 2147483647` — h < 2^31 keeps the product inside a long;
  *  - SimHash 62-bit token hash: `poly31(s) + poly131(s) * 2^31` with
  *    `poly131` mod 2147483629; bit j of the signature is set iff
  *    `sum over shingles of (bit_j(h62) ? +1 : -1) >= 0`.
  *
  * Empty shingle array (doc shorter than the shingle width) returns NULL —
  * the relational pipeline has no group for such docs; callers filter.
  */
abstract class ShingleSignatureExpression extends UnaryExpression {
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input (the shingle array), " +
        s"got ${other.simpleString}")
  }

  @inline protected final def poly(bytes: Array[Byte], mult: Long, prime: Long): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * mult + (bytes(i) & 0xFF)) % prime
      i += 1
    }
    acc
  }
}

/** `graft_minhash_sig(shingles, numHashes)` -> array<bigint> of the
  * per-permutation minima.
  */
case class GraftMinhashSig(child: Expression, numHashes: Int) extends ShingleSignatureExpression {
  require(numHashes >= 1 && numHashes <= 512, "graft_minhash_sig: numHashes in [1, 512]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  def signature(a: ArrayData): GenericArrayData = {
    val n = a.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < n) {
      val h = poly(a.getUTF8String(s).getBytes, 31L, 2147483647L)
      var i = 0
      while (i < numHashes) {
        val p = (h * (2L * i + 1234567891L) + (98176543L * i + 7L)) % 2147483647L
        if (p < mins(i)) mins(i) = p
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any = signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftMinhashSig", this, classOf[GraftMinhashSig].getName)
    nullSafeCodeGen(ctx, ev, s => s"""
       |${ev.value} = $ref.signature($s);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_simhash_sig(shingles)` -> bigint 62-bit SimHash. */
case class GraftSimhashSig(child: Expression) extends ShingleSignatureExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash_sig"

  private val bits = 62

  def signature(a: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n == 0) return null
    val counts = new Array[Int](bits)
    var s = 0
    while (s < n) {
      val b = a.getUTF8String(s).getBytes
      val h = poly(b, 31L, 2147483647L) + poly(b, 131L, 2147483629L) * 2147483648L
      var j = 0
      while (j < bits) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      s += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) >= 0) sig |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override def nullSafeEval(input: Any): Any = signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSimhashSig", this, classOf[GraftSimhashSig].getName)
    nullSafeCodeGen(ctx, ev, s => s"""
       |java.lang.Long ${ev.value}_boxed = $ref.signature($s);
       |if (${ev.value}_boxed == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ${ev.value}_boxed.longValue(); }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignatureExpressions {
  /** `graft_minhash_sig(shingles, numHashes)` as a Column. */
  def minhashSigNative(shingles: Column, numHashes: Int): Column =
    GraftSqlShim.column(GraftMinhashSig(GraftSqlShim.expression(shingles), numHashes))

  /** `graft_simhash_sig(shingles)` as a Column. */
  def simhashSigNative(shingles: Column): Column =
    GraftSqlShim.column(GraftSimhashSig(GraftSqlShim.expression(shingles)))
}
