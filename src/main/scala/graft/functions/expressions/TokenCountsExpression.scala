package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document term frequencies: `array<struct<term, tf, dl>>` —
  * one entry per DISTINCT token of the document (first-occurrence order),
  * `tf` its occurrence count, `dl` the document's total token count
  * (identical across the array; it rides each entry so a single
  * `explode` yields complete posting rows with no second pass and no
  * struct-field re-evaluation hazard).
  *
  * Replaces the `explode(tokens(text))` → `groupBy(doc_id, dl, term)` →
  * `count() AS tf` formulation of the inverted-index build
  * ([[graft.operators.TextIndex]]): the group key contains the row's own
  * `doc_id`, so that aggregation is PER-DOCUMENT by construction — paying
  * a cluster-wide exchange (plus a second exchange to re-cluster by
  * bucket for the partitioned write) for scan-local work. With term
  * counting fused into the scan, the index build keeps exactly ONE
  * exchange: the bucket repartition the layout genuinely needs. At corpus
  * scale that halves the build's shuffle-byte volume and removes a full
  * stage; the shuffled rows are also already tf-compacted (one row per
  * distinct (doc, term), never one per token occurrence).
  *
  * EXACT equivalence contract with the groupBy formulation
  * (equivalence-tested in TokenCountsSpec, including whitespace edges):
  * tokens are `split(trim(text), "\s+")` with Spark's limit=-1 semantics
  * — ASCII-space trim at both ends; a leading separator yields an empty
  * first token, a trailing separator an empty last token; an empty string
  * yields ONE empty token (so `dl` is never 0 for a non-null string);
  * `tf` sums occurrences of byte-identical tokens; `dl` equals
  * `size(tokens(text))`. A null document yields null (the caller's
  * `explode` drops it, exactly as `explode` of a null token array does).
  */
case class GraftTokenCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false),
      StructField("dl", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_token_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** One-pass tokenize + count over raw UTF8 bytes (shared by eval and
    * codegen via reference-object call, same pattern as
    * [[GraftWordShingles]] — the surrounding projection stays in
    * whole-stage codegen).
    */
  def tokenCounts(s: UTF8String): GenericArrayData = {
    val all = s.getBytes
    // trim(text): ASCII space only, matching Spark's trim()
    var lo = 0
    var hi = all.length
    while (lo < hi && all(lo) == ' ') lo += 1
    while (hi > lo && all(hi - 1) == ' ') hi -= 1
    // first-occurrence-ordered counts with split(_, "\s+", -1) semantics
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var dl = 0L
    @inline def add(st: Int, en: Int): Unit = {
      dl += 1L
      val u = UTF8String.fromBytes(all, st, en - st)
      val c = counts.get(u)
      if (c == null) counts.put(u, Array(1L)) else c(0) += 1L
    }
    var i = lo
    if (lo == hi || isWs(all(lo))) add(lo, lo) // leading empty token
    while (i < hi) {
      if (isWs(all(i))) i += 1
      else {
        val st = i
        while (i < hi && !isWs(all(i))) i += 1
        add(st, i)
      }
    }
    if (lo < hi && isWs(all(hi - 1))) add(hi, hi) // trailing empty token
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(e.getKey, e.getValue()(0), dl)
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    tokenCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftTokenCounts", this, classOf[GraftTokenCounts].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.tokenCounts($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCountsExpression {
  /** `graft_token_counts(s)` as a Column. */
  def tokenCountsNative(c: Column): Column =
    GraftSqlShim.column(GraftTokenCounts(GraftSqlShim.expression(c)))
}
