package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-n-gram shingles: `array<string>` of the document's
  * n-gram shingle strings in ONE walk over the UTF8 bytes, as a codegen'd
  * Catalyst expression.
  *
  * Replaces the built-in-function formulation
  * (`TextFunctions.wordShingles`: split + n shifted slices + arrays_zip +
  * transform/concat_ws + array_distinct), which has two structural costs
  * the optimizer cannot remove:
  *  - higher-order functions are CodegenFallback, so the whole shingle
  *    projection runs interpreted with per-element closure dispatch and no
  *    common-subexpression elimination — the tokenization is re-evaluated
  *    once per slice reference unless call sites hand-project it first;
  *  - it materializes the token array, n slice arrays, a zip-struct array
  *    and the pre-distinct gram array per row before the distinct set.
  * This expression finds token boundaries in place, materializes each gram
  * string exactly once, and dedupes with a hash set. The shingle stage is
  * the hot scan stage of every corpus-dedup operator (MinHash, SimHash,
  * Jaccard, decontamination), which at 100 TB is worth keeping inside
  * whole-stage codegen.
  *
  * EXACT equivalence contract with `wordShingles` (equivalence-tested,
  * including whitespace edge cases): tokens are
  * `split(trim(text), "\s+")` — ASCII-space trim at both ends, then split
  * on runs of Java `\s` = `[ \t\n\x0B\f\r]` with Spark's limit=-1
  * semantics (a leading separator yields an empty first token, a trailing
  * separator an empty last token, and an empty string yields one empty
  * token); grams join n consecutive tokens with a single space; distinct
  * keeps first-occurrence order (array_distinct semantics). Documents with
  * fewer than n tokens yield an empty array.
  */
case class GraftWordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "graft_word_shingles: n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** One-pass shingling over raw UTF8 bytes (shared by eval and codegen via
    * reference-object call — the loop body is a single JIT-compiled method,
    * which keeps the surrounding projection in whole-stage codegen).
    */
  def shingles(s: UTF8String): GenericArrayData = {
    val all = s.getBytes
    // trim(text): ASCII space only, matching Spark's trim()
    var lo = 0
    var hi = all.length
    while (lo < hi && all(lo) == ' ') lo += 1
    while (hi > lo && all(hi - 1) == ' ') hi -= 1
    // token boundaries with split(_, "\s+", -1) semantics
    val starts = new java.util.ArrayList[Integer]
    val ends = new java.util.ArrayList[Integer]
    var i = lo
    if (lo == hi || isWs(all(lo))) { starts.add(lo); ends.add(lo) } // leading empty token
    while (i < hi) {
      if (isWs(all(i))) i += 1
      else {
        val st = i
        while (i < hi && !isWs(all(i))) i += 1
        starts.add(st); ends.add(i)
      }
    }
    if (lo < hi && isWs(all(hi - 1))) { starts.add(hi); ends.add(hi) } // trailing empty token
    val ntok = starts.size()
    if (ntok < n) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[UTF8String](ntok - n + 1)
    val seen = new java.util.HashSet[UTF8String]()
    var t = 0
    while (t <= ntok - n) {
      var len = n - 1 // the joining spaces
      var j = 0
      while (j < n) { len += ends.get(t + j) - starts.get(t + j); j += 1 }
      val g = new Array[Byte](len)
      var pos = 0
      j = 0
      while (j < n) {
        val st = starts.get(t + j); val en = ends.get(t + j)
        System.arraycopy(all, st, g, pos, en - st)
        pos += en - st
        if (j < n - 1) { g(pos) = ' '; pos += 1 }
        j += 1
      }
      val u = UTF8String.fromBytes(g)
      if (seen.add(u)) out.add(u)
      t += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())).asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(input: Any): Any =
    shingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftWordShingles", this, classOf[GraftWordShingles].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.shingles($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleExpression {
  /** `graft_word_shingles(s, n)` as a Column. */
  def wordShinglesNative(c: Column, n: Int): Column =
    GraftSqlShim.column(GraftWordShingles(GraftSqlShim.expression(c), n))
}
