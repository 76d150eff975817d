package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial string hash: left fold `acc = (acc*mult + byte) mod
  * prime` over the string's bytes, as a codegen'd Catalyst expression.
  *
  * Bit-identical to the higher-order-function form in
  * `TextFunctions.polyHash` (fold over `ascii()` of each character) for
  * ASCII input — the corpus contract here (verified: max codepoint 121 at
  * every scale factor). The HOF form materializes a char-array per string
  * (`split` + `transform`), which is the hot allocation in the MinHash
  * signature stage; this expression walks the UTF8String bytes in place.
  *
  * The fold value stays in [0, prime), so the arithmetic never overflows a
  * long for prime < 2^32 — no ANSI-mode wrap-around, and the same fold is
  * expressible in ANSI SQL (`list_reduce` over codepoints in DuckDB), which
  * is what makes every operator built on this hash oracle-checkable.
  */
case class PolyHash(child: Expression, mult: Long, prime: Long) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_polyhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * mult + (bytes(i) & 0xFF)) % prime
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * ${mult}L + ($bytes[$i] & 0xFF)) % ${prime}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization (canonical decomposition + canonical
  * composition, UAX #15) as a codegen'd Catalyst expression — the text
  * canonicalization pass a multi-source ingest runs before any hashing or
  * dedup, so that `Cafe` + U+0301 and the precomposed `Café` fingerprint
  * identically regardless of which scraper produced them.
  *
  * Spark has no built-in normalizer; the JDK's `java.text.Normalizer`
  * implements the same Unicode standard DuckDB's `nfc_normalize` does,
  * which is what keeps the operator oracle-checkable. Already-normalized
  * strings (the overwhelming hot path — all ASCII is NFC) return the
  * input UTF8String unchanged after an O(n) quick check, with no String
  * round-trip allocation.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  /** Shared by eval and codegen (reference-object call keeps the
    * projection inside whole-stage codegen, like [[PolyHash]]).
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override def nullSafeEval(input: Any): Any =
    normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftNfc", this, classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.normalize($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringExpressions {
  /** `graft_polyhash(s)` as a Column. */
  def polyHashNative(c: Column, mult: Long, prime: Long): Column =
    GraftSqlShim.column(PolyHash(GraftSqlShim.expression(c), mult, prime))

  /** `graft_nfc(s)` as a Column. */
  def nfcNormalize(c: Column): Column =
    GraftSqlShim.column(NfcNormalize(GraftSqlShim.expression(c)))
}
