package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MOSS-style winnowing (public literature: Schleimer/Wilkerson/Aiken,
  * SIGMOD'03): the sorted distinct fingerprints of a document as ONE
  * codegen'd expression walking the string's bytes — `array<bigint>` out,
  * zero shuffle.
  *
  * Replaces a relational formulation (kept as a cross-check in
  * `TextAnalysis.winnowedFingerprintPairsRelational`) that exploded one row
  * per character position and ran two windows partitioned by doc — a shuffle
  * of O(total corpus characters) rows for what is a purely local O(len)
  * streaming computation per document. At corpus scale that shuffle IS the
  * job; this expression keeps winnowing inside the scan stage.
  *
  * Arithmetic is bit-identical to the relational form (and the DuckDB
  * oracle): k-gram hash at 1-based position i is
  * `(sum_j byte[i+j] * 31^j) mod 2147483647` — bytes, matching `ascii()` on
  * the ASCII corpus contract (see [[PolyHash]]); fingerprint at window
  * position w is `min(kh[w .. w+window-1])`; a document shorter than
  * `k + window - 1` characters has no fingerprints (empty array).
  *
  * Cites reference semantics: this operator is beyond-reference scope
  * (training-data pipeline family), no renkodf counterpart.
  */
case class GraftWinnow(child: Expression, k: Int, window: Int) extends UnaryExpression {
  require(k >= 1, "graft_winnow: k must be >= 1")
  require(window >= 1, "graft_winnow: window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_winnow"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  // 31^j coefficients, same silent-wrap behavior as the relational form's
  // Iterator.iterate(1L)(_ * 31L) for large k (documented ASCII/k contract)
  private lazy val coefs: Array[Long] = Iterator.iterate(1L)(_ * 31L).take(k).toArray

  /** Shared by eval and the oracle-SQL generator tests. */
  private[graft] def winnow(bytes: Array[Byte]): Array[Long] = {
    val n = bytes.length - k + 1
    if (n < window) return Array.emptyLongArray
    val kh = new Array[Long](n)
    var i = 0
    while (i < n) {
      var acc = 0L
      var j = 0
      while (j < k) { acc += (bytes(i + j) & 0xFF).toLong * coefs(j); j += 1 }
      kh(i) = acc % 2147483647L
      i += 1
    }
    val mins = new Array[Long](n - window + 1)
    var w = 0
    while (w < mins.length) {
      var m = kh(w)
      var j = 1
      while (j < window) { if (kh(w + j) < m) m = kh(w + j); j += 1 }
      mins(w) = m
      w += 1
    }
    java.util.Arrays.sort(mins)
    var uniq = 1
    var r = 1
    while (r < mins.length) {
      if (mins(r) != mins(r - 1)) { mins(uniq) = mins(r); uniq += 1 }
      r += 1
    }
    java.util.Arrays.copyOf(mins, uniq)
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(winnow(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val cf = ctx.addReferenceObj("coefs", coefs, "long[]")
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val kh = ctx.freshName("kh")
      val mins = ctx.freshName("mins")
      val acc = ctx.freshName("acc")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val w = ctx.freshName("w")
      val r = ctx.freshName("r")
      val uniq = ctx.freshName("uniq")
      val res = ctx.freshName("res")
      s"""
         |byte[] $bytes = $s.getBytes();
         |int $n = $bytes.length - $k + 1;
         |long[] $res;
         |if ($n < $window) {
         |  $res = new long[0];
         |} else {
         |  long[] $kh = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $acc = 0L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      $acc += (long)($bytes[$i + $j] & 0xFF) * $cf[$j];
         |    }
         |    $kh[$i] = $acc % 2147483647L;
         |  }
         |  long[] $mins = new long[$n - $window + 1];
         |  for (int $w = 0; $w < $mins.length; $w++) {
         |    long $m = $kh[$w];
         |    for (int $j = 1; $j < $window; $j++) {
         |      if ($kh[$w + $j] < $m) $m = $kh[$w + $j];
         |    }
         |    $mins[$w] = $m;
         |  }
         |  java.util.Arrays.sort($mins);
         |  int $uniq = 1;
         |  for (int $r = 1; $r < $mins.length; $r++) {
         |    if ($mins[$r] != $mins[$r - 1]) { $mins[$uniq] = $mins[$r]; $uniq++; }
         |  }
         |  $res = java.util.Arrays.copyOf($mins, $uniq);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowExpression {
  /** `graft_winnow(s, k, window)` as a Column. */
  def winnowNative(c: Column, k: Int, window: Int): Column =
    GraftSqlShim.column(GraftWinnow(GraftSqlShim.expression(c), k, window))
}
