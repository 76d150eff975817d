package graft

import graft.functions.expressions.{NfcNormalize, StringExpressions}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization: the native NFC expression and the
  * TextAnalysis.normalize pass built on it.
  */
class NormalizeSpec extends SparkTestBase {

  import spark.implicits._

  private val udfTwin = udf((s: String) =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))

  test("graft_nfc composes canonically and is bit-equal to the JDK twin") {
    val fixtures = Seq(
      "Café",            // combining acute -> precomposed é
      "Café",             // already NFC: unchanged
      "가",          // Hangul jamo -> syllable 가
      "Å",               // combining ring -> Å
      "Å",                // ANGSTROM SIGN -> NFC maps to Å (U+00C5)
      "plain ascii stays",     // fast path
      "",                      // empty
      "mixed Café and 가 tails")
    val df = fixtures.toDF("s")
    val got = df.select(StringExpressions.nfcNormalize(col("s"))).as[String].collect()
    val want = df.select(udfTwin(col("s"))).as[String].collect()
    assert(got.toSeq == want.toSeq)
    assert(got(0) == "Café" && got(2) == "가" && got(4) == "Å")
    // interpreted eval agrees with the codegen'd path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    fixtures.foreach { s =>
      assert(NfcNormalize(Literal(UTF8String.fromString(s), StringType)).eval(null) ==
        UTF8String.fromString(
          java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)))
    }
    assert(NfcNormalize(Literal(null, StringType)).eval(null) == null)
  }

  test("TextAnalysis.normalize: NFC + control strip + whitespace collapse") {
    val docs = Seq(
      (1L, "Café  du\t\tmonde \r\n"),
      (2L, "already clean"),
      (3L, "tabs\tand\nnewlines\rcollapse"),
      (4L, "ctl-only strip")).toDF("doc_id", "text")
    val got = TextAnalysis.normalize(docs).orderBy("doc_id").as[(Long, String)].collect()
    assert(got(0)._2 == "Café du monde")
    assert(got(1)._2 == "already clean")
    assert(got(2)._2 == "tabs and newlines collapse")
    assert(got(3)._2 == "ctl-only strip")
  }

  test("script profile: class counts and every dominant-script branch") {
    val docs = Seq(
      (1L, "hello world 123"), // latin + digits
      (2L, "汉字漢字文本"),      // cjk only
      (3L, "Русский текст"),   // cyrillic only
      (4L, "12345 !!!"),       // no letters at all
      (5L, "ab 汉字 Ру")       // 2/2/2 three-way tie: latin wins by order
    ).toDF("doc_id", "text")
    val got = TextAnalysis.scriptProfile(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long, String)].collect()
    assert(got(0) == ((1L, 15L, 10L, 0L, 0L, 3L, "latin")))
    assert(got(1) == ((2L, 6L, 0L, 6L, 0L, 0L, "cjk")))
    assert(got(2)._7 == "cyrillic" && got(2)._5 == 12L)
    assert(got(3)._7 == "none" && got(3)._6 == 5L)
    assert(got(4) == ((5L, 8L, 2L, 2L, 2L, 0L, "latin")))
  }

  test("graft_vec_microsum aggregate callable from SQL after registration") {
    val (ident, info, builder) = GraftExtensions.graftVecMicroSum
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("graft_vms_emb")
    val sql = spark.sql(
      """SELECT label, graft_vec_microsum(embedding) AS sx, count(1) AS n
        |FROM graft_vms_emb GROUP BY label ORDER BY label""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toSeq, r.getLong(2))).toSeq
    val api = spark.table("graft_vms_emb").groupBy(col("label"))
      .agg(graft.functions.expressions.VectorSumAgg.vectorMicroSum(col("embedding")).as("sx"),
        count(lit(1)).as("n"))
      .orderBy(col("label"))
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toSeq, r.getLong(2))).toSeq
    assert(sql.nonEmpty && sql == api, "SQL aggregate must equal the Column API")
  }

  test("graft_vec_microsum rejects non-finite elements loudly (no silent corruption)") {
    // NaN would quantize to 0 and Inf saturate to Long extremes — the
    // aggregate must fail like it does for nulls and length mismatches
    for (bad <- Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)) {
      val df = Seq((1, Seq(1.0, bad)), (1, Seq(2.0, 3.0))).toDF("g", "v")
      val e = intercept[Exception] {
        df.groupBy(col("g"))
          .agg(graft.functions.expressions.VectorSumAgg.vectorMicroSum(col("v")))
          .collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("non-finite")), s"for $bad: $e")
    }
  }

  test("graft_nfc callable from SQL after registration") {
    val (ident, info, builder) = GraftExtensions.graftNfc
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    // NB: Spark's chr() wraps mod 256 (DuckDB's is a real codepoint
    // constructor), so the decomposed input comes in via a view
    val decomposed = "Cafe" + new String(Character.toChars(0x0301))
    Seq(decomposed).toDF("raw").createOrReplaceTempView("graft_nfc_in")
    val r = spark.sql("SELECT graft_nfc(raw) AS s FROM graft_nfc_in").as[String].head()
    assert(r == "Café")
  }
}
