package graft

import graft.sources.RawIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw JSONL/CSV dump ingestion (graft.sources.RawIngest): declared-schema
  * parse, corrupt-line quarantine with file provenance, byte-exact text
  * round-trip through JSON escaping, compression transparency, and the
  * no-inference/no-action plan contract.
  */
class RawIngestSpec extends SparkTestBase {

  private val schema = new StructType()
    .add("id", LongType)
    .add("text", StringType)

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_rawingest_$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def writeLines(dir: String, name: String, lines: Seq[String]): Unit = {
    val p = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.write(p,
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  test("good/quarantine split: malformed and wrong-shape lines are quarantined with provenance, ragged records are data") {
    val dir = tmpDir("split")
    writeLines(dir, "a.jsonl", Seq(
      """{"id": 1, "text": "alpha"}""",
      """{"id": 2, "text": "beta""",   // truncated: malformed
      """[1, 2, 3]""",                  // wrong shape: array, not object
      """{"id": 4}"""))                 // ragged: missing text -> data, null field
    writeLines(dir, "b.jsonl", Seq(
      """{"id": 5, "text": "gamma"}""",
      """not json at all"""))
    val (good, quar) = RawIngest.ingestJsonl(spark, dir, schema)
    val g = good.orderBy(col("id")).collect()
    assert(g.map(r => (r.get(0), r.get(1))).toSeq ===
      Seq((1L, "alpha"), (4L, null), (5L, "gamma")))
    val q = quar.orderBy(col("raw")).collect()
    // exact quarantine membership (pins Spark 4's behavior: an array where
    // an object was declared quarantines, it does not parse as all-null)
    assert(q.length === 3)
    val raws = q.map(_.getString(1)).toSet
    assert(raws === Set(
      """{"id": 2, "text": "beta""", "[1, 2, 3]", "not json at all"))
    // provenance: every quarantined row names its real source file
    assert(q.forall(r => r.getString(0).nonEmpty))
    assert(q.exists(_.getString(0).endsWith("a.jsonl")))
    assert(q.exists(_.getString(0).endsWith("b.jsonl")))
  }

  test("text round-trips byte-exactly through JSON escaping (newlines, tabs, quotes, backslashes, CJK, emoji)") {
    val nasty = Seq(
      "line1\nline2\r\nline3",
      "tab\there \"quoted\" and \\backslash\\",
      "汉字漢字 Русский é́",
      "emoji 😀 end",
      "")
    import spark.implicits._
    val src = nasty.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val dir = tmpDir("escape")
    src.coalesce(1)
      .select(to_json(struct(col("id"), col("text"))).as("value"))
      .write.mode("overwrite").text(dir + "/out")
    val (good, quar) = RawIngest.ingestJsonl(spark, dir + "/out", schema)
    assert(quar.count() === 0L)
    val back = good.orderBy(col("id")).collect().map(_.getString(1)).toSeq
    assert(back === nasty)
  }

  test("gzip-compressed dumps are transparent to the same path") {
    import spark.implicits._
    val src = (0L until 100L).map(i => (i, s"doc $i")).toDF("id", "text")
    val dir = tmpDir("gz")
    src.repartition(3)
      .select(to_json(struct(col("id"), col("text"))).as("value"))
      .write.mode("overwrite").option("compression", "gzip").text(dir + "/out")
    val gz = new java.io.File(dir + "/out").listFiles()
      .count(_.getName.endsWith(".gz"))
    assert(gz === 3, "fixture must actually be gzip files")
    val (good, quar) = RawIngest.ingestJsonl(spark, dir + "/out", schema)
    assert(quar.count() === 0L)
    assert(good.count() === 100L)
    assert(good.agg(sum(col("id"))).head.getLong(0) === 4950L)
  }

  test("extra undeclared fields are ignored (declared schema wins; no inference vote)") {
    val dir = tmpDir("extra")
    writeLines(dir, "a.jsonl", Seq(
      """{"id": 1, "text": "a", "bonus": {"deep": [1,2]}, "other": 9.5}"""))
    val (good, quar) = RawIngest.ingestJsonl(spark, dir, schema)
    assert(quar.count() === 0L)
    assert(good.columns.toSeq === Seq("id", "text"))
    assert(good.head.getLong(0) === 1L)
  }

  test("a declared field name containing a dot resolves as a FIELD, not a nested path") {
    val dir = tmpDir("dotted")
    writeLines(dir, "a.jsonl", Seq("""{"id": 1, "meta.lang": "en"}"""))
    val dotted = new StructType().add("id", LongType).add("meta.lang", StringType)
    val (good, quar) = RawIngest.ingestJsonl(spark, dir, dotted)
    assert(quar.count() === 0L)
    val r = good.head
    assert(r.getLong(0) === 1L && r.getString(1) === "en")
  }

  test("reserved corrupt column in the declared schema is rejected loudly") {
    val bad = schema.add(RawIngest.CorruptCol, StringType)
    val e = intercept[IllegalArgumentException] {
      RawIngest.ingestJsonl(spark, tmpDir("reserved"), bad)
    }
    assert(e.getMessage.contains(RawIngest.CorruptCol))
  }

  test("streaming twin rejects declared fields that collide with its output columns") {
    for (name <- Seq("raw", "source_file", "is_quarantined")) {
      val bad = schema.add(name, StringType)
      val e = intercept[IllegalArgumentException] {
        RawIngest.ingestJsonlStream(spark, tmpDir("clash"), bad)
      }
      assert(e.getMessage.contains(name))
    }
    // batch ingest has no such collision: its good side carries only the
    // declared names, so a field named "raw" is fine there
    val dir = tmpDir("rawfield")
    writeLines(dir, "a.jsonl", Seq("""{"id": 1, "raw": "r"}"""))
    val rawSchema = new StructType().add("id", LongType).add("raw", StringType)
    val (good, quar) = RawIngest.ingestJsonl(spark, dir, rawSchema)
    assert(quar.count() === 0L && good.head.getString(1) === "r")
  }

  test("blank lines quarantine (auditable, never silently dropped) and an empty dump yields empty outputs") {
    val dir = tmpDir("blank")
    // a blank interior line is undecodable and must surface in quarantine,
    // not vanish; a CRLF-ending line is TOLERATED (trailing \r is JSON
    // whitespace to the parser), so dumps with Windows line endings ingest
    // cleanly instead of quarantining wholesale
    writeLines(dir, "a.jsonl", Seq(
      """{"id": 1, "text": "a"}""",
      "",
      """{"id": 2, "text": "b"}""" + "\r"))
    val (good, quar) = RawIngest.ingestJsonl(spark, dir, schema)
    assert(good.orderBy(col("id")).collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
    val raws = quar.collect().map(_.getString(1)).toSet
    assert(raws === Set(""))

    val empty = tmpDir("empty")
    writeLines(empty, "a.jsonl", Seq(""))
    val (g2, q2) = RawIngest.ingestJsonl(spark, empty, schema)
    assert(g2.count() === 0L && q2.count() <= 1L)
  }

  test("reprocessQuarantine: a repaired recoverable corruption re-admits; unrecoverable rows keep provenance") {
    val dir = tmpDir("reproc")
    // BOM-prefixed lines: the classic recoverable dump corruption (shards
    // concatenated with their U+FEFF prefixes intact) — the parser rejects
    // them, the repair is a one-character strip of `raw`
    writeLines(dir, "a.jsonl", Seq(
      """{"id": 1, "text": "a"}""",
      "﻿" + """{"id": 2, "text": "b"}""",
      """{"id": 3, "text"""))  // truncated: NOT recoverable by the BOM fix
    val (good, quar) = RawIngest.ingestJsonl(spark, dir, schema)
    assert(good.collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(quar.count() === 2L, "BOM line and truncated line both quarantine")
    // upstream fix: strip the BOM, re-parse QUARANTINE-ONLY (never the dump)
    val repaired = quar.withColumn("raw",
      regexp_replace(col("raw"), "^﻿", ""))
    val (fixedGood, still) = RawIngest.reprocessQuarantine(repaired, schema)
    assert(fixedGood.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((2L, "b")))
    val s = still.collect()
    assert(s.length === 1 && s.head.getString(1).startsWith("""{"id": 3"""))
    assert(s.head.getString(0).endsWith("a.jsonl"), "still-bad rows keep file provenance")
    // the merged corpus equals the uncorrupted ideal
    assert(good.unionByName(fixedGood).orderBy(col("id"))
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("CSV twin: delimiter, quarantine, and quoted-field round-trip") {
    val dir = tmpDir("csv")
    writeLines(dir, "a.csv", Seq(
      """1,"alpha, with comma"""",
      """2,plain""",
      """not-a-number,oops""",   // id fails the LongType parse -> quarantine
      """3,"quote "" inside""""))
    val (good, quar) = RawIngest.ingestCsv(spark, dir, schema)
    val g = good.orderBy(col("id")).collect()
    assert(g.map(r => (r.getLong(0), r.getString(1))).toSeq === Seq(
      (1L, "alpha, with comma"), (2L, "plain"), (3L, "quote \" inside")))
    val q = quar.collect()
    assert(q.length === 1 && q.head.getString(1).startsWith("not-a-number"))
  }

  test("streaming twin: file-drop ingestion discovers late files, splits once in the sink, and resumes from its checkpoint") {
    val root = tmpDir("stream")
    val srcDir = new java.io.File(root, "src"); srcDir.mkdirs()
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
    val goodOut = new java.io.File(root, "good").getAbsolutePath
    val quarOut = new java.io.File(root, "quar").getAbsolutePath

    def runOnce(): Unit = {
      val q = RawIngest.ingestJsonlStream(spark, srcDir.toString, schema)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          // ONE source read, split in the sink — the scale shape
          b.persist()
          b.filter(!col("is_quarantined")).select(col("id"), col("text"))
            .write.mode("append").parquet(goodOut)
          b.filter(col("is_quarantined")).select(col("source_file"), col("raw"))
            .write.mode("append").parquet(quarOut)
          b.unpersist(); ()
        }
        .start()
      q.awaitTermination()
    }

    writeLines(srcDir.toString, "drop1.jsonl", Seq(
      """{"id": 1, "text": "a"}""",
      """broken {""",
      """{"id": 2, "text": "b"}"""))
    runOnce()
    assert(spark.read.parquet(goodOut).count() === 2L)
    assert(spark.read.parquet(quarOut).count() === 1L)

    // a late dump file lands; the resumed query ingests ONLY it
    writeLines(srcDir.toString, "drop2.jsonl", Seq(
      """{"id": 3, "text": "c"}""",
      """also broken"""))
    runOnce()
    val good = spark.read.parquet(goodOut)
    assert(good.count() === 3L, "no re-ingest of drop1, no miss of drop2")
    assert(good.agg(sum(col("id"))).head.getLong(0) === 6L)
    val quar = spark.read.parquet(quarOut).collect()
    assert(quar.length === 2)
    assert(quar.exists(r => r.getString(1) === "also broken" &&
      r.getString(0).endsWith("drop2.jsonl")))
  }

  test("plan contract: building the split is action-free, and the good side reads only the text scan (one job to materialize)") {
    val dir = tmpDir("plan")
    writeLines(dir, "a.jsonl",
      (0 until 50).map(i => s"""{"id": $i, "text": "t$i"}"""))
    var built: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = null
    val buildJobs = countJobs { built = RawIngest.ingestJsonl(spark, dir, schema) }
    assert(buildJobs === 0, s"ingest build must launch no Spark jobs, saw $buildJobs")
    val (good, _) = built
    val plan = good.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"good side must be scan-local, got:\n$plan")
  }
}
