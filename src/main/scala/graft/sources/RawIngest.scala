package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Raw-dump ingestion: newline-delimited JSON (and its CSV twin) — the
  * interchange format every web-scale corpus actually arrives in (one
  * document object per line, usually gzip-compressed, millions of files).
  * The reference reads parquet only (SURVEY §2.7); a 100 TB curation run
  * starts one step earlier, at the raw dump, and this is that step.
  *
  * Scale contract (each clause is a deliberate 100 TB decision):
  *
  *  - '''The schema is declared, never inferred.''' Schema inference is a
  *    full extra pass over the corpus — at 100 TB that reads the data
  *    twice, and worse, it makes the parsed schema a function of the DATA
  *    (one rogue line widens a column for the whole run). The caller says
  *    what a record is; anything that doesn't parse as that is a corrupt
  *    record, not a schema vote.
  *  - '''A broken line never kills the job and never disappears.'''
  *    FAILFAST at scale turns one bad byte in file 3,194,201 into a dead
  *    1000-executor run; DROPMALFORMED silently shrinks the corpus with no
  *    audit trail. Every undecodable line lands in the quarantine output
  *    with its raw bytes and source file — countable, inspectable,
  *    re-processable.
  *  - '''One pass, scan-local.''' `text` read → `from_json`/`from_csv`
  *    projection; no shuffle, no action, both outputs are lazy views of
  *    the same scan (Catalyst prunes the split: the good branch never
  *    deserializes the corrupt column's copy of the raw line and vice
  *    versa). Compression (.gz/.zst) is handled by the text source;
  *    parallelism = #files for non-splittable codecs, so the many-small-
  *    files layout dumps ship in is exactly the right one.
  *
  * Corrupt detection is belt-and-braces: a line is quarantined when the
  * parsed struct is NULL (the parser gave up entirely — e.g. a JSON array
  * where an object was declared, in some Spark versions) OR when the
  * injected corrupt-record field is non-null (PERMISSIVE's contract in
  * Spark 4: the struct survives with the raw line in that field). A
  * well-formed record with MISSING declared fields is data (fields are
  * null), not corruption — dumps are ragged and field-level nullability
  * is the downstream filter's job.
  */
object RawIngest {

  /** The reserved corrupt-record field name injected into the parse
    * schema. Declared schemas must not use it.
    */
  val CorruptCol = "_graft_corrupt"

  /** Ingest a JSONL path. Returns `(good, quarantine)`:
    * `good` carries exactly the declared columns; `quarantine` carries
    * `(source_file, raw)` for every line that did not parse as one JSON
    * object of the declared shape.
    */
  def ingestJsonl(
      spark: SparkSession,
      path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val parsed = lines(spark, path).withColumn(
      "__rec",
      from_json(col("raw"), withCorrupt(schema),
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)))
    split(parsed, schema)
  }

  /** CSV twin of [[ingestJsonl]] — header-less delimited lines (a dump
    * with a header row should filter it upstream or quarantine it: a
    * header is exactly a line that fails to parse as data when the
    * declared schema has any non-string column).
    *
    * Line-based by design, like everything in this module: the raw scan
    * splits on newlines, which is what makes a 100 TB dump splittable
    * without coordination. The price is that an RFC-4180 record with a
    * newline INSIDE a quoted field is not supported — each physical
    * fragment fails the parse and lands in quarantine (visible, never
    * silently dropped). Corpora with embedded-newline text belong in
    * JSONL (where `\n` is escaped) — that is also what dumps actually
    * ship as.
    */
  def ingestCsv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      delimiter: String = ","): (DataFrame, DataFrame) = {
    val parsed = lines(spark, path).withColumn(
      "__rec",
      from_csv(col("raw"), withCorrupt(schema),
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol,
          // RFC 4180 doubled-quote escaping (what dumps actually use) —
          // Spark's default escape is backslash
          "delimiter" -> delimiter, "escape" -> "\"")))
    split(parsed, schema)
  }

  /** The raw line scan both parsers share: `(source_file, raw)`, one row
    * per input line, compression-transparent.
    *
    * Byte-accounting caveat (ADVICE r16): `raw` is the Hadoop line-reader
    * line — the record separator (`\n` or `\r\n`) is consumed and a
    * trailing `\r` is STRIPPED, so for CRLF dumps a `sum(length(raw))`
    * byte-mass audit counts one byte per line fewer than the on-disk mass
    * (and `length` is characters, not bytes, for non-ASCII). `raw` is
    * re-PARSEABLE (the JSON/CSV content is intact — `\r` is whitespace to
    * both parsers), which is the quarantine loop's contract; it is not a
    * bit-exact copy of the original line bytes.
    */
  def lines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(input_file_name().as("source_file"), col("value").as("raw"))

  /** STREAMING twin of [[ingestJsonl]]: a file-drop ingestion over
    * Structured Streaming's file source — new dump files landing under
    * `path` are discovered per micro-batch (`maxFilesPerTrigger` bounds a
    * batch), parsed with the same declared-schema/PERMISSIVE contract, and
    * emitted as ONE stream with an `is_quarantined` flag plus the
    * quarantine columns (`source_file`, `raw`).
    *
    * One stream, not two: splitting into separate good/quarantine sink
    * queries would run the file scan twice (each streaming query tracks
    * its own offsets and re-reads the source). The caller splits in its
    * sink — `foreachBatch { b => b.filter(!is_quarantined)...; b.filter(
    * is_quarantined)... }` — which reads each dump file exactly once, the
    * shape that matters when a batch is a few thousand multi-GB files.
    */
  def ingestJsonlStream(
      spark: SparkSession,
      path: String,
      schema: StructType,
      maxFilesPerTrigger: Int = 1000): DataFrame = {
    // the stream flattens declared fields NEXT TO the scan columns, so the
    // three injected names must stay unambiguous (batch ingest has no such
    // collision: its good side carries only declared names)
    val reserved = Seq("is_quarantined", "source_file", "raw")
    val clash = schema.fieldNames.filter(reserved.contains)
    require(clash.isEmpty,
      s"declared schema must not contain the stream-output column(s) ${clash.mkString(", ")}")
    val parsed = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(path)
      .select(input_file_name().as("source_file"), col("value").as("raw"))
      .withColumn(
        "__rec",
        from_json(col("raw"), withCorrupt(schema),
          Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)))
    val bad = col("__rec").isNull || col("__rec").getField(CorruptCol).isNotNull
    parsed.select(
      Seq(bad.as("is_quarantined"), col("source_file"), col("raw")) ++
        schema.fieldNames.map(f =>
          when(bad, lit(null)).otherwise(col("__rec").getField(f)).as(f)): _*)
  }

  /** The quarantine RE-PROCESSING loop (VERDICT r16 #6): quarantined rows
    * carry `(source_file, raw)` precisely so that a recoverable upstream
    * corruption — a BOM-prefixed shard, a log-line prefix, a wrong
    * delimiter — can be repaired WITHOUT re-reading the 100 TB dump: fix
    * `raw` (the caller's transform, e.g. strip the BOM), re-parse
    * quarantine-only through the identical declared-schema/PERMISSIVE
    * contract, and union the newly-good rows back into the corpus. Rows
    * that still fail come back in the second quarantine with their
    * provenance intact — the loop converges, nothing is ever dropped
    * silently.
    *
    * Input must carry `source_file` and `raw` (the quarantine shape);
    * returns `(good, stillQuarantined)` exactly like [[ingestJsonl]].
    */
  def reprocessQuarantine(
      quarantine: DataFrame,
      schema: StructType): (DataFrame, DataFrame) = {
    val parsed = quarantine.select(col("source_file"), col("raw")).withColumn(
      "__rec",
      from_json(col("raw"), withCorrupt(schema),
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)))
    split(parsed, schema)
  }

  private def withCorrupt(schema: StructType): StructType = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"declared schema must not contain the reserved column '$CorruptCol'")
    schema.add(CorruptCol, StringType)
  }

  private def split(parsed: DataFrame, schema: StructType): (DataFrame, DataFrame) = {
    // getField, not col("__rec.name"): a declared field whose NAME contains
    // a dot (legal in JSON) would otherwise parse as a nested path
    val bad = col("__rec").isNull || col("__rec").getField(CorruptCol).isNotNull
    val good = parsed.filter(!bad)
      .select(schema.fieldNames.map(f => col("__rec").getField(f).as(f)).toIndexedSeq: _*)
    val quarantine = parsed.filter(bad).select(col("source_file"), col("raw"))
    (good, quarantine)
  }
}
