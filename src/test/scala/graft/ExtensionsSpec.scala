package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

/** SQL-surface registration of graft's custom expressions. */
class ExtensionsSpec extends SparkTestBase {

  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(s.plan)
      case r: org.apache.spark.sql.execution.ReusedSubqueryExec => Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(allNodes)
  }

  test("graft_dot callable from SQL after registration") {
    // same builder triple the SparkSessionExtensions path injects
    val (ident, info, builder) = GraftExtensions.graftDot
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    val r = spark.sql(
      """SELECT a.vec_id, graft_dot(a.embedding, b.embedding) AS dot
        |FROM emb a JOIN emb b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 5 ORDER BY a.vec_id""".stripMargin).collect()
    assert(r.length == 5)
    // cross-check against the Column API on one row
    val direct = spark.table("emb").as("a")
      .join(spark.table("emb").as("b"), col("b.vec_id") === col("a.vec_id") + 1)
      .filter(col("a.vec_id") === 0)
      .select(graft.functions.VectorFunctions.dot(col("a.embedding"), col("b.embedding")))
      .collect()(0).getDouble(0)
    assert(r(0).getDouble(1) == direct)
  }

  test("GraftExtensions wires into SparkSessionExtensions") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext) // must register without throwing
  }

  test("graft_renko table-valued function: full scan + mode view from SQL") {
    val (ti, tinfo, tbuilder) = GraftExtensions.graftRenko
    spark.sessionState.tableFunctionRegistry.registerFunction(ti, tinfo, tbuilder)
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .selectExpr("ts AS datetime", "value AS close")
      .createOrReplaceTempView("graft_tvf_ticks")
    val viaSql = spark.sql(
      "SELECT * FROM graft_renko('graft_tvf_ticks', 25.0, 'wicks', '', 'ns')")
      .orderBy(col("datetime"), (col("close") * col("direction")).asc)
      .collect()
    val viaApi = graft.operators.RenkoModes.project(
        graft.operators.Renko.fromTicks(spark.table("graft_tvf_ticks"), 25.0, tsUnit = "ns"),
        "wicks")
      .orderBy(col("datetime"), (col("close") * col("direction")).asc)
      .collect()
    assert(viaSql.nonEmpty && viaSql.length == viaApi.length)
    viaSql.zip(viaApi).foreach { case (a, b) => assert(a == b) }
    // composable as a relation: aggregation over the TVF output
    val agg = spark.sql(
      "SELECT count(*) AS n, sum(volume) AS v FROM graft_renko('graft_tvf_ticks', 25.0, 'normal', '', 'ns')")
      .collect()(0)
    assert(agg.getLong(0) == viaApi.length)
    // SQL TABLE() argument form: same relation, passed as a table arg
    // instead of a name literal
    val viaTableArg = spark.sql(
      "SELECT * FROM graft_renko(TABLE(graft_tvf_ticks), 25.0, 'wicks', '', 'ns')")
      .orderBy(col("datetime"), (col("close") * col("direction")).asc)
      .collect()
    assert(viaTableArg.length == viaApi.length)
    viaTableArg.zip(viaApi).foreach { case (a, b) => assert(a == b) }
  }

  test("renko TVF symbol pushdown: predicate reaches the tick scan, bricks bit-identical") {
    GraftExtensions.registerTvfs(spark)
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .selectExpr("event_type", "ts AS datetime", "value AS close")
      .createOrReplaceTempView("graft_pushdown_ticks")
    val sql = spark.sql(
      """SELECT * FROM graft_renko('graft_pushdown_ticks', 25.0, 'wicks', 'event_type', 'ns')
        |WHERE symbol = 'click'""".stripMargin)
      .orderBy(col("datetime"), (col("close") * col("direction")).asc)
    val viaApi = graft.operators.RenkoModes.project(
        graft.operators.Renko.fromTicks(spark.table("graft_pushdown_ticks"), 25.0,
          symbolCol = Some("event_type"), tsUnit = "ns"),
        "wicks")
      .filter(col("symbol") === "click")
      .orderBy(col("datetime"), (col("close") * col("direction")).asc)
      .collect()
    val got = sql.collect()
    assert(got.nonEmpty && got.length == viaApi.length,
      s"pushdown result size ${got.length} vs ${viaApi.length}")
    got.zip(viaApi).foreach { case (a, b) => assert(a == b) }
    // the predicate really reached the parquet scan: the events scan
    // carries an event_type pushed filter (filtering BEFORE the shuffle
    // and the stateful fold, not after)
    val scans = allNodes(sql.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("events")) => s
    }
    assert(scans.nonEmpty &&
      scans.forall(_.metadata.get("PushedFilters").exists(_.contains("event_type"))),
      s"symbol predicate must reach the tick scan as a pushed filter:\n${scans.mkString("\n")}")
    // mixed conjunction: only the symbol conjunct moves, the rest filters bricks
    val mixed = spark.sql(
      """SELECT * FROM graft_renko('graft_pushdown_ticks', 25.0, 'wicks', 'event_type', 'ns')
        |WHERE symbol = 'click' AND volume > 2""".stripMargin).collect()
    val mixedApi = viaApi.filter(r => r.getLong(r.fieldIndex("volume")) > 2)
    assert(mixed.toSet == mixedApi.toSet, "mixed conjunction must stay exact")
  }

  test("graft_bm25 / graft_ann serving TVFs: SQL probes == API probes bit-exactly") {
    GraftExtensions.registerTvfs(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val lexPath = java.nio.file.Files.createTempDirectory("graft-tvf-lex").toString
    val ivfPath = java.nio.file.Files.createTempDirectory("graft-tvf-ivf").toString
    graft.operators.TextIndex.write(docs, lexPath)
    graft.operators.IvfIndex.write(emb, ivfPath, nlist = 16)
    val bmSql = spark.sql(
      s"SELECT * FROM graft_bm25('$lexPath', 'dup,vector', 10) ORDER BY rank").collect().toSeq
    val bmApi = graft.operators.TextIndex.bm25TopK(spark, lexPath, Seq("dup", "vector"), 10)
      .orderBy(col("rank")).collect().toSeq
    assert(bmSql.nonEmpty && bmSql == bmApi, "graft_bm25 must equal the API probe")
    emb.filter(col("vec_id") < 3).createOrReplaceTempView("graft_tvf_q")
    val annSql = spark.sql(
      s"SELECT * FROM graft_ann('$ivfPath', 'graft_tvf_q', 4, 4) ORDER BY query_id, rank")
      .collect().toSeq
    val annApi = graft.operators.IvfIndex
      .probe(spark, ivfPath, emb.filter(col("vec_id") < 3), 4, nprobe = 4)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(annSql.nonEmpty && annSql == annApi, "graft_ann must equal the API probe")
    // composable: an aggregate over the TVF relation
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_bm25('$lexPath', 'dup', 5)")
      .collect()(0).getLong(0) <= 5)
    // TABLE() argument form for the query relation
    val annTbl = spark.sql(
      s"SELECT * FROM graft_ann('$ivfPath', TABLE(graft_tvf_q), 4, 4) ORDER BY query_id, rank")
      .collect().toSeq
    assert(annTbl == annApi, "graft_ann(TABLE(...)) must equal the API probe")
  }

  test("serving TVFs: trailing filter_sql arg == API predicate (filtered search from SQL)") {
    GraftExtensions.registerTvfs(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val lexPath = java.nio.file.Files.createTempDirectory("graft-tvf-lexf").toString
    val ivfPath = java.nio.file.Files.createTempDirectory("graft-tvf-ivff").toString
    graft.operators.TextIndex.write(docs, lexPath, keepCols = Seq("lang"))
    graft.operators.IvfIndex.write(emb, ivfPath, nlist = 16, keepCols = Seq("label"))
    val bmSql = spark.sql(
      s"SELECT * FROM graft_bm25('$lexPath', 'dup,vector', 10, 'lang = ''en''') ORDER BY rank")
      .collect().toSeq
    // the TVF output carries the build's keepCols metadata, so the API
    // twin asks for the same passthrough
    val bmApi = graft.operators.TextIndex.bm25TopK(spark, lexPath, Seq("dup", "vector"), 10,
        predicate = Some(col("lang") === "en"), metaCols = Seq("lang"))
      .orderBy(col("rank")).collect().toSeq
    assert(bmSql.nonEmpty && bmSql == bmApi, "filtered graft_bm25 must equal the API probe")
    emb.filter(col("vec_id") < 3).createOrReplaceTempView("graft_tvf_qf")
    val annSql = spark.sql(
      s"SELECT * FROM graft_ann('$ivfPath', 'graft_tvf_qf', 4, 4, 'label = 1') " +
        "ORDER BY query_id, rank").collect().toSeq
    val annApi = graft.operators.IvfIndex
      .probe(spark, ivfPath, emb.filter(col("vec_id") < 3), 4, nprobe = 4,
        predicate = Some(col("label") === 1), metaCols = Seq("label"))
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(annSql.nonEmpty && annSql == annApi, "filtered graft_ann must equal the API probe")
    // empty filter string means unfiltered
    val bmOpen = spark.sql(
      s"SELECT * FROM graft_bm25('$lexPath', 'dup,vector', 10, '') ORDER BY rank").collect().toSeq
    val bmOpenApi = graft.operators.TextIndex.bm25TopK(spark, lexPath, Seq("dup", "vector"), 10,
        metaCols = Seq("lang"))
      .orderBy(col("rank")).collect().toSeq
    assert(bmOpen == bmOpenApi, "empty filter_sql must mean unfiltered")
  }

  test("serving TVF WHERE pushdown: metadata WHERE becomes a filtered probe, reaches the scan") {
    GraftExtensions.registerTvfs(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val lexPath = java.nio.file.Files.createTempDirectory("graft-tvf-lexw").toString
    val ivfPath = java.nio.file.Files.createTempDirectory("graft-tvf-ivfw").toString
    graft.operators.TextIndex.write(docs, lexPath, keepCols = Seq("lang"))
    graft.operators.IvfIndex.write(emb, ivfPath, nlist = 16, keepCols = Seq("label"))

    // WHERE on a metadata column == the filter_sql probe: k FILTERED
    // results (serving restricted at the scan), not a post-rank remnant
    val bmWhere = spark.sql(
      s"""SELECT doc_id, rank, bm25 FROM graft_bm25('$lexPath', 'dup,vector', 10)
         |WHERE lang = 'en' ORDER BY rank""".stripMargin)
    val bmApi = graft.operators.TextIndex.bm25TopK(spark, lexPath, Seq("dup", "vector"), 10,
        predicate = Some(col("lang") === "en"))
      .orderBy(col("rank")).collect().toSeq
    assert(bmApi.size == 10, "the filtered probe must fill k (sf0.001 has >10 en docs)")
    assert(bmWhere.collect().toSeq == bmApi,
      "WHERE on metadata must serve k filtered results, bit-equal to the filter_sql probe")
    // the predicate lands in the postings scan's PushedFilters
    val bmScans = allNodes(bmWhere.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("graft-tvf-lexw")) => s
    }
    // the SERVED scan carries the pushed predicate; the dfreq scan stays
    // unfiltered by design (corpus statistics are the full corpus's)
    assert(bmScans.nonEmpty &&
      bmScans.exists(_.metadata.get("PushedFilters").exists(_.contains("EqualTo(lang,en)"))),
      s"lang predicate must reach the postings scan:\n${bmScans.map(_.metadata.get("PushedFilters")).mkString("\n")}")

    // vector twin
    emb.filter(col("vec_id") < 3).createOrReplaceTempView("graft_tvf_qw")
    val annWhere = spark.sql(
      s"""SELECT query_id, rank, neighbor_id, cos_sim
         |FROM graft_ann('$ivfPath', 'graft_tvf_qw', 4, 4)
         |WHERE label = 1 ORDER BY query_id, rank""".stripMargin)
    val annApi = graft.operators.IvfIndex
      .probe(spark, ivfPath, emb.filter(col("vec_id") < 3), 4, nprobe = 4,
        predicate = Some(col("label") === 1))
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(annWhere.collect().toSeq == annApi,
      "WHERE on metadata must serve k filtered neighbors, bit-equal to the filter_sql probe")
    val annScans = allNodes(annWhere.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains("graft-tvf-ivfw")) => s
    }
    assert(annScans.nonEmpty &&
      annScans.exists(_.metadata.get("PushedFilters").exists(_.contains("EqualTo(label,1)"))),
      s"label predicate must reach the list scan:\n${annScans.map(_.metadata.get("PushedFilters")).mkString("\n")}")

    // mixed conjunction: the metadata conjunct becomes the probe filter,
    // the rank conjunct stays an ordinary post-filter
    val mixed = spark.sql(
      s"""SELECT doc_id, rank, bm25 FROM graft_bm25('$lexPath', 'dup,vector', 10)
         |WHERE lang = 'en' AND rank <= 3 ORDER BY rank""".stripMargin).collect().toSeq
    assert(mixed == bmApi.take(3), "mixed conjunction must post-filter the filtered top-k")

    // WHERE composes with an explicit filter_sql arg (AND semantics)
    val composed = spark.sql(
      s"""SELECT doc_id, rank, bm25
         |FROM graft_bm25('$lexPath', 'dup,vector', 10, 'lang IS NOT NULL')
         |WHERE lang = 'en' ORDER BY rank""".stripMargin).collect().toSeq
    assert(composed == bmApi, "pushed WHERE must AND with the filter_sql predicate")

    // metadata passthrough: SELECT * exposes the keepCols column and its
    // values are the documents' own
    val withMeta = spark.sql(
      s"SELECT * FROM graft_bm25('$lexPath', 'dup,vector', 5)").collect()
    val langOf = docs.select(col("doc_id").cast("long"), col("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(withMeta.nonEmpty && withMeta.forall(r =>
      r.getString(r.fieldIndex("lang")) == langOf(r.getLong(r.fieldIndex("doc_id")))),
      "TVF metadata columns must carry each served doc's own values")
  }

  test("graft_ann auto-dispatches on the index rung; WHERE pushdown composes with SQ8") {
    GraftExtensions.registerTvfs(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 3)
    queries.createOrReplaceTempView("graft_tvf_qd")
    // SQ8 build: the TVF must serve through probeQuantized
    val sq8Path = java.nio.file.Files.createTempDirectory("graft-tvf-sq8d").toString
    graft.operators.IvfIndex.writeQuantized(emb, sq8Path, nlist = 16,
      keepCols = Seq("label"))
    val sq8Sql = spark.sql(
      s"SELECT query_id, rank, neighbor_id, cos_sim FROM graft_ann('$sq8Path', 'graft_tvf_qd', 4, 4) " +
        "ORDER BY query_id, rank").collect().toSeq
    val sq8Api = graft.operators.IvfIndex.probeQuantized(spark, sq8Path, queries, 4, nprobe = 4)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(sq8Sql.nonEmpty && sq8Sql == sq8Api,
      "graft_ann over an SQ8 index must equal probeQuantized")
    // WHERE pushdown composes: filtered quantized serving from plain SQL
    val sq8Where = spark.sql(
      s"""SELECT query_id, rank, neighbor_id, cos_sim
         |FROM graft_ann('$sq8Path', 'graft_tvf_qd', 4, 4)
         |WHERE label = 1 ORDER BY query_id, rank""".stripMargin).collect().toSeq
    val sq8FltApi = graft.operators.IvfIndex.probeQuantized(spark, sq8Path, queries, 4,
        nprobe = 4, predicate = Some(col("label") === 1))
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(sq8Where == sq8FltApi,
      "WHERE over an SQ8-index TVF must become the filtered quantized probe")
    // PQ build: the TVF must serve through probePq
    val pqPath = java.nio.file.Files.createTempDirectory("graft-tvf-pqd").toString
    graft.operators.IvfIndex.writePq(emb, pqPath, nlist = 16, keepCols = Seq("label"))
    val pqSql = spark.sql(
      s"""SELECT query_id, rank, neighbor_id, cos_sim
         |FROM graft_ann('$pqPath', 'graft_tvf_qd', 4, 4)
         |ORDER BY query_id, rank""".stripMargin).collect().toSeq
    val pqApi = graft.operators.IvfIndex.probePq(spark, pqPath, queries, 4, nprobe = 4)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(pqSql.nonEmpty && pqSql == pqApi,
      "graft_ann over a PQ index must equal probePq")
    // WHERE pushdown composes with the PQ rung too (the SQ8 twin above)
    val pqWhere = spark.sql(
      s"""SELECT query_id, rank, neighbor_id, cos_sim
         |FROM graft_ann('$pqPath', 'graft_tvf_qd', 4, 4)
         |WHERE label = 1 ORDER BY query_id, rank""".stripMargin).collect().toSeq
    val pqFltApi = graft.operators.IvfIndex.probePq(spark, pqPath, queries, 4,
        nprobe = 4, predicate = Some(col("label") === 1))
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(pqWhere == pqFltApi,
      "WHERE over a PQ-index TVF must become the filtered ADC probe")
  }

  test("graft_polyhash callable from SQL, matches the Column API") {
    val (pi, pinfo, pbuilder) = GraftExtensions.graftPolyHash
    spark.sessionState.functionRegistry.registerFunction(pi, pinfo, pbuilder)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("graft_ph_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_polyhash(text) AS h FROM graft_ph_docs ORDER BY doc_id").collect()
    val viaApi = spark.table("graft_ph_docs")
      .select(col("doc_id"), graft.functions.TextFunctions.polyHash(col("text")).as("h"))
      .orderBy(col("doc_id")).collect()
    viaSql.zip(viaApi).foreach { case (a, b) => assert(a == b) }
  }

  test("graft_winnow callable from SQL, matches the Column API") {
    val (wi, winfo, wbuilder) = GraftExtensions.graftWinnow
    spark.sessionState.functionRegistry.registerFunction(wi, winfo, wbuilder)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("graft_wn_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_winnow(text, 8, 4) AS fps FROM graft_wn_docs ORDER BY doc_id").collect()
    val viaApi = spark.table("graft_wn_docs")
      .select(col("doc_id"),
        graft.functions.expressions.WinnowExpression.winnowNative(col("text"), 8, 4).as("fps"))
      .orderBy(col("doc_id")).collect()
    assert(viaSql.nonEmpty)
    viaSql.zip(viaApi).foreach { case (a, b) => assert(a == b) }
    // default (k, window) = (8, 4)
    val dflt = spark.sql(
      "SELECT doc_id, graft_winnow(text) AS fps FROM graft_wn_docs ORDER BY doc_id").collect()
    dflt.zip(viaApi).foreach { case (a, b) => assert(a == b) }
  }

  test("graft_word_shingles callable from SQL, matches the Column API") {
    val (si, sinfo, sbuilder) = GraftExtensions.graftWordShingles
    spark.sessionState.functionRegistry.registerFunction(si, sinfo, sbuilder)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("graft_sh_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_word_shingles(text, 3) AS sh FROM graft_sh_docs ORDER BY doc_id").collect()
    val viaApi = spark.table("graft_sh_docs")
      .select(col("doc_id"),
        graft.functions.expressions.ShingleExpression.wordShinglesNative(col("text"), 3).as("sh"))
      .orderBy(col("doc_id")).collect()
    assert(viaSql.nonEmpty)
    viaSql.zip(viaApi).foreach { case (a, b) => assert(a == b) }
    // default n = 3
    val dflt = spark.sql(
      "SELECT doc_id, graft_word_shingles(text) AS sh FROM graft_sh_docs ORDER BY doc_id").collect()
    dflt.zip(viaApi).foreach { case (a, b) => assert(a == b) }
  }

  test("int literal args: out-of-Int-range bigint errors instead of truncating") {
    val (wi, winfo, wbuilder) = GraftExtensions.graftWinnow
    spark.sessionState.functionRegistry.registerFunction(wi, winfo, wbuilder)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("graft_rng_docs")
    // 5000000000 truncated to Int is 705032704 — silently wrong; must throw
    val e = intercept[Exception] {
      spark.sql("SELECT graft_winnow(text, 5000000000) FROM graft_rng_docs").collect()
    }
    // Spark may wrap the analysis-time failure; the root message must name the range
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("out of Int range")))
    // non-integral literal also rejected (would otherwise truncate 8.9 -> 8)
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_winnow(text, 8.9) FROM graft_rng_docs").collect()
    }
    assert(messages(e2).exists(_.contains("integer literal")))
  }

  test("signature functions callable from SQL, match the Column API") {
    for (fn <- Seq(GraftExtensions.graftMinhashSig, GraftExtensions.graftSimhashSig,
        GraftExtensions.graftHyperplaneSig, GraftExtensions.graftWordShingles)) {
      val (i, info, b) = fn
      spark.sessionState.functionRegistry.registerFunction(i, info, b)
    }
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("graft_sig_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_minhash_sig(graft_word_shingles(text, 3), 64) AS mh,
        |  graft_simhash_sig(graft_word_shingles(text, 3)) AS sh
        |FROM graft_sig_docs ORDER BY doc_id""".stripMargin).collect()
    import graft.functions.expressions.{ShingleExpression, SignatureExpressions}
    val viaApi = spark.table("graft_sig_docs")
      .select(col("doc_id"),
        SignatureExpressions.minhashSigNative(
          ShingleExpression.wordShinglesNative(col("text"), 3), 64).as("mh"),
        SignatureExpressions.simhashSigNative(
          ShingleExpression.wordShinglesNative(col("text"), 3)).as("sh"))
      .orderBy(col("doc_id")).collect()
    assert(viaSql.nonEmpty)
    viaSql.zip(viaApi).foreach { case (a, b) => assert(a == b) }
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("graft_sig_emb")
    val hp = spark.sql(
      "SELECT vec_id, graft_hyperplane_sig(embedding, 0, 6) AS s FROM graft_sig_emb ORDER BY vec_id").collect()
    val hpApi = spark.table("graft_sig_emb")
      .select(col("vec_id"),
        graft.functions.expressions.HyperplaneExpression.hyperplaneSigNative(col("embedding"), 0, 6).as("s"))
      .orderBy(col("vec_id")).collect()
    hp.zip(hpApi).foreach { case (a, b) => assert(a == b) }
  }

  test("subquery WHERE over serving TVFs stays a post-filter: rank gaps survive, never a planner error") {
    GraftExtensions.registerTvfs(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val lexPath = java.nio.file.Files.createTempDirectory("graft-tvf-lexsq").toString
    val ivfPath = java.nio.file.Files.createTempDirectory("graft-tvf-ivfsq").toString
    graft.operators.TextIndex.write(docs, lexPath, keepCols = Seq("lang"))
    graft.operators.IvfIndex.write(emb, ivfPath, nlist = 16, keepCols = Seq("label"))
    docs.createOrReplaceTempView("graft_sq_docs")
    emb.createOrReplaceTempView("graft_sq_emb")

    // lexical: an IN (SELECT ...) conjunct references only metadata but
    // its SQL form cannot re-parse — ServingFilterPushdown must leave it
    // above the node, so the semantics are the UNFILTERED top-k
    // post-filtered (contrast the pushed WHERE: k filtered, dense ranks)
    val bmSub = spark.sql(
      s"""SELECT doc_id, rank, bm25 FROM graft_bm25('$lexPath', 'dup,vector', 10)
         |WHERE lang IN (SELECT DISTINCT lang FROM graft_sq_docs WHERE lang = 'en')
         |ORDER BY rank""".stripMargin).collect().toSeq
    val bmPost = graft.operators.TextIndex
      .bm25TopK(spark, lexPath, Seq("dup", "vector"), 10, metaCols = Seq("lang"))
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("rank"), col("bm25"))
      .orderBy(col("rank")).collect().toSeq
    assert(bmSub == bmPost,
      "subquery WHERE must post-filter the unfiltered top-k (pushed semantics would re-rank)")
    val bmPushed = graft.operators.TextIndex
      .bm25TopK(spark, lexPath, Seq("dup", "vector"), 10,
        predicate = Some(col("lang") === "en"))
      .orderBy(col("rank")).collect().toSeq
    assert(bmSub != bmPushed,
      "the post-filter result must differ from the pushed (filtered-serving) result on this corpus")
    assert(bmSub.map(_.getLong(1)) != (1L to bmSub.size.toLong).toSeq,
      "post-filter semantics show rank gaps — dense ranks would mean the subquery was pushed")

    // vector twin
    emb.filter(col("vec_id") < 3).createOrReplaceTempView("graft_sq_q")
    val annSub = spark.sql(
      s"""SELECT query_id, rank, neighbor_id, cos_sim
         |FROM graft_ann('$ivfPath', 'graft_sq_q', 4, 4)
         |WHERE label IN (SELECT DISTINCT label FROM graft_sq_emb WHERE label % 2 = 0)
         |ORDER BY query_id, rank""".stripMargin).collect().toSeq
    val annPost = graft.operators.IvfIndex
      .probe(spark, ivfPath, emb.filter(col("vec_id") < 3), 4, nprobe = 4,
        metaCols = Seq("label"))
      .filter(pmod(col("label"), lit(2)) === 0)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(annSub == annPost,
      "subquery WHERE over graft_ann must post-filter the unfiltered top-k")
  }

  test("concurrent TVF probes with distinct predicates: lock-free planning, each bit-equal to its serial twin") {
    // the serving engine's actual workload: N parallel queries, every one a
    // planning cache miss (fresh node per s.sql call). ProbePlanning's
    // sticky driver-listing mode has no per-probe conf mutation, so the
    // probes must plan concurrently AND each must match the result of the
    // same SQL run alone
    GraftExtensions.registerTvfs(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val lexPath = java.nio.file.Files.createTempDirectory("graft-tvf-lexcc").toString
    val ivfPath = java.nio.file.Files.createTempDirectory("graft-tvf-ivfcc").toString
    graft.operators.TextIndex.write(docs, lexPath, keepCols = Seq("lang"))
    graft.operators.IvfIndex.write(emb, ivfPath, nlist = 16, keepCols = Seq("label"))
    emb.filter(col("vec_id") < 3).createOrReplaceTempView("graft_cc_q")
    val sqls =
      Seq("label % 2 = 0", "label % 2 = 1", "label % 3 = 0", "label % 3 = 1").map(p =>
        s"""SELECT query_id, rank, neighbor_id, cos_sim
           |FROM graft_ann('$ivfPath', 'graft_cc_q', 4, 4)
           |WHERE $p ORDER BY query_id, rank""".stripMargin) ++
      Seq("lang = 'en'", "lang IS NOT NULL").map(p =>
        s"""SELECT doc_id, rank, bm25 FROM graft_bm25('$lexPath', 'dup,vector', 10)
           |WHERE $p ORDER BY rank""".stripMargin)
    val serial = sqls.map(q => spark.sql(q).collect().toSeq)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(sqls.size)
    val concurrent =
      try {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration._
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        Await.result(
          Future.sequence(sqls.map(q => Future { spark.sql(q).collect().toSeq })),
          5.minutes)
      } finally pool.shutdown()
    serial.zip(concurrent).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.nonEmpty, s"query $i returned no rows — predicate too narrow to pin anything")
      assert(a == b, s"concurrent probe $i diverged from its serial twin")
    }
    // the probes above planned through the cloned serving session — the
    // CALLER's session conf must be untouched (ADVICE r13: the old sticky
    // set silently flipped unrelated highly-partitioned reads in this
    // session to serial driver-side listing)
    val thresholdKey = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    assert(!spark.conf.getOption(thresholdKey).contains(Int.MaxValue.toString),
      "probe planning must not mutate the caller session's discovery threshold")
    val ss1 = graft.util.ProbePlanning.servingSession(spark)
    assert(ss1.conf.get(thresholdKey) == Int.MaxValue.toString,
      "the serving session itself lists on the driver")
    assert(graft.util.ProbePlanning.servingSession(spark) eq ss1,
      "the serving session is cached per caller session")
  }

  test("churn: probes survive append + compaction via the sweep grace, results pre- or post-state") {
    // the serving_mixed_churn bench's first (graceless) run failed probes
    // with FAILED_READ_FILE mid-compaction: the sweep deleted replaced
    // trees an in-flight plan was still scanning. This pins the fix and
    // the atomicity contract: every result equals serving over SOME
    // committed state — the pre-churn or post-churn twin, never a blend,
    // never a crash.
    GraftExtensions.registerTvfs(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft-churn-ivf").toString
    graft.streaming.IvfIngest.ingestBatch(emb.filter(col("vec_id") < 300), path, 0L)
    graft.streaming.IvfIngest.ingestBatch(
      emb.filter(col("vec_id") >= 300 && col("vec_id") < 400), path, 1L)
    emb.filter(col("vec_id") < 4).createOrReplaceTempView("graft_churn_q")
    val sql = s"""SELECT query_id, rank, neighbor_id, cos_sim
                 |FROM graft_ann('$path', 'graft_churn_q', 4, 16)
                 |ORDER BY query_id, rank""".stripMargin
    val pre = spark.sql(sql).collect().toSeq

    // a plan captured BEFORE the maintenance — the exact shape that read
    // deleted files when sweeps were immediate
    val inflight = spark.sql(sql)

    // churn concurrent with probes: the append trips auto-compaction
    // (maxLiveTrees = 2 with 3 live trees) whose sweep is grace-deferred
    val pool = java.util.concurrent.Executors.newFixedThreadPool(9)
    val (concurrentResults, preDirs) =
      try {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration._
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        val churn = Future {
          graft.streaming.IvfIngest.ingestBatch(
            emb.filter(col("vec_id") >= 400 && col("vec_id") < 450), path, 2L,
            maxLiveTrees = 2, sweepGraceMs = 600000L)
        }
        val probes = Future.sequence(
          (1 to 8).map(_ => Future { spark.sql(sql).collect().toSeq }))
        val r = Await.result(probes, 5.minutes)
        Await.result(churn, 5.minutes)
        (r, new java.io.File(s"$path/epochs").listFiles().map(_.getName).toSeq)
      } finally pool.shutdown()

    val post = spark.sql(sql).collect().toSeq
    assert(pre != post, "the appended vectors must change this probe, or the test pins nothing")
    concurrentResults.zipWithIndex.foreach { case (r, i) =>
      assert(r == pre || r == post,
        s"concurrent probe $i returned a state that is neither pre- nor post-churn")
    }
    // the compaction committed (a compact tree exists) but the replaced
    // trees are grace-deferred, which is what kept in-flight scans alive
    assert(preDirs.exists(_.startsWith("compact-")), s"compaction must have run, got $preDirs")
    assert(preDirs.exists(_.startsWith("batch-")),
      s"replaced epochs must still be on disk inside the grace window, got $preDirs")
    // a TVF frame resolves its probe at first execution, so this collect
    // may serve either side of the churn — what it must NEVER do is crash
    // on swept files or blend the two states
    val inflightRows = inflight.collect().toSeq
    assert(inflightRows == pre || inflightRows == post,
      "a pre-churn frame must serve some committed state")

    // a later zero-grace sweep reclaims what aged out of the (elapsed)
    // window — here immediately, because grace 0 ignores manifest age
    graft.operators.IvfIndex.compact(spark, path, keepLatest = 0, sweepGraceMs = 0L)
    val sweptDirs = new java.io.File(s"$path/epochs").listFiles().map(_.getName).toSeq
    assert(!sweptDirs.exists(_.startsWith("batch-0000000")) || sweptDirs.size < preDirs.size,
      s"the zero-grace sweep must reclaim replaced trees, got $sweptDirs vs $preDirs")
    assert(spark.sql(sql).collect().toSeq == post,
      "probes must be bit-identical across the deferred sweep")
  }
}
