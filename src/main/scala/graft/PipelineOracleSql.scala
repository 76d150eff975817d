package graft

/** DuckDB oracle SQL for the LSH/ANN pipeline operators whose hashing is
  * deliberately SQL-replicable: MinHash+LSH dedup, SimHash dedup, the
  * hyperplane-LSH ANN bucket search, IVF ANN, and binary frame sampling.
  *
  * Hash parity contracts (mirrors of the Scala expressions):
  *  - `TextFunctions.polyHash`: left fold `(acc*mult + code) mod prime` over
  *    codepoints (corpus is ASCII, so byte == codepoint).
  *  - MinHash permutation i: `(h*(2i+1234567891) + (98176543i+7)) mod 2^31-1`
  *    (`Dedup.minhashCandidates`); band key is `concat_ws('_', band, slice)`.
  *  - SimHash: 62-bit `poly31 + poly131·2^31` token hash
  *    (`Dedup.simhash`), eight 8-bit chunk join (`Dedup.simhashPairs`).
  *  - Hyperplane coefficient: `lcg(p,i) = ((p·1000003+i)·2654435761+12345)
  *    mod 10^6, /1e6 − 0.5` (`Similarity.planeSignature`).
  *  - Dot products fold in index order, widened to double — DuckDB
  *    `list_sum(list_transform(...))` matches (verified round 1).
  */
object PipelineOracleSql {

  private val Tok = """regexp_split_to_array(trim(text), '\s+')"""

  /** Serving-state snapshot of the text index built base=doc_id%11=0 +
    * epochs i=1..10 + delete doc_id%7=3 (mirrors the text_index_describe
    * query): per-tree doc/token mass is a pure function of the corpus
    * slices, tombstone mass of the deleted slice.
    */
  def textIndexDescribe: String =
    s"""WITH d AS (SELECT doc_id, CAST(len($Tok) AS BIGINT) AS dl FROM documents)
       |SELECT 'base' AS kind, CAST(0 AS BIGINT) AS ordinal,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(coalesce(sum(dl), 0) AS BIGINT) AS sum_dl
       |FROM d WHERE doc_id % 11 = 0
       |UNION ALL
       |SELECT 'epoch', CAST(i - 1 AS BIGINT), CAST(count(*) AS BIGINT),
       |  CAST(coalesce(sum(dl), 0) AS BIGINT)
       |FROM d, unnest(range(1, 11)) AS t(i) WHERE doc_id % 11 = i GROUP BY i
       |UNION ALL
       |SELECT 'tombstones', CAST(0 AS BIGINT), CAST(count(*) AS BIGINT),
       |  CAST(coalesce(sum(dl), 0) AS BIGINT)
       |FROM d WHERE doc_id % 7 = 3
       |ORDER BY kind, ordinal""".stripMargin

  /** The vector twin (base=vec_id%5=0 + epochs i=1..4 + delete vec_id%9=2,
    * mirroring ivf_index_describe).
    */
  def ivfIndexDescribe: String =
    """SELECT 'base' AS kind, CAST(0 AS BIGINT) AS ordinal,
      |  CAST(count(*) AS BIGINT) AS n_vectors
      |FROM embeddings WHERE vec_id % 5 = 0
      |UNION ALL
      |SELECT 'epoch', CAST(i - 1 AS BIGINT), CAST(count(*) AS BIGINT)
      |FROM embeddings, unnest(range(1, 5)) AS t(i) WHERE vec_id % 5 = i GROUP BY i
      |UNION ALL
      |SELECT 'tombstones', CAST(0 AS BIGINT), CAST(count(*) AS BIGINT)
      |FROM embeddings WHERE vec_id % 9 = 2
      |ORDER BY kind, ordinal""".stripMargin

  /** polyHash(s) over a SQL string expression. */
  private def ph(s: String, mult: Long = 31L, prime: Long = 2147483647L): String =
    s"""list_reduce(list_prepend(0::BIGINT,
       |      list_transform(range(1, strlen($s)+1),
       |        i -> CAST(ascii(substr($s, CAST(i AS INT), 1)) AS BIGINT))),
       |      (a,b) -> (a*$mult+b) % $prime)""".stripMargin

  /** The engine's 62-bit `widePolyHash`: two independent folds packed as
    * h1 + h2 * 2^31 (the span-family near-exact identity).
    */
  private def wph(s: String): String =
    s"""(${ph(s)}
       |    + ${ph(s, mult = 131L, prime = 2147483629L)} * 2147483648)""".stripMargin

  /** Shared MinHash CTE prefix (tok → shingles → hashes → 64-component
    * signatures → 16 band buckets) used by [[minhashLsh]] and
    * [[minhashIncremental]].
    */
  private def minhashPrefix: String = s"WITH ${minhashCtes("documents")}"

  /** The MinHash CTE chain with a caller-chosen source relation, so
    * composed pipelines (pipeline_curate) can run the same machinery over
    * an upstream-filtered CTE instead of the raw table.
    */
  private def minhashCtes(src: String): String = {
    val numHashes = 64
    val sigCols = (0 until numHashes).map { i =>
      s"    min((h * ${2L * i + 1234567891L} + ${98176543L * i + 7L}) % 2147483647) AS m$i"
    }.mkString(",\n")
    val bandSelects = (0 until 16).map { b =>
      val slice = (0 until 4).map(r => s"m${b * 4 + r}").mkString(", ")
      s"  SELECT doc_id, $b AS band, concat_ws('_', $b, $slice) AS bucket FROM sig"
    }.mkString("\n  UNION ALL\n")
    // sh feeds the size + shared-shingle joins, and sig feeds SIXTEEN
    // per-band bucket selects — MATERIALIZED, or DuckDB re-inlines the
    // tokenize+hash chain per consumer (the per-oracle-timing class of
    // fix; measured on dedup_admission_replay: 34.9 s -> 0.3 s at sf0.01)
    s"""tok AS (
       |  SELECT doc_id, $Tok AS w FROM $src
       |), sh AS MATERIALIZED (
       |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-1),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
       |  FROM tok WHERE len(w) >= 3
       |), hh AS (
       |  SELECT doc_id, s, ${ph("s")} AS h
       |  FROM sh
       |), sig AS MATERIALIZED (
       |  SELECT doc_id,
       |$sigCols
       |  FROM hh GROUP BY doc_id
       |), buckets AS (
       |$bandSelects
       |)""".stripMargin
  }

  /** MinHash+LSH verified pairs at threshold 0.8, 16 bands x 4 rows. */
  def minhashLsh: String =
    s"""$minhashPrefix, cand AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM buckets x JOIN buckets y
       |    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
       |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |shared AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  JOIN cand ON cand.id_a = a.doc_id AND cand.id_b = b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) AS jaccard
       |FROM shared JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
       |WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.8
       |ORDER BY id_a, id_b""".stripMargin

  /** The boilerplate line the capped-LSH entry plants on doc_id % 10 == 3
    * (one shared literal, so the Scala entry and this oracle cannot
    * drift).
    */
  val LshBoilerLine: String =
    "the same boilerplate navigation header repeated on every page of the crawl"

  /** Hot-bucket-capped MinHash LSH, cap 16, with the skip count riding the
    * output (mirrors `Dedup.minhashLshPairsCappedAudit` over the
    * adversarial %10==3 boilerplate corpus): buckets larger than the cap
    * contribute star edges to their min member only, every smaller bucket
    * keeps the exact all-pairs form, and `skipped_pairs` replays the exact
    * number of within-bucket pairs the cap declined to enumerate.
    */
  def minhashLshCapped: String = {
    val src = "(SELECT doc_id, CASE WHEN doc_id % 10 = 3 " +
      s"THEN '$LshBoilerLine' ELSE text END AS text FROM documents) adv"
    s"""WITH ${minhashCtes(src)}, bsz AS MATERIALIZED (
       |  SELECT band, bucket, count(*) AS sz, min(doc_id) AS bmin
       |  FROM buckets GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT id_a, id_b FROM (
       |    SELECT x.doc_id AS id_a, y.doc_id AS id_b
       |    FROM buckets x JOIN buckets y
       |      ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
       |    JOIN bsz ON bsz.band = x.band AND bsz.bucket = x.bucket AND bsz.sz <= 16
       |    UNION ALL
       |    SELECT bsz.bmin AS id_a, b.doc_id AS id_b
       |    FROM buckets b JOIN bsz ON bsz.band = b.band AND bsz.bucket = b.bucket
       |    WHERE bsz.sz > 16 AND b.doc_id <> bsz.bmin)
       |), skip AS (
       |  SELECT CAST(coalesce(sum(sz*(sz-1)//2 - (sz-1)), 0) AS BIGINT) AS skipped_pairs
       |  FROM bsz WHERE sz > 16
       |), szd AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |shared AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  JOIN cand ON cand.id_a = a.doc_id AND cand.id_b = b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |  CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) AS jaccard,
       |  skipped_pairs
       |FROM shared JOIN szd sa ON sa.doc_id = id_a JOIN szd sb ON sb.doc_id = id_b
       |CROSS JOIN skip
       |WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.8
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Incremental admission dedup at threshold 0.8: batch docs
    * (`doc_id % 4 = 3`, an SF-independent split) banded-joined against the
    * corpus snapshot (the rest), exact-Jaccard verified (mirrors
    * `Dedup.minhashIncrementalPairs`; the signature prefix over ALL docs is
    * identical because each side's signatures depend only on its own rows).
    */
  def minhashIncremental: String =
    s"""$minhashPrefix, cand AS (
       |  SELECT DISTINCT x.doc_id AS dup_of, y.doc_id AS doc_id
       |  FROM buckets x JOIN buckets y
       |    ON x.band = y.band AND x.bucket = y.bucket
       |   AND x.doc_id % 4 != 3 AND y.doc_id % 4 = 3
       |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |shared AS (
       |  SELECT a.doc_id AS dup_of, b.doc_id AS doc_id, count(*) AS c
       |  FROM sh a JOIN sh b ON a.s = b.s
       |  JOIN cand ON cand.dup_of = a.doc_id AND cand.doc_id = b.doc_id
       |  GROUP BY 1, 2)
       |SELECT shared.doc_id AS doc_id, dup_of,
       |  CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) AS jaccard
       |FROM shared JOIN sz sa ON sa.doc_id = dup_of JOIN sz sb ON sb.doc_id = shared.doc_id
       |WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.8
       |ORDER BY shared.doc_id, dup_of""".stripMargin

  /** Three-epoch replay of the streaming near-dup admission policy
    * (mirrors `NearDupAdmission.admitBatch` folded over `doc_id % 3`
    * epochs): a doc is rejected iff it has a verified >= 0.8-Jaccard pair
    * with a lower-id doc of its OWN epoch or with any ADMITTED doc of an
    * earlier epoch. Verified pairs are computed once globally — LSH bucket
    * keys are a pure per-doc projection, so the pair set restricted to any
    * (store, batch) sides is identical to running the probe on those
    * sides, and a fixed epoch count unrolls the admission recursion into
    * plain staged CTEs.
    */
  def admissionReplay: String =
    // psym (and the signature chain under it) is referenced by FIVE
    // NOT-EXISTS probes across the staged epochs — without MATERIALIZED,
    // DuckDB re-inlines the whole LSH+verify chain per probe (measured
    // 34.9 s -> 0.3 s at sf0.01 with the hints; the same class of fix as
    // the round-16 renko-oracle rewrite, caught by verify_self's new
    // per-oracle timings)
    s"""$minhashPrefix, cand AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM buckets x JOIN buckets y
       |    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
       |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |shared AS MATERIALIZED (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  JOIN cand ON cand.id_a = a.doc_id AND cand.id_b = b.doc_id
       |  GROUP BY 1, 2),
       |p AS (
       |  SELECT id_a, id_b FROM shared
       |  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
       |  WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.8),
       |psym AS MATERIALIZED (
       |  SELECT id_a AS a, id_b AS b FROM p
       |  UNION ALL SELECT id_b AS a, id_a AS b FROM p),
       |e AS (SELECT doc_id FROM documents),
       |adm0 AS (
       |  SELECT doc_id FROM e WHERE doc_id % 3 = 0 AND NOT EXISTS (
       |    SELECT 1 FROM psym WHERE psym.b = e.doc_id
       |      AND psym.a < e.doc_id AND psym.a % 3 = 0)),
       |adm1 AS (
       |  SELECT doc_id FROM e WHERE doc_id % 3 = 1
       |    AND NOT EXISTS (SELECT 1 FROM psym WHERE psym.b = e.doc_id
       |      AND psym.a < e.doc_id AND psym.a % 3 = 1)
       |    AND NOT EXISTS (SELECT 1 FROM psym JOIN adm0 ON psym.a = adm0.doc_id
       |      WHERE psym.b = e.doc_id)),
       |adm2 AS (
       |  SELECT doc_id FROM e WHERE doc_id % 3 = 2
       |    AND NOT EXISTS (SELECT 1 FROM psym WHERE psym.b = e.doc_id
       |      AND psym.a < e.doc_id AND psym.a % 3 = 2)
       |    AND NOT EXISTS (SELECT 1 FROM psym WHERE psym.b = e.doc_id AND psym.a IN
       |      (SELECT doc_id FROM adm0 UNION ALL SELECT doc_id FROM adm1)))
       |SELECT doc_id, CAST(0 AS INTEGER) AS epoch FROM adm0
       |UNION ALL SELECT doc_id, CAST(1 AS INTEGER) AS epoch FROM adm1
       |UNION ALL SELECT doc_id, CAST(2 AS INTEGER) AS epoch FROM adm2
       |ORDER BY doc_id""".stripMargin

  /** The full curation pipeline (mirrors `Curation.curate` with the
    * pipeline_curate parameters): annotate quality + langid and filter →
    * drop 8-gram benchmark overlap → drop the higher-id member of every
    * verified >= 0.8-Jaccard MinHash pair → deterministic per-language
    * mixture draw. Every stage is the same SQL its standalone oracle uses;
    * the dedup CTEs run over the `clean` survivor set via
    * [[minhashCtes]].
    */
  private def curateSampleBucket: String =
    """((list_reduce(list_prepend(0::BIGINT,
      |      list_transform(range(1, strlen('graft:' || CAST(doc_id AS VARCHAR)) + 1),
      |        i -> CAST(ascii(substr('graft:' || CAST(doc_id AS VARCHAR), CAST(i AS INT), 1)) AS BIGINT))),
      |      (a, x) -> (a * 31 + x) % 2147483647)
      |      * 2654435761 + 12345) % 2147483647) % 1000000""".stripMargin

  def pipelineCurate: String =
    s"""$curatePrefix,
       |ded AS (SELECT * FROM clean WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM p))
       |SELECT doc_id, lang, pred_lang, n_tokens, quality_score
       |FROM ded
       |WHERE $curateSampleBucket < CASE lang WHEN 'en' THEN 900000 WHEN 'de' THEN 500000
       |                                WHEN 'zh' THEN 300000 ELSE 400000 END
       |ORDER BY doc_id""".stripMargin

  /** The pipeline END TO END (mirrors the `pipeline_e2e` query): the
    * [[pipelineCurate]] chain as CTE `cur`, 0.5-Jaccard n-gram near-dup
    * clusters over the survivors (min-label components via the recursive
    * reachability CTE — `c`-prefixed names to stay clear of the curate
    * prefix's minhash CTEs), split assignment keyed on
    * coalesce(cluster_id, doc_id), a per-split (scrambled-hash, id)
    * round-robin shard deal, and the manifest + the measured cross-split
    * straddle count (0 by the grouped split's construction). The curate
    * survivor set, pair set, and split assignment are MATERIALIZED — each
    * has 2-3 consumers and DuckDB re-inlines per reference.
    */
  def pipelineE2e: String = {
    def splitBucket(key: String): String =
      s"(((list_reduce(list_prepend(0::BIGINT, " +
        s"list_transform(range(1, strlen('split:' || CAST($key AS VARCHAR)) + 1), " +
        s"i -> CAST(ascii(substr('split:' || CAST($key AS VARCHAR), CAST(i AS INT), 1)) AS BIGINT))), " +
        s"(a, x) -> (a * 31 + x) % 2147483647) * 2654435761 + 12345) % 2147483647) % 1000000)"
    s"""${curatePrefix.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |cur AS MATERIALIZED (
       |  SELECT doc_id, lang, n_tokens FROM
       |    (SELECT * FROM clean WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM p)) ded
       |  WHERE $curateSampleBucket < CASE lang WHEN 'en' THEN 900000 WHEN 'de' THEN 500000
       |                                  WHEN 'zh' THEN 300000 ELSE 400000 END),
       |ctok AS (
       |  SELECT d.doc_id, $Tok AS w FROM documents d JOIN cur USING (doc_id)),
       |csh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-1),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
       |  FROM ctok WHERE len(w) >= 3),
       |csz AS (SELECT doc_id, count(*) AS n FROM csh GROUP BY doc_id),
       |cshared AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |  FROM csh a JOIN csh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |cpairs AS MATERIALIZED (
       |  SELECT id_a, id_b FROM cshared
       |  JOIN csz sa ON sa.doc_id = id_a JOIN csz sb ON sb.doc_id = id_b
       |  WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.5),
       |cbidir AS (
       |  SELECT id_a AS src, id_b AS dst FROM cpairs
       |  UNION SELECT id_b, id_a FROM cpairs),
       |creach(nn, l) AS (
       |  SELECT src, src FROM cbidir
       |  UNION
       |  SELECT e.dst, r.l FROM creach r JOIN cbidir e ON e.src = r.nn),
       |ccl AS (SELECT nn AS doc_id, min(l) AS cluster_id FROM creach GROUP BY nn),
       |g AS (
       |  SELECT cur.doc_id, COALESCE(ccl.cluster_id, cur.doc_id) AS group_key, cur.n_tokens
       |  FROM cur LEFT JOIN ccl ON ccl.doc_id = cur.doc_id),
       |sp AS MATERIALIZED (
       |  SELECT doc_id, n_tokens,
       |    CASE WHEN b < 800000 THEN 'train' WHEN b < 900000 THEN 'val' ELSE 'test' END AS split
       |  FROM (SELECT doc_id, n_tokens, ${splitBucket("group_key")} AS b FROM g)),
       |eh AS (
       |  SELECT doc_id, split, n_tokens,
       |    ((${ph("'shuffle:' || CAST(doc_id AS VARCHAR)")}
       |      * 2654435761 + 12345) % 2147483647) AS hv
       |  FROM sp),
       |er AS (
       |  SELECT doc_id, split, n_tokens,
       |    CAST(row_number() OVER (PARTITION BY split ORDER BY hv, doc_id) AS BIGINT) AS pos
       |  FROM eh),
       |esh AS (
       |  SELECT split, doc_id, n_tokens,
       |    (pos - 1) % 4 AS shard, (pos - 1) // 4 + 1 AS shard_pos
       |  FROM er),
       |man AS (
       |  SELECT split, shard,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |    min_by(doc_id, shard_pos) AS first_doc
       |  FROM esh GROUP BY split, shard),
       |leak AS (
       |  SELECT CAST(coalesce(sum(CASE WHEN a.split != b.split THEN 1 ELSE 0 END), 0) AS BIGINT)
       |    AS straddling_pairs
       |  FROM cpairs pr JOIN sp a ON a.doc_id = pr.id_a JOIN sp b ON b.doc_id = pr.id_b)
       |SELECT man.split, man.shard, man.n_docs, man.n_tokens, man.first_doc,
       |  leak.straddling_pairs
       |FROM man CROSS JOIN leak ORDER BY man.split, man.shard""".stripMargin
  }

  /** The curate chain with the learned NB quality gate inserted after the
    * heuristic floor (mirrors `Curation.curate(classifierSeeds = ...)`);
    * everything downstream — decontamination, dedup, mixture — composes
    * over the gated survivor set unchanged.
    */
  def pipelineCurateClassified: String =
    s"""${curatePrefixGated(classifierGate = true)},
       |ded AS (SELECT * FROM clean WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM p))
       |SELECT doc_id, lang, pred_lang, n_tokens, quality_score
       |FROM ded
       |WHERE $curateSampleBucket < CASE lang WHEN 'en' THEN 900000 WHEN 'de' THEN 500000
       |                                WHEN 'zh' THEN 300000 ELSE 400000 END
       |ORDER BY doc_id""".stripMargin

  /** The shared CTE chain of the curation oracles: annotate + filter →
    * decontaminate → MinHash machinery over the `clean` survivors →
    * verified pair set `p`. [[pipelineCurate]] appends the keep-lowest
    * dedup + mixture draw; [[pipelineCurateStream]] appends the epoch-fold
    * admission + budget window.
    */
  private def curatePrefix: String = curatePrefixGated(classifierGate = false)

  /** `classifierGate = true` inserts the in-engine NB classifier between
    * the heuristic quality floor and decontamination (mirrors
    * `Curation.curate(classifierSeeds = ...)`: pos seed = the bench slice
    * doc_id%10=7, neg seed = doc_id%10=3, keep score >= 0) — the
    * [[textNbClassifier]] machinery under `c_`-prefixed CTE names, scoped
    * to the heuristic survivors. `gopherGate = true` instead adds the
    * Gopher rule battery's per-doc predicates to the heuristic floor
    * (mirrors `Curation.curate(gopherGate = true)`, default thresholds) —
    * the extra integer aggregates ride the same `ann` scan and the ratios
    * are the [[SparkEntry]] text_gopher_rules formulation verbatim.
    */
  private def curatePrefixGated(
      classifierGate: Boolean,
      gopherGate: Boolean = false,
      streamFold: Boolean = false,
      pinStages: Boolean = false): String = {
    val gopherAnnCols =
      if (!gopherGate) ""
      else
        s""",
           |    CAST(list_sum(list_transform($Tok, t -> length(t))) AS BIGINT) AS g_sum_len,
           |    CAST(len(list_filter($Tok, t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS g_alpha,
           |    CAST(len(list_filter($Tok, t -> contains(t, '#') OR contains(t, '...') OR contains(t, '…'))) AS BIGINT) AS g_sym,
           |    CAST(len(list_filter(list_distinct($Tok), t -> t IN ('the','a','and','of','to','in'))) AS BIGINT) AS g_stop""".stripMargin
    val gopherQaCols = if (!gopherGate) "" else ", g_sum_len, g_alpha, g_sym, g_stop"
    val gopherPred =
      if (!gopherGate) ""
      else
        """
          |  AND n_tokens <= 100000
          |  AND CAST(g_sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 3.0
          |  AND CAST(g_sum_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 10.0
          |  AND CAST(g_sym AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 0.1
          |  AND CAST(g_alpha AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 0.8
          |  AND g_stop >= 2""".stripMargin
    // the gated survivor tree is an order of magnitude deeper (classifier
    // feature/weight CTEs), and DuckDB inlines CTEs per REFERENCE — the
    // stream fold's many `clean` references then re-expand the whole tree
    // multiplicatively (measured: fd exhaustion at 20k open parquet
    // handles). MATERIALIZED pins the survivor set once; plain oracles
    // keep default inlining (unchanged, long-green plans).
    // the gopher battery deepens the survivor tree the same way (five
    // token-fold aggregates per doc in `ann`) — measured: the un-pinned
    // gopher stream fold re-expands it past 9 MINUTES in DuckDB, the
    // pinned one runs in seconds. The STREAM folds pin `clean`
    // unconditionally: even the plain survivor tree re-expands across the
    // fold's many references (measured 385 s -> seconds at sf0.01)
    val cleanMat =
      if (classifierGate || gopherGate || streamFold) "MATERIALIZED " else ""
    // the funnel references qa and surv three times each (once per epoch):
    // pin both or DuckDB re-inlines the whole tokenize tree per reference
    val qaMat = if (pinStages) "MATERIALIZED " else ""
    val survMat = if (gopherGate || pinStages) "MATERIALIZED " else ""
    val survCte =
      if (!classifierGate)
        s"surv AS $survMat(SELECT * FROM qa WHERE n_tokens >= 30 AND quality_score >= 0.5$gopherPred)"
      else
        s"""heur AS (SELECT * FROM qa WHERE n_tokens >= 30 AND quality_score >= 0.5$gopherPred),
           |${featureCtes("c_")},
           |${lrWeightCtes("doc_id % 10 = 7", "doc_id % 10 = 3", "c_")},
           |cnp AS (SELECT count(*) AS n FROM documents WHERE doc_id % 10 = 7),
           |cnn AS (SELECT count(*) AS n FROM documents WHERE doc_id % 10 = 3),
           |cpr AS (SELECT CAST(floor(ln(CAST(cnp.n AS DOUBLE) / CAST(cnn.n AS DOUBLE))
           |    * 1e6 + 0.5) AS BIGINT) AS prior FROM cnp CROSS JOIN cnn),
           |csc AS (
           |  SELECT f.doc_id, CAST(sum(c_w.lw) AS BIGINT) AS s
           |  FROM c_feats f JOIN c_w ON c_w.b = f.b
           |  WHERE f.doc_id IN (SELECT doc_id FROM heur)
           |  GROUP BY f.doc_id),
           |surv AS MATERIALIZED (
           |  SELECT heur.* FROM heur
           |  LEFT JOIN csc ON csc.doc_id = heur.doc_id CROSS JOIN cpr
           |  WHERE coalesce(csc.s, 0) + cpr.prior >= 0)""".stripMargin
    val gram8 = (0 until 8).map(j => s"w[CAST(i+$j AS INT)]").mkString(" || ' ' || ")
    s"""WITH ann AS (
       |  SELECT doc_id, lang, text,
       |    CAST(len($Tok) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct($Tok)) AS BIGINT) AS n_unique_tokens,
       |    CAST(len(list_filter($Tok, t -> t IN ('the','a','and','of','to','in'))) AS BIGINT) AS stopword_cnt,
       |    CAST(len(list_filter($Tok, t -> t IN ('the','a','and'))) AS BIGINT) AS s_en,
       |    CAST(len(list_filter($Tok, t -> t IN ('der','die','das','und'))) AS BIGINT) AS s_de,
       |    CAST(len(list_filter($Tok, t -> t IN ('el','la','los','y'))) AS BIGINT) AS s_es,
       |    CAST(len(list_filter($Tok, t -> t IN ('le','les','et','une'))) AS BIGINT) AS s_fr,
       |    CAST(len(list_filter($Tok, t -> t IN ('de5','le5','shi4'))) AS BIGINT) AS s_zh$gopherAnnCols
       |  FROM documents WHERE doc_id % 10 <> 7),
       |qa AS $qaMat(
       |  SELECT doc_id, lang, text, n_tokens$gopherQaCols,
       |    least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
       |      + (CAST(n_unique_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 0.4
       |      + least((CAST(stopword_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 5.0, 1.0) * 0.2 AS quality_score,
       |    CASE WHEN s_en >= greatest(s_de, s_es, s_fr, s_zh) THEN 'en'
       |         WHEN s_de >= greatest(s_es, s_fr, s_zh) THEN 'de'
       |         WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
       |         WHEN s_fr >= s_zh THEN 'fr'
       |         ELSE 'zh' END AS pred_lang
       |  FROM ann),
       |$survCte,
       |btok AS (SELECT doc_id, $Tok AS w FROM documents WHERE doc_id % 10 = 7),
       |bg AS (
       |  SELECT DISTINCT $gram8 AS gram
       |  FROM btok, unnest(range(1, len(w) - 6)) AS t(i)),
       |stok AS (SELECT doc_id, $Tok AS w FROM surv),
       |sg AS (
       |  SELECT DISTINCT doc_id, $gram8 AS gram
       |  FROM stok, unnest(range(1, len(w) - 6)) AS t(i)),
       |contam AS (SELECT DISTINCT doc_id FROM sg JOIN bg USING (gram)),
       |clean AS $cleanMat(SELECT * FROM surv WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
       |${minhashCtes("clean")}, cand AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM buckets x JOIN buckets y
       |    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
       |), sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |shared AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  JOIN cand ON cand.id_a = a.doc_id AND cand.id_b = b.doc_id
       |  GROUP BY 1, 2),
       |p AS (
       |  SELECT id_a, id_b FROM shared
       |  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
       |  WHERE CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.8)""".stripMargin
  }

  /** Three-epoch replay of the STREAMING curation chain (mirrors
    * `CurationStream.curateBatch` folded over `doc_id % 3` epochs with
    * budget 2000): the [[curatePrefix]] stages are per-doc projections and
    * a global pair set, so the epoch restriction commutes with them —
    * running them once globally and admitting per epoch (the
    * [[admissionReplay]] unrolled-CTE pattern over `clean`) replays the
    * fold exactly; budget admission order is (epoch, doc_id) per stratum,
    * one window.
    */
  /** Per-stage funnel over the curate chain (mirrors
    * `Curation.curateFunnel`): doc/token counts at input, quality floor,
    * decontamination, dedup, and mixture. The prefix is pinned — the
    * funnel references every intermediate twice.
    */
  def pipelineCurateFunnel: String =
    s"""${curatePrefixGated(classifierGate = false, gopherGate = false, streamFold = true)},
       |ded AS MATERIALIZED (
       |  SELECT * FROM clean WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM p)),
       |samp AS (
       |  SELECT * FROM ded
       |  WHERE $curateSampleBucket < CASE lang WHEN 'en' THEN 900000 WHEN 'de' THEN 500000
       |                                  WHEN 'zh' THEN 300000 ELSE 400000 END)
       |SELECT '00_input' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM qa
       |UNION ALL SELECT '10_quality_floor', CAST(count(*) AS BIGINT),
       |  CAST(sum(n_tokens) AS BIGINT) FROM surv
       |UNION ALL SELECT '20_decontaminated', CAST(count(*) AS BIGINT),
       |  CAST(sum(n_tokens) AS BIGINT) FROM clean
       |UNION ALL SELECT '30_deduped', CAST(count(*) AS BIGINT),
       |  CAST(sum(n_tokens) AS BIGINT) FROM ded
       |UNION ALL SELECT '40_sampled', CAST(count(*) AS BIGINT),
       |  CAST(sum(n_tokens) AS BIGINT) FROM samp
       |ORDER BY stage""".stripMargin

  /** The curate chain with the Gopher rule battery on the heuristic floor
    * (mirrors `Curation.curate(gopherGate = true)`).
    */
  def pipelineCurateGopher: String =
    s"""${curatePrefixGated(classifierGate = false, gopherGate = true)},
       |ded AS (SELECT * FROM clean WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM p))
       |SELECT doc_id, lang, pred_lang, n_tokens, quality_score
       |FROM ded
       |WHERE $curateSampleBucket < CASE lang WHEN 'en' THEN 900000 WHEN 'de' THEN 500000
       |                                WHEN 'zh' THEN 300000 ELSE 400000 END
       |ORDER BY doc_id""".stripMargin

  def pipelineCurateStream: String = pipelineCurateStreamGated(classifierGate = false)

  /** The streaming-curation replay with the learned NB gate inserted —
    * [[pipelineCurateStream]]'s fold over [[curatePrefixGated]]'s gated
    * survivor set (mirrors `CurationStream.curateBatch(classifier = ...)`
    * folded over `doc_id % 3` epochs: the gate is a pure per-doc decision,
    * so it commutes with the epoch restriction like every other per-doc
    * stage).
    */
  def pipelineCurateStreamClassified: String =
    pipelineCurateStreamGated(classifierGate = true)

  /** The streaming fold with the Gopher battery on the front door (mirrors
    * `CurationStream.curateBatch(gopher = true)` folded over epochs).
    */
  def pipelineCurateStreamGopher: String =
    pipelineCurateStreamGated(classifierGate = false, gopherGate = true)

  private def pipelineCurateStreamGated(
      classifierGate: Boolean,
      gopherGate: Boolean = false): String =
    s"""${curatePrefixGated(classifierGate, gopherGate, streamFold = true)},
       |$streamFoldCtes
       |SELECT doc_id, lang, pred_lang, n_tokens, quality_score, cum_tokens, epoch
       |FROM fin WHERE cum_tokens - n_tokens < 2000 ORDER BY doc_id""".stripMargin

  /** The 3-epoch admission + budget fold over `clean`/`p` — shared by the
    * stream-record oracles and the streaming funnel.
    */
  private def streamFoldCtes: String =
    """psym AS MATERIALIZED (
      |  SELECT id_a AS a, id_b AS b FROM p
      |  UNION ALL SELECT id_b AS a, id_a AS b FROM p),
      |ce AS (SELECT doc_id FROM clean),
      |adm0 AS MATERIALIZED (
      |  SELECT doc_id FROM ce WHERE doc_id % 3 = 0 AND NOT EXISTS (
      |    SELECT 1 FROM psym WHERE psym.b = ce.doc_id
      |      AND psym.a < ce.doc_id AND psym.a % 3 = 0)),
      |adm1 AS MATERIALIZED (
      |  SELECT doc_id FROM ce WHERE doc_id % 3 = 1
      |    AND NOT EXISTS (SELECT 1 FROM psym WHERE psym.b = ce.doc_id
      |      AND psym.a < ce.doc_id AND psym.a % 3 = 1)
      |    AND NOT EXISTS (SELECT 1 FROM psym JOIN adm0 ON psym.a = adm0.doc_id
      |      WHERE psym.b = ce.doc_id)),
      |adm2 AS MATERIALIZED (
      |  SELECT doc_id FROM ce WHERE doc_id % 3 = 2
      |    AND NOT EXISTS (SELECT 1 FROM psym WHERE psym.b = ce.doc_id
      |      AND psym.a < ce.doc_id AND psym.a % 3 = 2)
      |    AND NOT EXISTS (SELECT 1 FROM psym WHERE psym.b = ce.doc_id AND psym.a IN
      |      (SELECT doc_id FROM adm0 UNION ALL SELECT doc_id FROM adm1))),
      |adm AS (
      |  SELECT doc_id, CAST(0 AS INTEGER) AS epoch FROM adm0
      |  UNION ALL SELECT doc_id, CAST(1 AS INTEGER) AS epoch FROM adm1
      |  UNION ALL SELECT doc_id, CAST(2 AS INTEGER) AS epoch FROM adm2),
      |fin AS MATERIALIZED (
      |  SELECT c.doc_id, c.lang, c.pred_lang, c.n_tokens, c.quality_score, adm.epoch,
      |    CAST(sum(c.n_tokens) OVER (PARTITION BY c.lang ORDER BY adm.epoch, c.doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
      |  FROM adm JOIN clean c ON c.doc_id = adm.doc_id)""".stripMargin

  /** Per-epoch, per-stage funnel over the STREAMING fold (mirrors the
    * pipeline_curate_stream_funnel query's 3-epoch fold over
    * `CurationStream.curateBatchStages`): the stream-record CTE chain,
    * tailed by doc/token counts of each stage restricted to its epoch —
    * per-doc stages restrict by `doc_id % 3` (they commute with the epoch
    * split), admission by the unrolled `adm$e` sets, budget by the fold's
    * own window filter.
    */
  def pipelineCurateStreamFunnel: String = {
    val perEpoch = (0 until 3).map { e =>
      s"""SELECT CAST($e AS INTEGER) AS epoch, '00_input' AS stage,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens
         |FROM qa WHERE doc_id % 3 = $e
         |UNION ALL SELECT CAST($e AS INTEGER), '10_quality_floor',
         |  CAST(count(*) AS BIGINT), CAST(coalesce(sum(n_tokens), 0) AS BIGINT)
         |FROM surv WHERE doc_id % 3 = $e
         |UNION ALL SELECT CAST($e AS INTEGER), '20_decontaminated',
         |  CAST(count(*) AS BIGINT), CAST(coalesce(sum(n_tokens), 0) AS BIGINT)
         |FROM clean WHERE doc_id % 3 = $e
         |UNION ALL SELECT CAST($e AS INTEGER), '30_dedup_admitted',
         |  CAST(count(*) AS BIGINT), CAST(coalesce(sum(n_tokens), 0) AS BIGINT)
         |FROM clean WHERE doc_id IN (SELECT doc_id FROM adm$e)
         |UNION ALL SELECT CAST($e AS INTEGER), '40_budget_admitted',
         |  CAST(count(*) AS BIGINT), CAST(coalesce(sum(n_tokens), 0) AS BIGINT)
         |FROM fin WHERE epoch = $e AND cum_tokens - n_tokens < 2000""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""${curatePrefixGated(classifierGate = false, gopherGate = false,
          streamFold = true, pinStages = true)},
       |$streamFoldCtes
       |$perEpoch
       |ORDER BY epoch, stage""".stripMargin
  }

  /** The curation chain plus the final token quota (mirrors
    * `Curation.curate(tokenBudget = Some(1500))`): the whole
    * [[pipelineCurate]] query becomes one CTE, then the budget stage is
    * the same windowed cumulative sum `sample_token_budget` uses (seed
    * 'budget', over the chain's ALREADY-annotated n_tokens).
    */
  def pipelineCurateBudget: String = {
    val budgetHash =
      """((list_reduce(list_prepend(0::BIGINT,
        |      list_transform(range(1, strlen('budget:' || CAST(doc_id AS VARCHAR)) + 1),
        |        i -> CAST(ascii(substr('budget:' || CAST(doc_id AS VARCHAR), CAST(i AS INT), 1)) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 2147483647)
        |      * 2654435761 + 12345) % 2147483647)""".stripMargin
    s"""WITH samp AS (
       |$pipelineCurate
       |), bh AS (
       |  SELECT doc_id, lang, pred_lang, n_tokens, quality_score,
       |    $budgetHash AS hv
       |  FROM samp
       |), bcum AS (
       |  SELECT doc_id, lang, pred_lang, n_tokens, quality_score,
       |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY hv, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM bh)
       |SELECT doc_id, lang, pred_lang, n_tokens, quality_score, cum_tokens
       |FROM bcum WHERE cum_tokens - n_tokens < 1500 ORDER BY doc_id""".stripMargin
  }

  /** Snapshot-delta report (mirrors `CorpusDiff.report` over the
    * corpus_diff query's two overlapping cuts).
    */
  def corpusDiff: String =
    s"""WITH o AS (
       |  SELECT doc_id, source, CAST(len($Tok) AS BIGINT) AS tok
       |  FROM documents WHERE doc_id % 10 <> 3),
       |n AS (
       |  SELECT doc_id, source, CAST(len($Tok) AS BIGINT) AS tok
       |  FROM documents WHERE doc_id % 7 <> 2),
       |j AS (
       |  SELECT coalesce(n.source, o.source) AS source,
       |    CASE WHEN o.doc_id IS NULL THEN 1 ELSE 0 END AS added,
       |    CASE WHEN n.doc_id IS NULL THEN 1 ELSE 0 END AS removed,
       |    CASE WHEN o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL THEN 1 ELSE 0 END AS retained,
       |    coalesce(n.tok, 0) - coalesce(o.tok, 0) AS td
       |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
       |SELECT source,
       |  CAST(sum(added) AS BIGINT) AS n_added,
       |  CAST(sum(removed) AS BIGINT) AS n_removed,
       |  CAST(sum(retained) AS BIGINT) AS n_retained,
       |  CAST(sum(td) AS BIGINT) AS token_delta
       |FROM j GROUP BY source ORDER BY source""".stripMargin

  /** BPE merge learning (mirrors `Bpe.learnMerges`, 6 rounds): word
    * dictionary with frequencies, per-round pair counts + lexicographic-
    * tie argmax, and the greedy left-to-right application replayed
    * relationally — match islands via gaps-and-islands, merges at odd
    * row_number parity within each island, rebuild via an ordered list
    * aggregate. Six unrolled rounds of identical CTE blocks.
    */
  def bpeMerges: String = {
    val n = 6
    val finalSel = (0 until n).map(k =>
      s"""SELECT CAST(${k + 1} AS BIGINT) AS "rank", l AS "left", r AS "right",
         |  l || r AS merged, cnt AS pair_count FROM b$k""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH ${bpeCtes(n)}
       |$finalSel
       |ORDER BY "rank"""".stripMargin
  }

  /** Corpus token counts under the learned vocabulary (mirrors
    * `Bpe.tokenCounts`, 6 rounds): the same training chain, tailed by a
    * dictionary join back onto the exploded corpus.
    */
  def bpeTokenCounts: String = {
    val n = 6
    s"""WITH ${bpeCtes(n)},
       |tok AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
       |  FROM documents),
       |wl AS (SELECT word, CAST(len(sym) AS BIGINT) AS nw FROM w$n)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(nw) AS BIGINT) AS n_bpe_tokens
       |FROM tok JOIN wl USING (word) GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** The `n`-round BPE training chain: `w0` (word dictionary) then per
    * round pair counts `p$k`, argmax `b$k`, application windows, and the
    * next dictionary `w${k+1}`.
    */
  private def bpeCtes(n: Int): String = {
    val rounds = (0 until n).map { k =>
      s"""p$k AS (
         |  SELECT l, r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |    SELECT sym[CAST(u.i AS INT)] AS l, sym[CAST(u.i AS INT) + 1] AS r, freq
         |    FROM w$k, unnest(range(1, len(sym))) AS u(i))
         |  GROUP BY l, r),
         |b$k AS (SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
         |ps$k AS (
         |  SELECT word, freq, CAST(u.i AS BIGINT) AS pos, sym[CAST(u.i AS INT)] AS s
         |  FROM w$k, unnest(range(1, len(sym) + 1)) AS u(i)),
         |fl$k AS (
         |  -- LEFT JOIN ON TRUE (not CROSS JOIN): an exhausted vocabulary
         |  -- empties b$k, and the round must then be a NO-OP carrying w$k
         |  -- forward (m coalesces to false on the null-padded row) exactly
         |  -- like the Scala loop — a cross join would empty every later
         |  -- dictionary and zero text_bpe_tokenize on degenerate corpora
         |  SELECT ps$k.word, ps$k.freq, ps$k.pos, ps$k.s,
         |    coalesce(ps$k.s = b.l AND coalesce(
         |      lead(ps$k.s) OVER (PARTITION BY ps$k.word ORDER BY ps$k.pos) = b.r,
         |      false), false) AS m
         |  FROM ps$k LEFT JOIN b$k b ON true),
         |il$k AS (
         |  SELECT *, CASE WHEN m THEN pos - row_number()
         |      OVER (PARTITION BY word, m ORDER BY pos) END AS isl
         |  FROM fl$k),
         |kp$k AS (
         |  SELECT *, (m AND row_number()
         |      OVER (PARTITION BY word, isl ORDER BY pos) % 2 = 1) AS kp
         |  FROM il$k),
         |rb$k AS (
         |  SELECT kp$k.word, kp$k.freq, kp$k.pos,
         |    CASE WHEN kp THEN b.l || b.r ELSE kp$k.s END AS osym,
         |    lag(kp, 1, false) OVER (PARTITION BY kp$k.word ORDER BY kp$k.pos) AS consumed
         |  FROM kp$k LEFT JOIN b$k b ON true),
         |w${k + 1} AS MATERIALIZED (
         |  SELECT word, freq, list(osym ORDER BY pos) AS sym
         |  FROM rb$k WHERE NOT consumed GROUP BY word, freq)""".stripMargin
    }
    s"""w0 AS MATERIALIZED (
       |  SELECT word, freq,
       |    list_transform(range(1, strlen(word) + 1),
       |      c -> substr(word, CAST(c AS INT), 1)) AS sym
       |  FROM (
       |    SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
       |      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
       |      FROM documents)
       |    WHERE strlen(word) >= 1 GROUP BY word)),
       |${rounds.mkString(",\n")}""".stripMargin
  }

  /** Cross-source overlap matrix (mirrors `CorpusDiff.overlapMatrix`,
    * k=8): distinct shared 8-gram polyhashes and gram-set Jaccard per
    * unordered source pair, zero-pairs included.
    */
  def corpusOverlapMatrix: String = {
    // the gram position variable must NOT be named `i`: the ph() fold
    // binds a lambda `i` over the hashed string's characters, and a
    // same-named outer column inside the gram expression would be
    // captured by it (per-character gram corruption)
    val gram8 = (0 until 8).map(j => s"w[CAST(gi+$j AS INT)]").mkString(" || ' ' || ")
    s"""WITH toks AS (
       |  SELECT source, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
       |g AS (
       |  SELECT DISTINCT source, ${ph(s"($gram8)")} AS h
       |  FROM toks, unnest(range(1, len(w) - 6)) AS t(gi)
       |  WHERE len(w) >= 8),
       |t AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY source),
       |s AS (SELECT DISTINCT source FROM documents),
       |p AS (SELECT a.source AS sa, b.source AS sb FROM s a JOIN s b ON a.source < b.source),
       |sh AS (
       |  SELECT x.source AS sa, y.source AS sb, CAST(count(*) AS BIGINT) AS c
       |  FROM g x JOIN g y ON x.h = y.h AND x.source < y.source GROUP BY 1, 2)
       |SELECT p.sa AS source_a, p.sb AS source_b,
       |  CAST(coalesce(sh.c, 0) AS BIGINT) AS shared_grams,
       |  CASE WHEN coalesce(ta.n, 0) + coalesce(tb.n, 0) - coalesce(sh.c, 0) = 0
       |    THEN 0.0
       |    ELSE round(CAST(coalesce(sh.c, 0) AS DOUBLE)
       |      / CAST(coalesce(ta.n, 0) + coalesce(tb.n, 0) - coalesce(sh.c, 0) AS DOUBLE), 6)
       |  END AS jaccard
       |FROM p LEFT JOIN t ta ON ta.source = p.sa LEFT JOIN t tb ON tb.source = p.sb
       |LEFT JOIN sh ON sh.sa = p.sa AND sh.sb = p.sb
       |ORDER BY source_a, source_b""".stripMargin
  }

  /** Per-source token-distribution drift (mirrors `CorpusDiff.driftReport`
    * over corpus_diff's two overlapping cuts): add-one-smoothed unigram
    * KL(new ‖ old) on the union vocabulary, per-term contributions
    * quantized to integer picos before summing.
    */
  def corpusDrift: String =
    s"""WITH oc AS (
       |  SELECT source, tok, CAST(count(*) AS BIGINT) AS co FROM (
       |    SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |    FROM documents WHERE doc_id % 10 <> 3)
       |  GROUP BY source, tok),
       |nc AS (
       |  SELECT source, tok, CAST(count(*) AS BIGINT) AS cn FROM (
       |    SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |    FROM documents WHERE doc_id % 7 <> 2)
       |  GROUP BY source, tok),
       |j AS (
       |  SELECT coalesce(oc.source, nc.source) AS source,
       |    coalesce(oc.tok, nc.tok) AS tok,
       |    coalesce(co, 0) AS co, coalesce(cn, 0) AS cn
       |  FROM oc FULL OUTER JOIN nc ON oc.source = nc.source AND oc.tok = nc.tok),
       |t AS (
       |  SELECT source, CAST(sum(co) AS BIGINT) AS o, CAST(sum(cn) AS BIGINT) AS n,
       |    CAST(count(*) AS BIGINT) AS v
       |  FROM j GROUP BY source),
       |c AS (
       |  SELECT j.source, t.o, t.n, t.v,
       |    CAST(floor(
       |      (CAST(cn + 1 AS DOUBLE) / CAST(t.n + t.v AS DOUBLE))
       |        * ln((CAST(cn + 1 AS DOUBLE) / CAST(t.n + t.v AS DOUBLE))
       |              / (CAST(co + 1 AS DOUBLE) / CAST(t.o + t.v AS DOUBLE)))
       |        * 1e12 + 0.5) AS BIGINT) AS contrib
       |  FROM j JOIN t ON t.source = j.source)
       |SELECT source, max(o) AS n_tokens_old, max(n) AS n_tokens_new,
       |  max(v) AS vocab_union,
       |  CAST(CAST(sum(contrib) AS BIGINT) AS DOUBLE) / 1e12 AS kl
       |FROM c GROUP BY source ORDER BY source""".stripMargin

  /** Streaming drift fold (mirrors the `corpus_drift_stream` 3-epoch fold
    * of `DriftMonitor`): epoch e scored against the union of epochs < e,
    * same pico-quantized KL arithmetic per block.
    */
  def corpusDriftStream: String = {
    def block(e: Int): String =
      s"""oc$e AS (
         |  SELECT source, tok, CAST(count(*) AS BIGINT) AS co FROM (
         |    SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
         |    FROM documents WHERE doc_id % 3 < $e)
         |  GROUP BY source, tok),
         |nc$e AS (
         |  SELECT source, tok, CAST(count(*) AS BIGINT) AS cn FROM (
         |    SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
         |    FROM documents WHERE doc_id % 3 = $e)
         |  GROUP BY source, tok),
         |j$e AS (
         |  SELECT coalesce(oc$e.source, nc$e.source) AS source,
         |    coalesce(oc$e.tok, nc$e.tok) AS tok,
         |    coalesce(co, 0) AS co, coalesce(cn, 0) AS cn
         |  FROM oc$e FULL OUTER JOIN nc$e
         |    ON oc$e.source = nc$e.source AND oc$e.tok = nc$e.tok),
         |t$e AS (
         |  SELECT source, CAST(sum(co) AS BIGINT) AS o, CAST(sum(cn) AS BIGINT) AS n,
         |    CAST(count(*) AS BIGINT) AS v
         |  FROM j$e GROUP BY source),
         |c$e AS (
         |  SELECT j$e.source, t$e.o, t$e.n, t$e.v,
         |    CAST(floor(
         |      (CAST(cn + 1 AS DOUBLE) / CAST(t$e.n + t$e.v AS DOUBLE))
         |        * ln((CAST(cn + 1 AS DOUBLE) / CAST(t$e.n + t$e.v AS DOUBLE))
         |              / (CAST(co + 1 AS DOUBLE) / CAST(t$e.o + t$e.v AS DOUBLE)))
         |        * 1e12 + 0.5) AS BIGINT) AS contrib
         |  FROM j$e JOIN t$e ON t$e.source = j$e.source),
         |r$e AS (
         |  SELECT source, max(o) AS n_tokens_old, max(n) AS n_tokens_new,
         |    max(v) AS vocab_union,
         |    CAST(CAST(sum(contrib) AS BIGINT) AS DOUBLE) / 1e12 AS kl,
         |    CAST($e AS BIGINT) AS epoch
         |  FROM c$e GROUP BY source)""".stripMargin
    s"""WITH ${(0 until 3).map(block).mkString(",\n")}
       |SELECT * FROM r0 UNION ALL SELECT * FROM r1 UNION ALL SELECT * FROM r2
       |ORDER BY epoch, source""".stripMargin
  }

  /** SimHash near-duplicate pairs over word-3-gram shingles, hamming <= 11
    * via a `maxHamming + 1` evenly-split chunk join (mirrors
    * `Dedup.simhash`/`simhashPairs` incl. the shared chunk bounds).
    */
  def simhashPairs: String = {
    val maxHamming = 11
    val chunkRows = graft.operators.Dedup.chunkBounds(maxHamming + 1).zipWithIndex
      .map { case ((lo, width), k) => s"($k, $lo, ${(1L << width) - 1L})" }
      .mkString(", ")
    s"""WITH tokw AS (
       |  SELECT doc_id, $Tok AS w FROM documents
       |), tok AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-1),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS t
       |  FROM tokw WHERE len(w) >= 3
       |), hh AS (
       |  SELECT doc_id,
       |    ${ph("t")}
       |    + ${ph("t", mult = 131L, prime = 2147483629L)} * 2147483648 AS h
       |  FROM tok
       |), bits AS (
       |  SELECT doc_id, u.j,
       |    sum(CASE WHEN (h >> CAST(u.j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS bs
       |  FROM hh, unnest(range(${graft.operators.Dedup.SimhashBits})) AS u(j)
       |  GROUP BY doc_id, u.j
       |), sig AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN bs >= 0 THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM bits GROUP BY doc_id
       |), chunks AS (
       |  SELECT doc_id, simhash, ch.k, (simhash >> CAST(ch.lo AS INT)) & ch.mask AS chunk
       |  FROM sig, (VALUES $chunkRows) AS ch(k, lo, mask)
       |)
       |SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
       |  CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
       |FROM chunks x JOIN chunks y ON x.k = y.k AND x.chunk = y.chunk AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin
  }

  private val Nrm =
    """sqrt(list_sum(list_transform(range(1, len(embedding)+1),
      |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))""".stripMargin

  /** Hyperplane-LSH bucketed top-k ANN: 8 tables x 6 planes, candidates
    * unioned across tables, queries additionally MULTI-PROBE the buckets
    * reached by flipping their 3 smallest-|margin| sign bits per table
    * (mirrors `Similarity.lshTopK` with multiProbe=3 — ranked from the
    * same dots CTE the signature derives from), queries vec_id < 10, k=5.
    */
  /** PCA oracle: the exact-covariance pipeline (emb_covariance's CTEs)
    * mirrored to a full matrix, then 8 recursive power-iteration rounds —
    * matvec, norm, micro-quantize — each arithmetically identical to
    * `Clustering.pcaPower`'s driver loop (sequential index-order sums,
    * same division order), so the replay is bit-exact. The matvec list
    * appears three times because DuckDB lambdas cannot hold subqueries
    * and the recursive SELECT cannot alias it; `cmat` is MATERIALIZED so
    * the covariance runs once, not once per round.
    */
  private def pcaPowerOracle: String = {
    val y = "list_transform(range(1,65), i -> " +
      "list_sum(list_transform(range(1,65), j -> m[i][j] * v[j])))"
    s"""WITH RECURSIVE p AS MATERIALIZED (
       |  SELECT CAST(ui.i AS BIGINT) AS pos_i, CAST(uj.j AS BIGINT) AS pos_j,
       |    CAST(sum(CAST(floor(CAST(e.embedding[CAST(ui.i AS INT)+1] AS DOUBLE)
       |      * CAST(e.embedding[CAST(uj.j AS INT)+1] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS pq,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM embeddings e,
       |    unnest(range(len(e.embedding))) AS ui(i),
       |    unnest(range(len(e.embedding))) AS uj(j)
       |  WHERE uj.j >= ui.i GROUP BY 1, 2),
       |s AS MATERIALIZED (
       |  SELECT CAST(u.i AS BIGINT) AS pos,
       |    CAST(sum(CAST(floor(CAST(e.embedding[CAST(u.i AS INT)+1] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sx
       |  FROM embeddings e, unnest(range(len(e.embedding))) AS u(i) GROUP BY 1),
       |ctri AS (
       |  SELECT p.pos_i, p.pos_j,
       |    round(CAST(pq AS DOUBLE) / (n * 1e6)
       |      - (CAST(si.sx AS DOUBLE) / (n * 1e6)) * (CAST(sj.sx AS DOUBLE) / (n * 1e6)), 9) AS cov
       |  FROM p JOIN s si ON si.pos = p.pos_i JOIN s sj ON sj.pos = p.pos_j),
       |cfull AS (
       |  SELECT pos_i, pos_j, cov FROM ctri
       |  UNION ALL
       |  SELECT pos_j, pos_i, cov FROM ctri WHERE pos_i != pos_j),
       |cm AS (SELECT pos_i AS i, list(cov ORDER BY pos_j) AS r FROM cfull GROUP BY pos_i),
       |cmat AS MATERIALIZED (SELECT list(r ORDER BY i) AS m FROM cm),
       |it(k, v, nrm) AS (
       |  SELECT 0, list_transform(range(64), x -> 0.125e0), CAST(0 AS DOUBLE)
       |  UNION ALL
       |  SELECT k + 1,
       |    list_transform($y, x ->
       |      CAST(floor(x / sqrt(list_sum(list_transform($y, z -> z*z))) * 1e6 + 0.5) AS BIGINT) / 1e6),
       |    sqrt(list_sum(list_transform($y, z -> z*z)))
       |  FROM it, cmat WHERE k < 8
       |)
       |SELECT CAST(u.i AS BIGINT) AS pos, v[CAST(u.i AS INT)+1] AS loading,
       |  CAST(floor(nrm*1e6+0.5) AS BIGINT) AS lambda_micro
       |FROM it, unnest(range(64)) AS u(i) WHERE k = 8 ORDER BY pos""".stripMargin
  }

  /** Top-k PCA oracle: the [[pcaPowerOracle]] pipeline generalized to a
    * (component, round) state machine — the recursion carries the matrix
    * itself so each component's 8 power rounds run on the DEFLATED
    * covariance `C −= λ v vᵀ` of the previous component, using the
    * quantized (λ, v) pair exactly as `Clustering.pcaTopK` emits them
    * (floor(nrm·1e6+0.5)/1e6 and the micro-quantized iterate), so every
    * matvec, normalization, and deflation replays bit-for-bit.
    */
  private def pcaTopKOracle: String =
    s"""$pcaChainCtes
       |SELECT CAST(c AS BIGINT) AS component, CAST(u.i AS BIGINT) AS pos,
       |  v[CAST(u.i AS INT)+1] AS loading,
       |  CAST(floor(nrm*1e6+0.5) AS BIGINT) AS lambda_micro
       |FROM it, unnest(range(64)) AS u(i) WHERE k = 8
       |ORDER BY component, pos""".stripMargin

  /** PCA-whitening oracle: the deflation-chain CTEs, then each vector's
    * centered projection onto every component over the quantized mean
    * (sx/(n·1e6)) and loadings, scaled by 1/sqrt(λ) — index-order
    * list_sum matches the engine's left fold, round 9 like the engine.
    */
  private def pcaWhitenOracle: String =
    s"""$pcaChainCtes,
       |comps AS (SELECT c, v, floor(nrm*1e6+0.5)/1e6 AS lam FROM it WHERE k = 8),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
       |mean AS (
       |  SELECT list(x ORDER BY pos) AS m FROM (
       |    SELECT s.pos, CAST(s.sx AS DOUBLE) / (nn.n * 1e6) AS x FROM s, nn))
       |SELECT e.vec_id, CAST(comps.c AS BIGINT) AS component,
       |  round(list_sum(list_transform(range(1, 65),
       |    i -> (CAST(e.embedding[i] AS DOUBLE) - mean.m[i]) * comps.v[i]))
       |    / sqrt(comps.lam), 9) AS w
       |FROM embeddings e, comps, mean
       |ORDER BY vec_id, component""".stripMargin

  /** The shared top-k PCA pipeline: exact covariance CTEs + the
    * (component, round) recursive deflation state machine, ending at the
    * `it` CTE — suffix SELECTs specialize it (loadings vs whitening).
    */
  private def pcaChainCtes: String = {
    val y = "list_transform(range(1,65), i -> " +
      "list_sum(list_transform(range(1,65), j -> m[i][j] * v[j])))"
    s"""WITH RECURSIVE p AS MATERIALIZED (
       |  SELECT CAST(ui.i AS BIGINT) AS pos_i, CAST(uj.j AS BIGINT) AS pos_j,
       |    CAST(sum(CAST(floor(CAST(e.embedding[CAST(ui.i AS INT)+1] AS DOUBLE)
       |      * CAST(e.embedding[CAST(uj.j AS INT)+1] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS pq,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM embeddings e,
       |    unnest(range(len(e.embedding))) AS ui(i),
       |    unnest(range(len(e.embedding))) AS uj(j)
       |  WHERE uj.j >= ui.i GROUP BY 1, 2),
       |s AS MATERIALIZED (
       |  SELECT CAST(u.i AS BIGINT) AS pos,
       |    CAST(sum(CAST(floor(CAST(e.embedding[CAST(u.i AS INT)+1] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sx
       |  FROM embeddings e, unnest(range(len(e.embedding))) AS u(i) GROUP BY 1),
       |ctri AS (
       |  SELECT p.pos_i, p.pos_j,
       |    round(CAST(pq AS DOUBLE) / (n * 1e6)
       |      - (CAST(si.sx AS DOUBLE) / (n * 1e6)) * (CAST(sj.sx AS DOUBLE) / (n * 1e6)), 9) AS cov
       |  FROM p JOIN s si ON si.pos = p.pos_i JOIN s sj ON sj.pos = p.pos_j),
       |cfull AS (
       |  SELECT pos_i, pos_j, cov FROM ctri
       |  UNION ALL
       |  SELECT pos_j, pos_i, cov FROM ctri WHERE pos_i != pos_j),
       |cm AS (SELECT pos_i AS i, list(cov ORDER BY pos_j) AS r FROM cfull GROUP BY pos_i),
       |cmat AS MATERIALIZED (SELECT list(r ORDER BY i) AS m FROM cm),
       |it(c, k, m, v, nrm) AS (
       |  SELECT 0, 0, m, list_transform(range(64), x -> 0.125e0), CAST(0 AS DOUBLE)
       |  FROM cmat
       |  UNION ALL
       |  SELECT
       |    CASE WHEN k < 8 THEN c ELSE c + 1 END,
       |    CASE WHEN k < 8 THEN k + 1 ELSE 0 END,
       |    CASE WHEN k < 8 THEN m
       |         ELSE list_transform(range(1,65), di -> list_transform(range(1,65), dj ->
       |           m[di][dj] - (floor(nrm*1e6+0.5)/1e6) * v[di] * v[dj])) END,
       |    CASE WHEN k < 8 THEN list_transform($y, x ->
       |           CAST(floor(x / sqrt(list_sum(list_transform($y, z -> z*z))) * 1e6 + 0.5) AS BIGINT) / 1e6)
       |         ELSE list_transform(range(64), x -> 0.125e0) END,
       |    CASE WHEN k < 8 THEN sqrt(list_sum(list_transform($y, z -> z*z)))
       |         ELSE CAST(0 AS DOUBLE) END
       |  FROM it WHERE k < 8 OR c < 1
       |)""".stripMargin
  }

  /** Streaming-retention oracle: the epoch-e block is the BATCH cohort
    * retention over the 10-day prefix — the fold invariant
    * `EventAnalytics.retentionIncremental` guarantees for time-ordered
    * batches.
    */
  private def retentionStreamOracle: String = {
    val t0 = 1704067200000000L
    val d = 864000000000L
    val blocks = (0 until 3).map { e =>
      val cut = if (e < 2) s"WHERE us < ${t0 + (e + 1) * d}" else ""
      s"""f$e AS (SELECT u, min(us) // 604800000000 AS cw FROM t $cut GROUP BY u),
         |a$e AS (SELECT DISTINCT u, us // 604800000000 AS w FROM t $cut),
         |r$e AS (
         |  SELECT CAST($e AS BIGINT) AS epoch, CAST(f.cw AS BIGINT) AS cohort_week,
         |    CAST(a.w - f.cw AS BIGINT) AS week_offset,
         |    CAST(count(*) AS BIGINT) AS n_users
         |  FROM a$e a JOIN f$e f ON a.u = f.u GROUP BY 1, 2, 3)""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (SELECT user_id AS u, epoch_us(ts) AS us FROM events),
       |$blocks
       |SELECT * FROM (
       |SELECT * FROM r0 UNION ALL SELECT * FROM r1 UNION ALL SELECT * FROM r2)
       |ORDER BY epoch, cohort_week, week_offset""".stripMargin
  }

  /** Streaming-funnel oracle: the epoch-e block is the BATCH funnel over
    * the 10-day prefix `t < T0 + (e+1)*d` (epoch 2 = everything) — the
    * fold invariant `EventAnalytics.funnelIncremental` guarantees for
    * time-partitioned batches.
    */
  private def funnelStreamOracle: String = {
    val t0 = 1704067200000000L
    val d = 864000000000L
    val chains = (0 until 3).map { e =>
      val cut = if (e < 2) s"AND t < ${t0 + (e + 1) * d}" else ""
      val cutEv = if (e < 2) s"AND ev.t < ${t0 + (e + 1) * d}" else ""
      s"""p${e}s1 AS (SELECT u, min(t) AS t1 FROM ev WHERE et = 'signup' $cut GROUP BY u),
         |p${e}s2 AS (SELECT ev.u, min(ev.t) AS t2 FROM ev JOIN p${e}s1 ON ev.u = p${e}s1.u
         |  WHERE ev.et = 'view' AND ev.t > p${e}s1.t1 $cutEv GROUP BY ev.u),
         |p${e}s3 AS (SELECT ev.u, min(ev.t) AS t3 FROM ev JOIN p${e}s2 ON ev.u = p${e}s2.u
         |  WHERE ev.et = 'purchase' AND ev.t > p${e}s2.t2 $cutEv GROUP BY ev.u)""".stripMargin
    }.mkString(",\n")
    val rows = (0 until 3).flatMap { e =>
      Seq(
        s"SELECT CAST($e AS BIGINT) AS epoch, CAST(1 AS BIGINT) AS step, " +
          s"'signup' AS event_type, CAST(count(*) AS BIGINT) AS n_users FROM p${e}s1",
        s"SELECT CAST($e AS BIGINT), CAST(2 AS BIGINT), 'view', CAST(count(*) AS BIGINT) FROM p${e}s2",
        s"SELECT CAST($e AS BIGINT), CAST(3 AS BIGINT), 'purchase', CAST(count(*) AS BIGINT) FROM p${e}s3")
    }.mkString("\nUNION ALL\n")
    s"""WITH ev AS (SELECT user_id AS u, event_type AS et, epoch_us(ts) AS t FROM events),
       |$chains
       |SELECT * FROM (
       |$rows)
       |ORDER BY epoch, step""".stripMargin
  }

  def lshTopK: String =
    s"""WITH n AS (
       |  SELECT vec_id, embedding, $Nrm AS nrm FROM embeddings
       |), dots AS (
       |  SELECT e.vec_id, u.p // 6 AS t, u.p % 6 AS j,
       |    list_sum(list_transform(range(1, len(e.embedding)+1),
       |      i -> CAST(e.embedding[i] AS DOUBLE) *
       |           (CAST(((u.p*1000003 + (i-1)) * 2654435761 + 12345) % 1000000 AS DOUBLE)
       |            / 1000000.0 - 0.5))) AS d
       |  FROM embeddings e, unnest(range(48)) AS u(p)
       |), sig AS (
       |  SELECT vec_id, t,
       |    CAST(sum(CASE WHEN d > 0 THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS b
       |  FROM dots GROUP BY vec_id, t
       |), qflip AS (
       |  SELECT vec_id, t, j FROM (
       |    SELECT vec_id, t, j,
       |      row_number() OVER (PARTITION BY vec_id, t ORDER BY abs(d) ASC, j ASC) AS rn
       |    FROM dots WHERE vec_id < 10)
       |  WHERE rn <= 3
       |), qsig AS (
       |  SELECT vec_id, t, b FROM sig WHERE vec_id < 10
       |  UNION ALL
       |  SELECT s.vec_id, s.t, CAST(xor(s.b, 1::BIGINT << CAST(f.j AS INT)) AS BIGINT) AS b
       |  FROM sig s JOIN qflip f ON f.vec_id = s.vec_id AND f.t = s.t
       |  WHERE s.vec_id < 10
       |), cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM sig c JOIN qsig q ON q.t = c.t AND q.b = c.b
       |    AND c.vec_id != q.vec_id
       |), scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    round(list_sum(list_transform(range(1, len(q.embedding)+1),
       |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
       |      / (q.nrm * c.nrm), 9) AS cos_sim
       |  FROM cand JOIN n c ON c.vec_id = cand.neighbor_id
       |            JOIN n q ON q.vec_id = cand.query_id
       |), r AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS "rank"
       |  FROM scored)
       |SELECT query_id, "rank", neighbor_id, cos_sim FROM r
       |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin

  /** Embedding near-dup pairs at cos >= 0.42 via the 8x6 hyperplane-LSH
    * candidate buckets (mirrors `Similarity.cosineNearDupPairs`: candidates
    * from a shared bucket in >= 1 table, exact re-scoring, threshold
    * filter). The oracle replays the bucket pipeline, so the approximate
    * RECALL of the candidate generator is pinned too, not just precision.
    */
  def cosineNearDup: String =
    s"""WITH n AS (
       |  SELECT vec_id, embedding, $Nrm AS nrm FROM embeddings
       |), dots AS (
       |  SELECT e.vec_id, u.p // 6 AS t, u.p % 6 AS j,
       |    list_sum(list_transform(range(1, len(e.embedding)+1),
       |      i -> CAST(e.embedding[i] AS DOUBLE) *
       |           (CAST(((u.p*1000003 + (i-1)) * 2654435761 + 12345) % 1000000 AS DOUBLE)
       |            / 1000000.0 - 0.5))) AS d
       |  FROM embeddings e, unnest(range(48)) AS u(p)
       |), sig AS (
       |  SELECT vec_id, t,
       |    CAST(sum(CASE WHEN d > 0 THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS b
       |  FROM dots GROUP BY vec_id, t
       |), cand AS (
       |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM sig x JOIN sig y ON x.t = y.t AND x.b = y.b AND x.vec_id < y.vec_id
       |), scored AS (
       |  SELECT cand.id_a, cand.id_b,
       |    round(list_sum(list_transform(range(1, len(a.embedding)+1),
       |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
       |      / (a.nrm * b.nrm), 9) AS cos_sim
       |  FROM cand JOIN n a ON a.vec_id = cand.id_a
       |            JOIN n b ON b.vec_id = cand.id_b)
       |SELECT id_a, id_b, cos_sim FROM scored
       |WHERE cos_sim >= 0.42 ORDER BY id_a, id_b""".stripMargin

  /** SemDeDup semantic dedup (mirrors `Similarity.semanticDedup`,
    * minCos=0.42, nlist=16): nearest lowest-id centroid assignment (same
    * CTE as [[ivfTopK]]), within-cluster smaller-id τ-neighbor scan, keeper
    * = no such neighbor.
    */
  def semanticDedup: String =
    s"""WITH n AS (
       |  SELECT vec_id AS id, embedding AS v, $Nrm AS nrm FROM embeddings
       |), cent AS (
       |  SELECT id AS cid, v AS cv, nrm AS cnrm FROM n ORDER BY id LIMIT 16
       |), ca AS (
       |  SELECT id, v, nrm, cid FROM (
       |    SELECT n.id, n.v, n.nrm, c.cid,
       |      row_number() OVER (PARTITION BY n.id ORDER BY
       |        list_sum(list_transform(range(1, len(n.v)+1),
       |          i -> CAST(n.v[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE))) / (n.nrm * c.cnrm) DESC,
       |        c.cid ASC) AS crank
       |    FROM n CROSS JOIN cent c)
       |  WHERE crank = 1
       |), dup AS (
       |  SELECT DISTINCT a.id
       |  FROM ca a JOIN ca b ON a.cid = b.cid AND b.id < a.id
       |  WHERE round(list_sum(list_transform(range(1, len(a.v)+1),
       |      i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE))) / (a.nrm * b.nrm), 9)
       |    >= 0.42
       |)
       |SELECT ca.id AS vec_id, ca.cid, (dup.id IS NULL) AS is_kept
       |FROM ca LEFT JOIN dup ON dup.id = ca.id
       |ORDER BY vec_id""".stripMargin

  /** IVF top-k ANN: nlist=16 lowest-id centroids, nprobe=4, k=5. */
  def ivfTopK: String = ivfTopKWhere("TRUE")

  /** POST-filter over the UNFILTERED [[ivfTopK]] — the semantics of a
    * non-pushable predicate (e.g. a subquery WHERE) above the serving
    * TVF: the top-k is computed first, then rows whose neighbor fails
    * `neighborPred` (over alias `e` = the neighbor's embeddings row) are
    * dropped — rank gaps survive, k may under-fill. Contrast
    * [[ivfTopKWhere]], where serving itself is restricted.
    */
  def ivfTopKPostWhere(neighborPred: String): String =
    annPostWhere(ivfTopK, neighborPred)

  /** The same post-filter shape over ANY unfiltered ANN probe — shared by
    * the float/SQ8/PQ subquery-WHERE oracles so every rung of the memory
    * ladder pins identical non-pushable-predicate semantics.
    */
  private def annPostWhere(inner: String, neighborPred: String): String =
    s"""SELECT t.query_id, t."rank", t.neighbor_id, t.cos_sim
       |FROM (${inner.replace("\n", "\n  ")}) t
       |JOIN embeddings e ON e.vec_id = t.neighbor_id
       |WHERE $neighborPred
       |ORDER BY t.query_id, t."rank"""".stripMargin

  /** Subquery-WHERE over the SQ8 TVF: post-filter of [[ivfTopKSq8]]. */
  def ivfTopKSq8PostWhere(neighborPred: String): String =
    annPostWhere(ivfTopKSq8, neighborPred)

  /** Subquery-WHERE over the PQ TVF: post-filter of [[ivfTopKPq]]. */
  def ivfTopKPqPostWhere(neighborPred: String): String =
    annPostWhere(ivfTopKPq, neighborPred)

  /** [[ivfTopK]] with the SERVED corpus restricted by `corpusPred` while
    * the coarse quantizer stays the FULL corpus's lowest-16 — exactly the
    * tombstone-delete semantics (`IvfIndex.delete`): deleted vectors leave
    * serving, the frozen centroids do not move.
    */
  def ivfTopKWhere(corpusPred: String): String = ivfTopKWhere(corpusPred, 4)

  /** [[ivfTopKWhere]] with a caller-chosen `nprobe` — the recall-curve
    * oracle sweeps it while everything else stays the standard probe.
    */
  def ivfTopKWhere(corpusPred: String, nprobe: Int): String =
    s"""WITH n AS (
       |  SELECT vec_id AS id, embedding AS v, $Nrm AS nrm, label FROM embeddings
       |), cent AS (
       |  SELECT id AS cid, v AS cv, nrm AS cnrm FROM n ORDER BY id LIMIT 16
       |), ca AS (
       |  SELECT id, v, nrm, cid FROM (
       |    SELECT n.id, n.v, n.nrm, c.cid,
       |      row_number() OVER (PARTITION BY n.id ORDER BY
       |        list_sum(list_transform(range(1, len(n.v)+1),
       |          i -> CAST(n.v[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE))) / (n.nrm * c.cnrm) DESC,
       |        c.cid ASC) AS crank
       |    FROM n CROSS JOIN cent c WHERE $corpusPred)
       |  WHERE crank = 1
       |), qa AS (
       |  SELECT id, v, nrm, cid FROM (
       |    SELECT n.id, n.v, n.nrm, c.cid,
       |      row_number() OVER (PARTITION BY n.id ORDER BY
       |        list_sum(list_transform(range(1, len(n.v)+1),
       |          i -> CAST(n.v[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE))) / (n.nrm * c.cnrm) DESC,
       |        c.cid ASC) AS crank
       |    FROM n CROSS JOIN cent c WHERE n.id < 10)
       |  WHERE crank <= $nprobe
       |), scored AS (
       |  SELECT q.id AS query_id, c.id AS neighbor_id,
       |    round(list_sum(list_transform(range(1, len(q.v)+1),
       |      i -> CAST(q.v[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE))) / (q.nrm * c.nrm), 9) AS cos_sim
       |  FROM ca c JOIN qa q ON q.cid = c.cid AND c.id != q.id
       |), r AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS "rank"
       |  FROM scored)
       |SELECT DISTINCT query_id, "rank", neighbor_id, cos_sim FROM r
       |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin

  /** The recall curve (mirrors the `sim_topk_ivf_recall` query): for each
    * nprobe, micro-averaged recall@5 of [[ivfTopKWhere]] against the
    * brute-force ground truth — the latency-vs-quality trade measured
    * in-engine.
    */
  def ivfRecallCurve(nprobes: Seq[Int]): String = {
    val per = nprobes.map { np =>
      s"""SELECT CAST($np AS BIGINT) AS nprobe,
         |  CAST(count(*) AS BIGINT) AS n_true,
         |  CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
         |  CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS recall
         |FROM bf LEFT JOIN (
         |  SELECT query_id, neighbor_id
         |  FROM (${ivfTopKWhere("TRUE", np).replace("\n", "\n  ")}) t$np
         |) i ON i.query_id = bf.query_id AND i.neighbor_id = bf.neighbor_id""".stripMargin
    }
    s"""WITH bfn AS (
       |  SELECT vec_id AS id, embedding AS v, $Nrm AS nrm FROM embeddings
       |), bfs AS (
       |  SELECT q.id AS query_id, c.id AS neighbor_id,
       |    round(list_sum(list_transform(range(1, len(q.v)+1),
       |      i -> CAST(q.v[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE))) / (q.nrm * c.nrm), 9) AS cos_sim
       |  FROM bfn q JOIN bfn c ON q.id < 10 AND c.id != q.id
       |), bfr AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
       |  FROM bfs
       |), bf AS (SELECT query_id, neighbor_id FROM bfr WHERE rnk <= 5)
       |SELECT * FROM (
       |${per.mkString("\nUNION ALL\n")}
       |) ORDER BY nprobe""".stripMargin
  }

  /** CTE chain replaying `Clustering.kmeansTrain(k, iters)`: lowest-id
    * init, cosine argmax assignment with ties to the lowest cid,
    * exact-integer scaled-mean update, empty clusters keeping their
    * previous centroid. Emits CTEs `n`, `cent0` .. `cent$iters`; each
    * `cent$i` carries (cid, cv DOUBLE[], cnrm, cnt) with `cnt` the member
    * count of the update that produced it.
    */
  private def kmeansCtes(k: Int, iters: Int): String = {
    val init =
      s"""n AS (
         |  SELECT vec_id AS id, embedding AS v, $Nrm AS nrm FROM embeddings
         |), cent0 AS (
         |  SELECT id AS cid, list_transform(v, e -> CAST(e AS DOUBLE)) AS cv,
         |    nrm AS cnrm, CAST(0 AS BIGINT) AS cnt
         |  FROM n ORDER BY id LIMIT $k
         |)""".stripMargin
    val steps = (1 to iters).map { i =>
      s""", a$i AS (
         |  SELECT id, v, nrm, cid FROM (
         |    SELECT n.id, n.v, n.nrm, c.cid,
         |      row_number() OVER (PARTITION BY n.id ORDER BY
         |        list_sum(list_transform(range(1, len(n.v)+1),
         |          jj -> CAST(n.v[jj] AS DOUBLE) * c.cv[jj])) / (n.nrm * c.cnrm) DESC,
         |        c.cid ASC) AS crank
         |    FROM n CROSS JOIN cent${i - 1} c)
         |  WHERE crank = 1
         |), m$i AS (
         |  SELECT cid, CAST(u.j AS BIGINT) - 1 AS pos,
         |    CAST(sum(CAST(floor(CAST(v[CAST(u.j AS INT)] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sx,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM a$i, unnest(range(1, len(v)+1)) AS u(j)
         |  GROUP BY cid, u.j
         |), g$i AS (
         |  SELECT cid, list(CAST(sx AS DOUBLE) / (cnt * 1e6) ORDER BY pos) AS cv,
         |    max(cnt) AS cnt
         |  FROM m$i GROUP BY cid
         |), cent$i AS (
         |  SELECT p.cid, coalesce(g.cv, p.cv) AS cv,
         |    sqrt(list_sum(list_transform(coalesce(g.cv, p.cv), e -> e * e))) AS cnrm,
         |    CAST(coalesce(g.cnt, 0) AS BIGINT) AS cnt
         |  FROM cent${i - 1} p LEFT JOIN g$i g ON g.cid = p.cid
         |)""".stripMargin
    }
    init + steps.mkString
  }

  /** Deterministic k-means centroids (mirrors `Clustering.kmeansCentroids`,
    * k=4 iters=2): one row per (cluster, dimension).
    */
  def kmeansCentroids: String =
    s"""WITH ${kmeansCtes(4, 2)}
       |SELECT c.cid, CAST(u.j AS BIGINT) - 1 AS pos,
       |  c.cv[CAST(u.j AS INT)] AS x, c.cnt AS n
       |FROM cent2 c, unnest(range(1, len(c.cv)+1)) AS u(j)
       |ORDER BY cid, pos""".stripMargin

  /** IVF probe under the TRAINED coarse quantizer (mirrors
    * `IvfIndex.write(trainIters = 2)` + probe, nlist=16 nprobe=4 k=5):
    * the kmeans chain replays the training, then the standard probe tail
    * assigns corpus and queries under the final centroids.
    */
  def ivfTopKTrained: String =
    s"""WITH ${kmeansCtes(16, 2)}, ca AS (
       |  SELECT id, v, nrm, cid FROM (
       |    SELECT n.id, n.v, n.nrm, c.cid,
       |      row_number() OVER (PARTITION BY n.id ORDER BY
       |        list_sum(list_transform(range(1, len(n.v)+1),
       |          jj -> CAST(n.v[jj] AS DOUBLE) * c.cv[jj])) / (n.nrm * c.cnrm) DESC,
       |        c.cid ASC) AS crank
       |    FROM n CROSS JOIN cent2 c)
       |  WHERE crank = 1
       |), qa AS (
       |  SELECT id, v, nrm, cid FROM (
       |    SELECT n.id, n.v, n.nrm, c.cid,
       |      row_number() OVER (PARTITION BY n.id ORDER BY
       |        list_sum(list_transform(range(1, len(n.v)+1),
       |          jj -> CAST(n.v[jj] AS DOUBLE) * c.cv[jj])) / (n.nrm * c.cnrm) DESC,
       |        c.cid ASC) AS crank
       |    FROM n CROSS JOIN cent2 c WHERE n.id < 10)
       |  WHERE crank <= 4
       |), scored AS (
       |  SELECT q.id AS query_id, c.id AS neighbor_id,
       |    round(list_sum(list_transform(range(1, len(q.v)+1),
       |      i -> CAST(q.v[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE))) / (q.nrm * c.nrm), 9) AS cos_sim
       |  FROM ca c JOIN qa q ON q.cid = c.cid AND c.id != q.id
       |), r AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS "rank"
       |  FROM scored)
       |SELECT DISTINCT query_id, "rank", neighbor_id, cos_sim FROM r
       |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin

  /** Quantized-index probe (mirrors `IvfIndex.writeQuantized` +
    * `probeQuantized`, nlist=16 nprobe=4 k=5 candFactor=4): the ivfTopK
    * assignment/probe CTEs select each query's lists, the sim_topk_quantized
    * CTEs quantize, candidates are the int8-cosine top-20 WITHIN the probed
    * lists, and the exact rerank keeps the top-5. All candidate arithmetic
    * is integer-valued, so the cut replays exactly.
    */
  def ivfTopKSq8: String = ivfTopKSq8Where("TRUE")

  /** [[ivfTopKSq8]] with the SERVED corpus restricted by `corpusPred`
    * while quantizer and codebooks stay the full corpus's — mirrors
    * `IvfIndex.probeQuantized(predicate)`: the int8 candidate preselect
    * runs over matching rows only.
    */
  def ivfTopKSq8Where(corpusPred: String): String =
    s"""WITH n AS (
       |  SELECT vec_id AS id, embedding AS v, $Nrm AS nrm, label FROM embeddings
       |), cent AS (
       |  SELECT id AS cid, v AS cv, nrm AS cnrm FROM n ORDER BY id LIMIT 16
       |), ca AS (
       |  SELECT id, cid FROM (
       |    SELECT n.id, c.cid,
       |      row_number() OVER (PARTITION BY n.id ORDER BY
       |        list_sum(list_transform(range(1, len(n.v)+1),
       |          i -> CAST(n.v[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE))) / (n.nrm * c.cnrm) DESC,
       |        c.cid ASC) AS crank
       |    FROM n CROSS JOIN cent c WHERE $corpusPred)
       |  WHERE crank = 1
       |), qa AS (
       |  SELECT id, cid FROM (
       |    SELECT n.id, c.cid,
       |      row_number() OVER (PARTITION BY n.id ORDER BY
       |        list_sum(list_transform(range(1, len(n.v)+1),
       |          i -> CAST(n.v[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE))) / (n.nrm * c.cnrm) DESC,
       |        c.cid ASC) AS crank
       |    FROM n CROSS JOIN cent c WHERE n.id < 10)
       |  WHERE crank <= 4
       |), mx AS (
       |  SELECT vec_id, list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
       |  FROM embeddings),
       |q8 AS (
       |  SELECT e.vec_id,
       |    list_transform(e.embedding, x -> GREATEST(-127, LEAST(127,
       |      CAST(floor(CAST(x AS DOUBLE) /
       |        (CASE WHEN mx.m = 0 THEN 1.0 ELSE mx.m / 127.0 END) + 0.5) AS BIGINT)))) AS qv
       |  FROM embeddings e JOIN mx ON mx.vec_id = e.vec_id),
       |qn AS (
       |  SELECT vec_id, qv,
       |    sqrt(CAST(list_sum(list_transform(range(1, len(qv)+1),
       |      i -> qv[i] * qv[i])) AS DOUBLE)) AS qnrm
       |  FROM q8),
       |qs AS (
       |  SELECT q.id AS query_id, c.id AS neighbor_id,
       |    CAST(list_sum(list_transform(range(1, len(qq.qv)+1),
       |      i -> qq.qv[i] * qc.qv[i])) AS DOUBLE) / (qq.qnrm * qc.qnrm) AS qcos
       |  FROM qa q JOIN ca c ON c.cid = q.cid AND c.id != q.id
       |  JOIN qn qq ON qq.vec_id = q.id JOIN qn qc ON qc.vec_id = c.id),
       |cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id ASC) AS qr
       |    FROM qs) WHERE qr <= 20),
       |s AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    round(list_sum(list_transform(range(1, len(q.v)+1),
       |      i -> CAST(q.v[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE))) / (q.nrm * c.nrm), 9) AS cos_sim
       |  FROM cand JOIN n q ON q.id = cand.query_id JOIN n c ON c.id = cand.neighbor_id),
       |r AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS "rank"
       |  FROM s)
       |SELECT query_id, "rank", neighbor_id, cos_sim FROM r
       |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin

  /** PQ-index probe (mirrors `IvfIndex.writePq` + `probePq`, nlist=16
    * nprobe=4 k=5 candFactor=8, 8 subspaces x 32 codewords over 64 dims):
    * the ivfTopK assignment CTEs pick each query's lists; the codebook is
    * the sub-slices of the 32 lowest-id vectors (the same deterministic
    * convention as the coarse centroids, which is what makes the build
    * replayable); encode is L2 argmin per (vector, subspace) with ties to
    * the lowest code; the ADC estimate is dot(query, reconstruction) over
    * the ordered concatenation of codewords, rounded to 9 dp exactly like
    * the engine so the candidate cut replays; exact rerank keeps the
    * top-5. The reconstruction norm folds per-codeword squared norms in
    * subspace order — the same two-level summation grouping the engine
    * uses, so the doubles agree bit-for-bit.
    */
  def ivfTopKPq: String = ivfTopKPqWhere("TRUE")

  /** [[ivfTopKPq]] with the SERVED corpus restricted by `corpusPred` —
    * mirrors `IvfIndex.probePq(predicate)`: the ADC candidate scan runs
    * over matching rows only, quantizer/codebook stay full-corpus.
    */
  def ivfTopKPqWhere(corpusPred: String): String =
    s"""WITH n AS (
       |  SELECT vec_id AS id, embedding AS v, $Nrm AS nrm, label FROM embeddings
       |), cent AS (
       |  SELECT id AS cid, v AS cv, nrm AS cnrm FROM n ORDER BY id LIMIT 16
       |), ca AS (
       |  SELECT id, cid FROM (
       |    SELECT n.id, c.cid,
       |      row_number() OVER (PARTITION BY n.id ORDER BY
       |        list_sum(list_transform(range(1, len(n.v)+1),
       |          i -> CAST(n.v[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE))) / (n.nrm * c.cnrm) DESC,
       |        c.cid ASC) AS crank
       |    FROM n CROSS JOIN cent c WHERE $corpusPred)
       |  WHERE crank = 1
       |), qa AS (
       |  SELECT id, cid FROM (
       |    SELECT n.id, c.cid,
       |      row_number() OVER (PARTITION BY n.id ORDER BY
       |        list_sum(list_transform(range(1, len(n.v)+1),
       |          i -> CAST(n.v[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE))) / (n.nrm * c.cnrm) DESC,
       |        c.cid ASC) AS crank
       |    FROM n CROSS JOIN cent c WHERE n.id < 10)
       |  WHERE crank <= 4
       |), pqc AS (
       |  SELECT id AS j, v AS w FROM n WHERE id < 32
       |), ms AS (SELECT unnest(range(0, 8)) AS m),
       |enc AS (
       |  SELECT id, m, j FROM (
       |    SELECT e.id, ms.m, c.j,
       |      row_number() OVER (PARTITION BY e.id, ms.m ORDER BY
       |        list_sum(list_transform(range(1, 9),
       |          i -> (CAST(e.v[ms.m*8 + i] AS DOUBLE) - CAST(c.w[ms.m*8 + i] AS DOUBLE))
       |             * (CAST(e.v[ms.m*8 + i] AS DOUBLE) - CAST(c.w[ms.m*8 + i] AS DOUBLE)))) ASC,
       |        c.j ASC) AS r
       |    FROM n e CROSS JOIN ms CROSS JOIN pqc c)
       |  WHERE r = 1
       |), rv AS (
       |  SELECT enc.id,
       |    flatten(list(list_transform(range(1, 9),
       |      i -> CAST(c.w[enc.m*8 + i] AS DOUBLE)) ORDER BY enc.m)) AS rv
       |  FROM enc JOIN pqc c ON c.j = enc.j
       |  GROUP BY enc.id
       |), cwsq AS (
       |  SELECT j, ms.m,
       |    list_sum(list_transform(range(1, 9),
       |      i -> CAST(w[ms.m*8 + i] AS DOUBLE) * CAST(w[ms.m*8 + i] AS DOUBLE))) AS sq
       |  FROM pqc, ms
       |), rn AS (
       |  SELECT enc.id, sqrt(list_sum(list(cwsq.sq ORDER BY enc.m))) AS rnrm
       |  FROM enc JOIN cwsq ON cwsq.j = enc.j AND cwsq.m = enc.m
       |  GROUP BY enc.id
       |), qs AS (
       |  SELECT q.id AS query_id, c.id AS neighbor_id,
       |    round(list_sum(list_transform(range(1, len(qv.v)+1),
       |      i -> CAST(qv.v[i] AS DOUBLE) * rv.rv[i])) / (qv.nrm * rn.rnrm), 9) AS qcos
       |  FROM qa q JOIN ca c ON c.cid = q.cid AND c.id != q.id
       |  JOIN n qv ON qv.id = q.id
       |  JOIN rv ON rv.id = c.id JOIN rn ON rn.id = c.id),
       |cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id ASC) AS qr
       |    FROM qs) WHERE qr <= 40),
       |s AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    round(list_sum(list_transform(range(1, len(q.v)+1),
       |      i -> CAST(q.v[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE))) / (q.nrm * c.nrm), 9) AS cos_sim
       |  FROM cand JOIN n q ON q.id = cand.query_id JOIN n c ON c.id = cand.neighbor_id),
       |r AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS "rank"
       |  FROM s)
       |SELECT query_id, "rank", neighbor_id, cos_sim FROM r
       |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin

  /** [[ivfTopKPq]] with the TRAINED codebook (mirrors
    * `IvfIndex.writePq(pqTrainIters = iters)` + probe): per-subspace Lloyd
    * seeded from the lowest-32 donors — L2 argmin assignment (ties to the
    * lowest code), micro-quantized integer means (`floor(x·1e6 + 0.5)`
    * summed as BIGINTs), emptied codewords keep their previous value —
    * then the standard ADC + exact-rescore probe tail under the final
    * codebook. The same replay structure as [[kmeansCtes]], one level
    * deeper (per (subspace, codeword) instead of per centroid).
    */
  def ivfTopKPqTrained(iters: Int = 2): String = {
    val steps = (1 to iters).map { t =>
      s""", pe$t AS (
         |  SELECT id, m, j FROM (
         |    SELECT e.id, c.m, c.j,
         |      row_number() OVER (PARTITION BY e.id, c.m ORDER BY
         |        list_sum(list_transform(range(1, 9),
         |          i -> (CAST(e.v[c.m*8 + i] AS DOUBLE) - c.w[i])
         |             * (CAST(e.v[c.m*8 + i] AS DOUBLE) - c.w[i]))) ASC,
         |        c.j ASC) AS r
         |    FROM n e CROSS JOIN pqc${t - 1} c)
         |  WHERE r = 1
         |), pm$t AS (
         |  SELECT pe.m, pe.j, CAST(u.i AS BIGINT) AS pos,
         |    CAST(sum(CAST(floor(CAST(e.v[pe.m*8 + CAST(u.i AS INT)] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sx,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM pe$t pe JOIN n e ON e.id = pe.id, unnest(range(1, 9)) AS u(i)
         |  GROUP BY pe.m, pe.j, u.i
         |), pg$t AS (
         |  SELECT m, j, list(CAST(sx AS DOUBLE) / (cnt * 1e6) ORDER BY pos) AS w
         |  FROM pm$t GROUP BY m, j
         |), pqc$t AS (
         |  SELECT p.m, p.j, coalesce(g.w, p.w) AS w
         |  FROM pqc${t - 1} p LEFT JOIN pg$t g ON g.m = p.m AND g.j = p.j
         |)""".stripMargin
    }.mkString
    s"""WITH n AS (
       |  SELECT vec_id AS id, embedding AS v, $Nrm AS nrm, label FROM embeddings
       |), cent AS (
       |  SELECT id AS cid, v AS cv, nrm AS cnrm FROM n ORDER BY id LIMIT 16
       |), ca AS (
       |  SELECT id, cid FROM (
       |    SELECT n.id, c.cid,
       |      row_number() OVER (PARTITION BY n.id ORDER BY
       |        list_sum(list_transform(range(1, len(n.v)+1),
       |          i -> CAST(n.v[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE))) / (n.nrm * c.cnrm) DESC,
       |        c.cid ASC) AS crank
       |    FROM n CROSS JOIN cent c)
       |  WHERE crank = 1
       |), qa AS (
       |  SELECT id, cid FROM (
       |    SELECT n.id, c.cid,
       |      row_number() OVER (PARTITION BY n.id ORDER BY
       |        list_sum(list_transform(range(1, len(n.v)+1),
       |          i -> CAST(n.v[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE))) / (n.nrm * c.cnrm) DESC,
       |        c.cid ASC) AS crank
       |    FROM n CROSS JOIN cent c WHERE n.id < 10)
       |  WHERE crank <= 4
       |), ms AS (SELECT unnest(range(0, 8)) AS m),
       |pqc0 AS (
       |  SELECT ms.m, d.id AS j,
       |    list_transform(range(1, 9), i -> CAST(d.v[ms.m*8 + i] AS DOUBLE)) AS w
       |  FROM (SELECT id, v FROM n WHERE id < 32) d CROSS JOIN ms
       |)$steps,
       |enc AS (
       |  SELECT id, m, j FROM (
       |    SELECT e.id, c.m, c.j,
       |      row_number() OVER (PARTITION BY e.id, c.m ORDER BY
       |        list_sum(list_transform(range(1, 9),
       |          i -> (CAST(e.v[c.m*8 + i] AS DOUBLE) - c.w[i])
       |             * (CAST(e.v[c.m*8 + i] AS DOUBLE) - c.w[i]))) ASC,
       |        c.j ASC) AS r
       |    FROM n e CROSS JOIN pqc$iters c)
       |  WHERE r = 1
       |), rv AS (
       |  SELECT enc.id, flatten(list(c.w ORDER BY enc.m)) AS rv
       |  FROM enc JOIN pqc$iters c ON c.m = enc.m AND c.j = enc.j
       |  GROUP BY enc.id
       |), cwsq AS (
       |  SELECT m, j, list_sum(list_transform(w, x -> x * x)) AS sq FROM pqc$iters
       |), rn AS (
       |  SELECT enc.id, sqrt(list_sum(list(cwsq.sq ORDER BY enc.m))) AS rnrm
       |  FROM enc JOIN cwsq ON cwsq.j = enc.j AND cwsq.m = enc.m
       |  GROUP BY enc.id
       |), qs AS (
       |  SELECT q.id AS query_id, c.id AS neighbor_id,
       |    round(list_sum(list_transform(range(1, len(qv.v)+1),
       |      i -> CAST(qv.v[i] AS DOUBLE) * rv.rv[i])) / (qv.nrm * rn.rnrm), 9) AS qcos
       |  FROM qa q JOIN ca c ON c.cid = q.cid AND c.id != q.id
       |  JOIN n qv ON qv.id = q.id
       |  JOIN rv ON rv.id = c.id JOIN rn ON rn.id = c.id),
       |cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY qcos DESC, neighbor_id ASC) AS qr
       |    FROM qs) WHERE qr <= 40),
       |s AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    round(list_sum(list_transform(range(1, len(q.v)+1),
       |      i -> CAST(q.v[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE))) / (q.nrm * c.nrm), 9) AS cos_sim
       |  FROM cand JOIN n q ON q.id = cand.query_id JOIN n c ON c.id = cand.neighbor_id),
       |r AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS "rank"
       |  FROM s)
       |SELECT query_id, "rank", neighbor_id, cos_sim FROM r
       |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin
  }

  /** Frame sampling metadata over the text-as-bytes payload (ASCII corpus:
    * byte == char): frameLen=32, stride=64, maxFrames=8.
    */
  def frameSample: String =
    s"""WITH f AS (
       |  SELECT doc_id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       |    CASE WHEN strlen(text) >= 32
       |         THEN least(CAST(floor(CAST(strlen(text) - 32 AS DOUBLE) / 64) AS BIGINT), 7) + 1
       |         ELSE 0 END AS n_frames,
       |    text
       |  FROM documents)
       |SELECT doc_id, media_type, n_frames,
       |  CASE WHEN n_frames > 0 THEN md5(substr(text, 1, 32)) ELSE NULL END AS first_frame_checksum
       |FROM f ORDER BY doc_id""".stripMargin

  /** Strided-byte resize stub: stride = max(1, n/64), up to 64 samples. */
  def resizeOracle: String =
    s"""WITH f AS (
       |  SELECT doc_id,
       |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       |    strlen(text) AS n, text
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, media_type, n,
       |    greatest(1, n // 64) AS stride,
       |    CASE WHEN n = 0 THEN 0 ELSE least(64, (n + stride - 1) // stride) END AS nres,
       |    CASE WHEN n = 0 THEN '' ELSE list_aggregate(
       |      list_transform(range(0, nres), i -> substr(text, CAST(i*stride + 1 AS INT), 1)),
       |      'string_agg', '') END AS rz
       |  FROM f)
       |SELECT doc_id, media_type, CAST(nres AS BIGINT) AS resized_n,
       |  md5(rz) AS resized_checksum
       |FROM g ORDER BY doc_id""".stripMargin

  /** Token chunking, chunkSize=32 stride=24 (mirrors `Chunking.chunk`):
    * nChunks = 1 + max(0, ceil((nTok-32)/24)), chunk i = tokens
    * [i*24+1, i*24+32], text rebuilt with single spaces.
    */
  def textChunk: String =
    """WITH tok AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
      |), n AS (
      |  SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n_tok,
      |    1 + greatest(CAST(floor((len(w) - 32 + 23) / 24e0) AS BIGINT), 0) AS n_chunks
      |  FROM tok)
      |SELECT doc_id, CAST(c.i AS BIGINT) AS chunk_id,
      |  CAST(c.i * 24 + 1 AS BIGINT) AS chunk_start,
      |  least(CAST(32 AS BIGINT), n_tok - c.i * 24) AS n_chunk_tokens,
      |  array_to_string(list_slice(w, CAST(c.i*24+1 AS INT), CAST(c.i*24+32 AS INT)), ' ') AS chunk_text
      |FROM n, LATERAL unnest(range(0, n_chunks)) AS c(i)
      |ORDER BY doc_id, chunk_id""".stripMargin

  /** Duplicated 8-gram span coverage (mirrors `Dedup.dupSpanStats`): a
    * position is duplicated iff its 8-gram polyhash occurs in >= 2 docs.
    */
  def dupSpans: String =
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
       |), f AS (
       |  SELECT doc_id, w FROM tok WHERE len(w) >= 8
       |), g0 AS (
       |  SELECT doc_id, t.i AS pos,
       |    concat_ws(' ', w[t.i], w[t.i+1], w[t.i+2], w[t.i+3],
       |                   w[t.i+4], w[t.i+5], w[t.i+6], w[t.i+7]) AS gram
       |  FROM f, LATERAL unnest(range(1, len(w) - 6)) AS t(i)
       |), g AS (
       |  SELECT doc_id, pos, ${wph("gram")} AS h FROM g0
       |), dup AS (
       |  SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2
       |)
       |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_pos,
       |  CAST(count(dup.h) AS BIGINT) AS n_dup_pos,
       |  CAST(count(dup.h) AS DOUBLE) / count(*) AS dup_frac
       |FROM g LEFT JOIN dup ON g.h = dup.h
       |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin

  /** Dup-span removal (mirrors `Dedup.removeDupSpans`, k=8): the same
    * hashed-gram span arithmetic as [[dupSpans]], extended with the
    * canonical-keeper rule (min doc_id per duplicated hash), the k-token
    * cover of each non-canonical occurrence, and the ordered token
    * rebuild.
    */
  def dupSpanRemoval: String =
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
       |), f AS (
       |  SELECT doc_id, w FROM tok WHERE len(w) >= 8
       |), g0 AS (
       |  SELECT doc_id, t.i AS pos,
       |    concat_ws(' ', w[t.i], w[t.i+1], w[t.i+2], w[t.i+3],
       |                   w[t.i+4], w[t.i+5], w[t.i+6], w[t.i+7]) AS gram
       |  FROM f, LATERAL unnest(range(1, len(w) - 6)) AS t(i)
       |), g AS (
       |  SELECT doc_id, pos, ${wph("gram")} AS h FROM g0
       |), dup AS (
       |  SELECT h, min(doc_id) AS keeper FROM g
       |  GROUP BY h HAVING count(DISTINCT doc_id) >= 2
       |), dropped AS (
       |  SELECT DISTINCT g.doc_id, g.pos + u.j AS t
       |  FROM g JOIN dup ON g.h = dup.h AND g.doc_id <> dup.keeper,
       |    unnest(range(0, 8)) AS u(j)
       |), toks AS (
       |  SELECT doc_id, t.i AS t, w[t.i] AS token
       |  FROM tok, LATERAL unnest(range(1, len(w) + 1)) AS t(i)
       |), kept AS (
       |  SELECT doc_id, string_agg(token, ' ' ORDER BY t) AS clean_text,
       |    count(*) AS n_kept
       |  FROM toks WHERE NOT EXISTS (
       |    SELECT 1 FROM dropped
       |    WHERE dropped.doc_id = toks.doc_id AND dropped.t = toks.t)
       |  GROUP BY doc_id)
       |SELECT tok.doc_id, coalesce(clean_text, '') AS clean_text,
       |  CAST(len(w) AS BIGINT) AS n_tokens,
       |  CAST(len(w) - coalesce(n_kept, 0) AS BIGINT) AS n_removed
       |FROM tok LEFT JOIN kept ON kept.doc_id = tok.doc_id
       |ORDER BY tok.doc_id""".stripMargin

  /** Verified span coverage (mirrors `Dedup.dupSpanStatsVerified`): ground
    * truth with NO hash — a position is duplicated iff its raw 8-gram TEXT
    * occurs in >= 2 docs. The Spark side reaches the same answer through
    * hash candidates + gram confirmation; equality here pins that the
    * verification step makes the operator exact under the raw text.
    */
  def dupSpansVerified: String =
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
       |), f AS (
       |  SELECT doc_id, w FROM tok WHERE len(w) >= 8
       |), g AS (
       |  SELECT doc_id, t.i AS pos,
       |    concat_ws(' ', w[t.i], w[t.i+1], w[t.i+2], w[t.i+3],
       |                   w[t.i+4], w[t.i+5], w[t.i+6], w[t.i+7]) AS gram
       |  FROM f, LATERAL unnest(range(1, len(w) - 6)) AS t(i)
       |), dup AS (
       |  SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
       |)
       |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_pos,
       |  CAST(count(dup.gram) AS BIGINT) AS n_dup_pos,
       |  CAST(count(dup.gram) AS DOUBLE) / count(*) AS dup_frac
       |FROM g LEFT JOIN dup ON g.gram = dup.gram
       |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin

  /** Verified span removal (mirrors `Dedup.removeDupSpansVerified`): the
    * [[dupSpanRemoval]] rewrite keyed on the raw gram TEXT (no hash) — the
    * keeper is min(doc_id) over each true gram group.
    */
  def dupSpanRemovalVerified: String =
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
       |), f AS (
       |  SELECT doc_id, w FROM tok WHERE len(w) >= 8
       |), g AS (
       |  SELECT doc_id, t.i AS pos,
       |    concat_ws(' ', w[t.i], w[t.i+1], w[t.i+2], w[t.i+3],
       |                   w[t.i+4], w[t.i+5], w[t.i+6], w[t.i+7]) AS gram
       |  FROM f, LATERAL unnest(range(1, len(w) - 6)) AS t(i)
       |), dup AS (
       |  SELECT gram, min(doc_id) AS keeper FROM g
       |  GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
       |), dropped AS (
       |  SELECT DISTINCT g.doc_id, g.pos + u.j AS t
       |  FROM g JOIN dup ON g.gram = dup.gram AND g.doc_id <> dup.keeper,
       |    unnest(range(0, 8)) AS u(j)
       |), toks AS (
       |  SELECT doc_id, t.i AS t, w[t.i] AS token
       |  FROM tok, LATERAL unnest(range(1, len(w) + 1)) AS t(i)
       |), kept AS (
       |  SELECT doc_id, string_agg(token, ' ' ORDER BY t) AS clean_text,
       |    count(*) AS n_kept
       |  FROM toks WHERE NOT EXISTS (
       |    SELECT 1 FROM dropped
       |    WHERE dropped.doc_id = toks.doc_id AND dropped.t = toks.t)
       |  GROUP BY doc_id)
       |SELECT tok.doc_id, coalesce(clean_text, '') AS clean_text,
       |  CAST(len(w) AS BIGINT) AS n_tokens,
       |  CAST(len(w) - coalesce(n_kept, 0) AS BIGINT) AS n_removed
       |FROM tok LEFT JOIN kept ON kept.doc_id = tok.doc_id
       |ORDER BY tok.doc_id""".stripMargin

  /** Contamination-span removal (mirrors `Decontamination.decontaminateSpans`
    * on the doc_id%10 corpus/benchmark split, k=8): corpus grams whose hash
    * appears among the benchmark's gram hashes mark their k token positions
    * dropped; text is rebuilt from the surviving positions. Same rewrite
    * arithmetic as [[dupSpanRemoval]].
    */
  def decontaminateSpans: String =
    s"""WITH tokAll AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
       |), tok AS (
       |  SELECT doc_id, w FROM tokAll WHERE doc_id % 10 != 7
       |), btok AS (
       |  SELECT w FROM tokAll WHERE doc_id % 10 = 7 AND len(w) >= 8
       |), f AS (
       |  SELECT doc_id, w FROM tok WHERE len(w) >= 8
       |), g0 AS (
       |  SELECT doc_id, t.i AS pos,
       |    concat_ws(' ', w[t.i], w[t.i+1], w[t.i+2], w[t.i+3],
       |                   w[t.i+4], w[t.i+5], w[t.i+6], w[t.i+7]) AS gram
       |  FROM f, LATERAL unnest(range(1, len(w) - 6)) AS t(i)
       |), g AS (
       |  SELECT doc_id, pos, ${wph("gram")} AS h FROM g0
       |), bg0 AS (
       |  SELECT concat_ws(' ', w[t.i], w[t.i+1], w[t.i+2], w[t.i+3],
       |                   w[t.i+4], w[t.i+5], w[t.i+6], w[t.i+7]) AS gram
       |  FROM btok, LATERAL unnest(range(1, len(w) - 6)) AS t(i)
       |), bh AS (
       |  SELECT DISTINCT ${wph("gram")} AS h FROM bg0
       |), dropped AS (
       |  SELECT DISTINCT g.doc_id, g.pos + u.j AS t
       |  FROM g JOIN bh ON g.h = bh.h, unnest(range(0, 8)) AS u(j)
       |), toks AS (
       |  SELECT doc_id, t.i AS t, w[t.i] AS token
       |  FROM tok, LATERAL unnest(range(1, len(w) + 1)) AS t(i)
       |), kept AS (
       |  SELECT doc_id, string_agg(token, ' ' ORDER BY t) AS clean_text,
       |    count(*) AS n_kept
       |  FROM toks WHERE NOT EXISTS (
       |    SELECT 1 FROM dropped
       |    WHERE dropped.doc_id = toks.doc_id AND dropped.t = toks.t)
       |  GROUP BY doc_id)
       |SELECT tok.doc_id, coalesce(clean_text, '') AS clean_text,
       |  CAST(len(w) AS BIGINT) AS n_tokens,
       |  CAST(len(w) - coalesce(n_kept, 0) AS BIGINT) AS n_removed
       |FROM tok LEFT JOIN kept ON kept.doc_id = tok.doc_id
       |ORDER BY tok.doc_id""".stripMargin

  /** Streaming dup-span coverage (mirrors the `dedup_spans_stream`
    * 3-epoch fold of `Dedup.dupSpanStatsIncremental`): a doc's position is
    * duplicated iff its gram hash has been seen in >= 2 distinct docs
    * across epochs <= the doc's OWN epoch (doc_id % 3) — the fold collapses
    * into one per-hash cumulative window evaluated at each doc's epoch.
    */
  def dupSpansStream: String =
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
       |), f AS (
       |  SELECT doc_id, w FROM tok WHERE len(w) >= 8
       |), g0 AS (
       |  SELECT doc_id, t.i AS pos,
       |    concat_ws(' ', w[t.i], w[t.i+1], w[t.i+2], w[t.i+3],
       |                   w[t.i+4], w[t.i+5], w[t.i+6], w[t.i+7]) AS gram
       |  FROM f, LATERAL unnest(range(1, len(w) - 6)) AS t(i)
       |), g AS MATERIALIZED (
       |  SELECT doc_id, doc_id % 3 AS ep, ${wph("gram")} AS h FROM g0
       |), hd AS (
       |  SELECT h, ep, count(DISTINCT doc_id) AS nd FROM g GROUP BY h, ep
       |), hc AS (
       |  SELECT h, ep, sum(nd) OVER (PARTITION BY h ORDER BY ep) AS cnd FROM hd
       |)
       |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_pos,
       |  CAST(count(CASE WHEN hc.cnd >= 2 THEN 1 END) AS BIGINT) AS n_dup_pos,
       |  CAST(count(CASE WHEN hc.cnd >= 2 THEN 1 END) AS DOUBLE) / count(*) AS dup_frac,
       |  CAST(g.doc_id % 3 AS BIGINT) AS epoch
       |FROM g JOIN hc ON g.h = hc.h AND g.ep = hc.ep
       |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin

  /** Streaming span removal (mirrors the `dedup_span_removal_stream`
    * 3-epoch fold of `Dedup.removeDupSpansIncremental`): an occurrence in
    * doc d of epoch e (doc_id % 3) drops iff some doc with a smaller
    * (epoch, doc_id) key carries the same gram hash — the fold's
    * first-seen-keeps + in-batch-min-doc rules collapse into one
    * lexicographic min per hash, computed as two staged aggregates (min
    * epoch, then min doc within that epoch) so NO arithmetic composite key
    * exists to overflow or misorder at any doc_id magnitude.
    */
  def dupSpanRemovalStream: String =
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
       |), f AS (
       |  SELECT doc_id, w FROM tok WHERE len(w) >= 8
       |), g0 AS (
       |  SELECT doc_id, t.i AS pos,
       |    concat_ws(' ', w[t.i], w[t.i+1], w[t.i+2], w[t.i+3],
       |                   w[t.i+4], w[t.i+5], w[t.i+6], w[t.i+7]) AS gram
       |  FROM f, LATERAL unnest(range(1, len(w) - 6)) AS t(i)
       |), g AS MATERIALIZED (
       |  SELECT doc_id, doc_id % 3 AS ep, pos, ${wph("gram")} AS h FROM g0
       |), mk0 AS (
       |  SELECT h, min(ep) AS mep FROM g GROUP BY h
       |), mk AS (
       |  SELECT g.h, mk0.mep, min(g.doc_id) AS mdoc
       |  FROM g JOIN mk0 ON g.h = mk0.h AND g.ep = mk0.mep
       |  GROUP BY g.h, mk0.mep
       |), dropped AS (
       |  SELECT DISTINCT g.doc_id, g.pos + u.j AS t
       |  FROM g JOIN mk ON g.h = mk.h
       |    AND (g.ep > mk.mep OR (g.ep = mk.mep AND g.doc_id > mk.mdoc)),
       |    unnest(range(0, 8)) AS u(j)
       |), toks AS (
       |  SELECT doc_id, t.i AS t, w[t.i] AS token
       |  FROM tok, LATERAL unnest(range(1, len(w) + 1)) AS t(i)
       |), kept AS (
       |  SELECT doc_id, string_agg(token, ' ' ORDER BY t) AS clean_text,
       |    count(*) AS n_kept
       |  FROM toks WHERE NOT EXISTS (
       |    SELECT 1 FROM dropped
       |    WHERE dropped.doc_id = toks.doc_id AND dropped.t = toks.t)
       |  GROUP BY doc_id)
       |SELECT tok.doc_id, coalesce(clean_text, '') AS clean_text,
       |  CAST(len(w) AS BIGINT) AS n_tokens,
       |  CAST(len(w) - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
       |  CAST(tok.doc_id % 3 AS BIGINT) AS epoch
       |FROM tok LEFT JOIN kept ON kept.doc_id = tok.doc_id
       |ORDER BY tok.doc_id""".stripMargin

  /** Span-excision provenance (mirrors `Dedup.dupSpanProvenance`): ground
    * truth with NO hash — every non-canonical occurrence of a raw gram
    * occurring in >= 2 docs, with its min-doc keeper. 0-based positions
    * match the operator's posexplode index.
    */
  def dupSpanProvenance: String =
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
       |), f AS (
       |  SELECT doc_id, w FROM tok WHERE len(w) >= 8
       |), g AS (
       |  SELECT doc_id, t.i AS pos,
       |    concat_ws(' ', w[t.i+1], w[t.i+2], w[t.i+3], w[t.i+4],
       |                   w[t.i+5], w[t.i+6], w[t.i+7], w[t.i+8]) AS gram
       |  FROM f, LATERAL unnest(range(0, len(w) - 7)) AS t(i)
       |), dup AS (
       |  SELECT gram, min(doc_id) AS keeper FROM g
       |  GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
       |)
       |SELECT g.doc_id, CAST(g.pos AS BIGINT) AS pos,
       |  dup.keeper AS keeper_doc, g.gram
       |FROM g JOIN dup ON g.gram = dup.gram AND g.doc_id <> dup.keeper
       |ORDER BY g.doc_id, pos""".stripMargin

  /** Contamination provenance (mirrors
    * `Decontamination.contaminationProvenance`): ground truth with NO
    * hash — corpus grams (0-based positions, matching posexplode) joined
    * to the benchmark's min-doc witness per gram text.
    */
  def contaminationProvenance: String =
    s"""WITH tokAll AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
       |), tok AS (
       |  SELECT doc_id, w FROM tokAll WHERE doc_id % 10 != 7 AND len(w) >= 8
       |), btok AS (
       |  SELECT doc_id, w FROM tokAll WHERE doc_id % 10 = 7 AND len(w) >= 8
       |), g AS (
       |  SELECT doc_id, t.i AS pos,
       |    concat_ws(' ', w[t.i+1], w[t.i+2], w[t.i+3], w[t.i+4],
       |                   w[t.i+5], w[t.i+6], w[t.i+7], w[t.i+8]) AS gram
       |  FROM tok, LATERAL unnest(range(0, len(w) - 7)) AS t(i)
       |), bg AS (
       |  SELECT concat_ws(' ', w[t.i+1], w[t.i+2], w[t.i+3], w[t.i+4],
       |                   w[t.i+5], w[t.i+6], w[t.i+7], w[t.i+8]) AS gram,
       |    min(doc_id) AS bench_doc
       |  FROM btok, LATERAL unnest(range(0, len(w) - 7)) AS t(i)
       |  GROUP BY 1
       |)
       |SELECT g.doc_id, CAST(g.pos AS BIGINT) AS pos, bg.bench_doc, g.gram
       |FROM g JOIN bg ON g.gram = bg.gram
       |ORDER BY g.doc_id, pos""".stripMargin

  /** Verified contamination-span removal (mirrors
    * `Decontamination.decontaminateSpansVerified`): ground truth with NO
    * hash — corpus grams join the benchmark on the raw gram TEXT.
    */
  def decontaminateSpansVerified: String =
    s"""WITH tokAll AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
       |), tok AS (
       |  SELECT doc_id, w FROM tokAll WHERE doc_id % 10 != 7
       |), btok AS (
       |  SELECT w FROM tokAll WHERE doc_id % 10 = 7 AND len(w) >= 8
       |), f AS (
       |  SELECT doc_id, w FROM tok WHERE len(w) >= 8
       |), g AS (
       |  SELECT doc_id, t.i AS pos,
       |    concat_ws(' ', w[t.i], w[t.i+1], w[t.i+2], w[t.i+3],
       |                   w[t.i+4], w[t.i+5], w[t.i+6], w[t.i+7]) AS gram
       |  FROM f, LATERAL unnest(range(1, len(w) - 6)) AS t(i)
       |), bg AS (
       |  SELECT DISTINCT concat_ws(' ', w[t.i], w[t.i+1], w[t.i+2], w[t.i+3],
       |                   w[t.i+4], w[t.i+5], w[t.i+6], w[t.i+7]) AS gram
       |  FROM btok, LATERAL unnest(range(1, len(w) - 6)) AS t(i)
       |), dropped AS (
       |  SELECT DISTINCT g.doc_id, g.pos + u.j AS t
       |  FROM g JOIN bg ON g.gram = bg.gram, unnest(range(0, 8)) AS u(j)
       |), toks AS (
       |  SELECT doc_id, t.i AS t, w[t.i] AS token
       |  FROM tok, LATERAL unnest(range(1, len(w) + 1)) AS t(i)
       |), kept AS (
       |  SELECT doc_id, string_agg(token, ' ' ORDER BY t) AS clean_text,
       |    count(*) AS n_kept
       |  FROM toks WHERE NOT EXISTS (
       |    SELECT 1 FROM dropped
       |    WHERE dropped.doc_id = toks.doc_id AND dropped.t = toks.t)
       |  GROUP BY doc_id)
       |SELECT tok.doc_id, coalesce(clean_text, '') AS clean_text,
       |  CAST(len(w) AS BIGINT) AS n_tokens,
       |  CAST(len(w) - coalesce(n_kept, 0) AS BIGINT) AS n_removed
       |FROM tok LEFT JOIN kept ON kept.doc_id = tok.doc_id
       |ORDER BY tok.doc_id""".stripMargin

  /** BM25 top-20 for the fixed query (dup, vector, join, slow), k1=1.2,
    * b=0.75 (mirrors `Search.bm25TopK`: per-term conditional aggregates
    * added in fixed query order, score rounded to 6 dp).
    */
  def bm25TopK: String = bm25TopKWhere("TRUE")

  /** [[bm25TopK]] over a restricted corpus — the tombstone-delete
    * semantics of `TextIndex.delete`: deleted documents leave serving
    * (scores, df, n_docs and avgdl all shrink to the surviving corpus).
    */
  def bm25TopKWhere(corpusPred: String): String =
    s"""WITH tok AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      |  FROM documents WHERE $corpusPred
      |), d AS (
      |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
      |    list_filter(w, t -> t IN ('dup', 'vector', 'join', 'slow')) AS qw
      |  FROM tok
      |), stats AS (
      |  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM d
      |), tf AS (
      |  SELECT doc_id, dl, t.term, CAST(count(*) AS BIGINT) AS tf
      |  FROM d, LATERAL unnest(qw) AS t(term)
      |  GROUP BY doc_id, dl, t.term
      |), dfreq AS (
      |  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
      |), sc AS (
      |  SELECT tf.doc_id, tf.term,
      |    ln((n_docs - df + 0.5e0) / (df + 0.5e0) + 1e0)
      |      * (tf * 2.2e0) / (tf + 1.2e0 * (0.25e0 + 0.75e0 * dl / avgdl)) AS tscore
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
      |), agg AS (
      |  SELECT doc_id,
      |    sum(CASE WHEN term = 'dup' THEN tscore END) AS s0,
      |    sum(CASE WHEN term = 'vector' THEN tscore END) AS s1,
      |    sum(CASE WHEN term = 'join' THEN tscore END) AS s2,
      |    sum(CASE WHEN term = 'slow' THEN tscore END) AS s3
      |  FROM sc GROUP BY doc_id
      |), tot AS (
      |  SELECT doc_id, round(coalesce(s0, 0e0) + coalesce(s1, 0e0)
      |    + coalesce(s2, 0e0) + coalesce(s3, 0e0), 6) AS bm25
      |  FROM agg)
      |SELECT doc_id,
      |  CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT) AS "rank",
      |  bm25
      |FROM tot ORDER BY bm25 DESC, doc_id ASC LIMIT 20""".stripMargin

  /** [[bm25TopK]] with SERVING restricted by `servePred` while every
    * statistic (n_docs, avgdl, per-term df) stays the FULL corpus's —
    * `TextIndex.bm25TopK(predicate)`'s filtered-search semantics: a
    * filter is a view over who can be returned, not a removal, so scores
    * of surviving docs are identical to the unfiltered ranking's
    * (contrast [[bm25TopKWhere]], the delete semantics where stats
    * shrink to the surviving corpus).
    */
  /** POST-filter over the UNFILTERED [[bm25TopK]] — non-pushable-predicate
    * (subquery WHERE) semantics over `graft_bm25`: top-20 first, then rows
    * whose document fails `docPred` (alias `d` = the documents row) drop;
    * rank gaps survive. Contrast [[bm25TopKServe]], where serving itself
    * is restricted before ranking.
    */
  def bm25TopKPostWhere(docPred: String): String =
    s"""SELECT t.doc_id, t."rank", t.bm25
       |FROM (${bm25TopK.replace("\n", "\n  ")}) t
       |JOIN documents d ON d.doc_id = t.doc_id
       |WHERE $docPred
       |ORDER BY t."rank"""".stripMargin

  def bm25TopKServe(servePred: String): String =
    s"""WITH tok AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
      |  FROM documents
      |), serve AS (
      |  SELECT doc_id FROM documents WHERE $servePred
      |), d AS (
      |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
      |    list_filter(w, t -> t IN ('dup', 'vector', 'join', 'slow')) AS qw
      |  FROM tok
      |), stats AS (
      |  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM d
      |), tf AS (
      |  SELECT doc_id, dl, t.term, CAST(count(*) AS BIGINT) AS tf
      |  FROM d, LATERAL unnest(qw) AS t(term)
      |  GROUP BY doc_id, dl, t.term
      |), dfreq AS (
      |  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
      |), sc AS (
      |  SELECT tf.doc_id, tf.term,
      |    ln((n_docs - df + 0.5e0) / (df + 0.5e0) + 1e0)
      |      * (tf * 2.2e0) / (tf + 1.2e0 * (0.25e0 + 0.75e0 * dl / avgdl)) AS tscore
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
      |  WHERE tf.doc_id IN (SELECT doc_id FROM serve)
      |), agg AS (
      |  SELECT doc_id,
      |    sum(CASE WHEN term = 'dup' THEN tscore END) AS s0,
      |    sum(CASE WHEN term = 'vector' THEN tscore END) AS s1,
      |    sum(CASE WHEN term = 'join' THEN tscore END) AS s2,
      |    sum(CASE WHEN term = 'slow' THEN tscore END) AS s3
      |  FROM sc GROUP BY doc_id
      |), tot AS (
      |  SELECT doc_id, round(coalesce(s0, 0e0) + coalesce(s1, 0e0)
      |    + coalesce(s2, 0e0) + coalesce(s3, 0e0), 6) AS bm25
      |  FROM agg)
      |SELECT doc_id,
      |  CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT) AS "rank",
      |  bm25
      |FROM tot ORDER BY bm25 DESC, doc_id ASC LIMIT 20""".stripMargin

  /** Hybrid RRF top-20: BM25 pool (same formulation as [[bm25TopK]],
    * pool 50) fused with the cosine pool of query vec_id=0 (same
    * formulation as sim_topk_bruteforce, pool 50) via
    * 1/(60+lex_rank) + 1/(60+sem_rank), -1 sentinels outside a pool
    * (mirrors `Search.hybridRrfTopK`).
    */
  /** Lexical-arm CTE chain shared by [[hybridRrf]] and
    * [[hybridRrfIndexed]]: BM25 pool of 50 for the fixed query, same
    * formulation as [[bm25TopK]].
    */
  private def hybridLexCtes: String =
    s"""tok AS (
       |  SELECT doc_id, $Tok AS w FROM documents
       |), d AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
       |    list_filter(w, t -> t IN ('dup', 'vector', 'join', 'slow')) AS qw
       |  FROM tok
       |), stats AS (
       |  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM d
       |), tf AS (
       |  SELECT doc_id, dl, t.term, CAST(count(*) AS BIGINT) AS tf
       |  FROM d, LATERAL unnest(qw) AS t(term)
       |  GROUP BY doc_id, dl, t.term
       |), dfreq AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
       |), sc AS (
       |  SELECT tf.doc_id, tf.term,
       |    ln((n_docs - df + 0.5e0) / (df + 0.5e0) + 1e0)
       |      * (tf * 2.2e0) / (tf + 1.2e0 * (0.25e0 + 0.75e0 * dl / avgdl)) AS tscore
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
       |), agg AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN term = 'dup' THEN tscore END) AS s0,
       |    sum(CASE WHEN term = 'vector' THEN tscore END) AS s1,
       |    sum(CASE WHEN term = 'join' THEN tscore END) AS s2,
       |    sum(CASE WHEN term = 'slow' THEN tscore END) AS s3
       |  FROM sc GROUP BY doc_id
       |), tot AS (
       |  SELECT doc_id, round(coalesce(s0, 0e0) + coalesce(s1, 0e0)
       |    + coalesce(s2, 0e0) + coalesce(s3, 0e0), 6) AS bm25
       |  FROM agg
       |), lex AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS BIGINT) AS lex_rank
       |  FROM tot ORDER BY bm25 DESC, doc_id ASC LIMIT 50
       |)""".stripMargin

  /** RRF fusion + final ranking tail shared by [[hybridRrf]] and
    * [[hybridRrfIndexed]] — expects CTEs `lex(doc_id, lex_rank)` and
    * `sem(doc_id, sem_rank)` in scope.
    */
  private def hybridFuseTail: String =
    """, f AS (
      |  SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
      |    lex.lex_rank, sem.sem_rank,
      |    coalesce(1e0 / (60 + lex.lex_rank), 0e0)
      |      + coalesce(1e0 / (60 + sem.sem_rank), 0e0) AS rrf
      |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
      |SELECT doc_id,
      |  CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS BIGINT) AS "rank",
      |  round(rrf, 6) AS rrf,
      |  coalesce(lex_rank, -1) AS lex_rank, coalesce(sem_rank, -1) AS sem_rank
      |FROM f ORDER BY rrf DESC, doc_id ASC LIMIT 20""".stripMargin

  def hybridRrf: String =
    s"""WITH $hybridLexCtes, n AS (
       |  SELECT vec_id, embedding, $Nrm AS nrm FROM embeddings
       |), s AS (
       |  SELECT c.vec_id AS doc_id,
       |    round(list_sum(list_transform(range(1, len(q.embedding)+1),
       |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
       |      / (q.nrm * c.nrm), 9) AS cos_sim
       |  FROM n q JOIN n c ON q.vec_id = 0 AND c.vec_id != 0
       |), sem AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id ASC) AS BIGINT) AS sem_rank
       |  FROM s ORDER BY cos_sim DESC, doc_id ASC LIMIT 50
       |)$hybridFuseTail""".stripMargin

  /** Index-served hybrid RRF (mirrors `Search.hybridRrfTopKIndexed` over an
    * `IvfIndex.write`-default index: nlist=16 lowest-id centroids,
    * nprobe=4, semantic pool 50 for query vec_id=0). The semantic arm
    * replays the IVF probe of the [[ivfTopK]] oracle — corpus assignment to
    * nearest centroid, query probe of its 4 nearest lists, exact cosine
    * within the probed lists — so the approximation the index serves is
    * CHECKED, not assumed; lexical arm and fusion identical to
    * [[hybridRrf]].
    */
  def hybridRrfIndexed: String =
    s"""WITH $hybridLexCtes, n AS (
       |  SELECT vec_id AS id, embedding AS v, $Nrm AS nrm FROM embeddings
       |), cent AS (
       |  SELECT id AS cid, v AS cv, nrm AS cnrm FROM n ORDER BY id LIMIT 16
       |), ca AS (
       |  SELECT id, v, nrm, cid FROM (
       |    SELECT n.id, n.v, n.nrm, c.cid,
       |      row_number() OVER (PARTITION BY n.id ORDER BY
       |        list_sum(list_transform(range(1, len(n.v)+1),
       |          i -> CAST(n.v[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE))) / (n.nrm * c.cnrm) DESC,
       |        c.cid ASC) AS crank
       |    FROM n CROSS JOIN cent c)
       |  WHERE crank = 1
       |), qa AS (
       |  SELECT id, v, nrm, cid FROM (
       |    SELECT n.id, n.v, n.nrm, c.cid,
       |      row_number() OVER (PARTITION BY n.id ORDER BY
       |        list_sum(list_transform(range(1, len(n.v)+1),
       |          i -> CAST(n.v[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE))) / (n.nrm * c.cnrm) DESC,
       |        c.cid ASC) AS crank
       |    FROM n CROSS JOIN cent c WHERE n.id = 0)
       |  WHERE crank <= 4
       |), ss AS (
       |  SELECT c.id AS doc_id,
       |    round(list_sum(list_transform(range(1, len(q.v)+1),
       |      i -> CAST(q.v[i] AS DOUBLE) * CAST(c.v[i] AS DOUBLE))) / (q.nrm * c.nrm), 9) AS cos_sim
       |  FROM ca c JOIN qa q ON q.cid = c.cid AND c.id != q.id
       |), sem AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id ASC) AS BIGINT) AS sem_rank
       |  FROM ss ORDER BY cos_sim DESC, doc_id ASC LIMIT 50
       |)$hybridFuseTail""".stripMargin

  /** Weighted mixture with upsampling, seed 'mix' (mirrors
    * `Sampling.mixtureSample` weights src0=2.2, src1=1.0, src2=0.35,
    * src3=0.0, default 0.5): copies = floor(w) + [bucket < frac(w)*1e6].
    */
  def sampleMixture: String =
    """WITH b AS (
      |  SELECT doc_id, source,
      |    ((list_reduce(list_prepend(0::BIGINT,
      |      list_transform(range(1, strlen('mix:' || CAST(doc_id AS VARCHAR)) + 1),
      |        i -> CAST(ascii(substr('mix:' || CAST(doc_id AS VARCHAR), CAST(i AS INT), 1)) AS BIGINT))),
      |      (a, x) -> (a * 31 + x) % 2147483647)
      |      * 2654435761 + 12345) % 2147483647) % 1000000 AS bucket
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, source,
      |    CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 1
      |                WHEN 'src2' THEN 0 WHEN 'src3' THEN 0 ELSE 0 END
      |    + CASE WHEN bucket < (CASE source WHEN 'src0' THEN 200000 WHEN 'src1' THEN 0
      |                          WHEN 'src2' THEN 350000 WHEN 'src3' THEN 0
      |                          ELSE 500000 END)
      |        THEN 1 ELSE 0 END AS n_copies
      |  FROM b)
      |SELECT doc_id, source, CAST(u.i AS BIGINT) AS copy_id
      |FROM c, LATERAL unnest(range(0, n_copies)) AS u(i)
      |WHERE n_copies >= 1
      |ORDER BY doc_id, copy_id""".stripMargin

  /** Per-label centroid outliers, k=3 (mirrors `Clustering.centroidOutliers`):
    * centroids from exact integer sums of floor(x*1e6 + 0.5), cosine to own
    * centroid rounded to 9 dp, bottom-3 per label.
    */
  def embOutliers: String =
    """WITH e AS (
      |  SELECT label, u.i - 1 AS pos, CAST(embedding[u.i] AS DOUBLE) AS x
      |  FROM embeddings, LATERAL unnest(range(1, len(embedding) + 1)) AS u(i)
      |), s AS (
      |  SELECT label, pos, sum(CAST(floor(x * 1e6 + 0.5e0) AS BIGINT)) AS sx,
      |    count(*) AS n
      |  FROM e GROUP BY label, pos
      |), c AS (
      |  SELECT label, list(CAST(sx AS DOUBLE) / (n * 1e6) ORDER BY pos) AS cv
      |  FROM s GROUP BY label
      |), cn AS (
      |  SELECT label, cv,
      |    sqrt(list_sum(list_transform(cv, v -> v * v))) AS cnrm
      |  FROM c
      |), sc AS (
      |  SELECT emb.label, vec_id,
      |    round(list_sum(list_transform(range(1, len(embedding)+1),
      |        i -> CAST(embedding[i] AS DOUBLE) * cv[CAST(i AS INT)]))
      |      / (sqrt(list_sum(list_transform(range(1, len(embedding)+1),
      |           i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
      |         * cnrm), 9) AS cos_centroid
      |  FROM embeddings emb JOIN cn USING (label)
      |), r AS (
      |  SELECT label, vec_id, cos_centroid,
      |    row_number() OVER (PARTITION BY label ORDER BY cos_centroid ASC, vec_id ASC) AS rk
      |  FROM sc)
      |SELECT label, CAST(rk AS BIGINT) AS "rank", vec_id, cos_centroid
      |FROM r WHERE rk <= 3 ORDER BY label, "rank"""".stripMargin

  /** Concat-and-chunk pack offsets, budget=512 per source (mirrors
    * `Chunking.packOffsets`). The window sum is CAST back from DuckDB's
    * HUGEINT to BIGINT.
    */
  def textPack: String =
    """WITH tok AS (
      |  SELECT source, doc_id,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), c AS (
      |  SELECT source, doc_id, n_tokens,
      |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tok_end
      |  FROM tok)
      |SELECT source, doc_id, n_tokens, tok_end - n_tokens AS tok_start,
      |  (tok_end - n_tokens) // 512 AS pack_first,
      |  (tok_end - 1) // 512 AS pack_last
      |FROM c ORDER BY source, doc_id""".stripMargin

  /** Backward as-of join of clicks to views (mirrors
    * `AsofJoin.asofBackward`): latest view with ts <= click ts per user,
    * equal timestamps match, largest event_id breaks simultaneous-view
    * ties.
    */
  def eventsAsof: String =
    """WITH ev AS (
      |  SELECT event_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us,
      |    user_id, event_type, value
      |  FROM events
      |), c AS (
      |  SELECT event_id, user_id, ts_us, value FROM ev WHERE event_type = 'click'
      |), v AS (
      |  SELECT event_id, user_id, ts_us, value FROM ev WHERE event_type = 'view'
      |)
      |SELECT c.event_id, c.user_id, c.ts_us, c.value,
      |  coalesce(m.event_id, -1) AS asof_event_id,
      |  coalesce(m.value, -1e0) AS asof_value
      |FROM c LEFT JOIN LATERAL (
      |  SELECT v.event_id, v.value FROM v
      |  WHERE v.user_id = c.user_id AND v.ts_us <= c.ts_us
      |  ORDER BY v.ts_us DESC, v.event_id DESC LIMIT 1
      |) m ON true
      |ORDER BY c.event_id""".stripMargin

  /** KMV distinct-vocabulary sketch, k=32 (mirrors
    * `Sketches.kmvDistinctTokens`): 32 smallest distinct token polyhashes
    * per source; exact below k, `(k-1)*H/kth` above.
    */
  def vocabSketch: String =
    s"""WITH tok AS (
       |  SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
       |  FROM documents
       |), h0 AS (
       |  SELECT source,
       |    (${ph("tok")} * 2654435761 + 12345) % 2147483647 AS h
       |  FROM tok
       |), d AS (
       |  SELECT DISTINCT source, h FROM h0
       |), r AS (
       |  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |  FROM d
       |), a AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_kept, max(h) AS kth
       |  FROM r WHERE rn <= 32 GROUP BY source)
       |SELECT source, n_kept,
       |  round(CASE WHEN n_kept < 32 THEN CAST(n_kept AS DOUBLE)
       |             ELSE 31e0 * 2147483647e0 / kth END, 6) AS est_distinct
       |FROM a ORDER BY source""".stripMargin

  /** Clicks range-joined into same-user 6-hour-gap view sessions with
    * timeout-padded ends (mirrors `RangeJoin.intervalJoin` + the session
    * derivation in SparkEntry).
    */
  def sessionsRange: String =
    """WITH ev AS (
      |  SELECT event_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us,
      |    user_id, event_type
      |  FROM events
      |), v AS (
      |  SELECT user_id, ts_us FROM ev WHERE event_type = 'view'
      |), s0 AS (
      |  SELECT user_id, ts_us,
      |    CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
      |           OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
      |              > 21600000000
      |         THEN 1 ELSE 0 END AS isn
      |  FROM v
      |), s1 AS (
      |  SELECT user_id, ts_us,
      |    CAST(sum(isn) OVER (PARTITION BY user_id ORDER BY ts_us
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM s0
      |), s AS (
      |  SELECT user_id, session_id, min(ts_us) AS session_start,
      |    max(ts_us) + 21600000000 AS session_end
      |  FROM s1 GROUP BY user_id, session_id
      |), c AS (
      |  SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'click'
      |)
      |SELECT c.event_id, c.user_id, c.ts_us,
      |  s.session_id, s.session_start, s.session_end
      |FROM c JOIN s ON c.user_id = s.user_id
      |  AND c.ts_us BETWEEN s.session_start AND s.session_end
      |ORDER BY c.event_id""".stripMargin

  /** Native session_window parity: 2h-gap islands per user; Spark's session
    * end is last-event + gap.
    */
  def sessionWindow: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us, value
      |  FROM events
      |), s0 AS (
      |  SELECT user_id, ts_us, value,
      |    CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
      |           OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
      |              >= 7200000000
      |         THEN 1 ELSE 0 END AS isn
      |  FROM ev
      |), s1 AS (
      |  SELECT user_id, ts_us, value,
      |    CAST(sum(isn) OVER (PARTITION BY user_id ORDER BY ts_us
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      |  FROM s0)
      |SELECT user_id, min(ts_us) AS session_start_us,
      |  max(ts_us) + 7200000000 AS session_end_us,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM s1 GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin

  /** Shared CTE chain for the hashed-ngram selection oracles (mirrors
    * `Selection.hashedFeatures`, 1024 buckets): word unigrams + bigrams
    * WITH multiplicity (bag-of-features), bucket = scrambled polyhash
    * mod 1024.
    */
  private def featureCtes: String = featureCtes("")

  /** CTE names get prefix `x` so the chain can compose inside oracles that
    * already bind `tok` (the curate prefix's minhash machinery does).
    */
  private def featureCtes(x: String): String =
    s"""${x}tok AS (
       |  SELECT doc_id, $Tok AS w FROM documents
       |), ${x}gr AS (
       |  SELECT doc_id, unnest(w) AS g FROM ${x}tok
       |  UNION ALL
       |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
       |    i -> w[i] || ' ' || w[i+1])) AS g FROM ${x}tok
       |), ${x}feats AS (
       |  SELECT doc_id,
       |    ((${ph("g")}
       |      * 2654435761 + 12345) % 2147483647) % 1024 AS b
       |  FROM ${x}gr
       |)""".stripMargin

  /** Add-one-smoothed log-likelihood-ratio weight table over all 1024
    * buckets between two doc_id-predicated feature slices (mirrors
    * `Selection.logRatioWeights`, integer-quantized lns). Same prefixing
    * rule as [[featureCtes]].
    */
  private def lrWeightCtes(sideA: String, sideB: String, x: String = ""): String =
    s"""${x}tf AS (SELECT b FROM ${x}feats WHERE $sideA),
       |${x}rf AS (SELECT doc_id, b FROM ${x}feats WHERE $sideB),
       |${x}tc AS (SELECT b, count(*) AS c FROM ${x}tf GROUP BY b),
       |${x}qc AS (SELECT b, count(*) AS c FROM ${x}rf GROUP BY b),
       |${x}tt AS (SELECT count(*) AS t FROM ${x}tf),
       |${x}qt AS (SELECT count(*) AS t FROM ${x}rf),
       |${x}w AS (
       |  SELECT r.range AS b,
       |    CAST(floor((ln(CAST(coalesce(${x}tc.c, 0) + 1 AS DOUBLE) / CAST(${x}tt.t + 1024 AS DOUBLE))
       |      - ln(CAST(coalesce(${x}qc.c, 0) + 1 AS DOUBLE) / CAST(${x}qt.t + 1024 AS DOUBLE)))
       |      * 1e6 + 0.5) AS BIGINT) AS lw
       |  FROM range(1024) r
       |  LEFT JOIN ${x}tc ON ${x}tc.b = r.range
       |  LEFT JOIN ${x}qc ON ${x}qc.b = r.range
       |  CROSS JOIN ${x}tt CROSS JOIN ${x}qt)""".stripMargin

  /** DSIR importance resampling (mirrors `Selection.dsirSample`): target =
    * bench slice (doc_id%10=7), raw = the rest, Gumbel top-200 with the
    * deterministic hash noise, reported in doc_id order.
    */
  def sampleDsir: String =
    s"""WITH $featureCtes, ${lrWeightCtes("doc_id % 10 = 7", "doc_id % 10 != 7")},
       |sc AS (
       |  SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
       |    CAST(sum(w.lw) AS BIGINT) AS score_micro
       |  FROM rf f JOIN w ON w.b = f.b GROUP BY f.doc_id),
       |base AS (SELECT doc_id FROM documents WHERE doc_id % 10 != 7),
       |scored AS (
       |  SELECT base.doc_id,
       |    CAST(coalesce(sc.n_feats, 0) AS BIGINT) AS n_feats,
       |    CAST(coalesce(sc.score_micro, 0) AS BIGINT) AS score_micro
       |  FROM base LEFT JOIN sc ON sc.doc_id = base.doc_id),
       |gk AS (
       |  SELECT doc_id, n_feats, score_micro,
       |    score_micro + CAST(floor(-ln(-ln(
       |      (CAST(((${ph("'dsir:' || CAST(doc_id AS VARCHAR)")}
       |        * 2654435761 + 12345) % 2147483647) % 1000000 AS DOUBLE) + 0.5) / 1e6))
       |      * 1e6 + 0.5) AS BIGINT) AS draw_key
       |  FROM scored),
       |top AS (
       |  SELECT * FROM gk ORDER BY draw_key DESC, doc_id ASC LIMIT 200)
       |SELECT doc_id, n_feats, score_micro, draw_key FROM top ORDER BY doc_id""".stripMargin

  /** In-engine Naive-Bayes quality classifier (mirrors
    * `Selection.nbClassifierScores`): pos seed = doc_id%10=7, neg seed =
    * doc_id%10=3, the rest scored with prior + integer log-odds.
    */
  def textNbClassifier: String =
    s"""WITH $featureCtes, ${lrWeightCtes("doc_id % 10 = 7", "doc_id % 10 = 3")},
       |np AS (SELECT count(*) AS n FROM documents WHERE doc_id % 10 = 7),
       |nn AS (SELECT count(*) AS n FROM documents WHERE doc_id % 10 = 3),
       |pr AS (SELECT CAST(floor(ln(CAST(np.n AS DOUBLE) / CAST(nn.n AS DOUBLE))
       |    * 1e6 + 0.5) AS BIGINT) AS prior FROM np CROSS JOIN nn),
       |df AS (SELECT doc_id, b FROM feats WHERE doc_id % 10 != 7 AND doc_id % 10 != 3),
       |sc AS (
       |  SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
       |    CAST(sum(w.lw) AS BIGINT) AS s
       |  FROM df f JOIN w ON w.b = f.b GROUP BY f.doc_id),
       |base AS (SELECT doc_id FROM documents WHERE doc_id % 10 != 7 AND doc_id % 10 != 3)
       |SELECT base.doc_id,
       |  CAST(coalesce(sc.n_feats, 0) AS BIGINT) AS n_feats,
       |  CAST(coalesce(sc.s, 0) + pr.prior AS BIGINT) AS score_micro,
       |  (coalesce(sc.s, 0) + pr.prior) >= 0 AS pred
       |FROM base LEFT JOIN sc ON sc.doc_id = base.doc_id CROSS JOIN pr
       |ORDER BY base.doc_id""".stripMargin

  /** The PR calibration curve (mirrors the `text_classifier_pr_curve`
    * query): NB gate trained on the %20==7/%20==3 halves, held-out
    * %20==17/13 eval, exact cumulative tp/fp at every distinct score.
    */
  def textClassifierPrCurve: String =
    s"""WITH $featureCtes, ${lrWeightCtes("doc_id % 20 = 7", "doc_id % 20 = 3")},
       |np AS (SELECT count(*) AS n FROM documents WHERE doc_id % 20 = 7),
       |nn AS (SELECT count(*) AS n FROM documents WHERE doc_id % 20 = 3),
       |pr AS (SELECT CAST(floor(ln(CAST(np.n AS DOUBLE) / CAST(nn.n AS DOUBLE))
       |    * 1e6 + 0.5) AS BIGINT) AS prior FROM np CROSS JOIN nn),
       |ev AS (
       |  SELECT doc_id, (doc_id % 20 = 17) AS label FROM documents
       |  WHERE doc_id % 20 = 17 OR doc_id % 20 = 13),
       |df AS (SELECT f.doc_id, f.b FROM feats f JOIN ev ON ev.doc_id = f.doc_id),
       |sc AS (
       |  SELECT f.doc_id, CAST(sum(w.lw) AS BIGINT) AS s
       |  FROM df f JOIN w ON w.b = f.b GROUP BY f.doc_id),
       |scored AS (
       |  SELECT ev.doc_id, ev.label,
       |    CAST(coalesce(sc.s, 0) + pr.prior AS BIGINT) AS score_micro
       |  FROM ev LEFT JOIN sc ON sc.doc_id = ev.doc_id CROSS JOIN pr),
       |per AS (
       |  SELECT score_micro AS threshold_micro,
       |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS p,
       |    CAST(sum(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS n
       |  FROM scored GROUP BY score_micro),
       |tot AS (SELECT CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS tp_all FROM scored),
       |cum AS (
       |  SELECT threshold_micro,
       |    CAST(sum(p) OVER (ORDER BY threshold_micro DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
       |    CAST(sum(n) OVER (ORDER BY threshold_micro DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp
       |  FROM per)
       |SELECT threshold_micro, tp, fp, (tot.tp_all - tp) AS fn,
       |  CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS "precision",
       |  CAST(tp AS DOUBLE) / CAST(tot.tp_all AS DOUBLE) AS recall
       |FROM cum CROSS JOIN tot ORDER BY threshold_micro DESC""".stripMargin

  /** Temperature mixture draw, α=0.5, ~500 docs over lang strata, seed
    * 'temp' (mirrors `Sampling.temperatureSample`): sqrt weights quantized
    * to micro-units, INTEGER-division quotas, per-stratum rank by scrambled
    * hash. One flat window here — the engine's hierarchical rank is exact,
    * so it must reproduce this bit-for-bit.
    */
  def sampleTemperature: String =
    s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
       |wq AS (SELECT lang, CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS qs FROM c),
       |d AS (SELECT CAST(sum(qs) AS BIGINT) AS denom FROM wq),
       |k AS (SELECT lang, (500 * qs) // denom AS k FROM wq CROSS JOIN d),
       |h AS (
       |  SELECT doc_id, lang,
       |    ((${ph("'temp:' || CAST(doc_id AS VARCHAR)")}
       |      * 2654435761 + 12345) % 2147483647) AS hv
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, lang,
       |    CAST(row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS BIGINT) AS draw_rank
       |  FROM h)
       |SELECT r.doc_id, r.lang, r.draw_rank FROM r JOIN k USING (lang)
       |WHERE r.draw_rank <= k.k ORDER BY doc_id""".stripMargin

  /** Fixed-size per-stratum sample, k=20 per lang, seed 'fixed' (mirrors
    * `Sampling.fixedSizeSample`): rank by scrambled polyhash of
    * 'fixed:doc_id', ties by doc_id.
    */
  def sampleFixedK: String =
    """WITH h AS (
      |  SELECT doc_id, lang,
      |    ((list_reduce(list_prepend(0::BIGINT,
      |      list_transform(range(1, strlen('fixed:' || CAST(doc_id AS VARCHAR)) + 1),
      |        i -> CAST(ascii(substr('fixed:' || CAST(doc_id AS VARCHAR), CAST(i AS INT), 1)) AS BIGINT))),
      |      (a, x) -> (a * 31 + x) % 2147483647)
      |      * 2654435761 + 12345) % 2147483647) AS hv
      |  FROM documents
      |), r AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn
      |  FROM h)
      |SELECT doc_id, lang FROM r WHERE rn <= 20 ORDER BY doc_id""".stripMargin

  /** Stable split assignment, train 0.8 / val 0.1 / test 0.1, seed
    * 'split' (mirrors `Sampling.assignSplits`): the scrambled mod-1e6
    * bucket against exact micro cumulative thresholds.
    */
  def sampleSplit: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    (((list_reduce(list_prepend(0::BIGINT,
      |      list_transform(range(1, strlen('split:' || CAST(doc_id AS VARCHAR)) + 1),
      |        i -> CAST(ascii(substr('split:' || CAST(doc_id AS VARCHAR), CAST(i AS INT), 1)) AS BIGINT))),
      |      (a, x) -> (a * 31 + x) % 2147483647)
      |      * 2654435761 + 12345) % 2147483647) % 1000000) AS b
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN b < 800000 THEN 'train' WHEN b < 900000 THEN 'val' ELSE 'test' END AS split
      |FROM h ORDER BY doc_id""".stripMargin

  /** Token-budget quota draw, 2500 tokens per lang, seed 'budget' (mirrors
    * `Sampling.tokenBudgetSample`): cumulative token sum in scrambled-hash
    * order, keep while the exclusive prefix is under budget. One flat
    * window here — the engine's hierarchical (range-bucketed) prefix sum is
    * exact, so it must reproduce this bit-for-bit.
    */
  def sampleTokenBudget: String =
    s"""WITH h AS (
      |  SELECT doc_id, lang,
      |    CAST(len($Tok) AS BIGINT) AS n_tokens,
      |    ((list_reduce(list_prepend(0::BIGINT,
      |      list_transform(range(1, strlen('budget:' || CAST(doc_id AS VARCHAR)) + 1),
      |        i -> CAST(ascii(substr('budget:' || CAST(doc_id AS VARCHAR), CAST(i AS INT), 1)) AS BIGINT))),
      |      (a, x) -> (a * 31 + x) % 2147483647)
      |      * 2654435761 + 12345) % 2147483647) AS hv
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, lang, n_tokens,
      |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY hv, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
      |  FROM h)
      |SELECT doc_id, lang, n_tokens, cum_tokens
      |FROM c WHERE cum_tokens - n_tokens < 2500 ORDER BY doc_id""".stripMargin

  /** Global shuffle position, seed 'shuffle' (mirrors
    * `Sampling.shufflePosition`): exact 1-based rank by (scrambled
    * polyhash, doc_id). One flat window here — the engine's hierarchical
    * rank is exact, so it must reproduce this bit-for-bit.
    */
  /** The z-order layout family's shared CTE chain (mirrors
    * `Layout.annotated`): corpus min/max/count stats, 16-bit quantization
    * of each dim — `floor(((v − min)/(max − min))·65536)` clamped to
    * [0, 65535], IEEE-double exact in both engines, with the same
    * degenerate-range (max ≤ min → 0) and NULL (→ 0) guards as
    * `Layout.quantize` — and the Morton
    * interleave as integer bit arithmetic (x odd positions, y even),
    * ending in `z(event_id, x, y, zval, total, xmn..ymx)`.
    */
  private def zorderCtes: String = {
    def quant(v: String, mn: String, mx: String): String =
      s"CASE WHEN $mx <= $mn THEN 0 ELSE COALESCE(" +
        s"LEAST(GREATEST(CAST(floor((($v - $mn) / ($mx - $mn)) * 65536.0) AS BIGINT), 0), 65535), 0) END"
    s"""WITH s AS (
       |  SELECT min(epoch_us(ts)) AS tmn, max(epoch_us(ts)) AS tmx,
       |         min(value) AS vmn, max(value) AS vmx, count(*) AS total
       |  FROM events
       |), q AS (
       |  SELECT event_id, CAST(epoch_us(ts) AS DOUBLE) AS x, value AS y,
       |    ${quant("CAST(epoch_us(ts) AS DOUBLE)", "CAST(tmn AS DOUBLE)", "CAST(tmx AS DOUBLE)")} AS qx,
       |    ${quant("value", "vmn", "vmx")} AS qy,
       |    total, CAST(tmn AS DOUBLE) AS xmn, CAST(tmx AS DOUBLE) AS xmx,
       |    vmn AS ymn, vmx AS ymx
       |  FROM events, s
       |), z AS (
       |  SELECT event_id, x, y, total, xmn, xmx, ymn, ymx, qx, qy,
       |    CAST(list_sum(list_transform(range(0, 16),
       |      b -> ((qx >> CAST(b AS INT)) & 1) * CAST(power(2, 2*b+1) AS BIGINT)
       |         + ((qy >> CAST(b AS INT)) & 1) * CAST(power(2, 2*b) AS BIGINT))) AS BIGINT) AS zval
       |  FROM q)""".stripMargin
  }

  /** The Hilbert index of CTE `z`'s (qx, qy) as a packed-state
    * `list_reduce` fold (mirrors `graft_hilbert2`, bits = 16): state =
    * x + y·2^16 + d·2^32 in HUGEINT (d alone reaches 2^32 − 1), one fold
    * step per bit from s = 2^15 down to 1, canonical n−1 reflection.
    */
  private def hilbertSqlOf(qx: String, qy: String): String = {
    val X = "CAST(st % 65536 AS BIGINT)"
    val Y = "CAST((st // 65536) % 65536 AS BIGINT)"
    val D = "(st // 4294967296)"
    val RX = s"(CASE WHEN ($X & s) > 0 THEN 1 ELSE 0 END)"
    val RY = s"(CASE WHEN ($Y & s) > 0 THEN 1 ELSE 0 END)"
    val XR = s"(CASE WHEN $RY = 0 AND $RX = 1 THEN 65535 - $X ELSE $X END)"
    val YR = s"(CASE WHEN $RY = 0 AND $RX = 1 THEN 65535 - $Y ELSE $Y END)"
    val NX = s"(CASE WHEN $RY = 0 THEN $YR ELSE $XR END)"
    val NY = s"(CASE WHEN $RY = 0 THEN $XR ELSE $YR END)"
    val step = s"CAST($NX AS HUGEINT) + CAST($NY AS HUGEINT) * 65536 " +
      s"+ ($D + CAST(s * s * xor(3 * $RX, $RY) AS HUGEINT)) * 4294967296"
    s"""CAST(list_reduce(list_prepend(CAST($qx AS HUGEINT) + CAST($qy AS HUGEINT) * 65536,
       |      list_transform(range(0, 16), i -> CAST(power(2, 15 - i) AS BIGINT))),
       |      (st, s) -> $step) // 4294967296 AS BIGINT)""".stripMargin
  }

  /** Morton z-value AND Hilbert index per event: `zorderCtes` + `hz`. */
  private def hilbertCtes: String =
    s"""$zorderCtes,
       |hz AS (
       |  SELECT *, ${hilbertSqlOf("qx", "qy").replace("\n", "\n  ")} AS hval
       |  FROM z)""".stripMargin

  /** Hilbert index per event (mirrors `Layout.withHilbertValue`). */
  def layoutHilbert: String =
    s"""$hilbertCtes
       |SELECT event_id, hval FROM hz ORDER BY event_id""".stripMargin

  /** Three-way pruning witness (mirrors `Layout.pruningStats(withHilbert =
    * true)`): hilbert vs zorder vs the natural time layout, same box.
    */
  def layoutHilbertPruning: String =
    s"""$hilbertCtes,
       |a AS (
       |  SELECT *,
       |    ((row_number() OVER (ORDER BY hval, event_id)) - 1) * 64 // total AS fh,
       |    ((row_number() OVER (ORDER BY zval, event_id)) - 1) * 64 // total AS fz,
       |    ((row_number() OVER (ORDER BY x, event_id)) - 1) * 64 // total AS fl
       |  FROM hz
       |), zm AS (
       |  SELECT 'hilbert' AS layout, fh AS file_id, count(*) AS n_rows,
       |    min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max,
       |    any_value(xmn) AS xmn, any_value(xmx) AS xmx,
       |    any_value(ymn) AS ymn, any_value(ymx) AS ymx
       |  FROM a GROUP BY fh
       |  UNION ALL
       |  SELECT 'zorder', fz, count(*), min(x), max(x), min(y), max(y),
       |    any_value(xmn), any_value(xmx), any_value(ymn), any_value(ymx)
       |  FROM a GROUP BY fz
       |  UNION ALL
       |  SELECT 'linear', fl, count(*), min(x), max(x), min(y), max(y),
       |    any_value(xmn), any_value(xmx), any_value(ymn), any_value(ymx)
       |  FROM a GROUP BY fl
       |), b AS (
       |  SELECT *,
       |    xmn + 0.375*(xmx - xmn) AS xlo, xmn + 0.625*(xmx - xmn) AS xhi,
       |    ymn + 0.375*(ymx - ymn) AS ylo, ymn + 0.625*(ymx - ymn) AS yhi
       |  FROM zm)
       |SELECT layout, CAST(count(*) AS BIGINT) AS files_total,
       |  CAST(sum(CASE WHEN x_max >= xlo AND x_min <= xhi
       |                 AND y_max >= ylo AND y_min <= yhi THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
       |  CAST(sum(CASE WHEN x_max >= xlo AND x_min <= xhi
       |                 AND y_max >= ylo AND y_min <= yhi THEN n_rows ELSE 0 END) AS BIGINT) AS rows_in_hit
       |FROM b GROUP BY layout ORDER BY layout""".stripMargin

  /** Morton z-value per event (mirrors `Layout.withZValue`). */
  def layoutZorder: String =
    s"""$zorderCtes
       |SELECT event_id, zval FROM z ORDER BY event_id""".stripMargin

  /** Per-file zone map of the 64-file z-order layout (mirrors
    * `Layout.zoneMap(zOrderAssign(...))`): contiguous file assignment by
    * exact (zval, event_id) rank, integer division.
    */
  def layoutZorderZonemap: String =
    s"""$zorderCtes,
       |a AS (
       |  SELECT *, ((row_number() OVER (ORDER BY zval, event_id)) - 1) * 64 // total AS file_id
       |  FROM z)
       |SELECT CAST(file_id AS BIGINT) AS file_id, CAST(count(*) AS BIGINT) AS n_rows,
       |  min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max
       |FROM a GROUP BY file_id ORDER BY file_id""".stripMargin

  /** The pruning witness (mirrors `Layout.pruningStats`): zone maps of the
    * z-order and natural-time 64-file layouts vs a centered quarter-range
    * box on both dims — files_hit is what a scan cannot prune.
    */
  def layoutZorderPruning: String =
    s"""$zorderCtes,
       |a AS (
       |  SELECT *,
       |    ((row_number() OVER (ORDER BY zval, event_id)) - 1) * 64 // total AS fz,
       |    ((row_number() OVER (ORDER BY x, event_id)) - 1) * 64 // total AS fl
       |  FROM z
       |), zm AS (
       |  SELECT 'zorder' AS layout, fz AS file_id, count(*) AS n_rows,
       |    min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max,
       |    any_value(xmn) AS xmn, any_value(xmx) AS xmx,
       |    any_value(ymn) AS ymn, any_value(ymx) AS ymx
       |  FROM a GROUP BY fz
       |  UNION ALL
       |  SELECT 'linear', fl, count(*), min(x), max(x), min(y), max(y),
       |    any_value(xmn), any_value(xmx), any_value(ymn), any_value(ymx)
       |  FROM a GROUP BY fl
       |), b AS (
       |  SELECT *,
       |    xmn + 0.375*(xmx - xmn) AS xlo, xmn + 0.625*(xmx - xmn) AS xhi,
       |    ymn + 0.375*(ymx - ymn) AS ylo, ymn + 0.625*(ymx - ymn) AS yhi
       |  FROM zm)
       |SELECT layout, CAST(count(*) AS BIGINT) AS files_total,
       |  CAST(sum(CASE WHEN x_max >= xlo AND x_min <= xhi
       |                 AND y_max >= ylo AND y_min <= yhi THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
       |  CAST(sum(CASE WHEN x_max >= xlo AND x_min <= xhi
       |                 AND y_max >= ylo AND y_min <= yhi THEN n_rows ELSE 0 END) AS BIGINT) AS rows_in_hit
       |FROM b GROUP BY layout ORDER BY layout""".stripMargin

  /** Shared CTE chain for the export oracles: the [[sampleShuffleOrder]]
    * scrambled-hash global rank joined with whitespace token counts.
    */
  private def exportBaseCtes: String =
    s"""h AS (
       |  SELECT doc_id,
       |    ((list_reduce(list_prepend(0::BIGINT,
       |      list_transform(range(1, strlen('shuffle:' || CAST(doc_id AS VARCHAR)) + 1),
       |        i -> CAST(ascii(substr('shuffle:' || CAST(doc_id AS VARCHAR), CAST(i AS INT), 1)) AS BIGINT))),
       |      (a, x) -> (a * 31 + x) % 2147483647)
       |      * 2654435761 + 12345) % 2147483647) AS hv
       |  FROM documents
       |), p AS (
       |  SELECT doc_id,
       |    CAST(row_number() OVER (ORDER BY hv, doc_id) AS BIGINT) AS position
       |  FROM h
       |), sa AS (
       |  SELECT p.doc_id, position,
       |    CAST((position - 1) % 8 AS BIGINT) AS shard,
       |    CAST((position - 1) // 8 AS BIGINT) + 1 AS shard_pos,
       |    CAST(len($Tok) AS BIGINT) AS n_tokens
       |  FROM p JOIN documents USING (doc_id)
       |)""".stripMargin

  /** Round-robin shard deal over the deterministic shuffle order (mirrors
    * `Export.shardAssign`, nShards=8, seed 'shuffle').
    */
  def exportShards: String =
    s"""WITH $exportBaseCtes
       |SELECT doc_id, position, shard, shard_pos, n_tokens
       |FROM sa ORDER BY doc_id""".stripMargin

  /** Group-scoped shard deal (mirrors `Export.shardAssignGrouped`,
    * groupCol = lang, nShards = 4, seed 'shuffle'): the per-group rank by
    * (scrambled hash, doc_id) — one PARTITIONED window here, which the
    * engine's group-partitioned hierarchical rank must reproduce
    * bit-for-bit — then the per-group round-robin deal.
    */
  def exportShardsGrouped: String =
    s"""WITH h AS (
       |  SELECT doc_id, lang,
       |    ((list_reduce(list_prepend(0::BIGINT,
       |      list_transform(range(1, strlen('shuffle:' || CAST(doc_id AS VARCHAR)) + 1),
       |        i -> CAST(ascii(substr('shuffle:' || CAST(doc_id AS VARCHAR), CAST(i AS INT), 1)) AS BIGINT))),
       |      (a, x) -> (a * 31 + x) % 2147483647)
       |      * 2654435761 + 12345) % 2147483647) AS hv
       |  FROM documents
       |), p AS (
       |  SELECT doc_id, lang,
       |    CAST(row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS BIGINT) AS position
       |  FROM h
       |)
       |SELECT p.doc_id, p.lang, position,
       |  CAST((position - 1) % 4 AS BIGINT) AS shard,
       |  CAST((position - 1) // 4 AS BIGINT) + 1 AS shard_pos,
       |  CAST(len($Tok) AS BIGINT) AS n_tokens
       |FROM p JOIN documents USING (doc_id)
       |ORDER BY p.doc_id""".stripMargin

  /** Per-shard export manifest (mirrors `Export.shardManifest`): doc/token
    * mass + the head-of-order doc id per shard. Sums carry the
    * CAST(... AS BIGINT) guard (DuckDB HUGEINT -> float64 trap).
    */
  def exportManifest: String =
    s"""WITH $exportBaseCtes
       |SELECT shard,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  min_by(doc_id, shard_pos) AS first_doc
       |FROM sa GROUP BY shard ORDER BY shard""".stripMargin

  /** Raw-ingest good side (mirrors `RawIngest.ingestJsonl` over
    * `SparkEntry.writeJsonlDump`): every record except the planted corrupt
    * lines (doc_id % 13 == 5 is REPLACED by a truncated line in the dump)
    * round-trips byte-exactly through JSON escaping.
    */
  def sourceJsonlIngest: String =
    """SELECT doc_id, text, lang, source, n_chars
      |FROM documents WHERE doc_id % 13 <> 5 ORDER BY doc_id""".stripMargin

  /** Quarantine summary of the same ingest: the planted corrupt lines are
    * pure ASCII, so character length equals byte length on both engines.
    * The corrupt-prefix literal mirrors `SparkEntry.jsonlDumpLine`.
    */
  def sourceJsonlQuarantine: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_bad,
      |  CAST(sum(length('{"doc_id": ' || CAST(doc_id AS VARCHAR) || ', "text": ')) AS BIGINT) AS bad_bytes
      |FROM documents WHERE doc_id % 13 = 5""".stripMargin

  /** The reprocess loop's end state (mirrors `source_jsonl_reprocess`):
    * after the BOM repair re-admits the recoverable quarantine, the merged
    * corpus IS the documents table — nothing lost, nothing duplicated.
    */
  def sourceJsonlReprocess: String =
    """SELECT doc_id, text, lang, source, n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Token-balanced snake shard deal (mirrors
    * `Export.shardAssignTokenBalanced`, nShards=8, seed 'shuffle'): rank by
    * (n_tokens DESC, scrambled hash, doc_id) — one flat window here, the
    * engine's hierarchical rank must reproduce it bit-for-bit — then
    * even rounds deal left-to-right, odd rounds right-to-left.
    */
  def exportShardsBalanced: String =
    s"""WITH h AS (
       |  SELECT doc_id,
       |    CAST(len($Tok) AS BIGINT) AS n_tokens,
       |    ((list_reduce(list_prepend(0::BIGINT,
       |      list_transform(range(1, strlen('shuffle:' || CAST(doc_id AS VARCHAR)) + 1),
       |        i -> CAST(ascii(substr('shuffle:' || CAST(doc_id AS VARCHAR), CAST(i AS INT), 1)) AS BIGINT))),
       |      (a, x) -> (a * 31 + x) % 2147483647)
       |      * 2654435761 + 12345) % 2147483647) AS hv
       |  FROM documents
       |), p AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(row_number() OVER (ORDER BY n_tokens DESC, hv, doc_id) AS BIGINT) AS position
       |  FROM h)
       |SELECT doc_id, position,
       |  CAST(CASE WHEN ((position - 1) // 8) % 2 = 0 THEN (position - 1) % 8
       |            ELSE 7 - (position - 1) % 8 END AS BIGINT) AS shard,
       |  (position - 1) // 8 + 1 AS shard_pos,
       |  n_tokens
       |FROM p ORDER BY doc_id""".stripMargin

  def sampleShuffleOrder: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    ((list_reduce(list_prepend(0::BIGINT,
      |      list_transform(range(1, strlen('shuffle:' || CAST(doc_id AS VARCHAR)) + 1),
      |        i -> CAST(ascii(substr('shuffle:' || CAST(doc_id AS VARCHAR), CAST(i AS INT), 1)) AS BIGINT))),
      |      (a, x) -> (a * 31 + x) % 2147483647)
      |      * 2654435761 + 12345) % 2147483647) AS hv
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(row_number() OVER (ORDER BY hv, doc_id) AS BIGINT) AS position
      |FROM h ORDER BY doc_id""".stripMargin

  /** Streaming budget-gate replay, 2000 tokens per lang over three
    * doc_id%3 epochs (mirrors the `sample_budget_stream` fold of
    * `BudgetAdmission.admitBatch`): admission order is (epoch, doc_id) per
    * stratum, so the three stateful epochs collapse to one windowed
    * cumulative sum over that order.
    */
  def sampleBudgetStream: String =
    s"""WITH h AS (
      |  SELECT doc_id, lang AS stratum,
      |    CAST(doc_id % 3 AS INTEGER) AS epoch,
      |    CAST(len($Tok) AS BIGINT) AS n_tokens
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, stratum, epoch, n_tokens,
      |    CAST(sum(n_tokens) OVER (PARTITION BY stratum ORDER BY epoch, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
      |  FROM h)
      |SELECT doc_id, stratum, n_tokens, cum_tokens, epoch
      |FROM c WHERE cum_tokens - n_tokens < 2000 ORDER BY doc_id""".stripMargin

  /** Bigram LM score (mirrors `TextAnalysis.lmScore`): add-one-smoothed
    * corpus bigram log-likelihood per doc, each ln quantized to integer
    * micro-units with the engine-stable floor(x*1e6 + 0.5) before the sum.
    */
  def lmScore: String =
    s"""WITH t AS (
      |  SELECT doc_id, $Tok AS w FROM documents
      |), uni AS (
      |  SELECT tok, count(*) AS u FROM (SELECT unnest(w) AS tok FROM t) GROUP BY tok
      |), vocab AS (SELECT count(*) AS v FROM uni),
      |bg AS (
      |  SELECT doc_id, w[CAST(i AS INT)] AS w1,
      |    w[CAST(i AS INT)] || ' ' || w[CAST(i+1 AS INT)] AS b
      |  FROM t, unnest(range(1, len(w))) AS s(i)
      |  WHERE len(w) >= 2
      |), bc AS (SELECT b, count(*) AS c FROM bg GROUP BY b),
      |lp AS (
      |  SELECT bg.doc_id,
      |    CAST(floor(ln(CAST(bc.c + 1 AS DOUBLE) / CAST(uni.u + vocab.v AS DOUBLE))
      |      * 1000000 + 0.5) AS BIGINT) AS lpq
      |  FROM bg JOIN bc USING (b) JOIN uni ON uni.tok = bg.w1 CROSS JOIN vocab
      |), agg AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, CAST(sum(lpq) AS BIGINT) AS s
      |  FROM lp GROUP BY doc_id)
      |SELECT d.doc_id,
      |  coalesce(agg.n_bigrams, 0) AS n_bigrams,
      |  round(CAST(agg.s AS DOUBLE) / (CAST(agg.n_bigrams AS DOUBLE) * 1000000), 9) AS avg_logp
      |FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Exact length quantiles per source (mirrors
    * `TextAnalysis.lengthQuantiles`): quantile_cont == Spark's exact
    * percentile (order statistics + linear interpolation).
    */
  /** Length-stratified eval draw, k=5 per (source, tercile) (mirrors
    * `Sampling.lengthStratifiedSample`): per-source exact p50/p90 cut
    * points (rounded to 6 dp like the quantile report), then the seeded
    * scrambled-hash rank inside each (source, bucket).
    */
  def sampleLengthStratified: String =
    """WITH l AS (
      |  SELECT doc_id, source, CAST(strlen(text) AS BIGINT) AS len FROM documents
      |), q AS (
      |  SELECT source, quantile_cont(len, [0.5e0, 0.9e0]) AS qq
      |  FROM l GROUP BY source
      |), b AS (
      |  SELECT l.doc_id, l.source, l.len,
      |    CASE WHEN CAST(l.len AS DOUBLE) <= round(qq[1], 6) THEN 0
      |         WHEN CAST(l.len AS DOUBLE) <= round(qq[2], 6) THEN 1
      |         ELSE 2 END AS lb
      |  FROM l JOIN q ON q.source = l.source
      |), h AS (
      |  SELECT doc_id, source, len, lb,
      |    ((list_reduce(list_prepend(0::BIGINT,
      |      list_transform(range(1, strlen('len:' || CAST(doc_id AS VARCHAR)) + 1),
      |        i -> CAST(ascii(substr('len:' || CAST(doc_id AS VARCHAR), CAST(i AS INT), 1)) AS BIGINT))),
      |      (a, x) -> (a * 31 + x) % 2147483647)
      |      * 2654435761 + 12345) % 2147483647) AS hv
      |  FROM b
      |), r AS (
      |  SELECT doc_id, source, len, lb,
      |    row_number() OVER (PARTITION BY source, lb ORDER BY hv, doc_id) AS rn
      |  FROM h)
      |SELECT doc_id, source, len, CAST(lb AS BIGINT) AS len_bucket
      |FROM r WHERE rn <= 5 ORDER BY doc_id""".stripMargin

  def lengthQuantiles: String =
    """WITH l AS (
      |  SELECT source, CAST(strlen(text) AS BIGINT) AS len FROM documents
      |), q AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    quantile_cont(len, [0.5e0, 0.9e0, 0.99e0]) AS qq
      |  FROM l GROUP BY source)
      |SELECT source, n_docs, round(qq[1], 6) AS p50, round(qq[2], 6) AS p90,
      |  round(qq[3], 6) AS p99
      |FROM q ORDER BY source""".stripMargin

  /** Per-source top-5 tokens (mirrors `TextAnalysis.topTerms`), ties by
    * token text.
    */
  def topTerms: String =
    """WITH tok AS (
      |  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      |  FROM documents
      |), c AS (
      |  SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
      |  FROM tok GROUP BY source, tok
      |), r AS (
      |  SELECT source, tok, cnt,
      |    row_number() OVER (PARTITION BY source ORDER BY cnt DESC, tok ASC) AS rn
      |  FROM c)
      |SELECT source, CAST(rn AS BIGINT) AS "rank", tok, cnt
      |FROM r WHERE rn <= 5 ORDER BY source, "rank"""".stripMargin

  /** Count-min-sketch heavy hitters (mirrors `Sketches.cmsTopTerms`,
    * k=20 depth=3 width=32): per-depth LCG scrambles of the token polyhash
    * into 32 buckets, integer bucket sums, estimate = min over depths,
    * exact count alongside.
    */
  def cmsTopTerms: String =
    s"""WITH tok AS (
       |  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
       |  FROM documents
       |), h0 AS (
       |  SELECT term, ${ph("term")} AS h FROM tok
       |), rows0 AS (
       |  SELECT ms.d, ((h0.h * ms.m + 12345) % 2147483647) % 32 AS bucket
       |  FROM h0, (VALUES (0, 2654435761), (1, 1779033703), (2, 3144134277)) AS ms(d, m)
       |), sketch AS (
       |  SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt
       |  FROM rows0 GROUP BY d, bucket
       |), exact AS (
       |  SELECT term, h, CAST(count(*) AS BIGINT) AS exact_count
       |  FROM h0 GROUP BY term, h
       |), probes AS (
       |  SELECT exact.term, exact.exact_count, ms.d,
       |    ((exact.h * ms.m + 12345) % 2147483647) % 32 AS bucket
       |  FROM exact, (VALUES (0, 2654435761), (1, 1779033703), (2, 3144134277)) AS ms(d, m)
       |), est AS (
       |  SELECT term, exact_count, CAST(min(cnt) AS BIGINT) AS est_count
       |  FROM probes JOIN sketch USING (d, bucket) GROUP BY term, exact_count
       |), r AS (
       |  SELECT term, est_count, exact_count,
       |    row_number() OVER (ORDER BY est_count DESC, term ASC) AS rn
       |  FROM est)
       |SELECT term, CAST(rn AS BIGINT) AS "rank", est_count, exact_count
       |FROM r WHERE rn <= 20 ORDER BY "rank"""".stripMargin

  /** Streaming block dedup as one relational statement (mirrors the
    * `dedup_blocks_stream` 3-epoch fold of `Dedup.blockDedupIncremental`):
    * an occurrence survives iff its (epoch, doc_id, pos) composite key is
    * the global minimum for its 62-bit block hash — "first epoch wins,
    * keep-first within the epoch" collapsed into one min.
    */
  def blockDedupStream: String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
       |b AS (
       |  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
       |    array_to_string(w[(CAST(u.i AS INT)*8+1):(CAST(u.i AS INT)*8+8)], ' ') AS blk
       |  FROM toks, unnest(range((len(w) + 7) // 8)) AS u(i)),
       |bh AS (
       |  SELECT doc_id, pos, blk,
       |    ${ph("blk")} + ${ph("blk", 131L, 2147483629L)} * 2147483648 AS h,
       |    (doc_id % 3) * 1099511627776 + doc_id * 1048576 + pos AS ckey
       |  FROM b),
       |f AS (SELECT h, min(ckey) AS keep_key FROM bh GROUP BY h),
       |kept AS (
       |  SELECT bh.doc_id, bh.pos, bh.blk FROM bh
       |  JOIN f ON bh.h = f.h AND bh.ckey = f.keep_key),
       |r AS (
       |  SELECT doc_id, string_agg(blk, ' ' ORDER BY pos) AS clean_text,
       |    CAST(count(*) AS BIGINT) AS n_kept
       |  FROM kept GROUP BY doc_id),
       |n AS (SELECT doc_id, CAST((len(w) + 7) // 8 AS BIGINT) AS n_blocks FROM toks)
       |SELECT n.doc_id, coalesce(r.clean_text, '') AS clean_text, n.n_blocks,
       |  n.n_blocks - coalesce(r.n_kept, 0) AS n_removed,
       |  CAST(n.doc_id % 3 AS BIGINT) AS epoch
       |FROM n LEFT JOIN r ON r.doc_id = n.doc_id ORDER BY n.doc_id""".stripMargin

  def entries: Map[String, String] = Map(
    "text_top_terms_cms" -> cmsTopTerms,
    "dedup_blocks_stream" -> blockDedupStream,
    "dedup_minhash_lsh" -> minhashLsh,
    "dedup_minhash_lsh_capped" -> minhashLshCapped,
    "dedup_simhash" -> simhashPairs,
    "sim_topk_lsh" -> lshTopK,
    "dedup_cosine_neardup" -> cosineNearDup,
    "dedup_semantic" -> semanticDedup,
    "sim_topk_ivf" -> ivfTopK,
    "sim_topk_ivf_recall" -> ivfRecallCurve(Seq(1, 2, 4, 8)),
    // the persisted index is bit-transparent: same result, same oracle
    "sim_topk_ivf_indexed" -> ivfTopK,
    // ...and so is the SQL TVF over it
    "sim_topk_ivf_tvf" -> ivfTopK,
    // append under frozen centroids: the initial corpus holds every
    // lowest-id vector, so the centroids equal the full-corpus build's and
    // the full-corpus oracle replays the probe exactly
    "sim_topk_ivf_appended" -> ivfTopK,
    // streaming-ingest fold: bootstrap batch holds every lowest-id vector,
    // so the frozen centroids equal the full build's — same oracle again
    "sim_topk_ivf_streamed" -> ivfTopK,
    // serve-after-delete: centroids stay the full corpus's (frozen
    // quantizer), the served corpus drops the tombstoned ids
    "sim_topk_ivf_deleted" -> ivfTopKWhere("n.id % 7 != 3"),
    // filtered vector search: top-k among label-matching vectors only,
    // under the full corpus's frozen centroids — the predicate restricts
    // the SERVED rows exactly like a tombstone set does
    "sim_topk_ivf_filtered" -> ivfTopKWhere("n.label % 2 = 0"),
    // plan-level pushdown: WHERE over the TVF becomes the same filtered
    // probe, so the filtered-search oracle replays it unchanged
    "sim_topk_ivf_tvf_pushdown" -> ivfTopKWhere("n.label % 2 = 0"),
    // pushdown composed with rung auto-dispatch: the filtered quantized
    // oracles replay the TVF's WHERE over SQ8/PQ builds
    "sim_topk_ivf_sq8_tvf_pushdown" -> ivfTopKSq8Where("n.label % 2 = 0"),
    "sim_topk_ivf_pq_tvf_pushdown" -> ivfTopKPqWhere("n.label % 2 = 0"),
    // a subquery WHERE is NOT pushable (its SQL form cannot re-parse):
    // post-filter semantics — unfiltered top-k, then drop rows, rank gaps
    // survive — which is exactly what the post-filter oracle computes
    "sim_topk_ivf_tvf_subquery" -> ivfTopKPostWhere("e.label % 2 = 0"),
    "sim_topk_ivf_sq8_tvf_subquery" -> ivfTopKSq8PostWhere("e.label % 2 = 0"),
    "sim_topk_ivf_pq_tvf_subquery" -> ivfTopKPqPostWhere("e.label % 2 = 0"),
    // ten append epochs + a tombstone set: epoch layout is invisible to
    // the answer (lists/df additive, low-id base freezes the full-corpus
    // centroids), so the serve-after-delete oracle replays it
    "sim_topk_ivf_epochs" -> ivfTopKWhere("n.id % 7 != 3"),
    "sim_topk_ivf_sq8" -> ivfTopKSq8,
    // the TVF auto-dispatches to the SQ8 probe — same replay
    "sim_topk_ivf_sq8_tvf" -> ivfTopKSq8,
    // filtered SQ8 serving: int8 preselect + float rerank over matching
    // rows only, quantizer unchanged
    "sim_topk_ivf_sq8_filtered" -> ivfTopKSq8Where("n.label % 2 = 0"),
    "sim_topk_ivf_trained" -> ivfTopKTrained,
    "emb_kmeans" -> kmeansCentroids,
    // exact-integer per-label mean pool (the native aggregate's twin):
    // micro-quantized elementwise sums are order-independent integers
    "emb_mean_pool" ->
      """WITH m AS (
        |  SELECT label, CAST(u.j AS BIGINT) - 1 AS pos,
        |    CAST(sum(CAST(floor(CAST(embedding[CAST(u.j AS INT)] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sx,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM embeddings, unnest(range(1, len(embedding)+1)) AS u(j)
        |  GROUP BY label, u.j)
        |SELECT label, pos, CAST(sx AS DOUBLE) / (n * 1e6) AS x, n
        |FROM m ORDER BY label, pos""".stripMargin,
    // exact integer-quantized second moments: the oracle replays the
    // micro-quantized product sums and the mean correction bit-for-bit
    "emb_covariance" ->
      """WITH p AS (
        |  SELECT CAST(ui.i AS BIGINT) AS pos_i, CAST(uj.j AS BIGINT) AS pos_j,
        |    CAST(sum(CAST(floor(CAST(e.embedding[CAST(ui.i AS INT)+1] AS DOUBLE)
        |      * CAST(e.embedding[CAST(uj.j AS INT)+1] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS pq,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM embeddings e,
        |    unnest(range(len(e.embedding))) AS ui(i),
        |    unnest(range(len(e.embedding))) AS uj(j)
        |  WHERE uj.j >= ui.i
        |  GROUP BY 1, 2),
        |s AS (
        |  SELECT CAST(u.i AS BIGINT) AS pos,
        |    CAST(sum(CAST(floor(CAST(e.embedding[CAST(u.i AS INT)+1] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sx
        |  FROM embeddings e, unnest(range(len(e.embedding))) AS u(i)
        |  GROUP BY 1)
        |SELECT p.pos_i, p.pos_j,
        |  round(CAST(pq AS DOUBLE) / (n * 1e6)
        |    - (CAST(si.sx AS DOUBLE) / (n * 1e6)) * (CAST(sj.sx AS DOUBLE) / (n * 1e6)), 9) AS cov,
        |  n
        |FROM p JOIN s si ON si.pos = p.pos_i JOIN s sj ON sj.pos = p.pos_j
        |ORDER BY pos_i, pos_j""".stripMargin,
    // the covariance pipeline feeding 8 recursive power-iteration rounds:
    // matvec -> norm -> micro-quantize, each round bit-replayed
    "emb_pca" -> pcaPowerOracle,
    "emb_pca_topk" -> pcaTopKOracle,
    "emb_whiten" -> pcaWhitenOracle,
    // the dots CTE of the LSH oracles, emitted as coordinates: plane
    // indices 1024..1039 are the JL projection's
    "emb_project" ->
      """SELECT e.vec_id, CAST(u.p AS BIGINT) - 1024 AS pos,
        |  round(list_sum(list_transform(range(1, len(e.embedding)+1),
        |    i -> CAST(e.embedding[i] AS DOUBLE) *
        |         (CAST(((u.p*1000003 + (i-1)) * 2654435761 + 12345) % 1000000 AS DOUBLE)
        |          / 1000000.0 - 0.5))), 9) AS x
        |FROM embeddings e, unnest(range(1024, 1040)) AS u(p)
        |ORDER BY vec_id, pos""".stripMargin,
    "sim_topk_ivf_pq" -> ivfTopKPq,
    "sim_topk_ivf_pq_trained" -> ivfTopKPqTrained(2),
    // the TVF auto-dispatches to the PQ probe — same replay
    "sim_topk_ivf_pq_tvf" -> ivfTopKPq,
    // filtered PQ serving: ADC candidates among matching rows only
    "sim_topk_ivf_pq_filtered" -> ivfTopKPqWhere("n.label % 2 = 0"),
    "mm_frame_sample" -> frameSample,
    "mm_resize" -> resizeOracle,
    "text_chunk" -> textChunk,
    "dedup_spans" -> dupSpans,
    "dedup_span_removal" -> dupSpanRemoval,
    "dedup_spans_verified" -> dupSpansVerified,
    "dedup_span_removal_verified" -> dupSpanRemovalVerified,
    "dedup_span_provenance" -> dupSpanProvenance,
    "dedup_spans_stream" -> dupSpansStream,
    "dedup_span_removal_stream" -> dupSpanRemovalStream,
    "text_decontaminate_spans" -> decontaminateSpans,
    "text_decontaminate_spans_verified" -> decontaminateSpansVerified,
    "text_contamination_provenance" -> contaminationProvenance,
    "text_bm25" -> bm25TopK,
    // the persisted inverted index is bit-transparent: same result, same oracle
    "text_bm25_indexed" -> bm25TopK,
    // ...and so is the SQL TVF over it
    "text_bm25_tvf" -> bm25TopK,
    // append epochs are additive in df/n_docs/avgdl: same oracle again
    "text_bm25_appended" -> bm25TopK,
    // streaming-ingest fold: additivity again — same oracle
    "text_bm25_streamed" -> bm25TopK,
    // serve-after-delete: the oracle is BM25 over the surviving corpus
    "text_bm25_deleted" -> bm25TopKWhere("doc_id % 7 != 3"),
    // filtered lexical search: serving restricted to lang='en' docs under
    // FULL-corpus statistics — a filter is a view, not a removal
    "text_bm25_filtered" -> bm25TopKServe("lang = 'en'"),
    // plan-level pushdown: WHERE over the TVF becomes the same filtered
    // probe, so the filtered-search oracle replays it unchanged
    "text_bm25_tvf_pushdown" -> bm25TopKServe("lang = 'en'"),
    // subquery WHERE over graft_bm25: post-filter of the unfiltered
    // top-20 (contrast _tvf_pushdown's filtered serving above)
    "text_bm25_tvf_subquery" -> bm25TopKPostWhere("d.lang = 'en'"),
    // ten append epochs + a tombstone set: BM25 stats are additive across
    // epochs, so the serve-after-delete oracle replays it unchanged
    "text_bm25_epochs" -> bm25TopKWhere("doc_id % 7 != 3"),
    "text_index_describe" -> textIndexDescribe,
    "ivf_index_describe" -> ivfIndexDescribe,
    "sample_mixture" -> sampleMixture,
    "emb_outliers" -> embOutliers,
    "text_pack" -> textPack,
    "events_asof" -> eventsAsof,
    "search_hybrid_rrf" -> hybridRrf,
    "search_hybrid_rrf_indexed" -> hybridRrfIndexed,
    // both arms index-served: lexical arm bit-transparent, semantic arm the
    // same nlist/nprobe IVF pool — the indexed-hybrid oracle replays it
    "search_hybrid_rrf_served" -> hybridRrfIndexed,
    "dedup_incremental" -> minhashIncremental,
    "dedup_admission_replay" -> admissionReplay,
    "pipeline_curate" -> pipelineCurate,
    "pipeline_e2e" -> pipelineE2e,
    // the resumable staged form restarts into the SAME answer: its oracle
    // IS pipeline_e2e's
    "pipeline_e2e_resume" -> pipelineE2e,
    "pipeline_curate_classified" -> pipelineCurateClassified,
    "pipeline_curate_gopher" -> pipelineCurateGopher,
    "pipeline_curate_funnel" -> pipelineCurateFunnel,
    "pipeline_curate_stream_gopher" -> pipelineCurateStreamGopher,
    "pipeline_curate_budget" -> pipelineCurateBudget,
    "pipeline_curate_stream" -> pipelineCurateStream,
    "pipeline_curate_stream_funnel" -> pipelineCurateStreamFunnel,
    "pipeline_curate_stream_classified" -> pipelineCurateStreamClassified,
    "corpus_diff" -> corpusDiff,
    "corpus_overlap_matrix" -> corpusOverlapMatrix,
    "corpus_drift" -> corpusDrift,
    "corpus_drift_stream" -> corpusDriftStream,
    "text_bpe_merges" -> bpeMerges,
    "text_bpe_tokenize" -> bpeTokenCounts,
    "text_vocab_sketch" -> vocabSketch,
    "events_sessions_range" -> sessionsRange,
    "events_session_window" -> sessionWindow,
    // strictly-ordered min-time funnel chain, one CTE per step
    "events_funnel" ->
      """WITH e AS (SELECT user_id AS u, event_type AS et, epoch_us(ts) AS t FROM events),
        |s1 AS (SELECT u, min(t) AS t1 FROM e WHERE et = 'signup' GROUP BY u),
        |s2 AS (SELECT e.u, min(e.t) AS t2 FROM e JOIN s1 ON e.u = s1.u
        |       WHERE e.et = 'view' AND e.t > s1.t1 GROUP BY e.u),
        |s3 AS (SELECT e.u, min(e.t) AS t3 FROM e JOIN s2 ON e.u = s2.u
        |       WHERE e.et = 'purchase' AND e.t > s2.t2 GROUP BY e.u)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step, 'signup' AS event_type,
        |    CAST(count(*) AS BIGINT) AS n_users FROM s1
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), 'view', CAST(count(*) AS BIGINT) FROM s2
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), 'purchase', CAST(count(*) AS BIGINT) FROM s3)
        |ORDER BY step""".stripMargin,
    // streaming funnel = batch funnel over each 10-day epoch prefix
    "events_funnel_stream" -> funnelStreamOracle,
    // streaming retention = batch retention over each 10-day epoch prefix
    "events_retention_stream" -> retentionStreamOracle,
    // integer epoch-week cohort retention (604800000000 us per week)
    "events_retention" ->
      """WITH t AS (SELECT user_id AS u, epoch_us(ts) AS us FROM events),
        |f AS (SELECT u, min(us) // 604800000000 AS cw FROM t GROUP BY u),
        |a AS (SELECT DISTINCT u, us // 604800000000 AS w FROM t)
        |SELECT CAST(f.cw AS BIGINT) AS cohort_week,
        |  CAST(a.w - f.cw AS BIGINT) AS week_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM a JOIN f ON a.u = f.u
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sample_fixed_k" -> sampleFixedK,
    "sample_split" -> sampleSplit,
    "sample_length_stratified" -> sampleLengthStratified,
    "sample_dsir" -> sampleDsir,
    "text_nb_classifier" -> textNbClassifier,
    "text_classifier_pr_curve" -> textClassifierPrCurve,
    "sample_temperature" -> sampleTemperature,
    "sample_token_budget" -> sampleTokenBudget,
    "sample_shuffle_order" -> sampleShuffleOrder,
    "layout_zorder" -> layoutZorder,
    "layout_zorder_zonemap" -> layoutZorderZonemap,
    "layout_zorder_pruning" -> layoutZorderPruning,
    "layout_hilbert" -> layoutHilbert,
    "layout_hilbert_pruning" -> layoutHilbertPruning,
    "export_shards" -> exportShards,
    "export_shards_grouped" -> exportShardsGrouped,
    "export_shards_balanced" -> exportShardsBalanced,
    "export_manifest" -> exportManifest,
    // the JSONL-written export reads its manifest back from the shard
    // bytes; equality with the assignment-side manifest IS the check
    "export_jsonl_manifest" -> exportManifest,
    "source_jsonl_ingest" -> sourceJsonlIngest,
    "source_jsonl_reprocess" -> sourceJsonlReprocess,
    "source_jsonl_quarantine" -> sourceJsonlQuarantine,
    "sample_budget_stream" -> sampleBudgetStream,
    "text_lm_score" -> lmScore,
    "text_length_quantiles" -> lengthQuantiles,
    "text_top_terms" -> topTerms)
}
