package graft

import graft.util.StageStore
import org.apache.spark.sql.functions._

/** Stage-level resumability (graft.util.StageStore + Curation.e2eResumable):
  * commit-marker idempotence, partial-write recovery, content-key
  * invalidation, and killed-run == uninterrupted-run output equality.
  */
class StageStoreSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def tmpRun(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_stagestore_$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("a committed stage is read back, not recomputed; output equal on both paths") {
    import spark.implicits._
    val run = tmpRun("commit")
    var computes = 0
    def body = { computes += 1; (1 to 10).map(i => (i.toLong, s"v$i")).toDF("k", "v") }
    val s1 = new StageStore(spark, run)
    val out1 = s1.stage("a", "k1")(body).orderBy(col("k")).collect()
    assert(computes === 1 && s1.computed.toSeq === Seq("a") && s1.resumed.isEmpty)
    val s2 = new StageStore(spark, run)
    val out2 = s2.stage("a", "k1")(body).orderBy(col("k")).collect()
    assert(computes === 1, "a committed stage must never recompute")
    assert(s2.resumed.toSeq === Seq("a") && s2.computed.isEmpty)
    assert(out1.toSeq === out2.toSeq)
  }

  test("a marker-less partial directory (killed mid-write) is discarded and recomputed") {
    import spark.implicits._
    val run = tmpRun("partial")
    // plant a partial stage dir: data-ish junk, NO _SUCCESS marker
    val dir = new java.io.File(s"$run/b-k2"); dir.mkdirs()
    java.nio.file.Files.write(dir.toPath.resolve("part-00000.parquet"),
      "mid-write garbage".getBytes("UTF-8"))
    val s = new StageStore(spark, run)
    val out = s.stage("b", "k2")(Seq((1L, "x")).toDF("k", "v")).collect()
    assert(s.computed.toSeq === Seq("b"), "partial dir must be treated as uncommitted")
    assert(out.length === 1 && out.head.getString(1) === "x")
    assert(new java.io.File(dir, "_SUCCESS").exists(), "recompute must commit")
  }

  test("content-key chain: a changed parameter re-keys the stage (no stale serve)") {
    import spark.implicits._
    val run = tmpRun("rekey")
    val k1 = StageStore.contentKey("input", "stage", "p=1")
    val k2 = StageStore.contentKey("input", "stage", "p=2")
    assert(k1 !== k2)
    val s1 = new StageStore(spark, run)
    s1.stage("c", k1)(Seq((1L, "old")).toDF("k", "v"))
    val s2 = new StageStore(spark, run)
    val out = s2.stage("c", k2)(Seq((1L, "new")).toDF("k", "v")).collect()
    assert(s2.computed.toSeq === Seq("c"), "a re-keyed stage must recompute")
    assert(out.head.getString(1) === "new")
  }

  test("e2eResumable: killed-after-pairs restart resumes the finished stages and equals the uninterrupted run") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val corpus = d.filter(col("doc_id") % 10 =!= 7)
    val bench = d.filter(col("doc_id") % 10 === 7)
    val fr = Map("en" -> 0.9, "de" -> 0.5, "zh" -> 0.3)

    // uninterrupted reference run
    val refStore = new StageStore(spark, tmpRun("ref"))
    val ref = graft.operators.Curation.e2eResumable(
        corpus, bench, refStore, inputKey = sf, langFracs = fr, defaultFrac = 0.4)
      .orderBy(col("split"), col("shard")).collect()
    assert(refStore.computed.toSeq === Seq("curated", "pairs", "split", "manifest"))

    // killed run: the injected kill lands AFTER the named stage commits
    val run = tmpRun("kill")
    val killed = new StageStore(spark, run)
    intercept[StageStore.InjectedKill] {
      graft.operators.Curation.e2eResumable(
        corpus, bench, killed, inputKey = sf, langFracs = fr, defaultFrac = 0.4,
        failAfter = Some("pairs"))
    }
    assert(killed.computed.toSeq === Seq("curated", "pairs"))

    // restart: finished stages resumed, remainder computed, answer identical
    val restarted = new StageStore(spark, run)
    val out = graft.operators.Curation.e2eResumable(
        corpus, bench, restarted, inputKey = sf, langFracs = fr, defaultFrac = 0.4)
      .orderBy(col("split"), col("shard")).collect()
    assert(restarted.resumed.toSeq === Seq("curated", "pairs"))
    assert(restarted.computed.toSeq === Seq("split", "manifest"))
    assert(out.toSeq === ref.toSeq,
      "a resumed run must serve the uninterrupted run's manifest exactly")

    // ...and a SECOND restart is a pure read: zero stages computed
    val warm = new StageStore(spark, run)
    val again = graft.operators.Curation.e2eResumable(
        corpus, bench, warm, inputKey = sf, langFracs = fr, defaultFrac = 0.4)
      .orderBy(col("split"), col("shard")).collect()
    assert(warm.computed.isEmpty && warm.resumed.size === 4)
    assert(again.toSeq === ref.toSeq)
  }
}
