package graft

import graft.util.EpochStore
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The shared epoch-commit protocol, unit-tested on synthetic sides at
  * every crash point the four stores rely on. The store specs prove each
  * OPERATOR's semantics survive restarts; this spec pins the PROTOCOL
  * itself — commit gating, uncommit order, manifest atomicity, orphan
  * reclamation — so a future store gets them by construction.
  */
class EpochStoreSpec extends SparkTestBase {

  import spark.implicits._

  private def newStore(sides: String*): EpochStore =
    EpochStore(
      java.nio.file.Files.createTempDirectory("graft-epochstore").toString,
      sides)

  private def writeEpoch(st: EpochStore, epoch: String, v: Int): Unit =
    st.sides.foreach { side =>
      Seq((epoch, side, v)).toDF("epoch", "side", "v")
        .write.mode("overwrite").parquet(st.sideDir(side, epoch))
    }

  private def fs(st: EpochStore) =
    new Path(st.storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("an epoch is committed only when EVERY side carries _SUCCESS") {
    val st = newStore("a", "b", "c")
    writeEpoch(st, "batch-00000000", 1)
    assert(st.committedEpochs(spark) == Seq("batch-00000000"))
    // drop the LAST side's marker (the commit side): epoch must vanish
    fs(st).delete(new Path(s"${st.sideDir("c", "batch-00000000")}/_SUCCESS"), false)
    assert(st.committedEpochs(spark).isEmpty,
      "missing commit-side _SUCCESS must leave the epoch invisible")
    // a second, fully-committed epoch is unaffected
    writeEpoch(st, "batch-00000001", 2)
    assert(st.committedEpochs(spark) == Seq("batch-00000001"))
  }

  test("uncommitEpoch removes every side; readSide unions committed epochs only") {
    val st = newStore("x", "y")
    writeEpoch(st, "batch-00000000", 10)
    writeEpoch(st, "batch-00000001", 20)
    st.uncommitEpoch(spark, "batch-00000000")
    st.sides.foreach(s =>
      assert(!fs(st).exists(new Path(st.sideDir(s, "batch-00000000")))))
    val vs = st.readSide(spark, "x").get.select("v").as[Int].collect().toSeq
    assert(vs == Seq(20))
    st.uncommitEpoch(spark, "batch-00000001")
    assert(st.readSide(spark, "x").isEmpty, "empty store reads as None")
  }

  test("compaction: manifest is the commit point; keepLatest protects the newest; sweep reclaims") {
    val st = newStore("m", "n")
    (0 until 4).foreach(i => writeEpoch(st, f"batch-$i%08d", i))

    // crash-mid-sweep state: manifest committed, old dirs still on disk
    st.compact(spark, targetFiles = 1, sweep = false, keepLatest = 1)((_, u) => u)
    val committed = st.committedEpochs(spark)
    assert(committed.count(_.startsWith("compact-")) == 1)
    assert(committed.contains("batch-00000003"),
      "keepLatest=1 must leave the newest epoch unmerged")
    assert(committed.size == 2, s"compact + protected newest, got $committed")
    // the replaced dirs are on disk but dead: readers see each value once
    val vs = st.readSide(spark, "m").get.select("v").as[Int].collect().sorted
    assert(vs.toSeq == Seq(0, 1, 2, 3), s"reader must be identical pre-sweep, got $vs")

    st.sweepMerged(spark)
    val dirs = fs(st).listStatus(new Path(s"${st.storeDir}/m"))
      .map(_.getPath.getName).toSeq
    assert(dirs.size == 2, s"sweep must leave compact + newest, got $dirs")
    assert(st.readSide(spark, "m").get.select("v").as[Int].collect().sorted.toSeq
      == Seq(0, 1, 2, 3), "reader identical post-sweep")
  }

  test("a compact epoch without its manifest is invisible and reclaimed, never resurrected") {
    val st = newStore("p", "q")
    writeEpoch(st, "batch-00000000", 1)
    writeEpoch(st, "batch-00000001", 2)
    // simulate a compaction that crashed BEFORE the manifest rename: the
    // consolidated parquet (with its _SUCCESS) exists, no _MERGED
    writeEpoch(st, "compact-deadbeef", 99)
    assert(st.committedEpochs(spark) == Seq("batch-00000000", "batch-00000001"),
      "pre-manifest compact epoch must be invisible despite _SUCCESS")
    assert(st.readSide(spark, "p").get.select("v").as[Int].collect().sorted.toSeq
      == Seq(1, 2))
    st.sweepMerged(spark)
    assert(!fs(st).exists(new Path(st.sideDir("p", "compact-deadbeef"))),
      "orphaned compact epoch must be reclaimed by the sweep")
    assert(st.committedEpochs(spark) == Seq("batch-00000000", "batch-00000001"))
  }

  test("per-side consolidation transform is applied (distinct vs union)") {
    val st = newStore("setside", "logside")
    // same value twice across epochs: the set side dedups, the log unions
    writeEpoch(st, "batch-00000000", 7)
    writeEpoch(st, "batch-00000001", 7)
    st.compact(spark, targetFiles = 1, sweep = true, keepLatest = 0) {
      case ("setside", u) => u.select("v").distinct()
      case (_, u) => u
    }
    assert(st.readSide(spark, "setside").get.count() == 1)
    assert(st.readSide(spark, "logside").get.count() == 2)
  }
}
