package graft

import graft.util.LocalCkpt
import org.apache.spark.sql.functions._

/** Pins the deterministic-free contract of [[graft.util.LocalCkpt]]: the
  * epoch paths rely on `release` actually removing checkpoint blocks,
  * and on the documented fact that `Dataset.unpersist` CANNOT (it only
  * consults the CacheManager, which never tracks checkpoint storage) —
  * the defect the r12 ADVICE storage-leak item reduced to.
  */
class LocalCkptSpec extends SparkTestBase {

  private def storedIds(): Set[Int] =
    spark.sparkContext.getRDDStorageInfo.map(_.id).toSet

  private def awaitGone(ids: Set[Int]): Boolean = {
    val deadline = System.nanoTime() + 10L * 1000000000L
    while (System.nanoTime() < deadline) {
      if (storedIds().intersect(ids).isEmpty) return true
      Thread.sleep(50)
    }
    storedIds().intersect(ids).isEmpty
  }

  test("release frees localCheckpoint blocks; Dataset.unpersist does not") {
    val before = storedIds()
    val df = spark.range(0, 200000, 1, 4).toDF("id").localCheckpoint(true)
    val mine = storedIds() -- before
    assert(mine.nonEmpty, "an eager localCheckpoint must store blocks")
    // the trap: unpersist() looks resolved but frees nothing
    df.unpersist(blocking = true)
    assert(storedIds().intersect(mine) == mine,
      "Dataset.unpersist must NOT free checkpoint blocks (if this starts " +
        "failing, Spark changed semantics and LocalCkpt can be retired)")
    LocalCkpt.release(df)
    assert(awaitGone(mine), "release must remove the checkpoint blocks")
  }

  test("release works through a derived frame (select over the pinned plan)") {
    val before = storedIds()
    val pinned = spark.range(0, 100000, 1, 4)
      .select(col("id"), (col("id") * 2).as("x")).localCheckpoint(true)
    val derived = pinned.select(col("x"))
    val mine = storedIds() -- before
    assert(mine.nonEmpty)
    LocalCkpt.release(derived)
    assert(awaitGone(mine),
      "release must walk the analyzed plan to the checkpointed ancestor")
  }
}
