package graft
import graft.operators.{Renko, Tick}
import org.scalatest.funsuite.AnyFunSuite
class ScanPartitionSpec extends AnyFunSuite {
  test("scanPartition pure iterator 1M ticks") {
    val ticks = (0 until 1000000).iterator.map(i => Tick("", i.toLong, 100.0 + (i % 7) * 0.4 - 1.2))
    val out = Renko.scanPartition(ticks, 1.0, dropFirst = true)
    var c = 0; while (out.hasNext) { out.next(); c += 1 }
    info(s"bricks: $c")
  }
  test("scanPartition multi-symbol runs") {
    val ticks = (0 until 100000).iterator.map(i => Tick(s"s${i / 10000}", i.toLong, 100.0 + (i % 9) * 0.5))
    val out = Renko.scanPartition(ticks, 1.0, dropFirst = true)
    var c = 0; while (out.hasNext) { out.next(); c += 1 }
    info(s"bricks: $c")
  }
}
