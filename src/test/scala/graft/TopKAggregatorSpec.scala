package graft

import graft.functions.TopKAggregator
import graft.functions.TopKAggregator.{Entry, In}
import org.scalatest.funsuite.AnyFunSuite

/** The aggregator's merge must be associative and order-insensitive —
  * Spark combines partial buffers in arbitrary order — and its buffer
  * must never exceed k. Checked against a brute-force sort over seeded
  * random data split into arbitrary partitions.
  */
class TopKAggregatorSpec extends AnyFunSuite {

  private val agg = TopKAggregator(3)

  private def run(ins: Seq[In], splits: Int): Seq[Entry] = {
    val parts = ins.grouped(math.max(1, ins.length / splits)).toSeq
    parts.map(_.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge)
  }

  private def brute(ins: Seq[In]): Seq[Entry] =
    ins.map(i => Entry(i.id, i.value))
      .sortBy(e => (-e.value, e.id)).take(3)

  test("matches brute force for any partitioning of seeded random input") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { trial =>
      val ins = Seq.fill(50)(In(rnd.nextInt(40).toLong, (rnd.nextInt(10) * 10).toDouble))
      (1 to 7).foreach { splits =>
        assert(run(ins, splits) === brute(ins), s"trial $trial splits $splits")
      }
    }
  }

  test("ties resolve to the lowest id and the buffer never exceeds k") {
    val ins = Seq(In(5, 1.0), In(2, 1.0), In(9, 1.0), In(1, 1.0), In(7, 1.0))
    val out = ins.foldLeft(agg.zero)(agg.reduce)
    assert(out.length === 3)
    assert(out === Seq(Entry(1, 1.0), Entry(2, 1.0), Entry(5, 1.0)))
  }
}
