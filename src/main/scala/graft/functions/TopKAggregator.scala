package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact per-group top-k as a typed [[Aggregator]] (registered through
  * `functions.udaf`): each group's state is AT MOST k (value, id) pairs,
  * merged associatively, so top-k-per-group runs as a hash aggregate with
  * map-side partial combine instead of a window sort. The window form
  * (`row_number().over(...)`) sorts every group's full row set; this
  * carries k rows per group through the shuffle — at 100 TB the
  * difference between shuffling the table and shuffling k×|groups| rows.
  *
  * Ordering: value descending, id ascending on ties — a total order, so
  * results are deterministic and oracle-comparable against the window
  * formulation (`topk_agg_orders_per_cust`).
  */
case class TopKAggregator(k: Int)
    extends Aggregator[TopKAggregator.In, Seq[TopKAggregator.Entry], Seq[TopKAggregator.Entry]] {
  import TopKAggregator._

  require(k > 0, "k must be positive")

  // buffer invariant: sorted by (value desc, id asc), length <= k
  override def zero: Seq[Entry] = Seq.empty

  private def insert(buf: Seq[Entry], e: Entry): Seq[Entry] = {
    // buffers are tiny (<= k); linear insertion keeps the invariant
    val (better, worse) = buf.span(b =>
      b.value > e.value || (b.value == e.value && b.id < e.id))
    val merged = (better :+ e) ++ worse
    if (merged.length > k) merged.take(k) else merged
  }

  override def reduce(buf: Seq[Entry], in: In): Seq[Entry] = {
    val e = Entry(in.id, in.value)
    if (buf.length == k) {
      val last = buf.last
      // fast reject: full buffer and the candidate sorts after the min
      if (last.value > e.value || (last.value == e.value && last.id < e.id)) buf
      else insert(buf, e)
    } else insert(buf, e)
  }

  override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] =
    b.foldLeft(a)((acc, e) =>
      if (acc.length == k) {
        val last = acc.last
        if (last.value > e.value || (last.value == e.value && last.id < e.id)) acc
        else insert(acc, e)
      } else insert(acc, e))

  override def finish(reduction: Seq[Entry]): Seq[Entry] = reduction

  override def bufferEncoder: Encoder[Seq[Entry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  override def outputEncoder: Encoder[Seq[Entry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
}

object TopKAggregator {
  final case class In(id: Long, value: Double)
  final case class Entry(id: Long, value: Double)
}
