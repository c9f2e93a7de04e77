package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One ranked output row of the top-k aggregation. */
final case class TopOrder(o_orderkey: Long, o_totalprice: Double, rn: Int)

/** Bounded top-k per group as a typed `Aggregator` — the scale-correct form
  * of "top 3 orders per customer".
  *
  * The window form (`row_number().over(partitionBy(cust).orderBy(...))`)
  * must SORT every group in full: one wide exchange of all rows plus
  * O(n log n) per group, and no partial aggregation — every order row
  * crosses the network. This aggregator keeps only k entries per group in
  * the aggregation buffer, so map-side partial aggregation reduces each
  * partition to ≤ k rows per group BEFORE the shuffle: network volume
  * drops from all rows to k·groups, and per-group work is O(n log k).
  * At 100 TB that is the difference between shuffling the fact table and
  * shuffling a summary.
  *
  * Output is identical to the window form (same (price desc, orderkey asc)
  * order, same rank numbering) — `topk_orders_heap` shares the window
  * query's oracle SQL verbatim, which IS the equivalence proof.
  */
class TopKOrders(k: Int) extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[TopOrder]] {

  // buffer entries are (price, orderkey), kept sorted by the output order:
  // price desc, then orderkey asc; length never exceeds k
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Long, Double)): Seq[(Double, Long)] = {
    val entry = (in._2, in._1)
    // skip the insertion entirely when the buffer is full and the new entry
    // sorts after the current k-th — the common case on sorted-ish data
    if (buf.length >= k && ord.compare(entry, buf.last) >= 0) buf
    else ((buf :+ entry).sorted(ord)).take(k)
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[TopOrder] =
    buf.zipWithIndex.map { case ((p, o), i) => TopOrder(o, p, i + 1) }

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[TopOrder]] =
    ExpressionEncoder[Seq[TopOrder]]()
}
