package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-Minimum-Values distinct-count sketch as a typed `Aggregator` — the
  * bounded-buffer form promised by the `approx_distinct_kmv` scaladoc
  * (round-2 verdict #6), replacing the window-sort formulation.
  *
  * Buffer: the ≤ k smallest DISTINCT 60-bit hashes of a group, sorted
  * ascending. Map-side partial aggregation reduces every partition to ≤ k
  * values per group BEFORE the shuffle, and no per-group global sort ever
  * happens — at 100 TB the exchange carries k·groups longs instead of every
  * distinct hash, and a skewed group costs O(n log k) instead of a sort.
  *
  * Estimate (pure order statistics, engine-portable): when the group has
  * fewer than k distinct hashes the buffer holds ALL of them (nothing is
  * evicted until the buffer exceeds k), so the exact count is returned;
  * otherwise (k−1)·2⁶⁰ / (k-th smallest). Bit-identical to the windowed
  * form — `approx_distinct_kmv` keeps its oracle SQL verbatim, which IS
  * the equivalence proof.
  */
class KmvEstimate(k: Int) extends Aggregator[Long, Seq[Long], Long] {

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
    // full buffer and h ≥ current k-th smallest: h is either present or
    // can never be among the k minima — the common case, no allocation
    if (buf.length >= k && h >= buf.last) buf
    else if (buf.contains(h)) buf // k ≤ 32: linear probe beats any structure
    else ((buf :+ h).sorted).take(k)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(buf: Seq[Long]): Long =
    if (buf.length < k) buf.length.toLong
    else math.floor((k - 1).toDouble * math.pow(2, 60) / buf.last).toLong

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** The sketch ITSELF (≤ k smallest distinct hashes, sorted) as the output —
  * the mergeable partial a tiered rollup materializes per (group, period)
  * so later periods union sketches instead of rescanning raw data. Same
  * reduce/merge as [[KmvEstimate]]; only `finish` differs.
  */
class KmvSketch(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  private val e = new KmvEstimate(k)
  override def zero: Seq[Long] = e.zero
  override def reduce(buf: Seq[Long], h: Long): Seq[Long] = e.reduce(buf, h)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = e.merge(a, b)
  override def finish(buf: Seq[Long]): Seq[Long] = buf
  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

/** Folds STORED sketches back into one estimate. A hash among the k
  * global minima is necessarily among its own period's k minima, so
  * k-min-of-k-mins is EXACTLY the k-min of the union — tiered rollups are
  * lossless, giving bit-identical estimates to a flat sketch over the raw
  * data (the property the oracle verifies).
  */
class KmvMergeEstimate(k: Int) extends Aggregator[Seq[Long], Seq[Long], Long] {
  private val e = new KmvEstimate(k)
  override def zero: Seq[Long] = e.zero
  override def reduce(buf: Seq[Long], sk: Seq[Long]): Seq[Long] = e.merge(buf, sk)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = e.merge(a, b)
  override def finish(buf: Seq[Long]): Long = e.finish(buf)
  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
