package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k-by-hash VALUE sample — the quantile member of the portable
  * sketch family (KMV covers distinct counts, the count-min sketch covers
  * heavy hitters; this covers order statistics). The buffer keeps the ≤ k
  * (hash, value) pairs with the smallest hashes; because the hash is
  * uniform on record identity, the kept values are a uniform random sample
  * of the group WITHOUT any RNG — fully deterministic, replayable by any
  * engine that can hash and sort (the DuckDB oracle does exactly that).
  *
  * Same lossless-tiering theorem as KMV: any pair among the k smallest of
  * a union is among the k smallest of its own tier, so merging per-period
  * sketches is BIT-IDENTICAL to one flat sketch over the raw data. A
  * tiered rollup (daily partials, merged on demand) therefore loses
  * nothing — `approx_quantiles_sample` computes through daily tiers and
  * its oracle replays the flat form; the hash match IS the equivalence
  * proof.
  *
  * Scale: map-side combine bounds every partition's contribution to ≤ k
  * pairs per group before the shuffle (k·groups·16 bytes on the wire);
  * reduce is O(log k) amortized per record via the full-buffer fast path.
  * Empirical-quantile error follows DKW: ε ≈ √(ln(2/δ)/2k) ≈ 6% at
  * k = 512, δ = 0.05 — the envelope the query verifies.
  */
class BottomKSample(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[Long]] {

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(buf: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
    // full buffer and hash ≥ the current k-th smallest: can never enter
    if (buf.length >= k && in._1 >= buf.last._1) buf
    else ((buf :+ in).sortBy(p => (p._1, p._2))).take(k)

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).sortBy(p => (p._1, p._2)).take(k)

  /** The sampled values, ascending — ready for rank selection. */
  override def finish(buf: Seq[(Long, Long)]): Seq[Long] =
    buf.map(_._2).sorted

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

/** The per-tier partial: same bounded buffer, emitted as the (hash, value)
  * pair list instead of the finished sample — what a daily rollup stores.
  */
class BottomKSketch(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  private val s = new BottomKSample(k)
  override def zero: Seq[(Long, Long)] = s.zero
  override def reduce(buf: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
    s.reduce(buf, in)
  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    s.merge(a, b)
  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf
  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

/** Folds STORED tier sketches into the finished flat sample (k-min-of-
  * k-mins = k-min of the union; see [[BottomKSample]]).
  */
class BottomKMergeSample(k: Int)
    extends Aggregator[Seq[(Long, Long)], Seq[(Long, Long)], Seq[Long]] {
  private val s = new BottomKSample(k)
  override def zero: Seq[(Long, Long)] = s.zero
  override def reduce(buf: Seq[(Long, Long)], sk: Seq[(Long, Long)]): Seq[(Long, Long)] =
    s.merge(buf, sk)
  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    s.merge(a, b)
  override def finish(buf: Seq[(Long, Long)]): Seq[Long] = s.finish(buf)
  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
