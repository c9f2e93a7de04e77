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
  * Scale: map-side combine bounds every partition's contribution to
  * < 2k pairs per group before the shuffle; reduce is O(log k) amortized
  * per record — the buffer is a sorted k-prefix plus an unsorted append
  * tail, compacted (sort + trim to k) only when the tail fills, and the
  * prefix's k-th hash is a sound skip threshold (the tail can only
  * LOWER the true k-th minimum, never raise it), so saturated groups
  * reject most records with one comparison. The re-sort-per-record form
  * (k log k each) measured ~2× slower end-to-end at k = 512 on the
  * sf0.1 events table, and the gap widens with rows-per-tier.
  * Empirical-quantile error follows DKW: ε ≈ √(ln(2/δ)/2k) ≈ 6% at
  * k = 512, δ = 0.05 — the envelope the query verifies.
  */
class BottomKSample(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[Long]] {

  override def zero: Seq[(Long, Long)] = Vector.empty

  /** Sort by (hash, value) and keep the k minima — the invariant-restoring
    * step. After every compact the whole buffer is sorted, so positions
    * [0, k) stay a sorted prefix while later appends only extend the tail.
    */
  private[functions] def compact(buf: Seq[(Long, Long)]): Seq[(Long, Long)] =
    buf.sortBy(p => (p._1, p._2)).take(k)

  override def reduce(buf: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
    // prefix-k-th prune: buf(k-1) exists sorted whenever length ≥ k
    // (compaction fires at exactly k and from 2k on), and any pair ≥ it
    // under the FULL (hash, value) order can never be among the k minima.
    // The tie-break matters: pruning on the hash alone would reject a pair
    // that ties the k-th hash with a SMALLER value — which the flat
    // (hash, value)-sorted oracle replay keeps — making the sample
    // arrival-order-dependent exactly when 60-bit hashes collide.
    if (buf.length >= k && {
      val kth = buf(k - 1)
      in._1 > kth._1 || (in._1 == kth._1 && in._2 >= kth._2)
    }) buf
    else {
      val b = buf :+ in
      if (b.length == k || b.length >= 2 * k) compact(b) else b
    }

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    compact(a ++ b)

  /** The sampled values, ascending — ready for rank selection. */
  override def finish(buf: Seq[(Long, Long)]): Seq[Long] =
    compact(buf).map(_._2).sorted

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

/** The per-tier partial: same bounded buffer, emitted as the compacted
  * ≤ k (hash, value) pair list instead of the finished sample — what a
  * daily rollup stores.
  */
class BottomKSketch(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  private val s = new BottomKSample(k)
  override def zero: Seq[(Long, Long)] = s.zero
  override def reduce(buf: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
    s.reduce(buf, in)
  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    s.merge(a, b)
  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = s.compact(buf)
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
