package graft

/** Partition-independence, enforced: the operators whose algorithms touch
  * physical partitioning hardest (global prefix sums, hash-ordered
  * selection, window ranks, Pregel label propagation, LSH banding,
  * histogram order statistics) must return IDENTICAL results when the
  * shuffle width changes. This is the claim every "exact, deterministic"
  * scaladoc makes — here it fails CI instead of relying on the fixed-conf
  * determinism smoke (QueriesSmokeSpec runs both executions at one width).
  *
  * A child session re-plans with 5 shuffle partitions (vs the suite's
  * default); results compare as sorted row sets.
  */
class PartitionIndependenceSpec extends SparkSuite {

  private val sensitive = Seq(
    "spend_deciles",       // two-pass global rank
    "epoch_shuffle",       // prefix-rank permutation
    "sequence_pack",       // distributed prefix sum
    "token_budget_sample", // keyed prefix selection
    "dup_clusters",        // Pregel min-label propagation
    "minhash_lsh",         // banded signatures + verify join
    "markov_transitions",  // user-keyed lag + row-normalizing window
    "time_to_convert",     // histogram order statistics
    "grid_dbscan",         // cell components via Pregel + doubling shortcut
    "item_similarity_topk", // basket self-join + per-part rank window
    "quantized_outliers",  // broadcast centroid sums + rank window
    "phash_neardup",       // collapse-by-signature banding + expansion
    "asof_join_native",    // custom exec: co-partitioned zip + merge pass
    "asof_join_forward",   // forward direction through the SQL TVF
    "asof_join_nearest",   // per-side windows + backward tie preference
    "order_chain_cte")     // recursive walk: per-iteration shuffle joins

  for (name <- sensitive) {
    test(s"$name is invariant to shuffle width") {
      val narrow = spark.newSession()
      narrow.conf.set("spark.sql.shuffle.partitions", "5")
      val cols = SparkEntry.queries(name)(spark, sf1).columns
        .map(org.apache.spark.sql.functions.col).toSeq
      val wide = SparkEntry.queries(name)(spark, sf1).orderBy(cols: _*).collect().toSeq
      val thin = SparkEntry.queries(name)(narrow, sf1).orderBy(cols: _*).collect().toSeq
      assert(wide == thin, s"$name changed results when shuffle width changed")
    }
  }
}
