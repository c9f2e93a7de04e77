package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016) — the
  * vocabulary-induction step of an LLM data pipeline, run as relational
  * operators so the corpus never leaves the cluster.
  *
  * Classic BPE trains on the WORD-FREQUENCY table, not the raw corpus:
  * pair statistics are per word type × frequency, so the data-sized pass
  * is one tokenize + count; every merge round then works on the compact
  * (word, pos, symbol) relation (vocab-sized, not corpus-sized — at
  * 100 TB the word table is MBs after the first aggregation). Each round
  * is: adjacent-pair counts via one `lead` window + map-side-combined sum;
  * argmax on the driver (one row, the k-means-centroid pattern); greedy
  * re-encode via windows. Round plans are cut with
  * [[graft.engine.Snapshot.pin]] so round N stays constant-size (the
  * dup_clusters lesson); pin is reliable-checkpoint-aware for clusters.
  *
  * Greedy re-encode parity: BPE merges occurrences LEFT TO RIGHT without
  * overlap. For a pair (a,b) with a ≠ b two matches can never be adjacent
  * (a match at i and i+1 would need sym(i+1) = b = a), so selection =
  * match. For a = b, runs of consecutive matches are resolved by the
  * gaps-and-islands idiom: within each maximal run, select even offsets
  * from the run start — exactly greedy left-to-right. Both engines run the
  * identical window program, so the oracle replays training bit-for-bit.
  */
object Bpe {

  /** Word-frequency table from the corpus (the only corpus-sized pass). */
  def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol relation: one character per row, (word, freq, pos, sym).
    * Explicit substring indexing (not split-on-empty-regex, whose trailing
    * empty element differs between engines).
    */
  def charSymbols(words: DataFrame): DataFrame =
    words.select(col("word"), col("freq"),
      posexplode(expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))")))
      .toDF("word", "freq", "pos", "sym")

  /** Adjacent-pair weighted counts over the current symbol relation. */
  def pairCounts(syms: DataFrame): DataFrame = {
    val w = Window.partitionBy("word").orderBy("pos")
    syms.withColumn("nxt", lead(col("sym"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("sym").as("a"), col("nxt").as("b"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** One greedy merge of (a, b) → a+b across every word. */
  def mergeRound(syms: DataFrame, a: String, b: String): DataFrame = {
    val w = Window.partitionBy("word").orderBy("pos")
    val marked = syms
      .withColumn("mtch", coalesce(
        col("sym") === lit(a) && lead(col("sym"), 1).over(w) === lit(b),
        lit(false)))
      .withColumn("mrn", row_number().over(
        Window.partitionBy(col("word"), col("mtch")).orderBy(col("pos"))))
      .withColumn("grp", when(col("mtch"), col("pos") - col("mrn")))
    marked
      .withColumn("run_start",
        min(col("pos")).over(Window.partitionBy(col("word"), col("grp"))))
      .withColumn("sel",
        col("mtch") && pmod(col("pos") - col("run_start"), lit(2)) === 0)
      .withColumn("consumed", coalesce(lag(col("sel"), 1).over(w), lit(false)))
      .filter(!col("consumed"))
      .select(col("word"), col("freq"),
        (row_number().over(w) - 1).as("pos"),
        when(col("sel"), lit(a + b)).otherwise(col("sym")).as("sym"))
  }

  /** Learn `rounds` merges; returns (round, sym_a, sym_b, pair_n) rows.
    * Ties in the argmax break on (a, b) lexicographically — deterministic
    * and replayed identically by the oracle's ORDER BY ... LIMIT 1.
    */
  def learnMerges(docs: DataFrame, rounds: Int): Seq[(Long, String, String, Long)] =
    learnAndEncode(docs, rounds)._1

  /** Train AND keep the trained tokenizer's output: the merges plus the
    * final (word, freq, pos, sym) relation with every merge applied — the
    * per-word ENCODING under the learned vocabulary. The relation stays
    * vocab-sized throughout (word types, not corpus tokens), so applying
    * the tokenizer to a 100 TB corpus is: encode the vocabulary here, then
    * one join of corpus tokens against the per-word symbol counts
    * ([[graft.queries.LlmQueries.bpeEncode]]) — the merges never touch a
    * corpus-sized relation.
    */
  def learnAndEncode(docs: DataFrame, rounds: Int): (Seq[(Long, String, String, Long)], DataFrame) = {
    var syms = charSymbols(wordFreqs(docs)).transform(graft.engine.Snapshot.pin)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      val top = pairCounts(syms)
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      // no adjacent pairs left (all words fully merged / single-symbol):
      // stop early with the merges found instead of crashing on head-of-empty
      if (top.isEmpty) exhausted = true
      else {
        val best = top(0)
        val (a, b, c) = (best.getString(0), best.getString(1), best.getLong(2))
        merges += ((r.toLong, a, b, c))
        syms = mergeRound(syms, a, b).transform(graft.engine.Snapshot.pin)
      }
    }
    (merges.toSeq, syms)
  }
}
