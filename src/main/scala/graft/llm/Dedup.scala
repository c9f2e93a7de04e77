package graft.llm

import graft.engine.PortableHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training corpora: exact, exact n-gram
  * Jaccard (inverted index), MinHash + LSH banding, and SimHash with
  * pigeonhole-exact banding. Designed for the 100 TB regime:
  *
  *  - exact dedup is one hash aggregation (map-side combined);
  *  - the Jaccard join is an inverted-index self-join — it shuffles
  *    (shingle → doc) postings, never documents, and only materializes
  *    candidate pairs that share a shingle;
  *  - MinHash/LSH replaces the posting join with a constant-size signature
  *    (64 longs/doc) and bands (16 keys/doc), so shuffle volume is O(docs),
  *    independent of document length — the scale path;
  *  - SimHash bands 60 bits into 6×10; by pigeonhole any pair within
  *    Hamming distance ≤ 5 shares an identical band, so the banded join is
  *    EXACT (not approximate) for thresholds ≤ 5 while joining on tiny keys.
  *
  * All hashes are md5-derived ([[graft.engine.PortableHash]]) so the DuckDB
  * oracle reproduces every pipeline bit-for-bit.
  */
object Dedup {

  /** Exact dedup on normalized text: lowercase, collapse non-alphanumerics.
    * Output: one row per distinct normalized document with the kept id
    * (lowest) and the copy count.
    */
  def exact(documents: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
    documents
      .select(col("doc_id"), md5(norm).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
  }

  /** Exact pairwise n-gram Jaccard via inverted index. Emits pairs
    * (doc_a < doc_b) with Jaccard ≥ num/den, compared in integer arithmetic:
    * j = c/(sa+sb-c) ≥ num/den  ⇔  den*c ≥ num*(sa+sb-c).
    */
  def ngramJaccardPairs(documents: DataFrame, n: Int, num: Int, den: Int): DataFrame = {
    val docs = documents.select(col("doc_id"), TextAnalysis.shingles(col("text"), n).as("sh"))
    val postings = docs.select(col("doc_id"), explode(col("sh")).as("s"))
    val sizes = docs.select(col("doc_id"), size(col("sh")).as("n_sh"))
    val common = postings.as("a")
      .join(postings.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "size_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "size_b"), "doc_b")
      .filter(col("n_common") * den >= (col("size_a") + col("size_b") - col("n_common")) * num)
      .select("doc_a", "doc_b", "n_common", "size_a", "size_b")
  }

  /** MinHash signatures: sig_i = min over shingles s of (a_i*h(s)+b_i) mod P.
    * One row per doc with an array of `perms` longs — computed entirely
    * inside codegen (no explode), so cost is O(shingles × perms) per row
    * with zero shuffle.
    */
  def minhashSignatures(documents: DataFrame, n: Int, perms: Int): DataFrame = {
    val params = PortableHash.minhashParams(perms)
    val hs = transform(TextAnalysis.shingles(col("text"), n),
      s => pmod(PortableHash.md5Long(s), lit(PortableHash.P)))
    val sig = array(params.map { case (a, b) =>
      array_min(transform(col("hs"), h => (h * a + b) % PortableHash.P))
    }: _*)
    documents
      .select(col("doc_id"), hs.as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), sig.as("sig"))
  }

  /** MinHash + LSH banded near-dup join, exact-verified. `bands` bands of
    * `perms/bands` rows each; docs sharing any band key become candidates,
    * candidates are verified with exact n-gram Jaccard ≥ num/den. The
    * verification join touches only candidate pairs — at scale the band
    * shuffle is O(docs × bands) keys of ~40 bytes.
    */
  def minhashLshPairs(documents: DataFrame, n: Int, perms: Int, bands: Int,
                      num: Int, den: Int): DataFrame = {
    val rows = perms / bands
    val sigs = minhashSignatures(documents, n, perms)
    val bandKeys = sigs.select(col("doc_id"),
      posexplode(array((0 until bands).map { b =>
        concat_ws(",", transform(slice(col("sig"), b * rows + 1, rows), _.cast("string")))
      }: _*)))
      .toDF("doc_id", "band", "key")
    val candidates = bandKeys.as("a")
      .join(bandKeys.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val docsSh = documents.select(col("doc_id"), TextAnalysis.shingles(col("text"), n).as("sh"))
    candidates
      .join(docsSh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(docsSh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("n_common"),
        size(col("sh_a")).as("size_a"), size(col("sh_b")).as("size_b"))
      .filter(col("n_common") * den >= (col("size_a") + col("size_b") - col("n_common")) * num)
  }

  /** 60-bit SimHash per document over whitespace tokens: bit j is set when
    * Σ_tokens (±1 from bit j of md5(token)) is positive. Pure per-row
    * expression — no shuffle.
    */
  def simhashSignatures(documents: DataFrame, bits: Int = 60): DataFrame = {
    val th = transform(TextAnalysis.tokens(col("text")), t => PortableHash.md5Long(t))
    val withH = documents.select(col("doc_id"), th.as("th")).filter(size(col("th")) > 0)
    val sig = (0 until bits).map { j =>
      val bitSum = aggregate(col("th"), lit(0L),
        (acc, h) => acc + (shiftright(h, j) % 2L) * 2L - 1L)
      when(bitSum > 0, lit(1L) * (1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    withH.select(col("doc_id"), sig.as("sig"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, via 6×10-bit
    * pigeonhole banding (EXACT for maxDist ≤ 5): candidates must share one
    * 10-bit band, then the full 60-bit Hamming distance filters.
    */
  def simhashPairs(documents: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist <= 5, "6-band pigeonhole guarantees recall only for distance <= 5")
    val sigs = simhashSignatures(documents)
    val bandKeys = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 6).map(b => shiftright(col("sig"), b * 10) % 1024L): _*)))
      .toDF("doc_id", "sig", "band", "key")
    bandKeys.as("a")
      .join(bandKeys.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
