package graft.queries

import graft.engine.{PortableHash, Tables}
import graft.llm.{Bpe, Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM training-data pipeline queries (SURVEY.md §2.9 / north-star gap-fill)
  * with DuckDB oracles. Because all sketch hashing is md5-derived
  * ([[graft.engine.PortableHash]]), even the approximate operators (MinHash
  * LSH, SimHash bands, sign-plane LSH) are replayed bit-for-bit by the
  * oracle — the SQL computes the identical signatures, candidates, and
  * verified outputs.
  *
  * Caching contract: a few queries `persist()` an intermediate that the
  * returned (lazy) plan references more than once — unpersisting before
  * return would recompute it per reference, so the blocks outlive the call.
  * Long-lived sessions must reclaim them after materializing a result via
  * `spark.catalog.clearCache()` (what [[graft.Bench]] and [[graft.Verify]]
  * do between queries); one-session-per-job callers need nothing.
  */
object LlmQueries {

  // ------------------------------------------------------------ shared SQL
  /** DuckDB CTEs for whitespace tokens and word n-gram shingle sets —
    * mirrors [[graft.llm.TextAnalysis.shingles]] exactly (same split, same
    * n-gram construction, same distinct).
    */
  private def shingleCtes(n: Int): String =
    s"""toks AS (SELECT doc_id, text,
       |         list_filter(string_split(text, ' '), t -> len(t) > 0) AS tokens FROM documents),
       |shs AS (SELECT doc_id, text,
       |        CASE WHEN len(tokens) >= $n
       |             THEN list_distinct([array_to_string(tokens[i:i+${n - 1}], ' ')
       |                                 for i in range(1, len(tokens) - ${n - 2})])
       |             ELSE [] END AS sh FROM toks)""".stripMargin

  private val jaccardNum = 4
  private val jaccardDen = 5 // threshold 0.8

  private def jaccardFilterSql(c: String, sa: String, sb: String) =
    s"$c * $jaccardDen >= ($sa + $sb - $c) * $jaccardNum"

  // ------------------------------------------------------------ dedup: exact
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables.documents(spark, dir))
      .select("fingerprint", "keeper_id", "n_copies")

  /** Oracle twin of [[graft.llm.Dedup.normFingerprint]] — one definition
    * for every query that hashes normalized text.
    */
  private def normFpSql =
    "md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))"

  val dedupExactSql: String =
    s"""SELECT $normFpSql AS fingerprint,
       |       min(doc_id) AS keeper_id, count(*) AS n_copies
       |FROM documents GROUP BY 1""".stripMargin

  // ------------------------------------------- dedup: exact n-gram Jaccard
  /** PPJoin-style prefix-filtered inverted-index join — the plan you'd run
    * at 100× on Zipfian real text, where the naive join's Σ df² cost
    * concentrates in hot shingles and prefix filtering prunes exactly those
    * from candidate generation. On this synthetic uniform-vocabulary corpus
    * the naive join (`Dedup.ngramJaccardPairs`) happens to be a bit faster
    * (rare shingles still collide broadly), but the judged query wires the
    * scale-correct plan; the naive variant stays as the output-equality
    * cross-check in DedupSpec.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairsPrefix(Tables.documents(spark, dir), 3, jaccardNum, jaccardDen)

  val ngramJaccardSql: String =
    s"""WITH ${shingleCtes(3)},
       |post AS (SELECT doc_id, unnest([${PortableHash.md5LongSql("s")} for s in sh]) AS h FROM shs),
       |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM shs),
       |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
       |           FROM post a JOIN post b ON a.h = b.h AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_common, sa.n_sh AS size_a, sb.n_sh AS size_b
       |FROM common JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE ${jaccardFilterSql("n_common", "sa.n_sh", "sb.n_sh")}""".stripMargin

  // ------------------------------------------------ dedup: novelty signal
  /** Marginal n-gram novelty per document: the fraction (basis points) of
    * a doc's distinct 3-gram shingles whose GLOBAL first occurrence
    * (lowest doc_id) is this document — the "what does this doc add that
    * the corpus before it didn't have" signal used to order/prioritize
    * curation and to report dedup yield. Scale: two map-side-combined
    * aggregations over 16-byte posting rows (h → min doc, then min-doc →
    * count); no corpus-sized join anywhere — the final left join is
    * aggregate-sized on both sides.
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame =
    ngramNoveltyOf(Tables.documents(spark, dir))

  /** Operator form over any (doc_id, text) frame (spec entry point). */
  def ngramNoveltyOf(docs: DataFrame): DataFrame = {
    val posts = Dedup.shinglePostings(docs, 3)
    val novel = posts.groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
    val sizes = Dedup.shingleSizes(docs, 3).filter(col("n_sh") > 0)
    sizes.select(col("doc_id"), col("n_sh").cast("long").as("n_sh"))
      .join(novel, Seq("doc_id"), "left")
      .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
      .withColumn("novelty_bp", expr("(n_novel * 10000) div n_sh"))
  }

  val ngramNoveltySql: String =
    s"""WITH ${shingleCtes(3)},
       |post AS (SELECT doc_id, unnest([${PortableHash.md5LongSql("s")} for s in sh]) AS h FROM shs),
       |first AS (SELECT h, min(doc_id) AS doc_id FROM post GROUP BY h),
       |novel AS (SELECT doc_id, count(*) AS n_novel FROM first GROUP BY 1),
       |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM shs WHERE len(sh) > 0)
       |SELECT s.doc_id, n_sh, coalesce(n_novel, 0) AS n_novel,
       |       (coalesce(n_novel, 0) * 10000) // n_sh AS novelty_bp
       |FROM sizes s LEFT JOIN novel USING (doc_id)""".stripMargin

  // ---------------------------------------------- dedup: per-source rates
  /** Per-source duplication report — the corpus-health readout that drives
    * source weighting decisions: document counts, distinct normalized
    * fingerprints, and the exact-dup rate in basis points. Two stacked
    * map-side-combined aggregations; nothing else.
    */
  def dupStats(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("source"), Dedup.normFingerprint.as("fp"))
      .groupBy(col("source"), col("fp")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_docs"), count(lit(1)).as("n_distinct"))
      .withColumn("dup_rate_bp", expr("((n_docs - n_distinct) * 10000) div n_docs"))
  }

  val dupStatsSql: String =
    s"""WITH fps AS (SELECT source, $normFpSql AS fp, count(*) AS c
       |             FROM documents GROUP BY 1, 2)
      |SELECT source, CAST(sum(c) AS BIGINT) AS n_docs, count(*) AS n_distinct,
      |       (CAST(sum(c) AS BIGINT) - count(*)) * 10000 // CAST(sum(c) AS BIGINT) AS dup_rate_bp
      |FROM fps GROUP BY source""".stripMargin

  // -------------------------------------------- dedup: asymmetric containment
  private val containNum = 9
  private val containDen = 10 // threshold 0.9

  /** Containment dedup C(A,B) = |A∩B|/|A| ≥ 0.9 — catches short documents
    * quoted verbatim inside long ones, which symmetric Jaccard misses (the
    * union in the denominator is dominated by the long side). Same
    * inverted-index topology as [[ngramJaccard]]; both containment
    * directions are evaluated from one pair enumeration.
    */
  def containmentDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(Tables.documents(spark, dir), 3, containNum, containDen)

  val containmentDedupSql: String =
    s"""WITH ${shingleCtes(3)},
       |post AS (SELECT doc_id, unnest([${PortableHash.md5LongSql("s")} for s in sh]) AS h FROM shs),
       |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM shs),
       |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
       |           FROM post a JOIN post b ON a.h = b.h AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2),
       |pairs AS (SELECT doc_a, doc_b, n_common, sa.n_sh AS size_a, sb.n_sh AS size_b
       |          FROM common JOIN sizes sa ON doc_a = sa.doc_id
       |                      JOIN sizes sb ON doc_b = sb.doc_id)
       |SELECT doc_a AS inner_id, doc_b AS outer_id, n_common,
       |       size_a AS size_in, size_b AS size_out
       |FROM pairs WHERE n_common * $containDen >= size_a * $containNum
       |UNION ALL
       |SELECT doc_b AS inner_id, doc_a AS outer_id, n_common,
       |       size_b AS size_in, size_a AS size_out
       |FROM pairs WHERE n_common * $containDen >= size_b * $containNum""".stripMargin

  // --------------------------------------------- dedup: duplicated spans
  private val spanW = 16

  /** Duplicated-span detection (suffix-array substring dedup re-expressed
    * distributed — [[graft.llm.Dedup.duplicatedSpans]]): per document, the
    * maximal token spans covered by 16-token windows occurring ≥ 2× in the
    * corpus, with span counts and duplicated-token totals. The oracle
    * replays the rolling hashes, the duplicate set, and the
    * gaps-and-islands merge exactly.
    */
  def spanDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.duplicatedSpans(Tables.documents(spark, dir), spanW)

  val spanDedupSql: String =
    s"""WITH toks AS (SELECT doc_id,
       |        list_filter(string_split(text, ' '), t -> len(t) > 0) AS tokens FROM documents),
       |t AS (SELECT doc_id, tokens, len(tokens) AS n FROM toks WHERE len(tokens) >= $spanW),
       |wins AS (SELECT doc_id, tokens, unnest(range(0, n - $spanW + 1)) AS p FROM t),
       |posts AS (SELECT doc_id, p,
       |          ${PortableHash.md5LongSql(s"array_to_string(tokens[p+1 : p+$spanW], ' ')")} AS h
       |          FROM wins),
       |dups AS (SELECT h FROM posts GROUP BY h HAVING count(*) >= 2),
       |dp AS (SELECT doc_id, p FROM posts JOIN dups USING (h)),
       |marked AS (SELECT doc_id, p,
       |           CASE WHEN p - lag(p) OVER w <= $spanW THEN 0 ELSE 1 END AS ns
       |           FROM dp WINDOW w AS (PARTITION BY doc_id ORDER BY p)),
       |sp AS (SELECT doc_id, p,
       |       sum(ns) OVER (PARTITION BY doc_id ORDER BY p) AS span_id FROM marked),
       |spans AS (SELECT doc_id, span_id, min(p) AS s, max(p) + $spanW AS e
       |          FROM sp GROUP BY 1, 2)
       |SELECT doc_id, count(*) AS n_dup_spans, CAST(sum(e - s) AS BIGINT) AS dup_tokens
       |FROM spans GROUP BY doc_id""".stripMargin

  // ------------------------------------------------- dedup: MinHash + LSH
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(Tables.documents(spark, dir), n = 3, perms = 64, bands = 16,
      num = jaccardNum, den = jaccardDen)

  /** MinHash CTE chain (shared by minhash_lsh and the curation pipeline). */
  private val minhashCtes: String = {
    val p = PortableHash.P
    s"""${shingleCtes(3)},
       |hs AS (SELECT doc_id, [(('0x' || substr(md5(s), 1, 15))::BIGINT % $p) for s in sh] AS hs
       |       FROM shs WHERE len(sh) > 0),
       |params AS (SELECT i,
       |    ((('0x' || substr(md5('a' || i), 1, 15))::BIGINT) % ${p - 1}) + 1 AS a,
       |    (('0x' || substr(md5('b' || i), 1, 15))::BIGINT) % $p AS b
       |  FROM range(64) t(i)),
       |sigs AS (SELECT doc_id, i, list_min([(a * h + b) % $p for h in hs]) AS m
       |         FROM hs, params),
       |bandkeys AS (SELECT doc_id, i // 4 AS band,
       |             string_agg(m::VARCHAR, ',' ORDER BY i) AS key
       |             FROM sigs GROUP BY doc_id, i // 4),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bandkeys a JOIN bandkeys b
       |           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |post AS (SELECT doc_id, unnest([${PortableHash.md5LongSql("s")} for s in sh]) AS h FROM shs),
       |common AS (SELECT c.doc_a, c.doc_b, count(*) AS n_common
       |           FROM cand c JOIN post pa ON pa.doc_id = c.doc_a
       |                       JOIN post pb ON pb.doc_id = c.doc_b AND pb.h = pa.h
       |           GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM shs)""".stripMargin
  }

  private val minhashFinalSelect: String =
    s"""SELECT doc_a, doc_b, n_common, sa.n_sh AS size_a, sb.n_sh AS size_b
       |FROM common JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE ${jaccardFilterSql("n_common", "sa.n_sh", "sb.n_sh")}""".stripMargin

  val minhashLshSql: String = s"WITH $minhashCtes\n$minhashFinalSelect"

  /** LSH blocking-key health profile: the bucket-size histogram per band of
    * the MinHash band keys — the first-class form of the SCALE.md round-2
    * lesson (a banded join went 547× quadratic when its blocking key
    * collapsed; one groupBy-count of block sizes would have caught it
    * before the join ran). `cand_pairs = n_buckets · C(sz, 2)` is the exact
    * verification workload each bucket size contributes, so the histogram
    * IS the join's cost model: a fat tail here means re-band before
    * running `minhash_lsh` at scale. Topology: signatures from the per-row
    * kernel (no exchange), one map-side-combined (band, key) count, one
    * histogram reduce over the size domain.
    */
  def lshBucketProfile(spark: SparkSession, dir: String): DataFrame =
    Dedup.bandKeysOf(
        Dedup.minhashSignatures(Tables.documents(spark, dir), 3, 64), 64, 16)
      .groupBy(col("band"), col("key")).agg(count(lit(1)).as("sz"))
      .groupBy(col("band").cast("long").as("band"), col("sz"))
      .agg(count(lit(1)).as("n_buckets"))
      .select(col("band"), col("sz"), col("n_buckets"),
        expr("n_buckets * ((sz * (sz - 1)) div 2)").as("cand_pairs"))

  val lshBucketProfileSql: String =
    s"""WITH $minhashCtes,
       |bk AS (SELECT band, key, count(*) AS sz FROM bandkeys GROUP BY 1, 2)
       |SELECT band, sz, count(*) AS n_buckets,
       |       CAST(count(*) * ((sz * (sz - 1)) // 2) AS BIGINT) AS cand_pairs
       |FROM bk GROUP BY 1, 2""".stripMargin

  // ------------------------------------ flagship #2: training-corpus build
  /** End-to-end training-corpus materialization — the full pipeline a
    * 100 TB pretraining run needs, composed from the library's own stages:
    *  1. duplicate-CLUSTER resolution keeps one doc per near-dup group
    *     (the component's minimal id — [[dupClusters]]);
    *  2. the fused per-row curation stage filters on quality / language /
    *     repetition ([[perRowCuration]], shared with the streaming twin);
    *  3. PII redaction rewrites surviving text ([[piiRedact]]'s chain —
    *     a no-op on the PII-free fixture, real work on real data, same
    *     plan either way);
    *  4. deterministic chunking emits the training-ready chunk index
    *     ([[docChunks]]'s 32/8 windows).
    * Output: one row per chunk with its content hash, token count, and
    * the doc's curation signals. Every stage is the library operator
    * itself, so the oracle is the stitched composition of their CTEs.
    */
  def trainingCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val clusters = Dedup.duplicateClusters(
      Dedup.minhashLshPairs(docs, n = 3, perms = 64, bands = 16,
        num = jaccardNum, den = jaccardDen).select("doc_a", "doc_b"))
      .withColumnRenamed("doc_id", "cid")
    // spread the survivor chain: everything downstream (curation signals,
    // three full-text redaction regexes, tokenize + chunk + hash) is per-row
    // CPU over multi-KB text, and the clusters join broadcasts — without the
    // spread it all runs inside the one-file fixture scan's single task
    // (profiled: a serial ~1.1 s stage at sf0.1)
    val keep = graft.engine.Spread.spreadSmallInput(docs)
      .join(clusters, col("doc_id") === col("cid"), "left")
      .filter(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      .drop("cid", "cluster_id")
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), TextAnalysis.emailRe, "<EMAIL>"),
          TextAnalysis.urlRe, "<URL>"),
        TextAnalysis.longDigitRe, "<NUM>")
    val cur = perRowCuration(keep)
      .select(col("doc_id"), redacted.as("clean"), col("pred_lang"), col("score_bp"))
    // chunking IS the library operator — one shared definition (chunkWindows)
    chunkWindows(
      cur.select(col("doc_id"), TextAnalysis.tokens(col("clean")).as("toks"),
        col("pred_lang"), col("score_bp")),
      Seq("pred_lang", "score_bp"))
  }

  val trainingCorpusSql: String = {
    val email = TextAnalysis.emailRe.replace("\\\\", "\\")
    s"""WITH RECURSIVE $minhashCtes,
       |pairs AS ($minhashFinalSelect),
       |ed AS (SELECT doc_a AS s, doc_b AS d FROM pairs
       |       UNION SELECT doc_b, doc_a FROM pairs),
       |reach(s, d) AS (SELECT s, d FROM ed
       |                UNION
       |                SELECT r.s, e.d FROM reach r JOIN ed e ON r.d = e.s),
       |cl AS (SELECT s AS doc_id, least(s, min(d)) AS cluster_id FROM reach GROUP BY s),
       |$curationSignalCtes,
       |cur AS (SELECT d.doc_id,
       |    regexp_replace(regexp_replace(regexp_replace(d.text,
       |      '$email', '<EMAIL>', 'g'),
       |      'https?://[^\\s]+', '<URL>', 'g'),
       |      '[0-9]{7,}', '<NUM>', 'g') AS clean,
       |    l.pred_lang, q.score_bp
       |  FROM documents d
       |  LEFT JOIN cl ON d.doc_id = cl.doc_id
       |  JOIN quality q ON d.doc_id = q.doc_id
       |  JOIN langp l ON d.doc_id = l.doc_id
       |  JOIN rep r ON d.doc_id = r.doc_id
       |  WHERE (cl.cluster_id IS NULL OR cl.cluster_id = d.doc_id)
       |    AND q.score_bp >= 1400 AND l.pred_lang = 'en' AND r.dup_2gram_bp < 600),
       |ct AS (SELECT doc_id, pred_lang, score_bp,
       |              list_filter(string_split(clean, ' '), t -> len(t) > 0) AS tokens
       |       FROM cur),
       |cn AS (SELECT doc_id, pred_lang, score_bp, tokens, len(tokens) AS n
       |       FROM ct WHERE len(tokens) > 0),
       |ks AS (SELECT doc_id, pred_lang, score_bp, tokens, n,
       |              unnest(range(greatest(1, (n - 8 + 23) // 24))) AS k FROM cn)
       |SELECT doc_id, k AS chunk_idx,
       |       len(tokens[k*24+1 : k*24+32]) AS n_chunk_tok,
       |       ${PortableHash.md5LongSql("array_to_string(tokens[k*24+1 : k*24+32], ' ')")} AS chunk_hash,
       |       pred_lang, score_bp
       |FROM ks""".stripMargin
  }

  // ---------------------------------------- split without duplicate leakage
  /** Train/val split WITHOUT near-dup leakage: membership is hashed from
    * the duplicate-CLUSTER label ([[dupClusters]]; singletons label
    * themselves), not the document id — so a near-dup pair can never
    * straddle the split. Splitting by doc id quietly leaks: the val set
    * "generalization" on memorized near-copies of training docs is the
    * classic eval-inflation bug. Deterministic md5 membership, no rand();
    * the leakage-freedom property itself is spec-asserted
    * (LlmOpsSpec "no near-dup pair straddles").
    */
  def splitNoLeakage(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val clusters = Dedup.duplicateClusters(
      Dedup.minhashLshPairs(docs, n = 3, perms = 64, bands = 16,
        num = jaccardNum, den = jaccardDen).select("doc_a", "doc_b"))
      .withColumnRenamed("doc_id", "cid")
    val group = coalesce(col("cluster_id"), col("doc_id"))
    docs.join(clusters, col("doc_id") === col("cid"), "left")
      .select(col("doc_id"), group.as("group_id"),
        when(pmod(PortableHash.md5Long(
          concat(lit("leak:"), group.cast("string"))), lit(100)) < 80, "train")
          .otherwise("val").as("split"))
  }

  val splitNoLeakageSql: String = {
    val h = PortableHash.md5LongSql("'leak:' || g::VARCHAR")
    s"""WITH RECURSIVE $minhashCtes,
       |pairs AS ($minhashFinalSelect),
       |ed AS (SELECT doc_a AS s, doc_b AS d FROM pairs
       |       UNION SELECT doc_b, doc_a FROM pairs),
       |reach(s, d) AS (SELECT s, d FROM ed
       |                UNION
       |                SELECT r.s, e.d FROM reach r JOIN ed e ON r.d = e.s),
       |cl AS (SELECT s AS doc_id, least(s, min(d)) AS cluster_id FROM reach GROUP BY s),
       |lab AS (SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS g
       |        FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id)
       |SELECT doc_id, g AS group_id,
       |       CASE WHEN $h % 100 < 80 THEN 'train' ELSE 'val' END AS split
       |FROM lab""".stripMargin
  }

  // ------------------------------------- dedup: weighted (bag) Jaccard
  /** DuckDB CTEs for the bag (multiset) shingle postings — mirrors
    * [[graft.llm.Dedup.bagPostings]]: all-occurrences shingles (no
    * distinct), hashed, grouped to (doc, hash, count). Casts keep every
    * summed weight BIGINT on both engines (DuckDB SUM(BIGINT) is HUGEINT).
    */
  private def bagCtes(n: Int): String =
    s"""toks AS (SELECT doc_id, text,
       |         list_filter(string_split(text, ' '), t -> len(t) > 0) AS tokens FROM documents),
       |shsa AS (SELECT doc_id,
       |         CASE WHEN len(tokens) >= $n
       |              THEN [array_to_string(tokens[i:i+${n - 1}], ' ')
       |                    for i in range(1, len(tokens) - ${n - 2})]
       |              ELSE [] END AS sh FROM toks),
       |bag AS (SELECT doc_id, ${PortableHash.md5LongSql("s")} AS h, CAST(count(*) AS BIGINT) AS cnt
       |        FROM (SELECT doc_id, unnest(sh) AS s FROM shsa) GROUP BY doc_id, s),
       |wsizes AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS w_sh FROM bag GROUP BY 1)""".stripMargin

  private val bagFinalSelect: String =
    s"""SELECT doc_a, doc_b, w_common, sa.w_sh AS wsize_a, sb.w_sh AS wsize_b
       |FROM common JOIN wsizes sa ON doc_a = sa.doc_id JOIN wsizes sb ON doc_b = sb.doc_id
       |WHERE w_common * $jaccardDen >= (sa.w_sh + sb.w_sh - w_common) * $jaccardNum""".stripMargin

  /** Exact weighted (bag) n-gram Jaccard: occurrence counts weight each
    * shingle, so template/boilerplate repetition that set-Jaccard is blind
    * to lowers the score ([[graft.llm.Dedup.bagJaccardPairs]]).
    */
  def bagJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.bagJaccardPairs(Tables.documents(spark, dir), 3, jaccardNum, jaccardDen)

  val bagJaccardSql: String =
    s"""WITH ${bagCtes(3)},
       |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |                  CAST(sum(least(a.cnt, b.cnt)) AS BIGINT) AS w_common
       |           FROM bag a JOIN bag b ON a.h = b.h AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2)
       |$bagFinalSelect""".stripMargin

  /** Weighted MinHash + LSH over the multiset expansion, verified with the
    * exact bag measure ([[graft.llm.Dedup.minhashWeightedPairs]]) — the
    * scale path for weighted dedup: constant-size signatures instead of
    * posting joins.
    */
  def minhashWeighted(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashWeightedPairs(Tables.documents(spark, dir), n = 3, perms = 64,
      bands = 16, num = jaccardNum, den = jaccardDen)

  val minhashWeightedSql: String = {
    val p = PortableHash.P
    s"""WITH ${bagCtes(3)},
       |expw AS (SELECT doc_id,
       |         unnest([CASE WHEN r = 1 THEN h
       |                      ELSE ${PortableHash.md5LongSql("h::VARCHAR || '#' || r")} END
       |                 for r in range(1, cnt + 1)]) AS h FROM bag),
       |params AS (SELECT i,
       |    ((('0x' || substr(md5('a' || i), 1, 15))::BIGINT) % ${p - 1}) + 1 AS a,
       |    (('0x' || substr(md5('b' || i), 1, 15))::BIGINT) % $p AS b
       |  FROM range(64) t(i)),
       |sigsw AS (SELECT e.doc_id, p.i, min((p.a * (e.h % $p) + p.b) % $p) AS m
       |          FROM expw e CROSS JOIN params p GROUP BY 1, 2),
       |bandkeys AS (SELECT doc_id, i // 4 AS band,
       |             string_agg(m::VARCHAR, ',' ORDER BY i) AS key
       |             FROM sigsw GROUP BY doc_id, i // 4),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bandkeys a JOIN bandkeys b
       |           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |common AS (SELECT c.doc_a, c.doc_b,
       |                  CAST(sum(least(pa.cnt, pb.cnt)) AS BIGINT) AS w_common
       |           FROM cand c JOIN bag pa ON pa.doc_id = c.doc_a
       |                       JOIN bag pb ON pb.doc_id = c.doc_b AND pb.h = pa.h
       |           GROUP BY 1, 2)
       |$bagFinalSelect""".stripMargin
  }

  // ---------------------------------------- dedup: duplicate clusters
  /** Connected components over the MinHash near-dup pair graph
    * ([[graft.llm.Dedup.duplicateClusters]]): every document in a duplicate
    * chain gets the chain's minimal doc id as its cluster label. The oracle
    * replays the fixpoint as reachability (recursive CTE) + min — the same
    * function, closed-form.
    */
  def dupClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.duplicateClusters(
      Dedup.minhashLshPairs(Tables.documents(spark, dir), n = 3, perms = 64,
        bands = 16, num = jaccardNum, den = jaccardDen)
        .select("doc_a", "doc_b"))

  val dupClustersSql: String =
    s"""WITH RECURSIVE $minhashCtes,
       |pairs AS ($minhashFinalSelect),
       |ed AS (SELECT doc_a AS s, doc_b AS d FROM pairs
       |       UNION SELECT doc_b, doc_a FROM pairs),
       |reach(s, d) AS (SELECT s, d FROM ed
       |                UNION
       |                SELECT r.s, e.d FROM reach r JOIN ed e ON r.d = e.s)
       |SELECT s AS doc_id, least(s, min(d)) AS cluster_id
       |FROM reach GROUP BY s""".stripMargin

  // ------------------------------------- dedup: canonical keeper per cluster
  /** Canonical-document selection: for every duplicate cluster keep the
    * HIGHEST-QUALITY member, not the lowest id — the curation-grade form of
    * cluster collapse (near-dup groups usually contain one clean original
    * and N boilerplate-damaged copies; keeping by id keeps an arbitrary
    * one). Composes [[Dedup.duplicateClusters]] with [[qualityScoreOf]];
    * singleton documents are their own cluster. Tie-break on lowest doc_id
    * via lexicographic struct max — deterministic.
    *
    * Scale: clusters + per-row quality + one map-side-combined `max_by`
    * aggregation — no window sort; the only new exchange is the final
    * groupBy(cluster_id).
    */
  def dedupBestKeeper(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val clusters = Dedup.duplicateClusters(
      Dedup.minhashLshPairs(docs, n = 3, perms = 64, bands = 16,
        num = jaccardNum, den = jaccardDen).select("doc_a", "doc_b"))
    qualityScoreOf(docs).select(col("doc_id"), col("score_bp"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        col("score_bp"))
      .groupBy("cluster_id")
      .agg(
        max_by(struct(col("doc_id"), col("score_bp")),
          struct(col("score_bp"), (-col("doc_id")).as("neg"))).as("k"),
        count(lit(1)).as("n_members"))
      .select(col("cluster_id"), col("k.doc_id").as("keeper_id"),
        col("k.score_bp").as("keeper_score_bp"), col("n_members"))
  }

  val dedupBestKeeperSql: String =
    s"""WITH RECURSIVE $minhashCtes,
       |pairs AS ($minhashFinalSelect),
       |ed AS (SELECT doc_a AS s, doc_b AS d FROM pairs
       |       UNION SELECT doc_b, doc_a FROM pairs),
       |reach(s, d) AS (SELECT s, d FROM ed
       |                UNION
       |                SELECT r.s, e.d FROM reach r JOIN ed e ON r.d = e.s),
       |cl AS (SELECT s AS doc_id, least(s, min(d)) AS cluster_id FROM reach GROUP BY s),
       |$curationSignalCtes,
       |m AS (SELECT q.doc_id, coalesce(cl.cluster_id, q.doc_id) AS cluster_id, q.score_bp
       |      FROM quality q LEFT JOIN cl USING (doc_id))
       |SELECT cluster_id, doc_id AS keeper_id, score_bp AS keeper_score_bp, n_members
       |FROM (SELECT cluster_id, doc_id, score_bp,
       |        count(*) OVER (PARTITION BY cluster_id) AS n_members,
       |        row_number() OVER (PARTITION BY cluster_id ORDER BY score_bp DESC, doc_id) AS rn
       |      FROM m)
       |WHERE rn = 1""".stripMargin

  // ----------------------------------------------------- dedup: SimHash
  private[queries] val simhashMaxDist = 4

  def simhashNeardup(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(spark, dir), simhashMaxDist)

  val simhashNeardupSql: String =
    s"""WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS tokens
       |              FROM documents),
       |tok AS (SELECT doc_id, unnest(tokens) AS t FROM toks WHERE len(tokens) > 0),
       |th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
       |bitsums AS (SELECT doc_id, j, SUM(((h >> j) % 2) * 2 - 1) AS s
       |            FROM th, range(60) r(j) GROUP BY 1, 2),
       |sigs AS (SELECT doc_id, SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS sig
       |         FROM bitsums GROUP BY 1)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       bit_count(xor(a.sig, b.sig)) AS hamming
       |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= $simhashMaxDist""".stripMargin

  // --------------------------------------------- dedup: eval decontamination
  /** Benchmark decontamination — flag training documents that share any
    * long n-gram (8 tokens, the standard contamination window) with the
    * held-out eval set, BEFORE training. Documents with doc_id % 10 == 0
    * play the benchmark; output is the contamination report
    * (train doc, eval doc, shared 8-gram count). The eval side is
    * `broadcast()` BY CONSTRUCTION — a benchmark suite is fixed-size and
    * small, which is exactly when a compile-time hint is safe — so the
    * training corpus streams through one codegen'd hash join: no shuffle
    * of the 100 TB side at all, the decisive property at scale.
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val posts = Dedup.shinglePostings(Tables.documents(spark, dir), n = 8)
      .transform(graft.engine.QueryCaches.registered)
    val evalSide = posts.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("doc_id").as("eval_id"), col("h"))
    val train = posts.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .select(col("doc_id").as("train_id"), col("h"))
    train.join(broadcast(evalSide), "h")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  val decontaminateSql: String =
    s"""WITH ${shingleCtes(8)},
       |post AS (SELECT doc_id, unnest([${PortableHash.md5LongSql("s")} for s in sh]) AS h FROM shs),
       |ev AS (SELECT doc_id AS eval_id, h FROM post WHERE doc_id % 10 = 0),
       |tr AS (SELECT doc_id AS train_id, h FROM post WHERE doc_id % 10 != 0)
       |SELECT train_id, eval_id, count(*) AS n_shared
       |FROM tr JOIN ev USING (h) GROUP BY 1, 2""".stripMargin

  // --------------------------------------- dedup: semantic decontamination
  private val semDecontamCos = 0.45

  /** Semantic decontamination — the paraphrase-robust complement to the
    * 8-gram [[decontaminate]]: a rewritten eval item shares no 8-gram with
    * its source, but its EMBEDDING stays close. Flags every corpus vector
    * whose cosine against ANY held-out eval vector (vec_id < 50, the
    * construction-bounded eval set) clears the threshold, with the best
    * matching eval item as evidence. Scale: the eval side broadcasts by
    * construction (same law as `decontaminate` — the 100 TB corpus side
    * NEVER shuffles); scoring is one codegen pass; the per-corpus-vector
    * max is a map-side-combinable `max_by` aggregation, no window sort.
    */
  def semanticDecontaminate(spark: SparkSession, dir: String): DataFrame =
    Similarity.semanticContamination(Tables.embeddings(spark, dir),
      col("vec_id") < 50, semDecontamCos)

  val semanticDecontaminateSql: String =
    s"""WITH e AS (SELECT vec_id, embedding, nullif(sqrt(${dot("e0", "e0")}), 0) AS nrm
       |           FROM embeddings e0),
       |scored AS (SELECT n.vec_id AS corpus_id, q.vec_id AS eval_id,
       |           round(${dot("q", "n")} / (q.nrm * n.nrm), 6) AS sim
       |           FROM e q JOIN e n ON q.vec_id < 50 AND n.vec_id >= 50)
       |SELECT corpus_id, eval_id, sim FROM (
       |  SELECT corpus_id, eval_id, sim,
       |         row_number() OVER (PARTITION BY corpus_id
       |                            ORDER BY sim DESC, eval_id ASC) AS r
       |  FROM scored WHERE sim >= $semDecontamCos)
       |WHERE r = 1""".stripMargin

  // ------------------------------------------------- text: document chunking
  /** Deterministic document chunking — fixed token windows with overlap
    * (32-token chunks, 8-token overlap, stride 24), the standard pre-
    * tokenization split for long documents. Pure per-row generator math:
    * chunk count = max(1, ceil((n − overlap) / stride)) so every token is
    * covered and short docs yield one chunk; the output carries the chunk's
    * token count and an md5 content hash (not the text — at 100 TB the
    * chunk table is an index, the text stays in the source). All integer /
    * md5 arithmetic, replayed exactly by the oracle's list slicing.
    * Scale: explode + codegen'd slice/hash per row, no shuffle at all.
    */
  def docChunks(spark: SparkSession, dir: String): DataFrame =
    chunkWindows(Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks")), Nil)

  /** The chunk geometry and window explode shared by [[docChunks]] and
    * [[trainingCorpus]] — ONE definition, so the two can never silently
    * diverge (the SQL side is likewise factored into [[docChunksCtes]]).
    * Input: (doc_id, toks, extra...); output: (doc_id, chunk_idx,
    * n_chunk_tok, chunk_hash, extra...).
    */
  private val chunkSize = 32
  private val chunkOverlap = 8

  private def chunkWindows(withToks: DataFrame, extra: Seq[String]): DataFrame = {
    val stride = chunkSize - chunkOverlap
    val nChunks = greatest(lit(1L),
      expr(s"(n_tok - $chunkOverlap + ${stride - 1}) div $stride"))
    val piece = slice(col("toks"), col("k") * stride + 1, lit(chunkSize))
    withToks
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .filter(col("n_tok") > 0)
      .select(col("doc_id") +: col("toks") +: extra.map(col) :+
        posexplode(sequence(lit(0L), nChunks - 1)): _*)
      .withColumnRenamed("col", "k")
      .select(col("doc_id") +: col("k").as("chunk_idx") +:
        size(piece).cast("long").as("n_chunk_tok") +:
        PortableHash.md5Long(concat_ws(" ", piece)).as("chunk_hash") +:
        extra.map(col): _*)
  }

  private val docChunksCtes: String =
    """toks AS (SELECT doc_id,
      |         list_filter(string_split(text, ' '), t -> len(t) > 0) AS tokens FROM documents),
      |t AS (SELECT doc_id, tokens, len(tokens) AS n FROM toks WHERE len(tokens) > 0),
      |ks AS (SELECT doc_id, tokens, n,
      |              unnest(range(greatest(1, (n - 8 + 23) // 24))) AS k FROM t)""".stripMargin

  private val docChunksSelect: String =
    s"""SELECT doc_id, k AS chunk_idx,
       |       len(tokens[k*24+1 : k*24+32]) AS n_chunk_tok,
       |       ${PortableHash.md5LongSql("array_to_string(tokens[k*24+1 : k*24+32], ' ')")} AS chunk_hash
       |FROM ks""".stripMargin

  val docChunksSql: String = s"WITH $docChunksCtes\n$docChunksSelect"

  /** Contrastive training-pair mining over the chunk lattice — the
    * self-supervised data-construction step for embedding training:
    * anchor/positive = consecutive chunks of the SAME document (local
    * coherence), negative = the first chunk of a deterministically
    * hash-paired OTHER document. Negative selection avoids any global
    * structure: documents pair within 64 md5 buckets (min↔max per
    * bucket), so the "random" negative is portable, partition-independent,
    * and oracle-replayable — no rand(), no global shuffle. Scale shape:
    * the positive lead() window is doc-partitioned (bounded by document
    * length, not corpus), bucket pairing runs on one row per document,
    * and every join is id-keyed. Output carries content HASHES — the
    * pair list ships ids, never text.
    */
  def contrastivePairs(spark: SparkSession, dir: String): DataFrame = {
    val ch = docChunks(spark, dir).transform(graft.engine.QueryCaches.registered)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("chunk_idx"))
    val pos = ch.withColumn("pos_hash", lead(col("chunk_hash"), 1).over(w))
      .filter(col("pos_hash").isNotNull)
      .select(col("doc_id"), col("chunk_idx"),
        col("chunk_hash").as("anchor_hash"), col("pos_hash"))
    val docs = ch.filter(col("chunk_idx") === 0)
      .select(col("doc_id"), col("chunk_hash").as("first_hash"))
      .withColumn("bucket",
        PortableHash.md5Long(concat(lit("cp:"), col("doc_id"))) % 64)
    val buckets = docs.groupBy(col("bucket"))
      .agg(min(col("doc_id")).as("dmin"), max(col("doc_id")).as("dmax"),
        count(lit(1)).as("bn"))
    val partner = docs.join(buckets, "bucket").filter(col("bn") >= 2)
      .select(col("doc_id"),
        when(col("doc_id") === col("dmin"), col("dmax"))
          .otherwise(col("dmin")).as("neg_doc"))
    pos.join(partner, "doc_id")
      .join(docs.select(col("doc_id").as("neg_doc"), col("first_hash").as("neg_hash")),
        "neg_doc")
      .select(col("doc_id"), col("chunk_idx"), col("anchor_hash"),
        col("pos_hash"), col("neg_doc"), col("neg_hash"))
  }

  val contrastivePairsSql: String =
    s"""WITH ch AS (SELECT * FROM ($docChunksSql)),
       |pos AS (SELECT doc_id, chunk_idx, chunk_hash AS anchor_hash,
       |          lead(chunk_hash) OVER (PARTITION BY doc_id ORDER BY chunk_idx) AS pos_hash
       |        FROM ch),
       |d AS (SELECT doc_id, chunk_hash AS first_hash,
       |        ${PortableHash.md5LongSql("'cp:' || doc_id")} % 64 AS bucket
       |      FROM ch WHERE chunk_idx = 0),
       |b AS (SELECT bucket, min(doc_id) AS dmin, max(doc_id) AS dmax, count(*) AS bn
       |      FROM d GROUP BY 1),
       |p AS (SELECT d.doc_id, CASE WHEN d.doc_id = b.dmin THEN b.dmax ELSE b.dmin END AS neg_doc
       |      FROM d JOIN b USING (bucket) WHERE bn >= 2),
       |nh AS (SELECT doc_id AS neg_doc, first_hash AS neg_hash FROM d)
       |SELECT pos.doc_id, chunk_idx, anchor_hash, pos_hash, p.neg_doc, nh.neg_hash
       |FROM pos JOIN p USING (doc_id) JOIN nh USING (neg_doc)
       |WHERE pos_hash IS NOT NULL""".stripMargin

  /** Cross-document repeated-substring detection (the chunk-level exact
    * dedup signal from suffix-array substring dedup, bounded to the fixed
    * 32-token chunk lattice): full-width chunks whose content hash occurs
    * in more than one document — shared boilerplate headers, licenses,
    * navigation text. Composes [[docChunks]] with one map-side-combined
    * aggregation; at 100 TB the chunk-hash groupBy is the only exchange
    * and carries 16-byte rows.
    */
  def chunkDedup(spark: SparkSession, dir: String): DataFrame =
    docChunks(spark, dir)
      .filter(col("n_chunk_tok") === 32)
      .groupBy(col("chunk_hash"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occur"),
        min(col("doc_id")).as("first_doc_id"))
      .filter(col("n_docs") > 1)

  val chunkDedupSql: String =
    s"""WITH $docChunksCtes,
       |chunks AS ($docChunksSelect)
       |SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occur,
       |       min(doc_id) AS first_doc_id
       |FROM chunks WHERE n_chunk_tok = 32
       |GROUP BY chunk_hash HAVING count(DISTINCT doc_id) > 1""".stripMargin

  // ------------------------------------- dedup: incremental (stream-shaped)
  /** Incremental near-dup under the oracle: documents with doc_id % 20 == 0
    * play the incoming 5% batch, signed PER ROW by the stateless
    * [[graft.functions.SimhashFP]] kernel and band-joined against the
    * remaining 95%'s index ([[graft.llm.Dedup.incrementalNeardupPairs]]).
    * Pigeonhole-exactness means the oracle is simply the all-pairs Hamming
    * join over the split — if the banded first-match plan dropped or
    * duplicated anything, the hash would diverge. The same plan runs
    * unchanged over a real stream (`Streaming.neardupStream`,
    * StreamingParitySpec).
    */
  def neardupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .filter(size(TextAnalysis.tokens(col("text"))) > 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val incoming = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    val index = Dedup.simhashBands(corpus.select(col("doc_id"),
      graft.functions.TextFunctions.graftSimhash(col("text"), 60).as("sig")))
    Dedup.incrementalNeardupPairs(incoming, index, maxDist = simhashMaxDist)
  }

  val neardupIncrementalSql: String =
    s"""WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS tokens
       |              FROM documents),
       |tok AS (SELECT doc_id, unnest(tokens) AS t FROM toks WHERE len(tokens) > 0),
       |th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
       |bitsums AS (SELECT doc_id, j, SUM(((h >> j) % 2) * 2 - 1) AS s
       |            FROM th, range(60) r(j) GROUP BY 1, 2),
       |sigs AS (SELECT doc_id, SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS sig
       |         FROM bitsums GROUP BY 1)
       |SELECT n.doc_id AS new_id, o.doc_id AS old_id,
       |       bit_count(xor(n.sig, o.sig)) AS hamming
       |FROM sigs n JOIN sigs o ON n.doc_id % 20 = 0 AND o.doc_id % 20 != 0
       |WHERE bit_count(xor(n.sig, o.sig)) <= $simhashMaxDist""".stripMargin

  // ------------------------------------------- vectors: int8 quantization
  /** Embedding int8 quantization summary ([[graft.functions.Quant8FP]]) —
    * the vector-store compression step (4× over float32), reported as
    * integer summary columns so the oracle compare stays scalar. Pure
    * per-row codegen kernel, no shuffle; floor-only float math keeps the
    * two engines bit-identical.
    */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.graftQuant8(col("embedding")).as("q"))
      .filter(size(col("q")) === 4)
      .select(col("vec_id"), col("q")(0).as("scale_bp"), col("q")(1).as("q_checksum"),
        col("q")(2).as("q_min"), col("q")(3).as("q_max"))

  val embedQuantizeSql: String =
    """WITH m AS (SELECT vec_id, embedding,
      |           list_max([abs(x::DOUBLE) for x in embedding]) AS ma FROM embeddings),
      |q AS (SELECT vec_id, CAST(floor(ma * 10000) AS BIGINT) AS scale_bp,
      |             [CAST(floor(x::DOUBLE * 127 / ma) AS BIGINT) for x in embedding] AS qs
      |      FROM m WHERE ma > 0)
      |SELECT vec_id, scale_bp,
      |       CAST(list_sum([qs[i] * i for i in range(1, len(qs) + 1)]) AS BIGINT) AS q_checksum,
      |       list_min(qs) AS q_min, list_max(qs) AS q_max
      |FROM q""".stripMargin

  // ------------------------------------------------ similarity: brute top-k
  def annTopk(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(Tables.embeddings(spark, dir), col("vec_id") < 10, k = 5)
      .select("q_id", "n_id", "sim", "rank")

  // a def, not a val: SQL vals earlier in the object call dot() during
  // object initialization, and a forward val reference would be null
  private def dotSql =
    "list_reduce([%s.embedding[i]::DOUBLE * %s.embedding[i]::DOUBLE for i in range(1, 65)], (acc, x) -> acc + x)"

  private def dot(a: String, b: String) = dotSql.format(a, b)

  val annTopkSql: String =
    s"""WITH e AS (SELECT vec_id, embedding, nullif(sqrt(${dot("e0", "e0")}), 0) AS nrm
       |           FROM embeddings e0),
       |scored AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id,
       |           round(${dot("q", "n")} / (q.nrm * n.nrm), 6) AS sim
       |           FROM e q JOIN e n ON q.vec_id < 10 AND n.vec_id != q.vec_id)
       |SELECT q_id, n_id, sim, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
       |  FROM scored)
       |WHERE rank <= 5""".stripMargin

  // ------------------------------------- similarity: k-NN classification
  /** k-NN majority vote over the embeddings' label column: a bounded
    * held-out query set (vec_id < 50 — construction-bounded like
    * [[annTopk]]'s, so the broadcast side can never be data-sized),
    * classified by each query's 5 nearest non-query neighbors
    * ([[graft.llm.Similarity.knnClassify]]). The oracle replays scoring,
    * top-k cut, and the vote tie-break exactly. For a DATA-SIZED holdout
    * (e.g. a 5% split) the brute scoring pass must be replaced by the
    * bucketed neighbor search (`ivf_neardup` / `ann_lsh` topology) — the
    * vote/tie-break stage here is unchanged by that swap.
    */
  def knnClassify(spark: SparkSession, dir: String): DataFrame =
    Similarity.knnClassify(Tables.embeddings(spark, dir),
      col("vec_id") < 50, k = 5)

  val knnClassifySql: String =
    s"""WITH e AS (SELECT vec_id, embedding, label, nullif(sqrt(${dot("e0", "e0")}), 0) AS nrm
       |           FROM embeddings e0),
       |scored AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id, n.label,
       |           round(${dot("q", "n")} / (q.nrm * n.nrm), 6) AS sim
       |           FROM e q JOIN e n ON q.vec_id < 50 AND n.vec_id >= 50),
       |topk AS (SELECT q_id, label, sim FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
       |  FROM scored) WHERE rank <= 5),
       |votes AS (SELECT q_id, label, count(*) AS votes, max(sim) AS best_sim
       |          FROM topk GROUP BY q_id, label)
       |SELECT q_id AS vec_id, label AS pred_label, votes FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |             ORDER BY votes DESC, best_sim DESC, label ASC) AS r
       |  FROM votes) WHERE r = 1""".stripMargin

  // ------------------------------------- similarity: exact near-dup pairs
  private val minCos = 0.45

  def embedNeardup(spark: SparkSession, dir: String): DataFrame =
    Similarity.exactNearDupPairs(Tables.embeddings(spark, dir), minCos)
      .select("a_id", "b_id", "sim")

  val embedNeardupSql: String =
    s"""WITH e AS (SELECT vec_id, embedding, nullif(sqrt(${dot("e0", "e0")}), 0) AS nrm
       |           FROM embeddings e0)
       |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |       round(${dot("a", "b")} / (a.nrm * b.nrm), 6) AS sim
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |WHERE round(${dot("a", "b")} / (a.nrm * b.nrm), 6) >= $minCos""".stripMargin

  // --------------------------------------------- similarity: sign-plane LSH
  def annLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshNearDupPairs(Tables.embeddings(spark, dir), Similarity.defaultPlanes, minCos)
      .select("a_id", "b_id", "sim")

  val annLshSql: String = {
    val planeRows = Similarity.defaultPlanes.zipWithIndex
      .map { case (row, p) => s"($p, [${row.mkString(", ")}])" }
      .mkString(",\n    ")
    val projDot =
      "list_reduce([e.embedding[i]::DOUBLE * pl.v[i]::DOUBLE for i in range(1, 65)], (acc, x) -> acc + x)"
    s"""WITH e AS (SELECT vec_id, embedding, nullif(sqrt(${dot("e0", "e0")}), 0) AS nrm
       |           FROM embeddings e0),
       |pl(p, v) AS (VALUES
       |    $planeRows),
       |proj AS (SELECT e.vec_id, pl.p, $projDot AS s FROM e, pl),
       |buckets AS (SELECT vec_id, p // 4 AS t,
       |            SUM(CASE WHEN s > 0 THEN (1::BIGINT << (p % 4)) ELSE 0 END) AS bucket
       |            FROM proj GROUP BY vec_id, p // 4),
       |cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
       |         FROM buckets a JOIN buckets b
       |           ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT a_id, b_id, round(${dot("ea", "eb")} / (ea.nrm * eb.nrm), 6) AS sim
       |FROM cand JOIN e ea ON ea.vec_id = a_id JOIN e eb ON eb.vec_id = b_id
       |WHERE round(${dot("ea", "eb")} / (ea.nrm * eb.nrm), 6) >= $minCos""".stripMargin
  }

  // ------------------------------------------- similarity: recall readout
  /** LSH recall/precision vs an exact baseline, ITSELF oracle-verified —
    * upgrades the recall floors from spec-asserted numbers to a
    * driver-checked query. The baseline is ANCHORED: a fixed 256-vector
    * sample (smallest portable hashes — a TakeOrdered of ids, broadcast)
    * is brute-scored against the whole corpus, so the exact side costs
    * 256·N dot products FOREVER — linear in corpus size, where the full
    * all-pairs baseline is quadratic (measured: the unanchored form went
    * 1.4 s → 12.6 s at just 4× data). Recall is then |LSH ∩ exact| over
    * the anchored exact pairs; precision pinning at 10000 proves under
    * the oracle that the verify stage admits NO false positives on the
    * anchored subset. Both pipelines replay bit-for-bit in DuckDB, so the
    * derived basis points hash-match too.
    */
  def annRecallEval(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val anchors = broadcast(
      emb.select(col("vec_id").as("a_vid"), col("embedding").as("a_emb"),
        PortableHash.md5Long(concat(lit("ar:"), col("vec_id"))).as("h"))
        .orderBy(col("h"), col("a_vid")).limit(256)
        .withColumn("a_nrm", nullif(Similarity.norm(col("a_emb")), lit(0.0))))
    val base = graft.engine.Spread.spreadSmallInput(emb)
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", nullif(Similarity.norm(col("embedding")), lit(0.0)))
    val exact = base.join(anchors, col("a_vid") =!= col("vec_id"))
      .withColumn("sim",
        round(Similarity.dot(col("a_emb"), col("embedding")) / (col("a_nrm") * col("nrm")), 6))
      .filter(col("sim") >= minCos)
      .select(least(col("a_vid"), col("vec_id")).as("a_id"),
        greatest(col("a_vid"), col("vec_id")).as("b_id"))
      .distinct().transform(graft.engine.QueryCaches.registered)
    val aIds = anchors.select(col("a_vid"))
    val lshAll = Similarity.lshNearDupPairs(emb, Similarity.defaultPlanes, minCos)
      .select("a_id", "b_id")
    val lsh = lshAll.join(broadcast(aIds), col("a_id") === col("a_vid"), "left_semi")
      .union(lshAll.join(broadcast(aIds), col("b_id") === col("a_vid"), "left_semi"))
      .distinct().transform(graft.engine.QueryCaches.registered)
    val nE = exact.agg(count(lit(1)).as("n_exact"))
    val nL = lsh.agg(count(lit(1)).as("n_lsh"))
    val nH = lsh.join(exact, Seq("a_id", "b_id"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    nE.crossJoin(nL).crossJoin(nH)
      .select(col("n_exact"), col("n_lsh"), col("n_hit"),
        expr("(10000 * n_hit) div n_exact").as("recall_bp"),
        expr("(10000 * n_hit) div n_lsh").as("precision_bp"))
  }

  val annRecallEvalSql: String = {
    val anchorDot =
      "list_reduce([an.a_emb[i]::DOUBLE * e.embedding[i]::DOUBLE for i in range(1, 65)], (acc, x) -> acc + x)"
    s"""WITH e AS (SELECT vec_id, embedding, nullif(sqrt(${dot("e0", "e0")}), 0) AS nrm
       |           FROM embeddings e0),
       |an AS (SELECT vec_id AS a_vid, embedding AS a_emb, nrm AS a_nrm
       |       FROM e ORDER BY ${PortableHash.md5LongSql("'ar:' || vec_id")}, vec_id LIMIT 256),
       |ex AS (SELECT DISTINCT least(a_vid, e.vec_id) AS a_id,
       |                       greatest(a_vid, e.vec_id) AS b_id
       |       FROM an, e WHERE a_vid != e.vec_id
       |         AND round($anchorDot / (an.a_nrm * e.nrm), 6) >= $minCos),
       |lshall AS (SELECT a_id, b_id FROM ($annLshSql)),
       |lsh AS (SELECT DISTINCT a_id, b_id FROM lshall
       |        WHERE a_id IN (SELECT a_vid FROM an) OR b_id IN (SELECT a_vid FROM an)),
       |ne AS (SELECT count(*) AS n_exact FROM ex),
       |nl AS (SELECT count(*) AS n_lsh FROM lsh),
       |nh AS (SELECT count(*) AS n_hit FROM lsh JOIN ex USING (a_id, b_id))
       |SELECT n_exact, n_lsh, n_hit,
       |       (10000 * n_hit) // n_exact AS recall_bp,
       |       (10000 * n_hit) // n_lsh AS precision_bp
       |FROM ne, nl, nh""".stripMargin
  }

  // ----------------------------------- similarity: multi-probe sign-plane
  /** Symmetric n-way multi-probe LSH: probe q of each table flips the
    * q-th lowest-|margin| bit (the planes most likely to have hashed a
    * near-neighbor to the other side, in likelihood order). Same join
    * topology; recall rises for ~probes× candidate cost — the sign-plane
    * analogue of [[ivfMultiprobeNeardup]]'s nprobe knob. Judged at
    * probes=3; the knob accepts 1..width+1.
    */
  private val lshProbes = 3

  def annLshMultiprobe(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshNearDupPairs(Tables.embeddings(spark, dir),
        Similarity.defaultPlanes, minCos, probes = lshProbes)
      .select("a_id", "b_id", "sim")

  val annLshMultiprobeSql: String = {
    val planeRows = Similarity.defaultPlanes.zipWithIndex
      .map { case (row, p) => s"($p, [${row.mkString(", ")}])" }
      .mkString(",\n    ")
    val projDot =
      "list_reduce([e.embedding[i]::DOUBLE * pl.v[i]::DOUBLE for i in range(1, 65)], (acc, x) -> acc + x)"
    s"""WITH e AS (SELECT vec_id, embedding, nullif(sqrt(${dot("e0", "e0")}), 0) AS nrm
       |           FROM embeddings e0),
       |pl(p, v) AS (VALUES
       |    $planeRows),
       |proj AS (SELECT e.vec_id, pl.p, $projDot AS s FROM e, pl),
       |tb AS (SELECT vec_id, p // 4 AS t, p % 4 AS j, s FROM proj),
       |b0 AS (SELECT vec_id, t, SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS bucket
       |       FROM tb GROUP BY vec_id, t),
       |jm AS (SELECT vec_id, t, j FROM (
       |    SELECT vec_id, t, j,
       |           row_number() OVER (PARTITION BY vec_id, t ORDER BY abs(s), j) AS rn
       |    FROM tb) WHERE rn <= ${lshProbes - 1}),
       |bk AS (SELECT vec_id, t, bucket FROM b0
       |       UNION ALL
       |       SELECT b0.vec_id, b0.t, xor(b0.bucket, (1::BIGINT << jm.j))
       |       FROM b0 JOIN jm USING (vec_id, t)),
       |cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
       |         FROM bk a JOIN bk b
       |           ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT a_id, b_id, round(${dot("ea", "eb")} / (ea.nrm * eb.nrm), 6) AS sim
       |FROM cand JOIN e ea ON ea.vec_id = a_id JOIN e eb ON eb.vec_id = b_id
       |WHERE round(${dot("ea", "eb")} / (ea.nrm * eb.nrm), 6) >= $minCos""".stripMargin
  }

  // --------------------------------------------- similarity: IVF cells
  // Cell count wired to the corpus size ([[Similarity.ivfCells]]: ⌈√N⌉,
  // floor 16) — the one extra job is a count(). The ORACLE computes the
  // identical rule as a scalar subquery, so Spark and DuckDB always agree
  // on the codebook at any scale; both sides take IEEE-double sqrt/ceil.
  private val ivfMinK = 16
  private def ivfK(spark: SparkSession, dir: String): Int =
    Similarity.ivfCells(Tables.embeddings(spark, dir).count(), ivfMinK)
  private val ivfKSql: String =
    s"(SELECT GREATEST($ivfMinK, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT)) FROM embeddings)"

  def ivfNeardup(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfNearDupPairs(Tables.embeddings(spark, dir), ivfK(spark, dir), minCos)
      .select("a_id", "b_id", "sim")

  val ivfNeardupSql: String = {
    def ldot(a: String, b: String) =
      s"list_reduce([$a[i]::DOUBLE * $b[i]::DOUBLE for i in range(1, 65)], (acc, x) -> acc + x)"
    s"""WITH e AS (SELECT vec_id, embedding, nullif(sqrt(${ldot("e0.embedding", "e0.embedding")}), 0) AS nrm
       |           FROM embeddings e0),
       |cb AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM e WHERE vec_id < $ivfKSql),
       |scored AS (SELECT e.vec_id, cb.c_id,
       |           round(${ldot("e.embedding", "cb.c_emb")} / (e.nrm * cb.c_nrm), 6) AS sim_c
       |           FROM e, cb),
       |assigned AS (SELECT vec_id, c_id AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim_c DESC, c_id ASC) AS rn
       |    FROM scored) WHERE rn = 1)
       |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |       round(${ldot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm), 6) AS sim
       |FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id
       |WHERE round(${ldot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm), 6) >= $minCos""".stripMargin
  }

  // ----------------------------------- similarity: multi-probe IVF
  private val ivfNprobe = 2

  def ivfMultiprobeNeardup(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfNearDupPairsMultiProbe(Tables.embeddings(spark, dir), ivfK(spark, dir), ivfNprobe, minCos)
      .select("a_id", "b_id", "sim")

  val ivfMultiprobeNeardupSql: String = {
    def ldot(a: String, b: String) =
      s"list_reduce([$a[i]::DOUBLE * $b[i]::DOUBLE for i in range(1, 65)], (acc, x) -> acc + x)"
    s"""WITH e AS (SELECT vec_id, embedding, nullif(sqrt(${ldot("e0.embedding", "e0.embedding")}), 0) AS nrm
       |           FROM embeddings e0),
       |cb AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM e WHERE vec_id < $ivfKSql),
       |scored AS (SELECT e.vec_id, cb.c_id,
       |           round(${ldot("e.embedding", "cb.c_emb")} / (e.nrm * cb.c_nrm), 6) AS sim_c
       |           FROM e, cb),
       |assigned AS (SELECT vec_id, c_id AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim_c DESC, c_id ASC) AS rn
       |    FROM scored) WHERE rn <= $ivfNprobe),
       |cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
       |         FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id)
       |SELECT a_id, b_id,
       |       round(${ldot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm), 6) AS sim
       |FROM cand JOIN e ea ON ea.vec_id = a_id JOIN e eb ON eb.vec_id = b_id
       |WHERE round(${ldot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm), 6) >= $minCos""".stripMargin
  }

  // ------------------------------ similarity: recall-targeted nprobe IVF
  // The selector in the loop (round-8 verdict #4): nprobe is no longer a
  // caller-picked constant — the plan calibrates recall on a deterministic
  // held-out sample (every sampleMod-th vec_id; sampleMod sized so the
  // sample holds ~512 vectors at ANY corpus scale, the ivfCells pattern)
  // and picks the smallest nprobe meeting 85% sample recall, capped at 4.
  // Ground truth is the sample's exact neighbors against the WHOLE corpus
  // (one-end sampling — both-ends sampling thins pairs by 1/mod² and
  // measured ZERO truth pairs at 64×). The oracle replays the WHOLE
  // selection: truth pairs, each pair's minimal recovering probe depth,
  // the ⌈0.85·total⌉-th smallest of those minima, then the final
  // multi-probe join at that np.
  private val ivfMaxProbe = 4
  private val ivfRecallNum = 85
  private val ivfRecallDen = 100
  private val ivfSampleTarget = 512
  /** The production sample-mod formula, exposed so harness probes
    * (ScaleProbe's selector cases) measure the operating point the query
    * ships instead of re-hardcoding 512 — if the sample target is ever
    * tuned, probe and production move together.
    */
  private[graft] def sampleModFor(n: Long): Long =
    math.max(1L, math.ceil(n / ivfSampleTarget.toDouble).toLong)
  private def ivfSampleMod(spark: SparkSession, dir: String): Long =
    sampleModFor(Tables.embeddings(spark, dir).count())
  private val ivfSampleModSql: String =
    s"(SELECT GREATEST(1, CAST(CEIL(COUNT(*) / $ivfSampleTarget.0) AS BIGINT)) FROM embeddings)"

  def ivfAutoprobeNeardup(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfAutoProbePairs(Tables.embeddings(spark, dir), ivfK(spark, dir),
      ivfMaxProbe, ivfRecallNum, ivfRecallDen, ivfSampleMod(spark, dir), minCos)
      .select("a_id", "b_id", "sim", "nprobe")

  /** Force every CTE of a selector-style oracle to `AS MATERIALIZED`.
    *
    * DuckDB INLINES a CTE at each reference site, so an oracle that
    * replays a decision DAG — where `truth`/`ranked`/`choice` feed many
    * downstream stages — recomputes whole subtrees once per reference,
    * multiplicatively through the DAG. Measured on `ann_recall_target`:
    * 12.7 s → 0.8 s at sf0.01, and at the x10 tier (20k vectors) the
    * inlined form spilled > 73 GB of DuckDB temp and died ENOSPC three
    * times (the "sf1-tier" blocker first recorded in BASELINE.md) while
    * the materialized form completes in minutes with ZERO spill —
    * identical rows both scales. Only CTE heads at line start are
    * rewritten; VALUES-list CTEs like `np(np) AS (` keep their shape
    * (materializing constants buys nothing).
    */
  private def withMaterializedCtes(sql: String): String =
    sql.replaceFirst("""^WITH (\w+) AS \(""", "WITH $1 AS MATERIALIZED (")
      .replaceAll("""(?m)^(\w+) AS \(""", "$1 AS MATERIALIZED (")

  val ivfAutoprobeNeardupSql: String = withMaterializedCtes {
    def ldot(a: String, b: String) =
      s"list_reduce([$a[i]::DOUBLE * $b[i]::DOUBLE for i in range(1, 65)], (acc, x) -> acc + x)"
    s"""WITH e AS (SELECT vec_id, embedding, nullif(sqrt(${ldot("e0.embedding", "e0.embedding")}), 0) AS nrm
       |           FROM embeddings e0),
       |cb AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM e WHERE vec_id < $ivfKSql),
       |scored AS (SELECT e.vec_id, cb.c_id,
       |           round(${ldot("e.embedding", "cb.c_emb")} / (e.nrm * cb.c_nrm), 6) AS sim_c
       |           FROM e, cb),
       |ranked AS (SELECT vec_id, c_id AS cell, rn FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim_c DESC, c_id ASC) AS rn
       |    FROM scored) WHERE rn <= $ivfMaxProbe),
       |samp AS (SELECT vec_id, embedding, nrm FROM e WHERE vec_id % $ivfSampleModSql = 0),
       |truth AS (SELECT DISTINCT LEAST(a.vec_id, b.vec_id) AS a_id,
       |                 GREATEST(a.vec_id, b.vec_id) AS b_id
       |          FROM samp a JOIN e b ON b.vec_id <> a.vec_id
       |          WHERE round(${ldot("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) >= $minCos),
       |minneed AS (SELECT t.a_id, t.b_id, MIN(GREATEST(x.rn, y.rn)) AS need_np
       |            FROM truth t
       |            JOIN ranked x ON x.vec_id = t.a_id
       |            JOIN ranked y ON y.vec_id = t.b_id AND y.cell = x.cell
       |            GROUP BY t.a_id, t.b_id),
       |tot AS (SELECT ((COUNT(*) * $ivfRecallNum + $ivfRecallDen - 1) // $ivfRecallDen) AS need FROM truth),
       |ordn AS (SELECT need_np, row_number() OVER (ORDER BY need_np) AS pos FROM minneed),
       |chosen AS (SELECT COALESCE(o.need_np, CASE WHEN t.need = 0 THEN 1 ELSE $ivfMaxProbe END) AS np
       |           FROM tot t LEFT JOIN ordn o ON o.pos = t.need),
       |assigned AS (SELECT r.vec_id, r.cell FROM ranked r, chosen WHERE r.rn <= chosen.np),
       |cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
       |         FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id)
       |SELECT c.a_id, c.b_id,
       |       round(${ldot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm), 6) AS sim,
       |       CAST((SELECT np FROM chosen) AS BIGINT) AS nprobe
       |FROM cand c JOIN e ea ON ea.vec_id = c.a_id JOIN e eb ON eb.vec_id = c.b_id
       |WHERE round(${ldot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm), 6) >= $minCos""".stripMargin
  }

  // --------------------- similarity: cross-family recall-target selector
  // Round-9 verdict #1: a stated recall target made actually REACHABLE.
  // The operator measures the sample recall/cost curve of an IVF
  // (cells × nprobe) grid — √N cells plus two coarser tiers, np ≤ 8 —
  // AND a multi-table sign-LSH grid ((8,4), (8,8), (16,8) over the
  // deterministic 128-plane matrix, probes ≤ 4), then runs the CHEAPEST
  // setting (by raw candidate mass = in-join similarity evaluations)
  // whose sample recall meets 85% within a 128·N·⌈√N⌉ mass budget.
  // Measured at 64× (SCALE.md): √N-cells IVF tops out at 37.6% within
  // np≤4; the co-sized grid reaches 90.7% at 4.47e9 mass (90 cells,
  // np 7); the LSH family reaches 85.6% at 2.40e9 (16 tables × 8 bits,
  // probes 2) — the selector picks the LSH point, and the emitted
  // recall_bp column states the achieved sample recall. The oracle
  // replays ALL of it: truth, both grids' recovery depths and masses,
  // the ordered choice, and the chosen route's verified pair join.
  // private[graft] (not private): ScaleProbe's recalltarget case measures
  // THIS configuration — sharing the constants pins probe and production
  // to the same operating point (same for [[sampleModFor]]/[[massBudgetFor]])
  private[graft] val annTargetMaxProbe = 8
  private[graft] val annTargetLshGrid = Seq((8, 4), (8, 8), (16, 8))
  private[graft] val annTargetMaxLshProbe = 4
  private[graft] def annTargetCells(n: Long): Int = Similarity.ivfCells(n, ivfMinK)
  private[graft] def massBudgetFor(n: Long): Long = 128L * n * annTargetCells(n)
  private def annTargetBudget(spark: SparkSession, dir: String): Long =
    massBudgetFor(Tables.embeddings(spark, dir).count())
  private val annTargetBudgetSql: String =
    s"(SELECT 128 * COUNT(*) * GREATEST($ivfMinK, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT)) FROM embeddings)"

  def annRecallTarget(spark: SparkSession, dir: String): DataFrame =
    Similarity.annRecallTargetPairs(Tables.embeddings(spark, dir),
      ivfK(spark, dir), annTargetMaxProbe, annTargetLshGrid, annTargetMaxLshProbe,
      Similarity.widePlanes, ivfRecallNum, ivfRecallDen,
      ivfSampleMod(spark, dir), minCos, annTargetBudget(spark, dir))
      .select("a_id", "b_id", "sim", "route", "cells", "tables", "width", "probe", "recall_bp")

  val annRecallTargetSql: String = withMaterializedCtes {
    def ldot(a: String, b: String) =
      s"list_reduce([$a[i]::DOUBLE * $b[i]::DOUBLE for i in range(1, 65)], (acc, x) -> acc + x)"
    val planeRows = Similarity.widePlanes.zipWithIndex
      .map { case (row, p) => s"($p, [${row.mkString(", ")}])" }
      .mkString(",\n    ")
    val cfgRows = annTargetLshGrid.map { case (l, w) => s"($l, $w)" }.mkString(", ")
    val projDot =
      "list_reduce([e.embedding[i]::DOUBLE * pl.v[i]::DOUBLE for i in range(1, 65)], (acc, x) -> acc + x)"
    s"""WITH e AS (SELECT vec_id, embedding, nullif(sqrt(${ldot("e0.embedding", "e0.embedding")}), 0) AS nrm
       |           FROM embeddings e0),
       |cb AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM e WHERE vec_id < $ivfKSql),
       |scored AS (SELECT e.vec_id, cb.c_id,
       |           round(${ldot("e.embedding", "cb.c_emb")} / (e.nrm * cb.c_nrm), 6) AS sim_c
       |           FROM e, cb),
       |lv AS (SELECT DISTINCT lvl FROM (
       |    SELECT $ivfKSql AS lvl
       |    UNION ALL SELECT GREATEST($ivfMinK, ($ivfKSql + 3) // 4)
       |    UNION ALL SELECT GREATEST($ivfMinK, ($ivfKSql + 15) // 16))),
       |rankedg AS (SELECT lvl, vec_id, cell, rn FROM (
       |    SELECT lv.lvl, s.vec_id, s.c_id AS cell,
       |           row_number() OVER (PARTITION BY lv.lvl, s.vec_id ORDER BY s.sim_c DESC, s.c_id) AS rn
       |    FROM scored s JOIN lv ON s.c_id < lv.lvl) WHERE rn <= $annTargetMaxProbe),
       |samp AS (SELECT vec_id, embedding, nrm FROM e WHERE vec_id % $ivfSampleModSql = 0),
       |truth AS (SELECT DISTINCT LEAST(a.vec_id, b.vec_id) AS a_id,
       |                 GREATEST(a.vec_id, b.vec_id) AS b_id
       |          FROM samp a JOIN e b ON b.vec_id <> a.vec_id
       |          WHERE round(${ldot("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) >= $minCos),
       |tot AS (SELECT count(*) AS total FROM truth),
       |np(np) AS (VALUES ${(1 to annTargetMaxProbe).map(i => s"($i)").mkString(", ")}),
       |minneed AS (SELECT x.lvl, t.a_id, t.b_id, MIN(GREATEST(x.rn, y.rn)) AS need_np
       |            FROM truth t
       |            JOIN rankedg x ON x.vec_id = t.a_id
       |            JOIN rankedg y ON y.vec_id = t.b_id AND y.cell = x.cell AND y.lvl = x.lvl
       |            GROUP BY x.lvl, t.a_id, t.b_id),
       |ivfrec AS (SELECT lv.lvl, np.np, count(m.need_np) AS recovered
       |           FROM lv CROSS JOIN np
       |           LEFT JOIN minneed m ON m.lvl = lv.lvl AND m.need_np <= np.np
       |           GROUP BY lv.lvl, np.np),
       |ivfmass AS (SELECT lvl, np, SUM(c * (c - 1) // 2) AS mass FROM (
       |    SELECT r.lvl, np.np AS np, r.cell, count(*) AS c
       |    FROM rankedg r JOIN np ON r.rn <= np.np GROUP BY r.lvl, np.np, r.cell)
       |  GROUP BY lvl, np),
       |pl(p, v) AS (VALUES
       |    $planeRows),
       |proj AS (SELECT e.vec_id, pl.p, $projDot AS s FROM e, pl),
       |cfg(tables, width) AS (VALUES $cfgRows),
       |tb AS (SELECT cfg.tables, cfg.width, vec_id, p // cfg.width AS t, p % cfg.width AS j, s
       |       FROM proj, cfg WHERE p < cfg.tables * cfg.width),
       |b0 AS (SELECT tables, width, vec_id, t,
       |       SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS bucket
       |       FROM tb GROUP BY tables, width, vec_id, t),
       |jm AS (SELECT tables, width, vec_id, t, j, rn AS q FROM (
       |    SELECT tables, width, vec_id, t, j,
       |           row_number() OVER (PARTITION BY tables, width, vec_id, t ORDER BY abs(s), j) AS rn
       |    FROM tb) WHERE rn <= ${annTargetMaxLshProbe - 1}),
       |bk AS (SELECT tables, width, vec_id, t, 0 AS q, bucket FROM b0
       |       UNION ALL
       |       SELECT b0.tables, b0.width, b0.vec_id, b0.t, jm.q, xor(b0.bucket, (1::BIGINT << jm.j))
       |       FROM b0 JOIN jm USING (tables, width, vec_id, t)),
       |ps(p) AS (VALUES ${(1 to annTargetMaxLshProbe).map(i => s"($i)").mkString(", ")}),
       |lshmass AS (SELECT tables, width, p, SUM(c * (c - 1) // 2) AS mass FROM (
       |    SELECT bk.tables, bk.width, ps.p AS p, bk.t, bk.bucket, count(*) AS c
       |    FROM bk JOIN ps ON bk.q < ps.p GROUP BY bk.tables, bk.width, ps.p, bk.t, bk.bucket)
       |  GROUP BY tables, width, p),
       |eps AS (SELECT a_id AS id FROM truth UNION SELECT b_id FROM truth),
       |epk AS (SELECT bk.* FROM bk JOIN eps ON bk.vec_id = eps.id),
       |lshneed AS (SELECT x.tables, x.width, t.a_id, t.b_id, MIN(GREATEST(x.q, y.q) + 1) AS need_p
       |            FROM truth t
       |            JOIN epk x ON x.vec_id = t.a_id
       |            JOIN epk y ON y.vec_id = t.b_id AND y.tables = x.tables AND y.width = x.width
       |                      AND y.t = x.t AND y.bucket = x.bucket
       |            GROUP BY x.tables, x.width, t.a_id, t.b_id),
       |lshrec AS (SELECT cfg.tables, cfg.width, ps.p, count(n.need_p) AS recovered
       |           FROM cfg CROSS JOIN ps
       |           LEFT JOIN lshneed n ON n.tables = cfg.tables AND n.width = cfg.width AND n.need_p <= ps.p
       |           GROUP BY cfg.tables, cfg.width, ps.p),
       |allset AS (
       |    SELECT 'ivf' AS route, r.lvl AS cells, 0 AS tables, 0 AS width, r.np AS probe, r.recovered, m.mass
       |    FROM ivfrec r JOIN ivfmass m ON m.lvl = r.lvl AND m.np = r.np
       |    UNION ALL
       |    SELECT 'lsh', 0, r.tables, r.width, r.p, r.recovered, m.mass
       |    FROM lshrec r JOIN lshmass m ON m.tables = r.tables AND m.width = r.width AND m.p = r.p),
       |qual AS (SELECT a.* FROM allset a, tot
       |         WHERE a.recovered * $ivfRecallDen >= $ivfRecallNum * tot.total
       |           AND a.mass <= $annTargetBudgetSql
       |         ORDER BY a.mass, a.probe, a.route, a.cells, a.tables, a.width LIMIT 1),
       |beste AS (SELECT a.* FROM allset a
       |          ORDER BY a.recovered DESC, a.mass, a.probe, a.route, a.cells, a.tables, a.width LIMIT 1),
       |choice AS (SELECT * FROM qual
       |           UNION ALL SELECT * FROM beste WHERE NOT EXISTS (SELECT 1 FROM qual)),
       |ivfassigned AS (SELECT r.vec_id, r.cell FROM rankedg r
       |                JOIN choice c ON c.route = 'ivf' AND r.lvl = c.cells AND r.rn <= c.probe),
       |ivfpairs AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id,
       |                    round(${ldot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm), 6) AS sim
       |             FROM ivfassigned a JOIN ivfassigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |             JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id
       |             WHERE round(${ldot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm), 6) >= $minCos),
       |lshbk AS (SELECT bk.vec_id, bk.t, bk.bucket FROM bk
       |          JOIN choice c ON c.route = 'lsh' AND bk.tables = c.tables AND bk.width = c.width AND bk.q < c.probe),
       |lshpairs AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id,
       |                    round(${ldot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm), 6) AS sim
       |             FROM lshbk a JOIN lshbk b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
       |             JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id
       |             WHERE round(${ldot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm), 6) >= $minCos)
       |SELECT p.a_id, p.b_id, p.sim, c.route,
       |       CAST(c.cells AS BIGINT) AS cells, CAST(c.tables AS BIGINT) AS tables,
       |       CAST(c.width AS BIGINT) AS width, CAST(c.probe AS BIGINT) AS probe,
       |       CAST(CASE WHEN tot.total = 0 THEN 10000 ELSE c.recovered * 10000 // tot.total END AS BIGINT) AS recall_bp
       |FROM (SELECT * FROM ivfpairs UNION ALL SELECT * FROM lshpairs) p, choice c, tot""".stripMargin
  }

  // ------------------------------------------ similarity: k-means IVF
  def ivfKmeansNeardup(spark: SparkSession, dir: String): DataFrame =
    Similarity.kmeansIvfPairs(Tables.embeddings(spark, dir), k = ivfK(spark, dir), iters = 1, minCos)
      .select("a_id", "b_id", "sim")

  val ivfKmeansNeardupSql: String = {
    def ldot(a: String, b: String) =
      s"list_reduce([$a[i] * $b[i] for i in range(1, 65)], (acc, x) -> acc + x)"
    def edot(a: String, b: String) =
      s"list_reduce([$a[i]::DOUBLE * $b[i]::DOUBLE for i in range(1, 65)], (acc, x) -> acc + x)"
    s"""WITH e AS (SELECT vec_id, embedding, nullif(sqrt(${edot("e0.embedding", "e0.embedding")}), 0) AS nrm
       |           FROM embeddings e0),
       |cb0 AS (SELECT vec_id::INT AS cell, [x::DOUBLE for x in embedding] AS c
       |        FROM embeddings WHERE vec_id < $ivfKSql),
       |cb0n AS (SELECT cell, c, sqrt(${ldot("c", "c")}) AS cn FROM cb0),
       |s0 AS (SELECT e.vec_id, cb.cell,
       |       round(${edot("e.embedding", "cb.c")} / (e.nrm * cb.cn), 6) AS sim
       |       FROM e, cb0n cb),
       |a0 AS (SELECT vec_id, cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell ASC) AS rn
       |    FROM s0) WHERE rn = 1),
       |comp AS (SELECT a0.cell, generate_subscripts(e.embedding, 1) AS pos, unnest(e.embedding) AS v
       |         FROM a0 JOIN e ON e.vec_id = a0.vec_id),
       |cb1u AS (SELECT cell, list(comp_val ORDER BY pos) AS c FROM (
       |    SELECT cell, pos,
       |           CAST(SUM(CAST(floor(v::DOUBLE * 1000000) AS BIGINT)) AS DOUBLE)
       |             / (count(*) * 1000000.0) AS comp_val
       |    FROM comp GROUP BY cell, pos) GROUP BY cell),
       |cb1 AS (SELECT cb0.cell, coalesce(cb1u.c, cb0.c) AS c
       |        FROM cb0 LEFT JOIN cb1u ON cb1u.cell = cb0.cell),
       |cb1n AS (SELECT cell, c, sqrt(${ldot("c", "c")}) AS cn FROM cb1),
       |s1 AS (SELECT e.vec_id, cb.cell,
       |       round(${edot("e.embedding", "cb.c")} / (e.nrm * cb.cn), 6) AS sim
       |       FROM e, cb1n cb),
       |a1 AS (SELECT vec_id, cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell ASC) AS rn
       |    FROM s1) WHERE rn = 1)
       |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |       round(${edot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm), 6) AS sim
       |FROM a1 a JOIN a1 b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id
       |WHERE round(${edot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm), 6) >= $minCos""".stripMargin
  }

  // ------------------------------------- similarity: product quantization
  /** PQ-ADC top-k ([[Similarity.pqTopK]]): 8 subspaces × 8 dims, 32
    * centroids each (one Lloyd step), queries = every 50th vector; ADC
    * shortlists 50 candidates per query, exact squared-L2 re-ranks to
    * top-5 (cosine kept as audit column). The oracle replays codebook
    * training, encoding, the per-query LUT, the integer-micros ADC sums,
    * and the re-rank bit-for-bit.
    */
  def annPq(spark: SparkSession, dir: String): DataFrame =
    Similarity.pqTopK(Tables.embeddings(spark, dir),
      pmod(col("vec_id"), lit(50)) === 0, m = pqM, dsub = pqDsub, k = pqK,
      topK = pqTopK, shortlist = pqShortlist)
      .select("q_id", "n_id", "rank", "d2", "adc_micros", "sim")

  private val pqM = 8
  private val pqDsub = 8
  private val pqK = 32
  private val pqTopK = 5
  private val pqShortlist = 50

  val annPqSql: String = {
    // squared L2 folded in index order — bit-identical to the Spark HOF
    // fold in Similarity.l2sq (its 0.0 seed is exact: 0.0 + x == x, and
    // squared terms are never -0.0); ::DOUBLE is a no-op on the
    // already-double subvector lists and the real cast on raw embeddings
    def l2x(a: String, b: String, d: Int) =
      s"list_reduce([($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE) " +
        s"for i in range(1, ${d + 1})], (acc, x) -> acc + x)"
    def l2(a: String, b: String) = l2x(a, b, pqDsub)
    def edot(a: String, b: String) =
      s"list_reduce([$a[i]::DOUBLE * $b[i]::DOUBLE for i in range(1, 65)], (acc, x) -> acc + x)"
    s"""WITH sub AS (SELECT vec_id, t.m,
       |             [embedding[t.m * $pqDsub + i]::DOUBLE for i in range(1, ${pqDsub + 1})] AS sub
       |             FROM embeddings, range($pqM) t(m)),
       |cb0 AS (SELECT m, vec_id::INT AS cid, sub AS c FROM sub WHERE vec_id < $pqK),
       |a0 AS (SELECT vec_id, m, cid FROM (
       |    SELECT s.vec_id, s.m, c.cid,
       |           row_number() OVER (PARTITION BY s.vec_id, s.m
       |                              ORDER BY round(${l2("s.sub", "c.c")}, 6) ASC, c.cid ASC) AS rn
       |    FROM sub s JOIN cb0 c ON s.m = c.m) WHERE rn = 1),
       |comp AS (SELECT a0.m, a0.cid, generate_subscripts(s.sub, 1) AS pos, unnest(s.sub) AS v
       |         FROM a0 JOIN sub s ON s.vec_id = a0.vec_id AND s.m = a0.m),
       |cb1c AS (SELECT m, cid, list(comp_val ORDER BY pos) AS c FROM (
       |    SELECT m, cid, pos,
       |           CAST(SUM(CAST(floor(v * 1000000) AS BIGINT)) AS DOUBLE)
       |             / (count(*) * 1000000.0) AS comp_val
       |    FROM comp GROUP BY m, cid, pos) GROUP BY m, cid),
       |cb1 AS (SELECT cb0.m, cb0.cid, COALESCE(cb1c.c, cb0.c) AS c
       |        FROM cb0 LEFT JOIN cb1c ON cb0.m = cb1c.m AND cb0.cid = cb1c.cid),
       |codes AS (SELECT vec_id, m, cid FROM (
       |    SELECT s.vec_id, s.m, c.cid,
       |           row_number() OVER (PARTITION BY s.vec_id, s.m
       |                              ORDER BY round(${l2("s.sub", "c.c")}, 6) ASC, c.cid ASC) AS rn
       |    FROM sub s JOIN cb1 c ON s.m = c.m) WHERE rn = 1),
       |lut AS (SELECT s.vec_id AS q_id, c.m, c.cid,
       |               CAST(floor(${l2("s.sub", "c.c")} * 1000000) AS BIGINT) AS lut
       |        FROM sub s JOIN cb1 c ON s.m = c.m WHERE s.vec_id % 50 = 0),
       |adc AS (SELECT l.q_id, cd.vec_id AS n_id, CAST(SUM(l.lut) AS BIGINT) AS adc_micros
       |        FROM codes cd JOIN lut l ON cd.m = l.m AND cd.cid = l.cid
       |        WHERE cd.vec_id != l.q_id GROUP BY l.q_id, cd.vec_id),
       |short AS (SELECT q_id, n_id, adc_micros FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |                                 ORDER BY adc_micros ASC, n_id ASC) AS rn
       |    FROM adc) WHERE rn <= $pqShortlist),
       |e AS (SELECT vec_id, embedding, nullif(sqrt(${edot("e0.embedding", "e0.embedding")}), 0) AS nrm
       |      FROM embeddings e0),
       |rer AS (SELECT s.q_id, s.n_id, s.adc_micros,
       |               round(${l2x("eq.embedding", "en.embedding", 64)}, 6) AS d2,
       |               round(${edot("eq.embedding", "en.embedding")} / (eq.nrm * en.nrm), 6) AS sim
       |        FROM short s JOIN e eq ON eq.vec_id = s.q_id JOIN e en ON en.vec_id = s.n_id)
       |SELECT q_id, n_id, rank, d2, adc_micros, sim FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |                                 ORDER BY d2 ASC, n_id ASC) AS rank
       |    FROM rer) WHERE rank <= $pqTopK""".stripMargin
  }

  // --------------------------------------------- tokenizer induction (BPE)
  /** Distributed BPE training ([[Bpe]]): 3 merge rounds over the corpus
    * word-frequency table; output is the learned merge list
    * (round, pair, weighted count) — the artifact a tokenizer ships. The
    * oracle replays training end-to-end: tokenize → char symbols → per-
    * round pair counts, argmax (count desc, pair asc) and the greedy
    * left-to-right re-encode — as three unrolled rounds of identical
    * window SQL.
    */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Bpe.learnMerges(Tables.documents(spark, dir), rounds = 3)
      .toDF("round", "sym_a", "sym_b", "pair_n")
  }

  // one merge round: pair counts -> argmax -> greedy re-encode (islands
  // idiom resolves equal-symbol runs; see Bpe.mergeRound). Shared by the
  // training oracle (bpeTrainSql) and the encoding oracle (bpeEncodeSql) so
  // the two can never disagree on what a merge round does.
  private def bpeRoundSql(r: Int, prev: String): String =
      s"""p$r AS (SELECT sym AS a, nxt AS b, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |    SELECT sym, freq, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
         |    FROM $prev) WHERE nxt IS NOT NULL GROUP BY 1, 2),
         |b$r AS (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
         |m$r AS (SELECT s.word, s.freq, s.pos, s.sym, b.a, b.b,
         |              COALESCE(s.sym = b.a AND
         |                lead(s.sym) OVER (PARTITION BY s.word ORDER BY s.pos) = b.b,
         |                false) AS mtch
         |        FROM $prev s, b$r b),
         |n$r AS (SELECT *, row_number() OVER (PARTITION BY word, mtch ORDER BY pos) AS mrn FROM m$r),
         |g$r AS (SELECT *, CASE WHEN mtch THEN pos - mrn END AS grp FROM n$r),
         |h$r AS (SELECT *, min(pos) OVER (PARTITION BY word, grp) AS run_start FROM g$r),
         |i$r AS (SELECT *, mtch AND (pos - run_start) % 2 = 0 AS sel FROM h$r),
         |j$r AS (SELECT *, COALESCE(lag(sel) OVER (PARTITION BY word ORDER BY pos), false) AS consumed FROM i$r),
         |s$r AS (SELECT word, freq, row_number() OVER (PARTITION BY word ORDER BY pos) - 1 AS pos,
         |               CASE WHEN sel THEN a || b ELSE sym END AS sym
         |        FROM j$r WHERE NOT consumed)""".stripMargin
  private def bpePairsOnlySql(r: Int, prev: String): String =
    s"""p$r AS (SELECT sym AS a, nxt AS b, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
       |    SELECT sym, freq, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
       |    FROM $prev) WHERE nxt IS NOT NULL GROUP BY 1, 2),
       |b$r AS (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)""".stripMargin

  private val bpeBaseSql: String =
    """w0 AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
      |    SELECT unnest(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS word
      |    FROM documents) GROUP BY 1),
      |s0 AS (SELECT word, freq, generate_subscripts(cs, 1) AS pos, unnest(cs) AS sym FROM (
      |    SELECT word, freq, [substr(word, i, 1) for i in range(1, len(word) + 1)] AS cs
      |    FROM w0))""".stripMargin

  val bpeTrainSql: String =
    s"""WITH $bpeBaseSql,
       |${bpeRoundSql(1, "s0")},
       |${bpeRoundSql(2, "s1")},
       |${bpePairsOnlySql(3, "s2")}
       |SELECT CAST(1 AS BIGINT) AS round, a AS sym_a, b AS sym_b, cnt AS pair_n FROM b1
       |UNION ALL SELECT CAST(2 AS BIGINT), a, b, cnt FROM b2
       |UNION ALL SELECT CAST(3 AS BIGINT), a, b, cnt FROM b3""".stripMargin

  /** Tokenize the corpus WITH the trained tokenizer — the apply step that
    * pairs with [[bpeTrain]]: per document, word count and total BPE token
    * count under the 3 learned merges (the fertility statistics that size
    * a training run). Scale shape ([[Bpe.learnAndEncode]]): every merge
    * round runs on the vocab-sized (word, pos, sym) relation — word TYPES,
    * not corpus tokens — so applying the tokenizer to the corpus is one
    * join of exploded tokens against the per-word symbol counts; the
    * corpus-sized side moves exactly once. Oracle: the same three unrolled
    * merge rounds (shared CTE builder with the training oracle), then the
    * identical count join.
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.engine.Spread.spreadSmallInput(Tables.documents(spark, dir))
    val (_, syms) = Bpe.learnAndEncode(docs, rounds = 3)
    val wc = syms.groupBy(col("word")).agg(count(lit(1)).as("n_sym"))
    docs.select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("word"))
      .join(wc, "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).cast("long").as("n_bpe_tokens"))
  }

  val bpeEncodeSql: String =
    s"""WITH $bpeBaseSql,
       |${bpeRoundSql(1, "s0")},
       |${bpeRoundSql(2, "s1")},
       |${bpeRoundSql(3, "s2")},
       |wc AS (SELECT word, CAST(count(*) AS BIGINT) AS n_sym FROM s3 GROUP BY 1),
       |tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS word
       |        FROM documents)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens
       |FROM tok JOIN wc USING (word) GROUP BY 1""".stripMargin

  // --------------------------------------------- corpus mixture weights
  /** Temperature-based source mixing weights (the multilingual/multi-source
    * rebalancing step of corpus construction — upweight small sources,
    * temper large ones): weight ∝ n^α with α = 0.5, normalized by the
    * LARGEST source. α = 0.5 is deliberately sqrt: IEEE-754 requires sqrt
    * correctly rounded, so the weight math is bit-identical across engines
    * — a pow(n, 0.3) would not be. Normalizing by max (not Σ) keeps the
    * computation order-independent: no cross-source double summation whose
    * order could differ. Fixed-point ppm output. Plan: one map-side-
    * combined count per source + a 1-row max folded in by broadcast.
    */
  def sourceMixture(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val mx = counts.agg(max(col("n_docs")).as("n_max"))
    counts.crossJoin(broadcast(mx))
      .select(col("source"), col("n_docs"),
        floor(lit(1000000) * sqrt(col("n_docs").cast("double"))
          / sqrt(col("n_max").cast("double"))).cast("long").as("w_ppm"))
  }

  val sourceMixtureSql: String =
    """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
      |m AS (SELECT max(n_docs) AS n_max FROM c)
      |SELECT c.source, c.n_docs,
      |       CAST(floor(1000000 * sqrt(CAST(c.n_docs AS DOUBLE))
      |                  / sqrt(CAST(m.n_max AS DOUBLE))) AS BIGINT) AS w_ppm
      |FROM c, m""".stripMargin

  // ---------------------------------------------------------- text: lang id
  def langId(spark: SparkSession, dir: String): DataFrame =
    langIdOf(Tables.documents(spark, dir))
      .select("doc_id", "labeled_lang", "s_en", "s_es", "s_fr", "s_de", "pred_lang")

  /** Per-row language-ID stage over any documents frame — shared verbatim
    * by the batch query and the streaming curation twin (stateless, so it
    * runs unchanged under Structured Streaming).
    */
  def langIdOf(d: DataFrame): DataFrame = {
    // fused kernel: all four languages' marker hits in one byte scan
    // (codegen CSE evaluates __cc once per row); output-equal to the
    // per-language stopwordHits regexes — FunctionsSpec pins it
    val cc = TextAnalysis.curationCounts(col("text"))
    d.withColumn("labeled_lang", col("lang"))
      .withColumn("__cc", cc)
      .withColumn("s_en", col("__cc")(3)).withColumn("s_es", col("__cc")(4))
      .withColumn("s_fr", col("__cc")(5)).withColumn("s_de", col("__cc")(6))
      .drop("__cc")
      .withColumn("pred_lang",
        when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr") && col("s_en") >= col("s_de"), "en")
          .when(col("s_es") >= col("s_fr") && col("s_es") >= col("s_de"), "es")
          .when(col("s_fr") >= col("s_de"), "fr")
          .otherwise("de"))
  }

  val langIdSql: String = {
    // mirror the Spark side's literal-escaping (TextAnalysis.escapeRegex) so
    // a marker containing regex metachars stays a literal in BOTH engines
    def re(words: Seq[String]) =
      s"'\\b(${words.map(TextAnalysis.escapeRegex).mkString("|")})\\b'"
    val m = TextAnalysis.langMarkers.toMap
    s"""SELECT doc_id, lang AS labeled_lang,
       |  len(regexp_extract_all(text, ${re(m("en"))})) AS s_en,
       |  len(regexp_extract_all(text, ${re(m("es"))})) AS s_es,
       |  len(regexp_extract_all(text, ${re(m("fr"))})) AS s_fr,
       |  len(regexp_extract_all(text, ${re(m("de"))})) AS s_de,
       |  CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
       |       WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
       |       WHEN s_fr >= s_de THEN 'fr'
       |       ELSE 'de' END AS pred_lang
       |FROM documents""".stripMargin
  }

  // ------------------------------------------------ text: lang-ID evaluation
  /** Language-ID confusion matrix — the classifier EVALUATED against the
    * corpus's labeled `lang` column: per (true, predicted) cell, the count
    * and the row-normalized share in exact basis points. The per-row
    * scoring stage is [[langIdOf]] shared verbatim with `lang_id` and the
    * streaming curation twin, so the evaluation can never drift from the
    * classifier it measures. One map-side-combined aggregate on a k²
    * domain; the share window runs over those cells, not documents.
    */
  def langConfusion(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("labeled_lang"))
    langIdOf(Tables.documents(spark, dir))
      .groupBy(col("labeled_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("label_total", sum(col("n")).over(w))
      .select(col("labeled_lang"), col("pred_lang"), col("n"),
        expr("(10000 * n) div label_total").as("share_bp"))
  }

  val langConfusionSql: String =
    s"""WITH pred AS ($langIdSql),
       |c AS (SELECT labeled_lang, pred_lang, count(*) AS n FROM pred GROUP BY 1, 2)
       |SELECT labeled_lang, pred_lang, n,
       |       CAST((10000 * n) // SUM(n) OVER (PARTITION BY labeled_lang) AS BIGINT) AS share_bp
       |FROM c""".stripMargin

  // ----------------------------------------------------- text: quality score
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    qualityScoreOf(Tables.documents(spark, dir))
      .select("doc_id", "n_chars", "n_ws", "n_word", "n_punct", "stop_hits", "score_bp")

  /** Per-row quality stage over any documents frame (stateless — streams). */
  def qualityScoreOf(d: DataFrame): DataFrame = {
    // fused kernel: token/word/punct/stopword counts in one byte scan
    // instead of a tokenize + three regexp_extract_all materializations;
    // element-equal to the composed forms (FunctionsSpec)
    val cc = TextAnalysis.curationCounts(col("text"))
    d.withColumn("__cc", cc)
      .withColumn("n_ws", col("__cc")(0))
      .withColumn("n_word", col("__cc")(1))
      .withColumn("n_punct", col("__cc")(2))
      .withColumn("stop_hits", col("__cc")(3))
      .withColumn("score_bp",
        least(col("n_chars"), lit(1000L)) * 2
          + expr("(1000 * stop_hits) div greatest(n_ws, 1)")
          + expr("(1000 * n_word) div greatest(n_ws, 1)")
          - col("n_punct") * 50)
      .drop("__cc")
  }

  val qualityScoreSql: String = {
    val en = TextAnalysis.langMarkers.toMap.apply("en")
      .map(TextAnalysis.escapeRegex).mkString("|")
    s"""SELECT doc_id, n_chars,
       |  len(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS n_ws,
       |  len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_word,
       |  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
       |  len(regexp_extract_all(text, '\\b($en)\\b')) AS stop_hits,
       |  least(n_chars, 1000) * 2
       |    + (1000 * stop_hits) // greatest(n_ws, 1)
       |    + (1000 * n_word) // greatest(n_ws, 1)
       |    - n_punct * 50 AS score_bp
       |FROM documents""".stripMargin
  }

  // ----------------------------------------------------- text: token counts
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(TextAnalysis.tokens(t)).as("n_ws_tokens"),
      TextAnalysis.regexCount(t, TextAnalysis.wordRe).as("n_word_tokens"),
      TextAnalysis.regexCount(t, TextAnalysis.bpeIshRe).as("n_bpeish_tokens"))
  }

  val tokenCountSql: String =
    """SELECT doc_id,
      |  len(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS n_ws_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_word_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpeish_tokens
      |FROM documents""".stripMargin

  // ------------------------------------------------ sequence packing
  /** Pack documents into fixed-budget training sequences (the pretraining
    * batch-construction step): documents in doc_id order fill 256-token
    * sequences; a document starts in the sequence its cumulative prefix
    * lands in, and `n_seq_spanned` says how many sequence boundaries it
    * crosses (the contiguous-stream packing of GPT-style pretraining,
    * where sequence k is tokens [k·B, (k+1)·B) of the concatenated
    * corpus). Everything derives from ONE exact integer prefix sum.
    *
    * Scale design: the global running sum is [[graft.engine.Prefix]]'s
    * two-pass distributed prefix sum — range-partition by doc_id, local
    * running sums in parallel, then partition-count-sized offsets
    * broadcast back. A naive `Window.orderBy(doc_id)` with no partition
    * clause would drag the whole corpus through ONE task; the two-pass
    * form's only serial step is over ~parallelism rows. Nothing but
    * (doc_id, n_tokens) pairs ever moves.
    */
  def sequencePack(spark: SparkSession, dir: String): DataFrame = {
    val budget = 256L
    // registered (round 11): the token-count relation feeds the prefix
    // build's range-boundary sampling AND its range exchange —
    // unregistered, the full tokenize kernel ran over the corpus twice.
    // Two longs per doc, a reduction of the text, safe to cache at scale.
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .transform(graft.engine.QueryCaches.registered)
    graft.engine.Prefix
      .exclusiveCumsum(toks, Seq(col("doc_id")), col("n_tokens"), "start_tok")
      .select(col("doc_id"), col("n_tokens"),
        expr(s"start_tok div $budget").as("seq_id"),
        expr(s"start_tok % $budget").as("seq_offset"),
        expr(s"((start_tok + n_tokens - 1) div $budget) - (start_tok div $budget)")
          .as("n_seq_spanned"))
      .filter(col("n_tokens") > 0)
  }

  val sequencePackSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         CAST(len(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (SELECT doc_id, n_tokens,
      |        coalesce(SUM(n_tokens) OVER (ORDER BY doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
      |      FROM t)
      |SELECT doc_id, n_tokens, CAST(start_tok // 256 AS BIGINT) AS seq_id,
      |       CAST(start_tok % 256 AS BIGINT) AS seq_offset,
      |       CAST(((start_tok + n_tokens - 1) // 256) - (start_tok // 256) AS BIGINT) AS n_seq_spanned
      |FROM c WHERE n_tokens > 0""".stripMargin

  // ------------------------------------------------ text: repetition score
  /** Gopher/RefinedWeb-style repetition signals, adapted to token space
    * (the fixture corpus is single-line, so line-level dedup is degenerate):
    * duplicate-token fraction and duplicate-2-gram fraction, in integer
    * basis points so parity is exact. High values flag boilerplate /
    * machine-generated repetition for the curation filter.
    */
  def repetitionScore(spark: SparkSession, dir: String): DataFrame =
    repetitionScoreOf(Tables.documents(spark, dir))
      .select("doc_id", "n_tok", "dup_tok_bp", "dup_2gram_bp")

  /** Per-row repetition stage over any documents frame (stateless — streams). */
  def repetitionScoreOf(d: DataFrame): DataFrame = {
    val ts = TextAnalysis.tokens(col("text"))
    val nTok = size(ts)
    val nDist = size(array_distinct(ts))
    val nSh2 = size(TextAnalysis.shingles(col("text"), 2)) // distinct 2-grams
    val n2 = greatest(nTok - 1, lit(0))                    // total 2-grams
    d.withColumn("n_tok", nTok).withColumn("n_dist", nDist)
      .withColumn("n_2gram", n2).withColumn("n_2gram_dist", nSh2)
      .withColumn("dup_tok_bp",
        expr("((n_tok - n_dist) * 10000) div greatest(n_tok, 1)"))
      .withColumn("dup_2gram_bp",
        expr("((n_2gram - n_2gram_dist) * 10000) div greatest(n_2gram, 1)"))
  }

  val repetitionScoreSql: String =
    """WITH t AS (SELECT doc_id,
      |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks FROM documents),
      |m AS (SELECT doc_id, len(toks) AS n_tok,
      |    len(list_distinct(toks)) AS n_dist,
      |    greatest(len(toks) - 1, 0) AS n_2gram,
      |    CASE WHEN len(toks) >= 2
      |         THEN len(list_distinct([array_to_string(toks[i:i+1], ' ')
      |                                 for i in range(1, len(toks))]))
      |         ELSE 0 END AS n_2gram_dist
      |  FROM t)
      |SELECT doc_id, n_tok,
      |       ((n_tok - n_dist) * 10000) // greatest(n_tok, 1) AS dup_tok_bp,
      |       ((n_2gram - n_2gram_dist) * 10000) // greatest(n_2gram, 1) AS dup_2gram_bp
      |FROM m""".stripMargin

  // ------------------------------------------- text: token frequency spectrum
  /** Vocabulary frequency spectrum (Zipf profile): how many distinct tokens
    * fall in each power-of-two occurrence class, and how many occurrences
    * that class holds. Bucket 0 = hapax legomena (vocabulary growth /
    * crawl-freshness signal); a fat high bucket = boilerplate explosion —
    * the standard corpus-health readout before training. floor(log₂ cnt)
    * computes EXACTLY in both engines as `length(bin(cnt)) − 1` (binary
    * digit count) — no floating log whose 2ᵏ boundary values could round
    * differently. Two map-side-combined aggregations; the second input is
    * vocabulary-sized, not corpus-sized.
    */
  def tokenSpectrum(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .select((length(bin(col("cnt"))) - 1).cast("long").as("bucket"), col("cnt"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_tokens"), sum(col("cnt")).as("n_occur"))

  val tokenSpectrumSql: String =
    """WITH tok AS (SELECT unnest(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS token
      |             FROM documents),
      |c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1)
      |SELECT CAST(len(bin(cnt)) - 1 AS BIGINT) AS bucket,
      |       count(*) AS n_tokens, CAST(SUM(cnt) AS BIGINT) AS n_occur
      |FROM c GROUP BY 1""".stripMargin

  // ------------------------------------------- text: encoding quality
  /** Encoding-health signals per document — the mojibake/corruption filter
    * that runs before any text op at corpus scale: U+FFFD replacement
    * characters (the scar a bad transcode leaves), raw C0 control
    * characters (excluding tab/LF/CR, which are legitimate text), and the
    * non-ASCII rate in basis points. Pure per-row regex counts in codegen,
    * integer floor division only — no exchange until whatever aggregates
    * downstream.
    */
  def encodingQuality(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      TextAnalysis.regexCount(t, "�").cast("long").as("n_repl"),
      TextAnalysis.regexCount(t, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]").cast("long").as("n_ctrl"),
      TextAnalysis.regexCount(t, "[^\\x00-\\x7F]").cast("long").as("n_non_ascii"),
      length(t).cast("long").as("len_chars"))
      .withColumn("non_ascii_bp", expr(
        "CASE WHEN len_chars > 0 THEN (n_non_ascii * 10000) div len_chars ELSE 0 END"))
  }

  val encodingQualitySql: String =
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '�')) AS BIGINT) AS n_repl,
       |  CAST(len(regexp_extract_all(text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]')) AS BIGINT) AS n_ctrl,
       |  CAST(len(regexp_extract_all(text, '[^\\x00-\\x7F]')) AS BIGINT) AS n_non_ascii,
       |  CAST(len(text) AS BIGINT) AS len_chars,
       |  CASE WHEN len(text) > 0
       |       THEN (CAST(len(regexp_extract_all(text, '[^\\x00-\\x7F]')) AS BIGINT) * 10000)
       |            // CAST(len(text) AS BIGINT)
       |       ELSE 0 END AS non_ascii_bp
       |FROM documents""".stripMargin

  // ------------------------------------------------------- text: PII counts
  /** PII-surface detection counts (emails, URLs, long digit runs) — the
    * standard curation signals before redaction; counts only, per-row
    * regex in codegen, redaction = regexp_replace with the same patterns.
    */
  def piiCount(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      TextAnalysis.regexCount(t, TextAnalysis.emailRe).as("n_email"),
      TextAnalysis.regexCount(t, TextAnalysis.urlRe).as("n_url"),
      TextAnalysis.regexCount(t, TextAnalysis.longDigitRe).as("n_longnum"))
  }

  val piiCountSql: String =
    s"""SELECT doc_id,
       |  len(regexp_extract_all(text, '${TextAnalysis.emailRe.replace("\\\\", "\\")}')) AS n_email,
       |  len(regexp_extract_all(text, 'https?://[^\\s]+')) AS n_url,
       |  len(regexp_extract_all(text, '[0-9]{7,}')) AS n_longnum
       |FROM documents""".stripMargin

  // ------------------------------------------------------ text: PII redaction
  /** PII redaction — the write path of [[piiCount]]'s signals: emails,
    * URLs, then long digit runs replaced with typed placeholder tokens, in
    * that order (URL-embedded addresses are already gone when the digit
    * pass runs). Pure per-row `regexp_replace` chain in codegen; emitted
    * only for documents that changed, with the redaction count as an audit
    * column.
    *
    * The fixture corpus is PII-free (word-soup text, no digits) and
    * testdata is read-only, so — like [[graft.queries.ReferenceQueries
    * .errorDeadletterSplit]]'s corruption — PII is injected
    * deterministically at read time: every 10th document gains an email,
    * a URL, and a 7+-digit account number, and the redaction chain then
    * has real work whose output the oracle replays.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id").cast("string")
    val injected = Tables.documents(spark, dir).withColumn("text",
      when(pmod(col("doc_id"), lit(10)) === 0,
        concat(col("text"), lit(" contact user"), id,
          lit("@example.com or https://site.example/u/"), id,
          lit(" acct 900000"), id))
        .otherwise(col("text")))
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), TextAnalysis.emailRe, "<EMAIL>"),
          TextAnalysis.urlRe, "<URL>"),
        TextAnalysis.longDigitRe, "<NUM>")
    val t = col("text")
    injected
      .select(col("doc_id"), redacted.as("clean_text"),
        (TextAnalysis.regexCount(t, TextAnalysis.emailRe) +
          TextAnalysis.regexCount(t, TextAnalysis.urlRe) +
          TextAnalysis.regexCount(t, TextAnalysis.longDigitRe)).as("n_redacted"))
      .filter(col("n_redacted") > 0)
  }

  val piiRedactSql: String = {
    val email = TextAnalysis.emailRe.replace("\\\\", "\\")
    s"""WITH inj AS (SELECT doc_id,
       |    CASE WHEN doc_id % 10 = 0
       |         THEN text || ' contact user' || doc_id || '@example.com or https://site.example/u/'
       |              || doc_id || ' acct 900000' || doc_id
       |         ELSE text END AS text
       |  FROM documents)
       |SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$email', '<EMAIL>', 'g'),
       |    'https?://[^\\s]+', '<URL>', 'g'),
       |    '[0-9]{7,}', '<NUM>', 'g') AS clean_text,
       |  len(regexp_extract_all(text, '$email'))
       |    + len(regexp_extract_all(text, 'https?://[^\\s]+'))
       |    + len(regexp_extract_all(text, '[0-9]{7,}')) AS n_redacted
       |FROM inj
       |WHERE n_redacted > 0""".stripMargin
  }

  // ------------------------------------- sampling: deterministic stratified
  /** Deterministic stratified sampling + train/val split — the pipeline op
    * every training run needs, with NO rand(): membership is a pure
    * function of (lang, doc_id) via md5, so the sample is reproducible
    * across engines, re-runs, and partitionings. 30% per-language sample,
    * split 80/20 train/val by an independent second hash.
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val h1 = pmod(PortableHash.md5Long(concat(col("lang"), lit(":"), col("doc_id").cast("string"))), lit(100))
    val h2 = pmod(PortableHash.md5Long(concat(lit("split:"), col("doc_id").cast("string"))), lit(100))
    Tables.documents(spark, dir)
      .filter(h1 < 30)
      .select(col("doc_id"), col("lang"),
        when(h2 < 80, "train").otherwise("val").as("split"))
  }

  val sampleStratifiedSql: String = {
    def h(s: String) = s"(('0x' || substr(md5($s), 1, 15))::BIGINT) % 100"
    s"""SELECT doc_id, lang,
       |  CASE WHEN ${h("'split:' || doc_id::VARCHAR")} < 80 THEN 'train' ELSE 'val' END AS split
       |FROM documents
       |WHERE ${h("lang || ':' || doc_id::VARCHAR")} < 30""".stripMargin
  }

  // -------------------------------------------------- text: fingerprinting
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // min over codegen'd post-explode hashes; whole-text fallback for docs
    // shorter than the shingle width (winnowing-style min-hash fingerprint)
    val minFp = Dedup.shinglePostings(docs, 5)
      .groupBy(col("doc_id")).agg(min(col("h")).as("fp5"))
    docs.select(col("doc_id"), PortableHash.md5Long(col("text")).as("fallback"))
      .join(minFp, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("fp5"), col("fallback")).as("fp"))
  }

  val docFingerprintSql: String =
    s"""WITH ${shingleCtes(5)}
       |SELECT doc_id,
       |  CASE WHEN len(sh) > 0
       |       THEN list_min([${PortableHash.md5LongSql("s")} for s in sh])
       |       ELSE ${PortableHash.md5LongSql("text")} END AS fp
       |FROM shs""".stripMargin

  // ------------------------------------------------------- winnowing
  /** Winnowing fingerprints (the MOSS local document fingerprint,
    * Schleimer–Wilkerson–Aiken 2003): every w=8 consecutive 5-gram hashes
    * elect their minimum (rightmost on ties — "robust winnowing"), and the
    * distinct elected (position, hash) pairs are the document's
    * fingerprint set. Guarantees: any shared substring of ≥ w+k−1 tokens
    * produces a shared fingerprint, and density is ~2/(w+1) — the
    * position-aware middle ground between one global min
    * ([[docFingerprint]]) and full shingle postings. Per-row/per-partition
    * compute only: hashes are codegen'd post-explode, the sliding min is a
    * doc-keyed window (frame w, no global ordering), output is ~2L/w rows
    * per doc. The struct-min (h, −pos) makes the rightmost-tie rule a
    * plain `min`, so map-side partial aggregation stays available.
    */
  def winnowFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val k = 5; val w = 8
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(TextAnalysis.shinglesAll(col("text"), k)))
      .toDF("doc_id", "pos0", "s")
      .select(col("doc_id"), (col("pos0") + 1).as("pos"),
        PortableHash.md5Long(col("s")).as("h"))
      .withColumn("cnt", count(lit(1)).over(win))
      .withColumn("m", min(struct(col("h"), (-col("pos")).as("np"))).over(win))
      .filter(col("cnt") === w)
      .select(col("doc_id"), (-col("m.np")).cast("long").as("sel_pos"),
        col("m.h").as("fp"))
      .distinct()
  }

  val winnowFingerprintSql: String = {
    val shingle = "array_to_string(tokens[i:i+4], ' ')"
    s"""WITH toks AS (SELECT doc_id,
       |         list_filter(string_split(text, ' '), t -> len(t) > 0) AS tokens
       |       FROM documents),
       |hl AS (SELECT doc_id,
       |         CASE WHEN len(tokens) >= 5
       |              THEN [${PortableHash.md5LongSql(shingle)}
       |                    for i in range(1, len(tokens) - 3)]
       |              ELSE [] END AS hs FROM toks),
       |wins AS (SELECT doc_id, hs, unnest(range(1, len(hs) - 6)) AS p
       |         FROM hl WHERE len(hs) >= 8),
       |sel AS (SELECT doc_id,
       |          CAST(p + (8 - list_position(list_reverse(hs[p:p+7]),
       |                                      list_min(hs[p:p+7]))) AS BIGINT) AS sel_pos,
       |          list_min(hs[p:p+7]) AS fp
       |        FROM wins)
       |SELECT DISTINCT doc_id, sel_pos, fp FROM sel""".stripMargin
  }

  // ----------------------------------------------------- text: n-gram LM score
  /** Corpus-model fluency score (the CCNet-style "how LM-predictable is this
    * document" filter, re-expressed deterministically): build a bigram model
    * over the corpus (context counts + add-V smoothing), then score each
    * document by its average conditional bigram probability in ppm —
    * `avg over bigrams of 10⁶·c(w1,w2)/(c(w1)+V)`, all in INTEGER
    * arithmetic (multiply-then-`div`), so partial-aggregation order cannot
    * perturb a single bit and DuckDB replays the score exactly. (A log-space
    * perplexity would need a SUM of doubles — order-dependent; the ppm mean
    * ranks documents identically for filtering purposes.)
    *
    * Scale: the model is DATA-SIZED (all distinct bigrams) so nothing here
    * broadcasts except the 1-row vocabulary count; scoring is two
    * shuffle joins (doc-bigrams ⋈ bigram counts on (w1,w2); ⋈ context
    * counts on w1 — both sides partial-aggregated map-side) and one final
    * per-doc agg. The fixed-point product c12·10⁶ bounds c12 < 9·10¹² —
    * fine up to ~10¹² corpus bigram occurrences per distinct bigram.
    */
  def lmFluency(spark: SparkSession, dir: String): DataFrame =
    lmFluencyOf(Tables.documents(spark, dir))

  /** Operator form over any (doc_id, text) frame (spec entry point). */
  def lmFluencyOf(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 2)
    val bg = toks.select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ts)-2), i -> struct(ts[i] AS w1, ts[i+1] AS w2))")).as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.w2"))
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = docs.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    bg.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .select(col("doc_id"), expr("(c12 * 1000000) div (c1 + v)").as("q"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("sum_q"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("sum_q div n_bigrams").as("fluency_ppm"))
  }

  val lmFluencySql: String =
    """WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS ts
      |              FROM documents),
      |bg AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
      |       FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
      |             FROM toks WHERE len(ts) >= 2)),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
      |v AS (SELECT count(DISTINCT t) AS v
      |      FROM (SELECT unnest(ts) AS t FROM toks)),
      |q AS (SELECT doc_id, (c12.c12 * 1000000) // (c1.c1 + v.v) AS q
      |      FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v)
      |SELECT doc_id, count(*) AS n_bigrams,
      |       CAST(SUM(q) AS BIGINT) // count(*) AS fluency_ppm
      |FROM q GROUP BY doc_id""".stripMargin

  // ------------------------------------------------------------ text: tf-idf
  /** TF-IDF term weights per (doc, token). The weight expression is a pure
    * per-row double computation (tf · ln(N/df)) — no accumulation order, so
    * IEEE determinism holds; rounded to 6 dp for the oracle regardless.
    */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // corpus size as a broadcast 1-row aggregate folded into the plan — one
    // job end-to-end, instead of a separate driver-side count() scan
    val n = docs.agg(count(lit(1)).as("corpus_n"))
    val tok = docs.select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        round(col("tf") * log(col("corpus_n").cast("double") / col("df")), 6).as("tfidf"))
  }

  val tfidfSql: String =
    """WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS token
      |             FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
      |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents)
      |SELECT doc_id, token, tf, df, round(tf * ln(n.n * 1.0 / df), 6) AS tfidf
      |FROM tf JOIN dfreq USING (token), n""".stripMargin

  /** Top-5 most frequent tokens per language — explode + count + window
    * ranking with a deterministic tie-break.
    */
  def topTokensPerLang(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("token"))
    val counts = tok.groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("cnt").desc, col("token").asc)
    counts.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
  }

  val topTokensPerLangSql: String =
    """SELECT lang, token, cnt, rn FROM (
      |  SELECT lang, token, cnt,
      |         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token ASC) AS rn
      |  FROM (SELECT lang, token, count(*) AS cnt
      |        FROM (SELECT lang, unnest(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS token
      |              FROM documents)
      |        GROUP BY lang, token))
      |WHERE rn <= 5""".stripMargin

  /** Per-label embedding centroids in fixed-point: values are quantized
    * (floor(v·1e6)) so the sum is exact integer arithmetic — the
    * partition-order-independent form of a float centroid at 100 TB scale.
    */
  def embedCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")))
      .toDF("label", "pos0", "v")
      .select(col("label"), (col("pos0") + 1).as("pos"),
        floor(col("v").cast("double") * 1000000).cast("long").as("q"))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n"), sum(col("q")).as("qsum"))

  val embedCentroidsSql: String =
    """SELECT label, pos, count(*) AS n,
      |       CAST(SUM(CAST(floor(v::DOUBLE * 1000000) AS BIGINT)) AS BIGINT) AS qsum
      |FROM (SELECT label, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS v
      |      FROM embeddings)
      |GROUP BY label, pos""".stripMargin

  // ------------------------------------------------- embedding covariance
  /** Exact integer covariance matrix of the embedding dimensions — the
    * PCA/whitening precursor (and the drift detector: compare two
    * snapshots' matrices). Elements quantize to fixed point
    * (floor(x·10⁴)), and each upper-triangle cell reports the covariance
    * NUMERATOR n·Σxy − Σx·Σy in DECIMAL(38,0) arithmetic — exact and
    * order-independent where a float two-pass would drift; divide by n²
    * (or n(n−1)) off-engine to taste. Scale shape: the element relation is
    * a pure per-row explode; the self-join keys on vec_id (co-located, one
    * hash exchange, each doc expands to dim²/2 products map-side); the
    * aggregate lands on a dim²-bounded domain (2 080 cells at dim 64) with
    * map-side combine, so the shuffle is partitions×dim², never
    * corpus-sized; the dim-sum fold-ins are 64-row broadcasts. The BIGINT
    * output cast is for oracle comparability at fixture scale — at corpus
    * scale keep the DECIMAL(38,0) (exact to ~10³⁸).
    */
  def embedCovariance(spark: SparkSession, dir: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val q = Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")))
      .toDF("vec_id", "pos0", "v")
      .select(col("vec_id"), (col("pos0") + 1).as("pos"),
        floor(col("v").cast("double") * 10000).cast("long").as("q"))
    val dims = q.groupBy(col("pos")).agg(sum(col("q").cast(d38)).as("s"))
    val pairs = q.select(col("vec_id"), col("pos").as("i"), col("q").as("qi"))
      .join(q.select(col("vec_id"), col("pos").as("j"), col("q").as("qj")), "vec_id")
      .filter(col("i") <= col("j"))
      .groupBy(col("i"), col("j"))
      .agg(sum((col("qi") * col("qj")).cast(d38)).as("sxy"), count(lit(1)).as("n"))
    pairs
      .join(broadcast(dims.select(col("pos").as("i"), col("s").as("si"))), "i")
      .join(broadcast(dims.select(col("pos").as("j"), col("s").as("sj"))), "j")
      .select(col("i"), col("j"),
        (col("n").cast(d38) * col("sxy") - col("si") * col("sj"))
          .cast("long").as("cov_num"),
        col("n"))
  }

  val embedCovarianceSql: String =
    """WITH q AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
      |                  CAST(floor(unnest(embedding)::DOUBLE * 10000) AS BIGINT) AS q
      |           FROM embeddings),
      |dims AS (SELECT pos, SUM(q::HUGEINT) AS s FROM q GROUP BY 1),
      |pairs AS (SELECT a.pos AS i, b.pos AS j,
      |                 SUM(a.q::HUGEINT * b.q) AS sxy, count(*) AS n
      |          FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.pos <= b.pos
      |          GROUP BY 1, 2)
      |SELECT i, j, CAST(p.n::HUGEINT * p.sxy - di.s * dj.s AS BIGINT) AS cov_num, p.n
      |FROM pairs p JOIN dims di ON p.i = di.pos JOIN dims dj ON p.j = dj.pos""".stripMargin

  // -------------------------------------------- end-to-end corpus curation
  /** The whole point of the engine in one query — a training-data curation
    * pipeline composing the library operators:
    *   1. MinHash+LSH near-dup removal (drop the higher id of each verified
    *      pair — keeps the minimal element of every duplicate chain);
    *   2. quality filter (integer score ≥ 1400);
    *   3. language filter (heuristic language-ID = 'en');
    *   4. repetition filter (duplicate-2-gram fraction < 6% — boilerplate
    *      rejection, the [[repetitionScore]] signal).
    * Every stage is the same machinery as its standalone query, so the
    * composed oracle is a CTE stitching of those oracles.
    */
  def curationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val dupes = Dedup.minhashLshPairs(docs, n = 3, perms = 64, bands = 16,
        num = jaccardNum, den = jaccardDen)
      .select(col("doc_b").as("dup_id")).distinct()
    // one fused per-row stage for all three stateless signals (no joins) —
    // the identical chain the streaming twin runs (Streaming.curationStream)
    perRowCuration(docs)
      .join(dupes, col("doc_id") === col("dup_id"), "left_anti")
      .select("doc_id", "pred_lang", "score_bp")
  }

  /** The stateless per-row half of the curation pipeline: quality + lang +
    * repetition signals computed in one codegen stage, then filtered. Used
    * verbatim by both the batch flagship and the streaming ingest twin.
    */
  def perRowCuration(docs: DataFrame): DataFrame =
    repetitionScoreOf(langIdOf(qualityScoreOf(docs)))
      .filter(col("score_bp") >= 1400 && col("pred_lang") === "en" &&
        col("dup_2gram_bp") < 600)

  /** Shared quality/langp/rep CTE block (the stateless curation signals),
    * used by the curation flagship and the training-corpus composition.
    */
  private def curationSignalCtes: String = {
    val en = TextAnalysis.langMarkers.toMap.apply("en")
      .map(TextAnalysis.escapeRegex).mkString("|")
    def re(words: Seq[String]) =
      s"'\\b(${words.map(TextAnalysis.escapeRegex).mkString("|")})\\b'"
    val m = TextAnalysis.langMarkers.toMap
    s"""quality AS (SELECT doc_id,
       |  least(n_chars, 1000) * 2
       |    + (1000 * len(regexp_extract_all(text, '\\b($en)\\b')))
       |        // greatest(len(list_filter(string_split(text, ' '), t -> len(t) > 0)), 1)
       |    + (1000 * len(regexp_extract_all(text, '[A-Za-z0-9]+')))
       |        // greatest(len(list_filter(string_split(text, ' '), t -> len(t) > 0)), 1)
       |    - len(regexp_extract_all(text, '[.,;:!?]')) * 50 AS score_bp
       |  FROM documents),
       |langp AS (SELECT doc_id,
       |  len(regexp_extract_all(text, ${re(m("en"))})) AS s_en,
       |  len(regexp_extract_all(text, ${re(m("es"))})) AS s_es,
       |  len(regexp_extract_all(text, ${re(m("fr"))})) AS s_fr,
       |  len(regexp_extract_all(text, ${re(m("de"))})) AS s_de,
       |  CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
       |       WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
       |       WHEN s_fr >= s_de THEN 'fr'
       |       ELSE 'de' END AS pred_lang
       |  FROM documents),
       |rep AS (SELECT doc_id,
       |    ((greatest(len(toks2)-1,0) -
       |      CASE WHEN len(toks2) >= 2
       |           THEN len(list_distinct([array_to_string(toks2[i:i+1], ' ')
       |                                   for i in range(1, len(toks2))]))
       |           ELSE 0 END) * 10000) // greatest(greatest(len(toks2)-1,0), 1) AS dup_2gram_bp
       |  FROM (SELECT doc_id,
       |          list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks2
       |        FROM documents))""".stripMargin
  }

  /** Oracle for the stateless per-row curation half alone (no dedup stage) —
    * what [[graft.streaming.Streaming.curationStream]] computes; used by the
    * streaming-execution parity query (StreamParity.curationStreamParity).
    */
  val perRowCurationSql: String =
    s"""WITH $curationSignalCtes
       |SELECT q.doc_id, l.pred_lang, q.score_bp
       |FROM quality q JOIN langp l ON q.doc_id = l.doc_id
       |JOIN rep r ON q.doc_id = r.doc_id
       |WHERE q.score_bp >= 1400 AND l.pred_lang = 'en' AND r.dup_2gram_bp < 600""".stripMargin

  val curationPipelineSql: String =
    s"""WITH $minhashCtes,
       |dupes AS (SELECT DISTINCT doc_b AS dup_id FROM ($minhashFinalSelect)),
       |$curationSignalCtes
       |SELECT q.doc_id, l.pred_lang, q.score_bp
       |FROM quality q JOIN langp l ON q.doc_id = l.doc_id
       |JOIN rep r ON q.doc_id = r.doc_id
       |WHERE q.score_bp >= 1400 AND l.pred_lang = 'en' AND r.dup_2gram_bp < 600
       |  AND NOT EXISTS (SELECT 1 FROM dupes d WHERE d.dup_id = q.doc_id)""".stripMargin

  // -------------------------------------------------------- multimodal stub
  /** Frame sampling under the oracle: the video-path explode shape (every
    * 2nd fixed-size chunk of the payload, rows out ≫ rows in). The stub
    * blob is the UTF-8 text (pure-ASCII fixture, so the oracle chunks the
    * VARCHAR byte-identically) and frame hashes are md5-derived — DuckDB
    * replays chunking, sampling, and hashing exactly.
    */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(spark,
        Multimodal.withBlob(Tables.documents(spark, dir)),
        chunkBytes = 64, everyN = 2)
      .toDF()
      .select("doc_id", "frame_idx", "frame_bytes", "frame_hash")

  val multimodalFramesSql: String =
    s"""SELECT doc_id, i::INT AS frame_idx,
       |  octet_length(encode(substr(text, (i * 64 + 1)::INT, 64))) AS frame_bytes,
       |  ('0x' || substr(md5(substr(text, (i * 64 + 1)::INT, 64)), 1, 15))::BIGINT AS frame_hash
       |FROM (SELECT doc_id, text,
       |        unnest(range(0, (octet_length(encode(text)) + 63) // 64)) AS i
       |      FROM documents)
       |WHERE i % 2 = 0""".stripMargin

  /** REAL image decode under the oracle: [[Multimodal.withImageBlob]]
    * synthesizes a genuine PNG/JPEG/BMP per document with md5-derived
    * dimensions, and [[Multimodal.decodeFeatures]] recovers width/height/
    * format by actually parsing the bytes with `javax.imageio`. The oracle
    * predicts the same values arithmetically — agreement proves the decoder
    * round-trips real codec output, not a stub.
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeFeatures(spark,
        Multimodal.withImageBlob(spark, Tables.documents(spark, dir)))
      .toDF()
      .select("doc_id", "width", "height", "format")

  val multimodalMetaSql: String =
    s"""SELECT doc_id,
       |  1 + h % 16 AS width,
       |  1 + (h // 7) % 16 AS height,
       |  ['png', 'jpeg', 'bmp'][(h % 3)::INT + 1] AS format
       |FROM (SELECT doc_id, ${PortableHash.md5LongSql("text")} AS h FROM documents)""".stripMargin

  /** Perceptual hash over REAL decoded rasters: 16×16 PNGs (lossless, so
    * pixels survive the codec) are read back with `ImageIO.read` and
    * average-hashed — 2×2 block sums, bit = block·64 > total in exact
    * integers. The oracle recomputes the identical hash FROM THE PIXEL
    * FORMULA, never seeing the PNG — a hash match therefore proves the
    * full encode→decode→raster→hash path ran correctly, the strongest
    * multimodal evidence in the suite (multimodal_meta proves headers;
    * this proves pixels). Near-dup banding over these 64-bit hashes is
    * `simhash_neardup`'s machinery unchanged.
    */
  def multimodalPhash(spark: SparkSession, dir: String): DataFrame =
    Multimodal.aHashFeatures(spark,
        Multimodal.withPngBlob16(spark, Tables.documents(spark, dir)))
      .toDF()

  /** aHash CTE chain (shared by multimodal_phash and phash_neardup). */
  private val phashCtes: String =
    s"""d AS (SELECT doc_id, ${PortableHash.md5LongSql("text")} AS h FROM documents),
       |px AS (SELECT doc_id, x, y, (h + 31 * x + 17 * y) % 16777216 AS v
       |       FROM d, range(16) tx(x), range(16) ty(y)),
       |g AS (SELECT doc_id, x, y,
       |        (v // 65536) % 256 + (v // 256) % 256 + v % 256 AS gray FROM px),
       |blocks AS (SELECT doc_id, y // 2 AS by, x // 2 AS bx, SUM(gray) AS bs
       |           FROM g GROUP BY 1, 2, 3),
       |tot AS (SELECT doc_id, SUM(bs) AS ts FROM blocks GROUP BY 1),
       |bits AS (SELECT b.doc_id, by, bx,
       |           CASE WHEN bs * 64 > ts THEN '1' ELSE '0' END AS bit
       |         FROM blocks b JOIN tot USING (doc_id)),
       |hs AS (SELECT doc_id, string_agg(bit, '' ORDER BY by, bx) AS ahash
       |       FROM bits GROUP BY 1)""".stripMargin

  val multimodalPhashSql: String =
    s"""WITH $phashCtes
       |SELECT doc_id, ahash,
       |       CAST(length(replace(ahash, '0', '')) AS BIGINT) AS n_set
       |FROM hs""".stripMargin

  /** Near-duplicate IMAGES by perceptual hash: pigeonhole banding over the
    * 64-bit aHash (8 bands × 8 bits — any pair within Hamming distance ≤ 7
    * shares an identical band, so the banded join is EXACT for the
    * asserted radius, `simhash_neardup`'s argument on the image hash).
    *
    * Collapse-by-signature topology (the round-3 rewrite): image corpora
    * are signature-degenerate by nature (at sf0.1 the 5,000 synthetic
    * rasters hold only 194 distinct aHashes, with 994-doc band buckets),
    * so banding the DOC table explodes into ~11M candidate pairs — while
    * the same banding on the DISTINCT-HASH table is |H|×8 rows. So: group
    * docs by hash first, enumerate + verify pairs on the distinct-hash
    * table (integer XOR + `bit_count`, whole-stage codegen — never the
    * interpreted per-character compare this replaced), and only then
    * expand hash pairs back to doc pairs, a join whose size is the OUTPUT
    * size, which no exact algorithm can undercut.
    */
  def phashNeardup(spark: SparkSession, dir: String): DataFrame = {
    val hs = Multimodal.aHashFeatures(spark,
        Multimodal.withPngBlob16(spark, Tables.documents(spark, dir))).toDF()
      .select(col("doc_id"), col("ahash"))
    // bitstring -> int64 in two 32-bit halves (conv output fits a long;
    // shiftleft reassembles the high word without signed-overflow hazards)
    val byHash = hs.withColumn("bits",
        shiftleft(conv(substring(col("ahash"), 1, 32), 2, 10).cast("long"), 32)
          .bitwiseOR(conv(substring(col("ahash"), 33, 32), 2, 10).cast("long")))
      .groupBy(col("bits")).agg(collect_list(col("doc_id")).as("ids"))
      .transform(graft.engine.QueryCaches.registered)
    val bands = byHash.select(col("bits"),
        posexplode(array((0 until 8).map(b =>
          shiftright(col("bits"), b * 8).bitwiseAND(lit(255L))): _*)))
      .toDF("bits", "band", "key")
    val hashPairs = bands.toDF("ba_bits", "band", "key")
      .join(bands.toDF("bb_bits", "band", "key"), Seq("band", "key"))
      .filter(col("ba_bits") <= col("bb_bits"))
      .select("ba_bits", "bb_bits").distinct()
      .withColumn("hamming",
        expr("bit_count(ba_bits ^ bb_bits)").cast("long"))
      .filter(col("hamming") <= 7)
    hashPairs
      .join(byHash.select(col("bits").as("ba_bits"), col("ids").as("ids_a")), "ba_bits")
      .join(byHash.select(col("bits").as("bb_bits"), col("ids").as("ids_b")), "bb_bits")
      .select(explode(col("ids_a")).as("da"), col("ids_b"), col("hamming"))
      .select(col("da"), explode(col("ids_b")).as("db"), col("hamming"))
      .filter(col("da") =!= col("db"))
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"), col("hamming"))
      .distinct()
  }

  val phashNeardupSql: String =
    s"""WITH $phashCtes,
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |        CAST(len([i for i in range(64)
       |                  if a.ahash[i+1] != b.ahash[i+1]]) AS BIGINT) AS hamming
       |      FROM hs a JOIN hs b ON a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, hamming FROM p WHERE hamming <= 7""".stripMargin

  /** Audio twin of [[multimodalMeta]]: REAL WAV payloads (synthesized with
    * md5-derived rate/channels/frames) parsed back by `javax.sound.sampled`
    * — the oracle predicts every decoded field arithmetically, including
    * the container size (canonical 44-byte RIFF header + PCM data), so a
    * hash match proves the decoder actually ran.
    */
  def multimodalAudio(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeAudioFeatures(spark,
        Multimodal.withAudioBlob(spark, Tables.documents(spark, dir)))
      .toDF()

  val multimodalAudioSql: String =
    s"""SELECT doc_id,
       |  44 + frames * ch * 2 AS n_bytes,
       |  rate AS sample_rate,
       |  ch AS channels,
       |  frames AS n_frames,
       |  frames * 1000 // rate AS duration_ms
       |FROM (SELECT doc_id,
       |        [8000, 16000, 44100][(h % 3)::INT + 1]::BIGINT AS rate,
       |        1 + (h // 7) % 2 AS ch,
       |        1 + (h // 11) % 256 AS frames
       |      FROM (SELECT doc_id, ${PortableHash.md5LongSql("text")} AS h FROM documents))""".stripMargin

  // ------------------------------------------------------ audio_fingerprint
  /** Acoustic fingerprint over REAL decoded PCM
    * ([[Multimodal.audioFingerprint]]): WAV container → `AudioSystem`
    * decode → 16-sample energy windows → sign-of-delta bits. The oracle
    * recomputes every bit from the synthetic PCM's closed form
    * ((h + 31·i) mod 256 bytes, 16-bit little-endian) without ever seeing
    * the WAV — a hash match proves the whole encode→decode→PCM→DSP path,
    * the audio twin of `multimodal_phash`'s pixel proof.
    */
  def audioFingerprint(spark: SparkSession, dir: String): DataFrame =
    Multimodal.audioFingerprint(spark,
        Multimodal.withAudioBlob(spark, Tables.documents(spark, dir)))
      .toDF()

  val audioFingerprintSql: String =
    s"""WITH d AS (SELECT doc_id, ${PortableHash.md5LongSql("text")} AS h FROM documents),
       |base AS (SELECT doc_id, h,
       |           (1 + (h // 11) % 256) * (1 + (h // 7) % 2) AS n_samples
       |         FROM d),
       |k AS (SELECT doc_id, h, n_samples, unnest(range(0, n_samples)) AS k FROM base),
       |sv AS (SELECT doc_id, CAST(k // 16 AS BIGINT) AS j,
       |         abs((CASE WHEN hb >= 128 THEN hb - 256 ELSE hb END) * 256 + lb) AS av
       |       FROM (SELECT doc_id, k, n_samples,
       |               (h + 62 * k) % 256 AS lb,
       |               (h + 62 * k + 31) % 256 AS hb
       |             FROM k)
       |       WHERE k < (n_samples // 16) * 16),
       |e AS (SELECT doc_id, j, SUM(av) AS en FROM sv GROUP BY 1, 2),
       |b AS (SELECT doc_id, j, en,
       |        lag(en) OVER (PARTITION BY doc_id ORDER BY j) AS pe
       |      FROM e),
       |fp AS (SELECT doc_id,
       |         COALESCE(SUM(CASE WHEN j BETWEEN 1 AND 32 AND en > pe
       |                           THEN 1::BIGINT << CAST(j - 1 AS INT)
       |                           ELSE 0 END), 0) AS fp
       |       FROM b GROUP BY 1)
       |SELECT base.doc_id, CAST(n_samples // 16 AS BIGINT) AS n_windows,
       |       CAST(COALESCE(fp.fp, 0) AS BIGINT) AS fp
       |FROM base LEFT JOIN fp ON base.doc_id = fp.doc_id""".stripMargin

  // -------------------------------------------------------- bpe_fertility
  /** Tokenizer fertility per language — BPE tokens per whitespace word in
    * basis points, the number a pretraining-budget planner needs per
    * source/language (fertility × words = token cost). Reuses the full
    * learn-then-encode pipeline of `bpe_encode` (same 3 merge rounds) and
    * folds the per-doc counts to per-language integers; the oracle replays
    * the identical merge rounds in SQL and aggregates the same way.
    */
  def bpeFertility(spark: SparkSession, dir: String): DataFrame =
    bpeEncode(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"))
      .withColumn("fertility_bp", expr("(10000 * n_bpe_tokens) div n_words"))

  val bpeFertilitySql: String =
    s"""WITH $bpeBaseSql,
       |${bpeRoundSql(1, "s0")},
       |${bpeRoundSql(2, "s1")},
       |${bpeRoundSql(3, "s2")},
       |wc AS (SELECT word, CAST(count(*) AS BIGINT) AS n_sym FROM s3 GROUP BY 1),
       |tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS word
       |        FROM documents),
       |perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |           CAST(sum(n_sym) AS BIGINT) AS n_bpe
       |           FROM tok JOIN wc USING (word) GROUP BY 1)
       |SELECT lang, count(*) AS n_docs,
       |       CAST(SUM(n_words) AS BIGINT) AS n_words,
       |       CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens,
       |       CAST((10000 * SUM(n_bpe)) // SUM(n_words) AS BIGINT) AS fertility_bp
       |FROM perdoc JOIN documents USING (doc_id) GROUP BY 1""".stripMargin

  // ---------------------------------------------------- quantile_normalize
  /** Per-dimension quantile normalization of the embedding matrix — each
    * value replaced by its within-dimension rank position on a uniform
    * [0, 10000] basis-point grid (the rank-based feature scaling that
    * makes dimensions comparable before indexing/whitening). Ties break
    * on `vec_id`, so the mapping is total and engine-portable.
    *
    * Scale design: one posexplode scan, then 64 INDEPENDENT keyed windows
    * (one per dimension — parallelism = dim count, each sorting N values);
    * a corpus where N per dimension outgrows a task goes through the
    * two-pass [[graft.engine.Prefix]] rank with `dim` prepended to the
    * range key. The population count folds in as a broadcast 1-row
    * aggregate (never a count-window over the data).
    */
  def quantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dim")).orderBy(col("x"), col("vec_id"))
    val n1 = Tables.embeddings(spark, dir).agg(count(lit(1)).as("n"))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")))
      .toDF("vec_id", "dim", "x")
      .withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(n1))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        expr("CAST(((rn - 1) * 10000) div (n - 1) AS BIGINT)").as("q_bp"))
  }

  val quantileNormalizeSql: String =
    """WITH n AS (SELECT count(*) AS n FROM embeddings),
      |e AS (SELECT vec_id, i - 1 AS dim, embedding[i] AS x
      |      FROM embeddings, (SELECT unnest(range(1, 65)) AS i)),
      |r AS (SELECT vec_id, dim,
      |        row_number() OVER (PARTITION BY dim ORDER BY x, vec_id) AS rn
      |      FROM e)
      |SELECT vec_id, CAST(dim AS BIGINT) AS dim,
      |       CAST(((rn - 1) * 10000) // (n - 1) AS BIGINT) AS q_bp
      |FROM r CROSS JOIN n""".stripMargin

  // ------------------------------------------------ dedup: semantic (SemDeDup)
  /** Cluster-then-prune semantic dedup ([[Similarity.semDedup]]); tau
    * shares [[minCos]] — on the near-isotropic synthetic embeddings the
    * within-cell cosine mass sits below 0.5, so 0.45 exercises real drops
    * while staying the same "near-duplicate" bar as the pair queries.
    */
  def semdedup(spark: SparkSession, dir: String): DataFrame =
    Similarity.semDedup(Tables.embeddings(spark, dir), k = ivfK(spark, dir), tau = minCos)

  val semdedupSql: String = {
    def ldot(a: String, b: String) =
      s"list_reduce([$a[i]::DOUBLE * $b[i]::DOUBLE for i in range(1, 65)], (acc, x) -> acc + x)"
    s"""WITH e AS (SELECT vec_id, embedding, nullif(sqrt(${ldot("e0.embedding", "e0.embedding")}), 0) AS nrm
       |           FROM embeddings e0),
       |cb AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM e WHERE vec_id < $ivfKSql),
       |scored AS (SELECT e.vec_id, cb.c_id,
       |           round(${ldot("e.embedding", "cb.c_emb")} / (e.nrm * cb.c_nrm), 6) AS sim_c
       |           FROM e, cb),
       |assigned AS (SELECT vec_id, c_id AS cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim_c DESC, c_id ASC) AS rn
       |    FROM scored) WHERE rn = 1),
       |drp AS (SELECT DISTINCT b.vec_id AS vec_id
       |        FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |        JOIN e ea ON ea.vec_id = a.vec_id JOIN e eb ON eb.vec_id = b.vec_id
       |        WHERE round(${ldot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm), 6) >= $minCos)
       |SELECT a.vec_id, a.cell, (d.vec_id IS NULL) AS kept
       |FROM assigned a LEFT JOIN drp d ON d.vec_id = a.vec_id""".stripMargin
  }

  // ------------------------------------------------- graph: PageRank
  /** PageRank over the SimHash near-dup graph ([[Dedup.pageRank]]):
    * centrality of each document in the duplication neighborhood — the
    * "how templated is this doc" signal that complements the binary
    * near-dup verdict. Five unrolled integer rounds; the oracle replays
    * the signature build, the band-free pair join, and every round's
    * floor-divided mass exactly.
    */
  private val prIters = 5

  def pagerankSim(spark: SparkSession, dir: String): DataFrame =
    Dedup.pageRank(
      Dedup.simhashPairs(Tables.documents(spark, dir), simhashMaxDist)
        .select("doc_a", "doc_b"),
      Tables.documents(spark, dir).select("doc_id"), prIters)

  val pagerankSimSql: String = {
    val rounds = (1 to prIters).map { t =>
      s"""pr$t AS (SELECT d.doc_id,
         |  (150000000000 // nt.n_total) + (85 * coalesce(inf.m, 0)) // 100 AS pr
         |  FROM documents d CROSS JOIN nt LEFT JOIN (
         |    SELECT e.d AS doc_id, SUM(p.pr // dg.deg) AS m
         |    FROM pr${t - 1} p JOIN ed e ON e.s = p.doc_id JOIN dg ON dg.s = e.s
         |    GROUP BY e.d) inf ON inf.doc_id = d.doc_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS tokens
       |              FROM documents),
       |tok AS (SELECT doc_id, unnest(tokens) AS t FROM toks WHERE len(tokens) > 0),
       |th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
       |bitsums AS (SELECT doc_id, j, SUM(((h >> j) % 2) * 2 - 1) AS s
       |            FROM th, range(60) r(j) GROUP BY 1, 2),
       |sigs AS (SELECT doc_id, SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS sig
       |         FROM bitsums GROUP BY 1),
       |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |          FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |          WHERE bit_count(xor(a.sig, b.sig)) <= $simhashMaxDist),
       |ed AS (SELECT doc_a AS s, doc_b AS d FROM pairs
       |       UNION ALL SELECT doc_b, doc_a FROM pairs),
       |dg AS (SELECT s, count(*) AS deg FROM ed GROUP BY s),
       |nt AS (SELECT count(*) AS n_total FROM documents),
       |pr0 AS (SELECT doc_id, 1000000000000 // nt.n_total AS pr
       |        FROM documents CROSS JOIN nt),
       |$rounds
       |SELECT doc_id, CAST(pr AS BIGINT) AS pr FROM pr$prIters""".stripMargin
  }

  // ------------------------------------------------- token-budget sampling
  /** Per-source token-budget sampling — corpus mixing's selection step:
    * each source contributes documents, in a deterministic hash order,
    * until its token budget (600) is exhausted; a document is kept iff it
    * STARTS inside the budget. Scale shape: the running token total comes
    * from [[graft.engine.Prefix.exclusiveCumsum]] ordered by
    * (source, hash, doc_id) — the two-pass range-partitioned prefix sum,
    * NOT a per-source window (`Window.partitionBy(source)` serializes each
    * source's entire corpus through one task; sources are few and huge at
    * 100 TB, which makes that the worst possible skew). The within-source
    * prefix is the global prefix minus the source's first-row offset (one
    * aggregate-sized join); budgets and outputs are source-cardinality
    * relations.
    */
  def tokenBudgetSample(spark: SparkSession, dir: String): DataFrame = {
    val budget = 600L
    val t = graft.engine.Spread.spreadSmallInput(Tables.documents(spark, dir))
      .select(col("source"), col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"),
        PortableHash.md5Long(concat(lit("tbs:"), col("doc_id"))).as("h"))
    val cum = graft.engine.Prefix.exclusiveCumsum(
      t, Seq(col("source"), col("h"), col("doc_id")), col("n_tokens"), "cum")
    val srcStart = cum.groupBy(col("source")).agg(min(col("cum")).as("src0"))
    cum.join(srcStart, "source")
      .filter(col("cum") - col("src0") < budget)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_kept"),
        sum(col("n_tokens")).cast("long").as("tokens_kept"))
  }

  val tokenBudgetSampleSql: String =
    s"""WITH t AS (SELECT source, doc_id,
       |             len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS n_tokens,
       |             ${PortableHash.md5LongSql("'tbs:' || doc_id")} AS h
       |           FROM documents),
       |c AS (SELECT *, SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
       |                ROWS UNBOUNDED PRECEDING) - n_tokens AS cum FROM t)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs_kept,
       |       CAST(sum(n_tokens) AS BIGINT) AS tokens_kept
       |FROM c WHERE cum < 600 GROUP BY 1""".stripMargin

  // ------------------------------------------------------- PMI collocations

  /** Bigram collocation mining by pointwise-mutual-information LIFT:
    * lift(w1,w2) = N·c(w1,w2) / (c(w1)·c(w2)), the exact integer core of
    * PMI (PMI = log lift — the log is monotone, so ranking by lift IS
    * ranking by PMI, and staying in integer basis points keeps the oracle
    * hash-exact where a float log could drift in the last ulp). Corpus
    * cost: two map-side-combined counts (bigrams, unigrams); the corpus
    * token count folds in as a broadcast 1-row aggregate (the `tfidf`
    * pattern); unigram-count joins run on aggregated vocab-sized
    * relations, never documents; the final top-100 is a TakeOrdered
    * (per-partition heaps, no global sort), made deterministic by the
    * (lift, w1, w2) total order. Arithmetic runs in DECIMAL(38,0) /
    * HUGEINT so 10000·N·c12 cannot overflow signed-64 at corpus scale.
    */
  def pmiCollocations(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.engine.Spread.spreadSmallInput(Tables.documents(spark, dir))
    val uni = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val nTokens = uni.agg(sum(col("c")).cast("long").as("n_tokens"))
    val bi = docs
      .select(explode(TextAnalysis.shinglesAll(col("text"), 2)).as("bg"))
      .select(split(col("bg"), " ").getItem(0).as("w1"),
        split(col("bg"), " ").getItem(1).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= 3)
    bi
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(nTokens)
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        expr("CAST(10000 AS DECIMAL(38,0)) * n_tokens * c12 div (c1 * c2)")
          .as("lift_bp"))
      .orderBy(col("lift_bp").desc, col("w1"), col("w2"))
      .limit(100)
  }

  val pmiCollocationsSql: String =
    """WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS tokens
      |              FROM documents),
      |uni AS (SELECT w, count(*) AS c
      |        FROM (SELECT unnest(tokens) AS w FROM toks WHERE len(tokens) > 0) GROUP BY 1),
      |nt AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens FROM uni),
      |bgl AS (SELECT CASE WHEN len(tokens) >= 2
      |               THEN [array_to_string(tokens[i:i+1], ' ')
      |                     for i in range(1, len(tokens))]
      |               ELSE [] END AS bgs FROM toks),
      |bc AS (SELECT string_split(s, ' ')[1] AS w1, string_split(s, ' ')[2] AS w2,
      |              count(*) AS c12
      |       FROM (SELECT unnest(bgs) AS s FROM bgl)
      |       GROUP BY 1, 2 HAVING count(*) >= 3)
      |SELECT w1, w2, c12, u1.c AS c1, u2.c AS c2,
      |       CAST((10000::HUGEINT * nt.n_tokens * c12) // (u1.c * u2.c) AS BIGINT) AS lift_bp
      |FROM bc JOIN uni u1 ON w1 = u1.w JOIN uni u2 ON w2 = u2.w CROSS JOIN nt
      |ORDER BY lift_bp DESC, w1, w2 LIMIT 100""".stripMargin

  // ------------------------------------------------------- source overlap

  /** Pairwise cross-source corpus overlap — the pre-mix audit a corpus
    * builder runs before weighting sources (how much of source B is
    * already inside source A?). Containment over distinct 3-gram shingle
    * sets: |Sa ∩ Sb| / min(|Sa|,|Sb|) in exact basis points. Scale shape:
    * the only corpus-sized exchange is the distinct (source, shingle-hash)
    * projection (map-side-combined, text never moves — 60-bit portable
    * hashes do); the self-join keys on the shingle hash, where postings
    * per hash are bounded by the SOURCE COUNT (≤ s rows, not document
    * frequency), so candidate pairs are ≤ s²/2 per distinct shingle and
    * the join cannot quadratically blow up the way a doc-level pair join
    * would. Sizes and the pair intersection are aggregate-sized relations.
    */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.engine.Spread.spreadSmallInput(Tables.documents(spark, dir))
    val ss = docs
      .select(col("source"), explode(TextAnalysis.shingles(col("text"), 3)).as("s"))
      .select(col("source"), PortableHash.md5Long(col("s")).as("h"))
      .distinct()
      .transform(graft.engine.QueryCaches.registered)
    val sizes = ss.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = ss.as("a").join(ss.as("b"), "h")
      .filter(col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("source").as("src_a"), col("n").as("n_a")), "src_a")
      .join(sizes.select(col("source").as("src_b"), col("n").as("n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("n_common"),
        expr("(10000 * n_common) div least(n_a, n_b)").as("containment_bp"))
  }

  // ----------------------------------------------------- vocab_divergence
  /** Corpus-mixture drift monitor: each source's token distribution vs the
    * whole corpus, as EXACT total-variation distance — the quantity a
    * 100 TB ingest pipeline alerts on when one crawl slice goes off-domain.
    * TV(s, corpus) = ½ Σ_t |o_t/n_s − g_t/N|; multiplying through by
    * n_s·N makes the numerator the exact integer Σ_t |o_t·N − g_t·n_s|, so
    * there is no float division anywhere and the oracle matches bit-for-bit
    * (reported in basis points via one integer division at the end).
    *
    * The absent-token tail is folded in WITHOUT a vocab×source cross join:
    * tokens present globally but absent from s contribute
    * Σ_{t∉s} g_t·n_s = n_s·(N − Σ_{t∈s} g_t) — a per-source scalar from
    * the same aggregate. Scale shape: ONE exploded-token scan feeds a
    * map-side-combined (source, token) count; the global counts re-aggregate
    * THAT relation (vocab-sized, not corpus-sized); the corpus total folds
    * in as a broadcast 1-row aggregate; the final reduce is per-source.
    * BIGINT is safe while n_s·N < 2⁶³ (~3×10⁹ tokens); past that the two
    * product columns move to DECIMAL(38,0) unchanged.
    */
  def vocabDivergence(spark: SparkSession, dir: String): DataFrame = {
    val st = Tables.documents(spark, dir)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("o"))
      .transform(graft.engine.QueryCaches.registered)
    val g = st.groupBy(col("tok")).agg(sum(col("o")).as("g"))
    val ns = st.groupBy(col("source")).agg(sum(col("o")).as("n_s"))
    val nTot = st.agg(sum(col("o")).as("n_tot"))
    st.join(g, "tok").join(broadcast(ns), "source").crossJoin(broadcast(nTot))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_s"), max(col("n_tot")).as("n_tot"),
        sum(abs(col("o") * col("n_tot") - col("g") * col("n_s"))).as("tv_present"),
        sum(col("g")).as("g_present"))
      .select(col("source"), col("n_s"), col("n_tot"),
        (col("tv_present") + col("n_s") * (col("n_tot") - col("g_present")))
          .as("tv_num"))
      .withColumn("tv_bp", expr("(10000 * tv_num) div (2 * n_s * n_tot)"))
  }

  val vocabDivergenceSql: String =
    """WITH t AS (SELECT source,
      |             unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS tok
      |           FROM documents),
      |st AS (SELECT source, tok, count(*) AS o FROM t GROUP BY 1, 2),
      |g AS (SELECT tok, CAST(SUM(o) AS BIGINT) AS g FROM st GROUP BY 1),
      |ns AS (SELECT source, CAST(SUM(o) AS BIGINT) AS n_s FROM st GROUP BY 1),
      |nt AS (SELECT CAST(SUM(o) AS BIGINT) AS n_tot FROM st),
      |p AS (SELECT st.source, max(ns.n_s) AS n_s, max(nt.n_tot) AS n_tot,
      |        CAST(SUM(abs(st.o * nt.n_tot - g.g * ns.n_s)) AS BIGINT) AS tv_present,
      |        CAST(SUM(g.g) AS BIGINT) AS g_present
      |      FROM st JOIN g USING (tok) JOIN ns USING (source) CROSS JOIN nt
      |      GROUP BY 1)
      |SELECT source, n_s, n_tot,
      |       (tv_present + n_s * (n_tot - g_present)) AS tv_num,
      |       (10000 * (tv_present + n_s * (n_tot - g_present)))
      |         // (2 * n_s * n_tot) AS tv_bp
      |FROM p""".stripMargin

  val sourceOverlapSql: String =
    s"""WITH toks AS (SELECT source, list_filter(string_split(text, ' '), t -> len(t) > 0) AS tokens
       |              FROM documents),
       |shs AS (SELECT source,
       |        CASE WHEN len(tokens) >= 3
       |             THEN list_distinct([array_to_string(tokens[i:i+2], ' ')
       |                                 for i in range(1, len(tokens) - 1)])
       |             ELSE [] END AS sh FROM toks),
       |ss AS (SELECT DISTINCT source, ${PortableHash.md5LongSql("s")} AS h
       |       FROM (SELECT source, unnest(sh) AS s FROM shs)),
       |sizes AS (SELECT source, count(*) AS n FROM ss GROUP BY 1),
       |i AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
       |      FROM ss a JOIN ss b ON a.h = b.h AND a.source < b.source GROUP BY 1, 2)
       |SELECT src_a, src_b, x.n AS n_a, y.n AS n_b, n_common,
       |       (10000 * n_common) // least(x.n, y.n) AS containment_bp
       |FROM i JOIN sizes x ON src_a = x.source JOIN sizes y ON src_b = y.source""".stripMargin

  // ------------------------------------------------ corpus: dataset card
  /** The one-row dataset datasheet ("dataset card" / Datasheets-for-
    * Datasets readout): corpus size, token volume, exact-duplicate rate,
    * mean quality, and the dominant language — the summary block a
    * training-data release ships with, composed entirely from the
    * repo's existing per-row kernels (normalized fingerprint, quality
    * score, whitespace tokens). Mean quality is clipped at 0 before the
    * integer division so the floor-vs-truncate divergence on negative
    * sums can never reach the oracle.
    *
    * Scale: one scan feeds a multi-aggregate (plus the exact-distinct
    * expand for the dup rate) collapsing to one row; the top-language
    * row is a dictionary-sized aggregate. The final 1-row × 1-row cross
    * is the allowlisted fold-in shape.
    */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    val scored = qualityScoreOf(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("score_bp"),
        col("n_ws").cast("long").as("n_tok"), Dedup.normFingerprint.as("fp"))
    val base = scored.agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_tok")).as("total_tokens"),
        countDistinct(col("fp")).as("n_unique_docs"),
        sum(col("score_bp")).as("sum_q"))
    val topLang = scored.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .agg(max(struct(col("n"), col("lang"))).as("t"))
      .select(col("t.lang").as("top_lang"), col("t.n").as("top_lang_docs"))
    base.crossJoin(broadcast(topLang))
      .select(col("n_docs"), col("total_chars"), col("total_tokens"),
        col("n_unique_docs"),
        expr("(10000 * (n_docs - n_unique_docs)) div n_docs").as("dup_rate_bp"),
        expr("greatest(sum_q, 0L) div n_docs").as("mean_quality_bp"),
        col("top_lang"), col("top_lang_docs"))
  }

  val datasetCardSql: String = {
    val en = graft.llm.TextAnalysis.langMarkers.toMap.apply("en")
      .map(graft.llm.TextAnalysis.escapeRegex).mkString("|")
    s"""WITH s AS (SELECT doc_id, lang, n_chars,
       |             $normFpSql AS fp,
       |             len(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS n_tok,
       |             len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_word,
       |             len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
       |             len(regexp_extract_all(text, '\\b($en)\\b')) AS stop_hits
       |           FROM documents),
       |s2 AS (SELECT *, least(n_chars, 1000) * 2
       |              + (1000 * stop_hits) // greatest(n_tok, 1)
       |              + (1000 * n_word) // greatest(n_tok, 1)
       |              - n_punct * 50 AS score_bp FROM s),
       |base AS (SELECT count(*) AS n_docs,
       |                CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       |                CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       |                count(DISTINCT fp) AS n_unique_docs,
       |                CAST(SUM(score_bp) AS BIGINT) AS sum_q
       |         FROM s2),
       |tl AS (SELECT lang AS top_lang, n AS top_lang_docs
       |       FROM (SELECT lang, count(*) AS n FROM s GROUP BY 1)
       |       ORDER BY n DESC, lang DESC LIMIT 1)
       |SELECT CAST(n_docs AS BIGINT) AS n_docs, total_chars, total_tokens,
       |       CAST(n_unique_docs AS BIGINT) AS n_unique_docs,
       |       (10000 * (n_docs - n_unique_docs)) // n_docs AS dup_rate_bp,
       |       greatest(sum_q, 0) // n_docs AS mean_quality_bp,
       |       top_lang, CAST(top_lang_docs AS BIGINT) AS top_lang_docs
       |FROM base, tl""".stripMargin
  }

  // -------------------------------------------- dedup: LSH quality eval
  /** Candidate-level precision/recall of the judged MinHash-LSH
    * configuration (64 perms × 16 bands, threshold 0.8) against EXACT
    * n-gram-Jaccard ground truth — `ann_recall_eval`'s pattern applied to
    * the dedup family. `recall_bp` is the fraction of true near-dup pairs
    * the band join surfaces at all (the only unrecoverable error class —
    * verification filters false candidates but cannot resurrect missed
    * ones); `precision_bp` is the fraction of candidate pairs that
    * survive verification, i.e. the band join's wasted-work rate. Theory
    * for (4-row, 16-band) at s = 0.8 predicts recall ≈ 1−(1−0.8⁴)¹⁶ ≈
    * 0.9998; this query MEASURES it under the oracle.
    *
    * Scale: one 1-row aggregate over the truth⋈cand intersection; the
    * truth and candidate cardinalities ride the caches' own materializing
    * counts (registeredCounted). The exact-truth side is the deliberate cost of
    * an evaluation harness — run it on a sample at corpus scale, never
    * the full 100 TB (same note as ann_recall_eval's exact baseline).
    */
  def lshQualityEval(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // prefix-filtered exact form: output-equal to the naive inverted-index
    // join (spec-proven for ngram_jaccard) at a fraction of the candidates.
    // The candidate side keeps the per-row signature KERNEL (one text pass,
    // no exchange): deriving signatures from the truth side's postings was
    // measured SLOWER (the 64-min aggregation over ~1M posting rows costs
    // ~3.7 s of stage time vs ~0.6 s for the kernel's second corpus scan).
    // registeredCounted: the eager fill already counts each cache — reuse
    // those numbers as n_truth / n_cand instead of re-scanning both caches
    // through two more 1-row aggregates (round-10 trim; values identical)
    //
    // The two pipelines are INDEPENDENT until the final tp join, and each
    // is a chain of eager fills whose tail stages underfill the cluster —
    // so they build CONCURRENTLY (two driver threads; Spark's FIFO
    // scheduler back-fills one pipeline's stragglers with the other's
    // tasks — the guide's overlap-independent-jobs pattern). Results are
    // unchanged: the pipelines share no cache (prefix postings vs per-row
    // signature kernel) and QueryCaches' registry is concurrent. Measured
    // at sf0.1, like canaries: 6.07 → 5.42 s (the query is 42
    // driver-scheduled jobs of sub-0.7 s stages — scheduling floor, not
    // compute, so overlap is the only lever left that does not change a
    // plan; the sequential tail inside each pipeline bounds the win).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val truthF = scala.concurrent.Future(graft.engine.QueryCaches.registeredCounted(
      Dedup.ngramJaccardPairsPrefix(docs, 3, jaccardNum, jaccardDen)
        .select("doc_a", "doc_b")))
    val candF = scala.concurrent.Future(graft.engine.QueryCaches.registeredCounted(
      Dedup.bandCandidates(Dedup.minhashSignatures(docs, 3, 64), 64, 16)))
    val (truth, nTruth) = try scala.concurrent.Await.result(
      truthF, scala.concurrent.duration.Duration.Inf)
    finally {
      // cand failing must not leak the pool; truth failing lets candF
      // finish its in-flight fill (registered entries release at the
      // caller's boundary either way)
      try scala.concurrent.Await.ready(candF, scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
    }
    val (cand, nCand) = scala.concurrent.Await.result(
      candF, scala.concurrent.duration.Duration.Inf)
    truth.join(cand, Seq("doc_a", "doc_b"))
      .agg(count(lit(1)).as("tp"))
      .select(lit(nTruth).as("n_truth"), lit(nCand).as("n_cand"), col("tp"),
        (lit(nTruth) - col("tp")).as("fn"),
        (lit(nCand) - col("tp")).as("fp"),
        when(lit(nCand) > 0, expr(s"(10000 * tp) div ${nCand}L"))
          .otherwise(10000L).as("precision_bp"),
        when(lit(nTruth) > 0, expr(s"(10000 * tp) div ${nTruth}L"))
          .otherwise(10000L).as("recall_bp"))
  }

  val lshQualityEvalSql: String =
    s"""WITH $minhashCtes,
       |tr AS (SELECT pa.doc_id AS doc_a, pb.doc_id AS doc_b, count(*) AS n_common
       |       FROM post pa JOIN post pb ON pa.h = pb.h AND pa.doc_id < pb.doc_id
       |       GROUP BY 1, 2),
       |truthf AS (SELECT t.doc_a, t.doc_b FROM tr t
       |           JOIN sizes sa ON t.doc_a = sa.doc_id
       |           JOIN sizes sb ON t.doc_b = sb.doc_id
       |           WHERE ${jaccardFilterSql("n_common", "sa.n_sh", "sb.n_sh")}),
       |m AS (SELECT (SELECT count(*) FROM truthf) AS n_truth,
       |             (SELECT count(*) FROM cand) AS n_cand,
       |             (SELECT count(*) FROM truthf JOIN cand USING (doc_a, doc_b)) AS tp)
       |SELECT n_truth, n_cand, tp, n_truth - tp AS fn, n_cand - tp AS fp,
       |       CASE WHEN n_cand > 0 THEN (10000 * tp) // n_cand ELSE 10000 END AS precision_bp,
       |       CASE WHEN n_truth > 0 THEN (10000 * tp) // n_truth ELSE 10000 END AS recall_bp
       |FROM m""".stripMargin

  // ------------------------------------------- splits: stratified k-fold
  /** Stratified k-fold assignment for cross-validation: fold =
    * md5(doc_id) mod 5, reported as per-(source, fold) class sizes with
    * id ranges. The md5 assignment is the repo's standard
    * no-`rand()` sampling idiom ([[sampleStratified]]): deterministic,
    * replayable, independent of partitioning, and uniform enough that
    * every stratum spreads across all folds (spec-asserted balance).
    * One scan, one map-side-combined aggregate over a dictionary-sized
    * (source × fold) domain.
    */
  def crossvalFolds(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars"),
        pmod(PortableHash.md5Long(concat(lit("fold"), col("doc_id"))), lit(5))
          .as("fold"))
      .groupBy(col("source"), col("fold"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))

  val crossvalFoldsSql: String =
    s"""SELECT source, ${PortableHash.md5LongSql("'fold' || doc_id")} % 5 AS fold,
       |       count(*) AS n_docs,
       |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM documents GROUP BY 1, 2""".stripMargin

  // ----------------------------------------- clustering: grid density scan
  /** Grid-DBSCAN over the embedding's first two coordinates: density
    * clustering where the unit of work is the occupied GRID CELL, not the
    * point. Cells of side 1/20 replace the eps-ball; a cell holding ≥
    * minPts points is core; clusters are connected components of
    * 8-adjacent core cells (reusing the [[Dedup.duplicateClusters]] Pregel
    * loop — cluster id = min member cell id); points in non-core cells
    * adjacent to a core cell join as border points (min adjacent cluster,
    * deterministic), everything else is noise (-1).
    *
    * Scale shape — this is why grid-DBSCAN and not pairwise DBSCAN: the
    * point set is touched in exactly two shuffle-free map passes (cell
    * assignment; label lookup against the broadcast cell→cluster map) plus
    * one map-side-combined count per cell. Everything quadratic-ish
    * (adjacency, components) runs on the CELL table, whose size is bounded
    * by data geometry (occupied cells), not corpus row count. Float→cell
    * is floor(x·20) in double — bit-identical in both engines.
    */
  def gridDbscan(spark: SparkSession, dir: String): DataFrame = {
    val gridF = 20
    val minPts = 4
    def cellOf(cx: org.apache.spark.sql.Column, cy: org.apache.spark.sql.Column) =
      (cx + 1000L) * 100000L + cy + 1000L
    val pts = Tables.embeddings(spark, dir).select(col("vec_id"),
        floor(col("embedding")(0).cast("double") * gridF).cast("long").as("cx"),
        floor(col("embedding")(1).cast("double") * gridF).cast("long").as("cy"))
      .withColumn("cell", cellOf(col("cx"), col("cy")))
      .transform(graft.engine.QueryCaches.registered)
    val core = pts.groupBy("cell", "cx", "cy").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minPts).select("cell", "cx", "cy").transform(graft.engine.QueryCaches.registered)
    val offs = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
    def neighborCells = array(offs.map { case (dx, dy) =>
      cellOf(col("cx") + dx.toLong, col("cy") + dy.toLong) }: _*)
    // 9-neighborhood probes joined back against core = the adjacency pairs
    // (self included, so isolated core cells keep their own label)
    val corePairs = core.select(col("cell").as("doc_a"),
        explode(neighborCells).as("doc_b"))
      .join(core.select(col("cell").as("doc_b")), "doc_b")
    val lab = Dedup.duplicateClusters(corePairs)
      .select(col("doc_id").as("cell"), col("cluster_id"))
    val corePts = pts.join(broadcast(lab), Seq("cell"))
      .select(col("vec_id"), col("cluster_id"))
    val nonCore = pts.join(broadcast(lab.select("cell")), Seq("cell"), "left_anti")
    val border = nonCore.select(col("vec_id"), explode(neighborCells).as("cell"))
      .join(broadcast(lab), Seq("cell"))
      .groupBy("vec_id").agg(min("cluster_id").as("cluster_id"))
    val noise = nonCore.select("vec_id")
      .join(border.select("vec_id"), Seq("vec_id"), "left_anti")
      .select(col("vec_id"), lit(-1L).as("cluster_id"))
    corePts.unionByName(border).unionByName(noise)
  }

  val gridDbscanSql: String =
    """WITH RECURSIVE pts AS (
      |  SELECT vec_id,
      |         CAST(floor(embedding[1]::DOUBLE * 20) AS BIGINT) AS cx,
      |         CAST(floor(embedding[2]::DOUBLE * 20) AS BIGINT) AS cy
      |  FROM embeddings),
      |p2 AS (SELECT vec_id, cx, cy, (cx+1000)*100000 + cy + 1000 AS cell FROM pts),
      |core AS (SELECT cell, cx, cy FROM (
      |           SELECT cell, cx, cy, count(*) AS n FROM p2 GROUP BY 1, 2, 3)
      |         WHERE n >= 4),
      |ed AS (SELECT a.cell AS s, b.cell AS d FROM core a JOIN core b
      |       ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1),
      |reach(s, d) AS (SELECT s, d FROM ed
      |                UNION
      |                SELECT r.s, e.d FROM reach r JOIN ed e ON r.d = e.s),
      |lab AS (SELECT s AS cell, min(d) AS cluster_id FROM reach GROUP BY 1),
      |corept AS (SELECT vec_id, cluster_id FROM p2 JOIN lab USING (cell)),
      |border AS (SELECT p.vec_id, min(l.cluster_id) AS cluster_id
      |           FROM p2 p JOIN core c
      |             ON abs(p.cx - c.cx) <= 1 AND abs(p.cy - c.cy) <= 1
      |           JOIN lab l ON c.cell = l.cell
      |           WHERE p.cell NOT IN (SELECT cell FROM lab)
      |           GROUP BY 1)
      |SELECT vec_id, cluster_id FROM corept
      |UNION ALL SELECT vec_id, cluster_id FROM border
      |UNION ALL
      |SELECT vec_id, CAST(-1 AS BIGINT) AS cluster_id FROM p2
      |WHERE vec_id NOT IN (SELECT vec_id FROM corept)
      |  AND vec_id NOT IN (SELECT vec_id FROM border)""".stripMargin

  // ------------------------------------ vectors: quantized outlier mining
  /** Per-label embedding outliers in EXACT integer arithmetic: vectors are
    * int8-quantized against the corpus-global max-abs (one broadcast 1-row
    * aggregate — per-vector scales would make distances incomparable), the
    * per-label centroid is kept as raw (sum, count) so no division ever
    * happens, and the squared distance to the centroid is computed in the
    * count-cleared form D = Σ_d (q_d·cnt − s_d)² — exact integers, monotone
    * in true L2-to-mean. Top-5 farthest per label, ties to lower vec_id:
    * the label-noise / mislabeled-example miner.
    *
    * Scale shape: one posexplode feeds a map-side-combined (label, dim)
    * sum whose result is dictionary-sized (|labels|×64) and broadcasts
    * back; the per-row distance is a fused zip_with/aggregate over the
    * quantized array (no second pass over exploded rows, no shuffle of the
    * corpus); the per-label top-5 rank window gets Spark's group-limit
    * pushdown.
    */
  def quantizedOutliers(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val gma = emb.agg(max(array_max(transform(col("embedding"),
      x => abs(x.cast("double"))))).as("gma"))
    val q = emb.crossJoin(broadcast(gma))
      .select(col("vec_id"), col("label"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 127 / col("gma")).cast("long")).as("qs"))
      .transform(graft.engine.QueryCaches.registered)
    val cent = q.select(col("label"), posexplode(col("qs")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos")).agg(sum(col("v")).as("s"))
      .groupBy(col("label"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("s")))),
        x => x.getField("s")).as("s_arr"))
    val cnt = q.groupBy(col("label")).agg(count(lit(1)).as("cnt"))
    // Int64 headroom gate (embed_neardup's guard pattern): the count-cleared
    // distance peaks at 64·(254·cnt)², which clears 2^63 once a label holds
    // more than ~1.49M vectors. Beyond that Spark's non-ANSI multiply wraps
    // silently while DuckDB promotes to HUGEINT — the engines diverge and
    // the ranking is garbage. Refuse loudly; the production form for larger
    // labels normalizes the centroid to fixed-point first (divide once,
    // bounded coordinates), trading exact replay for headroom.
    val maxCnt = cnt.agg(max(col("cnt"))).head().getLong(0)
    require(maxCnt <= 1490000L,
      s"quantized_outliers: a label holds $maxCnt vectors; the exact " +
        "count-cleared distance overflows Int64 above ~1.49M per label")
    val d2 = q
      .join(broadcast(cent), "label").join(broadcast(cnt), "label")
      .select(col("label").cast("long").as("label"), col("vec_id"),
        aggregate(
          zip_with(col("qs"), col("s_arr"),
            (qv, s) => (qv * col("cnt") - s) * (qv * col("cnt") - s)),
          lit(0L), (acc, x) => acc + x).as("d2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(col("d2").desc, col("vec_id").asc)
    d2.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("label"), col("vec_id"), col("d2"),
        col("rn").cast("long").as("rn"))
  }

  val quantizedOutliersSql: String =
    """WITH g AS (SELECT max(list_max([abs(x::DOUBLE) for x in embedding])) AS gma
      |           FROM embeddings),
      |q AS (SELECT vec_id, label,
      |             [CAST(floor(x::DOUBLE * 127 / gma) AS BIGINT) for x in embedding] AS qs
      |      FROM embeddings, g),
      |e AS (SELECT vec_id, label, UNNEST(qs) AS v, UNNEST(range(1, 65)) AS d FROM q),
      |cntt AS (SELECT label, count(*) AS cnt FROM q GROUP BY 1),
      |cent AS (SELECT label, d, SUM(v) AS s FROM e GROUP BY 1, 2),
      |dist AS (SELECT e.vec_id, e.label,
      |                SUM((e.v * cnt - s) * (e.v * cnt - s)) AS d2
      |         FROM e JOIN cent ON e.label = cent.label AND e.d = cent.d
      |         JOIN cntt ON e.label = cntt.label
      |         GROUP BY 1, 2)
      |SELECT CAST(label AS BIGINT) AS label, vec_id, CAST(d2 AS BIGINT) AS d2,
      |       CAST(rn AS BIGINT) AS rn
      |FROM (SELECT *, row_number() OVER (PARTITION BY label
      |        ORDER BY d2 DESC, vec_id ASC) AS rn FROM dist)
      |WHERE rn <= 5""".stripMargin
}
