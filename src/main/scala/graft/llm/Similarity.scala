package graft.llm

import graft.engine.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k (the correctness
  * baseline) and sign-plane LSH bucketing (the scale path).
  *
  * The dot product is a sequential left fold over the zipped arrays with a
  * double accumulator — the same evaluation order DuckDB's list_sum over a
  * list comprehension uses, so the oracle's floating-point result is
  * bit-identical; oracle-compared similarity columns are additionally
  * rounded to 6 dp and ties in top-k rank break on the neighbor id.
  *
  * Scale design: brute-force is O(Q×N) with the query side broadcast — right
  * for small Q or as a re-rank stage. The LSH variant buckets vectors by a
  * 16-bit Rademacher-hyperplane signature: the shuffle is one hash exchange
  * on bucket ids, candidate verification touches only same-bucket pairs, and
  * recall/cost trades off via the plane count. An IVF refinement (coarse
  * k-means centroids instead of hyperplanes) drops in by replacing
  * `bucketExpr` — the join topology is identical.
  */
object Similarity {

  /** Element-wise product folded left with a double accumulator — the native
    * codegen'd expression ([[graft.functions.DotProductFP]]); identical fold
    * order to the `aggregate(zip_with(...))` composition and to the oracle's
    * `list_reduce`, ~10× faster (tight primitive loop, no boxing).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.graftDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Vectors with their precomputed norms (norm is reused across all pairs
    * involving the vector — compute once, not per pair).
    *
    * A zero norm becomes NULL (`nullif`), not 0: cosine against a
    * zero vector is 0/0 = NaN, and Spark orders NaN ABOVE every double —
    * a single all-zeros embedding would pass every `sim >= minCos` filter,
    * rank #1 in every top-k, and (in semDedup) dominate its whole cell.
    * With a NULL norm the cosine is NULL, which fails filters and sorts
    * last under `desc` in BOTH engines (oracle mirror: `nullif(sqrt(..),0)`).
    */
  private def withNorm(embeddings: DataFrame, prefix: String): DataFrame =
    embeddings.select(
      col("vec_id").as(s"${prefix}_id"),
      col("embedding").as(s"${prefix}_emb"),
      nullif(norm(col("embedding")), lit(0d)).as(s"${prefix}_norm"))

  private def cosine(p: String, q: String): Column =
    dot(col(s"${p}_emb"), col(s"${q}_emb")) / (col(s"${p}_norm") * col(s"${q}_norm"))

  /** Brute-force cosine top-k: for each query vector (by predicate), the k
    * nearest other vectors. The query side is broadcast — the big side
    * streams through one codegen stage, then a per-query top-k (window over
    * q_id) needs only a partial sort of k elements per partition under AQE.
    */
  def bruteForceTopK(embeddings: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val queries = withNorm(embeddings.filter(queryPred), "q")
    // single-file parquet = one input split; the corpus side must be spread
    // across cores or the broadcast join runs on one task (found at 16x
    // scale: load average 1.0 on a 32-core box)
    val all = withNorm(graft.engine.Spread.spreadSmallInput(embeddings), "n")
    val scored = broadcast(queries).join(all, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), round(cosine("q", "n"), 6).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** k-NN majority-vote classification: for each held-out query vector, the
    * k nearest NON-query vectors by cosine vote with their labels; the
    * predicted label is the most-voted (ties: higher best similarity, then
    * lower label — fully deterministic). This is similarity search put to
    * work: the same broadcast-queries × streamed-corpus topology as
    * [[bruteForceTopK]], so at 100 TB the corpus side is one codegen scan
    * and the only shuffle carries k×|queries| vote rows.
    */
  def knnClassify(embeddings: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val queries = withNorm(embeddings.filter(queryPred), "q")
    val corpus = withNorm(
      graft.engine.Spread.spreadSmallInput(embeddings.filter(!queryPred)), "n")
    val labels = embeddings.select(col("vec_id").as("n_id"), col("label"))
    val scored = broadcast(queries).join(corpus)
      .select(col("q_id"), col("n_id"), round(cosine("q", "n"), 6).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    val topk = scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    // labels attach AFTER the top-k cut: the joined side is k×|queries|
    // rows, and AQE broadcasts whichever side is small at runtime
    val votes = topk.join(labels, "n_id")
      .groupBy(col("q_id"), col("label"))
      .agg(count(lit(1)).as("votes"), max(col("sim")).as("best_sim"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("votes").desc, col("best_sim").desc, col("label").asc)
    votes.withColumn("r", row_number().over(w2)).filter(col("r") === 1)
      .select(col("q_id").as("vec_id"), col("label").as("pred_label"), col("votes"))
  }

  /** Semantic contamination scan: every non-eval vector whose cosine
    * against ANY eval vector (by predicate; must be construction-bounded —
    * the eval side broadcasts) reaches `minCos`, with the best-matching
    * eval id as evidence (ties: lower eval id). The per-corpus-vector
    * reduction is a `max_by` aggregation — map-side combinable, no window
    * sort; the corpus side streams through one codegen scoring pass and
    * never shuffles un-aggregated.
    */
  def semanticContamination(embeddings: DataFrame, evalPred: Column,
                            minCos: Double): DataFrame = {
    val evalSide = withNorm(embeddings.filter(evalPred), "q")
    val corpus = withNorm(
      graft.engine.Spread.spreadSmallInput(embeddings.filter(!evalPred)), "n")
    broadcast(evalSide).join(corpus)
      .select(col("n_id").as("corpus_id"), col("q_id").as("eval_id"),
        round(cosine("q", "n"), 6).as("sim"))
      .filter(col("sim") >= minCos)
      .groupBy(col("corpus_id"))
      .agg(max_by(col("eval_id"), struct(col("sim"), -col("eval_id"))).as("eval_id"),
        max(col("sim")).as("sim"))
  }

  /** IVF cell-count sizing rule: k = max(minK, ⌈√N⌉), N = corpus rows.
    *
    * Why √N (round-7 verdict #4 — a FIXED k is the one ANN scale knob that
    * breaks first): with k fixed, cells fatten linearly with the corpus and
    * same-cell pair verification costs k·(N/k)² = N²/k — quadratic. k = √N
    * holds per-cell occupancy at √N, so pair work grows as N^1.5 (per-row
    * cost √N, sublinear) while assignment cost N·k = N^1.5 matches — the
    * classic IVF balance point where neither phase dominates. The broadcast
    * codebook stays small at any realistic corpus: 10⁹ vectors → ~32k cells
    * × 64 dims × 8 B ≈ 16 MB, inside the broadcast budget.
    */
  def ivfCells(n: Long, minK: Int = 16): Int =
    math.max(minK, math.ceil(math.sqrt(n.toDouble)).toInt)

  /** Sign-plane bucket id for one LSH table: planes `t*width .. t*width+width-1`
    * contribute bits 0..width-1.
    */
  def bucketExpr(emb: Column, planes: Array[Array[Int]], table: Int, width: Int): Column =
    (0 until width).map { j =>
      val proj = dot(emb, typedlit(planes(table * width + j).toSeq))
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Multi-table sign-plane LSH near-duplicate pairs: `nTables` independent
    * `width`-bit signatures; a pair becomes a candidate when ANY table
    * buckets it together (OR-of-tables boosts recall: at cos 0.45 one
    * 16-bit table has ≈0 recall, 8×4-bit tables ≈80%), then candidates are
    * verified with exact cosine ≥ minCos. Fully deterministic — the oracle
    * replays planes, buckets, and verification bit-for-bit.
    *
    * Scale: the bucket shuffle is O(N × nTables) short keys; verification
    * touches only same-bucket pairs. Swapping the bucket expression for a
    * centroid id gives IVF with the same join topology.
    */
  def lshNearDupPairs(embeddings: DataFrame, planes: Array[Array[Int]], minCos: Double,
                      nTables: Int = 8, width: Int = 4, probes: Int = 1): DataFrame = {
    // spread like every other similarity entry: a one-file fixture scan
    // otherwise serializes the explode→self-join→verify chain into ONE
    // task (profiled: 2.8 s of multiprobe's 3.6 s in a single-task stage)
    val base = withNorm(graft.engine.Spread.spreadSmallInput(embeddings), "v")
    // one fused expression computes every table's bucket id in a single
    // pass over the embedding (SignPlanesFP) — bit-identical to the
    // composed per-plane form (LlmOpsSpec asserts it), ~32× fewer
    // expression evaluations per row. probes=p appends, per table, the
    // buckets with the q-th lowest-|margin| bit flipped (q = 1..p−1,
    // symmetric multi-probe in likelihood order): a pair becomes a
    // candidate when ANY of its probed buckets collide in a table —
    // recall rises for ~probes× candidate cost, topology unchanged.
    val buckets = base.select(col("v_id"),
      posexplode(graft.functions.VectorFunctions.graftSignPlanes(
        col("v_emb"), planes, nTables, width, probes)))
      .toDF("v_id", "pos", "bucket")
      .select(col("v_id"), (col("pos") / probes).cast("int").as("t"), col("bucket"))
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket") &&
          col("a.v_id") < col("b.v_id"))
      .select(col("a.v_id").as("a_id"), col("b.v_id").as("b_id"))
      .distinct()
    cand
      .join(base.select(col("v_id").as("a_id"), col("v_emb").as("a_emb"), col("v_norm").as("a_norm")), "a_id")
      .join(base.select(col("v_id").as("b_id"), col("v_emb").as("b_emb"), col("v_norm").as("b_norm")), "b_id")
      .select(col("a_id"), col("b_id"), round(cosine("a", "b"), 6).as("sim"))
      .filter(col("sim") >= minCos)
  }

  /** IVF-style near-dup join with coarse quantization: assign every vector
    * to its nearest "centroid" (here: a deterministic codebook — the K
    * lowest-id vectors — so the oracle can replay the assignment; swap in
    * k-means centroids in production, the join topology is identical), then
    * verify exact cosine within cells. nprobe=1: recall trades against the
    * per-cell pair count, same knob as a real IVF index.
    */
  def ivfNearDupPairs(embeddings: DataFrame, k: Int, minCos: Double): DataFrame = {
    val base = withNorm(graft.engine.Spread.spreadSmallInput(embeddings), "v")
    val codebook = withNorm(embeddings.filter(col("vec_id") < k), "c")
    val scored = base.crossJoin(broadcast(codebook))
      .select(col("v_id"), col("v_emb"), col("v_norm"), col("c_id"),
        round(dot(col("v_emb"), col("c_emb")) / (col("v_norm") * col("c_norm")), 6).as("sim_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("v_id")).orderBy(col("sim_c").desc, col("c_id").asc)
    val assigned = scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("v_id"), col("v_emb"), col("v_norm"), col("c_id").as("cell"))
    assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.v_id") < col("b.v_id"))
      .select(col("a.v_id").as("a_id"), col("b.v_id").as("b_id"),
        round(dot(col("a.v_emb"), col("b.v_emb")) / (col("a.v_norm") * col("b.v_norm")), 6).as("sim"))
      .filter(col("sim") >= minCos)
  }

  /** IVF with replicated assignment — the multi-probe recall knob
    * (SCALE.md §Recall): each vector is assigned to its `nprobe` nearest
    * cells instead of one, so pairs that straddle a cell boundary still
    * co-locate in some probed cell. Candidate generation cost grows ~nprobe×
    * (the join topology is unchanged: one hash exchange on cell ids,
    * same-cell pairs only, duplicates collapsed before exact verification).
    * nprobe=1 degenerates to [[ivfNearDupPairs]]. Deterministic codebook
    * (K lowest-id vectors) for oracle replay, same as the base IVF.
    */
  def ivfNearDupPairsMultiProbe(embeddings: DataFrame, k: Int, nprobe: Int,
                                minCos: Double): DataFrame = {
    val base = withNorm(graft.engine.Spread.spreadSmallInput(embeddings), "v")
    val codebook = withNorm(embeddings.filter(col("vec_id") < k), "c")
    val scored = base.crossJoin(broadcast(codebook))
      .select(col("v_id"), col("v_emb"), col("v_norm"), col("c_id"),
        round(dot(col("v_emb"), col("c_emb")) / (col("v_norm") * col("c_norm")), 6).as("sim_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("v_id")).orderBy(col("sim_c").desc, col("c_id").asc)
    val assigned = scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= nprobe)
      .select(col("v_id"), col("v_emb"), col("v_norm"), col("c_id").as("cell"))
    // Verify INSIDE the cell self-join, not in a later candidates ⋈
    // embeddings pass. The embeddings ride the PRE-pair exchange (nprobe·N
    // rows hashed by cell — ~nprobe·300 B/vector), the candidate pairs
    // exist only streaming through the join's codegen filter, and distinct
    // runs on the minCos SURVIVORS (duplicate same-pair rows from shared
    // probed cells carry a deterministic, identical 6-dp sim, so it
    // collapses them exactly). The previous dedup-candidates-then-attach-
    // embeddings shape shuffled the PAIR-granularity relation with two
    // 256-byte embeddings per row — measured at 64×/np=4 (128k vectors,
    // √N cells → ~3.7·10⁸ candidates): >76 GB of sort spill, run killed
    // by disk exhaustion, while this shape computes the same ~10⁸ extra
    // in-join dot products (the at-most np² per-pair duplicates) in
    // seconds of CPU and shuffles pairs at 16 bytes only after the
    // filter. Same law as the dedup pair-expansion width bound: never
    // ship per-row payloads at pair granularity.
    assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.v_id") < col("b.v_id"))
      .select(col("a.v_id").as("a_id"), col("b.v_id").as("b_id"),
        round(dot(col("a.v_emb"), col("b.v_emb")) / (col("a.v_norm") * col("b.v_norm")), 6).as("sim"))
      .filter(col("sim") >= minCos)
      .distinct()
  }

  /** Deterministic k-means IVF: seed the codebook with the K lowest-id
    * vectors, run `iters` Lloyd updates, then the same cell-join + exact
    * verification as [[ivfNearDupPairs]]. Every step is engine-portable:
    * assignments use 6-dp-rounded cosine with an id tie-break, and centroid
    * updates sum QUANTIZED components (floor(v·1e6) as integers) so the
    * mean is exact integer arithmetic divided once — partition-order
    * independent, and the DuckDB oracle replays the whole optimization
    * bit-for-bit. Centroids (K×dim doubles) are collected to the driver
    * each iteration — the standard k-means topology; the data-sized work
    * (assignment, update sums) stays distributed.
    */
  def kmeansIvfPairs(embeddings: DataFrame, k: Int, iters: Int, minCos: Double): DataFrame = {
    // cache the normed working set: it feeds every Lloyd round's assignment
    // + update, the final assignment, and both verify sides — uncached,
    // each use re-scans and re-spreads the corpus (Spark ML's KMeans
    // caches/warns for exactly this reason)
    val base = withNorm(graft.engine.Spread.spreadSmallInput(embeddings), "v")
      .transform(graft.engine.QueryCaches.registered)

    def assign(centroids: Seq[(Int, Array[Double])]): DataFrame = {
      val scoredCells = centroids.map { case (cid, c) =>
        val cn = math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x))
        struct(
          round(dot(col("v_emb"), typedlit(c.toSeq)) / (col("v_norm") * lit(cn)), 6).as("sim"),
          lit(-cid).as("negcid"))
      }
      // lexicographic array_max = highest sim, then lowest cell id
      base.withColumn("best", array_max(array(scoredCells: _*)))
        .select(col("v_id"), col("v_emb"), col("v_norm"),
          (col("best.negcid") * -1).as("cell"))
    }

    var centroids: Seq[(Int, Array[Double])] =
      embeddings.filter(col("vec_id") < k).select(col("vec_id"), col("embedding"))
        .collect().toSeq
        .map(r => (r.getLong(0).toInt,
          r.getSeq[Float](1).map(_.toDouble).toArray))
        .sortBy(_._1)

    for (_ <- 0 until iters) {
      val assigned = assign(centroids)
      val updated = assigned
        .select(col("cell"), posexplode(col("v_emb"))).toDF("cell", "pos", "v")
        .groupBy("cell", "pos")
        .agg(sum(floor(col("v").cast("double") * 1000000).cast("long")).as("qsum"),
          count(lit(1)).as("n"))
        .collect().toSeq
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          val comps = rows.sortBy(_.getInt(1))
            .map(r => r.getLong(2).toDouble / (r.getLong(3) * 1000000.0)).toArray
          (cell, comps)
        }
      // a cell that captured no vectors keeps its seed — dropping it would
      // shrink k for every later round (pqTopK's codebook rule, mirrored
      // in the oracle's cb0 LEFT JOIN)
      centroids = centroids.map { case (cid, old) =>
        (cid, updated.getOrElse(cid, old))
      }
    }

    val finalAssign = assign(centroids)
    finalAssign.as("a").join(finalAssign.as("b"),
        col("a.cell") === col("b.cell") && col("a.v_id") < col("b.v_id"))
      .select(col("a.v_id").as("a_id"), col("b.v_id").as("b_id"),
        round(dot(col("a.v_emb"), col("b.v_emb")) / (col("a.v_norm") * col("b.v_norm")), 6).as("sim"))
      .filter(col("sim") >= minCos)
  }

  /** Exact all-pairs near-duplicates (correctness baseline for LSH): every
    * pair with cosine ≥ minCos.
    *
    * Exact all-pairs is inherently O(N²) COMPUTE — no plan removes that; at
    * corpus scale the answer is the LSH/IVF paths above. What a plan CAN fix
    * is the O(N²) *topology*: a naive `a.join(b, a_id < b_id)` is a
    * broadcast-nested-loop with one side replicated everywhere and no
    * even work split. Instead this is the classic triangle block join:
    * rows hash into G blocks, the G(G+1)/2 block PAIRS become the join key,
    * so the quadratic work spreads evenly over reducers while each row is
    * shuffled only G+1 times (G ≈ √(2·parallelism) keeps replication ~2√P).
    * Every unordered pair lands in exactly one block-pair: (i,j) i<j holds
    * cross pairs once by construction, the diagonal dedupes by id order.
    * Output is independent of G; `least/greatest` restores a_id < b_id and
    * the dot product is commutative term-by-term, so the similarity is
    * bit-identical to the oracle's ordered evaluation.
    */
  /** Input ceiling for the exact all-pairs path. 200k rows ≈ 2·10¹⁰ pair
    * evaluations ≈ 10 core-hours of 64-dim dot products — the outer edge of
    * "verification baseline" work. Beyond it the quadratic term dominates
    * any cluster you'd give it (100× data = 10,000× compute; SCALE.md
    * "embed_neardup"), and the LSH/IVF paths + exact verify return the same
    * pairs at O(N·candidates). The guard makes pointing the exact form at a
    * corpus an error instead of a cluster-week.
    */
  val MaxExactPairsN: Long = 200000L

  def exactNearDupPairs(embeddings: DataFrame, minCos: Double,
                        maxExactN: Long = MaxExactPairsN): DataFrame = {
    // One cheap count (column-pruned scan) gates hours of quadratic work.
    val n = embeddings.count()
    require(n <= maxExactN,
      s"exactNearDupPairs is the O(N²) exactness baseline, capped at " +
        s"$maxExactN rows (got $n): use lshNearDupPairs/ivfNearDupPairs " +
        s"(LSH/IVF candidates + exact verify) for corpus-scale near-dup")
    trianglePairs(withNorm(embeddings, "v")).filter(col("sim") >= minCos)
  }

  /** The triangle-block all-pairs core over a normed frame (`v_id`,
    * `v_emb`, `v_norm`): every unordered pair exactly once, (a_id < b_id,
    * sim) out, quadratic work spread evenly (scaladoc above). UNGUARDED —
    * callers own the O(N²) decision ([[exactNearDupPairs]] gates on a
    * count; [[ivfAutoProbePairs]] feeds a bounded calibration sample).
    */
  private def trianglePairs(base0: DataFrame): DataFrame = {
    val spark = base0.sparkSession
    val g = math.max(2,
      math.ceil(math.sqrt(2.0 * spark.sparkContext.defaultParallelism)).toInt)
    import spark.implicits._
    val blockPairs = broadcast(
      (for (i <- 0 until g; j <- i until g) yield (i, j)).toDF("g1", "g2"))
    val base = base0
      .withColumn("blk", pmod(col("v_id"), lit(g)).cast("int"))
    val lhs = base.join(blockPairs, col("blk") === col("g1"))
      .select(col("g1"), col("g2"),
        col("v_id").as("l_id"), col("v_emb").as("l_emb"), col("v_norm").as("l_norm"))
    val rhs = base.join(blockPairs, col("blk") === col("g2"))
      .select(col("g1").as("h1"), col("g2").as("h2"),
        col("v_id").as("r_id"), col("v_emb").as("r_emb"), col("v_norm").as("r_norm"))
    lhs.join(rhs,
        col("g1") === col("h1") && col("g2") === col("h2") &&
          (col("g1") =!= col("g2") || col("l_id") < col("r_id")))
      .select(
        least(col("l_id"), col("r_id")).as("a_id"),
        greatest(col("l_id"), col("r_id")).as("b_id"),
        round(dot(col("l_emb"), col("r_emb")) / (col("l_norm") * col("r_norm")), 6).as("sim"))
  }

  /** Multi-probe IVF with a RECALL-TARGETED nprobe: instead of the caller
    * guessing the probe count, the plan calibrates it on a deterministic
    * held-out sample and picks the SMALLEST nprobe whose sample recall
    * meets `recallNum/recallDen`, capped at `maxProbe`.
    *
    * How (every step lives in the plan — no driver loop — and is
    * integer-deterministic, so the DuckDB oracle replays the selection
    * bit-for-bit):
    *  1. rank every vector's `maxProbe` nearest cells (the multi-probe
    *     assignment, computed ONCE and reused for calibration and the
    *     final join);
    *  2. sample = vectors with `v_id % sampleMod == 0` (the caller sizes
    *     sampleMod to hold the sample ~constant, cf. [[ivfCells]]);
    *     ground truth = the sample's exact cosine-≥-minCos neighbors
    *     against the WHOLE corpus (sample broadcast, corpus streams —
    *     O(sample·N); one-end sampling, because requiring both endpoints
    *     sampled thins pairs quadratically and yields zero truth at
    *     corpus scale);
    *  3. each truth pair's minimal recovering probe count =
    *     min over shared cells of max(rank_a, rank_b);
    *  4. chosen nprobe = the ⌈target · |truth|⌉-th smallest of those
    *     minima (exactly the smallest np with recall(np) ≥ target);
    *     maxProbe when even that recall is unreachable, 1 when the truth
    *     set is empty (nothing to recover — cheapest setting);
    *  5. the 1-row chosen frame folds into the assignment filter
    *     (`rank ≤ np`), then the usual same-cell candidates + exact
    *     verification.
    *
    * Scale: calibration adds one bounded triangle join (~sample² dots) and
    * one single-partition rank over |truth| rows (tiny — truth pairs, not
    * vectors); everything data-sized is the same one hash exchange on cell
    * ids the fixed-nprobe operator pays. Output carries the selected
    * `nprobe` so callers (and the oracle) see the decision.
    */
  /** Shared calibration plumbing for the auto-probe selector and its
    * diagnostic curve: (ranked multi-probe assignment, sample ground-truth
    * pairs, per-pair minimal recovering probe depth). `ranked` is persisted
    * — it feeds the calibration joins AND the final candidate join.
    */
  /** The deterministic held-out calibration sample: every `sampleMod`-th
    * vec_id, normed, `q_`-prefixed (the broadcastable query side).
    */
  private def samp(embeddings: DataFrame, sampleMod: Long): DataFrame =
    withNorm(embeddings, "q").filter(pmod(col("q_id"), lit(sampleMod)) === 0)

  private def probeCalibration(embeddings: DataFrame, k: Int, maxProbe: Int,
      sampleMod: Long, minCos: Double): (DataFrame, DataFrame, DataFrame) = {
    val base = withNorm(graft.engine.Spread.spreadSmallInput(embeddings), "v")
    val codebook = withNorm(embeddings.filter(col("vec_id") < k), "c")
    val scored = base.crossJoin(broadcast(codebook))
      .select(col("v_id"), col("v_emb"), col("v_norm"), col("c_id"),
        round(dot(col("v_emb"), col("c_emb")) / (col("v_norm") * col("c_norm")), 6).as("sim_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("v_id")).orderBy(col("sim_c").desc, col("c_id").asc)
    val ranked = scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= maxProbe)
      .select(col("v_id"), col("c_id").as("cell"), col("rn"))
      .transform(graft.engine.QueryCaches.registered)
    // Ground truth = the SAMPLE's exact near-neighbors against the WHOLE
    // corpus (bounded sample broadcast, corpus streams — O(sample·N),
    // linear in N). NOT sample-internal pairs: requiring both endpoints
    // sampled thins pairs by 1/sampleMod² — measured at 64× (128k
    // vectors, mod 250): ZERO truth pairs survive, and the selector
    // would fly blind exactly where it matters. One-end sampling keeps
    // E[truth] ≈ 2·|pairs|/sampleMod, shrinking only linearly.
    val sampQ = samp(embeddings, sampleMod)
    val truth = base
      .join(broadcast(sampQ), col("q_id") =!= col("v_id"))
      .select(least(col("q_id"), col("v_id")).as("a_id"),
        greatest(col("q_id"), col("v_id")).as("b_id"),
        round(dot(col("q_emb"), col("v_emb")) / (col("q_norm") * col("v_norm")), 6).as("sim"))
      .filter(col("sim") >= minCos)
      .select(col("a_id"), col("b_id")).distinct()
    val ra = ranked.select(col("v_id").as("a_id"), col("cell").as("cell_a"), col("rn").as("rn_a"))
    val rb = ranked.select(col("v_id").as("rb_id"), col("cell").as("cell_b"), col("rn").as("rn_b"))
    val minNeeded = truth
      .join(ra, "a_id")
      .join(rb, col("b_id") === col("rb_id") && col("cell_a") === col("cell_b"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(min(greatest(col("rn_a"), col("rn_b"))).as("need_np"))
    (ranked, truth, minNeeded)
  }

  /** Diagnostic recall curve behind [[ivfAutoProbePairs]]'s selection: one
    * row per probe depth 1..maxProbe with the sample ground-truth count,
    * pairs recovered at that depth, and the recall fraction — what the
    * selector sees when it picks. Harness/introspection surface (the
    * SCALE.md probe prints it); all frames bounded by the sample size.
    */
  def ivfProbeRecallCurve(embeddings: DataFrame, k: Int, maxProbe: Int,
                          sampleMod: Long, minCos: Double): DataFrame = {
    val (_, truth, minNeeded) = probeCalibration(embeddings, k, maxProbe, sampleMod, minCos)
    val spark = embeddings.sparkSession
    import spark.implicits._
    val nps = (1 to maxProbe).toDF("np")
    val totals = truth.agg(count(lit(1)).as("total"))
    nps.crossJoin(minNeeded)
      .groupBy(col("np"))
      .agg(sum(when(col("need_np") <= col("np"), 1L).otherwise(0L)).as("recovered"))
      .join(nps, Seq("np"), "right")
      .crossJoin(totals)
      .select(col("np"), coalesce(col("recovered"), lit(0L)).as("recovered"), col("total"),
        when(col("total") > 0,
          coalesce(col("recovered"), lit(0L)).cast("double") / col("total")).as("recall"))
      .orderBy(col("np"))
  }

  /** Memo for the eager calibration decisions ([[ivfAutoProbePairs]]'s
    * chosen nprobe, [[annRecallTargetPairs]]' chosen setting), keyed by
    * (session identity, input plan semanticHash, params) — the
    * `AsofJoin.routeCache` pattern, for the same reason: calibration cost
    * ~40% of the fixed-setting operator at 64× (SCALE.md), and a repeated
    * invocation of the same logical input under the same params
    * re-derives the identical integer-deterministic decision. Safety:
    * every cached value is replayed by the oracle from the data, so a
    * stale entry after an in-place FILE overwrite can only mis-place cost,
    * never change which pairs are near-dups at the recomputed sim — but it
    * CAN change the emitted decision columns; callers that overwrite input
    * files in place must [[clearCalibrationCache]]. Computation runs
    * OUTSIDE the map lock (get → compute → putIfAbsent): a racing caller
    * duplicates a calibration instead of blocking a CHM bin behind a
    * multi-second Spark job. Bounded: cleared wholesale past 1024 entries.
    */
  private val calibCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, String), AnyRef]()

  /** Drop all memoized calibration decisions (e.g. after overwriting input
    * files in place, which reuses the same logical plan shape).
    */
  def clearCalibrationCache(): Unit = calibCache.clear()

  private def calibMemoGet[T](df: DataFrame, params: String): Option[T] =
    Option(calibCache.get(calibKey(df, params))).map(_.asInstanceOf[T])

  private def calibMemoPut[T](df: DataFrame, params: String, value: T): T = {
    if (calibCache.size > 1024) calibCache.clear()
    val prior = calibCache.putIfAbsent(calibKey(df, params), value.asInstanceOf[AnyRef])
    if (prior != null) prior.asInstanceOf[T] else value
  }

  private def calibKey(df: DataFrame, params: String): (Int, Int, String) =
    (System.identityHashCode(df.sparkSession),
      df.queryExecution.analyzed.semanticHash(), params)

  /** NOTE — like [[graft.plans.AsofJoin.joinRouted]], this method runs an
    * EAGER Spark job at DataFrame-construction time when the decision is
    * not memoized (the calibration: one codebook scoring pass + the
    * sample ground-truth join), memoized per (session, input plan, params)
    * so repeated construction is free — a WARM call builds the fixed-np
    * plan directly and costs within noise of [[ivfNearDupPairsMultiProbe]]
    * at the chosen np. Batch inputs only (the calibration samples the
    * corpus). [[clearCalibrationCache]] is the escape hatch for inputs
    * overwritten in place.
    */
  def ivfAutoProbePairs(embeddings: DataFrame, k: Int, maxProbe: Int,
                        recallNum: Int, recallDen: Int, sampleMod: Long,
                        minCos: Double): DataFrame = {
    require(maxProbe >= 1 && recallNum >= 0 && recallDen > 0 && sampleMod >= 1,
      s"bad selector params: maxProbe=$maxProbe recall=$recallNum/$recallDen sampleMod=$sampleMod")
    val params = s"autoprobe|$k|$maxProbe|$recallNum|$recallDen|$sampleMod|$minCos"
    calibMemoGet[java.lang.Integer](embeddings, params) match {
      case Some(np) =>
        // warm path: the decision is known — build the fixed-np operator
        // (same rows: the selection is a deterministic function of the
        // data) and append the decision column
        ivfNearDupPairsMultiProbe(embeddings, k, np.intValue(), minCos)
          .withColumn("nprobe", lit(np.longValue()))
      case None =>
        val (ranked, truth, minNeeded) =
          probeCalibration(embeddings, k, maxProbe, sampleMod, minCos)
        // the (⌈target·total⌉)-th smallest minimum IS the smallest np meeting
        // the target; single-partition window over |truth| rows only
        val needed = truth.agg(count(lit(1)).as("total"))
          .select(col("total"),
            expr(s"(total * $recallNum + $recallDen - 1) div $recallDen").as("need"))
        val orderedNeeds = minNeeded
          .withColumn("pos", row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy(col("need_np"))))
        val np = needed.join(orderedNeeds, col("pos") === col("need"), "left")
          .select(coalesce(col("need_np"),
            when(col("need") === 0, lit(1)).otherwise(lit(maxProbe))).as("np"))
          .collect()(0).getInt(0)
        calibMemoPut(embeddings, params, java.lang.Integer.valueOf(np))
        // Verify INSIDE the cell self-join (the [[ivfNearDupPairsMultiProbe]]
        // shape — see the law there): embeddings attach to the ASSIGNMENT
        // (np·N rows, one hash join on v_id), pairs stream through the join's
        // codegen filter at 24 bytes, distinct collapses the ≤np² same-pair
        // duplicates on the deterministic 6-dp survivors. The previous
        // dedup-candidates-then-attach shape shipped two 256-byte embeddings
        // per CANDIDATE pair — at 64×/np=4 (~3.7·10⁸ candidates) that is
        // ~220 GB of sort spill; the run died on disk exhaustion.
        // Cold path reuses the REGISTERED ranked cache for the final join
        // (rn ≤ np is a filter of the rn ≤ maxProbe cache), so memoization
        // costs the cold caller nothing over the round-9 in-plan form.
        val sides = withNorm(embeddings, "v")
        val assigned = ranked.filter(col("rn") <= np)
          .join(sides, "v_id")
          .select(col("v_id"), col("cell"), col("v_emb"), col("v_norm"))
        assigned.as("a").join(assigned.as("b"),
            col("a.cell") === col("b.cell") && col("a.v_id") < col("b.v_id"))
          .select(col("a.v_id").as("a_id"), col("b.v_id").as("b_id"),
            round(dot(col("a.v_emb"), col("b.v_emb")) / (col("a.v_norm") * col("b.v_norm")), 6).as("sim"),
            lit(np.toLong).as("nprobe"))
          .filter(col("sim") >= minCos)
          .distinct()
    }
  }

  /** Deterministic plane matrix shared with the oracle SQL: 8 tables × 4
    * planes over 64 dims.
    */
  def defaultPlanes: Array[Array[Int]] = PortableHash.signPlanes(32, 64)

  /** 128-plane matrix for the cross-family selector's LSH grid (config
    * (L, w) uses the first L·w rows, indexed planes(t·w + j) — so the
    * (8, 4) config hashes identically to [[defaultPlanes]]).
    */
  def widePlanes: Array[Array[Int]] = PortableHash.signPlanes(128, 64)

  /** IVF cell-count grid for the cross-family selector: the √N balance
    * point plus two coarser tiers (÷4, ÷16; floor [[ivfCells]]' 16).
    * Coarser cells trade candidate mass for recall along a second axis
    * than nprobe — measured at 64× (SCALE.md "Recall-targeted
    * configuration"), the (cells, np) frontier reaches 90%+ where
    * √N-cells/np≤4 topped out at 37.6%.
    */
  def gridLevels(kBase: Int): Seq[Int] =
    Seq(kBase, math.max(16, (kBase + 3) / 4), math.max(16, (kBase + 15) / 16)).distinct

  /** One candidate configuration of the cross-family selector, with its
    * measured sample recall (recovered of total) and raw candidate mass
    * (Σ c·(c−1)/2 over cells / (table, bucket) groups — the number of
    * in-join similarity evaluations the setting would pay, duplicates
    * included). route "ivf": cells/probe set, tables=width=0; route
    * "lsh": tables/width/probe set, cells=0.
    */
  final case class AnnSetting(route: String, cells: Int, tables: Int, width: Int,
                              probe: Int, recovered: Long, total: Long, mass: Long) {
    def recallBp: Long = if (total == 0) 10000L else recovered * 10000L / total
  }

  /** The measured (setting → sample recall, candidate mass) curves the
    * cross-family selector decides from — every row one (family, config,
    * probe depth) point. All integer-deterministic: ground truth is the
    * [[probeCalibration]] one-end sample, IVF ranks per grid level come
    * from one conditional-running-count window pass over the √N-codebook
    * scoring, LSH recovery depths from the truth ENDPOINTS' multi-probe
    * buckets only (bounded), LSH mass from one corpus bucketing pass per
    * config. Diagnostic surface (ScaleProbe prints it; the spec pins the
    * selection against it); [[annRecallTargetPairs]] collects it.
    */
  def annSettingCurves(embeddings: DataFrame, kBase: Int, maxProbe: Int,
                       lshConfigs: Seq[(Int, Int)], maxLshProbe: Int,
                       planes: Array[Array[Int]], sampleMod: Long,
                       minCos: Double): DataFrame =
    annCalibrationFrames(embeddings, kBase, maxProbe, lshConfigs, maxLshProbe,
      planes, sampleMod, minCos)._1

  /** [[annSettingCurves]] plus the two REGISTERED assignment caches it
    * builds on the way — `ranked` (lvl, v_id, cell, rn ≤ maxProbe) and
    * `bk` (tables, width, v_id, t, q, bucket). A cold
    * [[annRecallTargetPairs]] call reuses `ranked` for an IVF pick (a
    * filter of the cache replaces N×cells re-scoring plus a window sort —
    * the [[ivfAutoProbePairs]] cold-path contract). `bk` is NOT reused for
    * an LSH pick: re-running the sign-planes kernel is a shuffle-free
    * per-row pass, cheaper than joining the cache back to the embeddings.
    * Both caches live until the caller's releaseAll boundary.
    */
  private def annCalibrationFrames(embeddings: DataFrame, kBase: Int, maxProbe: Int,
                       lshConfigs: Seq[(Int, Int)], maxLshProbe: Int,
                       planes: Array[Array[Int]], sampleMod: Long,
                       minCos: Double): (DataFrame, DataFrame, DataFrame) = {
    val spark = embeddings.sparkSession
    val levels = gridLevels(kBase)
    val base = withNorm(graft.engine.Spread.spreadSmallInput(embeddings), "v")
      .transform(graft.engine.QueryCaches.registered)

    // ---- shared ground truth (the ivfAutoProbePairs sample): one-end
    // sampling against the whole corpus — both-ends thins pairs by 1/mod²
    // and measured zero truth at 64×
    val sampQ = samp(embeddings, sampleMod)
    // registeredCounted: the eager fill already counts the cache, so the
    // truth cardinality rides the materialization instead of a second
    // full-cache 1-row aggregate (the lsh_quality_eval idiom, round 10)
    val (truth, nTruth) = graft.engine.QueryCaches.registeredCounted(
      base.join(broadcast(sampQ), col("q_id") =!= col("v_id"))
        .select(least(col("q_id"), col("v_id")).as("a_id"),
          greatest(col("q_id"), col("v_id")).as("b_id"),
          round(dot(col("q_emb"), col("v_emb")) / (col("q_norm") * col("v_norm")), 6).as("sim"))
        .filter(col("sim") >= minCos)
        .select(col("a_id"), col("b_id")).distinct())

    // ---- IVF grid: rank every vector's cells per level in ONE window
    // pass — rank within level g (cells with c_id < g, ordered sim desc)
    // is a conditional running count over the full √N-codebook ordering,
    // so three levels cost one sort, not three scoring passes
    val codebook = withNorm(embeddings.filter(col("vec_id") < kBase), "c")
    val scored = base.crossJoin(broadcast(codebook))
      .select(col("v_id"), col("c_id"),
        round(dot(col("v_emb"), col("c_emb")) / (col("v_norm") * col("c_norm")), 6).as("sim_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("v_id")).orderBy(col("sim_c").desc, col("c_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val withRanks = scored.select(
      col("v_id") +: col("c_id") +: levels.map(lv =>
        sum(when(col("c_id") < lv, 1).otherwise(0)).over(w).as(s"rn_$lv")): _*)
    val ranked = withRanks.select(col("v_id"), col("c_id").as("cell"),
        explode(array(levels.map(lv => struct(lit(lv).as("lvl"),
          when(col("c_id") < lv, col(s"rn_$lv")).cast("int").as("rn"))): _*)).as("x"))
      .select(col("x.lvl").as("lvl"), col("v_id"), col("cell"), col("x.rn").as("rn"))
      .filter(col("rn") <= maxProbe)
      .transform(graft.engine.QueryCaches.registered)
    val nps = spark.range(1, maxProbe + 1).select(col("id").cast("int").as("np"))
    // per-pair minimal recovering depth per level, as in probeCalibration
    val ra = ranked.select(col("lvl"), col("v_id").as("a_id"),
      col("cell").as("cell_a"), col("rn").as("rn_a"))
    val rb = ranked.select(col("lvl").as("lvl_b"), col("v_id").as("rb_id"),
      col("cell").as("cell_b"), col("rn").as("rn_b"))
    val minNeeded = truth
      .join(ra, "a_id")
      .join(rb, col("b_id") === col("rb_id") && col("cell_a") === col("cell_b") &&
        col("lvl") === col("lvl_b"))
      .groupBy(col("lvl"), col("a_id"), col("b_id"))
      .agg(min(greatest(col("rn_a"), col("rn_b"))).as("need_np"))
    val lvlFrame = spark.sql(levels.map(lv => s"SELECT $lv AS lvl").mkString(" UNION ALL "))
    val needCounts = minNeeded
      .select(col("lvl").as("r_lvl"), col("need_np"))
      .groupBy(col("r_lvl"), col("need_np")).agg(count(lit(1)).as("cnt"))
    val ivfRec = lvlFrame.crossJoin(nps)
      .join(needCounts,
        col("lvl") === col("r_lvl") && col("need_np") <= col("np"), "left")
      .groupBy(col("lvl"), col("np"))
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("recovered"))
    // raw candidate mass per (level, np): Σ_cell c_np·(c_np−1)/2 where
    // c_np counts assignments at rank ≤ np — all np thresholds from one
    // groupBy over the ranked cache
    val npAggs = (1 to maxProbe).map(np =>
      sum(when(col("rn") <= np, 1L).otherwise(0L)).as(s"c_$np"))
    val cellCounts = ranked.groupBy(col("lvl"), col("cell"))
      .agg(npAggs.head, npAggs.tail: _*)
    val ivfMass = cellCounts.select(col("lvl"),
        explode(array((1 to maxProbe).map(np => struct(lit(np).as("np"),
          expr(s"c_$np * (c_$np - 1) div 2").as("m"))): _*)).as("x"))
      .select(col("lvl"), col("x.np").as("np"), col("x.m").as("m"))
      .groupBy(col("lvl"), col("np"))
      .agg(sum(col("m")).as("mass"))
    val ivfCurve = ivfRec.join(ivfMass, Seq("lvl", "np"))
      .select(lit("ivf").as("route"), col("lvl").as("cells"),
        lit(0).as("tables"), lit(0).as("width"), col("np").as("probe"),
        col("recovered"), lit(nTruth).as("total"), col("mass"))

    // ---- LSH grid: corpus bucketing per config at maxLshProbe (mass for
    // every probe depth from one pass via the q tags); recovery depths
    // from the truth ENDPOINTS' buckets only
    val bk = lshConfigs.map { case (l, ww) =>
      base.select(col("v_id"), posexplode(
          graft.functions.VectorFunctions.graftSignPlanes(
            col("v_emb"), planes, l, ww, maxLshProbe)))
        .toDF("v_id", "pos", "bucket")
        .select(lit(l).as("tables"), lit(ww).as("width"), col("v_id"),
          (col("pos") / maxLshProbe).cast("int").as("t"),
          (col("pos") % maxLshProbe).cast("int").as("q"), col("bucket"))
    }.reduce(_.unionAll(_)).transform(graft.engine.QueryCaches.registered)
    val ps = spark.range(1, maxLshProbe + 1).select(col("id").cast("int").as("p"))
    val pAggs = (1 to maxLshProbe).map(p =>
      sum(when(col("q") < p, 1L).otherwise(0L)).as(s"c_$p"))
    val bCounts = bk.groupBy(col("tables"), col("width"), col("t"), col("bucket"))
      .agg(pAggs.head, pAggs.tail: _*)
    val lshMass = bCounts.select(col("tables"), col("width"),
        explode(array((1 to maxLshProbe).map(p => struct(lit(p).as("p"),
          expr(s"c_$p * (c_$p - 1) div 2").as("m"))): _*)).as("x"))
      .select(col("tables"), col("width"), col("x.p").as("p"), col("x.m").as("m"))
      .groupBy(col("tables"), col("width"), col("p"))
      .agg(sum(col("m")).as("mass"))
    val eps = truth.select(col("a_id").as("id"))
      .unionAll(truth.select(col("b_id").as("id"))).distinct()
    val epk = bk.join(broadcast(eps), col("v_id") === col("id"), "left_semi")
    val lshNeed = truth
      .join(epk.as("x"), col("a_id") === col("x.v_id"))
      .join(epk.as("y"), col("b_id") === col("y.v_id") &&
        col("x.tables") === col("y.tables") && col("x.width") === col("y.width") &&
        col("x.t") === col("y.t") && col("x.bucket") === col("y.bucket"))
      .select(col("x.tables").as("tables"), col("x.width").as("width"),
        col("a_id"), col("b_id"), (greatest(col("x.q"), col("y.q")) + 1).as("d"))
      .groupBy(col("tables"), col("width"), col("a_id"), col("b_id"))
      .agg(min(col("d")).as("need_p"))
    val cfgFrame = spark.sql(lshConfigs.map { case (l, ww) =>
      s"SELECT $l AS tables, $ww AS width" }.mkString(" UNION ALL "))
    val lshNeedCounts = lshNeed
      .select(col("tables").as("r_t"), col("width").as("r_w"), col("need_p"))
      .groupBy(col("r_t"), col("r_w"), col("need_p")).agg(count(lit(1)).as("cnt"))
    val lshRec = cfgFrame.crossJoin(ps)
      .join(lshNeedCounts,
        col("tables") === col("r_t") && col("width") === col("r_w") &&
          col("need_p") <= col("p"), "left")
      .groupBy(col("tables"), col("width"), col("p"))
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("recovered"))
    val lshCurve = lshRec.join(lshMass, Seq("tables", "width", "p"))
      .select(lit("lsh").as("route"), lit(0).as("cells"),
        col("tables"), col("width"), col("p").as("probe"),
        col("recovered"), lit(nTruth).as("total"), col("mass"))

    val curves = ivfCurve.unionAll(lshCurve)
      .orderBy(col("route"), col("cells"), col("tables"), col("width"), col("probe"))
    (curves, ranked, bk)
  }

  /** Near-duplicate pairs at a STATED RECALL TARGET — the cross-family
    * configuration selector (round-9 verdict #1). Instead of the caller
    * guessing an index setting, the operator measures the sample
    * recall/cost curve of every candidate setting — the IVF (cells ×
    * nprobe) grid of [[gridLevels]] AND a multi-table sign-LSH grid
    * (tables × width × probes) — and runs the CHEAPEST setting (by raw
    * candidate mass, the in-join similarity-evaluation count) whose
    * sample recall meets `recallNum/recallDen` within `massBudget`.
    * When no setting qualifies (target too high for the corpus geometry,
    * or budget too tight), it falls back to the best-effort setting
    * (highest recovered, then cheapest) — still deterministic, and the
    * output's `recall_bp` column states what was actually achieved, so a
    * caller (and the oracle) can see an un-met target rather than
    * silently trusting one.
    *
    * Why cross-family (measured at 64×, SCALE.md "Recall-targeted
    * configuration"): at √N cells / np ≤ 4 IVF recall tops out at 37.6%;
    * co-sizing (cells, np) reaches 90.7% at 4.47e9 mass (90 cells, np 7)
    * — but the sign-LSH family reaches 85.6% at 2.40e9 mass (16 tables ×
    * 8 bits, probes 2), 1.9× cheaper, because hyperplane buckets exploit
    * the pair ANGLE directly where coarse-codebook cells only exploit
    * proximity to a random centroid. Which family wins is a property of
    * the data — exactly why the selector measures instead of assuming.
    *
    * Everything is integer-deterministic and replayed by the DuckDB
    * oracle: ground truth, both grids' recovery depths, masses, the
    * ordered choice, and the final join. Eager + memoized like
    * [[ivfAutoProbePairs]] (see the contract there); output columns
    * (a_id, b_id, sim, route, cells, tables, width, probe, recall_bp).
    *
    * Scale shape: the final join always verifies IN-JOIN — embeddings
    * ride the pre-pair exchange (cell or bucket keyed), pairs exist only
    * streaming through the codegen cosine filter, distinct collapses
    * duplicate survivors — the pair-expansion width law. Calibration adds
    * one √N-codebook scoring pass (one window sort), one corpus bucketing
    * pass per LSH config, and truth-bounded joins.
    */
  def annRecallTargetPairs(embeddings: DataFrame, kBase: Int, maxProbe: Int,
                           lshConfigs: Seq[(Int, Int)], maxLshProbe: Int,
                           planes: Array[Array[Int]], recallNum: Int, recallDen: Int,
                           sampleMod: Long, minCos: Double,
                           massBudget: Long): DataFrame = {
    require(maxProbe >= 1 && maxLshProbe >= 1 && recallNum >= 0 && recallDen > 0 &&
      sampleMod >= 1 && massBudget >= 0 && lshConfigs.nonEmpty,
      s"bad selector params: maxProbe=$maxProbe maxLshProbe=$maxLshProbe " +
        s"recall=$recallNum/$recallDen sampleMod=$sampleMod budget=$massBudget")
    val params = s"recalltarget|$kBase|$maxProbe|${lshConfigs.mkString(";")}|" +
      s"$maxLshProbe|${planes.length}|$recallNum|$recallDen|$sampleMod|$minCos|$massBudget"
    // The final pair join is the same in-join-verified self-join for both
    // families — embeddings attach to the ASSIGNMENT (v_id-keyed hash join,
    // pre-pair exchange), pairs stream through the codegen cosine filter,
    // distinct collapses duplicate survivors (the width law). Only the
    // assignment differs: (cell) for ivf, (t, bucket) for lsh.
    def verifiedSelfJoin(assigned: DataFrame, keys: Seq[String]): DataFrame = {
      val cond = keys.map(k => col(s"a.$k") === col(s"b.$k"))
        .reduce(_ && _) && col("a.v_id") < col("b.v_id")
      assigned.as("a").join(assigned.as("b"), cond)
        .select(col("a.v_id").as("a_id"), col("b.v_id").as("b_id"),
          round(dot(col("a.v_emb"), col("b.v_emb")) / (col("a.v_norm") * col("b.v_norm")), 6).as("sim"))
        .filter(col("sim") >= minCos)
        .distinct()
    }
    // The LSH pair join is the same shape warm AND cold: re-running the
    // sign-planes kernel is a shuffle-free per-row pass (N·L·w plane dots),
    // strictly cheaper than joining the calibration's bk cache back to the
    // embeddings (that adds a v_id-keyed exchange of both relations) — the
    // cache-reuse economics only flip for IVF, where re-scoring means
    // N×cells dot products plus a full window sort (cold path below).
    def lshPairs(s: AnnSetting): DataFrame = {
      val base = withNorm(graft.engine.Spread.spreadSmallInput(embeddings), "v")
      val bkx = base.select(col("v_id"), col("v_emb"), col("v_norm"), posexplode(
          graft.functions.VectorFunctions.graftSignPlanes(
            col("v_emb"), planes, s.tables, s.width, s.probe)))
        .withColumnRenamed("pos", "pos0").withColumnRenamed("col", "bucket")
        .select(col("v_id"), col("v_emb"), col("v_norm"),
          (col("pos0") / s.probe).cast("int").as("t"), col("bucket"))
      verifiedSelfJoin(bkx, Seq("t", "bucket"))
    }
    val (chosen, pairs) = calibMemoGet[AnnSetting](embeddings, params) match {
      case Some(memo) =>
        // warm path: the decision is known — build the fixed-setting
        // operator directly (same rows: the selection is a deterministic
        // function of the data)
        val warm = memo.route match {
          case "ivf" =>
            ivfNearDupPairsMultiProbe(embeddings, memo.cells, memo.probe, minCos)
          case "lsh" =>
            lshPairs(memo)
        }
        (memo, warm)
      case None =>
        val (curves, ranked, _) = annCalibrationFrames(embeddings, kBase,
          maxProbe, lshConfigs, maxLshProbe, planes, sampleMod, minCos)
        val rows = curves.collect()
        val settings = rows.map(r => AnnSetting(r.getString(0), r.getInt(1),
          r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5), r.getLong(6), r.getLong(7)))
        val qualifying = settings.filter(s =>
          s.recovered * recallDen >= recallNum.toLong * s.total && s.mass <= massBudget)
        val pick =
          if (settings.isEmpty) {
            // Degenerate corpus (no embeddings): both curves are empty — any
            // route joins zero rows, so pin the first LSH config at probe 1
            // to keep the plan shape uniform instead of crashing on
            // minBy-of-empty. The oracle's `choice` CTE is empty on the same
            // input and its final cross join emits zero rows — parity is
            // empty == empty.
            val (l, ww) = lshConfigs.head
            AnnSetting("lsh", 0, l, ww, 1, 0L, 0L, 0L)
          } else if (qualifying.nonEmpty)
            qualifying.minBy(s => (s.mass, s.probe, s.route, s.cells, s.tables, s.width))
          else
            settings.minBy(s => (-s.recovered, s.mass, s.probe, s.route, s.cells, s.tables, s.width))
        calibMemoPut(embeddings, params, pick)
        // cold IVF path: build the final join from the REGISTERED `ranked`
        // cache the calibration just filled — the chosen (cells, probe)
        // assignment is a filter of the (lvl, rn ≤ maxProbe) cache, and
        // re-scoring instead would repeat N×cells dot products plus the
        // full window sort (ivfAutoProbePairs' cold-path contract:
        // memoization costs the cold caller nothing). Assignment tie-break
        // is identical both ways: rank by (6-dp sim desc, c_id asc).
        val cold = pick.route match {
          case "ivf" =>
            val sides = withNorm(embeddings, "v")
            val assigned = ranked
              .filter(col("lvl") === pick.cells && col("rn") <= pick.probe)
              .join(sides, "v_id")
              .select(col("v_id"), col("cell"), col("v_emb"), col("v_norm"))
            verifiedSelfJoin(assigned, Seq("cell"))
          case "lsh" =>
            lshPairs(pick)
        }
        (pick, cold)
    }
    pairs
      .withColumn("route", lit(chosen.route))
      .withColumn("cells", lit(chosen.cells.toLong))
      .withColumn("tables", lit(chosen.tables.toLong))
      .withColumn("width", lit(chosen.width.toLong))
      .withColumn("probe", lit(chosen.probe.toLong))
      .withColumn("recall_bp", lit(chosen.recallBp))
  }

  /** Squared L2 distance between two equal-length double arrays: squared
    * differences folded left from a 0.0 accumulator — index order on both
    * engines (Spark HOF fold here, DuckDB `list_reduce` comprehension in
    * the oracle), so the double result is bit-identical.
    */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Product-quantization ANN with asymmetric distance computation (ADC) —
    * the memory-bound scale path: Jégou et al., "Product Quantization for
    * Nearest Neighbor Search" (TPAMI 2011).
    *
    * The 64-dim space splits into `m` orthogonal subspaces of `dsub` dims;
    * each subspace gets its own `k`-centroid codebook (seeded with the k
    * lowest-id vectors' subvectors, refined by one Lloyd step). Every
    * vector is then ENCODED as m small codes — 8 bytes here vs 256 bytes
    * of floats, the 32× compression that lets a 100 TB corpus's index live
    * in cluster memory. Queries never decode: each query precomputes an
    * m×k lookup table of exact subspace distances to every centroid, and a
    * candidate's approximate distance is m integer table lookups summed.
    *
    * Retrieval is the standard two-stage pipeline: ADC ranks a SHORTLIST
    * (`shortlist` candidates per query — the cheap, compressed-domain
    * pass over all N codes), then only shortlist members are re-ranked by
    * exact squared L2 against raw embeddings. The fixture embeddings are
    * isotropic (within-label cosine ≈ between-label ≈ 0 — the
    * distance-concentration worst case for ANY ANN structure), so the
    * spec's recall floor is measured there; clustered real-world
    * embedding corpora are the favorable case.
    *
    * Plan shape at scale: codebooks and LUTs are broadcast (m·k·dsub and
    * Q·m·k doubles — KBs); the ADC join streams the CODES table (never the
    * raw vectors) through one broadcast join + partial aggregation, and
    * only the Q·shortlist survivors touch raw embeddings again.
    * Determinism for the oracle: Lloyd sums floor(v·1e6) integers (exact,
    * order-independent), assignment ties break on centroid id, LUT entries
    * quantize to integer micros so ADC sums are exact integer arithmetic,
    * and both rank stages tie-break on neighbor id — DuckDB replays
    * codebook training, encoding, ADC, and the re-rank bit-for-bit.
    */
  def pqTopK(embeddings: DataFrame, queryPred: Column, m: Int, dsub: Int,
             k: Int, topK: Int, shortlist: Int = 50): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val base = graft.engine.Spread.spreadSmallInput(embeddings)
    // (vec_id, m, sub): the per-subspace view of every vector
    val sub = base.select(col("vec_id"), posexplode(array((0 until m).map { mi =>
        transform(slice(col("embedding"), mi * dsub + 1, dsub), _.cast("double"))
      }: _*)))
      .toDF("vec_id", "m", "sub")

    // nearest centroid per (vector, subspace): lexicographic min over
    // (rounded distance, centroid id) — one broadcast join, one partial agg
    def encode(cb: DataFrame): DataFrame =
      sub.join(broadcast(cb), "m")
        .select(col("vec_id"), col("m"),
          struct(round(l2sq(col("sub"), col("c")), 6).as("d"), col("cid")).as("dc"))
        .groupBy("vec_id", "m")
        .agg(min(col("dc")).as("best"))
        .select(col("vec_id"), col("m"), col("best.cid").as("cid"))

    val seeds: Seq[(Int, Int, Seq[Double])] = embeddings
      .filter(col("vec_id") < k).select("vec_id", "embedding").collect().toSeq
      .flatMap { r =>
        val cid = r.getLong(0).toInt
        val emb = r.getSeq[Float](1)
        (0 until m).map(mi => (mi, cid, emb.slice(mi * dsub, (mi + 1) * dsub)
          .map(_.toDouble)))
      }
    val cb0 = seeds.toDF("m", "cid", "c")

    // one Lloyd refinement: quantized integer component sums (exact,
    // partition-order independent), mean taken once on the driver;
    // centroids that captured no vectors keep their seed (cells stay k)
    val updated = encode(cb0).join(sub, Seq("vec_id", "m"))
      .select(col("m"), col("cid"), posexplode(col("sub")))
      .toDF("m", "cid", "pos", "v")
      .groupBy("m", "cid", "pos")
      .agg(sum(floor(col("v") * 1000000).cast("long")).as("qsum"),
        count(lit(1)).as("n"))
      .collect().toSeq
      .groupBy(r => (r.getInt(0), r.getInt(1)))
      .map { case (key, rows) =>
        key -> rows.sortBy(_.getInt(2))
          .map(r => r.getLong(3).toDouble / (r.getLong(4) * 1000000.0)).toSeq
      }
    val cb1 = seeds.map { case (mi, cid, c0) =>
      (mi, cid, updated.getOrElse((mi, cid), c0))
    }.toDF("m", "cid", "c")

    val codes = encode(cb1)
    // per-query subspace-distance lookup table, in integer micros
    val lut = sub.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("m"), col("sub"))
      .join(broadcast(cb1), "m")
      .select(col("q_id"), col("m"), col("cid"),
        floor(l2sq(col("sub"), col("c")) * 1000000).cast("long").as("lut"))
    // ADC: m lookups summed per (query, candidate) — exact integer math
    val adc = codes.join(broadcast(lut), Seq("m", "cid"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id").as("n_id"))
      .agg(sum(col("lut")).as("adc_micros"))
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("adc_micros").asc, col("n_id").asc)
    val short = adc.withColumn("rn", row_number().over(wAdc))
      .filter(col("rn") <= shortlist)
      .drop("rn")
    // stage 2: exact squared-L2 re-rank of the shortlist against raw
    // embeddings (cosine kept as an audit column)
    val sides = withNorm(embeddings, "s")
    def emb64(c: Column) = transform(c, _.cast("double"))
    val rer = short
      .join(sides.select(col("s_id").as("q_id"), col("s_emb").as("q_emb"),
        col("s_norm").as("q_norm")), "q_id")
      .join(sides.select(col("s_id").as("n_id"), col("s_emb").as("n_emb"),
        col("s_norm").as("n_norm")), "n_id")
      .select(col("q_id"), col("n_id"), col("adc_micros"),
        round(l2sq(emb64(col("q_emb")), emb64(col("n_emb"))), 6).as("d2"),
        round(cosine("q", "n"), 6).as("sim"))
    val wExact = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d2").asc, col("n_id").asc)
    rer.withColumn("rank", row_number().over(wExact).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("n_id"), col("rank"), col("d2"),
        col("adc_micros"), col("sim"))
  }

  /** Semantic deduplication (SemDeDup, Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space coarsely, then inside
    * each cluster drop every vector that is near-identical (cosine ≥ tau)
    * to a lower-id vector of the same cluster, keeping the minimum-id
    * representative of each semantic neighborhood. The kept set is the
    * "dominator" relaxation of the paper's sequential greedy scan: a
    * vector is dropped iff ANY smaller-id cluster-mate is within tau
    * (whether or not that mate was itself dropped) — order-independent,
    * so it parallelizes as one self-join and is exactly replayable by the
    * oracle; it prunes a (slight) superset of the greedy scan's drops.
    *
    * Scale design: identical topology to [[ivfNearDupPairs]] — a K-row
    * broadcast codebook assigns cells (the deterministic K-lowest-id
    * codebook stands in for k-means centroids so the oracle can replay
    * assignment; swap [[kmeansIvfPairs]]' trained centroids in production),
    * one hash exchange on cell ids co-locates each cluster, and the
    * quadratic verify runs only within cells. Output is every vector with
    * its cell and kept flag — the pruned corpus is `filter(kept)`.
    */
  def semDedup(embeddings: DataFrame, k: Int, tau: Double): DataFrame = {
    val base = withNorm(graft.engine.Spread.spreadSmallInput(embeddings), "v")
    val codebook = withNorm(embeddings.filter(col("vec_id") < k), "c")
    val scored = base.crossJoin(broadcast(codebook))
      .select(col("v_id"), col("v_emb"), col("v_norm"), col("c_id"),
        round(cosine("v", "c"), 6).as("sim_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("v_id")).orderBy(col("sim_c").desc, col("c_id").asc)
    val assigned = scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("v_id"), col("v_emb"), col("v_norm"), col("c_id").as("cell"))
      .transform(graft.engine.QueryCaches.registered)
    val dropped = assigned.select(col("v_id").as("a_id"), col("v_emb").as("a_emb"),
        col("v_norm").as("a_norm"), col("cell"))
      .join(assigned.select(col("v_id").as("b_id"), col("v_emb").as("b_emb"),
        col("v_norm").as("b_norm"), col("cell")), "cell")
      .filter(col("a_id") < col("b_id"))
      .filter(round(cosine("a", "b"), 6) >= tau)
      .select(col("b_id").as("v_id")).distinct()
    assigned.select(col("v_id").as("vec_id"), col("cell"))
      .join(dropped.select(col("v_id").as("vec_id"), lit(true).as("hit")),
        Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("hit").isNull.as("kept"))
  }

}
