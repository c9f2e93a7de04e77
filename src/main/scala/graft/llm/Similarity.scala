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

  def ivfAutoProbePairs(embeddings: DataFrame, k: Int, maxProbe: Int,
                        recallNum: Int, recallDen: Int, sampleMod: Long,
                        minCos: Double): DataFrame = {
    require(maxProbe >= 1 && recallNum >= 0 && recallDen > 0 && sampleMod >= 1,
      s"bad selector params: maxProbe=$maxProbe recall=$recallNum/$recallDen sampleMod=$sampleMod")
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
    val chosen = needed.join(orderedNeeds, col("pos") === col("need"), "left")
      .select(coalesce(col("need_np"),
        when(col("need") === 0, lit(1)).otherwise(lit(maxProbe))).as("np"))
    // Verify INSIDE the cell self-join (the [[ivfNearDupPairsMultiProbe]]
    // shape — see the law there): embeddings attach to the ASSIGNMENT
    // (np·N rows, one hash join on v_id), pairs stream through the join's
    // codegen filter at 24 bytes, distinct collapses the ≤np² same-pair
    // duplicates on the deterministic 6-dp survivors. The previous
    // dedup-candidates-then-attach shape shipped two 256-byte embeddings
    // per CANDIDATE pair — at 64×/np=4 (~3.7·10⁸ candidates) that is
    // ~220 GB of sort spill; the run died on disk exhaustion.
    val sides = withNorm(embeddings, "v")
    val assigned = ranked.crossJoin(broadcast(chosen)).filter(col("rn") <= col("np"))
      .join(sides, "v_id")
      .select(col("v_id"), col("cell"), col("np"), col("v_emb"), col("v_norm"))
    assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.v_id") < col("b.v_id"))
      .select(col("a.v_id").as("a_id"), col("b.v_id").as("b_id"),
        round(dot(col("a.v_emb"), col("b.v_emb")) / (col("a.v_norm") * col("b.v_norm")), 6).as("sim"),
        col("a.np").cast("long").as("nprobe"))
      .filter(col("sim") >= minCos)
      .distinct()
  }

  /** Deterministic plane matrix shared with the oracle SQL: 8 tables × 4
    * planes over 64 dims.
    */
  def defaultPlanes: Array[Array[Int]] = PortableHash.signPlanes(32, 64)

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
