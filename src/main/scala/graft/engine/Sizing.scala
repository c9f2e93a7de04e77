package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-driven exchange sizing for operators whose intermediate row count
  * is a FUNCTION of the data, not of the input size — the quadratic
  * candidate streams of the dedup/ANN family (Σ df·(df−1)/2 collision
  * rows from an inverted-index self-join, n·(n−1)/2 same-cell pairs).
  *
  * The law this helper encodes (SCALE.md "never SORT the quadratic
  * stream", measured at 64×/256×): **AQE never SPLITS an oversized
  * aggregation or sort — it only coalesces small partitions — so any
  * exchange whose per-partition state is data-quadratic must be sized
  * EXPLICITLY before the shuffle.** A fixed 32-partition exchange under a
  * ~240M-row collision stream cost 26 GB of sort spill at 64× and died at
  * 256× (spill-reader read-ahead buffers live OUTSIDE managed memory); the
  * same stream through a mass-sized `repartition(parts, keys)` runs in
  * bounded per-task state, and the explicit repartition also satisfies the
  * downstream aggregation's distribution requirement so no second exchange
  * appears.
  *
  * Three idioms existed by round 9 (mass probes here, `AsofJoin
  * .hotKeyProbe`'s sampled histogram, AQE's own runtime stats); this object
  * is the canonical home for the first: a 1-row driver-blocking aggregate
  * over an ALREADY-MATERIALIZED (registered) frame — cheap by construction
  * (the probe scans a cache, never recomputes a pipeline) and exact where a
  * sample would have to extrapolate the quadratic term. Reach for
  * [[collisionMass]] + [[partsFor]] before writing a fixed `repartition`
  * under any pair expansion.
  */
object Sizing {

  /** Rows-per-partition target for the collapsed pair streams (the
    * candidate-dedup / pair-count exchanges): ~2M 16-byte pair rows keeps
    * per-task hash-aggregation state well inside a 256 MB task share.
    */
  val PairRowsPerPartition: Long = 2000000L

  /** Rows-per-partition target for posting-array verify joins (rows carry
    * a sorted hash array ~0.8 KB each — half the pair target).
    */
  val PostingRowsPerPartition: Long = 1000000L

  /** Partition-count ceiling: 4096 tasks is past any single-stage benefit
    * on the clusters this targets; the floor is the session's default
    * parallelism so small inputs keep every core busy.
    */
  val MaxParts: Long = 4096L

  /** Docs ceiling under which the doc-granular (doc_id, n_sh) sizes
    * relation is BROADCAST for the pair-family length filter (PPJoin
    * length bound, see `Dedup.lengthCompatible`): below it the prune is
    * MAP-SIDE (zero exchanges added), so it is strictly
    * shuffle-byte-reducing and safe to run even on a raw pre-dedup
    * collision stream. The value is MEASURED, not theoretical: at 1024×
    * (5.12M docs) building the two ~5M-entry hashed relations alongside
    * the family's posting/docset caches was NONDETERMINISTIC on the
    * 8 GiB JVM — `minhash_lsh` completed once (115 s) and died twice
    * ("Not enough memory to build and broadcast"), while 256× (1.28M
    * docs) was always clean — so the ceiling sits at 2M docs (two
    * ~2M-entry builds ≈ low hundreds of MB with room to spare) and
    * everything past it takes the keyed piggyback form instead
    * (`Dedup.lengthCompatible`'s wide branch: shuffle-hash size joins at
    * the caller's data-sized width — one extra narrow exchange of the
    * candidate stream, paid only where the stream it prunes is tens of
    * GB).
    */
  val SizesBroadcastMaxDocs: Long = 2000000L

  /** Exact raw collision mass Σ_k c_k·(c_k−1)/2 of `keyed` grouped by
    * `key` — the row count of the key-equality self-join of the frame with
    * itself (before any same-pair collapse). One 1-row driver-blocking
    * aggregate; call it on a REGISTERED (materialized) frame so the probe
    * scans the cache instead of recomputing the pipeline that built it.
    */
  def collisionMass(keyed: DataFrame, key: String): Long =
    keyed.groupBy(col(key)).agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * (c - 1) div 2")).as("raw"))
      .collect().headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
      .getOrElse(0L)

  /** Exchange width for an expected `rows`-row stream at
    * `rowsPerPartition` per task: max(defaultParallelism,
    * min([[MaxParts]], rows / rowsPerPartition)).
    */
  def partsFor(spark: SparkSession, rows: Long, rowsPerPartition: Long): Int =
    math.max(spark.sparkContext.defaultParallelism,
      math.min(MaxParts, rows / rowsPerPartition).toInt)
}
