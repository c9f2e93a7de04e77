package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Query-scoped cache registry: pairs every `persist` the engine takes on
  * an intermediate with an `unpersist` at a defined lifecycle point.
  *
  * Why not leave release to `spark.catalog.clearCache()`: that nukes the
  * USER's cached tables along with the engine's intermediates — a library
  * must not reach into session state it does not own. And the builder
  * functions themselves cannot unpersist most of these intermediates: the
  * returned plan is lazy and still references the persisted subtree (a
  * postings frame feeding both sides of a self-join is only computed once
  * BECAUSE the cache entry is alive at action time), so release has to
  * happen after the caller's action — which only the caller can see.
  *
  * So: every engine persist goes through [[registered]], and the harnesses
  * (Verify / Bench / Profile) call [[releaseAll]] at each query boundary; a
  * long-lived session embedding the library does the same at its own
  * boundaries. QueriesSmokeSpec asserts the pairing really is complete:
  * after any oracled query's action plus `releaseAll()`, the session's
  * cacheManager is empty.
  *
  * The registry is keyed by `SparkSession`, derived from each registered
  * frame: two sessions embedding the library concurrently each see only
  * their own intermediates, so one session's query boundary cannot
  * unpersist a frame the other session's in-flight query still needs
  * (the compute-once invariant the persists exist for). Within one
  * session the caller still owns the boundary discipline: call
  * [[releaseAll]] only when no query of that session is mid-action.
  *
  * Iterative operators that pin rounds via [[Snapshot.pin]] are a separate
  * mechanism (localCheckpoint blocks, freed by the ContextCleaner when the
  * round's RDD is unreferenced) and intentionally not tracked here.
  */
object QueryCaches {
  private val live =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.util.concurrent.ConcurrentLinkedQueue[DataFrame]]()

  /** Past this many un-released entries for one session we warn once: the
    * registry holds strong references, so a session that registers but
    * never reaches a [[releaseAll]] boundary would otherwise grow its
    * cached footprint silently until the storage floor pins execution.
    */
  private val WarnDepth = 256
  private val warned = java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  /** Persist `df` (MEMORY_AND_DISK — every engine intermediate wants
    * spill-not-recompute), MATERIALIZE it, and register it for the next
    * [[releaseAll]] of its own session. Drop-in via
    * `.transform(QueryCaches.registered)`.
    *
    * Materialization is eager ON PURPOSE — it is load-bearing for planning,
    * not a convenience. An un-materialized `InMemoryRelation`'s statistics
    * fall back to the CHILD plan's estimate, and for the engine's typical
    * cached shapes (kernel explodes, join-derived pair frames) that
    * estimate is garbage-small; the static planner then happily puts the
    * cache on the BUILD side of a broadcast join, and a statically-planned
    * broadcast is one decision AQE can never demote at runtime. Measured at
    * 64×/8 GiB: the minhash posting cache (~16M rows) static-planned as a
    * broadcast build in `dup_clusters`' edge materialization — a ~512 MB
    * UnsafeHashedRelation per rebuild — and died with
    * UNABLE_TO_ACQUIRE_MEMORY, while the same join over a MATERIALIZED
    * cache (real byte sizes in `computeStats`) sort-merge-joins at scale
    * and still broadcasts on the 500-doc fixtures where the cache really
    * is small. The fill work is not extra: the first consuming action
    * would have paid it anyway; `count()` just moves it before any
    * dependent plan is compiled.
    */
  def registered(df: DataFrame): DataFrame = registered(df, df.sparkSession)

  /** [[registered]] with an explicit OWNING session for the release pairing.
    * Needed when a builder evaluates on a throwaway CHILD session (conf
    * scoping, e.g. the recursive-CTE row-limit raise) but the cache
    * logically belongs to the caller's query: the cache manager is
    * SharedState (any session can unpersist), while the registry is
    * session-keyed — registering under the child would orphan the entry
    * from the caller's `releaseAll(callerSession)` boundary.
    */
  def registered(df: DataFrame, owner: SparkSession): DataFrame = {
    registeredCounted(df, owner)
    df
  }

  /** [[registered]], also returning the materializing count. For callers
    * whose query needs the cached frame's CARDINALITY anyway (an eval
    * harness reporting n_truth / n_cand): the eager fill already pays a
    * full count — re-deriving the same number downstream as a 1-row
    * aggregate re-scans the cache and schedules an extra job per cache.
    */
  def registeredCounted(df: DataFrame): (DataFrame, Long) =
    registeredCounted(df, df.sparkSession)

  /** [[registeredCounted]] with an explicit owning session ([[registered]]'s
    * owner contract). */
  def registeredCounted(df: DataFrame, owner: SparkSession): (DataFrame, Long) = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    // Enqueue BEFORE the materializing count: if the count throws (OOM, task
    // failure, job cancel) the frame is already registered, so the caller's
    // releaseAll() boundary still frees it. Counting first would strand a
    // persisted-but-unregistered frame — the exact unreleasable-leak class
    // this registry exists to prevent, and Verify/Bench deliberately continue
    // past per-query failures, so such strands would accumulate pinned
    // storage across a long run.
    val q = live.computeIfAbsent(owner, _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]())
    q.add(df)
    val n = df.count()
    if (q.size > WarnDepth && warned.add(owner)) {
      System.err.println(
        s"[graft] QueryCaches holds >$WarnDepth un-released intermediates for one session; " +
          "call QueryCaches.releaseAll(session) at query boundaries to free them.")
    }
    (df, n)
  }

  /** Unpersist every intermediate registered by `session`. Idempotent — an
    * entry already unpersisted by its builder (early release) is a no-op.
    *
    * `blocking = false` suits a latency-sensitive long-lived session:
    * release is bookkeeping, not on any query's critical path. Any
    * back-to-back sequential harness (Bench's warm-then-measured passes,
    * Verify / Profile walking queries one after another) must pass
    * `blocking = true`: a non-blocking unpersist only QUEUES block
    * removal, so the previous query's multi-GB cached postings can still
    * occupy the unified-memory storage floor (which execution cannot
    * evict past) when the next query's big shuffle asks for pages —
    * observed at 64×/8 GiB as a measured-pass OOM right after a green
    * warm pass.
    */
  def releaseAll(session: SparkSession, blocking: Boolean): Unit = {
    val q = live.remove(session)
    warned.remove(session)
    if (q != null) {
      var df = q.poll()
      while (df != null) {
        df.unpersist(blocking)
        df = q.poll()
      }
    }
  }

  /** [[releaseAll]] for the calling thread's active session (falling back
    * to the default session). No-op when neither exists — there is then no
    * session whose intermediates this thread can safely claim.
    */
  def releaseAll(blocking: Boolean = false): Unit =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession).foreach(releaseAll(_, blocking))
}
