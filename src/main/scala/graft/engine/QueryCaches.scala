package graft.engine

import org.apache.spark.sql.DataFrame
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
  * Iterative operators that pin rounds via [[Snapshot.pin]] are a separate
  * mechanism (localCheckpoint blocks, freed by the ContextCleaner when the
  * round's RDD is unreferenced) and intentionally not tracked here.
  */
object QueryCaches {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` (MEMORY_AND_DISK — every engine intermediate wants
    * spill-not-recompute) and register it for the next [[releaseAll]].
    * Drop-in via `.transform(QueryCaches.registered)`.
    */
  def registered(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    live.add(df)
    df
  }

  /** Unpersist every registered intermediate. Idempotent — an entry
    * already unpersisted by its builder (early release) is a no-op.
    *
    * `blocking = false` (the default) suits a long-lived session: release
    * is bookkeeping, not on any query's critical path. A back-to-back
    * harness (Bench's warm-then-measured passes) must pass `blocking =
    * true`: a non-blocking unpersist only QUEUES block removal, so the
    * previous pass's multi-GB cached postings can still occupy the
    * unified-memory storage floor (which execution cannot evict past)
    * when the next pass's big shuffle asks for pages — observed at
    * 64×/8 GiB as a measured-pass OOM right after a green warm pass.
    */
  def releaseAll(blocking: Boolean = false): Unit = {
    var df = live.poll()
    while (df != null) {
      df.unpersist(blocking)
      df = live.poll()
    }
  }
}
