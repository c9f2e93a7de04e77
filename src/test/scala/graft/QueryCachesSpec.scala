package graft

import org.apache.spark.storage.StorageLevel
import graft.engine.QueryCaches

/** The cache registry is keyed by SparkSession: one session's query
  * boundary must never unpersist another session's still-needed
  * intermediates (two concurrent sessions embedding the library was the
  * round-8 advice scenario — a global registry silently broke the
  * compute-once invariant the persists exist for).
  */
class QueryCachesSpec extends SparkSuite {

  test("releaseAll(session) releases only that session's intermediates") {
    val s1 = spark
    val s2 = spark.newSession()
    val a = QueryCaches.registered(s1.range(1000).toDF("v"))
    val b = QueryCaches.registered(s2.range(2000).toDF("v"))
    assert(a.count() == 1000 && b.count() == 2000)
    assert(a.storageLevel != StorageLevel.NONE && b.storageLevel != StorageLevel.NONE)

    QueryCaches.releaseAll(s1, blocking = true)
    assert(a.storageLevel == StorageLevel.NONE, "own session's intermediate must be released")
    assert(b.storageLevel != StorageLevel.NONE,
      "another session's intermediate must survive a foreign releaseAll")

    QueryCaches.releaseAll(s2, blocking = true)
    assert(b.storageLevel == StorageLevel.NONE)
    assert(org.apache.spark.sql.graftbridge.CacheBridge.cacheIsEmpty(s1))
  }

  test("no-arg releaseAll resolves the active/default session and is safe to repeat") {
    val c = QueryCaches.registered(spark.range(10).toDF("v"))
    assert(c.count() == 10)
    QueryCaches.releaseAll(blocking = true)
    assert(c.storageLevel == StorageLevel.NONE)
    QueryCaches.releaseAll(blocking = true) // idempotent on an empty registry
  }
}
