package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{SparkSession, classic}

/** `private[sql]` access shim for the session's CacheManager — the SQL-level
  * cache registry behind `Dataset.persist` (localCheckpoint blocks live in
  * the BlockManager instead and are NOT tracked here). Used by
  * QueriesSmokeSpec to prove `graft.engine.QueryCaches.releaseAll()` leaves
  * no engine intermediate behind after any oracled query.
  */
object CacheBridge {
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
