package graft

/** Every registered query runs at sf0.001, is deterministic across two
  * executions, and has a matching oracle entry (the driver's t2 gate shape).
  */
class QueriesSmokeSpec extends SparkSuite {

  test("every oracle has a query; only sketch queries may omit an oracle") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.forall(_.startsWith("approx_")), s"unexpected oracle-less queries: $noOracle")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs and is deterministic at sf0.001") {
      val a = fn(spark, sf1)
      val cols = a.columns.map(org.apache.spark.sql.functions.col).toSeq
      val r1 = a.orderBy(cols: _*).collect().toSeq
      val r2 = fn(spark, sf1).orderBy(cols: _*).collect().toSeq
      assert(r1 == r2, s"$name not deterministic")
      // cache lifecycle hygiene (round-7 verdict #5): every persist the
      // engine took while answering this query must be REGISTERED, so the
      // paired release leaves the session's SQL cache completely empty —
      // an unregistered persist would accumulate blocks for the lifetime
      // of a long-lived session. Checked per query, over every query.
      graft.engine.QueryCaches.releaseAll(spark, blocking = false)
      assert(org.apache.spark.sql.graftbridge.CacheBridge.cacheIsEmpty(spark),
        s"$name left unregistered persisted plans in the cache manager")
    }
  }
}
