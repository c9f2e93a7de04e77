package graft

/** Every registered query runs at sf0.001, is deterministic across two
  * executions, and has a matching oracle entry (the driver's t2 gate shape).
  */
class QueriesSmokeSpec extends SparkSuite {

  test("every query has an oracle and every oracle has a query") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
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
    }
  }
}
