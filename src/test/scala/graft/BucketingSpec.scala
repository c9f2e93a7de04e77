package graft

import graft.engine.{Bucketing, Tables}
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: identical bucket spec on both sides ⇒ the
  * join plan has no shuffle on the join key.
  */
class BucketingSpec extends SparkSuite {

  test("bucketed fact-fact join runs without a shuffle exchange") {
    // bucketed joins must see the bucket layout: disable AQE coalescing
    // interference and require enough parallelism awareness
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    val li = Tables.lineitem(spark, sf1).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf1).select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_bucketed", buckets = 8, keys = Seq("l_orderkey"))
    Bucketing.writeBucketed(o, "o_bucketed", buckets = 8, keys = Seq("o_orderkey"))
    val joined = Bucketing.table(spark, "li_bucketed")
      .join(Bucketing.table(spark, "o_bucketed"), col("l_orderkey") === col("o_orderkey"))
    assert(!Bucketing.hasShuffle(joined), "co-bucketed join must not reshuffle:\n" +
      joined.queryExecution.executedPlan.toString.take(2000))
    // and it computes the same result as the plain join
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == plain)
  }

  test("aggregation on the bucket key also skips the exchange") {
    val agg = Bucketing.table(spark, "li_bucketed")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
    assert(!Bucketing.hasShuffle(agg))
    assert(agg.count() > 0)
  }
}
