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

  test("bucketed as-of join plans ZERO exchanges (pre-shuffled feature-store layout)") {
    // The custom exec declares ClusteredDistribution on its keys, so a pair
    // of tables bucketed on those keys with the SAME bucket count satisfies
    // both sides at scan time — the feature-store layout (facts bucketed by
    // entity id) pays no shuffle at all for temporal enrichment, only the
    // per-partition (key, time) sorts. This pins that EnsureRequirements
    // actually elides both exchanges for the custom node, not just for SMJ.
    val ev = Tables.events(spark, sf1)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    Bucketing.writeBucketed(purchases, "asof_buck_l", buckets = 8, keys = Seq("user_id"))
    Bucketing.writeBucketed(clicks, "asof_buck_r", buckets = 8, keys = Seq("c_user_id"))
    val joined = graft.plans.AsofJoin.join(
      Bucketing.table(spark, "asof_buck_l"), Bucketing.table(spark, "asof_buck_r"),
      keys = Seq("user_id" -> "c_user_id"),
      leftTime = "ts", rightTime = "c_ts",
      rightTiebreak = Seq("click_id"),
      tolerance = Some("1 hour"), inner = true)
    assert(joined.queryExecution.executedPlan.toString.contains("AsofJoin"))
    assert(!Bucketing.hasShuffle(joined),
      "co-bucketed as-of join must not reshuffle:\n" +
        joined.queryExecution.executedPlan.toString.take(2000))
    // and it computes exactly the unbucketed operator's result
    val plain = graft.plans.AsofJoin.join(purchases, clicks,
        keys = Seq("user_id" -> "c_user_id"),
        leftTime = "ts", rightTime = "c_ts",
        rightTiebreak = Seq("click_id"),
        tolerance = Some("1 hour"), inner = true)
      .select("event_id", "click_id").collect().map(_.toSeq).toSet
    assert(joined.select("event_id", "click_id").collect().map(_.toSeq).toSet == plain)
  }
}
