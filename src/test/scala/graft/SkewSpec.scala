package graft

import graft.engine.Skew
import org.apache.spark.sql.functions._

/** Salted-join semantics: salting redistributes hot keys across reducers
  * but must never change the join's result — output equality against the
  * plain equi-join on pathologically skewed data is the whole contract.
  */
class SkewSpec extends SparkSuite {
  import spark.implicits._

  // 10k rows for one hot key, a handful for the rest — the shape where one
  // reducer would receive ~99% of a plain shuffle
  private lazy val big = spark.range(10000).select(lit("hot").as("k"), col("id").as("v"))
    .union(spark.range(50).select(concat(lit("cold"), col("id") % 5).as("k"), col("id").as("v")))
  private lazy val dim = Seq(
    ("hot", "H"), ("cold0", "C0"), ("cold1", "C1"), ("cold2", "C2"),
    ("unmatched", "X")).toDF("k", "label")

  private def multiset(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "v", "label").as[(String, Long, String)]
      .collect().groupBy(identity).view.mapValues(_.length).toMap

  test("salted join output equals the plain equi-join (inner)") {
    val plain = big.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(big, dim, "k", salt = 8)
    assert(multiset(salted) == multiset(plain))
    assert(salted.count() == 10000 + 20 + 10)
  }

  test("salted left join preserves unmatched big-side rows exactly once") {
    val plain = big.join(dim, Seq("k"), "left")
    val salted = Skew.saltedJoin(big, dim, "k", salt = 8, joinType = "left")
    // cold3/cold4 have no dim row; each must survive exactly once with null label
    assert(multiset(salted.na.fill("∅", Seq("label")))
      == multiset(plain.na.fill("∅", Seq("label"))))
  }

  test("salt spreads the hot key across sub-keys") {
    val salts = big.filter(col("k") === "hot")
      .withColumn("__salt", pmod(xxhash64(big.columns.map(col): _*), lit(8)).cast("int"))
      .select(countDistinct(col("__salt"))).as[Long].head()
    assert(salts == 8L, "hot key must occupy every salt bucket")
  }

  test("native as-of join under a pathological hot key: correct, and no pair intermediate") {
    // 5k lefts and 5k rights on ONE key (plus a few cold keys) — the shape
    // where the composed range-join form materializes millions of candidate
    // pairs while the native merge stays O(m+n) per key with one buffered
    // row (measured: 0.7-0.9 s flat vs 241 s composed at the 4x corpus,
    // SCALE.md "as-of hot key" table). AQE skew-join splitting does NOT
    // apply to custom nodes, so output equality against the composed form
    // on exactly this shape is the correctness half of the claim.
    val lefts = spark.range(5000)
      .select(lit(0L).as("k"), (col("id") * 7L).as("t"), col("id").as("lid"))
      .union(spark.range(100).select((col("id") % 5 + 1L).as("k"),
        (col("id") * 7L).as("t"), (col("id") + 100000L).as("lid")))
    val rights = spark.range(5000)
      .select(lit(0L).as("rk"), (col("id") * 3L).as("rt"), col("id").as("rid"))
      .union(spark.range(100).select((col("id") % 5 + 1L).as("rk"),
        (col("id") * 3L).as("rt"), (col("id") + 200000L).as("rid")))
    val native = graft.plans.AsofJoin.join(lefts, rights, Seq("k" -> "rk"),
        "t", "rt", rightTiebreak = Seq("rid"),
        tolerance = Some("0.001 seconds"), inner = true) // 1000 raw-long units
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val composed = lefts.join(rights,
        col("k") === col("rk") && col("rt") <= col("t") &&
          col("rt") >= col("t") - lit(1000L))
      .groupBy(col("lid"))
      .agg(max_by(col("rid"), struct(col("rt"), col("rid"))).as("rid"))
      .as[(Long, Long)].collect().toSet
    assert(native == composed,
      "hot-key native merge must equal the composed range-join + max_by")
    // lefts run to t=34993 but rights stop at t=14997, so only lefts with
    // t ≤ 15997 can match: ~2286 hot-key matches plus the cold keys
    assert(native.size > 2000, s"the hot key must actually match (got ${native.size})")
  }

  // ---- auto-routed as-of: sampled histogram decides plain vs banded ----

  // 20k lefts on ONE key + 1k spread over 50 keys: hot share ~0.95
  private lazy val hotLefts = spark.range(20000)
    .select(lit(0L).as("k"), (col("id") * 7L).as("t"), col("id").as("lid"))
    .union(spark.range(1000).select((col("id") % 50 + 1L).as("k"),
      (col("id") * 7L).as("t"), (col("id") + 100000L).as("lid")))
  private lazy val hotRights = spark.range(20000)
    .select(lit(0L).as("rk"), (col("id") * 3L).as("rt"), col("id").as("rid"))
    .union(spark.range(1000).select((col("id") % 50 + 1L).as("rk"),
      (col("id") * 3L).as("rt"), (col("id") + 200000L).as("rid")))
  // ~400 lefts per key across 50 keys: top share ~1/50
  private lazy val uniformLefts = spark.range(20000)
    .select((col("id") % 50).as("k"), (col("id") * 7L).as("t"), col("id").as("lid"))

  private def keyArity(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collectFirst {
      case a: graft.plans.AsofJoinNode => a.leftKeys.length
    }.getOrElse(fail("no AsofJoinNode in the routed plan"))

  test("hotKeyProbe decision: dominated key bands, uniform keys do not") {
    val hot = graft.plans.AsofJoin.hotKeyProbe(hotLefts, Seq("k"),
      hotShareThreshold = 0.5, minHotRows = 5000L, sampleFraction = 0.5)
    assert(hot.banded, s"95%-one-key must route banded, got $hot")
    assert(hot.hotShare > 0.8 && hot.estHotRows > 10000,
      s"probe must see the dominating key: $hot")
    val uni = graft.plans.AsofJoin.hotKeyProbe(uniformLefts, Seq("k"),
      hotShareThreshold = 0.5, minHotRows = 5000L, sampleFraction = 0.5)
    assert(!uni.banded && uni.hotShare < 0.1,
      s"uniform keys must route plain, got $uni")
    // the share test alone must not band a small-but-dominated input
    val small = graft.plans.AsofJoin.hotKeyProbe(
      hotLefts.limit(100), Seq("k"),
      hotShareThreshold = 0.5, minHotRows = 5000L, sampleFraction = 1.0)
    assert(!small.banded, s"100 hot rows is below minHotRows, got $small")
  }

  test("joinRouted: banded route taken on skew, plain on uniform, outputs equal plain join") {
    def routed(lefts: org.apache.spark.sql.DataFrame) =
      graft.plans.AsofJoin.joinRouted(lefts, hotRights, Seq("k" -> "rk"),
        "t", "rt", rightTiebreak = Seq("rid"),
        tolerance = "0.001 seconds", inner = true, // 1000 raw-long units
        hotShareThreshold = 0.5, minHotRows = 5000L, sampleFraction = 0.5)
    val onHot = routed(hotLefts)
    assert(keyArity(onHot) == 2,
      "skewed input must take the banded route (equi-key + band)")
    val onUniform = routed(uniformLefts)
    assert(keyArity(onUniform) == 1,
      "uniform input must take the plain route (equi-key only)")
    // semantics: the banded route's output is exactly the plain join's
    val plain = graft.plans.AsofJoin.join(hotLefts, hotRights, Seq("k" -> "rk"),
        "t", "rt", rightTiebreak = Seq("rid"),
        tolerance = Some("0.001 seconds"), inner = true)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(onHot.select("lid", "rid").as[(Long, Long)].collect().toSet == plain,
      "auto-banded output must equal the plain native join")
  }

  test("joinRouted memoizes the probe: same left + thresholds re-probe zero jobs") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    // listener delivery is async; the probe's head() is synchronous, so a
    // short settle after each construction is enough to drain the bus
    def settled(): Int = { Thread.sleep(500); jobs.get() }
    def routed() =
      graft.plans.AsofJoin.joinRouted(hotLefts, hotRights, Seq("k" -> "rk"),
        "t", "rt", rightTiebreak = Seq("rid"),
        tolerance = "0.001 seconds", inner = true,
        hotShareThreshold = 0.5, minHotRows = 5000L, sampleFraction = 0.5)
    graft.plans.AsofJoin.clearRouteCache()
    spark.sparkContext.addSparkListener(listener)
    try {
      routed()
      val afterFirst = settled()
      assert(afterFirst >= 1, "first construction after clearRouteCache must run the probe job")
      routed()
      assert(settled() == afterFirst,
        "second construction of the same route must reuse the memoized decision (zero jobs)")
      graft.plans.AsofJoin.clearRouteCache()
      routed()
      assert(settled() > afterFirst, "clearRouteCache must force a fresh probe")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("joinRouted refuses a streaming left side at construction") {
    val streamLeft = {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      MemoryStream[(Long, Long, Long)].toDF().toDF("k", "t", "lid")
    }
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsofJoin.joinRouted(streamLeft, hotRights, Seq("k" -> "rk"),
        "t", "rt", tolerance = "0.001 seconds")
    }
    assert(e.getMessage.contains("streaming"),
      s"the batch-only restriction must fail fast with a clear message, got: ${e.getMessage}")
  }
}
