package graft.queries

import graft.engine.{Bucketing, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational/analytic coverage beyond the reference's surface (SURVEY.md
  * §2.10 honest non-goals, supplied by Spark built-ins): ordered top-k per
  * group, set operations, rollup/grouping sets, distinct aggregation, and
  * TPC-H-style join/aggregate headline queries used by the benchmark.
  *
  * Scale notes per query are on each member; the common themes: broadcast
  * the dimension side of every fact join, let partial aggregation run
  * map-side, and keep money math in DECIMAL(18,2) for bit-exact parity.
  */
object AnalyticsQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** Exact discounted price: both factors go to decimal BEFORE multiplying,
    * so the product is exact decimal arithmetic — rounding a double product
    * to decimal differs between engines (HALF_UP vs half-even).
    */
  private def discPrice =
    dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(9, 4)) - col("l_discount").cast(DecimalType(9, 4)))

  private val discPriceSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(9,4)))"

  /** TPC-H Q1-style pricing summary over lineitem: one shuffle (partial +
    * final hash agg), all expressions codegen'd. The fact scan prunes to the
    * 6 referenced columns (check ReadSchema).
    */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Top-3 orders per customer by value — window ranking with deterministic
    * tie-break. At scale: single hash exchange on o_custkey; AQE handles
    * skewed customers; rank ≤ k lets Spark run a partial top-k sort.
    */
  def topkOrdersPerCust(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  val topkOrdersPerCustSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders)
      |WHERE rn <= 3""".stripMargin

  /** Top-k per group WITHOUT a window sort ([[graft.functions.TopKOrders]]):
    * a bounded-k aggregation buffer gives map-side partial aggregation, so
    * the shuffle carries ≤ k rows per (partition, group) instead of every
    * order row — the plan you want when the fact table is 100 TB. Shares
    * the window form's oracle verbatim (output equality is the contract).
    */
  def topkOrdersHeap(spark: SparkSession, dir: String): DataFrame = {
    val tk = udaf(new graft.functions.TopKOrders(3))
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(tk(col("o_orderkey"), col("o_totalprice")).as("top"))
      .select(col("o_custkey"), explode(col("top")).as("t"))
      .select(col("o_custkey"), col("t.o_orderkey").as("o_orderkey"),
        col("t.o_totalprice").as("o_totalprice"), col("t.rn").as("rn"))
  }

  val topkOrdersHeapSql: String = topkOrdersPerCustSql

  /** Revenue by market segment: lineitem ⋈ orders ⋈ broadcast(customer).
    * The two fact tables shuffle on orderkey once; the 150-row customer dim
    * is broadcast so no extra exchange. Distinct order count is exact.
    */
  def revenueBySegment(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), discPrice.as("rev"))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("rev")).cast("double").as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
  }

  val revenueBySegmentSql: String =
    """SELECT c_mktsegment,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE) AS revenue,
      |  count(DISTINCT o_orderkey) AS n_orders
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  /** Set operations (INTERSECT / EXCEPT): users who both clicked and
    * purchased, and users who clicked but never purchased, tagged and
    * unioned. Spark plans these as aggregates + semi/anti joins.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clickers = ev.filter(col("event_type") === "click").select("user_id").distinct()
    val buyers = ev.filter(col("event_type") === "purchase").select("user_id").distinct()
    clickers.intersect(buyers).withColumn("tag", lit("click_and_buy"))
      .unionByName(clickers.except(buyers).withColumn("tag", lit("click_only")))
  }

  val setOpsSql: String =
    """SELECT user_id, 'click_and_buy' AS tag FROM (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
      |  INTERSECT
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
      |UNION ALL
      |SELECT user_id, 'click_only' AS tag FROM (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
      |  EXCEPT
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')""".stripMargin

  /** ROLLUP with grouping id — subtotal lattice in one pass (Spark expands
    * to a single Expand + aggregation, not N scans).
    */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_extendedprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))

  val rollupRevenueSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n,
      |  GROUPING(l_returnflag, l_linestatus) AS gid
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  /** CUBE over both grouping dimensions (A7) — full subtotal lattice in one
    * Expand + aggregation pass.
    */
  def cubeRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))

  val cubeRevenueSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n,
      |  GROUPING(l_returnflag, l_linestatus) AS gid
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin

  /** Approximate distinct (A6): HyperLogLog++ sketch, made driver-checkable
    * despite engine-specific sketch values by hashing the ERROR ENVELOPE
    * instead of the estimate (the `ann_recall_eval` pattern): the exact
    * count rides along from the same aggregation pass, and the output is
    * the boolean "estimate within the sketch's configured 5% rsd", which
    * the oracle asserts as `true` per group. `distinct_users` carries the
    * plain exact twin, `approx_distinct_kmv` a bit-portable sketch.
    */
  def approxDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      // 3σ envelope, not 1σ: HLL++ at rsd = 0.05 EXPECTS ~1/3 of dense-mode
      // groups beyond one relative standard deviation — a 5% bound would
      // pass only by luck of the current fixtures and flake on any
      // regeneration. 15% keeps the check meaningful (a broken sketch is
      // off by far more) without asserting statistical luck.
      .select(col("event_type"), col("n_events"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users"))
          <= col("exact_users") * lit(0.15)).as("within_tol"))

  val approxDistinctUsersSql: String =
    """SELECT event_type, count(*) AS n_events,
      |       count(DISTINCT user_id) AS exact_users,
      |       true AS within_tol
      |FROM events GROUP BY 1""".stripMargin

  /** Engine-portable approximate distinct: a K-Minimum-Values sketch over
    * md5-derived 60-bit hashes. Unlike HLL (engine-specific register
    * layout — `approx_distinct_users` stays rows-only), KMV is pure order
    * statistics: the estimate is (k−1)·2⁶⁰ / (kth smallest distinct hash),
    * exact count when a group has fewer than k distinct values — so the
    * DuckDB oracle replays the whole sketch bit-for-bit.
    *
    * Scale: ONE hash aggregation with a bounded buffer
    * ([[graft.functions.KmvEstimate]]) — map-side combine reduces every
    * partition to ≤ k hashes per group before the shuffle, no distinct
    * stage, no per-group sort: the exchange carries k·groups longs total.
    */
  private val kmvK = 32

  def approxDistinctKmv(spark: SparkSession, dir: String): DataFrame = {
    val kmv = udaf(new graft.functions.KmvEstimate(kmvK))
    Tables.events(spark, dir)
      .select(col("event_type"),
        graft.engine.PortableHash.md5Long(col("user_id").cast("string")).as("h"))
      .groupBy(col("event_type"))
      .agg(kmv(col("h")).as("est_users"))
  }

  val approxDistinctKmvSql: String =
    s"""WITH h AS (SELECT DISTINCT event_type,
       |  ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h FROM events),
       |r AS (SELECT event_type, h,
       |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
       |kth AS (SELECT event_type, h AS m FROM r WHERE rn = $kmvK),
       |c AS (SELECT event_type, count(*) AS nd FROM h GROUP BY 1)
       |SELECT c.event_type,
       |  CASE WHEN c.nd < $kmvK THEN c.nd
       |       ELSE CAST(floor(${kmvK - 1}.0 * 1152921504606846976.0 / kth.m) AS BIGINT)
       |  END AS est_users
       |FROM c LEFT JOIN kth USING (event_type)""".stripMargin

  // ----------------------------------------------------- kmv_union_daily
  /** Tiered sketch rollup — the pre-aggregation pattern that makes
    * distinct counting cheap at 100 TB: each (event_type, day) keeps a KMV
    * sketch ([[graft.functions.KmvSketch]], ≤ k hashes), and the weekly /
    * all-time estimate MERGES STORED SKETCHES
    * ([[graft.functions.KmvMergeEstimate]]) instead of rescanning raw
    * events. K-min-of-k-mins equals the k-min of the union, so the tiered
    * estimate is bit-identical to a flat sketch — the oracle replays both
    * tiers and checks the estimate against the exact count it also
    * computes. Exchanges: one partial-aggregated daily pass (≤ k longs per
    * group-day cross the wire), then a group-count-sized sketch merge.
    */
  def kmvUnionDaily(spark: SparkSession, dir: String): DataFrame = {
    val sketch = udaf(new graft.functions.KmvSketch(kmvK))
    val mergeEst = udaf(new graft.functions.KmvMergeEstimate(kmvK))
    val ev = Tables.events(spark, dir)
    val daily = ev
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        graft.engine.PortableHash.md5Long(col("user_id").cast("string")).as("h"))
      .groupBy(col("event_type"), col("day"))
      .agg(sketch(col("h")).as("sk"))
    val rolled = daily.groupBy(col("event_type"))
      .agg(mergeEst(col("sk")).as("est_users"), count(lit(1)).as("days"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    rolled.join(exact, "event_type")
      .select(col("event_type"), col("days"), col("est_users"), col("n_users"))
  }

  val kmvUnionDailySql: String =
    s"""WITH h AS (SELECT DISTINCT event_type, strftime(ts, '%Y-%m-%d') AS day,
       |  ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h FROM events),
       |rd AS (SELECT event_type, day, h,
       |       row_number() OVER (PARTITION BY event_type, day ORDER BY h) AS rn FROM h),
       |u AS (SELECT DISTINCT event_type, h FROM rd WHERE rn <= $kmvK),
       |r AS (SELECT event_type, h,
       |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM u),
       |kth AS (SELECT event_type, h AS m FROM r WHERE rn = $kmvK),
       |c AS (SELECT event_type, count(*) AS nd FROM u GROUP BY 1),
       |d AS (SELECT event_type, count(DISTINCT day) AS days FROM h GROUP BY 1),
       |x AS (SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY 1)
       |SELECT c.event_type, d.days,
       |  CASE WHEN c.nd < $kmvK THEN c.nd
       |       ELSE CAST(floor(${kmvK - 1}.0 * 1152921504606846976.0 / kth.m) AS BIGINT)
       |  END AS est_users, x.n_users
       |FROM c LEFT JOIN kth USING (event_type)
       |JOIN d USING (event_type) JOIN x USING (event_type)""".stripMargin

  // ---------------------------------------------- approx_quantiles_sample
  /** Mergeable quantile sketch — the order-statistics member of the
    * portable sketch family ([[graft.functions.BottomKSample]]; KMV covers
    * distinct, CMS covers heavy hitters). A bottom-k-by-hash sample is a
    * uniform random sample with NO RNG, so per-day tier sketches merge
    * losslessly (k-min-of-k-mins = k-min of the union — KMV's theorem,
    * value-carrying form) and the whole pipeline is deterministic enough
    * for DuckDB to replay bit-for-bit: the oracle computes the FLAT
    * bottom-k sample while Spark computes through daily tiers, so the
    * hash match doubles as the tiering-equivalence proof.
    *
    * Estimates are empirical quantiles of the sample (integer rank
    * selection, ⌈p·m⌉); the exact pass joins back in to verify the DKW
    * envelope (ε ≈ 6% at k = 512) as hash-checked booleans — the
    * `ann_recall_eval` / `approx_distinct_users` accuracy-oracle pattern.
    *
    * Scale: the daily tier bounds every partition's shuffle contribution
    * to ≤ k pairs per (type, day); the merge moves tier-count·k pairs;
    * the envelope pass is one conditional aggregate over a broadcast of
    * |groups| rows. At 100 TB you store the daily sketches and skip the
    * raw rescan entirely — the envelope join here exists to let the
    * driver VERIFY the sketch, not as part of the production read path.
    */
  private val sampleK = 512

  /** The tier input projection: one row per event with its sampling hash,
    * integer-cents value, and tier day — shared by the batch query and the
    * streaming parity ingest ([[StreamParity]]).
    */
  def quantileTierInput(events: DataFrame): DataFrame = events
    .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
      floor(col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"),
      graft.engine.PortableHash.md5Long(col("event_id").cast("string")).as("h"))

  /** The per-(type, day) tier sketch aggregation. Order-independent
    * (bottom-k is a commutative monoid), so a streaming incremental
    * execution converges to the identical tier table.
    */
  def quantileTiers(tierInput: DataFrame): DataFrame = {
    val sketch = udaf(new graft.functions.BottomKSketch(sampleK))
    tierInput.groupBy(col("event_type"), col("day"))
      .agg(sketch(col("h"), col("cents")).as("sk"))
  }

  /** Everything downstream of the stored tiers: merge to the flat sample,
    * integer rank selection, and the exact-rank DKW envelope join against
    * the batch events table. Factored out so the streaming parity row can
    * apply it per micro-batch to the converged tier table (the
    * materialized-view-sink pattern).
    */
  def quantileReadout(spark: SparkSession, dir: String)(tiers: DataFrame): DataFrame = {
    val mergeSample = udaf(new graft.functions.BottomKMergeSample(sampleK))
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(dec(col("value")) * 100).cast("long").as("cents"))
    val ests = tiers.groupBy(col("event_type"))
      .agg(mergeSample(col("sk")).as("sample"), count(lit(1)).as("days"))
      .withColumn("m", size(col("sample")).cast("long"))
      .withColumn("p25_est", expr(
        "element_at(sample, cast(greatest(1L, (25*m+99) div 100) as int))"))
      .withColumn("p50_est", expr(
        "element_at(sample, cast(greatest(1L, (50*m+99) div 100) as int))"))
      .withColumn("p75_est", expr(
        "element_at(sample, cast(greatest(1L, (75*m+99) div 100) as int))"))
      .drop("sample")
    ev.join(broadcast(ests), "event_type")
      .groupBy(col("event_type"), col("days"), col("m"),
        col("p25_est"), col("p50_est"), col("p75_est"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("cents") <= col("p25_est"), 1L).otherwise(0L)).as("le25"),
        sum(when(col("cents") <= col("p50_est"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("cents") <= col("p75_est"), 1L).otherwise(0L)).as("le75"))
      .select(col("event_type"), col("n_events"), col("days"), col("m"),
        col("p25_est"), col("p50_est"), col("p75_est"),
        expr("abs((le25 * 10000) div n_events - 2500) <= 1000").as("p25_ok"),
        expr("abs((le50 * 10000) div n_events - 5000) <= 1000").as("p50_ok"),
        expr("abs((le75 * 10000) div n_events - 7500) <= 1000").as("p75_ok"))
  }

  def approxQuantilesSample(spark: SparkSession, dir: String): DataFrame =
    quantileReadout(spark, dir)(
      quantileTiers(quantileTierInput(Tables.events(spark, dir))))

  val approxQuantilesSampleSql: String =
    s"""WITH ev AS (SELECT event_type,
       |      CAST(FLOOR(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents,
       |      ('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT AS h,
       |      strftime(ts, '%Y-%m-%d') AS day
       |    FROM events),
       |r AS (SELECT event_type, cents,
       |      row_number() OVER (PARTITION BY event_type ORDER BY h, cents) AS rn
       |    FROM ev),
       |s AS (SELECT event_type, cents FROM r WHERE rn <= $sampleK),
       |sz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS m FROM s GROUP BY 1),
       |v AS (SELECT event_type, cents,
       |      row_number() OVER (PARTITION BY event_type ORDER BY cents) AS vr FROM s),
       |est AS (SELECT v.event_type, m,
       |      max(CASE WHEN vr = GREATEST(1, (25*m+99) // 100) THEN cents END) AS p25_est,
       |      max(CASE WHEN vr = GREATEST(1, (50*m+99) // 100) THEN cents END) AS p50_est,
       |      max(CASE WHEN vr = GREATEST(1, (75*m+99) // 100) THEN cents END) AS p75_est
       |    FROM v JOIN sz ON v.event_type = sz.event_type GROUP BY 1, 2),
       |d AS (SELECT event_type, count(DISTINCT day) AS days FROM ev GROUP BY 1)
       |SELECT ev.event_type, count(*) AS n_events, d.days, est.m,
       |       est.p25_est, est.p50_est, est.p75_est,
       |       abs(CAST(SUM(CASE WHEN cents <= p25_est THEN 1 ELSE 0 END) * 10000
       |            // count(*) AS BIGINT) - 2500) <= 1000 AS p25_ok,
       |       abs(CAST(SUM(CASE WHEN cents <= p50_est THEN 1 ELSE 0 END) * 10000
       |            // count(*) AS BIGINT) - 5000) <= 1000 AS p50_ok,
       |       abs(CAST(SUM(CASE WHEN cents <= p75_est THEN 1 ELSE 0 END) * 10000
       |            // count(*) AS BIGINT) - 7500) <= 1000 AS p75_ok
       |FROM ev JOIN est ON ev.event_type = est.event_type
       |JOIN d ON ev.event_type = d.event_type
       |GROUP BY ev.event_type, d.days, est.m, est.p25_est, est.p50_est, est.p75_est""".stripMargin

  // ------------------------------------------------------------ auc_ranking
  /** Exact ROC-AUC of a score against a binary label (does event value
    * separate purchases from other events?) via the Mann–Whitney rank-sum
    * identity AUC = U / (n⁺·n⁻) — the standard ranking-quality eval for
    * scorers, recommenders, and quality filters.
    *
    * Scale shape: NO global sort of raw rows and no unpartitioned window.
    * Events collapse map-side to the (score-cents, n, n⁺) histogram; the
    * global rank prefix runs over that value-domain relation with
    * [[graft.engine.Prefix.exclusiveCumsum]] (range-partitioned two-pass),
    * and ties use exact integer midranks doubled to stay integral:
    * 2·midrank(v) = 2·cum_before(v) + n(v) + 1, so
    * U·2 = Σ n⁺(v)·(2·cum_before + n + 1) − n⁺·(n⁺+1) with zero floats
    * anywhere. AUC surfaces in basis points by integer division.
    */
  def aucRanking(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.events(spark, dir)
      .select(floor(dec(col("value")) * 100).cast("long").as("cents"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      .groupBy(col("cents"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("np"))
    // rank-sum terms in DECIMAL(38,0): a single row's np·(2·cum+n+1) is
    // O(N²) and the ×10000 numerator O(N²·10⁴) — past signed-64 around a
    // billion balanced rows, where DuckDB's HUGEINT pipeline would keep
    // going and the engines would diverge. 38 exact digits cover 1e38;
    // `div` on decimals yields BIGINT, so only in-range values surface.
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    graft.engine.Prefix.exclusiveCumsum(hist, Seq(col("cents")), col("n"), "cum_before")
      .agg(sum(col("np")).as("n_pos"),
        sum(col("n") - col("np")).as("n_neg"),
        sum(col("np").cast(d38) * (col("cum_before") * 2 + col("n") + 1)).as("s2"))
      .select(col("n_pos"), col("n_neg"),
        expr("((s2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)) * 10000) " +
          "div (CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg)")
          .as("auc_bp"))
  }

  val aucRankingSql: String =
    """WITH ev AS (SELECT
      |      CAST(FLOOR(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents,
      |      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      |    FROM events),
      |h AS (SELECT cents, count(*) AS n, CAST(SUM(pos) AS BIGINT) AS np
      |      FROM ev GROUP BY 1),
      |p AS (SELECT *, COALESCE(SUM(n) OVER (ORDER BY cents
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      |      FROM h),
      |a AS (SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
      |             CAST(SUM(n - np) AS BIGINT) AS n_neg,
      |             SUM(np::HUGEINT * (2 * cum_before + n + 1)) AS s2
      |      FROM p)
      |SELECT n_pos, n_neg,
      |       CAST((s2 - n_pos::HUGEINT * (n_pos + 1)) * 10000
      |            // (2 * n_pos::HUGEINT * n_neg) AS BIGINT) AS auc_bp
      |FROM a""".stripMargin

  // ----------------------------------------------------------- lift_deciles
  /** Exact cumulative-gains / lift table over score deciles — AUC's
    * ([[aucRanking]]) operational companion: "the top 10% of scores
    * captures X% of purchases at Y× random". Same scale shape: the raw
    * events collapse to the (score-cents, n, n⁺) histogram, the
    * descending-rank prefix runs on [[graft.engine.Prefix]], and decile
    * membership is computed by INTERVAL OVERLAP — each histogram row
    * occupies rank positions (cum_before, cum_before+n], and its overlap
    * with decile d's position range ((d−1)·N÷10, d·N÷10] is pure integer
    * min/max, so tie groups split across boundaries EXACTLY. Within a tie
    * group, negatives order first (documented pessimistic-gains
    * convention; both engines replay it, and it makes the table a pure
    * function of the data rather than of row order).
    *
    * The final cumulative pass windows over the 10 decile rows — a
    * constant-domain window, not a data-sized one. Ratios stay in basis
    * points via division of already-reduced terms (gain_bp·10⁴ ÷ rows_bp)
    * so no product ever exceeds 10⁸× a row count — overflow-safe at any
    * scale, unlike the naive cum_pos·N cross-multiplication.
    */
  def liftDeciles(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.events(spark, dir)
      .select(floor(dec(col("value")) * 100).cast("long").as("cents"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      .groupBy(col("cents"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("np"))
    val pref = graft.engine.Prefix
      .exclusiveCumsum(hist, Seq((-col("cents")).as("ord")), col("n"), "c")
    val totals = pref.agg(sum(col("n")).as("tot"), sum(col("np")).as("totp"))
    val perDecile = pref.crossJoin(broadcast(totals))
      .select(col("c"), col("n"), col("np"), col("tot"), col("totp"),
        explode(sequence(lit(1), lit(10))).as("decile"))
      .select(col("decile"), col("tot"), col("totp"),
        // decile d covers rank positions ((d-1)*tot div 10, d*tot div 10]
        expr("greatest(0, least((decile * tot) div 10, c + n) " +
          "- greatest(((decile - 1) * tot) div 10 + 1, c + 1) + 1)").as("o_rows"),
        // ties pessimistic: the row's positives sit at its HIGH rank end
        expr("greatest(0, least((decile * tot) div 10, c + n) " +
          "- greatest(((decile - 1) * tot) div 10 + 1, c + n - np + 1) + 1)").as("o_pos"))
      .groupBy(col("decile"), col("tot"), col("totp"))
      .agg(sum(col("o_rows")).as("n_rows"), sum(col("o_pos")).as("n_pos"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("decile")) // 10-row constant domain
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    perDecile
      .withColumn("cum_rows", sum(col("n_rows")).over(w))
      .withColumn("cum_pos", sum(col("n_pos")).over(w))
      .select(col("decile").cast("long").as("decile"),
        col("n_rows"), col("n_pos"), col("cum_rows"), col("cum_pos"),
        expr("(cum_pos * 10000) div totp").as("gain_bp"),
        expr("((cum_pos * 10000 div totp) * 10000) div ((cum_rows * 10000) div tot)")
          .as("lift_bp"))
  }

  val liftDecilesSql: String =
    """WITH ev AS (SELECT
      |      CAST(FLOOR(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents,
      |      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      |    FROM events),
      |h AS (SELECT cents, count(*) AS n, CAST(SUM(pos) AS BIGINT) AS np
      |      FROM ev GROUP BY 1),
      |p AS (SELECT *, COALESCE(SUM(n) OVER (ORDER BY cents DESC
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
      |      FROM h),
      |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot, CAST(SUM(np) AS BIGINT) AS totp FROM h),
      |x AS (SELECT d.decile, t.tot, t.totp,
      |        greatest(0, least((d.decile * t.tot) // 10, c + n)
      |          - greatest(((d.decile - 1) * t.tot) // 10 + 1, c + 1) + 1) AS o_rows,
      |        greatest(0, least((d.decile * t.tot) // 10, c + n)
      |          - greatest(((d.decile - 1) * t.tot) // 10 + 1, c + n - np + 1) + 1) AS o_pos
      |      FROM p CROSS JOIN t
      |      CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS decile) d),
      |g AS (SELECT decile, tot, totp,
      |        CAST(SUM(o_rows) AS BIGINT) AS n_rows,
      |        CAST(SUM(o_pos) AS BIGINT) AS n_pos
      |      FROM x GROUP BY 1, 2, 3),
      |cum AS (SELECT *,
      |        CAST(SUM(n_rows) OVER (ORDER BY decile) AS BIGINT) AS cum_rows,
      |        CAST(SUM(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos
      |      FROM g)
      |SELECT CAST(decile AS BIGINT) AS decile, n_rows, n_pos, cum_rows, cum_pos,
      |       CAST((cum_pos * 10000) // totp AS BIGINT) AS gain_bp,
      |       CAST(((cum_pos * 10000 // totp) * 10000) // ((cum_rows * 10000) // tot)
      |            AS BIGINT) AS lift_bp
      |FROM cum""".stripMargin

  /** Exact distinct-count per group (dropDuplicates/approx_count_distinct
    * family; the HLL variant is benchmarked but not oracled — sketches are
    * engine-specific).
    */
  def distinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))

  val distinctUsersSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
      |FROM events GROUP BY event_type""".stripMargin

  /** Hot-key salting under the oracle ([[graft.engine.Skew.saltedJoin]]):
    * the orders→customer join runs with the fact side salted into 8
    * sub-keys and the dimension replicated 8× — the manual skew-mitigation
    * path for when AQE cannot split a pathological key. Salting must never
    * change semantics, so the oracle is simply the PLAIN join's SQL: a
    * hash mismatch here means the salt leaked into the result.
    */
  /** Co-located fact⋈fact join via bucketed storage
    * ([[graft.engine.Bucketing]]) — the durable pre-shuffle that makes the
    * 100 TB lineitem⋈orders join exchange-free: both tables are written
    * hash-clustered into the same bucket count on the join key, so the
    * sort-merge join reads co-located buckets directly. The ONLY exchange
    * in this plan is the final priority rollup (PlansSpec asserts exactly
    * one) — the join itself never shuffles, which at fact-table scale is
    * the difference between moving terabytes and moving a summary. Batch
    * analogue of Kafka's co-partitioned topics (JoinsExample relies on
    * identical topic partitioning; buckets make that contract storage-
    * durable). The oracle is the plain join — bucketing must never change
    * results, only placement.
    */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    // table names scoped per process + source dir (the partitionPrunedScan
    // rule): fixed names in the shared warehouse dir would let a concurrent
    // driver's DROP+rewrite race this one's join mid-read, or worse, feed
    // it rows from a different scale factor
    val scope = s"p${ProcessHandle.current().pid()}_" +
      graft.engine.PortableHash.md5LongScala(dir).toHexString.take(8)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
      s"b_lineitem_$scope", 8, Seq("l_orderkey"))
    Bucketing.writeBucketed(
      Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderpriority")),
      s"b_orders_$scope", 8, Seq("o_orderkey"))
    Bucketing.table(spark, s"b_lineitem_$scope")
      .join(Bucketing.table(spark, s"b_orders_$scope"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(discPrice).cast("double").as("revenue"))
  }

  val bucketedJoinSql: String =
    s"""SELECT o_orderpriority, count(*) AS n_items,
       |       CAST(SUM($discPriceSql) AS DOUBLE) AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority""".stripMargin

  def skewSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    graft.engine.Skew.saltedJoin(orders, cust, "custkey", salt = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
  }

  val skewSaltedJoinSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  /** FULL OUTER join over two keyed aggregates: high-value clickers vs
    * high-value purchasers per user — rows survive with nulls on EITHER
    * side (25 click-only + 16 purchase-only users at sf0.01), the
    * defensive join shape for reconciling two feeds whose key sets only
    * partly overlap. `Seq("user_id")` using-column form coalesces the key
    * on both engines. Plans as one sort-merge (or AQE-broadcast) join —
    * full-outer cannot broadcast-hash in Spark, which is exactly the
    * right constraint at scale (both sides may carry unmatched keys).
    */
  def fullOuterActivity(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click" && col("value") >= 97)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_hot_clicks"))
    val buys = ev.filter(col("event_type") === "purchase" && col("value") >= 97)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_hot_buys"),
        sum(dec(col("value"))).cast("double").as("hot_spend"))
    clicks.join(buys, Seq("user_id"), "full_outer")
  }

  val fullOuterActivitySql: String =
    """WITH c AS (SELECT user_id, count(*) AS n_hot_clicks FROM events
      |           WHERE event_type = 'click' AND value >= 97 GROUP BY 1),
      |p AS (SELECT user_id, count(*) AS n_hot_buys,
      |             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hot_spend
      |      FROM events WHERE event_type = 'purchase' AND value >= 97 GROUP BY 1)
      |SELECT user_id, n_hot_clicks, n_hot_buys, hot_spend
      |FROM c FULL OUTER JOIN p USING (user_id)""".stripMargin

  /** Per-source contribution cap — the training-data guard against one
    * crawl dump dominating the corpus: keep a deterministic fixed-size
    * sample per source, ranked by an md5 hash (uniform, reproducible
    * across engines/re-runs, no rand()). One hash exchange on source +
    * per-partition sort; for pathological single-source skew the
    * bounded-heap aggregator (`topk_orders_heap` pattern) is the same
    * semantics without the full sort.
    */
  def samplePerSource(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.PortableHash
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      .orderBy(PortableHash.md5Long(
        concat(lit("cap:"), col("doc_id").cast("string"))), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("source"), col("doc_id"), col("rn"))
  }

  val samplePerSourceSql: String =
    """SELECT source, doc_id, rn FROM (
      |  SELECT source, doc_id,
      |         row_number() OVER (PARTITION BY source
      |           ORDER BY (('0x' || substr(md5('cap:' || doc_id::VARCHAR), 1, 15))::BIGINT),
      |                    doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 10""".stripMargin

  /** Single-scan table profiling (the ANALYZE/data-quality summary every
    * pipeline runs before training): per column — non-null count, distinct
    * count, min, max — computed in ONE aggregation over one scan, then
    * unpivoted to rows with `stack` (a projection, not a shuffle).
    * Min/max/counts involve no float accumulation, so doubles are
    * hash-safe here. At scale this is the cheapest possible shape: one
    * partial+final agg; count(DISTINCT) rewrites to an expand+two-phase
    * agg, still linear.
    */
  def tableProfile(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val aggs = count(lit(1)).as("n") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}_nn"),
      countDistinct(col(c)).as(s"${c}_nd"),
      min(col(c)).cast("double").as(s"${c}_min"),
      max(col(c)).cast("double").as(s"${c}_max")))
    val stackArgs = cols.map(c =>
      s"'$c', n - ${c}_nn, ${c}_nd, ${c}_min, ${c}_max").mkString(", ")
    Tables.lineitem(spark, dir)
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.size}, $stackArgs) " +
        "AS (column_name, n_null, n_distinct, min_v, max_v)")
  }

  val tableProfileSql: String = {
    def arm(c: String) =
      s"""SELECT '$c' AS column_name, n - ${c}_nn AS n_null, ${c}_nd AS n_distinct,
         |       ${c}_min AS min_v, ${c}_max AS max_v FROM a""".stripMargin
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val aggs = cols.map(c =>
      s"""count($c) AS ${c}_nn, count(DISTINCT $c) AS ${c}_nd,
         |  CAST(min($c) AS DOUBLE) AS ${c}_min, CAST(max($c) AS DOUBLE) AS ${c}_max""".stripMargin)
      .mkString(",\n  ")
    s"""WITH a AS (SELECT count(*) AS n,
       |  $aggs
       |  FROM lineitem)
       |${cols.map(arm).mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** Pivoted revenue matrix (order priority × status). `pivot` with an
    * EXPLICIT value list: omitting the values makes Spark run a hidden
    * distinct-scan job at PLAN time to discover them — a driver action
    * before the query even starts, and non-deterministic column sets under
    * data drift. With values given, the pivot compiles to one groupBy with
    * conditional aggregates (exactly the oracle's CASE form) — a single
    * map-side-combined shuffle, no surprises at any scale.
    */
  def pivotRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(dec(col("o_totalprice"))).cast("double"))

  val pivotRevenueSql: String = {
    def cell(s: String) =
      s"""CAST(SUM(CASE WHEN o_orderstatus = '$s'
         |         THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "$s"""".stripMargin
    s"""SELECT o_orderpriority, ${cell("F")}, ${cell("O")}, ${cell("P")}
       |FROM orders GROUP BY o_orderpriority""".stripMargin
  }

  /** The inverse surface: `unpivot` (melt) — a wide per-event-type
    * aggregate (events, users, cents) folded to (event_type, metric,
    * value) long form. Spark compiles unpivot to an Expand (each input row
    * emitted once per metric) over the 5-row aggregate — constant-size, no
    * shuffle beyond the aggregation's own; the same operator applied
    * BEFORE aggregation is the standard wide→long normalization for
    * metric-store ingestion, and it stays a projection-only Expand at any
    * scale. All three measures cast to BIGINT: unpivot requires a common
    * value type, and integer metrics keep the oracle engine-exact.
    */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(floor(dec(col("value")) * 100).cast("long")).as("sum_cents"))
      .unpivot(Array(col("event_type")),
        Array(col("n_events"), col("n_users"), col("sum_cents")),
        "metric", "value")

  val unpivotMetricsSql: String =
    """WITH a AS (SELECT event_type, count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users,
      |  CAST(SUM(CAST(FLOOR(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |  FROM events GROUP BY 1)
      |SELECT event_type, 'n_events' AS metric, n_events AS value FROM a
      |UNION ALL
      |SELECT event_type, 'n_users' AS metric, n_users AS value FROM a
      |UNION ALL
      |SELECT event_type, 'sum_cents' AS metric, sum_cents AS value FROM a""".stripMargin

  /** Linear recursion surface: `WITH RECURSIVE` (Spark 4's recursive CTE
    * execution — the UnionLoop operator) walking each customer's order
    * chain in succession order, folding an ORDER-SENSITIVE feature (max
    * gap in days between consecutive orders) that a plain aggregate cannot
    * express without the walk. The ranked relation is computed ONCE
    * (persisted temp view) — left inline, the loop would recompute the
    * window per iteration; iteration count = max chain length (≤ 25 on
    * the fixtures, bounded by orders-per-customer, under Spark's
    * 100-level default). The running-cents fold arriving at each chain's
    * total is the self-check that the walk visited every link exactly
    * once; DuckDB evaluates the SAME recursion as the oracle. The loop
    * body plans a CO-PARTITIONED SHUFFLE JOIN against the persisted
    * ranked cache, which the rank window already leaves hash-clustered by
    * o_custkey — round 4 carried an unconditional `BROADCAST(r)` hint
    * here on the assumption that it spared per-iteration exchanges, but
    * regime measurement (ScaleProbe `chain=hint|nohint`, SCALE.md) shows
    * the hint LOSES at every scale: rebuilding and shipping the ranked
    * relation's broadcast hashmap on each of ~25 iterations costs more
    * than the shuffle it avoids (1×: 6.3 vs 5.3 s; 16×: 55 vs 21 s
    * walk-only), and at fact-table scale it is an outright OOM/8 GB-cap
    * hazard. So the production path is hint-free — scale-safe AND faster;
    * [[orderChainWalk]] keeps the hinted regime reachable for the probe
    * and the PlansSpec pin. Wall time is dominated by the
    * iteration-scheduling floor (~0.3 s × max-chain-length), which is
    * exactly why cyclic/deep closure belongs to the Pregel family, not
    * this surface. UNION ALL
    * recursion only (Spark 4.1 rejects UNION-dedup loops), so this shape
    * is for ACYCLIC succession relations — cyclic closure stays with the
    * bounded-round Pregel family (`graph_bfs`, `dup_clusters`), which also
    * scales better: the CTE loop cannot checkpoint between iterations.
    */
  def orderChainCte(spark: SparkSession, dir: String): DataFrame = {
    // Child session scope (review finding): orderChainRanked may raise the
    // recursion row limit — sized from this walk's known emission — and
    // that must not weaken the non-termination safety valve for unrelated
    // recursive queries on the caller's session. The temp view and conf
    // raise live on the child; the persisted cache is shared-state, so the
    // caller's clearCache() still reclaims it.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions",
      spark.conf.get("spark.sql.shuffle.partitions"))
    // the cache is registered under the CALLER's session (owner = spark):
    // the child exists only for the conf raise, and the caller's
    // releaseAll boundary must reclaim this query's persist
    orderChainRanked(ss, dir, owner = spark)
    orderChainWalk(ss, broadcastProbe = false)
  }

  /** Builds, persists, and registers the `graft_orders_ranked` view;
    * returns its EXACT row count (which materializes the cache — the loop
    * would anyway — and is the gate probe: a real count, not a stats
    * estimate, so the broadcast decision can't be wrong-sided by missing
    * statistics). Split out so ScaleProbe can time the walk regimes
    * without re-timing the ranking. */
  private[graft] def orderChainRanked(spark: SparkSession, dir: String,
                                      owner: SparkSession = null): Long = {
    val ranked = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("long").as("od_s"),
        floor(dec(col("o_totalprice")) * 100).cast("long").as("cents"))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("od_s"), col("o_orderkey"))))
      // the rank window's own exchange leaves this cache hash-clustered
      // by o_custkey (verified in-plan: exactly one Exchange, the window's)
      // — when the gate withholds the broadcast hint, loop iterations
      // probe an already-key-partitioned cache, not raw orders
      .transform(df => graft.engine.QueryCaches.registered(
        df, if (owner != null) owner else spark))
    ranked.createOrReplaceTempView("graft_orders_ranked")
    val n = ranked.count()
    // The recursion ROW limit is a safety valve against non-terminating
    // loops, not a capacity setting — and this walk's total emission is
    // exactly |ranked| rows by construction (each order visited once), so
    // the right bound is known a priori. Below the 1M default the default
    // stands; above it the limit is raised to 2x the known emission
    // (measured: 16x-scaled orders = 2.4M rows tripped the default —
    // a correctness failure masquerading as a tuning knob).
    if (2 * n > spark.conf.get("spark.sql.cteRecursionRowLimit").toLong)
      spark.conf.set("spark.sql.cteRecursionRowLimit", 2 * n)
    n
  }

  /** The recursive walk over the (already registered, persisted)
    * `graft_orders_ranked` view; the explicit regime flag keeps the
    * losing hinted form reachable for ScaleProbe's `chain=hint` regime
    * measurement and PlansSpec's pin that production stays hint-free. */
  private[graft] def orderChainWalk(spark: SparkSession, broadcastProbe: Boolean): DataFrame = {
    val hint = if (broadcastProbe) "/*+ BROADCAST(r) */ " else ""
    spark.sql(
      s"""WITH RECURSIVE walk(o_custkey, rk, od_s, depth, run_cents, max_gap_days) AS (
        |  SELECT o_custkey, rk, od_s, CAST(1 AS BIGINT), cents, CAST(0 AS BIGINT)
        |  FROM graft_orders_ranked WHERE rk = 1
        |  UNION ALL
        |  SELECT ${hint}r.o_custkey, r.rk, r.od_s, w.depth + 1, w.run_cents + r.cents,
        |         GREATEST(w.max_gap_days, (r.od_s - w.od_s) DIV 86400)
        |  FROM walk w JOIN graft_orders_ranked r
        |    ON r.o_custkey = w.o_custkey AND r.rk = w.rk + 1)
        |SELECT o_custkey, max(depth) AS n_orders,
        |       max_by(run_cents, depth) AS total_cents,
        |       max_by(max_gap_days, depth) AS max_gap_days
        |FROM walk GROUP BY o_custkey""".stripMargin)
  }

  val orderChainCteSql: String =
    """WITH RECURSIVE ranked AS (
      |  SELECT o_custkey, o_orderkey,
      |         CAST(floor(epoch(o_orderdate::TIMESTAMP)) AS BIGINT) AS od_s,
      |         CAST(FLOOR(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_orderdate, o_orderkey) AS rk
      |  FROM orders),
      |walk(o_custkey, rk, od_s, depth, run_cents, max_gap_days) AS (
      |  SELECT o_custkey, rk, od_s, CAST(1 AS BIGINT), cents, CAST(0 AS BIGINT)
      |  FROM ranked WHERE rk = 1
      |  UNION ALL
      |  SELECT r.o_custkey, r.rk, r.od_s, w.depth + 1, w.run_cents + r.cents,
      |         GREATEST(w.max_gap_days, (r.od_s - w.od_s) // 86400)
      |  FROM walk w JOIN ranked r
      |    ON r.o_custkey = w.o_custkey AND r.rk = w.rk + 1)
      |SELECT o_custkey, max(depth) AS n_orders,
      |       max_by(run_cents, depth) AS total_cents,
      |       max_by(max_gap_days, depth) AS max_gap_days
      |FROM walk GROUP BY o_custkey""".stripMargin

  /** Per-event running spend (cumulative window sum) — the classic ordered
    * analytic. Decimal money math keeps every prefix sum exact and
    * order-independent across engines; ties on ts break on the unique
    * event_id so the frame is a total order. The oracle orders by
    * ts::TIMESTAMP (µs) to match `Tables.events`' nanos→µs truncation.
    * Scale: one hash exchange on user_id + per-partition sort — the same
    * shape as any window; state per group is a single running decimal.
    */
  def cumulativeSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        sum(dec(col("value"))).over(w).cast("double").as("cum_spend"))
  }

  val cumulativeSpendSql: String =
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2)))
      |       OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
      |             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_spend
      |FROM events WHERE event_type = 'purchase'""".stripMargin

  /** Partial-aggregate MERGE made explicit — the incremental-pipeline
    * contract at 100 TB: per-(day, type) partial states (count, decimal
    * sum, min, max) as a first aggregation, then a second aggregation that
    * merges partials into per-type totals WITHOUT touching raw events
    * again. The oracle recomputes directly from raw events, so a green row
    * PROVES merge(partials) ≡ full recompute — the algebraic property that
    * lets a production pipeline maintain daily partial tables and serve
    * any rollup from them (backfills touch one day, not the corpus).
    * Decimal sums make the merge exact under any grouping; avg is derived
    * AFTER the merge (sum/count — never averaged averages).
    */
  def partialMergeRollup(spark: SparkSession, dir: String): DataFrame = {
    val partials = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(dec(col("value"))).as("sumv"),
        min(col("value")).as("minv"), max(col("value")).as("maxv"))
    partials.groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("n"),
        sum(col("sumv")).cast("double").as("total"),
        min(col("minv")).as("min_value"),
        max(col("maxv")).as("max_value"))
      .withColumn("avg_value", round(col("total") / col("n"), 6))
  }

  val partialMergeRollupSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  min(value) AS min_value, max(value) AS max_value,
      |  round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_value
      |FROM events GROUP BY event_type""".stripMargin

  /** Trailing 7-day spend before each purchase (inclusive) — the RANGE
    * frame window (`RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW` over
    * epoch seconds), the canonical sliding time-window feature for a
    * training pipeline (recency features, velocity checks). Distinct from
    * [[cumulativeSpend]]'s ROWS frame: the frame is VALUE-determined, so
    * rows sharing a timestamp share a frame and the result is
    * tie-order-independent by construction. Decimal money math keeps the
    * windowed sums exact. Scale: one hash exchange on user_id +
    * per-partition sort — Spark maintains the range frame with two
    * pointers over the sorted run, O(n) per partition.
    */
  def trailingSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_sec"))
      .rangeBetween(-604800L, 0L)
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .withColumn("ts_sec", col("ts").cast("long"))
      .select(col("user_id"), col("event_id"),
        sum(dec(col("value"))).over(w).cast("double").as("spend_7d"))
  }

  val trailingSpendSql: String =
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
      |    PARTITION BY user_id
      |    ORDER BY CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT)
      |    RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_7d
      |FROM events WHERE event_type = 'purchase'""".stripMargin

  /** Per-source winsorization of document lengths at exact interpolated
    * p05/p95 — outlier capping before length-sensitive curation stages.
    * The quantiles are EXACT but never sort documents: n_chars is
    * integer-valued, so the per-group distribution is its VALUE HISTOGRAM
    * — one map-side-combined `groupBy(source, n_chars)` (the only
    * corpus-sized exchange), then cumulative counts over histogram rows
    * (bounded by distinct values per source, not docs) locate the two
    * bracketing values for each quantile position `(total−1)·p`, and the
    * interpolation is per-row arithmetic. Contrast `value_quantiles`
    * (Spark's `percentile`, which buffers per-group values): this form's
    * window runs over the tiny histogram, so a source with billions of
    * docs costs the same as one with thousands. The capped frame joins
    * the 2-value-per-source quantile table back via broadcast.
    */
  def winsorizeChars(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
    val h = docs.groupBy(col("source"), col("n_chars")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("total", sum(col("c")).over(wTot))
      .transform(graft.engine.QueryCaches.registered)
    // exact interpolated quantile from the histogram: pos = (total-1)·p;
    // lo = value covering index ⌊pos⌋, hi = value covering ⌊pos⌋+1
    // (absent when pos is integral at the top — coalesce to lo)
    def quant(p: Double, name: String): DataFrame = {
      val pos = (col("total") - 1).cast("double") * lit(p)
      val k = floor(pos).cast("long")
      val lo = h.filter(k >= col("cum") - col("c") && k < col("cum"))
        .select(col("source"), col("n_chars").cast("double").as("lo"),
          (pos - floor(pos)).as("frac"))
      val hi = h.filter(k + 1 >= col("cum") - col("c") && k + 1 < col("cum"))
        .select(col("source"), col("n_chars").cast("double").as("hi"))
      lo.join(hi, Seq("source"), "left")
        .select(col("source"),
          round(col("lo") + (coalesce(col("hi"), col("lo")) - col("lo")) * col("frac"), 6)
            .as(name))
    }
    val quants = quant(0.05, "p05").join(quant(0.95, "p95"), "source")
    docs.join(broadcast(quants), "source")
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("p05"), col("p95"),
        round(least(greatest(col("n_chars").cast("double"), col("p05")), col("p95")), 6)
          .as("capped"))
  }

  val winsorizeCharsSql: String = {
    def quantCtes(p: String, name: String): String =
      s"""${name}lo AS (SELECT source, n_chars::DOUBLE AS lo,
         |  (total - 1)::DOUBLE * $p - floor((total - 1)::DOUBLE * $p) AS frac
         |  FROM h WHERE CAST(floor((total - 1)::DOUBLE * $p) AS BIGINT) >= cum - c
         |          AND CAST(floor((total - 1)::DOUBLE * $p) AS BIGINT) < cum),
         |${name}hi AS (SELECT source, n_chars::DOUBLE AS hi
         |  FROM h WHERE CAST(floor((total - 1)::DOUBLE * $p) AS BIGINT) + 1 >= cum - c
         |          AND CAST(floor((total - 1)::DOUBLE * $p) AS BIGINT) + 1 < cum),
         |$name AS (SELECT source, round(lo + (coalesce(hi, lo) - lo) * frac, 6) AS $name
         |  FROM ${name}lo LEFT JOIN ${name}hi USING (source))""".stripMargin
    s"""WITH hist AS (SELECT source, n_chars, count(*) AS c
       |              FROM documents GROUP BY 1, 2),
       |h AS (SELECT source, n_chars, c,
       |      sum(c) OVER (PARTITION BY source ORDER BY n_chars
       |                   ROWS UNBOUNDED PRECEDING) AS cum,
       |      sum(c) OVER (PARTITION BY source) AS total FROM hist),
       |${quantCtes("0.05", "p05")},
       |${quantCtes("0.95", "p95")}
       |SELECT doc_id, source, n_chars, p05, p95,
       |       round(least(greatest(n_chars::DOUBLE, p05), p95), 6) AS capped
       |FROM documents JOIN p05 USING (source) JOIN p95 USING (source)""".stripMargin
  }

  /** Global decile + percent-rank of customers by total order spend — the
    * whole-relation ranking window (`ntile`/`percent_rank` with no
    * PARTITION BY), which naively serializes the entire relation through
    * ONE task (`Window.orderBy` warns at plan time). Here the global rank
    * is computed scale-correctly with [[graft.engine.Prefix.exclusiveCumsum]]:
    * range-partition by the order key, per-partition local rank, tiny
    * per-partition offsets broadcast back — two passes, full parallelism.
    * ntile's bucket arithmetic (`first N mod k buckets get ⌈N/k⌉ rows`) and
    * percent_rank's `(rank−1)/(N−1)` are then pure per-row expressions over
    * (rank, N), with N a broadcast 1-row aggregate (the tfidf pattern).
    * The oracle runs DuckDB's native ntile/percent_rank windows — equality
    * proves the distributed rank IS the global window semantics.
    */
  def spendDeciles(spark: SparkSession, dir: String): DataFrame = {
    val totals = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).as("total"))
    val ranked = graft.engine.Prefix.exclusiveCumsum(
      totals, Seq(col("total").desc, col("o_custkey").asc), lit(1L), "rank0")
    // count the CHECKPOINTED rank frame, not `totals` — counting totals
    // would re-run the whole orders scan + aggregation for one scalar
    val n1 = ranked.agg(count(lit(1)).as("n_cust"))
    ranked.crossJoin(broadcast(n1))
      .withColumn("decile", expr(
        "CASE WHEN rank0 + 1 <= (n_cust % 10) * (n_cust div 10 + 1) " +
          "THEN rank0 div (n_cust div 10 + 1) + 1 " +
          "ELSE (n_cust % 10) + (rank0 - (n_cust % 10) * (n_cust div 10 + 1)) div (n_cust div 10) + 1 END"))
      .withColumn("pr", when(col("n_cust") > 1,
        round(col("rank0").cast("double") / (col("n_cust") - 1), 6)).otherwise(lit(0d)))
      .select(col("o_custkey"), col("total").cast("double").as("total"),
        col("decile"), col("pr"))
  }

  val spendDecilesSql: String =
    """WITH totals AS (SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
      |                FROM orders GROUP BY o_custkey)
      |SELECT o_custkey, CAST(total AS DOUBLE) AS total,
      |       ntile(10) OVER (ORDER BY total DESC, o_custkey) AS decile,
      |       round(percent_rank() OVER (ORDER BY total DESC, o_custkey), 6) AS pr
      |FROM totals""".stripMargin

  /** Broadcast Bloom-filter pruned join — the 100 TB pattern for filtering
    * a huge fact table by a selective dimension whose KEY SET is too big to
    * broadcast: broadcast a fixed-size bit array instead (here 16 Kbit =
    * 2 KB regardless of key count), pre-filter the fact scan against it,
    * and only bloom-survivors reach the real (shuffle) join. No false
    * negatives by construction; false positives only cost wasted join
    * input, never wrong answers. This is what Spark's own runtime row-level
    * filtering does with engine-internal hashes; this operator is the
    * PORTABLE version — md5-derived bit positions and integer masks, so the
    * DuckDB oracle builds the identical bitmap and replays membership
    * bit-for-bit, false positives included.
    *
    * Layout: m=16384 bits as 512 BIGINT lanes of 32 (masks stay below the
    * sign bit on both engines); k=3 probes/key. The compile-time
    * `broadcast()` hint is safe here — unlike a data-dependent candidate
    * set, the bitmap's size is FIXED by construction (512 rows), so the
    * AQE-vs-hint lesson (SCALE.md) does not apply. Sizing at scale: m grows
    * with build-side count n (~10–16 bits/key keeps FP% low); the bitmap
    * stays KB–MB when n is millions, still broadcastable.
    *
    * Output is the audit summary (pass/exact/false-positive counts), which
    * makes the FP behavior itself oracle-verified.
    */
  def bloomPrunedJoin(spark: SparkSession, dir: String): DataFrame = {
    val m = 16384
    val k = 3
    import graft.engine.PortableHash
    val build = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val js = array((0 until k).map(lit): _*)
    def pos(key: org.apache.spark.sql.Column) =
      pmod(PortableHash.md5Long(
        concat(col("j").cast("string"), lit(":"), key.cast("string"))), lit(m))
    val bits = build
      .select(explode(js).as("j"), col("c_custkey"))
      .withColumn("pos", pos(col("c_custkey")))
      .selectExpr("CAST(pos div 32 AS INT) AS lane",
        "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT)) AS mask")
      .groupBy("lane").agg(bit_or(col("mask")).as("bm"))
    // spread the probe scan: the k-fold explode + per-row md5 probes are
    // the query's whole compute and the bitmap join broadcasts, so on a
    // one-file fixture they'd otherwise serialize into the scan's single
    // task (profiled ~1.1 s at sf0.1); a real fact table fans out by itself
    val pass = graft.engine.Spread.spreadSmallInput(Tables.orders(spark, dir))
      .select(col("o_orderkey"), col("o_custkey"), explode(js).as("j"))
      .withColumn("pos", pos(col("o_custkey")))
      .withColumn("lane", expr("CAST(pos div 32 AS INT)"))
      .withColumn("mask", expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"))
      .join(broadcast(bits), "lane")
      .groupBy(col("o_orderkey"), col("o_custkey"))
      .agg(sum(when(col("bm").bitwiseAND(col("mask")) =!= 0, 1).otherwise(0)).as("n_hit"))
      .filter(col("n_hit") === k)
    pass
      .join(build.withColumnRenamed("c_custkey", "bk"),
        col("o_custkey") === col("bk"), "left")
      .agg(count(lit(1)).as("n_bloom_pass"), count(col("bk")).as("n_exact"),
        (count(lit(1)) - count(col("bk"))).as("n_false_pos"))
  }

  val bloomPrunedJoinSql: String = {
    val md5 = "(('0x' || substr(md5(j::VARCHAR || ':' || key::VARCHAR), 1, 15))::BIGINT)"
    s"""WITH build AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
       |bits AS (SELECT pos // 32 AS lane, bit_or(1::BIGINT << (pos % 32)) AS bm
       |         FROM (SELECT $md5 % 16384 AS pos
       |               FROM (SELECT c_custkey AS key FROM build), range(3) t(j))
       |         GROUP BY 1),
       |probe AS (SELECT o_orderkey, key, $md5 % 16384 AS pos
       |          FROM (SELECT o_orderkey, o_custkey AS key FROM orders), range(3) t(j)),
       |pass AS (SELECT o_orderkey, key
       |         FROM probe p JOIN bits b ON p.pos // 32 = b.lane
       |         GROUP BY 1, 2
       |         HAVING sum(CASE WHEN (b.bm & (1::BIGINT << (p.pos % 32))) != 0
       |                         THEN 1 ELSE 0 END) = 3)
       |SELECT count(*) AS n_bloom_pass, count(bk.c_custkey) AS n_exact,
       |       count(*) - count(bk.c_custkey) AS n_false_pos
       |FROM pass LEFT JOIN build bk ON pass.key = bk.c_custkey""".stripMargin
  }

  /** Exact interpolated quantiles per group (`percentile`, Spark's exact
    * form — NOT the approx sketch, which is engine-specific). One hash agg;
    * per-group state is the sorted value multiset, fine for bounded groups
    * (5 event types); for unbounded cardinality at scale the approx sketch
    * (`percentile_approx`) is the drop-in with the same plan shape. Rounded
    * to 6 dp: Spark interpolates lower + g·(upper−lower), DuckDB
    * (1−g)·a + g·b — algebraically equal, 1-ulp apart in float.
    */
  def valueQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))

  val valueQuantilesSql: String =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 6) AS p50,
      |  round(quantile_cont(value, 0.9), 6) AS p90,
      |  round(quantile_cont(value, 0.99), 6) AS p99
      |FROM events GROUP BY event_type""".stripMargin

  /** Fixed-width histogram of the value distribution per event type — the
    * profiling op before choosing quantile/filter thresholds. Pure integer
    * bucketing (floor division), one map-side-combined agg.
    */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), floor(col("value") / 50.0).cast("long").as("bucket"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"))

  val valueHistogramSql: String =
    """SELECT event_type, CAST(floor(value / 50.0) AS BIGINT) AS bucket, count(*) AS n
      |FROM events GROUP BY 1, 2""".stripMargin

  /** SQL-text surface (the reference has none — SURVEY.md §2.10): the same
    * engine accepts ANSI SQL over registered views; Catalyst plans it
    * identically to the DataFrame form. Oracle: the very same SQL.
    */
  def sqlSurface(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem_v GROUP BY l_returnflag, l_linestatus""".stripMargin)
  }

  val sqlSurfaceSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Latest-per-composite-key dedup on events (exact keyed dedup — the
    * dropDuplicates-with-ordering idiom, same single-shuffle max_by engine
    * as the KTable view).
    */
  def dedupExactKeyed(spark: SparkSession, dir: String): DataFrame = {
    import graft.api.KStream
    // pre-project so the max_by struct (and thus the scan) excludes props
    KStream(Tables.events(spark, dir).select("user_id", "event_type", "event_id", "ts", "value"),
        "user_id", "ts")
      .groupBy("user_id", "event_type")
      .reduceLatest(orderBy = Seq("ts", "event_id"))
      .df.select("user_id", "event_type", "event_id", "value")
  }

  val dedupExactKeyedSql: String =
    """SELECT user_id, event_type, event_id, value FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
      |                               ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1""".stripMargin

  /** Count-min-sketch heavy hitters — the streaming frequent-items sketch
    * alongside KMV (distinct), HLL (distinct) and Bloom (membership):
    * d=4 × w=1024 counters (32 KB fixed, regardless of key cardinality),
    * mergeable by cell-wise addition, overestimate-only error ≤ N/w per
    * row with high probability. Cells hash from md5 (PortableHash), so the
    * DuckDB oracle builds the IDENTICAL sketch and the overcount column —
    * the sketch's error behavior itself — is hash-verified, same policy as
    * the Bloom join's false positives.
    *
    * Plan: one map-side-combined count per (row, cell) builds the sketch
    * (≤ 4096 cells whatever the data size — construction-bounded, hence
    * broadcast); exact top-10 candidates come from TakeOrderedAndProject
    * (partial per-partition top-k, no global sort); estimates are a
    * broadcast join + min over d cells. At 100 TB the sketch build is the
    * only data-sized pass.
    */
  def heavyHittersCms(spark: SparkSession, dir: String): DataFrame = {
    val d = 4
    val w = 1024
    import graft.engine.PortableHash
    val ev = Tables.events(spark, dir).select(col("user_id"))
    val js = array((0 until d).map(lit): _*)
    def pos(j: org.apache.spark.sql.Column, key: org.apache.spark.sql.Column) =
      pmod(PortableHash.md5Long(concat(lit("cms"), j, lit(":"), key)), lit(w))
    val cells = ev.select(col("user_id"), explode(js).as("j"))
      .withColumn("pos", pos(col("j"), col("user_id")))
      .groupBy("j", "pos").agg(count(lit(1)).as("cell_n"))
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
    val top = exact.orderBy(col("exact_n").desc, col("user_id").asc).limit(10)
    top.select(col("user_id"), col("exact_n"), explode(js).as("j"))
      .withColumn("pos", pos(col("j"), col("user_id")))
      .join(broadcast(cells), Seq("j", "pos"))
      .groupBy("user_id", "exact_n")
      .agg(min(col("cell_n")).as("est_n"))
      .withColumn("overcount", col("est_n") - col("exact_n"))
  }

  val heavyHittersCmsSql: String = {
    val md5pos = "(('0x' || substr(md5('cms' || %s || ':' || %s), 1, 15))::BIGINT) %% 1024"
    s"""WITH ev AS (SELECT user_id FROM events),
       |cells AS (SELECT t.j, ${md5pos.format("t.j", "user_id")} AS pos, count(*) AS cell_n
       |          FROM ev, range(4) t(j) GROUP BY 1, 2),
       |exact AS (SELECT user_id, count(*) AS exact_n FROM ev GROUP BY 1),
       |top AS (SELECT user_id, exact_n FROM exact
       |        ORDER BY exact_n DESC, user_id ASC LIMIT 10),
       |probe AS (SELECT tp.user_id, tp.exact_n, t.j,
       |                 ${md5pos.format("t.j", "tp.user_id")} AS pos
       |          FROM top tp, range(4) t(j))
       |SELECT p.user_id, p.exact_n, min(c.cell_n) AS est_n,
       |       min(c.cell_n) - p.exact_n AS overcount
       |FROM probe p JOIN cells c ON c.j = p.j AND c.pos = p.pos
       |GROUP BY p.user_id, p.exact_n""".stripMargin
  }

  /** Join-cardinality estimation from mergeable sketches — what a planner
    * at 100 TB does BEFORE committing to a join: |A ⋈ B| = Σ_k a(k)·b(k)
    * is estimated as the INNER PRODUCT of the two sides' count-min rows
    * (min over the d hash rows; one-sided overestimate, collisions only
    * add). Each side's sketch is d×w=4×1024 cells (32 KB, cell-wise
    * mergeable across partitions/partitions-of-days), so the estimate
    * costs two map-side-combined passes and a 4096-row join — no shuffle
    * of the fact tables against each other. The exact size (two keyed
    * counts joined, aggregate-sized) rides along so the ESTIMATION ERROR
    * itself is oracle-verified, same discipline as `heavy_hitters_cms`.
    */
  def joinSizeEstimate(spark: SparkSession, dir: String): DataFrame = {
    val d = 4
    val w = 1024
    import graft.engine.PortableHash
    val js = array((0 until d).map(lit): _*)
    def pos(j: org.apache.spark.sql.Column, key: org.apache.spark.sql.Column) =
      pmod(PortableHash.md5Long(concat(lit("cms"), j, lit(":"), key)), lit(w))
    // each side collapses to per-key counts ONCE (map-side-combined); the
    // sketch cells and the exact join both derive from that shared keyed
    // relation, so the fact tables are scanned once and the d-way md5
    // expansion runs over DISTINCT KEYS, not raw rows
    def keyed(df: DataFrame, cnt: String) =
      df.groupBy(col("k")).agg(count(lit(1)).as(cnt)).transform(graft.engine.QueryCaches.registered)
    def cells(kdf: DataFrame, cnt: String, n: String) =
      kdf.select(explode(js).as("j"), col("k"), col(cnt))
        .withColumn("pos", pos(col("j"), col("k")))
        .groupBy("j", "pos").agg(sum(col(cnt)).as(n))
    val ka = keyed(Tables.orders(spark, dir).select(col("o_orderkey").as("k")), "ca")
    val kb = keyed(Tables.lineitem(spark, dir).select(col("l_orderkey").as("k")), "cb")
    val est = cells(ka, "ca", "na").join(cells(kb, "cb", "nb"), Seq("j", "pos"))
      .groupBy(col("j")).agg(sum(col("na") * col("nb")).as("ip"))
      .agg(min(col("ip")).as("est_size"))
    val exact = ka.join(kb, "k")
      .agg(sum(col("ca") * col("cb")).as("exact_size"))
    exact.crossJoin(est)
      .select(col("exact_size"), col("est_size"),
        (col("est_size") - col("exact_size")).as("overcount"))
  }

  val joinSizeEstimateSql: String = {
    val md5pos = "(('0x' || substr(md5('cms' || %s || ':' || %s), 1, 15))::BIGINT) %% 1024"
    s"""WITH a AS (SELECT o_orderkey AS k FROM orders),
       |b AS (SELECT l_orderkey AS k FROM lineitem),
       |ca AS (SELECT t.j, ${md5pos.format("t.j", "k")} AS pos, count(*) AS na
       |       FROM a, range(4) t(j) GROUP BY 1, 2),
       |cb AS (SELECT t.j, ${md5pos.format("t.j", "k")} AS pos, count(*) AS nb
       |       FROM b, range(4) t(j) GROUP BY 1, 2),
       |ip AS (SELECT ca.j, sum(ca.na * cb.nb) AS ip FROM ca
       |       JOIN cb ON ca.j = cb.j AND ca.pos = cb.pos GROUP BY 1),
       |est AS (SELECT min(ip) AS est_size FROM ip),
       |ex AS (SELECT sum(na.cnt * nb.cnt) AS exact_size
       |       FROM (SELECT k, count(*) AS cnt FROM a GROUP BY 1) na
       |       JOIN (SELECT k, count(*) AS cnt FROM b GROUP BY 1) nb USING (k))
       |SELECT exact_size::BIGINT AS exact_size, est_size::BIGINT AS est_size,
       |       (est_size - exact_size)::BIGINT AS overcount
       |FROM ex, est""".stripMargin
  }

  /** SCD2 dimension build from a changelog (the stream–table duality made
    * durable): each customer's order history becomes versioned rows with
    * [valid_from, valid_to) intervals via `lead`, the current version
    * flagged. This is how a KTable's history — not just its latest state —
    * lands in a warehouse. One exchange on the key; `lead` shares the same
    * sort as the interval construction. Ties on the date break on the
    * unique order key, making version order total.
    */
  def scd2Dimension(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("valid_from").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        col("o_orderdate").as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select("o_custkey", "o_orderkey", "o_orderstatus",
        "valid_from", "valid_to", "is_current")
  }

  val scd2DimensionSql: String =
    """SELECT o_custkey, o_orderkey, o_orderstatus,
      |       o_orderdate AS valid_from,
      |       lead(o_orderdate, 1) OVER (PARTITION BY o_custkey
      |                                  ORDER BY o_orderdate ASC, o_orderkey ASC) AS valid_to,
      |       lead(o_orderdate, 1) OVER (PARTITION BY o_custkey
      |                                  ORDER BY o_orderdate ASC, o_orderkey ASC) IS NULL AS is_current
      |FROM orders""".stripMargin

  /** Top-k WITHIN each time window (the windowed-leaderboard shape:
    * tumbling window → keyed aggregate → per-window rank). Two exchanges
    * total: one for the (window × user) aggregation, one to re-group by
    * window for ranking — the second moves only aggregated rows (one per
    * user-window, not one per event). Money stays decimal until the final
    * cast; rank ties break on user_id.
    */
  def windowedTopk(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(sum(dec(col("value"))).as("spend"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window")).orderBy(col("spend").desc, col("user_id").asc)
    spend.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("window.start").as("window_start"), col("user_id"),
        col("spend").cast("double").as("spend"), col("rnk"))
  }

  val windowedTopkSql: String =
    """SELECT window_start, user_id, CAST(spend AS DOUBLE) AS spend, rnk FROM (
      |  SELECT window_start, user_id, spend,
      |         row_number() OVER (PARTITION BY window_start
      |                            ORDER BY spend DESC, user_id ASC) AS rnk
      |  FROM (SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, user_id,
      |               SUM(CAST(value AS DECIMAL(18,2))) AS spend
      |        FROM events WHERE event_type = 'purchase'
      |        GROUP BY 1, 2))
      |WHERE rnk <= 3""".stripMargin

  /** Explicit GROUPING SETS (A7 beyond rollup/cube): the lattice
    * ((rf,ls),(rf),(ls)) is NOT a rollup prefix chain — both single-column
    * marginals are present but the grand total is not, so this exercises
    * the general grouping-sets expansion rather than the rollup special
    * case. One Expand + single map-side-combined hash aggregation;
    * `grouping_id` disambiguates rows whose key columns are null-by-
    * aggregation (same bitmask semantics in Spark and DuckDB with the
    * same column order).
    */
  def groupingSetsPricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .select("gid", "l_returnflag", "l_linestatus", "sum_qty", "n")

  val groupingSetsPricingSql: String =
    """SELECT GROUPING(l_returnflag, l_linestatus) AS gid, l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))""".stripMargin

  /** Navigation + distribution analytics (§2.10 window functions beyond
    * ranking): per-customer order cadence via `lag` (days since the
    * previous order) and spend quartiles via `ntile(4)`. Both windows
    * partition on the same key, so Catalyst plans ONE hash exchange on
    * o_custkey and runs both window frames over the shared sort — check
    * the plan: a single Exchange feeds two Window nodes. Determinism: both
    * orderings tie-break on the unique o_orderkey, and ntile's bucket
    * allocation (first buckets take the remainder rows) is the same
    * standard-SQL rule in Spark and DuckDB.
    */
  def orderCadence(spark: SparkSession, dir: String): DataFrame = {
    val byDate = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val bySpend = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("gap_days",
        datediff(to_date(col("o_orderdate")), to_date(lag(col("o_orderdate"), 1).over(byDate)))
          .cast("long"))
      .withColumn("spend_quartile", ntile(4).over(bySpend).cast("long"))
      .select("o_custkey", "o_orderkey", "gap_days", "spend_quartile")
  }

  val orderCadenceSql: String =
    """SELECT o_custkey, o_orderkey,
      |  date_diff('day',
      |    CAST(lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
      |                                   ORDER BY o_orderdate ASC, o_orderkey ASC) AS DATE),
      |    CAST(o_orderdate AS DATE)) AS gap_days,
      |  ntile(4) OVER (PARTITION BY o_custkey
      |                 ORDER BY o_totalprice ASC, o_orderkey ASC) AS spend_quartile
      |FROM orders""".stripMargin

  /** TPC-H Q5-shaped star join ("local supplier volume"): revenue per
    * nation from line items where the customer and the supplier share the
    * nation, rolled up through the full dimension chain
    * region ← nation ← {customer, supplier} ← orders ← lineitem. The
    * five-way join is the canonical snowflake topology: every dimension
    * side (region, nation, customer, supplier) is broadcast — the fact
    * table never reshuffles for any of them; the only exchanges are
    * orders⋈lineitem on the order key (AQE-planned) and the final
    * aggregation. The c_nationkey = s_nationkey equality is the join
    * ORDER stressor — Catalyst must apply it as a post-join filter on
    * broadcast sides, not a cartesian.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"), col("r_name"))
    Tables.orders(spark, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_items"),
        sum(discPrice).cast("double").as("revenue"))
  }

  val q5LocalSupplierSql: String =
    s"""SELECT r_name, n_name, count(*) AS n_items,
       |       CAST(SUM($discPriceSql) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name""".stripMargin

  /** Partition-pruned scan — the storage-layout twin of [[bucketedJoin]]:
    * events land date-partitioned (the universal layout for an append-only
    * 100 TB event store), and a date-range query then reads ONLY the
    * matching partition directories. The plan carries the day predicates
    * as `PartitionFilters` (directory-level pruning at planning time —
    * zero I/O for excluded days, not even footer reads) and the residual
    * `event_type` predicate as `PushedFilters` into the surviving files;
    * PlansSpec asserts both. At 100 TB this is the difference between
    * scanning 3 days and scanning 8 years. The write is part of the query
    * only to make the demo self-contained (idempotent overwrite, same
    * pattern as the bucketed-join setup).
    */
  def partitionPrunedScan(spark: SparkSession, dir: String): DataFrame = {
    // scoped per process AND per source dir: a fixed shared path would let
    // two concurrent drivers (or a test JVM next to a bench run, possibly
    // at different scale factors) overwrite each other mid-scan
    val scope = graft.engine.PortableHash.md5LongScala(dir).toHexString.take(8)
    val out = java.nio.file.Paths
      .get(System.getProperty("java.io.tmpdir"),
        s"graft_part_events_${ProcessHandle.current().pid()}_$scope").toString
    Tables.events(spark, dir)
      .withColumn("day", date_format(col("ts").cast("date"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(out)
    spark.read.parquet(out)
      .filter(col("day") >= "2024-01-10" && col("day") <= "2024-01-12" &&
        col("event_type") === "purchase")
      .groupBy(col("day").cast("string").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total"))
  }

  val partitionPrunedScanSql: String =
    """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, count(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events
      |WHERE CAST(CAST(ts AS DATE) AS VARCHAR) BETWEEN '2024-01-10' AND '2024-01-12'
      |  AND event_type = 'purchase'
      |GROUP BY 1""".stripMargin

  /** Dynamic partition pruning — the runtime twin of
    * [[partitionPrunedScan]]'s planning-time pruning: the pruning
    * predicate is NOT a literal in the query but the result of filtering a
    * dimension (here a day-dimension restricted to every 7th
    * day-of-month), so only DPP can skip fact partitions — Catalyst plants
    * a `dynamicpruning` subquery on the fact scan's partition column, the
    * broadcast dim's build side feeds it at runtime, and excluded
    * directories are never listed, let alone read. At 100 TB star joins
    * this is THE scan-killer: "this quarter's fact rows for stores in
    * region X" prunes on a predicate no one could write as a literal.
    * PlansSpec asserts `dynamicpruning` is present in the fact scan's
    * PartitionFilters. Write-side demo scoping follows the
    * partitionPrunedScan rule.
    */
  def dppScan(spark: SparkSession, dir: String): DataFrame = {
    val scope = graft.engine.PortableHash.md5LongScala(dir).toHexString.take(8)
    val out = java.nio.file.Paths
      .get(System.getProperty("java.io.tmpdir"),
        s"graft_dpp_events_${ProcessHandle.current().pid()}_$scope").toString
    Tables.events(spark, dir)
      .withColumn("day", date_format(col("ts").cast("date"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(out)
    val fact = spark.read.parquet(out)
    // the dim is derived (distinct partition values + a selective filter),
    // so its surviving days exist only at RUNTIME — exactly DPP's case
    val dim = fact.select(col("day")).distinct()
      .filter(dayofmonth(to_date(col("day"))) % 7 === 3)
    fact.join(broadcast(dim), "day")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total"))
  }

  val dppScanSql: String =
    """SELECT event_type, count(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events
      |WHERE date_part('day', ts) % 7 = 3
      |GROUP BY 1""".stripMargin

  /** First-order Markov transition matrix over per-user event sequences —
    * the behavioral-model fit (what follows what, and how often). One
    * user-keyed exchange carries the whole cost: `lag` orders each user's
    * events by (ts, event_id) — the unique-id tie-break that makes the
    * order total — then transition counting is a map-side-combined
    * aggregate on a k² domain (k = #event types), and the row-normalizing
    * window runs over those ≤ k² aggregated rows, not the fact table.
    * Probabilities in exact basis points (`div`), no doubles anywhere.
    */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val rowW = org.apache.spark.sql.expressions.Window.partitionBy(col("prev_type"))
    trans
      .withColumn("row_total", sum(col("n")).over(rowW))
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("(10000 * n) div row_total").as("prob_bp"))
  }

  val markovTransitionsSql: String =
    """WITH t AS (SELECT event_type,
      |             lag(event_type) OVER (PARTITION BY user_id
      |                                   ORDER BY ts, event_id) AS prev_type
      |           FROM events),
      |c AS (SELECT prev_type, event_type AS next_type, count(*) AS n
      |      FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, next_type, n,
      |       CAST((10000 * n) // SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS prob_bp
      |FROM c""".stripMargin

  /** CDC / MERGE apply: a keyed changelog (latest order per customer,
    * status 'F' acting as the delete tombstone) merged into a base
    * snapshot — the batch form of Kafka Streams' table materialization
    * with deletes (reference: tombstone semantics,
    * `ProcessorApiExample.scala:44-58`). The changelog collapses FIRST via
    * one map-side-combined `max_by` (latest-per-key without a window
    * sort), so the merge join moves one row per touched key — at 100 TB
    * the join is snapshot-partitioned and the collapsed delta is tiny next
    * to it. Upserts override the balance, absent keys pass through,
    * tombstoned keys drop.
    */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val last = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(max_by(
        struct(col("o_orderstatus"), col("o_totalprice"), col("o_orderdate")),
        struct(col("o_orderdate"), col("o_orderkey"))).as("last"))
      .select(col("o_custkey"), col("last.o_orderstatus").as("last_status"),
        col("last.o_totalprice").as("last_total"),
        col("last.o_orderdate").as("last_update"))
    Tables.customer(spark, dir)
      .join(last, col("c_custkey") === col("o_custkey"), "left")
      .filter(col("last_status").isNull || col("last_status") =!= "F")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("last_total"), col("c_acctbal")).as("balance"),
        col("last_update"))
  }

  /** Market-basket co-occurrence with lift: part pairs ordered together in
    * ≥ 2 baskets, ranked by basket lift = N·c(a,b) / (c(a)·c(b)) in exact
    * basis points (the integer-lift discipline of `pmi_collocations`, here
    * over order baskets instead of token bigrams). Scale shape: the
    * (order, part) projection is distinct-collapsed and persisted ONCE —
    * the self-join's two legs and the support counts all reuse that one
    * exchange; pairs per order are bounded by basket size squared (not
    * corpus size); supports are part-cardinality relations; the basket
    * count folds in as a broadcast 1-row aggregate; the final top-100 is
    * a TakeOrdered with a (lift, a, b) total order.
    */
  def copurchasePairs(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().transform(graft.engine.QueryCaches.registered)
    val nBaskets = li.agg(countDistinct(col("ok")).as("n_baskets"))
    // registered (round 11): same two-broadcast-attach shape as
    // [[itemSimilarityTopk]]'s sup — unregistered, the support aggregation
    // over the basket cache ran once per attach join
    val sup = li.groupBy(col("pk")).agg(count(lit(1)).as("n"))
      .transform(graft.engine.QueryCaches.registered)
    li.as("a").join(li.as("b"), Seq("ok"))
      .filter(col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 2)
      .join(sup.select(col("pk").as("part_a"), col("n").as("n_a")), "part_a")
      .join(sup.select(col("pk").as("part_b"), col("n").as("n_b")), "part_b")
      .crossJoin(nBaskets)
      .select(col("part_a"), col("part_b"), col("n_orders"), col("n_a"), col("n_b"),
        expr("(10000 * n_baskets * n_orders) div (n_a * n_b)").as("lift_bp"))
      .orderBy(col("lift_bp").desc, col("part_a"), col("part_b"))
      .limit(100)
  }

  val copurchasePairsSql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |nb AS (SELECT count(DISTINCT ok) AS n_baskets FROM li),
      |sup AS (SELECT pk, count(*) AS n FROM li GROUP BY 1),
      |p AS (SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_orders
      |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2
      |      HAVING count(*) >= 2)
      |SELECT part_a, part_b, n_orders, sa.n AS n_a, sb.n AS n_b,
      |       (10000 * nb.n_baskets * n_orders) // (sa.n * sb.n) AS lift_bp
      |FROM p JOIN sup sa ON part_a = sa.pk JOIN sup sb ON part_b = sb.pk CROSS JOIN nb
      |ORDER BY lift_bp DESC, part_a, part_b LIMIT 100""".stripMargin

  /** Pareto / contribution analysis: the smallest customer set covering
    * 80% of revenue — "how concentrated is our revenue?" in one row of
    * exact integers. The descending running total comes from
    * [[graft.engine.Prefix.exclusiveCumsum]] ordered by
    * (cents DESC, custkey) — the two-pass range-partitioned prefix sum,
    * so the global rank never serializes through one task — and the 80%
    * cut is the integer cross-multiplication 5·prefix < 4·total (a
    * customer is in the covering set iff it STARTS before the boundary).
    * Money stays in cents; the total folds in as a broadcast 1-row
    * aggregate.
    */
  def paretoCustomers(spark: SparkSession, dir: String): DataFrame = {
    // registered for the same three-materializations reason as
    // [[weightedMedian]]'s collapsed relation (round 11): the per-customer
    // spend aggregate feeds the prefix build's sampling pass, its range
    // exchange, AND the totals branch
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum((dec(col("o_totalprice")) * 100).cast("long")).as("cents"))
      .transform(graft.engine.QueryCaches.registered)
    val cum = graft.engine.Prefix.exclusiveCumsum(
      spend, Seq(col("cents").desc, col("o_custkey")), col("cents"), "cum")
    val totals = spend.agg(sum(col("cents")).as("total_cents"),
      count(lit(1)).as("n_customers"))
    cum.crossJoin(broadcast(totals))
      .filter(col("cum") * 5 < col("total_cents") * 4)
      .groupBy(col("n_customers"), col("total_cents"))
      .agg(count(lit(1)).as("n_top"), sum(col("cents")).as("covered_cents"))
      .select(col("n_top"), col("n_customers"),
        col("covered_cents").cast("long"), col("total_cents").cast("long"),
        expr("(10000 * n_top) div n_customers").as("share_bp"))
  }

  val paretoCustomersSql: String =
    """WITH s AS (SELECT o_custkey,
      |             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
      |           FROM orders GROUP BY 1),
      |c AS (SELECT *, SUM(cents) OVER (ORDER BY cents DESC, o_custkey
      |                                 ROWS UNBOUNDED PRECEDING) - cents AS cum FROM s),
      |t AS (SELECT CAST(SUM(cents) AS BIGINT) AS total_cents, count(*) AS n_customers FROM s)
      |SELECT count(*) AS n_top, t.n_customers,
      |       CAST(SUM(cents) AS BIGINT) AS covered_cents, t.total_cents,
      |       (10000 * count(*)) // t.n_customers AS share_bp
      |FROM c, t WHERE cum * 5 < total_cents * 4
      |GROUP BY t.n_customers, t.total_cents""".stripMargin

  val cdcApplySql: String =
    """WITH l AS (SELECT *, row_number() OVER (PARTITION BY o_custkey
      |             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders),
      |last AS (SELECT o_custkey, o_orderstatus, o_totalprice, o_orderdate
      |         FROM l WHERE rn = 1)
      |SELECT c.c_custkey, c.c_name,
      |       COALESCE(last.o_totalprice, c.c_acctbal) AS balance,
      |       last.o_orderdate AS last_update
      |FROM customer c LEFT JOIN last ON c.c_custkey = last.o_custkey
      |WHERE last.o_custkey IS NULL OR last.o_orderstatus <> 'F'""".stripMargin

  // -------------------------------------------------------- kmv_intersect
  /** Sketch-based audience overlap (theta-sketch set algebra on KMV): for
    * every event-type pair, |A∩B| is estimated WITHOUT touching raw events
    * twice — the per-type KMV sketches ([[graft.functions.KmvSketch]])
    * already computed for distinct counting are combined per pair: the k
    * smallest of S_A ∪ S_B are exactly the k smallest of A ∪ B (the KMV
    * union property `kmv_union_daily` relies on), the fraction ρ of that
    * union sketch present in BOTH input sketches estimates the Jaccard, and
    * est|A∩B| = ρ·est|A∪B| (Beyer et al., SIGMOD'07). When both sketches
    * are exact (< k hashes) the pair arithmetic degenerates to the exact
    * overlap. The exact |A∩B| rides along so the driver's hash check
    * verifies BOTH the sketch replay and the reference answer.
    *
    * Scale: raw events are scanned once for the sketches (map-side combined
    * to ≤ k longs per type) and once for the exact pairs (the part a 100 TB
    * deployment would drop, keeping only sketch algebra over stored
    * sketches — pairs cost O(types² · k) with NO further data scan). The
    * pair join is over the type-domain-sized sketch relation (bounded by
    * construction, PlansSpec-allowlisted).
    */
  def kmvIntersect(spark: SparkSession, dir: String): DataFrame = {
    val k = kmvK
    val sketch = udaf(new graft.functions.KmvSketch(k))
    val ev = Tables.events(spark, dir)
    val sk = ev
      .select(col("event_type"),
        graft.engine.PortableHash.md5Long(col("user_id").cast("string")).as("h"))
      .groupBy(col("event_type"))
      .agg(sketch(col("h")).as("sk"))
    val eu = ev.select(col("event_type"), col("user_id")).distinct()
    val exact = eu.as("a")
      .join(eu.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("exact_inter"))
    val twoPow60 = (k - 1).toDouble * math.pow(2, 60)
    val pairs = sk.as("a")
      .join(broadcast(sk.as("b")), col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
        col("a.sk").as("ska"), col("b.sk").as("skb"))
      .withColumn("pool", array_sort(array_distinct(concat(col("ska"), col("skb")))))
      .withColumn("nd", size(col("pool")))
      .withColumn("u", slice(col("pool"), 1, k))
      .withColumn("est_union",
        when(col("nd") < k, col("nd").cast("long"))
          .otherwise(floor(lit(twoPow60) / element_at(col("u"), k)).cast("long")))
      .withColumn("m", size(filter(col("u"),
        x => array_contains(col("ska"), x) && array_contains(col("skb"), x))))
      .withColumn("est_inter",
        expr(s"(CAST(m AS BIGINT) * est_union) div CAST(least(nd, $k) AS BIGINT)"))
    pairs.join(exact, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"), col("est_union"), col("est_inter"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"))
  }

  val kmvIntersectSql: String =
    s"""WITH h AS (SELECT DISTINCT event_type,
       |  ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h FROM events),
       |r AS (SELECT event_type, h,
       |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
       |sk AS (SELECT event_type, h FROM r WHERE rn <= $kmvK),
       |ty AS (SELECT DISTINCT event_type FROM events),
       |pr AS (SELECT a.event_type AS ta, b.event_type AS tb
       |       FROM ty a JOIN ty b ON a.event_type < b.event_type),
       |pool AS (SELECT p.ta, p.tb, s.h,
       |         max(CASE WHEN s.event_type = p.ta THEN 1 ELSE 0 END) AS in_a,
       |         max(CASE WHEN s.event_type = p.tb THEN 1 ELSE 0 END) AS in_b
       |         FROM pr p JOIN sk s ON s.event_type IN (p.ta, p.tb)
       |         GROUP BY 1, 2, 3),
       |pw AS (SELECT *, row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn,
       |              count(*) OVER (PARTITION BY ta, tb) AS nd FROM pool),
       |ag AS (SELECT ta, tb, max(nd) AS nd,
       |              max(CASE WHEN rn = $kmvK THEN h END) AS kth,
       |              CAST(sum(CASE WHEN rn <= $kmvK AND in_a = 1 AND in_b = 1
       |                            THEN 1 ELSE 0 END) AS BIGINT) AS m
       |       FROM pw GROUP BY 1, 2),
       |e AS (SELECT ta, tb, m, nd,
       |       CASE WHEN nd < $kmvK THEN nd
       |            ELSE CAST(floor(${kmvK - 1}.0 * 1152921504606846976.0 / kth) AS BIGINT)
       |       END AS est_union FROM ag),
       |eu AS (SELECT DISTINCT event_type, user_id FROM events),
       |ex AS (SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS exact_inter
       |       FROM eu a JOIN eu b ON a.user_id = b.user_id
       |                          AND a.event_type < b.event_type
       |       GROUP BY 1, 2)
       |SELECT e.ta AS type_a, e.tb AS type_b, e.est_union,
       |       (m * est_union) // LEAST(nd, $kmvK) AS est_inter,
       |       COALESCE(ex.exact_inter, 0) AS exact_inter
       |FROM e LEFT JOIN ex ON e.ta = ex.ta AND e.tb = ex.tb""".stripMargin

  // -------------------------------------------------------------- ivm_agg
  /** Incremental view maintenance with adder/subtractor semantics — Kafka
    * Streams' `KGroupedTable.aggregate(initializer, adder, subtractor)`
    * (the one KTable aggregation form whose re-grouping moves a key BETWEEN
    * groups): the orders-per-customer changelog maintains "customers and
    * balance by latest order priority" purely from DELTAS. Every non-delete
    * version ADDS (+1, +cents) to its group; every version whose
    * predecessor was live SUBTRACTS (−1, −cents_prev) from the
    * predecessor's group — status 'F' is the tombstone (adds nothing, still
    * retracts its predecessor). Per key the deltas telescope to exactly the
    * latest live version, so the delta-path aggregate must equal the
    * snapshot aggregate — which is precisely what the oracle computes, from
    * the other direction: a delta/retraction bug cannot hash-match.
    *
    * Scale: the lag() window is partitioned BY KEY (per-key version chains,
    * never a global sort) and in a real deployment the deltas are the
    * changelog stream itself — the view updates by summing a delta batch
    * into the stored aggregate, never rescanning history. The final
    * aggregate is map-side combined over the 5-value priority domain.
    */
  def ivmAgg(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val chg = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_orderstatus"), col("o_orderpriority"),
        (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
      .withColumn("prev_status", lag(col("o_orderstatus"), 1).over(w))
      .withColumn("prev_priority", lag(col("o_orderpriority"), 1).over(w))
      .withColumn("prev_cents", lag(col("cents"), 1).over(w))
    val adds = chg.filter(col("o_orderstatus") =!= "F")
      .select(col("o_orderpriority").as("grp"),
        lit(1L).as("dn"), col("cents").as("dc"))
    val subs = chg
      .filter(col("prev_status").isNotNull && col("prev_status") =!= "F")
      .select(col("prev_priority").as("grp"),
        lit(-1L).as("dn"), (-col("prev_cents")).as("dc"))
    adds.union(subs)
      .groupBy(col("grp").as("o_orderpriority"))
      .agg(sum(col("dn")).as("n_customers"), sum(col("dc")).as("total_cents"))
      .filter(col("n_customers") =!= 0)
  }

  val ivmAggSql: String =
    """WITH l AS (SELECT *, row_number() OVER (PARTITION BY o_custkey
      |             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders),
      |last AS (SELECT * FROM l WHERE rn = 1 AND o_orderstatus <> 'F')
      |SELECT o_orderpriority, count(*) AS n_customers,
      |       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |            AS BIGINT) AS total_cents
      |FROM last GROUP BY 1""".stripMargin

  // ----------------------------------------------- sliding_distinct_users
  /** Trailing 7-day distinct users per active day — the sliding-window
    * distinct a DAU/WAU dashboard needs, computed by BOUNDED EXPANSION
    * instead of per-day rescans: each distinct (user, day) pair fans out to
    * the ≤ 7 report days it can contribute to (expansion factor =
    * window/slide, a constant — never data-sized), then one distinct
    * aggregation per report day. At 100 TB the same topology holds because
    * the expansion happens AFTER the (user, day) collapse (the first
    * map-side-combined distinct), and the trailing window never re-reads
    * raw events; swap the exact distinct for the KMV sketch
    * (`kmv_union_daily`) when estimates suffice.
    */
  def slidingDistinctUsers(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val days = du.select(col("day")).distinct()
      .withColumnRenamed("day", "report_day")
    du.select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("report_day"))
      .join(days, Seq("report_day"), "left_semi")
      .groupBy(col("report_day"))
      .agg(countDistinct(col("user_id")).as("n_users_7d"))
      .select(date_format(col("report_day"), "yyyy-MM-dd").as("report_day"),
        col("n_users_7d"))
  }

  val slidingDistinctUsersSql: String =
    """WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |days AS (SELECT DISTINCT day FROM du),
      |x AS (SELECT du.user_id, days.day AS report_day
      |      FROM du JOIN days ON days.day BETWEEN du.day AND du.day + 6)
      |SELECT strftime(report_day, '%Y-%m-%d') AS report_day,
      |       count(DISTINCT user_id) AS n_users_7d
      |FROM x GROUP BY 1""".stripMargin

  // ------------------------------------------------------ weighted_median
  /** Weighted median (lower) of the lineitem unit price in cents, weighted
    * by quantity, per return flag: the smallest price p where
    * 2·Σ_{price ≤ p} w ≥ W. Two scale moves: (1) the fact table collapses
    * to the (flag, cents) weight relation in one map-side-combined
    * aggregate BEFORE any ordering; (2) the running weight is the
    * range-partitioned two-pass prefix sum ([[graft.engine.Prefix]])
    * ordered by (flag, cents) — NOT a per-group window, which serializes
    * each group through one task (3 groups = 3 tasks sorting a third of
    * the value domain each; at fact scale that is the bottleneck). Group-
    * local cumulative = global prefix − the group's offset, where the
    * offsets come from a group-domain-sized (3-row) exclusive window over
    * group totals. Exact integer arithmetic end to end; the 2·cum ≥ W
    * cross-multiplication picks the crossing price per group.
    */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    // registered (round 11): the collapsed (flag, cents) weight relation
    // feeds THREE materializations — the prefix build's range-boundary
    // sampling, the range exchange itself, and the offsets branch — and
    // unregistered each one re-ran the full lineitem scan + aggregation
    // (profiled at sf0.1: the two dominant stages of the query were the
    // same collapsed agg computed twice). The relation is one row per
    // (flag, cents) — value-domain-bounded, far smaller than the fact
    // table — so the cache fill is the cheapest of the three passes.
    val collapsed = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        (dec(col("l_extendedprice")) * 100).cast("long").as("cents"),
        col("l_quantity").cast("long").as("w"))
      .groupBy(col("l_returnflag"), col("cents"))
      .agg(sum(col("w")).as("wsum"))
      .transform(graft.engine.QueryCaches.registered)
    val grpW = org.apache.spark.sql.expressions.Window
      .orderBy(col("l_returnflag"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // group totals + each group's global-prefix offset: 3 rows, the
    // single-partition window is group-domain-bounded (markov pattern)
    val offsets = collapsed.groupBy(col("l_returnflag"))
      .agg(sum(col("wsum")).as("tot"))
      .withColumn("goff", coalesce(sum(col("tot")).over(grpW), lit(0L)))
    graft.engine.Prefix.exclusiveCumsum(collapsed,
        Seq(col("l_returnflag"), col("cents")), col("wsum"), "gcum_ex")
      .join(broadcast(offsets), "l_returnflag")
      .withColumn("cum", col("gcum_ex") + col("wsum") - col("goff"))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("cents")).as("median_cents"), max(col("tot")).as("total_weight"))
  }

  val weightedMedianSql: String =
    """WITH c AS (SELECT l_returnflag,
      |             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wsum
      |           FROM lineitem GROUP BY 1, 2),
      |r AS (SELECT l_returnflag, cents,
      |        CAST(SUM(wsum) OVER (PARTITION BY l_returnflag ORDER BY cents
      |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |        CAST(SUM(wsum) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
      |      FROM c)
      |SELECT l_returnflag, min(cents) AS median_cents, max(tot) AS total_weight
      |FROM r WHERE cum * 2 >= tot GROUP BY 1""".stripMargin

  // --------------------------------------------------- weighted_quantiles
  /** Weighted quartiles (p25/p50/p75, lower) per return flag — the
    * multi-threshold generalization of [[weightedMedian]] on the SAME
    * collapsed + range-partitioned-prefix relation: row (g, v) is the
    * q-th quartile iff the running weight first crosses q·W/4 at v, i.e.
    * 4·cum ≥ q·W ∧ 4·(cum − w) < q·W — so ONE pass emits every quantile
    * via a 3-element array filter (no per-quantile rescan, no union of
    * three plans). Exact integer cross-multiplication throughout; at any
    * quantile-set size the cost is unchanged — the thresholds ride the
    * same prefix.
    */
  def weightedQuantiles(spark: SparkSession, dir: String): DataFrame = {
    // registered for the same three-materializations reason as
    // [[weightedMedian]]'s collapsed relation (round 11)
    val collapsed = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        (dec(col("l_extendedprice")) * 100).cast("long").as("cents"),
        col("l_quantity").cast("long").as("w"))
      .groupBy(col("l_returnflag"), col("cents"))
      .agg(sum(col("w")).as("wsum"))
      .transform(graft.engine.QueryCaches.registered)
    val grpW = org.apache.spark.sql.expressions.Window
      .orderBy(col("l_returnflag"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = collapsed.groupBy(col("l_returnflag"))
      .agg(sum(col("wsum")).as("tot"))
      .withColumn("goff", coalesce(sum(col("tot")).over(grpW), lit(0L)))
    graft.engine.Prefix.exclusiveCumsum(collapsed,
        Seq(col("l_returnflag"), col("cents")), col("wsum"), "gcum_ex")
      .join(broadcast(offsets), "l_returnflag")
      .withColumn("cum", col("gcum_ex") + col("wsum") - col("goff"))
      .withColumn("quartile", explode(filter(
        array(lit(1L), lit(2L), lit(3L)),
        q => col("cum") * 4 >= q * col("tot") &&
          (col("cum") - col("wsum")) * 4 < q * col("tot"))))
      .select(col("l_returnflag"), col("quartile"), col("cents").as("q_cents"))
  }

  val weightedQuantilesSql: String =
    """WITH c AS (SELECT l_returnflag,
      |             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wsum
      |           FROM lineitem GROUP BY 1, 2),
      |r AS (SELECT l_returnflag, cents, wsum,
      |        CAST(SUM(wsum) OVER (PARTITION BY l_returnflag ORDER BY cents
      |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |        CAST(SUM(wsum) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
      |      FROM c)
      |SELECT l_returnflag, CAST(q.q AS BIGINT) AS quartile, cents AS q_cents
      |FROM r CROSS JOIN (VALUES (1), (2), (3)) q(q)
      |WHERE cum * 4 >= q.q * tot AND (cum - wsum) * 4 < q.q * tot""".stripMargin

  // ----------------------------------------------------- seasonality_dow
  /** Day-of-week seasonal index of order revenue — the time-series
    * decomposition readout a monitoring pipeline baselines anomaly rules
    * on. ISO day numbering on both engines (Spark `weekday()+1` ==
    * DuckDB `isodow()`: Monday=1). index_bp = 10000·7·cents_d / total is
    * exact integer arithmetic; the total folds in as a broadcast 1-row
    * aggregate over the 7-row grouped relation (never a second fact scan).
    * One map-side-combined aggregate over the date-projected scan.
    */
  def seasonalityDow(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select((weekday(col("o_orderdate")) + 1).cast("long").as("dow"),
        (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
      .groupBy(col("dow"))
      .agg(sum(col("cents")).as("cents"), count(lit(1)).as("n_orders"))
    val tot = daily.agg(sum(col("cents")).as("total_cents"))
    daily.crossJoin(broadcast(tot))
      .select(col("dow"), col("n_orders"), col("cents"),
        expr("(10000 * 7 * cents) div total_cents").as("index_bp"))
  }

  val seasonalityDowSql: String =
    """WITH d AS (SELECT isodow(o_orderdate) AS dow,
      |             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |                  AS BIGINT) AS cents,
      |             count(*) AS n_orders
      |           FROM orders GROUP BY 1),
      |t AS (SELECT CAST(SUM(cents) AS BIGINT) AS total_cents FROM d)
      |SELECT dow, n_orders, cents,
      |       (10000 * 7 * cents) // total_cents AS index_bp
      |FROM d CROSS JOIN t""".stripMargin

  // -------------------------------------------------------- rfm_segments
  /** RFM segmentation — the classic customer-value partition (recency of
    * last order, order frequency, monetary total) with each dimension cut
    * into population quintiles and the 3-digit segment code `r*100+f*10+m`
    * (quintile 1 = most recent / most frequent / highest spend).
    *
    * Scale design: the per-customer triple is one map-side-combined
    * aggregate of orders; each quintile is a GLOBAL rank, computed with the
    * two-pass range-partitioned prefix ([[graft.engine.Prefix]] — never a
    * single-task `Window.orderBy`) plus the closed-form ntile bucket from
    * the broadcast 1-row population count (the `spend_deciles` idiom, k=5).
    * Three independent orderings = three range-sorts of a CUSTOMER-sized
    * relation (≪ the orders fact table), embarrassingly parallel each.
    * Money in integer cents; ranks tie-break on `o_custkey`.
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val per = o.groupBy(col("o_custkey")).agg(
      max(col("o_orderdate")).as("last_order"),
      count(lit(1)).as("frequency"),
      sum(dec(col("o_totalprice"))).as("monetary"))
    val snap = o.agg(max(col("o_orderdate")).as("snap"))
    val base = per.crossJoin(broadcast(snap))
      .withColumn("recency_days",
        datediff(col("snap"), col("last_order")).cast("long"))
      .withColumn("monetary_cents", expr("CAST(monetary * 100 AS BIGINT)"))
      .select("o_custkey", "recency_days", "frequency", "monetary_cents")
    val n1 = base.agg(count(lit(1)).as("n"))
    def ntile5(rankCol: String): Column = expr(
      s"CASE WHEN $rankCol + 1 <= (n % 5) * (n div 5 + 1) " +
        s"THEN $rankCol div (n div 5 + 1) + 1 " +
        s"ELSE (n % 5) + ($rankCol - (n % 5) * (n div 5 + 1)) div (n div 5) + 1 END")
    def quintile(df: DataFrame, ord: Seq[Column], out: String): DataFrame =
      graft.engine.Prefix.exclusiveCumsum(df, ord, lit(1L), "__r")
        .withColumn(out, ntile5("__r")).drop("__r")
    val r = quintile(base.crossJoin(broadcast(n1)),
      Seq(col("recency_days").asc, col("o_custkey").asc), "r_q")
    val f = quintile(r, Seq(col("frequency").desc, col("o_custkey").asc), "f_q")
    val m = quintile(f, Seq(col("monetary_cents").desc, col("o_custkey").asc), "m_q")
    m.select(col("o_custkey"), col("recency_days"), col("frequency"),
      col("monetary_cents"), col("r_q").cast("long").as("r_q"),
      col("f_q").cast("long").as("f_q"), col("m_q").cast("long").as("m_q"),
      (col("r_q") * 100 + col("f_q") * 10 + col("m_q")).cast("long").as("rfm"))
  }

  val rfmSegmentsSql: String =
    """WITH per AS (SELECT o_custkey,
      |    date_diff('day', CAST(max(o_orderdate) AS DATE),
      |      (SELECT CAST(max(o_orderdate) AS DATE) FROM orders)) AS recency_days,
      |    count(*) AS frequency,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS monetary_cents
      |  FROM orders GROUP BY o_custkey),
      |q AS (SELECT *,
      |    ntile(5) OVER (ORDER BY recency_days, o_custkey) AS r_q,
      |    ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_q,
      |    ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey) AS m_q
      |  FROM per)
      |SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
      |       frequency, monetary_cents,
      |       CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
      |       CAST(m_q AS BIGINT) AS m_q,
      |       CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT) AS rfm
      |FROM q""".stripMargin

  // ------------------------------------------------- q3_shipping_priority
  /** TPC-H Q3-shaped shipping-priority readout: unshipped-as-of-cutoff
    * revenue per order for one market segment, top 10. The headline
    * join-planning query: customer (segment-filtered) is a dimension —
    * broadcast both fact joins so the lineitem scan never shuffles; the
    * date predicates and segment filter all push to the parquet scans
    * (check PushedFilters); revenue is exact DECIMAL(18,2), surfaced in
    * cents so the top-10 cut is an integer total order with o_orderkey
    * as the deterministic tie-break. At 100 TB the only exchange is the
    * final aggregate on o_orderkey — already co-partitioned with the
    * probe output — and the top-10 is a TakeOrdered, not a global sort.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cut = "TIMESTAMP '1998-03-15 00:00:00'"
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val ord = Tables.orders(spark, dir)
      .filter(expr(s"o_orderdate < $cut"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val li = Tables.lineitem(spark, dir)
      .filter(expr(s"l_shipdate > $cut"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(broadcast(ord.join(broadcast(cust),
        col("o_custkey") === col("c_custkey")).drop("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(floor(sum(discPrice) * 100).cast("long").as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("o_orderkey"))
      .limit(10)
  }

  val q3ShippingPrioritySql: String =
    """SELECT o_orderkey, o_orderdate, o_orderpriority,
      |       CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * (1 - CAST(l_discount AS DECIMAL(9,4)))) * 100) AS BIGINT)
      |         AS revenue_cents
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue_cents DESC, o_orderkey LIMIT 10""".stripMargin

  // ------------------------------------------------- item_similarity_topk
  /** Item-to-item collaborative filtering: each part's 5 most-similar
    * parts by co-purchase cosine, sim²(a,b) = n_ab² / (n_a·n_b), kept in
    * exact integer 1e8 fixed point (squaring avoids the sqrt — it is
    * monotone, so the ranking is identical). The "customers also bought"
    * recommender readout.
    *
    * Scale shape (shared with [[copurchasePairs]]): the (order, part)
    * projection is distinct-collapsed and persisted once; the self-join
    * keys on the order (co-located, pairs bounded by basket size squared,
    * never corpus size); supports are part-cardinality; the per-part
    * top-5 is a rank window that Spark rewrites to a partial group-limit
    * before the exchange, so only ≤ 5·|parts| candidate rows shuffle.
    */
  def itemSimilarityTopk(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().transform(graft.engine.QueryCaches.registered)
    // registered (round 11): sup feeds two broadcast attaches whose rename
    // projections never canonicalize equal, so unregistered the support
    // aggregation over the basket cache ran twice
    val sup = li.groupBy(col("pk")).agg(count(lit(1)).as("n"))
      .transform(graft.engine.QueryCaches.registered)
    // registered (round 11): the symmetrization union reads `half` twice,
    // and unregistered each branch re-ran the FULL basket self-join + pair
    // aggregation — the query's most expensive subtree, profiled at sf0.1
    // as two identical ~12.6 MB-shuffle-write stages. The cached relation
    // is candidates-only (n_ab >= 2), far smaller than the join stream.
    val half = li.as("a").join(li.as("b"), Seq("ok"))
      .filter(col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
      .transform(graft.engine.QueryCaches.registered)
    val sym = half.unionByName(
      half.select(col("pb").as("pa"), col("pa").as("pb"), col("n_ab")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pa"))
      .orderBy(col("sim2_e8").desc, col("pb").asc)
    sym
      .join(sup.select(col("pk").as("pa"), col("n").as("n_a")), "pa")
      .join(sup.select(col("pk").as("pb"), col("n").as("n_b")), "pb")
      .withColumn("sim2_e8", expr("(n_ab * n_ab * 100000000) div (n_a * n_b)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("pa").as("part_a"), col("pb").as("part_b"),
        col("n_ab"), col("n_a"), col("n_b"), col("sim2_e8"),
        col("rn").cast("long").as("rn"))
  }

  val itemSimilarityTopkSql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |sup AS (SELECT pk, count(*) AS n FROM li GROUP BY 1),
      |half AS (SELECT a.pk AS pa, b.pk AS pb, count(*) AS n_ab
      |         FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      |         GROUP BY 1, 2 HAVING count(*) >= 2),
      |sym AS (SELECT pa, pb, n_ab FROM half
      |        UNION ALL SELECT pb, pa, n_ab FROM half),
      |scored AS (SELECT pa, pb, n_ab, sa.n AS n_a, sb.n AS n_b,
      |                  (n_ab * n_ab * 100000000) // (sa.n * sb.n) AS sim2_e8
      |           FROM sym JOIN sup sa ON pa = sa.pk JOIN sup sb ON pb = sb.pk)
      |SELECT pa AS part_a, pb AS part_b, n_ab, n_a, n_b, sim2_e8,
      |       CAST(rn AS BIGINT) AS rn
      |FROM (SELECT *, row_number() OVER (PARTITION BY pa
      |        ORDER BY sim2_e8 DESC, pb ASC) AS rn FROM scored)
      |WHERE rn <= 5""".stripMargin

  // ---------------------------------------------------- q18_large_orders
  /** TPC-H Q18-shaped large-volume-order readout: orders whose total
    * quantity clears a threshold, with the owning customer. The classic
    * agg-filter-then-join headline: the lineitem aggregate runs FIRST
    * (partial+final sum on l_orderkey — map-side combine collapses the
    * ~4-rows-per-key fact before the exchange), the survivors are a tiny
    * fraction (~1% at threshold 250), and both subsequent joins probe that
    * small set — orders joins it broadcast, and the customer dim joins the
    * result broadcast. At 100 TB the lineitem table is touched exactly
    * once, by the aggregate, reading two columns.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("qty"))
      .filter(col("qty") > 250)
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        (dec(col("o_totalprice")) * 100).cast("long").as("total_cents"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_name"))
    ord.join(broadcast(bigOrders), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("total_cents"),
        // floor BEFORE the long cast: Spark's decimal→long truncates toward
        // zero while DuckDB's CAST rounds half away — explicit FLOOR on both
        // sides pins one semantics (the q3/q7/q10 convention)
        floor(col("qty")).cast("long").as("sum_qty"))
  }

  val q18LargeOrdersSql: String =
    """WITH big AS (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      |             FROM lineitem GROUP BY 1
      |             HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
      |SELECT c_name, c_custkey, o_orderkey, o_orderdate,
      |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_cents,
      |       CAST(FLOOR(qty) AS BIGINT) AS sum_qty
      |FROM orders JOIN big ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey""".stripMargin

  // ------------------------------------------------- q7_nation_volume
  /** TPC-H Q7-shaped bilateral trade volume: revenue between one nation
    * pair, per direction per ship year. The fact–fact join (lineitem ⋈
    * orders) is the interesting planning problem: both sides are first
    * SEMI-REDUCED by the broadcast nation-filtered dims — lineitem keeps
    * only the pair's suppliers' lines (~2/25), orders only the pair's
    * customers' orders (~2/25) — so the one unavoidable shuffle join
    * moves ~8% of each table, not the full facts. The pair predicate,
    * date range, and the cross-filter (supp ≠ cust nation) all sit
    * before the exchange.
    */
  def q7NationVolume(spark: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_3", "NATION_7")
    val nat = Tables.nation(spark, dir)
      .filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("supp_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"),
        floor(discPrice * 100).cast("long").as("cents"))
    val ord = Tables.orders(spark, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("cents")).as("revenue_cents"), count(lit(1)).as("n_lines"))
  }

  val q7NationVolumeSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |       CAST(SUM(CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * (1 - CAST(l_discount AS DECIMAL(9,4))) * 100) AS BIGINT))
      |            AS BIGINT) AS revenue_cents,
      |       COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE n1.n_name IN ('NATION_3', 'NATION_7')
      |  AND n2.n_name IN ('NATION_3', 'NATION_7')
      |  AND n1.n_name != n2.n_name
      |  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1, 2, 3""".stripMargin

  // ------------------------------------------------ q16_supplier_counts
  /** TPC-H Q16-shaped supplier-diversity count, deliberately written as
    * SQL TEXT with a `NOT IN (subquery)` — the one relational idiom the
    * surface had not exercised: Catalyst must plan the null-aware anti
    * join itself (reference has no SQL surface; TPC-H Q16 pattern,
    * `ps_suppkey NOT IN (SELECT s_suppkey … complaints)`). Supplier
    * "complaints" analog: negative account balance. Scale shape: the
    * distinct (part, supplier) relation is the only fact-sized exchange;
    * the excluded-supplier set is dimension-sized and broadcast (Spark
    * plans NOT IN as BroadcastHashJoin LeftAnti, null-aware — legal here
    * because `s_suppkey` is non-null; a nullable column would demand the
    * full null-aware fallback), and the filtered part dim broadcasts
    * into the probe. PlansSpec asserts the anti join stays broadcast.
    */
  def q16SupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("q16_lineitem_v")
    Tables.supplier(spark, dir).createOrReplaceTempView("q16_supplier_v")
    Tables.part(spark, dir).createOrReplaceTempView("q16_part_v")
    spark.sql(
      """SELECT p_brand, p_type, p_size,
        |       count(DISTINCT ps.l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM q16_lineitem_v) ps
        |JOIN q16_part_v ON p_partkey = ps.l_partkey
        |WHERE p_brand <> 'BRAND_1'
        |  AND p_size <= 25
        |  AND ps.l_suppkey NOT IN
        |      (SELECT s_suppkey FROM q16_supplier_v WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin)
  }

  val q16SupplierCountsSql: String =
    """SELECT p_brand, p_type, p_size,
      |       count(DISTINCT ps.l_suppkey) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part ON p_partkey = ps.l_partkey
      |WHERE p_brand <> 'BRAND_1'
      |  AND p_size <= 25
      |  AND ps.l_suppkey NOT IN
      |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size""".stripMargin

  // ------------------------------------------------ q2_min_cost_supplier
  /** TPC-H Q2-shaped cheapest-supplier lookup via a CORRELATED scalar
    * subquery in SQL text (`cost = (SELECT min(cost) … WHERE same
    * part)`) — Catalyst de-correlates it into an aggregate + equi-join
    * (reference: Q2's `ps_supplycost = (SELECT min(ps_supplycost) …)`).
    * The offers relation (cheapest line per part–supplier, standing in
    * for partsupp) is aggregated once and feeds both the probe and the
    * de-correlated min — group-domain-sized, so the correlated idiom
    * costs one extra aggregate over an already-collapsed relation, not
    * a rescan of lineitem. Ties (two suppliers at the min) emit both
    * rows in both engines — deterministic without a tiebreak.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("q2_lineitem_v")
    Tables.part(spark, dir).createOrReplaceTempView("q2_part_v")
    spark.sql(
      """WITH offers AS (
        |  SELECT l_partkey, l_suppkey,
        |         min(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |           AS cost_cents
        |  FROM q2_lineitem_v GROUP BY l_partkey, l_suppkey)
        |SELECT p.p_partkey, p.p_brand, o.l_suppkey AS suppkey, o.cost_cents
        |FROM q2_part_v p JOIN offers o ON o.l_partkey = p.p_partkey
        |WHERE p.p_size = 1
        |  AND o.cost_cents = (SELECT min(o2.cost_cents) FROM offers o2
        |                      WHERE o2.l_partkey = p.p_partkey)""".stripMargin)
  }

  val q2MinCostSupplierSql: String =
    """WITH offers AS (
      |  SELECT l_partkey, l_suppkey,
      |         min(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |           AS cost_cents
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)
      |SELECT p.p_partkey, p.p_brand, o.l_suppkey AS suppkey, o.cost_cents
      |FROM part p JOIN offers o ON o.l_partkey = p.p_partkey
      |WHERE p.p_size = 1
      |  AND o.cost_cents = (SELECT min(o2.cost_cents) FROM offers o2
      |                      WHERE o2.l_partkey = p.p_partkey)""".stripMargin

  // ------------------------------------------------ q10_returned_items
  /** TPC-H Q10-shaped lost-revenue readout: the top-20 customers by
    * revenue on RETURNED items in one quarter. Join-order inversion is
    * the point: the textbook plan joins customer and nation before
    * aggregating; here the (quarter-filtered, broadcast) orders probe
    * the returnflag-pruned lineitem scan, the aggregate + top-20 cut
    * runs on bare custkeys, and THEN the 20 survivors join the
    * dimensions — at 100 TB the customer table is probed by exactly 20
    * rows instead of participating in the fact shuffle. Both filters
    * are in PushedFilters; the cut is a TakeOrdered, not a sort.
    */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-04-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), floor(discPrice * 100).cast("long").as("cents"))
    val top = li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("cents")).as("revenue_cents"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue_cents").desc, col("o_custkey")).limit(20)
    top.join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("revenue_cents"), col("n_items"),
        (dec(col("c_acctbal")) * 100).cast("long").as("acctbal_cents"))
  }

  val q10ReturnedItemsSql: String =
    """WITH top AS (
      |  SELECT o_custkey,
      |         CAST(SUM(CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(18,2))
      |              * (1 - CAST(l_discount AS DECIMAL(9,4))) * 100) AS BIGINT))
      |           AS BIGINT) AS revenue_cents,
      |         COUNT(*) AS n_items
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag = 'R'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1 ORDER BY revenue_cents DESC, o_custkey LIMIT 20)
      |SELECT c_custkey, c_name, n_name, revenue_cents, n_items,
      |       CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS acctbal_cents
      |FROM top JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey""".stripMargin

  // ------------------------------------------------------------ ivm_join
  /** Delta-rule incremental maintenance of a JOIN view — the DBSP /
    * differential-dataflow identity Δ(R ⋈ S) = ΔR⋈S₀ ∪ R₀⋈ΔS ∪ ΔR⋈ΔS,
    * applied to the per-nation revenue view over orders ⋈ customer. The
    * fixtures are split deterministically into a base snapshot and a
    * delta batch on each side (orders: okey%10=0 is new; customer:
    * ckey%20=0 is new); the query computes the view as base-view + the
    * three delta joins and re-aggregates. The oracle computes the full
    * snapshot join directly — a hash match proves the delta decomposition
    * loses and double-counts nothing.
    *
    * Scale shape: this is the operation that replaces re-joining 100 TB
    * on every ingest tick. Base-side aggregates collapse to per-nation
    * partials (25 rows); only the delta batches — the small, new data —
    * participate in joins, and the dimension sides broadcast.
    */
  def ivmJoin(spark: SparkSession, dir: String): DataFrame = {
    val ordAll = Tables.orders(spark, dir).select(col("o_orderkey"),
      col("o_custkey"), (dec(col("o_totalprice")) * 100).cast("long").as("cents"))
    val custAll = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val nat = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    val ordBase  = ordAll.filter(col("o_orderkey") % 10 =!= 0)
    val ordDelta = ordAll.filter(col("o_orderkey") % 10 === 0)
    val custBase  = custAll.filter(col("c_custkey") % 20 =!= 0)
    val custDelta = custAll.filter(col("c_custkey") % 20 === 0)
    def view(o: DataFrame, c: DataFrame) = o
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(sum(col("cents")).as("cents"), count(lit(1)).as("n"))
    val folded = view(ordBase, custBase)     // V₀: maintained materialization
      .unionByName(view(ordDelta, custBase)) // ΔR ⋈ S₀
      .unionByName(view(ordBase, custDelta)) // R₀ ⋈ ΔS
      .unionByName(view(ordDelta, custDelta))// ΔR ⋈ ΔS
      .groupBy(col("c_nationkey"))
      .agg(sum(col("cents")).as("revenue_cents"), sum(col("n")).as("n_orders"))
    folded.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("revenue_cents"), col("n_orders"))
  }

  val ivmJoinSql: String =
    """SELECT n_name,
      |       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
      |         AS revenue_cents,
      |       COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin
}
