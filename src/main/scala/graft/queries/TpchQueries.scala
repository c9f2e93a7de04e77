package graft.queries

import graft.engine.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The remaining TPC-H query shapes (q4, q6, q8, q9, q11–q15, q17,
  * q19–q22), completing the 22-query suite started in
  * [[AnalyticsQueries]] (q1/q2/q3/q5/q7/q10/q16/q18). The reference has
  * no SQL surface at all (SURVEY.md §2.10) — this file exists because a
  * Spark engine claiming "complete analytics" must cover every classic
  * relational idiom: EXISTS/NOT EXISTS correlation (q4, q21), nested
  * IN + HAVING (q20), scalar subqueries over a CTE (q11, q15, q22),
  * disjunctive join predicates (q19), left-join count distributions
  * (q13), conditional aggregation (q12, q14), and decorrelated
  * per-group thresholds (q17).
  *
  * The driver fixtures are TPC-H-ish but trimmed (TESTDATA.md): no
  * partsupp, no l_commitdate/l_receiptdate/l_shipmode, no c_phone.
  * Each query keeps its shape (the join/subquery topology and the plan
  * Catalyst must find) and substitutes the nearest available predicate;
  * the substitution is documented per query.
  *
  * Exactness conventions (shared with AnalyticsQueries): money through
  * DECIMAL(18,2) then FLOOR to integer cents before any long cast;
  * ratios in integer basis points via integer division; every DuckDB
  * SUM/`//` wrapped in CAST(… AS BIGINT) (HUGEINT parity, round-3
  * verdict); no floating-point aggregate ever reaches a verified column.
  */
object TpchQueries {

  private def dec(c: Column) = c.cast(DecimalType(18, 2))

  private def discPrice =
    dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(9, 4)) - col("l_discount").cast(DecimalType(9, 4)))

  private val discPriceSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(9,4)))"

  /** Integer cents of one discounted line — floored on BOTH engines so the
    * per-line value is a bit-exact BIGINT before any sum.
    */
  private def lineCents = floor(discPrice * 100).cast("long")
  private val lineCentsSql =
    s"CAST(FLOOR($discPriceSql * 100) AS BIGINT)"

  // ------------------------------------------------------ q4_order_priority
  /** TPC-H Q4: priority distribution of orders that had at least one LATE
    * line in a quarter. Written as SQL text with a correlated EXISTS — the
    * positive twin of q16's NOT IN — which Catalyst plans as a left SEMI
    * join on l_orderkey. Late-line stand-in (no l_commitdate /
    * l_receiptdate in the fixture): shipped > 30 days after the order date.
    *
    * Scale shape: the semi join keys on l_orderkey — the same key the
    * lineitem exchange would use anyway — and the quarter filter lands in
    * the orders scan (PushedFilters), so at 100 TB the probe side is one
    * quarter of orders, the build side dedups lineitem to order keys, and
    * the output aggregate is 5 rows. Semi-join semantics (not inner +
    * distinct) means multi-late-line orders count once, for free.
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("q4_orders_v")
    Tables.lineitem(spark, dir).createOrReplaceTempView("q4_lineitem_v")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM q4_orders_v
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM q4_lineitem_v
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority""".stripMargin)
  }

  val q4OrderPrioritySql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------- q6_forecast_revenue
  /** TPC-H Q6: the no-join pushdown showcase — one scan, three pushed
    * predicates, one global sum. Revenue that WOULD have been earned had
    * mid-band discounts been dropped: sum(price × discount) for one ship
    * year, discount in [0.05, 0.07], quantity < 24.
    *
    * Scale shape: at 100 TB this reads exactly 4 columns of lineitem with
    * all three range predicates in PushedFilters (parquet row-group stats
    * skip most of the file on l_shipdate), partial-aggregates map-side to
    * one row per task, and moves 32 rows total. The discount band compares
    * in DECIMAL(9,4) — comparing raw doubles to 0.05/0.07 literals would
    * be representation-dependent; the decimal cast pins both engines to
    * the same band edges.
    */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    val d = col("l_discount").cast(DecimalType(9, 4))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_quantity") < 24)
      .filter(d >= lit("0.05").cast(DecimalType(9, 4)) &&
        d <= lit("0.07").cast(DecimalType(9, 4)))
      .agg(
        sum(floor(dec(col("l_extendedprice")) * d * 100).cast("long"))
          .as("forecast_cents"),
        count(lit(1)).as("n_lines"))
  }

  val q6ForecastRevenueSql: String =
    """SELECT CAST(SUM(CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * CAST(l_discount AS DECIMAL(9,4)) * 100) AS BIGINT))
      |            AS BIGINT) AS forecast_cents,
      |       count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_quantity < 24
      |  AND CAST(l_discount AS DECIMAL(9,4)) BETWEEN 0.05 AND 0.07""".stripMargin

  // ------------------------------------------------------- q8_market_share
  /** TPC-H Q8: one nation's share of PROMO-part revenue sold to one
    * region's customers, per order year. The deepest join tree in the
    * suite (lineitem ⋈ part ⋈ supplier→nation ⋈ orders ⋈ customer→nation
    * →region); share surfaced in integer basis points.
    *
    * Scale shape: every dimension chain collapses to a broadcast BEFORE
    * touching a fact — part is filtered to 1/6 and broadcast into the
    * lineitem scan, the customer→nation→region chain (1/5 of customers)
    * broadcasts into orders — so the single shuffle is the residual
    * lineitem ⋈ orders fact join on l_orderkey, both sides pre-reduced.
    * The share division is integer-exact: no float crosses the wire.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir)
    val promoParts = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val regionCust = Tables.customer(spark, dir)
      .join(broadcast(nat.join(broadcast(
          Tables.region(spark, dir).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
      .join(broadcast(regionCust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    Tables.lineitem(spark, dir)
      .join(broadcast(promoParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("supp_nation"), lineCents.as("cents"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_3", col("cents")).otherwise(0L))
          .as("nation_cents"),
        sum(col("cents")).as("total_cents"))
      .withColumn("share_bp",
        expr("(nation_cents * 10000) div total_cents"))
  }

  val q8MarketShareSql: String =
    s"""WITH flat AS (
       |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |         n1.n_name AS supp_nation,
       |         $lineCentsSql AS cents
       |  FROM lineitem
       |  JOIN part     ON p_partkey = l_partkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
       |  JOIN orders   ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
       |  JOIN region   ON r_regionkey = n2.n_regionkey
       |  WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
       |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
       |SELECT o_year,
       |       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END)
       |            AS BIGINT) AS nation_cents,
       |       CAST(SUM(cents) AS BIGINT) AS total_cents,
       |       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END)
       |            * 10000 // SUM(cents) AS BIGINT) AS share_bp
       |FROM flat GROUP BY o_year""".stripMargin

  // ----------------------------------------------------- q9_product_profit
  /** TPC-H Q9: profit by supplier nation × order year over one part
    * family. Without partsupp, line cost stands in as half the part's
    * retail price × quantity (deterministic, decimal-exact); the part
    * family predicate keeps Q9's `p_name LIKE '%color%'` shape against
    * the fixture's color-word part names (`'%red%'`).
    *
    * Scale shape: the filtered part dim and the supplier→nation chain
    * broadcast into lineitem; orders joins on l_orderkey purely to read
    * the year. Profit is a per-line integer (cents) before the sum, so
    * partial aggregation is exact and the group domain is |nations|×|years|.
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir)
      .filter(col("p_name").like("%red%"))
      .select(col("p_partkey"),
        // half retail in cents: integer once, exact forever
        floor(dec(col("p_retailprice")) * 50).cast("long").as("half_retail_cents"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    Tables.lineitem(spark, dir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("nation"),
        (lineCents - col("half_retail_cents") * floor(col("l_quantity")).cast("long"))
          .as("profit_cents"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), col("o_year"))
      .agg(sum(col("profit_cents")).as("profit_cents"),
        count(lit(1)).as("n_lines"))
  }

  val q9ProductProfitSql: String =
    s"""SELECT n_name AS nation,
       |       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |       CAST(SUM($lineCentsSql
       |                - CAST(FLOOR(CAST(p_retailprice AS DECIMAL(18,2)) * 50) AS BIGINT)
       |                  * CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS profit_cents,
       |       count(*) AS n_lines
       |FROM lineitem
       |JOIN part     ON p_partkey = l_partkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN nation   ON n_nationkey = s_nationkey
       |JOIN orders   ON o_orderkey = l_orderkey
       |WHERE p_name LIKE '%red%'
       |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------- q11_important_stock
  /** TPC-H Q11: parts whose traded value through one nation's suppliers
    * exceeds 0.1% of that nation's total — SQL text with a scalar
    * subquery over a shared CTE (value-per-part computed once, read by
    * both the probe and the global threshold; lineitem value stands in
    * for ps_supplycost × ps_availqty).
    *
    * Scale shape: Catalyst plans the scalar as a one-row broadcast
    * (Subquery, reused result), so the CTE's fact-sized aggregate runs
    * once; the HAVING probe is a per-row compare against the broadcast
    * scalar. Threshold math is integer: value // 1000 of a BIGINT sum.
    */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("q11_lineitem_v")
    Tables.supplier(spark, dir).createOrReplaceTempView("q11_supplier_v")
    Tables.nation(spark, dir).createOrReplaceTempView("q11_nation_v")
    spark.sql(
      """WITH val AS (
        |  SELECT l_partkey,
        |         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |           AS value_cents
        |  FROM q11_lineitem_v
        |  JOIN q11_supplier_v ON s_suppkey = l_suppkey
        |  WHERE s_nationkey IN
        |        (SELECT n_nationkey FROM q11_nation_v WHERE n_name = 'NATION_3')
        |  GROUP BY l_partkey)
        |SELECT l_partkey, value_cents
        |FROM val
        |WHERE value_cents > (SELECT SUM(value_cents) DIV 1000 FROM val)""".stripMargin)
  }

  val q11ImportantStockSql: String =
    """WITH val AS (
      |  SELECT l_partkey,
      |         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |              AS BIGINT) AS value_cents
      |  FROM lineitem
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  WHERE s_nationkey IN
      |        (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')
      |  GROUP BY l_partkey)
      |SELECT l_partkey, value_cents
      |FROM val
      |WHERE value_cents > (SELECT CAST(SUM(value_cents) // 1000 AS BIGINT) FROM val)""".stripMargin

  // --------------------------------------------------------- q12_ship_delay
  /** TPC-H Q12: order-priority mix by shipping-delay class. Without
    * l_shipmode/l_receiptdate, the two "modes" are order-to-ship delay
    * bands (line shipped ≤ 60 / > 60 days after its order date) and the
    * counted split is Q12's verbatim high-priority (URGENT|HIGH) vs low.
    * Pure conditional aggregation over the one fact–fact join.
    *
    * Scale shape: one shuffle (l_orderkey ⋈ o_orderkey); the year filter
    * prunes lineitem at the scan; the CASE sums fold map-side into 2
    * groups × 2 counters. At 100 TB this is scan-bound by design.
    */
  def q12ShipDelay(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .select(col("l_orderkey"), col("l_shipdate"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_class",
        when(datediff(col("l_shipdate").cast("date"),
          col("o_orderdate").cast("date")) <= 60, "FAST").otherwise("SLOW"))
      .groupBy(col("delay_class"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
  }

  val q12ShipDelaySql: String =
    """SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
      |                           CAST(l_shipdate AS DATE)) <= 60
      |            THEN 'FAST' ELSE 'SLOW' END AS delay_class,
      |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1""".stripMargin

  // ------------------------------------------------ q13_customer_distribution
  /** TPC-H Q13: the customer-order-count histogram — a LEFT join with a
    * predicate in the ON clause (priority ≠ 5-LOW), so customers with no
    * qualifying orders survive as count 0, then a second aggregation over
    * the count domain. The two-level aggregate is the shape: fact-sized
    * group-by custkey, then a ~50-row group-by count.
    *
    * Scale shape: the ON-clause filter prunes orders BEFORE the join
    * (pushed to the scan); the first aggregate is co-partitioned with the
    * join's exchange; the second moves one row per distinct count.
    */
  def q13CustomerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select(col("c_custkey"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "5-LOW")
      .select(col("o_custkey"), col("o_orderkey"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  val q13CustomerDistributionSql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer
      |      LEFT JOIN orders ON c_custkey = o_custkey
      |                      AND o_orderpriority <> '5-LOW'
      |      GROUP BY c_custkey)
      |GROUP BY c_count""".stripMargin

  // ------------------------------------------------------- q14_promo_revenue
  /** TPC-H Q14: promo parts' share of one month's revenue, in integer
    * basis points (Q14 computes `100 * promo / total` in decimal; the
    * fixed-point form is the same number ×100, bit-exact across engines).
    *
    * Scale shape: the part dim broadcasts into the month-pruned lineitem
    * scan; one global conditional sum — no shuffle beyond the 1-row final
    * aggregate. p_type is the fixture's literal 'PROMO' family.
    */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-09-01") &&
        col("l_shipdate") < lit("1996-10-01"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", lineCents).otherwise(0L))
          .as("promo_cents"),
        sum(lineCents).as("total_cents"))
      .withColumn("promo_share_bp",
        expr("(promo_cents * 10000) div total_cents"))
  }

  val q14PromoRevenueSql: String =
    s"""SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $lineCentsSql ELSE 0 END)
       |            AS BIGINT) AS promo_cents,
       |       CAST(SUM($lineCentsSql) AS BIGINT) AS total_cents,
       |       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $lineCentsSql ELSE 0 END)
       |            * 10000 // SUM($lineCentsSql) AS BIGINT) AS promo_share_bp
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
       |  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'""".stripMargin

  // -------------------------------------------------------- q15_top_supplier
  /** TPC-H Q15: the supplier(s) with maximum revenue in one quarter — the
    * view + scalar-max idiom in SQL text. The revenue CTE stands in for
    * Q15's `revenue0` view; the max comes back as a scalar subquery, so
    * ties emit every tied supplier (Q15's documented semantics) without
    * any tiebreak.
    *
    * Scale shape: the CTE aggregates the quarter-pruned fact once
    * (map-side partials on l_suppkey); the scalar max is a one-row
    * broadcast over the supplier-domain-sized CTE; the supplier dim join
    * probes with the (usually single) survivor.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("q15_lineitem_v")
    Tables.supplier(spark, dir).createOrReplaceTempView("q15_supplier_v")
    spark.sql(
      s"""WITH rev AS (
         |  SELECT l_suppkey, SUM($lineCentsSql) AS total_cents
         |  FROM q15_lineitem_v
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_cents
         |FROM q15_supplier_v JOIN rev ON s_suppkey = l_suppkey
         |WHERE total_cents = (SELECT max(total_cents) FROM rev)""".stripMargin)
  }

  val q15TopSupplierSql: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey, CAST(SUM($lineCentsSql) AS BIGINT) AS total_cents
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_cents
       |FROM supplier JOIN rev ON s_suppkey = l_suppkey
       |WHERE total_cents = (SELECT max(total_cents) FROM rev)""".stripMargin

  // ----------------------------------------------------- q17_small_quantity
  /** TPC-H Q17: revenue lost to small-quantity orders of one brand —
    * lines whose quantity is under half the part's average. The
    * correlated `l_quantity < 0.2 * avg(...)` is decorrelated by hand
    * into a per-part aggregate + join (Catalyst performs the same
    * rewrite on the SQL form; q2 already pins the correlated idiom), and
    * the threshold compare is integer-exact: qty×2×n < Σqty instead of a
    * float average (fixture quantities are integral; FLOOR pins it).
    *
    * Scale shape: brand-filtered part broadcasts into lineitem TWICE
    * (threshold build + probe) — both scans prune to the brand's ~1/25
    * of the fact via the broadcast hash — and the per-part aggregate is
    * part-domain-sized. Q17's final /7 divisor kept, integer div.
    */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val brandParts = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#3").select(col("p_partkey"))
    val qtyInt = floor(col("l_quantity")).cast("long")
    val branded = Tables.lineitem(spark, dir)
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
    val thresholds = branded
      .groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum(qtyInt).as("sum_qty"), count(lit(1)).as("n_lines"))
    branded
      .join(broadcast(thresholds), col("l_partkey") === col("t_partkey"))
      .filter(qtyInt * 2 * col("n_lines") < col("sum_qty"))
      .agg((sum(lineCents) / lit(7)).cast("long").as("avg_yearly_cents"),
        count(lit(1)).as("n_small_lines"))
  }

  val q17SmallQuantitySql: String =
    s"""WITH branded AS (
       |  SELECT l_partkey, CAST(FLOOR(l_quantity) AS BIGINT) AS qty,
       |         $lineCentsSql AS cents
       |  FROM lineitem JOIN part ON p_partkey = l_partkey
       |  WHERE p_brand = 'Brand#3'),
       |thresholds AS (
       |  SELECT l_partkey AS t_partkey,
       |         CAST(SUM(qty) AS BIGINT) AS sum_qty,
       |         count(*) AS n_lines
       |  FROM branded GROUP BY 1)
       |SELECT CAST(FLOOR(CAST(SUM(cents) AS BIGINT) / 7.0) AS BIGINT)
       |         AS avg_yearly_cents,
       |       count(*) AS n_small_lines
       |FROM branded JOIN thresholds ON l_partkey = t_partkey
       |WHERE qty * 2 * n_lines < sum_qty""".stripMargin

  // -------------------------------------------------------- q19_disjunctive
  /** TPC-H Q19: the disjunctive-predicate join — three (brand, size,
    * quantity-band) conjunct groups OR'd together over lineitem ⋈ part.
    * The planning point: Catalyst factors the common `l_partkey =
    * p_partkey` out of the disjunction into a hash-join key (a naive
    * planner nests the whole OR into a cartesian filter), leaving the
    * per-branch residual as the join filter.
    *
    * Scale shape: part broadcasts; the returnflag filter and quantity
    * upper bound (< 31, implied by all branches) push to the lineitem
    * scan; the disjunction evaluates codegen'd post-probe. One shuffle
    * (the 1-row final agg).
    */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "N" && col("l_quantity") < 31)
    val part = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val qty = col("l_quantity")
    val branch = (col("p_brand") === "Brand#1" && col("p_size") <= 10 &&
        qty >= 1 && qty <= 11) ||
      (col("p_brand") === "Brand#2" && col("p_size") <= 20 &&
        qty >= 10 && qty <= 20) ||
      (col("p_brand") === "Brand#3" && col("p_size") <= 30 &&
        qty >= 20 && qty <= 30)
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(branch)
      .agg(sum(lineCents).as("revenue_cents"), count(lit(1)).as("n_lines"))
  }

  val q19DisjunctiveSql: String =
    s"""SELECT CAST(SUM($lineCentsSql) AS BIGINT) AS revenue_cents,
       |       count(*) AS n_lines
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE l_returnflag = 'N' AND l_quantity < 31
       |  AND ((p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity BETWEEN 1 AND 11)
       |    OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity BETWEEN 10 AND 20)
       |    OR (p_brand = 'Brand#3' AND p_size <= 30 AND l_quantity BETWEEN 20 AND 30))""".stripMargin

  // ----------------------------------------------------- q20_excess_supplier
  /** TPC-H Q20: suppliers of one nation who moved more than a threshold
    * volume of one part family in a year — the nested IN (IN + GROUP
    * HAVING) idiom in SQL text. Without partsupp/availqty, "excess" is a
    * shipped-quantity floor over the year. Catalyst plans the chain as
    * two stacked left-SEMI joins (supplier ⋉ qualifying suppkeys ⋉
    * nation), never materializing the subquery to the driver.
    *
    * Scale shape: the inner aggregate runs over the part-family-pruned
    * fact (broadcast semi on the filtered part dim), groups on
    * (suppkey) — supplier-domain-sized — and the outer semi join
    * broadcasts its survivors.
    */
  def q20ExcessSupplier(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("q20_lineitem_v")
    Tables.supplier(spark, dir).createOrReplaceTempView("q20_supplier_v")
    Tables.nation(spark, dir).createOrReplaceTempView("q20_nation_v")
    Tables.part(spark, dir).createOrReplaceTempView("q20_part_v")
    spark.sql(
      """SELECT s_suppkey, s_name
        |FROM q20_supplier_v
        |WHERE s_suppkey IN (
        |    SELECT l_suppkey FROM q20_lineitem_v
        |    WHERE l_partkey IN
        |          (SELECT p_partkey FROM q20_part_v WHERE p_name LIKE 'blue%')
        |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |    GROUP BY l_suppkey
        |    HAVING SUM(CAST(FLOOR(l_quantity) AS BIGINT)) > 100)
        |  AND s_nationkey IN
        |      (SELECT n_nationkey FROM q20_nation_v WHERE n_name = 'NATION_3')""".stripMargin)
  }

  val q20ExcessSupplierSql: String =
    """SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem
      |    WHERE l_partkey IN
      |          (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')
      |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |    GROUP BY l_suppkey
      |    HAVING SUM(CAST(FLOOR(l_quantity) AS BIGINT)) > 100)
      |  AND s_nationkey IN
      |      (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')""".stripMargin

  // ---------------------------------------------------- q21_waiting_supplier
  /** TPC-H Q21: suppliers who were the SOLE late shipper on finished
    * multi-supplier orders — the EXISTS + NOT EXISTS double-correlation,
    * in SQL text. Late stand-in (no receipt/commit dates): shipped > 60
    * days after the order date. The two correlated subqueries become a
    * left-SEMI then left-ANTI join on l_orderkey against the same
    * lineitem relation.
    *
    * Scale shape: all three lineitem passes key on l_orderkey — one
    * exchange partitioning reused across the join chain — and the
    * orders/nation dims broadcast. Output is supplier-domain-sized,
    * top-20 by wait count (TakeOrdered, suppkey tiebreak).
    */
  def q21WaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("q21_lineitem_v")
    Tables.orders(spark, dir).createOrReplaceTempView("q21_orders_v")
    Tables.supplier(spark, dir).createOrReplaceTempView("q21_supplier_v")
    spark.sql(
      """SELECT s_name, s_suppkey, count(*) AS numwait
        |FROM q21_supplier_v
        |JOIN q21_lineitem_v l1 ON l1.l_suppkey = s_suppkey
        |JOIN q21_orders_v ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM q21_lineitem_v l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM q21_lineitem_v l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name, s_suppkey
        |ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin)
  }

  val q21WaitingSupplierSql: String =
    """SELECT s_name, s_suppkey, count(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name, s_suppkey
      |ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin

  // ------------------------------------------------------- q22_global_sales
  /** TPC-H Q22: dormant high-balance customers by nation — NOT EXISTS
    * anti join + a global-average threshold, in SQL text. The average is
    * decomposed into two exact scalar subqueries (Σcents and count over
    * the positive-balance population): `bal × n > Σ` is the same
    * predicate as `bal > avg` with zero float involvement, so the
    * boundary cannot drift between engines' summation orders.
    *
    * Scale shape: both scalars broadcast as one-row subquery results; the
    * NOT EXISTS is a left-ANTI join on o_custkey (customer-domain probe,
    * with the date filter pushed to the orders scan); groups are
    * nation-domain. c_nationkey stands in for Q22's phone country code,
    * and "dormant" is no order since 1999 (the fixture's every customer
    * has SOME order, so Q22's literal no-orders-ever form is empty).
    */
  def q22GlobalSales(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("q22_customer_v")
    Tables.orders(spark, dir).createOrReplaceTempView("q22_orders_v")
    spark.sql(
      """WITH bal AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(FLOOR(CAST(c_acctbal AS DECIMAL(18,2)) * 100) AS BIGINT)
        |           AS bal_cents
        |  FROM q22_customer_v)
        |SELECT c_nationkey, count(*) AS numcust,
        |       SUM(bal_cents) AS total_bal_cents
        |FROM bal
        |WHERE bal_cents * (SELECT count(*) FROM bal WHERE bal_cents > 0)
        |      > (SELECT SUM(bal_cents) FROM bal WHERE bal_cents > 0)
        |  AND NOT EXISTS (SELECT 1 FROM q22_orders_v
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY c_nationkey""".stripMargin)
  }

  val q22GlobalSalesSql: String =
    """WITH bal AS (
      |  SELECT c_custkey, c_nationkey,
      |         CAST(FLOOR(CAST(c_acctbal AS DECIMAL(18,2)) * 100) AS BIGINT)
      |           AS bal_cents
      |  FROM customer)
      |SELECT c_nationkey, count(*) AS numcust,
      |       CAST(SUM(bal_cents) AS BIGINT) AS total_bal_cents
      |FROM bal
      |WHERE bal_cents * (SELECT count(*) FROM bal WHERE bal_cents > 0)
      |      > (SELECT CAST(SUM(bal_cents) AS BIGINT) FROM bal WHERE bal_cents > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      |GROUP BY c_nationkey""".stripMargin
}
