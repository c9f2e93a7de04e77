package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.queries.TpchQueries

/** Cross-query invariants of the completed TPC-H suite — consistency the
  * per-query DuckDB hashes cannot see because each hash checks one query
  * in isolation. Each test ties two independent computations of the same
  * underlying quantity together, so a semantics drift in either breaks
  * the pair.
  */
class TpchPropsSpec extends SparkSuite {

  test("q13 histogram masses sum to the customer population") {
    import spark.implicits._
    val hist = TpchQueries.q13CustomerDistribution(spark, sf1)
      .agg(sum("custdist")).as[Long].head()
    val customers = Tables.customer(spark, sf1).count()
    assert(hist == customers,
      s"left-join histogram lost/duplicated customers: $hist vs $customers")
  }

  test("q4 priority counts are bounded by the quarter's orders") {
    import spark.implicits._
    val byPriority = TpchQueries.q4OrderPriority(spark, sf1)
      .select($"o_orderpriority", $"order_count".cast("long"))
      .as[(String, Long)].collect().toMap
    val quarterTotals = Tables.orders(spark, sf1)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-04-01"))
      .groupBy(col("o_orderpriority")).count()
      .as[(String, Long)].collect().toMap
    assert(byPriority.nonEmpty)
    byPriority.foreach { case (p, n) =>
      assert(n <= quarterTotals.getOrElse(p, 0L),
        s"$p: EXISTS-qualified count $n exceeds quarter total")
    }
  }

  test("q14 and q8 shares are well-formed basis points with consistent parts") {
    import spark.implicits._
    val (promo, total, bp) = TpchQueries.q14PromoRevenue(spark, sf1)
      .as[(Long, Long, Long)].head()
    assert(promo >= 0 && promo <= total, s"promo $promo outside [0, $total]")
    assert(bp == promo * 10000 / total, "share_bp must be the integer ratio")
    TpchQueries.q8MarketShare(spark, sf1)
      .select($"nation_cents", $"total_cents", $"share_bp")
      .as[(Long, Long, Long)].collect().foreach { case (n, t, s) =>
        assert(n >= 0 && n <= t && s == n * 10000 / t)
      }
  }

  test("q15's max-revenue supplier dominates every quarterly supplier total") {
    import spark.implicits._
    val winners = TpchQueries.q15TopSupplier(spark, sf1)
      .select($"total_cents").as[Long].collect()
    assert(winners.nonEmpty && winners.distinct.length == 1,
      "all emitted rows tie at the single max")
    val cents = floor(col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(9,4)") - col("l_discount").cast("decimal(9,4)")) * 100)
      .cast("long")
    val best = Tables.lineitem(spark, sf1)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey")).agg(sum(cents).as("c"))
      .agg(max("c")).as[Long].head()
    assert(winners.head == best, s"scalar-max path ${winners.head} != independent max $best")
  }

  test("q21: a sole-late supplier's waits never exceed its late finished-order lines") {
    import spark.implicits._
    val waits = TpchQueries.q21WaitingSupplier(spark, sf1)
      .select($"s_suppkey", $"numwait".cast("long")).as[(Long, Long)].collect()
    assert(waits.nonEmpty)
    // upper bound recomputed without the EXISTS/NOT EXISTS correlation
    val lateLines = Tables.lineitem(spark, sf1)
      .join(Tables.orders(spark, sf1).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
      .groupBy(col("l_suppkey")).count()
      .as[(Long, Long)].collect().toMap
    waits.foreach { case (s, n) =>
      assert(n <= lateLines.getOrElse(s, 0L),
        s"supplier $s: numwait $n exceeds its late-line count")
    }
  }

  test("q17 small-quantity revenue is a strict subset of the brand's revenue") {
    import spark.implicits._
    val (smallCents, nSmall) = TpchQueries.q17SmallQuantity(spark, sf1)
      .as[(Long, Long)].head()
    assert(nSmall > 0, "fixture has sub-half-average lines")
    val cents = floor(col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(9,4)") - col("l_discount").cast("decimal(9,4)")) * 100)
      .cast("long")
    val brandTotal = Tables.lineitem(spark, sf1)
      .join(Tables.part(spark, sf1).filter(col("p_brand") === "Brand#3"),
        col("l_partkey") === col("p_partkey"))
      .agg(sum(cents)).as[Long].head()
    assert(smallCents * 7 <= brandTotal,
      s"q17 output (pre-/7: ${smallCents * 7}) exceeds brand revenue $brandTotal")
  }

  test("q6 forecast is bounded by the band's revenue at max discount share") {
    import spark.implicits._
    val (forecast, n) = TpchQueries.q6ForecastRevenue(spark, sf1)
      .as[(Long, Long)].head()
    assert(n > 0 && forecast > 0)
    // discount ≤ 7%: the foregone-discount sum is under 7.01% of gross
    val gross = Tables.lineitem(spark, sf1)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") && col("l_quantity") < 24)
      .filter(col("l_discount").cast("decimal(9,4)").between(0.05, 0.07))
      .agg(sum(floor(col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long"))).as[Long].head()
    assert(forecast <= gross * 701 / 10000,
      s"forecast $forecast above the 7% band ceiling of gross $gross")
  }

  test("q11's threshold keeps only parts above 0.1% of the nation total") {
    import spark.implicits._
    val kept = TpchQueries.q11ImportantStock(spark, sf1)
      .select($"value_cents").as[Long].collect()
    assert(kept.nonEmpty)
    // independent total: all nation-3-supplied line value
    val nation3 = Tables.nation(spark, sf1).filter(col("n_name") === "NATION_3")
    val total = Tables.lineitem(spark, sf1)
      .join(Tables.supplier(spark, sf1)
          .join(broadcast(nation3), col("s_nationkey") === col("n_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long"))).as[Long].head()
    kept.foreach(v => assert(v > total / 1000,
      s"kept part value $v at or below threshold ${total / 1000}"))
  }
}
