package graft

import org.apache.spark.sql.functions._

import graft.queries.{AnalyticsQueries, PipelineQueries, ReferenceQueries}

/** Structural invariants of the round-4 analytics operators — properties
  * the DuckDB hash compare implies but does not state directly.
  */
class AnalyticsPropsSpec extends SparkSuite {

  test("join-size estimate never underestimates (sketch inner product is one-sided)") {
    import spark.implicits._
    val Array((exact, est, over)) = AnalyticsQueries.joinSizeEstimate(spark, sf1)
      .as[(Long, Long, Long)].collect()
    assert(exact > 0, "fixture join is non-empty")
    assert(est >= exact, "collisions only ADD to the inner product")
    assert(over == est - exact)
  }

  test("markov transition rows are proper distributions in basis points") {
    import spark.implicits._
    val df = AnalyticsQueries.markovTransitions(spark, sf1).cache()
    assert(df.count() > 0)
    // each (prev, next) cell: 0 < prob_bp <= 10000
    assert(df.filter(col("prob_bp") <= 0 || col("prob_bp") > 10000).isEmpty)
    // integer division loses < 1 bp per cell: each row's cells sum into
    // (10000 - k, 10000] where k = #cells in the row
    val rows = df.groupBy("prev_type")
      .agg(sum("prob_bp").as("s"), count(lit(1)).as("k"))
      .as[(String, Long, Long)].collect()
    rows.foreach { case (p, s, k) =>
      assert(s <= 10000 && s > 10000 - k, s"row $p: sum=$s cells=$k")
    }
    df.unpersist()
  }

  test("cdc_apply: tombstones drop, upserts override, absent keys pass through") {
    import spark.implicits._
    val out = AnalyticsQueries.cdcApply(spark, sf1).cache()
    val orders = graft.engine.Tables.orders(spark, sf1).cache()
    val cust = graft.engine.Tables.customer(spark, sf1)
    // latest order per customer, batch-recomputed independently
    val latest = orders
      .groupBy(col("o_custkey"))
      .agg(max_by(struct(col("o_orderstatus"), col("o_totalprice")),
        struct(col("o_orderdate"), col("o_orderkey"))).as("l"))
      .select(col("o_custkey"), col("l.o_orderstatus").as("st"),
        col("l.o_totalprice").as("tp")).cache()
    val dropped = latest.filter(col("st") === "F").select(col("o_custkey"))
    // no tombstoned key survives
    assert(out.join(dropped, col("c_custkey") === col("o_custkey"), "left_semi").isEmpty)
    // absent keys pass through with the snapshot balance
    val untouched = cust.join(latest, col("c_custkey") === col("o_custkey"), "left_anti")
    val passthrough = out.join(untouched.select(col("c_custkey"), col("c_acctbal")), "c_custkey")
    assert(passthrough.filter(col("balance") =!= col("c_acctbal")).isEmpty)
    // row count = customers - tombstoned customers present in the snapshot
    val nTomb = cust.join(dropped, col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(out.count() == cust.count() - nTomb)
    out.unpersist(); orders.unpersist(); latest.unpersist()
  }

  test("copurchase pairs: supports bound co-counts, ranking is a total order") {
    val out = AnalyticsQueries.copurchasePairs(spark, sf1).collect()
    assert(out.nonEmpty && out.length <= 100)
    assert(out.forall(r => r.getLong(0) < r.getLong(1)), "canonical pair order")
    assert(out.forall(r => r.getLong(2) >= 2), "min support")
    assert(out.forall(r => r.getLong(2) <= math.min(r.getLong(3), r.getLong(4))),
      "a pair cannot co-occur more often than either part occurs")
    val lifts = out.map(_.getLong(5))
    assert(lifts.sameElements(lifts.sorted(Ordering[Long].reverse)))
  }

  test("pareto set is minimal: covers >=80%, dropping its last member does not") {
    import spark.implicits._
    val Array((nTop, nCust, covered, total, shareBp)) =
      AnalyticsQueries.paretoCustomers(spark, sf1)
        .as[(Long, Long, Long, Long, Long)].collect()
    assert(nTop > 0 && nTop <= nCust)
    assert(covered * 5 >= total * 4, "the selected set must cover 80%")
    assert(shareBp == 10000 * nTop / nCust)
    // minimality: without its smallest member the set falls under 80%
    val spends = graft.engine.Tables.orders(spark, sf1)
      .groupBy("o_custkey")
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")).as("c"))
      .as[(Long, Long)].collect().map(_._2).sorted(Ordering[Long].reverse)
    val withoutLast = spends.take(nTop.toInt - 1).sum
    assert(withoutLast * 5 < total * 4, "the set must be MINIMAL")
  }

  test("CMS estimates never underestimate (count-min is one-sided)") {
    val df = AnalyticsQueries.heavyHittersCms(spark, sf1).cache()
    assert(df.count() == 10)
    assert(df.filter(col("est_n") < col("exact_n")).count() == 0,
      "count-min sketch must overestimate only")
    assert(df.filter(col("overcount") =!= col("est_n") - col("exact_n")).count() == 0)
    df.unpersist()
  }

  test("distributed spend deciles equal the single-window ntile/percent_rank") {
    import spark.implicits._
    // the two-pass Prefix rank must reproduce Spark's own global window
    // semantics exactly (the oracle proves DuckDB parity; this proves
    // Spark-window parity, so all three agree)
    val got = AnalyticsQueries.spendDeciles(spark, sf1)
      .select("o_custkey", "total", "decile", "pr")
      .as[(Long, Double, Long, Double)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("total").desc, col("o_custkey").asc)
    val want = graft.engine.Tables.orders(spark, sf1)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("total"))
      .select(col("o_custkey"), col("total").cast("double").as("total"),
        ntile(10).over(w).cast("long").as("decile"),
        round(percent_rank().over(w), 6).as("pr"))
      .as[(Long, Double, Long, Double)].collect().toSet
    assert(got == want, "two-pass global rank != Spark's global window")
  }

  test("histogram winsorization quantiles equal Spark's percentile, caps bound rows") {
    import spark.implicits._
    val df = AnalyticsQueries.winsorizeChars(spark, sf1).cache()
    // capped is clamped into [p05, p95] on every row
    assert(df.filter(col("capped") < col("p05") || col("capped") > col("p95")).count() == 0)
    assert(df.filter(col("p05") > col("p95")).count() == 0)
    // the histogram-derived quantiles ARE the (n-1)p interpolated exact
    // quantiles: cross-check against Spark's value-buffering percentile
    val got = df.select("source", "p05", "p95").distinct()
      .as[(String, Double, Double)].collect().map { case (s, a, b) => s -> (a, b) }.toMap
    val want = graft.engine.Tables.documents(spark, sf1)
      .groupBy("source")
      .agg(round(expr("percentile(n_chars, 0.05)"), 6).as("p05"),
        round(expr("percentile(n_chars, 0.95)"), 6).as("p95"))
      .as[(String, Double, Double)].collect().map { case (s, a, b) => s -> (a, b) }.toMap
    assert(got == want, s"histogram quantiles != percentile(): $got vs $want")
    df.unpersist()
  }

  test("trailing 7-day spend bounds: at least the row's own value, at most the user total") {
    val ev = graft.engine.Tables.events(spark, sf1)
      .filter(col("event_type") === "purchase")
    val out = AnalyticsQueries.trailingSpend(spark, sf1)
    val joined = out.join(ev.select(col("event_id"),
      col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)).cast("double").as("own")),
      "event_id")
    assert(joined.filter(col("spend_7d") < col("own")).count() == 0,
      "a frame always contains its own row")
    val totals = ev.groupBy("user_id")
      .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double").as("tot"))
    assert(out.join(totals, "user_id").filter(col("spend_7d") > col("tot")).count() == 0,
      "a frame never exceeds the user's all-time total")
  }

  test("SCD2 versions tile each customer's timeline") {
    val df = AnalyticsQueries.scd2Dimension(spark, sf1).cache()
    // exactly one open (current) version per customer
    val open = df.filter(col("is_current")).groupBy("o_custkey").count()
    assert(open.filter(col("count") =!= 1).count() == 0, "one current version per key")
    // closed versions never extend past their successor
    assert(df.filter(col("valid_to").isNotNull && col("valid_from") > col("valid_to"))
      .count() == 0, "valid_from <= valid_to")
    // every version boundary is the successor's start (tiling, no gaps):
    // valid_to values per key = the non-first valid_from values per key
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("valid_from").asc, col("o_orderkey").asc)
    val mismatch = df
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(!(col("valid_to") <=> col("next_from")))
    assert(mismatch.count() == 0, "no gaps between versions")
    df.unpersist()
  }

  test("conversion funnel rates are well-formed") {
    val df = ReferenceQueries.conversionFunnel(spark, sf1).cache()
    assert(df.filter(col("n_converted") > col("n_purchases")).count() == 0)
    assert(df.filter(col("cvr_bp") < 0 || col("cvr_bp") > 10000).count() == 0)
    df.unpersist()
  }

  test("kmv_intersect: sketch estimates track the exact overlap") {
    import spark.implicits._
    val out = AnalyticsQueries.kmvIntersect(spark, sf1).cache()
    val ev = graft.engine.Tables.events(spark, sf1)
      .select(col("event_type"), col("user_id")).distinct().cache()
    val types = ev.select("event_type").distinct().as[String].collect().sorted
    assert(out.count() == types.length.toLong * (types.length - 1) / 2,
      "one row per unordered type pair")
    // estimates are non-negative and the intersection never exceeds the union
    assert(out.filter(col("est_inter") < 0 || col("est_union") < 0).isEmpty)
    assert(out.filter(col("est_inter") > col("est_union")).isEmpty)
    // per pair: est_union within KMV sketch error of the exact union
    // (k=32 → stderr ≈ 1/√31 ≈ 18%; assert a 4-sigma envelope), and the
    // exact_inter column IS the exact overlap
    val rows = out.select("type_a", "type_b", "est_union", "est_inter", "exact_inter")
      .as[(String, String, Long, Long, Long)].collect()
    rows.foreach { case (a, b, estU, estI, exI) =>
      val exU = ev.filter(col("event_type").isin(a, b))
        .select("user_id").distinct().count()
      val exactI = ev.filter(col("event_type") === a)
        .join(ev.filter(col("event_type") === b), "user_id").count()
      assert(exI == exactI, s"($a,$b) exact_inter")
      assert(math.abs(estU - exU) <= 0.72 * exU, s"($a,$b) est_union=$estU exact=$exU")
      assert(math.abs(estI - exactI) <= math.max(0.72 * exactI, 4.0 * exU / math.sqrt(31)),
        s"($a,$b) est_inter=$estI exact=$exactI union=$exU")
    }
    out.unpersist(); ev.unpersist()
  }

  test("weighted_median: the reported price is the true weighted median") {
    import spark.implicits._
    val rows = AnalyticsQueries.weightedMedian(spark, sf1)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    val li = graft.engine.Tables.lineitem(spark, sf1)
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"),
        col("l_quantity").cast("long"))
      .as[(String, Long, Long)].collect()
    rows.foreach { case (flag, med, tot) =>
      val xs = li.filter(_._1 == flag).map(t => (t._2, t._3)).sortBy(_._1)
      val w = xs.map(_._2).sum
      assert(tot == w, s"$flag total weight")
      // lower weighted median: smallest value whose cumulative weight
      // reaches half the total
      var cum = 0L
      val expected = xs.find { case (_, wt) => cum += wt; 2 * cum >= w }.get._1
      assert(med == expected, s"$flag median")
    }
  }

  test("seasonality_dow: indices average to ~10000 and partition revenue") {
    import spark.implicits._
    val rows = AnalyticsQueries.seasonalityDow(spark, sf1)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 7, "every ISO day of week present")
    assert(rows.map(_._1).sorted.sameElements(1L to 7L))
    // integer division loses < 1 bp per day: sum in (70000 - 7, 70000]
    val s = rows.map(_._4).sum
    assert(s <= 70000 && s > 70000 - 7, s"index sum $s")
  }

  test("json_props_stats: parsed k matches the regex-scraped baseline") {
    import spark.implicits._
    val out = PipelineQueries.jsonPropsStats(spark, sf1).cache()
    // fixture props are all well-formed one-key objects
    assert(out.filter(col("n_valid") =!= col("n_events")).isEmpty)
    val base = graft.engine.Tables.events(spark, sf1)
      .select(col("event_type"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
    val j = out.select("event_type", "sum_k", "min_k", "max_k")
    assert(j.exceptAll(base).isEmpty && base.exceptAll(j).isEmpty,
      "schema-on-read parse equals the regex scrape on well-formed input")
    out.unpersist()
  }

  test("window_funnel: histogram equals a sequential per-user replay") {
    import spark.implicits._
    val out = PipelineQueries.windowFunnel(spark, sf1)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val ev = graft.engine.Tables.events(spark, sf1)
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)].collect()
    // sequential replay: strict-order view -> click -> purchase within 1h
    val levels = ev.groupBy(_._1).flatMap { case (_, xs) =>
      val views = xs.filter(_._2 == "view").map(_._3.getTime)
      if (views.isEmpty) None else {
        val t1 = views.min
        val hi = t1 + 24 * 3600 * 1000L
        val clicks = xs.filter(_._2 == "click").map(_._3.getTime)
          .filter(t => t > t1 && t <= hi)
        if (clicks.isEmpty) Some(1L) else {
          val t2 = clicks.min
          val buys = xs.filter(_._2 == "purchase").map(_._3.getTime)
            .filter(t => t > t2 && t <= hi)
          Some(if (buys.isEmpty) 2L else 3L)
        }
      }
    }.toSeq
    val expected = levels.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out.view.mapValues(_._1).toMap == expected,
      s"got ${out.view.mapValues(_._1).toMap} want $expected")
    // exclusive levels partition the view-users; shares fold to ~10000
    assert(out.values.map(_._1).sum == levels.size)
    val bp = out.values.map(_._2).sum
    assert(bp <= 10000 && bp > 10000 - out.size)
  }

  test("sliding_distinct_users: each trailing-7d count equals a replay") {
    import spark.implicits._
    val out = AnalyticsQueries.slidingDistinctUsers(spark, sf1)
      .as[(String, Long)].collect().toMap
    val pairs = graft.engine.Tables.events(spark, sf1)
      .select(to_date(col("ts")).as("d"), col("user_id"))
      .distinct().as[(java.sql.Date, Long)].collect()
    val days = pairs.map(_._1.toLocalDate).distinct
    assert(out.size == days.size, "one row per active day")
    days.foreach { d =>
      val expected = pairs.filter { case (pd, _) =>
        val x = pd.toLocalDate
        !x.isAfter(d) && x.isAfter(d.minusDays(7))
      }.map(_._2).distinct.length.toLong
      assert(out(d.toString) == expected, s"day $d")
    }
  }

  test("weighted_quantiles: one crossing row per quartile, median agrees") {
    import spark.implicits._
    val q = AnalyticsQueries.weightedQuantiles(spark, sf1)
      .as[(String, Long, Long)].collect()
    val flags = q.map(_._1).distinct
    flags.foreach { f =>
      val mine = q.filter(_._1 == f)
      assert(mine.map(_._2).sorted.sameElements(Seq(1L, 2L, 3L)),
        s"$f must have exactly quartiles 1..3")
      // monotone: p25 <= p50 <= p75
      val byQ = mine.map(t => t._2 -> t._3).toMap
      assert(byQ(1L) <= byQ(2L) && byQ(2L) <= byQ(3L))
    }
    // the q=2 row IS the weighted median
    val med = AnalyticsQueries.weightedMedian(spark, sf1)
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._2).toMap
    q.filter(_._2 == 2L).foreach { case (f, _, c) => assert(med(f) == c, f) }
  }

  test("nearest_join: every pair is the true closest click, ties to earlier") {
    import spark.implicits._
    val out = PipelineQueries.nearestJoin(spark, sf1)
      .as[(Long, Long, java.sql.Timestamp, Long)].collect()
    val ev = graft.engine.Tables.events(spark, sf1)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .as[(Long, String, java.sql.Timestamp, Long)].collect()
    def us(t: java.sql.Timestamp) = t.getTime / 1000 * 1000000L + t.getNanos / 1000
    val clicksBy = ev.filter(_._2 == "click").groupBy(_._1)
      .view.mapValues(_.map(e => us(e._3)).sorted).toMap
    val buys = ev.filter(_._2 == "purchase")
    val outBy = out.map(r => r._1 -> (us(r._3), r._4)).toMap
    buys.foreach { case (u, _, ts, pid) =>
      val cs = clicksBy.getOrElse(u, Array.empty[Long])
      if (cs.isEmpty) assert(!outBy.contains(pid), s"purchase $pid has no clicks")
      else {
        val t = us(ts)
        val best = cs.minBy(c => (math.abs(t - c), c))
        val (got, gap) = outBy(pid)
        assert(got == best, s"purchase $pid nearest")
        assert(gap == math.abs(t - best), s"purchase $pid gap")
      }
    }
  }

  test("cusum_shift: scan decomposition equals the sequential recurrence") {
    import spark.implicits._
    val out = PipelineQueries.cusumShift(spark, sf1)
      .as[(String, String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(out.nonEmpty)
    out.foreach { case (tpe, rows) =>
      val ys = rows.map(_._3)
      val target = ys.sum / ys.length // positive sums: div == floor here
      var s = 0L; var t = 0L
      rows.foreach { case (_, day, y, up, down) =>
        s = math.max(0L, s + (y - target))
        t = math.max(0L, t - (y - target))
        assert(up == s, s"$tpe $day cusum_up")
        assert(down == t, s"$tpe $day cusum_down")
      }
    }
  }

  test("ivm_agg: the delta path equals the recomputed snapshot aggregate") {
    val deltas = AnalyticsQueries.ivmAgg(spark, sf1)
    // snapshot path, recomputed independently (max_by instead of the
    // changelog's lag-window): latest live version per key, then aggregate
    val snap = graft.engine.Tables.orders(spark, sf1)
      .groupBy(col("o_custkey"))
      .agg(max_by(struct(col("o_orderstatus"), col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents")),
        struct(col("o_orderdate"), col("o_orderkey"))).as("l"))
      .filter(col("l.o_orderstatus") =!= "F")
      .groupBy(col("l.o_orderpriority").as("o_orderpriority"))
      .agg(count(lit(1)).as("n_customers"), sum(col("l.cents")).as("total_cents"))
    assert(deltas.count() > 0)
    assert(deltas.exceptAll(snap).isEmpty && snap.exceptAll(deltas).isEmpty,
      "adder/subtractor deltas must telescope to the snapshot aggregate")
  }

  test("rfm_segments: balanced quintiles, digit bounds, conserved totals") {
    val rfm = AnalyticsQueries.rfmSegments(spark, sf1).cache()
    val nCust = graft.engine.Tables.orders(spark, sf1)
      .select(col("o_custkey")).distinct().count()
    assert(rfm.count() == nCust, "one row per customer with >=1 order")
    // every quintile dimension: bucket sizes differ by at most 1 (ntile law)
    for (c <- Seq("r_q", "f_q", "m_q")) {
      val sizes = rfm.groupBy(col(c)).count().select(col("count"))
        .collect().map(_.getLong(0))
      assert(sizes.length == 5, s"$c covers all 5 quintiles")
      assert(sizes.max - sizes.min <= 1, s"$c quintiles balanced: ${sizes.toSeq}")
    }
    assert(rfm.filter(col("rfm") < 111 || col("rfm") > 555).count() == 0)
    // monetary is conserved: segment cents sum to the orders total
    val totalCents = graft.engine.Tables.orders(spark, sf1)
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"))
      .head.getLong(0)
    assert(rfm.agg(sum(col("monetary_cents"))).head.getLong(0) == totalCents)
    rfm.unpersist()
  }

  test("auc_ranking: label inversion complements the statistic (rank-sum identity)") {
    import spark.implicits._
    val Array((nPos, nNeg, auc)) = AnalyticsQueries.aucRanking(spark, sf1)
      .as[(Long, Long, Long)].collect()
    assert(nPos > 0 && nNeg > 0 && auc >= 0 && auc <= 10000)
    // independent recompute with inverted labels: U⁺2 + U⁻2 = 2·n⁺·n⁻
    // exactly, so the floored bp pair sums to 9999 or 10000
    val histInv = graft.engine.Tables.events(spark, sf1)
      .select(floor(col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"),
        when(col("event_type") === "purchase", 0L).otherwise(1L).as("pos"))
      .groupBy(col("cents"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("np"))
    val Array((nPosInv, nNegInv, aucInv)) =
      graft.engine.Prefix.exclusiveCumsum(histInv, Seq(col("cents")), col("n"), "cum_before")
        .agg(sum(col("np")).as("n_pos"), sum(col("n") - col("np")).as("n_neg"),
          sum(col("np") * (col("cum_before") * 2 + col("n") + 1)).as("s2"))
        .select(col("n_pos"), col("n_neg"),
          expr("((s2 - n_pos * (n_pos + 1)) * 10000) div (2 * n_pos * n_neg)"))
        .as[(Long, Long, Long)].collect()
    assert(nPosInv == nNeg && nNegInv == nPos)
    assert(auc + aucInv == 10000 || auc + aucInv == 9999,
      s"complement violated: $auc + $aucInv")
  }

  test("lift_deciles tiles the population exactly and captures every positive") {
    import spark.implicits._
    val rows = AnalyticsQueries.liftDeciles(spark, sf1)
      .select($"decile", $"n_rows", $"n_pos", $"cum_rows", $"cum_pos")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 10L))
    val ev = graft.engine.Tables.events(spark, sf1)
    val n = ev.count()
    val p = ev.filter(col("event_type") === "purchase").count()
    // interval-overlap decile split loses and double-counts nothing
    assert(rows.map(_._2).sum == n && rows.last._4 == n)
    assert(rows.map(_._3).sum == p && rows.last._5 == p)
    // every decile holds exactly its integer share of the population
    rows.foreach { case (d, nr, _, _, _) =>
      assert(nr == d * n / 10 - (d - 1) * n / 10, s"decile $d holds $nr rows")
    }
  }
}
