package graft

import org.apache.spark.sql.functions._

import graft.queries.{LlmQueries, PipelineQueries}

/** Structural invariants of the round-5 pipeline/graph operators —
  * properties the DuckDB hash compare implies but does not state directly,
  * plus two independent-recomputation equivalence checks (triangle
  * counting vs the naive 3-join, range join vs the direct theta filter)
  * that guard the *optimized* formulations against silent drift.
  */
class PipelinePropsSpec extends SparkSuite {

  test("dq_audit: violations never exceed checked; all 7 rules report") {
    val df = PipelineQueries.dqAudit(spark, sf1).cache()
    assert(df.count() == 7)
    assert(df.filter(col("violations") > col("checked")).count() == 0)
    assert(df.filter(col("violations") < 0).count() == 0)
    df.unpersist()
  }

  test("robust_anomaly: flags exactly the rows beyond 3 MAD, MAD from the true median") {
    val flagged = PipelineQueries.robustAnomaly(spark, sf1).cache()
    assert(flagged.count() > 0, "fixture should contain cents outliers")
    // every flagged row satisfies its own evidence columns
    assert(flagged.filter(
      org.apache.spark.sql.functions.abs(col("cents") - col("med")) <= col("mad") * 3)
      .count() == 0)
    // completeness: using the evidence fences, every event beyond 3 MAD
    // must appear in the flagged set (nothing silently dropped)
    import org.apache.spark.sql.functions._
    val ev = graft.engine.Tables.events(spark, sf1)
      .select(col("event_id"), col("event_type"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
    val fences = flagged.select("event_type", "med", "mad").distinct()
    val beyond = ev.join(fences, "event_type")
      .filter(abs(col("cents") - col("med")) > col("mad") * 3)
    assert(beyond.join(flagged.select("event_id"), Seq("event_id"), "left_anti")
      .count() == 0, "an event beyond the fence was not flagged")
    flagged.unpersist()
  }

  test("retention_cohorts: no cell exceeds its cohort's week-0 size") {
    val df = PipelineQueries.retentionCohorts(spark, sf1).cache()
    val base = df.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("active_users").as("cohort_size"))
    assert(df.filter(col("week_offset") < 0).count() == 0)
    assert(df.join(base, "cohort_week")
      .filter(col("active_users") > col("cohort_size")).count() == 0,
      "retention cell larger than its cohort")
    df.unpersist()
  }

  test("gap_fill: filled series is dense and preserves each type's total") {
    val df = PipelineQueries.gapFill(spark, sf1).cache()
    // dense: rows per type == span days (max - min + 1)
    val spans = df.groupBy("event_type")
      .agg(count(lit(1)).as("rows"),
        (datediff(max(col("day")), min(col("day"))) + 1).as("span"))
    assert(spans.filter(col("rows") =!= col("span")).count() == 0, "gaps remain")
    // mass-preserving: the zero-fill adds nothing — recompute through the
    // SAME day-level decimal aggregation (summing the per-day doubles in a
    // different order/precision would differ in ulps, not in substance)
    val filled = df.groupBy("event_type").agg(sum(col("total")).as("t"))
    val raw = graft.engine.Tables.events(spark, sf1)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double").as("total"))
      .groupBy("event_type").agg(sum(col("total")).as("r"))
    // tolerance: the two sums fold the same per-day doubles in different
    // partition orders, so exact equality is not guaranteed — closeness is
    assert(filled.join(raw, "event_type")
      .filter(abs(col("t") - col("r")) > 1e-6).count() == 0)
    df.unpersist()
  }

  test("table_diff: classifications match the snapshot construction") {
    val df = PipelineQueries.tableDiff(spark, sf1).cache()
    assert(df.groupBy("o_orderkey").count().filter(col("count") > 1).count() == 0,
      "a key classified twice")
    assert(df.filter(col("change") === "added" && col("o_orderkey") % 7 =!= 0)
      .count() == 0, "added keys must be exactly those A dropped")
    assert(df.filter(col("change") === "removed" && col("o_orderkey") % 5 =!= 0)
      .count() == 0, "removed keys must be exactly those B dropped")
    df.unpersist()
  }

  test("range_join_bucketed equals the direct theta-join per band") {
    val df = PipelineQueries.rangeJoinBucketed(spark, sf1).cache()
    val cents = graft.engine.Tables.events(spark, sf1)
      .select((col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long").as("cents")).cache()
    val bands = Seq(("p0_micro", 0L, 1000L), ("p1_small", 1000L, 4500L),
      ("p2_mid", 4500L, 12000L), ("p3_large", 12000L, 40000L),
      ("p4_jumbo", 40000L, 50100L))
    for ((band, lo, hi) <- bands) {
      val expected = cents.filter(col("cents") >= lo && col("cents") < hi)
        .agg(count(lit(1)).as("n"), coalesce(sum(col("cents")), lit(0L)).as("s"))
        .head()
      val got = df.filter(col("band") === band)
        .select(col("n_events"), col("sum_cents")).collect()
      if (expected.getLong(0) == 0L) assert(got.isEmpty)
      else {
        assert(got.length == 1)
        assert(got(0).getLong(0) == expected.getLong(0), s"$band count")
        assert(got(0).getLong(1) == expected.getLong(1), s"$band sum")
      }
    }
    cents.unpersist(); df.unpersist()
  }

  test("fuzzy_join_edit: every probe recovers its source customer") {
    val df = PipelineQueries.fuzzyJoinEdit(spark, sf1).cache()
    val probes = graft.engine.Tables.customer(spark, sf1)
      .filter(col("c_custkey") % 101 === 0).count()
    assert(probes > 0, "fixture must yield probes")
    // the corrupted name is distance 1 from its own source and shares the
    // suffix block — the self match must always survive
    assert(df.filter(col("probe_key") === col("match_key")).count() == probes)
    assert(df.filter(col("dist") > 1).count() == 0)
    df.unpersist()
  }

  test("feature_hash: bucket histogram accounts for every feature instance") {
    val df = PipelineQueries.featureHash(spark, sf1).cache()
    val events = graft.engine.Tables.events(spark, sf1).count()
    assert(df.agg(sum(col("n_rows"))).head().getLong(0) == 2 * events,
      "two features per event")
    assert(df.filter(col("bucket") < 0 || col("bucket") >= 64).count() == 0)
    df.unpersist()
  }

  test("inverted_index: stats are consistent and samples bounded") {
    val df = PipelineQueries.invertedIndex(spark, sf1).cache()
    assert(df.filter(col("df") > col("tf")).count() == 0, "df <= tf")
    assert(df.filter(size(split(col("sample_postings"), ",")) > 8).count() == 0,
      "posting sample capped at 8")
    val total = graft.engine.Tables.documents(spark, sf1)
      .select(explode(graft.llm.TextAnalysis.tokens(col("text"))).as("t")).count()
    assert(df.agg(sum(col("tf"))).head().getLong(0) == total)
    df.unpersist()
  }

  test("semdedup: the minimum-id member of every cell is kept") {
    val df = LlmQueries.semdedup(spark, sf1).cache()
    val minPerCell = df.groupBy("cell").agg(min(col("vec_id")).as("vec_id"))
    assert(df.join(minPerCell, Seq("cell", "vec_id"))
      .filter(!col("kept")).count() == 0,
      "a cell's minimum id can never be dominated")
    val n = graft.engine.Tables.embeddings(spark, sf1).count()
    assert(df.count() == n, "every vector is classified")
    df.unpersist()
  }

  test("pagerank_sim: mass is bounded and every node keeps its teleport floor") {
    val df = LlmQueries.pagerankSim(spark, sf1).cache()
    val n = graft.engine.Tables.documents(spark, sf1).count()
    assert(df.count() == n)
    val mass = 1000000000000L
    assert(df.agg(sum(col("pr"))).head().getLong(0) <= mass,
      "floor division can only lose mass, never create it")
    val teleport = (15L * mass / 100L) / n
    assert(df.filter(col("pr") < teleport).count() == 0,
      "teleport term is a floor for every node")
    df.unpersist()
  }

  test("triangle_count equals the naive unoriented 3-join") {
    val df = PipelineQueries.triangleCount(spark, sf1)
    val pairs = graft.llm.Dedup.simhashPairs(
        graft.engine.Tables.documents(spark, sf1), 5)
      .select(col("doc_a"), col("doc_b")).cache()
    // naive: a < b < c, all three edges present (no orientation trick)
    val e = pairs.select(col("doc_a").as("x"), col("doc_b").as("y"))
    val naive = e.as("e1")
      .join(e.as("e2"), col("e1.y") === col("e2.x"))
      .join(e.as("e3"),
        col("e1.x") === col("e3.x") && col("e2.y") === col("e3.y"))
      .select(explode(array(col("e1.x"), col("e1.y"), col("e2.y"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
    assert(df.exceptAll(naive).isEmpty && naive.exceptAll(df).isEmpty,
      "degree-oriented count must equal the naive count")
    pairs.unpersist()
  }

  test("bm25_search: top-10 scores are positive and non-increasing") {
    val rows = PipelineQueries.bm25Search(spark, sf1).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("Prefix.exclusiveCumsum equals the single-window global prefix sum") {
    val toks = graft.engine.Tables.documents(spark, sf1)
      .select(col("doc_id"),
        size(graft.llm.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
    val two = graft.engine.Prefix
      .exclusiveCumsum(toks, Seq(col("doc_id")), col("n"), "cum")
      .select("doc_id", "cum")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val one = toks
      .withColumn("cum", coalesce(sum(col("n")).over(w), lit(0L)))
      .select("doc_id", "cum")
    assert(two.exceptAll(one).isEmpty && one.exceptAll(two).isEmpty,
      "two-pass cumsum must equal the single-window reference")
  }

  test("Prefix.exclusiveCumsums fuses N prefixes identically to N chained calls") {
    // the round-11 fusion (one range exchange + pin for all values) must be
    // value-identical to chaining single-value builds — prefix sums are
    // placement-invariant, so this pins the fused offsets/local bookkeeping
    val toks = graft.engine.Tables.documents(spark, sf1)
      .select(col("doc_id"),
        size(graft.llm.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
    val ord = Seq(col("doc_id"))
    val fused = graft.engine.Prefix
      .exclusiveCumsums(toks, ord, Seq(col("n") -> "cum", lit(1L) -> "rank0"))
      .select("doc_id", "cum", "rank0")
    val chained = graft.engine.Prefix.exclusiveCumsum(
        graft.engine.Prefix.exclusiveCumsum(toks, ord, col("n"), "cum"),
        ord, lit(1L), "rank0")
      .select("doc_id", "cum", "rank0")
    assert(fused.exceptAll(chained).isEmpty && chained.exceptAll(fused).isEmpty,
      "fused multi-value cumsum must equal the chained single-value builds")
  }

  test("sequence_pack: sequences tile the token stream without gaps") {
    val df = LlmQueries.sequencePack(spark, sf1).cache()
    // offsets stay inside the budget; spans are consistent with lengths
    assert(df.filter(col("seq_offset") < 0 || col("seq_offset") >= 256).count() == 0)
    assert(df.filter(col("n_seq_spanned") =!=
      ((col("seq_offset") + col("n_tokens") - 1) / 256).cast("long")).count() == 0,
      "span count must follow from offset + length")
    // total packed tokens = corpus tokens
    val total = df.agg(sum(col("n_tokens"))).head().getLong(0)
    val corpus = graft.engine.Tables.documents(spark, sf1)
      .select(explode(graft.llm.TextAnalysis.tokens(col("text")))).count()
    assert(total == corpus)
    df.unpersist()
  }

  test("anomaly_zscore: the integer test agrees with the float z-score off-boundary") {
    val df = PipelineQueries.anomalyZscore(spark, sf1).cache()
    // recompute |z| >= 2 in floating point; away from the exact boundary
    // the two tests must agree (the integer form IS the spec, float is audit)
    val m = df.groupBy("event_type")
      .agg(count(lit(1)).as("n"), avg(col("y_cents")).as("mu"),
        stddev_pop(col("y_cents")).as("sd"))
    val joined = df.join(m, "event_type")
      .withColumn("z", abs((col("y_cents") - col("mu")) / col("sd")))
      .filter(abs(col("z") - 2.0) > 1e-6)
    assert(joined.filter(col("is_anomaly") =!= (col("z") >= 2.0)).count() == 0)
    df.unpersist()
  }

  test("asof_union_join agrees with the range-join as-of inside the bounded window") {
    val unbounded = PipelineQueries.asofUnionJoin(spark, sf1)
      .withColumnRenamed("click_id", "u_click")
    val bounded = graft.queries.ReferenceQueries.asofJoin(spark, sf1)
      .withColumnRenamed("click_id", "b_click").select("purchase_id", "b_click")
    // wherever the 1h-bounded as-of found a click, the unbounded window
    // must find the SAME click (it can only see further back, never differ
    // on a match inside the window)
    val joined = unbounded.join(bounded, "purchase_id")
    assert(joined.filter(col("u_click") =!= col("b_click")).isEmpty,
      "union-window as-of must agree with the range-join as-of on bounded matches")
    // and it never loses a purchase: left-outer semantics
    val nPurch = graft.engine.Tables.events(spark, sf1)
      .filter(col("event_type") === "purchase").count()
    assert(unbounded.count() == nPurch)
  }

  test("burst_dedup: kept events of one (user, type) are >= 5 minutes apart") {
    import spark.implicits._
    val kept = PipelineQueries.burstDedup(spark, sf1).cache()
    val total = graft.engine.Tables.events(spark, sf1).count()
    assert(kept.count() <= total && kept.count() > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type")).orderBy(col("ts"), col("event_id"))
    val gaps = kept.withColumn("prev", lag(col("ts"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select((col("ts").cast("long") - col("prev").cast("long")).as("gap_s"))
      .as[Long].collect()
    assert(gaps.forall(_ >= 300), "consecutive kept events must be >= 5 min apart")
    kept.unpersist()
  }

  test("session_paths: counts bounded by the session count, ranking total-ordered") {
    import spark.implicits._
    val out = PipelineQueries.sessionPaths(spark, sf1)
      .as[(String, Long)].collect()
    assert(out.nonEmpty && out.length <= 20)
    assert(out.forall(_._1.nonEmpty))
    val ns = out.map(_._2)
    assert(ns.sameElements(ns.sorted(Ordering[Long].reverse)))
    // the same 30-minute sessionization backs session_agg: its session count
    // upper-bounds any path-count sum
    val nSessions = graft.queries.ReferenceQueries.sessionAgg(spark, sf1).count()
    assert(ns.sum <= nSessions)
  }

  test("attribution_linear conserves purchase value up to integer-split loss") {
    import spark.implicits._
    val credited = PipelineQueries.attributionLinear(spark, sf1)
      .agg(sum("credited_micros"), sum("n_touches")).as[(Long, Long)].head()
    val (creditedMicros, nTouches) = credited
    // independently recompute the attributed purchases' total value
    val ev = graft.engine.Tables.events(spark, sf1)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val attributed = p.join(c, col("cu") === col("user_id") &&
        col("cts") <= col("ts") &&
        col("cts") >= col("ts") - expr("INTERVAL 1 HOUR"), "left_semi")
      .agg(sum("cents")).as[Long].head()
    val totalMicros = attributed * 1000000L
    // each purchase loses < k micros to floor division (k = its touches)
    assert(creditedMicros <= totalMicros)
    assert(totalMicros - creditedMicros < nTouches,
      s"split loss ${totalMicros - creditedMicros} exceeds touch count $nTouches")
  }

  test("feature_snapshot: point-in-time bounds hold for every user") {
    val out = PipelineQueries.featureSnapshot(spark, sf1).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_7d") > col("n_events")).isEmpty)
    assert(out.filter(col("spend_7d_cents") < 0).isEmpty)
    assert(out.filter(col("days_since_last") < 0).isEmpty,
      "no feature may see past the cutoff")
    val types = graft.engine.Tables.events(spark, sf1)
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(out.select("last_type").collect().forall(r => types(r.getString(0))))
    out.unpersist()
  }

  test("ab_significance: integer inequality agrees with the float z-test") {
    val Array(r) = PipelineQueries.abSignificance(spark, sf1).collect()
    val (na, ca, nb, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(ca <= na && cb <= nb)
    val (p1, p2) = (ca.toDouble / na, cb.toDouble / nb)
    val p = (ca + cb).toDouble / (na + nb)
    if (p == 0.0 || p == 1.0) {
      // zero pooled variance: z undefined, proportions equal — never flagged
      assert(!r.getBoolean(5), "degenerate experiment must not flag")
    } else {
      val z2 = math.pow(p1 - p2, 2) / (p * (1 - p) * (1.0 / na + 1.0 / nb))
      assert(math.abs(z2 - 4.0) > 1e-9, "fixture sits on the decision boundary")
      assert(r.getBoolean(5) == (z2 >= 4.0),
        s"integer flag disagrees with float z² = $z2")
    }
  }

  test("time_to_convert: percentiles are ordered, in-window, exact order statistics") {
    import spark.implicits._
    val out = PipelineQueries.timeToConvert(spark, sf1)
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (day, n, p50, p90) =>
      assert(n > 0)
      assert(p50 <= p90, s"$day: p50 $p50 > p90 $p90")
      assert(p50 >= 0 && p90 <= 3600, s"$day: latency outside the 1h as-of window")
    }
  }

  test("entity_resolution: variants absorb into base entities, canonicals are clean") {
    val out = PipelineQueries.entityResolution(spark, sf1).cache()
    val cust = graft.engine.Tables.customer(spark, sf1)
    val nCust = cust.count()
    // every variant merged into its base: exactly one entity per customer
    assert(out.count() == nCust)
    val dirty = out.filter(col("n_records") === 2)
    assert(dirty.count() == cust.filter(col("c_custkey") % 7 === 0).count())
    // the surviving canonical is always the CLEAN record (no injected 'X')
    assert(out.filter(substring(col("canonical_name"), 10, 1) === "X").isEmpty)
    assert(out.filter(col("n_records") > 2 || col("n_records") < 1).isEmpty)
    out.unpersist()
  }

  test("z-order files have tight envelopes in BOTH dims; date-sort does not") {
    val z = PipelineQueries.zorderLayout(spark, sf1).cache()
    // 8-bit interleave of two 8-bit dims: z div 256 has 256 possible files
    assert(z.count() <= 256)
    import spark.implicits._
    val zSpans = z.select(
      (col("max_x") - col("min_x")).as("xs"),
      (col("max_y") - col("min_y")).as("ys")).as[(Long, Long)].collect()
    val avgX = zSpans.map(_._1).sum.toDouble / zSpans.length
    val avgY = zSpans.map(_._2).sum.toDouble / zSpans.length
    // a z >> 8 prefix fixes the top 4 bits of each dim: spans are < 2^4 = 16
    assert(zSpans.forall { case (xs, ys) => xs < 16 && ys < 16 },
      s"every file envelope fits the 16x16 Morton cell")
    // the same file count laid out date-sorted: x-envelopes cover ~everything
    val orders = graft.engine.Tables.orders(spark, sf1)
      .select((col("o_custkey") % 256).as("x"), col("o_orderdate"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("o_orderdate"))
    val dateFiles = orders
      .withColumn("f", ntile(256).over(w))
      .groupBy("f").agg((max("x") - min("x")).as("xs"))
      .as[(Int, Long)].collect()
    val avgDateX = dateFiles.map(_._2).sum.toDouble / dateFiles.length
    assert(avgX * 4 < avgDateX,
      s"z-order avg x-span $avgX (y $avgY) must be >=4x tighter than date-sorted $avgDateX")
    z.unpersist()
  }

  test("skyline_parts equals the naive O(N^2) dominance anti-join") {
    val fast = PipelineQueries.skylineParts(spark, sf1)
    val part = graft.engine.Tables.part(spark, sf1)
      .select("p_partkey", "p_name", "p_retailprice", "p_size")
    val q = part.select(col("p_retailprice").as("qp"), col("p_size").as("qs"))
    val naive = part.join(q,
        (col("qp") < col("p_retailprice") && col("qs") >= col("p_size")) ||
          (col("qp") <= col("p_retailprice") && col("qs") > col("p_size")),
        "left_anti")
    assert(fast.exceptAll(naive).count() == 0 && naive.exceptAll(fast).count() == 0,
      "staircase skyline must equal the dominance definition")
    // the frontier is an antichain: no member dominates another
    val f = fast.select(col("p_retailprice").as("fp"), col("p_size").as("fs"))
    assert(fast.join(f,
      (col("fp") < col("p_retailprice") && col("fs") >= col("p_size")) ||
        (col("fp") <= col("p_retailprice") && col("fs") > col("p_size")),
      "left_semi").count() == 0)
  }

  test("peak_concurrency equals the single-window naive sweep and is bounded") {
    import org.apache.spark.sql.expressions.Window
    val fast = PipelineQueries.peakConcurrency(spark, sf1).cache()
    // naive recomputation: same sessions, one global window (fine at spec scale)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val s = graft.engine.Tables.events(spark, sf1)
      .withColumn("brk",
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") - lag(col("ts"), 1).over(w) >= expr("INTERVAL 30 MINUTES"), 1)
          .otherwise(0))
      .withColumn("sid", sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
    val deltas = s.select(col("start_ts").as("t"), lit(1L).as("d"), col("user_id"), col("sid"))
      .unionByName(s.select(col("end_ts").as("t"), lit(-1L).as("d"), col("user_id"), col("sid")))
    val naive = deltas
      .withColumn("conc", sum(col("d")).over(
        Window.orderBy(col("t"), col("d").desc, col("user_id"), col("sid"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(date_format(col("t"), "yyyy-MM-dd").as("day"))
      .agg(max(col("conc")).cast("long").as("peak_sessions"))
    assert(fast.exceptAll(naive).count() == 0 && naive.exceptAll(fast).count() == 0,
      "two-pass prefix sweep must equal the single-window sweep")
    // sanity bounds: every day's peak is >= 1 and <= that day's session count
    assert(fast.filter(col("peak_sessions") < 1).count() == 0)
    fast.unpersist()
  }

  test("graph_bfs: sources at 0; every farther node has a neighbor one hop closer") {
    val dist = PipelineQueries.graphBfs(spark, sf1).cache()
    val sources = graft.engine.Tables.part(spark, sf1)
      .filter(col("p_size") === 50).select(col("p_partkey").as("node"))
    assert(dist.filter(col("dist") === 0).join(sources, Seq("node"), "left_anti").count() == 0)
    assert(sources.join(dist.filter(col("dist") === 0), Seq("node"), "left_anti").count() == 0)
    // BFS certificate: d(v) > 0 implies some neighbor u with d(u) = d(v) - 1
    val op = graft.engine.Tables.lineitem(spark, sf1)
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p")).distinct()
    val e0 = op.select(col("k"), col("p").as("src"))
      .join(op.select(col("k"), col("p").as("dst")), "k")
      .filter(col("src") < col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select("src", "dst")
    val edges = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
    val certified = dist.filter(col("dist") > 0)
      .join(edges.withColumnRenamed("src", "node"), "node")
      .join(dist.select(col("node").as("dst"), col("dist").as("dd")), "dst")
      .filter(col("dd") === col("dist") - 1)
      .select("node").distinct()
    val uncertified = dist.filter(col("dist") > 0).select("node")
      .join(certified, Seq("node"), "left_anti")
    assert(uncertified.count() == 0, "every reached node needs a parent one hop closer")
    dist.unpersist()
  }

  test("kcore_parts is a fixpoint: induced degrees match and all >= 3") {
    val core = PipelineQueries.kcoreParts(spark, sf1).cache()
    assert(core.filter(col("core_degree") < 3).count() == 0)
    // recompute degrees over the subgraph induced by the returned node set:
    // a true fixpoint reproduces exactly the reported degrees
    val op = graft.engine.Tables.lineitem(spark, sf1)
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p")).distinct()
    val e0 = op.select(col("k"), col("p").as("src"))
      .join(op.select(col("k"), col("p").as("dst")), "k")
      .filter(col("src") < col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select("src", "dst")
    val edges = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
    val nodes = core.select(col("node"))
    val induced = edges
      .join(nodes.withColumnRenamed("node", "src"), "src", "left_semi")
      .join(nodes.withColumnRenamed("node", "dst"), "dst", "left_semi")
      .groupBy(col("src").as("node")).agg(count(lit(1)).cast("long").as("deg"))
    val mismatch = core.join(induced, "node")
      .filter(col("deg") =!= col("core_degree"))
    assert(mismatch.count() == 0, "core degrees must be the induced-subgraph degrees")
    core.unpersist()
  }

  test("embed_covariance: full upper triangle, PSD diagonal, consistent n") {
    val cov = graft.queries.LlmQueries.embedCovariance(spark, sf1).cache()
    val nVec = graft.engine.Tables.embeddings(spark, sf1).count()
    assert(cov.count() == 64L * 65 / 2, "one cell per unordered dim pair")
    assert(cov.filter(col("n") =!= nVec).count() == 0)
    // n*Σx² − (Σx)² = n² · var ≥ 0 on every diagonal cell
    assert(cov.filter(col("i") === col("j")).filter(col("cov_num") < 0).count() == 0)
    cov.unpersist()
  }

  test("Prefix.exclusiveCumMax equals the window recomputation, null first row") {
    import org.apache.spark.sql.expressions.Window
    val df = graft.engine.Tables.part(spark, sf1)
      .select(col("p_partkey"), col("p_size").cast("long").as("v"))
    val got = graft.engine.Prefix
      .exclusiveCumMax(df, Seq(col("p_partkey")), col("v"), "pm")
    val want = df.withColumn("pm",
      max(col("v")).over(Window.orderBy(col("p_partkey"))
        .rowsBetween(Window.unboundedPreceding, -1)))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    assert(got.filter(col("pm").isNull).count() == 1,
      "exactly the globally-first row has no predecessor max")
  }

  test("late_arrival_stats equals the single-window naive recompute; bounds hold") {
    import org.apache.spark.sql.expressions.Window
    val fast = PipelineQueries.lateArrivalStats(spark, sf1).cache()
    val naive = graft.engine.Tables.events(spark, sf1)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("pm", max(col("ts_us")).over(Window.orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("late_s", when(col("pm").isNotNull && col("pm") > col("ts_us"),
        expr("(pm - ts_us) div 1000000")).otherwise(lit(0L)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_s") > 0, 1L).otherwise(0L)).as("n_late"),
        max(col("late_s")).as("max_late_s"),
        sum(col("late_s")).as("sum_late_s"))
      .withColumn("late_bp", expr("(10000 * n_late) div n_events"))
    assert(fast.exceptAll(naive).count() == 0 && naive.exceptAll(fast).count() == 0,
      "two-pass prefix-max lateness must equal the single-window recompute")
    assert(fast.filter(col("n_late") > col("n_events")).count() == 0)
    assert(fast.filter(col("late_bp") > 10000).count() == 0)
    fast.unpersist()
  }

  test("concurrency_histogram dwell times tile the sweep span exactly") {
    val hist = PipelineQueries.concurrencyHistogram(spark, sf1).cache()
    // the boundary intervals partition [first point, last point]: dwell
    // totals across ALL levels (idle 0 included) must sum to the span
    val ev = graft.engine.Tables.events(spark, sf1)
    val span = ev.agg((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
      .as("span_us")).head.getLong(0)
    val total = hist.agg(sum(col("total_us"))).head.getLong(0)
    assert(total == span,
      s"dwell sum $total must tile the event span $span (no gaps, no overlaps)")
    assert(hist.filter(col("level") < 0).count() == 0, "level never negative")
    assert(hist.filter(col("level") === 0).count() == 1, "idle level present once")
    hist.unpersist()
  }

  test("sequence_motifs: counts conserve the per-user trigram budget; top-50 exact") {
    val got = PipelineQueries.sequenceMotifs(spark, sf1).collect()
    assert(got.nonEmpty && got.length <= 50)
    // total trigram occurrences across ALL motifs = sum over users of (n_i - 2)
    val ev = graft.engine.Tables.events(spark, sf1)
    val budget = ev.groupBy(col("user_id")).count()
      .agg(sum(greatest(col("count") - 2, lit(0L)))).head.getLong(0)
    val fullCount = ev.count() // trigger a concrete plan before reuse
    assert(fullCount > 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val full = ev.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("s2", lead(col("event_type"), 1).over(w))
      .withColumn("s3", lead(col("event_type"), 2).over(w))
      .filter(col("s3").isNotNull)
      .groupBy(col("event_type").as("s1"), col("s2"), col("s3"))
      .agg(count(lit(1)).as("n"))
    assert(full.agg(sum(col("n"))).head.getLong(0) == budget,
      "every user contributes exactly max(0, events-2) trigrams")
    // the judged rows are the true top-50 under the full deterministic order
    val top = full.orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
      .limit(50).select("s1", "s2", "s3", "n").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    val gotKeys = got.map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(gotKeys.toSeq == top.toSeq, "top-50 motifs must match the full recount")
  }

  test("compaction_bins: partition of each source, offsets consistent with target") {
    val bins = PipelineQueries.compactionBins(spark, sf1).cache()
    val docs = graft.engine.Tables.documents(spark, sf1)
    val perSource = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_all"), sum(col("n_chars")).as("chars_all"))
    val agg = bins.groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs_all"), sum(col("total_chars")).as("chars_all"))
    assert(agg.exceptAll(perSource).count() == 0 && perSource.exceptAll(agg).count() == 0,
      "bins partition every source's documents exactly")
    // next-fit by offset: a bin's member offsets start inside [bin*T, (bin+1)*T)
    // so no bin except possibly the last can hold less than T - max doc size...
    // spec-scale check: bin ids per source are contiguous from 0
    import org.apache.spark.sql.expressions.Window
    val gaps = bins.withColumn("prev",
        lag(col("bin"), 1).over(Window.partitionBy(col("source")).orderBy(col("bin"))))
      .filter(col("prev").isNotNull && col("bin") =!= col("prev") + 1)
    assert(gaps.count() == 0, "bin ids contiguous per source (offsets tile)")
    assert(bins.filter(col("bin") === 0).select(countDistinct(col("source"))).head.getLong(0)
      == bins.select(countDistinct(col("source"))).head.getLong(0))
    bins.unpersist()
  }

  test("k_anonymize: every non-suppressed equivalence class holds >= k records") {
    // the property the operator exists to guarantee — sf0.01 so classes
    // actually clear k=20 at some level (sf0.001 suppresses everything,
    // which the second assertion covers as the degenerate case)
    val k = 20
    val rel = PipelineQueries.kAnonymize(spark, "/root/testdata/sf0.01").cache()
    val small = rel.filter(col("gen_level") < 2)
      .groupBy("qi_geo", "qi_segment").agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
    assert(small.count() == 0, "a released QI class has fewer than k members")
    assert(rel.filter(col("gen_level") === 2)
      .filter(col("qi_geo") =!= "*" || col("qi_segment") =!= "*").count() == 0,
      "suppressed records must release no QI value")
    // release is uniform per segment (full-domain recoding)
    val seg = graft.engine.Tables.customer(spark, "/root/testdata/sf0.01")
      .select(col("c_custkey"), col("c_mktsegment"))
    assert(rel.join(seg, "c_custkey")
      .groupBy("c_mktsegment").agg(countDistinct(col("gen_level")).as("lv"))
      .filter(col("lv") > 1).count() == 0, "mixed levels inside one segment")
    rel.unpersist()
  }

  test("decayed_engagement: the shift-wrap guard zeroes ancient events") {
    // no fixture row is >= 63 days old, so the guard's one edge case is
    // pinned here with synthetic ages instead of relying on the oracle
    import spark.implicits._
    val rows = Seq((1000L, 0L), (1000L, 1L), (1000L, 62L), (1000L, 63L),
      (1000L, 64L), (1000L, 200L)).toDF("cents", "age")
    val got = rows.withColumn("d", PipelineQueries.decayedCentsExpr)
      .orderBy("age").select("d").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1000L, 500L, 0L, 0L, 0L, 0L))
    // the wrap the guard exists for: Java shift counts wrap at 64, so the
    // UNGUARDED form returns the full undecayed value for age 64
    val wrapped = rows.filter(col("age") === 64)
      .withColumn("d", expr("shiftright(cents, cast(age AS int))"))
      .select("d").head().getLong(0)
    assert(wrapped == 1000L, "Java wrap semantics changed — revisit the guard")
  }

  test("shard_assignment: all 64 shards reported, occupancy sums to corpus") {
    val out = PipelineQueries.shardAssignment(spark, sf1).cache()
    assert(out.count() == 64, "empty shards must still be reported")
    val total = out.agg(sum(col("n_docs"))).head().getLong(0)
    assert(total == graft.engine.Tables.documents(spark, sf1).count())
    assert(out.filter(col("n_docs") === 0 && col("skew_bp") =!= 0).count() == 0)
    out.unpersist()
  }

  test("ivm_join: the delta decomposition equals the direct full-snapshot join") {
    import graft.queries.AnalyticsQueries
    val folded = AnalyticsQueries.ivmJoin(spark, sf1)
      .orderBy("n_name").collect().toSeq
    val ord = graft.engine.Tables.orders(spark, sf1)
    val cust = graft.engine.Tables.customer(spark, sf1)
    val nat = graft.engine.Tables.nation(spark, sf1)
    val direct = ord.join(cust, col("o_custkey") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum((col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long")).as("revenue_cents"), count(lit(1)).as("n_orders"))
      .orderBy("n_name").collect().toSeq
    assert(folded == direct, "delta rule drifted from the snapshot join")
  }

  test("observed_metrics: counters equal an independent aggregate; metrics ride the pass, not a second scan") {
    val m = PipelineQueries.observedMetrics(spark, sf1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent recomputation straight off the table
    val li = graft.engine.Tables.lineitem(spark, sf1)
      .filter(col("l_quantity") > 0)
      .select(floor(col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long").as("cents"), col("l_returnflag"))
    val exp = li.agg(
      count(lit(1)).as("rows_out"), sum(col("cents")).as("cents_out"),
      sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("returned_rows"),
      min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents")).head()
    assert(m("rows_out") == exp.getLong(0))
    assert(m("cents_out") == exp.getLong(1))
    assert(m("returned_rows") == exp.getLong(2))
    assert(m("min_cents") == exp.getLong(3))
    assert(m("max_cents") == exp.getLong(4))
    // the piggyback property: an observed pass plans a CollectMetrics node
    // over the SINGLE projected scan (no second aggregate subtree)
    val obs = org.apache.spark.sql.Observation()
    val pass = li.observe(obs, count(lit(1)).as("n"))
    val plan = pass.queryExecution.optimizedPlan.toString
    assert(plan.contains("CollectMetrics"), plan)
    pass.write.format("noop").mode("overwrite").save()
    assert(obs.get("n").asInstanceOf[Long] == m("rows_out"))
  }
}
