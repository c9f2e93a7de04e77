package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.plans.AsofJoin

/** The native as-of operator ([[graft.plans.AsofJoinExec]]): semantics
  * pinned against the composed range-join form and on hand-built edges the
  * fixtures may not cover (exact-boundary tolerance, equal-time ties, null
  * keys, empty right partitions).
  */
class AsofJoinSpec extends SparkSuite {
  import spark.implicits._

  private def leftDf = Seq(
    // (key, t, id)
    ("a", 100L, 1L), ("a", 200L, 2L), ("a", 200L, 3L), ("b", 50L, 4L),
    ("b", 300L, 5L), ("c", 10L, 6L), (null.asInstanceOf[String], 100L, 7L)
  ).toDF("k", "t", "lid")

  private def rightDf = Seq(
    ("a", 90L, 10L), ("a", 150L, 11L), ("a", 150L, 12L), ("a", 201L, 13L),
    ("b", 290L, 14L), (null.asInstanceOf[String], 5L, 15L)
  ).toDF("rk", "rt", "rid")

  test("left as-of join: most recent right at-or-before, ties to greatest id") {
    val out = AsofJoin.join(leftDf, rightDf, Seq("k" -> "rk"), "t", "rt",
        rightTiebreak = Seq("rid"))
      .select("lid", "rid").collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(
      1L -> 10L,  // a@100: latest ≤100 is 90
      2L -> 12L,  // a@200: latest ≤200 is 150, tie → rid 12
      3L -> 12L,
      4L -> -1L,  // b@50: nothing ≤50
      5L -> 14L,  // b@300 → 290
      6L -> -1L,  // c: no right key
      7L -> -1L)) // null key never matches
  }

  test("tolerance is a closed bound: exactly-at-lookback matches, older does not") {
    // a@200 vs right a@150: distance 50
    val at = AsofJoin.join(leftDf, rightDf, Seq("k" -> "rk"), "t", "rt",
        rightTiebreak = Seq("rid"), tolerance = Some("50 microseconds"))
      .filter($"lid" === 2L).select("rid").collect()
    assert(at.head.getLong(0) == 12L)
    val under = AsofJoin.join(leftDf, rightDf, Seq("k" -> "rk"), "t", "rt",
        rightTiebreak = Seq("rid"), tolerance = Some("49 microseconds"))
      .filter($"lid" === 2L).select("rid").collect()
    assert(under.head.isNullAt(0), "a match older than the lookback must drop")
  }

  test("inner form drops unmatched left rows") {
    val out = AsofJoin.join(leftDf, rightDf, Seq("k" -> "rk"), "t", "rt",
      rightTiebreak = Seq("rid"), inner = true)
    assert(out.count() == 4L)
    assert(out.filter($"rid".isNull).count() == 0L)
  }

  test("SQL table function pairs comma-separated multi-key lists positionally") {
    AsofJoin.registerSql(spark)
    Seq(("a", 1L, 100L, 10L), ("a", 2L, 100L, 20L), ("b", 1L, 100L, 30L))
      .toDF("g", "sub", "t", "lid").createOrReplaceTempView("graft_mk_left")
    Seq(("a", 1L, 90L, 1L), ("a", 2L, 95L, 2L), ("b", 2L, 99L, 3L))
      .toDF("rg", "rsub", "rt", "rid").createOrReplaceTempView("graft_mk_right")
    val out = spark.sql(
      """SELECT lid, rid FROM graft_asof_join('graft_mk_left', 'graft_mk_right',
        |  'g,sub', 'rg,rsub', 't', 'rt', 'rid', '', 'left')""".stripMargin)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // the composite (g, sub) key must pair component-wise: (a,1)->1,
    // (a,2)->2, (b,1) has no (b,1) right — only (b,2), which must NOT match
    assert(out == Map(10L -> 1L, 20L -> 2L, 30L -> -1L), s"got $out")
  }

  test("the TVF's 11th argument reaches the banded form and equals the plain SQL call") {
    AsofJoin.registerSql(spark)
    leftDf.createOrReplaceTempView("graft_band_l")
    rightDf.createOrReplaceTempView("graft_band_r")
    def run(tail: String) = spark.sql(
      s"""SELECT lid, rid FROM graft_asof_join('graft_band_l', 'graft_band_r',
         |  'k', 'rk', 't', 'rt', 'rid', '0.0002 seconds', 'left'$tail)""".stripMargin)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val plain = run(", 'nearest'")
    val banded = run(", 'nearest', '0.0003 seconds'")
    assert(banded == plain, s"banded TVF diverges: $banded vs $plain")
    // banding without a tolerance is a contract violation, rejected eagerly
    val err = intercept[Exception] {
      spark.sql("""SELECT * FROM graft_asof_join('graft_band_l', 'graft_band_r',
        |  'k', 'rk', 't', 'rt', 'rid', '', 'left', 'backward', '1 hour')""".stripMargin)
    }
    assert(err.getMessage.contains("tolerance"), err.getMessage)
  }

  test("subquery inputs go through temp views (the documented TVF route)") {
    // graft_asof_join takes catalog NAMES; the documented route for a
    // CTE/subquery input is CREATE TEMP VIEW then name the view. This pins
    // that route end-to-end: SQL-defined views (one from a subquery with a
    // filter + projection) feed the TVF and plan the native exec.
    AsofJoin.registerSql(spark)
    leftDf.createOrReplaceTempView("graft_tv_lraw")
    rightDf.createOrReplaceTempView("graft_tv_rraw")
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW graft_tv_left AS
        |SELECT k, t, lid FROM graft_tv_lraw WHERE k = 'a'""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW graft_tv_right AS
        |SELECT rk, rt, rid FROM graft_tv_rraw WHERE rt < 200""".stripMargin)
    val df = spark.sql(
      """SELECT lid, rid FROM graft_asof_join('graft_tv_left', 'graft_tv_right',
        |  'k', 'rk', 't', 'rt', 'rid', '', 'left')""".stripMargin)
    assert(df.queryExecution.executedPlan.toString.contains("AsofJoin"),
      "the view route must still plan the native exec")
    val out = df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // view filters applied: rt<200 removes the 201 candidate, k='a' keeps 3 lefts
    assert(out == Map(1L -> 10L, 2L -> 12L, 3L -> 12L), s"got $out")
    // and a NAME that is not in the catalog fails with the standard
    // table-not-found analysis error, pointing the user at the contract
    val err = intercept[Exception] {
      spark.sql(
        """SELECT * FROM graft_asof_join('graft_no_such_view', 'graft_tv_right',
          |  'k', 'rk', 't', 'rt', '', '', 'left')""".stripMargin)
    }
    assert(err.getMessage.contains("graft_no_such_view"), err.getMessage)
  }

  test("forward direction: earliest at-or-after, ties to SMALLEST id, shared right serves many lefts") {
    val out = AsofJoin.join(leftDf, rightDf, Seq("k" -> "rk"), "t", "rt",
        rightTiebreak = Seq("rid"), direction = "forward")
      .select("lid", "rid").collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(
      1L -> 11L,  // a@100: earliest ≥100 is 150, tie (11,12) → SMALLEST rid 11
      2L -> 13L,  // a@200: earliest ≥200 is 201
      3L -> 13L,  // a@200 again: the SAME forward right serves both lefts
      4L -> 14L,  // b@50: earliest ≥50 is 290
      5L -> -1L,  // b@300: nothing after
      6L -> -1L,  // c: no right key
      7L -> -1L)) // null key never matches
    // closed tolerance bound on the forward side: a@100 → 150 at distance 50
    val at = AsofJoin.join(leftDf, rightDf, Seq("k" -> "rk"), "t", "rt",
        rightTiebreak = Seq("rid"), tolerance = Some("50 microseconds"),
        direction = "forward")
      .filter($"lid" === 1L).select("rid").collect()
    assert(at.head.getLong(0) == 11L)
    val under = AsofJoin.join(leftDf, rightDf, Seq("k" -> "rk"), "t", "rt",
        rightTiebreak = Seq("rid"), tolerance = Some("49 microseconds"),
        direction = "forward")
      .filter($"lid" === 1L).select("rid").collect()
    assert(under.head.isNullAt(0), "a forward match past the window must drop")
    // equal-time right IS a forward match (at-or-after is closed)
    val eq = AsofJoin.join(
        Seq(("a", 150L, 50L)).toDF("k", "t", "lid"), rightDf,
        Seq("k" -> "rk"), "t", "rt", rightTiebreak = Seq("rid"),
        direction = "forward")
      .select("rid").collect()
    assert(eq.head.getLong(0) == 11L, "rt == lt must match forward")
  }

  test("nearest direction: closer side wins, equal distance prefers backward") {
    val l = Seq(
      ("a", 100L, 1L),  // back 90 (d10) vs fwd 150 (d50) → back
      ("a", 130L, 2L),  // back 90 (d40) vs fwd 150 (d20) → fwd
      ("a", 120L, 3L),  // back 90 (d30) vs fwd 150 (d30) → TIE → backward
      ("b", 500L, 4L),  // only back 290
      ("c", 10L, 5L)    // no rights
    ).toDF("k", "t", "lid")
    val out = AsofJoin.join(l, rightDf, Seq("k" -> "rk"), "t", "rt",
        rightTiebreak = Seq("rid"), direction = "nearest")
      .select("lid", "rid").collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(1L -> 10L, 2L -> 11L, 3L -> 10L, 4L -> 14L, 5L -> -1L),
      s"got $out")
    // per-side tolerance: at ±25 the a@130 left keeps only the forward side
    val tight = AsofJoin.join(l, rightDf, Seq("k" -> "rk"), "t", "rt",
        rightTiebreak = Seq("rid"), tolerance = Some("25 microseconds"),
        direction = "nearest")
      .select("lid", "rid").collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(tight == Map(1L -> 10L, 2L -> 11L, 3L -> -1L, 4L -> -1L, 5L -> -1L),
      s"got $tight")
  }

  test("the merge loop runs inside a whole-stage codegen fence (both modes)") {
    // executedPlan AFTER an action reflects the AQE final plan, where
    // codegen collapse has run; codegen'd operators print with a "*(id)"
    // stage prefix in the simple string form.
    for (innerMode <- Seq(true, false)) {
      val df = AsofJoin.join(leftDf, rightDf, Seq("k" -> "rk"), "t", "rt",
        rightTiebreak = Seq("rid"), inner = innerMode)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val fenced = plan.linesIterator.exists(l =>
        l.contains("AsofJoin") && l.contains("*("))
      assert(fenced,
        s"AsofJoin (inner=$innerMode) fell out of whole-stage codegen:\n$plan")
    }
    // and codegen output equals the interpreted path on the same inputs
    val session = spark.newSession()
    session.conf.set("spark.sql.codegen.wholeStage", "false")
    import session.implicits._
    val l2 = leftDf.as[(String, Long, Long)].collect().toSeq.toDF("k", "t", "lid")
    val r2 = rightDf.as[(String, Long, Long)].collect().toSeq.toDF("rk", "rt", "rid")
    val interp = AsofJoin.join(l2, r2, Seq("k" -> "rk"), "t", "rt",
        rightTiebreak = Seq("rid"))
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val gen = AsofJoin.join(leftDf, rightDf, Seq("k" -> "rk"), "t", "rt",
        rightTiebreak = Seq("rid"))
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(interp == gen, "interpreted and generated paths disagree")
  }

  test("native operator reproduces the composed asof_join query bit-for-bit") {
    val composed = queries.ReferenceQueries.asofJoin(spark, sf1)
      .orderBy("purchase_id").collect().toSeq
    val native = queries.ReferenceQueries.asofJoinNative(spark, sf1)
      .orderBy("purchase_id").collect().toSeq
    assert(native == composed)
  }

  test("results are invariant to shuffle width (co-partitioning, not luck) in every direction") {
    for (d <- Seq("backward", "forward", "nearest")) {
      val base = AsofJoin.join(leftDf.repartition(7), rightDf.repartition(3),
          Seq("k" -> "rk"), "t", "rt", rightTiebreak = Seq("rid"), direction = d)
        .collect().toSet
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        val one = AsofJoin.join(leftDf, rightDf, Seq("k" -> "rk"), "t", "rt",
          rightTiebreak = Seq("rid"), direction = d).collect().toSet
        assert(one == base, s"direction=$d differs across shuffle widths")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }

  test("left-side conjuncts push through the native node; right-side stay put") {
    import org.apache.spark.sql.execution.FormattedMode
    val ev = engine.Tables.events(spark, sf1)
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val r = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"),
        col("event_id").as("cid"))
    val joined = AsofJoin.join(l, r, Seq("user_id" -> "cu"), "ts", "cts",
      rightTiebreak = Seq("cid"))
    val f = joined.filter(col("event_id") > 5000L && col("cid") > 100L)
    val plan = f.queryExecution.explainString(FormattedMode)
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("GreaterThan(event_id,5000)"),
      s"left conjunct must reach the parquet scan through the custom node, " +
        s"got pushed filters:\n$pushed\nplan:\n$plan")
    // semantics: identical to post-hoc filtering of the unfiltered join —
    // in particular the right conjunct did NOT reduce match candidates
    val all = joined.collect()
    val ei = joined.columns.indexOf("event_id")
    val ci = joined.columns.indexOf("cid")
    val expect = all.filter(row => !row.isNullAt(ei) && row.getLong(ei) > 5000L &&
      !row.isNullAt(ci) && row.getLong(ci) > 100L).toSet
    assert(f.collect().toSet == expect)
  }

  test("time-banded split equals the plain join in every direction and mode (hot-key escape hatch)") {
    // one pathologically hot key (500 lefts, 500 rights) plus cold keys,
    // with times straddling band boundaries and negative (pre-epoch) values
    // to exercise the floorDiv banding; band width deliberately SMALLER
    // than the default 4τ so rights genuinely replicate across bands
    val lefts = spark.range(500)
      .select(lit("hot").as("k"), (col("id") * 13L - 1000L).as("t"), col("id").as("lid"))
      .union(spark.range(40).select(concat(lit("c"), col("id") % 4).as("k"),
        (col("id") * 13L - 1000L).as("t"), (col("id") + 9000L).as("lid")))
    val rights = spark.range(500)
      .select(lit("hot").as("rk"), (col("id") * 7L - 900L).as("rt"), col("id").as("rid"))
      .union(spark.range(40).select(concat(lit("c"), col("id") % 4).as("rk"),
        (col("id") * 7L - 900L).as("rt"), (col("id") + 9500L).as("rid")))
    for (dir <- Seq("backward", "forward", "nearest"); inner <- Seq(true, false)) {
      def rowsOf(df: org.apache.spark.sql.DataFrame) =
        df.select($"lid", coalesce($"rid", lit(-1L))).as[(Long, Long)].collect().toSet
      val plain = rowsOf(AsofJoin.join(lefts, rights, Seq("k" -> "rk"), "t", "rt",
        rightTiebreak = Seq("rid"), tolerance = Some("0.0002 seconds"),
        inner = inner, direction = dir))
      val banded = rowsOf(AsofJoin.joinTimeBanded(lefts, rights, Seq("k" -> "rk"),
        "t", "rt", rightTiebreak = Seq("rid"), tolerance = "0.0002 seconds",
        inner = inner, direction = dir, bandWidth = "0.0003 seconds"))
      assert(banded == plain,
        s"banded split diverges (direction=$dir, inner=$inner): " +
          s"missing=${(plain -- banded).take(5)} extra=${(banded -- plain).take(5)}")
      assert(plain.exists(_._2 >= 0L), s"no matches at all in direction=$dir — vacuous")
    }
  }

  test("timestamp time columns work end-to-end (micros semantics)") {
    val l = Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 1L))
      .toDF("k", "t", "lid")
    val r = Seq(
      ("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10L),
      ("a", java.sql.Timestamp.valueOf("2024-01-01 00:09:59"), 11L))
      .toDF("rk", "rt", "rid")
    val hit = AsofJoin.join(l, r, Seq("k" -> "rk"), "t", "rt",
      tolerance = Some("1 minute")).select("rid").collect().head
    assert(hit.getLong(0) == 11L)
    val miss = AsofJoin.join(l, r, Seq("k" -> "rk"), "t", "rt",
      tolerance = Some("500 milliseconds")).select("rid").collect().head
    assert(miss.isNullAt(0))
  }
}
