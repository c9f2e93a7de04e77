package graft

import java.sql.Timestamp

import graft.streaming.Streaming
import graft.streaming.Streaming.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** Processor-API parity (SURVEY.md A3/W1/W2): per-record state-store fold
  * via transformWithState, and stream-time punctuation via event-time
  * timers.
  */
class TransformWithStateSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val rows = Seq(
    Event(1, ts(5), 1, "p", 10.0, "{}"),
    Event(2, ts(6), 1, "p", 2.0, "{}"),
    Event(3, ts(7), 2, "p", 7.5, "{}"))

  test("RunningTotalProcessor emits per-record running totals (A3)") {
    val ms = MemoryStream[Event](spark)
    ms.addData(rows)
    val out = Streaming.withProcessor(ms.toDS(), new Streaming.RunningTotalProcessor)
    val q = out.toDF("user_id", "total").writeStream.format("memory")
      .queryName("tws_total").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-tws").toString)
      .start()
    q.processAllAvailable(); q.stop()
    val emissions = spark.table("tws_total").as[(Long, Double)].collect().toSeq
    // per-record emission: user 1 produced 10.0 then 12.0; user 2 produced 7.5
    assert(emissions.toSet == Set((1L, 10.0), (1L, 12.0), (2L, 7.5)))
    // final totals equal batch sum
    val finalTotals = emissions.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(finalTotals == Map(1L -> 12.0, 2L -> 7.5))
  }

  test("KTable.filter update stream emits tombstones on retraction (changelog parity)") {
    val ms = MemoryStream[Event](spark)
    val out = Streaming.filteredTableUpdates(ms.toDS(), _ >= 5.0)
    val q = out.writeStream.format("memory")
      .queryName("tws_tomb").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-tomb").toString)
      .start()
    def table() = spark.table("tws_tomb")
      .as[(Long, Option[Double])].collect().toSeq

    // batch 1: user 1 latest=10.0 (matches) -> upsert; user 2 latest=3.0
    // (never matched) -> silence, NOT a tombstone
    ms.addData(Seq(Event(1, ts(10), 1, "p", 10.0, "{}"),
      Event(2, ts(10), 2, "p", 3.0, "{}")))
    q.processAllAvailable()
    assert(table() == Seq((1L, Some(10.0))))

    // batch 2: user 1's newest upsert stops matching -> tombstone (key, null);
    // user 2 rises above the threshold -> first upsert
    ms.addData(Seq(Event(3, ts(20), 1, "p", 2.0, "{}"),
      Event(4, ts(20), 2, "p", 7.0, "{}")))
    q.processAllAvailable()
    assert(table().drop(1).toSet == Set((1L, None), (2L, Some(7.0))))

    // batch 3: an OUT-OF-ORDER older upsert for user 1 must not regress the
    // view (latest is still the failing value) -> no emission
    ms.addData(Seq(Event(0, ts(5), 1, "p", 99.0, "{}")))
    q.processAllAvailable()
    assert(table().size == 3)
    q.stop()

    // convergence: replaying the changelog (last update per key, dropping
    // tombstoned keys) equals the batch KTable filtered view on the same rows
    val allRows = Seq(
      Event(1, ts(10), 1, "p", 10.0, "{}"), Event(2, ts(10), 2, "p", 3.0, "{}"),
      Event(3, ts(20), 1, "p", 2.0, "{}"), Event(4, ts(20), 2, "p", 7.0, "{}"),
      Event(0, ts(5), 1, "p", 99.0, "{}"))
    val batchView = graft.api.KStream(allRows.toDF, "user_id", "ts")
      .toTable(Seq("ts", "event_id"))
      .filter(org.apache.spark.sql.functions.col("value") >= 5.0)
      .df.select("user_id", "value").as[(Long, Double)].collect().toMap
    val replayed = table().groupBy(_._1).view
      .mapValues(_.last._2).toMap.collect { case (k, Some(v)) => k -> v }
    assert(replayed == batchView)
  }

  test("PunctuationProcessor forwards state on stream-time timers (W2)") {
    val ms = MemoryStream[Event](spark)
    val out = Streaming.withProcessor(
      ms.toDS().withWatermark("ts", "0 seconds").as[Event],
      new Streaming.PunctuationProcessor(intervalMs = 10000),
      TimeMode.EventTime(), OutputMode.Append())
    val q = out.toDF("user_id", "total").writeStream.format("memory")
      .queryName("tws_punct").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-punct").toString)
      .start()
    // batch 1 arms timers; batch 2 advances the watermark far past them so
    // they fire — stream-time, not wall-clock (no sleeps).
    ms.addData(rows); q.processAllAvailable()
    ms.addData(Seq(Event(9, ts(1000), 1, "p", 0.5, "{}"))); q.processAllAvailable()
    ms.addData(Seq(Event(10, ts(2000), 2, "p", 1.0, "{}"))); q.processAllAvailable()
    q.stop()
    val emissions = spark.table("tws_punct").as[(Long, Double)].collect().toSeq
    assert(emissions.nonEmpty, "timers must have fired on stream-time advance")
    // every emission is a snapshot of the running total at punctuation time
    val byUser = emissions.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byUser(1L).contains(12.0) || byUser(1L).contains(12.5))
    assert(byUser.get(2L).forall(_.subsetOf(Set(7.5, 8.5))))
  }

  test("TypeCountsProcessor MapState counters survive across micro-batches (W1)") {
    import org.apache.spark.sql.{Encoders => E}
    val ms = MemoryStream[Event](spark)
    val changelog = ms.toDS().groupByKey(_.user_id)(E.scalaLong)
      .transformWithState(new Streaming.TypeCountsProcessor,
        TimeMode.None(), OutputMode.Update())(
        E.tuple(E.scalaLong, E.STRING, E.scalaLong))
    val q = changelog.toDF("user_id", "event_type", "n")
      .writeStream.format("memory").queryName("tws_map").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-map").toString)
      .start()
    ms.addData(Seq(Event(1, ts(1), 1, "click", 0, "{}"),
      Event(2, ts(2), 1, "view", 0, "{}"), Event(3, ts(3), 2, "click", 0, "{}")))
    q.processAllAvailable()
    // second batch increments an EXISTING map entry — proves the map value
    // was restored from the store, not re-initialized
    ms.addData(Seq(Event(4, ts(4), 1, "click", 0, "{}")))
    q.processAllAvailable(); q.stop()
    val em = spark.table("tws_map").as[(Long, String, Long)].collect().toSeq
    assert(em.contains((1L, "click", 2L)), s"cross-batch increment missing: $em")
    val converged = em.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).max).toMap
    assert(converged == Map((1L, "click") -> 2L, (1L, "view") -> 1L, (2L, "click") -> 1L))
  }

  test("RecentEventsProcessor ListState buffer is event-time-ordered and arrival-order-proof (W1)") {
    import org.apache.spark.sql.{Encoders => E}
    val ms = MemoryStream[Event](spark)
    val changelog = ms.toDS().groupByKey(_.user_id)(E.scalaLong)
      .transformWithState(new Streaming.RecentEventsProcessor,
        TimeMode.None(), OutputMode.Update())(
        E.tuple(E.scalaLong, E.scalaLong, E.STRING))
    val q = changelog.toDF("user_id", "version", "recent_ids")
      .writeStream.format("memory").queryName("tws_list").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-list").toString)
      .start()
    ms.addData(Seq(Event(1, ts(10), 1, "p", 0, "{}"),
      Event(2, ts(5), 1, "p", 0, "{}")))
    q.processAllAvailable()
    // batch 2: one OLDER out-of-order event and one newer — the buffer must
    // order by event time (4 newest, then 1, then late-arriving 3; 2 evicted)
    ms.addData(Seq(Event(3, ts(7), 1, "p", 0, "{}"),
      Event(4, ts(20), 1, "p", 0, "{}")))
    q.processAllAvailable(); q.stop()
    val em = spark.table("tws_list").as[(Long, Long, String)].collect().toSeq
    val converged = em.maxBy(_._2)
    assert(converged._3 == "4,1,3",
      s"expected event-time order 4,1,3 got ${converged._3} (emissions: $em)")
  }

  test("IvmDeltaProcessor deltas telescope to the snapshot across batches and tombstones") {
    import graft.streaming.Streaming.OrderVersion
    val ms = MemoryStream[OrderVersion](spark)
    val out = ms.toDS().groupByKey(_.o_custkey)(org.apache.spark.sql.Encoders.scalaLong)
      .transformWithState(new Streaming.IvmDeltaProcessor,
        TimeMode.None(), OutputMode.Update())(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong))
    val q = out.toDF("grp", "dn", "dc").writeStream.format("memory")
      .queryName("tws_ivm").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-ivm").toString)
      .start()
    // batch 1, deliberately out of order within the batch: customer 1 moves
    // A(100) → B(250); customer 2 inserts C(40)
    ms.addData(Seq(
      OrderVersion(1, 12, "O", "B", ts(20), 250),
      OrderVersion(1, 11, "O", "A", ts(10), 100),
      OrderVersion(2, 21, "O", "C", ts(10), 40)))
    q.processAllAvailable()
    // batch 2: customer 1 is tombstoned; customer 2 re-prices within C;
    // customer 3 inserts then deletes then re-inserts in A
    ms.addData(Seq(
      OrderVersion(1, 13, "F", "B", ts(30), 999),
      OrderVersion(2, 22, "O", "C", ts(20), 55),
      OrderVersion(3, 31, "O", "A", ts(10), 10),
      OrderVersion(3, 32, "F", "A", ts(20), 0),
      OrderVersion(3, 33, "O", "A", ts(30), 70)))
    q.processAllAvailable(); q.stop()
    val sums = spark.table("tws_ivm").as[(String, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(xs => (xs.map(_._2).sum, xs.map(_._3).sum))
      .filter(_._2._1 != 0).toMap
    // converged view: customer 1 gone, customer 2 at C(55), customer 3 at A(70)
    assert(sums == Map("C" -> ((1L, 55L)), "A" -> ((1L, 70L))), sums.toString)
  }

  test("AsofEnrichProcessor holds a left until matured; an out-of-order right changes its answer") {
    import graft.streaming.Streaming.{AsofEvent, AsofMatch}
    val ms = MemoryStream[AsofEvent[Long]](spark)
    val matches = Streaming.asofEnrichStream(
      ms.toDS().withWatermark("ts", "5 seconds"), tolMicros = 3600L * 1000000L)
    val q = matches.toDF().writeStream.format("memory")
      .queryName("tws_asof").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-asof").toString)
      .start()
    // batch 1: left L100 @10s and right R1 @2s — L100 must NOT answer yet
    // (watermark 5s < 10s; a later right ≤ 10s could still arrive)
    ms.addData(Seq(AsofEvent(1L, ts(10), 100, isLeft = true),
      AsofEvent(1L, ts(2), 1, isLeft = false)))
    q.processAllAvailable()
    assert(spark.table("tws_asof").isEmpty,
      "a left must not be answered before the watermark passes its time")
    // batch 2: an OUT-OF-ORDER right R2 @8s (newer than R1, still ≤ L100's
    // 10s, inside the 5s delay) plus a right @20s that pushes the
    // watermark to 15s — maturing L100, whose answer must be R2, not R1
    ms.addData(Seq(AsofEvent(1L, ts(8), 2, isLeft = false),
      AsofEvent(1L, ts(20), 3, isLeft = false)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("tws_asof").as[AsofMatch[Long]].collect().toSeq
    assert(out == Seq(AsofMatch(100L, 1L, Some(2L), 10000000L)),
      s"expected L100 matched to the late-arriving R2, got $out")
  }

  test("streaming processor ≡ native batch operator on identical rows, every direction (ASOF.md)") {
    import graft.streaming.Streaming.{AsofEvent, AsofMatch}
    // (user, t_s, id): ties, exact-tolerance edges, keys with no rights,
    // rights newer than every left — the definition's corner set
    val rights = Seq((1L, 2L, 1L), (1L, 8L, 2L), (1L, 8L, 3L), (2L, 5L, 4L),
      (1L, 20L, 5L), (2L, 30L, 6L), (4L, 7L, 7L))
    val lefts = Seq((1L, 10L, 100L), (1L, 9L, 101L), (2L, 6L, 102L),
      (2L, 25L, 103L), (3L, 5L, 104L), (1L, 13L, 105L))
    val tolMicros = 5L * 1000000L // 5 s closed-bound window
    for ((dirCode, dirName) <- Seq(0 -> "backward", 1 -> "forward", 2 -> "nearest")) {
      // STREAMING: two shuffled batches (out-of-order within and across), a
      // far-future sentinel right on an unused key advances the global
      // watermark past every left's maturation bound (lt, or lt + τ for
      // forward/nearest). The watermark DELAY must cover the shuffle's
      // disorder (rows span 2–30 s): with delay 0 a row arriving after a
      // later-timestamped batch is late-DROPPED by the zero-grace
      // contract — correct streaming behavior, but then the surfaces see
      // different inputs and the equivalence claim is vacuous.
      val ms = MemoryStream[AsofEvent[Long]](spark)
      val matches = Streaming.asofEnrichStream(
        ms.toDS().withWatermark("ts", "30 seconds"), tolMicros, dirCode)
      val sink = s"tws_asof_xform_$dirName"
      val q = matches.toDF().writeStream.format("memory")
        .queryName(sink).outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"ck-asof-x-$dirName").toString)
        .start()
      val all = rights.map { case (u, t, i) => AsofEvent(u, ts(t), i, isLeft = false) } ++
        lefts.map { case (u, t, i) => AsofEvent(u, ts(t), i, isLeft = true) }
      val (b1, b2) = scala.util.Random.shuffle(all).splitAt(all.size / 2)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2 :+ AsofEvent(99L, ts(1000), 999, isLeft = false))
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table(sink).as[AsofMatch[Long]].collect()
        .map(m => (m.left_id, m.key, m.right_id.getOrElse(-1L))).toSet
      // NATIVE BATCH on the same rows
      val lDf = lefts.toDF("u", "t", "lid")
        .select($"u", ($"t" * 1000000L).as("lt"), $"lid")
      val rDf = rights.toDF("ru", "rt0", "rid")
        .select($"ru", ($"rt0" * 1000000L).as("rt"), $"rid")
      val native = graft.plans.AsofJoin.join(lDf, rDf, Seq("u" -> "ru"),
          "lt", "rt", rightTiebreak = Seq("rid"), tolerance = Some("5 seconds"),
          direction = dirName)
        .select($"lid", $"u",
          org.apache.spark.sql.functions.coalesce($"rid",
            org.apache.spark.sql.functions.lit(-1L)))
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == native,
        s"direction=$dirName diverges:\n streaming=$streamed\n native=$native")
    }
  }

  test("streaming processor with a COMPOSITE key ≡ native multi-key batch operator") {
    import graft.streaming.Streaming.{AsofEvent, AsofMatch}
    // (g, sub, t_s, id): same g under a DIFFERENT sub must never match —
    // the component-wise pairing the batch operator and SQL TVF already
    // guarantee, now on the streaming surface (round-5 verdict #1)
    val rights = Seq(("a", 1L, 2L, 1L), ("a", 2L, 8L, 2L), ("b", 1L, 5L, 3L))
    val lefts = Seq(("a", 1L, 10L, 100L), ("a", 2L, 9L, 101L), ("b", 2L, 6L, 102L))
    val ms = MemoryStream[AsofEvent[(String, Long)]](spark)
    val matches = Streaming.asofEnrichStream(
      ms.toDS().withWatermark("ts", "30 seconds"), tolMicros = 20L * 1000000L)
    val q = matches.toDF().writeStream.format("memory")
      .queryName("tws_asof_mk").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-asof-mk").toString)
      .start()
    val all = rights.map { case (g, s, t, i) =>
      AsofEvent((g, s), ts(t), i, isLeft = false) } ++
      lefts.map { case (g, s, t, i) => AsofEvent((g, s), ts(t), i, isLeft = true) }
    ms.addData(scala.util.Random.shuffle(all))
    q.processAllAvailable()
    ms.addData(Seq(AsofEvent(("z", 0L), ts(1000), 999, isLeft = false)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("tws_asof_mk").as[AsofMatch[(String, Long)]]
      .collect().map(m => (m.left_id, m.key, m.right_id.getOrElse(-1L))).toSet
    val lDf = lefts.toDF("g", "sub", "t0", "lid")
      .select($"g", $"sub", ($"t0" * 1000000L).as("lt"), $"lid")
    val rDf = rights.toDF("rg", "rsub", "rt0", "rid")
      .select($"rg", $"rsub", ($"rt0" * 1000000L).as("rt"), $"rid")
    val native = graft.plans.AsofJoin.join(lDf, rDf,
        Seq("g" -> "rg", "sub" -> "rsub"), "lt", "rt",
        rightTiebreak = Seq("rid"), tolerance = Some("20 seconds"))
      .select($"lid", $"g", $"sub",
        org.apache.spark.sql.functions.coalesce($"rid",
          org.apache.spark.sql.functions.lit(-1L)))
      .as[(Long, String, Long, Long)].collect()
      .map { case (lid, g, s, rid) => (lid, (g, s), rid) }.toSet
    assert(streamed == native,
      s"multi-key surfaces diverge:\n streaming=$streamed\n native=$native")
  }
}
