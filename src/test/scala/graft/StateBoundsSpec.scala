package graft

import graft.streaming.Streaming.Event
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Watermark EVICTION proofs — the 100 TB streaming story's missing half:
  * parity specs prove streaming results equal batch, but a pipeline that
  * holds every window/join row forever is also "correct" until the state
  * store eats the cluster weeks in. These specs drive long streams through
  * the stateful operators and assert, from `stateOperators` progress
  * metrics, that state size is bounded by the WATERMARK HORIZON (a
  * constant) while the emitted output keeps growing with stream length —
  * i.e. eviction actually frees rows, state is O(horizon), not O(stream).
  */
class StateBoundsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
  private def ev(id: Long, sec: Long, user: Long) =
    Event(id, ts(sec), user, "e", 1.0, "{}")

  /** Run `steps` addData+process rounds, sampling state rows after each. */
  private def drive(ms: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event],
                    q: org.apache.spark.sql.streaming.StreamingQuery,
                    steps: Int)(batch: Int => Seq[Event]): Seq[Long] = {
    val samples = mutable.ArrayBuffer.empty[Long]
    (0 until steps).foreach { k =>
      ms.addData(batch(k))
      q.processAllAvailable()
      Option(q.lastProgress).foreach { p =>
        if (p.stateOperators.nonEmpty)
          samples += p.stateOperators.map(_.numRowsTotal).sum
      }
    }
    samples.toSeq
  }

  test("windowed agg state is bounded by the watermark horizon, not stream length") {
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    val users = 4
    val agg = ms.toDF
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 minute"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("user_id"), col("n"))
    val q = agg.writeStream.format("memory").queryName("state_win")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-statewin").toString)
      .start()
    val steps = 30
    // each step is one event-time minute for every user: 30 min of stream
    val samples = drive(ms, q, steps) { k =>
      (0 until users).map(u => ev(k.toLong * users + u, k * 60L + 5, u))
    }
    q.processAllAvailable()
    val emitted = spark.table("state_win").count()
    q.stop()
    // output grew with the stream: every closed (minute, user) window
    assert(emitted >= (steps - 1).toLong * users,
      s"expected ~${steps * users} closed windows, got $emitted")
    // ...but live state stayed at the horizon: the open minute per user
    // (plus the store's in-flight batch), never the 30-minute history.
    // A leak (no eviction) would accumulate to ~steps*users = 120 rows.
    val tail = samples.drop(5)
    assert(tail.nonEmpty && tail.max <= users * 3L,
      s"state rows grew with stream length: samples=$samples")
  }

  test("stream-stream interval join state is bounded by the join horizon") {
    val left = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    val right = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    val l = left.toDF.select(col("user_id").as("l_user"), col("ts").as("l_ts"),
      col("event_id").as("l_id"))
      .withWatermark("l_ts", "0 seconds")
    val r = right.toDF.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
      col("event_id").as("r_id"))
      .withWatermark("r_ts", "0 seconds")
    val joined = l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") - expr("INTERVAL 30 seconds") &&
        col("r_ts") <= col("l_ts") + expr("INTERVAL 30 seconds"))
    val q = joined.writeStream.format("memory").queryName("state_join")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-statejoin").toString)
      .start()
    val users = 3
    val steps = 25
    val samples = mutable.ArrayBuffer.empty[Long]
    (0 until steps).foreach { k =>
      val base = k * 60L // one minute apart: far outside the ±30 s window
      left.addData((0 until users).map(u => ev(k.toLong * 100 + u, base + 1, u)))
      right.addData((0 until users).map(u => ev(k.toLong * 100 + 50 + u, base + 2, u)))
      q.processAllAvailable()
      Option(q.lastProgress).foreach { p =>
        if (p.stateOperators.nonEmpty)
          samples += p.stateOperators.map(_.numRowsTotal).sum
      }
    }
    q.processAllAvailable()
    val emitted = spark.table("state_join").count()
    q.stop()
    // every minute's (left, right) pair matched within ±30 s
    assert(emitted >= (steps - 1).toLong * users,
      s"expected ~${steps * users} join matches, got $emitted")
    // both sides' buffered rows stay within the ±30 s horizon — a leak
    // would grow toward steps*users*2 = 150 buffered rows
    val tail = samples.drop(5)
    assert(tail.nonEmpty && tail.max <= users * 2L * 3L,
      s"join state grew with stream length: samples=$samples")
  }

  // ---- the repo's OWN stateful processors (round-7 verdict #3): the
  // built-in coverage above proves Spark's eviction; these prove the
  // hand-written pruning in streaming/Streaming.scala actually frees rows.

  test("AsofEnrichProcessor state is bounded: matured lefts drain, old rights prune") {
    import graft.streaming.Streaming.AsofEvent
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AsofEvent[Long]](spark)
    // backward, 30 s lookback: pruneBound keeps only rights within
    // wm − 30 s; matured lefts leave the pending list the batch after
    // the watermark passes them
    val matches = graft.streaming.Streaming.asofEnrichStream(
      ms.toDS().withWatermark("ts", "0 seconds"), tolMicros = 30L * 1000000L)
    val q = matches.toDF().writeStream.format("memory")
      .queryName("state_asof").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-stateasof").toString)
      .start()
    val users = 3
    val steps = 25
    val samples = mutable.ArrayBuffer.empty[Long]
    (0 until steps).foreach { k =>
      val base = k * 60L // one minute apart: rights age past the 30 s bound
      ms.addData((0 until users).flatMap { u =>
        Seq(AsofEvent(u.toLong, ts(base + 1), k.toLong * 100 + u, isLeft = false),
          AsofEvent(u.toLong, ts(base + 2), k.toLong * 100 + 50 + u, isLeft = true))
      })
      q.processAllAvailable()
      Option(q.lastProgress).foreach { p =>
        if (p.stateOperators.nonEmpty)
          samples += p.stateOperators.map(_.numRowsTotal).sum
      }
    }
    q.processAllAvailable()
    val emitted = spark.table("state_asof").count()
    q.stop()
    // every left except the still-immature tail matured and emitted
    assert(emitted >= (steps - 2).toLong * users,
      s"expected ~${steps * users} matured as-of matches, got $emitted")
    // state holds: per key, the pending (newest) left + the ≤2 rights
    // still inside the lookback + the timer/armed bookkeeping. A pruning
    // leak accumulates toward steps*users rights (~75) / lefts (~75).
    val tail = samples.drop(5)
    assert(tail.nonEmpty && tail.max <= users * 8L,
      s"as-of processor state grew with stream length: samples=$samples")
  }

  test("dedupStream state is bounded by the watermark, not by distinct keys seen") {
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    // 10 s suppression horizon over an ever-growing key universe: plain
    // dropDuplicates state would grow with every new key forever
    val deduped = graft.streaming.Streaming.dedupStream(
      ms.toDF, Seq("event_id"), "10 seconds")
    val q = deduped.writeStream.format("memory").queryName("state_dedup")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-statededup").toString)
      .start()
    val steps = 30
    val perStep = 5
    val samples = drive(ms, q, steps) { k =>
      // 5 fresh ids per minute, each sent twice (the dup is suppressed);
      // +1 h base: an event AT the epoch ties the INITIAL watermark (0)
      // and is dropped as late — epoch-0 event times are a test artifact,
      // not a pipeline shape
      (0 until perStep).flatMap { i =>
        val id = k.toLong * perStep + i
        val e = ev(id, 3600L + k * 60L + i, user = id)
        Seq(e, e)
      }
    }
    q.processAllAvailable()
    val emitted = spark.table("state_dedup").count()
    q.stop()
    // each id emitted exactly once; its duplicate suppressed
    assert(emitted == steps.toLong * perStep,
      s"expected ${steps * perStep} deduped rows, got $emitted")
    // state: only ids within the 10 s horizon of the watermark — one
    // step's worth, never the ${steps * perStep}-key history
    val tail = samples.drop(5)
    assert(tail.nonEmpty && tail.max <= perStep * 4L,
      s"dedup state grew with keys seen: samples=$samples")
  }

  test("IvmDeltaProcessor state is O(live keys), not O(changelog length)") {
    import graft.streaming.Streaming.OrderVersion
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import org.apache.spark.sql.Encoders
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[OrderVersion](spark)
    val out = ms.toDS().groupByKey(_.o_custkey)(Encoders.scalaLong)
      .transformWithState(new graft.streaming.Streaming.IvmDeltaProcessor,
        TimeMode.None(), OutputMode.Update())(
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong))
    val q = out.toDF("grp", "dn", "dc").writeStream.format("memory")
      .queryName("state_ivm").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-stateivm").toString)
      .start()
    val keys = 4
    val steps = 25
    val samples = mutable.ArrayBuffer.empty[Long]
    (0 until steps).foreach { k =>
      // every key re-prices each step: a 25-version-deep changelog per key
      ms.addData((0 until keys).map(c => OrderVersion(
        c.toLong, k.toLong * keys + c, "O", "A", ts(k * 10L), 100L + k)))
      q.processAllAvailable()
      Option(q.lastProgress).foreach { p =>
        if (p.stateOperators.nonEmpty)
          samples += p.stateOperators.map(_.numRowsTotal).sum
      }
    }
    q.processAllAvailable()
    val emitted = spark.table("state_ivm").count()
    q.stop()
    // deltas grow with the changelog: an add per version + a retraction
    // for every version after the first
    assert(emitted >= (2L * steps - 1) * keys - keys,
      s"expected ~${2 * steps * keys} deltas, got $emitted")
    // ...but state is the last live value per key, NEVER version history
    val tail = samples.drop(5)
    assert(tail.nonEmpty && tail.max <= keys * 2L,
      s"cdc state grew with changelog length: samples=$samples")
  }
}
