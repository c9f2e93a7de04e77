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
}
