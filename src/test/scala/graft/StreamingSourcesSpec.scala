package graft

import graft.engine.Topic
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1 streaming over the file transport (Topic.readStream) and W5
  * emit-final (append mode after watermark close — Kafka Streams
  * `suppress` semantics).
  */
class StreamingSourcesSpec extends SparkSuite {
  import spark.implicits._

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  test("file-stream source: windowed agg over the events table converges to batch") {
    // stage the single-file fixture as a directory (file streams watch dirs);
    // rewrite through Tables.events so the staged copy has µs timestamps
    val staged = java.nio.file.Files.createTempDirectory("events-stream").toString
    graft.engine.Tables.events(spark, sf1).write.mode("overwrite").parquet(staged)
    val stream = spark.readStream.schema(eventsSchema).parquet(staged)
    val agg = stream
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val q = agg.writeStream.format("memory").queryName("file_win").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-filewin").toString)
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("file_win")
      .groupBy("ws", "event_type").agg(max("n").as("n")) // latest update per window
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val batch = graft.engine.Tables.events(spark, sf1)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("emit-final (suppress, W5): append mode emits a window only after the watermark closes it") {
    import graft.streaming.Streaming.Event
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val agg = ms.toDF
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "10 seconds"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("user_id"), col("n"))
    val q = agg.writeStream.format("memory").queryName("suppress").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-sup").toString)
      .start()
    ms.addData(Seq(Event(1, ts(1), 1, "a", 1.0, "{}"), Event(2, ts(2), 1, "a", 1.0, "{}")))
    q.processAllAvailable()
    val early = spark.table("suppress").count()
    assert(early == 0, "open window must be suppressed in append mode")
    // advance stream time past the window end -> the [0,10) window closes
    ms.addData(Seq(Event(3, ts(25), 1, "a", 1.0, "{}")))
    q.processAllAvailable()
    ms.addData(Seq(Event(4, ts(40), 1, "a", 1.0, "{}")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("suppress").as[(java.sql.Timestamp, Long, Long)].collect()
    assert(rows.exists(r => r._1 == ts(0) && r._3 == 2L),
      s"closed [0,10) window should emit its final count once; got ${rows.toSeq}")
  }

  test("streaming exact dedup: dropDuplicates with watermark drops replays") {
    import graft.streaming.Streaming.Event
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val deduped = ms.toDF
      .withWatermark("ts", "10 seconds")
      .dropDuplicates("event_id")
    val q = deduped.writeStream.format("memory").queryName("sdedup").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-sdedup").toString)
      .start()
    ms.addData(Seq(Event(1, ts(1), 1, "a", 1.0, "{}"), Event(2, ts(2), 1, "a", 1.0, "{}")))
    q.processAllAvailable()
    // replay event 1 (at-least-once duplicate) plus a new event
    ms.addData(Seq(Event(1, ts(1), 1, "a", 1.0, "{}"), Event(3, ts(3), 1, "a", 1.0, "{}")))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("sdedup").select("event_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), "replayed event_id=1 deduplicated exactly once")
  }

  test("stream–static join (J2 streaming form): streaming facts enrich against a batch dim") {
    import graft.streaming.Streaming.Event
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_key", "tier")
    val joined = ms.toDF.join(org.apache.spark.sql.functions.broadcast(dim),
      org.apache.spark.sql.functions.col("user_id") === org.apache.spark.sql.functions.col("user_key"))
      .select("event_id", "user_id", "tier")
    val q = joined.writeStream.format("memory").queryName("ss_join").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-ssj").toString)
      .start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    ms.addData(Seq(Event(1, ts(1), 1, "a", 1.0, "{}"), Event(2, ts(2), 3, "a", 1.0, "{}"),
      Event(3, ts(3), 2, "a", 1.0, "{}")))
    q.processAllAvailable(); q.stop()
    val got = spark.table("ss_join").as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 1L, "gold"), (3L, 2L, "silver")), "unmatched user 3 dropped")
  }

  test("streaming session windows converge to the batch sessionization (W6 streaming form)") {
    import graft.streaming.Streaming.Event
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Event](spark)
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // user 1: events at 0s,5s (one session, 10s gap), then 60s (new session)
    val rows = Seq(Event(1, ts(0), 1, "a", 1.0, "{}"), Event(2, ts(5), 1, "a", 2.0, "{}"),
      Event(3, ts(60), 1, "a", 4.0, "{}"), Event(4, ts(200), 2, "a", 8.0, "{}"))
    val agg = ms.toDF
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "10 seconds"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("session_window.start").as("ss"), col("user_id"), col("n"), col("total"))
    val q = agg.writeStream.format("memory").queryName("ssw").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-ssw").toString)
      .start()
    ms.addData(rows); q.processAllAvailable()
    ms.addData(Seq(Event(9, ts(500), 2, "a", 1.0, "{}"))); q.processAllAvailable()
    q.stop()
    val got = spark.table("ssw").as[(java.sql.Timestamp, Long, Long, Double)]
      .collect().map(r => (r._1, r._2, r._3)).toSet
    assert(got.contains((ts(0), 1L, 2L)), "0s+5s merge into one session")
    assert(got.contains((ts(60), 1L, 1L)), "60s starts a fresh session")
  }

  test("csv and json sources round-trip the record model (S8)") {
    val ev = graft.engine.Tables.events(spark, sf1)
      .select("event_id", "user_id", "event_type", "value").limit(100)
    val csvDir = java.nio.file.Files.createTempDirectory("s8-csv").toString + "/out"
    val jsonDir = java.nio.file.Files.createTempDirectory("s8-json").toString + "/out"
    ev.write.option("header", "true").csv(csvDir)
    ev.write.json(jsonDir)
    val backCsv = spark.read.option("header", "true").option("inferSchema", "true").csv(csvDir)
    val backJson = spark.read.json(jsonDir)
    assert(backCsv.count() == 100 && backJson.count() == 100)
    val sumOrig = ev.agg(sum("value")).as[Double].first()
    assert(backJson.agg(sum("value")).as[Double].first() == sumOrig)
  }

  test("Topic round-trips a keyed stream through the file transport") {
    val t = Topic.events
    val out = java.nio.file.Files.createTempDirectory("topic-out").toString
    val df = t.asStream(spark, sf1).filter(col("event_type") === "click").df
    t.write(df, out)
    val back = spark.read.parquet(out)
    assert(back.count() == df.count() && back.columns.sorted.sameElements(df.columns.sorted))
  }
}
