package graft.examples

import graft.api.{KStream, KTable}
import graft.engine.{Errors, Serde, Tables}
import graft.streaming.Streaming
import graft.streaming.Streaming.Event
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** One runnable twin per reference application — what a user of
* slemus9/confluent-kafka-streams-examples writes after switching to this
* library. Each `run` returns the output DataFrame/Dataset it produced so
* ExamplesSpec can assert on it; each `main` is the standalone demo
* (lifecycle harness parity with KafkaStreamsApp.scala:18-55 — acquire
* session, run, observe, close).
*/
object ExampleSession {

def session(): SparkSession = {
  val s = SparkSession.builder()
    .master("local[4]")
    .appName("graft-example")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .getOrCreate()
  s.sparkContext.setLogLevel("WARN")
  s
}

val sfDir = "/root/testdata/sf0.001"
}

/** BasicStreams.scala:51-60 — stateless stream → peek → filter →
  * mapValues(substring) → filter(> threshold) → peek → sink.
  */
object BasicStreamsApp {
  def run(spark: SparkSession, dir: String = ExampleSession.sfDir): DataFrame =
    KStream(Tables.events(spark, dir), "user_id", "ts")
      .peek("input")
      .filter(col("props").contains("\"k\""))
      .withValue("k",
        trim(expr("substring(props, instr(props, ':') + 1)"), " }").cast("long"))
      .filter(col("k") > 50)
      .peek("output")
      .df.select("event_id", "user_id", "k")
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.session()
    try run(spark).show(5) finally spark.stop()
  }
}

/** KTableExample.scala:52-62 — changelog topic → latest-per-key view →
  * filter → mapValues → toStream → sink.
  */
object KTableApp {
  def run(spark: SparkSession, dir: String = ExampleSession.sfDir): DataFrame =
    KStream(Tables.orders(spark, dir), "o_custkey", "o_orderdate")
      .toTable(Seq("o_orderdate", "o_orderkey"))
      .filter(col("o_orderpriority").contains("URGENT"))
      .mapValues("o_orderkey" -> col("o_orderkey"),
        "tag" -> expr("substring(o_orderpriority, instr(o_orderpriority, '-') + 1)"))
      .toStream("o_orderkey").df
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.session()
    try run(spark).show(5) finally spark.stop()
  }
}

/** JoinsExample.scala:35-66 — two typed order streams, interval join
  * (±10 minutes here; the reference demos ±5 s) with no grace, combiner,
  * then stream–table join against the user table (the reference declared
  * but never wired the user join — completed here, SURVEY.md J2).
  */
object JoinsApp {
  def run(spark: SparkSession, dir: String = ExampleSession.sfDir): DataFrame = {
    val ev = KStream(Tables.events(spark, dir), "user_id", "ts")
    val Seq(electronic, appliance) =
      ev.branch(col("event_type") === "click", col("event_type") === "purchase")
    val combined = electronic.joinInterval(appliance, "10 MINUTES")
      .select(col("l_user_id").as("user_id"),
        col("l_event_id").as("electronic_id"), col("r_event_id").as("appliance_id"),
        greatest(col("l_ts"), col("r_ts")).as("ts"))
    val users = KTable(Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_key"), col("c_name")), "user_key")
    // joinTable already joins on user_id === user_key — no manual filter
    KStream(combined, "user_id", "ts").joinTable(users.copy(df = broadcast(users.df)))
      .select("user_id", "electronic_id", "appliance_id", "c_name")
  }
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.session()
    try run(spark).show(5) finally spark.stop()
  }
}

/** AggregationsExample.scala:30-46 — groupByKey → aggregate(0.0)(+price) →
  * mapValues(OrderTotal) → toStream, as a streaming update query.
  */
object AggregationsApp {
  def run(spark: SparkSession, events: Seq[Event]): DataFrame = {
    import spark.implicits._
    val ms = MemoryStream[Event](spark)
    ms.addData(events)
    val q = Streaming.runningSumUpdates(ms.toDF)
      .writeStream.format("memory").queryName("agg_totals").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-ex-agg").toString)
      .start()
    q.processAllAvailable(); q.stop()
    spark.table("agg_totals")
  }
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.session()
    val demo = (1 to 20).map(i => Event(i.toLong,
      new java.sql.Timestamp(i * 1000L), i % 5, "order", i * 1.5, "{}"))
    try run(spark, demo).show(5) finally spark.stop()
  }
}

/** ProcessorApiExample.scala:38-67 — low-level stateful processor: per-key
  * store read-modify-write, stream-time punctuation forwarding the store.
  */
object ProcessorApiApp {
  def run(spark: SparkSession, events: Seq[Event]): DataFrame = {
    import spark.implicits._
    val ms = MemoryStream[Event](spark)
    val out = Streaming.withProcessor(
      ms.toDS().withWatermark("ts", "0 seconds").as[Event],
      new Streaming.PunctuationProcessor(intervalMs = 10000),
      TimeMode.EventTime(), OutputMode.Append())
    val q = out.toDF("user_id", "total")
      .writeStream.format("memory").queryName("punct_totals").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-ex-proc").toString)
      .start()
    events.grouped(math.max(events.size / 3, 1)).foreach { batch =>
      ms.addData(batch); q.processAllAvailable()
    }
    q.stop()
    spark.table("punct_totals")
  }
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.session()
    val demo = (1 to 30).map(i => Event(i.toLong,
      new java.sql.Timestamp(i * 5000L), i % 3, "order", i * 2.0, "{}"))
    try run(spark, demo).show(5) finally spark.stop()
  }
}

/** ErrorHandlingExample.scala:32-74 — permissive deserialization with a
  * skip-25-then-fail budget, allowlisted sink guard, transient restart.
  */
object ErrorHandlingApp {
  val schema: StructType = StructType(Seq(StructField("k", LongType)))
  def run(spark: SparkSession, payloads: DataFrame, maxErrors: Long): DataFrame = {
    // exact corrupt count via a dedicated action — the accumulator variant
    // re-counts under multiple actions (see Errors.permissiveParse docs)
    val corrupt = Errors.corruptCount(payloads, "props", schema)
    // budget gate FIRST: the reference's skip-N-then-fail policy stops the
    // pipeline before any downstream work runs — sinking and only then
    // failing would commit output despite an exceeded budget
    Errors.checkBudget(corrupt, maxErrors)
    val (parsed, _) = Serde.parseOrDeadLetter(payloads, "props", schema)
    val out = parsed.select(col("id"), col("parsed.k").as("k"))
    Errors.runWithRestarts(Errors.messageContains("transient"), maxRestarts = 2) {
      Errors.guardedSink(out, _.count(),
        continueOn = Errors.messageContains("RecordTooLarge"))
    }
    out
  }
  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.session()
    import spark.implicits._
    val payloads = ((1 to 19).map(i => (i.toLong, s"""{"k": $i}""")) :+ (20L, "poison"))
      .toDF("id", "props") // 1 poison among 20, ErrorHandlingExample.scala:144-146
    try run(spark, payloads, maxErrors = 25).show(5) finally spark.stop()
  }
}

/** Beyond the reference's surface: the end-to-end training-data curation
  * app a library user writes against graft.llm — MinHash near-dup removal,
  * then the fused per-row quality/language/repetition stage, same code
  * batch or streaming (SURVEY.md §2.9; the flagship SparkEntry.entry).
  */
object CurationApp {
  def run(spark: SparkSession, dir: String = ExampleSession.sfDir): DataFrame =
    graft.queries.LlmQueries.curationPipeline(spark, dir)

  /** The streaming ingest half on the same corpus via MemoryStream — what
    * runs against a live document feed while the batch compaction pass
    * (near-dup removal) runs periodically.
    */
  def runStreamingIngest(spark: SparkSession, dir: String = ExampleSession.sfDir): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val ms = MemoryStream[(Long, String, String, String, Long)](spark)
    ms.addData(docs.as[(Long, String, String, String, Long)].collect().toSeq)
    val q = Streaming.curationStream(
        ms.toDF.toDF("doc_id", "text", "lang", "source", "n_chars"))
      .writeStream.format("memory").queryName("curation_ingest")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-curation").toString)
      .start()
    q.processAllAvailable(); q.stop()
    spark.table("curation_ingest")
  }

  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.session()
    try run(spark).show(5) finally spark.stop()
  }
}

/** Continuous ingest dedup: the arriving document feed is near-dup-checked
  * against the historical corpus with ZERO streaming state — per-row
  * SimHash signing + band join against a static index
  * (`Streaming.neardupStream`). The index is refreshed by the periodic
  * batch compaction job (here: built inline); at scale it is a compact
  * table (6 band rows × 8-byte sig per corpus doc) that micro-batches
  * re-read or cache.
  */
object IncrementalDedupApp {
  def run(spark: SparkSession, dir: String = ExampleSession.sfDir): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val corpus = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val index = graft.llm.Dedup.simhashBands(corpus.select(col("doc_id"),
      graft.functions.TextFunctions.graftSimhash(col("text"), 60).as("sig")))
    val feed = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    val ms = MemoryStream[(Long, String, String, String, Long)](spark)
    ms.addData(feed.as[(Long, String, String, String, Long)].collect().toSeq)
    val q = Streaming.neardupStream(
        ms.toDF.toDF("doc_id", "text", "lang", "source", "n_chars"),
        index, maxDist = 4)
      .writeStream.format("memory").queryName("incremental_dedup")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-incdedup").toString)
      .start()
    q.processAllAvailable(); q.stop()
    spark.table("incremental_dedup")
  }

  def main(args: Array[String]): Unit = {
    val spark = ExampleSession.session()
    try run(spark).show(5) finally spark.stop()
  }
}
