package graft

import java.sql.Timestamp

import graft.streaming.Streaming
import graft.streaming.Streaming.Event
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twins must converge to the batch recompute on the same rows
  * (SURVEY.md §5.2 #3): the KTable/aggregate duality, and the zero-grace
  * interval join incl. late-record exclusion (JoinsExample.scala:150,176-178).
  */
case class DocRow(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

class StreamingParitySpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val rows = Seq(
    Event(1, ts(10), 1, "click", 10.0, "{}"),
    Event(2, ts(12), 1, "purchase", 5.0, "{}"),
    Event(3, ts(40), 1, "click", 2.5, "{}"),
    Event(4, ts(41), 2, "purchase", 7.0, "{}"),
    Event(5, ts(43), 2, "click", 1.0, "{}"),
    Event(6, ts(100), 2, "purchase", 4.0, "{}"))

  private def runToMemory(df: DataFrame, name: String, mode: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"ck-$name").toString)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  test("streaming running sum converges to batch groupBy.sum") {
    val ms = MemoryStream[Event](spark)
    ms.addData(rows.take(3)); ms.addData(rows.drop(3))
    runToMemory(Streaming.runningSumUpdates(ms.toDF), "rsum", "update")
    val got = spark.table("rsum").groupBy("user_id").agg(max("total").as("total"))
      .as[(Long, Double)].collect().toMap
    val want = rows.groupBy(_.user_id).view.mapValues(_.map(_.value).sum).toMap
    assert(got == want)
  }

  test("streaming latest-per-key converges to batch KTable view") {
    val ms = MemoryStream[Event](spark)
    ms.addData(rows.reverse) // shuffled arrival: batch source preserves order; reverse = worst case
    runToMemory(Streaming.latestPerKeyUpdates(ms.toDF), "lpk", "update")
    val got = spark.table("lpk").as[(Long, Long, Timestamp, String, Double)]
      .collect().map(r => r._1 -> r._2).toMap
    assert(got == Map(1L -> 3L, 2L -> 6L))
  }

  test("left-outer interval join emits null-padded rows after watermark close") {
    val clicks = rows.filter(_.event_type == "click")
    val purchases = rows.filter(_.event_type == "purchase")
    val mc = MemoryStream[Event](spark)
    val mp = MemoryStream[Event](spark)
    val out = Streaming.intervalJoinStream(mc.toDF, mp.toDF, "5 SECONDS",
        joinType = "leftOuter")
      .select(col("l.event_id").as("click_id"), col("r.event_id").as("purchase_id"))
    val q = out.writeStream.format("memory").queryName("loj").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-loj").toString)
      .start()
    mc.addData(clicks); mp.addData(purchases); q.processAllAvailable()
    // advance the watermark far past every click window so unmatched left
    // rows close and emit their null-padded form
    mc.addData(Seq(Event(99, ts(1000), 9, "click", 0.0, "{}")))
    q.processAllAvailable(); q.stop()
    val got = spark.table("loj").as[(Long, Option[Long])].collect().toSet
    // inner pairs as before; click 3 at t=40 has no purchase within ±5s and
    // must appear exactly once with a null right side
    assert(got.contains((1L, Some(2L))) && got.contains((5L, Some(4L))))
    assert(got.contains((3L, None)), "unmatched click must null-pad after close")
    // batch twin on the same rows (excluding the watermark pusher) agrees
    val batch = graft.api.KStream(clicks.toDF, "user_id", "ts")
      .joinInterval(graft.api.KStream(purchases.toDF, "user_id", "ts"),
        "5 SECONDS", joinType = "left")
      .select(col("l_event_id"), col("r_event_id"))
      .as[(Long, Option[Long])].collect().toSet
    assert(batch == got.filter(_._1 != 99L))
  }

  test("streaming curation twin emits exactly the batch per-row pipeline's rows") {
    val docsDf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val docs = docsDf.as[DocRow].collect().toSeq
    val ms = MemoryStream[DocRow](spark)
    ms.addData(docs.take(250)); ms.addData(docs.drop(250))
    runToMemory(graft.streaming.Streaming.curationStream(ms.toDF), "scur", "append")
    val got = spark.table("scur").as[(Long, String, Long)].collect().toSet
    val want = graft.queries.LlmQueries.perRowCuration(docsDf)
      .select("doc_id", "pred_lang", "score_bp").as[(Long, String, Long)].collect().toSet
    assert(got == want, "stream output must equal the batch stateless stages")
    assert(got.nonEmpty)
  }

  test("streaming near-dup vs static corpus is stateless and equals the batch twin") {
    import org.apache.spark.sql.functions._
    val docsDf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docsDf.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val incoming = docsDf.filter(pmod(col("doc_id"), lit(20)) === 0)
      .as[DocRow].collect().toSeq
    val index = graft.llm.Dedup.simhashBands(corpus.select(col("doc_id"),
      graft.functions.TextFunctions.graftSimhash(col("text"), 60).as("sig")))
    val ms = MemoryStream[DocRow](spark)
    ms.addData(incoming.take(incoming.size / 2))
    ms.addData(incoming.drop(incoming.size / 2))
    runToMemory(Streaming.neardupStream(ms.toDF, index, maxDist = 4), "sndp", "append")
    val got = spark.table("sndp").as[(Long, Long, Int)].collect().toSet
    val want = graft.queries.LlmQueries
      .neardupIncremental(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == want, "stream-static banded join must equal the batch query")
    assert(got.nonEmpty)
  }

  test("streaming dedup suppresses in-watermark duplicates, bounded state") {
    val ms = MemoryStream[Event](spark)
    val q = Streaming.dedupStream(ms.toDF, Seq("event_id"), "10 seconds")
      .writeStream.format("memory").queryName("sdedup").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck-sdedup").toString)
      .start()
    // batch 1 carries an intra-batch duplicate of event 1; batch 2 replays
    // event 2 (still inside the watermark) and introduces event 3
    ms.addData(Seq(rows(0), rows(1), rows(0)))
    q.processAllAvailable()
    ms.addData(Seq(rows(1), rows(2)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sdedup").select("event_id")
      .as[Long].collect().toSeq
    // each id exactly once — converged to batch distinct over the fed rows
    assert(got.sorted == Seq(1L, 2L, 3L))
  }

  test("zero-grace interval join matches batch and drops out-of-window pairs") {
    val clicks = rows.filter(_.event_type == "click")
    val purchases = rows.filter(_.event_type == "purchase")
    val mc = MemoryStream[Event](spark)
    val mp = MemoryStream[Event](spark)
    mc.addData(clicks); mp.addData(purchases)
    runToMemory(
      Streaming.intervalJoinStream(mc.toDF, mp.toDF, "5 SECONDS")
        .select(col("l.event_id").as("click_id"), col("r.event_id").as("purchase_id")),
      "ij", "append")
    val got = spark.table("ij").as[(Long, Long)].collect().toSet
    // within ±5s: (1,2) at 10/12 and (5,4) at 43/41; event 6 at t=100 is far
    // outside every click window — excluded, like the delayed electronic
    // orders in the reference demo.
    assert(got == Set((1L, 2L), (5L, 4L)))
    // batch twin over the same rows agrees:
    val bc = graft.api.KStream(clicks.toDF, "user_id", "ts")
    val bp = graft.api.KStream(purchases.toDF, "user_id", "ts")
    val batch = bc.joinInterval(bp, "5 SECONDS")
      .select(col("l_event_id"), col("r_event_id")).as[(Long, Long)].collect().toSet
    assert(batch == got)
  }

  test("observed-metrics fold sees every micro-batch, independent of the progress ring buffer") {
    // 12 one-row files -> 12 micro-batches under maxFilesPerTrigger=1, with
    // the progress ring buffer pinned to ONE entry: a fold reading
    // recentProgress would see only the final batch and under-count — the
    // listener accumulation must still equal the batch recompute.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    ss.conf.set("spark.sql.streaming.numRecentProgressUpdates", "1")
    val evs = (1 to 12).map(i => Event(i, ts(i * 10L), i % 3,
      if (i % 4 == 0) "purchase" else "click", i * 1.5, "{}"))
    val src = java.nio.file.Files.createTempDirectory("graft-obs-src").toString
    evs.toDF().repartition(12).write.mode("overwrite").parquet(src)
    val stream = ss.readStream.schema(evs.toDF().schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val got = graft.queries.StreamParity.observedFoldRun(ss, stream)
      .as[(String, Long)].collect().toMap
    val cents = evs.map(e => math.floor(BigDecimal(e.value)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble * 100).toLong)
    assert(got("rows_out") == 12L)
    assert(got("cents_out") == cents.sum)
    assert(got("purchase_rows") == evs.count(_.event_type == "purchase").toLong)
    assert(got("min_cents") == cents.min)
    assert(got("max_cents") == cents.max)
  }
}
