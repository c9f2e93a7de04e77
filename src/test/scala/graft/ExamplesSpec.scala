package graft

import graft.examples
import graft.streaming.Streaming.Event

/** Every reference-app twin runs end-to-end and produces sane output. */
class ExamplesSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("IncrementalDedupApp flags stream docs near-duplicating the corpus, statelessly") {
    val out = graft.examples.IncrementalDedupApp.run(spark)
    val got = out.as[(Long, Long, Int)].collect().toSet
    // same split and threshold as the oracled neardup_incremental query
    val want = graft.queries.LlmQueries
      .neardupIncremental(spark, graft.examples.ExampleSession.sfDir)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty, "sf0.001 has cross-split near-dups (7 as generated)")
  }

  test("Curation twin: batch flagship and streaming ingest agree on the per-row stages") {
    val batch = graft.examples.CurationApp.run(spark)
    assert(batch.count() > 0, "flagship must survive the filters at sf0.001")
    val ingest = graft.examples.CurationApp.runStreamingIngest(spark)
    // the streaming half lacks the corpus-global near-dup stage, so it is a
    // SUPERSET of the batch rows restricted to the per-row filters
    import spark.implicits._
    val b = batch.select("doc_id").as[Long].collect().toSet
    val i = ingest.select("doc_id").as[Long].collect().toSet
    assert(b.subsetOf(i), "batch output (after dedup) within streaming ingest output")
  }

  test("BasicStreams twin") {
    val out = examples.BasicStreamsApp.run(spark, sf1)
    assert(out.count() > 0)
    assert(out.filter(org.apache.spark.sql.functions.col("k") <= 50).count() == 0)
  }

  test("KTable twin") {
    val out = examples.KTableApp.run(spark, sf1)
    assert(out.count() > 0)
    assert(out.select("o_custkey").distinct().count() == out.count(), "one row per key")
  }

  test("Joins twin") {
    assert(examples.JoinsApp.run(spark, sf1).count() > 0)
  }

  test("Aggregations twin") {
    val events = (1 to 20).map(i => Event(i.toLong, ts(i), i % 5, "order", i * 1.5, "{}"))
    val totals = examples.AggregationsApp.run(spark, events)
      .groupBy("user_id").agg(org.apache.spark.sql.functions.max("total").as("total"))
      .as[(Long, Double)].collect().toMap
    val want = events.groupBy(_.user_id).view.mapValues(_.map(_.value).sum).toMap
    assert(totals == want)
  }

  test("ProcessorApi twin") {
    val events = (1 to 30).map(i => Event(i.toLong, ts(i * 5), i % 3, "order", i * 2.0, "{}"))
    assert(examples.ProcessorApiApp.run(spark, events).count() > 0, "punctuation emitted")
  }

  test("ErrorHandling twin: skips the poison record under budget, fails over it") {
    val payloads = ((1 to 19).map(i => (i.toLong, s"""{"k": $i}""")) :+ (20L, "poison"))
      .toDF("id", "props")
    val out = examples.ErrorHandlingApp.run(spark, payloads, maxErrors = 25)
    assert(out.count() == 19)
    val poisoned = ((1 to 4).map(i => (i.toLong, "bad")) :+ (5L, """{"k": 5}"""))
      .toDF("id", "props")
    intercept[graft.engine.Errors.TooManyCorruptRecords] {
      examples.ErrorHandlingApp.run(spark, poisoned, maxErrors = 3).count()
    }
  }
}
