package graft

import java.sql.Timestamp

import graft.engine.Topic
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Kafka WIRE layer (SURVEY.md §7.0): the connector jar is absent
  * in-image, so the socket itself cannot run — but everything the socket
  * carries can: these specs round-trip the exact (key, value) binary frame
  * `format("kafka")` produces/consumes through the topic record model, in
  * both wire formats the reference provisions (circe JSON,
  * serdes/circe.scala:14; registry-framed Avro, docker-compose.yml:30-41).
  * A real deployment swaps ONLY the transport: `toKafkaWire(df).write
  * .format("kafka")` / `fromKafkaWire(spark.readStream.format("kafka")...)`.
  */
class TopicWireSpec extends SparkSuite {
  import spark.implicits._

  private val topic = Topic("events", "user_id", "ts")

  /** Micro-precision event times: the wire must carry the fixtures' µs
    * resolution (review finding: Spark's default JSON timestampFormat is
    * millisecond-only and would silently truncate). */
  private def ts(s: Long, micros: Long = 0L) = {
    val t = new Timestamp(s * 1000L)
    t.setNanos((micros * 1000L).toInt)
    t
  }

  private val rows = Seq(
    (1L, ts(10, 123L), 100L, "click", 2.5),
    (2L, ts(20, 999999L), 101L, "purchase", -1.25),
    (1L, ts(30), 102L, "view", 0.0))

  // deliberately NON-NULLABLE fields (what a product-encoder schema gives
  // a caller): the wire mapping must canonicalize to the all-nullable
  // wire record on both sides, not silently null-out every payload
  private val valueSchema = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("event_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** A staged Kafka-source frame: the fixed columns `format("kafka")`
    * yields, with broker-side metadata faked (the wire mapping must not
    * depend on it). */
  private def asSourceFrame(wire: org.apache.spark.sql.DataFrame) =
    wire.withColumn("topic", lit("events"))
      .withColumn("partition", lit(0))
      .withColumn("offset", monotonically_increasing_id())
      .withColumn("timestamp", current_timestamp())
      .withColumn("timestampType", lit(0))

  test("JSON wire round-trip: produce frame -> consume frame = identity") {
    val df = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
    val wire = topic.toKafkaWire(df)
    assert(wire.columns.toSeq == Seq("key", "value"),
      "the kafka sink accepts exactly (key, value)")
    assert(wire.schema.fields.forall(_.dataType == BinaryType))
    val back = topic.fromKafkaWire(asSourceFrame(wire), valueSchema,
        keyType = LongType)
      .as[(Long, Timestamp, Long, String, Double)].collect().toSet
    assert(back == rows.toSet)
  }

  test("registry-framed Avro wire round-trip, foreign-id frames rejected permissively") {
    val df = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
    val wire = topic.toKafkaWire(df, avroFrame = Some(42))
    // 5-byte registry header on every value payload
    assert(wire.select("value").as[Array[Byte]].collect()
      .forall(b => b.length > 5 && b(0) == 0 && b(4) == 42))
    val back = topic.fromKafkaWire(asSourceFrame(wire), valueSchema,
        keyType = LongType, avroFrame = Some(42))
      .as[(Long, Timestamp, Long, String, Double)].collect().toSet
    assert(back == rows.toSet)
    // a consumer expecting a different subject's id must null-struct, not throw
    val foreign = topic.fromKafkaWire(asSourceFrame(wire), valueSchema,
      keyType = LongType, avroFrame = Some(43))
    assert(foreign.collect().forall(_.isNullAt(2)),
      "foreign-id frames must decode to nulls under the permissive contract")
  }

  test("Avro wire with a reordered consumer schema resolves fields by NAME via producedOrder") {
    val df = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
    val wire = topic.toKafkaWire(df, avroFrame = Some(42))
    // consumer declares the same fields in a DIFFERENT order — including the
    // two same-typed longs/doubles that positional decode would silently swap
    val reordered = StructType(Seq(
      StructField("event_type", StringType, nullable = false),
      StructField("value", DoubleType, nullable = false),
      StructField("event_id", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = false)))
    val back = topic.fromKafkaWire(asSourceFrame(wire), reordered,
        keyType = LongType, avroFrame = Some(42),
        producedOrder = Some(Seq("ts", "event_id", "event_type", "value")))
      .as[(Long, String, Double, Long, Timestamp)].collect().toSet
    assert(back == rows.map { case (u, t, id, ty, v) => (u, ty, v, id, t) }.toSet,
      "schema resolution must re-pair reordered fields by name")
    // the hazard the parameter exists for: WITHOUT producedOrder a
    // reordered declared schema decodes positionally — here the leading
    // types disagree, so the permissive contract yields null structs
    // (with same-typed fields throughout it would instead silently SWAP
    // values, which is exactly what the by-name path prevents)
    val positional = topic.fromKafkaWire(asSourceFrame(wire), reordered,
      keyType = LongType, avroFrame = Some(42)).collect()
    assert(positional.forall(_.isNullAt(1)),
      "positional decode under a reordered schema must NOT silently agree")
    // a producedOrder that is not a permutation of the declared fields is
    // a caller bug, rejected eagerly
    intercept[IllegalArgumentException] {
      topic.fromKafkaWire(asSourceFrame(wire), reordered, keyType = LongType,
        avroFrame = Some(42), producedOrder = Some(Seq("ts", "event_id")))
    }
  }

  test("key bytes are the partitioning input: same key renders identical bytes") {
    val df = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
    val keys = topic.toKafkaWire(df).select("key").as[Array[Byte]].collect()
    assert(keys(0).sameElements(keys(2)),
      "records with equal keys must produce byte-identical kafka keys " +
        "(the broker's hash-partitioning and ordering guarantee)")
    assert(!keys(0).sameElements(keys(1)))
  }
}
