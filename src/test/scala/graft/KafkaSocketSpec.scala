package graft

import java.sql.Timestamp

import graft.engine.Topic
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Kafka SOCKET itself — conditional (round-5 verdict #4).
  *
  * `Topic`'s kafka branches (read/readStream/write/writeStream through the
  * `toKafkaWire`/`fromKafkaWire` mapping) are wire-correct by
  * [[TopicWireSpec]] but permanently dead in THIS image: no
  * `spark-sql-kafka` connector jar ships and coursier is offline
  * (SURVEY.md §7.0). This spec is the day-one exerciser for an environment
  * that has both pieces:
  *
  *  - the connector class (`org.apache.spark.sql.kafka010.KafkaSourceProvider`)
  *    on the classpath, AND
  *  - a reachable broker named by `GRAFT_KAFKA_BOOTSTRAP`
  *    (e.g. `localhost:9092`);
  *
  * when either is missing the tests CANCEL — visibly pending, never
  * passing vacuously — and when both are present they run the full
  * produce → broker → consume round-trip through the exact production code
  * path (`Topic(..., backend = Kafka(servers)).write` / `.read` +
  * `fromKafkaWire`), in both wire formats.
  */
class KafkaSocketSpec extends SparkSuite {
  import spark.implicits._

  private val connectorClass = "org.apache.spark.sql.kafka010.KafkaSourceProvider"

  private def connectorPresent: Boolean =
    try { Class.forName(connectorClass); true }
    catch { case _: ClassNotFoundException => false }

  private def bootstrap: Option[String] =
    sys.env.get("GRAFT_KAFKA_BOOTSTRAP").filter(_.nonEmpty)

  /** Cancel (not pass) unless the socket is actually runnable here. */
  private def requireSocket(): String = {
    if (!connectorPresent)
      cancel(s"$connectorClass not on classpath — the spark-sql-kafka " +
        "connector jar is absent in this image (SURVEY.md §7.0); add the " +
        "jar and set GRAFT_KAFKA_BOOTSTRAP to run the socket round-trip")
    bootstrap.getOrElse(
      cancel("GRAFT_KAFKA_BOOTSTRAP is unset — export it as host:port of " +
        "a reachable broker to run the socket round-trip"))
  }

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val rows = Seq(
    (1L, ts(10), 100L, "click", 2.5),
    (2L, ts(20), 101L, "purchase", -1.25),
    (1L, ts(30), 102L, "view", 0.0))

  private val valueSchema = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("event_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  test("JSON wire: produce to the broker, consume back, identity") {
    val servers = requireSocket()
    val name = s"graft-socket-json-${System.nanoTime()}"
    val topic = Topic(name, "user_id", "ts", backend = Topic.Kafka(servers))
    val df = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
    topic.write(df, path = "") // kafka backend: records go to the topic name
    val wire = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", name)
      .option("startingOffsets", "earliest").load()
    val back = topic.fromKafkaWire(wire, valueSchema, keyType = LongType)
      .as[(Long, Timestamp, Long, String, Double)].collect().toSet
    assert(back == rows.toSet, "broker round-trip must be the identity")
  }

  test("framed-Avro wire: produce to the broker, consume back, identity") {
    val servers = requireSocket()
    val name = s"graft-socket-avro-${System.nanoTime()}"
    val topic = Topic(name, "user_id", "ts", backend = Topic.Kafka(servers))
    val df = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
    topic.toKafkaWire(df, avroFrame = Some(42)).write.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", name).save()
    val wire = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", name)
      .option("startingOffsets", "earliest").load()
    val back = topic.fromKafkaWire(wire, valueSchema, keyType = LongType,
        avroFrame = Some(42))
      .as[(Long, Timestamp, Long, String, Double)].collect().toSet
    assert(back == rows.toSet, "framed-Avro broker round-trip must be the identity")
  }

  test("streaming sink honors the kafka backend end-to-end") {
    val servers = requireSocket()
    val name = s"graft-socket-stream-${System.nanoTime()}"
    val topic = Topic(name, "user_id", "ts", backend = Topic.Kafka(servers))
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    ms.addData(rows)
    val ck = java.nio.file.Files.createTempDirectory("kafka-socket-ck").toString
    val q = topic.writeStream(
        ms.toDS().toDF("user_id", "ts", "event_id", "event_type", "value"),
        path = "", checkpoint = ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wire = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", name)
      .option("startingOffsets", "earliest").load()
    val back = topic.fromKafkaWire(wire, valueSchema, keyType = LongType)
      .as[(Long, Timestamp, Long, String, Double)].collect().toSet
    assert(back == rows.toSet,
      "the streaming kafka sink must land the same wire frames")
  }
}
