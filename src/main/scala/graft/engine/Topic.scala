package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Source/sink abstraction — the reference's topic layer (SURVEY.md S1-S5).
  *
  * A [[Topic]] is a named, keyed record source with an event-time column.
  * In this environment the physical transport is parquet directories (batch)
  * and file streams (streaming) because no Kafka connector jar ships with
  * the image (SURVEY.md §7.0); the `kafka` backend is a configuration
  * switch: the record model (key, value columns, event time) and every
  * downstream operator are transport-agnostic, exactly like swapping
  * `builder.stream(topic)` bootstrap servers.
  */
final case class Topic(name: String, keyCol: String, tsCol: String,
                       backend: Topic.Backend = Topic.Files,
                       nanosTs: Boolean = false) {

  /** Batch view of the topic (the oracle path). `nanosTs` topics carry a
    * parquet TIMESTAMP(NANOS) event time, which Spark 4 only reads via the
    * nanosAsLong legacy conf — truncated here to µs (DuckDB-equivalent).
    */
  def read(spark: SparkSession, dir: String): DataFrame = backend match {
    case Topic.Files if nanosTs =>
      if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") != Some("true"))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = Tables.table(spark, dir, name)
      if (raw.schema(tsCol).dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      else raw
    case Topic.Files => Tables.table(spark, dir, name)
    case Topic.Kafka(servers) =>
      // Identical record model over format("kafka"); requires the
      // spark-sql-kafka connector on the classpath (absent in this image).
      spark.read.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", name).load()
  }

  /** Streaming view; `schema` is required for file streams (which watch a
    * DIRECTORY — stage single-file fixtures into one, see
    * StreamingSourcesSpec). For `nanosTs` topics declare the event-time
    * column as LongType in `schema`; it is converted to a µs timestamp here
    * so streaming and batch reads agree.
    */
  def readStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    backend match {
      case Topic.Files =>
        val raw = spark.readStream.schema(schema).parquet(s"$dir/$name.parquet")
        if (nanosTs && raw.schema(tsCol).dataType == org.apache.spark.sql.types.LongType)
          raw.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
        else raw
      case Topic.Kafka(servers) =>
        spark.readStream.format("kafka")
          .option("kafka.bootstrap.servers", servers)
          .option("subscribe", name).load()
    }

  def asStream(spark: SparkSession, dir: String): graft.api.KStream =
    graft.api.KStream(read(spark, dir), keyCol, tsCol)

  /** Batch sink (S4/S5): partition by a column when downstream reads filter
    * on it (partition pruning at 100 TB). Kafka-backed topics produce to
    * the broker (requires the connector jar) — the backend is honored, not
    * silently ignored.
    */
  def write(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = backend match {
    case Topic.Kafka(servers) =>
      // Kafka partitioning is key-hash on the broker side; a partitionBy
      // request cannot be honored here and must not be dropped silently
      require(partitionBy.isEmpty,
        "partitionBy applies to file-backed topics only; Kafka topics partition by record key")
      // the kafka sink REQUIRES (key, value) binary/string columns — an
      // arbitrary record frame must go through the wire mapping first
      toKafkaWire(df).write.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("topic", name).save()
    case Topic.Files =>
      val w = df.write.mode("overwrite")
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Produce-side wire mapping for `format("kafka")` sinks, which accept
    * exactly (key, value) columns: the key column rendered as UTF-8 bytes
    * (the broker's hash-partitioning input — same key ⇒ same partition,
    * the ordering guarantee every stateful operator relies on) and ALL
    * remaining columns as the value payload — JSON text (the reference's
    * circe wire, serdes/circe.scala:14) or, with `avroFrame = Some(id)`,
    * registry-framed Avro binary ([[Serde.toAvroFramed]]). Event time
    * rides INSIDE the value like any data field; the broker stamps its own
    * record timestamp. Spec-tested round-trip against [[fromKafkaWire]] —
    * the whole wire path except the socket, which needs the connector jar
    * absent from this image (SURVEY.md §7.0).
    */
  def toKafkaWire(df: DataFrame, avroFrame: Option[Int] = None): DataFrame = {
    val valueCols = df.columns.filter(_ != keyCol).toSeq
    val value = avroFrame match {
      case Some(id) =>
        // canonical NULLABLE wire record: the producer's in-memory frame
        // often carries non-nullable fields (tuples, parquet NOT NULL),
        // but the subject's registry schema is one fixed record — forcing
        // every field nullable (KnownNullable: survives optimization,
        // unlike a foldable CASE WHEN) makes producer and consumer derive
        // the IDENTICAL union[null, T] schema from the declared field
        // types alone, with no dependence on upstream nullability
        // (the consumer side canonicalizes its declared schema the same
        // way in fromKafkaWire)
        Serde.toAvroFramed(id, valueCols.map { c =>
          import org.apache.spark.sql.graftbridge.ColumnBridge
          ColumnBridge.column(org.apache.spark.sql.catalyst.expressions
            .KnownNullable(ColumnBridge.expression(col(c)))).as(c)
        }: _*)
      case None =>
        // explicit micro-precision timestamp text: Spark's default JSON
        // timestampFormat renders milliseconds only, which would silently
        // truncate the µs event times every fixture and processor carries
        to_json(struct(valueCols.map(col): _*),
          java.util.Map.of("timestampFormat", Topic.wireTsFmt)).cast("binary")
    }
    df.select(col(keyCol).cast("string").cast("binary").as("key"),
      value.as("value"))
  }

  /** Consume-side wire mapping: decode a Kafka-source frame (the fixed
    * `key/value/topic/partition/offset/timestamp/timestampType` schema of
    * `format("kafka")`, or a staged capture of one) back into this topic's
    * record model. `valueSchema` declares the payload fields (the topic's
    * compile-time schema, §1.3); decoding is PERMISSIVE — malformed
    * payloads become null structs, the reference's tolerant-serde contract.
    *
    * Avro field-order contract: raw Avro binary is positional, so with
    * `avroFrame` set the writer schema must list fields in the PRODUCER'S
    * column order ([[toKafkaWire]]'s `df.columns` minus the key). By
    * default that order is assumed to be `valueSchema`'s own field order;
    * a consumer whose declared order differs (e.g. a product-encoder
    * schema) must pass `producedOrder` = the producer's value-column
    * order, and decoding then goes through Avro schema RESOLUTION
    * (writer = produced order, reader = the declared schema) so fields
    * re-pair by NAME — without it, same-typed fields would silently swap
    * values. JSON payloads are always by-name; `producedOrder` is ignored
    * there.
    */
  def fromKafkaWire(wire: DataFrame, valueSchema: StructType,
                    keyType: org.apache.spark.sql.types.DataType =
                      org.apache.spark.sql.types.StringType,
                    avroFrame: Option[Int] = None,
                    producedOrder: Option[Seq[String]] = None): DataFrame = {
    // canonicalize the declared schema to the wire's all-nullable record
    // (the consumer mirror of toKafkaWire's KnownNullable): a caller
    // passing a product-encoder schema with non-nullable longs must not
    // silently diverge from the union[null, T] bytes on the wire
    val wireSchema = StructType(valueSchema.map(_.copy(nullable = true)))
    val decoded = avroFrame match {
      case Some(id) =>
        val readerJson =
          org.apache.spark.sql.graftbridge.AvroBridge.toAvroType(wireSchema).toString
        producedOrder match {
          case Some(order) if order != valueSchema.fieldNames.toSeq =>
            require(order.sorted == valueSchema.fieldNames.toSeq.sorted,
              s"producedOrder must be a permutation of the declared fields: " +
                s"${order.mkString(",")} vs ${valueSchema.fieldNames.mkString(",")}")
            val writerJson = org.apache.spark.sql.graftbridge.AvroBridge
              .toAvroType(StructType(order.map(n => wireSchema(n)))).toString
            Serde.parseAvroEvolved(col("value"), writerJson, readerJson, Some(id))
          case _ => Serde.parseAvroFramed(col("value"), readerJson, id)
        }
      case None => from_json(col("value").cast("string"), wireSchema,
        java.util.Map.of("timestampFormat", Topic.wireTsFmt))
    }
    wire.select(col("key").cast("string").cast(keyType).as(keyCol),
        decoded.as("graft_value"))
      .select(col(keyCol) +: valueSchema.fieldNames.toSeq
        .map(f => col(s"graft_value.$f").as(f)): _*)
  }

  /** Streaming sink with checkpointing: exactly-once to files, or the
    * wire-mapped kafka sink for broker-backed topics (honoring the
    * backend like the batch [[write]]; `path` is unused there — records
    * go to this topic's name). */
  def writeStream(df: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    backend match {
      case Topic.Kafka(servers) =>
        toKafkaWire(df).writeStream.format("kafka")
          .option("kafka.bootstrap.servers", servers)
          .option("topic", name)
          .option("checkpointLocation", checkpoint)
      case Topic.Files =>
        df.writeStream.format("parquet")
          .option("path", path)
          .option("checkpointLocation", checkpoint)
    }
}

object Topic {
  /** Wire timestamp text format: explicit micro precision (Spark's JSON
    * default is millisecond-only) — same format the file-format
    * round-trips use. */
  val wireTsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  sealed trait Backend
  case object Files extends Backend
  final case class Kafka(bootstrapServers: String) extends Backend

  /** JSON-wire encode/decode helpers live in [[Serde]]; a Kafka topic's
    * value bytes map to a string column fed through `Serde.parseJson`.
    */
  val events: Topic = Topic("events", "user_id", "ts", nanosTs = true)
  val orders: Topic = Topic("orders", "o_custkey", "o_orderdate")
}
