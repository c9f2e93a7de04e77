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
      df.write.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("topic", name).save()
    case Topic.Files =>
      val w = df.write.mode("overwrite")
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Streaming sink with checkpointing (exactly-once to files). */
  def writeStream(df: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
}

object Topic {
  sealed trait Backend
  case object Files extends Backend
  final case class Kafka(bootstrapServers: String) extends Backend

  /** JSON-wire encode/decode helpers live in [[Serde]]; a Kafka topic's
    * value bytes map to a string column fed through `Serde.parseJson`.
    */
  val events: Topic = Topic("events", "user_id", "ts", nanosTs = true)
  val orders: Topic = Topic("orders", "o_custkey", "o_orderdate")
}
