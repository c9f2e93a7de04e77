package graft.queries

import graft.api.{KStream, KTable}
import graft.engine.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Reference-parity queries (SURVEY.md §2 inventory, P rows), each with a
  * DuckDB oracle. Every query is deterministic: aggregates over doubles go
  * through DECIMAL(18,2) so the sum is exact and partition-order-independent,
  * then back to DOUBLE so output schemas match the oracle exactly; ties in
  * latest-per-key / top-k are broken by a unique id.
  */
object ReferenceQueries {

  /** Exact, order-insensitive money sum: double → decimal → sum → double.
    * Both engines round the (data-gen rounded) doubles to the same decimal,
    * so results are bit-identical regardless of partitioning.
    */
  private def moneySum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  // ---------------------------------------------------------------- events
  private def eventsStream(spark: SparkSession, dir: String): KStream =
    KStream(Tables.events(spark, dir), keyCol = "user_id", tsCol = "ts")

  /** BasicStreams parity (BasicStreams.scala:51-60): peek → filter(value
    * contains marker) → mapValues(substring after separator → cast long) →
    * filter(> threshold) → peek. The "value" is the raw `props` payload; the
    * extracted number is the `k` field, located by index arithmetic exactly
    * like `v.substring(v.indexOf("-") + 1)` + `toLong`.
    */
  def basicFilterExtract(spark: SparkSession, dir: String): DataFrame =
    eventsStream(spark, dir)
      .peek("pre")
      .filter(col("props").contains("\"k\""))
      .withValue("k",
        trim(expr("substring(props, instr(props, ':') + 1)"), " }")
          .cast(LongType))
      .filter(col("k") > 50)
      .peek("post")
      .df.select("event_id", "user_id", "k")


  val basicFilterExtractSql: String =
    """SELECT event_id, user_id,
      |       CAST(trim(substr(props, position(':' IN props) + 1), ' }') AS BIGINT) AS k
      |FROM events
      |WHERE position('"k"' IN props) > 0
      |  AND CAST(trim(substr(props, position(':' IN props) + 1), ' }') AS BIGINT) > 50""".stripMargin

  /** KTable parity (KTableExample.scala:52-56): read the orders changelog as
    * a latest-per-key view — latest order per customer, ties broken by
    * o_orderkey. One shuffle, map-side-combined `max_by`.
    */
  def ktableLatest(spark: SparkSession, dir: String): DataFrame =
    // project BEFORE the reduction: max_by packs all value columns into its
    // struct, which defeats scan pruning if unused columns are still around
    KStream(
      Tables.orders(spark, dir)
        .select("o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"),
      keyCol = "o_custkey", tsCol = "o_orderdate")
      .toTable(orderBy = Seq("o_orderdate", "o_orderkey"))
      .df.select("o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")

  val ktableLatestSql: String =
    """SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice, o_orderdate
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
      |                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |      FROM orders) WHERE rn = 1""".stripMargin

  /** KTable filter+mapValues on the VIEW (KTableExample.scala:58-62): reduce
    * to latest-per-key FIRST, then filter/project — the order-sensitive
    * changelog semantics (SURVEY.md §7.5).
    */
  def ktableFilterView(spark: SparkSession, dir: String): DataFrame =
    KStream(
      Tables.orders(spark, dir)
        .select("o_custkey", "o_orderkey", "o_orderpriority", "o_orderdate"),
      keyCol = "o_custkey", tsCol = "o_orderdate")
      .toTable(orderBy = Seq("o_orderdate", "o_orderkey"))
      .filter(col("o_orderpriority").contains("URGENT"))
      .mapValues(
        "o_orderkey" -> col("o_orderkey"),
        "priority_tag" -> expr("substring(o_orderpriority, instr(o_orderpriority, '-') + 1)"))
      .df.select("o_custkey", "o_orderkey", "priority_tag")

  val ktableFilterViewSql: String =
    """SELECT o_custkey, o_orderkey,
      |       substr(o_orderpriority, position('-' IN o_orderpriority) + 1) AS priority_tag
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
      |                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |      FROM orders)
      |WHERE rn = 1 AND position('URGENT' IN o_orderpriority) > 0""".stripMargin

  /** Aggregations parity (AggregationsExample.scala:35-41): groupByKey →
    * aggregate(0.0)(_ + price) → mapValues(OrderTotal(key, total)). The
    * converged running sum is the grouped sum; partial aggregation gives the
    * map-side combine the reference's single node never needed.
    */
  def runningSum(spark: SparkSession, dir: String): DataFrame =
    eventsStream(spark, dir)
      .groupByKey
      .aggregate(moneySum(col("value")).as("total"))
      .mapValues("total" -> col("total"))
      .df.select("user_id", "total")

  val runningSumSql: String =
    """SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events GROUP BY user_id""".stripMargin

  /** count / min / max / sum per group (gap ops A4; free built-ins). */
  def aggCountReduce(spark: SparkSession, dir: String): DataFrame =
    KStream(Tables.events(spark, dir), "event_type", "ts")
      .groupByKey
      .aggregate(
        count(lit(1)).as("n"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"),
        moneySum(col("value")).as("total"))
      .df.select("event_type", "n", "min_v", "max_v", "total")

  val aggCountReduceSql: String =
    """SELECT event_type, count(*) AS n, min(value) AS min_v, max(value) AS max_v,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events GROUP BY event_type""".stripMargin

  /** Stream–table join (JoinsExample.scala:41-45 + UserCombinedOrder,
    * SURVEY.md J2): enrich the orders stream with the customer table. The
    * dimension side is broadcast — no shuffle of the fact stream.
    */
  def streamTableJoin(spark: SparkSession, dir: String): DataFrame = {
    val ordersS = KStream(Tables.orders(spark, dir), "o_custkey", "o_orderdate")
    val custT = KTable(Tables.customer(spark, dir), "c_custkey")
    ordersS.df
      .join(broadcast(custT.df), col("o_custkey") === col("c_custkey"), "inner")
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"), col("c_mktsegment"),
        col("o_totalprice"))
  }

  val streamTableJoinSql: String =
    """SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
      |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin

  /** Stream–stream interval join (JoinsExample.scala:47-56): click and
    * purchase events of the same user within ±10 minutes of each other
    * (inner, zero grace — parity with JoinWindows.ofTimeDifferenceWithNoGrace).
    * The reference stamps output with Instant.now() (JoinsExample.scala:270);
    * that column is non-deterministic and excluded from the oracle-checked
    * projection (SURVEY.md §5.2).
    */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsStream(spark, dir)
    val Seq(clicks, purchases) =
      ev.branch(col("event_type") === "click", col("event_type") === "purchase")
    clicks
      .joinInterval(purchases, tolerance = "10 MINUTES")
      .select(
        col("l_user_id").as("user_id"),
        col("l_event_id").as("click_id"),
        col("r_event_id").as("purchase_id"),
        col("l_ts").as("click_ts"),
        col("r_ts").as("purchase_ts"))
  }

  val intervalJoinSql: String =
    """SELECT c.user_id AS user_id, c.event_id AS click_id, p.event_id AS purchase_id,
      |       c.ts AS click_ts, p.ts AS purchase_ts
      |FROM events c JOIN events p
      |  ON c.user_id = p.user_id
      | AND c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.ts >= c.ts - INTERVAL '10 minutes'
      | AND p.ts <= c.ts + INTERVAL '10 minutes'""".stripMargin

  /** Branch + transform + merge (Kafka Streams split/merge, gap ops T9/T10):
    * route big purchases and any error event into one audit stream.
    */
  def branchMerge(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsStream(spark, dir)
    val Seq(big, errors) = ev.branch(
      col("event_type") === "purchase" && col("value") > 100.0,
      col("event_type") === "error")
    big.mapValues("reason" -> lit("big_purchase"), "event_id" -> col("event_id"))
      .merge(errors.mapValues("reason" -> lit("error_event"), "event_id" -> col("event_id")))
      .df.select("event_id", "user_id", "reason")
  }

  val branchMergeSql: String =
    """SELECT event_id, user_id, 'big_purchase' AS reason FROM events
      |WHERE event_type = 'purchase' AND value > 100.0
      |UNION ALL
      |SELECT event_id, user_id, 'error_event' AS reason FROM events
      |WHERE event_type = 'error'""".stripMargin

  /** Tumbling-window aggregation (gap A5/W6): 1-hour event-time windows per
    * event_type. Streaming twin adds a watermark (graft.streaming).
    */
  def windowedAgg(spark: SparkSession, dir: String): DataFrame =
    KStream(Tables.events(spark, dir), "event_type", "ts")
      .groupByKey
      .windowedAggregate("ts", "1 hour",
        count(lit(1)).as("n"),
        moneySum(col("value")).as("total"))
      .select("window_start", "event_type", "n", "total")

  val windowedAggSql: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
      |       count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Batch oracle of the W5 emit-final parity row
    * ([[StreamParity.windowedAggEmitFinalStreamParity]]): the windowed
    * aggregation restricted to CLOSED windows — append mode under a
    * zero-delay watermark emits a window iff its end ≤ max event time, so
    * the open tail window is suppressed.
    */
  val windowedAggEmitFinalSql: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
      |       count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events GROUP BY 1, 2
      |HAVING window_start + INTERVAL '1 hour' <= (SELECT max(ts) FROM events)""".stripMargin

  /** Sliding-window aggregation (gap W6, second half): 1-hour windows
    * sliding every 30 minutes — each event lands in 2 windows. The oracle
    * expands each event into its candidate window starts and filters.
    */
  def slidingAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("total"))

  val slidingAggSql: String =
    """SELECT ws AS window_start, event_type, count(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM (SELECT event_type, value, ts,
      |        unnest([time_bucket(INTERVAL '30 minutes', ts),
      |                time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws
      |      FROM events)
      |WHERE ts >= ws AND ts < ws + INTERVAL '1 hour'
      |GROUP BY ws, event_type""".stripMargin

  /** JSON wire round-trip (S5 serializer ∘ S3 deserializer = identity,
    * serdes/circe.scala:14-23): encode value columns with to_json, decode
    * with the permissive parser, project the fields back. The oracle is the
    * identity projection — any serde asymmetry breaks the hash.
    */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    Tables.events(spark, dir)
      .withColumn("wire", graft.engine.Serde.toJson(col("event_type"), col("value")))
      .withColumn("decoded", graft.engine.Serde.parseJson(col("wire"), schema))
      .select(col("event_id"), col("decoded.event_type").as("event_type"),
        col("decoded.value").as("value"))
  }

  val jsonRoundtripSql: String =
    "SELECT event_id, event_type, value FROM events"

  /** S5/E2 Avro twin of [[jsonRoundtrip]]: events encoded to Avro binary
    * (single-record, registry-less — see [[graft.engine.Serde.toAvro]])
    * and decoded back through the permissive path; the oracle is the
    * source table itself, so any codec asymmetry (double bits, string
    * encoding, field order) breaks the hash. Closes the reference's
    * declared-but-unused schema-registry serde surface
    * (docker-compose.yml:30-41; vulcan dep commented out, build.sbt:13).
    * Both codec sides are Catalyst expressions — codegen'd, no UDF.
    */
  def avroRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val avroSchema = graft.engine.Serde.avroSchemaOf(ev, "event_type", "value")
    ev.withColumn("wire", graft.engine.Serde.toAvro(col("event_type"), col("value")))
      .withColumn("decoded", graft.engine.Serde.parseAvro(col("wire"), avroSchema))
      .select(col("event_id"), col("decoded.event_type").as("event_type"),
        col("decoded.value").as("value"))
  }

  val avroRoundtripSql: String =
    "SELECT event_id, event_type, value FROM events"

  /** Registry-FRAMED Avro round-trip (round-4 verdict #7): the wire bytes
    * carry the 5-byte magic+schema-id header a Confluent-style registry
    * consumer expects (the transport of the reference's provisioned
    * registry, docker-compose.yml:30-41). Two contracts under one oracle:
    * decoding with the MATCHING id must recover every field (identity),
    * and decoding the same bytes with a FOREIGN id must yield NULL — the
    * filter keeps only rows whose wrong-id decode rejected, so a framing
    * regression on either side breaks the row count, not just the hash.
    */
  def avroFramedRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val avroSchema = graft.engine.Serde.avroSchemaOf(ev, "event_type", "value")
    ev.withColumn("wire",
        graft.engine.Serde.toAvroFramed(7, col("event_type"), col("value")))
      .withColumn("decoded",
        graft.engine.Serde.parseAvroFramed(col("wire"), avroSchema, 7))
      .filter(graft.engine.Serde.parseAvroFramed(col("wire"), avroSchema, 8).isNull)
      .select(col("event_id"), col("decoded.event_type").as("event_type"),
        col("decoded.value").as("value"))
  }

  val avroFramedRoundtripSql: String =
    "SELECT event_id, event_type, value FROM events"

  /** Avro SCHEMA EVOLUTION under the oracle: framed bytes written under
    * the producer's (event_type, value) schema are decoded by a consumer
    * whose READER schema reorders the fields, drops `value`, and adds a
    * defaulted `tag` — Avro schema resolution, the registry's actual
    * compatibility contract ([[graft.engine.Serde.parseAvroEvolved]]).
    * The oracle states the resolved result directly: original field
    * values where kept, the declared default where added.
    */
  def avroEvolutionRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val writerSchema = graft.engine.Serde.avroSchemaOf(ev, "event_type", "value")
    val readerSchema =
      """{"type":"record","name":"topLevelRecord","fields":[
        |  {"name":"tag","type":"string","default":"und"},
        |  {"name":"event_type","type":"string"}]}""".stripMargin
    ev.withColumn("wire",
        graft.engine.Serde.toAvroFramed(7, col("event_type"), col("value")))
      .withColumn("decoded", graft.engine.Serde.parseAvroEvolved(
        col("wire"), writerSchema, readerSchema, schemaId = Some(7)))
      .select(col("event_id"), col("decoded.event_type").as("event_type"),
        col("decoded.tag").as("tag"))
  }

  val avroEvolutionRoundtripSql: String =
    "SELECT event_id, event_type, 'und' AS tag FROM events"

  /** A MIXED-VERSION topic under the oracle — the registry consumer's
    * per-record contract ([[graft.engine.Serde.parseAvroRegistry]]): even
    * event_ids are framed under writer v1 = (event_type, value) with id 7,
    * odd ones under writer v2 = (tag, value, event_type) with id 8 (new
    * defaulted field AND reordered — a producer fleet mid-migration), and
    * ONE consumer decodes the whole stream by resolving each frame's id
    * against its registry map to the consumer's single reader schema.
    * v1 rows take the reader's default tag; v2 rows carry their own. A
    * third frame under an UNREGISTERED id must decode to NULL (the failed
    * registry lookup) — the filter makes that a row-count condition.
    */
  def avroRegistryRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val writer1 = graft.engine.Serde.avroSchemaOf(
      ev.select(col("event_type"), col("value")), "event_type", "value")
    val v2cols = Seq(substring(col("event_type"), 1, 2).as("tag"),
      col("value"), col("event_type"))
    val writer2 = graft.engine.Serde.avroSchemaOf(
      ev.select(v2cols: _*), "tag", "value", "event_type")
    val readerSchema =
      """{"type":"record","name":"topLevelRecord","fields":[
        |  {"name":"event_type","type":"string"},
        |  {"name":"value","type":"double"},
        |  {"name":"tag","type":"string","default":"und"}]}""".stripMargin
    ev.withColumn("wire",
        when(col("event_id") % 2 === 0,
          graft.engine.Serde.toAvroFramed(7, col("event_type"), col("value")))
          .otherwise(graft.engine.Serde.toAvroFramed(8, v2cols: _*)))
      .withColumn("decoded", graft.engine.Serde.parseAvroRegistry(
        col("wire"), readerSchema, Map(7 -> writer1, 8 -> writer2)))
      .filter(graft.engine.Serde.parseAvroRegistry(
        col("wire"), readerSchema, Map(99 -> writer1)).isNull)
      .select(col("event_id"), col("decoded.event_type").as("event_type"),
        col("decoded.value").as("value"), col("decoded.tag").as("tag"))
  }

  val avroRegistryRoundtripSql: String =
    """SELECT event_id, event_type, value,
      |       CASE WHEN event_id % 2 = 0 THEN 'und'
      |            ELSE substr(event_type, 1, 2) END AS tag
      |FROM events""".stripMargin

  /** The Kafka WIRE layer under the oracle: events rendered into the exact
    * (key, value) binary frame a `format("kafka")` sink requires — key =
    * UTF-8 key bytes (the broker's partitioning input), value = registry-
    * framed Avro — then decoded back through the consumer-side mapping
    * ([[graft.engine.Topic.fromKafkaWire]]). Identity oracle: any wire
    * asymmetry (timestamp precision, double bits, framing, key rendering)
    * breaks the hash. This is the whole Kafka path except the socket,
    * which needs the connector jar absent from this image (SURVEY.md
    * §7.0 — the one reference behavior that cannot execute end-to-end).
    */
  def kafkaWireRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val topic = graft.engine.Topic("events", "user_id", "ts")
    val ev = Tables.events(spark, dir)
      .select("user_id", "ts", "event_id", "event_type", "value")
    val valueSchema = org.apache.spark.sql.types.StructType(
      ev.schema.filterNot(_.name == "user_id"))
    topic.fromKafkaWire(
      topic.toKafkaWire(ev, avroFrame = Some(9)),
      valueSchema, keyType = org.apache.spark.sql.types.LongType,
      avroFrame = Some(9))
  }

  val kafkaWireRoundtripSql: String =
    "SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type, value FROM events"

  /** S8 file-format scans under the oracle: the events table is written
    * out as CSV, JSON-lines and ORC, read back through the corresponding
    * built-in scans, and ALL THREE read-backs are emitted tagged by
    * format. The oracle is the parquet table × 3 formats, so any
    * serialization asymmetry in any format — timestamp formatting, double
    * text round-trip, null handling — breaks the hash for that format's
    * rows. Text formats carry timestamps as explicit micro-precision
    * strings (the session is UTC); doubles survive because Java's
    * shortest-round-trip `Double.toString` is parsed back exactly.
    *
    * Scale: each write/read is a full distributed pass (no driver
    * collect); the read-backs use the explicit schema, so nothing depends
    * on sampling-based inference. Text formats at 100 TB cost ~3-5× parquet
    * in bytes and give up column pruning + predicate pushdown — this query
    * exists to prove the scans are CORRECT; parquet stays the performance
    * default everywhere else (see Tables).
    */
  def formatRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val ev = Tables.events(spark, dir)
      .select("event_id", "user_id", "event_type", "value", "ts")
    // stable scoped path + overwrite, not a fresh temp dir per call: the
    // bench invokes every query 4x, and an unscoped fresh dir per run
    // accumulates full-table CSV/JSON/ORC copies in /tmp indefinitely
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_formats_${ProcessHandle.current().pid()}_" +
        graft.engine.PortableHash.md5LongScala(dir).toHexString.take(8)).toString
    ev.write.mode("overwrite").option("header", "true")
      .option("timestampFormat", tsFmt).csv(s"$tmp/csv")
    ev.write.mode("overwrite").option("timestampFormat", tsFmt).json(s"$tmp/json")
    ev.write.mode("overwrite").orc(s"$tmp/orc")
    val csv = spark.read.schema(ev.schema).option("header", "true")
      .option("timestampFormat", tsFmt).csv(s"$tmp/csv")
    val json = spark.read.schema(ev.schema).option("timestampFormat", tsFmt)
      .json(s"$tmp/json")
    val orc = spark.read.schema(ev.schema).orc(s"$tmp/orc")
    Seq("csv" -> csv, "json" -> json, "orc" -> orc)
      .map { case (fmt, df) => df.withColumn("fmt", lit(fmt)) }
      .reduce(_.unionByName(_))
      .select("fmt", "event_id", "user_id", "event_type", "value", "ts")
  }

  val formatRoundtripSql: String =
    """SELECT f.fmt, e.event_id, e.user_id, e.event_type, e.value,
      |       e.ts::TIMESTAMP AS ts
      |FROM events e CROSS JOIN (SELECT unnest(['csv', 'json', 'orc']) AS fmt) f""".stripMargin

  /** Permissive JSON parse + summarize (serdes/circe.scala:15-23 semantics
    * over the `props` JSON column): malformed rows become null and are
    * dropped, valid rows contribute. The threshold-fail handler variant is
    * exercised in ErrorsSpec (no corrupt rows exist in the fixture).
    */
  def errorTolerantParse(spark: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("k", LongType)))
    Tables.events(spark, dir)
      .withColumn("parsed", graft.engine.Serde.parseJson(col("props"), schema))
      .filter(col("parsed").isNotNull && col("parsed.k").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_parsed"), sum(col("parsed.k")).as("sum_k"))
      .select("event_type", "n_parsed", "sum_k")
  }

  val errorTolerantParseSql: String =
    """SELECT event_type, count(*) AS n_parsed,
      |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events
      |WHERE try_cast(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
      |GROUP BY event_type""".stripMargin

  /** Dead-letter split with an error budget — the E1/E2 threshold path
    * (ErrorHandlingExample.scala:32-47) under the oracle. The fixture has no
    * corrupt rows and testdata is read-only, so corruption is injected
    * deterministically at read time: every 20th event's props is mangled
    * into invalid JSON (a 5% corruption rate at every SF). The pipeline then
    *  1. routes rows through [[graft.engine.Serde.parseOrDeadLetter]],
    *  2. enforces the skip-N-then-fail budget
    *     ([[graft.engine.Errors.checkBudget]]) at total/12 ≈ 8.3% — above
    *     the injected 5%, so the run proceeds; the exceeded-budget FAIL is
    *     ErrorsSpec's job — and
    *  3. aggregates BOTH routes so the oracle verifies the split itself.
    * The corrupt predicate is replayed by DuckDB as `k IS NULL` under a
    * json_valid guard — identical to isCorrupt's all-declared-fields-null
    * rule for this single-field schema.
    */
  def errorDeadletterSplit(spark: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("k", LongType)))
    val injected = Tables.events(spark, dir).withColumn("props",
      when(pmod(col("event_id"), lit(20)) === 0, concat(lit("{broken"), col("props")))
        .otherwise(col("props")))
    val (good, dead) = graft.engine.Serde.parseOrDeadLetter(injected, "props", schema)
    // one counting action gates the pipeline — the reference's FAIL-after-
    // maxErrors policy, enforced before any downstream work is scheduled
    val counts = injected.agg(
      count(lit(1)).as("total"),
      count_if(graft.engine.Serde.isCorrupt(
        graft.engine.Serde.parseJson(col("props"), schema), schema)).as("bad")).head()
    graft.engine.Errors.checkBudget(counts.getLong(1), math.max(1L, counts.getLong(0) / 12))
    val g = good.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("parsed.k")).as("sum_k"))
      .select(lit("good").as("side"), col("event_type"), col("n"), col("sum_k"))
    val d = dead.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(lit("dead").as("side"), col("event_type"), col("n"),
        lit(null).cast(LongType).as("sum_k"))
    g.unionByName(d)
  }

  val errorDeadletterSplitSql: String =
    """WITH inj AS (SELECT event_type,
      |    CASE WHEN event_id % 20 = 0 THEN '{broken' || props ELSE props END AS props
      |  FROM events),
      |parsed AS (SELECT event_type,
      |    CASE WHEN json_valid(props)
      |         THEN try_cast(json_extract_string(props, '$.k') AS BIGINT) END AS k
      |  FROM inj)
      |SELECT 'good' AS side, event_type, count(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k
      |FROM parsed WHERE k IS NOT NULL GROUP BY event_type
      |UNION ALL
      |SELECT 'dead' AS side, event_type, count(*) AS n, NULL::BIGINT AS sum_k
      |FROM parsed WHERE k IS NULL GROUP BY event_type""".stripMargin

  /** E3 (production-handler allowlist) under the oracle — the reference's
    * CONTINUE-on-RecordTooLargeException policy
    * (ErrorHandlingExample.scala:49-62) exercised through
    * [[graft.engine.Errors.guardedSink]] against a REAL distributed sink:
    *  1. oversize records are injected deterministically at read time
    *     (every 17th event's props right-padded to 4 KB — the fixture has
    *     uniformly tiny payloads, same injection idiom as
    *     `error_deadletter_split`);
    *  2. the first produce attempt writes the full stream through a
    *     size-validating projection (`raise_error` past `maxBytes`) and
    *     FAILS task-side on the first oversize record, exactly where a
    *     too-large produce fails;
    *  3. `guardedSink` classifies the failure through the cause chain
    *     ([[graft.engine.Errors.causeChainContains]] — the executor error
    *     arrives wrapped in SparkException) and returns CONTINUE;
    *  4. CONTINUE re-produces the size-compatible rows and dead-letters
    *     the skipped oversize ones, so the handler's decision is
    *     OBSERVABLE data the oracle recomputes (a non-allowlisted failure
    *     rethrows — ErrorsSpec pins that branch).
    * Output: per (side, event_type) row counts + payload bytes from the
    * two sinks' read-backs. Scale: two distributed passes over events +
    * one over the ~6% dead slice; no driver materialization.
    */
  def errorGuardedSink(spark: SparkSession, dir: String): DataFrame = {
    val maxBytes = 1024
    val injected = Tables.events(spark, dir).withColumn("props",
      when(pmod(col("event_id"), lit(17)) === 0, rpad(col("props"), 4096, "x"))
        .otherwise(col("props")))
      .select("event_id", "event_type", "props")
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_guarded_${ProcessHandle.current().pid()}_" +
        graft.engine.PortableHash.md5LongScala(dir).toHexString.take(8)).toString
    def produce(df: DataFrame): Unit = df
      .withColumn("props",
        when(length(col("props")) > maxBytes,
          raise_error(concat(lit(s"RecordTooLargeException: payload exceeds $maxBytes bytes, event "),
            col("event_id"))))
          .otherwise(col("props")))
      .write.mode("overwrite").parquet(s"$tmp/sent")
    val ok = graft.engine.Errors.guardedSink(injected, produce,
      graft.engine.Errors.causeChainContains("RecordTooLargeException"))
    val oversize = length(col("props")) > maxBytes
    if (!ok) {
      // CONTINUE: skip the too-large records (re-produce the rest) and
      // dead-letter what was skipped — the skip must be visible downstream
      produce(injected.filter(!oversize))
      injected.filter(oversize).write.mode("overwrite").parquet(s"$tmp/dead")
    } else {
      injected.filter(oversize).write.mode("overwrite").parquet(s"$tmp/dead")
    }
    val sent = spark.read.schema(injected.schema).parquet(s"$tmp/sent")
    val dead = spark.read.schema(injected.schema).parquet(s"$tmp/dead")
    Seq("sent" -> sent, "dead" -> dead).map { case (side, df) =>
      df.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(length(col("props"))).as("bytes"))
        .select(lit(side).as("side"), col("event_type"), col("n"), col("bytes"))
    }.reduce(_.unionByName(_))
  }

  val errorGuardedSinkSql: String =
    """WITH inj AS (SELECT event_type,
      |    CASE WHEN event_id % 17 = 0 THEN rpad(props, 4096, 'x') ELSE props END AS props
      |  FROM events)
      |SELECT 'sent' AS side, event_type, count(*) AS n,
      |       CAST(SUM(length(props)) AS BIGINT) AS bytes
      |FROM inj WHERE length(props) <= 1024 GROUP BY event_type
      |UNION ALL
      |SELECT 'dead' AS side, event_type, count(*) AS n,
      |       CAST(SUM(length(props)) AS BIGINT) AS bytes
      |FROM inj WHERE length(props) > 1024 GROUP BY event_type""".stripMargin

  /** Funnel / sequence detection (CEP-lite on the J1 machinery): a
    * purchase "converts" when the same user clicked within the preceding
    * 30 minutes; daily conversion rate in basis points. The
    * preceding-click probe is a LEFT SEMI interval join — hash equi-join
    * on user_id with the time band as join condition, so each purchase is
    * emitted at most once (no duplicate-match inflation) and the click
    * side never materializes into the output. Day rollups then move only
    * per-day counts. Rate math is exact integer arithmetic (10000·conv
    * div total) — no double division to drift across engines.
    */
  def conversionFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val converted = purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("ts") &&
        col("c_ts") >= col("ts") - expr("INTERVAL 30 MINUTES"),
      "left_semi")
    val byDay = purchases.groupBy(date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_purchases"))
    val convByDay = converted.groupBy(date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_converted"))
    byDay.join(convByDay, Seq("day"), "left")
      .select(col("day"), col("n_purchases"),
        coalesce(col("n_converted"), lit(0L)).as("n_converted"))
      .withColumn("cvr_bp", expr("(10000 * n_converted) div n_purchases"))
  }

  val conversionFunnelSql: String =
    """WITH p AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
      |           WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts::TIMESTAMP AS ts FROM events WHERE event_type = 'click'),
      |conv AS (SELECT p.event_id, p.ts FROM p WHERE EXISTS (
      |    SELECT 1 FROM c WHERE c.user_id = p.user_id
      |      AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '30 minutes')),
      |d AS (SELECT date_trunc('day', ts) AS day, count(*) AS n_purchases FROM p GROUP BY 1),
      |dc AS (SELECT date_trunc('day', ts) AS day, count(*) AS n_converted FROM conv GROUP BY 1)
      |SELECT d.day, d.n_purchases, COALESCE(dc.n_converted, 0) AS n_converted,
      |       (10000 * COALESCE(dc.n_converted, 0)) // d.n_purchases AS cvr_bp
      |FROM d LEFT JOIN dc ON d.day = dc.day""".stripMargin

  /** Session-window aggregation (gap W6): per-user sessions closed by a
    * 30-minute inactivity gap. `session_window` is Spark-native; the oracle
    * reconstructs identical sessions with the gaps-and-islands idiom. A
    * session starts at its first event (window.start).
    */
  def sessionAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n"), col("total"))

  val sessionAggSql: String =
    """WITH o AS (SELECT user_id, ts, value,
      |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '30 minutes'
      |       THEN 1 ELSE 0 END AS brk FROM events),
      |s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
      |                               ROWS UNBOUNDED PRECEDING) AS sid FROM o)
      |SELECT min(ts) AS session_start, user_id, count(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM s GROUP BY user_id, sid""".stripMargin

  /** As-of join (gap J3): each purchase matched to the user's most recent
    * click at-or-before it, looking back at most 1 hour. Range join +
    * max_by reduction — see KStream.asOfJoin.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsStream(spark, dir)
    val Seq(clicks, purchases) =
      ev.branch(col("event_type") === "click", col("event_type") === "purchase")
    purchases
      .mapValues("event_id" -> col("event_id"))
      .asOfJoin(clicks.mapValues("event_id" -> col("event_id")), "1 HOUR",
        leftId = "event_id", rightId = "event_id")
      .select(col("l_event_id").as("purchase_id"), col("l_user_id").as("user_id"),
        col("r_event_id").as("click_id"))
  }

  val asofJoinSql: String =
    """SELECT purchase_id, user_id, click_id FROM (
      |  SELECT p.event_id AS purchase_id, p.user_id AS user_id, c.event_id AS click_id,
      |         row_number() OVER (PARTITION BY p.event_id
      |                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
      |  FROM events p JOIN events c
      |    ON p.event_type = 'purchase' AND c.event_type = 'click'
      |   AND c.user_id = p.user_id
      |   AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '1 hour')
      |WHERE rn = 1""".stripMargin

  /** The same as-of semantics through the NATIVE operator
    * ([[graft.plans.AsofJoinExec]]): one co-partitioned exchange per side
    * and a single forward merge pass — no candidate-pair intermediate, no
    * `max_by` reduction. Same oracle as `asof_join`, so the driver check
    * doubles as an equivalence proof between the composed and native forms;
    * PlansSpec pins the physical shape (AsofJoin node, exactly two
    * exchanges).
    */
  def asofJoinNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    graft.plans.AsofJoin.join(
        purchases, clicks,
        keys = Seq("user_id" -> "c_user_id"),
        leftTime = "ts", rightTime = "c_ts",
        rightTiebreak = Seq("click_id"),
        tolerance = Some("1 hour"), inner = true)
      .select(col("event_id").as("purchase_id"), col("user_id"), col("click_id"))
  }

  val asofJoinNativeSql: String = asofJoinSql

  /** The native as-of operator invoked from SQL TEXT (round-4 verdict #8):
    * the `graft_asof_join` table-valued function
    * ([[graft.plans.AsofJoin.registerSql]]) over two temp views — the
    * SQL-only user's route to [[graft.plans.AsofJoinExec]]. Shares
    * `asof_join`'s oracle, so the driver check proves the SQL surface and
    * the DataFrame surface resolve to the same operator semantics.
    */
  def asofSqlSurface(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.AsofJoin.registerSql(spark)
    val ev = Tables.events(spark, dir)
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
      .createOrReplaceTempView("graft_asof_purchases")
    ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .createOrReplaceTempView("graft_asof_clicks")
    spark.sql(
      """SELECT event_id AS purchase_id, user_id, click_id
        |FROM graft_asof_join('graft_asof_purchases', 'graft_asof_clicks',
        |                     'user_id', 'c_user_id', 'ts', 'c_ts',
        |                     'click_id', '1 hour', 'inner')""".stripMargin)
  }

  val asofSqlSurfaceSql: String = asofJoinSql

  /** FORWARD as-of (pandas `merge_asof(direction='forward')` parity):
    * each click matched to the user's EARLIEST purchase at-or-after it,
    * looking ahead at most 10 minutes — the "next conversion after
    * exposure" enrichment. Ties go to the SMALLEST purchase id (the
    * mirror of backward's greatest-wins). Invoked through the SQL TVF's
    * optional tenth argument, so the query also pins the 10-arg form.
    */
  def asofJoinForward(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.AsofJoin.registerSql(spark)
    val ev = Tables.events(spark, dir)
    ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
      .createOrReplaceTempView("graft_fwd_clicks")
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .createOrReplaceTempView("graft_fwd_purchases")
    spark.sql(
      """SELECT event_id AS click_id, user_id, purchase_id
        |FROM graft_asof_join('graft_fwd_clicks', 'graft_fwd_purchases',
        |                     'user_id', 'p_user_id', 'ts', 'p_ts',
        |                     'purchase_id', '10 minutes', 'left', 'forward')""".stripMargin)
  }

  val asofJoinForwardSql: String =
    """SELECT click_id, user_id, purchase_id FROM (
      |  SELECT c.event_id AS click_id, c.user_id AS user_id,
      |         p.event_id AS purchase_id,
      |         row_number() OVER (PARTITION BY c.event_id
      |                            ORDER BY p.ts ASC, p.event_id ASC) AS rn
      |  FROM (SELECT * FROM events WHERE event_type = 'click') c
      |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |    ON p.user_id = c.user_id
      |   AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '10 minutes')
      |WHERE rn = 1""".stripMargin

  /** NEAREST as-of: each purchase matched to the user's click CLOSEST in
    * time within ±10 minutes; equal distance prefers the backward side
    * (then backward's greatest-tiebreak / forward's smallest-tiebreak
    * rules apply within a side). The oracle encodes the same preference
    * ladder: absolute distance, then side, then the side's id direction.
    */
  def asofJoinNearest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    graft.plans.AsofJoin.join(
        purchases, clicks,
        keys = Seq("user_id" -> "c_user_id"),
        leftTime = "ts", rightTime = "c_ts",
        rightTiebreak = Seq("click_id"),
        tolerance = Some("10 minutes"), inner = false,
        direction = "nearest")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("click_id"))
  }

  val asofJoinNearestSql: String =
    """SELECT purchase_id, user_id, click_id FROM (
      |  SELECT p.event_id AS purchase_id, p.user_id AS user_id,
      |         c.event_id AS click_id,
      |         row_number() OVER (PARTITION BY p.event_id
      |           ORDER BY ABS(epoch_us(c.ts::TIMESTAMP) - epoch_us(p.ts::TIMESTAMP)) ASC,
      |                    CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END ASC,
      |                    CASE WHEN c.ts <= p.ts THEN -c.event_id ELSE c.event_id END ASC) AS rn
      |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |    ON c.user_id = p.user_id
      |   AND c.ts >= p.ts - INTERVAL '10 minutes'
      |   AND c.ts <= p.ts + INTERVAL '10 minutes')
      |WHERE rn = 1""".stripMargin

  /** The HOT-KEY TIME-BAND form ([[graft.plans.AsofJoin.joinTimeBanded]])
    * under the driver oracle: identical semantics to [[asofJoinNearest]]
    * (it SHARES that oracle — the driver check is the equality proof), but
    * the equi-key is widened with a 30-minute time band and the clicks
    * side replicates into every band its rows could serve (±10-minute
    * nearest window → 1–3 copies). This is the escape hatch for a single
    * key too hot for one linear merge task; see SCALE.md "as-of hot-key
    * regime" for the measured skew table.
    */
  def asofJoinBanded(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    graft.plans.AsofJoin.joinTimeBanded(
        purchases, clicks,
        keys = Seq("user_id" -> "c_user_id"),
        leftTime = "ts", rightTime = "c_ts",
        rightTiebreak = Seq("click_id"),
        tolerance = "10 minutes", inner = false,
        direction = "nearest", bandWidth = "30 minutes")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("click_id"))
  }

  val asofJoinBandedSql: String = asofJoinNearestSql

  /** The AUTO-ROUTED as-of ([[graft.plans.AsofJoin.joinRouted]]) on the
    * UNIFORM key distribution: the sampled key histogram finds no
    * dominating key (150 users, top share ~2%), so the router takes the
    * plain native operator — and the result is pinned by `asof_join`'s own
    * oracle. The thresholds here are the defaults scaled to sf-test data
    * volume (minHotRows 500 vs the production default 250k, which encodes
    * the measured 16×/90% break-even); the share threshold is untouched,
    * and it is the share test (~0.02 « 0.5) that routes this query plain.
    */
  def asofJoinAuto(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    graft.plans.AsofJoin.joinRouted(
        purchases, clicks,
        keys = Seq("user_id" -> "c_user_id"),
        leftTime = "ts", rightTime = "c_ts",
        rightTiebreak = Seq("click_id"),
        tolerance = "1 hour", inner = true,
        minHotRows = 500L, sampleFraction = 0.5)
      .select(col("event_id").as("purchase_id"), col("user_id"), col("click_id"))
  }

  val asofJoinAutoSql: String = asofJoinSql

  /** The auto-router's OTHER branch under the driver oracle: 90% of users
    * collapsed onto one key (`user_id % 10 < 9 → 0` — the same collapse the
    * oracle SQL applies), so the sampled histogram sees share ~0.9 over
    * ~1.8k hot lefts and routes through the time-band split. The oracle
    * recomputes the skewed as-of independently in DuckDB, so this row
    * proves probe + routing + banding end-to-end: a wrong decision is
    * still CORRECT (both routes are output-equal) — what this pins is that
    * the banded route, when actually taken on actually-skewed data,
    * produces the exact answer.
    */
  def asofJoinAutoHot(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("user_id",
      when(col("user_id") % 10 < 9, lit(0L)).otherwise(col("user_id")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    graft.plans.AsofJoin.joinRouted(
        purchases, clicks,
        keys = Seq("user_id" -> "c_user_id"),
        leftTime = "ts", rightTime = "c_ts",
        rightTiebreak = Seq("click_id"),
        tolerance = "1 hour", inner = true,
        minHotRows = 500L, sampleFraction = 0.5)
      .select(col("event_id").as("purchase_id"), col("user_id"), col("click_id"))
  }

  val asofJoinAutoHotSql: String =
    """SELECT purchase_id, user_id, click_id FROM (
      |  SELECT p.event_id AS purchase_id, p.user_id AS user_id,
      |         c.event_id AS click_id,
      |         row_number() OVER (PARTITION BY p.event_id
      |                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
      |  FROM (SELECT event_id, ts,
      |          CASE WHEN user_id % 10 < 9 THEN 0 ELSE user_id END AS user_id
      |        FROM events WHERE event_type = 'purchase') p
      |  JOIN (SELECT event_id, ts,
      |          CASE WHEN user_id % 10 < 9 THEN 0 ELSE user_id END AS user_id
      |        FROM events WHERE event_type = 'click') c
      |    ON c.user_id = p.user_id
      |   AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '1 hour')
      |WHERE rn = 1""".stripMargin

  /** Left-outer form of the native operator with a TIGHT lookback (5 min),
    * so unmatched purchases actually occur and the null-extension path runs
    * under the driver oracle (the inner form can't show it).
    */
  def asofJoinNativeLeft(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    graft.plans.AsofJoin.join(
        purchases, clicks,
        keys = Seq("user_id" -> "c_user_id"),
        leftTime = "ts", rightTime = "c_ts",
        rightTiebreak = Seq("click_id"),
        tolerance = Some("5 minutes"), inner = false)
      .select(col("event_id").as("purchase_id"), col("user_id"), col("click_id"))
  }

  val asofJoinNativeLeftSql: String =
    """SELECT purchase_id, user_id, click_id FROM (
      |  SELECT p.event_id AS purchase_id, p.user_id AS user_id,
      |         c.event_id AS click_id,
      |         row_number() OVER (PARTITION BY p.event_id
      |                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
      |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |    ON c.user_id = p.user_id
      |   AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '5 minutes')
      |WHERE rn = 1""".stripMargin

  /** The feature-store chain: native as-of enrichment followed IMMEDIATELY
    * by a per-key aggregation (per user: purchases, matched purchases,
    * total click→purchase lag). The scale property this query pins:
    * [[graft.plans.AsofJoinExec]] declares its output partitioning as the
    * left side's hash partitioning, so the downstream groupBy(user_id)
    * REUSES the join's exchange — the whole two-operator chain plans
    * exactly the join's own 2 shuffles and nothing more (PlansSpec-pinned).
    * The composed as-of form cannot do this: its max_by reduction keys on
    * purchase id, so the per-user aggregation re-shuffles.
    */
  def asofFeaturize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    graft.plans.AsofJoin.join(
        purchases, clicks,
        keys = Seq("user_id" -> "c_user_id"),
        leftTime = "ts", rightTime = "c_ts",
        rightTiebreak = Seq("click_id"),
        tolerance = Some("1 hour"), inner = false)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        count(col("click_id")).as("n_matched"),
        sum(col("ts").cast("long") - col("c_ts").cast("long")).as("lag_s_total"))
  }

  val asofFeaturizeSql: String =
    """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT * FROM events WHERE event_type = 'click'),
      |m AS (SELECT p.user_id, p.ts, c.ts AS c_ts, c.event_id AS click_id,
      |        row_number() OVER (PARTITION BY p.event_id
      |                           ORDER BY c.ts DESC, c.event_id DESC) AS rn
      |      FROM p LEFT JOIN c
      |        ON c.user_id = p.user_id
      |       AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '1 hour')
      |SELECT user_id, count(*) AS n_purchases, count(click_id) AS n_matched,
      |       CAST(SUM(CAST(floor(epoch(ts::TIMESTAMP)) AS BIGINT)
      |                - CAST(floor(epoch(c_ts::TIMESTAMP)) AS BIGINT)) AS BIGINT)
      |         AS lag_s_total
      |FROM m WHERE rn = 1 GROUP BY 1""".stripMargin

  /** [[asofFeaturize]] over BUCKETED storage — the whole feature-store
    * chain (temporal enrichment + per-entity aggregation) with **zero
    * shuffle exchanges**: both sides are written hash-clustered on the
    * user key (the durable pre-shuffle, [[graft.engine.Bucketing]]), the
    * native as-of's clustered-distribution requirement is satisfied at
    * scan time, and its left-preserving output partitioning feeds the
    * groupBy directly. At 100 TB nothing crosses the network but the
    * per-user summary. Shares [[asofFeaturizeSql]]'s oracle — storage
    * layout must never change results (PlansSpec pins the zero-exchange
    * shape).
    */
  def asofBucketedChain(spark: SparkSession, dir: String): DataFrame = {
    // process+dir-scoped table names (bucketedJoin's rule): fixed names in
    // the shared warehouse would let a concurrent driver race the rewrite
    val scope = s"p${ProcessHandle.current().pid()}_" +
      graft.engine.PortableHash.md5LongScala(dir).toHexString.take(8)
    val ev = Tables.events(spark, dir)
    graft.engine.Bucketing.writeBucketed(
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id")),
      s"b_asof_p_$scope", 8, Seq("user_id"))
    graft.engine.Bucketing.writeBucketed(
      ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
          col("event_id").as("click_id")),
      s"b_asof_c_$scope", 8, Seq("c_user_id"))
    graft.plans.AsofJoin.join(
        graft.engine.Bucketing.table(spark, s"b_asof_p_$scope"),
        graft.engine.Bucketing.table(spark, s"b_asof_c_$scope"),
        keys = Seq("user_id" -> "c_user_id"),
        leftTime = "ts", rightTime = "c_ts",
        rightTiebreak = Seq("click_id"),
        tolerance = Some("1 hour"), inner = false)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        count(col("click_id")).as("n_matched"),
        sum(col("ts").cast("long") - col("c_ts").cast("long")).as("lag_s_total"))
  }

  val asofBucketedChainSql: String = asofFeaturizeSql

  /** Left-outer interval join (gap J3): clicks with their matching purchase
    * if any — unmatched clicks survive with null purchase columns.
    */
  def intervalJoinLeft(spark: SparkSession, dir: String): DataFrame = {
    val ev = eventsStream(spark, dir)
    val Seq(clicks, purchases) =
      ev.branch(col("event_type") === "click", col("event_type") === "purchase")
    clicks
      .joinInterval(purchases, tolerance = "10 MINUTES", joinType = "left_outer")
      .select(
        col("l_user_id").as("user_id"),
        col("l_event_id").as("click_id"),
        col("r_event_id").as("purchase_id"))
  }

  val intervalJoinLeftSql: String =
    """SELECT c.user_id AS user_id, c.event_id AS click_id, p.event_id AS purchase_id
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id
      | AND p.ts >= c.ts - INTERVAL '10 minutes'
      | AND p.ts <= c.ts + INTERVAL '10 minutes'""".stripMargin

  /** Processor-API batch parity (A3) through the typed UDAF surface
    * (SURVEY.md §2.9): an Aggregator with an exact integer-cents buffer
    * reproduces the state store's read-modify-write fold; the converged
    * result equals the grouped sum. Streaming twin: RunningTotalProcessor.
    */
  def processorTotal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .agg(graft.functions.CentsSum.fromTuple.name("total"))
      .toDF("user_id", "total")
  }

  val processorTotalSql: String =
    """SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events GROUP BY user_id""".stripMargin

  /** flatMapValues (gap T8): explode whitespace tokens of document text,
    * count global token frequencies. explode stays in codegen; the count is
    * one partial+final hash agg.
    */
  def flatmapTokens(spark: SparkSession, dir: String): DataFrame =
    KStream(Tables.documents(spark, dir), "doc_id", "doc_id")
      .flatMapValues("token", split(col("text"), " "))
      .df.filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("n"))
      .select("token", "n")

  val flatmapTokensSql: String =
    """SELECT token, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |WHERE length(token) > 0 GROUP BY token""".stripMargin
}
