package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table loaders for the driver fixtures (TESTDATA.md).
  *
  * This is the batch form of the reference's topic sources
  * (`builder.stream` / `builder.table`, BasicStreams.scala:52,
  * KTableExample.scala:52-56). In this environment there is no Kafka
  * connector jar (SURVEY.md §7.0), so sources are parquet directories for
  * batch and file/MemoryStream for streaming; the record model is identical:
  * keyed rows with an event-time column.
  *
  * Scale notes: `spark.read.parquet` gives Catalyst a relation it can push
  * filters and column pruning into — every query in this repo is written so
  * predicates/projections land in the scan (check `PushedFilters` /
  * `ReadSchema` in `.explain("formatted")`).
  */
object Tables {
  /** Load a fixture table, normalizing any TIMESTAMP_NTZ column to
    * session-local TIMESTAMP. The driver's generator writes naive µs
    * timestamps (no isAdjustedToUTC), which Spark 4 infers as NTZ; the
    * DuckDB oracle reads the same bytes as its naive-UTC TIMESTAMP. With
    * `spark.sql.session.timeZone=UTC` (set by every entry point here) the
    * cast is wall-clock-preserving, so both engines see identical instants
    * and downstream epoch arithmetic (`cast(ts as long)`) stays legal.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeNtz(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** Cast every TIMESTAMP_NTZ column to TIMESTAMP (a projection — never
    * changes row count). Two verified properties keep this a single
    * normalization point: Catalyst unwraps the cast for comparison
    * pushdown (q3's plan shows `GreaterThan(l_shipdate, …)` in
    * PushedFilters through it), and the parquet STREAMING reader accepts
    * an LTZ-declared schema over NTZ files (every `*_stream_parity` row
    * passes a normalized schema to `readStream` and hash-matches its
    * batch oracle), so stream sources may take `table().schema` directly.
    */
  def normalizeNtz(df: DataFrame): DataFrame = {
    val ntz = df.schema.fields.filter(
      _.dataType == org.apache.spark.sql.types.TimestampNTZType)
    ntz.foldLeft(df) { (d, f) =>
      d.withColumn(f.name, d(f.name).cast(
        org.apache.spark.sql.types.TimestampType))
    }
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * as a timestamp (PARQUET_TYPE_ILLEGAL). Read it as raw nanos via the
    * legacy conf and truncate to microseconds — exactly what DuckDB does when
    * it casts ns → its µs TIMESTAMP, so the oracle agrees bit-for-bit.
    * Integer `div` (not `/`) — nanos ~1.7e18 exceed double's 2^53 mantissa.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // set-once: repeated conf.set is a global side effect, racy if the
    // session is shared — only touch the conf when the value must change
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") != Some("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else raw
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
