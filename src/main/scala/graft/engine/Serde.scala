package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.LongAccumulator

/** Permissive JSON serde — parity with the reference's circe serde
  * (serdes/circe.scala:14-23): a malformed payload decodes to null and the
  * record is droppable, with the error observable, instead of failing the
  * pipeline.
  *
  * `from_json` is exactly that contract: null on malformed input, codegen'd,
  * no UDF in the hot path. Error *counting* (the skip-25-then-fail policy of
  * ErrorHandlingExample.scala:32-47) lives in [[graft.engine.Errors]] on top
  * of these helpers.
  */
object Serde {

  /** Decode a JSON string column to a struct; malformed rows yield null
    * (circe `Try(...).toOption` parity, serdes/circe.scala:15-23).
    */
  def parseJson(c: Column, schema: StructType): Column = from_json(c, schema)

  /** Encode value columns to a JSON string (circe `asJson.noSpaces`,
    * serdes/circe.scala:14).
    */
  def toJson(cols: Column*): Column = to_json(struct(cols: _*))

  /** Corrupt-record predicate for a parsed struct column. Spark's
    * `from_json` never returns a null struct in permissive mode — malformed
    * input yields a struct whose fields are ALL null — so "decode failed" is
    * detected circe-style (serdes/circe.scala:15-23: a strict decoder fails
    * on malformed payloads and on documents carrying none of the expected
    * fields): every declared field null ⇒ corrupt.
    *
    * Deliberate trade-off (circe-strict parity, NOT pure "malformed JSON"
    * semantics): a well-formed payload whose declared fields are all
    * legitimately null/absent (e.g. `{"k": null}`) also classifies as
    * corrupt and counts against [[graft.engine.Errors.checkBudget]]'s
    * budget. Callers whose schemas allow fully-null records should add a
    * sentinel non-null field to the schema or pre-filter such payloads.
    */
  def isCorrupt(parsed: Column, schema: StructType): Column =
    schema.fields.map(f => parsed.getField(f.name).isNull).reduce(_ && _)

  /** Split a DataFrame into (parsed, corrupt) on a JSON column. The corrupt
    * side retains the raw payload for a dead-letter sink. Both sides are
    * filters over one parsed plan — at scale this stays a single scan when
    * both sides are consumed in one action.
    */
  def parseOrDeadLetter(df: DataFrame, jsonCol: String, schema: StructType,
                        parsedAs: String = "parsed"): (DataFrame, DataFrame) = {
    val withParsed = df.withColumn(parsedAs, from_json(col(jsonCol), schema))
    val bad = isCorrupt(col(parsedAs), schema)
    (withParsed.filter(!bad), withParsed.filter(bad).drop(parsedAs))
  }

  /** Encode value columns to Avro binary (single-record encoding). The
    * reference PROVISIONS a schema-registry + Avro path but never exercises
    * it (docker-compose.yml:30-41 runs the registry; the vulcan codec dep
    * is commented out, build.sbt:13) — this closes that declared surface
    * with a native expression over Spark's bundled Avro codec
    * ([[graft.functions.AvroSerde]]; the separate spark-avro function
    * module is absent in-image). Wire format: raw Avro record binary, NO
    * registry framing (the 5-byte magic+id header a Confluent registry
    * would add is transport config, not semantics).
    */
  def toAvro(cols: Column*): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.AvroSerde.ToAvroBinary(
      ColumnBridge.expression(struct(cols: _*))))
  }

  /** Avro writer schema (JSON) for a row struct of `cols` — the schema the
    * registry would store; derivable on both ends because the engine is
    * schema-first. Must match [[graft.functions.AvroSerde.ToAvroBinary]]'s
    * derived writer schema, so it uses the same converter call. */
  def avroSchemaOf(df: DataFrame, cols: String*): String =
    org.apache.spark.sql.graftbridge.AvroBridge
      .toAvroType(StructType(cols.map(c => df.schema(c))))
      .toString

  /** Decode an Avro binary column to a struct; malformed payloads yield a
    * NULL STRUCT instead of failing the job — the same permissive contract
    * as [[parseJson]] (E2). Note the asymmetry with JSON: `from_json`
    * nulls the FIELDS, this nulls the STRUCT, so [[isCorrupt]]'s
    * all-fields-null test covers both (a null struct's extracted fields
    * are null).
    */
  def parseAvro(c: Column, jsonFormatSchema: String): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.AvroSerde.FromAvroBinary(
      ColumnBridge.expression(c), jsonFormatSchema))
  }

  /** [[toAvro]] with the 5-byte registry wire header (magic 0x00 +
    * big-endian schema id): the bytes a Confluent-style registry consumer
    * expects on the wire. The id is config — what the registry assigned
    * the subject — since this engine is schema-first.
    */
  def toAvroFramed(schemaId: Int, cols: Column*): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.AvroSerde.ToAvroBinary(
      ColumnBridge.expression(struct(cols: _*)), frameSchemaId = Some(schemaId)))
  }

  /** [[parseAvro]] for registry-framed payloads: header absent, wrong
    * magic, or a FOREIGN schema id → NULL struct (the permissive contract;
    * a registry consumer would fail the id lookup the same way).
    */
  def parseAvroFramed(c: Column, jsonFormatSchema: String, schemaId: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.AvroSerde.FromAvroBinary(
      ColumnBridge.expression(c), jsonFormatSchema, frameSchemaId = Some(schemaId)))
  }

  /** Avro SCHEMA-EVOLUTION decode — the registry consumer's contract: the
    * bytes were written under `writerSchema` (what the frame id names);
    * the caller reads them under its own `readerSchema` via Avro schema
    * resolution (field reordering, defaulted new fields, dropped fields,
    * type promotion). Resolution failures and malformed payloads stay
    * permissive-NULL. `schemaId` optionally enforces the wire framing.
    */
  def parseAvroEvolved(c: Column, writerSchema: String, readerSchema: String,
                       schemaId: Option[Int] = None): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.AvroSerde.FromAvroBinary(
      ColumnBridge.expression(c), readerSchema, frameSchemaId = schemaId,
      writerSchemaJson = Some(writerSchema)))
  }

  /** Registry-MAP decode for a topic whose frames carry DIFFERENT schema
    * ids (producers mid-migration): each payload's header id selects its
    * writer schema from `writersById`, resolved per frame to the one
    * `readerSchema` the consumer declares — the Confluent consumer's
    * actual per-record contract ([[parseAvroFramed]]'s single expected id
    * is the settled-topic special case). Unregistered ids, bad framing,
    * and resolution failures stay permissive-NULL.
    */
  def parseAvroRegistry(c: Column, readerSchema: String,
                        writersById: Map[Int, String]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.AvroSerde.FromAvroRegistry(
      ColumnBridge.expression(c), readerSchema, writersById))
  }

  /** Count corrupt rows into an accumulator while passing good rows through —
    * used by the deserialization-error-handler parity path
    * (ErrorHandlingExample.scala:41-43). The accumulator is the distributed
    * analogue of the handler's per-instance counter. The row-level closure
    * runs only on the narrow post-parse filter; the parse itself stays in
    * codegen.
    */
  def countingParse(df: DataFrame, jsonCol: String, schema: StructType,
                    corrupt: LongAccumulator, parsedAs: String = "parsed"): DataFrame = {
    val parsed = df.withColumn(parsedAs, from_json(col(jsonCol), schema))
      .withColumn("__corrupt", isCorrupt(col(parsedAs), schema))
    parsed.filter { r =>
      val bad = r.getBoolean(r.fieldIndex("__corrupt"))
      if (bad) corrupt.add(1L)
      !bad
    }.drop("__corrupt")
  }
}
