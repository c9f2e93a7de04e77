package org.apache.spark.sql.graftbridge

import org.apache.avro.Schema
import org.apache.spark.sql.avro.{AvroDeserializer, AvroSerializer, SchemaConverters}
import org.apache.spark.sql.types.DataType

/** Access shim for Spark's bundled Avro codec (`private[sql]` in Spark 4,
  * like the Column converters — see [[ColumnBridge]]). The spark-avro
  * FUNCTION module is absent in-image, but the codec layer ships inside
  * spark-sql; graft's native Avro expressions
  * ([[graft.functions.AvroSerde]]) build on it through these factories.
  * Factories take only serializable inputs (Catalyst DataType, schema
  * JSON) so caller expressions can construct per-task codec state in
  * `@transient lazy` fields.
  */
object AvroBridge {

  /** Catalyst struct type → Avro record schema (non-null root). */
  def toAvroType(catalystType: DataType): Schema =
    SchemaConverters.toAvroType(catalystType, false, "topLevelRecord", "")

  /** Avro schema JSON → Catalyst type (the reader-side struct shape). */
  def toSqlType(jsonFormatSchema: String): DataType =
    SchemaConverters.toSqlType(new Schema.Parser().parse(jsonFormatSchema)).dataType

  /** InternalRow → Avro generic record. */
  def serializer(catalystType: DataType, avroType: Schema): Any => Any = {
    val s = new AvroSerializer(catalystType, avroType, false)
    (row: Any) => s.serialize(row)
  }

  /** Avro generic record → Option[InternalRow] (None on incompatible
    * payloads; "CORRECTED" datetime rebase — no pre-Gregorian data). */
  def deserializer(avroType: Schema, catalystType: DataType): Any => Option[Any] = {
    val d = new AvroDeserializer(avroType, catalystType, "CORRECTED", false, "_", -1)
    (rec: Any) => d.deserialize(rec)
  }
}
