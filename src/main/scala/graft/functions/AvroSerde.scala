package graft.functions

import java.io.ByteArrayOutputStream

import scala.util.control.NonFatal

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.AvroBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Avro single-record binary serde as native Catalyst expressions.
  *
  * Spark 4.1's image bundles the whole Avro CODEC layer in spark-sql
  * (serializer/deserializer/schema converters) but not the separate
  * spark-avro module that registers the `to_avro`/`from_avro` SQL
  * functions — calling those throws
  * `AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE`. These two expressions
  * re-create the function layer over the bundled codec (via
  * [[org.apache.spark.sql.graftbridge.AvroBridge]]; same construction as
  * the upstream module: per-task transient writer/encoder state,
  * `addReferenceObj` + boxed-eval codegen so the surrounding stage stays
  * in whole-stage codegen).
  *
  * Closes the reference's declared-but-unused schema-registry serde path
  * (docker-compose.yml:30-41; vulcan codec commented out, build.sbt:13).
  * Wire format is the raw Avro record binary — registry framing (the
  * 5-byte magic/schema-id prefix) is transport config, not semantics.
  */
object AvroSerde {

  /** struct → Avro record bytes. Writer schema derived from the input type
    * (non-null root; a null struct input yields SQL NULL upstream via the
    * standard null-propagating unary eval).
    *
    * `frameSchemaId`: when set, each payload is prefixed with the 5-byte
    * registry wire header — magic `0x00` + the schema id as a big-endian
    * 32-bit int — so the bytes are exactly what a registry-framed consumer
    * expects (the transport the reference provisions via its
    * schema-registry container, docker-compose.yml:30-41). The id is
    * caller-assigned: this engine is schema-first, so the id is config
    * (what the registry would have returned at subject registration),
    * not a lookup.
    */
  case class ToAvroBinary(child: Expression, frameSchemaId: Option[Int] = None)
      extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_to_avro"

    @transient private lazy val avroType: Schema =
      AvroBridge.toAvroType(child.dataType)
    @transient private lazy val serialize: Any => Any =
      AvroBridge.serializer(child.dataType, avroType)
    @transient private lazy val writer = new GenericDatumWriter[Any](avroType)
    @transient private lazy val out = new ByteArrayOutputStream()
    @transient private var encoder: BinaryEncoder = _

    override def nullSafeEval(input: Any): Any = {
      out.reset()
      frameSchemaId.foreach { id =>
        out.write(0) // registry wire-format magic byte
        out.write(id >>> 24); out.write(id >>> 16); out.write(id >>> 8); out.write(id)
      }
      encoder = EncoderFactory.get().directBinaryEncoder(out, encoder)
      writer.write(serialize(input), encoder)
      encoder.flush()
      out.toByteArray
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val expr = ctx.addReferenceObj("this", this)
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = (byte[]) $expr.nullSafeEval($input);")
    }

    override protected def withNewChildInternal(newChild: Expression): ToAvroBinary =
      copy(child = newChild)
  }

  /** Avro record bytes → struct; PERMISSIVE: any decode failure (bad
    * varint, truncated record, schema mismatch) yields a NULL STRUCT
    * instead of failing the task — the reference's tolerant-serde
    * contract (serdes/circe.scala:15-23) on the binary path.
    *
    * `frameSchemaId`: when set, the payload must carry the 5-byte registry
    * wire header (magic `0x00` + big-endian schema id) and the id must
    * equal the expected one; a missing header, wrong magic, or foreign id
    * is an UNDECODABLE payload under the same permissive contract (a
    * registry consumer would fail the id lookup) — NULL struct, task
    * survives. The record body is then decoded from offset 5.
    *
    * `writerSchemaJson`: when set, bytes are decoded under Avro SCHEMA
    * RESOLUTION — read with the writer's schema, resolved to
    * `jsonFormatSchema` as the READER schema (field reordering, defaulted
    * new fields, dropped fields, type promotion) — the registry
    * consumer's actual evolution contract, where the id identifies the
    * WRITER schema and the consumer supplies its own reader. Unset, the
    * two schemas are the same (no evolution).
    */
  case class FromAvroBinary(child: Expression, jsonFormatSchema: String,
      frameSchemaId: Option[Int] = None,
      writerSchemaJson: Option[String] = None)
      extends UnaryExpression {
    override def nullable: Boolean = true
    override def prettyName: String = "graft_from_avro"

    override lazy val dataType: DataType = AvroBridge.toSqlType(jsonFormatSchema)

    @transient private lazy val expectedSchema: Schema =
      new Schema.Parser().parse(jsonFormatSchema)
    @transient private lazy val writerSchema: Schema =
      writerSchemaJson.map(new Schema.Parser().parse(_)).getOrElse(expectedSchema)
    @transient private lazy val deserialize: Any => Option[Any] =
      AvroBridge.deserializer(expectedSchema, dataType)
    @transient private lazy val reader =
      new GenericDatumReader[Any](writerSchema, expectedSchema)
    @transient private var decoder: BinaryDecoder = _
    @transient private var record: Any = _

    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val off = frameSchemaId match {
        case None => 0
        case Some(id) =>
          val ok = bytes.length >= 5 && bytes(0) == 0 &&
            (((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
              ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)) == id
          if (!ok) return null
          5
      }
      try {
        decoder = DecoderFactory.get().binaryDecoder(bytes, off, bytes.length - off, decoder)
        record = reader.read(record, decoder)
        deserialize(record).orNull
      } catch { case NonFatal(_) => null }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val expr = ctx.addReferenceObj("this", this)
      val obj = ctx.freshName("avroDecoded")
      nullSafeCodeGen(ctx, ev, input => s"""
        |Object $obj = $expr.nullSafeEval($input);
        |if ($obj == null) { ${ev.isNull} = true; } else {
        |  ${ev.value} = (${CodeGenerator.boxedType(dataType)}) $obj;
        |}""".stripMargin)
    }

    override protected def withNewChildInternal(newChild: Expression): FromAvroBinary =
      copy(child = newChild)
  }

  /** Registry-MAP decode — the real consumer contract for a topic whose
    * frames carry DIFFERENT schema ids (a producer fleet mid-migration):
    * each payload's 5-byte header id selects its own WRITER schema from
    * `writersById`, and the record resolves to the one `readerSchemaJson`
    * the consumer declares (Avro schema resolution per frame). This is
    * what a Confluent-style `KafkaAvroDeserializer` does on every record —
    * [[FromAvroBinary]]'s single expected id is the special case of a
    * settled topic. Permissive throughout: missing/foreign header id
    * (not in the map — the registry lookup a real consumer would fail),
    * truncated body, or resolution failure → NULL struct, task survives.
    */
  case class FromAvroRegistry(child: Expression, readerSchemaJson: String,
      writersById: Map[Int, String])
      extends UnaryExpression {
    override def nullable: Boolean = true
    override def prettyName: String = "graft_from_avro_registry"

    override lazy val dataType: DataType = AvroBridge.toSqlType(readerSchemaJson)

    @transient private lazy val readerSchema: Schema =
      new Schema.Parser().parse(readerSchemaJson)
    @transient private lazy val deserialize: Any => Option[Any] =
      AvroBridge.deserializer(readerSchema, dataType)
    @transient private lazy val readers: Map[Int, GenericDatumReader[Any]] =
      writersById.map { case (id, ws) =>
        id -> new GenericDatumReader[Any](
          new Schema.Parser().parse(ws), readerSchema)
      }
    @transient private var decoder: BinaryDecoder = _

    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      if (bytes.length < 5 || bytes(0) != 0) return null
      val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
        ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
      readers.get(id) match {
        case None => null // unregistered id: the failed registry lookup
        case Some(reader) =>
          try {
            decoder = DecoderFactory.get()
              .binaryDecoder(bytes, 5, bytes.length - 5, decoder)
            // no record reuse: frames alternate writer schemas, and a
            // reuse object from another writer's shape must not leak
            deserialize(reader.read(null, decoder)).orNull
          } catch { case NonFatal(_) => null }
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val expr = ctx.addReferenceObj("this", this)
      val obj = ctx.freshName("avroDecoded")
      nullSafeCodeGen(ctx, ev, input => s"""
        |Object $obj = $expr.nullSafeEval($input);
        |if ($obj == null) { ${ev.isNull} = true; } else {
        |  ${ev.value} = (${CodeGenerator.boxedType(dataType)}) $obj;
        |}""".stripMargin)
    }

    override protected def withNewChildInternal(newChild: Expression): FromAvroRegistry =
      copy(child = newChild)
  }
}
