package graft

import graft.engine.{Errors, Serde}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Error-handling parity (SURVEY.md §2.6): permissive serde, skip-N-then-
  * fail deserialization budget, allowlisted sink guard, transient restarts.
  */
class ErrorsSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(StructField("k", LongType)))

  private def mixed(nGood: Int, nBad: Int) = {
    val good = (1 to nGood).map(i => (i.toLong, s"""{"k": $i}"""))
    val bad = (1 to nBad).map(i => (1000L + i, "not-json-" + i))
    (good ++ bad).toDF("id", "props")
  }

  test("permissive parse drops malformed rows and counts them (E1/E2)") {
    val acc = spark.sparkContext.longAccumulator("corrupt")
    val parsed = Errors.permissiveParse(mixed(8, 3), "props", schema, acc)
    assert(parsed.count() == 8)
    assert(acc.value == 3)
    Errors.checkBudget(acc, maxErrors = 25) // under budget: no throw
  }

  test("skip-25-then-fail threshold (ErrorHandlingExample.scala:41-43)") {
    val acc = spark.sparkContext.longAccumulator("corrupt")
    val parsed = Errors.permissiveParse(mixed(5, 26), "props", schema, acc)
    assert(parsed.count() == 5) // all bad rows skipped, pipeline continued
    intercept[Errors.TooManyCorruptRecords] {
      Errors.checkBudget(acc, maxErrors = 25)
    }
  }

  test("sink guard: CONTINUE on allowlisted failure, FAIL otherwise (E3)") {
    val df = mixed(2, 0)
    class TooLarge extends RuntimeException("record too large")
    val continued = Errors.guardedSink(df, _ => throw new TooLarge,
      continueOn = _.isInstanceOf[TooLarge])
    assert(!continued)
    intercept[IllegalStateException] {
      Errors.guardedSink(df, _ => throw new IllegalStateException("broker down"),
        continueOn = _.isInstanceOf[TooLarge])
    }
  }

  test("transient errors are retried, fatal ones propagate (E4)") {
    var attempts = 0
    val out = Errors.runWithRestarts(_.getMessage == "transient", maxRestarts = 3) {
      attempts += 1
      if (attempts < 3) throw new RuntimeException("transient") else "ok"
    }
    assert(out == "ok" && attempts == 3)
    intercept[RuntimeException] {
      Errors.runWithRestarts(_.getMessage == "transient", maxRestarts = 3) {
        throw new RuntimeException("fatal")
      }
    }
  }

  test("dead-letter split preserves raw payloads (E2)") {
    val (good, bad) = Serde.parseOrDeadLetter(mixed(4, 2), "props", schema)
    assert(good.count() == 4)
    assert(bad.select("props").as[String].collect().forall(_.startsWith("not-json")))
  }

  test("avro serde round-trips and nulls malformed payloads (E2 avro twin)") {
    val src = Seq((1L, "a", 1.5), (2L, "b", -2.25)).toDF("id", "s", "v")
    val avroSchema = Serde.avroSchemaOf(src, "s", "v")
    val coded = src.withColumn("wire", Serde.toAvro(col("s"), col("v")))
    val back = coded
      .withColumn("decoded", Serde.parseAvro(col("wire"), avroSchema))
      .select(col("id"), col("decoded.s").as("s"), col("decoded.v").as("v"))
      .as[(Long, String, Double)].collect().toSet
    assert(back == Set((1L, "a", 1.5), (2L, "b", -2.25)))

    // corrupt wire bytes: PERMISSIVE mode must yield a null struct (so the
    // JSON path's all-fields-null corrupt test applies), never throw
    val schema2 = StructType(Seq(StructField("s", org.apache.spark.sql.types.StringType),
      StructField("v", org.apache.spark.sql.types.DoubleType)))
    val corrupt = Seq((9L, Array[Byte](0x7f.toByte, 0x00, 0x13))).toDF("id", "wire")
      .withColumn("decoded", Serde.parseAvro(col("wire"), avroSchema))
    val row = corrupt.select(Serde.isCorrupt(col("decoded"), schema2).as("bad"))
      .as[Boolean].collect()
    assert(row.sameElements(Array(true)),
      "malformed avro must classify corrupt via the shared isCorrupt test")
  }

  test("registry-framed avro: matching id round-trips; foreign id, bad magic, unframed all reject") {
    val src = Seq((1L, "a", 1.5), (2L, "b", -2.25)).toDF("id", "s", "v")
    val avroSchema = Serde.avroSchemaOf(src, "s", "v")
    val framed = src.withColumn("wire", Serde.toAvroFramed(42, col("s"), col("v")))
    // wire layout: magic 0x00 + big-endian id + record body
    val bytes = framed.select("wire").as[Array[Byte]].head()
    assert(bytes.take(5).sameElements(Array[Byte](0, 0, 0, 0, 42)))
    val back = framed
      .withColumn("decoded", Serde.parseAvroFramed(col("wire"), avroSchema, 42))
      .select(col("id"), col("decoded.s").as("s"), col("decoded.v").as("v"))
      .as[(Long, String, Double)].collect().toSet
    assert(back == Set((1L, "a", 1.5), (2L, "b", -2.25)))
    // foreign schema id → null struct (permissive reject, no throw)
    assert(framed.select(Serde.parseAvroFramed(col("wire"), avroSchema, 43))
      .collect().forall(_.isNullAt(0)))
    // unframed payload decoded through the framed parser (magic byte is
    // the record body's first byte) → reject
    val raw = src.withColumn("wire", Serde.toAvro(col("s"), col("v")))
    assert(raw.select(Serde.parseAvroFramed(col("wire"), avroSchema, 42))
      .collect().forall(_.isNullAt(0)))
    // truncated header (< 5 bytes) → reject
    val short = Seq((9L, Array[Byte](0x00, 0x00))).toDF("id", "wire")
    assert(short.select(Serde.parseAvroFramed(col("wire"), avroSchema, 42))
      .collect().forall(_.isNullAt(0)))
    // and the framed parser on a MATCHING id ignores nothing: stripping the
    // header and decoding unframed agrees with the framed decode
    val stripped = framed.withColumn("body", expr("substring(wire, 6)"))
      .withColumn("decoded", Serde.parseAvro(col("body"), avroSchema))
      .select(col("decoded.s").as("s")).as[String].collect().toSet
    assert(stripped == Set("a", "b"))
  }

  test("registry-map avro: per-frame writer resolution by id; unregistered/malformed reject") {
    val src = Seq((1L, "a", 1.5), (2L, "b", -2.25)).toDF("id", "s", "v")
    // two writer generations: v1 = (s, v) under id 7, v2 = (v, s, t) under
    // id 8 (reordered + a new field) — frames alternate by id parity
    val w1 = Serde.avroSchemaOf(src.select(col("s"), col("v")), "s", "v")
    val v2cols = Seq(col("v"), col("s"), concat(col("s"), lit("!")).as("t"))
    val w2 = Serde.avroSchemaOf(src.select(v2cols: _*), "v", "s", "t")
    val reader =
      """{"type":"record","name":"topLevelRecord","fields":[
        |  {"name":"s","type":"string"},
        |  {"name":"v","type":"double"},
        |  {"name":"t","type":"string","default":"none"}]}""".stripMargin
    val wire = src.withColumn("wire",
      when(col("id") % 2 === 0, Serde.toAvroFramed(8, v2cols: _*))
        .otherwise(Serde.toAvroFramed(7, col("s"), col("v"))))
    val back = wire
      .withColumn("d", Serde.parseAvroRegistry(col("wire"), reader,
        Map(7 -> w1, 8 -> w2)))
      .select(col("id"), col("d.s"), col("d.v"), col("d.t"))
      .as[(Long, String, Double, String)].collect().toSet
    assert(back == Set((1L, "a", 1.5, "none"), (2L, "b", -2.25, "b!")),
      s"per-frame resolution failed: $back")
    // id 8 frames against a map that only registers id 7 → null (the
    // failed registry lookup), id 7 frames still decode
    val partial = wire
      .withColumn("d", Serde.parseAvroRegistry(col("wire"), reader, Map(7 -> w1)))
      .select(col("id"), col("d").isNull.as("rejected"))
      .as[(Long, Boolean)].collect().toMap
    assert(partial == Map(1L -> false, 2L -> true))
    // malformed: wrong magic and truncated header both reject permissively
    val junk = Seq((9L, Array[Byte](0x7f, 0, 0, 0, 7, 2)), (10L, Array[Byte](0, 0)))
      .toDF("id", "wire")
    assert(junk.select(Serde.parseAvroRegistry(col("wire"), reader, Map(7 -> w1)))
      .collect().forall(_.isNullAt(0)))
  }

  test("avro schema evolution: reader resolves against writer (defaults, drops, framing)") {
    val src = Seq((1L, "a", 1.5), (2L, "b", -2.25)).toDF("id", "s", "v")
    val writerSchema = Serde.avroSchemaOf(src, "s", "v")
    val wire = src.withColumn("wire", Serde.toAvro(col("s"), col("v")))
    // reader ADDS a defaulted field: decodes with the default filled in
    val readerAdd =
      """{"type":"record","name":"topLevelRecord","fields":[
        |  {"name":"s","type":"string"},
        |  {"name":"v","type":"double"},
        |  {"name":"tag","type":"string","default":"none"}]}""".stripMargin
    val withDefault = wire
      .withColumn("decoded", Serde.parseAvroEvolved(col("wire"), writerSchema, readerAdd))
      .select(col("decoded.s").as("s"), col("decoded.tag").as("tag"))
      .as[(String, String)].collect().toSet
    assert(withDefault == Set(("a", "none"), ("b", "none")))
    // reader DROPS a field: projection by resolution, remaining values exact
    val readerDrop =
      """{"type":"record","name":"topLevelRecord","fields":[
        |  {"name":"v","type":"double"}]}""".stripMargin
    val dropped = wire
      .withColumn("decoded", Serde.parseAvroEvolved(col("wire"), writerSchema, readerDrop))
      .select(col("decoded.v")).as[Double].collect().toSet
    assert(dropped == Set(1.5, -2.25))
    // an UNRESOLVABLE reader (new field, no default) is permissive-NULL
    val readerBad =
      """{"type":"record","name":"topLevelRecord","fields":[
        |  {"name":"s","type":"string"},
        |  {"name":"missing","type":"long"}]}""".stripMargin
    assert(wire.select(Serde.parseAvroEvolved(col("wire"), writerSchema, readerBad))
      .collect().forall(_.isNullAt(0)),
      "resolution failure must yield NULL, not throw")
    // evolution composes with the registry framing
    val framed = src.withColumn("wire", Serde.toAvroFramed(7, col("s"), col("v")))
    val framedEvolved = framed
      .withColumn("decoded",
        Serde.parseAvroEvolved(col("wire"), writerSchema, readerAdd, schemaId = Some(7)))
      .select(col("decoded.tag")).as[String].collect().toSet
    assert(framedEvolved == Set("none"))
  }
}
