package graft

import graft.engine.Serde
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import scala.jdk.CollectionConverters._

/** Generative properties for the Avro wire serde (the custom Catalyst
  * expressions in [[graft.functions.AvroSerde]]) — the point tests in
  * TopicWireSpec / the evolution oracles pin known-good frames; these
  * drive RANDOM values, RANDOM reader projections, and RANDOM byte
  * corruption through the same expressions:
  *  - encode∘decode = identity on a rich nested schema (nulls, unicode,
  *    empty strings/arrays, ±∞, nested struct);
  *  - schema RESOLUTION: any field subset in any order reads back exactly
  *    the projected originals (the registry consumer's contract);
  *  - permissiveness: truncated or bit-flipped payloads NEVER fail the
  *    task — each row decodes or nulls, the query always completes.
  * Fixed seeds (deterministic CI), PropertySpec's convention.
  */
class SerdePropsSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("flags", ArrayType(LongType, containsNull = false), nullable = true),
    StructField("meta", StructType(Seq(
      StructField("k", StringType, nullable = true),
      StructField("n", IntegerType, nullable = true))), nullable = true)))

  private val valueCols = Seq("name", "score", "flags", "meta")

  private val stringGen: Gen[String] = Gen.listOfN(8,
    Gen.oneOf(('a' to 'z').map(_.toString) ++
      Seq("Ø", "λ", "中", "🙂", " ", "\""))).map(_.mkString)
      .flatMap(s => Gen.oneOf(s, "", s.take(3)))

  private def opt[T](g: Gen[T]): Gen[Option[T]] =
    Gen.frequency(4 -> g.map(Some(_)), 1 -> Gen.const(None))

  private val rowGen: Gen[Row] = for {
    name <- opt(stringGen)
    score <- opt(Gen.oneOf(Gen.choose(-1e12, 1e12),
      Gen.oneOf(0.0, -0.0, Double.PositiveInfinity, Double.NegativeInfinity)))
    flags <- opt(Gen.listOfN(3, Gen.choose(Long.MinValue, Long.MaxValue))
      .flatMap(l => Gen.oneOf(l, Nil)))
    meta <- opt(for { k <- opt(stringGen); n <- opt(Gen.choose(-1000, 1000)) }
      yield Row(k.orNull, n.map(Int.box).orNull))
  } yield Row(0L, name.orNull, score.map(Double.box).orNull,
    flags.map(_.toSeq).orNull, meta.orNull)

  private def randomFrame(seed: Long, n: Int = 40): DataFrame = {
    val rows = Gen.listOfN(n, rowGen)(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"generator exhausted at seed $seed"))
      .zipWithIndex.map { case (r, i) => Row.fromSeq(i.toLong +: r.toSeq.tail) }
    spark.createDataFrame(rows.asJava, schema).repartition(4)
  }

  /** Collect (id, projected-value-list) pairs with a stable rendering so
    * Row/array/struct equality is structural. */
  private def snapshot(df: DataFrame, cols: Seq[String]): Map[Long, String] =
    df.select(col("id") +: cols.map(col): _*).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail.mkString("|")).toMap

  test("Avro round-trip is the identity on random nested rows") {
    (1 to 5).foreach { i =>
      val df = randomFrame(100L + i)
      val writerSchema = Serde.avroSchemaOf(df, valueCols: _*)
      val back = df.select(col("id"),
          Serde.toAvro(valueCols.map(col): _*).as("bin"))
        .select(col("id"), Serde.parseAvro(col("bin"), writerSchema).as("v"))
        .select(col("id") +: valueCols.map(c => col(s"v.$c").as(c)): _*)
      assert(snapshot(back, valueCols) == snapshot(df, valueCols), s"seed ${100L + i}")
    }
  }

  test("schema resolution reads back any field subset in any order") {
    (1 to 5).foreach { i =>
      val seed = 200L + i
      val readerCols = Gen.someOf(valueCols).map(_.toList)
        .flatMap(s => Gen.oneOf(s.permutations.toSeq))
        .apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail(s"generator exhausted at seed $seed"))
      if (readerCols.nonEmpty) {
        val df = randomFrame(seed)
        val writerSchema = Serde.avroSchemaOf(df, valueCols: _*)
        val readerSchema = Serde.avroSchemaOf(df, readerCols: _*)
        val back = df.select(col("id"),
            Serde.toAvro(valueCols.map(col): _*).as("bin"))
          .select(col("id"),
            Serde.parseAvroEvolved(col("bin"), writerSchema, readerSchema).as("v"))
          .select(col("id") +: readerCols.map(c => col(s"v.$c").as(c)): _*)
        assert(snapshot(back, readerCols) == snapshot(df, readerCols),
          s"seed $seed reader ${readerCols.mkString(",")}")
      }
    }
  }

  test("corrupted payloads decode-or-null but never fail the query") {
    val df = randomFrame(300L)
    val writerSchema = Serde.avroSchemaOf(df, valueCols: _*)
    val bin = df.select(col("id"), Serde.toAvro(valueCols.map(col): _*).as("bin"))
    // three mutation families driven from the row id (deterministic):
    // truncate to id%len bytes, flip one byte, or blank the payload
    val mutated = bin.select(col("id"), expr(
      """CASE
         |  WHEN id % 3 = 0 THEN substring(bin, 1, CAST(id % greatest(length(bin), 1) AS INT))
         |  WHEN id % 3 = 1 THEN concat(
         |    substring(bin, 1, CAST(id % greatest(length(bin), 1) AS INT)),
         |    X'FF',
         |    substring(bin, CAST(id % greatest(length(bin), 1) AS INT) + 2))
         |  ELSE CAST('' AS BINARY)
         |END""".stripMargin).as("bin"))
    val decoded = mutated
      .select(col("id"), Serde.parseAvro(col("bin"), writerSchema).as("v"))
      .collect() // must not throw — the permissive contract
    assert(decoded.length == df.count(), "every row survives, decoded or null")
    val blanked = decoded.filter(_.getLong(0) % 3 == 2)
    assert(blanked.nonEmpty && blanked.forall(_.isNullAt(1)),
      "an empty payload is undecodable for this schema -> NULL struct")
  }

  test("framed decode rejects wrong ids and short frames, accepts its own") {
    val df = randomFrame(400L)
    val writerSchema = Serde.avroSchemaOf(df, valueCols: _*)
    val framed = df.select(col("id"),
      Serde.toAvroFramed(7, valueCols.map(col): _*).as("bin"))
    val own = framed.select(Serde.parseAvroFramed(col("bin"), writerSchema, 7).as("v"))
    assert(own.filter(col("v").isNull).count() == 0, "own id decodes")
    val foreign = framed.select(Serde.parseAvroFramed(col("bin"), writerSchema, 8).as("v"))
    assert(foreign.filter(col("v").isNotNull).count() == 0, "foreign id -> NULL")
    val short = framed.select(
      Serde.parseAvroFramed(expr("substring(bin, 1, 4)"), writerSchema, 7).as("v"))
    assert(short.filter(col("v").isNotNull).count() == 0, "short frame -> NULL")
  }
}
