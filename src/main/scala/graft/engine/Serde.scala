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

  /** Split a DataFrame into (parsed, corrupt) on a JSON column. The corrupt
    * side retains the raw payload for a dead-letter sink. Both sides are
    * filters over one parsed plan — Catalyst collapses the double parse via
    * common subexpression reuse within a stage; at scale this stays a single
    * scan when both sides are consumed in one action.
    */
  def parseOrDeadLetter(df: DataFrame, jsonCol: String, schema: StructType,
                        parsedAs: String = "parsed"): (DataFrame, DataFrame) = {
    val withParsed = df.withColumn(parsedAs, from_json(col(jsonCol), schema))
    (withParsed.filter(col(parsedAs).isNotNull),
     withParsed.filter(col(parsedAs).isNull).drop(parsedAs))
  }

  /** Count corrupt rows into an accumulator while passing good rows through —
    * used by the deserialization-error-handler parity path
    * (ErrorHandlingExample.scala:41-43). The accumulator is the distributed
    * analogue of the handler's per-instance counter.
    */
  def countingParse(df: DataFrame, jsonCol: String, schema: StructType,
                    corrupt: LongAccumulator, parsedAs: String = "parsed"): DataFrame = {
    val parsed = df.withColumn(parsedAs, from_json(col(jsonCol), schema))
    val counted = parsed.filter { r =>
      val bad = r.isNullAt(r.fieldIndex(parsedAs))
      if (bad) corrupt.add(1L)
      !bad
    }
    counted
  }
}
