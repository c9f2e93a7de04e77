package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.9): an exact money sum with an integer
  * cents buffer — the Aggregator form of the reference's per-key
  * read-modify-write state fold (ProcessorApiExample.scala:60-67).
  *
  * Cents are derived EXACTLY like Spark's double→DECIMAL(18,2) cast:
  * shortest decimal representation (`Double.toString`) rounded HALF_UP —
  * `Math.round(v*100)` would diverge on values like 8.115 whose binary
  * product rounds the other way. The merge stays a primitive long addition
  * (associative, partition-order independent — the property every
  * distributed aggregate needs), so the result matches
  * `CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE)` bit-for-bit.
  */
object CentsSum extends Aggregator[Double, Long, Double] {
  private[graft] def cents(v: Double): Long =
    new java.math.BigDecimal(java.lang.Double.toString(v))
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  override def zero: Long = 0L
  override def reduce(b: Long, a: Double): Long = b + cents(a)
  override def merge(b1: Long, b2: Long): Long = b1 + b2
  override def finish(r: Long): Double = r / 100.0
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** View over (key, value) tuples for use after a typed groupByKey. */
  val fromTuple: org.apache.spark.sql.TypedColumn[(Long, Double), Double] =
    new Aggregator[(Long, Double), Long, Double] {
      override def zero: Long = 0L
      override def reduce(b: Long, a: (Long, Double)): Long = CentsSum.reduce(b, a._2)
      override def merge(b1: Long, b2: Long): Long = b1 + b2
      override def finish(r: Long): Double = CentsSum.finish(r)
      override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }.toColumn
}
