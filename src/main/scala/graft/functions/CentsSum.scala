package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.9): an exact money sum with an integer
  * cents buffer — the Aggregator form of the reference's per-key
  * read-modify-write state fold (ProcessorApiExample.scala:60-67).
  *
  * `Math.round(v * 100)` equals the DECIMAL(18,2) cast of the same
  * data-generator-rounded double, so the result matches
  * `CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE)` bit-for-bit while the
  * merge stays a primitive long addition (associative, partition-order
  * independent — the property every distributed aggregate needs).
  */
object CentsSum extends Aggregator[Double, Long, Double] {
  override def zero: Long = 0L
  override def reduce(b: Long, a: Double): Long = b + Math.round(a * 100.0)
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
