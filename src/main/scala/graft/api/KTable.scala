package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changelog table — the Spark-native analogue of Kafka Streams'
  * `KTable[K, V]` (KTableExample.scala:52-62): the latest-value-per-key view
  * of a keyed stream. Constructed via `KStream.toTable` (the latest-per-key
  * reduction) or directly from a static dimension table. The key may be
  * composite (`keyCols`) — joins and projections always use ALL key columns
  * so a grouped view never silently degrades to a partial key.
  *
  * Semantics guard (SURVEY.md §7.5): `filter`/`mapValues` on a KTable operate
  * on the *view*, not on raw upserts — so they are applied AFTER the
  * reduction. Applying a filter before the reduction is the classic
  * changelog-semantics bug (a filtered-out newest upsert must *delete* the
  * key, not fall back to an older record). `KTableOpsSpec` tests exactly
  * that with shuffled upserts, mirroring KTableExample.scala:112.
  */
final case class KTable(df: DataFrame, keyCols: Seq[String]) {

  def keyCol: String = keyCols.head

  /** Predicate over the latest-per-key view (KTableExample.scala:59,61).
    * A key whose latest value fails the predicate disappears from the view.
    */
  def filter(p: Column): KTable = copy(df = df.filter(p))

  def filterNot(p: Column): KTable = copy(df = df.filter(!p))

  /** Project the view's value columns (KTableExample.scala:60,
    * AggregationsExample.scala:39 — the 2-arg (key, value) form is covered
    * because expressions may reference the key columns).
    */
  def mapValues(cols: (String, Column)*): KTable =
    copy(df = df.select(keyCols.map(col) ++ cols.map { case (n, c) => c.as(n) }: _*))

  /** Changelog → stream of updates (KTableExample.scala:62,
    * AggregationsExample.scala:40). In batch the final view IS the converged
    * update stream, so this is identity over the data with stream typing; in
    * streaming it corresponds to update output mode. The stream key is the
    * leading key column.
    */
  def toStream(tsCol: String): KStream = KStream(df, keyCols.head, tsCol)

  /** Table–table equi-join on the (possibly composite) primary key — key
    * columns are matched positionally against `other.keyCols`. Small
    * dimension tables should be broadcast (pass `hintBroadcast = true`) so
    * no shuffle of the fact side is needed; otherwise AQE decides.
    */
  def join(other: KTable, joinType: String = "inner", hintBroadcast: Boolean = false): DataFrame = {
    require(keyCols.length == other.keyCols.length,
      s"key arity mismatch: $keyCols vs ${other.keyCols}")
    val rhs = if (hintBroadcast) broadcast(other.df) else other.df
    val cond = keyCols.zip(other.keyCols)
      .map { case (l, r) => df(l) === other.df(r) }
      .reduce(_ && _)
    df.join(rhs, cond, joinType)
  }
}

object KTable {
  /** Single-key convenience constructor. */
  def apply(df: DataFrame, keyCol: String): KTable = KTable(df, Seq(keyCol))
}
