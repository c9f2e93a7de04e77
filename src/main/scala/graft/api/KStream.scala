package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed record stream — the Spark-native analogue of Kafka Streams'
  * `KStream[K, V]` (reference: BasicStreams.scala:52, JoinsExample.scala:35-39).
  *
  * A record is a row; `keyCol` names the partitioning key and `tsCol` the
  * event-time column. All remaining columns are the "value". The same facade
  * works over batch *and* Structured-Streaming DataFrames because every
  * combinator is a declarative plan transformation — Catalyst supplies the
  * optimization (predicate pushdown, column pruning, join selection) that the
  * reference topology never had (SURVEY.md §4.1).
  *
  * Scale notes:
  *  - value-only ops (`filter`, `mapValues`, `flatMapValues`, `peek`) never
  *    touch the key, so no shuffle is implied — exactly the Kafka Streams
  *    contract that `mapValues` preserves partitioning.
  *  - `selectKey` changes the key; the *next* stateful op (groupByKey / join)
  *    introduces the hash Exchange, exactly like Kafka Streams inserting a
  *    repartition topic.
  */
final case class KStream(df: DataFrame, keyCol: String, tsCol: String) {

  private def valueCols: Seq[String] = df.columns.toSeq.filterNot(_ == keyCol)

  private def keyTs: Seq[Column] =
    if (tsCol == keyCol) Seq(col(keyCol)) else Seq(col(keyCol), col(tsCol))

  /** Keep records matching the predicate (BasicStreams.scala:56,58). */
  def filter(p: Column): KStream = copy(df = df.filter(p))

  def filterNot(p: Column): KStream = copy(df = df.filter(!p))

  /** Value-only projection; key and event time are preserved so downstream
    * partitioning is untouched (BasicStreams.scala:57). Each `(name, expr)`
    * becomes a value column; the key/ts columns ride along unchanged.
    */
  def mapValues(cols: (String, Column)*): KStream =
    copy(df = df.select(keyTs ++ cols.map { case (n, c) => c.as(n) }: _*))

  /** Add/replace one value column, keep the rest (common mapValues shape). */
  def withValue(name: String, c: Column): KStream =
    copy(df = df.withColumn(name, c))

  /** Re-key the stream (Kafka Streams `selectKey`); the next stateful op
    * will shuffle on the new key — Catalyst inserts the Exchange.
    */
  def selectKey(newKey: Column, as: String = "key"): KStream =
    copy(df = df.withColumn(as, newKey), keyCol = as)

  /** One-to-many value expansion (Kafka Streams `flatMapValues`) — `explode`
    * keeps this inside WholeStageCodegen; no shuffle.
    */
  def flatMapValues(name: String, arr: Column): KStream =
    copy(df = df.select(keyTs :+ explode(arr).as(name): _*))

  /** Union of two streams with identical schemas (Kafka Streams `merge`). */
  def merge(other: KStream): KStream =
    copy(df = df.unionByName(other.df))

  /** Split into sub-streams by predicate (Kafka Streams `split`/`branch`).
    * FIRST-match routing, like the reference: a record lands in the first
    * branch whose predicate matches and in no later branch (overlapping
    * predicates would otherwise double-count downstream; a null earlier
    * predicate counts as not-matched). Each branch is a filter over the
    * same parent plan; Spark reuses the scan when they materialize
    * together.
    */
  def branch(predicates: Column*): Seq[KStream] =
    predicates.zipWithIndex.map { case (p, i) =>
      val notEarlier = predicates.take(i)
        .foldLeft(lit(true))((acc, q) => acc && !coalesce(q, lit(false)))
      copy(df = df.filter(notEarlier && p))
    }

  /** Side-effecting observation (Kafka Streams `peek`,
    * BasicStreams.scala:55,59). In batch this is a no-op pass-through (the
    * oracle checks converged results); for debugging, flip `log=true` to emit
    * a bounded sample to the driver log — never a full collect.
    */
  def peek(tag: String, log: Boolean = false): KStream = {
    // eager debug sample — batch only (a streaming plan cannot be collected
    // at topology-definition time; use the console sink to observe streams)
    if (log && !df.isStreaming)
      df.limit(20).collect().foreach(r => println(s"[peek:$tag] $r"))
    this
  }

  /** Group by the current key (AggregationsExample.scala:35). The key is
    * unchanged, so like Kafka Streams no *extra* repartition beyond the one
    * hash Exchange the aggregation itself requires (with map-side partial
    * aggregation before it).
    */
  def groupByKey: KGroupedStream = KGroupedStream(df, Seq(keyCol))

  def groupBy(cols: String*): KGroupedStream = KGroupedStream(df, cols)

  /** Changelog view: latest record per key (the KStream→KTable reduction,
    * KTableExample.scala:52-56). `orderBy` breaks ties deterministically —
    * pass (ts, uniqueId). Implemented as a single hash aggregation with
    * `max_by(struct(values), struct(order))` — one shuffle with map-side
    * combine, which beats a window `row_number` (shuffle + full sort) and
    * scales to arbitrarily many keys.
    */
  def toTable(orderBy: Seq[String]): KTable = {
    val values = valueCols
    val packed = df
      .groupBy(col(keyCol))
      .agg(max_by(struct(values.map(col): _*), struct(orderBy.map(col): _*)).as("__latest"))
    val out = packed.select(col(keyCol) +: values.map(c => col(s"__latest.`$c`").as(c)): _*)
    KTable(out, Seq(keyCol))
  }

  /** Stream–stream interval equi-join (JoinsExample.scala:47-56): match
    * records with equal keys whose event times differ by at most `tolerance`
    * (e.g. "5 seconds"). Batch form here; the streaming twin adds
    * `withWatermark` on both sides (graft.streaming). Output columns are
    * prefixed `l_`/`r_` only where names collide.
    *
    * Scale: an equi-join on the key plus a range residual — Catalyst plans a
    * shuffled hash/sort-merge join on the equality key, the time predicate is
    * a cheap post-filter on matched pairs; state stays bounded by the key
    * cardinality, not the window.
    */
  def joinInterval(
      other: KStream,
      tolerance: String,
      joinType: String = "inner",
      leftPrefix: String = "l_",
      rightPrefix: String = "r_"
  ): DataFrame = {
    val l = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, leftPrefix + c))
    val r = other.df.columns.foldLeft(other.df)((d, c) => d.withColumnRenamed(c, rightPrefix + c))
    val lk = col(leftPrefix + keyCol); val rk = col(rightPrefix + other.keyCol)
    val lt = col(leftPrefix + tsCol); val rt = col(rightPrefix + other.tsCol)
    l.join(
      r,
      lk === rk &&
        rt >= lt - expr(s"INTERVAL $tolerance") &&
        rt <= lt + expr(s"INTERVAL $tolerance"),
      joinType
    )
  }

  /** As-of join (SURVEY.md J3): for each left record, the single most
    * recent right record with the same key whose event time is at or before
    * the left's, within `lookback`. Composed from built-ins (preference
    * order (a)): a key-equi range join + the same single-shuffle `max_by`
    * reduction the KTable view uses — no custom physical operator needed.
    * Inner semantics: left records with no match are dropped.
    *
    * `leftId` must name a UNIQUE left column: the reduction groups on the
    * left row (all its columns), and the unique id guarantees two otherwise
    * identical left records cannot collapse into one output row. Left value
    * columns must be groupable types (no MapType).
    */
  def asOfJoin(other: KStream, lookback: String, leftId: String, rightId: String,
               leftPrefix: String = "l_", rightPrefix: String = "r_"): DataFrame = {
    require(df.columns.contains(leftId), s"leftId '$leftId' not in ${df.columns.toSeq}")
    val l = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, leftPrefix + c))
    val r = other.df.columns.foldLeft(other.df)((d, c) => d.withColumnRenamed(c, rightPrefix + c))
    val lt = col(leftPrefix + tsCol); val rt = col(rightPrefix + other.tsCol)
    val joined = l.join(r,
      col(leftPrefix + keyCol) === col(rightPrefix + other.keyCol) &&
        rt <= lt && rt >= lt - expr(s"INTERVAL $lookback"))
    val lCols = df.columns.map(leftPrefix + _).toSeq
    val rCols = other.df.columns.map(rightPrefix + _).toSeq
    joined.groupBy(lCols.map(col): _*)
      .agg(max_by(struct(rCols.map(col): _*),
        struct(rt, col(rightPrefix + rightId))).as("__r"))
      .select(lCols.map(col) ++ rCols.map(c => col(s"__r.`$c`").as(c)): _*)
  }

  /** Stream–table enrichment join (JoinsExample.scala:41-45 + the declared
    * `UserCombinedOrder` step, completed per SURVEY.md §2.3 J2). The table is
    * a latest-per-key view; small tables should be broadcast by the caller
    * (`broadcast(table.df)`) or left to AQE.
    */
  def joinTable(table: KTable, joinType: String = "inner"): DataFrame = {
    // a composite-key table joined on keyCols.head alone would silently be
    // a partial-key join (each stream row multiplied by every co-keyed
    // table row) — the KTable invariant is ALL key columns, always
    require(table.keyCols.length == 1,
      s"stream key is single-column; composite table key ${table.keyCols} " +
        "cannot be enrichment-joined — use KTable.join for table-table joins")
    df.join(table.df, df(keyCol) === table.df(table.keyCol), joinType)
  }
}

/** Grouped stream — Kafka Streams `KGroupedStream` (AggregationsExample.scala:35). */
final case class KGroupedStream(df: DataFrame, keys: Seq[String]) {

  /** Continuously-folded aggregate (AggregationsExample.scala:36-38). In
    * batch the converged result is the plain aggregate; in streaming the same
    * plan runs in update mode. Catalyst plans partial (map-side) + final
    * hash aggregation — the distributed form of the reference's per-record
    * state-store fold.
    */
  def aggregate(aggs: Column*): KTable =
    KTable(df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*), keys)

  def count(as: String = "n"): KTable =
    KTable(df.groupBy(keys.map(col): _*).agg(org.apache.spark.sql.functions.count(lit(1)).as(as)), keys)

  /** Keep the extreme record per group (Kafka Streams `reduce` with a
    * pick-one combiner) — same single-shuffle `max_by` machinery as
    * `KStream.toTable`.
    */
  def reduceLatest(orderBy: Seq[String]): KTable = {
    val values = df.columns.toSeq.filterNot(keys.contains)
    val packed = df
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(values.map(col): _*), struct(orderBy.map(col): _*)).as("__latest"))
    KTable(packed.select(keys.map(col) ++ values.map(c => col(s"__latest.`$c`").as(c)): _*), keys)
  }

  /** Tumbling event-time window aggregation (gap capability, SURVEY.md §2.5
    * A5/W6): `window(ts, width)` + keys. Streaming twin adds a watermark.
    */
  def windowedAggregate(tsCol: String, width: String, aggs: Column*): DataFrame =
    df.groupBy(window(col(tsCol), width) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .drop("window")
}
