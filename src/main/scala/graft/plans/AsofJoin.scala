package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, Ascending}
import org.apache.spark.sql.catalyst.expressions.{And, IntegralDivide, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.IntervalUtils
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Native as-of join: the whole-operator Catalyst extension tier.
  *
  * The reference's as-of semantics (each left event matched to the most
  * recent right event at-or-before it, per key, within a lookback — the
  * kdb/pandas `merge_asof` shape; composed form in
  * `graft.api.KStream.asOfJoin`, reference join semantics at
  * `JoinsExample.scala`) have no single Spark operator: the DataFrame
  * composition is a range join that materializes every candidate pair and
  * then reduces with `max_by`. Correct, but the intermediate is
  * O(matches-in-window) — at 100 TB with busy keys the pair blow-up is the
  * bottleneck, not the shuffle.
  *
  * This is the case the custom-plan ladder exists for: a logical node
  * ([[AsofJoinNode]]), a planner strategy ([[AsofJoinStrategy]]) and a
  * physical sort-merge operator ([[AsofJoinExec]]) that declares
  * `requiredChildDistribution` = clustered-by-key on both sides and
  * `requiredChildOrdering` = (key, time) — so EnsureRequirements plans
  * exactly ONE co-partitioned exchange per side (AQE-compatible, same as
  * SortMergeJoinExec) — and then emits matches in a single forward merge
  * pass per partition: O(|L| + |R|) with ONE buffered right row, never the
  * candidate-pair intermediate, no per-group heap, no window function.
  *
  * Scale: shuffle volume is the two inputs exactly once; memory per task is
  * one row regardless of key skew (a hot key costs time, not space); output
  * preserves the left side's partitioning and ordering, so a downstream
  * per-key aggregation reuses the exchange.
  */
object AsofJoin {

  /** Left/inner as-of join of `left` to `right`.
    *
    * @param keys        equi-key pairs (leftCol, rightCol)
    * @param leftTime    left event-time column (timestamp or long)
    * @param rightTime   right event-time column; the match is the right row
    *                    with the greatest `rightTime <= leftTime`
    * @param rightTiebreak additional right columns breaking equal-time ties
    *                    (greatest wins — mirrors `ORDER BY t DESC, id DESC
    *                    LIMIT 1`)
    * @param tolerance   optional window ("1 hour"): candidates further than
    *                    this from the left time are discarded (applied per
    *                    side for `nearest`)
    * @param inner       true drops unmatched left rows; false null-extends
    * @param direction   `backward` (default — most recent at-or-before),
    *                    `forward` (earliest at-or-after; ties to SMALLEST
    *                    tiebreak), or `nearest` (closer of the two; equal
    *                    distance prefers backward) — pandas `merge_asof`
    *                    parity
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String,
      rightTime: String,
      rightTiebreak: Seq[String] = Nil,
      tolerance: Option[String] = None,
      inner: Boolean = false,
      direction: String = "backward"): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsofJoin)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsofJoin
    }
    val lplan = PlanBridge.analyzed(left)
    val rplan = PlanBridge.analyzed(right)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(", ")}"))
    val tolMicros = tolerance.map { s =>
      val iv = IntervalUtils.fromIntervalString(s)
      require(iv.months == 0, s"calendar-month tolerance is ambiguous: $s")
      iv.days * 86400000000L + iv.microseconds
    }
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"as-of direction must be backward|forward|nearest, got: $direction")
    val node = AsofJoinNode(
      lplan, rplan,
      keys.map(k => attr(lplan, k._1)), keys.map(k => attr(rplan, k._2)),
      attr(lplan, leftTime), attr(rplan, rightTime),
      rightTiebreak.map(attr(rplan, _)),
      tolMicros, inner, direction)
    PlanBridge.ofRows(spark, node)
  }

  /** [[join]] with LEFT-SIDE TIME-BAND SPLITTING — the escape hatch for a
    * key too hot even for the native operator's linear merge (SCALE.md
    * "as-of hot-key regime": the plain merge is flat to ~300k events on
    * one key; this exists for the 10⁹-events-one-key regime where a single
    * task's O(m+n) pass would serialize minutes of wall time).
    *
    * Mechanics: lefts get a band id `floor(time / bandWidth)` APPENDED to
    * the equi-key, so one hot key becomes (time-range ÷ bandWidth) sub-keys
    * that hash to different reducers; rights are replicated into every band
    * whose lefts could reference them — the direction's candidate window
    * `[rt − after, rt + before]` mapped to band ids (backward: a right
    * serves lefts in `[rt, rt+τ]`; forward `[rt−τ, rt]`; nearest both).
    * Each (key, band) group then contains EVERY candidate its lefts need,
    * so the per-band merge answers are exactly the unsplit answers — and
    * since bands partition the lefts, no output duplicates or drops
    * (spec-pinned equality in AsofJoinSpec). This is the as-of analogue of
    * [[graft.engine.Skew.saltedJoin]]: placement changes, semantics never.
    *
    * Cost: right side shuffles ~`1 + ceil(τ/bandWidth)`× (backward/forward;
    * double for nearest) — size bandWidth a few multiples of τ to keep
    * replication near 1×. Requires a finite tolerance (an unbounded
    * lookback cannot band). Output column set matches [[join]] (the band
    * column is internal).
    */
  def joinTimeBanded(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String,
      rightTime: String,
      rightTiebreak: Seq[String] = Nil,
      tolerance: String,
      inner: Boolean = false,
      direction: String = "backward",
      bandWidth: String = ""): DataFrame = {
    // selective import: the wildcard would shadow the left/right parameters
    // with functions.left/right
    import org.apache.spark.sql.functions.{col, explode, lit, pmod, sequence, unix_micros}
    val tolMicros = {
      val iv = IntervalUtils.fromIntervalString(tolerance)
      require(iv.months == 0, s"calendar-month tolerance is ambiguous: $tolerance")
      iv.days * 86400000000L + iv.microseconds
    }
    val w = if (bandWidth.isEmpty) 4 * tolMicros else {
      val iv = IntervalUtils.fromIntervalString(bandWidth)
      require(iv.months == 0, s"calendar-month band width is ambiguous: $bandWidth")
      iv.days * 86400000000L + iv.microseconds
    }
    require(tolMicros > 0 && w > 0, "time banding requires positive tolerance and width")
    require(tolMicros < Long.MaxValue / 4 && w < Long.MaxValue / 4,
      "tolerance/band width too large to band safely")
    // fail fast instead of silently overwriting (and then dropping) a
    // caller's column that happens to share the internal band name
    require(!left.columns.contains("__graft_band") &&
      !right.columns.contains("__graft_band"),
      "inputs already carry a __graft_band column; rename it before banding")
    def micros(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      if (dt == TimestampType) unix_micros(c) else c
    // a right at rt serves lefts with lt in [rt - after, rt + before]
    val (before, after) = direction match {
      case "forward" => (0L, tolMicros)
      case "nearest" => (tolMicros, tolMicros)
      case _         => (tolMicros, 0L)
    }
    val lt = micros(col(leftTime), left.schema(leftTime).dataType)
    val rt = micros(col(rightTime), right.schema(rightTime).dataType)
    // floorDiv, not truncating division (which would merge bands -1 and 0
    // for pre-epoch times); subtracting the positive pmod first makes the
    // numerator an exact multiple of w. The division must stay in LONG
    // arithmetic (IntegralDivide): Column./ is Divide, which casts to
    // double and is only exact below 2^53 — a raw long time column above
    // ~9e15 would silently land in the wrong band.
    def band(c: Column): Column = {
      val num = (c - pmod(c, lit(w))).cast("long")
      ColumnBridge.column(IntegralDivide(
        ColumnBridge.expression(num), Literal(w)))
    }
    val lBanded = left.withColumn("__graft_band", band(lt))
    val rBanded = right.withColumn("__graft_band",
      explode(sequence(band(rt - after), band(rt + before))))
    join(lBanded, rBanded,
        keys :+ ("__graft_band" -> "__graft_band"),
        leftTime, rightTime, rightTiebreak,
        Some(tolerance), inner, direction)
      .drop("__graft_band")
  }

  /** Outcome of the sampled hot-key probe behind [[joinRouted]]: the
    * estimated histogram of the left side's equi-key and the routing
    * decision derived from it. `estHotRows` scales the sampled mode count
    * back by the sample fraction (unbiased for the dominating-key regime
    * this probe exists to catch); `hotShare` is the mode's share OF THE
    * SAMPLE, so it is meaningful even when the scan is huge.
    */
  final case class HotKeyDecision(
      sampledRows: Long,
      hotSampledRows: Long,
      estHotRows: Long,
      hotShare: Double,
      banded: Boolean) {
    override def toString: String =
      f"HotKeyDecision(sampled=$sampledRows%d, hotSampled=$hotSampledRows%d, " +
        f"estHotRows=$estHotRows%d, hotShare=$hotShare%.3f, banded=$banded%b)"
  }

  /** Sampled key histogram over `df`'s `keyCols`: one column-pruned,
    * map-side-combined aggregation job over a seeded Bernoulli sample —
    * cost is one cheap pass over the key columns only, never a second full
    * materialization of the input. Returns the routing decision for the
    * thresholds: band iff the hottest key's sample share ≥
    * `hotShareThreshold` AND its estimated full-data row count ≥
    * `minHotRows` (both must hold: a 99% share of 1k rows is not hot, and
    * 10⁷ rows of a key that is 1% of the data already spread fine).
    */
  def hotKeyProbe(
      df: DataFrame,
      keyCols: Seq[String],
      hotShareThreshold: Double,
      minHotRows: Long,
      sampleFraction: Double = 0.05,
      seed: Long = 42L): HotKeyDecision = {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit, max, sum, xxhash64}
    require(sampleFraction > 0 && sampleFraction <= 1,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    // hash the key tuple to one long so the shuffle-free partial aggregate
    // carries 8 bytes per distinct key, not the full key payload
    val row = df.select(xxhash64(keyCols.map(col): _*).as("__graft_k"))
      .sample(withReplacement = false, sampleFraction, seed)
      .groupBy(col("__graft_k")).agg(count(lit(1)).as("c"))
      .agg(coalesce(max(col("c")), lit(0L)).as("hot"),
        coalesce(sum(col("c")), lit(0L)).as("n"))
      .head()
    val hot = row.getLong(0)
    val n = row.getLong(1)
    val share = if (n == 0) 0.0 else hot.toDouble / n
    val estHot = math.round(hot / sampleFraction)
    HotKeyDecision(n, hot, estHot, share,
      banded = share >= hotShareThreshold && estHot >= minHotRows)
  }

  /** Routing-decision memo: (session, canonicalized left plan, routing
    * params) → [[HotKeyDecision]]. The probe is one sampled key-histogram
    * JOB, and its dominant cost is the key-column scan — which no
    * sampleFraction reduction avoids (a Bernoulli sample still reads every
    * page; the fraction only shrinks the shuffle). So the shave is
    * AMORTIZATION: the same logical left side under the same thresholds
    * re-uses its decision instead of re-running the job — a warm caller
    * (Bench's measured pass, any repeated pipeline) pays zero probe cost
    * and lands within noise of the better branch. Safety: both routes are
    * output-identical (spec-pinned), so a stale or hash-colliding entry
    * can only mis-place, never mis-answer; callers whose underlying FILES
    * changed in place can [[clearRouteCache]]. Bounded: cleared wholesale
    * past 1024 entries (decisions are ~40 bytes; the bound is hygiene, not
    * memory pressure).
    */
  private val routeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, String), HotKeyDecision]()

  /** Drop all memoized routing decisions (e.g. after overwriting input
    * files in place, which reuses the same logical plan shape).
    */
  def clearRouteCache(): Unit = routeCache.clear()

  /** [[hotKeyProbe]] behind the routing memo: the probe job runs at most
    * once per (session, left plan, params); harnesses that want to LOG the
    * decision [[joinRouted]] acts on share the same entry instead of
    * paying a second probe job.
    */
  def hotKeyProbeCached(
      df: DataFrame,
      keyCols: Seq[String],
      hotShareThreshold: Double,
      minHotRows: Long,
      sampleFraction: Double = 0.05,
      seed: Long = 42L): HotKeyDecision = {
    val cacheKey = (
      System.identityHashCode(df.sparkSession),
      df.queryExecution.analyzed.semanticHash(),
      s"${keyCols.mkString(",")}|$hotShareThreshold|$minHotRows|$sampleFraction|$seed")
    if (routeCache.size > 1024) routeCache.clear()
    // Deliberately get-then-putIfAbsent, NOT computeIfAbsent: the probe is a
    // multi-second Spark job, and CHM mapping functions must be short and
    // non-blocking (a concurrent caller whose different plan hashes to the
    // same bin would stall behind the job; a re-entrant probe on the bin
    // would deadlock). Racing callers may duplicate a probe — both routes
    // are output-identical, so the loser's wasted job is the only cost.
    val cached = routeCache.get(cacheKey)
    if (cached != null) cached
    else {
      val decision = hotKeyProbe(df, keyCols, hotShareThreshold, minHotRows, sampleFraction, seed)
      val prior = routeCache.putIfAbsent(cacheKey, decision)
      if (prior != null) prior else decision
    }
  }

  /** [[join]] with AUTOMATIC hot-key routing: probes the left side's key
    * histogram on a sample ([[hotKeyProbe]]) and routes through
    * [[joinTimeBanded]] when one key dominates past the measured
    * break-even, else through the plain native operator. Both routes are
    * output-identical (spec-pinned; the banded form's equality proof is in
    * AsofJoinSpec/SkewSpec), so the router changes placement only.
    *
    * NOTE — unlike every other builder in this API, this method runs an
    * EAGER Spark job at DataFrame-construction time (the probe; ~one
    * column-pruned pass over the left key columns), memoized per
    * (session, left plan, thresholds) so repeated construction of the
    * same route is free. Batch left sides only: a streaming DataFrame
    * cannot be sampled — use [[join]] or [[joinTimeBanded]] directly and
    * pick the route yourself.
    *
    * Default thresholds encode the measured break-even (SCALE.md "as-of
    * hot-key regime": banding first beats the plain single-task merge at
    * the 16×/90%-one-key point, ~290k hot-key events — below that the
    * plain merge's flat 0.7–0.9 s wins because band replication costs more
    * than the hot task saves): `hotShareThreshold = 0.5`,
    * `minHotRows = 250000`. Requires a finite `tolerance` (banding cannot
    * express an unbounded lookback; pass the plain [[join]] for that).
    */
  def joinRouted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String,
      rightTime: String,
      rightTiebreak: Seq[String] = Nil,
      tolerance: String,
      inner: Boolean = false,
      direction: String = "backward",
      bandWidth: String = "",
      hotShareThreshold: Double = 0.5,
      minHotRows: Long = 250000L,
      sampleFraction: Double = 0.05,
      seed: Long = 42L): DataFrame = {
    require(!left.isStreaming,
      "joinRouted probes the left side with an eager sampled job, which a streaming " +
        "DataFrame cannot run — use join() or joinTimeBanded() and pick the route explicitly")
    val d = hotKeyProbeCached(left, keys.map(_._1),
      hotShareThreshold, minHotRows, sampleFraction, seed)
    if (d.banded)
      joinTimeBanded(left, right, keys, leftTime, rightTime, rightTiebreak,
        tolerance, inner, direction, bandWidth)
    else
      join(left, right, keys, leftTime, rightTime, rightTiebreak,
        Some(tolerance), inner, direction)
  }

  /** SQL surface for the native operator (round-4 verdict #8): registers
    * the table-valued function
    * {{{
    *   graft_asof_join(left, right, leftKey, rightKey,
    *                   leftTime, rightTime, tiebreak, tolerance, mode)
    * }}}
    * so SQL-only users reach [[AsofJoinExec]] from query text:
    * `SELECT ... FROM graft_asof_join('trades', 'quotes', 'sym', 'sym',
    * 'ts', 'ts', 'quote_id', '1 hour', 'inner'[, 'forward'])`. All
    * arguments are string literals: table/view names resolved against the
    * session catalog, equi-keys as comma-separated column lists (one per
    * side, positionally paired — 'sym,venue' ⋈ 'sym,venue'), `tiebreak` a
    * comma-separated right-column list ('' for none), `tolerance` an
    * interval string ('' for unbounded), `mode` 'inner' or 'left', and an
    * optional tenth `direction` ('backward' default | 'forward' |
    * 'nearest').
    *
    * Input ergonomics: the first two arguments are CATALOG NAMES (tables or
    * views), not subqueries — the builder resolves them with
    * `session.table(...)` before the analyzer sees the call, so a CTE or
    * inline subquery cannot be passed directly. The supported route is a
    * temp view: `SELECT ... INTO` nothing —
    * `spark.sql("CREATE OR REPLACE TEMP VIEW t AS <subquery>")` (or
    * `df.createOrReplaceTempView("t")`) and then name `'t'`. This is the
    * same contract as every catalog-name TVF; spec-pinned
    * (AsofJoinSpec "subquery inputs go through temp views").
    *
    * The builder runs at analysis time on the driver:
    * it resolves both relations, builds the SAME [[AsofJoinNode]] as the
    * DataFrame path, and hands the analyzer an already-resolved subtree —
    * so the SQL and DataFrame forms share one operator, one planner
    * strategy, and one pushdown rule. Idempotent; re-registration
    * replaces the builder.
    */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftbridge.TableFunctionBridge.register(
      spark, "graft_asof_join",
      "graft_asof_join(left, right, leftKeysCsv, rightKeysCsv, leftTime, " +
        "rightTime, tiebreakCsv, tolerance, mode[, direction[, bandWidth]]) " +
        "- native as-of join of two catalog relations; keys pair " +
        "positionally, direction is backward (default) | forward | " +
        "nearest; a non-empty 11th bandWidth interval routes through the " +
        "hot-key time-band split (requires a finite tolerance). left/right " +
        "are catalog TABLE/VIEW NAMES - for a CTE or subquery input, " +
        "CREATE OR REPLACE TEMP VIEW first and pass the view name",
      { args =>
        def lit(i: Int, what: String): String = {
          require(args.length >= 9 && args.length <= 11,
            s"graft_asof_join takes 9 to 11 string arguments " +
              s"(10th = direction, 11th = hot-key band width), got ${args.length}")
          val e = args(i)
          require(e.foldable && e.dataType == org.apache.spark.sql.types.StringType,
            s"graft_asof_join: $what (arg ${i + 1}) must be a string literal, got $e")
          Option(e.eval()).map(_.toString).getOrElse(
            throw new IllegalArgumentException(s"graft_asof_join: $what is NULL"))
        }
        val session = org.apache.spark.sql.SparkSession.active
        val mode = lit(8, "mode")
        require(mode == "inner" || mode == "left",
          s"graft_asof_join: mode must be 'inner' or 'left', got '$mode'")
        def csv(s: String): Seq[String] =
          s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val (lk, rk) = (csv(lit(2, "left keys")), csv(lit(3, "right keys")))
        require(lk.nonEmpty && lk.length == rk.length,
          s"graft_asof_join: key lists must be non-empty and pair up " +
            s"positionally, got ${lk.length} vs ${rk.length}")
        val dir = if (args.length >= 10) lit(9, "direction") else "backward"
        val bandWidth =
          if (args.length == 11) Some(lit(10, "band width")).filter(_.nonEmpty)
          else None
        val (lt, rt) = (session.table(lit(0, "left table")),
          session.table(lit(1, "right table")))
        val df = bandWidth match {
          case Some(w) =>
            val tol = lit(7, "tolerance")
            require(tol.nonEmpty,
              "graft_asof_join: the banded form requires a finite tolerance")
            joinTimeBanded(lt, rt, keys = lk.zip(rk),
              leftTime = lit(4, "left time"), rightTime = lit(5, "right time"),
              rightTiebreak = csv(lit(6, "tiebreak")),
              tolerance = tol, inner = mode == "inner",
              direction = dir, bandWidth = w)
          case None =>
            join(lt, rt, keys = lk.zip(rk),
              leftTime = lit(4, "left time"), rightTime = lit(5, "right time"),
              rightTiebreak = csv(lit(6, "tiebreak")),
              tolerance = Some(lit(7, "tolerance")).filter(_.nonEmpty),
              inner = mode == "inner", direction = dir)
        }
        PlanBridge.analyzed(df)
      })
}

/** Logical as-of join. Built already-resolved (attributes come from the
  * children's analyzed plans), so no analyzer rule is needed — only the
  * planner strategy.
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightTiebreak: Seq[Attribute],
    toleranceMicros: Option[Long],
    inner: Boolean,
    direction: String = "backward") extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length)
  // fail fast on key-type drift: the exec's comparator and co-partitioning
  // both assume identical key types — an int-vs-long pair would read the
  // wrong bytes and hash to different partitions, silently matching nothing
  leftKeys.zip(rightKeys).foreach { case (l, r) =>
    require(l.dataType == r.dataType,
      s"as-of key type mismatch: ${l.name}: ${l.dataType} vs ${r.name}: ${r.dataType}")
  }
  require(Seq(TimestampType, LongType).contains(leftTime.dataType) &&
    rightTime.dataType == leftTime.dataType,
    "as-of time columns must both be timestamp or both long")

  override def output: Seq[Attribute] =
    if (inner) left.output ++ right.output
    else left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Custom nodes BLOCK Catalyst's own predicate pushdown — `PushDownPredicates`
  * only rewrites operators it knows. This rule restores it for the as-of
  * node: a conjunct above the join that references only LEFT columns commutes
  * with per-left-row matching (filtering left rows never changes any other
  * row's match), so it moves below the join and from there Catalyst's normal
  * machinery carries it into the scan. Right-side conjuncts must NOT move:
  * they would remove match CANDIDATES and change results (a filtered-out
  * most-recent click would silently fall back to an older one).
  *
  * Registered via `spark.experimental.extraOptimizations` (live sessions) —
  * the user-provided-rules batch runs after the main optimizer, but V1 file
  * planning collapses Filter/Project chains itself (`PhysicalOperation`),
  * so the relocated filter still lands in `PushedFilters` (PlansSpec-pinned).
  */
object PushFilterThroughAsofJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsofJoinNode) =>
      val (leftOnly, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(a.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val pushed = a.copy(left = Filter(leftOnly.reduce(And), a.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Plans [[AsofJoinNode]] to [[AsofJoinExec]]; registered per-session via
  * `spark.experimental.extraStrategies` (idempotently, by [[AsofJoin.join]]).
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, tb, tol, inner, dir) =>
      AsofJoinExec(lk, rk, lt, rt, tb, tol, inner, dir,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Per-partition forward-merge state machine shared by [[AsofJoinExec]]'s
  * interpreted and whole-stage-codegen paths: wraps the sorted right-side
  * iterator and answers, for each left row IN (key, time) ORDER, the
  * direction's as-of match (ASOF.md):
  *
  *  - `backward`: most recent right at-or-before the left time — greatest
  *    (time, tiebreak) wins;
  *  - `forward`: earliest right at-or-after — smallest (time, tiebreak);
  *  - `nearest`: the closer of the two; equal distance prefers backward.
  *
  * State is ONE buffered candidate row regardless of key skew: backward
  * keeps the best-so-far copy, forward keeps only the iterator lookahead
  * (a right consumed below the current left time can never serve a LATER
  * left either, since lefts arrive time-ascending).
  */
final class AsofMerger(
    rIter: Iterator[InternalRow],
    lKeyProj: UnsafeProjection,
    rKeyProj: UnsafeProjection,
    lTimeProj: UnsafeProjection,
    rTimeProj: UnsafeProjection,
    keyOrd: Ordering[InternalRow],
    tol: Long,
    rWidth: Int,
    direction: Int) { // 0 = backward, 1 = forward, 2 = nearest

  /** All-null right row for the left-outer extension. */
  val nullRight: InternalRow = new GenericInternalRow(rWidth)

  // Single-row lookahead into the right side plus the current best
  // backward candidate; the candidate is copied because child iterators
  // reuse row buffers (the lookahead stays valid until the next next()).
  private var rNext: InternalRow = null
  private var cand: InternalRow = null
  private var candKey: InternalRow = null
  private var candTime: Long = 0L

  /** The as-of match for `l`, or null (no candidate in the window, or a
    * null key/time on the left). Must be called with left rows in
    * (key, time) order — the merge never rewinds the right side. */
  def matchFor(l: InternalRow): InternalRow = {
    val lk = lKeyProj(l)
    if (lk.anyNull) return null
    val ltRow = lTimeProj(l)
    if (ltRow.isNullAt(0)) return null
    val lt = ltRow.getLong(0)
    // Key advanced past the buffered candidate: drop it.
    if (cand != null && keyOrd.compare(candKey, lk) != 0) cand = null
    // Advance the right side. Backward/nearest consume rows with rt <= lt
    // into the candidate (the LAST taken is the greatest (time, tiebreak));
    // forward skips strictly-before rows instead, so an equal-time right
    // stays buffered as the forward match. Either way the loop leaves the
    // lookahead at the first right this left cannot consume.
    val keepAtOrBefore = direction != 1
    var break = false
    while (!break && (rNext != null || rIter.hasNext)) {
      if (rNext == null) rNext = rIter.next()
      val rk = rKeyProj(rNext)
      val cmp = if (rk.anyNull) -1 else keyOrd.compare(rk, lk)
      if (cmp < 0) rNext = null // earlier key (or null key): skip
      else if (cmp == 0) {
        val rtRow = rTimeProj(rNext)
        if (rtRow.isNullAt(0)) rNext = null // null time never matches
        else {
          val rt = rtRow.getLong(0)
          if (rt <= lt && keepAtOrBefore) {
            cand = rNext.copy(); candKey = rk.copy(); candTime = rt
            rNext = null
          } else if (rt < lt) rNext = null // forward: strictly-before, dead
          else break = true
        }
      } else break = true
    }
    // The lookahead is the forward candidate iff it is on this key with a
    // usable time (loop invariant: its rt >= lt for forward, > lt
    // otherwise). An explicit has-flag, not a sentinel value: LongType
    // time columns may legitimately carry any long, including MinValue.
    var hasFt = false
    var ft = 0L
    if (rNext != null) {
      val rk = rKeyProj(rNext)
      if (!rk.anyNull && keyOrd.compare(rk, lk) == 0) {
        val rtRow = rTimeProj(rNext)
        if (!rtRow.isNullAt(0)) { ft = rtRow.getLong(0); hasFt = true }
      }
    }
    // Distances are true-non-negative by construction, so a NEGATIVE
    // difference can only be 64-bit overflow (raw-long times straddling
    // the full range) — reject it rather than let it slip under `tol`.
    def backDist = lt - candTime
    def fwdDist = ft - lt
    direction match {
      case 0 => // backward
        if (cand != null && backDist >= 0 && backDist <= tol) cand else null
      case 1 => // forward
        if (hasFt && fwdDist >= 0 && fwdDist <= tol) rNext else null
      case _ => // nearest: closer side wins; equal distance -> backward
        val back = if (cand != null && backDist >= 0 && backDist <= tol) cand else null
        val fwd = if (hasFt && fwdDist >= 0 && fwdDist <= tol) rNext else null
        if (back == null) fwd
        else if (fwd == null) back
        else if (fwdDist < backDist) fwd
        else back
    }
  }
}

/** Sort-merge as-of join: children arrive clustered by key and sorted by
  * (key, time[, tiebreak]); one forward pass per partition keeps, for the
  * current left key, the single most recent right row at-or-before the
  * current left time. Per-task state is ONE buffered right row.
  *
  * Implements [[CodegenSupport]] with SortMergeJoinExec's two-input-RDD
  * produce pattern (round-4 verdict #4): the merge loop is generated into
  * the surrounding whole-stage pipeline — each joined row flows straight
  * into the downstream generated consume chain (aggregation, projection)
  * with no BufferedRowIterator fence between the join and its parent. The
  * per-row matching state machine stays the compiled [[AsofMerger]] on
  * both paths, so interpreted and generated execution share one
  * definition of the semantics.
  */
case class AsofJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightTiebreak: Seq[Attribute],
    toleranceMicros: Option[Long],
    inner: Boolean,
    direction: String,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] =
    if (inner) left.output ++ right.output
    else left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTiebreak)).map(SortOrder(_, Ascending)))

  // The merge preserves the left side's partitioning and row order.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  /** Serializable merger constructor (shipped to tasks by both paths). */
  private def createMergerFn: Iterator[InternalRow] => AsofMerger = {
    val tol = toleranceMicros.getOrElse(Long.MaxValue)
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val dirCode = direction match {
      case "forward" => 1
      case "nearest" => 2
      case _         => 0
    }
    rIter =>
      new AsofMerger(rIter,
        UnsafeProjection.create(lKeys, lOut),
        UnsafeProjection.create(rKeys, rOut),
        UnsafeProjection.create(Seq(lTime: Expression), lOut),
        UnsafeProjection.create(Seq(rTime: Expression), rOut),
        RowOrdering.createNaturalAscendingOrdering(keyTypes),
        tol, rOut.length, dirCode)
  }

  /** Entry point for the GENERATED code: builds the per-partition merger
    * over the right-side input iterator (BufferedRowIterator hands the
    * stage scala Iterators). */
  def createMerger(rIter: Iterator[InternalRow]): AsofMerger =
    createMergerFn(rIter)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val innerJoin = inner
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    val mkMerger = createMergerFn

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val merger = mkMerger(rIter)
      // bind against a nullable right schema when null-extending, so the
      // generated projection null-checks originally non-nullable columns
      val projIn =
        if (innerJoin) lOut ++ rOut
        else lOut ++ rOut.map(_.withNullability(true))
      val resultProj = UnsafeProjection.create(allOut, projIn)
      val joined = new JoinedRow

      lIter.flatMap { l =>
        val matched = merger.matchFor(l)
        if (matched != null) {
          numOutputRows += 1; numMatched += 1
          Iterator.single(resultProj(joined(l, matched)))
        } else if (innerJoin) Iterator.empty
        else {
          numOutputRows += 1
          Iterator.single(resultProj(joined(l, merger.nullRight)))
        }
      }
    }
  }

  // ------------------------------------------------------------- codegen
  // SortMergeJoinExec's two-input-RDD pattern: the stage zips the two
  // sorted children and the generated processNext() drives the merge loop,
  // feeding each joined row straight into the downstream consume chain.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // the emitted row is a reused JoinedRow over reused child buffers — a
  // buffering parent must copy
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val exec = ctx.addReferenceObj("asofExec", this)
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "asofLeftInput",
      v => s"$v = inputs[0];", forceInline = true)
    val merger = ctx.addMutableState(classOf[AsofMerger].getName, "asofMerger",
      v => s"$v = $exec.createMerger(inputs[1]);", forceInline = true)
    val numOutputRows = metricTerm(ctx, "numOutputRows")
    val numMatched = metricTerm(ctx, "numMatched")
    val leftRow = ctx.freshName("asofLeftRow")
    val matched = ctx.freshName("asofMatched")
    val ir = classOf[InternalRow].getName
    // The inner-join skip path must stay interruptible: without the
    // shouldStop() before `continue`, a partition with a long run of
    // non-matching left rows could not yield to limit/cancellation until
    // the next match (SortMergeJoinExec's generated loop checks every
    // iteration for the same reason).
    val noMatch =
      if (inner) "if (shouldStop()) return;\ncontinue;"
      else s"$matched = $merger.nullRight();"
    // Column variables, not a row: downstream consume then evaluates (and
    // prunes to) exactly the columns it uses, and the stage root's
    // UnsafeProjection is generated only when a full row is required.
    ctx.currentVars = null
    ctx.INPUT_ROW = leftRow
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    ctx.INPUT_ROW = matched
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      // when null-extending, the all-null right row must read as null even
      // for originally non-nullable columns
      BoundReference(i, a.dataType, nullable = a.nullable || !inner).genCode(ctx)
    }
    ctx.INPUT_ROW = null
    s"""
       |while ($leftInput.hasNext()) {
       |  $ir $leftRow = ($ir) $leftInput.next();
       |  $ir $matched = $merger.matchFor($leftRow);
       |  if ($matched != null) {
       |    $numMatched.add(1);
       |  } else {
       |    $noMatch
       |  }
       |  $numOutputRows.add(1);
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
