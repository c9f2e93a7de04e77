package graft.queries

import graft.engine.{PortableHash, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Production-pipeline operators a large-scale data platform runs around
  * the core analytics: data-quality audits, snapshot diffing, time-series
  * gap-fill, cohort retention, exact least-squares trends, bucketized
  * range joins, blocked fuzzy (edit-distance) joins, and hashing-trick
  * featurization. None exist in the reference (a Kafka Streams demo
  * codebase) — they are north-star gap-fill in the spirit of SURVEY.md
  * §2.9: the operations that make an engine useful for curating and
  * monitoring a 100 TB corpus, each with a bit-exact DuckDB oracle.
  *
  * Determinism rules shared with the rest of the repo: money through
  * DECIMAL(18,2) (never double sums), fixed-point integer outputs for
  * derived ratios, md5-derived hashing ([[graft.engine.PortableHash]]),
  * and deterministic tie-breaks on unique ids.
  */
object PipelineQueries {

  private def dec(c: Column) = c.cast(DecimalType(18, 2))

  // ------------------------------------------------------------- dq_audit
  /** Data-quality expectation audit (Deequ/Great-Expectations shape): each
    * rule reports (violations, checked) so downstream gates can alert on
    * ratios. Scale design: all single-table rules for one table share ONE
    * scan + ONE partial/final aggregate (conditional sums), unpivoted with
    * `stack` — a 100 TB fact table is read once, not once per rule. The
    * referential-integrity rule is the only join: one shuffle left join on
    * the key (AQE handles skew) whose null-extended and total counts come
    * out of a single aggregate over the pruned 1-column scans.
    */
  def dqAudit(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)

    def cnt(pred: Column) = sum(when(pred, 1L).otherwise(0L))

    // one scan, three rules: quantity domain, discount domain, tax domain
    val liRules = li.agg(
      cnt(col("l_quantity") < 1 || col("l_quantity") > 50).as("v1"),
      cnt(col("l_discount") < 0 || col("l_discount") > 1).as("v2"),
      cnt(col("l_tax") < 0 || col("l_tax") > 1).as("v3"),
      count(lit(1)).as("n"))
      .select(expr(
        """stack(3,
          |  'lineitem.quantity_range', v1, n,
          |  'lineitem.discount_range', v2, n,
          |  'lineitem.tax_range',      v3, n) AS (rule, violations, checked)""".stripMargin))

    // one scan, three rules: null key, status domain, primary-key uniqueness
    val ordRules = ord.agg(
      cnt(col("o_custkey").isNull).as("v1"),
      cnt(!col("o_orderstatus").isin("O", "F", "P")).as("v2"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v3"),
      count(lit(1)).as("n"))
      .select(expr(
        """stack(3,
          |  'orders.custkey_not_null', v1, n,
          |  'orders.status_domain',    v2, n,
          |  'orders.pk_unique',        v3, n) AS (rule, violations, checked)""".stripMargin))

    // referential integrity: lineitem rows whose order does not exist.
    // One left join on the key (both scans prune to that single column),
    // then violations = null-extended rows and checked = all rows in the
    // SAME aggregate — no second pass, no scalar cross join. The build
    // side dedupes its keys first: a duplicated o_orderkey (exactly what
    // the pk_unique rule flags) would otherwise multiply matched lineitem
    // rows and diverge from the oracle's NOT EXISTS count on dirty data.
    val orphans = li.select("l_orderkey")
      .join(ord.select("o_orderkey").distinct(),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("violations"),
        count(lit(1)).as("checked"))
      .select(lit("lineitem.orphan_orderkey").as("rule"),
        col("violations"), col("checked"))

    liRules.unionByName(ordRules).unionByName(orphans)
  }

  val dqAuditSql: String =
    """SELECT 'lineitem.quantity_range' AS rule,
      |       CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS violations,
      |       count(*) AS checked FROM lineitem
      |UNION ALL
      |SELECT 'lineitem.discount_range',
      |       CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT), count(*)
      |FROM lineitem
      |UNION ALL
      |SELECT 'lineitem.tax_range',
      |       CAST(sum(CASE WHEN l_tax < 0 OR l_tax > 1 THEN 1 ELSE 0 END) AS BIGINT), count(*)
      |FROM lineitem
      |UNION ALL
      |SELECT 'orders.custkey_not_null',
      |       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(*)
      |FROM orders
      |UNION ALL
      |SELECT 'orders.status_domain',
      |       CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT), count(*)
      |FROM orders
      |UNION ALL
      |SELECT 'orders.pk_unique', count(*) - count(DISTINCT o_orderkey), count(*)
      |FROM orders
      |UNION ALL
      |SELECT 'lineitem.orphan_orderkey',
      |       (SELECT count(*) FROM lineitem l
      |        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
      |       count(*)
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------- retention_cohorts
  /** Weekly cohort retention matrix over the event stream: users are
    * cohorted by their first active epoch-week; each cell counts users from
    * cohort week `c` still active `week_offset` weeks later. Scale design:
    * the raw stream collapses to distinct (user, week) FIRST (one
    * map-side-combined aggregate), the per-user first week is a second
    * aggregate over that already-tiny relation, and the join back is
    * user-cardinality × weeks — never event-cardinality. Both aggregates
    * and the join share the user_id hash partitioning, so the exchange
    * inserted for the first groupBy is reused by the rest of the plan.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val wk = Tables.events(spark, dir)
      .select(col("user_id"),
        floor(datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")) / 7)
          .as("week"))
      .distinct()
    val first = wk.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    wk.join(first, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
  }

  val retentionCohortsSql: String =
    """WITH wk AS (
      |  SELECT DISTINCT user_id,
      |         CAST(FLOOR((CAST(ts AS DATE) - DATE '1970-01-01') / 7.0) AS BIGINT) AS week
      |  FROM events),
      |first AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id)
      |SELECT f.cohort_week, w.week - f.cohort_week AS week_offset,
      |       count(*) AS active_users
      |FROM wk w JOIN first f USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  // -------------------------------------------------------------- gap_fill
  /** Time-series resample with gap fill: daily totals per event type, with
    * missing days emitted as 0.00 between each type's first and last active
    * day. Scale design: the dense day grid is generated from the AGGREGATED
    * relation (types × span-days), never from raw events — at 100 TB the
    * explode produces a few thousand rows per type regardless of input
    * size, and the fill join is a broadcast (grid and daily are both
    * aggregate-sized).
    */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(dec(col("value"))).cast("double").as("total"))
    val grid = daily.groupBy("event_type")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("day"))
    // day goes out as an ISO string: a DATE column round-trips differently
    // through parquet/pandas vs the oracle's result frame (date vs ns
    // timestamp), which the driver's value compare flags as a mismatch
    grid.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("total"), lit(0d)).as("total"))
  }

  val gapFillSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT event_type,
      |         CAST(unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM daily GROUP BY event_type)
      |SELECT g.event_type, strftime(g.day, '%Y-%m-%d') AS day, coalesce(d.total, 0.0) AS total
      |FROM grid g LEFT JOIN daily d
      |  ON d.event_type = g.event_type AND d.day = g.day""".stripMargin

  // ------------------------------------------------------------ table_diff
  /** Keyed snapshot diff — the reconciliation step of every incremental
    * pipeline: given yesterday's and today's version of a keyed table,
    * classify each key as added / removed / changed. Snapshots are
    * simulated deterministically from `orders` (A drops keys ≡0 mod 7;
    * B drops keys ≡0 mod 5 and reprices urgent orders by +10%).
    * Scale design: ONE full-outer shuffle join on the key — the canonical
    * topology; both sides prune to key + compared columns; unchanged keys
    * (the overwhelming majority at 100 TB) are filtered out before any
    * further stage sees them.
    */
  def tableDiff(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val a = ord.filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey").as("ka"),
        col("o_orderstatus").as("sa"), dec(col("o_totalprice")).as("pa"))
    val b = ord.filter(col("o_orderkey") % 5 =!= 0)
      .select(col("o_orderkey").as("kb"), col("o_orderstatus").as("sb"),
        when(col("o_orderpriority") === "1-URGENT",
          dec(col("o_totalprice")) * lit(1.10).cast(DecimalType(9, 4)))
          .otherwise(dec(col("o_totalprice")) * lit(1.00).cast(DecimalType(9, 4)))
          .as("pb"))
    a.join(b, col("ka") === col("kb"), "full_outer")
      .select(coalesce(col("ka"), col("kb")).as("o_orderkey"),
        when(col("ka").isNull, "added")
          .when(col("kb").isNull, "removed")
          .when(col("sa") =!= col("sb") || col("pa") =!= col("pb"), "changed")
          .as("change"))
      .filter(col("change").isNotNull)
  }

  val tableDiffSql: String =
    """WITH a AS (
      |  SELECT o_orderkey AS ka, o_orderstatus AS sa,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS pa
      |  FROM orders WHERE o_orderkey % 7 <> 0),
      |b AS (
      |  SELECT o_orderkey AS kb, o_orderstatus AS sb,
      |         CAST(o_totalprice AS DECIMAL(18,2)) *
      |           CASE WHEN o_orderpriority = '1-URGENT'
      |                THEN CAST(1.10 AS DECIMAL(9,4)) ELSE CAST(1.00 AS DECIMAL(9,4)) END AS pb
      |  FROM orders WHERE o_orderkey % 5 <> 0)
      |SELECT coalesce(ka, kb) AS o_orderkey,
      |       CASE WHEN ka IS NULL THEN 'added'
      |            WHEN kb IS NULL THEN 'removed'
      |            WHEN sa <> sb OR pa <> pb THEN 'changed' END AS change
      |FROM a FULL OUTER JOIN b ON ka = kb
      |WHERE (CASE WHEN ka IS NULL THEN 'added'
      |            WHEN kb IS NULL THEN 'removed'
      |            WHEN sa <> sb OR pa <> pb THEN 'changed' END) IS NOT NULL""".stripMargin

  // ---------------------------------------------------------- linfit_trend
  /** Exact least-squares trend per event type: slope of daily revenue vs
    * day index, computed from the five classical sufficient statistics
    * (n, Σx, Σy, Σxy, Σx²) in EXACT integer arithmetic (y in cents), so
    * the oracle reproduces the numerator/denominator bit-for-bit; the
    * reported slope is fixed-point ppm (cents/day × 10⁶). Scale design:
    * daily totals are one map-side-combined aggregate; the sufficient
    * statistics are a second aggregate over the tiny daily relation —
    * regression over a 100 TB fact table costs exactly one shuffle of
    * (type, day) partial sums. BIGINT bounds, honestly stated: with
    * x < 2^15 (epoch days) and n ≤ 2^17 days, `sx·sy` is the binding
    * term — it stays under 2^63 while daily y_cents < ~2^31 (≈ $21M/day
    * per group). Beyond that, lift the five sums and the num/den columns
    * to DECIMAL(38,0) exactly as [[anomalyZscore]] does (the oracle's
    * HUGEINT mirrors it); the outputs here stay BIGINT because the
    * driver's schema compare pins the published column types.
    */
  def linfitTrend(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).cast("long").as("x"))
      .agg((sum(dec(col("value"))) * 100).cast("long").as("y"))
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .filter(col("n") >= 2)
      .select(col("event_type"), col("n").as("n_days"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("den"))
      .withColumn("slope_ppm",
        floor((col("num") * lit(1000000.0)) / col("den")).cast("long"))
  }

  val linfitTrendSql: String =
    """WITH daily AS (
      |  SELECT event_type,
      |         CAST((CAST(ts AS DATE) - DATE '1970-01-01') AS BIGINT) AS x,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |         sum(x*y) AS sxy, sum(x*x) AS sxx
      |  FROM daily GROUP BY 1)
      |SELECT event_type, n AS n_days,
      |       CAST(n*sxy - sx*sy AS BIGINT) AS num, CAST(n*sxx - sx*sx AS BIGINT) AS den,
      |       CAST(FLOOR(((n*sxy - sx*sy) * 1000000.0) / (n*sxx - sx*sx)) AS BIGINT) AS slope_ppm
      |FROM stats WHERE n >= 2""".stripMargin

  // --------------------------------------------------- range_join_bucketed
  /** Range (band) join done scalably: assign each event's value to a price
    * band given as arbitrary [lo, hi) intervals. A naive theta join is a
    * nested-loop scan of bands per row; the bucketized form expands each
    * band to the fixed-width buckets it overlaps (small side only!) and
    * turns the theta join into a broadcast EQUI join on the bucket id plus
    * a residual range filter — the standard interval-join topology that
    * survives any fact-side scale. Money in cents (exact decimal→bigint)
    * so bucket arithmetic is integral in both engines.
    */
  def rangeJoinBucketed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = 5000L // bucket width, cents
    // [lo, hi) in cents — irregular on purpose: not aligned to the buckets
    val bands = Seq(
      ("p0_micro", 0L, 1000L), ("p1_small", 1000L, 4500L),
      ("p2_mid", 4500L, 12000L), ("p3_large", 12000L, 40000L),
      ("p4_jumbo", 40000L, 50100L))
      .toDF("band", "lo", "hi")
      .select(col("band"), col("lo"), col("hi"),
        // integer div — `/` on longs is double division, which `sequence`
        // rejects (and a double join key would defeat the equi-join anyway)
        explode(sequence(expr(s"lo div $w"), expr(s"(hi - 1) div $w"))).as("bucket"))
    val ev = Tables.events(spark, dir)
      .select((dec(col("value")) * 100).cast("long").as("cents"))
      .withColumn("bucket", expr(s"cents div $w"))
    ev.join(broadcast(bands), "bucket")
      .filter(col("cents") >= col("lo") && col("cents") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
  }

  val rangeJoinBucketedSql: String =
    """WITH bands(band, lo, hi) AS (VALUES
      |  ('p0_micro', 0, 1000), ('p1_small', 1000, 4500), ('p2_mid', 4500, 12000),
      |  ('p3_large', 12000, 40000), ('p4_jumbo', 40000, 50100)),
      |ev AS (SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM events)
      |SELECT band, count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM ev JOIN bands ON ev.cents >= bands.lo AND ev.cents < bands.hi
      |GROUP BY band""".stripMargin

  // ------------------------------------------------------- fuzzy_join_edit
  /** Blocked fuzzy join on edit distance: probe names (deterministically
    * corrupted customer names — the 10th character replaced by 'X') are
    * matched back to the customer table with `levenshtein ≤ 1`. Scale
    * design: candidate generation is an EQUI join on a blocking key (the
    * 6-char name suffix, untouched by the corruption region), so the
    * expensive edit-distance verify runs only on suffix-collision pairs —
    * the same candidates-then-verify topology as the LSH family. The
    * blocking key is part of the operator's contract (like an LSH band
    * scheme): recall is exact for edits outside the suffix, by
    * construction. Probe side is filter-pruned tiny ⇒ broadcast.
    */
  def fuzzyJoinEdit(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val probes = cust.filter(col("c_custkey") % 101 === 0)
      .select(col("c_custkey").as("probe_key"),
        concat(substring(col("c_name"), 1, 9), lit("X"),
          substring(col("c_name"), 11, 8)).as("probe_name"))
      .withColumn("blk", substring(col("probe_name"), 13, 6))
    val names = cust.select(col("c_custkey").as("match_key"), col("c_name"))
      .withColumn("blk", substring(col("c_name"), 13, 6))
    broadcast(probes).join(names, "blk")
      .withColumn("dist", levenshtein(col("probe_name"), col("c_name")))
      .filter(col("dist") <= 1)
      .select("probe_key", "match_key", "dist")
  }

  val fuzzyJoinEditSql: String =
    """WITH probes AS (
      |  SELECT c_custkey AS probe_key,
      |         substr(c_name, 1, 9) || 'X' || substr(c_name, 11, 8) AS probe_name
      |  FROM customer WHERE c_custkey % 101 = 0),
      |names AS (SELECT c_custkey AS match_key, c_name FROM customer)
      |SELECT probe_key, match_key,
      |       levenshtein(probe_name, c_name) AS dist
      |FROM probes JOIN names
      |  ON substr(probe_name, 13, 6) = substr(c_name, 13, 6)
      |WHERE levenshtein(probe_name, c_name) <= 1""".stripMargin

  // ---------------------------------------------------------- feature_hash
  /** Hashing-trick featurization (Weinberger et al. 2009): categorical
    * features hash into a fixed 64-bucket index space; the query reports
    * the bucket load histogram (rows landing in each bucket, distinct
    * features colliding there) — the collision audit run before training.
    * Features: event_type and the `k` property parsed from the JSON props
    * (regexp on both engines, no JSON lib dependence). Scale design: pure
    * per-row projection (explode ×2) + one map-side-combined aggregate
    * over ≤64 groups; the md5 bucket is [[graft.engine.PortableHash]] so
    * the oracle lands every feature in the identical bucket.
    */
  def featureHash(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(explode(array(
        concat(lit("type="), col("event_type")),
        concat(lit("k="), regexp_extract(col("props"), "\"k\": (\\d+)", 1))))
        .as("feature"))
      .withColumn("bucket", PortableHash.md5Long(col("feature")) % 64)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("feature")).as("n_features"))

  val featureHashSql: String = {
    val b = PortableHash.md5LongSql("feature")
    s"""WITH feats AS (
       |  SELECT 'type=' || event_type AS feature FROM events
       |  UNION ALL
       |  SELECT 'k=' || regexp_extract(props, '"k": (\\d+)', 1) FROM events)
       |SELECT $b % 64 AS bucket, count(*) AS n_rows,
       |       count(DISTINCT feature) AS n_features
       |FROM feats GROUP BY 1""".stripMargin
  }

  // -------------------------------------------------------- inverted_index
  /** Search-index build: token → (document frequency, total term
    * frequency, first-8 sorted posting sample). Scale design: term stats
    * are ONE map-side-combined aggregate over the token explode; the
    * posting sample is rank-limited BEFORE aggregation (row_number ≤ 8
    * gets Spark's WindowGroupLimit pushdown, so each partition forwards at
    * most 8 rows per token — the shuffle never carries a hot token's full
    * posting list, the classic inverted-index skew trap); both halves are
    * token-partitioned, so the final join reuses one exchange. Tokenizer
    * shared with the text family ([[graft.llm.TextAnalysis.tokens]]).
    */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.llm.TextAnalysis.tokens(col("text"))).as("token"))
    val stats = tok.groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token")).orderBy(col("doc_id").asc)
    val sample = tok.select("token", "doc_id").distinct()
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 8)
      .groupBy("token")
      .agg(array_join(transform(array_sort(collect_list(col("doc_id"))),
        _.cast("string")), ",").as("sample_postings"))
    stats.join(sample, "token")
  }

  val invertedIndexSql: String =
    """WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS token
      |             FROM documents),
      |stats AS (SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
      |          FROM tok GROUP BY 1),
      |dist AS (SELECT DISTINCT token, doc_id FROM tok),
      |ranked AS (SELECT token, doc_id,
      |           row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn FROM dist),
      |post AS (SELECT token, array_to_string(list(doc_id ORDER BY doc_id), ',') AS sample_postings
      |         FROM ranked WHERE rn <= 8 GROUP BY token)
      |SELECT token, tf, df, sample_postings FROM stats JOIN post USING (token)""".stripMargin

  // ----------------------------------------------------------- bm25_search
  /** BM25 retrieval scoring (Robertson–Spärck Jones; k1=1.2, b=0.75) of
    * the whole corpus against a deterministic query (the 3 highest-df
    * tokens, ties by token asc), returning the top-10 docs. The full
    * search stack in one plan: tf, df, doc length, and corpus stats all
    * from the same token explode. Scale design: the query-term set and
    * the (N, avgdl) row are construction-bounded broadcasts; per-doc
    * score is a map-side-combined sum over ≤|q| joined postings; the
    * global top-10 is TakeOrderedAndProject (per-partition heap + driver
    * merge of 10-row heads — never a full sort). ln portability: same
    * round-6 contract the tfidf query established.
    */
  def bm25Search(spark: SparkSession, dir: String): DataFrame = {
    val k1 = 1.2
    val b = 0.75
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.llm.TextAnalysis.tokens(col("text"))).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    // TakeOrdered (per-partition heap + 3-row driver merge), not a
    // single-partition global window — vocabulary-sized input, k=3 output
    val qterms = dfreq.orderBy(col("df").desc, col("token").asc).limit(3)
    val stats = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
      .crossJoin(dl.agg(sum(col("dl")).as("sum_dl")))
    tf.join(broadcast(qterms), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log(lit(1) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") * col("n_docs") / col("sum_dl"))))
          .as("s"))
      .groupBy("doc_id").agg(round(sum(col("s")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(10)
  }

  val bm25SearchSql: String =
    """WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS token
      |             FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
      |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
      |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      |qterms AS (SELECT token, df FROM (
      |    SELECT token, df, row_number() OVER (ORDER BY df DESC, token ASC) AS rn
      |    FROM dfreq) WHERE rn <= 3),
      |stats AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
      |                 (SELECT sum(dl) FROM dl) AS sum_dl)
      |SELECT doc_id, round(sum(
      |         ln(1 + (n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE))) *
      |         (tf * (CAST(1.2 AS DOUBLE) + 1)) /
      |         (tf + CAST(1.2 AS DOUBLE) * (1 - CAST(0.75 AS DOUBLE)
      |            + CAST(0.75 AS DOUBLE) * dl * n_docs / sum_dl))), 6) AS score
      |FROM tf JOIN qterms USING (token) JOIN dl USING (doc_id), stats
      |GROUP BY doc_id
      |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin

  // ------------------------------------------------------------ rrf_fusion
  /** Hybrid retrieval — reciprocal-rank fusion (Cormack et al. 2009) of
    * the lexical leg ([[bm25Search]]'s top-10) and the semantic leg
    * (brute cosine top-10 for query vector 0, the `ann_topk` machinery)
    * over the shared doc/vec id space. The RRF score is INTEGER ppm —
    * `10⁶ div (60 + rank)` per leg, absent rank contributing 0 — so the
    * fused ordering is exact and the oracle replays it bit-for-bit (the
    * float form drifts in the last ulp). Scale: both legs end in
    * TakeOrdered 10-row heads, so the fusion join and its ranking windows
    * touch ≤ 20 rows — a driver-bounded coda on two already-distributed
    * rankings; the full-outer join keeps single-leg hits (the whole point
    * of fusion: consensus beats either leg's tail).
    */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // 10-row input: the global window is bounded by the legs' limits
    val lex = bm25Search(spark, dir)
      .withColumn("r_lex", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id").as("item"), col("r_lex"))
    val sem = graft.llm.Similarity
      .bruteForceTopK(Tables.embeddings(spark, dir), col("vec_id") === 0, k = 10)
      .select(col("n_id").as("item"), col("rank").cast("long").as("r_sem"))
    lex.join(sem, Seq("item"), "full_outer")
      .select(col("item"),
        (coalesce(expr("1000000 div (60 + r_lex)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + r_sem)"), lit(0L))).as("rrf_ppm"),
        coalesce(col("r_lex"), lit(0L)).as("r_lex"),
        coalesce(col("r_sem"), lit(0L)).as("r_sem"))
      .orderBy(col("rrf_ppm").desc, col("item"))
      .limit(10)
  }

  private val rrfDot =
    "list_reduce([%s.embedding[i]::DOUBLE * %s.embedding[i]::DOUBLE for i in range(1, 65)], (acc, x) -> acc + x)"

  val rrfFusionSql: String = {
    def dot(a: String, b: String) = rrfDot.format(a, b)
    s"""WITH lex AS (SELECT doc_id AS item,
       |         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r_lex
       |       FROM ($bm25SearchSql)),
       |e AS (SELECT vec_id, embedding, nullif(sqrt(${dot("e0", "e0")}), 0) AS nrm
       |      FROM embeddings e0),
       |sem AS (SELECT n_id AS item, CAST(rank AS BIGINT) AS r_sem FROM (
       |    SELECT n_id, row_number() OVER (ORDER BY sim DESC, n_id ASC) AS rank FROM (
       |      SELECT n.vec_id AS n_id, round(${dot("q", "n")} / (q.nrm * n.nrm), 6) AS sim
       |      FROM (SELECT * FROM e WHERE vec_id = 0) q
       |      JOIN e n ON n.vec_id != q.vec_id))
       |  WHERE rank <= 10)
       |SELECT COALESCE(l.item, s.item) AS item,
       |       COALESCE(1000000 // (60 + l.r_lex), 0)
       |         + COALESCE(1000000 // (60 + s.r_sem), 0) AS rrf_ppm,
       |       COALESCE(l.r_lex, 0) AS r_lex, COALESCE(s.r_sem, 0) AS r_sem
       |FROM lex l FULL OUTER JOIN sem s ON l.item = s.item
       |ORDER BY rrf_ppm DESC, item LIMIT 10""".stripMargin
  }

  // -------------------------------------------------------- triangle_count
  /** Per-document triangle participation in the SimHash near-dup graph —
    * the cohesion signal that separates tight duplicate cliques from
    * chains (complements connected components and PageRank). Uses the
    * degree-ordered orientation: every edge points from its lower
    * (degree, id) endpoint to the higher, so each triangle is counted at
    * exactly one wedge and every node's out-degree is O(√m) — the hub
    * node that breaks naive wedge counting (deg² wedges) caps at √m
    * out-wedges. Joins are equi-joins on node keys; everything is
    * integer arithmetic on a composite (degree, id) ordering key.
    */
  def triangleCount(spark: SparkSession, dir: String): DataFrame = {
    val pairs = graft.llm.Dedup.simhashPairs(
        Tables.documents(spark, dir), simhashMaxDistTri)
      .select(col("doc_a"), col("doc_b"))
    val ed = pairs.select(col("doc_a").as("x"), col("doc_b").as("y"))
      .union(pairs.select(col("doc_b").as("x"), col("doc_a").as("y")))
    val deg = ed.groupBy("x").agg(count(lit(1)).as("deg"))
    // composite orientation key: degree-major, id-minor (ids < 2^40)
    val keyed = ed.join(deg.select(col("x"), col("deg").as("dx")), "x")
      .join(deg.select(col("x").as("y"), col("deg").as("dy")), "y")
      .select(col("x"), col("y"),
        (col("dx") * lit(1099511627776L) + col("x")).as("kx"),
        (col("dy") * lit(1099511627776L) + col("y")).as("ky"))
    val a = keyed.filter(col("kx") < col("ky"))
      .select(col("kx").as("ku"), col("ky").as("kv"),
        col("x").as("u"), col("y").as("v"))
    val tri = a.as("e1")
      .join(a.select(col("ku"), col("kv").as("kw"), col("v").as("w")).as("e2"),
        col("e1.ku") === col("e2.ku") && col("e1.kv") < col("e2.kw"))
      .join(a.select(col("ku").as("kv2"), col("kv").as("kw2")).as("e3"),
        col("e1.kv") === col("kv2") && col("e2.kw") === col("kw2"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.w").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
  }

  // 5 = the ceiling of the 6-band pigeonhole guarantee in simhashPairs;
  // the synthetic corpus has no exact dups, so the near-dup graph is
  // sparse and the triangle set small — the query's value is the exact
  // pipeline (orientation, wedge join, closure) under the oracle
  private val simhashMaxDistTri = 5

  val triangleCountSql: String =
    s"""WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS tokens
       |              FROM documents),
       |tokx AS (SELECT doc_id, unnest(tokens) AS t FROM toks WHERE len(tokens) > 0),
       |th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tokx),
       |bitsums AS (SELECT doc_id, j, SUM(((h >> j) % 2) * 2 - 1) AS s
       |            FROM th, range(60) r(j) GROUP BY 1, 2),
       |sigs AS (SELECT doc_id, SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS sig
       |         FROM bitsums GROUP BY 1),
       |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |          FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
       |          WHERE bit_count(xor(a.sig, b.sig)) <= $simhashMaxDistTri),
       |ed AS (SELECT doc_a AS x, doc_b AS y FROM pairs
       |       UNION ALL SELECT doc_b, doc_a FROM pairs),
       |deg AS (SELECT x, count(*) AS deg FROM ed GROUP BY x),
       |keyed AS (SELECT ed.x, ed.y,
       |            dx.deg * 1099511627776 + ed.x AS kx,
       |            dy.deg * 1099511627776 + ed.y AS ky
       |          FROM ed JOIN deg dx ON dx.x = ed.x JOIN deg dy ON dy.x = ed.y),
       |a AS (SELECT kx AS ku, ky AS kv, x AS u, y AS v FROM keyed WHERE kx < ky),
       |tri AS (SELECT e1.u AS ta, e1.v AS tb, e2.v AS tc
       |        FROM a e1 JOIN a e2 ON e1.ku = e2.ku AND e1.kv < e2.kv
       |        JOIN a e3 ON e3.ku = e1.kv AND e3.kv = e2.kv),
       |corners AS (SELECT ta AS doc_id FROM tri
       |            UNION ALL SELECT tb FROM tri
       |            UNION ALL SELECT tc FROM tri)
       |SELECT doc_id, count(*) AS n_triangles FROM corners GROUP BY doc_id""".stripMargin

  // ------------------------------------------------------- sql_udf_surface
  /** The custom-Expression SQL surface under the oracle: the session
    * registers graft's native codegen expressions
    * ([[graft.functions.GraftExtensions]] — `graft_simhash`, `graft_dot`,
    * ...) and this query is plain SQL TEXT using them, planned by Catalyst
    * like any built-in. The oracle replays `graft_simhash` through the
    * md5 bitsum construction — the SQL-registered kernel must produce the
    * identical 60-bit signatures the DataFrame form does.
    */
  def sqlUdfSurface(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.install(spark)
    Tables.documents(spark, dir).createOrReplaceTempView("documents_udf_v")
    spark.sql(
      """SELECT doc_id, graft_simhash(text, 60) AS sig
        |FROM documents_udf_v
        |WHERE size(filter(split(text, ' '), t -> length(t) > 0)) > 0""".stripMargin)
  }

  val sqlUdfSurfaceSql: String =
    """WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 0) AS tokens
      |              FROM documents),
      |tok AS (SELECT doc_id, unnest(tokens) AS t FROM toks WHERE len(tokens) > 0),
      |th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
      |bitsums AS (SELECT doc_id, j, SUM(((h >> j) % 2) * 2 - 1) AS s
      |            FROM th, range(60) r(j) GROUP BY 1, 2)
      |SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS sig
      |FROM bitsums GROUP BY 1""".stripMargin

  // --------------------------------------------------------- block_profile
  /** Blocking-key audit — the pre-flight check every blocked/banded join
    * (LSH bands, fuzzy-join blocks, IVF cells) should run before trusting
    * a key at scale: block-size distribution and the implied
    * candidate-pair cost Σ s·(s−1)/2. The round-5 scaling work found
    * exactly this failure (a low-entropy suffix key sent the fuzzy join
    * quadratic, SCALE.md); this query is that lesson as an operator.
    * Profiled key: the fuzzy join's 6-char name suffix over customer.
    * Scale design: one map-side-combined count per block, then a
    * handful of scalar aggregates over the block-count relation — the
    * profile costs one aggregation pass regardless of table size.
    */
  def blockProfile(spark: SparkSession, dir: String): DataFrame = {
    val blocks = Tables.customer(spark, dir)
      .groupBy(substring(col("c_name"), 13, 6).as("blk"))
      .agg(count(lit(1)).as("s"))
    blocks.agg(
      count(lit(1)).as("n_blocks"),
      max(col("s")).as("max_block"),
      sum(col("s")).as("n_rows"),
      // s·(s−1) is even, so integer div is exact — and stays in BIGINT
      // (a double sum would be fold-order-dependent)
      sum(expr("s * (s - 1) div 2")).as("candidate_pairs"),
      sum(when(col("s") === 1, 1L).otherwise(0L)).as("singleton_blocks"))
  }

  val blockProfileSql: String =
    """WITH blocks AS (
      |  SELECT substr(c_name, 13, 6) AS blk, count(*) AS s
      |  FROM customer GROUP BY 1)
      |SELECT count(*) AS n_blocks, max(s) AS max_block, CAST(sum(s) AS BIGINT) AS n_rows,
      |       CAST(sum(s * (s - 1) // 2) AS BIGINT) AS candidate_pairs,
      |       CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS singleton_blocks
      |FROM blocks""".stripMargin

  // --------------------------------------------------------- epoch_shuffle
  /** Deterministic per-epoch training order — pretraining reshuffles the
    * corpus every epoch, but a reproducible run (and a resumable one)
    * needs the permutation to be a pure function of (doc, epoch), not of
    * `rand()`: position = rank of md5(epoch ‖ doc_id). Emitted for two
    * epochs to show the permutations differ. Scale design: the rank is
    * [[graft.engine.Prefix]]'s two-pass cumsum of 1 over the hash order —
    * a global row_number window would serialize the corpus through one
    * task; this form's only serial step is partition-count-sized. The
    * hash is [[graft.engine.PortableHash]], so the oracle replays the
    * permutation exactly.
    */
  def epochShuffle(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    def epoch(e: Int): DataFrame = {
      val keyed = docs.withColumn("shuffle_key",
        PortableHash.md5Long(concat(lit(s"epoch$e|"), col("doc_id"))))
      // doc_id tiebreaker: 60-bit hashes collide at billion-doc scale
      // (birthday bound), and a tied key would make both the two-pass rank
      // and the oracle's row_number ill-defined
      graft.engine.Prefix
        .exclusiveCumsum(keyed, Seq(col("shuffle_key"), col("doc_id")), lit(1L), "pos")
        .select(col("doc_id"), lit(e.toLong).as("epoch"), col("pos"))
    }
    epoch(1).unionByName(epoch(2))
  }

  val epochShuffleSql: String = {
    def h(e: Int) = PortableHash.md5LongSql(s"'epoch$e|' || doc_id")
    s"""SELECT doc_id, 1 AS epoch,
       |       row_number() OVER (ORDER BY ${h(1)}, doc_id) - 1 AS pos
       |FROM documents
       |UNION ALL
       |SELECT doc_id, 2 AS epoch,
       |       row_number() OVER (ORDER BY ${h(2)}, doc_id) - 1 AS pos
       |FROM documents""".stripMargin
  }

  // ---------------------------------------------------------- fill_forward
  /** Last-observation-carried-forward imputation: each user's daily
    * purchase total, with inactive days taking the most recent prior
    * day's value (the standard feature-table densification before
    * training). Composes [[gapFill]]'s aggregate-sized day grid with an
    * ignore-nulls `last` window per user. Scale design: the window is
    * PARTITIONED by user (unlike a global sort it scales with the user
    * count); the grid explode stays aggregate-sized; one exchange on
    * user_id serves both the grid build and the window.
    */
  def fillForward(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase" && col("user_id") % 10 === 0)
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(sum(dec(col("value"))).cast("double").as("total"))
    val grid = daily.groupBy("user_id")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled", last(col("total"), ignoreNulls = true).over(w))
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("filled"))
  }

  val fillForwardSql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |  FROM events
      |  WHERE event_type = 'purchase' AND user_id % 10 = 0
      |  GROUP BY 1, 2),
      |grid AS (
      |  SELECT user_id,
      |         CAST(unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM daily GROUP BY user_id)
      |SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
      |       last_value(d.total IGNORE NULLS) OVER (
      |         PARTITION BY g.user_id ORDER BY g.day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      |FROM grid g LEFT JOIN daily d
      |  ON d.user_id = g.user_id AND d.day = g.day""".stripMargin

  // -------------------------------------------------------- anomaly_zscore
  /** Daily-revenue anomaly flags per event type, with the z-score test
    * done ENTIRELY in integer arithmetic: z² ≥ 4 (|z| ≥ 2σ) rewrites to
    * (n·y − Σy)² ≥ 4·(n·Σy² − (Σy)²), so no square root, no floating
    * division, and the oracle replays it exactly. Scale design: the same
    * two-level aggregation as linfit_trend (raw → daily partials → 1 row
    * of moments per type), then the flag is a broadcast join of the
    * per-type moment row back onto the daily relation. EVERY product and
    * the Σy² moment run in 128-bit arithmetic (Spark DECIMAL(38,0) ⇔
    * DuckDB HUGEINT): y² alone overflows a long once daily cents pass
    * ~2^31, and a silent wrap would flip flags while the oracle errors.
    * Headroom: values stay exact through daily cents ~10^15.
    */
  def anomalyZscore(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg((sum(dec(col("value"))) * 100).cast("long").as("y"))
      .withColumn("yd", col("y").cast(d38))
    val moments = daily.groupBy("event_type")
      .agg(count(lit(1)).cast(d38).as("n"), sum(col("yd")).as("sy"),
        sum(col("yd") * col("yd")).as("syy"))
    daily.join(moments, "event_type")
      .withColumn("dev", (col("n") * col("yd") - col("sy")).cast(d38))
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("y").as("y_cents"),
        col("dev").cast("long").as("dev_n"),
        (col("dev") * col("dev") >=
          lit(4).cast(d38) * (col("n") * col("syy") - col("sy") * col("sy")).cast(d38))
          .as("is_anomaly"))
  }

  // -------------------------------------------------------- robust_anomaly
  /** Median/MAD outlier flags per event type — the ROBUST twin of
    * [[anomalyZscore]]: mean/σ move with the outliers they're hunting,
    * the median and the median-absolute-deviation don't. Flags events
    * with |cents − median| > 3·MAD, entirely in exact integer cents.
    *
    * Both medians (value, then deviation) come from the VALUE-HISTOGRAM
    * quantile pattern (`winsorize_chars`): the only corpus-sized exchanges
    * are two map-side-combined groupBys — (type, cents) then (type, dev) —
    * and the rank windows run over histogram rows, bounded by value
    * cardinality, never by event count. The lower median (0-based index
    * (n−1) div 2) keeps everything integer: no interpolation, no floats,
    * bit-exact replay. The per-type (median, MAD) rows broadcast back.
    */
  def robustAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        (dec(col("value")) * 100).cast("long").as("cents"))
    def hist(df: DataFrame, valCol: String): DataFrame = {
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col(valCol))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val wTot = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
      df.groupBy(col("event_type"), col(valCol)).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(wCum))
        .withColumn("total", sum(col("c")).over(wTot))
    }
    def lowerMedian(h: DataFrame, valCol: String, out: String): DataFrame =
      h.filter(expr("(total - 1) div 2") >= col("cum") - col("c") &&
               expr("(total - 1) div 2") < col("cum"))
        .select(col("event_type"), col(valCol).as(out))
    val med = lowerMedian(hist(ev, "cents"), "cents", "med")
    val dev = ev.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("cents") - col("med")).as("dev"))
    val mad = lowerMedian(hist(dev, "dev"), "dev", "mad")
    ev.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
      .filter(abs(col("cents") - col("med")) > col("mad") * 3)
      .select("event_id", "event_type", "cents", "med", "mad")
  }

  val robustAnomalySql: String = {
    def histCte(src: String, valCol: String, name: String): String =
      s"""${name}h AS (SELECT event_type, $valCol, count(*) AS c FROM $src GROUP BY 1, 2),
         |$name AS (SELECT event_type, $valCol, c,
         |  sum(c) OVER (PARTITION BY event_type ORDER BY $valCol
         |               ROWS UNBOUNDED PRECEDING) AS cum,
         |  sum(c) OVER (PARTITION BY event_type) AS total FROM ${name}h)""".stripMargin
    s"""WITH ev AS (SELECT event_id, event_type,
       |            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM events),
       |${histCte("ev", "cents", "h1")},
       |med AS (SELECT event_type, cents AS med FROM h1
       |        WHERE (total - 1) // 2 >= cum - c AND (total - 1) // 2 < cum),
       |dv AS (SELECT e.event_type, abs(cents - med) AS dev FROM ev e JOIN med USING (event_type)),
       |${histCte("dv", "dev", "h2")},
       |mad AS (SELECT event_type, dev AS mad FROM h2
       |        WHERE (total - 1) // 2 >= cum - c AND (total - 1) // 2 < cum)
       |SELECT event_id, e.event_type, cents, med, mad
       |FROM ev e JOIN med USING (event_type) JOIN mad USING (event_type)
       |WHERE abs(cents - med) > mad * 3""".stripMargin
  }

  // -------------------------------------------- unbounded as-of via union
  /** Point-in-time lookup with UNBOUNDED lookback — the SCD2-style "which
    * version was active when this fact happened" join, built WITHOUT a
    * join: a bounded as-of (`asof_join`) can range-join because the
    * lookback window caps the candidates, but an unbounded one would pair
    * every fact with every earlier version. Instead both relations union
    * into one stream tagged by kind, and an IGNORE NULLS `last_value`
    * window per user carries the most recent click forward onto each
    * purchase — one user-keyed exchange total, zero candidate blowup, any
    * lookback depth. (The `fill_forward` idiom promoted to a join
    * replacement.) Purchases with no prior click surface with a null
    * click — the left-outer semantics.
    */
  def asofUnionJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("kind"),
        when(col("event_type") === "click", col("event_id")).as("click_marker"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      // clicks sort BEFORE purchases at the same timestamp (tie by kind
      // then id), so a same-instant click is visible to the purchase
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ev.withColumn("click_id", last(col("click_marker"), ignoreNulls = true).over(w))
      .filter(col("kind") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("click_id"))
  }

  val asofUnionJoinSql: String =
    """WITH ev AS (SELECT user_id, ts, event_id, event_type AS kind,
      |              CASE WHEN event_type = 'click' THEN event_id END AS click_marker
      |            FROM events WHERE event_type IN ('click', 'purchase'))
      |SELECT event_id AS purchase_id, user_id, click_id FROM (
      |  SELECT *, last_value(click_marker IGNORE NULLS) OVER (
      |           PARTITION BY user_id ORDER BY ts, kind, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id
      |  FROM ev)
      |WHERE kind = 'purchase'""".stripMargin

  // ----------------------------------------------------------- burst dedup
  /** Telemetry double-fire cleanup: events of the same (user, type) within
    * 5 minutes of the previous kept-or-dropped occurrence collapse to the
    * burst's FIRST event — the gaps-and-islands idiom keyed one level
    * deeper than sessionization. One (user, type)-keyed exchange; output
    * is the kept event set (the input to every downstream aggregate when
    * the pipeline distrusts its emitters).
    */
  def burstDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_ts").isNull ||
        col("ts") - col("prev_ts") >= expr("INTERVAL 5 MINUTES"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
  }

  val burstDedupSql: String =
    """SELECT event_id, user_id, event_type, ts FROM (
      |  SELECT *, lag(ts) OVER (PARTITION BY user_id, event_type
      |                          ORDER BY ts, event_id) AS prev_ts
      |  FROM events)
      |WHERE prev_ts IS NULL OR ts - prev_ts >= INTERVAL '5 minutes'""".stripMargin

  // --------------------------------------------------------- session paths
  /** Top user-journey paths: sessions close on a 30-minute inactivity gap
    * (the gaps-and-islands idiom shared with `session_agg`), each
    * session's ordered event types collapse to one `a>b>c` path string,
    * and the top 20 paths rank by (count, path) — a total order, so the
    * cut is deterministic. Scale shape: one user-keyed exchange builds
    * sessions; the per-session `collect_list` is bounded by session
    * LENGTH (human-scale, not corpus-scale); path counting is a
    * map-side-combined aggregate over path strings; the final cut is a
    * TakeOrdered, no global sort.
    */
  def sessionPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val s = Tables.events(spark, dir)
      .withColumn("brk",
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") - lag(col("ts"), 1).over(w) >= expr("INTERVAL 30 MINUTES"), 1)
          .otherwise(0))
      .withColumn("sid", sum(col("brk")).over(cum))
    s.groupBy(col("user_id"), col("sid"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  val sessionPathsSql: String =
    """WITH o AS (SELECT user_id, event_id, ts, event_type,
      |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |            >= INTERVAL '30 minutes'
      |       THEN 1 ELSE 0 END AS brk FROM events),
      |s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                               ROWS UNBOUNDED PRECEDING) AS sid FROM o),
      |paths AS (SELECT user_id, sid,
      |            string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      |          FROM s GROUP BY 1, 2)
      |SELECT path, count(*) AS n FROM paths GROUP BY 1
      |ORDER BY n DESC, path LIMIT 20""".stripMargin

  // ---------------------------------------------------- linear attribution
  /** Linear multi-touch attribution: each purchase's value splits EQUALLY
    * across the user's clicks in the preceding hour, and credited revenue
    * rolls up by click day — in exact integer MICRO-CENTS (cents·10⁶ div
    * touches), so the split is deterministic and the oracle replays it
    * bit-for-bit where a float division would drift in the last ulp.
    * Topology: one time-bounded equi-join builds the touch pairs, the
    * per-purchase touch count is a map-side-combined aggregate joined
    * back (aggregate-sized), and the day rollup moves only credited
    * pairs. The as-of family's candidates-then-weight shape.
    */
  def attributionLinear(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts"), (dec(col("value")) * 100).cast("long").as("cents"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val pairs = p.join(c, col("c_user") === col("user_id") &&
      col("c_ts") <= col("ts") &&
      col("c_ts") >= col("ts") - expr("INTERVAL 1 HOUR"))
    val touches = pairs.groupBy(col("p_id")).agg(count(lit(1)).as("k"))
    pairs.join(touches, "p_id")
      .select(date_format(col("c_ts").cast("date"), "yyyy-MM-dd").as("day"),
        expr("(cents * 1000000) div k").as("credit_micros"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit_micros")).cast("long").as("credited_micros"))
  }

  val attributionLinearSql: String =
    """WITH p AS (SELECT event_id AS p_id, user_id, ts,
      |             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id AS c_user, ts AS c_ts FROM events WHERE event_type = 'click'),
      |pairs AS (SELECT p.*, c.c_ts FROM p JOIN c ON c_user = user_id
      |          AND c_ts <= ts AND c_ts >= ts - INTERVAL '1 hour'),
      |t AS (SELECT p_id, count(*) AS k FROM pairs GROUP BY 1)
      |SELECT CAST(CAST(c_ts AS DATE) AS VARCHAR) AS day,
      |       count(*) AS n_touches,
      |       CAST(sum((cents * 1000000) // k) AS BIGINT) AS credited_micros
      |FROM pairs JOIN t USING (p_id)
      |GROUP BY 1""".stripMargin

  // ------------------------------------------------------ feature snapshot
  /** Point-in-time feature assembly — the feature-store discipline: every
    * feature is computed from events STRICTLY BEFORE the cutoff
    * (2024-01-20), so a model trained on this table can never leak the
    * future. One scan, one map-side-combined groupBy(user): recency
    * windows are conditional aggregates (no self-joins), the last event
    * rides a `max_by` struct (no window sort), money stays in exact
    * cents. At 100 TB this is the one-pass profile the training join
    * hangs off.
    */
  def featureSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
    val ev = Tables.events(spark, dir).filter(col("ts") < cutoff)
    ev.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("ts") >= cutoff - expr("INTERVAL 7 DAYS"), 1L)
          .otherwise(0L)).as("n_7d"),
        sum(when(col("event_type") === "purchase" &&
            col("ts") >= cutoff - expr("INTERVAL 7 DAYS"),
          (dec(col("value")) * 100).cast("long")).otherwise(0L)).as("spend_7d_cents"),
        // (ts, event_id) packed into one DECIMAL(38,0) ordering key — DuckDB's
        // arg_max takes no tuple ordering, so both engines rank the same scalar
        max_by(col("event_type"),
          expr("CAST(unix_micros(ts) AS DECIMAL(38,0)) * 1000000000 + event_id"))
          .as("last_type"),
        datediff(lit("2024-01-20").cast("date"), max(col("ts")).cast("date"))
          .cast("long").as("days_since_last"))
  }

  val featureSnapshotSql: String =
    """SELECT user_id, count(*) AS n_events,
      |  CAST(count(*) FILTER (ts >= TIMESTAMP '2024-01-20' - INTERVAL '7 days') AS BIGINT) AS n_7d,
      |  CAST(COALESCE(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    FILTER (event_type = 'purchase'
      |            AND ts >= TIMESTAMP '2024-01-20' - INTERVAL '7 days'), 0) AS BIGINT) AS spend_7d_cents,
      |  arg_max(event_type, epoch_us(ts)::HUGEINT * 1000000000 + event_id) AS last_type,
      |  CAST(date_diff('day', CAST(max(ts) AS DATE), DATE '2024-01-20') AS BIGINT) AS days_since_last
      |FROM events WHERE ts < TIMESTAMP '2024-01-20'
      |GROUP BY 1""".stripMargin

  // ------------------------------------------------------- A/B significance
  /** Two-proportion A/B significance in EXACT integer arithmetic — the
    * `anomaly_zscore` discipline applied to experiment readouts: users
    * hash-assign to arms (portable md5, replayed by the oracle), the
    * conversion metric is "any purchase", and |z| ≥ 2 rewrites to the
    * cross-multiplied integer inequality
    * (c1·n2 − c2·n1)²·N ≥ 4·n1·n2·C·(N−C), so no square root, no float
    * division, no drift — the significance FLAG itself is hash-verified.
    * Products run in DECIMAL(38,0) ⇔ HUGEINT (the cross term alone passes
    * 2^63 once arms reach ~10^5 users). One scan, one user-level
    * aggregate, then a 2-row pivot.
    */
  def abSignificance(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
      .withColumn("arm", PortableHash.md5Long(concat(lit("ab:"), col("user_id"))) % 2)
    val arms = users.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
    val d38 = "DECIMAL(38,0)"
    arms.groupBy()
      .agg(
        max(when(col("arm") === 0, col("n"))).as("n_a"),
        max(when(col("arm") === 0, col("c"))).as("c_a"),
        max(when(col("arm") === 1, col("n"))).as("n_b"),
        max(when(col("arm") === 1, col("c"))).as("c_b"))
      .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        expr(s"""CAST(c_a AS $d38) * n_b - CAST(c_b AS $d38) * n_a""").as("num"),
        // zero pooled variance (nobody / everybody converted) means z is
        // undefined and the proportions are equal — NOT significant; without
        // the guard the inequality degenerates to 0 >= 0 and flags true
        expr(s"""c_a + c_b > 0 AND c_a + c_b < n_a + n_b AND
                 (CAST(c_a AS $d38) * n_b - CAST(c_b AS $d38) * n_a)
                 * (CAST(c_a AS $d38) * n_b - CAST(c_b AS $d38) * n_a)
                 * (n_a + n_b)
                 >= 4 * CAST(n_a AS $d38) * n_b * (c_a + c_b)
                 * (n_a + n_b - c_a - c_b)""").as("significant"))
      .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        col("num").cast("long").as("diff_cross"), col("significant"))
  }

  val abSignificanceSql: String =
    """WITH u AS (SELECT user_id,
      |             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      |           FROM events GROUP BY 1),
      |a AS (SELECT (('0x' || substr(md5('ab:' || user_id), 1, 15))::BIGINT) % 2 AS arm,
      |             count(*) AS n, CAST(sum(conv) AS BIGINT) AS c FROM u GROUP BY 1),
      |p AS (SELECT max(CASE WHEN arm = 0 THEN n END) AS n_a,
      |             max(CASE WHEN arm = 0 THEN c END) AS c_a,
      |             max(CASE WHEN arm = 1 THEN n END) AS n_b,
      |             max(CASE WHEN arm = 1 THEN c END) AS c_b FROM a)
      |SELECT n_a, c_a, n_b, c_b,
      |       CAST(c_a::HUGEINT * n_b - c_b::HUGEINT * n_a AS BIGINT) AS diff_cross,
      |       c_a + c_b > 0 AND c_a + c_b < n_a + n_b AND
      |       (c_a::HUGEINT * n_b - c_b::HUGEINT * n_a)
      |         * (c_a::HUGEINT * n_b - c_b::HUGEINT * n_a)
      |         * (n_a + n_b)
      |       >= 4::HUGEINT * n_a * n_b * (c_a + c_b) * (n_a + n_b - c_a - c_b)
      |         AS significant
      |FROM p""".stripMargin

  // ------------------------------------------------------- time to convert
  /** Click→purchase latency percentiles per day — the funnel-latency SLA
    * readout, in EXACT integer seconds (no approx percentile, no float
    * sort): each purchase pairs with the user's latest click ≤ 1 h before
    * (the as-of topology: time-bounded equi-join on user + one
    * map-side-combined `max`), then p50/p90 come from the per-day integer
    * VALUE HISTOGRAM — the `robust_anomaly` order-statistic idiom, where
    * the quantile windows run over (day, lat_s) histogram rows, never raw
    * conversions. pXX is the lower order statistic at index
    * ((n−1)·XX)/100, exact and tie-free by construction.
    */
  def timeToConvert(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val lat = p.join(c, col("c_user") === col("user_id") &&
        col("c_ts") <= col("ts") &&
        col("c_ts") >= col("ts") - expr("INTERVAL 1 HOUR"))
      .groupBy(col("event_id"), col("ts"))
      .agg(max(col("c_ts")).as("cts"))
      .select(date_format(col("ts").cast("date"), "yyyy-MM-dd").as("day"),
        expr("(unix_micros(ts) - unix_micros(cts)) div 1000000").as("lat_s"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("day")).orderBy(col("lat_s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy(col("day"))
    val h = lat.groupBy(col("day"), col("lat_s")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("total", sum(col("c")).over(wTot))
    def pick(q: Int, out: String) =
      h.filter(expr(s"((total - 1) * $q) div 100") >= col("cum") - col("c") &&
               expr(s"((total - 1) * $q) div 100") < col("cum"))
        .select(col("day"), col("lat_s").as(out), col("total"))
    pick(50, "p50_s").select(col("day"), col("total").as("n_conv"), col("p50_s"))
      .join(pick(90, "p90_s").select(col("day"), col("p90_s")), "day")
  }

  val timeToConvertSql: String =
    """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id AS c_user, ts AS c_ts FROM events WHERE event_type = 'click'),
      |l AS (SELECT p.event_id, p.ts, max(c_ts) AS cts FROM p JOIN c ON c_user = user_id
      |      AND c_ts <= ts AND c_ts >= ts - INTERVAL '1 hour' GROUP BY 1, 2),
      |lat AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |               (epoch_us(ts) - epoch_us(cts)) // 1000000 AS lat_s FROM l),
      |h0 AS (SELECT day, lat_s, count(*) AS c FROM lat GROUP BY 1, 2),
      |h AS (SELECT day, lat_s, c,
      |        sum(c) OVER (PARTITION BY day ORDER BY lat_s ROWS UNBOUNDED PRECEDING) AS cum,
      |        sum(c) OVER (PARTITION BY day) AS total FROM h0),
      |p50 AS (SELECT day, lat_s AS p50_s, total FROM h
      |        WHERE ((total - 1) * 50) // 100 >= cum - c AND ((total - 1) * 50) // 100 < cum),
      |p90 AS (SELECT day, lat_s AS p90_s FROM h
      |        WHERE ((total - 1) * 90) // 100 >= cum - c AND ((total - 1) * 90) // 100 < cum)
      |SELECT day, CAST(total AS BIGINT) AS n_conv, p50_s, p90_s
      |FROM p50 JOIN p90 USING (day)""".stripMargin

  // ------------------------------------------------------ entity resolution
  /** End-to-end entity resolution — the record-linkage flagship composing
    * the library's stages: deterministic dirty-record synthesis (every 7th
    * customer gains a 1-edit name variant, the `pii_redact` injection
    * pattern), blocking on a stable name substring, edit-distance ≤ 1
    * verify on block collisions only (`fuzzy_join_edit`'s
    * candidates-then-verify topology), connected components
    * ([[graft.llm.Dedup.duplicateClusters]] — one shuffle per round), and
    * canonical-record survival per entity via map-side-combined `min_by`
    * (no window sort). Singleton records are their own entity.
    *
    * Scale: the only quadratic surface is WITHIN a block, and
    * `block_profile` is the pre-flight audit that bounds it; everything
    * downstream of the verify join moves pair/label rows, never records.
    */
  def entityResolution(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val base = cust.select(col("c_custkey").as("rec_id"), col("c_name").as("name"))
    val variants = cust.filter(col("c_custkey") % 7 === 0)
      .select((col("c_custkey") + 1000000L).as("rec_id"),
        concat(substring(col("c_name"), 1, 9), lit("X"),
          substring(col("c_name"), 11, 8)).as("name"))
    val recs = base.union(variants)
    val blocked = recs.withColumn("blk", substring(col("name"), 13, 6))
    val pairs = blocked.as("a").join(blocked.as("b"), "blk")
      .filter(col("a.rec_id") < col("b.rec_id") &&
        levenshtein(col("a.name"), col("b.name")) <= 1)
      .select(col("a.rec_id").as("doc_a"), col("b.rec_id").as("doc_b"))
    val clusters = graft.llm.Dedup.duplicateClusters(pairs)
    recs.join(clusters, col("rec_id") === col("doc_id"), "left")
      .select(col("rec_id"), col("name"),
        coalesce(col("cluster_id"), col("rec_id")).as("entity_id"))
      .groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_records"),
        min_by(col("name"), col("rec_id")).as("canonical_name"))
  }

  val entityResolutionSql: String =
    """WITH RECURSIVE recs AS (
      |  SELECT c_custkey AS rec_id, c_name AS name FROM customer
      |  UNION ALL
      |  SELECT c_custkey + 1000000, substr(c_name, 1, 9) || 'X' || substr(c_name, 11, 8)
      |  FROM customer WHERE c_custkey % 7 = 0),
      |b AS (SELECT rec_id, name, substr(name, 13, 6) AS blk FROM recs),
      |pairs AS (SELECT a.rec_id AS s, b2.rec_id AS d FROM b a JOIN b b2
      |          ON a.blk = b2.blk AND a.rec_id < b2.rec_id
      |          AND levenshtein(a.name, b2.name) <= 1),
      |ed AS (SELECT s, d FROM pairs UNION SELECT d, s FROM pairs),
      |reach(s, d) AS (SELECT s, d FROM ed
      |                UNION
      |                SELECT r.s, e.d FROM reach r JOIN ed e ON r.d = e.s),
      |lab AS (SELECT s AS rec_id, least(s, min(d)) AS entity_id FROM reach GROUP BY s),
      |lbl AS (SELECT r.rec_id, r.name, COALESCE(l.entity_id, r.rec_id) AS entity_id
      |        FROM recs r LEFT JOIN lab l USING (rec_id))
      |SELECT entity_id, count(*) AS n_records, arg_min(name, rec_id) AS canonical_name
      |FROM lbl GROUP BY 1""".stripMargin

  // -------------------------------------------------------- z-order layout
  /** Z-order (Morton-curve) data layout audit — the multi-dimensional
    * data-skipping story: interleaving the bits of two query dimensions
    * (customer bucket × day bucket) and range-partitioning on the result
    * gives every output file a TIGHT min/max envelope in BOTH dimensions,
    * so a point or range predicate on EITHER column prunes most files from
    * the scan (single-column sorting gives this for one dimension and
    * destroys it for the other). The query computes the per-file (z >> 8)
    * min/max envelopes a writer's footer stats would carry; PlansSpec-side
    * property: the z-layout's average x-span is a fraction of a date-sorted
    * layout's. At 100 TB this is `repartitionByRange(zCol)` before the
    * parquet write — one exchange at write time buys every future scan's
    * pruning.
    */
  private val zorderBits = 8

  private def zInterleave(x: Column, y: Column): Column =
    (0 until zorderBits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  def zorderLayout(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select((col("o_custkey") % 256).as("x"),
        (datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).cast("long") % 256).as("y"))
      .withColumn("z", zInterleave(col("x"), col("y")))
      .groupBy(expr("z div 256").as("z_file"))
      .agg(count(lit(1)).as("n"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))

  val zorderLayoutSql: String = {
    val terms = (0 until 8).map(i =>
      s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})").mkString(" + ")
    s"""WITH c AS (SELECT o_custkey % 256 AS x,
       |           date_diff('day', DATE '1995-01-01', o_orderdate::DATE) % 256 AS y
       |           FROM orders),
       |z AS (SELECT x, y, $terms AS z FROM c)
       |SELECT z // 256 AS z_file, count(*) AS n, min(x) AS min_x, max(x) AS max_x,
       |       min(y) AS min_y, max(y) AS max_y
       |FROM z GROUP BY 1""".stripMargin
  }

  // -------------------------------------------------------- co-purchase graph
  /** Undirected co-purchase edge set shared by the graph family: part
    * pairs appearing together in ≥ 2 orders (same support rule as
    * `copurchase_pairs`). One distinct (order, part) exchange; the
    * self-join keys on the order, so postings per key are bounded by
    * BASKET SIZE, not corpus size. Emitted in both directions, eagerly
    * [[graft.engine.Snapshot.pin]]'ed: the iterative callers (BFS
    * rounds, k-core peels) re-read it every round, and a pinned placement
    * keeps their plans constant-size (the `dup_clusters` Pregel rule;
    * `pin` is reliable-checkpoint-aware for clusters).
    */
  private def copurchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    val op = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p")).distinct()
    val e0 = op.select(col("k"), col("p").as("src"))
      .join(op.select(col("k"), col("p").as("dst")), "k")
      .filter(col("src") < col("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select(col("src"), col("dst"))
    e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .transform(graft.engine.Snapshot.pin)
  }

  private val copurchaseEdgesSql: String =
    """op AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
      |e0 AS (SELECT a.p AS src, b.p AS dst
      |       FROM op a JOIN op b ON a.k = b.k AND a.p < b.p
      |       GROUP BY 1, 2 HAVING count(*) >= 2),
      |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)""".stripMargin

  // -------------------------------------------------- multi-source BFS
  /** Multi-source breadth-first distance: hops from the nearest size-50
    * part through the co-purchase graph, capped at 3 — the "expansion
    * neighborhood" primitive behind related-item candidates and graph
    * feature generation. Pregel shape: each round is ONE join of the
    * current label set against the pinned edge list plus a min-aggregate
    * (map-side combined); the label frame is node-bounded, never
    * path-bounded, so the round cost is |E| regardless of path
    * multiplicity (the recursive-CTE oracle enumerates paths instead —
    * fine at oracle scale, exponential at corpus scale; the MIN collapse
    * is what makes the distributed form safe).
    */
  def graphBfs(spark: SparkSession, dir: String): DataFrame = {
    val edges = copurchaseEdges(spark, dir)
    var labels = Tables.part(spark, dir).filter(col("p_size") === 50)
      .select(col("p_partkey").as("node"), lit(0L).as("d"))
    for (_ <- 1 to 3) {
      val next = labels
        .join(edges.withColumnRenamed("src", "node"), "node")
        .select(col("dst").as("node"), (col("d") + 1).as("d"))
      labels = labels.unionByName(next)
        .groupBy(col("node")).agg(min(col("d")).as("d"))
        .transform(graft.engine.Snapshot.pin)
    }
    labels.select(col("node"), col("d").cast("long").as("dist"))
  }

  val graphBfsSql: String =
    s"""WITH RECURSIVE
       |$copurchaseEdgesSql,
       |bfs(node, d) AS (
       |  SELECT p_partkey, 0 FROM part WHERE p_size = 50
       |  UNION ALL
       |  SELECT e.dst, b.d + 1 FROM bfs b JOIN e ON b.node = e.src WHERE b.d < 3)
       |SELECT node, CAST(MIN(d) AS BIGINT) AS dist FROM bfs GROUP BY 1""".stripMargin

  // ------------------------------------------------------- k-core decomposition
  /** The k=3 core of the co-purchase graph: the maximal subgraph where
    * every node keeps ≥ 3 neighbors — the dense backbone that survives
    * after peeling hangers-on, the standard community-detection
    * preprocessing cut. Iterative peel: drop nodes with degree < k,
    * restrict edges to survivors, repeat to fixpoint (each round is one
    * map-side-combined degree count + one semi-join per endpoint — |E|
    * work per round, Pregel-style, lineage cut per round). Converges in
    * ≤ maxRounds or throws (the `duplicateClusters` non-convergence
    * contract); the oracle replays the same bounded peel unrolled —
    * rounds past the fixpoint are no-ops, so the two agree whenever the
    * Spark side converges. Output: core members with their core degree.
    */
  def kcoreParts(spark: SparkSession, dir: String): DataFrame = {
    val k = 3
    val maxRounds = 14
    var edges = copurchaseEdges(spark, dir)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val keep = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("n"))
      val pruned = edges
        .join(keep.withColumnRenamed("n", "src"), "src", "left_semi")
        .join(keep.withColumnRenamed("n", "dst"), "dst", "left_semi")
        .select(col("src"), col("dst")).transform(graft.engine.Snapshot.pin)
      converged = pruned.count() == edges.count()
      edges = pruned
      round += 1
    }
    if (!converged) throw new IllegalStateException(
      s"kcoreParts did not converge after $maxRounds peel rounds")
    edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("long").as("core_degree"))
  }

  val kcorePartsSql: String = {
    // unrolled peel: g0 = full edge set; each round keeps nodes with
    // degree >= 3 and restricts edges to them (no-op once converged)
    // AS MATERIALIZED: each round references the previous one 3x — left
    // inlined, the CTE tree (and its parquet opens) grows 3^14-fold
    val rounds = (1 to 14).map { r =>
      s"""n$r AS MATERIALIZED (SELECT src AS n FROM g${r - 1} GROUP BY 1 HAVING count(*) >= 3),
         |g$r AS MATERIALIZED (SELECT g.src, g.dst FROM g${r - 1} g
         |        JOIN n$r a ON g.src = a.n JOIN n$r b ON g.dst = b.n)""".stripMargin
    }.mkString(",\n")
    s"""WITH
       |$copurchaseEdgesSql,
       |g0 AS MATERIALIZED (SELECT src, dst FROM e),
       |$rounds
       |SELECT src AS node, CAST(count(*) AS BIGINT) AS core_degree
       |FROM g14 GROUP BY 1""".stripMargin
  }

  // ------------------------------------------------------ peak concurrency
  /** Peak concurrent sessions per day — the sweep-line operator: sessions
    * (30-minute-gap islands, the `session_agg` idiom) become ±1 deltas at
    * their closed-interval endpoints, a GLOBAL running sum over time gives
    * the live-session count at every boundary, and the per-day max is the
    * capacity-planning readout. The global running sum is the two-pass
    * range-partitioned prefix sum ([[graft.engine.Prefix]]) — a naive
    * `Window.orderBy(t)` would serialize 100 TB of deltas through one
    * task. Tie order (t, +1 before −1, user, sid) counts closed intervals:
    * back-to-back sessions touching at t overlap at t, and a single-event
    * (point) session still registers. Everything downstream of sessionization moves TWO
    * rows per session, not per event.
    */
  def peakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val s = Tables.events(spark, dir)
      .withColumn("brk",
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") - lag(col("ts"), 1).over(w) >= expr("INTERVAL 30 MINUTES"), 1)
          .otherwise(0))
      .withColumn("sid", sum(col("brk")).over(cum))
    // registered for the same reason as concurrency_histogram's sess: the
    // union reads it twice and the prefix build materializes its input
    // twice more (sampling + exchange) — the windowed subtree otherwise
    // runs up to 4x per query (round 11, profiled at sf0.1)
    val sess = s.groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
      .transform(graft.engine.QueryCaches.registered)
    val deltas = sess
      .select(col("start_ts").as("t"), lit(1L).as("d"), col("user_id"), col("sid"))
      .unionByName(sess
        .select(col("end_ts").as("t"), lit(-1L).as("d"), col("user_id"), col("sid")))
    graft.engine.Prefix.exclusiveCumsum(deltas,
        Seq(col("t"), col("d").desc, col("user_id"), col("sid")), col("d"), "prior")
      .withColumn("conc", col("prior") + col("d"))
      .groupBy(date_format(col("t"), "yyyy-MM-dd").as("day"))
      .agg(max(col("conc")).cast("long").as("peak_sessions"))
  }

  val peakConcurrencySql: String =
    """WITH o AS (SELECT user_id, ts, event_id,
      |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |            >= INTERVAL '30 minutes'
      |       THEN 1 ELSE 0 END AS brk FROM events),
      |s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                               ROWS UNBOUNDED PRECEDING) AS sid FROM o),
      |sess AS (SELECT user_id, sid, min(ts) AS start_ts, max(ts) AS end_ts
      |         FROM s GROUP BY 1, 2),
      |deltas AS (SELECT start_ts AS t, 1 AS d, user_id, sid FROM sess
      |           UNION ALL
      |           SELECT end_ts, -1, user_id, sid FROM sess),
      |run AS (SELECT t, SUM(d) OVER (ORDER BY t, d DESC, user_id, sid
      |                               ROWS UNBOUNDED PRECEDING) AS conc
      |        FROM deltas)
      |SELECT strftime(t, '%Y-%m-%d') AS day,
      |       CAST(MAX(conc) AS BIGINT) AS peak_sessions
      |FROM run GROUP BY 1""".stripMargin

  // ---------------------------------------------------------- 2D skyline
  /** Skyline (Pareto frontier) of parts: cheapest-for-their-size — no
    * other part is both cheaper-or-equal and bigger-or-equal with one
    * strict. The naive form is an O(N²) dominance self-join; the staircase
    * form here is linear: collapse to max-size-per-price (one map-side-
    * combined aggregate), take the exclusive prefix max of size in price
    * order (two-pass [[graft.engine.Prefix.exclusiveCumMax]] — no global
    * single-task window), and keep prices whose best size strictly beats
    * every cheaper price's. The frontier is a monotone staircase, so its
    * cardinality is bounded by the SIZE domain (≤ |distinct sizes|, 50
    * here) — broadcasting it back to tag the winning parts is
    * construction-bounded, never data-sized.
    */
  def skylineParts(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
    val pts = part.groupBy(col("p_retailprice"))
      .agg(max(col("p_size").cast("long")).as("msz"))
    val frontier = graft.engine.Prefix
      .exclusiveCumMax(pts, Seq(col("p_retailprice")), col("msz"), "runmax")
      .filter(col("runmax").isNull || col("msz") > col("runmax"))
      .select(col("p_retailprice").as("fp"), col("msz").as("fs"))
    part.join(broadcast(frontier),
        col("p_retailprice") === col("fp") &&
          col("p_size").cast("long") === col("fs"), "left_semi")
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"), col("p_size"))
  }

  val skylinePartsSql: String =
    """SELECT p_partkey, p_name, p_retailprice, p_size
      |FROM part p
      |WHERE NOT EXISTS (SELECT 1 FROM part q
      |  WHERE (q.p_retailprice <  p.p_retailprice AND q.p_size >= p.p_size)
      |     OR (q.p_retailprice <= p.p_retailprice AND q.p_size >  p.p_size))""".stripMargin

  val anomalyZscoreSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |moments AS (
      |  SELECT event_type, count(*)::HUGEINT AS n, sum(y::HUGEINT) AS sy,
      |         sum(y::HUGEINT * y::HUGEINT) AS syy
      |  FROM daily GROUP BY 1)
      |SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.y AS y_cents,
      |       CAST(m.n * d.y::HUGEINT - m.sy AS BIGINT) AS dev_n,
      |       ((m.n * d.y - m.sy) * (m.n * d.y - m.sy) >=
      |        4::HUGEINT * (m.n * m.syy - m.sy * m.sy)) AS is_anomaly
      |FROM daily d JOIN moments m USING (event_type)""".stripMargin

  // -------------------------------------------------------- nearest_join
  /** Bidirectional nearest-in-time join: each purchase pairs with the
    * temporally CLOSEST click of the same user — before or after, ties to
    * the earlier click — with unbounded reach in both directions. Built
    * WITHOUT a range join (the `asof_union_join` idiom, now two-sided):
    * clicks and purchases union into one user-keyed stream ordered by
    * (ts, kind, id); an IGNORE NULLS `last_value` over the preceding
    * frame carries the latest click at-or-before, a `first_value` over
    * the following frame fetches the earliest click after, and a scalar
    * comparison picks the nearer side. One exchange, zero candidate
    * blowup at ANY lookback/lookahead depth — the pattern a 100 TB
    * sessionized join needs when windows cannot bound the search.
    */
  def nearestJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(0).as("kind"), col("ts").as("c_ts"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(1).as("kind"), lit(null).cast("timestamp").as("c_ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"), col("event_id"))
    val back = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val fwd = w.rowsBetween(0,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    clicks.unionByName(buys)
      .withColumn("prev_c", last(col("c_ts"), ignoreNulls = true).over(back))
      .withColumn("next_c", first(col("c_ts"), ignoreNulls = true).over(fwd))
      .filter(col("kind") === 1)
      .withColumn("db", unix_micros(col("ts")) - unix_micros(col("prev_c")))
      .withColumn("df", unix_micros(col("next_c")) - unix_micros(col("ts")))
      .withColumn("nearest_c",
        when(col("prev_c").isNull, col("next_c"))
          .when(col("next_c").isNull, col("prev_c"))
          .when(col("db") <= col("df"), col("prev_c"))
          .otherwise(col("next_c")))
      .filter(col("nearest_c").isNotNull)
      .select(col("event_id").as("p_id"), col("user_id"),
        col("nearest_c"),
        abs(unix_micros(col("ts")) - unix_micros(col("nearest_c"))).as("gap_us"))
  }

  val nearestJoinSql: String =
    """WITH u AS (
      |  SELECT user_id, ts, event_id, 0 AS kind, ts AS c_ts
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, ts, event_id, 1 AS kind, NULL AS c_ts
      |  FROM events WHERE event_type = 'purchase'),
      |s AS (SELECT *,
      |        last_value(c_ts IGNORE NULLS) OVER
      |          (PARTITION BY user_id ORDER BY ts, kind, event_id
      |           ROWS UNBOUNDED PRECEDING) AS prev_c,
      |        first_value(c_ts IGNORE NULLS) OVER
      |          (PARTITION BY user_id ORDER BY ts, kind, event_id
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_c
      |      FROM u),
      |p AS (SELECT *, epoch_us(ts) - epoch_us(prev_c) AS db,
      |             epoch_us(next_c) - epoch_us(ts) AS df
      |      FROM s WHERE kind = 1),
      |n AS (SELECT event_id, user_id, ts,
      |        CASE WHEN prev_c IS NULL THEN next_c
      |             WHEN next_c IS NULL THEN prev_c
      |             WHEN db <= df THEN prev_c ELSE next_c END AS nearest_c
      |      FROM p)
      |SELECT event_id AS p_id, user_id, nearest_c,
      |       abs(epoch_us(ts) - epoch_us(nearest_c)) AS gap_us
      |FROM n WHERE nearest_c IS NOT NULL""".stripMargin

  // --------------------------------------------------------- cusum_shift
  /** CUSUM change-point statistics on daily revenue per event type — the
    * classic mean-shift monitor (Page 1954), in exact integer cents. The
    * recurrences S_i = max(0, S_{i-1} + D_i) / T_i = max(0, T_{i-1} − D_i)
    * look inherently sequential, but both decompose into ASSOCIATIVE
    * scans: with P_i the prefix sum of deviations D_j = x_j − target,
    *
    *   S_i = P_i − min(0, min_{j≤i} P_j)   (upward shift)
    *   T_i = max(0, max_{j≤i} P_j) − P_i   (downward shift)
    *
    * so the whole statistic is one running sum + one running min + one
    * running max — all parallel-prefix shapes. Here the scan windows
    * partition by event type over the DAY domain (time-bounded, the
    * markov/seasonality pattern); an unbounded-key variant would lift the
    * same three scans onto [[graft.engine.Prefix]] unchanged, which is the
    * point of the decomposition. The per-type target (mean daily cents,
    * floor division) folds in from a type-domain-sized aggregate.
    */
  def cusumShift(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(sum(dec(col("value")) * 100).cast("long").as("y_cents"))
    val tgt = daily.groupBy(col("event_type"))
      .agg(expr("sum(y_cents) div count(*)").as("target"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    daily.join(broadcast(tgt), "event_type")
      .withColumn("d", col("y_cents") - col("target"))
      .withColumn("p", sum(col("d")).over(w))
      .withColumn("pmin", least(lit(0L), min(col("p")).over(w)))
      .withColumn("pmax", greatest(lit(0L), max(col("p")).over(w)))
      .select(col("event_type"), col("day"), col("y_cents"),
        (col("p") - col("pmin")).as("cusum_up"),
        (col("pmax") - col("p")).as("cusum_down"))
  }

  val cusumShiftSql: String =
    """WITH daily AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS y_cents
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(SUM(y_cents) AS BIGINT) // count(*) AS target
      |      FROM daily GROUP BY 1),
      |s1 AS (SELECT d.event_type, d.day, d.y_cents,
      |         SUM(d.y_cents - t.target) OVER (PARTITION BY event_type
      |           ORDER BY day ROWS UNBOUNDED PRECEDING) AS p
      |       FROM daily d JOIN t USING (event_type)),
      |s2 AS (SELECT *,
      |         LEAST(0, MIN(p) OVER pw) AS pmin,
      |         GREATEST(0, MAX(p) OVER pw) AS pmax
      |       FROM s1
      |       WINDOW pw AS (PARTITION BY event_type ORDER BY day
      |                     ROWS UNBOUNDED PRECEDING))
      |SELECT event_type, day, y_cents,
      |       CAST(p - pmin AS BIGINT) AS cusum_up,
      |       CAST(pmax - p AS BIGINT) AS cusum_down
      |FROM s2""".stripMargin

  // -------------------------------------------------------- window_funnel
  /** Ordered funnel within a time window (ClickHouse `windowFunnel` shape):
    * view → click → purchase, each stage STRICTLY after the previous and
    * all within 24 hours of the first view; output is the per-level user
    * histogram with conversion share. Computed as a cascade of three
    * stage-filtered aggregates — each stage is a type-pruned scan (filter
    * pushed to parquet), one key-partitioned join against the previous
    * stage's per-user minimum, and a map-side-combined min — never a
    * per-user event sort or a collect_list buffer, so a hot user costs
    * O(its events), not O(events²), and no stage holds unbounded state.
    * The level histogram folds with a broadcast 1-row total.
    */
  def windowFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") > col("t1") &&
        col("ts") <= col("t1") + expr("INTERVAL 24 HOUR"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").join(v, "user_id")
      .filter(col("ts") > col("t2") &&
        col("ts") <= col("t1") + expr("INTERVAL 24 HOUR"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val lvl = v
      .join(c.select(col("user_id"), lit(1).as("has2")), Seq("user_id"), "left")
      .join(p.select(col("user_id"), lit(1).as("has3")), Seq("user_id"), "left")
      .select(when(col("has3").isNotNull, 3L)
        .when(col("has2").isNotNull, 2L).otherwise(1L).as("level"))
    val tot = lvl.agg(count(lit(1)).as("n1"))
    lvl.groupBy(col("level")).agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(tot))
      .select(col("level"), col("n_users"),
        expr("(10000 * n_users) div n1").as("share_bp"))
  }

  val windowFunnelSql: String =
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS t2
      |      FROM events e JOIN v USING (user_id)
      |      WHERE e.event_type = 'click' AND e.ts > v.t1
      |        AND e.ts <= v.t1 + INTERVAL 24 HOUR GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS t3
      |      FROM events e JOIN c USING (user_id) JOIN v USING (user_id)
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      |        AND e.ts <= v.t1 + INTERVAL 24 HOUR GROUP BY 1),
      |l AS (SELECT v.user_id,
      |        CASE WHEN p.user_id IS NOT NULL THEN 3
      |             WHEN c.user_id IS NOT NULL THEN 2 ELSE 1 END AS level
      |      FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)),
      |t AS (SELECT count(*) AS n1 FROM l)
      |SELECT CAST(level AS BIGINT) AS level, count(*) AS n_users,
      |       (10000 * count(*)) // t.n1 AS share_bp
      |FROM l CROSS JOIN t GROUP BY 1, t.n1""".stripMargin

  // ----------------------------------------------------- json_props_stats
  /** Semi-structured column surface: the JSON `props` payload parsed with a
    * declared schema (`from_json` — Catalyst's JSON reader with codegen, the
    * schema-on-read path a 100 TB event table uses instead of regex
    * scraping) and aggregated per event type. Malformed documents parse to
    * NULL on both engines (`from_json`'s PERMISSIVE null ⇔ the oracle's
    * `json_valid` guard, per the DuckDB-throws-on-bad-JSON gotcha), so
    * n_valid < n_events is the malformation signal a DQ gate alerts on.
    * One projected scan, one map-side-combined aggregate; the distinct
    * count is over the small parsed-value domain.
    */
  def jsonPropsStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), count(col("k")).as("n_valid"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        sum(col("k")).as("sum_k"), countDistinct(col("k")).as("distinct_k"))

  val jsonPropsStatsSql: String =
    """WITH p AS (SELECT event_type,
      |  CASE WHEN json_valid(props)
      |       THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k
      |  FROM events)
      |SELECT event_type, count(*) AS n_events, count(k) AS n_valid,
      |       min(k) AS min_k, max(k) AS max_k,
      |       CAST(SUM(k) AS BIGINT) AS sum_k,
      |       count(DISTINCT k) AS distinct_k
      |FROM p GROUP BY 1""".stripMargin

  // ---------------------------------------------------- late_arrival_stats
  /** Out-of-order arrival diagnostic — the statistic that SIZES a
    * watermark. For each event, lateness = how far its event time trails
    * the maximum event time already ingested (arrival order = the monotone
    * `event_id` ingest sequence); per event type we report how many events
    * were late, how late the worst was, and the total slack. A streaming
    * deployment reads `max_late_s` directly as the `withWatermark` delay
    * that would have lost zero events (and `late_bp` as the loss rate a
    * tighter bound would incur).
    *
    * Scale design: the "running max over everything ingested so far" is an
    * associative prefix — [[graft.engine.Prefix.exclusiveCumMax]] computes
    * it with a range partition + per-partition window + broadcast offsets
    * (never a single-task global window), and the rest is one map-side-
    * combined aggregate. All arithmetic in integer microseconds.
    */
  def lateArrivalStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    graft.engine.Prefix.exclusiveCumMax(
        ev, Seq(col("event_id")), col("ts_us"), "prior_max_us")
      .withColumn("late_s",
        when(col("prior_max_us").isNotNull && col("prior_max_us") > col("ts_us"),
          expr("(prior_max_us - ts_us) div 1000000")).otherwise(lit(0L)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_s") > 0, 1L).otherwise(0L)).as("n_late"),
        max(col("late_s")).as("max_late_s"),
        sum(col("late_s")).as("sum_late_s"))
      .withColumn("late_bp", expr("(10000 * n_late) div n_events"))
  }

  val lateArrivalStatsSql: String =
    """WITH m AS (SELECT event_type, epoch_us(ts) AS ts_us,
      |                  max(epoch_us(ts)) OVER (ORDER BY event_id
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      |           FROM events),
      |d AS (SELECT event_type,
      |             CASE WHEN pm IS NOT NULL AND pm > ts_us
      |                  THEN (pm - ts_us) // 1000000 ELSE 0 END AS late_s
      |      FROM m)
      |SELECT event_type, count(*) AS n_events,
      |       CAST(SUM(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      |       CAST(max(late_s) AS BIGINT) AS max_late_s,
      |       CAST(SUM(late_s) AS BIGINT) AS sum_late_s,
      |       CAST((10000 * SUM(CASE WHEN late_s > 0 THEN 1 ELSE 0 END))
      |            // count(*) AS BIGINT) AS late_bp
      |FROM d GROUP BY 1""".stripMargin

  // ------------------------------------------------- concurrency_histogram
  /** Time-in-state histogram: for each concurrency level (number of
    * simultaneously active 30-minute-gap sessions), the total wall-clock
    * time the system spent at that level — the dwell-time complement of
    * `peak_concurrency`'s max sweep, and the input to capacity planning
    * (P(level ≥ k) = Σ total_us over levels ≥ k / horizon).
    *
    * Scale design: the sweep points (+1 at session start, −1 at end) form
    * the usual event-boundary relation; the running level and a global
    * rank over the sweep order are BOTH two-pass range-partitioned
    * prefixes ([[graft.engine.Prefix.exclusiveCumsum]] — no single-task
    * window), and "next boundary's timestamp" is a self-equi-join on
    * rank+1 (co-partitioned, no window at all). Dwell is integer micros;
    * level 0 rows are the idle gaps between sessions.
    */
  def concurrencyHistogram(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val s = Tables.events(spark, dir)
      .withColumn("brk",
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") - lag(col("ts"), 1).over(w) >= expr("INTERVAL 30 MINUTES"), 1)
          .otherwise(0))
      .withColumn("sid", sum(col("brk")).over(cum))
    // the session-ization subtree (events scan + two user-keyed windows +
    // groupBy) feeds BOTH union branches of the sweep relation, and the
    // range-partitioned prefix build below materializes its input twice
    // more (boundary sampling + the exchange itself) — unregistered, the
    // windowed subtree ran up to 4x per query (profiled at sf0.1; the
    // same round-11 finding as weighted_median's collapsed relation)
    val sess = s.groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
      .transform(graft.engine.QueryCaches.registered)
    val deltas = sess
      .select(col("start_ts").as("t"), lit(1L).as("d"), col("user_id"), col("sid"))
      .unionByName(sess
        .select(col("end_ts").as("t"), lit(-1L).as("d"), col("user_id"), col("sid")))
    val ord = Seq(col("t"), col("d").desc, col("user_id"), col("sid"))
    // the running level AND the global rank are prefix sums over the SAME
    // sweep order — ONE fused two-pass build (one range exchange + pin)
    // instead of two chained single-value builds (round 11; exact — prefix
    // values are placement-invariant, see Prefix.exclusiveCumsums)
    val ranked = graft.engine.Prefix.exclusiveCumsums(deltas, ord,
        Seq(col("d") -> "prior", lit(1L) -> "rank0"))
      .withColumn("level", col("prior") + col("d"))
    val next = ranked.select(col("rank0").as("nrank"), col("t").as("nt"))
    ranked.join(next, col("rank0") + 1 === col("nrank"))
      .withColumn("dwell_us", unix_micros(col("nt")) - unix_micros(col("t")))
      .filter(col("dwell_us") > 0)
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_intervals"), sum(col("dwell_us")).as("total_us"))
  }

  val concurrencyHistogramSql: String =
    """WITH o AS (SELECT user_id, ts, event_id,
      |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |            >= INTERVAL '30 minutes'
      |       THEN 1 ELSE 0 END AS brk FROM events),
      |s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                               ROWS UNBOUNDED PRECEDING) AS sid FROM o),
      |sess AS (SELECT user_id, sid, min(ts) AS start_ts, max(ts) AS end_ts
      |         FROM s GROUP BY 1, 2),
      |deltas AS (SELECT start_ts AS t, 1 AS d, user_id, sid FROM sess
      |           UNION ALL
      |           SELECT end_ts, -1, user_id, sid FROM sess),
      |run AS (SELECT t,
      |               SUM(d) OVER (ORDER BY t, d DESC, user_id, sid
      |                            ROWS UNBOUNDED PRECEDING) AS level,
      |               lead(t) OVER (ORDER BY t, d DESC, user_id, sid) AS nt
      |        FROM deltas)
      |SELECT CAST(level AS BIGINT) AS level,
      |       count(*) AS n_intervals,
      |       CAST(SUM(epoch_us(nt) - epoch_us(t)) AS BIGINT) AS total_us
      |FROM run WHERE nt IS NOT NULL AND epoch_us(nt) > epoch_us(t)
      |GROUP BY 1""".stripMargin

  // ------------------------------------------------------ sequence_motifs
  /** Frequent behavioral trigrams — the top 50 consecutive event-type
    * triples across all user streams with occurrence and distinct-user
    * counts (the motif mining behind "what do users do before X"
    * product analytics). Full-key tie-breaks make the top-50 cut
    * deterministic.
    *
    * Scale design: `lead` over user-keyed windows (each user's stream
    * sorts within its partition — no global order), one map-side-combined
    * aggregate over a motif domain bounded by |event types|³, and a
    * TakeOrdered top-k of that tiny domain. Raw events are scanned once.
    */
  def sequenceMotifs(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("s2", lead(col("event_type"), 1).over(w))
      .withColumn("s3", lead(col("event_type"), 2).over(w))
      .filter(col("s3").isNotNull)
      .groupBy(col("event_type").as("s1"), col("s2"), col("s3"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
      .limit(50)
  }

  val sequenceMotifsSql: String =
    """WITH t AS (SELECT user_id, event_type AS s1,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s2,
      |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s3
      |  FROM events)
      |SELECT s1, s2, s3, count(*) AS n,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM t WHERE s3 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY n DESC, s1, s2, s3
      |LIMIT 50""".stripMargin

  // ------------------------------------------------------ compaction_bins
  /** Small-file compaction planner (the OPTIMIZE/bin-packing shape every
    * lakehouse runs): within each source, documents are packed in doc_id
    * order into ~`target`-sized bins by offset — bin = exclusive running
    * size ÷ target — and the plan reports each bin's member count, byte
    * total, and id range (the compaction job's input manifest).
    *
    * Scale design: one keyed window per source (each source's running sum
    * is its own partition — parallel across sources; a single giant source
    * would range-partition through [[graft.engine.Prefix]] instead) and
    * one map-side-combined aggregate. The offset-based rule is exactly how
    * `spark.sql.files.maxPartitionBytes` packs scan splits: deterministic,
    * order-preserving, and a doc that straddles a boundary belongs to the
    * bin its first byte falls in.
    */
  def compactionBins(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("prior_chars", coalesce(sum(col("n_chars")).over(w), lit(0L)))
      .withColumn("bin", expr("prior_chars div 65536"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  val compactionBinsSql: String =
    """WITH p AS (SELECT source, doc_id, n_chars,
      |  COALESCE(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior_chars
      |  FROM documents)
      |SELECT source, CAST(prior_chars // 65536 AS BIGINT) AS bin, count(*) AS n_docs,
      |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM p GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------- shard_assignment
  /** Hash-shard layout planning: every document is assigned a shard by
    * the md5 idiom (deterministic, partition-independent), and the query
    * emits the per-shard occupancy with its deviation from ideal in
    * basis points — the pre-flight a 100 TB writer runs before
    * committing to a shard count (`skew_bp` far from 10000 means the
    * shard key is bad). One scan, one map-side-combined aggregate over
    * the 64-row shard domain, one broadcast 1-row total fold-in.
    */
  def shardAssignment(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        pmod(PortableHash.md5Long(concat(lit("shard"), col("doc_id"))), lit(64))
          .as("shard"))
    val per = docs.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    // full 0..63 domain: an EMPTY shard is the worst skew signal there is,
    // and a plain groupBy would silently omit it
    val domain = spark.range(64).select(col("id").as("shard"))
    val tot = per.agg(sum(col("n_docs")).as("all_docs"))
    domain.join(per, Seq("shard"), "left")
      .select(col("shard"), coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("total_chars"), lit(0L)).as("total_chars"))
      .crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("total_chars"),
        expr("(10000 * n_docs * 64) div all_docs").as("skew_bp"))
  }

  val shardAssignmentSql: String =
    s"""WITH per AS (SELECT ${PortableHash.md5LongSql("'shard' || doc_id")} % 64 AS shard,
       |              count(*) AS n_docs,
       |              CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |            FROM documents GROUP BY 1),
       |dom AS (SELECT range AS shard FROM range(64)),
       |filled AS (SELECT dom.shard, coalesce(n_docs, 0) AS n_docs,
       |                  coalesce(total_chars, 0) AS total_chars
       |           FROM dom LEFT JOIN per ON dom.shard = per.shard),
       |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS all_docs FROM filled)
       |SELECT shard, CAST(n_docs AS BIGINT) AS n_docs,
       |       CAST(total_chars AS BIGINT) AS total_chars,
       |       (10000 * n_docs * 64) // all_docs AS skew_bp
       |FROM filled, tot""".stripMargin

  // -------------------------------------------------- decayed_engagement
  /** Time-decayed engagement features — the freshness-weighted activity
    * score every ranking/personalization pipeline derives, kept EXACT:
    * the decay is a per-day halving implemented as an integer right
    * shift (cents >> age_days), so the score is a sum of integers, not
    * a float exp() — order-independent, partition-independent, and
    * replayed bit-for-bit by the oracle. Reference time is the corpus
    * max event time (broadcast 1-row aggregate, the tfidf pattern), so
    * the query is deterministic with no wall clock.
    *
    * Scale shape: one scan, the 1-row cutoff fold-in, one map-side-
    * combined aggregate on user_id. Shifts ≥ 63 are zeroed explicitly
    * (Java's >> wraps the shift count at 64; DuckDB's doesn't — the
    * guard is what keeps the engines identical on ancient events).
    */
  /** The guarded halving-decay kernel over columns `cents` and `age` —
    * public so the wrap guard is spec-pinned ([[PipelinePropsSpec]]):
    * Java's shift wraps its count at 64 (`cents >> 64 == cents`, i.e. an
    * ancient event would come back UNDECAYED), DuckDB's returns 0, so the
    * explicit `age >= 63` zero is what keeps the engines identical.
    */
  def decayedCentsExpr: Column =
    when(col("age") >= 63, 0L)
      .otherwise(expr("shiftright(cents, cast(age AS int))"))

  def decayedEngagement(spark: SparkSession, dir: String): DataFrame = {
    import graft.engine.Tables.events
    val ev = events(spark, dir).select(col("user_id"), col("event_type"),
      col("ts"), (dec(col("value")) * 100).cast("long").as("cents"))
    val cutoff = ev.agg(max(col("ts")).as("cut"))
    ev.crossJoin(broadcast(cutoff))
      .withColumn("age", datediff(col("cut"), col("ts")).cast("long"))
      .withColumn("decayed", decayedCentsExpr)
      .groupBy(col("user_id"))
      .agg(sum(col("decayed")).as("score"),
        sum(when(col("event_type") === "purchase", col("decayed"))
          .otherwise(0L)).as("purchase_score"),
        max(col("age")).as("oldest_age"), count(lit(1)).as("n_events"))
  }

  val decayedEngagementSql: String =
    """WITH ev AS (SELECT user_id, event_type, ts,
      |              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |            FROM events),
      |cut AS (SELECT max(ts) AS cut FROM ev),
      |d AS (SELECT user_id, event_type,
      |        CAST(date_diff('day', CAST(ts AS DATE), CAST(cut AS DATE)) AS BIGINT) AS age,
      |        cents
      |      FROM ev, cut)
      |SELECT user_id,
      |       CAST(SUM(CASE WHEN age >= 63 THEN 0 ELSE cents >> age END) AS BIGINT) AS score,
      |       CAST(SUM(CASE WHEN event_type = 'purchase' AND age < 63
      |                     THEN cents >> age ELSE 0 END) AS BIGINT) AS purchase_score,
      |       max(age) AS oldest_age, COUNT(*) AS n_events
      |FROM d GROUP BY 1""".stripMargin

  // --------------------------------------------------------- k_anonymize
  /** k-anonymity generalization over the customer quasi-identifiers
    * (geography × market segment), the release gate a training-data
    * pipeline applies before person-linked records leave curation. Each
    * geography is generalized up a fixed hierarchy — nation → region →
    * suppressed — by full-domain recoding per segment (Samarati): a
    * segment keeps nation-level geography only if EVERY nation class in
    * it holds ≥ k records, else it releases region level if every region
    * class does, else geography is suppressed. Uniform recoding per
    * segment means every emitted (qi_geo, qi_segment) class really holds
    * ≥ k customers — per-record "least sufficient level" would leak
    * smaller classes whenever a level-1 class's members mostly stayed at
    * level 0.
    *
    * Scale shape: equivalence-class sizes are aggregates over LOW-
    * cardinality QI tuples (|nations|×|segments|), so both level counts
    * are map-side-combined partials that collapse to dictionary-sized
    * tables and broadcast back onto the record stream — the 100 TB fact
    * side is scanned once and never shuffled; generalization is then a
    * per-row CASE.
    */
  def kAnonymize(spark: SparkSession, dir: String): DataFrame = {
    val k = 20
    val geo = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
    val c = Tables.customer(spark, dir)
      .join(broadcast(geo), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"), col("c_mktsegment"))
    // smallest class per level per segment: the segment's release level is
    // the first level whose MINIMUM class size clears k (full-domain)
    val min0 = c.groupBy(col("c_mktsegment").as("seg"), col("n_name"))
      .agg(count(lit(1)).as("n0"))
      .groupBy(col("seg")).agg(min(col("n0")).as("min0"))
    val min1 = c.groupBy(col("c_mktsegment").as("seg"), col("r_name"))
      .agg(count(lit(1)).as("n1"))
      .groupBy(col("seg")).agg(min(col("n1")).as("min1"))
    val levels = min0.join(min1, "seg")
      .select(col("seg"),
        when(col("min0") >= k, 0L).when(col("min1") >= k, 1L)
          .otherwise(2L).as("gen_level"))
    c.join(broadcast(levels), col("c_mktsegment") === col("seg"))
      .select(col("c_custkey"),
        when(col("gen_level") === 0, col("n_name"))
          .when(col("gen_level") === 1, col("r_name"))
          .otherwise(lit("*")).as("qi_geo"),
        when(col("gen_level") < 2, col("c_mktsegment"))
          .otherwise(lit("*")).as("qi_segment"),
        col("gen_level"))
  }

  val kAnonymizeSql: String =
    """WITH c AS (SELECT c_custkey, n_name, r_name, c_mktsegment
      |           FROM customer JOIN nation ON c_nationkey = n_nationkey
      |           JOIN region ON n_regionkey = r_regionkey),
      |m0 AS (SELECT c_mktsegment AS seg, min(n0) AS min0 FROM (
      |         SELECT c_mktsegment, n_name, count(*) AS n0 FROM c GROUP BY 1, 2)
      |       GROUP BY 1),
      |m1 AS (SELECT c_mktsegment AS seg, min(n1) AS min1 FROM (
      |         SELECT c_mktsegment, r_name, count(*) AS n1 FROM c GROUP BY 1, 2)
      |       GROUP BY 1),
      |lv AS (SELECT m0.seg,
      |              CASE WHEN min0 >= 20 THEN 0 WHEN min1 >= 20 THEN 1
      |                   ELSE 2 END AS gen_level
      |       FROM m0 JOIN m1 ON m0.seg = m1.seg)
      |SELECT c_custkey,
      |       CASE gen_level WHEN 0 THEN n_name WHEN 1 THEN r_name
      |            ELSE '*' END AS qi_geo,
      |       CASE WHEN gen_level < 2 THEN c_mktsegment ELSE '*' END AS qi_segment,
      |       CAST(gen_level AS BIGINT) AS gen_level
      |FROM c JOIN lv ON c.c_mktsegment = lv.seg""".stripMargin

  // ----------------------------------------------------- observed_metrics
  /** Piggybacked pipeline telemetry via Spark's `Observation`/`observe`
    * API: the query performs a REAL pass (filtered cents projection of
    * lineitem driven through the noop sink — the stand-in for the write a
    * production pipeline was making anyway) and the metrics fall out of
    * `CollectMetricsExec`'s accumulators on that same pass. This is the
    * scale-critical difference from [[dqAudit]]: dq_audit IS a scan whose
    * output is metrics; observed_metrics costs ZERO extra scans — at
    * 100 TB the sink pass happens regardless, and the observe node adds a
    * per-partition partial aggregate folded into task completion, so rule
    * counters, row counts, and value envelopes arrive with the write for
    * free. (Spark exposes the same listener path on streaming queries per
    * micro-batch.) Only non-distinct aggregates are legal in `observe` —
    * exactly the map-side-foldable ones, which is what makes it free.
    * The returned frame replays the observation row long-typed so the
    * DuckDB oracle verifies the counters bit-exactly.
    *
    * EAGER-EXECUTION CONTRACT (round-4 advice; unlike the registry's
    * lazy-plan norm): the lineitem pass runs INSIDE this builder —
    * `Observation.get` blocks on the noop write — and the returned 5-row
    * frame is a pre-computed local relation. Callers wanting only the
    * schema/plan should not invoke this builder, the same caveat the
    * `_stream_parity` rows carry (their builders likewise execute).
    */
  def observedMetrics(spark: SparkSession, dir: String): DataFrame = {
    val obs = org.apache.spark.sql.Observation("graft_pass_metrics")
    val pass = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 0)
      .select(col("l_orderkey"),
        floor(dec(col("l_extendedprice")) * 100).cast("long").as("price_cents"),
        col("l_returnflag"))
      .observe(obs,
        count(lit(1)).as("rows_out"),
        sum(col("price_cents")).as("cents_out"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("returned_rows"),
        min(col("price_cents")).as("min_cents"),
        max(col("price_cents")).as("max_cents"))
    pass.write.format("noop").mode("overwrite").save()
    val m = obs.get
    import spark.implicits._
    // Null-discipline (round-4 advice): on an empty post-filter input the
    // sum/min/max observations are NULL — extracting via asInstanceOf[Long]
    // would silently unbox them to 0 where the oracle emits NULL. Fail
    // loudly instead: the fixture is never empty, so a NULL here is a real
    // defect (empty pass, cast overflow), not a value to launder.
    Seq("rows_out", "cents_out", "returned_rows", "min_cents", "max_cents")
      .map(k => (k, m(k) match {
        case null    => sys.error(s"observed metric $k is NULL (empty pass or overflow?)")
        case v: Long => v
        case v       => sys.error(s"observed metric $k has unexpected type: $v")
      }))
      .toDF("metric", "value")
  }

  val observedMetricsSql: String =
    """WITH p AS (SELECT CAST(FLOOR(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents,
      |                  l_returnflag
      |           FROM lineitem WHERE l_quantity > 0)
      |SELECT 'rows_out' AS metric, CAST(count(*) AS BIGINT) AS value FROM p
      |UNION ALL SELECT 'cents_out', CAST(SUM(cents) AS BIGINT) FROM p
      |UNION ALL SELECT 'returned_rows',
      |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) FROM p
      |UNION ALL SELECT 'min_cents', CAST(MIN(cents) AS BIGINT) FROM p
      |UNION ALL SELECT 'max_cents', CAST(MAX(cents) AS BIGINT) FROM p""".stripMargin
}
