package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sum — the two-pass pattern that replaces the
  * single-partition global window (`Window.orderBy(key)` with no
  * partitionBy serializes the ENTIRE relation through one task; Spark
  * even warns at plan time):
  *
  *   1. range-partition by the order key, local running sum per partition
  *      (parallel, each task sorts only its slice);
  *   2. per-partition totals (one tiny row per partition) get their own
  *      exclusive running sum — partition-count-sized, so the inner global
  *      window is bounded by parallelism, not data — and broadcast back
  *      as offsets.
  *
  * `local running sum + partition offset = global running sum`, exactly,
  * for any partition boundaries — range-partition sampling is
  * nondeterministic in PLACEMENT but the output values are invariant to
  * it. Sums are exact (integer/decimal input expected).
  */
object Prefix {

  /** Adds `outCol` = sum of `value` over all rows strictly BEFORE the
    * current row in ascending `order` (exclusive prefix sum; 0 for the
    * first row). The `order` columns together must be globally unique for
    * a well-defined result (pass a tiebreaker as the last column).
    *
    * The range-partitioned relation feeds TWO plan branches (the offsets
    * aggregate and the final join). Range partitioning is SAMPLE-based:
    * two independent materializations may pick different boundaries, and
    * local sums paired with offsets from a different partitioning would
    * be silently wrong. The eager [[Snapshot.pin]] pins ONE placement
    * that both branches read (the duplicateClusters pattern); when the
    * session has a checkpoint dir configured, pin writes a reliable
    * `checkpoint` instead so the snapshot survives executor loss.
    */
  def exclusiveCumsum(df: DataFrame, order: Seq[Column], value: Column,
                      outCol: String): DataFrame =
    exclusiveCumsums(df, order, Seq(value -> outCol))

  /** N exclusive prefix sums over the SAME order in ONE two-pass build:
    * one range exchange, one pinned placement, one offsets aggregate (all
    * N per-partition totals in a single pass), one local window sort.
    * Chaining N single-value [[exclusiveCumsum]] calls instead pays the
    * range sampling pass, the range exchange, and the pin N times — at
    * any scale the extra passes are pure overhead since every prefix
    * reads the same global order (measured at sf0.1 on
    * `concurrency_histogram`, which needs the running level AND a global
    * rank: the fused form deletes a full exchange + pin + sampling pass).
    * Prefix-sum values are placement-invariant, so fusing is exact.
    */
  def exclusiveCumsums(df: DataFrame, order: Seq[Column],
                       values: Seq[(Column, String)]): DataFrame = {
    val n = df.sparkSession.sparkContext.defaultParallelism
    val vcols = values.zipWithIndex.map { case ((v, _), i) => (s"__v$i", v) }
    val parts = vcols.foldLeft(
        df.repartitionByRange(n, order: _*)
          .withColumn("__pid", spark_partition_id())) {
        case (d, (nm, v)) => d.withColumn(nm, v)
      }
      .transform(graft.engine.Snapshot.pin)
    val localW = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsetW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts.groupBy(col("__pid"))
      .agg(sum(col(vcols.head._1)).as("__psum0"),
        vcols.tail.zipWithIndex.map { case ((nm, _), i) =>
          sum(col(nm)).as(s"__psum${i + 1}") }: _*)
      .select(col("__pid") +:
        vcols.indices.map(i =>
          coalesce(sum(col(s"__psum$i")).over(offsetW), lit(0L))
            .as(s"__offset$i")): _*)
    val withLocals = vcols.zipWithIndex.foldLeft(parts) {
      case (d, ((nm, _), i)) =>
        d.withColumn(s"__local$i",
          coalesce(sum(col(nm)).over(localW), lit(0L)))
    }
    val joined = withLocals.join(broadcast(offsets), "__pid")
    val withOut = values.zipWithIndex.foldLeft(joined) {
      case (d, ((_, out), i)) =>
        d.withColumn(out, col(s"__local$i") + col(s"__offset$i"))
    }
    withOut.drop("__pid" +: vcols.indices.flatMap(i =>
      Seq(s"__v$i", s"__local$i", s"__offset$i")): _*)
  }

  /** Adds `outCol` = max of `value` over all rows strictly BEFORE the
    * current row in ascending `order` (exclusive prefix max; NULL for the
    * first row — max has no identity element, and callers like the skyline
    * need "no predecessor" distinguishable from any real value). Same
    * two-pass topology and placement-pinning rules as [[exclusiveCumsum]]:
    * max is associative, so `max(local prefix max, max over all earlier
    * partitions)` is the global prefix max for any partition boundaries.
    */
  def exclusiveCumMax(df: DataFrame, order: Seq[Column], value: Column,
                      outCol: String): DataFrame = {
    val n = df.sparkSession.sparkContext.defaultParallelism
    val parts = df
      .repartitionByRange(n, order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value)
      .transform(graft.engine.Snapshot.pin)
    val localW = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsetW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts.groupBy(col("__pid"))
      .agg(max(col("__v")).as("__pmax"))
      .select(col("__pid"), max(col("__pmax")).over(offsetW).as("__offset"))
    parts
      .withColumn("__local", max(col("__v")).over(localW))
      .join(broadcast(offsets), "__pid")
      .withColumn(outCol, greatest(col("__local"), col("__offset")))
      .drop("__pid", "__v", "__local", "__offset")
  }
}
