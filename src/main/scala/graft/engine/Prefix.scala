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
      .agg(sum(col("__v")).as("__psum"))
      .select(col("__pid"),
        coalesce(sum(col("__psum")).over(offsetW), lit(0L)).as("__offset"))
    parts
      .withColumn("__local", coalesce(sum(col("__v")).over(localW), lit(0L)))
      .join(broadcast(offsets), "__pid")
      .withColumn(outCol, col("__local") + col("__offset"))
      .drop("__pid", "__v", "__local", "__offset")
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
