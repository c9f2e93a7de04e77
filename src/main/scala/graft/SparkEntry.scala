package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.ReferenceQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry pairs a Spark implementation (graft.queries.*) with ANSI SQL
  * the driver runs in DuckDB over the same parquet tables. Column names and
  * types are aliased identically on both sides (the driver hash-compares
  * after sorting columns by name). Determinism rules: money sums go through
  * DECIMAL(18,2); latest-per-key and top-k ties break on a unique id; no
  * wall-clock timestamps in verified columns.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.basicFilterExtract(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "basic_filter_extract" -> (ReferenceQueries.basicFilterExtract _),
    "ktable_latest"        -> (ReferenceQueries.ktableLatest _),
    "ktable_filter_view"   -> (ReferenceQueries.ktableFilterView _),
    "running_sum"          -> (ReferenceQueries.runningSum _),
    "agg_count_reduce"     -> (ReferenceQueries.aggCountReduce _),
    "stream_table_join"    -> (ReferenceQueries.streamTableJoin _),
    "interval_join"        -> (ReferenceQueries.intervalJoin _),
    "branch_merge"         -> (ReferenceQueries.branchMerge _),
    "windowed_agg"         -> (ReferenceQueries.windowedAgg _),
    "error_tolerant_parse" -> (ReferenceQueries.errorTolerantParse _),
    "flatmap_tokens"       -> (ReferenceQueries.flatmapTokens _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "basic_filter_extract" -> ReferenceQueries.basicFilterExtractSql,
    "ktable_latest"        -> ReferenceQueries.ktableLatestSql,
    "ktable_filter_view"   -> ReferenceQueries.ktableFilterViewSql,
    "running_sum"          -> ReferenceQueries.runningSumSql,
    "agg_count_reduce"     -> ReferenceQueries.aggCountReduceSql,
    "stream_table_join"    -> ReferenceQueries.streamTableJoinSql,
    "interval_join"        -> ReferenceQueries.intervalJoinSql,
    "branch_merge"         -> ReferenceQueries.branchMergeSql,
    "windowed_agg"         -> ReferenceQueries.windowedAggSql,
    "error_tolerant_parse" -> ReferenceQueries.errorTolerantParseSql,
    "flatmap_tokens"       -> ReferenceQueries.flatmapTokensSql,
  )
}
