package graft.engine

import org.apache.spark.sql.DataFrame

/** Fan a small-but-compute-heavy input out across the cluster. A compact
  * parquet fixture arrives as ONE split, which serializes any downstream
  * expensive stage (measured: 41× instead of 16× runtime growth on a 16×
  * corpus until the input was spread; load average 1.0 on a 32-core box).
  * One round-robin shuffle of the (tiny) input buys full parallelism for
  * the expensive part; no effect on results.
  *
  * GATED on the scan's actual file count (a metadata lookup, no job):
  * a 100 TB corpus arrives in thousands of files and already fans out —
  * an unconditional repartition there would shuffle everything for
  * nothing. Shared by the dedup and similarity families (was duplicated
  * in both until round 5).
  */
object Spread {
  def spreadSmallInput(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.inputFiles.length >= par) df else df.repartition(par)
  }
}
