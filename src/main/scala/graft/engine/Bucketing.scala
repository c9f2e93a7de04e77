package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-shuffled) storage for repeated co-located joins — the
  * 100 TB lever for fact⋈fact joins: both tables hash-clustered into the
  * same bucket count on the join key at WRITE time, so every subsequent
  * join/aggregation on that key skips its Exchange entirely (verified in
  * BucketingSpec: the joint plan contains no shuffle on the bucketed key).
  *
  * This is the batch analogue of Kafka's co-partitioned topics — the
  * reference relies on identical partitioning of joined topics
  * (JoinsExample co-partitions implicitly via same partition count); Spark
  * buckets make the same contract durable in storage.
  */
object Bucketing {

  /** Persist `df` as a bucketed table clustered by `keys`. Idempotent: a
    * stale warehouse directory from a previous session (the embedded
    * metastore is per-JVM, the directory isn't) is cleared first.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = java.nio.file.Paths.get(warehouse, table)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      // Files.walk must be closed (it holds directory handles open);
      // leaking one per writeBucketed call adds up over a Verify loop
      val walk = java.nio.file.Files.walk(loc)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** True when the executed plan of `df` contains a shuffle exchange —
    * bucketed joins must NOT (that's the point).
    */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
