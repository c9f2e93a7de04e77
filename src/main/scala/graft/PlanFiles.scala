package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Per-query formatted-plan dumps for the optimization-round evidence trail
  * (`plans/rNN/<query>_{before,after}.txt`): one file per named query with
  * the `.explain("formatted")` output, produced under the Bench session
  * config (same core count, same shuffle width) so Exchange counts and
  * join strategies match what Bench actually runs.
  *
  * Usage: `sbt "runMain graft.PlanFiles <sfDir> <outDir> <suffix> <q1> [q2...]"`
  * e.g.   `sbt "runMain graft.PlanFiles /root/testdata/sf0.1 plans/r11 before weighted_median"`
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"),
        s"# $name ($suffix) — sfDir=$sfDir cpus=$cpus\n$plan")
      // between dumps: some queries register caches whose lifetime Bench
      // manages with releaseAll; mirror that so later dumps see clean state
      graft.engine.QueryCaches.releaseAll(spark, blocking = true)
      spark.catalog.clearCache()
      println(s"[plans] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
