package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout. Queries are materialized through the noop sink
  * so every output column is computed (a bare .count() lets Catalyst prune
  * the projection and under-reports).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to the host's actual core count (capped at 32): oversubscribing
    // local[N] skews the steady-state timings the warm pass stabilizes
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
    spark.sparkContext.setLogLevel("WARN")
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      }
      finally
        // drop per-query persisted subplans (dedup postings etc.): plans are
        // rebuilt per call, so blocks from ~500 runs (all queries × 1 warm
        // + 3 measured passes) would only accumulate
        spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    // Warm every query once (unmeasured): Janino codegen compilation and
    // JIT dominate cold runs at this data scale (measured: postings stage
    // 3.5 s cold vs 0.07 s warm) and make cold numbers ~2x noisier. The
    // measured pass reports steady-state per-query times.
    // optional comma-separated filter for targeted profiling/scaling runs
    // (absent => all queries; the driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach(runOnce)
    // Median of 3 measured passes per query: single-pass records have twice
    // carried multi-second phantoms (r1 agg_count_reduce 3.8s->0.4s, r2
    // cube_revenue 9.8s->1.15s isolated) from GC/compilation hiccups landing
    // on one unlucky query. The median is robust to one bad pass.
    def median3(name: String): Double = {
      val ts = Seq.fill(3)(runOnce(name))
      if (ts.exists(_ < 0)) -1.0 else ts.sorted.apply(1)
    }
    val results = names.map(n => n -> median3(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // failed queries report -1 per query but must not subtract from the total
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
