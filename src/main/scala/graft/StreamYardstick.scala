package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Round-close streaming-throughput yardstick (round-9 verdict #4): the
  * two streaming rates that BASELINE.md's prose quotes — the STATEFUL
  * as-of enrichment pipeline (file stream → transformWithState with
  * RocksDB state + event-time timers → parquet sink) and the STATELESS
  * curation ingest (one codegen scoring stage, no state store) — measured
  * as MARGINAL rates so the micro-batch scheduling floor can't hide a
  * per-row compute regression: each shape runs on a small floor corpus
  * and a large one in the same session, and the marginal rate is
  * (rows_large − rows_floor) / (secs_large − secs_floor). Bench's parity
  * rows pin streaming CORRECTNESS every round; without this harness the
  * rates lived in hand-run ScaleProbe sessions and a regression in
  * `streaming/Streaming.scala`'s per-row compute would hide behind the
  * ~1.4 s micro-batch floor of the sf0.1 parity rows.
  *
  * Usage: sbt "runMain graft.StreamYardstick <floorDir> <fullDir>"
  * (canonical gate: floor=/root/testdata/sf0.1, full=/tmp/scale/x16).
  * Writes target/stream_latest.json; round-close copies it to
  * scripts/stream_prev.json, which the next round diffs. Tolerance: at
  * EQUAL bracketed canaries, a marginal rate below 0.8× the previous
  * record is a regression to investigate; the floor rows and canaries
  * travel in the record so an episode can be attributed, not guessed.
  * The large run goes second, so JIT/codegen warm-up lands in the floor
  * figure and the subtraction removes it along with the start-up cost.
  */
object StreamYardstick {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: StreamYardstick <floorDir> <fullDir>")
    val Array(floorDir, fullDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val canary = graft.engine.HostCanary.once(1)
    val canaryMt = graft.engine.HostCanary.once(cpus.toInt)
    System.err.println(
      f"[yard] host canary pre: ${canary}%.2f s (1 thread), ${canaryMt}%.2f s ($cpus%s threads)")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // (input rows, wall secs, output rows) for one drained AvailableNow run
    def stateful(dir: String): (Long, Double, Long) = {
      val in = graft.engine.Tables.events(spark, dir)
        .filter(col("event_type").isin("click", "purchase")).count()
      val t0 = System.nanoTime()
      val out = graft.queries.StreamParity.asofStreamParity(spark, dir).count()
      (in, (System.nanoTime() - t0) / 1e9, out)
    }
    def stateless(dir: String): (Long, Double, Long) = {
      val in = graft.engine.Tables.documents(spark, dir).count()
      val t0 = System.nanoTime()
      val out = graft.queries.StreamParity.curationStreamParity(spark, dir).count()
      (in, (System.nanoTime() - t0) / 1e9, out)
    }
    def marginal(fl: (Long, Double, Long), fu: (Long, Double, Long)): Double = {
      val dRows = fu._1 - fl._1; val dSecs = fu._2 - fl._2
      if (dRows <= 0 || dSecs <= 0) -1.0 else dRows / dSecs
    }

    // Untimed warm-up of each shape at the floor corpus: the FIRST
    // streaming query of a shape in a session pays one-off costs (state
    // store init, codegen, sink setup) that land entirely in whichever
    // run goes first — measured 6.65 s floor vs 5.42 s at 16× when the
    // cold floor went first, i.e. a NEGATIVE marginal. Warm floor and
    // warm full are what the subtraction assumes.
    stateful(floorDir); stateless(floorDir)
    val sfFl = stateful(floorDir)
    val sfFu = stateful(fullDir)
    val slFl = stateless(floorDir)
    val slFu = stateless(fullDir)
    val statefulRps = marginal(sfFl, sfFu)
    val statelessDps = marginal(slFl, slFu)
    System.err.println(f"[yard] stateful  floor ${sfFl._1}%d rows/${sfFl._2}%.2f s, " +
      f"full ${sfFu._1}%d rows/${sfFu._2}%.2f s -> marginal $statefulRps%.0f rows/s")
    System.err.println(f"[yard] stateless floor ${slFl._1}%d docs/${slFl._2}%.2f s, " +
      f"full ${slFu._1}%d docs/${slFu._2}%.2f s -> marginal $statelessDps%.0f docs/s")

    val canaryPost = graft.engine.HostCanary.once(1)
    val canaryMtPost = graft.engine.HostCanary.once(cpus.toInt)
    System.err.println(
      f"[yard] host canary post: ${canaryPost}%.2f s (1 thread), ${canaryMtPost}%.2f s ($cpus%s threads)")
    val json =
      f"""{"metric":"stream_marginal","stateful_rows_per_sec":$statefulRps%.0f,"stateless_docs_per_sec":$statelessDps%.0f,""" +
      f""""stateful_floor":{"rows":${sfFl._1},"sec":${sfFl._2}%.2f},"stateful_full":{"rows":${sfFu._1},"sec":${sfFu._2}%.2f},""" +
      f""""stateless_floor":{"docs":${slFl._1},"sec":${slFl._2}%.2f},"stateless_full":{"docs":${slFu._1},"sec":${slFu._2}%.2f},""" +
      f""""canary_sec":$canary%.2f,"canary_mt_sec":$canaryMt%.2f,"canary_post_sec":$canaryPost%.2f,"canary_mt_post_sec":$canaryMtPost%.2f,""" +
      f""""canary_threads":$cpus%s,"floor_dir":"$floorDir","full_dir":"$fullDir"}"""
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/stream_latest.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
