package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan-inspection utility (the `.explain("formatted")` loop from the build
  * rules, runnable per registered query without editing code):
  *
  *   sbt "runMain graft.PlanDump <sfDir> <query> [<query> ...]"
  *
  * Prints each query's formatted physical plan — the artifact PLANS.md
  * documents and PlansSpec pins. Streaming-parity rows are refused rather
  * than executed (building their frame RUNS a streaming job; their inner
  * plans are the batch twins').
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <query> [<query> ...]")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // builders whose CONSTRUCTION executes (streaming parity rows; the
    // eager observe pass) — dumping them would run a full job and print
    // the plan of a precomputed local result, not the pass that ran
    def eagerBuilder(name: String): Boolean =
      name.endsWith("_stream_parity") || name == "observed_metrics"
    args.tail.foreach { name =>
      println(s"=== $name ===")
      if (eagerBuilder(name))
        println("(eager-execution query: building it RUNS the job; plan its batch twin instead)")
      else
        println(SparkEntry.queries(name)(spark, args.head)
          .queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
