package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
object PlanScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.AnalyticsQueries.orderChainCte(spark, "/root/testdata/sf0.001")
    val off = graft.queries.AnalyticsQueries.orderChainWalk(spark, broadcastProbe = false)
    println("=== HINT-FREE PLAN ===")
    println(off.queryExecution.explainString(FormattedMode))
    val on = graft.queries.AnalyticsQueries.orderChainWalk(spark, broadcastProbe = true)
    println("=== HINTED PLAN ===")
    println(on.queryExecution.explainString(FormattedMode))
    spark.stop()
  }
}
