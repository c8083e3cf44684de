package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev aid: print the EXECUTED plan (what AQE actually ran) of one
  * SparkEntry query, plus scan/reuse/exchange counts — the numbers the
  * plan-shape promises in SCALING.md are made of.
  *
  * Usage: runMain graft.tools.PlanDebug <query> [sfDir] [fanout]
  */
object PlanDebug {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val fanout = args.length > 2 && args(2).toBoolean
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.input.fanout", fanout.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(q)(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    println(plan)
    def n(re: String) = re.r.findAllIn(plan).size
    println(s"[plandebug] scans=${n("FileScan parquet")} " +
      s"reuse=${n("ReusedQueryStage|ReusedExchange")} " +
      s"exchanges=${n("Exchange ")} " +
      s"hashaggs=${n("HashAggregate")}")
    spark.stop()
  }
}
