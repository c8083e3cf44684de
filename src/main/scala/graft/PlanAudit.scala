package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: print physical plans for queries (all, or names passed as
  * args) — used to audit pushdown/pruning/broadcast/shuffles.
  *
  * By default prints the STATIC formatted plan. With `--executed` it runs
  * each query and prints what AQE actually executed plus scan/reuse/
  * exchange counts — runtime exchange reuse (`ReusedQueryStage`) is only
  * visible there, never in static explain.
  *
  * Env: SPARK_GRAFT_SF_DIR picks the scale factor;
  * SPARK_GRAFT_FANOUT=true audits plans under the bench's input fan-out.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val executed = args.contains("--executed")
    val names0 = args.filterNot(_ == "--executed").toSeq
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.input.fanout",
        sys.env.getOrElse("SPARK_GRAFT_FANOUT", "false"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (names0.nonEmpty) names0 else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    names.foreach { q =>
      println(s"########## $q")
      val df = SparkEntry.queries(q)(spark, dir)
      if (executed) {
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        println(plan)
        def n(re: String) = re.r.findAllIn(plan).size
        println(s"[planaudit] scans=${n("FileScan parquet")} " +
          s"reuse=${n("ReusedQueryStage|ReusedExchange")} " +
          s"exchanges=${n("Exchange ")} " +
          s"hashaggs=${n("HashAggregate")}")
      } else println(df.queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
