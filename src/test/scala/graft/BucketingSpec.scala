package graft

import org.apache.spark.sql.functions._

/** Bucketing = the shuffle-free co-located join path for repeated
  * fact-fact joins (SCALING.md "dim joins" row). Both sides bucketed on
  * the join key with the same bucket count → the sort-merge join consumes
  * the bucket layout directly: NO Exchange in the plan. At 100 TB this is
  * the difference between re-shuffling the fact table per query and
  * paying the shuffle once at write time.
  */
class BucketingSpec extends SparkSpec {

  test("co-located bucketed join plans without a shuffle exchange") {
    val li = graft.sources.Tables.table(spark, "/root/testdata/sf0.01", "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val ord = graft.sources.Tables.table(spark, "/root/testdata/sf0.01", "orders")
      .select("o_orderkey", "o_custkey")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Force SMJ so the assertion is about bucket co-location, not about
      // the small side happening to broadcast.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed").join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, plan:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side, plan:\n$plan")
      assert(joined.count() ==
        li.join(ord, col("l_orderkey") === col("o_orderkey")).count(),
        "bucketed join returns the same rows as the plain join")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
