package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import scala.util.Random

/** graft.plans.OptimizeSlidingWindowSums: the rewritten plan must be
  * value-identical to the naive sliding frame (incl. null edge cases)
  * and must actually eliminate the O(n·k) frame. The session here is
  * built THROUGH spark.sql.extensions=graft.GraftExtensions, covering
  * the cluster-deployment injection path. */
class SlidingRewriteSpec extends SparkSpec {

  /** A second session sharing the context, created with the extension
    * applied (the suite-shared session has no extensions).
    * `spark.sql.extensions` is a STATIC conf — ignored once a context
    * exists — so the builder's `withExtensions` hook carries the same
    * GraftExtensions instance the conf would name on a fresh cluster. */
  private lazy val extSpark: SparkSession = {
    spark.sparkContext // ensure the context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.setDefaultSession(spark)
    SparkSession.setActiveSession(spark)
    s
  }

  /** Random (key, t, nullable decimal value) rows. */
  private def randomDf(s: SparkSession, rnd: Random, n: Int): DataFrame = {
    val rows = (1 to n).map { i =>
      val v = if (rnd.nextInt(5) == 0) null
        else new java.math.BigDecimal(rnd.nextInt(20000)).movePointLeft(2)
      org.apache.spark.sql.Row(s"k${rnd.nextInt(3)}", i, v)
    }
    s.createDataFrame(s.sparkContext.parallelize(rows, 3),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("v", DecimalType(18, 2)))))
  }

  private def slidingQuery(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("k").orderBy("t").rowsBetween(-(k - 1), 0)
    df.select(col("k"), col("t"),
      sum(col("v")).over(w).as("s"),
      count(col("v")).over(w).as("c"),
      count(lit(1)).over(w).as("n"))
  }

  test("rewrite fires under the extension and removes the sliding frame") {
    val df = randomDf(extSpark, new Random(1), 50)
    val plan = slidingQuery(df, 5).queryExecution.optimizedPlan.toString
    assert(!plan.contains("specifiedwindowframe(RowFrame, -4, currentrow$())"),
      s"sliding frame survived:\n$plan")
    assert(plan.contains("specifiedwindowframe(RowFrame, unboundedpreceding$(), -5)"),
      s"expected the lagged growing frame:\n$plan")
  }

  test("rewritten results equal the naive sliding frame — random data with nulls") {
    (1 to 5).foreach { trial =>
      val rnd = new Random(42L + trial)
      val n = rnd.nextInt(80) + 20
      val k = rnd.nextInt(8) + 2
      val rows = (1 to n).map { i =>
        val v = if (rnd.nextInt(4) == 0) null
          else new java.math.BigDecimal(rnd.nextInt(20000)).movePointLeft(2)
        (s"k${rnd.nextInt(3)}", i, Option(v).map(BigDecimal(_)))
      }
      // Same logical query against the plain session (no rule) and the
      // extension session (rule on).
      def run(s: SparkSession): Seq[org.apache.spark.sql.Row] = {
        import s.implicits._
        val df = rows.toDF("k", "t", "v")
          .withColumn("v", col("v").cast(DecimalType(18, 2)))
        slidingQuery(df, k).orderBy("k", "t").collect().toSeq
      }
      assert(run(extSpark) == run(spark),
        s"trial $trial (n=$n k=$k): rewritten != naive")
    }
  }

  test("all-null frames after earlier values still yield NULL, not 0") {
    import extSpark.implicits._
    // k2's frame at t=4..5 holds only nulls although earlier values exist.
    val df = Seq(("a", 1, Some(BigDecimal(5))), ("a", 2, Some(BigDecimal(7))),
      ("a", 3, None), ("a", 4, None), ("a", 5, None))
      .toDF("k", "t", "v").withColumn("v", col("v").cast(DecimalType(18, 2)))
    val out = slidingQuery(df, 2).orderBy("t").collect()
    assert(out(2).getDecimal(2) != null, "frame {7, null} sums to 7")
    assert(out(3).isNullAt(2), "frame {null, null} must stay NULL")
    assert(out(4).isNullAt(2))
    assert(out(3).getLong(3) == 0L && out(3).getLong(4) == 2L,
      "count(v) sees 0, count(*) sees the 2 rows")
  }

  test("wide-decimal sums (p + 10 > 38) are left alone — overflow headroom") {
    // Sum over DECIMAL(p,s) widens to DECIMAL(min(38, p+10), s): at p > 28
    // the partition-length running sum loses headroom the k-row frame sum
    // keeps, so the rewrite could NULL (non-ANSI) or throw (ANSI) where
    // the original succeeds. Boundary: p = 28 still rewrites.
    import extSpark.implicits._
    val df = Seq(("a", 1, BigDecimal(1.5)), ("a", 2, BigDecimal(2.5)))
      .toDF("k", "t", "v")
    val w = Window.partitionBy("k").orderBy("t").rowsBetween(-4, 0)
    def planFor(p: Int): String =
      df.withColumn("v", col("v").cast(DecimalType(p, 2)))
        .select(sum(col("v")).over(w))
        .queryExecution.optimizedPlan.toString
    assert(planFor(38).contains("specifiedwindowframe(RowFrame, -4, currentrow$())"),
      s"DECIMAL(38,2) sum must keep its sliding frame:\n${planFor(38)}")
    assert(planFor(29).contains("specifiedwindowframe(RowFrame, -4, currentrow$())"),
      s"DECIMAL(29,2) sum must keep its sliding frame:\n${planFor(29)}")
    assert(!planFor(28).contains("specifiedwindowframe(RowFrame, -4, currentrow$())"),
      s"DECIMAL(28,2) keeps full +10 headroom and must rewrite:\n${planFor(28)}")
  }

  test("q_window_sliding_rule's plan actually runs the rewrite") {
    // The oracle entry claims Spark executes the REWRITTEN plan; pin it,
    // so a refactor that silently drops the extension session turns the
    // oracle row into a plain naive-frame check without anyone noticing.
    val df = SparkEntry.queries("q_window_sliding_rule")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("specifiedwindowframe(RowFrame, -6, currentrow$())"),
      s"the sliding frame survived — extension session not in effect:\n$plan")
    assert(plan.contains("specifiedwindowframe(RowFrame, unboundedpreceding$(), -7)"),
      s"expected the lagged growing frame:\n$plan")
    assert(df.count() > 0)
  }

  test("double sums and distinct aggregates are left alone") {
    import extSpark.implicits._
    val df = Seq(("a", 1, 1.5), ("a", 2, 2.5)).toDF("k", "t", "v")
    val w = Window.partitionBy("k").orderBy("t").rowsBetween(-4, 0)
    val plan = df.select(sum(col("v")).over(w))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("specifiedwindowframe(RowFrame, -4, currentrow$())"),
      s"double sum must keep its sliding frame (cancellation hazard):\n$plan")
  }
}
