package graft

import graft.ext.Similarity
import graft.functions.VecMath
import org.apache.spark.sql.functions._

/** The native vec_dot must be bit-identical to the declarative
  * zip_with+aggregate fold it replaces (same accumulation order). */
class VecMathSpec extends SparkSpec {
  import spark.implicits._

  private def asDouble(c: org.apache.spark.sql.Column) =
    transform(c, x => x.cast("double"))

  test("vec_dot equals declarative fold bit-for-bit on float arrays") {
    val df = Seq(
      (Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.0f, -1.0f)),
      (Array(1e8f, 1.0f, -1e8f), Array(1.0f, 1.0f, 1.0f)),
      (Array.empty[Float], Array.empty[Float])).toDF("a", "b")
    val out = df.select(
      VecMath.vec_dot(col("a"), col("b")).as("native"),
      Similarity.dot(asDouble(col("a")), asDouble(col("b"))).as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("vec_dot: mismatched lengths use common prefix; null array → null") {
    val df = Seq((Some(Array(1.0f, 2.0f)), Some(Array(3.0f)))).toDF("a", "b")
    assert(df.select(VecMath.vec_dot(col("a"), col("b"))).as[Double].head() == 3.0)
    val withNull = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(withNull.select(VecMath.vec_dot(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("vec_dot registers as a SQL function") {
    VecMath.register(spark)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    assert(spark.sql("SELECT vec_dot(a, b) FROM vecs").as[Double].head() == 11.0)
  }

  test("GraftExtensions injects vec_dot for spark.sql.extensions sessions") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = ColumnBridge.buildRegistry(ext)
    assert(reg.functionExists(FunctionIdentifier("vec_dot")))
    val expr = reg.lookupFunction(FunctionIdentifier("vec_dot"), Seq(
      Literal.create(Array(1.0, 2.0)), Literal.create(Array(3.0, 4.0))))
    assert(expr.eval(null) == 11.0)
  }

  test("GraftExtensions injects the text-hashing natives with literal shape args") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.unsafe.types.UTF8String
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = ColumnBridge.buildRegistry(ext)
    for (f <- Seq("winnow_select", "cdc_cuts"))
      assert(reg.functionExists(FunctionIdentifier(f)))
    val ws = reg.lookupFunction(FunctionIdentifier("winnow_select"), Seq(
      Literal.create(UTF8String.fromString("abcdefgh"), org.apache.spark.sql.types.StringType),
      Literal(4), Literal(2)))
    assert(ws.eval(null) != null, "selection on an 8-char doc")
    // Non-literal shape args fail loudly at resolution.
    assertThrows[IllegalArgumentException](
      reg.lookupFunction(FunctionIdentifier("cdc_cuts"), Seq(
        Literal.create(UTF8String.fromString("x"), org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "w", org.apache.spark.sql.types.IntegerType)(),
        Literal(5))))
  }

  test("vec_cosine of identical vectors is 1.0") {
    val df = Seq((Array(0.6f, 0.8f), Array(0.6f, 0.8f))).toDF("a", "b")
    val c = df.select(VecMath.vec_cosine(col("a"), col("b"))).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }
}
