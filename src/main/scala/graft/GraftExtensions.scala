package graft

import graft.functions.VectorDotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: registers the library's native
  * expressions in every session of a cluster via
  * `--conf spark.sql.extensions=graft.GraftExtensions` — no code change
  * in user jobs, pure-SQL users included. (Per-session alternative:
  * `VecMath.register(spark)`.)
  *
  * The injected surface is deliberately tiny: graft is DataFrame-first,
  * and only the genuinely custom codegen'd expressions need SQL names —
  * everything else in the library is Catalyst built-ins that SQL already
  * has. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDotProduct].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VectorDotProduct(exprs(0), exprs(1))))
}
