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
  * and only the genuinely custom pieces are worth injecting — the
  * codegen'd expressions that need SQL names, and the one optimizer
  * rule that makes naive trailing-window sums O(n)
  * (graft.plans.OptimizeSlidingWindowSums; the library's own rolling
  * operators already emit that form by hand). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDotProduct].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VectorDotProduct(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => graft.plans.OptimizeSlidingWindowSums)
  }
}
