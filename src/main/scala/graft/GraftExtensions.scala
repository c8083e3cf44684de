package graft

import graft.functions.{CdcCuts, VectorDotProduct, WinnowSelect}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

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
    // The two text-hashing natives take their shape constants as
    // FOLDABLE int literals in SQL — winnow_select(lower(text), 16, 8),
    // cdc_cuts(text, 8, 5) — extracted at resolution (a non-literal
    // would make the per-row shape undefined; fail loudly).
    // `arg` is the 1-BASED SQL argument position (the string column is
    // argument 1), so the message matches what the user typed.
    def intLit(e: Expression, name: String, arg: Int): Int = e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$name argument $arg must be an integer literal, got $other")
    }
    ext.injectFunction((
      FunctionIdentifier("winnow_select"),
      new ExpressionInfo(classOf[WinnowSelect].getName, "winnow_select"),
      (exprs: Seq[Expression]) => WinnowSelect(exprs(0),
        intLit(exprs(1), "winnow_select", 2), intLit(exprs(2), "winnow_select", 3))))
    ext.injectFunction((
      FunctionIdentifier("cdc_cuts"),
      new ExpressionInfo(classOf[CdcCuts].getName, "cdc_cuts"),
      (exprs: Seq[Expression]) => CdcCuts(exprs(0),
        intLit(exprs(1), "cdc_cuts", 2), intLit(exprs(2), "cdc_cuts", 3))))
    ext.injectOptimizerRule(_ => graft.plans.OptimizeSlidingWindowSums)
  }
}
