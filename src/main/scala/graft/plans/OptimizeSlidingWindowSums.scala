package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{Decimal, DecimalType, IntegerType, LongType}

/** Optimizer rule: rewrite bounded trailing ROW-frame `SUM`/`COUNT`
  * window aggregates into the difference of two GROWING frames.
  *
  * WindowExec evaluates a fixed-lower-bound frame
  * (`UNBOUNDED PRECEDING .. x`) incrementally — one accumulate per row —
  * but re-aggregates a both-bounds-moving sliding frame
  * (`k PRECEDING .. CURRENT ROW`) from scratch at every row: O(n·k) per
  * partition (see SCALING.md; at k = 30 this dominated the rolling
  * family's bench cost). The identity
  *
  *   sum over [t−k+1 .. t]  =  cum[.. t] − cum[.. t−k]
  *
  * turns one O(n·k) frame into two O(n) frames that share the SAME
  * Window node, partitioning, and sort — the plan's shuffle/sort shape
  * is untouched, only the frame processors change.
  *
  * The rewrite is applied ONLY where it is exact:
  *
  *  - `Sum` over a DECIMAL child with full widening headroom: decimal
  *    arithmetic is exact, so the difference of the running sums IS the
  *    frame sum. Sum over DECIMAL(p, s) is typed DECIMAL(min(38, p+10), s),
  *    so the rewrite requires p + 10 <= 38 — then the partition-length
  *    running sum holds >= 10^10 worst-case child values, the same
  *    headroom the original frame sum had, and the rewrite cannot
  *    overflow where the original succeeded. Children with p > 28 are
  *    left alone: their widened sum type is clamped to 38 digits, and a
  *    long partition's running sum could overflow (NULL under non-ANSI —
  *    which Coalesce would silently zero — or throw under ANSI) where
  *    every k-row frame sum stays in range. (On FLOAT/DOUBLE
  *    the same trick suffers catastrophic cancellation — those sums are
  *    left alone. Integral sums are also left alone: a running sum can
  *    overflow where every k-row frame sum stays in range.)
  *  - `Count`: counts are exact longs and never overflow first.
  *
  * NULL semantics are preserved: a frame holding no non-null inputs must
  * yield NULL, but a cum difference would yield 0, so nullable sums are
  * guarded by the count difference (`CASE WHEN cnt > 0 THEN diff END`);
  * non-nullable children skip the guard (the frame always holds the
  * current row). DISTINCT and FILTER aggregates are excluded. Row-frame
  * output under order ties is whatever order the executed sort produced
  * — for the original and the rewritten frames alike, row for row, since
  * both run inside the same Window node over the same sorted stream.
  *
  * Registered cluster-wide via `graft.GraftExtensions`
  * (spark.sql.extensions) — user SQL with a naive trailing-window sum
  * gets the O(n) plan with no code change. The library's own rolling
  * operators (`ops.Analytics.frameMoments`) already emit the optimized
  * form by hand; this rule extends the same guarantee to ad-hoc queries.
  */
object OptimizeSlidingWindowSums extends Rule[LogicalPlan] {

  /** k (frame row count) when the frame is `k-1 PRECEDING .. CURRENT ROW`
    * with k ≥ 2 — a 1-row frame (CURRENT ROW .. CURRENT ROW) is already
    * O(n) and not worth touching. */
  private def slidingK(frame: Expression): Option[Int] = frame match {
    case SpecifiedWindowFrame(RowFrame, Literal(lo: Int, IntegerType), CurrentRow)
      if lo < 0 => Some(-lo + 1)
    case _ => None
  }

  private def rewritable(ne: NamedExpression): Boolean = ne match {
    case Alias(WindowExpression(ae: AggregateExpression, spec: WindowSpecDefinition), _) =>
      matches(ae, spec)
    case _ => false
  }

  private def matches(ae: AggregateExpression, spec: WindowSpecDefinition): Boolean =
    !ae.isDistinct && ae.filter.isEmpty &&
      slidingK(spec.frameSpecification).isDefined &&
      (ae.aggregateFunction match {
        // Only rewrite when the widened sum type keeps the full +10-digit
        // headroom (see scaladoc): at p > 28 the cumulative sum can
        // overflow where the k-row frame sum cannot.
        case Sum(c, _) => c.dataType match {
          case dt: DecimalType => dt.precision + 10 <= DecimalType.MAX_PRECISION
          case _               => false
        }
        case _: Count  => true
        case _         => false
      })

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case w: Window if w.orderSpec.nonEmpty && w.windowExpressions.exists(rewritable) =>
      rewrite(w)
  }

  private def rewrite(w: Window): LogicalPlan = {
    val helpers = scala.collection.mutable.ArrayBuffer[NamedExpression]()
    val kept = scala.collection.mutable.ArrayBuffer[NamedExpression]()

    def over(fn: aggregate.AggregateFunction, spec: WindowSpecDefinition,
             frame: SpecifiedWindowFrame, name: String): Attribute = {
      val agg = AggregateExpression(fn, Complete, isDistinct = false)
      val al = Alias(WindowExpression(agg, spec.copy(frameSpecification = frame)), name)()
      helpers += al
      al.toAttribute
    }

    val projected: Seq[NamedExpression] = w.windowExpressions.map {
      case a @ Alias(WindowExpression(ae: AggregateExpression, spec: WindowSpecDefinition), name)
        if matches(ae, spec) =>
        val k = slidingK(spec.frameSpecification).get
        val cum = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
        val prev = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, Literal(-k))
        val replacement: Expression = ae.aggregateFunction match {
          case c: Count =>
            Subtract(over(c, spec, cum, s"${name}_ccum"),
              over(c, spec, prev, s"${name}_cprev"))
          case s @ Sum(child, _) =>
            val sumCum = over(s, spec, cum, s"${name}_scum")
            val sumPrev = over(s, spec, prev, s"${name}_sprev")
            val zero = Literal.create(Decimal(0), sumCum.dataType)
            val diff = Cast(
              Subtract(Coalesce(Seq(sumCum, zero)), Coalesce(Seq(sumPrev, zero))),
              a.dataType)
            if (!child.nullable) diff
            else {
              val cntCum = over(Count(Seq(child)), spec, cum, s"${name}_ncum")
              val cntPrev = over(Count(Seq(child)), spec, prev, s"${name}_nprev")
              CaseWhen(Seq((GreaterThan(Subtract(cntCum, cntPrev), Literal(0L)), diff)), None)
            }
          case other =>
            throw new IllegalStateException(s"unreachable: $other matched rewritable")
        }
        Alias(replacement, name)(exprId = a.exprId, qualifier = a.qualifier,
          explicitMetadata = Some(a.metadata))
      case other =>
        kept += other
        other.toAttribute
    }

    Project(w.child.output ++ projected,
      w.copy(windowExpressions = (kept ++ helpers).toSeq))
  }
}
