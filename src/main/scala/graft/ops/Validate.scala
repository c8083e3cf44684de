package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, DoubleType}

/** Data contracts — the expectation/validation layer every production
  * pipeline runs before publishing a table (null bounds, value ranges,
  * set membership, key uniqueness, referential integrity), expressed as
  * Spark aggregates so the whole contract costs ONE pass.
  *
  * Scale shape: every row-level expectation folds into a single
  * aggregate over the table (partial aggs map-side, a one-row shuffle);
  * uniqueness rides the same aggregate as `count - count(distinct key)`
  * (one expand per unique rule — bounded, and still one scan).
  * Referential integrity is the only rule class needing a second table:
  * a LEFT ANTI join counted, never a driver-side diff. Nothing here
  * collects data rows; reports are O(#rules), not O(rows).
  *
  * The report row is (rule, checked, violations, pass) — identical
  * whatever the partitioning, so contracts can gate a 100 TB publish
  * from any cluster size. */
object Validate {

  /** A row-level expectation: `pred` must hold on every row. NULL
    * predicate results count as VIOLATIONS (a rule that cannot evaluate
    * did not pass — the conservative read; scope rules to non-null rows
    * explicitly with `col.isNull || pred` when NULL is acceptable). */
  final case class Expect(name: String, pred: Column)

  /** Row-level expectation builders — thin, named wrappers so contract
    * definitions read as a checklist. */
  def notNull(c: String): Expect = Expect(s"not_null($c)", col(c).isNotNull)
  def inRange(c: String, lo: Double, hi: Double): Expect =
    Expect(s"in_range($c)", col(c) >= lo && col(c) <= hi)
  def inSet(c: String, values: Seq[String]): Expect =
    Expect(s"in_set($c)", col(c).isin(values: _*))
  def positive(c: String): Expect = Expect(s"positive($c)", col(c) > 0)
  def matches(c: String, regex: String): Expect =
    Expect(s"matches($c)", col(c).rlike(regex))

  /** Evaluate row expectations + key-uniqueness rules in ONE aggregate
    * pass. Output: (rule, checked, violations, pass) — one row per rule.
    *
    * Uniqueness semantics: violations = rows beyond the first per key =
    * `count(key cols all non-null) - count(distinct key)`; rows with any
    * NULL key column are excluded from both sides (NULL keys are a
    * not_null rule's job, not a uniqueness artifact). */
  def expectationReport(df: DataFrame, expects: Seq[Expect],
                        uniqueKeys: Seq[Seq[String]] = Nil): DataFrame = {
    require(expects.nonEmpty || uniqueKeys.nonEmpty, "no rules given")
    // Aggregates are aliased by rule POSITION, not rule name: names
    // carry dots (nested columns) that col() would parse as paths, and
    // two rules may legitimately share a name (warn + fail tiers of
    // the same range). sum() over an EMPTY table is NULL — coalesce to
    // 0 so an empty partition reports pass = true, not pass = NULL
    // (which a .filter(col("pass")) gate would silently drop).
    val rowAggs = expects.zipWithIndex.flatMap { case (e, i) =>
      Seq(count(lit(1)).as(s"__c_$i"),
        // NULL pred -> violation: coalesce the "passed" flag to false.
        coalesce(sum(when(coalesce(e.pred, lit(false)), 0L).otherwise(1L)),
          lit(0L)).as(s"__v_$i"))
    }
    val uniqAggs = uniqueKeys.zipWithIndex.flatMap { case (keys, j) =>
      val i = expects.size + j
      val nonNull = keys.map(col(_).isNotNull).reduce(_ && _)
      Seq(count(when(nonNull, 1)).as(s"__c_$i"),
        (count(when(nonNull, 1)) -
          countDistinct(keys.head, keys.tail: _*)).as(s"__v_$i"))
    }
    val aggs = rowAggs ++ uniqAggs
    val names = expects.map(_.name) ++
      uniqueKeys.map(k => s"unique(${k.mkString(",")})")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // Pivot the single row to one row per rule — plan-side (explode of
    // a struct array), no collect.
    one.select(explode(array(names.zipWithIndex.map { case (n, i) => struct(
        lit(n).as("rule"),
        col(s"__c_$i").cast("long").as("checked"),
        col(s"__v_$i").cast("long").as("violations")) }: _*)).as("r"))
      .select(col("r.rule"), col("r.checked"), col("r.violations"),
        (col("r.violations") === 0L).as("pass"))
  }

  /** Referential integrity: every non-null `fk` in `child` must exist
    * in `parent.pk`. violations = orphan child ROWS (counted per row,
    * not per distinct key — the number a cleanup job must touch).
    * One anti join on the key; the parent side ships only its distinct
    * pk (AQE broadcasts it when small). */
  def refIntegrityReport(child: DataFrame, fk: String,
                         parent: DataFrame, pk: String): DataFrame = {
    // ONE child scan: a left-outer join against the distinct parent
    // keys, with checked + orphan counts in the same aggregate (an
    // anti join + a separate count would read the child — the 100 TB
    // side — twice). The marker column is non-null exactly on matches.
    val marker = s"__pk_$pk"
    child.filter(col(fk).isNotNull).select(col(fk))
      .join(parent.select(col(pk).as(fk), lit(1).as(marker)).distinct(),
        Seq(fk), "left_outer")
      .agg(count(lit(1)).as("checked"),
        coalesce(sum(when(col(marker).isNull, 1L).otherwise(0L)), lit(0L))
          .as("violations"))
      .select(lit(s"ref($fk -> $pk)").as("rule"),
        col("checked").cast("long").as("checked"),
        col("violations").cast("long").as("violations"),
        (col("violations") === 0L).as("pass"))
  }

  /** Per-column profile in ONE aggregate pass: rows, null count, exact
    * distinct count, numeric min/max (NULL for non-numeric columns —
    * cross-engine min/max of strings/timestamps is a rendering
    * minefield; the numeric ones are what range checks read anyway).
    * Output: (column, n_rows, n_nulls, n_distinct, min_num, max_num).
    * Exact distinct = one expand per column in the same scan; for
    * quick-look profiling at extreme widths swap in approx_count_
    * distinct — exactness here is what lets the oracle pin it. */
  def profile(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cols.nonEmpty, "no columns to profile")
    val numeric = df.schema.fields
      .filter(f => f.dataType.isInstanceOf[NumericType]).map(_.name).toSet
    // Aggregates aliased by column POSITION, and the source column
    // referenced back-quoted — a name carrying a dot or backtick would
    // otherwise parse as a path (the pitfall expectationReport documents
    // and dodges with positional aliases). Display name rides in lit().
    def src(c: String): Column = col("`" + c.replace("`", "``") + "`")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(lit(1)).as(s"__r_$i"),
        sum(when(src(c).isNull, 1L).otherwise(0L)).as(s"__n_$i"),
        countDistinct(src(c)).as(s"__d_$i"),
        (if (numeric(c)) min(src(c)).cast(DoubleType) else lit(null).cast(DoubleType))
          .as(s"__lo_$i"),
        (if (numeric(c)) max(src(c)).cast(DoubleType) else lit(null).cast(DoubleType))
          .as(s"__hi_$i"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.zipWithIndex.map { case (c, i) => struct(
          lit(c).as("column"),
          col(s"__r_$i").cast("long").as("n_rows"),
          col(s"__n_$i").cast("long").as("n_nulls"),
          col(s"__d_$i").cast("long").as("n_distinct"),
          col(s"__lo_$i").as("min_num"),
          col(s"__hi_$i").as("max_num")) }: _*)).as("p"))
      .select("p.column", "p.n_rows", "p.n_nulls", "p.n_distinct",
        "p.min_num", "p.max_num")
  }

  /** PROFILE DRIFT between two [[profile]] outputs (vN vs vN−1 of a
    * table or snapshot sink): per column — status (added / dropped /
    * common), row growth, null-rate delta, distinct drift. The
    * freshness/volume contract a publish gate reads: a column whose
    * null rate jumped, a table that stopped growing, a silently
    * dropped column are all one filter away.
    *
    * Scale shape: both inputs are O(#columns) profile rows (the heavy
    * pass already happened inside [[profile]]); this is a full-outer
    * join of two tiny frames — driver-class cost at any data scale.
    * Rates are ROUND(·, 6) doubles computed from the exact long
    * counts, so the report is engine-stable and oracle-pinnable. */
  def profileDrift(cur: DataFrame, prev: DataFrame): DataFrame = {
    val c = cur.select(col("column"), col("n_rows").as("__rc"),
      col("n_nulls").as("__nc"), col("n_distinct").as("__dc"))
    val p = prev.select(col("column"), col("n_rows").as("__rp"),
      col("n_nulls").as("__np"), col("n_distinct").as("__dp"))
    def rate(n: Column, r: Column): Column =
      when(r > 0, round(n.cast(DoubleType) / r, 6))
    c.join(p, Seq("column"), "full_outer")
      .select(
        col("column"),
        when(col("__rp").isNull, "added")
          .when(col("__rc").isNull, "dropped")
          .otherwise("common").as("status"),
        col("__rp").as("n_rows_prev"),
        col("__rc").as("n_rows_cur"),
        (col("__rc") - col("__rp")).as("row_growth"),
        rate(col("__np"), col("__rp")).as("null_rate_prev"),
        rate(col("__nc"), col("__rc")).as("null_rate_cur"),
        when(col("__rp") > 0 && col("__rc") > 0,
          round(col("__nc").cast(DoubleType) / col("__rc") -
            col("__np").cast(DoubleType) / col("__rp"), 6))
          .as("null_rate_delta"),
        col("__dp").as("n_distinct_prev"),
        col("__dc").as("n_distinct_cur"),
        (col("__dc") - col("__dp")).as("distinct_delta"))
      .orderBy("column")
  }

  /** The [[profileDrift]] rows that breach a publish contract, with a
    * `violation` naming the breached rule — empty result ⟺ the publish
    * may proceed. Bounds: `maxNullRateJump` on null_rate_delta,
    * `maxRowGrowthPct`/`minRowGrowthPct` on rows (growth percentage of
    * the previous count; negative growth = shrink), column
    * adds/drops per the flags. */
  def driftViolations(drift: DataFrame, maxNullRateJump: Double,
      maxRowGrowthPct: Double, minRowGrowthPct: Double,
      allowAddedColumns: Boolean = true,
      allowDroppedColumns: Boolean = false): DataFrame = {
    val growthPct = when(col("n_rows_prev") > 0,
      col("row_growth").cast(DoubleType) / col("n_rows_prev") * 100.0)
    val reason =
      when(col("status") === "dropped" && lit(!allowDroppedColumns),
        "column_dropped")
      .when(col("status") === "added" && lit(!allowAddedColumns),
        "column_added")
      .when(col("status") === "common" &&
        col("null_rate_delta") > maxNullRateJump, "null_rate_jump")
      .when(col("status") === "common" && growthPct > maxRowGrowthPct,
        "row_growth_above_max")
      .when(col("status") === "common" && growthPct < minRowGrowthPct,
        "row_growth_below_min")
    drift.withColumn("violation", reason).filter(col("violation").isNotNull)
  }
}
