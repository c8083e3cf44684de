package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Privacy-risk audits for release datasets — the re-identification
  * counterpart to PII redaction (`TextAnalysis.redactPii` scrubs
  * surface strings; these measure STRUCTURAL leakage: how small the
  * crowd is that each row hides in).
  *
  * Scale shape: both reports are two cascaded aggregations — rows →
  * equivalence classes (one shuffle on the quasi-identifier key),
  * classes → histogram (one shuffle on the class size, input already
  * |classes| ≤ |rows|). Nothing row-wise leaves the executors; reports
  * are O(distinct class sizes). The second agg's input is the first's
  * output, so skewed quasi keys cost exactly one hot reducer in pass
  * one — salt the quasi columns upstream if a single class dominates. */
object Privacy {

  /** k-ANONYMITY report: group rows into equivalence classes by the
    * quasi-identifier columns, histogram the class sizes, and flag the
    * sizes below `k` — a release is k-anonymous iff no `below_k` row
    * exists (every record is indistinguishable from ≥ k−1 others on
    * the quasi identifiers). Rows with NULL in a quasi column form
    * their own NULL-keyed classes (groupBy semantics) — NULL is as
    * identifying as any value for linkage, so it participates.
    * Output: (class_size, n_classes, n_rows, below_k) by class_size. */
  def kAnonymityReport(df: DataFrame, quasi: Seq[String],
                       k: Int): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"))
      .select(col("class_size"), col("n_classes"),
        col("n_rows").cast("long").as("n_rows"),
        (col("class_size") < k).as("below_k"))
  }

  /** l-DIVERSITY report: k-anonymity's refinement — a class whose
    * members all share one SENSITIVE value leaks that value even when
    * the class is large. Per equivalence class, count the DISTINCT
    * sensitive values; histogram that diversity and flag classes below
    * `l`. NULL sensitive values count as one value (they are a
    * disclosure too: "attribute withheld" is itself information).
    * Output: (diversity, n_classes, n_rows, below_l) by diversity. */
  def lDiversityReport(df: DataFrame, quasi: Seq[String],
                       sensitive: String, l: Int): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l-diversity needs l >= 2, got $l")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("__rows"),
        // count(distinct) skips NULL; add the NULL "value" back in.
        (countDistinct(col(sensitive)) +
          max(when(col(sensitive).isNull, 1L).otherwise(0L)))
          .as("diversity"))
      .groupBy(col("diversity"))
      .agg(count(lit(1)).as("n_classes"), sum(col("__rows")).as("n_rows"))
      .select(col("diversity").cast("long").as("diversity"),
        col("n_classes"), col("n_rows").cast("long").as("n_rows"),
        (col("diversity") < l).as("below_l"))
  }

  /** t-CLOSENESS report: l-diversity's refinement — a class can be
    * diverse yet still leak if its sensitive-value DISTRIBUTION skews
    * far from the table's (e.g. 90% one diagnosis in a class vs 10%
    * globally). Per equivalence class, the variational (total
    * variation) distance between the class's sensitive distribution
    * and the global one: TVD = ½ Σᵥ |p_c(v) − q(v)| — the standard
    * "equal distance" instantiation for categorical attributes.
    * Output: one row per class (quasi cols, class_size, t_distance,
    * above_t), ordered for release review.
    *
    * Exactness: the distance is computed in INTEGER arithmetic over a
    * common denominator — Σ|n_cv·N − n_v·n_c| as DECIMAL(38,0), plus
    * (N − Σ_{v∈c} n_v)·n_c for the values absent from the class (each
    * contributes |0 − q(v)|; their q's sum to 1 − Σ_present q) — then
    * ONE double division rounded to 6dp. No float sum ever runs over
    * a data-dependent row order, so the report is bit-stable.
    *
    * Scale shape: one (quasi, value) aggregation over the raw rows
    * (the only full-data shuffle), pinned eagerly because three
    * consumers read it (the grand total, the per-value totals window,
    * the main pass); then two windows + one group over the BOUNDED
    * (classes × domain) aggregate. The value-partitioned window runs
    * first so the class-partitioned one leaves the frame partitioned
    * by quasi for the final groupBy — no extra exchange. NULL
    * sensitive values fold to the '(null)' category (a disclosure
    * too), matching [[lDiversityReport]]'s accounting. */
  def tClosenessReport(df: DataFrame, quasi: Seq[String],
                       sensitive: String, t: Double): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(t > 0 && t < 1, s"t-closeness needs t in (0,1), got $t")
    val dec = DecimalType(19, 0)
    val cv = df
      .groupBy(quasi.map(col) :+
        coalesce(col(sensitive).cast("string"), lit("(null)")).as("__v"): _*)
      .agg(count(lit(1)).as("__ncv"))
      .localCheckpoint()
    val tot = cv.agg(sum(col("__ncv")).cast("long").as("__nn"))
    val wValue = Window.partitionBy(col("__v"))
    val wClass = Window.partitionBy(quasi.map(col): _*)
    val g = cv
      .withColumn("__nv", sum(col("__ncv")).over(wValue))
      .withColumn("__nc", sum(col("__ncv")).over(wClass))
      .crossJoin(broadcast(tot))
    val diff = abs(col("__ncv").cast(dec) * col("__nn").cast(dec) -
      col("__nv").cast(dec) * col("__nc").cast(dec))
    g.groupBy(quasi.map(col): _*)
      .agg(max(col("__nc")).cast("long").as("__c"),
        max(col("__nn")).as("__t"),
        sum(diff).as("__s1"),
        sum(col("__nv")).cast("long").as("__s2"))
      .select(quasi.map(col) :+
        col("__c").as("class_size") :+
        round(
          (col("__s1") +
            (col("__t") - col("__s2")).cast(dec) * col("__c").cast(dec))
            .cast(DoubleType) /
          (col("__c").cast(dec) * col("__t").cast(dec) * 2).cast(DoubleType),
          6).as("t_distance"): _*)
      .withColumn("above_t", col("t_distance") > t)
  }

  /** ORDERED t-closeness: for a sensitive attribute whose values have a
    * meaningful order (income bands, severity grades), the variational
    * distance undercounts — "one band off" and "nine bands off" read the
    * same. The ordered-distance instantiation from the t-closeness
    * paper is the Earth Mover's Distance with unit ground distance
    * between ADJACENT ranks: EMD = (Σᵢ |Σ_{j≤i} (p_c(vⱼ) − q(vⱼ))|) /
    * (m − 1) over the m globally-observed values in rank order.
    *
    * Exactness: same integer common-denominator trick as
    * [[tClosenessReport]] — the cumulative mass differences are
    * Σ_{j≤i} (n_cvⱼ·N − n_vⱼ·n_c), exact DECIMAL(38,0) running sums,
    * one double division by (m−1)·n_c·N at the end, 6dp.
    *
    * Scale shape: the per-class distance needs the cumulative diff at
    * EVERY global value, including values a class never takes — so the
    * (class, value) aggregate is densified against the global value
    * list via a broadcast cross join (|classes| × m rows; the sensitive
    * DOMAIN is small by the operator's contract — bands, grades — while
    * classes are unbounded). One full-data shuffle, one broadcast
    * densify + left join, one rank-ordered window per class, one close
    * aggregate. */
  def tClosenessOrderedReport(df: DataFrame, quasi: Seq[String],
                              sensitive: String, t: Double): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(t > 0 && t < 1, s"t-closeness needs t in (0,1), got $t")
    val dec = DecimalType(19, 0)
    val cv = df
      .groupBy(quasi.map(col) :+ col(sensitive).as("__v"): _*)
      .agg(count(lit(1)).as("__ncv"))
      .localCheckpoint()
    // Global value list with ranks and totals — bounded by the domain.
    // Values keep their NATIVE type so the rank order is the
    // attribute's real order (a string fold would rank 10 before 2);
    // NULL is its own rank (first) and the densify join below is
    // null-safe so classes holding NULLs keep their mass.
    val vals = cv.groupBy(col("__v"))
      .agg(sum(col("__ncv")).cast("long").as("__nv"))
      // NULL's rank is pinned FIRST explicitly: Spark's default
      // orderBy sorts NULL first but DuckDB's ROW_NUMBER() sorts NULL
      // last — left implicit, a nullable sensitive attribute would
      // rank (hence EMD) differently per engine. The oracle SQL pins
      // NULLS FIRST to match.
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__v").asc_nulls_first)))
      .localCheckpoint()
    val tot = cv.agg(sum(col("__ncv")).cast("long").as("__nn"))
    val m = vals.count() // bounded domain (operator contract)
    require(m >= 2, "ordered t-closeness needs at least 2 sensitive values")
    // Densify: every class × every global value (absent → n_cv = 0).
    // The left join is NULL-SAFE on both the quasi keys and the value:
    // a NULL-keyed class and a NULL sensitive value must match
    // themselves or their mass silently zeroes and the distance
    // inflates.
    val classes = cv.groupBy(quasi.map(col): _*)
      .agg(sum(col("__ncv")).cast("long").as("__nc"))
    val cvR = cv.select(quasi.map(c => col(c).as(s"__q_$c")) :+
      col("__v").as("__v2") :+ col("__ncv").as("__ncv0"): _*)
    val joinCond = (quasi.map(c => col(c) <=> col(s"__q_$c")) :+
      (col("__v") <=> col("__v2"))).reduce(_ && _)
    val dense = classes.crossJoin(broadcast(vals))
      .join(cvR, joinCond, "left")
      .withColumn("__ncv", coalesce(col("__ncv0"), lit(0L)))
      .crossJoin(broadcast(tot))
    val term = col("__ncv").cast(dec) * col("__nn").cast(dec) -
      col("__nv").cast(dec) * col("__nc").cast(dec)
    val wCum = Window.partitionBy(quasi.map(col): _*).orderBy(col("__rk"))
      .rowsBetween(Window.unboundedPreceding, 0)
    dense
      .withColumn("__cum", sum(term).over(wCum))
      .groupBy(quasi.map(col): _*)
      .agg(max(col("__nc")).as("__c"), max(col("__nn")).as("__t"),
        sum(abs(col("__cum"))).as("__s"))
      .select(quasi.map(col) :+
        col("__c").as("class_size") :+
        round(col("__s").cast(DoubleType) /
          (col("__c").cast(dec) * col("__t").cast(dec) * (m - 1))
            .cast(DoubleType), 6).as("t_distance"): _*)
      .withColumn("above_t", col("t_distance") > t)
  }
}
