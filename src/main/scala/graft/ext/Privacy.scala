package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
