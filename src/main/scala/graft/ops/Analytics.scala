package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lag-based percent-change analytics — the reference's flagship transform
  * (SURVEY.md §2.7; ref `etl.py:166-170, 418-422`).
  *
  * The reference's `shift(1)` runs over a concatenated frame, accidentally
  * lagging across symbol boundaries (SURVEY.md §2.7 "semantic trap"); we
  * implement the INTENDED per-key semantics with an explicit window.
  */
object Analytics {

  /** `cur/lag(cur,1) − 1` per partition, first row → 0.0
    * (ref `pct_change().fillna(0)`).
    *
    * Scale posture: one shuffle on `partCols` (hash-partitioned window);
    * each key's rows sort locally. No global ordering, no single-task
    * window as long as `partCols` is non-empty.
    */
  def pctChange(df: DataFrame, valueCols: Seq[String], partCols: Seq[String],
                orderCols: Seq[String], suffix: String = "_delta"): DataFrame = {
    val w = (if (partCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(partCols.map(col): _*))
      .orderBy(orderCols.map(col): _*)
    valueCols.foldLeft(df) { (d, c) =>
      d.withColumn(c + suffix,
        coalesce(col(c) / lag(col(c), 1).over(w) - 1, lit(0.0)))
    }
  }

  /** Ratio-to-previous on an explicit numerator/denominator pair, e.g. the
    * reference's overnight return `Open/lag(Close,1) − 1` (ref `etl.py:166`). */
  def pctChangeVs(df: DataFrame, numCol: String, lagCol: String, outCol: String,
                  partCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderCols.map(col): _*)
    df.withColumn(outCol,
      coalesce(col(numCol) / lag(col(lagCol), 1).over(w) - 1, lit(0.0)))
  }

  /** Top-k rows per group by `orderBy` (extension; deterministic tie-break
    * must be embedded in `orderBy`). Single shuffle on `partCols`. */
  def topKPerGroup(df: DataFrame, partCols: Seq[String], orderBy: Seq[Column],
                   k: Int, rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }
}
