package graft.pipelines

import graft.ops._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The reference's `ForexETL` (ref `etl.py:344-449`): align the FX-rates
  * feed and the BTC feed on their date key (the pandas transpose-zip at
  * `etl.py:397` = full-outer join), impute, cast, then 5-column lag
  * pct-change over the global date order.
  *
  * Input shapes (post-extract, FIXTURES.md §B):
  *   rates: date string yyyy-MM-dd, usd_to_eur/gbp/sek/dkk double
  *   btc:   date string yyyy-MM-dd, usd_to_btc double
  * Output (= DDL, ref `etl.py:431-433`): short_date date, the five rate
  * columns, and five `*_delta` pct-change columns.
  *
  * Scale note: the reference's frame is one row per DAY, so the
  * unpartitioned `Window.orderBy(date)` is faithful AND bounded (365
  * rows/year) — acceptable single-task. For a high-cardinality variant,
  * partition the window by a key (see Analytics.pctChange callers).
  */
object ForexPipeline {
  val RateCols = Seq("usd_to_btc", "usd_to_eur", "usd_to_gbp", "usd_to_sek", "usd_to_dkk")

  def clean(rates: DataFrame, btc: DataFrame): DataFrame = {
    val zipped = Reshape.zipByKey(rates, btc, "date")
    Cleaning.castCols(Cleaning.imputeMean(zipped, RateCols), RateCols, DoubleType)
  }

  def transform(df: DataFrame): DataFrame =
    Analytics.pctChange(df, RateCols, partCols = Seq.empty, orderCols = Seq("date"))

  def run(rates: DataFrame, btc: DataFrame): DataFrame =
    transform(clean(rates, btc)).select(
      (Dates.parseYmd(col("date")).as("short_date") +:
        RateCols.map(col) ++: RateCols.map(c => col(c + "_delta"))): _*)

  /** Keep-existing load (ref `etl.py:438-449`, key `short_date`). */
  def load(existing: DataFrame, batch: DataFrame): DataFrame =
    Upsert.upsert(existing, batch, Seq("short_date"), Seq("usd_to_btc"))
}
