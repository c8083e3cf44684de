package graft.pipelines

import graft.ops._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** The reference's `StockETL` (ref `etl.py:111-191`) as a lazy DataFrame
  * composition: clean (mean-impute + casts) → transform (time columns +
  * per-symbol lag pct-changes) → DDL-shaped output.
  *
  * Input shape (post-extract, FIXTURES.md §B):
  *   Date timestamp, Open/High/Low/Close double, Volume long, StockName string
  * Output shape (= MySQL DDL, ref `etl.py:176-178`):
  *   time_stamp long, stock_name string, price_open/high/low/close double,
  *   volume long, pct_ret double, pct_vol double
  *
  * The reference fetched one symbol at a time and appended (`etl.py:121-134`);
  * Spark-first, the whole tick table arrives at once and symbol is a column —
  * the per-symbol loop disappears and the lag window shuffles once on symbol.
  */
object StockPipeline {
  val Ohlc = Seq("Open", "High", "Low", "Close")

  def clean(df: DataFrame): DataFrame = {
    val imputed = Cleaning.imputeMean(df, Ohlc ++ Seq("Volume"))
    Cleaning.castCols(
      Cleaning.castCols(imputed, Ohlc, DoubleType), Seq("Volume"), LongType)
  }

  def transform(df: DataFrame): DataFrame = {
    val timed = df
      .withColumn("time_stamp", Dates.tsUnix(col("Date")))
      .drop("Date")
    // Intended per-symbol lag, not the reference's accidental
    // cross-symbol shift (SURVEY.md §2.7 semantic trap).
    Analytics.pctChangeVs(
      Analytics.pctChangeVs(timed, "Open", "Close", "pct_ret",
        Seq("StockName"), Seq("time_stamp")),
      "Volume", "Volume", "pct_vol", Seq("StockName"), Seq("time_stamp"))
  }

  def run(input: DataFrame): DataFrame =
    transform(clean(input)).select(
      col("time_stamp"), col("StockName").as("stock_name"),
      col("Open").as("price_open"), col("High").as("price_high"),
      col("Low").as("price_low"), col("Close").as("price_close"),
      col("Volume").as("volume"), col("pct_ret"), col("pct_vol"))

  /** Keep-existing load (ref `etl.py:182-191`, key `time_stamp, stock_name`). */
  def load(existing: DataFrame, batch: DataFrame): DataFrame =
    Upsert.upsert(existing, batch, Seq("time_stamp", "stock_name"),
      Seq("pct_ret", "price_open"))
}
