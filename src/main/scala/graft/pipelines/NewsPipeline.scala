package graft.pipelines

import graft.ops._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's `NewsETL` (ref `etl.py:194-341`): allowlist filter +
  * nested projection → lowercase clean → time columns → JSON-serialized
  * keywords at the sink.
  *
  * Input shape (post-extract, FIXTURES.md §B):
  *   pub_date string (ISO-8601 'T'), snippet string, headline string,
  *   keywords array<string>, news_desk string
  * Output shape (= DDL, ref `etl.py:324-325`):
  *   time_stamp long, short_date date, snippet string, headline string,
  *   keywords string (JSON array)
  */
object NewsPipeline {

  /** 8-element news-desk allowlist (ref `etl.py:258-259`). */
  val ImportantDesks = Seq("business", "national", "politics", "insider",
    "financial", "foreign", "technology", "science")

  def extractFilter(df: DataFrame): DataFrame =
    Text.filterInSet(df, "news_desk", ImportantDesks)

  def clean(df: DataFrame): DataFrame = {
    val lowered = Text.lowerCols(df, Seq("snippet", "headline"))
      .withColumn("keywords", Text.arrLower(col("keywords")))
    Text.filterNonEmpty(lowered, Seq("snippet", "headline"))
  }

  def transform(df: DataFrame): DataFrame =
    df.withColumn("short_date", Dates.dateShort(Dates.parseMultiTs(col("pub_date"))))
      .withColumn("time_stamp", Dates.tsUnixMulti(col("pub_date")))
      .drop("pub_date")

  def run(input: DataFrame): DataFrame =
    transform(clean(extractFilter(input))).select(
      col("time_stamp"),
      Dates.parseDmy(col("short_date")).as("short_date"),
      col("snippet"), col("headline"),
      Text.jsonSerialize(col("keywords")).as("keywords"))

  /** Keep-existing load (ref `etl.py:331-341`, key `time_stamp, headline`). */
  def load(existing: DataFrame, batch: DataFrame): DataFrame =
    Upsert.upsert(existing, batch, Seq("time_stamp", "headline"), Seq("snippet"))
}
