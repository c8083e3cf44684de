package graft

import graft.pipelines._
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** End-to-end pipeline tests on reference-shaped fixtures (FIXTURES.md §B)
  * with hand-computed golden values. */
class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  test("StockPipeline: per-symbol lag pct-change with golden values") {
    val ticks = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), 10.0, 11.0, 9.0, 10.0, 100L, "A"),
      (Timestamp.valueOf("2024-01-02 00:00:00"), 12.0, 13.0, 11.0, 12.5, 200L, "A"),
      (Timestamp.valueOf("2024-01-01 00:00:00"), 5.0, 6.0, 4.0, 4.0, 50L, "B"))
      .toDF("Date", "Open", "High", "Low", "Close", "Volume", "StockName")
    val out = StockPipeline.run(ticks).orderBy("stock_name", "time_stamp").collect()
    assert(out.length == 3)
    val a2 = out(1) // second A row
    assert(a2.getAs[Double]("pct_ret") == 12.0 / 10.0 - 1) // Open2/Close1 - 1
    assert(a2.getAs[Double]("pct_vol") == 1.0)             // 200/100 - 1
    val b = out(2)  // single-row symbol → both lags coalesce to 0
    assert(b.getAs[Double]("pct_ret") == 0.0 && b.getAs[Double]("pct_vol") == 0.0)
    assert(out(0).getAs[Long]("time_stamp") == 1704067200L) // unix SECONDS
  }

  test("StockPipeline cleans nulls via column mean before transform") {
    val ticks = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), Some(10.0), 11.0, 9.0, 10.0, 100L, "A"),
      (Timestamp.valueOf("2024-01-02 00:00:00"), None, 13.0, 11.0, 20.0, 200L, "A"),
      (Timestamp.valueOf("2024-01-03 00:00:00"), Some(30.0), 31.0, 29.0, 30.0, 300L, "A"))
      .toDF("Date", "Open", "High", "Low", "Close", "Volume", "StockName")
    val out = StockPipeline.run(ticks).orderBy("time_stamp").collect()
    assert(out(1).getAs[Double]("price_open") == 20.0, "null Open → mean(10,30)")
    assert(out(1).getAs[Double]("pct_ret") == 20.0 / 10.0 - 1, "lag uses imputed value")
  }

  test("NewsPipeline: filter, lowercase, JSON keywords, golden time columns") {
    val docs = Seq(
      ("2024-01-02T03:04:05", "Snippet One", "Headline ONE", Seq("Fed", "GDP"), "business"),
      ("2024-01-02T03:04:05", "", "empty snippet drops", Seq("x"), "business"),
      ("2024-01-02T03:04:05", "kept text", "", Seq("x"), "business"),
      ("2024-01-02T03:04:05", "wrong desk drops", "h", Seq("x"), "sports"))
      .toDF("pub_date", "snippet", "headline", "keywords", "news_desk")
    val out = NewsPipeline.run(docs).collect()
    assert(out.length == 1, "allowlist + non-empty filters leave one row")
    val r = out.head
    assert(r.getAs[Long]("time_stamp") == 1704164645L)
    assert(r.getAs[java.sql.Date]("short_date").toString == "2024-01-02")
    assert(r.getAs[String]("snippet") == "snippet one")
    assert(r.getAs[String]("keywords") == """["fed","gdp"]""")
  }

  test("NewsPipeline end-to-end from an actual JSON file (spark.read.json)") {
    // The §2.1 JSON source shape exercised through a real file read, not
    // just from_json over a string column: schema inference must deliver
    // the pipeline's expected columns (keywords as array<string>).
    val dir = java.nio.file.Files.createTempDirectory("graft_json")
    val f = dir.resolve("news.json")
    java.nio.file.Files.write(f, Seq(
      """{"pub_date":"2024-01-02T03:04:05","snippet":"Snippet One","headline":"Headline ONE","keywords":["Fed","GDP"],"news_desk":"business"}""",
      """{"pub_date":"2024-01-02T03:04:06","snippet":"","headline":"empty snippet drops","keywords":["x"],"news_desk":"business"}""",
      """{"pub_date":"2024-01-02T03:04:07","snippet":"wrong desk drops","headline":"h","keywords":["x"],"news_desk":"sports"}"""
    ).mkString("\n").getBytes)
    try {
      val raw = spark.read.json(f.toString)
      val out = NewsPipeline.run(raw).collect()
      assert(out.length == 1, "allowlist + non-empty filters leave one row")
      assert(out.head.getAs[Long]("time_stamp") == 1704164645L)
      assert(out.head.getAs[String]("snippet") == "snippet one")
      assert(out.head.getAs[String]("keywords") == """["fed","gdp"]""")
    } finally {
      java.nio.file.Files.deleteIfExists(f)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }

  test("ForexPipeline: full-outer date zip, mean impute, 5-col lag deltas") {
    val rates = Seq(
      ("2024-01-01", 2.0, 1.0, 1.0, 1.0),
      ("2024-01-02", 4.0, 1.0, 1.0, 1.0))
      .toDF("date", "usd_to_eur", "usd_to_gbp", "usd_to_sek", "usd_to_dkk")
    val btc = Seq(("2024-01-02", 10.0), ("2024-01-03", 20.0)).toDF("date", "usd_to_btc")
    val out = ForexPipeline.run(rates, btc).orderBy("short_date").collect()
    assert(out.length == 3)
    // d1: btc missing → mean(10,20)=15; d3: eur missing → mean(2,4)=3
    assert(out(0).getAs[Double]("usd_to_btc") == 15.0)
    assert(out(2).getAs[Double]("usd_to_eur") == 3.0)
    assert(out(1).getAs[Double]("usd_to_eur_delta") == 4.0 / 2.0 - 1)
    assert(out(2).getAs[Double]("usd_to_eur_delta") == 3.0 / 4.0 - 1)
    assert(out(0).getAs[Double]("usd_to_eur_delta") == 0.0, "first row fillna(0)")
    assert(out(1).getAs[Double]("usd_to_btc_delta") == 10.0 / 15.0 - 1)
  }

  test("StockPipeline end-to-end from an actual CSV file (spark.read.csv)") {
    // The OHLCV feed shape through a real CSV read with an explicit
    // schema — the other file format a finance feed arrives in.
    val dir = java.nio.file.Files.createTempDirectory("graft_csv")
    val f = dir.resolve("ticks.csv")
    java.nio.file.Files.write(f, Seq(
      "Date,Open,High,Low,Close,Volume,StockName",
      "2024-01-01 00:00:00,10.0,11.0,9.0,10.0,100,A",
      "2024-01-02 00:00:00,12.0,13.0,11.0,12.5,200,A"
    ).mkString("\n").getBytes)
    try {
      val ticks = spark.read
        .option("header", "true")
        .schema("Date TIMESTAMP, Open DOUBLE, High DOUBLE, Low DOUBLE, " +
          "Close DOUBLE, Volume LONG, StockName STRING")
        .csv(f.toString)
      val out = StockPipeline.run(ticks).orderBy("time_stamp").collect()
      assert(out.length == 2)
      assert(out(1).getAs[Double]("pct_ret") == 12.0 / 10.0 - 1)
      assert(out(0).getAs[Long]("time_stamp") == 1704067200L)
    } finally {
      java.nio.file.Files.deleteIfExists(f)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }

  test("CSV round trip preserves hostile cells; multiLine handles embedded newlines") {
    import org.apache.spark.sql.types.StructType
    val rows = Seq((1L, "plain"), (2L, "a,b,c"), (3L, "say \"hi\""),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    graft.sources.Tables.writeCsv(rows, dir)
    val back = graft.sources.Tables.readCsv(spark, dir,
        StructType.fromDDL("id LONG, text STRING"))
      .as[(Long, Option[String])].collect().toSet
    assert(back == Set(1L -> Some("plain"), 2L -> Some("a,b,c"),
      3L -> Some("say \"hi\""), 4L -> None),
      "commas and quotes survive the quoted round trip; null stays null")
    // Embedded newline: written quoted, readable only under multiLine
    // (the documented splittability trade).
    val nl = Seq((9L, "line1\nline2")).toDF("id", "text")
    val dir2 = java.nio.file.Files.createTempDirectory("graft_csv_nl").toString
    graft.sources.Tables.writeCsv(nl, dir2)
    val back2 = graft.sources.Tables.readCsv(spark, dir2,
        StructType.fromDDL("id LONG, text STRING"), multiLine = true)
      .as[(Long, String)].collect().toSeq
    assert(back2 == Seq(9L -> "line1\nline2"))
  }

  test("StockPipeline.load upsert keeps existing on duplicate key") {
    val mk = (ts: Long, name: String, ret: Double) =>
      (ts, name, 1.0, 1.0, 1.0, 1.0, 1L, ret, 0.0)
    val cols = Seq("time_stamp", "stock_name", "price_open", "price_high",
      "price_low", "price_close", "volume", "pct_ret", "pct_vol")
    val existing = Seq(mk(1L, "A", 0.1)).toDF(cols: _*)
    val batch = Seq(mk(1L, "A", 0.9), mk(2L, "A", 0.2)).toDF(cols: _*)
    val out = StockPipeline.load(existing, batch).orderBy("time_stamp").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("pct_ret") == 0.1, "existing row untouched")
  }
}
