package graft

import graft.ops._
import graft.pipelines._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (reference
  * parity) or a scale-out extension (dedup / similarity / text analysis),
  * expressed Spark-first over the driver testdata, with a DuckDB oracle in
  * `oracleSql`. Every query ends in a total ORDER BY on a unique key so
  * the parquet dump is deterministic; Catalyst's EliminateSorts removes
  * that sort under Bench's count(), so it costs nothing at bench time.
  */
object SparkEntry {

  private def read(s: SparkSession, dir: String, table: String): DataFrame =
    graft.sources.Tables.table(s, dir, table)

  /** Testdata → reference-shaped feeds (FIXTURES.md §A mapping). */
  object Feeds {
    /** events ≈ stock ticks: event_type=symbol, ts=Date, value=price. */
    def stockTicks(events: DataFrame): DataFrame = events.select(
      col("ts").as("Date"),
      col("value").as("Open"),
      (col("value") * 1.02).as("High"),
      (col("value") * 0.98).as("Low"),
      (col("value") * 1.01).as("Close"),
      ((col("user_id") + 1) * 100).cast(LongType).as("Volume"),
      col("event_type").as("StockName"))

    /** Exact decimal mean of a clean-2dp double, rounded 6dp — engine-
      * reproducible (see SparkEntry dsum note). */
    private def davg(c: Column): Column =
      round(sum(c.cast(DecimalType(25, 6))).cast(DoubleType) / count(c), 6)

    /** Daily OHLCV-shaped feed with UNIQUE (symbol, day) keys, so the
      * pipeline's per-symbol lag has a deterministic order. */
    def dailyTicks(events: DataFrame): DataFrame = events
      .groupBy(col("event_type").as("StockName"), to_date(col("ts")).as("d"))
      .agg(davg(col("value")).as("Open"), count(lit(1)).as("n"))
      .select(
        col("d").cast(TimestampType).as("Date"),
        col("Open"),
        (col("Open") * 1.02).as("High"),
        (col("Open") * 0.98).as("Low"),
        (col("Open") * 1.01).as("Close"),
        (col("n") * 100).cast(LongType).as("Volume"),
        col("StockName"))

    /** News-doc-shaped feed from documents (FIXTURES.md §B shape):
      * synthetic ISO pub_date (7-minute cadence from a fixed origin),
      * mixed-case headline, array keywords, desk derived from source —
      * with rows that exercise both pipeline filters. */
    def newsDocs(documents: DataFrame): DataFrame = documents.select(
      date_format(timestamp_seconds(lit(1704067200L) + col("doc_id") * 420),
        "yyyy-MM-dd'T'HH:mm:ss").as("pub_date"),
      when(col("doc_id") % 97 === 0, lit("")).otherwise(col("text")).as("snippet"),
      upper(substring(col("text"), 1, 30)).as("headline"),
      slice(split(col("text"), " "), 1, 3).as("keywords"),
      when(col("source").isin("src0", "src1", "src2", "src3", "src4"), "business")
        .when(col("source").isin("src5", "src6", "src7"), "politics")
        .when(col("source").isin("src8", "src9"), "sports")
        .otherwise("technology").as("news_desk"))

    /** Forex-shaped feeds: 4 event types → daily "rates", 1 type → "btc",
      * both keyed by a yyyy-MM-dd date string (FIXTURES.md §B shape).
      *
      * One-pass plan: a single groupBy(date).pivot(event_type) replaces
      * 5 scans + 3 full-outer joins — one events scan, one date shuffle,
      * and both feeds share the exchange (ReuseExchange). The per-type
      * presence count preserves exact full-outer semantics: a date enters
      * a feed iff at least one of its types has rows that day, even if
      * every value that day is null. */
    def forexFeeds(events: DataFrame): (DataFrame, DataFrame) = {
      val types = Seq("purchase" -> "usd_to_eur", "view" -> "usd_to_gbp",
        "click" -> "usd_to_sek", "error" -> "usd_to_dkk", "signup" -> "usd_to_btc")
      // Bounded at one row per day (365 rows/yr × 11 cols) no matter the
      // input size, and read 4× downstream (both feeds, then twice more
      // by imputeMean's two-pass agg+fill — per-branch column pruning
      // makes the subtrees differ, so ReuseExchange can't dedupe them on
      // its own). Materialized to a driver-side LocalRelation rather
      // than .cache(): the downstream plans embed the tiny table itself,
      // so the aggregation still runs once, but nothing rides the
      // CacheManager — a .cache() here had no release point (the
      // consuming action happens in the caller) and its canonical
      // subtree could silently substitute into a LATER query's plan.
      val pivotedQ = events
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("date"))
        .pivot("event_type", types.map(_._1))
        .agg(davg(col("value")).as("v"), count(lit(1)).as("n"))
      val pivoted = events.sparkSession.createDataFrame(
        java.util.Arrays.asList(pivotedQ.collect(): _*), pivotedQ.schema)
      val rateTypes = types.init
      val rates = pivoted
        .filter(rateTypes.map { case (t, _) => col(s"${t}_n").isNotNull }.reduce(_ || _))
        .select(col("date") +: rateTypes.map { case (t, out) => col(s"${t}_v").as(out) }: _*)
      val btc = pivoted.filter(col("signup_n").isNotNull)
        .select(col("date"), col("signup_v").as("usd_to_btc"))
      (rates, btc)
    }
  }

  /** Flagship: the full StockETL pipeline over event ticks (sf0.001);
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    StockPipeline.run(Feeds.stockTicks(read(spark, "/root/testdata/sf0.001", "events")))

  // Exact-sum trick shared by all FP aggregates: sum in DECIMAL (exact,
  // order-independent) then one cast to double — bit-identical across
  // engines, unlike a double sum whose value depends on add order.
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(25, 6))).cast(DoubleType)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    parityQueries ++ ExtQueries.queries

  def oracleSql: Map[String, String] = parityOracles ++ ExtQueries.oracles

  /** SURVEY.md §2 reference-parity operators. */
  private def parityQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ───────── §2.1 scans / range generators ─────────
    "q_src_scan" -> ((s, dir) => {
      // src_stock: whole-table scan + constant source tag (lit_tag,
      // ref etl.py:131) — the per-symbol fetch loop collapses into one scan.
      read(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"),
          lit("events").as("source_tag"))
        .orderBy("event_id")
    }),

    "q_gen_month_range" -> ((s, dir) => {
      // gen_month_range (ref etl.py:241-251): rrule(MONTHLY) loop →
      // sequence+explode over the orders date span. One 1-row agg, no loop.
      val span = read(s, dir, "orders")
        .agg(min(to_date(col("o_orderdate"))).as("lo"), max(to_date(col("o_orderdate"))).as("hi"))
      span.select(Dates.monthRange(col("lo"), col("hi")).as("month_start"))
        .orderBy("month_start")
    }),

    "q_gen_day_range" -> ((s, dir) => {
      // gen_day_range (ref etl.py:372-373): per-day loop → sequence+explode.
      val span = read(s, dir, "orders")
        .agg(min(to_date(col("o_orderdate"))).as("lo"), max(to_date(col("o_orderdate"))).as("hi"))
      span.select(Dates.dayRange(col("lo"), col("hi")).as("day"))
        .orderBy("day")
    }),

    "q_proj_nested" -> ((s, dir) => {
      // proj_nested (ref etl.py:278-283): nested JSON doc → flat columns,
      // via from_json + struct field access (events.props ≈ the JSON doc).
      read(s, dir, "events")
        .withColumn("j", Reshape.parseJson(col("props"), StructType(Seq(StructField("k", LongType)))))
        .select(col("event_id"), col("j.k").as("prop_k"))
        .orderBy("event_id")
    }),

    // ───────── §2.3 filters ─────────
    "q_filter_in_set" -> ((s, dir) => {
      // filter_in_set (ref etl.py:258-259,277): allowlist membership.
      Text.filterInSet(read(s, dir, "events"), "event_type",
          Seq("purchase", "signup", "error"))
        .select(col("event_id"), col("event_type"), col("value"))
        .orderBy("event_id")
    }),

    "q_filter_nonempty" -> ((s, dir) => {
      // filter_nonempty (ref etl.py:307-308): drop empty-string rows.
      Text.filterNonEmpty(read(s, dir, "documents"), Seq("text", "lang"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // ───────── §2.4 cleaning ─────────
    "q_impute_mean" -> ((s, dir) => {
      // impute_mean (intended semantics of ref etl.py:140-145): nulls are
      // synthesized on a deterministic key mask, then filled with the
      // column mean (rounded for cross-engine reproducibility).
      val ev = read(s, dir, "events").withColumn("v",
        when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
      Cleaning.imputeMean(ev, Seq("v"))
        .select(col("event_id"), col("v"))
        .orderBy("event_id")
    }),

    "q_cast_types" -> ((s, dir) => {
      // cast_float / cast_int (ref etl.py:148-150): numeric casts.
      read(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast(LongType).as("qty_long"),
          col("l_linenumber").cast(DoubleType).as("line_double"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ───────── §2.5 string / array / JSON ─────────
    "q_str_lower" -> ((s, dir) => {
      // str_lower (ref etl.py:301-302).
      read(s, dir, "documents")
        .select(col("doc_id"), lower(col("text")).as("text_lc"),
          lower(col("source")).as("source_lc"))
        .orderBy("doc_id")
    }),

    "q_arr_lower" -> ((s, dir) => {
      // arr_lower (ref etl.py:303-304): higher-order transform over an
      // array column — re-joined to a string for a portable compare.
      read(s, dir, "documents")
        .select(col("doc_id"),
          array_join(Text.arrLower(split(col("text"), " ")), " ").as("words_lc"))
        .orderBy("doc_id")
    }),

    "q_json_serialize" -> ((s, dir) => {
      // json_serialize (ref etl.py:333): array column → JSON text.
      read(s, dir, "documents")
        .select(col("doc_id"),
          Text.jsonSerialize(slice(split(col("text"), " "), 1, 5)).as("kw_json"))
        .orderBy("doc_id")
    }),

    // ───────── §2.6 date / time ─────────
    "q_date_short" -> ((s, dir) => {
      // date_short (ref etl.py:25-31): dd-MM-yyyy short date string.
      read(s, dir, "orders")
        .select(col("o_orderkey"), Dates.dateShort(col("o_orderdate")).as("short_date"))
        .orderBy("o_orderkey")
    }),

    "q_ts_unix" -> ((s, dir) => {
      // ts_unix (ref etl.py:33-49): timestamp → unix SECONDS (BIGINT).
      read(s, dir, "orders")
        .select(col("o_orderkey"), Dates.tsUnix(col("o_orderdate")).as("time_stamp"))
        .orderBy("o_orderkey")
    }),

    "q_date_roundtrip" -> ((s, dir) => {
      // date_parse_dmy (ref etl.py:334): short-date string re-parsed to DATE
      // at the sink — full render→parse round trip.
      read(s, dir, "orders")
        .select(col("o_orderkey"),
          Dates.parseDmy(Dates.dateShort(col("o_orderdate"))).as("short_date"))
        .orderBy("o_orderkey")
    }),

    "q_ts_multiformat" -> ((s, dir) => {
      // The reference's 3-format parse ladder (ref etl.py:39-49): rows are
      // rendered in 3 different formats, then parsed back via the
      // try_to_timestamp coalesce ladder → unix seconds.
      read(s, dir, "events")
        .withColumn("raw",
          when(col("event_id") % 3 === 0, date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"))
            .when(col("event_id") % 3 === 1, date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
            .otherwise(date_format(col("ts"), "yyyy-MM-dd")))
        .select(col("event_id"), Dates.tsUnixMulti(col("raw")).as("time_stamp"))
        .orderBy("event_id")
    }),

    // ───────── §2.7 window / pct-change (flagship) ─────────
    "q_pct_change" -> ((s, dir) => {
      // pct_change_returns (ref etl.py:166-170) with the INTENDED per-key
      // partitioning (SURVEY.md §2.7): one shuffle on event_type, local sort.
      val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
      read(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"),
          coalesce(col("value") / lag(col("value"), 1).over(w) - 1, lit(0.0)).as("pct"))
        .orderBy("event_id")
    }),

    "q_pct_change_multi" -> ((s, dir) => {
      // pct_change_multi (ref etl.py:418-422): forex-style — one row per
      // day, multi-column lag over the global date order. Inputs are
      // rounded aggregates so the lag arithmetic is engine-exact.
      val daily = read(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(round(dsum(col("value")) / count(col("value")), 6).as("avg_v"),
          count(lit(1)).cast(DoubleType).as("cnt"))
      Analytics.pctChange(daily, Seq("avg_v", "cnt"), Seq.empty, Seq("day"))
        .orderBy("day")
    }),

    // ───────── §2.8 union / reshape ─────────
    "q_union_append" -> ((s, dir) => {
      // union_append (ref etl.py:132,293): per-source frames → unionByName.
      val ev = read(s, dir, "events")
      Reshape.unionAll(Seq(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "signup")))
        .select(col("event_id"), col("event_type"), col("value"))
        .orderBy("event_id")
    }),

    "q_zip_by_key" -> ((s, dir) => {
      // zip_by_key (ref etl.py:397): two date-keyed feeds full-outer
      // aligned on the date key — the join hidden in the pandas transpose.
      // The generic operator is Reshape.zipByKey (full-outer join; used by
      // ForexPipeline and OpsSpec for heterogeneous sources). Here both
      // feeds derive from ONE table, so the one-pass plan is conditional
      // aggregation over a single events scan — one shuffle, no join.
      // nullif(count, 0) preserves exact full-outer semantics: a type with
      // no rows that day is NULL, and a day appears iff either type has
      // rows (guaranteed by the isin filter before the groupBy).
      read(s, dir, "events")
        .filter(col("event_type").isin("purchase", "signup"))
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          nullif(count(when(col("event_type") === "purchase", 1)), lit(0)).as("n_purchase"),
          nullif(count(when(col("event_type") === "signup", 1)), lit(0)).as("n_signup"))
        .orderBy("day")
    }),

    // ───────── §2.9 sink / upsert ─────────
    "q_upsert" -> ((s, dir) => {
      // sink_upsert keep-existing semantics (ref etl.py:182-191): existing
      // rows win; only absent keys are appended. Incoming doubles `value`
      // so keep-existing is observable in the output.
      val ev = read(s, dir, "events").select(col("event_id"), col("user_id"), col("value"))
      val existing = ev.filter(col("event_id") % 10 < 5)
      val incoming = ev.withColumn("value", col("value") * 2)
      Upsert.upsert(existing, incoming, Seq("event_id"), Seq("user_id"))
        .orderBy("event_id")
    }),

    "q_dedup_key" -> ((s, dir) => {
      // sink_ddl unique-index semantics (ref etl.py:176-180): deterministic
      // first-row-per-key dedup via row_number (stable winner).
      Upsert.dedupOnKey(read(s, dir, "events"),
          Seq("user_id", "event_type"), Seq("ts", "event_id"))
        .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
        .orderBy("user_id", "event_type")
    }),

    "q_map_explode" -> ((s, dir) => {
      // src_btc_json + dict_to_rows + proj_map_fields (ref etl.py:387-399):
      // JSON parsed as a MAP, exploded to (key, value) rows, plus a named
      // map-key projection — the pandas dict→transpose without the transpose.
      val m = read(s, dir, "events")
        .withColumn("m", from_json(col("props"), MapType(StringType, LongType)))
      m.select(col("event_id"), explode(col("m")).as(Seq("key", "val")),
          element_at(col("m"), "k").as("k_field"))
        .orderBy("event_id", "key")
    }),

    "q_col_ops" -> ((s, dir) => {
      // col_rename + col_drop (ref etl.py:401-402, 162): schema surgery.
      read(s, dir, "events")
        .withColumnRenamed("value", "price")
        .drop("props", "ts")
        .select(col("event_id"), col("user_id"), col("event_type"), col("price"))
        .orderBy("event_id")
    }),

    "q_col_split" -> ((s, dir) => {
      // col_split (ref etl.py:398-399): a list-valued column fanned out
      // into N named columns — the forex [rate, rate, ...] row shape.
      val withArr = read(s, dir, "events")
        .select(col("event_id"),
          array(col("value"), col("user_id").cast(DoubleType)).as("arr"))
      Reshape.colSplit(withArr, "arr", Seq("rate_v", "rate_u"))
        .orderBy("event_id")
    }),

    "q_pipeline_stock" -> ((s, dir) => {
      // The WHOLE StockETL pipeline (§3.1) end-to-end over a daily
      // tick feed derived from events (unique (symbol, day) keys keep the
      // lag deterministic).
      StockPipeline.run(Feeds.dailyTicks(read(s, dir, "events")))
        .orderBy("stock_name", "time_stamp")
    }),

    "q_pipeline_forex" -> ((s, dir) => {
      // The WHOLE ForexETL pipeline (§3.3): two date-keyed daily feeds,
      // full-outer zip, impute, 5-column lag deltas.
      val (rates, btc) = Feeds.forexFeeds(read(s, dir, "events"))
      ForexPipeline.run(rates, btc).orderBy("short_date")
    }),

    "q_pipeline_news" -> ((s, dir) => {
      // The WHOLE NewsETL pipeline (§3.2): desk allowlist, lowercase clean,
      // non-empty filters, multi-format time parse, JSON keyword sink.
      NewsPipeline.run(Feeds.newsDocs(read(s, dir, "documents")))
        .orderBy("time_stamp", "headline")
    }),

    "q_table_checksum" -> ((s, dir) => {
      // Order-insensitive integrity checksum of lineitem's key columns:
      // one scan, one tiny row — DuckDB computes the identical sum from
      // the identical per-row md5 render, proving cross-engine validation
      // of a migrated table works with no row transfer at all. The double
      // column rides as DECIMAL(18,2): FP renders differ across engines,
      // decimal renders are canonical (enforced by tableChecksum).
      Checksum.tableChecksum(
        read(s, dir, "lineitem")
          .withColumn("l_quantity", col("l_quantity").cast(DecimalType(18, 2))),
        Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"))
    }),

    "q_sessionize" -> ((s, dir) => {
      // Batch gap sessionization (30-min gap per user) — the twin of the
      // streaming flatMapGroupsWithState sessionizer, hash-verified here.
      Analytics.sessionizeBatch(read(s, dir, "events"),
          "user_id", "ts", "event_id", "value", gapSec = 1800L)
        .orderBy("user_id", "session_id")
    }),

    "q_range_join" -> ((s, dir) => {
      // Bounded-interval join: per error event, count the same user's
      // purchases in the preceding hour. Bucketed equi-join (see
      // Analytics.intervalJoinBucketed) — never a nested-loop plan.
      val ev = read(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts").as("e_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"))
      Analytics.intervalJoinBucketed(errors, purchases, "user_id", "e_ts", "p_ts", 3600L)
        .groupBy(col("event_id")).agg(count(lit(1)).as("n_purchases"))
        .orderBy("event_id")
    }),

    "q_asof_join" -> ((s, dir) => {
      // Backward as-of join (tick/quote alignment): latest signup value at
      // or before each purchase, per user. Composed union+window plan —
      // one key shuffle; DuckDB's native ASOF JOIN is the oracle.
      val ev = read(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("value"))
      Analytics.asOfJoinBackward(purchases, signups, "user_id", "ts",
          Map("value" -> "sig_val"))
        .select(col("event_id"), col("user_id"), col("sig_val"))
        .orderBy("event_id")
    }),

    "q_asof_forward" -> ((s, dir) => {
      // Forward as-of join (label construction): the NEXT click value at
      // or after each purchase, per user — the leakage-free future-label
      // attach. Same composed plan, frame reversed; DuckDB ASOF with
      // l.ts <= r.ts is the oracle.
      val ev = read(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      Analytics.asOfJoinForward(purchases, clicks, "user_id", "ts",
          Map("value" -> "next_click_val"))
        .select(col("event_id"), col("user_id"), col("next_click_val"))
        .orderBy("event_id")
    })
  )

  private def parityOracles: Map[String, String] = Map(
    "q_src_scan" ->
      """SELECT event_id, event_type, value, 'events' AS source_tag
         FROM events ORDER BY event_id""",

    "q_gen_month_range" ->
      """SELECT CAST(unnest(generate_series(
           date_trunc('month', (SELECT MIN(CAST(o_orderdate AS DATE)) FROM orders)),
           date_trunc('month', (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)),
           INTERVAL 1 MONTH)) AS DATE) AS month_start ORDER BY month_start""",

    "q_gen_day_range" ->
      """SELECT CAST(unnest(generate_series(
           (SELECT MIN(CAST(o_orderdate AS DATE)) FROM orders),
           (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders),
           INTERVAL 1 DAY)) AS DATE) AS day ORDER BY day""",

    "q_proj_nested" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k
         FROM events ORDER BY event_id""",

    "q_filter_in_set" ->
      """SELECT event_id, event_type, value FROM events
         WHERE event_type IN ('purchase','signup','error') ORDER BY event_id""",

    "q_filter_nonempty" ->
      """SELECT doc_id, lang, n_chars FROM documents
         WHERE text <> '' AND lang <> '' ORDER BY doc_id""",

    "q_impute_mean" ->
      """WITH v AS (SELECT event_id,
           CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v FROM events)
         SELECT event_id, COALESCE(v, (SELECT ROUND(
           CAST(SUM(CAST(v AS DECIMAL(25,6))) AS DOUBLE) / COUNT(v), 6) FROM v)) AS v
         FROM v ORDER BY event_id""",

    "q_cast_types" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty_long,
           CAST(l_linenumber AS DOUBLE) AS line_double
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "q_str_lower" ->
      """SELECT doc_id, lower(text) AS text_lc, lower(source) AS source_lc
         FROM documents ORDER BY doc_id""",

    "q_arr_lower" ->
      """SELECT doc_id, array_to_string(
           list_transform(str_split(text, ' '), x -> lower(x)), ' ') AS words_lc
         FROM documents ORDER BY doc_id""",

    "q_json_serialize" ->
      """SELECT doc_id, to_json(str_split(text, ' ')[1:5]) AS kw_json
         FROM documents ORDER BY doc_id""",

    "q_date_short" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%d-%m-%Y') AS short_date
         FROM orders ORDER BY o_orderkey""",

    "q_ts_unix" ->
      """SELECT o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS time_stamp
         FROM orders ORDER BY o_orderkey""",

    "q_date_roundtrip" ->
      """SELECT o_orderkey, CAST(strptime(strftime(o_orderdate, '%d-%m-%Y'),
           '%d-%m-%Y') AS DATE) AS short_date
         FROM orders ORDER BY o_orderkey""",

    "q_ts_multiformat" ->
      """WITH r AS (SELECT event_id,
           CASE WHEN event_id % 3 = 0 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
                WHEN event_id % 3 = 1 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
                ELSE strftime(ts, '%Y-%m-%d') END AS raw FROM events)
         SELECT event_id, CAST(epoch(COALESCE(
           try_strptime(raw, '%Y-%m-%dT%H:%M:%S'),
           try_strptime(raw, '%Y-%m-%d %H:%M:%S'),
           try_strptime(raw, '%Y-%m-%d'))) AS BIGINT) AS time_stamp
         FROM r ORDER BY event_id""",

    "q_pct_change" ->
      """SELECT event_id, event_type, value,
           COALESCE(value / LAG(value) OVER
             (PARTITION BY event_type ORDER BY ts, event_id) - 1, 0.0) AS pct
         FROM events ORDER BY event_id""",

    "q_pct_change_multi" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(value), 6) AS avg_v,
           CAST(COUNT(*) AS DOUBLE) AS cnt
         FROM events GROUP BY 1)
         SELECT day, avg_v, cnt,
           COALESCE(avg_v / LAG(avg_v) OVER (ORDER BY day) - 1, 0.0) AS avg_v_delta,
           COALESCE(cnt / LAG(cnt) OVER (ORDER BY day) - 1, 0.0) AS cnt_delta
         FROM daily ORDER BY day""",

    "q_union_append" ->
      """SELECT event_id, event_type, value FROM events WHERE event_type = 'purchase'
         UNION ALL
         SELECT event_id, event_type, value FROM events WHERE event_type = 'signup'
         ORDER BY event_id""",

    "q_zip_by_key" ->
      """WITH p AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_purchase
             FROM events WHERE event_type = 'purchase' GROUP BY 1),
           sg AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_signup
             FROM events WHERE event_type = 'signup' GROUP BY 1)
         SELECT COALESCE(p.day, sg.day) AS day, n_purchase, n_signup
         FROM p FULL OUTER JOIN sg ON p.day = sg.day ORDER BY day""",

    "q_upsert" ->
      """SELECT event_id, user_id, value FROM events WHERE event_id % 10 < 5
         UNION ALL
         SELECT event_id, user_id, value * 2 AS value FROM events WHERE event_id % 10 >= 5
         ORDER BY event_id""",

    "q_dedup_key" ->
      """SELECT user_id, event_type, event_id, value FROM events
         QUALIFY row_number() OVER
           (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
         ORDER BY user_id, event_type""",

    // Every props doc is the single-key object {"k": N} (verified over the
    // full table), so the exploded (key, value) rows are projectable.
    "q_map_explode" ->
      """SELECT event_id, 'k' AS key,
           CAST(json_extract(props, '$.k') AS BIGINT) AS val,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_field
         FROM events ORDER BY event_id, key""",

    "q_col_ops" ->
      """SELECT event_id, user_id, event_type, value AS price
         FROM events ORDER BY event_id""",

    "q_col_split" ->
      """SELECT event_id, l[1] AS rate_v, l[2] AS rate_u
         FROM (SELECT event_id, [value, CAST(user_id AS DOUBLE)] AS l FROM events)
         ORDER BY event_id""",

    "q_pipeline_stock" ->
      """WITH feed AS (
           SELECT event_type AS stock_name, CAST(ts AS DATE) AS d,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(value), 6) AS open,
             COUNT(*) * 100 AS volume
           FROM events GROUP BY 1, 2)
         SELECT CAST(epoch(CAST(d AS TIMESTAMP)) AS BIGINT) AS time_stamp,
           stock_name,
           open AS price_open, open * 1.02 AS price_high,
           open * 0.98 AS price_low, open * 1.01 AS price_close,
           CAST(volume AS BIGINT) AS volume,
           COALESCE(open / LAG(open * 1.01) OVER w - 1, 0.0) AS pct_ret,
           COALESCE(CAST(volume AS DOUBLE) / LAG(volume) OVER w - 1, 0.0) AS pct_vol
         FROM feed WINDOW w AS (PARTITION BY stock_name ORDER BY d)
         ORDER BY stock_name, time_stamp""",

    "q_pipeline_forex" -> {
      def daily(t: String, out: String) =
        s"""SELECT strftime(ts, '%Y-%m-%d') AS date,
            ROUND(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(value), 6) AS $out
            FROM events WHERE event_type = '$t' GROUP BY 1"""
      val rateCols = Seq("usd_to_btc", "usd_to_eur", "usd_to_gbp", "usd_to_sek", "usd_to_dkk")
      val imputed = rateCols.map(c =>
        s"""COALESCE($c, (SELECT ROUND(
            CAST(SUM(CAST($c AS DECIMAL(25,6))) AS DOUBLE) / COUNT($c), 6) FROM z)) AS $c""")
        .mkString(", ")
      val deltas = rateCols.map(c =>
        s"COALESCE($c / LAG($c) OVER (ORDER BY date) - 1, 0.0) AS ${c}_delta").mkString(", ")
      s"""WITH eur AS (${daily("purchase", "usd_to_eur")}),
          gbp AS (${daily("view", "usd_to_gbp")}),
          sek AS (${daily("click", "usd_to_sek")}),
          dkk AS (${daily("error", "usd_to_dkk")}),
          btc AS (${daily("signup", "usd_to_btc")}),
          z AS (SELECT * FROM eur
            FULL JOIN gbp USING (date) FULL JOIN sek USING (date)
            FULL JOIN dkk USING (date) FULL JOIN btc USING (date)),
          imp AS (SELECT date, $imputed FROM z)
          SELECT CAST(date AS DATE) AS short_date, ${rateCols.mkString(", ")}, $deltas
          FROM imp ORDER BY short_date"""
    },

    "q_pipeline_news" ->
      """WITH feed AS (SELECT
           strftime(CAST(to_timestamp(1704067200 + doc_id * 420) AS TIMESTAMP),
             '%Y-%m-%dT%H:%M:%S') AS pub_date,
           CASE WHEN doc_id % 97 = 0 THEN '' ELSE text END AS snippet,
           upper(substr(text, 1, 30)) AS headline,
           str_split(text, ' ')[1:3] AS keywords,
           CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 'business'
                WHEN source IN ('src5','src6','src7') THEN 'politics'
                WHEN source IN ('src8','src9') THEN 'sports'
                ELSE 'technology' END AS news_desk
         FROM documents),
         kept AS (SELECT *,
             try_strptime(pub_date, '%Y-%m-%dT%H:%M:%S') AS parsed
           FROM feed
           WHERE news_desk IN ('business','national','politics','insider',
             'financial','foreign','technology','science')
             AND lower(snippet) <> '' AND lower(headline) <> '')
         SELECT CAST(epoch(parsed) AS BIGINT) AS time_stamp,
           CAST(strptime(strftime(parsed, '%d-%m-%Y'), '%d-%m-%Y') AS DATE) AS short_date,
           lower(snippet) AS snippet, lower(headline) AS headline,
           to_json(list_transform(keywords, k -> lower(k))) AS keywords
         FROM kept ORDER BY time_stamp, headline""",

    "q_table_checksum" ->
      """SELECT COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(('0x' || substr(md5(concat_ws(chr(1),
               COALESCE(CAST(l_orderkey AS VARCHAR), chr(2)),
               COALESCE(CAST(l_linenumber AS VARCHAR), chr(2)),
               COALESCE(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR), chr(2)),
               COALESCE(CAST(l_returnflag AS VARCHAR), chr(2)))), 1, 12))
             AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR) AS checksum
         FROM lineitem""",

    "q_sessionize" ->
      """WITH g AS (SELECT user_id, ts, value, event_id,
           CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS brk
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM g)
         SELECT user_id, session_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value,
           MIN(ts) AS session_start, MAX(ts) AS session_end
         FROM s GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_range_join" ->
      """SELECT e.event_id, COUNT(*) AS n_purchases
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
         JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
           ON e.user_id = p.user_id
          AND p.ts >= e.ts - INTERVAL 1 HOUR AND p.ts <= e.ts
         GROUP BY 1 ORDER BY 1""",

    "q_asof_join" ->
      """SELECT l.event_id, l.user_id, r.value AS sig_val
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') l
         ASOF LEFT JOIN
              (SELECT user_id, ts, value FROM events WHERE event_type = 'signup') r
           ON l.user_id = r.user_id AND l.ts >= r.ts
         ORDER BY event_id""",

    "q_asof_forward" ->
      """SELECT l.event_id, l.user_id, r.value AS next_click_val
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') l
         ASOF LEFT JOIN
              (SELECT user_id, ts, value FROM events WHERE event_type = 'click') r
           ON l.user_id = r.user_id AND l.ts <= r.ts
         ORDER BY event_id"""
  )
}
