package graft

import graft.ops._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Edge cases from SURVEY.md §5.2: all-null columns, single-row partitions,
  * duplicate keys, multi-format timestamps, empty arrays. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("tsUnixMulti parses all three reference formats to unix seconds") {
    val df = Seq(
      "2024-01-02T03:04:05",
      "2024-01-02 03:04:05",
      "2024-01-02").toDF("raw")
      .select(Dates.tsUnixMulti(col("raw")).as("ts"))
    assert(df.as[Long].collect().toSeq ==
      Seq(1704164645L, 1704164645L, 1704153600L))
  }

  test("tsUnixMulti yields null (not error) on garbage — permissive parse") {
    val out = Seq("not-a-date").toDF("raw")
      .select(Dates.tsUnixMulti(col("raw"))).collect()
    assert(out.head.isNullAt(0))
  }

  test("dateShort renders dd-MM-yyyy and parseDmy round-trips") {
    val df = Seq("2024-03-09").toDF("d")
      .select(Dates.dateShort(col("d")).as("s"),
        Dates.parseDmy(Dates.dateShort(col("d"))).as("back"))
    val row = df.collect().head
    assert(row.getString(0) == "09-03-2024")
    assert(row.getDate(1).toString == "2024-03-09")
  }

  test("imputeMean fills nulls with column mean; all-null column stays null") {
    val df = Seq(
      (Some(1.0), Option.empty[Double]),
      (Some(3.0), Option.empty[Double]),
      (None, Option.empty[Double])).toDF("a", "b")
    val out = Cleaning.imputeMean(df, Seq("a", "b")).orderBy("a")
      .collect()
    assert(out.map(_.getDouble(0)).toSeq == Seq(1.0, 2.0, 3.0))
    assert(out.forall(_.isNullAt(1)), "mean of all-null is undefined → null")
  }

  test("pctChange: single-row partition lags to 0.0; per-key isolation") {
    val df = Seq(
      ("A", 1L, 10.0), ("A", 2L, 15.0), ("B", 3L, 99.0)).toDF("k", "t", "v")
    val out = Analytics.pctChange(df, Seq("v"), Seq("k"), Seq("t"))
      .orderBy("t").select("v_delta").as[Double].collect().toSeq
    assert(out == Seq(0.0, 0.5, 0.0), "B must not lag into A's rows")
  }

  test("upsert keeps existing rows and is idempotent") {
    val existing = Seq((1L, "old"), (2L, "old")).toDF("k", "v")
    val incoming = Seq((2L, "new"), (2L, "newer"), (3L, "new")).toDF("k", "v")
    val once = Upsert.upsert(existing, incoming, Seq("k"), Seq("v"))
    val got = once.orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "old"), (2L, "old"), (3L, "new")),
      "existing wins; within-batch dup resolved deterministically")
    val twice = Upsert.upsert(once, incoming, Seq("k"), Seq("v"))
    assert(twice.orderBy("k").as[(Long, String)].collect().toSeq == got,
      "upsert(upsert(x)) == upsert(x)")
  }

  test("dedupOnKey picks deterministic winner under tie-break order") {
    val df = Seq((1L, "b", 2.0), (1L, "a", 1.0), (2L, "c", 3.0)).toDF("k", "tb", "v")
    val out = Upsert.dedupOnKey(df, Seq("k"), Seq("tb")).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a", 1.0), (2L, "c", 3.0)))
  }

  test("arrLower handles empty arrays and empty strings") {
    val out = Seq("", "A B").toDF("t")
      .select(Text.arrLower(split(col("t"), " ")).as("a"))
      .as[Seq[String]].collect().toSeq
    assert(out == Seq(Seq(""), Seq("a", "b")))
  }

  test("zipByKey is a full outer join on the key") {
    val l = Seq(("d1", 1.0), ("d2", 2.0)).toDF("date", "x")
    val r = Seq(("d2", 20.0), ("d3", 30.0)).toDF("date", "y")
    val out = Reshape.zipByKey(l, r, "date").orderBy("date")
    assert(out.count() == 3)
    val d1 = out.filter(col("date") === "d1").collect().head
    assert(d1.isNullAt(2), "missing right side → null")
  }

  test("colSplit splits array column into named columns") {
    val df = Seq(Seq(1.0, 2.0, 3.0)).toDF("arr")
    val out = Reshape.colSplit(df, "arr", Seq("a", "b", "c")).collect().head
    assert((out.getDouble(0), out.getDouble(1), out.getDouble(2)) == (1.0, 2.0, 3.0))
  }

  test("castCols casts all listed columns") {
    val df = Seq(("1", "2")).toDF("a", "b")
    val out = Cleaning.castCols(df, Seq("a", "b"), DoubleType)
    assert(out.schema.fields.forall(_.dataType == DoubleType))
  }

  test("rollingMean: partial leading frames and per-key isolation") {
    val df = Seq(("a", 1, 2.0), ("a", 2, 4.0), ("a", 3, 6.0), ("b", 1, 100.0))
      .toDF("k", "t", "v")
    val out = Analytics.rollingMean(df, "v", Seq("k"), Seq("t"), 2, "m")
      .select("k", "t", "m").as[(String, Int, Double)].collect()
      .map { case (k, t, m) => (k, t) -> m }.toMap
    assert(out(("a", 1)) == 2.0, "first row averages itself")
    assert(out(("a", 2)) == 3.0 && out(("a", 3)) == 5.0, "trailing 2-row mean")
    assert(out(("b", 1)) == 100.0, "frames never cross the key boundary")
  }

  test("rollingCorr: ±1 on exact co-movement, NULL on degenerate windows") {
    // Key a: y = 2x (corr +1 once n >= 2). Key b: y = -x (corr -1).
    // Key c: constant x (zero variance -> NULL, not NaN). Leading rows
    // (n < 2 after the null-pair exclusion) are NULL.
    val rows = Seq(
      ("a", 1, 1.0, 2.0), ("a", 2, 2.0, 4.0), ("a", 3, 4.0, 8.0),
      ("b", 1, 1.0, -1.0), ("b", 2, 3.0, -3.0),
      ("c", 1, 5.0, 1.0), ("c", 2, 5.0, 2.0), ("c", 3, 5.0, 3.0))
    val df = rows.toDF("k", "t", "x", "y")
    val out = Analytics.rollingCorr(df, "x", "y", Seq("k"), Seq("t"), 3, "c")
      .select("k", "t", "c").as[(String, Int, Option[Double])].collect()
      .map { case (k, t, c) => (k, t) -> c }.toMap
    assert(out(("a", 1)).isEmpty, "single-row window has no correlation")
    assert(out(("a", 2)).contains(1.0) && out(("a", 3)).contains(1.0))
    assert(out(("b", 2)).contains(-1.0))
    assert(out(("c", 3)).isEmpty, "zero variance must be NULL, never NaN")
    // Null pairs are excluded symmetrically: a null y row contributes to
    // no moment, so the window around it behaves as if the row is absent.
    val withNull = Seq(("a", 1, 1.0, Some(2.0)), ("a", 2, 9.0, Option.empty[Double]),
      ("a", 3, 2.0, Some(4.0)), ("a", 4, 3.0, Some(6.0)))
      .toDF("k", "t", "x", "y")
    val nOut = Analytics.rollingCorr(withNull, "x", "y", Seq("k"), Seq("t"), 4, "c")
      .select("t", "c").as[(Int, Option[Double])].collect().toMap
    assert(nOut(4).contains(1.0), "null pair dropped from moments, corr over the rest")
  }

  test("rollingStd: golden sample std, NULL below two observations") {
    // [2, 4, 6]: sample std of trailing-3 window = sqrt(((3*56)-144)/6)
    // = 2.0; the 2-row prefix [2, 4] gives sqrt(2)/... = sqrt(2)·? —
    // sample std of {2,4} = sqrt(2) ≈ 1.414214 (rounded to 6dp).
    val df = Seq(("a", 1, 2.0), ("a", 2, 4.0), ("a", 3, 6.0)).toDF("k", "t", "v")
    val out = Analytics.rollingStd(df, "v", Seq("k"), Seq("t"), 3, "s")
      .select("t", "s").as[(Int, Option[Double])].collect().toMap
    assert(out(1).isEmpty, "one observation has no sample std")
    assert(out(2).contains(1.414214))
    assert(out(3).contains(2.0))
  }

  test("drawdown: peak is running max, drawdown ≤ 0, keys isolated") {
    val df = Seq(("a", 1, 100.0), ("a", 2, 80.0), ("a", 3, 120.0),
      ("a", 4, 90.0), ("b", 5, 50.0)).toDF("k", "t", "v")
    val out = Analytics.drawdown(df, "v", Seq("k"), Seq("t"))
      .select("t", "peak", "drawdown")
      .as[(Int, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1) == (100.0, 0.0))
    assert(out(2) == (100.0, -0.2))
    assert(out(3) == (120.0, 0.0), "new high resets the peak")
    assert(out(4) == (120.0, -0.25))
    assert(out(5) == (50.0, 0.0), "b must not see a's peak")
  }

  test("cumReturn: ratio to the series' first value") {
    val df = Seq(("a", 1, 100.0), ("a", 2, 110.0), ("a", 3, 90.0))
      .toDF("k", "t", "v")
    val out = Analytics.cumReturn(df, "v", Seq("k"), Seq("t"))
      .select("t", "cum_return").as[(Int, Double)].collect().toMap
    assert(out == Map(1 -> 0.0, 2 -> 0.1, 3 -> -0.1))
  }

  test("ohlcBars: tie-broken endpoints, extrema, exact volume and vwap") {
    // Two rows share ts=1; the tie column decides open. close comes from
    // the latest (ts, tie). vwap = (10·1 + 20·2 + 5·3)/6 = 65/6.
    val df = Seq(
      ("s", 1L, 2L, 10.0, 1L), ("s", 1L, 1L, 20.0, 2L), ("s", 2L, 1L, 5.0, 3L))
      .toDF("sym", "t", "tie", "p", "q")
    val out = Analytics.ohlcBars(df, Seq(col("sym")), lit(0).as("bar"),
      col("t"), col("tie"), col("p"), col("q")).collect().head
    assert(out.getAs[Double]("open") == 20.0, "tie column must decide open")
    assert(out.getAs[Double]("high") == 20.0)
    assert(out.getAs[Double]("low") == 5.0)
    assert(out.getAs[Double]("close") == 5.0)
    assert(out.getAs[Long]("volume") == 6L)
    assert(out.getAs[Double]("vwap") == 10.833333)
  }

  test("bollinger: mid from n=1, bands null below two observations") {
    val df = Seq(("a", 1, 2.0), ("a", 2, 4.0), ("a", 3, 6.0)).toDF("k", "t", "v")
    val out = Analytics.bollinger(df, "v", Seq("k"), Seq("t"), 3, 2.0)
      .select("t", "bb_mid", "bb_upper", "bb_lower")
      .as[(Int, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1) == (Some(2.0), None, None), "one row: mid only")
    // {2,4}: mean 3, sample std √2 → 3 ± 2√2
    assert(out(2) == (Some(3.0), Some(5.828427), Some(0.171573)))
    // {2,4,6}: mean 4, sample std 2 → 8 / 0
    assert(out(3) == (Some(4.0), Some(8.0), Some(0.0)))
  }

  test("rsi: golden gains/losses, NULL before any movement, all-gain is 100") {
    // diffs: [null, +1, -1, +2]; k=3 window of diffs at t4 = {+1, -1, +2}
    // → G=3, L=1 → RSI = 100·3/4 = 75. At t2 only +1 → 100. t1: no diff.
    val df = Seq(("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 1.0), ("a", 4, 3.0))
      .toDF("k", "t", "v")
    val out = Analytics.rsi(df, "v", Seq("k"), Seq("t"), 3)
      .select("t", "rsi").as[(Int, Option[Double])].collect().toMap
    assert(out(1).isEmpty, "first row has no diff")
    assert(out(2).contains(100.0))
    assert(out(3).contains(50.0), "+1/-1 → G=L → 50")
    assert(out(4).contains(75.0))
  }

  test("rsi: flat series stays NULL (no movement, never 0/0)") {
    val df = Seq(("a", 1, 5.0), ("a", 2, 5.0), ("a", 3, 5.0)).toDF("k", "t", "v")
    val out = Analytics.rsi(df, "v", Seq("k"), Seq("t"), 3)
      .select("rsi").collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("diffPartitions reports added/removed/changed only; re-shard is unchanged") {
    def dec(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("v", col("v").cast(DecimalType(18, 2)))
    val a = dec(Seq(("p1", 1L, 1.0), ("p1", 2L, 2.0), ("p2", 3L, 3.0),
      ("p3", 4L, 4.0)).toDF("p", "k", "v"))
    // b: p1 edited, p2 dropped, p4 added, p3 identical (but resharded).
    val b = dec(Seq(("p1", 1L, 9.0), ("p1", 2L, 2.0), ("p4", 5L, 5.0),
      ("p3", 4L, 4.0)).toDF("p", "k", "v")).repartition(7)
    val got = Checksum.diffPartitions(a, b, Seq("p"), Seq("k", "v"))
      .select("p", "status").as[(String, String)].collect().toMap
    assert(got == Map("p1" -> "changed", "p2" -> "removed", "p4" -> "added"),
      "p3 is identical content on a different sharding → absent")
  }

  test("diffPartitions: NULL partition key matches itself (null-safe join)") {
    // Hive-style layouts admit a NULL partition value; a plain equi-join
    // would report an unchanged null-keyed partition as removed+added.
    def dec(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("v", col("v").cast(DecimalType(18, 2)))
    val a = dec(Seq((Option("p1"), 1L, 1.0), (Option.empty[String], 2L, 2.0))
      .toDF("p", "k", "v"))
    val same = dec(Seq((Option("p1"), 1L, 1.0), (Option.empty[String], 2L, 2.0))
      .toDF("p", "k", "v"))
    assert(Checksum.diffPartitions(a, same, Seq("p"), Seq("k", "v")).isEmpty,
      "unchanged null-keyed partition must be absent from the diff")
    val edit = dec(Seq((Option("p1"), 1L, 1.0), (Option.empty[String], 2L, 9.0))
      .toDF("p", "k", "v"))
    val got = Checksum.diffPartitions(a, edit, Seq("p"), Seq("k", "v"))
      .select("p", "status").as[(Option[String], String)].collect().toMap
    assert(got == Map(Option.empty[String] -> "changed"),
      "edited null-keyed partition reports exactly once, with a NULL key")
  }

  test("bench prev-round parser handles raw, wrapped-escaped, and flagged forms") {
    val raw = """{"metric":"total","queries":{"q_a":1.5,"q_b":0.25},"sf":"x"}"""
    assert(Bench.parsePerQuerySeconds(raw) == Map("q_a" -> 1.5, "q_b" -> 0.25))
    // Driver wrapper: escaped quotes inside a truncated "tail" field.
    val wrapped = """{"n":6,"rc":0,"tail":"up\":0.64,\"q_c\":0.171,\"q_d\":2.5,\"sf"}"""
    assert(Bench.parsePerQuerySeconds(wrapped) == Map("q_c" -> 0.171, "q_d" -> 2.5))
    // A flagged sub-object must not bind the query name to a sub-field.
    val flagged = """"queries":{"q_e":3.0},"flagged":{"q_e":{"p1":9.9,"p2":3.0}}"""
    assert(Bench.parsePerQuerySeconds(flagged) == Map("q_e" -> 3.0))
    // The real previous-round artifact yields a non-empty map.
    val r6 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BENCH_r06.json")))
    assert(Bench.parsePerQuerySeconds(r6).size > 50,
      "the driver wrapper's tail must be recoverable")
  }

  test("bench flagger: history baseline + absolute fallback close the r7 blind spot") {
    // History file: last line at the matching sf wins; other sfs ignored.
    val lines = Seq(
      """{"ts":"t0","sf":"/d/sf0.1","queries":{"q_a":1.0,"q_b":0.5}}""",
      """{"ts":"t1","sf":"/d/sf0.01","queries":{"q_a":9.0}}""",
      """{"ts":"t2","sf":"/d/sf0.1","queries":{"q_a":2.0,"q_b":0.4}}""")
    assert(Bench.latestHistory(lines, "/d/sf0.1") ==
      Map("q_a" -> 2.0, "q_b" -> 0.4))
    assert(Bench.latestHistory(lines, "/d/sf1") == Map.empty)
    // With a baseline: the 2.5x rule, exactly as before.
    assert(Bench.shouldFlag(5.1, Some(2.0), 100.0, 0.5))
    assert(!Bench.shouldFlag(4.9, Some(2.0), 100.0, 0.5))
    // The r7 incident shape: a 15 s in-suite reading of a query with NO
    // baseline (cut from the truncated BENCH tail) must now flag via the
    // absolute rule — > 5% of a ~100 s suite and > 3x its 0.5 s median.
    assert(Bench.shouldFlag(15.8, None, 100.0, 0.5))
    // A normal new query does not re-run; nor does a genuinely-heavy one
    // sitting under 5% of the suite (the bounded CC loops at ~4%).
    assert(!Bench.shouldFlag(0.8, None, 100.0, 0.5))
    assert(!Bench.shouldFlag(4.4, None, 100.0, 0.5))
    // A -1 baseline (failed previous run) falls to the absolute rule.
    assert(Bench.shouldFlag(15.8, Some(-1.0), 100.0, 0.5))
    // Failed current queries never re-run.
    assert(!Bench.shouldFlag(-1.0, None, 100.0, 0.5))
    // The seeded committed history covers the full r7 query surface —
    // including the queries the truncated BENCH tail dropped.
    val hist = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("bench_history.json")))
    assert(Bench.parsePerQuerySeconds(hist).size > 120,
      "bench_history.json must carry the complete per-query map")
  }

  test("bench load guard: probe predicate, probe history, sf normalization") {
    // Guard predicate: degraded iff > 2x the machine's quiet baseline.
    assert(Bench.probeDegraded(1.1, Seq(0.5, 0.6)))      // 2.2x the 0.5 best
    assert(!Bench.probeDegraded(0.9, Seq(0.5, 0.6)))     // 1.8x — fine
    assert(!Bench.probeDegraded(9.9, Seq.empty),         // bootstrap run
      "no probe history must accept the run (first guarded run seeds it)")
    assert(!Bench.probeDegraded(9.9, Seq(-1.0)),
      "non-positive history entries are ignored")
    // The quiet baseline leans LOW — one past loaded run in the
    // history must not raise the bar (r9's poisoning shape).
    assert(Bench.probeDegraded(1.1, Seq(3.0, 0.5)))
    // …but it is NOT the all-time min: one anomalously FAST line among
    // normal probes must not permanently tighten the threshold (the
    // lower-quartile rule shrugs it off at 4+ entries; under the old
    // min rule every entry here reads degraded vs 2x0.01 forever).
    assert(!Bench.probeDegraded(0.14, Seq(0.13, 0.01, 0.12, 0.14, 0.13)),
      "an outlier-fast history line must not flag honest runs")
    assert(Bench.probeBaseline(Seq(0.13, 0.01, 0.12, 0.14, 0.13)).get == 0.12,
      "baseline = lower quartile of the window, not the outlier min")
    // A genuine slowdown still flags against the healthy quartile.
    assert(Bench.probeDegraded(0.30, Seq(0.13, 0.01, 0.12, 0.14, 0.13)))
    // Recency window: ancient fast probes age out entirely.
    val ancientFast = Seq(0.05) ++ Seq.fill(Bench.ProbeWindow)(0.2)
    assert(!Bench.probeDegraded(0.35, ancientFast),
      "probes beyond the window must not set the bar")
    // ≤ 3 entries: quartile degenerates to the min (bootstrap shape).
    assert(Bench.probeBaseline(Seq(0.6, 0.5)).get == 0.5)
    // Probe history parses only lines at the matching sf.
    val lines = Seq(
      """{"ts":"t0","sf":"/d/sf0.1","probe":0.5,"queries":{"q_a":1.0}}""",
      """{"ts":"t1","sf":"/d/sf0.01","probe":9.0,"queries":{"q_a":1.0}}""",
      """{"ts":"t2","sf":"/d/sf0.1","probe":0.6,"queries":{"q_a":1.0}}""",
      """{"ts":"t3","sf":"/d/sf0.1","queries":{"q_a":1.0}}""")  // pre-guard line: no probe
    assert(Bench.probeHistory(lines, "/d/sf0.1") == Seq(0.5, 0.6))
    // sf matching is slash-normalized BOTH ways: a trailing-slash env
    // value still finds the slashless history, and vice versa (the raw
    // substring match used to silently lose the baseline).
    assert(Bench.probeHistory(lines, "/d/sf0.1/") == Seq(0.5, 0.6))
    assert(Bench.latestHistory(lines, "/d/sf0.1/") == Map("q_a" -> 1.0))
    val slashed = Seq("""{"ts":"t0","sf":"/d/sf0.1/","queries":{"q_b":2.0}}""")
    assert(Bench.latestHistory(slashed, "/d/sf0.1") == Map("q_b" -> 2.0))
  }

  test("salted rolling window: exact under planted skew, hot key actually splits") {
    // One hot key dominating the table — the shape where an unsalted
    // window serializes a single reducer at scale.
    val rows = (1 to 900).map(i => ("hot", i, BigDecimal((i % 7) + 1))) ++
      (1 to 60).map(i => ("cold", i, BigDecimal((i % 5) + 1)))
    val df = rows.toDF("k", "t", "v")
      .withColumn("v", col("v").cast(DecimalType(18, 2)))
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select("k", "t", "m").orderBy("k", "t").collect().toSeq
    val base = canon(Analytics.rollingMean(df, "v", Seq("k"), Seq("t"), 7, "m"))
    val salted = canon(Analytics.rollingMeanSalted(df, "v", Seq("k"), Seq("t"),
      7, "m", chunk = (col("t") / 100).cast("int")))
    assert(salted == base,
      "ghost rows must make every chunk-local frame complete")
    // The recipe only helps if the hot key really spreads: 900 rows at
    // chunk width 100 -> 9+ distinct (key, chunk) partitions.
    val hotChunks = df.filter(col("k") === "hot")
      .select(((col("t") / 100).cast("int")).as("c")).distinct().count()
    assert(hotChunks >= 9, s"expected the hot key split across chunks, got $hotChunks")
  }

  test("salted rolling window: exact for SPARSE chunks (ghosts cascade across boundaries)") {
    // k=7 with 1-row and 2-row chunks: a frame needs rows from up to six
    // PRECEDING chunks, so next-chunk-only ghosting (the r7 layout) would
    // silently truncate frames. Ghosts now cascade: each chunk receives
    // its min(k-1, #predecessors) global predecessor rows.
    val rows = (1 to 40).map(i => ("hot", i, BigDecimal((i % 9) + 1))) ++
      (1 to 11).map(i => ("cold", i, BigDecimal((i % 4) + 1)))
    val df = rows.toDF("k", "t", "v")
      .withColumn("v", col("v").cast(DecimalType(18, 2)))
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select("k", "t", "m").orderBy("k", "t").collect().toSeq
    val base = canon(Analytics.rollingMean(df, "v", Seq("k"), Seq("t"), 7, "m"))
    // chunk = t: every chunk holds exactly ONE row.
    assert(canon(Analytics.rollingMeanSalted(df, "v", Seq("k"), Seq("t"),
      7, "m", chunk = col("t"))) == base,
      "1-row chunks: every frame must assemble from six cascaded ghosts")
    // Mixed density: 2-row chunks (still < k-1) plus skipped bucket ids.
    assert(canon(Analytics.rollingMeanSalted(df, "v", Seq("k"), Seq("t"),
      7, "m", chunk = (col("t") / 2).cast("int") * 10)) == base,
      "sparse 2-row chunks with gaps in the bucket ids must stay exact")
  }

  test("salted rolling window: density guard rejects a degenerate chunk expression") {
    // chunk == orderCol makes one (key, chunk) metadata row PER DATA ROW
    // — the shape where the recipe's two broadcasts silently become
    // data-sized. With the ceiling lowered below the row count the guard
    // must fail fast and name the cause.
    val df = (1 to 50).map(i => ("k", i, BigDecimal(i % 5)))
      .toDF("k", "t", "v")
      .withColumn("v", col("v").cast(DecimalType(18, 2)))
    val e = intercept[IllegalArgumentException] {
      Analytics.rollingMeanSalted(df, "v", Seq("k"), Seq("t"), 7, "m",
        chunk = col("t"), maxMetaRows = 10)
    }
    assert(e.getMessage.contains("chunk"), s"guard message names the cause: $e")
    // The default ceiling accepts sane densities (the sparse test above
    // runs 1-row chunks on 51 rows — far under 4M metadata rows).
  }

  test("linearTrend: exact fit recovers slope/intercept, degenerate keys NULL") {
    val df = Seq(
      ("a", 1, Some(3.0)), ("a", 2, Some(5.0)), ("a", 3, Some(7.0)), // y = 2x+1
      ("b", 4, Some(4.0)), ("b", 5, Some(4.0)),                      // flat
      ("c", 6, Some(9.0)),                                           // n = 1
      ("d", 7, Option.empty[Double]), ("d", 8, Some(1.0)))           // null y dropped
      .toDF("k", "t", "v")
    val out = Analytics.linearTrend(df, "v", Seq("k"), Seq("t"))
      .select("k", "n", "slope", "intercept", "r2")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("a") == ((3L, Some(2.0), Some(1.0), Some(1.0))))
    assert(out("b") == ((2L, Some(0.0), Some(4.0), None)),
      "flat series: slope 0, r2 undefined (zero y variance)")
    assert(out("c") == ((1L, None, None, None)))
    assert(out("d") == ((1L, None, None, None)),
      "null y must not consume a rank or form a 2-point fit")
  }

  test("keySkewProfile: share and ratio-to-mean, deterministic top-k cut") {
    val rows = Seq.fill(6)("a") ++ Seq.fill(2)("c") ++ Seq.fill(2)("b")
    val out = Analytics.keySkewProfile(rows.toDF("k"), Seq("k"), 2)
      .select("k", "n", "share", "skew")
      .as[(String, Long, Double, Double)].collect()
    assert(out.length == 2)
    assert(out(0) == (("a", 6L, 0.6, 1.8)), "6 of 10 rows, 3 keys → skew 1.8")
    assert(out(1) == (("b", 2L, 0.2, 0.6)), "n-tie must break on the key")
  }

  test("asOfJoinBackward returns the matched row's NULL, not an older value") {
    // user 1: signup value 5.0 at t=10, then a NULL value at t=20.
    // A purchase at t=25 matches the t=20 row → must yield NULL (true
    // as-of semantics), NOT skip back to 5.0; a purchase at t=15 matches
    // the t=10 row → 5.0; a purchase at t=5 precedes everything → NULL.
    val purchases = Seq((100L, 1L, 5L), (101L, 1L, 15L), (102L, 1L, 25L))
      .toDF("event_id", "user_id", "ts")
    val signups = Seq((1L, 10L, Some(5.0)), (1L, 20L, Option.empty[Double]))
      .toDF("user_id", "ts", "value")
    val out = Analytics.asOfJoinBackward(purchases, signups, "user_id", "ts",
        Map("value" -> "sig_val"))
      .orderBy("event_id").select("sig_val").collect()
    assert(out(0).isNullAt(0), "no prior right row → null")
    assert(out(1).getDouble(0) == 5.0)
    assert(out(2).isNullAt(0), "matched row's value IS null → null")
  }

  test("intervalJoinBucketed: inclusive boundaries, bucket-edge matches kept") {
    import java.sql.Timestamp
    // Window = 1 hour. Left at 10:00:00 exactly (a bucket boundary);
    // right rows at exactly -1h (kept, inclusive), just inside, at 0,
    // just outside (dropped), and for another key (dropped).
    val l = Seq((1L, 7L, Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("event_id", "k", "l_ts")
    val r = Seq(
      (7L, Timestamp.valueOf("2024-01-01 09:00:00"), "edge_kept"),
      (7L, Timestamp.valueOf("2024-01-01 08:59:59"), "outside"),
      (7L, Timestamp.valueOf("2024-01-01 09:30:00"), "inside"),
      (7L, Timestamp.valueOf("2024-01-01 10:00:00"), "now_kept"),
      (8L, Timestamp.valueOf("2024-01-01 09:30:00"), "other_key"))
      .toDF("k", "r_ts", "tag")
    val got = Analytics.intervalJoinBucketed(l, r, "k", "l_ts", "r_ts", 3600L)
      .select("tag").as[String].collect().toSet
    assert(got == Set("edge_kept", "inside", "now_kept"))
  }

  test("tableChecksum is invariant to row order and partitioning, catches edits") {
    def dec(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("v", col("v").cast(DecimalType(18, 2)))
    val df = dec(Seq((1L, "a", Some(1.5)), (2L, "b", None), (3L, "c", Some(2.5)))
      .toDF("k", "s", "v"))
    val cols = Seq("k", "s", "v")
    def sums(d: org.apache.spark.sql.DataFrame) =
      Checksum.tableChecksum(d, cols).collect().head
    val base = sums(df)
    assert(sums(df.orderBy(col("k").desc)) == base, "row order must not matter")
    assert(sums(df.repartition(7)) == base, "partitioning must not matter")
    val edited = df.withColumn("v",
      when(col("k") === 3, lit(9.9).cast(DecimalType(18, 2))).otherwise(col("v")))
    assert(sums(edited) != base, "a single changed cell must change the sum")
    val nullVsEmpty = dec(Seq((1L, "", Some(1.5))).toDF("k", "s", "v"))
    val withNull = dec(Seq((1L, null.asInstanceOf[String], Some(1.5))).toDF("k", "s", "v"))
    assert(sums(nullVsEmpty) != sums(withNull), "NULL and '' must hash apart")
    // Raw FP columns are rejected: their renders differ across engines.
    intercept[IllegalArgumentException] {
      Checksum.tableChecksum(Seq((1L, 1.5)).toDF("k", "v"), Seq("k", "v"))
    }
  }

  test("percentileBins: quantile bins per group, ties share a bin, NULLs null") {
    // Group a: 1..8 → quartile bounds 2.75 / 4.5 / 6.25 → bins 0,0,1,1,2,2,3,3.
    val df = ((1 to 8).map(i => ("a", Some(i.toDouble))) :+ ("b", None))
      .toDF("g", "v").withColumn("id", monotonically_increasing_id())
    val out = graft.ops.Cleaning.percentileBins(df, "v", Seq("g"), Seq(0.25, 0.5, 0.75))
    assert(out.columns.toSeq == Seq("g", "v", "id", "bin"), "input columns + bin")
    val bins = out.filter(col("g") === "a").orderBy("v")
      .select("bin").as[Int].collect().toSeq
    assert(bins == Seq(0, 0, 1, 1, 2, 2, 3, 3), s"quartiles split 2-2-2-2, got $bins")
    assert(out.filter(col("v").isNull).select("bin").head().isNullAt(0),
      "NULL value takes a NULL bin, not bin 0")
    // Ties straddling a boundary land in ONE bin (equal-range-by-quantile,
    // not ntile's equal-count): constant group → every row in the top bin.
    val const = Seq.fill(6)(("c", 5.0)).toDF("g", "v")
    assert(graft.ops.Cleaning.percentileBins(const, "v", Seq("g"), Seq(0.5))
      .select("bin").as[Int].collect().forall(_ == 1))
    // The sketch variant bins identically away from boundary neighborhoods.
    val approx = graft.ops.Cleaning.percentileBins(df, "v", Seq("g"),
      Seq(0.25, 0.5, 0.75), accuracy = Some(10000))
    assert(approx.filter(col("g") === "a").count() == 8)
    intercept[IllegalArgumentException] {
      graft.ops.Cleaning.percentileBins(df, "v", Seq("g"), Seq(0.75, 0.25))
    }
  }

  test("winsorize clips per group, leaves interior values untouched") {
    // Group a: 1..100 → p05 ≈ 5.95, p95 ≈ 95.05 (R-7 interpolation).
    // Group b: constant 7 → bounds 7/7, everything stays 7.
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++
      Seq.fill(10)(("b", 7.0))).toDF("g", "v")
    val out = graft.ops.Cleaning.winsorize(df, "v", Seq("g"), 0.05, 0.95)
    val a = out.filter(col("g") === "a").select("v").as[Double].collect()
    assert(a.min == 5.95 && a.max == 95.05, s"bounds ${a.min}..${a.max}")
    assert(a.count(v => v == 50.0) == 1, "interior values untouched")
    assert(out.filter(col("g") === "b").select("v").as[Double].collect()
      .forall(_ == 7.0), "degenerate group is a no-op")
    intercept[IllegalArgumentException] {
      graft.ops.Cleaning.winsorize(df, "v", Seq("g"), 0.9, 0.1)
    }
    // Dirty-data contract: NULL group keys keep their rows (null-safe
    // join), NULL values stay NULL (no silent p05 imputation), and the
    // output schema keeps the input's column order.
    val dirty = Seq((1L, Some("a"), Some(10.0)), (2L, None, Some(5.0)),
      (3L, None, Some(50.0)), (4L, Some("a"), None))
      .toDF("id", "g", "v")
    val cleaned = graft.ops.Cleaning.winsorize(dirty, "v", Seq("g"), 0.05, 0.95)
    assert(cleaned.columns.toSeq == Seq("id", "g", "v"), "column order preserved")
    assert(cleaned.count() == 4, "NULL group keys must not drop rows")
    val byId = cleaned.select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(byId(4L).isEmpty, "NULL value stays NULL")
    // R-7 bounds of the NULL group [5, 50] at .05/.95 are 7.25/47.75 —
    // exact values pin that NULL-keyed rows clip against THEIR OWN
    // group's bounds, not some other group's.
    assert(byId(2L) == Some(7.25) && byId(3L) == Some(47.75),
      s"NULL group clips within itself, got ${byId(2L)}/${byId(3L)}")
    // Empty groupCols = global winsorization (broadcast 1-row bounds).
    val global = graft.ops.Cleaning.winsorize(df, "v", Seq.empty, 0.05, 0.95)
    assert(global.count() == df.count(), "global winsorize keeps every row")
    assert(global.agg(max(col("v"))).as[Double].head() < 100.0,
      "global upper bound must clip the max")
  }

  test("saltedJoin returns exactly the plain join's rows on a skewed key") {
    // 95 of 100 fact rows share one hot key; dim has multi-row matches
    // (key 1 twice) and a dangling key (3) to exercise multiplicity.
    val fact = (0 until 100)
      .map(i => (i.toLong, if (i < 95) 1L else 2L, i * 1.5))
      .toDF("id", "k", "v")
    val dim = Seq((1L, "hot_a"), (1L, "hot_b"), (2L, "cold"), (3L, "none"))
      .toDF("k", "tag")
    val salted = Analytics.saltedJoin(fact, dim, "k", col("id"), 4)
      .select("id", "tag").as[(Long, String)].collect().sorted.toSeq
    val plain = fact.join(dim, Seq("k"))
      .select("id", "tag").as[(Long, String)].collect().sorted.toSeq
    assert(salted == plain, "salting must not change join multiplicity")
    // A NULL salt source must not drop the row (it folds to salt 0).
    val nullSalt = Seq((Some(7L), 2L, 1.0), (None, 2L, 2.0))
      .toDF("id", "k", "v")
    assert(Analytics.saltedJoin(nullSalt, dim, "k", col("id"), 4).count() == 2,
      "NULL salt source must still join")
  }

  test("saltedSumCount equals the plain groupBy on a skewed key") {
    // 90 rows on one hot key, 10 on another; salt from the unique row id.
    val df = (0 until 100)
      .map(i => (i.toLong, if (i < 90) "hot" else "cold", 1.5))
      .toDF("id", "k", "v")
    val salted = Analytics.saltedSumCount(df, Seq("k"),
        col("v").cast(DecimalType(18, 2)), col("id"), 4)
      .select(col("k"), col("sum_v").cast(DoubleType), col("n"))
      .as[(String, Double, Long)].collect()
      .map { case (k, s, n) => k -> ((s, n)) }.toMap
    assert(salted("hot") == ((135.0, 90L)))
    assert(salted("cold") == ((15.0, 10L)))
  }

  test("antiJoinViaBloom / semiJoinViaBloom match the exact joins and probe map-side") {
    // 20 batch keys, 7 of which are planted in the 200-key corpus; the
    // bloom path must agree with the exact anti/semi joins row for row.
    val small = (0 until 20).map(i => (i.toLong, s"key_$i")).toDF("id", "k")
    val big = ((0 until 7).map(i => s"key_${i * 3}") ++
      (0 until 200).map(i => s"other_$i")).toDF("k")
    val anti = BloomJoin.antiJoinViaBloom(small, big, "k", expectedItems = 100L)
    val semi = BloomJoin.semiJoinViaBloom(small, big, "k", expectedItems = 100L)
    val exactAnti = small.join(big, Seq("k"), "left_anti")
      .select("id").as[Long].collect().toSet
    val exactSemi = small.join(big, Seq("k"), "left_semi")
      .select("id").as[Long].collect().toSet
    assert(anti.select("id").as[Long].collect().toSet == exactAnti)
    assert(semi.select("id").as[Long].collect().toSet == exactSemi)
    assert(exactSemi == Set(0L, 3L, 6L, 9L, 12L, 15L, 18L), "planted dups found")
    // The reduction is really in the plan: a might_contain predicate
    // filters the big side before any join. Seq-backed frames won't do
    // for this check — ConvertToLocalRelation evaluates filters over
    // LocalRelation at optimization time — so pin it on range-backed
    // frames, where the probe must survive into the physical plan.
    val smallR = spark.range(20).select(col("id"), concat(lit("key_"), col("id")).as("k"))
    val bigR = spark.range(200).select(concat(lit("other_"), col("id")).as("k"))
    val antiR = BloomJoin.antiJoinViaBloom(smallR, bigR, "k", expectedItems = 100L)
    assert(antiR.queryExecution.executedPlan.toString.contains("might_contain"),
      "bloom probe must appear in the physical plan")
    assert(antiR.count() == 20, "disjoint corpus: whole batch survives")
  }

  test("bloom joins: empty sides degrade correctly, not to null-semantics surprises") {
    val small = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
    val emptyBig = spark.emptyDataset[String].toDF("k")
    // Empty corpus: nothing can match, the whole batch survives the anti.
    assert(BloomJoin.antiJoinViaBloom(small, emptyBig, "k", 10L).count() == 2)
    assert(BloomJoin.semiJoinViaBloom(small, emptyBig, "k", 10L).count() == 0)
    // Empty batch: the zero-row bloom aggregate yields the EMPTY filter
    // (keyBloom substitutes it for Spark's null), so the corpus probe is
    // uniformly false rather than null, and results stay empty.
    val emptySmall = spark.emptyDataset[(Long, String)].toDF("id", "k")
    val big = Seq("a", "z").toDF("k")
    assert(BloomJoin.antiJoinViaBloom(emptySmall, big, "k", 10L).count() == 0)
    assert(BloomJoin.semiJoinViaBloom(emptySmall, big, "k", 10L).count() == 0)
    val bloom = BloomJoin.keyBloom(emptySmall, col("k"), 10L)
    val probed = big.filter(BloomJoin.mightContain(bloom, col("k"))).count()
    assert(probed == 0, "empty bloom rules out everything")
  }

  test("bloom joins: null keys genuinely skipped on both build and probe sides") {
    // xxhash64(NULL) evaluates to the hash SEED, not NULL — a bare hash
    // would insert one phantom key per null build row and probe null big
    // rows as a real value. keyBloom/mightContain wrap the hash in
    // when(isNotNull, ...), so:
    //  - a bloom built over ONLY null keys is the empty filter;
    //  - null big-side keys are dropped AT THE PROBE (null predicate),
    //    matching equi-join semantics map-side instead of in the tail.
    val allNull = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "k")
    val big = Seq(Some("a"), Some("z"), Option.empty[String]).toDF("k")
    val bloomNulls = BloomJoin.keyBloom(allNull, col("k"), 10L)
    assert(big.filter(BloomJoin.mightContain(bloomNulls, col("k"))).count() == 0,
      "only-null build input must yield the EMPTY filter")
    // Mixed nulls both sides: results identical to the exact joins, and
    // the probe itself already rules out the null corpus row.
    val small = Seq((1L, Some("a")), (2L, Option.empty[String]), (3L, Some("q")))
      .toDF("id", "k")
    val bloom = BloomJoin.keyBloom(small, col("k"), 10L)
    assert(big.filter(BloomJoin.mightContain(bloom, col("k")))
      .filter(col("k").isNull).count() == 0,
      "null corpus keys must not survive the probe")
    val gotAnti = BloomJoin.antiJoinViaBloom(small, big, "k", 10L)
      .select("id").as[Long].collect().toSet
    val exactAnti = small.join(big, Seq("k"), "left_anti")
      .select("id").as[Long].collect().toSet
    assert(gotAnti == exactAnti && gotAnti == Set(2L, 3L),
      "null-keyed batch rows match nothing -> kept by anti")
  }

  test("kmvSketch is the brute-force k smallest distinct fingerprints, any partitioning") {
    // 500 values with heavy duplication, shuffled across 7 partitions:
    // the capped per-partition buffers + tiny merge must equal the
    // global answer computed the naive way.
    val vals = (0 until 500).map(i => (i % 125).toLong)
    val df = spark.createDataFrame(vals.map(Tuple1(_))).toDF("v").repartition(7)
    val got = Cardinality.kmvSketch(df, col("v"), 16)
      .as[String].collect().toSeq
    val brute = vals.distinct
      .map(v => java.security.MessageDigest.getInstance("MD5")
        .digest(v.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
      .sorted.take(16)
    assert(got == brute)
  }

  test("kmvEstimate: exact below k, (k-1)/R_k at or above k, within the error bound") {
    // Fewer distincts than k -> the sketch IS the value set, estimate exact.
    val small = spark.createDataFrame((0 until 40).map(i => Tuple1((i % 7).toLong))).toDF("v")
    val exact = Cardinality.kmvEstimate(small, col("v"), 16).head
    assert(exact.getAs[Long]("n_sketch") == 7L)
    assert(exact.getAs[Double]("n_est") == 7.0)
    // 1000 distincts, k=64: the estimator must land within 4x the
    // 1/sqrt(k-2) standard error (a deterministic fact of these hashes,
    // not a flaky statistical assertion).
    val big = spark.createDataFrame((0 until 3000).map(i => Tuple1((i % 1000).toLong))).toDF("v")
    val est = Cardinality.kmvEstimate(big, col("v"), 64).head.getAs[Double]("n_est")
    val relErr = math.abs(est - 1000.0) / 1000.0
    assert(relErr < 4.0 / math.sqrt(62.0), s"estimate $est too far from 1000")
  }

  test("momentStats: symmetric data has ~0 skew, uniform-ish kurtosis negative, constants abstain") {
    // symmetric around 2: {1,2,3} -> mean 2, var 2/3, skew 0
    val sym = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 5.0), ("b", 5.0)).toDF("k", "v")
    val out = Analytics.momentStats(sym, "v", Seq("k"))
      .orderBy("k").collect()
    assert(out(0).getLong(1) == 3 && out(0).getDouble(2) == 2.0)
    assert(out(0).getDouble(3) == math.rint(2.0 / 3.0 * 1e6) / 1e6)
    assert(out(0).getDouble(4) == 0.0, "symmetric -> zero skew")
    // 3-point uniform's excess kurtosis = -1.5 exactly
    assert(out(0).getDouble(5) == -1.5, s"got ${out(0).getDouble(5)}")
    assert(out(1).getDouble(3) == 0.0 && out(1).isNullAt(4) && out(1).isNullAt(5),
      "zero-variance group abstains from shape stats")
    // partitioning invariance (decimal power sums)
    val re = Analytics.momentStats(sym.repartition(7), "v", Seq("k"))
      .orderBy("k").collect()
    assert(re.map(_.toString).toSeq == out.map(_.toString).toSeq)
  }

  test("asOfJoinBackward tolerance: boundary inclusive, stale match nulls, no-match unchanged") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 7L, ts("2024-01-02 00:00:00")),  // match exactly 1 day old
      (2L, 7L, ts("2024-01-05 00:00:01")),  // match 1 day + 1 s old -> null
      (3L, 8L, ts("2024-01-01 00:00:00"))   // no right row at all
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts("2024-01-01 00:00:00"), 10.0),
      (7L, ts("2024-01-04 00:00:00"), 20.0)
    ).toDF("user_id", "ts", "value")
    val out = Analytics.asOfJoinBackward(left, right, "user_id", "ts",
        Map("value" -> "v"), toleranceSec = Some(86400L))
      .orderBy("event_id").collect()
    assert(out(0).getDouble(3) == 10.0, "exactly-at-tolerance match keeps")
    assert(out(1).isNullAt(3), "one second past tolerance nulls")
    assert(out(2).isNullAt(3), "no-match row stays null")
    // tolerance None must be byte-identical to the untoleranced op
    val a = Analytics.asOfJoinBackward(left, right, "user_id", "ts",
      Map("value" -> "v")).orderBy("event_id").collect().toSeq
    val b = Analytics.asOfJoinBackward(left, right, "user_id", "ts",
      Map("value" -> "v"), None).orderBy("event_id").collect().toSeq
    assert(a == b)
  }

  test("asOfJoinForward tolerance: boundary keeps, far-future label nulls, None identical") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 7L, ts("2024-01-01 00:00:00")),  // next right exactly 1 day later
      (2L, 7L, ts("2024-01-03 00:00:01"))   // next right 1 day + lots later -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts("2024-01-02 00:00:00"), 10.0),
      (7L, ts("2024-01-06 00:00:00"), 20.0)
    ).toDF("user_id", "ts", "value")
    val out = Analytics.asOfJoinForward(left, right, "user_id", "ts",
        Map("value" -> "v"), toleranceSec = Some(86400L))
      .orderBy("event_id").collect()
    assert(out(0).getDouble(3) == 10.0, "exactly-at-tolerance future label keeps")
    assert(out(1).isNullAt(3), "label beyond the tolerance nulls")
    val a = Analytics.asOfJoinForward(left, right, "user_id", "ts",
      Map("value" -> "v")).orderBy("event_id").collect().toSeq
    val b = Analytics.asOfJoinForward(left, right, "user_id", "ts",
      Map("value" -> "v"), None).orderBy("event_id").collect().toSeq
    assert(a == b)
  }

  test("rollingZScore: hand-checked z, flat window abstains, flag uses rounded z") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // key a: 1, 1, 1, 10 — first row has n=1 (NULL), rows 2-3 flat
    // window (std 0 -> NULL), row 4 z = (10 - 4)/sqrt(...) over {1,1,1,10}
    val df = Seq(
      ("a", ts(1), 1.0), ("a", ts(2), 1.0), ("a", ts(3), 1.0), ("a", ts(4), 10.0)
    ).zipWithIndex.map { case ((k, t, v), i) => (i.toLong, k, t, v) }
      .toDF("event_id", "event_type", "ts", "value")
    val out = Analytics.rollingZScore(df, "value", Seq("event_type"),
        Seq("ts", "event_id"), k = 10, out = "z")
      .orderBy("event_id").collect()
    assert(out(0).isNullAt(4), "n=1 abstains")
    assert(out(1).isNullAt(4) && out(2).isNullAt(4), "flat window abstains")
    // exact arithmetic over {1,1,1,10}: n=4, sx=13, sxx=103,
    // var = (4*103 - 169)/(4*3) = 20.25, std = 4.5, z = (10 - 3.25)/4.5
    val want = math.rint((10.0 - 13.0 / 4.0) / 4.5 * 1e6) / 1e6
    assert(out(3).getDouble(4) == want, s"got ${out(3).getDouble(4)}")
    assert(!out(3).getBoolean(5), "1.5 sigma is not an anomaly")
  }

  test("funnel: steps must be ordered, drop-offs are NULL, pre-step events ignored") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val events = Seq(
      // user 1 completes in order
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // user 2 clicked BEFORE viewing — that click must not count; the
      // later one does; never purchased
      (2L, "click", ts(1)), (2L, "view", ts(2)), (2L, "click", ts(5)),
      // user 3 never viewed — absent from the funnel entirely
      (3L, "click", ts(1)), (3L, "purchase", ts(2))
    ).toDF("user_id", "event_type", "ts")
    val out = Analytics.funnel(events, col("user_id"), col("ts"),
        Seq("v" -> (col("event_type") === "view"),
          "c" -> (col("event_type") === "click"),
          "p" -> (col("event_type") === "purchase")))
      .orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getTimestamp(1) == ts(1) && out(0).getTimestamp(2) == ts(2)
      && out(0).getTimestamp(3) == ts(3))
    assert(out(1).getTimestamp(2) == ts(5), "pre-view click ignored")
    assert(out(1).isNullAt(3), "no purchase -> NULL")
  }

  test("funnel maxGap: in-window boundary keeps, beyond-gap later event still counts") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // user 1: click exactly at the 1h boundary — keeps
      (1L, "view", ts("2024-01-01 09:00:00")), (1L, "click", ts("2024-01-01 10:00:00")),
      // user 2: first click beyond the gap, but a LATER in-window?? no —
      // all clicks beyond the gap → NULL despite clicks existing
      (2L, "view", ts("2024-01-01 09:00:00")), (2L, "click", ts("2024-01-01 11:00:01"))
    ).toDF("user_id", "event_type", "ts")
    val out = Analytics.funnel(events, col("user_id"), col("ts"),
        Seq("v" -> (col("event_type") === "view"),
          "c" -> (col("event_type") === "click")),
        maxGapSec = Some(3600L))
      .orderBy("k").collect()
    assert(out(0).getTimestamp(2) == ts("2024-01-01 10:00:00"),
      "boundary-inclusive gap")
    assert(out(1).isNullAt(2), "all steps beyond the gap -> NULL")
    // None must match the unwindowed funnel exactly
    val a = Analytics.funnel(events, col("user_id"), col("ts"),
      Seq("v" -> (col("event_type") === "view"),
        "c" -> (col("event_type") === "click"))).orderBy("k").collect().toSeq
    val b = Analytics.funnel(events, col("user_id"), col("ts"),
      Seq("v" -> (col("event_type") === "view"),
        "c" -> (col("event_type") === "click")), None).orderBy("k").collect().toSeq
    assert(a == b)
  }

  test("cohortRetention: first day defines the cohort, one count per user per offset") {
    import java.sql.Timestamp
    def ts(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val events = Seq(
      (1L, ts(1, 9)), (1L, ts(1, 21)), (1L, ts(3, 1)),   // day0 twice, day2
      (2L, ts(1, 5)), (2L, ts(2, 5)),                    // day0, day1
      (3L, ts(2, 7))                                     // later cohort
    ).toDF("user_id", "ts")
    val out = Analytics.cohortRetention(events, col("user_id"), col("ts"))
      .orderBy("cohort_day", "day_offset")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0, 2L),   // users 1+2, day-0 double visit counted once
      ("2024-01-01", 1, 1L),   // user 2 returned next day
      ("2024-01-01", 2, 1L),   // user 1 returned two days later
      ("2024-01-02", 0, 1L)))  // user 3's own cohort
  }

  test("attributeConversions: lookback bounds inclusive, label tie-break, unattributed NULL") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // user 1: touch outside lookback, two touches inside (the second
      // pair at the SAME ts exercises the label tie-break), conversion
      (10L, 1L, "click", ts("2024-01-01 00:00:00"), 0.0),  // outside (3d+1s before)
      (11L, 1L, "view", ts("2024-01-02 00:00:01"), 0.0),   // first in window
      (12L, 1L, "click", ts("2024-01-03 00:00:00"), 0.0),  // same-ts pair...
      (13L, 1L, "signup", ts("2024-01-03 00:00:00"), 0.0), // ...signup > click
      (14L, 1L, "purchase", ts("2024-01-04 00:00:01"), 9.5),
      // user 2: only touch is AT the conversion ts — counts (inclusive)
      (20L, 2L, "view", ts("2024-01-05 12:00:00"), 0.0),
      (21L, 2L, "purchase", ts("2024-01-05 12:00:00"), 3.0),
      // user 3: no touch at all
      (30L, 3L, "purchase", ts("2024-01-06 00:00:00"), 1.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Analytics.attributeConversions(events, col("user_id"),
        col("ts"), col("event_id"), col("value"),
        col("event_type") === "purchase",
        col("event_type").isin("click", "view", "signup"),
        col("event_type"), lookbackSeconds = 3L * 24 * 3600)
      .orderBy("conv_id")
      .select("conv_id", "first_touch", "last_touch")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getString(2)))).toSeq
    assert(got == Seq(
      // first = the 01-02 view (01-01 click is 3d1s back, outside);
      // last = max(struct(ts,label)) at the tied 01-03 ts -> signup
      (14L, Some("view"), Some("signup")),
      (21L, Some("view"), Some("view")),
      (30L, None, None)), got.toString)
  }

  test("attributionReport: linear / position / decay credits match hand computation") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // user 1: click d1, view d2, click d3 → purchase d3 (value 8);
      // all three inside the 2-day lookback (bounds inclusive).
      (10L, 1L, "click", ts("2024-01-01 00:00:00"), 0.0),
      (11L, 1L, "view", ts("2024-01-02 00:00:00"), 0.0),
      (12L, 1L, "click", ts("2024-01-03 00:00:00"), 0.0),
      (13L, 1L, "purchase", ts("2024-01-03 00:00:00"), 8.0),
      // user 2: unattributed purchase (value 2)
      (20L, 2L, "purchase", ts("2024-01-05 00:00:00"), 2.0),
      // user 3: single view 23:00 → purchase 01:00 next day (value 1):
      // only 2h apart but ONE day-bucket boundary between them (decay
      // dist = 1 — bucket semantics, not elapsed time; still 100% of
      // the credit since it's the only touch).
      (30L, 3L, "view", ts("2024-01-04 23:00:00"), 0.0),
      (31L, 3L, "purchase", ts("2024-01-05 01:00:00"), 1.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    def run(model: String) =
      Analytics.attributionReport(events, col("user_id"), col("ts"),
          col("value"), col("event_type") === "purchase",
          col("event_type").isin("click", "view"), col("event_type"),
          lookbackSeconds = 2L * 24 * 3600, model = model,
          halflifeSeconds = 24L * 3600)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSeq
    // linear: u1 splits 8 as click 2/3, view 1/3; u3 view 1.0
    assert(run("linear") == Seq(
      ("(none)", 1L, 2.0),
      ("click", 1L, 5.333333),
      ("view", 2L, 3.666667)), run("linear").toString)
    // position (N=3): first=click(d1) 40%, last=click(d3) 40%, middle
    // view 20% → click 6.4, view 1.6; u3 single touch → view 1.0
    assert(run("position") == Seq(
      ("(none)", 1L, 2.0),
      ("click", 1L, 6.4),
      ("view", 2L, 2.6)), run("position").toString)
    // decay (1d half-life buckets): weights click d1→0.25, view d2→0.5,
    // click d3→1.0; W=1.75 → click 8·1.25/1.75, view 8·0.5/1.75
    assert(run("decay") == Seq(
      ("(none)", 1L, 2.0),
      ("click", 1L, 5.714286),
      ("view", 2L, 3.285714)), run("decay").toString)
    // ordered Shapley (airport-game closed form): w(k,3) = (H(3)−H(3−k))/3
    // → 1/9, 5/18, 11/18 for positions 1..3. u1: click gets 8·(1/9 +
    // 11/18) = 8·13/18 = 5.777778, view 8·5/18 = 2.222222; u3 single
    // touch w(1,1) = 1 → view +1.0.
    val shap = Analytics.attributionShapley(events, col("user_id"),
        col("ts"), col("value"), col("event_type") === "purchase",
        col("event_type").isin("click", "view"), col("event_type"),
        lookbackSeconds = 2L * 24 * 3600)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(shap == Seq(
      ("(none)", 1L, 2.0),
      ("click", 1L, 5.777778),
      ("view", 2L, 3.222222)), shap.toString)
    // Fixed-point weights partition 1e18 up to per-term HALF_UP
    // rounding (≤ n ULPs of 1e-18 — credit conservation at double
    // precision is untouched), and are strictly increasing in k
    // (recency-monotone) with every position earning something.
    for (n <- 1 to 32) {
      val ws = (1 to n).map(k => Analytics.shapleyWeightScaled(k, n))
      assert(math.abs(ws.sum - 1000000000000000000L) <= n,
        s"weights of n=$n must partition 1e18 ± rounding: ${ws.sum}")
      assert(ws.head > 0 && ws == ws.sorted && ws.distinct == ws,
        s"weights of n=$n must be positive and strictly increasing: $ws")
    }
  }

  test("markovTransitions + attributionMarkov: journey split, terminals, exact removal effects") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // u1, journey 1: a → conv; journey 2 (post-conversion): b → (null)
      (1L, 1L, "a", ts("2024-01-01 00:00:00"), 0.0),
      (2L, 1L, "purchase", ts("2024-01-01 01:00:00"), 1.0),
      (7L, 1L, "b", ts("2024-01-01 02:00:00"), 0.0),
      // u2: a → b → conv
      (3L, 2L, "a", ts("2024-01-01 00:00:00"), 0.0),
      (4L, 2L, "b", ts("2024-01-01 01:00:00"), 0.0),
      (5L, 2L, "purchase", ts("2024-01-01 02:00:00"), 2.0),
      // u3: b, never converts
      (6L, 3L, "b", ts("2024-01-01 00:00:00"), 0.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    def args = (col("user_id"), col("ts"), col("event_id"),
      col("event_type") === "purchase", col("event_type").isin("a", "b"),
      col("event_type"))
    val trans = Analytics.markovTransitions(events, args._1, args._2,
        args._3, args._4, args._5, args._6)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    assert(trans == Map(
      ("(start)", "a") -> 2L, ("(start)", "b") -> 2L,
      ("a", "b") -> 1L, ("a", "(conv)") -> 1L,
      ("b", "(conv)") -> 1L, ("b", "(null)") -> 2L), trans.toString)
    // Hand solve: P(b)=1/3, P(a)=1/2+P(b)/2=2/3, P=P(a)/2+P(b)/2=1/2.
    // Remove a → P=1/6, r_a=2/3. Remove b → P=1/4, r_b=1/2.
    // Shares: (2/3)/(7/6)=4/7, (1/2)/(7/6)=3/7.
    val got = Analytics.attributionMarkov(events, args._1, args._2,
        args._3, args._4, args._5, args._6)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toSeq
    assert(got == Seq(
      ("a", 0.666667, 0.571429),
      ("b", 0.5, 0.428571)), got.toString)
  }

  test("expectationReport: NULL pred is a violation; uniqueness skips NULL keys; one scan") {
    import graft.ops.Validate
    val df = Seq(
      (Some(1L), Some("a"), Some(5.0)),
      (Some(1L), Some("a"), Some(500.0)),   // dup key; out of range
      (Some(2L), None, None),               // NULL name + NULL score
      (None, Some("c"), Some(7.0))          // NULL key: excluded from unique
    ).toDF("id", "name", "score")
    val got = Validate.expectationReport(df,
        Seq(Validate.notNull("name"), Validate.inRange("score", 0, 100)),
        uniqueKeys = Seq(Seq("id", "name")))
      .orderBy("rule")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(got == Seq(
      // score NULL row -> violation (NULL pred = did not pass)
      ("in_range(score)", 4L, 2L, false),
      ("not_null(name)", 4L, 1L, false),
      // rows with a NULL key column drop from BOTH sides: checked = 2
      // (the two (1,a) rows), violations = 1 duplicate
      ("unique(id,name)", 2L, 1L, false)), got.toString)
    // The whole contract is one aggregate over one scan.
    val plan = Validate.expectationReport(df,
        Seq(Validate.notNull("name")), Seq(Seq("id")))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan|Scan".r.findAllIn(plan).size <= 2, plan)
  }

  test("expectationReport: dotted rule names, duplicate rules, empty table") {
    import graft.ops.Validate
    // Positional aliases must survive rule names containing dots
    // (nested columns) and two rules sharing a name (warn + fail tiers).
    val nested = Seq((1L, 5.0)).toDF("id", "score")
      .select(struct(col("id"), col("score")).as("user"))
    val gotNested = Validate.expectationReport(nested,
        Seq(Validate.Expect("not_null(user.id)", col("user.id").isNotNull)))
      .collect()(0)
    assert(gotNested.getString(0) == "not_null(user.id)" &&
      gotNested.getBoolean(3))
    val dup = Validate.expectationReport(Seq(50.0, 150.0).toDF("score"),
        Seq(Validate.inRange("score", 0, 100), Validate.inRange("score", 0, 200)))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    assert(dup == Seq(("in_range(score)", 1L), ("in_range(score)", 0L)),
      dup.toString)
    // Empty table: 0 violations and pass = TRUE, never NULL (a
    // .filter(col("pass")) gate must keep the row).
    val empty = Validate.expectationReport(
        Seq.empty[(Long, String)].toDF("id", "name"),
        Seq(Validate.notNull("name")), Seq(Seq("id")))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(empty == Seq((0L, 0L, true), (0L, 0L, true)), empty.toString)
  }

  test("refIntegrityReport: orphan rows counted per row; NULL fks out of scope") {
    import graft.ops.Validate
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Validate.refIntegrityReport(child, "fk", parent, "pk").collect()(0)
    assert(r.getString(0) == "ref(fk -> pk)")
    assert(r.getLong(1) == 3L, "NULL fk not checked")
    assert(r.getLong(2) == 1L, "one orphan row (9)")
    assert(!r.getBoolean(3))
  }

  test("profile: rows/nulls/exact distinct per column; numeric-only min/max") {
    import graft.ops.Validate
    val df = Seq((1L, Some("x"), Some(2.5)), (2L, Some("x"), None),
      (3L, None, Some(-1.0))).toDF("id", "tag", "v")
    val got = Validate.profile(df).orderBy("column").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)))).toSeq
    assert(got == Seq(
      ("id", 3L, 0L, 3L, Some(1.0), Some(3.0)),
      ("tag", 3L, 1L, 1L, None, None),
      ("v", 3L, 1L, 2L, Some(-1.0), Some(2.5))), got.toString)
  }

  test("profile: dotted / backticked column names resolve (positional aliases)") {
    import graft.ops.Validate
    // A name with a dot would parse as a struct path (and one with a
    // backtick would break the quoting) if aggregates were aliased or
    // resolved by raw name — the expectationReport pitfall.
    val df = Seq((1L, 2.0), (2L, 4.0)).toDF("a.b", "w`x")
    val got = Validate.profile(df).orderBy("column").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)))).toSeq
    assert(got == Seq(
      ("a.b", 2L, 0L, 2L, Some(1.0), Some(2.0)),
      ("w`x", 2L, 0L, 2L, Some(2.0), Some(4.0))), got.toString)
  }

  test("profileDrift: growth/null-rate/distinct deltas; added and dropped columns classified") {
    val prev = Validate.profile(
      Seq((1L, Some("x"), 1.0), (2L, Some("y"), 2.0), (3L, None, 3.0))
        .toDF("id", "s", "gone"))
    val cur = Validate.profile(
      Seq((1L, Some("x"), 10), (2L, None, 20), (3L, None, 30),
        (4L, None, 40)).toDF("id", "s", "fresh"))
    val got = Validate.profileDrift(cur, prev).collect().map(r =>
      (r.getString(0), r.getString(1), Option(r.get(4)),
        Option(r.get(7)), Option(r.get(10)))).toSeq
    // (column, status, row_growth, null_rate_delta, distinct_delta)
    assert(got == Seq(
      ("fresh", "added", None, None, None),
      ("gone", "dropped", None, None, None),
      // id: 3 → 4 rows, still all-distinct non-null
      ("id", "common", Some(1L), Some(0.0), Some(1L)),
      // s: null rate 1/3 → 3/4, distinct 2 → 1
      ("s", "common", Some(1L), Some(0.416667), Some(-1L))), got.toString)
    // The gate reads exactly these rows.
    val bad = Validate.driftViolations(Validate.profileDrift(cur, prev),
        maxNullRateJump = 0.2, maxRowGrowthPct = 1000.0,
        minRowGrowthPct = -100.0, allowAddedColumns = true,
        allowDroppedColumns = false)
      .select("column", "violation").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(bad == Set(("gone", "column_dropped"), ("s", "null_rate_jump")),
      bad.toString)
  }
}
