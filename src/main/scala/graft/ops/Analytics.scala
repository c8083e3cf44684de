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

  /** Backward as-of join: for each left row, the latest right row with
    * `right.ts <= left.ts` within the same key (classic tick/quote
    * alignment; DuckDB's ASOF JOIN is the oracle).
    *
    * Spark lacks a DataFrame as-of join; rather than a custom SparkPlan,
    * compose it: tag both sides, union, and take `last(payload, ignoreNulls)`
    * over a (key-partitioned, ts-ordered) running window — right rows sort
    * before left rows at equal ts so ties match backward-inclusive
    * semantics. Cost: ONE shuffle on the key + local sort, same as a
    * sort-merge join would pay; no range explosion, no per-key driver work.
    * At 100 TB both sides hash-partition by key and each task streams its
    * keys in ts order.
    *
    * The carried values ride INSIDE one struct payload that is non-null
    * exactly for right rows: `last(payload, ignoreNulls)` then matches the
    * latest right ROW — so a matched right row whose value is genuinely
    * NULL yields NULL (true as-of semantics, what DuckDB's ASOF returns),
    * instead of ignoreNulls skipping back to an older non-null value.
    * Right rows sharing (key, ts) get a deterministic winner by including
    * the payload struct itself in the window order (lexicographic struct
    * comparison — the largest payload wins, independent of partitioning).
    *
    * `rightVals` are (colName -> output name); left columns pass through.
    */
  def asOfJoinBackward(left: DataFrame, right: DataFrame, key: String,
                       ts: String, rightVals: Map[String, String],
                       toleranceSec: Option[Long] = None): DataFrame = {
    val rightTagged = right.select(col(key), col(ts), lit(0).as("__src"),
      struct(col(ts).as("__rts") +:
        rightVals.toSeq.map { case (c, out) => col(c).as(out) }: _*).as("__r"))
    val leftTagged = left.withColumn("__src", lit(1))
      .withColumn("__r", lit(null).cast(rightTagged.schema("__r").dataType))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__src"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = unioned.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    // pandas merge_asof(tolerance=...): a match older than the tolerance
    // nulls out AFTER the window — no extra shuffle, and the age test is
    // exact integer µs (NULL match → NULL condition → NULL, unchanged).
    val okAge = toleranceSec.map { tol =>
      unix_micros(col(ts)) - unix_micros(col("__m").getField("__rts")) <=
        tol * 1000000L
    }.getOrElse(lit(true))
    val extracted = rightVals.values.foldLeft(matched) { (d, out) =>
      d.withColumn(out, when(okAge, col("__m").getField(out)))
    }
    extracted.filter(col("__src") === 1).drop("__src", "__r", "__m")
      .select((left.columns.toIndexedSeq.map(col) ++ rightVals.values.map(col)): _*)
  }

  /** Forward as-of join — the label-construction twin of
    * [[asOfJoinBackward]]: for each left row, the EARLIEST right row
    * with `right.ts >= left.ts` in the same key ("the next quote at or
    * after this tick"). This is the leakage-free way to attach FUTURE
    * outcomes as training labels: the matched value is the first thing
    * that happened at-or-after the example's time, never something
    * before it dressed up as a label. Same composed union+window plan
    * as the backward twin with the frame reversed —
    * `first(payload, ignoreNulls)` over the key-partitioned ts-ordered
    * window running [current row, +∞); LEFT rows sort before right
    * rows at equal ts, so ties match forward-INCLUSIVE semantics
    * (DuckDB `ASOF ... ON l.ts <= r.ts` is the oracle), and the
    * payload struct inside the window order picks a deterministic
    * winner among right rows sharing (key, ts). One shuffle on the key
    * + a local sort — the sort-merge price, no range explosion. */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String,
                      ts: String, rightVals: Map[String, String],
                      toleranceSec: Option[Long] = None): DataFrame = {
    val rightTagged = right.select(col(key), col(ts), lit(1).as("__src"),
      struct(col(ts).as("__rts") +:
        rightVals.toSeq.map { case (c, out) => col(c).as(out) }: _*).as("__r"))
    val leftTagged = left.withColumn("__src", lit(0))
      .withColumn("__r", lit(null).cast(rightTagged.schema("__r").dataType))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__src"), col("__r"))
      .rowsBetween(0, Window.unboundedFollowing)
    val matched = unioned.withColumn("__m", first(col("__r"), ignoreNulls = true).over(w))
    // Symmetric twin of the backward tolerance: a label from TOO FAR in
    // the future is no label (exact integer µs, nulls after the window).
    val okAge = toleranceSec.map { tol =>
      unix_micros(col("__m").getField("__rts")) - unix_micros(col(ts)) <=
        tol * 1000000L
    }.getOrElse(lit(true))
    val extracted = rightVals.values.foldLeft(matched) { (d, out) =>
      d.withColumn(out, when(okAge, col("__m").getField(out)))
    }
    extracted.filter(col("__src") === 0).drop("__src", "__r", "__m")
      .select((left.columns.toIndexedSeq.map(col) ++ rightVals.values.map(col)): _*)
  }

  /** Bounded-interval (range) join without a cross product: for each left
    * row, the right rows of the same key with `rTs` in
    * `[lTs − lookbackSec, lTs]`. Spark plans the raw non-equi predicate as
    * BroadcastNestedLoopJoin — per-pair work, a scale-killer. Bucketing
    * event time by the window width turns it into an EQUI-join: a right
    * row lands in one bucket, a left row probes buckets {b−1, b} (an
    * inclusive window exactly one width long always spans those two — the
    * left side explodes 2×, never more), and an exact residual filter
    * keeps true matches. One hash shuffle per side on (key, bucket).
    * Bucket arithmetic runs in MICROseconds so the bucket unit equals the
    * comparison unit (second-floored buckets would leak a third bucket at
    * the boundary). `lTs`/`rTs` must be distinct column names. */
  def intervalJoinBucketed(left: DataFrame, right: DataFrame, key: String,
                           lTs: String, rTs: String, lookbackSec: Long): DataFrame = {
    require(lookbackSec > 0, "window width must be positive")
    require(lTs != rTs, "timestamp columns must have distinct names")
    val w = lookbackSec * 1000000L
    val lUs = unix_micros(col(lTs))
    val rUs = unix_micros(col(rTs))
    val lb = left.withColumn("__b",
      explode(array(floor(lUs / w).cast("long") - 1, floor(lUs / w).cast("long"))))
    val rb = right.withColumn("__b", floor(rUs / w).cast("long"))
    lb.join(rb, Seq(key, "__b"))
      .filter(rUs >= lUs - w && rUs <= lUs)
      .drop("__b")
  }

  /** Top-k rows per group by `orderBy` (extension; deterministic tie-break
    * must be embedded in `orderBy`). Single shuffle on `partCols`. */
  def topKPerGroup(df: DataFrame, partCols: Seq[String], orderBy: Seq[Column],
                   k: Int, rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Trailing-frame window moments as the DIFFERENCE of two growing
    * cumulative frames — the O(n) form of a k-row sliding sum.
    *
    * Spark's WindowExec evaluates a fixed-lower-bound frame
    * (`UNBOUNDED PRECEDING .. x`) incrementally, one accumulate per row,
    * but re-aggregates a both-bounds-moving sliding frame
    * (`k PRECEDING .. CURRENT ROW`) from scratch at EVERY row — O(n·k)
    * decimal adds per partition, and at k = 30 that was the bench's
    * slowest query (q_rolling_corr 4.9 s isolated; 5 moments × 30-row
    * re-aggregation of DECIMAL(38,12) products). The subtraction form
    * `cum[start..t] − cum[start..t−k]` runs both frames incrementally
    * and is bit-identical: decimal arithmetic is exact, so the
    * difference of the running sums IS the frame sum (no float
    * cancellation — the reason this classic trick is usually UNSAFE on
    * doubles and safe here). Both frames share one Window node (same
    * partition/order spec), so the plan keeps a single shuffle + sort.
    *
    * Null contract: `sums` yields NULL when no non-null input exists in
    * [start..t] (matching the frame-sum's NULL on all-null frames needs
    * the caller's n-guard — an all-null FRAME after earlier values gives
    * 0, not NULL, which every consumer masks with its `count ≥ x` gate);
    * `counts` never yields NULL (COUNT of an empty frame is 0). */
  private def frameMoments(w0: org.apache.spark.sql.expressions.WindowSpec,
                           k: Int): (Column => Column, Column => Column) = {
    val wCum = w0.rowsBetween(Window.unboundedPreceding, 0)
    val wPrev = w0.rowsBetween(Window.unboundedPreceding, -k)
    (c => sum(c).over(wCum) - coalesce(sum(c).over(wPrev), lit(0)),
      c => count(c).over(wCum) - count(c).over(wPrev))
  }

  /** Trailing k-row rolling mean per key — the frame-window analytic
    * (beyond the reference's lag-1 surface). Decimal-exact running sum /
    * count, so the value is reproducible under any partitioning. One
    * shuffle on `partCols`; `orderCols` must be a total order within the
    * key for determinism. O(n) via `frameMoments`; the n-valid guard
    * keeps the all-null-frame NULL the plain frame sum produced. */
  def rollingMean(df: DataFrame, valueCol: String, partCols: Seq[String],
                  orderCols: Seq[String], k: Int, out: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val w0 = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val (fsum, fcnt) = frameMoments(w0, k)
    val sx = fsum(col(valueCol).cast(DecimalType(25, 6))).cast(DoubleType)
    df.withColumn(out, when(fcnt(col(valueCol)) >= 1,
      round(sx / fcnt(lit(1)), 6)))
  }

  /** Default ceiling for [[rollingMeanSalted]]'s (key, chunk) metadata
    * row count — the density guard. 4M small rows is comfortably
    * driver-broadcastable; a metadata table past it means the chunk
    * expression is near-degenerate (rows-per-chunk ≈ 1) and the recipe
    * would broadcast data-sized tables. */
  val MaxSaltedChunkMetaRows: Long = 4L * 1000 * 1000

  /** SALTED trailing-window recipe — the skew escape hatch for the
    * rolling/lag family. A window's hash shuffle sends EVERY row of a
    * key to one task; one hot symbol at 100 TB therefore serializes one
    * reducer, and AQE cannot help: `OptimizeSkewedJoin` splits
    * SortMergeJoin partitions because each split re-joins independently,
    * but a window partition carries ORDER-DEPENDENT state — splitting it
    * would need cross-split frame context that no runtime rule
    * re-injects (see SCALING.md). The recipe injects that context
    * explicitly, and is EXACT for any bounded trailing frame
    * (`k-1 PRECEDING .. CURRENT ROW` sums/means, `lag(n)` with
    * n < k) — not for unbounded/running aggregates:
    *
    *  1. chunk each key's sequence by `chunk` — any expression MONOTONE
    *     NON-DECREASING in `orderCols` (a time bucket, an id range);
    *  2. rank each key's distinct chunks AND count their rows (one agg
    *     over #chunks rows per key — metadata-sized, never the hot
    *     data); a running sum of counts gives every chunk's global
    *     START/END position in the key's order without any window over
    *     the hot rows themselves;
    *  3. replicate each chunk's LAST k-1 rows as GHOST rows into EVERY
    *     later chunk whose start position lies within their k-1 reach —
    *     when chunks are dense that is just the next chunk, but a
    *     sparse chunk (fewer than k-1 rows, e.g. a quiet time bucket)
    *     forwards ghosts it received across the boundary, so each
    *     chunk receives exactly its min(k-1, #predecessors) global
    *     predecessor rows and every trailing frame is complete inside
    *     its own (key, chunk) partition — no density precondition;
    *  4. run the ordinary window partitioned by (key, chunk) — the hot
    *     key now spreads across its chunks — and drop ghost outputs.
    *
    * Cost: one extra tiny count-agg + broadcast, ghosts add ≤ k-1 rows
    * per (key, chunk). Correctness is pinned against the unsalted
    * operator under planted skew AND under sparse 1-row chunks
    * (OpsSpec). */
  def rollingMeanSalted(df: DataFrame, valueCol: String, partCols: Seq[String],
                        orderCols: Seq[String], k: Int, out: String,
                        chunk: Column,
                        maxMetaRows: Long = MaxSaltedChunkMetaRows): DataFrame = {
    val keyed = df.withColumn("__chunk", chunk)
    val wChunks = Window.partitionBy(partCols.map(col): _*).orderBy(col("__chunk"))
    // Metadata table: one row per (key, chunk) with its rank and the
    // global END position of its last row (running sum of counts).
    // Materialized ONCE (eager localCheckpoint): it feeds TWO broadcasts
    // below (__cidx/__cend join keys, then the ghost-target table), each
    // of which would otherwise re-run the agg scan of the hot data — and
    // the materialized count doubles as the density guard.
    val meta = keyed.groupBy((partCols :+ "__chunk").map(col): _*)
      .agg(count(lit(1)).as("__ccnt"))
      .withColumn("__cidx", row_number().over(wChunks))
      .withColumn("__cend", sum(col("__ccnt")).over(
        wChunks.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint()
    // Density guard: the recipe assumes rows-per-chunk >> 1 — meta is
    // METADATA-sized, orders smaller than the data, and both its uses
    // are driver broadcasts. A degenerate `chunk` expression (one chunk
    // per row, e.g. chunk == orderCol) silently makes those broadcasts
    // data-sized; fail fast with the cause instead.
    val metaRows = meta.count()
    require(metaRows <= maxMetaRows,
      s"rollingMeanSalted: $metaRows (key, chunk) metadata rows exceed " +
        s"the broadcast-safe ceiling $maxMetaRows — the `chunk` " +
        "expression is too fine-grained (expected rows-per-chunk >> 1); " +
        "coarsen it (e.g. a wider time bucket) or raise maxMetaRows")
    val withIdx = keyed.join(broadcast(meta.drop("__ccnt")),
      partCols :+ "__chunk")
    val wTail = Window.partitionBy((partCols :+ "__cidx").map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    // Candidates: a chunk's last k-1 rows (__rn = 1 is the chunk's final
    // row, global position __cend - __rn + 1). A candidate reaches the
    // k-1 rows after it, so it ghosts into every later chunk that STARTS
    // at or before position __cend - __rn + k; chunk positions are
    // contiguous, so "starts at or before" is __cstart <= reach with
    // __cstart = prior __cend + 1 — expressed below as target's
    // (__cend - __ccnt) < reach.
    val cand = withIdx.withColumn("__rn", row_number().over(wTail))
      .filter(col("__rn") < k)
    val tgt = meta.select((partCols.map(c => col(c).as(s"__t_$c"))
      :+ col("__cidx").as("__tidx") :+ col("__ccnt").as("__tcnt")
      :+ col("__cend").as("__tend")): _*)
    val ghosts = cand.join(broadcast(tgt),
        partCols.map(c => col(c) === col(s"__t_$c")).reduce(_ && _) &&
          col("__tidx") > col("__cidx") &&
          (col("__tend") - col("__tcnt")) < (col("__cend") - col("__rn") + k),
        "inner")
      .withColumn("__cidx", col("__tidx"))
      .drop((partCols.map(c => s"__t_$c") ++
        Seq("__rn", "__tidx", "__tcnt", "__tend")): _*)
      .withColumn("__ghost", lit(true))
    val aug = withIdx.withColumn("__ghost", lit(false)).unionByName(ghosts)
    rollingMean(aug, valueCol, partCols :+ "__cidx", orderCols, k, out)
      .filter(!col("__ghost"))
      .drop("__chunk", "__cidx", "__cend", "__ghost")
  }

  /** Trailing-window Pearson correlation of two clean-decimal series per
    * key — rolling co-movement, one analytic step past `rollingMean`
    * (feed y = lag(x) for rolling autocorrelation). Rows where either
    * side is null are excluded from every moment symmetrically.
    *
    * Numeric contract: the five window moments (Σx, Σy, Σxy, Σx², Σy²)
    * are EXACT decimal partials — inputs cast to DECIMAL(18,6), whose
    * products fit DECIMAL(38,12) with no precision adjustment — each
    * cast to double once; the closing corr arithmetic is one fixed
    * double expression tree (correctly-rounded IEEE ops → bit-identical
    * on any engine, reproducible under any partitioning). Degenerate
    * windows (n < 2, or a zero-variance side — including the tiny
    * NEGATIVE variance double rounding can leave where the exact value
    * is 0, which a bare sqrt would turn into engine-dependent NaN) give
    * NULL. Plan: one window over the key partitioning — a single hash
    * shuffle, same shape as `rollingMean`. */
  def rollingCorr(df: DataFrame, xCol: String, yCol: String,
                  partCols: Seq[String], orderCols: Seq[String],
                  k: Int, out: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val w0 = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val (fsum, fcnt) = frameMoments(w0, k)
    val valid = col(xCol).isNotNull && col(yCol).isNotNull
    val xi = when(valid, col(xCol)).cast(DecimalType(18, 6))
    val yi = when(valid, col(yCol)).cast(DecimalType(18, 6))
    def m(c: Column) = fsum(c).cast(DoubleType)
    val n = fcnt(when(valid, lit(1))).cast(DoubleType)
    val (sx, sy) = (m(xi), m(yi))
    val (sxy, sxx, syy) = (m(xi * yi), m(xi * xi), m(yi * yi))
    val cov = n * sxy - sx * sy
    val vx = greatest(n * sxx - sx * sx, lit(0.0))
    val vy = greatest(n * syy - sy * sy, lit(0.0))
    val den = sqrt(vx * vy)
    df.withColumn(out, when(n >= 2 && den > 0, round(cov / den, 6)))
  }

  /** Trailing-window SAMPLE standard deviation per key — rolling
    * volatility, the scale analytic between `rollingMean` and
    * `rollingCorr`. Same numeric contract as `rollingCorr`: exact
    * DECIMAL(18,6) window moments cast to double once, one fixed IEEE
    * closing tree (sqrt(max(nΣx²−(Σx)², 0) / (n(n−1)))), NULL for n < 2.
    * One hash shuffle on `partCols`. */
  def rollingStd(df: DataFrame, valueCol: String, partCols: Seq[String],
                 orderCols: Seq[String], k: Int, out: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val w0 = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val (fsum, fcnt) = frameMoments(w0, k)
    val xi = col(valueCol).cast(DecimalType(18, 6))
    val n = fcnt(col(valueCol)).cast(DoubleType)
    val sx = fsum(xi).cast(DoubleType)
    val sxx = fsum(xi * xi).cast(DoubleType)
    val vx = greatest(n * sxx - sx * sx, lit(0.0))
    df.withColumn(out,
      when(n >= 2, round(sqrt(vx / (n * (n - 1))), 6)))
  }

  /** Trailing k-row z-score per key + the |z| > 3 anomaly flag — the
    * streaming-friendly outlier detector over a metric series (how many
    * rolling standard deviations the current value sits from its recent
    * mean). Same O(n) difference-of-growing-frames moments and the same
    * decimal-exact → one-double-tree contract as [[rollingStd]]; the
    * flag is computed from the ROUNDED z so both engines compare the
    * identical double. NULL where the window has < 2 rows or zero
    * variance (a flat window has no scale — flagging there would be
    * noise, not signal). */
  def rollingZScore(df: DataFrame, valueCol: String, partCols: Seq[String],
                    orderCols: Seq[String], k: Int, out: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val w0 = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val (fsum, fcnt) = frameMoments(w0, k)
    val xi = col(valueCol).cast(DecimalType(18, 6))
    val n = fcnt(col(valueCol)).cast(DoubleType)
    val sx = fsum(xi).cast(DoubleType)
    val sxx = fsum(xi * xi).cast(DoubleType)
    val std = sqrt(greatest(n * sxx - sx * sx, lit(0.0)) / (n * (n - 1)))
    df.withColumn(out, when(n >= 2 && std > 0,
        round((col(valueCol).cast(DoubleType) - sx / n) / std, 6)))
      .withColumn(s"${out}_anomaly", abs(col(out)) > lit(3.0))
  }

  /** Running peak and drawdown per key — the classic risk analytic over a
    * price series (how far below its historical high the series sits).
    * `peak` = cumulative max of the raw value (no arithmetic — exact);
    * drawdown = value/peak − 1 ≤ 0, one correctly-rounded IEEE divide then
    * a 6dp round, so the output is bit-identical on any engine and any
    * partitioning. Values must be positive (a non-positive price makes
    * the ratio meaningless). One hash shuffle on `partCols`; `orderCols`
    * must complete a total order per key. */
  def drawdown(df: DataFrame, valueCol: String, partCols: Seq[String],
               orderCols: Seq[String], peakOut: String = "peak",
               out: String = "drawdown"): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn(peakOut, max(col(valueCol)).over(w))
      .withColumn(out, round(col(valueCol) / col(peakOut) - 1, 6))
  }

  /** Cumulative return per key: value / first value of the series − 1 —
    * growth since series start, without the cross-engine hazards of a
    * running product (Π(1+rᵢ) needs exp/ln or sequential state; the
    * ratio-to-first form is ONE exact division of two raw inputs). Same
    * window/shuffle shape and rounding contract as `drawdown`. */
  def cumReturn(df: DataFrame, valueCol: String, partCols: Seq[String],
                orderCols: Seq[String], out: String = "cum_return"): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn(out,
      round(col(valueCol) / first(col(valueCol)).over(w) - 1, 6))
  }

  /** OHLCV + VWAP bar resampling: a tick-level series → one bar per
    * (key, bucket) — the finance feed's canonical downsample (reference
    * consumes daily bars; see /root/reference/etl.py stock surface).
    *
    * open/close are the first/last price in (ts, tie) order via
    * `min_by`/`max_by` over a struct ordering — ONE partial-aggregable
    * hash aggregate, so a 100 TB tick table resamples with a single
    * combine-enabled shuffle on the bar key and NO window sort (the
    * window formulation would sort every partition just to pick two
    * endpoints). high/low are plain extrema; volume is an exact long
    * sum; vwap = Σ(price·qty)/Σqty with decimal-exact sums (products
    * fit DECIMAL(38,12)) and one closing double divide, 6dp-rounded —
    * bit-identical cross-engine. `tie` must make (ts, tie) a total
    * order within a bar. */
  def ohlcBars(df: DataFrame, keyCols: Seq[Column], bucket: Column,
               ts: Column, tie: Column, price: Column, qty: Column,
               bucketName: String = "bar"): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val ord = struct(ts, tie)
    df.groupBy((keyCols :+ bucket.as(bucketName)): _*)
      .agg(
        min_by(price, ord).as("open"),
        max(price).as("high"),
        min(price).as("low"),
        max_by(price, ord).as("close"),
        sum(qty).as("volume"),
        round(
          sum(price.cast(DecimalType(18, 6)) * qty.cast(DecimalType(18, 6)))
            .cast(DoubleType)
            / sum(qty.cast(DecimalType(18, 6))).cast(DoubleType), 6).as("vwap"))
  }

  /** Bollinger bands: trailing k-row mean ± `width` sample standard
    * deviations per key, in ONE window pass — mid, upper, and lower all
    * close over the same exact decimal moments `rollingStd` uses (Σx,
    * Σx² as DECIMAL(18,6) partials cast to double once), so adding the
    * bands costs no extra shuffle or sort over the plain rolling mean.
    * Bands are NULL below two observations (std undefined); mid is
    * defined from n = 1. */
  def bollinger(df: DataFrame, valueCol: String, partCols: Seq[String],
                orderCols: Seq[String], k: Int, width: Double,
                midOut: String = "bb_mid", upOut: String = "bb_upper",
                loOut: String = "bb_lower"): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val w0 = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val (fsum, fcnt) = frameMoments(w0, k)
    val xi = col(valueCol).cast(DecimalType(18, 6))
    val n = fcnt(col(valueCol)).cast(DoubleType)
    val sx = fsum(xi).cast(DoubleType)
    val sxx = fsum(xi * xi).cast(DoubleType)
    val mean = sx / n
    val sd = sqrt(greatest(n * sxx - sx * sx, lit(0.0)) / (n * (n - 1)))
    df.withColumn(midOut, when(n >= 1, round(mean, 6)))
      .withColumn(upOut, when(n >= 2, round(mean + lit(width) * sd, 6)))
      .withColumn(loOut, when(n >= 2, round(mean - lit(width) * sd, 6)))
  }

  /** Relative Strength Index (Cutler's SMA form) over a trailing k-diff
    * window per key: RSI = 100 · ΣG / (ΣG + ΣL), where G/L are the
    * positive/negative parts of the one-row price diff — algebraically
    * 100 − 100/(1 + avgG/avgL) with the counts cancelled, which avoids
    * a division by zero when the window has no losses. (Wilder's
    * original uses a recursive smoothed average — sequential state,
    * not window-expressible; Cutler's SMA variant exists precisely for
    * this and is the standard batch form.) Diffs are cast to
    * DECIMAL(18,6) so the two frame sums are exact; the close is one
    * double expression, 6dp-rounded. NULL until the window holds at
    * least one diff with movement (ΣG + ΣL > 0 exact-decimal test) —
    * each key's first row has no diff and never contributes. Two
    * Window nodes (the diff lag, then the O(n) growing-frame moments)
    * over one partitioning: a single shuffle + sort. */
  def rsi(df: DataFrame, valueCol: String, partCols: Seq[String],
          orderCols: Seq[String], k: Int, out: String = "rsi"): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val w0 = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val (fsum, _) = frameMoments(w0, k)
    val zero = lit(0).cast(DecimalType(18, 6))
    val withDiff = df.withColumn("__diff",
      (col(valueCol) - lag(col(valueCol), 1).over(w0)).cast(DecimalType(18, 6)))
    val sg = fsum(when(col("__diff") > 0, col("__diff")).otherwise(zero))
    val sl = fsum(when(col("__diff") < 0, -col("__diff")).otherwise(zero))
    withDiff
      .withColumn(out, when(sg + sl > 0,
        round(lit(100.0) * sg.cast(DoubleType) / (sg + sl).cast(DoubleType), 6)))
      .drop("__diff")
  }

  /** Per-key ordinary-least-squares trend of a series against its
    * observation index: one (slope, intercept, r2, n) row per key — the
    * "is this symbol drifting" analytic past rolling windows. x is the
    * 1-based rank of the row in (orderCols) order, NOT a raw timestamp:
    * ranks keep every moment small enough that the DECIMAL sums (Σx,
    * Σy, Σxy, Σx², Σy²) stay exact where epoch-micro squares would
    * overflow DECIMAL(38). The closing slope/intercept/r² arithmetic is
    * one fixed double tree over the exact moments, 6dp-rounded. Keys
    * with n < 2 or zero x/y variance give NULL slope/intercept/r².
    *
    * Plan: one hash shuffle on the key for the rank window; the moment
    * groupBy refines the SAME partitioning, so Catalyst plans no second
    * exchange. Null y rows are dropped up front (they contribute to no
    * moment and must not consume ranks). */
  def linearTrend(df: DataFrame, yCol: String, partCols: Seq[String],
                  orderCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    // x is an integer rank: scale-0 decimal keeps x·y and x² products
    // narrow (DuckDB's 18,6 × 18,6 multiply overflows int64 units).
    val ranked = df.filter(col(yCol).isNotNull)
      .withColumn("__x", row_number().over(w).cast(DecimalType(12, 0)))
      .withColumn("__y", col(yCol).cast(DecimalType(18, 6)))
    def m(c: Column) = sum(c).cast(DoubleType)
    val agg = ranked.groupBy(partCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        m(col("__x")).as("sx"), m(col("__y")).as("sy"),
        m(col("__x") * col("__y")).as("sxy"),
        m(col("__x") * col("__x")).as("sxx"),
        m(col("__y") * col("__y")).as("syy"))
    val n = col("n").cast(DoubleType)
    val vx = n * col("sxx") - col("sx") * col("sx")
    val vy = greatest(n * col("syy") - col("sy") * col("sy"), lit(0.0))
    val cov = n * col("sxy") - col("sx") * col("sy")
    val slope = cov / vx
    agg.select(
      (partCols.map(col) ++ Seq(
        col("n"),
        when(n >= 2 && vx > 0, round(slope, 6)).as("slope"),
        when(n >= 2 && vx > 0,
          round((col("sy") - slope * col("sx")) / n, 6)).as("intercept"),
        when(n >= 2 && vx > 0 && vy > 0,
          round(cov * cov / (vx * vy), 6)).as("r2"))): _*)
  }

  /** Key-skew profile: per-key row counts with share-of-total and
    * ratio-to-mean-key — the pre-flight diagnostic for a 100 TB shuffle
    * (skew ≫ 1 keys are the ones that need `saltedSumCount`/`saltedJoin`
    * or AQE skew handling). One combine-enabled groupBy, a broadcast
    * 1-row totals join, then a bounded top-k that runs as
    * TakeOrderedAndProject (per-partition k-heap + merge, never a full
    * sort). Ties on n break on the key columns for a deterministic cut. */
  def keySkewProfile(df: DataFrame, keys: Seq[String], topK: Int): DataFrame = {
    require(topK >= 1, "need topK >= 1")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    val totals = counts.agg(
      sum(col("n")).cast("double").as("__total"),
      count(lit(1)).cast("double").as("__nkeys"))
    counts.crossJoin(broadcast(totals))
      .withColumn("share", round(col("n") / col("__total"), 6))
      .withColumn("skew", round(col("n") * col("__nkeys") / col("__total"), 6))
      .drop("__total", "__nkeys")
      .orderBy(col("n").desc +: keys.map(col): _*)
      .limit(topK)
  }

  /** Gap-based sessionization in BATCH — the oracle-verifiable twin of
    * streaming.EventStream.sessionize: a session breaks where the gap to
    * the previous event of the key exceeds `gapSec`; the session id is
    * the running count of breaks, then one aggregate per (key, session).
    * Gap arithmetic runs in microseconds (the timestamp's native unit) so
    * boundary gaps compare exactly. Cost: one hash shuffle on the key for
    * the window (the session-id aggregate then refines the same key —
    * rows for a key land in one task either way). `tie` must complete a
    * total order per key for a deterministic session assignment. */
  def sessionizeBatch(df: DataFrame, key: String, ts: String, tie: String,
                      valueCol: String, gapSec: Long): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    val us = unix_micros(col(ts))
    val prev = lag(us, 1).over(w)
    val brk = when(prev.isNull || us - prev > gapSec * 1000000L, 1L).otherwise(0L)
    df.withColumn("__brk", brk)
      .withColumn("session_id",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(key), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(DecimalType(25, 6))).cast(DoubleType).as("sum_value"),
        min(col(ts)).as("session_start"), max(col(ts)).as("session_end"))
  }

  /** One-pass per-group moment statistics: count, mean, population
    * variance, skewness, and EXCESS kurtosis from four algebraic power
    * sums — the distribution profile of a metric column in ONE
    * combine-enabled aggregate (no percentile sort, no second pass),
    * the shape that survives any scale because power sums merge
    * associatively across partitions.
    *
    * Numeric contract: inputs round to 6dp; each power (v², v³, v⁴)
    * computes as a left-associated double product, rounds to 6dp, and
    * sums as an exact DECIMAL(38,6) (order-independent); the closing
    * moment algebra is one double tree using only +,−,×,÷,sqrt
    * (all correctly-rounded IEEE — deliberately NO pow(), whose last
    * ulp differs between libm implementations), rounded 6dp. Skew and
    * kurtosis are NULL where variance is 0 or n < 2 (no shape to
    * measure). */
  def momentStats(df: DataFrame, valueCol: String,
                  groupCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val v = round(col(valueCol).cast(DoubleType), 6)
    def dsum(p: Column): Column =
      sum(round(p, 6).cast(DecimalType(38, 6))).cast(DoubleType)
    val agged = df.groupBy(groupCols.map(col): _*)
      .agg(count(col(valueCol)).as("n"),
        dsum(v).as("__s1"), dsum(v * v).as("__s2"),
        dsum(v * v * v).as("__s3"), dsum(v * v * v * v).as("__s4"))
    val n = col("n").cast(DoubleType)
    val mean = col("__s1") / n
    val m2 = col("__s2") / n - mean * mean
    val m3 = col("__s3") / n - lit(3.0) * mean * (col("__s2") / n) +
      lit(2.0) * mean * mean * mean
    val m4 = col("__s4") / n - lit(4.0) * mean * (col("__s3") / n) +
      lit(6.0) * mean * mean * (col("__s2") / n) -
      lit(3.0) * mean * mean * mean * mean
    agged.select((groupCols.map(col) ++ Seq(col("n"),
      round(mean, 6).as("mean"),
      round(m2, 6).as("variance"),
      when(col("n") >= 2 && m2 > 0,
        round(m3 / (sqrt(m2) * m2), 6)).as("skewness"),
      when(col("n") >= 2 && m2 > 0,
        round(m4 / (m2 * m2) - lit(3.0), 6)).as("kurtosis_excess"))): _*)
  }

  /** Ordered-step FUNNEL per key: for each named step, the earliest
    * event satisfying its predicate AT OR AFTER the key's previous-step
    * timestamp — first `steps.head`, then the first matching event ≥
    * that, and so on. Output: one row per key that completed step 1,
    * one timestamp column per step (NULL from the first step the key
    * never reached — aggregate the NULL pattern for conversion rates).
    *
    * Plan shape: per step, one filtered scan → ONE keyed left join
    * against the accumulator → combine-enabled MIN agg back on the
    * key (earlier step columns are constant per key, so they ride the
    * agg as MINs instead of a second join — the accumulator is
    * consumed exactly once per step and every exchange is on the SAME
    * key). No windows, no per-key event sorting — at 100 TB the
    * per-user event list never materializes anywhere. */
  def funnel(events: DataFrame, key: Column, ts: Column,
             steps: Seq[(String, Column)],
             maxGapSec: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(steps.map(_._1).distinct.size == steps.size, "step names unique")
    require(maxGapSec.forall(_ >= 1), "maxGapSec must be >= 1 when set")
    val s0 = events.filter(steps.head._2).groupBy(key.as("k"))
      .agg(min(ts).as(steps.head._1))
    steps.sliding(2).foldLeft(s0) { case (acc, Seq((prevName, _), (name, cond))) =>
      val carried = acc.columns.filter(_ != "k")
      // Optional TIME-BOXED funnel (the product-analytics default:
      // "clicked within N hours of viewing"): the step must land at or
      // after the previous step AND within the gap — exact integer µs,
      // boundary inclusive on both ends.
      val inWindow = maxGapSec.map(g =>
        unix_micros(col("__t")) - unix_micros(col(prevName)) <=
          g * 1000000L).getOrElse(lit(true))
      acc.join(events.filter(cond).select(key.as("k"), ts.as("__t")),
          Seq("k"), "left")
        .withColumn("__ok",
          when(col("__t") >= col(prevName) && inWindow, col("__t")))
        .groupBy(col("k"))
        .agg(min(col(carried.head)).as(carried.head),
          (carried.tail.map(c => min(col(c)).as(c)) :+
            min(col("__ok")).as(name)): _*)
    }
  }

  /** Cohort RETENTION: users grouped by the calendar day of their first
    * event, counted once per (cohort, day-offset) they came back on.
    * Two keyed aggs + one keyed join: first-day per user (combine-
    * enabled MIN), join back on the user key, distinct (cohort, offset,
    * user) — the explicit two-stage shape instead of COUNT(DISTINCT),
    * so the heavy dedup happens partitioned by the full triple, not
    * under one (cohort, offset) reducer when a cohort is hot. */
  def cohortRetention(events: DataFrame, key: Column, ts: Column): DataFrame = {
    val firstDay = events.groupBy(key.as("k"))
      .agg(min(to_date(ts)).as("cohort_day"))
    events.select(key.as("k"), to_date(ts).as("__d"))
      .join(firstDay, Seq("k"))
      .select(col("cohort_day"),
        datediff(col("__d"), col("cohort_day")).as("day_offset"), col("k"))
      .distinct()
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Skew-safe grouped aggregation: pre-aggregate on (keys, salt) so one
    * hot key's rows spread over `nSalts` reducers, then combine the
    * partials in a second (tiny: |keys|×nSalts rows) stage. For algebraic
    * aggregates (sum/count here) the two-stage result is exactly the
    * one-stage result — pass decimal-cast values for bit-reproducibility.
    *
    * `saltFrom` must be a deterministic per-row expression (a unique id to
    * spread uniformly) — NOT rand(), which would break retry/replay
    * semantics: a recomputed task must salt identically.
    *
    * At 100 TB this is the manual fallback when AQE skew handling can't
    * apply (e.g. partial aggregation already collapsed the skew detector's
    * signal); at benign cardinality prefer the plain groupBy — same answer,
    * one fewer exchange. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: Column,
                     saltFrom: Column, nSalts: Int,
                     sumName: String = "sum_v", cntName: String = "n"): DataFrame =
    df.withColumn("__salt", pmod(saltFrom, lit(nSalts)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(sumName), sum(col("__pcnt")).as(cntName))

  /** Skew-safe equi-join — the join-side twin of `saltedSumCount`: the
    * skewed (fact) side salts its key from a unique column, the small
    * side replicates each row across all `nSalts` values, and the join
    * key becomes (key, salt) — a hot key's rows spread over `nSalts`
    * reducers instead of serializing on one. Replication costs
    * |right| × nSalts rows, so the right side must be the small one
    * (dimension/lookup shape). Result rows are exactly the plain join's
    * (each left row meets each matching right row once — the salt picks
    * WHICH replica, never whether). Deterministic salt, not rand():
    * re-runs and retried tasks salt identically. AQE's skew-join split
    * covers sort-merge plans after the fact; salting is the explicit
    * form that also survives plan changes and feeds downstream
    * aggregation already spread. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFrom: Column, nSalts: Int): DataFrame = {
    require(nSalts >= 1, "need at least one salt")
    // NULL saltFrom → salt 0, NOT a NULL salt: an inner join on a NULL
    // salt would silently drop the row, breaking join equivalence. Salt
    // quality only affects the skew spread, never correctness.
    val l = left.withColumn("__salt",
      coalesce(pmod(saltFrom, lit(nSalts)), lit(0)))
    val r = right.select(col("*"), explode(
      array((0 until nSalts).map(lit): _*)).as("__salt"))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** First/last-touch ATTRIBUTION: for every conversion event, the
    * earliest and latest touch by the same user inside a lookback
    * window ending at the conversion. One per-conversion row:
    * (conv_id, user, conv_ts, value, first_touch, first_ts,
    * last_touch, last_ts) — touch columns NULL when no touch falls in
    * the window (report layers decide how to bucket unattributed
    * conversions; this op won't invent a channel).
    *
    * Scale shape: NO conversion×touch join (the naive range join is
    * Θ(convs · touches-per-user) rows). ONE window partitioned by user
    * over a RANGE frame of `lookbackSeconds` on the microsecond
    * timeline; first/last = min/max of struct(ts, label) — null-skipped
    * for non-touch rows, lexicographic tie-break on label at equal ts
    * (deterministic whatever the partitioning). One user-key shuffle
    * total; state per frame is two structs.
    *
    * A touch at EXACTLY the conversion timestamp counts (frame upper
    * bound inclusive — simultaneous click+purchase attributes to the
    * click); both window bounds are inclusive, matching
    * `t.ts BETWEEN c.ts - lookback AND c.ts`. */
  def attributeConversions(events: DataFrame, user: Column, ts: Column,
                           convId: Column, value: Column,
                           isConversion: Column, isTouch: Column,
                           touchLabel: Column,
                           lookbackSeconds: Long): DataFrame = {
    require(lookbackSeconds > 0, "lookback must be positive")
    val w = Window.partitionBy(user).orderBy(unix_micros(ts))
      .rangeBetween(-lookbackSeconds * 1000000L, 0L)
    val tagged = when(isTouch && ts.isNotNull,
      struct(ts.as("t"), touchLabel.as("label")))
    events
      .withColumn("__first", min(tagged).over(w))
      .withColumn("__last", max(tagged).over(w))
      .filter(isConversion)
      .select(convId.as("conv_id"), user.as("user_id"),
        ts.as("conv_ts"), value.as("value"),
        col("__first.label").as("first_touch"),
        col("__first.t").as("first_ts"),
        col("__last.label").as("last_touch"),
        col("__last.t").as("last_ts"))
  }

  /** Multi-touch ATTRIBUTION credit models — the report layer every
    * marketing-analytics user asks for after [[attributeConversions]]'
    * first/last touch: `linear` (equal split across in-window touches),
    * `position` (U-shaped 40/20/40: first, middles, last), and `decay`
    * (half-life bucketed exponential decay). Returns one row per
    * channel: (channel, conversions, credit), plus a `(none)` row
    * carrying the full value of unattributed conversions.
    *
    * Scale shape — the same contract as [[attributeConversions]]: NO
    * conversion×touch join anywhere (the naive credit-split join is
    * Θ(convs · touches-per-user) rows through a shuffle). ONE window
    * partitioned by user over the `lookbackSeconds` range frame
    * computes every per-channel aggregate in a single WindowExec (the
    * aggregates all share one window spec); the channel list is a
    * driver collect BOUNDED BY CHANNEL CARDINALITY (tens, like the ANN
    * centroid collects — documented operator contract); the unpivot
    * multiplies conversions × (channels+1) rows, bounded the same way;
    * the final group is on the tiny channel key. One user-key shuffle
    * + one channel-key shuffle total, at ANY conversion/touch ratio.
    *
    * Exactness contract: per-conversion credits are ROUND(·, 6) then
    * summed as DECIMAL(20,6) — the channel totals are bit-stable under
    * any row order and match a SQL oracle computing the same formulas.
    * The decay weights are exact negative powers of two (half-life
    * BUCKET decay: a touch `k` half-life buckets before the conversion
    * weighs 2^-k, where buckets are fixed `halflifeSeconds` windows of
    * the epoch-micros timeline). Bucketing is what makes the weight
    * WINDOW-COMPUTABLE without a pair join: a frame of width
    * `lookbackSeconds` spans at most M = lookback/halflife + 2
    * consecutive buckets, so per-(channel, bucket mod M) counts over
    * the one shared window reconstruct every touch's bucket distance
    * exactly — the continuous-exponential variant would need exp() of
    * unbounded epoch offsets (overflow) or a per-pair join.
    *
    * A touch at exactly the conversion timestamp counts (both frame
    * bounds inclusive); first/last tie-break at equal ts is
    * lexicographic on the label, deterministic on both engines.
    */
  def attributionReport(events: DataFrame, user: Column, ts: Column,
                        value: Column, isConversion: Column, isTouch: Column,
                        touchLabel: Column, lookbackSeconds: Long,
                        model: String,
                        halflifeSeconds: Long = 0L): DataFrame = {
    require(lookbackSeconds > 0, "lookback must be positive")
    require(Set("linear", "position", "decay")(model),
      s"unknown model '$model' (linear | position | decay)")
    // A NULL label can't name a channel (and would NPE the driver-side
    // channel sort): label-less touches are out of scope, like ts-less.
    val touch = isTouch && ts.isNotNull && touchLabel.isNotNull
    // Bounded driver collect: distinct channel labels (operator
    // contract — channels are a small closed set, like event types).
    val channels = events.filter(touch)
      .select(touchLabel.cast("string").as("__c")).distinct()
      .collect().map(_.getString(0)).sorted
    val lookUs = lookbackSeconds * 1000000L
    val w = Window.partitionBy(user).orderBy(unix_micros(ts))
      .rangeBetween(-lookUs, 0L)

    val idx = channels.indices
    val m = if (model == "decay") {
      require(halflifeSeconds > 0, "decay model needs halflifeSeconds")
      val m0 = (lookbackSeconds / halflifeSeconds).toInt + 2
      require(m0 <= 62, "lookback/halflife too large for exact 2^-k weights")
      m0
    } else 0
    // Bucket = epoch-micros DIV halflife-micros (exact: the subtraction
    // makes the dividend an exact multiple, so the double division is
    // exact integer — never a float-floor off-by-one). A frame spans at
    // most m consecutive buckets, so bucket mod m is injective inside
    // it and pmod(r0 - r, m) recovers each touch's exact bucket
    // distance from the conversion.
    val hUs = if (model == "decay") halflifeSeconds * 1000000L else 1L
    val ep = ((unix_micros(ts) - pmod(unix_micros(ts), lit(hUs))) / lit(hUs))
      .cast("long")
    // EVERY window aggregate goes into ONE select over the shared spec
    // `w` — sequential withColumns would leave a Project between each
    // logical Window and defeat CollapseWindow, stacking one
    // WindowExec + Sort per aggregate (the pin asserts exactly one).
    val winCols = Seq.newBuilder[Column]
    winCols += count(when(touch, 1)).over(w).as("__N")
    for (i <- idx)
      winCols += count(when(touch && touchLabel === channels(i), 1))
        .over(w).as(s"__n_$i")
    if (model == "position") {
      val tagged = when(touch, struct(ts.as("t"),
        touchLabel.cast("string").as("label")))
      winCols += min(tagged).over(w).as("__first")
      winCols += max(tagged).over(w).as("__last")
    }
    if (model == "decay")
      for (i <- idx; r <- 0 until m)
        winCols += count(when(touch && touchLabel === channels(i) &&
          pmod(ep, lit(m)) === r, 1)).over(w).as(s"__d_${i}_$r")
    var base = events.select(col("*") +: winCols.result(): _*)
    if (model == "decay") {
      // Row-level close over the window counts: W_i = Σ_r count(channel
      // i, bucket≡r) · 2^-dist(r) — every term an exact negative power
      // of two, so the additions are order-independent and oracle-exact.
      base = base.withColumn("__r0", pmod(ep, lit(m)))
      def wsum(i: Int): Column =
        (0 until m).map { r =>
          col(s"__d_${i}_$r") * (lit(1.0) /
            expr(s"shiftleft(1L, CAST(pmod(__r0 - $r, $m) AS INT))"))
        }.reduce(_ + _)
      base = idx.foldLeft(base)((d, i) => d.withColumn(s"__w_$i", wsum(i)))
      base = base.withColumn("__W", idx.map(i => col(s"__w_$i")).reduce(_ + _))
    }

    // Per-channel rounded credit for the conversion row, or NULL when
    // the channel earns nothing (keeps the unpivot sparse). The double
    // expressions mirror the SQL oracle operation-for-operation so the
    // pre-round values are bit-identical.
    def emit(c: Column): Column = { val r = round(c, 6); when(r > 0, r) }
    val credits: Seq[(String, Column)] = model match {
      case "linear" =>
        idx.map { i =>
          channels(i) ->
            emit(when(col("__N") > 0, value * col(s"__n_$i") / col("__N")))
        }
      case "position" =>
        idx.map { i =>
          val f = when(col("__first.label") === channels(i), 1.0).otherwise(0.0)
          val l = when(col("__last.label") === channels(i), 1.0).otherwise(0.0)
          val n = col(s"__n_$i")
          channels(i) -> emit(
            when(col("__N") === 1, value * f)
              .when(col("__N") === 2, value * 0.5 * f + value * 0.5 * l)
              .when(col("__N") >= 3,
                value * 0.4 * f + value * 0.4 * l +
                  value * 0.2 * (n - f - l) / (col("__N") - 2)))
        }
      case "decay" =>
        idx.map { i =>
          channels(i) ->
            emit(when(col("__W") > 0, value * col(s"__w_$i") / col("__W")))
        }
    }

    val perConv = base.filter(isConversion && ts.isNotNull)
    val entries = credits.map { case (c, cr) =>
      struct(lit(c).as("channel"), cr.as("credit"))
    } :+ struct(lit("(none)").as("channel"),
      // NULL-valued unattributed conversions still COUNT (credit 0),
      // mirroring the oracle's COUNT(*) + null-ignoring SUM — without
      // the coalesce the NULL credit is filtered and the conversion
      // vanishes from the (none) row entirely.
      when(col("__N") === 0, coalesce(round(value, 6), lit(0.0)))
        .as("credit"))
    perConv
      .select(explode(array(entries: _*)).as("__e"))
      .filter(col("__e.credit").isNotNull)
      .groupBy(col("__e.channel").as("channel"))
      .agg(count(lit(1)).as("conversions"),
        sum(col("__e.credit").cast(org.apache.spark.sql.types.DecimalType(20, 6)))
          .cast(org.apache.spark.sql.types.DoubleType).as("credit"))
      .orderBy("channel")
  }

  /** EXACT scaled weight for ordered-Shapley attribution: position `k`
    * of `n` touches earns w(k,n) = (H(n) − H(n−k)) / n — the Shapley
    * value of the "airport game" with linearly increasing stand-ins
    * d_j = j over the arrival order (Littlechild–Owen 1973 closed
    * form), normalized so Σ_k w(k,n) = 1. Later touches earn more
    * (recency-monotone) but EVERY touch earns something — the two
    * properties practitioners ask Shapley for that first/last and
    * U-shaped both lack. Computed as an exact rational
    * (Σ_{j=n−k+1..n} L/j) / (n·L) with L = lcm(1..n) in BigInteger,
    * then fixed-point scaled by 10¹⁸ (HALF_UP) — both engines sum
    * LONGs, so credit parity is exact by construction. */
  def shapleyWeightScaled(k: Int, n: Int): Long = {
    require(k >= 1 && k <= n, s"need 1 <= k <= n, got k=$k n=$n")
    import java.math.BigInteger
    val lcm = (1 to n).foldLeft(BigInteger.ONE) { (a, j) =>
      val b = BigInteger.valueOf(j); a.divide(a.gcd(b)).multiply(b) }
    val num = (n - k + 1 to n).foldLeft(BigInteger.ZERO) { (a, j) =>
      a.add(lcm.divide(BigInteger.valueOf(j))) }
    val den = lcm.multiply(BigInteger.valueOf(n))
    new java.math.BigDecimal(num)
      .multiply(new java.math.BigDecimal(BigInteger.TEN.pow(18)))
      .divide(new java.math.BigDecimal(den), 0,
        java.math.RoundingMode.HALF_UP)
      .longValueExact()
  }

  /** ORDERED-SHAPLEY multi-touch attribution — the remaining standard
    * model next to linear/position/decay ([[attributionReport]]): each
    * in-window touch earns [[shapleyWeightScaled]] of the conversion
    * value by its arrival position. Same output contract as the other
    * models: (channel, conversions, credit) + a `(none)` row.
    *
    * Scale shape: NO conversion×touch join — ONE window partitioned by
    * user over the lookback range frame carries a per-conversion
    * `collect_list` of its in-window touches (row-local, bounded by a
    * user's touches inside the lookback — enforced ≤ `maxTouches`,
    * loud `raise_error` beyond, never silent misweighting), and the
    * per-channel weight sums are higher-order-function folds over that
    * array — zero extra shuffles beyond the user window and the final
    * tiny channel group. The (k, n) → weight table is a driver-built
    * literal map of Σ_{n≤maxTouches} n entries (528 at the default 32)
    * — compile-time metadata, not a join side.
    *
    * Exactness: weights are 10¹⁸-scaled LONGs, per-channel sums are
    * exact integer folds, and the single long→double→÷10¹⁸ conversion
    * is IEEE-identical on any engine — ROUND(·,6) credits then sum as
    * DECIMAL(20,6) like every other attribution model here. */
  def attributionShapley(events: DataFrame, user: Column, ts: Column,
                         value: Column, isConversion: Column,
                         isTouch: Column, touchLabel: Column,
                         lookbackSeconds: Long,
                         maxTouches: Int = 32): DataFrame = {
    require(lookbackSeconds > 0, "lookback must be positive")
    require(maxTouches >= 1 && maxTouches <= 128,
      s"maxTouches must be in 1..128, got $maxTouches")
    val touch = isTouch && ts.isNotNull && touchLabel.isNotNull
    // Bounded driver collect: distinct channel labels (same operator
    // contract as attributionReport).
    val channels = events.filter(touch)
      .select(touchLabel.cast("string").as("__c")).distinct()
      .collect().map(_.getString(0)).sorted
    val lookUs = lookbackSeconds * 1000000L
    val w = Window.partitionBy(user).orderBy(unix_micros(ts))
      .rangeBetween(-lookUs, 0L)
    val weights: Map[String, Long] = (for {
      n <- 1 to maxTouches; k <- 1 to n
    } yield s"${n}_$k" -> shapleyWeightScaled(k, n)).toMap
    val wmap = typedLit(weights)
    val tagged = when(touch,
      struct(unix_micros(ts).as("t"), touchLabel.cast("string").as("label")))
    // BOTH window aggregates in ONE select over the shared spec (the
    // CollapseWindow discipline attributionReport documents).
    val base = events.select(col("*"),
      count(when(touch, 1)).over(w).as("__n0"),
      sort_array(collect_list(tagged).over(w)).as("__st"))
    // Loud overflow: a conversion window beyond the weight table would
    // otherwise silently earn zero for positions past the cap. The
    // guard is applied AFTER the conversion filter below (on perConv),
    // so it is safe by construction: a touch-only user with 33 events
    // in a window must never trip it, whatever the optimizer does with
    // filter/projection ordering.
    def guardN(df: DataFrame): DataFrame = df.withColumn("__N",
      when(col("__n0") > maxTouches,
        raise_error(concat(lit("attributionShapley: a conversion window " +
          s"holds more than maxTouches=$maxTouches touches ("),
          col("__n0"), lit(") — raise maxTouches"))).cast("long"))
        .otherwise(col("__n0")))
    def wsum(ch: String): Column = aggregate(
      sequence(lit(1), col("__N").cast("int")),
      lit(0L),
      (acc, k) => acc + coalesce(
        when(element_at(col("__st"), k).getField("label") === ch,
          element_at(wmap,
            concat_ws("_", col("__N").cast("string"), k.cast("string")))),
        lit(0L)))
    def emit(c: Column): Column = { val r = round(c, 6); when(r > 0, r) }
    val credits = channels.map { ch =>
      ch -> emit(when(col("__N") > 0,
        value * (wsum(ch).cast("double") / lit(1.0e18))))
    }
    val perConv = guardN(base.filter(isConversion && ts.isNotNull))
    val entries = credits.map { case (c, cr) =>
      struct(lit(c).as("channel"), cr.as("credit"))
    } :+ struct(lit("(none)").as("channel"),
      when(col("__N") === 0, coalesce(round(value, 6), lit(0.0)))
        .as("credit"))
    perConv
      .select(explode(array(entries: _*)).as("__e"))
      .filter(col("__e.credit").isNotNull)
      .groupBy(col("__e.channel").as("channel"))
      .agg(count(lit(1)).as("conversions"),
        sum(col("__e.credit").cast(org.apache.spark.sql.types.DecimalType(20, 6)))
          .cast(org.apache.spark.sql.types.DoubleType).as("credit"))
      .orderBy("channel")
  }

  /** First-order Markov TRANSITION MATRIX over touch journeys — the
    * substrate of data-driven attribution ([[attributionMarkov]]).
    *
    * Journey semantics: per user, events ordered by (ts, tie); each
    * conversion CLOSES the journey containing the touches before it
    * (the next touch starts a fresh journey). States: `(start)` opens
    * every journey, each touch is its channel label, a closing
    * conversion is `(conv)`, and a journey whose last event is a touch
    * (never converted) closes with `(null)`. Consecutive same-channel
    * touches keep their self-loop (standard first-order counting).
    * Output: (from_state, to_state, n) — exact integer counts.
    *
    * Scale shape: ONE user-key shuffle. The journey id is a running
    * prior-conversion count (window), the from-state is lag(state)
    * within (user, journey), and the `(null)` terminals come from the
    * SAME sorted pass (a journey-partitioned max-order check) — three
    * window functions over one partitioning, collapsing to one sort.
    * The (from, to) count agg output is bounded by (channels+2)². */
  def markovTransitions(events: DataFrame, user: Column, ts: Column,
                        tie: Column, isConversion: Column, isTouch: Column,
                        touchLabel: Column): DataFrame = {
    val e = events
      .filter(((isTouch && touchLabel.isNotNull) || isConversion) &&
        ts.isNotNull)
      .select(user.as("__u"), ts.as("__ts"), tie.as("__tie"),
        isConversion.as("__conv"),
        when(isConversion, "(conv)")
          .otherwise(touchLabel.cast("string")).as("__st"))
    val wOrd = Window.partitionBy(col("__u")).orderBy(col("__ts"), col("__tie"))
    // Journey = count of conversions STRICTLY BEFORE the row, so a
    // conversion row stays in the journey it closes.
    val withJ = e.withColumn("__j",
      coalesce(sum(when(col("__conv"), 1L).otherwise(0L))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val wJ = Window.partitionBy(col("__u"), col("__j"))
      .orderBy(col("__ts"), col("__tie"))
    val steps = withJ
      .withColumn("__from", coalesce(lag(col("__st"), 1).over(wJ),
        lit("(start)")))
      .withColumn("__rn", row_number().over(wJ))
      .withColumn("__last",
        col("__rn") === count(lit(1)).over(
          Window.partitionBy(col("__u"), col("__j"))))
    // Each row contributes its (from → state) step, plus a terminal
    // (state → (null)) when it ends a never-converted journey.
    steps
      .select(explode(array(
        struct(col("__from").as("f"), col("__st").as("t")),
        struct(col("__st").as("f"),
          when(col("__last") && !col("__conv"), "(null)").as("t"))))
        .as("__e"))
      .filter(col("__e.t").isNotNull)
      .groupBy(col("__e.f").as("from_state"), col("__e.t").as("to_state"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_state", "to_state")
  }

  /** Exact rational q = num/den over BigInt — the absorption solve in
    * [[attributionMarkov]] runs in EXACT arithmetic so the report is
    * deterministic to the last bit on any machine. */
  private final case class Rat(num: BigInt, den: BigInt) {
    require(den != 0)
    def norm: Rat = {
      val s = if (den < 0) -1 else 1
      val g = num.gcd(den)
      if (g == 0) Rat(0, 1) else Rat(s * num / g, s * den / g)
    }
    def +(o: Rat) = Rat(num * o.den + o.num * den, den * o.den).norm
    def -(o: Rat) = Rat(num * o.den - o.num * den, den * o.den).norm
    def *(o: Rat) = Rat(num * o.num, den * o.den).norm
    def /(o: Rat) = Rat(num * o.den, den * o.num).norm
    def toDouble: Double = BigDecimal(num) ./ (BigDecimal(den)) match {
      case d => d.toDouble
    }
  }
  private object Rat { val Zero = Rat(0, 1); val One = Rat(1, 1) }

  /** Absorption probability P(reach `(conv)` from `(start)`) of the
    * transition-count chain, with every state in `removed` forced to 0
    * (the removal-effect counterfactual: paths through a removed
    * channel simply die). Exact Gaussian elimination over rationals on
    * the BOUNDED (channels+2)-state system. */
  private def absorption(trans: Seq[(String, String, Long)],
                         removed: Set[String]): Rat = {
    val froms = trans.groupBy(_._1)
    val states = trans.flatMap(t => Seq(t._1, t._2)).distinct
      .filterNot(s => s == "(conv)" || s == "(null)" || removed(s))
      .sorted
    if (!states.contains("(start)")) return Rat.Zero
    val n = states.size
    val ix = states.zipWithIndex.toMap
    // p(s) = Σ_t P(s,t)·p(t); p(conv)=1, p(null)=0, p(removed)=0.
    // Rows: p(s) − Σ_{t transient} P(s,t)·p(t) = P(s,conv).
    val a = Array.fill(n, n + 1)(Rat.Zero)
    for ((s, i) <- states.zipWithIndex) {
      a(i)(i) = Rat.One
      val out = froms.getOrElse(s, Seq.empty)
      val tot = out.map(_._3).sum
      if (tot > 0) for ((_, t, c) <- out) {
        val p = Rat(c, tot)
        if (t == "(conv)") a(i)(n) = a(i)(n) + p
        else ix.get(t).foreach(j => a(i)(j) = a(i)(j) - p)
      }
    }
    // Gaussian elimination with partial (first-nonzero) pivoting —
    // exact rationals need no numeric pivot choice.
    for (c0 <- 0 until n) {
      val pr = (c0 until n).find(r => a(r)(c0).num != 0)
        .getOrElse(return Rat.Zero) // singular: start can't reach conv
      val tmp = a(c0); a(c0) = a(pr); a(pr) = tmp
      val piv = a(c0)(c0)
      for (k <- c0 to n) a(c0)(k) = a(c0)(k) / piv
      for (r <- 0 until n if r != c0 && a(r)(c0).num != 0) {
        val f = a(r)(c0)
        for (k <- c0 to n) a(r)(k) = a(r)(k) - f * a(c0)(k)
      }
    }
    a(ix("(start)"))(n)
  }

  /** Data-driven (Markov removal-effect) ATTRIBUTION: build the
    * first-order journey chain ([[markovTransitions]]), solve the
    * absorption probability P(convert) EXACTLY, then per channel the
    * REMOVAL EFFECT r_c = (P − P(chain without c)) / P — how much of
    * the conversion probability that channel's presence carries — and
    * the normalized credit share r_c / Σ r. Output: (channel,
    * removal_effect, credit_share), 6dp, ordered.
    *
    * Scale shape: the heavy lifting is [[markovTransitions]]' one
    * user-key shuffle; the (channels+2)² count matrix is a BOUNDED
    * driver collect (same contract as the ANN centroid collects), and
    * the per-channel solves are driver-side exact-rational Gaussian
    * eliminations on a ≤(channels+2)-state system — microseconds, and
    * bit-deterministic on any machine (no float linear algebra). */
  def attributionMarkov(events: DataFrame, user: Column, ts: Column,
                        tie: Column, isConversion: Column, isTouch: Column,
                        touchLabel: Column): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val trans = markovTransitions(events, user, ts, tie, isConversion,
      isTouch, touchLabel)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq
    val channels = trans.flatMap(t => Seq(t._1, t._2))
      .filterNot(Set("(start)", "(conv)", "(null)")).distinct.sorted
    val p = absorption(trans, Set.empty)
    val rows =
      if (p.num == 0) channels.map(c => (c, 0.0, 0.0))
      else {
        val effects = channels.map { c =>
          c -> ((p - absorption(trans, Set(c))) / p)
        }
        val tot = effects.map(_._2).foldLeft(Rat.Zero)(_ + _)
        effects.map { case (c, r) =>
          val share = if (tot.num == 0) Rat.Zero else r / tot
          (c, round6(r), round6(share))
        }
      }
    rows.toDF("channel", "removal_effect", "credit_share")
      .orderBy("channel")
  }

  /** Half-even-free 6dp rounding of an exact rational: scale by 10^6,
    * divide with HALF_UP (round-half-away for the positive values these
    * reports produce), back to double — matches Spark's `round`. */
  private def round6(r: Rat): Double = {
    val scaled = r.num * BigInt(1000000)
    val q = BigDecimal(scaled) / BigDecimal(r.den)
    (q.setScale(0, BigDecimal.RoundingMode.HALF_UP) / BigDecimal(1000000))
      .toDouble
  }
}
