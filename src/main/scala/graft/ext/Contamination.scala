package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection (north-star extension; no reference
  * counterpart): find training documents that share n-gram shingles with
  * an evaluation/benchmark set — the decontamination pass every serious
  * training-data pipeline runs before a model sees the corpus.
  *
  * Shape: explode DISTINCT shingles on both sides → equi-join on the
  * shingle → count distinct shared shingles per (train, bench) pair.
  * Never a text-vs-text cross product: the join key is the shingle, so
  * cost is proportional to actual shingle collisions. Two skew guards
  * make this survive 100 TB:
  *
  *  - The BENCH side drops shingles that appear in more than
  *    `maxShingleDf` benchmark documents before the join. Ubiquitous
  *    shingles ("of the united states") are exactly the ones that explode
  *    the join (hot-key skew) and exactly the ones that signal nothing —
  *    the standard df-cap from published decontamination setups.
  *  - The bench side after the cap is (shingle, bench_id) pairs bounded
  *    by |bench| × shingles/doc — benchmark sets are small by
  *    construction, so Spark's planner (or an explicit broadcast at the
  *    call site) turns the join map-side: the 100 TB train side never
  *    shuffles.
  */
object Contamination {

  /** The df-capped bench-side shingle table (bench_id, __sh) — the
    * STATIC half of the detection join, split out so a caller with a
    * fixed benchmark set (a nightly job, the streaming sink) computes it
    * ONCE and reuses it across arbitrarily many train slices, instead of
    * re-exploding and re-capping the benchmark per call. Bounded by
    * |bench| × shingles/doc — small by construction. */
  def cappedBenchShingles(bench: DataFrame, docKey: String, textCol: String,
                          n: Int, maxShingleDf: Int): DataFrame = {
    require(n >= 1, "shingle width must be >= 1")
    require(maxShingleDf >= 1, "maxShingleDf must be >= 1")
    val benchSh = bench.select(col(docKey).as("bench_id"),
      explode(array_distinct(Dedup.shingles(col(textCol), n))).as("__sh"))
    // df-cap as a count window over the shingle: ONE shingle-key shuffle
    // serves both the count and the filter (a groupBy + join back would
    // shuffle the bench shingles twice).
    benchSh.withColumn("__df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("__sh"))))
      .filter(col("__df") <= maxShingleDf).drop("__df")
  }

  /** (train_id, bench_id, hits) for every train/bench pair sharing at
    * least `minHits` distinct n-gram shingles, after the bench-side
    * df-cap. Train docs present in the bench set are excluded (a doc
    * cannot contaminate itself). */
  def contaminatedPairs(train: DataFrame, bench: DataFrame,
                        docKey: String, textCol: String,
                        n: Int, minHits: Int, maxShingleDf: Int): DataFrame =
    contaminatedPairsAgainst(train,
      cappedBenchShingles(bench, docKey, textCol, n, maxShingleDf),
      docKey, textCol, n, minHits)

  /** `contaminatedPairs` with the capped bench shingle table SUPPLIED —
    * the reuse form ([[cappedBenchShingles]]). `benchShingles` must be
    * that function's output (same docKey text, same n, cap applied). */
  def contaminatedPairsAgainst(train: DataFrame, benchShingles: DataFrame,
                               docKey: String, textCol: String,
                               n: Int, minHits: Int): DataFrame = {
    require(n >= 1, "shingle width must be >= 1")
    require(minHits >= 1, "minHits must be >= 1")
    val trainSh = train.select(col(docKey).as("train_id"),
      explode(array_distinct(Dedup.shingles(col(textCol), n))).as("__sh"))
    // The capped bench side is |bench| × shingles/doc rows — small by
    // construction (benchmark sets are), so broadcast it: the train
    // side's exploded shingles stream map-side through the join and the
    // only shuffle left is the per-pair count's partial agg.
    trainSh.join(broadcast(benchShingles), "__sh")
      .filter(col("train_id") =!= col("bench_id"))
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("hits"))   // shingles are distinct per side
      .filter(col("hits") >= minHits)
  }

  /** Cross-corpus overlap statistic: exact Jaccard + per-side containment
    * between two corpora's content-fingerprint sets — the one-number
    * leakage check a pipeline runs between train and held-out splits (or
    * between two crawl snapshots) before the per-document contamination
    * pass is worth its cost.
    *
    * Shape: md5 content fingerprints tagged per side and unioned, then
    * ONE fingerprint-key shuffle (groupBy fp → per-side presence via max,
    * which also absorbs within-side duplicates — an explicit per-side
    * distinct would add a shuffle per side for nothing; the partial max
    * is the same map-side dedup) and a 1-row closing aggregate. No join,
    * no cross product; at 100 TB both sides stream through the same
    * combine-enabled aggregation. Counts are exact longs; the three
    * ratios are single IEEE divides rounded 6dp — bit-identical
    * cross-engine. */
  def corpusOverlap(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def fps(df: DataFrame, tag: Int) =
      df.select(md5(col(textCol)).as("fp"), lit(tag).as("__side"))
    fps(a, 0).union(fps(b, 1))
      .groupBy(col("fp"))
      .agg(max(when(col("__side") === 0, 1).otherwise(0)).as("in_a"),
        max(when(col("__side") === 1, 1).otherwise(0)).as("in_b"))
      .agg(sum(col("in_a")).as("n_a"), sum(col("in_b")).as("n_b"),
        sum(col("in_a") * col("in_b")).as("n_both"))
      .select(col("n_a"), col("n_b"), col("n_both"),
        round(col("n_both") / (col("n_a") + col("n_b") - col("n_both")), 6)
          .as("jaccard"),
        round(col("n_both") / col("n_a"), 6).as("containment_a"),
        round(col("n_both") / col("n_b"), 6).as("containment_b"))
  }

  /** KMV-estimated PAIRWISE source overlap — the cross-source
    * similarity matrix at sketch cost: per source, the k smallest
    * distinct shingle hashes form a bottom-k (KMV) sketch; a pair's
    * Jaccard estimate is the both-sources fraction of the k smallest
    * hashes of the sketch UNION (the standard bottom-k estimator, SE ≈
    * 1/√k). At 100 TB the sketches are sources×k rows of metadata
    * where the exact answer needs the full pairwise shingle join —
    * this op emits BOTH (the exact value is the test-scale referee,
    * the [[graft.ops.Cardinality]] sketch-contract convention) plus an
    * `est_ok` flag asserting the estimate sits within 3/√k of exact.
    *
    * Plan: one distinct (source, hash) shuffle feeds the exact sizes,
    * the exact intersections (h-keyed self-join — cost is actual
    * collisions, never source × source rows), and the per-source rank
    * window; everything after is bounded by sources² × k. The
    * per-source rank window sorts within each source — at billions of
    * distinct shingles per source, swap in a per-partition k-heap +
    * merge (TakeOrdered per group); the estimator is unchanged. */
  def sourceOverlapKmv(docs: DataFrame, sourceCol: String, textCol: String,
                       n: Int = 3, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DoubleType
    require(n >= 1 && k >= 8, "need n >= 1 and a sketch of >= 8 mins")
    // Pinned: the (src, h) table feeds FOUR consumers (sizes, both
    // intersection arms, the sketch window) — without the pin each one
    // re-explodes and re-distincts every shingle of the corpus.
    val sh = Dedup.pin(docs.select(col(sourceCol).cast("string").as("src"),
        explode(Dedup.shingles(col(textCol), n)).as("g"))
      .select(col("src"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("h"))
      .distinct())
    val sizes = sh.groupBy("src").agg(count(lit(1)).as("n"))
    val prs = sizes.select(col("src").as("src_a"), col("n").as("n_a"))
      .join(sizes.select(col("src").as("src_b"), col("n").as("n_b")),
        col("src_a") < col("src_b"))
    val inter = sh.select(col("src").as("src_a"), col("h"))
      .join(sh.select(col("src").as("src_b"), col("h")), Seq("h"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_both"))
    val sk = sh.withColumn("rn",
        row_number().over(Window.partitionBy("src").orderBy("h")))
      .filter(col("rn") <= k).select("src", "h")
    val u = prs.select("src_a", "src_b")
      .join(sk.withColumnRenamed("src", "__s"),
        col("__s") === col("src_a") || col("__s") === col("src_b"))
      .groupBy("src_a", "src_b", "h")
      .agg(max(when(col("__s") === col("src_a"), 1).otherwise(0)).as("ia"),
        max(when(col("__s") === col("src_b"), 1).otherwise(0)).as("ib"))
    val est = u.withColumn("rn", row_number().over(
        Window.partitionBy("src_a", "src_b").orderBy("h")))
      .filter(col("rn") <= k)
      .groupBy("src_a", "src_b")
      .agg((sum(col("ia") * col("ib")).cast(DoubleType) /
        count(lit(1))).as("__je"))
    val bound = 3.0 / math.sqrt(k)
    prs.join(inter, Seq("src_a", "src_b"), "left")
      .join(est, Seq("src_a", "src_b"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        coalesce(col("n_both"), lit(0L)).as("n_both"),
        round(coalesce(col("n_both"), lit(0L)).cast(DoubleType) /
          (col("n_a") + col("n_b") - coalesce(col("n_both"), lit(0L))), 6)
          .as("j_exact"),
        round(col("__je"), 6).as("j_est"))
      .withColumn("est_ok", abs(col("j_est") - col("j_exact")) <= bound)
  }

  /** The decontamination stage itself: drop every training document
    * `contaminatedPairs` flags, keep the rest intact. The flagged-id set
    * is bounded by the benchmark's shingle reach (tiny next to the
    * corpus), so the anti-join broadcasts and the 100 TB train side
    * streams map-side — one projection-only pass over the corpus beyond
    * the detection cost. */
  def decontaminate(train: DataFrame, bench: DataFrame,
                    docKey: String, textCol: String,
                    n: Int, minHits: Int, maxShingleDf: Int): DataFrame =
    decontaminateAgainst(train,
      cappedBenchShingles(bench, docKey, textCol, n, maxShingleDf),
      docKey, textCol, n, minHits)

  /** [[decontaminate]] with the capped bench shingle table SUPPLIED —
    * the reuse form for a fixed benchmark set ([[cappedBenchShingles]];
    * the streaming sink's per-batch call). */
  def decontaminateAgainst(train: DataFrame, benchShingles: DataFrame,
                           docKey: String, textCol: String,
                           n: Int, minHits: Int): DataFrame = {
    val flagged = contaminatedPairsAgainst(train, benchShingles, docKey,
        textCol, n, minHits)
      .select(col("train_id").as(docKey)).distinct()
    train.join(broadcast(flagged), Seq(docKey), "left_anti")
  }
}
