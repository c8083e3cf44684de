package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DecimalType, DoubleType, StringType}

/** Learned quality-classifier INFERENCE (north-star extension; no
  * reference counterpart): the fastText shape — hashed word-n-gram
  * features into a fixed bucket space, a linear model over the bucket
  * weights, a sigmoid — run as pure map-side Spark SQL. This is the
  * third standard quality leg next to heuristic rules
  * ([[TextAnalysis]]'s Gopher bounds) and LM perplexity
  * ([[TextAnalysis.perplexity]]): score every document with a model
  * TRAINED ELSEWHERE (the CCNet/fastText quality-classifier recipe;
  * Joulin et al. 2016, "Bag of Tricks for Efficient Text
  * Classification" — feature hashing + linear head is the whole
  * inference).
  *
  * Shape at 100 TB: the weight table is ≤ `buckets` rows — a model
  * artifact, driver-bounded like every budget map in this library —
  * and BROADCASTS to a map-side hash join on the bucket id; scoring is
  * explode → hash → join → one combine-enabled per-doc agg. The corpus
  * never shuffles for the model; the only wide exchange is the per-doc
  * agg every scorer pays.
  *
  * Determinism contract (the [[Sampling.importanceWeights]]
  * convention): buckets come from the repo's portable md5 wheel
  * ([[Sampling.hashBucket]] — bit-for-bit replayable in the oracle's
  * SQL), weights are exact 6dp decimals so the per-doc dot product is
  * an EXACT decimal sum (word order and partitioning cannot move it),
  * and only the last step — mean, bias, sigmoid — runs in doubles,
  * each rounded to 6dp to absorb last-ulp exp() disagreement. */
object Classify {

  /** Feature terms of a document: lowercased whitespace unigrams plus
    * adjacent-word bigrams (joined by one space) — the fastText
    * wordNgrams=2 feature set. A doc of W words emits 2W−1 terms
    * (W ≥ 2), W terms otherwise. */
  def terms(text: Column): Column = {
    val ws = split(lower(text), " ")
    // sequence(1, 0) would run BACKWARDS (the gramInstances guard) —
    // single-word docs get an empty bigram array instead.
    val bi = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat(element_at(ws, i), lit(" "), element_at(ws, i + 1))))
      .otherwise(array().cast(ArrayType(StringType)))
    concat(ws, bi)
  }

  /** Score every document with a hashed-n-gram linear classifier.
    *
    * `weights` is the model: (bucket long, weight decimal-exact 6dp),
    * ≤ `buckets` rows, absent buckets meaning weight 0 (a dense hashed
    * model stored sparsely — the fastText artifact shape). Output per
    * doc: `n_feats` (term instances), `logit` = round(bias +
    * dot/n_feats, 6), `prob` = round(sigmoid(logit), 6), `label` =
    * 'keep' iff prob ≥ `threshold`.
    *
    * Docs with NULL text emit nothing (no evidence — the repo's
    * perplexity convention); empty text scores on the single empty
    * term (deterministic, documented, harmless). */
  def scoreLinear(df: DataFrame, docKey: String, textCol: String,
                  weights: DataFrame, buckets: Int, bias: Double,
                  threshold: Double = 0.5,
                  salt: String = "qcls"): DataFrame = {
    require(buckets >= 1, s"need at least one feature bucket, got $buckets")
    val wt = weights.select(col("bucket").as("__b"),
      col("weight").cast(DecimalType(18, 6)).as("__w"))
    df.select(col(docKey), explode(terms(col(textCol))).as("__t"))
      .withColumn("__b", Sampling.hashBucket(col("__t"), buckets, salt))
      .join(broadcast(wt), Seq("__b"), "left")
      .groupBy(col(docKey))
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("__w"), lit(0).cast(DecimalType(18, 6)))).as("__dot"))
      .withColumn("logit", round(
        lit(bias) + col("__dot").cast(DoubleType) / col("n_feats"), 6))
      .withColumn("prob",
        round(lit(1.0) / (lit(1.0) + exp(-col("logit"))), 6))
      .withColumn("label",
        when(col("prob") >= threshold, lit("keep")).otherwise(lit("drop")))
      .select(col(docKey), col("n_feats"), col("logit"), col("prob"),
        col("label"))
  }

  /** UNCERTAINTY sampling over [[scoreLinear]] output — the active-
    * learning draw: the k docs whose probability sits closest to the
    * decision boundary (margin = |prob − 0.5|, 6dp) are the ones a
    * labeling pass should see first — they move the model most per
    * label, and they are exactly where the broadcast model disagrees
    * with itself. Deterministic: margin ties break on the doc key.
    * Runs as TakeOrderedAndProject — a per-partition k-heap + merge,
    * never a full sort (the bounded-k discipline every draw in this
    * library follows). */
  def mostUncertain(scored: DataFrame, docKey: String, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    scored.withColumn("margin", round(abs(col("prob") - 0.5), 6))
      .orderBy(col("margin").asc, col(docKey))
      .limit(k)
  }

  /** Score-distribution DRIFT between two corpus slices — the
    * Population Stability Index over fixed-width probability bins,
    * the standard model-monitoring number ("has the score
    * distribution my gate sees moved since calibration?"). Per bin b:
    * contrib_b = (share_a(b) − share_b(b)) · ln(share_a(b)/share_b(b)),
    * shares add-one smoothed over the bin spine so empty bins stay
    * finite; PSI = Σ contrib (< 0.1 stable, 0.1–0.25 drifting, > 0.25
    * act — the industry rule of thumb). Returns one row per bin with
    * counts, 6dp shares and 6dp contribution (the total is the sum —
    * derivable, so it does not ship as a duplicated column).
    *
    * Shape: two combine-enabled bin aggs (≤ `bins` rows each) joined
    * on a Range spine with broadcast single-row totals — nothing
    * corpus-sized moves. Deterministic: integer counts, exact-integer
    * IEEE divides, ln 6dp-rounded. */
  def scoreDrift(a: DataFrame, b: DataFrame, valueCol: String,
                 bins: Int): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    val spark = a.sparkSession
    def binned(d: DataFrame, n: String): DataFrame = d
      .select(least(floor(col(valueCol) * bins), lit(bins - 1))
        .cast("int").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as(n))
    val ca = binned(a, "n_a")
    val cb = binned(b, "n_b")
    val ta = ca.agg(sum(col("n_a")).as("__ta"))
    val tb = cb.agg(sum(col("n_b")).as("__tb"))
    val spine = spark.range(bins.toLong).select(col("id").cast("int").as("bin"))
    val sa = (coalesce(col("n_a"), lit(0L)) + 1).cast(DoubleType) /
      (col("__ta") + bins).cast(DoubleType)
    val sb = (coalesce(col("n_b"), lit(0L)) + 1).cast(DoubleType) /
      (col("__tb") + bins).cast(DoubleType)
    spine
      .join(ca, Seq("bin"), "left")
      .join(cb, Seq("bin"), "left")
      .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        round(sa, 6).as("share_a"),
        round(sb, 6).as("share_b"),
        round((sa - sb) * log(sa / sb), 6).as("psi_contrib"))
  }

  /** [[scoreDrift]]'s CATEGORICAL twin: PSI over a label/category
    * column between two slices (the monitoring check for "did the
    * event-type / language / source mix shift between snapshots").
    * Same Laplace smoothing with k = |category union| standing in for
    * the bin count, so empty-on-one-side categories contribute a
    * finite, well-defined term instead of ±∞. Two combine-enabled
    * count aggs on a bounded category key + a bounded full-outer join;
    * totals and k ride as broadcast single-row aggs. */
  def categoryDrift(a: DataFrame, b: DataFrame, catCol: String): DataFrame = {
    def counts(d: DataFrame, n: String): DataFrame =
      d.select(col(catCol).cast("string").as("category"))
        .groupBy("category").agg(count(lit(1)).as(n))
    val ca = counts(a, "n_a")
    val cb = counts(b, "n_b")
    val joined = ca.join(cb, Seq("category"), "full")
    val k = joined.agg(count(lit(1)).as("__k"))
    val ta = ca.agg(sum(col("n_a")).as("__ta"))
    val tb = cb.agg(sum(col("n_b")).as("__tb"))
    val sa = (coalesce(col("n_a"), lit(0L)) + 1).cast(DoubleType) /
      (col("__ta") + col("__k")).cast(DoubleType)
    val sb = (coalesce(col("n_b"), lit(0L)) + 1).cast(DoubleType) /
      (col("__tb") + col("__k")).cast(DoubleType)
    joined.crossJoin(broadcast(k))
      .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
      .select(col("category"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        round(sa, 6).as("share_a"),
        round(sb, 6).as("share_b"),
        round((sa - sb) * log(sa / sb), 6).as("psi_contrib"))
  }

  /** Deterministic DEMO weight table: weight(b) = round(u(b) − 0.5, 6)
    * with u(b) the md5-derived uniform of (b || salt) — a fixed
    * pseudo-random model both engines regenerate bit-for-bit, standing
    * in for trained weights loaded from parquet. Production use: train
    * offline, write (bucket, weight) parquet, pass it to
    * [[scoreLinear]] unchanged. */
  def fixtureWeights(spark: SparkSession, buckets: Int,
                     salt: String = "qcls:w"): DataFrame = {
    require(buckets >= 1, s"need at least one bucket, got $buckets")
    spark.range(buckets.toLong).select(col("id").as("bucket"),
      round(
        conv(substring(md5(concat(col("id").cast("string"), lit(salt))), 1, 8),
          16, 10).cast("long").cast(DoubleType) / lit(4294967296.0) - lit(0.5),
        6).cast(DecimalType(18, 6)).as("weight"))
  }
}
