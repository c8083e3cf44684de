package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Lexical retrieval scoring — the classic ranking function a
  * training-data pipeline uses for hard-negative mining over TEXT
  * (the [[Similarity]] module's embedding miners' lexical twin),
  * retrieval-augmented data curation, and dedup triage.
  */
object Retrieval {

  /** Okapi BM25 top-k: score every (query, doc) pair sharing at least
    * one term and keep each query's k best.
    *
    *   score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
    *   idf(t)      = ln((N − df + 0.5)/(df + 0.5) + 1)    (the Lucene form —
    *                 always positive, no negative-idf clamp needed)
    *
    * over DISTINCT query terms (the standard short-query convention:
    * query-side tf is ignored). k1/b arrive in hundredths (defaults
    * 1.2/0.75 — the textbook constants).
    *
    * Determinism contract: idf rounds to 6dp (absorbing ln() last-ulp
    * drift); each term's contribution is one fixed-shape IEEE tree over
    * exact-integer inputs (tf, dl, N, df are counts; avgdl is one
    * divide of exact longs) rounded to 6dp; per-(query, doc) totals sum
    * as exact decimals — bit-identical on any engine or partitioning,
    * ties on the doc id.
    *
    * Shape at 100 TB: corpus term stats are two combine-enabled aggs
    * (term-frequency and doc-length); df is an agg over the tf table's
    * 32-byte-ish keys; N/avgdl ride in as a broadcast single-row agg;
    * the QUERY term set broadcasts, so scoring joins prune the tf table
    * to the query vocabulary and the corpus never shuffles for the
    * search; the close is one combine-enabled (query, doc) agg and a
    * per-query top-k window over only the matched candidates. */
  def bm25TopK(queries: DataFrame, corpus: DataFrame, k: Int,
               qId: String = "q_id", qText: String = "q_text",
               cId: String = "doc_id", cText: String = "text",
               k1Hundredths: Int = 120, bHundredths: Int = 75): DataFrame = {
    require(k >= 1, "need k >= 1")
    require(k1Hundredths >= 0, "k1 must be >= 0")
    require(bHundredths >= 0 && bHundredths <= 100, "b must be in [0, 1]")
    val k1 = k1Hundredths / 100.0
    val b = bHundredths / 100.0
    def terms(c: Column): Column = split(lower(c), " ")
    val words = corpus.select(col(cId), explode(terms(col(cText))).as("__t"))
    val tf = words.groupBy(col(cId), col("__t")).agg(count(lit(1)).as("__tf"))
    val dl = words.groupBy(col(cId)).agg(count(lit(1)).as("__dl"))
    val dfT = tf.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    val stats = corpus.agg(count(lit(1)).as("__n"))
      .crossJoin(broadcast(dl.agg(sum(col("__dl")).as("__tl"))))
      .withColumn("__avgdl",
        col("__tl").cast(DoubleType) / col("__n").cast(DoubleType))
      .select(col("__n"), col("__avgdl"))
    val qt = queries.select(col(qId),
      explode(array_distinct(terms(col(qText)))).as("__t"))
    val idf = round(log(
      (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5) + 1), 6)
    val denom = col("__tf").cast(DoubleType) +
      lit(k1) * (lit(1 - b) + lit(b) * (col("__dl").cast(DoubleType) / col("__avgdl")))
    val term = round(
      idf * (col("__tf").cast(DoubleType) * lit(k1 + 1)) / denom, 6)
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy(col(qId)).orderBy(col("score").desc, col(cId))
    tf.join(broadcast(qt), Seq("__t"))
      .join(dfT, Seq("__t"))
      .join(dl, Seq(cId))
      .crossJoin(broadcast(stats))
      .withColumn("__s", term.cast(DecimalType(25, 6)))
      .groupBy(col(qId), col(cId))
      .agg(round(sum(col("__s")).cast(DoubleType), 6).as("score"),
        count(lit(1)).as("n_terms"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("score"), col("n_terms"), col("rank"))
  }

  /** Recall@k of one ranking against another — the evaluation operator
    * behind every ANN/retrieval quality claim in this library, as a
    * first-class query instead of a spec-only number: per query,
    * |result@k ∩ truth@k| / |truth@k|. Both inputs are ranking tables
    * (qId, cId, …, rank); rows past `k` are ignored on both sides, and
    * queries absent from `result` score 0 (a search that returned
    * nothing has recall 0, not a missing row). Exact integer quotient
    * rounded 6dp; two bounded (≤ queries × k row) tables, one key
    * join, one per-query agg — trivially broadcastable at any corpus
    * size because the CORPUS is already gone by this stage. */
  def recallAtK(result: DataFrame, truth: DataFrame, k: Int,
                qId: String = "q_id", cId: String = "vec_id"): DataFrame = {
    require(k >= 1, "need k >= 1")
    val t = truth.filter(col("rank") <= k).select(col(qId), col(cId))
    val r = result.filter(col("rank") <= k).select(col(qId), col(cId))
      .withColumn("__hit", lit(1))
    t.join(r, Seq(qId, cId), "left")
      .groupBy(col(qId))
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("__hit"), lit(0))).as("n_hit"))
      .withColumn("recall", round(
        col("n_hit").cast(DoubleType) / col("n_truth"), 6))
  }

  /** Reciprocal rank@k — [[recallAtK]]'s order-sensitive companion:
    * per query, 1/rank of the FIRST result row whose id appears in
    * truth@k (the metric that rewards putting a right answer on top,
    * where recall treats all k slots alike). Queries present in truth
    * but never hit score 0 with a NULL first_hit_rank. Same two
    * bounded ranking tables, one join, one min agg; 1/rank is one
    * correctly-rounded IEEE divide, 6dp-rounded. Averaging the `rr`
    * column gives MRR. */
  def reciprocalRankAtK(result: DataFrame, truth: DataFrame, k: Int,
                        qId: String = "q_id",
                        cId: String = "vec_id"): DataFrame = {
    require(k >= 1, "need k >= 1")
    val t = truth.filter(col("rank") <= k).select(col(qId), col(cId))
    val hits = result.filter(col("rank") <= k)
      .select(col(qId), col(cId), col("rank"))
      .join(t, Seq(qId, cId), "left_semi")
      .groupBy(col(qId)).agg(min(col("rank")).as("first_hit_rank"))
    truth.select(col(qId)).distinct()
      .join(hits, Seq(qId), "left")
      .withColumn("rr", when(col("first_hit_rank").isNotNull,
        round(lit(1.0) / col("first_hit_rank"), 6)).otherwise(lit(0.0)))
  }

  /** Binary-relevance nDCG@k — position-weighted quality between
    * [[recallAtK]] (position-blind) and [[reciprocalRankAtK]]
    * (first-hit-only): DCG = Σ_{hits} 1/log2(rank+1) over the result's
    * hit positions, normalized by the ideal DCG of min(|truth@k|, k)
    * consecutive top ranks, so a perfect ordering scores 1 regardless
    * of truth size. Numeric contract: each position's discount rounds
    * to 6dp (absorbing log() last-ulp drift — and making the ideal
    * table an exact driver-side constant the oracle can inline), sums
    * run as exact decimals, one final rounded divide. */
  /** The 6dp position discounts / ideal-DCG prefix sums [[ndcgAtK]]
    * inlines — public so an oracle generator shares the exact
    * constants instead of re-deriving them. */
  def ndcgDiscounts(k: Int): Seq[Double] = (1 to k)
    .map(r => math.rint(1e6 / (math.log(r + 1.0) / math.log(2.0))) / 1e6)
  def ndcgIdeals(k: Int): Seq[Double] = ndcgDiscounts(k)
    .scanLeft(0.0)((acc, d) => (BigDecimal(acc) + BigDecimal(d)).toDouble).tail

  def ndcgAtK(result: DataFrame, truth: DataFrame, k: Int,
              qId: String = "q_id", cId: String = "vec_id"): DataFrame = {
    require(k >= 1, "need k >= 1")
    import org.apache.spark.sql.types.DecimalType
    // discount(r) = round(1/log2(r+1), 6) for r = 1..k, driver-computed
    // once — identical constants on every engine by construction.
    val disc: Seq[Double] = ndcgDiscounts(k)
    val ideal: Seq[Double] = ndcgIdeals(k)
    val discCol = element_at(typedlit(disc), col("rank").cast("int"))
    val idealCol = element_at(typedlit(ideal),
      least(col("n_truth"), lit(k)).cast("int"))
    val t = truth.filter(col("rank") <= k).select(col(qId), col(cId))
    val nTruth = t.groupBy(col(qId)).agg(count(lit(1)).as("n_truth"))
    val dcg = result.filter(col("rank") <= k)
      .select(col(qId), col(cId), col("rank"))
      .join(t, Seq(qId, cId), "left_semi")
      .groupBy(col(qId))
      .agg(sum(discCol.cast(DecimalType(18, 6))).as("__dcg"))
    nTruth.join(dcg, Seq(qId), "left")
      .withColumn("ndcg", round(
        coalesce(col("__dcg").cast(org.apache.spark.sql.types.DoubleType),
          lit(0.0)) / idealCol, 6))
      .select(col(qId), col("n_truth"), col("ndcg"))
  }
}
