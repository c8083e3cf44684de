package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training-data curation
  * (north-star extension; no reference counterpart).
  *
  * Spark's `sample`/`sampleBy` draw from `rand(seed)`, whose per-row
  * values depend on partition layout — a repartition silently changes the
  * sample. These operators key every decision on a HASH of a stable row
  * key instead: the same row lands in the same bucket on any cluster, any
  * partitioning, any engine (md5 is the repo's portable-hash convention —
  * the DuckDB oracle reproduces buckets bit-for-bit). All map-only
  * codegen'd expressions: zero shuffles, embarrassingly parallel.
  *
  * NULL-key contract (explicit, because the hash of NULL is NULL and
  * three-valued logic decides differently per call): `hashSample` and
  * `stratifiedHashSample` DROP null-keyed rows (a NULL bucket fails the
  * filter — matching SQL WHERE semantics); `splitLabel` assigns them
  * 'test' (the when-chain's otherwise); `samplePerGroup` and
  * `packByBudget` keep them (window partitions treat NULL as a group).
  * Sample keys should be non-null ids; filter or synthesize keys first
  * when they are not.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from a key column: the first 8 md5 hex
    * digits as an integer, mod buckets. 32 bits of hash for bucket counts
    * up to ~10⁵ with <0.01% modulo bias. `salt` decorrelates independent
    * decisions on the same key (e.g. sampling vs split assignment —
    * without it, a 10%-sampled stratum would land entirely in 'train'). */
  /** First 8 md5 hex digits of (key || salt) as a long — the ONE
    * portable 32-bit hash every sampling decision in this module
    * derives from (bucket wheels and A-ES uniforms must stay in
    * lockstep with the oracle's SQL twin of this expression). */
  private def hash32(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long")

  def hashBucket(key: Column, buckets: Int, salt: String = ""): Column = {
    require(buckets >= 1, "need at least one bucket")
    hash32(key, salt) % buckets
  }

  /** Keep a deterministic ~`pct`% of rows by key (0 <= pct <= 100).
    * Repeatable: re-running, resharding, or growing the corpus never
    * flips a previously-kept row (append-only stability). */
  def hashSample(df: DataFrame, key: Column, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct $pct out of [0, 100]")
    df.filter(hashBucket(key, 100) < pct)
  }

  /** Train/val/test assignment by key hash: percentages are cut points on
    * the same 100-bucket wheel, so splits are disjoint, exhaustive, and
    * reproducible anywhere. */
  def splitLabel(key: Column, trainPct: Int, valPct: Int,
                 salt: String = ""): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"train $trainPct + val $valPct must fit in 100 (rest is test)")
    val b = hashBucket(key, 100, salt)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Stratified deterministic sampling: a per-stratum keep-rate (the
    * domain-mixing primitive — upsample curated sources, downsample
    * crawl). Rates are inlined into one when-chain, so this is still a
    * single map-only pass; strata absent from `pctByStratum` fall back to
    * `defaultPct`. */
  def stratifiedHashSample(df: DataFrame, stratum: Column, key: Column,
                           pctByStratum: Map[String, Int],
                           defaultPct: Int): DataFrame = {
    require((pctByStratum.values.toSeq :+ defaultPct).forall(p => p >= 0 && p <= 100),
      "every rate must be in [0, 100]")
    val pct = pctByStratum.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(stratum === s, p).otherwise(acc)
    }
    df.filter(hashBucket(key, 100) < pct)
  }

  /** Exactly-n-per-group deterministic sample: rank rows within each
    * group by the md5 of their key (a stable pseudo-random order — same
    * winners on any cluster, any partitioning) and keep the first `n`.
    * The fixed-COUNT complement to `stratifiedHashSample`'s fixed-RATE
    * sampling: "at most n docs per source" caps a dominant domain no
    * matter how large it grows. One hash shuffle on the group key; the
    * md5 rank order plus the key itself as tiebreak is total, so the
    * sample is unique. */
  def samplePerGroup(df: DataFrame, group: Column, key: Column, n: Int): DataFrame = {
    require(n >= 1, "need n >= 1 rows per group")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(group)
      .orderBy(md5(key.cast("string")), key)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn")
  }

  /** Per-row key for deterministic weighted sampling (Efraimidis–
    * Spirakis "A-ES") in the LOG domain: -ln(u)/w with u a hash-derived
    * uniform in (0, 1] — the k SMALLEST keys are a weighted sample
    * without replacement, inclusion odds scaling with `weight`
    * (u^(1/w) largest ⟺ -ln(u)/w smallest; ln is monotone). The direct
    * u^(1/w) form silently saturates: for w ≳ 10⁶ every 6dp-rounded
    * pow() lands on 1.000000 and "weighted" selection degrades to the
    * key tie-break. In the log domain the numerator -ln(u) spans
    * (0, ~22.18] — full precision at 6dp — and the divide by w is a
    * correctly-rounded IEEE op at ANY weight magnitude, so weight
    * dominance survives w = 10⁹ and beyond (ExtSpec pins w ∈
    * {1, 10⁶, 10⁹}). Rounding the NUMERATOR, not the quotient, is what
    * keeps cross-engine bit-equality without re-introducing the
    * collapse: round(-ln u, 6) absorbs the engines' last-ulp ln()
    * disagreement, the division of identical doubles is exact. Like
    * every decision in this module the draw is a pure function of the
    * key (no rand()); u is exact in both engines: a 32-bit integer + 1
    * divided by 2^32. */
  def weightedSampleKey(key: Column, weight: Column, salt: String = ""): Column = {
    val u = (hash32(key, salt) + lit(1L)).cast("double") / lit(4294967296.0)
    round(-log(u), 6) / weight.cast("double")
  }

  /** Keep a deterministic weighted sample of `k` rows: heavier rows
    * proportionally likelier, selection reproducible on any cluster or
    * partitioning. Runs as TakeOrderedAndProject (a per-partition
    * k-heap + merge), never a full sort — the 100 TB shape for a
    * bounded-k draw; the k SMALLEST log-domain keys win. Rows with
    * NULL, non-positive, or NaN weight cannot be drawn and are dropped
    * (NaN compares GREATER than every number in Spark's ordering, so
    * without the explicit guard a single NaN-weight row — a 0/0
    * quality score, say — would pass `> 0`, score a NaN key, and under
    * the former descending order crowd out the whole sample; ascending
    * order would instead never draw it, but the guard keeps the
    * contract explicit either way). */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int,
                     salt: String = ""): DataFrame = {
    require(k >= 1, "need k >= 1")
    df.filter(weight.isNotNull && weight > 0 && !isnan(weight.cast("double")))
      .withColumn("__wkey", weightedSampleKey(key, weight, salt))
      .orderBy(col("__wkey").asc, key)
      .limit(k)
      .drop("__wkey")
  }

  /** Sequence packing: assign each doc a (shard, pack_id) such that docs
    * sharing a pack fit a token budget — the batching step that turns a
    * curated corpus into fixed-size training sequences.
    *
    * True bin packing is inherently sequential; the scalable form shards
    * the corpus by key hash (shards = the parallelism knob, each shard
    * packs independently), orders each shard by the same stable hash
    * (deterministic on any cluster), and cuts packs at running-token-sum
    * boundaries: pack_id = floor(exclusive-prefix-sum / budget). A pack's
    * sum exceeds `budget` only by (part of) its final doc — the standard
    * first-fit-in-fixed-order approximation; downstream truncation or
    * overflow-splitting handles the boundary doc, and a doc longer than
    * the whole budget still gets a pack (its own).
    *
    * One shuffle on the shard key; the window order is total (hash, key),
    * so pack membership is reproducible under any partitioning — packs
    * are pure functions of the corpus content, like every sampling
    * decision in this module. */
  /** Pretraining-mixture sampling: select, per source, a deterministic
    * subset of docs whose token mass hits that source's budget — the op
    * that turns "we want 30% wiki, 60% web, 10% code BY TOKENS" into a
    * concrete reproducible document set. Composes `withTokenCount` (or
    * any token column) with the module's hash-ordered selection:
    *
    *  - rows shard by key hash (`shards` = the parallelism knob; a
    *    dominant source — web crawl at 90% of the corpus — would
    *    otherwise serialize one window reducer at 100 TB);
    *  - each (source, shard) gets budget/shards tokens (remainder
    *    spread one token to the first `budget % shards` shards, so the
    *    per-source total is exact);
    *  - within a (source, shard), docs are ordered by (md5(key), key) —
    *    the module's stable pseudo-random total order — and selected
    *    while the EXCLUSIVE running token sum is under the shard
    *    budget: the doc that crosses the boundary is kept, so a shard
    *    overshoots by at most one doc (the standard prefix rule;
    *    first-fit packing's cousin), and a source with fewer tokens
    *    than its budget simply contributes everything (the shortfall is
    *    visible in [[mixtureReport]]).
    *
    * Sources ABSENT from `budgetBySource` are excluded — the map IS the
    * mixture. Selection is a pure function of (key, source, tokens):
    * append-only growth of OTHER sources never flips a decision, and
    * within a source new docs only perturb selections past their hash
    * position. One shuffle on (source, shard). */
  def mixtureByTokenBudget(df: DataFrame, source: Column, key: Column,
                           tokens: Column, budgetBySource: Map[String, Long],
                           shards: Int, salt: String = "mix"): DataFrame = {
    require(shards >= 1, "need at least one shard")
    require(budgetBySource.values.forall(_ >= 0), "budgets must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val budget = budgetBySource.foldLeft(lit(0L)) { case (acc, (s, b)) =>
      when(source === s, b).otherwise(acc)
    }
    val w = Window.partitionBy(col("__msrc"), col("__mshard"))
      .orderBy(md5(key.cast("string")), key)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__msrc", source.cast("string"))
      .withColumn("__mshard", hashBucket(key, shards, salt))
      .withColumn("__mbudget", budget)
      // div, not /: long/long is double division (see packByBudget).
      .withColumn("__mshardBudget",
        expr(s"__mbudget div $shards") +
          when(col("__mshard") < col("__mbudget") % shards, 1L).otherwise(0L))
      .withColumn("__mbefore", coalesce(sum(tokens).over(w), lit(0L)))
      .filter(col("__mbefore") < col("__mshardBudget"))
      .drop("__msrc", "__mshard", "__mbudget", "__mshardBudget", "__mbefore")
  }

  /** Fractional-epoch upsampling — the OTHER half of data mixing:
    * where [[mixtureByTokenBudget]] selects DOWN to a token budget,
    * this repeats a curated source UP ("2.3 epochs of wiki per web
    * epoch"). Epochs are given in integer HUNDREDTHS (230 = 2.30×) so
    * the arithmetic is exact — a Double epochs knob would make copy
    * counts depend on float rounding. Every row gets
    * `floor(bp/100)` full copies plus one extra when its 100-bucket
    * key hash (salt "epoch") lands under `bp % 100` — so a 2.30×
    * source emits 2 copies of ~70% of its docs and 3 of the ~30%
    * hash-selected slice, the SAME slice on any cluster, any
    * partitioning, any rerun. Sources absent from the map keep one
    * copy (epochs 100); 0 drops the source. Output rows carry `copy`
    * (0-based) so downstream shuffling/packing can keep copies apart.
    *
    * Map-only: copies materialize as an explode of a per-row sequence
    * — no shuffle, no join; at 100 TB the op is pure output-volume
    * (Σ epochs × source bytes), which is exactly what upsampling
    * means. */
  def upsampleByEpochs(df: DataFrame, source: Column, key: Column,
                       epochsBpBySource: Map[String, Int]): DataFrame = {
    require(epochsBpBySource.values.forall(_ >= 0), "epochs must be >= 0")
    // `copy` is the emitted output column — a pre-existing one would be
    // silently overwritten; fail loudly instead.
    require(!df.columns.contains("copy"),
      "input already has a copy column — rename it before upsampling")
    val bp = epochsBpBySource.foldLeft(lit(100)) { case (acc, (s, e)) =>
      when(source === s, e).otherwise(acc)
    }
    // sequence(a, b) runs DESCENDING when b < a — guard zero-copy rows
    // out before building the per-row copy list.
    df.withColumn("__bp", bp)
      .withColumn("__copies",
        expr("__bp div 100") +
          when(hashBucket(key, 100, salt = "epoch") < col("__bp") % 100, 1)
            .otherwise(0))
      .filter(col("__copies") >= 1)
      .withColumn("__cp", explode(sequence(lit(1), col("__copies"))))
      .withColumn("copy", col("__cp") - 1)
      .drop("__bp", "__copies", "__cp")
  }

  /** Budgets after ONE shortfall-redistribution pass: any budget a
    * source cannot fill (its whole supply selects and still falls
    * short) is handed pro-rata — by ORIGINAL budget share — to the
    * sources that still have unselected docs, as extra budget.
    * "Has unselected docs" (supply > achieved) is the absorber test,
    * and under the per-(source, shard) budget split it can include a
    * source whose TOTAL budget exceeds its total supply: an uneven
    * hash split leaves one shard's docs unselected while another
    * shard's budget goes spare, and extra budget genuinely adds docs
    * there — so the supply-vs-achieved test, not budget-vs-supply, is
    * the correct one (PropertySpec exercises the distinction). The knob
    * real mixture jobs reach for when a curated source runs dry: "we
    * asked for 2600 wiki tokens, wiki has 900 — fill the gap from web
    * and code in their 2:1 target ratio" becomes a concrete adjusted
    * budget map, still a pure deterministic function of the corpus.
    *
    * Integer-exact: extras are `floor(unused · b_s / Σ b_absorbers)`
    * (BigInt — no overflow at any corpus size) with the remainder
    * spread one token to the leading absorbers in source-name order, so
    * `Σ extra = unused` EXACTLY and the adjusted grand total equals the
    * original grand total plus nothing — what a source keeps in budget
    * it keeps in name only (its selection already took everything).
    * Absorbers may themselves run dry under the extra load — that
    * residual shortfall stays visible in [[mixtureReport]] against the
    * adjusted budgets (run another pass if chasing it matters; each
    * pass costs one selection + two bounded aggs).
    *
    * Exhausted sources keep their ORIGINAL budget in the returned map:
    * shrinking it to `achieved` would re-split the per-shard budgets
    * (div/mod) and could FLIP individual shard selections; keeping it
    * leaves their selection bit-identical (the prefix rule already
    * takes their whole supply). Budget monotonicity guarantees the
    * pass-2 selection is a SUPERSET of pass 1 per (source, shard) —
    * redistribution only adds docs. */
  def redistributedBudgets(df: DataFrame, source: Column, key: Column,
                           tokens: Column, budgetBySource: Map[String, Long],
                           shards: Int, salt: String = "mix"): Map[String, Long] =
    redistributedWithSelection(df, source, key, tokens, budgetBySource,
      shards, salt)._2

  /** [[redistributedBudgets]] plus the MEASURED pass-1 selection it
    * computed along the way (localCheckpointed — it feeds the two
    * measurement aggs here and, in the composed operator, the final
    * output for every source whose budget the redistribution left
    * unchanged, so the selection chain executes once, not three
    * times). The checkpoint materializes only the SELECTED rows —
    * bounded by the token budgets, not the corpus. */
  private def redistributedWithSelection(df: DataFrame, source: Column,
                                         key: Column, tokens: Column,
                                         budgetBySource: Map[String, Long],
                                         shards: Int, salt: String
                                        ): (DataFrame, Map[String, Long]) = {
    val selected = mixtureByTokenBudget(df, source, key, tokens,
      budgetBySource, shards, salt).localCheckpoint()
    def totals(d: DataFrame): Map[String, Long] =
      d.groupBy(source.cast("string").as("__s"))
        .agg(sum(tokens).cast("long").as("__t"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val achieved = totals(selected).withDefaultValue(0L)
    val supply = totals(df.filter(
      source.cast("string").isin(budgetBySource.keys.toSeq: _*)))
      .withDefaultValue(0L)
    val unused = budgetBySource.map { case (s, b) =>
      math.max(0L, b - achieved(s)) }.sum
    // Zero-budget sources are EXCLUSIONS, not candidates: without the
    // b > 0 filter the remainder spread could bump one to budget 1 and
    // admit a doc the caller explicitly shut out (pro-rata by original
    // share — a 0-share source absorbs 0, remainder included).
    val absorbers = budgetBySource.keys.toSeq.sorted
      .filter(s => supply(s) > achieved(s) && budgetBySource(s) > 0)
    val bAbs = absorbers.map(budgetBySource).sum
    val adjusted =
      if (unused == 0L || bAbs == 0L) budgetBySource
      else {
        val extras = absorbers.map(s =>
          s -> (BigInt(unused) * budgetBySource(s) / bAbs).toLong).toMap
        val remainder = unused - extras.values.sum
        val bumped = absorbers.take(remainder.toInt).toSet
        budgetBySource.map { case (s, b) =>
          s -> (b + extras.getOrElse(s, 0L) + (if (bumped(s)) 1L else 0L)) }
      }
    (selected, adjusted)
  }

  /** [[mixtureByTokenBudget]] with one shortfall-redistribution pass
    * (see [[redistributedBudgets]] — report against THOSE budgets).
    *
    * Pass-1 reuse: redistribution only ever RAISES budgets, and only
    * for absorbers — every other source's pass-2 selection is, by the
    * purity of the prefix rule, bit-identical to the pass-1 selection
    * already measured. So the composed operator re-selects ONLY the
    * changed sources (the corpus pre-filtered to them before the
    * shuffle — selection is per-(source, shard), so other sources'
    * rows cannot affect it) and serves everything else from the
    * checkpointed pass-1 rows: one full-corpus selection pass plus an
    * absorbers-only pass, instead of two full passes. No
    * redistribution → the pass-1 selection IS the answer. */
  def mixtureByTokenBudgetRedistributed(df: DataFrame, source: Column,
                                        key: Column, tokens: Column,
                                        budgetBySource: Map[String, Long],
                                        shards: Int,
                                        salt: String = "mix"): DataFrame = {
    val (pass1, adjusted) = redistributedWithSelection(df, source, key,
      tokens, budgetBySource, shards, salt)
    val changed = adjusted.keys.toSeq.sorted
      .filter(s => adjusted(s) != budgetBySource(s))
    if (changed.isEmpty) pass1
    else pass1.filter(!source.cast("string").isin(changed: _*))
      .unionByName(mixtureByTokenBudget(
        df.filter(source.cast("string").isin(changed: _*)),
        source, key, tokens,
        adjusted.view.filterKeys(changed.contains).toMap, shards, salt))
  }

  /** α-temperature mixture budgets — the multilingual-LM sampling rule
    * (the `p_s ∝ supply_s^α` reweighting of the XLM-R/mT5 line of
    * work): source s's token budget is `total · supply_s^α / Σ
    * supply^α`. α = 1 is proportional sampling (the corpus as it is);
    * α → 0 is uniform (every source equal); the 0.3–0.7 middle
    * upweights small curated sources against a dominant crawl without
    * flattening the mixture entirely. α arrives in integer HUNDREDTHS
    * (the module's exact-knob convention — 50 = α 0.5).
    *
    * The arithmetic is pinned so an independent engine can replay it:
    * weights are `floor(supply^α · 10⁶)` (the one double step,
    * quantized to an integer immediately), and `total` is apportioned
    * by largest remainder over those integer weights — floor shares in
    * BigInt (no overflow at any corpus scale), then the leftover
    * tokens go one each to the largest fractional remainders
    * (remainder DESC, source name ASC; zero-weight sources never
    * bumped). Σ budgets = total EXACTLY whenever any source has
    * supply; all-zero supply yields all-zero budgets.
    *
    * Supplies are measured with one combine-enabled aggregation
    * collected at |sources| rows — driver-bounded metadata, like every
    * budget map in this module. */
  def temperatureBudgets(df: DataFrame, source: Column, tokens: Column,
                         sources: Seq[String], total: Long,
                         alphaHundredths: Int): Map[String, Long] = {
    require(total >= 0, "total must be >= 0")
    require(alphaHundredths >= 0, "alphaHundredths must be >= 0")
    require(sources.nonEmpty, "need at least one source")
    require(sources.distinct == sources, "sources must be distinct")
    val alpha = alphaHundredths / 100.0
    val supply = df.filter(source.cast("string").isin(sources: _*))
      .groupBy(source.cast("string").as("__s"))
      .agg(sum(tokens).cast("long").as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .withDefaultValue(0L)
    val w = sources.map(s => s ->
      BigInt(math.floor(math.pow(supply(s).toDouble, alpha) * 1e6).toLong))
      .toMap
    val wTot = w.values.sum
    if (wTot == 0) sources.map(_ -> 0L).toMap
    else {
      val floorShare = sources.map(s => s -> BigInt(total) * w(s) / wTot).toMap
      val leftover = (BigInt(total) - floorShare.values.sum).toInt
      val bumped = sources.filter(s => w(s) > 0)
        .sortBy(s => (BigInt(total) * w(s) % wTot, s))(
          Ordering.Tuple2(Ordering[BigInt].reverse, Ordering[String]))
        .take(leftover).toSet
      sources.map(s =>
        s -> (floorShare(s) + (if (bumped(s)) 1 else 0)).toLong).toMap
    }
  }

  /** [[mixtureByTokenBudget]] under [[temperatureBudgets]], with one
    * shortfall-redistribution pass: α < 1 deliberately hands small
    * sources MORE than their proportional share, so a curated source
    * running dry is the expected case, not the edge case — the unused
    * mass flows to the sources that still have docs
    * ([[redistributedBudgets]]) instead of silently shrinking the
    * corpus. */
  def mixtureByTemperature(df: DataFrame, source: Column, key: Column,
                           tokens: Column, sources: Seq[String],
                           total: Long, alphaHundredths: Int, shards: Int,
                           salt: String = "mix"): DataFrame =
    mixtureByTokenBudgetRedistributed(df, source, key, tokens,
      temperatureBudgets(df, source, tokens, sources, total, alphaHundredths),
      shards, salt)

  /** Achieved-vs-target accounting for [[mixtureByTokenBudget]]'s
    * output: one row per TARGETED source (a zero-budget or exhausted
    * source still reports, with achieved 0) carrying achieved and
    * target token totals and both as shares of their respective grand
    * totals. The number a mixture job must publish — "we asked for 60%
    * web and got 58.7% because wiki ran out" is the difference between
    * a reproducible data recipe and a surprise at eval time.
    *
    * Plan: one agg over the selection keyed by source, joined onto the
    * (driver-local, |sources|-row) target table; grand totals come from
    * a single-row agg of that bounded table broadcast back in — no
    * global window, no single-partition stage over anything
    * data-sized. */
  def mixtureReport(selected: DataFrame, source: Column, tokens: Column,
                    budgetBySource: Map[String, Long]): DataFrame = {
    val spark = selected.sparkSession
    import spark.implicits._
    val targets = budgetBySource.toSeq.sortBy(_._1)
      .toDF("source", "target_tokens")
    val achieved = selected.groupBy(source.cast("string").as("source"))
      .agg(sum(tokens).cast("long").as("achieved_tokens"))
    val per = targets.join(achieved, Seq("source"), "left")
      .withColumn("achieved_tokens", coalesce(col("achieved_tokens"), lit(0L)))
    val totals = per.agg(
      sum(col("achieved_tokens")).as("__atot"),
      sum(col("target_tokens")).as("__ttot"))
    per.crossJoin(broadcast(totals))
      .withColumn("achieved_share", round(
        col("achieved_tokens").cast("double") / col("__atot"), 6))
      .withColumn("target_share", round(
        col("target_tokens").cast("double") / col("__ttot"), 6))
      .drop("__atot", "__ttot")
  }

  /** The packing last mile: materialize [[packByBudget]]'s (shard,
    * pack) assignment as CONCATENATED training examples — one row per
    * pack carrying the member texts joined by `sep` (an EOS-style
    * separator) in the SAME (md5(key), key) order the prefix rule
    * packed them, plus the pack's doc and token counts. What a
    * pretraining dataloader actually consumes: fixed-budget examples,
    * reproducible bit-for-bit on any partitioning.
    *
    * Plan: packByBudget's map-only assignment + ONE (shard, pack) agg
    * — the shuffle carries each text once, groups are bounded by the
    * token budget (plus the straddle doc), and the in-group order is
    * re-derived inside the agg (array_sort over (hash, key, text)
    * structs — the dedupParagraphs reassembly idiom), so no second
    * window or sort stage. A doc longer than the whole budget still
    * becomes its own (oversized) example — truncation is the
    * tokenizer's call downstream, not silent data loss here. */
  def packToExamples(df: DataFrame, key: Column, tokens: Column,
                     textCol: String, budget: Long, shards: Int,
                     sep: String): DataFrame =
    packByBudget(df, key, tokens, budget, shards)
      .groupBy(col("shard"), col("pack_id"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(
            md5(key.cast("string")).as("h"), key.as("k"),
            col(textCol).as("x")))),
          s => s.getField("x")), sep).as(textCol),
        count(lit(1)).as("n_docs"),
        sum(tokens).cast("long").as("n_tokens"))

  def packByBudget(df: DataFrame, key: Column, tokens: Column,
                   budget: Long, shards: Int): DataFrame = {
    require(budget >= 1, "token budget must be >= 1")
    require(shards >= 1, "need at least one shard")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__shard"))
      .orderBy(md5(key.cast("string")), key)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__shard", hashBucket(key, shards, salt = "pack"))
      .withColumn("__before", coalesce(sum(tokens).over(w), lit(0L)))
      // `div`, not floor(a / b): long / long is DOUBLE division, whose
      // 53-bit mantissa mis-floors prefix sums past 2^53 — exactly the
      // corpus sizes this module advertises. div is exact at any size.
      .select(df.columns.toIndexedSeq.map(col) :+
        col("__shard").as("shard") :+
        expr(s"__before div $budget").as("pack_id"): _*)
  }

  /** Per-example DOCUMENT BOUNDARIES for packed training examples —
    * the companion table [[packToExamples]]'s dataloader needs to
    * build attention masks that stop cross-document attention: for
    * every member doc, its pack, its 0-based sequence slot, and the
    * token offset where it starts inside the example (separator
    * tokens excluded — the tokenizer accounts for those downstream).
    *
    * Plan: [[packByBudget]]'s map-only assignment + one window per
    * (shard, pack) in the SAME (md5(key), key) order the prefix rule
    * packed them — `token_start` is the within-pack exclusive prefix
    * sum, so it needs no subtraction against the global prefix.
    * Window groups are bounded by the token budget, never a hot key:
    * the shape survives any corpus size because pack membership does. */
  def packBoundaries(df: DataFrame, key: Column, tokens: Column,
                     budget: Long, shards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = Seq(md5(key.cast("string")), key)
    val wSum = Window.partitionBy(col("shard"), col("pack_id"))
      .orderBy(order: _*).rowsBetween(Window.unboundedPreceding, -1)
    val wSeq = Window.partitionBy(col("shard"), col("pack_id"))
      .orderBy(order: _*)
    packByBudget(df, key, tokens, budget, shards)
      .select(col("shard"), col("pack_id"),
        (row_number().over(wSeq) - 1).as("seq"), key,
        coalesce(sum(tokens).over(wSum), lit(0L)).as("token_start"),
        tokens.cast("long").as("n_tokens"))
  }

  /** Deterministic CLASS-BALANCED downsample: every class keeps exactly
    * min-class-count members, winners chosen by the stable (md5(key),
    * key) order — the label-balancing step before training a classifier
    * on skewed data, reproducible on any partitioning and stable under
    * corpus growth (a new row only displaces hash-later rows of its own
    * class). Plan: one combine-enabled class-count agg reduced to a
    * single-row MIN (broadcast back), one per-class rank window. The
    * window sorts within each class — the inherent cost of exact
    * per-class quotas; a skew-hostile deployment swaps in the
    * per-range-offset rank trick documented on [[interleaveBySource]]. */
  def balanceClasses(df: DataFrame, classCol: Column, key: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mn = df.groupBy(classCol.as("__c")).agg(count(lit(1)).as("__n"))
      .agg(min(col("__n")).as("__mn"))
    val rn = row_number().over(Window.partitionBy(classCol)
      .orderBy(md5(key.cast("string")), key))
    df.withColumn("__rn", rn)
      .crossJoin(broadcast(mn))
      .filter(col("__rn") <= col("__mn"))
      .drop("__rn", "__mn")
  }

  /** Deterministic SOURCE-INTERLEAVED training order: round-robin
    * across sources so adjacent examples come from different corpora —
    * the data-order half of mixture training (a shuffled-but-clumped
    * order lets one source dominate whole batches; strict interleave
    * bounds any window's per-source share at ⌈w/n⌉). Every doc gets
    * `pos = rank_within_source × n_sources + source_index`, a pure
    * function of (key, source) — reproducible on any partitioning,
    * stable under re-runs, and collision-free (positions are distinct
    * by construction, though not dense when sources differ in size:
    * after the shortest source is exhausted its slots simply go
    * unfilled, which a dataloader reading in `pos` order never sees).
    *
    * Plan: one row_number window PER SOURCE partition (the
    * [[samplePerGroup]] shape) in (md5(key), key) order + a broadcast
    * when-chain for the source index (sources are bounded metadata —
    * the same collect contract as mixture budgets). At 100 TB the
    * per-source rank is the inherent cost of a per-source total order;
    * a deployment that cannot afford the single-partition-per-source
    * sort range-partitions each source by the md5 prefix and offsets
    * ranks by per-range counts — same output, same contract. */
  def interleaveBySource(df: DataFrame, source: Column, key: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val raw = df.select(source.cast("string").as("__s")).distinct()
      .collect().map(_.getString(0)).toIndexedSeq
    // Fail fast on NULL sources: a null String would NPE inside .sorted
    // (opaque) and give a NULL when-chain position (silent). A caller
    // with nullable sources decides the stratum (coalesce to a sentinel)
    // — this op won't invent one.
    require(!raw.contains(null),
      "interleaveBySource: NULL source value — coalesce sources to a " +
        "sentinel stratum before interleaving")
    val sources = raw.sorted
    require(sources.nonEmpty, "interleaveBySource: empty input")
    val idx = sources.zipWithIndex.tail.foldLeft(
      when(source === sources.head, lit(0L))) { case (acc, (s, i)) =>
        acc.when(source === s, lit(i.toLong)) }
    val r = row_number().over(Window.partitionBy(source)
      .orderBy(md5(key.cast("string")), key))
    df.withColumn("pos", (r - 1).cast("long") * sources.size + idx)
  }

  /** Leakage-safe train/val/test assignment: the split key is the
    * document's duplicate-CLUSTER representative, not the document —
    * so a near-duplicate family lands in ONE split and the eval set
    * never contains a paraphrase of a training doc (the contamination
    * mode document-keyed splitting cannot prevent: hash(doc A) and
    * hash(dup-of-A) are independent coin flips, so a corpus with d%
    * duplicated docs leaks ~d·testPct% of its test set).
    *
    * `clusters` is a (nodeCol, clusterCol) membership table — the
    * [[graft.ext.Dedup.dupClusters]] output (or any clustering with
    * the same shape); singleton docs (absent from it) represent
    * themselves. One left join on the doc key + the [[splitLabel]]
    * wheel on the representative: same disjoint/exhaustive/reproducible
    * contract, same append-only stability — and adding a NEW doc to an
    * existing cluster routes it to the cluster's split, never the
    * other way around. Returns the input plus (cluster_id, split). */
  def splitByCluster(docs: DataFrame, clusters: DataFrame, docKey: String,
                     nodeCol: String, clusterCol: String,
                     trainPct: Int, valPct: Int,
                     salt: String = ""): DataFrame = {
    val membership = clusters.select(
      col(nodeCol).as(docKey), col(clusterCol).as("__cl"))
    docs.join(membership, Seq(docKey), "left")
      .withColumn("cluster_id", coalesce(col("__cl"), col(docKey)))
      .withColumn("split", splitLabel(col("cluster_id"), trainPct, valPct, salt))
      .drop("__cl")
  }

  // ───────── DSIR-style hashed importance weights (Xie et al. 2023) ─────────

  /** Per-document importance log-weight against a TARGET domain — the
    * "Data Selection for Language Models via Importance Resampling"
    * recipe (Xie et al., NeurIPS 2023) on hashed unigram features:
    * every word hashes into one of `buckets` feature buckets (the same
    * md5 wheel as every sampling decision here — collisions are the
    * method, not a bug: hashing IS the dimensionality reduction), the
    * target and raw bucket distributions are estimated add-one-smoothed
    * from the two corpora, and a document scores the sum over its word
    * instances of
    *
    *   llr(b) = ln((c_target(b)+1)/(T_target+B)) − ln((c_raw(b)+1)/(T_raw+B))
    *
    * — positive for docs whose features look like the target domain,
    * negative for ones that look like the raw pool. Returns (docKey,
    * n_words, logw).
    *
    * Numeric contract (the [[graft.ext.TextAnalysis.perplexity]]
    * convention): both probability quotients are exact-integer divides
    * in IEEE doubles, each per-bucket llr rounds to 6dp — absorbing the
    * engines' last-ulp ln() disagreement — and the per-doc sum runs in
    * EXACT decimals, so logw is independent of word order and
    * partitioning.
    *
    * Shape at 100 TB: the scored corpus EXPLODES ONCE into pinned
    * per-(doc, bucket) counts — ≤ docs × min(doc length, buckets)
    * rows, far below the word-instance blowup — and that one
    * materialization feeds BOTH the global bucket table (a second-stage
    * agg of the per-doc counts) and per-doc scoring (broadcast join on
    * the bucket id + one combine-enabled agg with instance counts as
    * weights). The llr table is ≤ `buckets` rows — driver-bounded like
    * every budget map here; single-row totals broadcast in. The raw
    * pool never shuffles and is never scanned twice. */
  def importanceWeights(df: DataFrame, docKey: String, textCol: String,
                        target: DataFrame, targetTextCol: String,
                        buckets: Int, salt: String = "dsir"): DataFrame = {
    require(buckets >= 1, "need at least one feature bucket")
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    def bucketed(d: DataFrame, keep: Seq[String], text: String): DataFrame =
      d.select(keep.map(col) :+
          explode(split(lower(col(text)), " ")).as("__w"): _*)
        .withColumn("__b", hashBucket(col("__w"), buckets, salt))
    // Single corpus pass, conf-routed pin (Dedup.pin): without it the
    // two consumers below would each re-explode the corpus words.
    val perDoc = Dedup.pin(bucketed(df, Seq(docKey), textCol)
      .groupBy(col(docKey), col("__b")).agg(count(lit(1)).as("__c")))
    val raw = perDoc.groupBy(col("__b")).agg(sum(col("__c")).as("__cr"))
    val tgt = bucketed(target, Seq.empty, targetTextCol)
      .groupBy(col("__b")).agg(count(lit(1)).as("__ct"))
    val rawTot = raw.agg(sum(col("__cr")).as("__tr"))
    val tgtTot = tgt.agg(sum(col("__ct")).as("__tt"))
    // Raw counts cover every bucket the scored corpus produces (raw IS
    // the scored corpus), so the left join only needs the target side.
    val table = raw.join(tgt, Seq("__b"), "left")
      .crossJoin(broadcast(rawTot)).crossJoin(broadcast(tgtTot))
      .withColumn("__llr", round(
        log((coalesce(col("__ct"), lit(0L)) + 1).cast(DoubleType)
          / (col("__tt") + buckets).cast(DoubleType))
          - log((col("__cr") + 1).cast(DoubleType)
            / (col("__tr") + buckets).cast(DoubleType)), 6)
        .cast(DecimalType(25, 6)))
      .select(col("__b"), col("__llr"))
    // Instance-weighted close: Σ __c·llr over (doc, bucket) is the
    // exact-decimal equal of Σ llr over word instances, so logw is
    // bit-identical to the two-pass form.
    perDoc
      .join(broadcast(table), Seq("__b"))
      .groupBy(col(docKey))
      .agg(sum(col("__c")).as("n_words"),
        sum(col("__c") * col("__llr")).as("__s"))
      .withColumn("logw", col("__s").cast(DoubleType))
      .drop("__s")
  }

  /** Deterministic importance RESAMPLING over [[importanceWeights]] —
    * the paper's Gumbel-top-k draw (sampling without replacement with
    * probabilities ∝ exp(logw); Kool et al. 2019 establish the
    * equivalence) made reproducible the [[weightedSampleKey]] way: the
    * Gumbel noise g = −ln(−ln(u)) comes from the hash-derived uniform
    * u ∈ (0, 1] (exact in both engines: 32-bit integer + 1 over 2^32),
    * rounded to 6dp to absorb last-ulp ln() drift, and the k LARGEST
    * logw + g win, ties on the doc key. (The u = 1 endpoint maps to
    * g = +∞ — one doc in 2^32 sorts first deterministically in both
    * engines; the continuity convention, not a hazard.) Runs as
    * TakeOrderedAndProject — a per-partition k-heap, never a full
    * sort. Returns (docKey, n_words, logw, score). */
  def importanceResample(df: DataFrame, docKey: String, textCol: String,
                         target: DataFrame, targetTextCol: String,
                         buckets: Int, k: Int, salt: String = "dsir"): DataFrame = {
    require(k >= 1, "need k >= 1")
    val wts = importanceWeights(df, docKey, textCol, target, targetTextCol,
      buckets, salt)
    val u = (hash32(col(docKey), salt + ":gumbel") + lit(1L)).cast("double") /
      lit(4294967296.0)
    wts.withColumn("score", round(col("logw") + round(-log(-log(u)), 6), 6))
      .orderBy(col("score").desc, col(docKey))
      .limit(k)
  }
}
