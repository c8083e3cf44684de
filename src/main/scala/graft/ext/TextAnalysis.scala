package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis operators for LLM-data-pipeline workloads over the
  * `documents` table (north-star extension; no reference counterpart —
  * the reference's text surface stops at lowercase+filter, `etl.py:298-308`).
  *
  * All pure column expressions (higher-order functions, no UDFs) → these
  * stay inside whole-stage codegen and scale embarrassingly: per-row work,
  * zero shuffles.
  */
object TextAnalysis {

  /** Whitespace tokens of a document. */
  def tokens(c: Column): Column = split(c, " ")

  /** Tiny per-language marker lexicons for the heuristic language ID.
    * Deliberately small and deterministic — the operator shape (set
    * intersection scoring) is what matters, not lexicon quality.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "data", "value"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es" -> Seq("el", "los", "las", "es", "un", "una", "en", "que"))

  /** Marker-hit count for one language. */
  def langScore(words: Column, markers: Seq[String]): Column =
    size(array_intersect(words, array(markers.map(lit): _*)))

  /** Heuristic language ID: argmax of marker-hit counts, ties broken by
    * language code order, all-zero → 'und'. Pure expression tree. */
  def langId(text: Column): Column = {
    val words = tokens(lower(text))
    val scored = LangMarkers.map { case (code, ms) => (code, langScore(words, ms)) }
    val best = greatest(scored.map(_._2): _*)
    scored.foldRight(lit("und")) { case ((code, s), elseCol) =>
      when(s === best && s > 0, lit(code)).otherwise(elseCol)
    }
  }

  /** Quality heuristics: length, word stats, stopword ratio, digit ratio.
    * Returns (n_words, mean_word_len, stop_ratio, digit_ratio, score). */
  def nWords(text: Column): Column = size(tokens(text))

  def meanWordLen(text: Column): Column =
    (length(text) - (nWords(text) - 1).cast("double")) / nWords(text)

  def stopRatio(text: Column): Column = {
    val words = tokens(lower(text))
    size(filter(words, w => w.isin(LangMarkers.head._2: _*))).cast("double") /
      size(words)
  }

  def digitRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast("double") /
      length(text)

  /** Composite quality score in [0,1]-ish: favors mid-length docs with low
    * digit noise — a stand-in for fastText-style quality classifiers. */
  def qualityScore(text: Column): Column =
    least(lit(1.0), nWords(text).cast("double") / 100) * (lit(1.0) - digitRatio(text))

  /** Shannon entropy (bits/char) of the document's character
    * distribution — the junk detector past word-level heuristics:
    * random/encrypted blobs score near log2(alphabet), single-char runs
    * score 0, natural language sits in between. Map-only higher-order
    * functions, zero shuffles.
    *
    * Numeric contract: each character's term p·log2(p) is 6dp-rounded
    * (the A-ES convention — absorbs the engines' last-ulp log()
    * disagreement) and the terms are summed as EXACT decimals, so the
    * total is independent of character iteration order — the oracle
    * sums the same terms from a GROUP BY in whatever order it likes.
    * NULL for empty text. */
  def charEntropy(text: Column): Column = {
    import org.apache.spark.sql.types.DecimalType
    val chars = split(text, "")
    val n = size(chars)
    // One sort + run-length counting: O(len·log len) per document instead
    // of rescanning the full array once per distinct character
    // (O(distinct·len) — expensive on long wide-alphabet documents).
    // `starts` holds each distinct character once, with the 0-based index
    // where its run begins in the sorted array; the run length (= count)
    // is the gap to the next run start. Same term multiset as the
    // per-distinct-char scan, and the decimal term sum is order-free, so
    // the result is bit-identical.
    // CRITICAL shape constraint: never reference an expensive expression
    // from INSIDE a lambda. HOF lambdas re-evaluate every captured
    // expression per ELEMENT (there is no common-subexpression sharing
    // in interpreted eval), so e.g. `element_at(sorted, i)` inside a
    // `transform` re-sorts the whole array per character — O(n²·log n)
    // per row; measured as a multi-hour wedge on the 0.01 corpus. Every
    // step below therefore consumes only its own lambda variables; the
    // one outer value the term formula needs (n) rides into the
    // `aggregate` through the accumulator's zero, where it is evaluated
    // once per row.
    val sorted = array_sort(chars)
    // Run ends: position i (1-based) where sorted[i] != sorted[i+1].
    val nextChar = concat(slice(sorted, lit(2), greatest(n - 1, lit(0))),
      array(lit(null).cast("string")))
    val endFlags = zip_with(sorted, nextChar,
      (c, nx) => coalesce(c =!= nx, lit(true)))
    val endPos = filter(
      transform(endFlags, (f, i) => when(f, i + 1)), p => p.isNotNull)
    // Run lengths = gaps between consecutive end positions.
    val prevEnd = concat(array(lit(0)),
      slice(endPos, lit(1), greatest(size(endPos) - 1, lit(0))))
    val counts = zip_with(endPos, prevEnd, (e, b) => e - b)
    val total = aggregate(counts,
      struct(lit(0).cast(DecimalType(28, 6)).as("s"), n.as("n")),
      (acc, c) => {
        val p = c.cast(DoubleType) / acc.getField("n").cast(DoubleType)
        struct(
          (acc.getField("s") + round(p * log2(p), 6).cast(DecimalType(18, 6)))
            .cast(DecimalType(28, 6)).as("s"),
          acc.getField("n").as("n"))
      },
      acc => acc.getField("s"))
    when(length(text) > 0, (-total).cast(DoubleType))
  }

  /** Share of characters outside printable ASCII (0x20–0x7E) — the
    * mojibake / binary-junk companion signal to `charEntropy`. NULL for
    * empty text. */
  def nonPrintableRatio(text: Column): Column =
    when(length(text) > 0, round(
      (length(text) - length(regexp_replace(text, "[^\\x20-\\x7E]", "")))
        .cast(DoubleType) / length(text), 6))

  /** Language-label AUDIT — the data-quality check between ingestion
    * and language-routed processing: re-detect every doc's language
    * ([[langId]]) and report, per group, how often the detector
    * DISAGREES with the stored label. A rising mismatch rate is the
    * canary for mislabeled upstream shards or a drifted detector —
    * either way, the language-conditioned mixture downstream is
    * routing on bad data. Null-safe comparison (a NULL label counts
    * as a mismatch against any prediction — unlabeled rows are
    * exactly what the audit should surface). One map pass + one
    * bounded per-group agg. */
  def langAudit(df: DataFrame, textCol: String, langCol: String,
                groupCol: String): DataFrame =
    df.select(col(groupCol).as("group"), col(langCol).as("__l"),
        langId(col(textCol)).as("__p"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(!(col("__p") <=> col("__l")), 1).otherwise(0)).as("n_mismatch"))
      .withColumn("mismatch_rate", round(
        col("n_mismatch").cast(DoubleType) / col("n_docs"), 6))

  /** HTML → text extraction — the step between a crawl and every text
    * op in this module. Deterministic regexp pipeline (RE2 ∩ Java
    * syntax, so the oracle replays it verbatim):
    *  1. drop <script>/<style> ELEMENTS wholesale (their text is code,
    *     not prose) and <!-- comments -->;
    *  2. block-level closers/br become newlines BEFORE tags are
    *     stripped (so "<p>a</p><p>b</p>" keeps its paragraph break —
    *     naive tag-stripping would weld the paragraphs);
    *  3. strip every remaining tag;
    *  4. unescape the five common entities (&lt; &gt; &quot; &#39;
    *     &amp; — amp LAST, so double-escapes decode one level);
    *  5. normalize whitespace: runs of spaces/tabs collapse, ≥2
    *     newlines collapse to one paragraph break, lines trim, edges
    *     trim.
    * Map-only codegen'd regexp work, zero shuffles. Not a browser: CDATA
    * and exotic entities pass through literally — the honest contract
    * for an engine-side extractor (a production pipeline bolts a real
    * parser in at the mapPartitions tier like the image codecs). */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c,
      "(?is)<(script|style)\\b[^>]*>.*?</(script|style)>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val breaks = regexp_replace(noComment,
      "(?i)<(br|/p|/div|/h[1-6]|/li|/tr)\\b[^>]*>", "\n")
    val noTags = regexp_replace(breaks, "(?s)<[^>]*>", " ")
    val unescaped = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&amp;" -> "&" // last — "&amp;lt;" must become "&lt;", not "<"
    ).foldLeft(noTags) { case (col0, (e, r)) =>
      regexp_replace(col0, java.util.regex.Pattern.quote(e), r)
    }
    val collapsed = regexp_replace(
      regexp_replace(unescaped, "[ \\t]+", " "),
      " ?\\n ?", "\n")
    // regexp trim, not trim(): trim() strips spaces only, and stage 2's
    // break insertion legitimately leaves trailing newlines.
    regexp_replace(regexp_replace(collapsed, "\\n{2,}", "\n"),
      "^\\s+|\\s+$", "")
  }

  /** C4-style LINE filtering (Raffel et al. 2020, "Exploring the Limits
    * of Transfer Learning…" §2.2 — the C4 cleaning recipe): the
    * line-resolution cleaning pass that sits between [[stripHtml]] and
    * the doc-level Gopher gates. Per LINE of `textCol` (newline-split):
    * keep only lines that (a) end in terminal punctuation (. ! ?),
    * (b) carry at least `minLineWords` whitespace words, and (c) do not
    * mention 'javascript' (case-insensitive). Per DOC: drop the whole
    * document when fewer than `minLines` lines survive, or when the
    * ORIGINAL text contains '{' (code) or 'lorem ipsum' (template
    * filler) anywhere. Survivors re-emit with the kept lines rejoined
    * by newline plus kept/dropped line counts.
    *
    * The paper's closing-quote terminal mark is deliberately omitted
    * (a two-engine parity subset; add it at the `isin` below and the
    * oracle's IN-list together). Map-only higher-order work over the
    * line array — zero shuffles, embarrassingly parallel, the 100 TB
    * shape a per-line cleaner must have. */
  def c4LineFilter(df: DataFrame, docKey: String, textCol: String,
                   minLineWords: Int = 3, minLines: Int = 3): DataFrame = {
    require(minLineWords >= 1, s"need minLineWords >= 1, got $minLineWords")
    require(minLines >= 1, s"need minLines >= 1, got $minLines")
    val t = col(textCol)
    val lines = split(t, "\n")
    val kept = filter(lines, l =>
      substring(l, -1, 1).isin(".", "!", "?") &&
        size(split(trim(l), " ")) >= minLineWords &&
        instr(lower(l), "javascript") === 0)
    df.select(col(docKey), t, lines.as("__lines"), kept.as("__kept"))
      .filter(size(col("__kept")) >= minLines &&
        instr(t, "{") === 0 &&
        instr(lower(t), "lorem ipsum") === 0)
      .select(col(docKey),
        array_join(col("__kept"), "\n").as(textCol),
        size(col("__kept")).as("n_lines_kept"),
        (size(col("__lines")) - size(col("__kept"))).as("n_lines_dropped"))
  }

  /** EXACT corpus heavy hitters: words whose instance share is at
    * least `minShare` of all word instances — stop-word discovery,
    * boilerplate-token detection, tokenizer-vocab sanity. Exact, not
    * sketched: the word-count agg is combine-enabled (map-side partial
    * counts shuffle ≤ |vocab| narrow rows per partition), the total
    * rides in as a broadcast single row, and the share filter is
    * map-side — at 100 TB this is ONE combine-reduced shuffle of the
    * vocabulary, which is why the exact form beats a count-min sketch
    * until the vocabulary itself stops fitting (then cap with a
    * [[graft.ext.Sampling.hashBucket]] pre-bucket). Share rounds 6dp
    * (exact integer quotient — engine-independent). */
  def heavyHitterWords(df: DataFrame, textCol: String,
                       minShare: Double): DataFrame = {
    require(minShare > 0 && minShare <= 1, s"minShare in (0,1], got $minShare")
    val words = df.select(explode(tokens(lower(col(textCol)))).as("word"))
    val counts = words.groupBy(col("word")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__t"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", round(col("n").cast(DoubleType) / col("__t"), 6))
      .filter(col("share") >= minShare)
      .select(col("word"), col("n"), col("share"))
  }

  /** Unicode-script profile — the multilingual routing signal upstream
    * of [[langId]]: per-doc character ratios for the major scripts
    * (plus digits) and the dominant script. Script classes are the
    * Unicode properties both regex engines implement (Java
    * `\p{IsLatin}` ≡ RE2 `\p{Latin}` etc.), counted by the
    * delete-and-diff idiom [[digitRatio]] uses — map-only regexp work,
    * zero shuffles. Ratios are over ALL characters (spaces dilute —
    * deliberately, so pure-script text scores high and mixed text
    * splits); NULL text → NULL ratios and NULL dominant (no evidence —
    * the perplexity convention); empty text → NULL ratios and dominant
    * 'none'; text whose
    * characters match no tracked script (symbols, spaces) → dominant
    * 'other'. Ties break by the fixed script order below (langId's
    * convention). */
  val Scripts: Seq[(String, String)] = Seq(
    "arabic" -> "\\p{IsArabic}", "cyrillic" -> "\\p{IsCyrillic}",
    "han" -> "\\p{IsHan}", "latin" -> "\\p{IsLatin}")

  def scriptProfile(df: DataFrame, docKey: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val n = length(t)
    def cnt(re: String): Column = n - length(regexp_replace(t, re, ""))
    val counts = Scripts.map { case (name, re) => name -> cnt(re) }
    val digit = cnt("[0-9]")
    val best = greatest(counts.map(_._2): _*)
    // NULL text → NULL dominant, pinned EXPLICITLY on both engines:
    // without the guard the Spark fold's all-NULL when-conditions land
    // on 'other' while a CASE oracle would fall through to its ELSE —
    // a contract divergence only visible on NULL fixtures.
    val dominant = when(n.isNull, lit(null).cast("string"))
      .when(n === 0, lit("none")).otherwise(
        counts.foldRight(lit("other")) { case ((name, c), acc) =>
          when(c === best && best > 0, lit(name)).otherwise(acc)
        })
    df.select(Seq(col(docKey)) ++
      counts.map { case (name, c) =>
        when(n > 0, round(c.cast(DoubleType) / n, 6)).as(s"${name}_ratio") } ++
      Seq(when(n > 0, round(digit.cast(DoubleType) / n, 6)).as("digit_ratio"),
        dominant.as("dominant_script")): _*)
  }

  /** Whitespace token count + a BPE-ish subword estimate: alpha runs,
    * digit runs, and residual symbols each count as one token. */
  def tokenCountWs(text: Column): Column = nWords(text)

  def tokenCountBpe(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))

  /** Document fingerprint: hash of the whitespace-normalized lowercase text
    * (content-defined identity for exact dedup across formatting drift). */
  def fingerprint(text: Column): Column =
    md5(array_join(filter(tokens(lower(text)), w => w =!= ""), " "))

  /** Content-defined chunking (Rabin-style rolling hash — the LBFS /
    * rsync family): cut a document AFTER char i whenever the
    * Karp–Rabin hash of its trailing `window` chars lands on 0 mod
    * 2^bits, giving chunks whose boundaries move WITH the content —
    * insert one word at the top of a doc and every chunk after the
    * edit point re-aligns (fixed-size chunking would shift every
    * boundary and defeat chunk-hash dedup). Expected chunk length
    * ≈ 2^bits chars. The md5 `chunk_hash` rides along as the dedup /
    * delta-sync key: duplicated passages across docs become duplicated
    * chunk hashes ([[graft.ext.Dedup.exactByKey]] on the hash is
    * chunk-level dedup).
    *
    * Semantics (both engines replay bit-for-bit): hash =
    * (Σ_j code(c_{i−window+1+j}) · B^{window−1−j}) mod M with B = 257,
    * M = 1e9+7, codes = code points; docs shorter than `window` are
    * one whole-doc chunk; empty docs emit nothing. Chunks concatenate
    * back to the exact input (spec-pinned).
    *
    * Shape: one native boundary scan per row ([[graft.functions.CdcCuts]])
    * plus slicing HOFs over projected attributes — map-only, zero
    * shuffles, O(len · window) primitive arithmetic per doc. */
  def chunkContentDefined(df: DataFrame, docKey: String, textCol: String,
                          window: Int = 8, bits: Int = 5): DataFrame = {
    require(window >= 2, s"rolling window must be >= 2 chars, got $window")
    require(bits >= 1 && bits <= 20, s"boundary bits must be in 1..20, got $bits")
    // Boundary scan is the native [[graft.functions.CdcCuts]]
    // expression — one pass of primitive long arithmetic per row (the
    // per-position interpreted filter lambda it replaces ran ~10⁷
    // element-at evaluations per corpus pass and showed multi-second
    // jitter on the bench), and it pins CODE-POINT position semantics
    // (split("") counted UTF-16 units — divergent on astral text).
    val base = df
      .select(col(docKey), col(textCol).as("__t"))
      .withColumn("__n", length(col("__t")))
    val cuts = graft.functions.TextHash.cdc_cuts(col("__t"), window, bits)
    val withBounds = base.withColumn("__bs", array_sort(array_distinct(
      concat(array(lit(0)), cuts, array(col("__n"))))))
    withBounds
      .select(col(docKey), col("__t"), col("__bs"),
        posexplode(when(size(col("__bs")) > 1,
            sequence(lit(1), size(col("__bs")) - 1))
          .otherwise(lit(Array.empty[Int]))).as(Seq("__x", "__ci")))
      .select(col(docKey), col("__ci").cast("int").as("chunk_idx"),
        col("__t").substr(element_at(col("__bs"), col("__ci")) + 1,
          element_at(col("__bs"), col("__ci") + 1)
            - element_at(col("__bs"), col("__ci"))).as("chunk"))
      .withColumn("n_chars", length(col("chunk")))
      .withColumn("chunk_hash", md5(col("chunk")))
  }

  /** Chunk-level dedup over [[chunkContentDefined]] — boilerplate
    * removal at CONTENT-DEFINED granularity: every chunk keeps only its
    * first (doc, position) occurrence corpus-wide, survivors
    * reassemble in order (byte-exact concatenation — CDC chunks carry
    * their own whitespace), fully-emptied docs drop. The CDC twin of
    * [[graft.ext.Dedup.dedupParagraphs]]: where paragraph dedup needs
    * a separator the corpus must already contain, CDC boundaries come
    * from the content itself, so a license block pasted MID-LINE still
    * dedups — and an edit upstream of the block does not hide it
    * (boundaries re-align; fixed windows would shift).
    *
    * Plan: chunking is map-only; first-occurrence is the
    * combine-reduced min(struct) agg on the 32-byte chunk hash; the
    * keeper semi-join keys (doc, position); reassembly is one
    * groupBy(doc) agg — the dedupParagraphs shuffle discipline at
    * chunk grain. */
  def dedupCdcChunks(docs: DataFrame, docKey: String, textCol: String,
                     window: Int = 8, bits: Int = 5): DataFrame = {
    val chunks = chunkContentDefined(docs, docKey, textCol, window, bits)
    val first = chunks
      .groupBy(col("chunk_hash"))
      .agg(min(struct(col(docKey).as("__d"), col("chunk_idx").as("__i"))).as("__k"))
      .select(col("__k.__d").as(docKey), col("__k.__i").as("chunk_idx"))
    chunks.join(first, Seq(docKey, "chunk_idx"), "left_semi")
      .groupBy(col(docKey))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
          x => x.getField("chunk")), "").as(textCol))
  }

  /** Per-source corpus datasheet — the one-table summary a dataset
    * release publishes ("Datasheets for Datasets" §composition, scoped
    * to what an engine can derive without human input): doc / char /
    * whitespace-token counts, mean doc length, corpus shares, and the
    * exact-duplicate exposure (docs whose full-text md5 occurs more
    * than once ANYWHERE in the corpus — cross-source duplication
    * counts against every source holding a copy, which is the number
    * a mixing decision needs).
    *
    * Shape at 100 TB: one map pass projects (hash, token count, char
    * count); the dup-hash table is a combine-reduced 32-byte-key agg
    * joined back (the dedupParagraphs discipline); per-source rollup
    * is one combine-enabled agg to |sources| rows; grand totals come
    * from a single-row agg of that bounded table broadcast back in
    * (the mixtureReport shape). No global windows, no driver data
    * beyond the |sources|-row result. */
  def corpusDatasheet(df: DataFrame, docKey: String, textCol: String,
                      sourceCol: String): DataFrame = {
    val base = df.select(col(sourceCol).as("source"),
        md5(col(textCol)).as("__h"),
        size(tokens(col(textCol))).as("__tok"),
        length(col(textCol)).as("__nc"))
    val dupH = base.groupBy(col("__h")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1).select(col("__h"))
    val per = base
      .join(dupH.withColumn("__d", lit(true)), Seq("__h"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nc")).as("n_chars"),
        sum(col("__tok")).as("n_tokens"),
        sum(when(col("__d"), 1).otherwise(0)).as("dup_docs"))
    val tot = per.agg(sum(col("n_docs")).as("__td"),
      sum(col("n_tokens")).as("__tt"))
    per.crossJoin(broadcast(tot))
      .withColumn("avg_tokens",
        round(col("n_tokens").cast(DoubleType) / col("n_docs"), 6))
      .withColumn("share_docs",
        round(col("n_docs").cast(DoubleType) / col("__td"), 6))
      .withColumn("share_tokens",
        round(col("n_tokens").cast(DoubleType) / col("__tt"), 6))
      .drop("__td", "__tt")
  }

  // ───────── winnowing fingerprints (Schleimer et al., MOSS) ─────────

  /** Per-document winnowing fingerprint selections — the local document
    * fingerprinting algorithm of Schleimer/Wilkerson/Aiken ("Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003): hash
    * every k-char gram of the lowercased text, slide a window of `w`
    * consecutive gram hashes, and select each window's MINIMUM hash
    * (rightmost on ties — the paper's robust-winnowing rule, which keeps
    * re-selecting the same physical position across overlapping windows
    * and so thins the output). The guarantee: any substring match of at
    * least w + k − 1 chars between two documents shares at least one
    * selected fingerprint — detection without comparing full texts.
    *
    * Returns one row per distinct selected (position, hash): (docKey,
    * pos, fp) with pos the 1-based char index of the selected gram and
    * fp a 60-bit md5-derived hash (the [[graft.ext.Dedup.simhash]] hex-
    * prefix convention — portable, oracle-reproducible). Docs shorter
    * than k chars emit no rows.
    *
    * Shape at 100 TB: everything through selection is per-row
    * higher-order-function work over projected ATTRIBUTES (the
    * [[charEntropy]] lambda-capture discipline — hashes project once per
    * doc, each window slices O(w) off the array), and the per-doc
    * de-dup runs as array_distinct BEFORE the explode — so fingerprint
    * extraction is map-only codegen'd work, zero shuffles. */
  def winnowFingerprints(df: DataFrame, docKey: String, textCol: String,
                         k: Int, w: Int): DataFrame =
    winnowSelected(df, docKey, textCol, k, w)
      // explode_OUTER, deliberately: plain explode triggers
      // InferFiltersFromGenerate, whose size(__sel) > 0 predicate
      // pushes down THROUGH the projections with every alias
      // substituted — the full window-min expression (gram-hash array
      // re-computed per window) lands in a per-row scan filter and
      // turns a linear pass quadratic (measured: sf0.01 ran minutes
      // instead of seconds). The rule skips outer generators, and the
      // two are row-identical here because __sel is non-empty for
      // every retained doc (m >= 1 ⇒ at least one window). The
      // isNotNull guard keys on the GENERATOR OUTPUT, so it cannot be
      // pushed below the generate and stays free.
      .select(col(docKey), explode_outer(col("__sel")).as("__s"))
      .filter(col("__s").isNotNull)
      .select(col(docKey), col("__s.pos").as("pos"), col("__s.fp").as("fp"))

  /** The shared selection pipeline: (docKey, __sel array<struct<pos,fp>>)
    * with __sel already per-doc distinct. Hot path is the native
    * [[graft.functions.WinnowSelect]] expression (one pass per row: md5
    * over gram byte ranges + a linear rightmost-min window scan); the
    * declarative HOF pipeline below is the bit-identical reference
    * implementation the spec cross-checks — the vec_dot arrangement. */
  private def winnowSelected(df: DataFrame, docKey: String, textCol: String,
                             k: Int, w: Int): DataFrame =
    // No isNotNull here: a filter on __sel pushes BELOW the projection
    // and evaluates winnow_select a second time per row (PlanShapeSpec
    // pins the single evaluation). Short docs carry a null __sel; both
    // consumers explode_outer and drop the null on the GENERATOR
    // OUTPUT, which cannot be pushed past the generate.
    df.select(col(docKey),
        graft.functions.TextHash.winnow_select(lower(col(textCol)), k, w)
          .as("__sel"))

  /** Reference implementation of [[winnowSelected]] as pure declarative
    * column expressions — kept for the spec's native-vs-declarative
    * cross-check; semantics documented there apply to both. */
  private[graft] def winnowSelectedHof(df: DataFrame, docKey: String,
                                     textCol: String,
                                     k: Int, w: Int): DataFrame = {
    require(k >= 2, s"gram width k must be >= 2 chars, got $k")
    require(w >= 1, s"window must span >= 1 grams, got $w")
    val base = df
      .select(col(docKey), lower(col(textCol)).as("__t"))
      .withColumn("__m", (length(col("__t")) - k + 1).cast("int"))
    // Gram hashes project ONCE per doc (attribute, not expression — HOF
    // lambdas re-evaluate captured expressions per element); the short-doc
    // guard keeps sequence() from running backwards.
    val hashed = base.withColumn("__hs",
      when(col("__m") >= 1, transform(sequence(lit(1), col("__m")),
        i => conv(substring(md5(col("__t").substr(i, lit(k))), 1, 15), 16, 10)
          .cast("long")))
        .otherwise(lit(Array.empty[Long])))
    // A doc with 1 <= m < w grams is one clamped window (the slice stops
    // at the array end); selection still yields its minimum.
    val sel = transform(
      sequence(lit(1), greatest(col("__m") - w + 1, lit(1))),
      i => {
        val s = slice(col("__hs"), i, lit(w))
        // Rightmost occurrence of the window min: position from the
        // right end via reverse + first-position, folded back to the
        // 1-based char index of the selected gram.
        struct(
          (i + size(s) - array_position(reverse(s), array_min(s)))
            .cast("int").as("pos"),
          array_min(s).as("fp"))
      })
    hashed.filter(col("__m") >= 1)
      .select(col(docKey), array_distinct(sel).as("__sel"))
  }

  /** Document pairs sharing at least `minShared` winnowing fingerprint
    * HASHES, with the containment-style overlap ratio
    * shared / min(|fps_a|, |fps_b|) (6dp-rounded). The MOSS shape: the
    * join key is the fingerprint hash — candidates only meet inside a
    * shared fingerprint's bucket, never all-pairs — and the guarantee
    * above means any ≥ w+k−1-char shared substring produces at least
    * one meeting. A boilerplate fingerprint shared by D docs costs
    * O(D²) candidate rows in its bucket — the accepted LSH-band shape;
    * winnow w (selection density ~2/(w+1)) is the knob. Output:
    * (a, b, n_shared, overlap), a < b under the doc key's ordering. */
  def winnowSimilarPairs(df: DataFrame, docKey: String, textCol: String,
                         k: Int, w: Int, minShared: Int): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    // Distinct HASH set per doc (positions drop — two docs sharing a
    // fingerprint at different offsets still match); sizes ride along so
    // the overlap close needs no second aggregation.
    val fps = winnowSelected(df, docKey, textCol, k, w)
      .select(col(docKey),
        array_distinct(transform(col("__sel"), s => s.getField("fp"))).as("__f"))
      // explode_outer for the same InferFiltersFromGenerate reason as
      // [[winnowFingerprints]] — the inferred size() filter would
      // re-inline the whole selection pipeline into the scan. __f is
      // never empty for a retained doc; the join key drops any null.
      .select(col(docKey), size(col("__f")).as("__nf"),
        explode_outer(col("__f")).as("fp"))
      .filter(col("fp").isNotNull)
    val l = fps.select(col(docKey).as("a"), col("__nf").as("__na"), col("fp"))
    val r = fps.select(col(docKey).as("b"), col("__nf").as("__nb"), col("fp"))
    l.join(r, Seq("fp"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"), col("__na"), col("__nb"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .withColumn("overlap", round(
        col("n_shared").cast(DoubleType) / least(col("__na"), col("__nb")), 6))
      .select(col("a"), col("b"), col("n_shared"), col("overlap"))
  }

  /** Unicode NFC normalization — the canonicalization step BEFORE any
    * hash-keyed dedup on multilingual text: "café" as e+combining-acute
    * and as precomposed é are the same text to a reader but different
    * bytes to md5/minhash, so un-normalized corpora under-dedup exactly
    * the documents that repeat across sources with different encoders.
    * Both engines implement UAX #15 (JDK `java.text.Normalizer` here,
    * utf8proc's `nfc_normalize` in the oracle), so the outputs agree
    * code point for code point. No Catalyst expression form exists, so
    * this is the mapPartitions tier like the codecs — map-only, zero
    * shuffles; the Normalizer is stateless and shared per partition. */
  def normalizeNfc(df: org.apache.spark.sql.DataFrame, docKey: String,
                   textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Encoders
    val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    df.select(col(docKey).cast("long"), col(textCol))
      .as[(Long, String)](inEnc)
      .mapPartitions(_.map { case (id, t) =>
        (id, if (t == null) null
             else java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC))
      })(inEnc)
      .toDF(docKey, textCol)
  }

  /** C4-style cleaning: redact URLs and emails to placeholder tokens,
    * collapse runs of spaces, trim. Patterns are deliberately simple
    * (`\S`-based) so Java regex and the oracle's RE2 agree; order matters —
    * URLs first, or the email pass would eat `scheme://user@host` forms.
    * Map-only codegen'd work. */
  def cleanText(c: Column): Column = {
    val noUrl = regexp_replace(c, "https?://\\S+", "<URL>")
    val noMail = regexp_replace(noUrl, "\\S+@\\S+", "<EMAIL>")
    trim(regexp_replace(noMail, " +", " "))
  }

  /** PII patterns, chosen from the Java-regex ∩ RE2 dialect (no
    * backrefs, no lookaround) so the Spark expression and the DuckDB
    * oracle match the SAME spans: a precise email shape (unlike
    * `cleanText`'s blunt `\S+@\S+` scrub, these keep surrounding
    * punctuation), NANP-style phone, SSN, dotted-quad IPv4. The `\b`
    * bounds make a BARE dotted quad like `1.2.3.4` in release notes
    * mask as <IP> (a `v`-prefixed `v1.2.3.4` does not — no word
    * boundary after the `v`); acceptable for a redactor whose
    * false-positive cost is a masked token, not a dropped document. */
  val EmailRe  = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe  = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
  val SsnRe    = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val Ipv4Re   = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** PII redaction for training corpora: mask emails, SSNs, phones and
    * IPv4s with typed placeholder tokens. Order is load-bearing: email
    * first (an address can embed digit runs the later passes would
    * split), SSN before phone (disjoint shapes, but the 3-2-4 grouping
    * must not be half-eaten by a phone partial), IP last. Map-only
    * codegen'd `regexp_replace` chain — zero shuffles, linear in bytes,
    * the 100 TB shape for a per-row scrubber. */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(c,
      EmailRe, "<EMAIL>"), SsnRe, "<SSN>"), PhoneRe, "<PHONE>"), Ipv4Re, "<IP>")

  /** Per-category PII hit counts, STAGED to mirror `redactPii` exactly:
    * each category is counted on the text with all earlier categories
    * already masked, so the counts are precisely the spans the redactor
    * replaces — an audit reconciling "did we mask everything we
    * counted?" balances to zero. (Counting every pattern on the raw
    * text instead would double-count overlaps: in
    * `555-123-4567@relay.example.com` the email swallows the digits,
    * yet PhoneRe still matches them raw — a phantom unmasked phone.) */
  def piiCounts(c: Column): Seq[(String, Column)] = {
    val afterEmail = regexp_replace(c, EmailRe, "<EMAIL>")
    val afterSsn   = regexp_replace(afterEmail, SsnRe, "<SSN>")
    val afterPhone = regexp_replace(afterSsn, PhoneRe, "<PHONE>")
    Seq(
      "n_email" -> regexp_count(c, lit(EmailRe)),
      "n_ssn"   -> regexp_count(afterEmail, lit(SsnRe)),
      "n_phone" -> regexp_count(afterSsn, lit(PhoneRe)),
      "n_ipv4"  -> regexp_count(afterPhone, lit(Ipv4Re)))
  }

  /** Word-level repetition ratio: 1 − distinct/total words — the Gopher
    * repetition signal (high = boilerplate/spam). */
  def repetitionRatio(text: Column): Column = {
    val ws = tokens(lower(text))
    lit(1.0) - size(array_distinct(ws)).cast(DoubleType) / size(ws)
  }

  /** Top-k TF-IDF terms per document — the corpus-statistics operator the
    * per-row heuristics above can't express (term weight depends on EVERY
    * document).
    *
    * Plan: explode words ONCE; tf = one (doc, word) shuffle with map-side
    * combine; df derives from tf — tf already holds exactly one row per
    * distinct (doc, word), so `tf.groupBy(word).count()` IS the document
    * frequency, and the raw corpus never explodes a second time (the df
    * shuffle carries narrow pre-aggregated rows). The corpus size N is a
    * broadcast 1-row agg; the word→df join shuffles narrow (word, count)
    * rows. Rank per doc = one more doc-key shuffle.
    * IDF is the smoothed RATIONAL form (N+1)/(df+1) — same ordering as the
    * log form, but products/quotients of exact integers are bit-identical
    * across engines, where ln() is libm-dependent and would flake the
    * differential oracle. */
  def tfidfTopK(df: DataFrame, docKey: String, textCol: String, k: Int): DataFrame = {
    val words = df.select(col(docKey), explode(tokens(lower(col(textCol)))).as("word"))
    val tf = words.groupBy(col(docKey), col("word")).agg(count(lit(1)).as("tf"))
    // The tf >= 1 filter is always true (count of a present group) but
    // makes this branch consume tf's count column: without it, column
    // pruning strips the count from the partial aggregate and the two
    // branches' exchanges stop being canonically equal — WITH it, AQE's
    // exchange reuse materializes the exploded (doc, word) shuffle once
    // and reads it twice (asserted in ExtSpec on the executed plan).
    val dfreq = tf.filter(col("tf") >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n"))
    val scored = tf.join(dfreq, "word").crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf").cast(DoubleType) * (col("n") + 1) / (col("df") + 1), 6))
    graft.ops.Analytics.topKPerGroup(scored, Seq(docKey),
        Seq(col("score").desc, col("word")), k, rankCol = "rank")
      .select(col(docKey), col("word"), col("score"), col("rank").cast("int").as("rank"))
  }

  /** Duplicate-element fraction over a pre-split element array (lines,
    * paragraphs, fixed-word chunks): the fraction of elements that are a
    * repeat of an earlier element = (total − distinct) / total — the
    * Gopher duplicate line / paragraph fraction signal. Pure higher-order
    * expression, zero shuffles; null on an empty array. */
  def dupElemFraction(elems: Column): Column =
    (size(elems) - size(array_distinct(elems))).cast(DoubleType) / size(elems)

  /** Character-weighted twin of [[dupElemFraction]]: the fraction of
    * CHARACTERS sitting inside repeat occurrences =
    * (Σ len over all elements − Σ len over distinct elements) / Σ len.
    * Catches the "few but huge duplicated paragraphs" doc that the
    * count-based fraction under-scores. Null when the elements hold zero
    * characters. */
  def dupElemCharFraction(elems: Column): Column = {
    def chars(a: Column): Column =
      aggregate(transform(a, x => length(x).cast("long")), lit(0L), _ + _)
    val total = chars(elems)
    (total - chars(array_distinct(elems))).cast(DoubleType) / total
  }

  /** Per-document word n-gram repetition signals — Gopher's
    * "top n-gram character fraction" (n = 2..4) and "duplicated n-gram
    * character fraction" (n = 5..10), both normalized by the document's
    * character length:
    *
    *   top_frac = cnt(top gram) · len(top gram) / len(text)
    *   dup_frac = Σ over grams with cnt ≥ 2 of cnt · len(gram) / len(text)
    *
    * where len(gram) is the space-joined n-gram string's length, the top
    * gram ties deterministically to the lexicographically smallest at the
    * max count, and words are lowercased for gram identity. dup_frac
    * counts overlapping occurrences independently — a documented
    * upper-bound estimate of true character coverage (exact
    * non-overlapping marking is inherently sequential per document; the
    * estimate keeps the operator a combinable aggregation, and the filter
    * direction is the same: high means repetitive).
    *
    * Plan at 100 TB: grams are built map-side by one transform(sequence)
    * over the token array (no self-join), then ONE (doc, gram) hash
    * aggregation with map-side combine — a boilerplate gram repeated 10⁶×
    * in a doc pre-reduces inside each task — then a doc-key window whose
    * hash partitioning also satisfies the final groupBy (no third
    * shuffle). Docs with fewer than n words have no grams and surface
    * with zero fractions through the closing left join. */
  def ngramRepetition(df: DataFrame, docKey: String, textCol: String,
                      n: Int): DataFrame = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    val ws = tokens(lower(col(textCol)))
    val grams = df.filter(size(ws) >= n)
      .select(col(docKey), length(col(textCol)).as("__tlen"),
        explode(transform(sequence(lit(1), size(ws) - (n - 1)),
          i => concat_ws(" ", slice(ws, i, lit(n))))).as("__g"))
    val counts = grams
      .groupBy(col(docKey), col("__tlen"), col("__g"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__glen", length(col("__g")).cast("long"))
    val w = Window.partitionBy(col(docKey))
      .orderBy(col("__cnt").desc, col("__g"))
    val sigs = counts
      .withColumn("__rn", row_number().over(w))
      .groupBy(col(docKey), col("__tlen"))
      .agg(
        max(when(col("__rn") === 1, col("__cnt") * col("__glen"))).as("__topchars"),
        sum(when(col("__cnt") >= 2, col("__cnt") * col("__glen"))
          .otherwise(lit(0L))).as("__dupchars"))
      .select(col(docKey),
        round(col("__topchars").cast(DoubleType) / col("__tlen"), 6).as("top_frac"),
        round(col("__dupchars").cast(DoubleType) / col("__tlen"), 6).as("dup_frac"))
    df.select(col(docKey)).join(sigs, Seq(docKey), "left")
      .na.fill(0.0, Seq("top_frac", "dup_frac"))
  }

  /** Split each document into consecutive `budget`-token chunks —
    * long-document splitting, the upstream twin of
    * [[graft.ext.Sampling.packByBudget]] (split oversized docs first,
    * then pack the pieces into shard-sized sequences). Output one row
    * per chunk: (docKey, chunk_idx, textCol, n_tokens), chunk_idx
    * 0-based in document order, every chunk except possibly the last
    * holding exactly `budget` whitespace tokens. Pure map-only
    * higher-order expression (transform + slice + posexplode) — zero
    * shuffles, embarrassingly parallel at any corpus size. */
  def chunkByBudget(df: DataFrame, docKey: String, textCol: String,
                    budget: Int): DataFrame = {
    require(budget >= 1, s"token budget must be >= 1, got $budget")
    val ws = tokens(col(textCol))
    val nChunks = ceil(size(ws) / lit(budget.toDouble)).cast("int")
    df.select(col(docKey),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => array_join(slice(ws, i * budget + 1, lit(budget)), " ")))
          .as(Seq("chunk_idx", textCol)))
      .withColumn("n_tokens", size(tokens(col(textCol))))
  }

  /** SLIDING-window chunking — the LM context-window shape: chunks of
    * up to `size` whitespace tokens starting every `stride` tokens, so
    * consecutive chunks OVERLAP by `size − stride` (the overlap that
    * keeps context across chunk boundaries at training time;
    * `stride == size` degenerates to [[chunkByBudget]]'s disjoint
    * split). Chunk starts are 0, stride, 2·stride, …; the last start is
    * the first multiple of stride at-or-past `n − size`, so coverage is
    * complete (stride ≤ size guarantees no gap) and only the final
    * chunk may run short. A doc of ≤ `size` tokens is one chunk.
    * Same map-only posexplode shape as [[chunkByBudget]] — zero
    * shuffles, embarrassingly parallel. */
  def chunkSliding(df: DataFrame, docKey: String, textCol: String,
                   size: Int, stride: Int): DataFrame = {
    require(size >= 1, s"chunk size must be >= 1, got $size")
    require(stride >= 1 && stride <= size,
      s"stride must be in [1, size]: stride $stride, size $size")
    val ws = tokens(col(textCol))
    val n = org.apache.spark.sql.functions.size(ws)
    // Per-doc counts are tiny — double division is exact here, the
    // chunkByBudget convention (prefix sums over corpus-scale values
    // are where `div` is load-bearing).
    val nChunks = when(n <= size, lit(1))
      .otherwise(ceil((n - size) / lit(stride.toDouble)).cast("int") + 1)
    df.select(col(docKey),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => array_join(slice(ws, i * stride + 1, lit(size)), " ")))
          .as(Seq("chunk_idx", textCol)))
      .withColumn("n_tokens", org.apache.spark.sql.functions.size(tokens(col(textCol))))
  }

  /** Out-of-vocabulary ratio per document: the fraction of a doc's word
    * OCCURRENCES outside the corpus's top-`k` vocabulary — a
    * corpus-statistics quality signal (high OOV = noise, code, or a
    * language the vocab doesn't cover; the cheap stand-in for LM
    * perplexity scoring, with the same plan shape a real one would have).
    *
    * Plan: one explode feeds both the vocabulary (word shuffle, rank by
    * frequency with a deterministic word tiebreak) and the per-doc join;
    * the vocabulary is k rows — broadcast up to ~10⁶ entries, so the
    * corpus side never shuffles for the membership test. The ratio is a
    * quotient of exact integers → bit-identical across engines. */
  def oovRatio(df: DataFrame, docKey: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, "vocabulary size must be >= 1")
    val words = df.select(col(docKey), explode(tokens(lower(col(textCol)))).as("word"))
    // Global top-k via orderBy+limit, which Spark plans as
    // TakeOrderedAndProject: a per-partition k-heap + driver merge — O(k)
    // memory anywhere, no single-partition global window.
    val vocab = words.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(k)
      .select(col("word"), lit(1).as("__in_vocab"))
    words.join(broadcast(vocab), Seq("word"), "left")
      .groupBy(col(docKey))
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("__in_vocab").isNull, 1).otherwise(0)).as("n_oov"))
      .withColumn("oov_ratio",
        round(col("n_oov").cast(DoubleType) / col("n_words"), 6))
  }

  /** CCNet-style n-gram LM perplexity scoring — the quality filter
    * real pretraining pipelines run between dedup and mixing: train a
    * small LM on a clean reference corpus, score every crawl document
    * by perplexity under it, and keep/bucket by score (fluent text
    * scores low, gibberish and boilerplate score high). The model here
    * is an add-one-smoothed word BIGRAM LM (a production pipeline
    * swaps in a 5-gram KenLM through the same join shape — the model
    * is just a (history, word) → count table either way):
    *
    *   P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)
    *
    * with V = |reference vocabulary|; an unseen history degrades to
    * the uniform 1/(V) floor, so out-of-domain text is penalized, not
    * crashed on. Per-document perplexity = exp(−Σ ln P / n) over the
    * doc's n word bigrams; documents with fewer than two words emit
    * n_bigrams 0 and a NULL ppl (they carry no evidence — the caller
    * decides their fate).
    *
    * Numeric contract (the [[charEntropy]] convention): each bigram's
    * ln P is 6dp-rounded — absorbing the engines' last-ulp ln()
    * disagreement — and summed as EXACT decimals, so the total is
    * independent of row order; the closing exp/divide/round is one
    * IEEE tree.
    *
    * Shape at 100 TB: the model is TWO combine-enabled aggregations
    * over the reference (reference corpora are curated and small by
    * construction — wiki-scale, not crawl-scale); V rides in as a
    * broadcast single-row agg. Scoring is one explode (map-only
    * slice/zip, no per-element re-evaluation) and a left join on the
    * bigram key — AQE broadcasts the model when it fits, and a
    * crawl-scale model falls back to a hash join whose skewed keys
    * ("of the") cost probe-side time, not correctness; the per-doc
    * close is one combine-enabled agg. */
  /** Word-bigram instances of a frame: (keep..., __w1, __w2) — zip of
    * the two shifted slices; the lambda touches only its own variables
    * (the charEntropy HOF lesson — captured expressions re-evaluate
    * per element). Shared by the add-one and interpolated LMs. */
  private def wordBigrams(d: DataFrame, keep: Seq[String],
                          text: String): DataFrame = {
    val ws = tokens(lower(col(text)))
    d.withColumn("__bp", explode(zip_with(
        slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))))
      .select(keep.map(col) ++
        Seq(col("__bp.w1").as("__w1"), col("__bp.w2").as("__w2")): _*)
  }

  /** PMI-ranked collocations: the corpus's strongest two-word
    * associations — pmi = ln(p(ab) / (p(a)·p(b))) over whitespace
    * bigrams, reported for pairs seen ≥ `minCount` times (rare-pair
    * PMI is noise by construction). The standard phrase-mining /
    * tokenizer-diagnostics table (which word pairs behave as one
    * unit).
    *
    * Plan: one bigram explode → combine-enabled pair counts; one word
    * explode → vocab counts; two keyed joins of the (already
    * aggregated, vocab-bounded) pair table against the unigram table;
    * totals ride as broadcast single-row aggs; top-k closes as a
    * TakeOrdered heap. The corpus is never joined row-level — only
    * count tables meet. Numeric contract: counts are exact longs; the
    * pmi expression is ONE double tree (same shape in the oracle),
    * rounded 6dp. */
  def collocations(df: DataFrame, textCol: String,
                   minCount: Long, k: Int): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    require(minCount >= 1 && k >= 1, "need minCount >= 1 and k >= 1")
    val pairs0 = wordBigrams(df, Seq.empty, textCol)
      .groupBy(col("__w1").as("w1"), col("__w2").as("w2"))
      .agg(count(lit(1)).as("n_pair"))
    val uni = df.select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n_w"))
    // Totals BEFORE the min-count filter — p(ab) and p(a) are relative
    // to the whole corpus, not the surviving pairs.
    val m = pairs0.agg(sum(col("n_pair")).cast(DoubleType).as("__m"))
    val n = uni.agg(sum(col("n_w")).cast(DoubleType).as("__n"))
    pairs0.filter(col("n_pair") >= minCount)
      .join(uni.select(col("w").as("w1"), col("n_w").as("__na")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("n_w").as("__nb")), Seq("w2"))
      .crossJoin(broadcast(m)).crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("n_pair"),
        round(log((col("n_pair").cast(DoubleType) / col("__m")) /
          ((col("__na").cast(DoubleType) / col("__n")) *
           (col("__nb").cast(DoubleType) / col("__n")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  def perplexity(df: DataFrame, docKey: String, textCol: String,
                 ref: DataFrame, refTextCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def bigramsOf(d: DataFrame, keep: Seq[String], text: String): DataFrame =
      wordBigrams(d, keep, text)
    val refBi = bigramsOf(ref, Seq.empty, refTextCol)
      .groupBy("__w1", "__w2").agg(count(lit(1)).as("__c12"))
    val refUni = ref
      .select(explode(tokens(lower(col(refTextCol)))).as("__w1"))
      .groupBy("__w1").agg(count(lit(1)).as("__c1"))
    val vocabSize = refUni.agg(count(lit(1)).as("__v"))
    val scored = bigramsOf(df, Seq(docKey), textCol)
      .join(refBi, Seq("__w1", "__w2"), "left")
      .join(refUni, Seq("__w1"), "left")
      .crossJoin(broadcast(vocabSize))
      .withColumn("__lp", round(log(
          (coalesce(col("__c12"), lit(0L)) + 1).cast(DoubleType) /
            (coalesce(col("__c1"), lit(0L)) + col("__v"))), 6)
        .cast(DecimalType(25, 6)))
      .groupBy(col(docKey))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__lp")).as("__slp"))
      .withColumn("ppl",
        round(exp((-col("__slp")).cast(DoubleType) / col("n_bigrams")), 6))
      .drop("__slp")
    df.select(col(docKey)).distinct()
      .join(scored, Seq(docKey), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
  }

  /** Jelinek–Mercer INTERPOLATED bigram perplexity — the smoothing
    * upgrade over [[perplexity]]'s add-one model:
    *
    *   P(w2|w1) = λ·P_ML(w2|w1) + (1−λ)·(c(w2)+1)/(T+V)
    *
    * with P_ML = c(w1 w2)/c(w1) (0 for an unseen history), T the
    * reference token count, V its vocabulary. Add-one flattens every
    * conditional toward uniform (a frequent continuation after a rare
    * history is crushed by the +V denominator); interpolation keeps the
    * ML bigram signal at weight λ and backs off to the add-one UNIGRAM
    * — the textbook fix, and the standard baseline below Kneser–Ney.
    * `lambdaHundredths` ∈ [0, 99]: the unigram floor must keep positive
    * mass or an unseen history would hit ln(0).
    *
    * Numeric contract: P_ML is one exact-integer IEEE divide, the
    * λ-mix two multiplies and an add of correctly-rounded doubles (λ
    * inlined as the same literal in both engines), each bigram's ln
    * 6dp-rounded and decimal-summed — [[perplexity]]'s determinism
    * verbatim. Same plan shape: two reference aggs + broadcast totals,
    * one extra broadcast join for the w2 unigram count. */
  /** Interpolated KNESER–NEY bigram perplexity — the classical
    * state-of-the-art above [[perplexityInterpolated]]'s
    * Jelinek–Mercer mix (Kneser & Ney 1995; Chen & Goodman 1999 rank
    * interpolated KN strongest among n-gram smoothers):
    *
    *   P(w2|w1) = max(c(w1w2) − D, 0)/c(w1)
    *              + D·N1+(w1,·)/c(w1) · Pcont(w2)     [seen history]
    *   Pcont(w2) = (N1+(·,w2) + 1)/(B + V)            [novelty + floor]
    *
    * D = absolute discount, N1+(w1,·) = the history's distinct
    * continuation count, N1+(·,w2) = the word's distinct HISTORY
    * count — the "appears in many contexts" novelty signal that makes
    * KN back off to versatility instead of raw frequency (the reason
    * "francisco" scores low despite being frequent: it follows only
    * "san"). B = distinct bigram types, V = vocabulary. A history
    * that is unseen (c=0) or has no observed continuation backs off
    * to Pcont alone. The +1/(B+V) add-one floor on Pcont deviates
    * from the textbook (which strands unseen words at 0) for the same
    * reason every model here floors: ln(0) must be unreachable.
    * `discountHundredths` ∈ [1, 99].
    *
    * Numeric contract and plan shape: [[perplexityInterpolated]]
    * verbatim — bounded reference aggs broadcast onto the doc
    * bigrams, per-bigram ln 6dp-rounded, decimal-exact per-doc sums,
    * exp(−mean) rounded 6dp; sub-2-word docs abstain with NULL ppl. */
  def perplexityKneserNey(df: DataFrame, docKey: String, textCol: String,
                          ref: DataFrame, refTextCol: String,
                          discountHundredths: Int): DataFrame = {
    require(discountHundredths >= 1 && discountHundredths < 100,
      s"discount must be in [1, 99] hundredths, got $discountHundredths")
    import org.apache.spark.sql.types.DecimalType
    val disc = discountHundredths / 100.0
    val refBi = wordBigrams(ref, Seq.empty, refTextCol)
      .groupBy("__w1", "__w2").agg(count(lit(1)).as("__c12"))
    val refUni = ref
      .select(explode(tokens(lower(col(refTextCol)))).as("__w1"))
      .groupBy("__w1").agg(count(lit(1)).as("__c1"))
    val hist = refBi.groupBy(col("__w1")).agg(count(lit(1)).as("__n1p"))
    val cont = refBi.groupBy(col("__w2")).agg(count(lit(1)).as("__nc"))
    val totals = refBi.agg(count(lit(1)).as("__b"))
      .crossJoin(refUni.agg(count(lit(1)).as("__v")))
    val pc = (coalesce(col("__nc"), lit(0L)) + 1).cast(DoubleType) /
      (col("__b") + col("__v")).cast(DoubleType)
    val seen = coalesce(col("__c1"), lit(0L)) > 0 &&
      coalesce(col("__n1p"), lit(0L)) > 0
    val pkn = when(seen,
        greatest(coalesce(col("__c12"), lit(0L)).cast(DoubleType) - disc,
          lit(0.0)) / col("__c1") +
          lit(disc) * col("__n1p") / col("__c1") * pc)
      .otherwise(pc)
    // One reference table per bigram SIDE: c(w1) and N1+(w1,·) pre-join
    // on the vocab (bounded rows, driver-free) so the doc-bigram stream
    // pays three broadcast joins, not four.
    val w1Side = refUni.join(hist, Seq("__w1"), "left")
    val scored = wordBigrams(df, Seq(docKey), textCol)
      .join(refBi, Seq("__w1", "__w2"), "left")
      .join(w1Side, Seq("__w1"), "left")
      .join(cont, Seq("__w2"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__lp", round(log(pkn), 6).cast(DecimalType(25, 6)))
      .groupBy(col(docKey))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__lp")).as("__slp"))
      .withColumn("ppl",
        round(exp((-col("__slp")).cast(DoubleType) / col("n_bigrams")), 6))
      .drop("__slp")
    df.select(col(docKey)).distinct()
      .join(scored, Seq(docKey), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
  }

  def perplexityInterpolated(df: DataFrame, docKey: String, textCol: String,
                             ref: DataFrame, refTextCol: String,
                             lambdaHundredths: Int): DataFrame = {
    require(lambdaHundredths >= 0 && lambdaHundredths < 100,
      s"lambda must be in [0, 99] hundredths, got $lambdaHundredths")
    import org.apache.spark.sql.types.DecimalType
    val lam = lambdaHundredths / 100.0
    val refBi = wordBigrams(ref, Seq.empty, refTextCol)
      .groupBy("__w1", "__w2").agg(count(lit(1)).as("__c12"))
    val refUni = ref
      .select(explode(tokens(lower(col(refTextCol)))).as("__w1"))
      .groupBy("__w1").agg(count(lit(1)).as("__c1"))
    val totals = refUni.agg(count(lit(1)).as("__v"), sum(col("__c1")).as("__t"))
    val uniOf2 = refUni.select(col("__w1").as("__w2"), col("__c1").as("__c2"))
    val pBi = when(coalesce(col("__c1"), lit(0L)) > 0,
      coalesce(col("__c12"), lit(0L)).cast(DoubleType) / col("__c1"))
      .otherwise(lit(0.0))
    val pUni = (coalesce(col("__c2"), lit(0L)) + 1).cast(DoubleType) /
      (col("__t") + col("__v")).cast(DoubleType)
    val scored = wordBigrams(df, Seq(docKey), textCol)
      .join(refBi, Seq("__w1", "__w2"), "left")
      .join(refUni, Seq("__w1"), "left")
      .join(uniOf2, Seq("__w2"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("__lp",
        round(log(lit(lam) * pBi + lit(1 - lam) * pUni), 6)
          .cast(DecimalType(25, 6)))
      .groupBy(col(docKey))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__lp")).as("__slp"))
      .withColumn("ppl",
        round(exp((-col("__slp")).cast(DoubleType) / col("n_bigrams")), 6))
      .drop("__slp")
    df.select(col(docKey)).distinct()
      .join(scored, Seq(docKey), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
  }
}
