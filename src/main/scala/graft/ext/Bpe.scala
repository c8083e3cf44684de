package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Real merge-table BPE token counting — replaces the "BPE-ish" regex
  * ESTIMATE (`TextAnalysis.tokenCountBpe`) for the places a drift of
  * tens of percent matters: pack/chunk budgets keyed on token counts.
  *
  * Algorithm (the Sennrich-style greedy segmenter, deterministic
  * variant): lowercase text splits into pre-tokens (alpha runs, digit
  * runs, single non-alphanumeric symbols — whitespace never tokenizes);
  * each pre-token starts as its code-point sequence and repeatedly
  * merges the best-ranked adjacent pair per the merge table — leftmost
  * occurrence on rank ties, rescanning after every merge — until no
  * table pair remains. Rescan-per-merge (rather than merge-all-
  * occurrences-per-scan) is chosen because one step = one list rewrite,
  * which the DuckDB oracle reproduces EXACTLY as a recursive CTE — the
  * fixed point is the classic greedy BPE segmentation for
  * non-overlapping tables like this one.
  *
  * Execution shape: `mapPartitions` with the rank table compiled ONCE
  * per partition into a hash map — per-pair lookup is O(1), the whole
  * loop is O(len²) worst-case on a pre-token (len ≤ a word), and the
  * operator stays map-only: zero shuffles, embarrassingly parallel,
  * the same shape at 100 TB. An imperative loop has no Catalyst
  * expression form (HOFs cannot express iterate-until-fixed-point, and
  * their lambdas re-evaluate captured expressions per element — the
  * r7 charEntropy lesson), so mapPartitions is the honest tier here,
  * exactly like the multimodal codecs.
  *
  * Multi-byte text segments by CODE POINT (surrogate-safe), so CJK or
  * accented input degrades to per-character tokens instead of
  * miscounting — the worst case is an honest upper bound, never a
  * crash or a split surrogate. Byte-fallback mode (`byteFallback =
  * true` on the public operators) goes further: non-ASCII runs become
  * pre-tokens of their own and explode to UTF-8 `<0xHH>` byte symbols,
  * so a byte-level merge table can compress CJK below
  * one-token-per-character — per-code-point mode's structural floor.
  */
object Bpe {

  /** The merge table, rank = position (hand-computed over frequent
    * English pairs; a production vocabulary would broadcast ~50k
    * learned merges through the same code path). */
  val Merges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("h", "e"), ("a", "t"),
    ("e", "n"), ("n", "d"), ("t", "i"), ("e", "s"), ("o", "r"),
    ("o", "u"), ("i", "s"), ("i", "t"), ("a", "l"), ("a", "r"),
    ("s", "t"), ("t", "o"), ("n", "t"), ("e", "d"))

  /** Pre-tokenizer classes (shared with the regex estimator): alpha
    * runs, digit runs, one token per other non-space character. */
  val PreTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** Byte-fallback pre-tokenizer: non-ASCII RUNS become one pre-token
    * (instead of one token per character), so the merge loop gets to
    * operate on their UTF-8 bytes. Ordered before the symbol class —
    * both engines' regex alternation is leftmost-first. */
  val PreTokenPatternBytes = "[a-z]+|[0-9]+|[^\\x00-\\x7f]+|[^a-z0-9\\s]"

  /** LOSSLESS pre-tokenizer for [[encodeIds]]: adds UPPERCASE-run and
    * WHITESPACE-run classes so the alternatives TILE the whole string —
    * every character lands in exactly one pre-token and nothing is
    * dropped or case-folded, which is what makes decode(encode(s)) == s
    * exact (the count/chunk ops lowercase and skip whitespace because
    * they only need sizes; an encoder that feeds a trainer must not). */
  val EncodePattern =
    "[a-z]+|[A-Z]+|[0-9]+|[^\\x00-\\x7f]+|\\s+|[^a-zA-Z0-9\\s]"

  /** [[Merges]] extended with byte-level merges — the demo table for
    * byte-fallback mode (a learned byte-level vocabulary flows through
    * the same parameter). The chains assemble the UTF-8 bytes of 数
    * (E6 95 B0), 据 (E6 8D AE), then the word 数据, and é (C3 A9) —
    * so CJK text compresses BELOW one-token-per-character, which
    * per-code-point mode structurally cannot do. */
  val ByteMerges: Seq[(String, String)] = Merges ++ Seq(
    ("<0xE6>", "<0x95>"), ("<0xE6><0x95>", "<0xB0>"),
    ("<0xE6>", "<0x8D>"), ("<0xE6><0x8D>", "<0xAE>"),
    ("<0xE6><0x95><0xB0>", "<0xE6><0x8D><0xAE>"),
    ("<0xC3>", "<0xA9>"))

  /** Initial symbol sequence of one pre-token. Code-point mode splits
    * surrogate-safely; byte-fallback mode explodes any pre-token
    * containing a non-ASCII character into its UTF-8 bytes rendered as
    * `<0xHH>` markers (uppercase hex — the GPT-2/Llama byte-fallback
    * convention), so sub-character units can merge back up through the
    * table: a 3-byte CJK character costs 3 tokens only until its byte
    * merges are learned, after which frequent multi-character words
    * drop below one token per character. ASCII pre-tokens are
    * byte-identical to their code points, so the two modes differ only
    * where fallback applies. */
  private def initialSymbols(word: String, byteFallback: Boolean
                            ): scala.collection.mutable.ArrayBuffer[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    if (byteFallback && word.exists(_ > 0x7f)) {
      word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .foreach(b => buf += f"<0x${b & 0xff}%02X>")
    } else {
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        val n = Character.charCount(cp)
        buf += word.substring(i, i + n)
        i += n
      }
    }
    buf
  }

  /** Token count of ONE pre-token under `rank` (the greedy merge loop). */
  def tokenCount(word: String, rank: Map[(String, String), Int]): Int =
    mergeLoop(initialSymbols(word, byteFallback = false), rank)

  /** [[tokenCount]] in byte-fallback mode (see [[initialSymbols]]). */
  def tokenCountBytes(word: String, rank: Map[(String, String), Int]): Int =
    mergeLoop(initialSymbols(word, byteFallback = true), rank)

  private def mergeLoop(buf: scala.collection.mutable.ArrayBuffer[String],
                        rank: Map[(String, String), Int]): Int =
    mergeSymbols(buf, rank).length

  /** The greedy merge loop, returning the final SYMBOL sequence (the
    * count ops read only its length; [[encodeIds]] reads the symbols). */
  private def mergeSymbols(buf: scala.collection.mutable.ArrayBuffer[String],
                           rank: Map[(String, String), Int]
                          ): scala.collection.mutable.ArrayBuffer[String] = {
    var done = buf.length <= 1
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j < buf.length - 1) {
        val r = rank.getOrElse((buf(j), buf(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = j }
        j += 1
      }
      if (bestIdx < 0) done = true
      else {
        buf(bestIdx) = buf(bestIdx) + buf(bestIdx + 1)
        buf.remove(bestIdx + 1)
        if (buf.length <= 1) done = true
      }
    }
    buf
  }

  /** LEARN a merge table from the corpus — the training half of the
    * tokenizer story ([[Merges]] is a hand learner's output; this
    * computes one from data). Classic Sennrich BPE on the
    * WORD-FREQUENCY table:
    *
    *  1. ONE distributed corpus pass: pre-tokenize
    *     ([[PreTokenPattern]], the same classes the segmenter uses),
    *     count distinct pre-tokens, keep the `maxVocab` most frequent
    *     (ties broken on the word — deterministic). The vocab table is
    *     bounded by VOCABULARY, not corpus size: this is the only step
    *     that touches the corpus, and it is one explode + one
    *     combine-enabled count agg + a TakeOrdered top-V.
    *  2. `nMerges` training rounds on the collected table (≤ maxVocab
    *     rows of (symbols, count) — driver-bounded metadata, the IVF
    *     centroid / PQ codebook lifecycle): count frequency-weighted
    *     adjacent symbol pairs, take the max (ties lexicographic on
    *     the pair — deterministic on any cluster), merge every
    *     occurrence left-to-right, repeat. Stops early when no
    *     adjacent pair remains.
    *
    * The result feeds [[withTokenCount]] / [[chunkByBpeBudget]] via
    * their `merges` parameter — learn on a corpus sample, tokenize the
    * full corpus, same code path as the hand table. Deterministic: a
    * pure function of the pre-token frequency table, which is itself a
    * pure function of the corpus (repartition-stable, ExtSpec-pinned). */
  def learnMerges(df: DataFrame, textCol: String, nMerges: Int,
                  maxVocab: Int = 100000): Seq[(String, String)] = {
    require(nMerges >= 0, "nMerges must be >= 0")
    require(maxVocab >= 1, "maxVocab must be >= 1")
    val vocab: Seq[(String, Long)] = df
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit(PreTokenPattern), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // Driver loop over the bounded table: symbols start as code points
    // (surrogate-safe, like tokenCount's splitter).
    def codePoints(w: String): Vector[String] = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        b += w.substring(i, i + n); i += n
      }
      b.result()
    }
    // INCREMENTAL pair bookkeeping (the classic Sennrich optimization):
    // pair counts are built once, and each merge round updates only the
    // words that actually CONTAIN the merged pair (tracked by an
    // inverted pair → word-ids index) — subtract the word's old
    // adjacent-pair contributions, rewrite it, add the new ones. A
    // recount-everything round is O(Σ|word|) regardless of how few
    // words change; the delta round is O(Σ|affected word|), so late
    // rounds (which typically touch a handful of rare words) cost
    // almost nothing and nMerges can grow toward real vocabulary sizes
    // without quadratic driver time. Timing: on a 100k-word vocab,
    // 1000 merges drop from ~1000 full 100k-word sweeps to one initial
    // sweep plus deltas proportional to each pair's support — in
    // practice two orders of magnitude on the loop. The arithmetic is
    // exact (adds/subtracts of the same Long terms a recount would
    // produce), so counts — and therefore every (max, tie-break)
    // decision and the returned merge list — are IDENTICAL to the
    // recount implementation's (ExtSpec pins the goldens).
    val words = vocab.map { case (w, n) => (codePoints(w), n) }.toArray
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    // Inverted index: pair → ids of words currently containing it.
    // Entries can go stale (a word rewritten away from a pair is not
    // scrubbed from that pair's set — scrubbing would cost what it
    // saves); stale ids are skipped at use because the merge rewrite
    // is a no-op on a word without the pair.
    val where = scala.collection.mutable.Map
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    def bump(p: (String, String), n: Long, wordId: Int): Unit = {
      val c = counts.getOrElse(p, 0L) + n
      if (c == 0L) counts.remove(p) else counts(p) = c
      if (n > 0) where.getOrElseUpdate(p,
        scala.collection.mutable.Set.empty[Int]) += wordId
    }
    def addPairs(i: Int, sign: Long): Unit = {
      val (syms, n) = words(i)
      var j = 0
      while (j < syms.length - 1) {
        bump((syms(j), syms(j + 1)), sign * n, i)
        j += 1
      }
    }
    words.indices.foreach(addPairs(_, 1L))
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.keysIterator.reduceLeft { (p, q) =>
          val (cp, cq) = (counts(p), counts(q))
          if (cq > cp || (cq == cp &&
            (q._1 < p._1 || (q._1 == p._1 && q._2 < p._2)))) q else p
        }
        merges += best
        val joined = best._1 + best._2
        where.remove(best).foreach(_.foreach { i =>
          val (syms, n) = words(i)
          var has = false
          var j = 0
          while (!has && j < syms.length - 1) {
            has = syms(j) == best._1 && syms(j + 1) == best._2
            j += 1
          }
          if (has) {
            addPairs(i, -1L)
            val out = Vector.newBuilder[String]
            j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 &&
                syms(j + 1) == best._2) {
                out += joined; j += 2
              } else { out += syms(j); j += 1 }
            }
            words(i) = (out.result(), n)
            addPairs(i, 1L)
          }
        })
        round += 1
      }
    }
    merges.result()
  }

  /** Split each document into chunks under a REAL-BPE token budget —
    * `TextAnalysis.chunkByBudget`'s word-count proxy replaced by the
    * merge-table tokenizer, so chunk sizes track what a trainer's
    * tokenizer will actually see. Chunk rule = `packByBudget`'s:
    * a pre-token starts a new chunk when the exclusive prefix sum of
    * BPE counts crosses a budget multiple, so a chunk exceeds `budget`
    * only by (part of) its final pre-token and every document yields
    * ceil(total/budget) chunks (empty docs yield none). Pre-token order
    * is preserved and chunks reassemble to the pre-token stream.
    * Same mapPartitions shape as `withTokenCount`: map-only, zero
    * shuffles, rank table compiled once per partition.
    * Returns (docKey, chunk_idx, textCol, n_tokens_bpe). */
  def chunkByBpeBudget(df: DataFrame, docKey: String, textCol: String,
                       budget: Int,
                       merges: Seq[(String, String)] = Merges,
                       byteFallback: Boolean = false): DataFrame = {
    require(budget >= 1, s"token budget must be >= 1, got $budget")
    val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    val outEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt,
      Encoders.STRING, Encoders.scalaInt)
    val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap
    df.select(col(docKey).cast("long"), lower(col(textCol)))
      .as[(Long, String)](inEnc)
      .mapPartitions { it =>
        val pre = java.util.regex.Pattern.compile(
          if (byteFallback) PreTokenPatternBytes else PreTokenPattern)
        it.flatMap { case (id, text) =>
          val m = pre.matcher(if (text == null) "" else text)
          val chunks = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, String, Int)]
          val sb = new StringBuilder
          var chunkTokens = 0
          var chunkIdx = 0
          var before = 0L // exclusive prefix sum of BPE counts
          while (m.find()) {
            val w = m.group()
            val t = mergeLoop(initialSymbols(w, byteFallback), rank)
            val idx = (before / budget).toInt
            if (idx != chunkIdx && sb.nonEmpty) {
              chunks += ((id, chunkIdx, sb.result(), chunkTokens))
              sb.clear(); chunkTokens = 0
            }
            chunkIdx = idx
            if (sb.nonEmpty) sb.append(' ')
            sb.append(w)
            chunkTokens += t
            before += t
          }
          if (sb.nonEmpty) chunks += ((id, chunkIdx, sb.result(), chunkTokens))
          chunks.iterator
        }
      }(outEnc)
      .toDF(docKey, "chunk_idx", textCol, "n_tokens_bpe")
  }

  /** (docKey, n_tokens_bpe) per document — the real-BPE token count
    * `Sampling.packByBudget` / chunking budgets should be keyed on. */
  def withTokenCount(df: DataFrame, docKey: String, textCol: String,
                     merges: Seq[(String, String)] = Merges,
                     byteFallback: Boolean = false): DataFrame = {
    val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    val outEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt)
    val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap
    df.select(col(docKey).cast("long"), lower(col(textCol)))
      .as[(Long, String)](inEnc)
      .mapPartitions { it =>
        val pre = java.util.regex.Pattern.compile(
          if (byteFallback) PreTokenPatternBytes else PreTokenPattern)
        it.map { case (id, text) =>
          var total = 0
          val m = pre.matcher(if (text == null) "" else text)
          while (m.find())
            total += mergeLoop(initialSymbols(m.group(), byteFallback), rank)
          (id, total)
        }
      }(outEnc)
      .toDF(docKey, "n_tokens_bpe")
  }

  // ───────────── token-id encode / lossless decode (round-trip) ─────────────

  /** Token-id vocabulary induced by a merge table: ids 0–255 are RAW
    * BYTES (a single ASCII char symbol's id is its code point, which IS
    * its UTF-8 byte; a `<0xHH>` byte marker's id is HH — markers only
    * arise for bytes ≥ 0x80, so the two ranges cannot collide), and id
    * 256+i is the OUTPUT symbol of merge i. Every symbol the merge loop
    * can produce has an id by induction: seeds are single chars/bytes,
    * every merge output is enumerated here. If two merges produce the
    * same string the FIRST keeps the id — the decoded bytes are
    * identical either way, so the round-trip cannot tell. */
  def vocabOf(merges: Seq[(String, String)]): Map[String, Int] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      val out = a + b
      if (!m.contains(out)) m(out) = 256 + i
    }
    m.toMap
  }

  /** UTF-8 bytes of a symbol string: `<0xHH>` markers parse to their
    * byte, literal characters contribute their own UTF-8 bytes (merge
    * tables keep the classes separate, but a mixed literal/marker
    * symbol would still decode correctly). */
  private def symbolBytes(sym: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < sym.length) {
      if (i + 5 < sym.length && sym.charAt(i) == '<' &&
          sym.charAt(i + 1) == '0' && sym.charAt(i + 2) == 'x' &&
          sym.charAt(i + 5) == '>') {
        bos.write(Integer.parseInt(sym.substring(i + 3, i + 5), 16))
        i += 6
      } else {
        val cp = sym.codePointAt(i)
        bos.write(new String(Character.toChars(cp))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        i += Character.charCount(cp)
      }
    }
    bos.toByteArray
  }

  private def idOfSymbol(sym: String, vocab: Map[String, Int]): Int =
    vocab.getOrElse(sym,
      if (sym.length == 6 && sym.charAt(0) == '<' && sym.charAt(5) == '>')
        Integer.parseInt(sym.substring(3, 5), 16)
      else if (sym.length == 1 && sym.charAt(0) < 0x80) sym.charAt(0).toInt
      else throw new IllegalStateException(
        s"no vocabulary id for symbol '$sym' — merge table and vocab disagree"))

  private[ext] def encodeIdsWith(text: String, pre: java.util.regex.Pattern,
                                 rank: Map[(String, String), Int],
                                 vocab: Map[String, Int]): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    val m = pre.matcher(if (text == null) "" else text)
    while (m.find())
      mergeSymbols(initialSymbols(m.group(), byteFallback = true), rank)
        .foreach(s => out += idOfSymbol(s, vocab))
    out.toArray
  }

  /** ENCODE one string to its token-id sequence under `merges`
    * (byte-fallback mode, [[EncodePattern]] lossless pre-tokenization).
    * Pure function of (text, merges) — identical ids on driver or any
    * executor. */
  def encodeIds(text: String,
                merges: Seq[(String, String)] = ByteMerges): Array[Int] =
    encodeIdsWith(text, java.util.regex.Pattern.compile(EncodePattern),
      merges.zipWithIndex.toMap, vocabOf(merges))

  /** LOSSLESS DECODE: token ids back to text — ids < 256 are raw bytes,
    * larger ids expand to their merge-output symbol's bytes, and the
    * concatenated byte stream parses back as UTF-8. Inverse of
    * [[encodeIds]] by construction (BpePropertySpec pins
    * decode(encode(s)) == s over arbitrary well-formed strings). */
  def decodeIds(ids: Seq[Int],
                merges: Seq[(String, String)] = ByteMerges): String = {
    val bySym: Map[Int, String] = vocabOf(merges).map(_.swap)
    val bos = new java.io.ByteArrayOutputStream()
    ids.foreach { id =>
      if (id >= 0 && id < 256) bos.write(id)
      else bySym.get(id) match {
        case Some(sym) => bos.write(symbolBytes(sym))
        case None => throw new IllegalArgumentException(
          s"decodeIds: unknown token id $id for this merge table")
      }
    }
    new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Per-document token-id sequences with the round-trip MEASURED, not
    * assumed: (docKey, n_tokens, token_ids, roundtrip_ok) where
    * roundtrip_ok is decode(encode(text)) == text computed in the same
    * pass. `token_ids` is a packed array for downstream consumers
    * (shuffling ids is ~4 bytes/token vs re-encoding text everywhere);
    * query boundaries must explode/scalarize it — the oracle-harness
    * contract. Same mapPartitions tier as [[withTokenCount]]: map-only,
    * zero shuffles, rank + vocab compiled once per partition. Encode
    * does NOT lowercase — decode must reproduce the input
    * byte-for-byte, which is the point. */
  def encodeTokens(df: DataFrame, docKey: String, textCol: String,
                   merges: Seq[(String, String)] = ByteMerges): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap
    val vocab = vocabOf(merges)
    val bySym: Map[Int, String] = vocab.map(_.swap)
    df.select(col(docKey).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val pre = java.util.regex.Pattern.compile(EncodePattern)
        it.map { case (id, text) =>
          val t = if (text == null) "" else text
          val ids = encodeIdsWith(t, pre, rank, vocab)
          val back = {
            val bos = new java.io.ByteArrayOutputStream()
            ids.foreach { tid =>
              if (tid < 256) bos.write(tid) else bos.write(symbolBytes(bySym(tid)))
            }
            new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
          }
          (id, ids.length, ids, back == t)
        }
      }
      .toDF(docKey, "n_tokens", "token_ids", "roundtrip_ok")
  }

  /** BYTES-PER-TOKEN compression by group — the tokenizer-fit metric a
    * training pipeline reports per source/language (a vocabulary that
    * compresses English at 4 bytes/token and code at 1.5 is telling you
    * where its merges were learned). Uses the LOSSLESS encoder (
    * [[EncodePattern]] + byte fallback), so whitespace and case count —
    * the count ops' lowercased/whitespace-free totals would flatter the
    * ratio. Map-only encode, then ONE tiny agg shuffle keyed by the
    * group column (partial agg upstream: the shuffle carries one row
    * per (partition, group)). Ratio = total_bytes / total_tokens over
    * exact integer sums — NOT avg-of-per-doc-ratios, which would weight
    * short docs equally with long ones. */
  def tokenCompression(df: DataFrame, groupCol: String, textCol: String,
                       merges: Seq[(String, String)] = ByteMerges): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap
    val vocab = vocabOf(merges)
    df.select(col(groupCol).cast("string"), col(textCol))
      .as[(String, String)]
      .mapPartitions { it =>
        val pre = java.util.regex.Pattern.compile(EncodePattern)
        it.map { case (g, text) =>
          val t = if (text == null) "" else text
          (g, t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong,
            encodeIdsWith(t, pre, rank, vocab).length.toLong)
        }
      }
      .toDF(groupCol, "__bytes", "__tokens")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__bytes")).as("total_bytes"),
        sum(col("__tokens")).as("total_tokens"))
      .withColumn("bytes_per_token",
        round(col("total_bytes").cast("double") /
          col("total_tokens").cast("double"), 6))
  }
}
