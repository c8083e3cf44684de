package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the winnowing fingerprint selection
  * (Schleimer et al., SIGMOD 2003) — the [[VecMath.vec_dot]] preference
  * order applied to text hashing: the declarative form (a `transform`
  * computing per-gram md5 hashes + a `transform` sliding window-min
  * over slices) is interpreted higher-order-function work whose inner
  * loop re-slices the hash array per window — measured ~40 s for the
  * sf0.1 corpus at local[4]. This expression computes the same
  * selection in one native pass per row: md5 over the gram's UTF-8
  * byte range (no per-gram substring allocation), a linear sliding
  * scan for each window's rightmost minimum, and consecutive dedup
  * (selection positions are non-decreasing — see below — so
  * consecutive dedup IS full per-document distinct).
  *
  * Semantics, bit-compatible with the declarative/oracle form:
  *  - grams are `k` consecutive CODE POINTS (Spark `substr` and DuckDB
  *    `substr` both count characters, not bytes or UTF-16 units);
  *  - fp = first 15 hex digits of md5(gram UTF-8 bytes) as a 60-bit
  *    long (`conv(substring(md5(g),1,15),16,10)`);
  *  - windows are the w-gram slices starting at 1..max(m−w+1, 1), the
  *    last-window clamp included (a doc with fewer than w grams is one
  *    short window);
  *  - each window selects its minimum hash, RIGHTMOST on ties (the
  *    paper's robust rule) — `<=` in the scan;
  *  - the result is the distinct (pos, fp) selections. Positions never
  *    decrease across windows: window i selects pos_i ∈ [i, i+w−1]; in
  *    window i+1 every position q < pos_i still present carries a hash
  *    the rightmost-min rule already passed over, so the new selection
  *    is ≥ pos_i (equal hash picks the rightmost). Hence consecutive
  *    dedup equals global distinct.
  *
  * Returns NULL for a doc shorter than k code points (callers filter —
  * the explode_outer/isNotNull shape, which also sidesteps the
  * InferFiltersFromGenerate pushdown hazard in SCALING.md r12).
  * CodegenFallback: the per-row cost is one native call into this
  * eval; there is no per-element expression tree left to fuse. */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 2, s"gram width k must be >= 2 chars, got $k")
  require(w >= 1, s"window must span >= 1 grams, got $w")

  override def nullable: Boolean = true
  override def prettyName: String = "winnow_select"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_select expects a string column, got $t")
  }

  @transient private lazy val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // Code-point byte offsets: offsets(i) = byte index where code point
    // i starts; offsets(n) = total bytes. One linear walk.
    var n = 0
    var b = 0
    while (b < bytes.length) {
      b += utf8Len(bytes(b)); n += 1
    }
    val m = n - k + 1
    if (m < 1) return null
    val offsets = new Array[Int](n + 1)
    var i = 0; b = 0
    while (b < bytes.length) {
      offsets(i) = b; b += utf8Len(bytes(b)); i += 1
    }
    offsets(n) = bytes.length
    // Per-gram 60-bit hashes: md5 over the gram's byte range, top 15
    // hex digits = first 8 digest bytes >>> 4.
    val md = digest.get()
    val h = new Array[Long](m)
    i = 0
    while (i < m) {
      md.reset()
      md.update(bytes, offsets(i), offsets(i + k) - offsets(i))
      val d = md.digest()
      h(i) = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      i += 1
    }
    // Window scan: rightmost minimum per window (<= keeps the rightest),
    // consecutive dedup on the selected 0-based index.
    val nw = math.max(m - w + 1, 1)
    val out = new java.util.ArrayList[InternalRow](nw)
    var lastSel = -1
    i = 0
    while (i < nw) {
      val end = math.min(i + w, m)
      var minPos = i
      var j = i + 1
      while (j < end) {
        if (h(j) <= h(minPos)) minPos = j
        j += 1
      }
      if (minPos != lastSel) {
        out.add(InternalRow(minPos + 1, h(minPos)))
        lastSel = minPos
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def utf8Len(first: Byte): Int = {
    val b = first & 0xff
    if (b < 0x80) 1
    else if (b < 0xe0) 2
    else if (b < 0xf0) 3
    else 4
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Karp–Rabin content-defined-chunking boundary scan — the
  * [[WinnowSelect]] treatment for the CDC hot loop: the declarative
  * form (a per-position filter lambda evaluating `window` element_at
  * products interpreted) ran single-threaded over the one-file corpus
  * partition at ~10⁷ interpreted evals per pass and showed multi-second
  * jitter; this computes the same boundary set in one native pass of
  * primitive long arithmetic.
  *
  * Semantics (the q_chunk_cdc oracle's, bit-for-bit): positions are
  * CODE POINTS (DuckDB substr/len semantics — note the declarative
  * form's split("") counted UTF-16 code units, which diverges on
  * astral-plane text; native pins the code-point contract), hash at
  * end-position i (window ≤ i ≤ n) is
  * Σ_j codepoint(i−window+1+j) · B^{window−1−j} mod M with B = 257,
  * M = 1e9+7, and i is a cut when hash ≡ 0 mod 2^bits. Returns the
  * (possibly empty) ascending cut array; docs shorter than `window`
  * cut nowhere.
  *
  * Cost is O(n) INDEPENDENT of `window`: the scan maintains the hash
  * with one rolling subtract-multiply-add per position (the actual
  * Karp–Rabin update), so callers may size the window to their chunk
  * semantics, not to a hidden per-position recompute. */
case class CdcCuts(child: Expression, window: Int, bits: Int)
    extends UnaryExpression with CodegenFallback {

  require(window >= 2, s"rolling window must be >= 2 chars, got $window")
  require(bits >= 1 && bits <= 20, s"boundary bits must be in 1..20, got $bits")

  private val M = 1000000007L
  // B^(window-1) mod M — the coefficient of the OUTGOING code point in
  // the rolling update (the only power the O(n) scan needs).
  @transient private lazy val powOut: Long =
    BigInt(257).modPow(BigInt(window - 1), BigInt(M)).toLong

  override def prettyName: String = "cdc_cuts"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cdc_cuts expects a string column, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // Code points, one linear walk.
    val n = s.codePointCount(0, s.length)
    if (n < window) return new GenericArrayData(Array.empty[Int])
    val cp = new Array[Long](n)
    var ci = 0
    var off = 0
    while (off < s.length) {
      val c = s.codePointAt(off)
      cp(ci) = c.toLong; ci += 1; off += Character.charCount(c)
    }
    val mask = (1L << bits) - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    // True rolling Karp–Rabin, O(n): seed the first window by Horner,
    // then one subtract-multiply-add per position — h' = (h − cp_out ·
    // B^{window−1}) · B + cp_in mod M, identical (exact modular
    // arithmetic) to the windowed sum Σ cp_j · B^{window−1−j}.
    // Bounds: cp ≤ 0x10FFFF and powOut < M < 2³⁰, so cp·powOut < 2⁵¹
    // and (h mod M)·257 < 2³⁸ — no Long overflow anywhere.
    var h = 0L
    var j = 0
    while (j < window) {
      h = (h * 257 + cp(j)) % M
      j += 1
    }
    var i = window
    while (i <= n) {
      if ((h & mask) == 0) out += i
      if (i < n) {
        h = (((h - cp(i - window) * powOut % M) % M + M) % M * 257 + cp(i)) % M
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextHash {

  /** Native winnowing selection over a (pre-lowercased) text column:
    * array<struct<pos int, fp long>> of the distinct window-min
    * selections, NULL for docs shorter than k code points. */
  def winnow_select(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowSelect(ColumnBridge.expression(text), k, w))

  /** Native CDC boundary scan: ascending cut positions (1-based code
    * point end indices) of the Karp–Rabin 2^bits wheel. */
  def cdc_cuts(text: Column, window: Int, bits: Int): Column =
    ColumnBridge.column(CdcCuts(ColumnBridge.expression(text), window, bits))
}
