package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain curation — the standard web-corpus hygiene step
  * (C4/RefinedWeb-style): canonicalize URLs so dedup keys agree, derive
  * the REGISTERED domain (the "one owner" unit under the public-suffix
  * list), and cap or block per domain so no single site dominates the
  * training mix (`Sampling.samplePerGroup` keyed on the domain is the
  * cap; `filter` on a broadcast blocklist is the block).
  *
  * `normalizeUrl` / `hostOf` are pure map-only column expressions (zero
  * shuffles, whole-stage codegen'd, patterns from the Java-regex ∩ RE2
  * dialect so the DuckDB oracle matches the same spans).
  * `withRegisteredDomain` is a BROADCAST LOOKUP against the suffix
  * rules, not a per-row regex over the whole list: each host probes the
  * hash table O(1) by its last-k-label candidates — the shape that holds
  * when the rule list is the real ~10k-entry PSL and the corpus is
  * 100 TB (the list rides once per executor; the scan stays map-only).
  */
object Curation {

  /** One parsed public-suffix rule. `base` is the literal label part,
    * lowercase: for a wildcard rule `*.ck` the base is `ck` (the `*`
    * matches exactly one extra label); for an exception rule `!www.ck`
    * the base is `www.ck`. */
  final case class PslRule(base: String, wildcard: Boolean, exception: Boolean) {
    /** Label count of the literal part. */
    val baseWidth: Int = base.count(_ == '.') + 1
    /** Host-label count the full rule spans (a wildcard adds one). */
    val width: Int = baseWidth + (if (wildcard) 1 else 0)
  }

  /** The A-label (punycode / IDNA) form of a dotted base, label by
    * label; identity for all-ASCII bases. A label the JDK encoder
    * rejects keeps its U-label form (the published list contains none
    * such today — the guard is for future list refreshes). */
  private def punycode(base: String): String =
    base.split('.').map { l =>
      if (l.forall(_ < 128)) l
      else try java.net.IDN.toASCII(l)
      catch { case _: IllegalArgumentException => l }
    }.mkString(".")

  /** The public-suffix rules, loaded from the bundled
    * `public_suffix_list.dat` resource (publicsuffix.org line format:
    * `//` comments, `*.` wildcards, `!` exceptions). The resource IS the
    * full published list (ICANN + private sections, ~9.5k rules, MPL
    * 2.0 header retained) — everything downstream (join arms, the
    * oracle SQL) is data-driven over the rule widths and kinds found
    * here, so a list refresh is a file swap: exact rules join at widths
    * 2–5, wildcards at base widths 1–4, exceptions at widths 2–3, ten
    * broadcast arms total, each ≤ ~6k rows riding once per executor.
    *
    * The list publishes IDN rules as U-labels (`左注.jp`) but real-world
    * hosts normally arrive punycoded (`xn--...`) — matching U-label
    * rules only would silently default-rule every IDN host. Each
    * non-ASCII rule therefore loads BOTH forms (its A-label twin via
    * the JDK's IDNA encoder, ~470 extra rules); hosts in either form
    * match, per the canonical PSL algorithm's canonicalization step.
    * Lowercasing is Locale.ROOT: the default locale would, e.g. under
    * tr-TR, fold an uppercase rule `I` to dotless `ı` and never match
    * hosts lowercased by Spark's locale-agnostic `lower()`. */
  lazy val PslRules: Seq[PslRule] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "bundled public_suffix_list.dat resource is missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//"))
      .map { l =>
        val exception = l.startsWith("!")
        val wildcard = l.startsWith("*.")
        val base =
          if (exception) l.substring(1) else if (wildcard) l.substring(2) else l
        require(!base.contains("*"),
          s"only leading wildcards are supported (the published list uses no others): $l")
        PslRule(base.toLowerCase(java.util.Locale.ROOT), wildcard, exception)
      }.toVector
      .flatMap { r =>
        val ascii = punycode(r.base)
        if (ascii == r.base) Seq(r) else Seq(r, r.copy(base = ascii))
      }
    finally src.close()
  }

  /** Exact (non-wildcard, non-exception) rule bases by label width,
    * multi-label only — a single-label exact rule ("com") is
    * semantically the default `*` rule the resolver already applies as
    * its fallback, so it needs no join arm. */
  lazy val exactRulesByWidth: Map[Int, Seq[String]] =
    PslRules.filter(r => !r.wildcard && !r.exception && r.baseWidth >= 2)
      .map(_.base).distinct.groupBy(_.count(_ == '.') + 1)

  /** Wildcard rule bases by BASE width (the rule spans base+1 host
    * labels; the `*` label's content is irrelevant to the match). */
  lazy val wildcardRulesByBaseWidth: Map[Int, Seq[String]] =
    PslRules.filter(_.wildcard)
      .map(_.base).distinct.groupBy(_.count(_ == '.') + 1)

  /** Exception rule bases by width. A matching exception prevails over
    * every other rule; its public suffix is the base minus its leftmost
    * label (width − 1). */
  lazy val exceptionRulesByWidth: Map[Int, Seq[String]] =
    PslRules.filter(_.exception)
      .map(_.base).distinct.groupBy(_.count(_ == '.') + 1)

  /** Tracking query parameters to strip (the classic cross-site set). */
  private val TrackingParamPattern =
    "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref|ref_src)="

  /** Canonical form of a URL, so that the same resource fetched twice
    * dedups to one key:
    *  - fragment dropped (never sent to the server),
    *  - scheme and host lowercased (case-insensitive per RFC 3986; path
    *    and query keep their case — they are case-SENSITIVE),
    *  - default ports stripped (`:80` for http, `:443` for https; other
    *    ports kept),
    *  - tracking parameters removed (utm_*, gclid, fbclid, msclkid,
    *    ref, ref_src), preserving the relative order of the remaining
    *    parameters, and the `?` itself dropped when nothing survives.
    * A scheme-less input has no scheme://host prefix to lowercase; the
    * fragment/query passes still apply. Map-only, codegen'd. */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    val prefix = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val rest = noFrag.substr(length(prefix) + 1, length(noFrag))
    val lowPre = regexp_replace(
      regexp_replace(lower(prefix), "^(http://[^:/?#]*):80$", "$1"),
      "^(https://[^:/?#]*):443$", "$1")
    val path = regexp_extract(rest, "^[^?]*", 0)
    val query = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    val kept = array_join(
      filter(split(query, "&"),
        p => !p.rlike(TrackingParamPattern) && p =!= ""), "&")
    concat(lowPre, path,
      when(length(kept) > 0, concat(lit("?"), kept)).otherwise(lit("")))
  }

  /** Lowercased host of a URL: userinfo (`user@`) and any port stripped.
    * Empty string when the input has no `scheme://` part. */
  def hostOf(url: Column): Column =
    regexp_replace(
      regexp_replace(
        lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)),
        "^[^@]*@", ""),
      ":[0-9]+$", "")

  /** Drop rows whose registered domain is on the blocklist — the other
    * half of per-domain curation next to the cap. One broadcast hash
    * anti-join: the blocklist (thousands of entries in practice) rides
    * once per executor and the corpus scan stays map-side; a NULL
    * domain (suffix-only or single-label host) is kept — blocklists
    * name domains, and the quality gates, not the blocklist, decide
    * hostless rows. Entries must be lowercase registered domains
    * (`withRegisteredDomain` output), not bare hosts. */
  def filterBlockedDomains(df: DataFrame, domain: Column,
                           blocked: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.join(broadcast(blocked.toDF("__blocked_domain")),
      domain === col("__blocked_domain"), "left_anti")
  }

  /** Last `k` labels of a dot-separated host, NULL when fewer exist. */
  private def lastLabels(labels: Column, n: Column, k: Column): Column =
    when(n >= k, array_join(slice(labels, n - k + 1, k), "."))

  /** Adds `out` = the registered domain of lowercase host column `host`:
    * the public suffix plus one owner label, under the full
    * publicsuffix.org algorithm over the bundled rule list
    * ([[PslRules]]):
    *
    *  - a rule matches when its labels are a suffix of the host's
    *    labels, the wildcard `*` standing for exactly one label;
    *  - a matching EXCEPTION rule prevails over everything, and its
    *    public suffix is the rule minus its leftmost label;
    *  - otherwise the LONGEST matching rule prevails;
    *  - no rule matches → the default rule `*` (the bare TLD is the
    *    suffix — which also absorbs the list's single-label entries).
    *
    * Plan shape: one broadcast hash join per (rule kind, width) present
    * in the data — the rule tables ride once per executor, each host
    * probes O(1) by its last-k-label candidates, and the corpus scan
    * stays map-only with zero shuffles (the shape that holds when the
    * list is the full ~10k-entry PSL and the corpus is 100 TB). NULL
    * when the host IS a public suffix (nothing is registered) or has a
    * single label (`localhost`). */
  def withRegisteredDomain(df: DataFrame, host: Column, out: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (exact, wild, exc) =
      (exactRulesByWidth, wildcardRulesByBaseWidth, exceptionRulesByWidth)
    val candWidths = (exact.keySet ++ wild.keySet ++ exc.keySet).toSeq.sorted
    def labels = split(host, "\\.")
    def n = size(labels)
    val staged = candWidths.foldLeft(df) { (d, w) =>
      d.withColumn(s"__cand$w", lastLabels(labels, n, lit(w)))
    }
    def arm(d: DataFrame, w: Int, rules: Seq[String], name: String) =
      d.join(broadcast(rules.toDF(name)), col(s"__cand$w") === col(name), "left")
    val joined0 = exact.toSeq.sortBy(_._1).foldLeft(staged) {
      case (d, (w, rs)) => arm(d, w, rs, s"__sfx_e$w") }
    val joined1 = wild.toSeq.sortBy(_._1).foldLeft(joined0) {
      case (d, (b, rs)) => arm(d, b, rs, s"__sfx_w$b") }
    val joined = exc.toSeq.sortBy(_._1).foldLeft(joined1) {
      case (d, (w, rs)) => arm(d, w, rs, s"__sfx_x$w") }
    // Prevailing suffix width: exceptions first (width − 1), else the
    // longest normal match (a wildcard needs the extra host label its
    // `*` consumes), else the default rule. greatest() ignores NULLs.
    def maxOf(arms: Seq[Column]): Column = arms match {
      case Nil       => lit(null).cast("int")
      case Seq(one)  => one
      case many      => greatest(many: _*)
    }
    val excArms = exc.keys.toSeq.sorted.map(w =>
      when(col(s"__sfx_x$w").isNotNull, lit(w - 1)))
    val normArms =
      exact.keys.toSeq.sorted.map(w =>
        when(col(s"__sfx_e$w").isNotNull, lit(w))) ++
      wild.keys.toSeq.sorted.map(b =>
        when(col(s"__sfx_w$b").isNotNull && n >= b + 1, lit(b + 1)))
    val sfx = coalesce(maxOf(excArms), maxOf(normArms), lit(1))
    joined
      .withColumn(out, lastLabels(labels, n, sfx + 1))
      .drop(candWidths.map(w => s"__cand$w") ++
        exact.keys.map(w => s"__sfx_e$w") ++
        wild.keys.map(b => s"__sfx_w$b") ++
        exc.keys.map(w => s"__sfx_x$w"): _*)
  }
}
