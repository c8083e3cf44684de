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

  /** Multi-label public-suffix rules (a representative subset of the
    * public PSL — real deployments load the full published list; the
    * lookup shape is identical). Single-label TLDs need no entry: the
    * fallback already treats the last label as the suffix. Entries must
    * be lowercase. */
  val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn",
    "co.in", "net.in", "org.in",
    "co.kr", "or.kr", "go.kr",
    "com.mx", "org.mx", "gob.mx",
    "co.nz", "net.nz", "org.nz",
    "com.sg", "org.sg", "edu.sg",
    "com.tr", "org.tr",
    "com.ar", "org.ar",
    "co.za", "org.za",
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "nsw.edu.au", "vic.edu.au")

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
    * the public suffix plus one owner label. Suffix resolution is
    * longest-match over `MultiLabelSuffixes` via one broadcast hash join
    * per suffix width (2- and 3-label rules here — constant joins, no
    * shuffle, no per-row scan of the rule list), falling back to the
    * bare TLD. NULL when the host IS a public suffix (nothing is
    * registered) or has a single label (`localhost`). */
  def withRegisteredDomain(df: DataFrame, host: Column, out: String): DataFrame = {
    val spark = df.sparkSession
    val byWidth: Map[Int, Seq[String]] =
      MultiLabelSuffixes.groupBy(_.count(_ == '.') + 1)
    require(byWidth.keySet.subsetOf(Set(2, 3)),
      "suffix rules wider than 3 labels need another join arm")
    def ruleTable(w: Int): DataFrame = {
      import spark.implicits._
      byWidth.getOrElse(w, Seq.empty).toDF(s"__sfx$w")
    }
    val labels = split(host, "\\.")
    val n = size(labels)
    val staged = df
      .withColumn("__c2", lastLabels(labels, n, lit(2)))
      .withColumn("__c3", lastLabels(labels, n, lit(3)))
    val joined = staged
      .join(broadcast(ruleTable(3)), staged("__c3") === col("__sfx3"), "left")
      .join(broadcast(ruleTable(2)), staged("__c2") === col("__sfx2"), "left")
    // Longest matching suffix width; bare-TLD fallback is width 1.
    val k = when(col("__sfx3").isNotNull, 3)
      .when(col("__sfx2").isNotNull, 2)
      .otherwise(1)
    joined
      .withColumn(out, lastLabels(split(host, "\\."), size(split(host, "\\.")), k + 1))
      .drop("__c2", "__c3", "__sfx2", "__sfx3")
  }
}
