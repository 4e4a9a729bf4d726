package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/provenance filtering — the metadata-based cut web-corpus pipelines
  * run BEFORE any content heuristic (C4 and RefinedWeb drop pages by URL
  * blocklist; Dolma's URL filter matches blocked domains and keywords
  * against the page URL). The reference has no URL stage (it never sees
  * web provenance — `etl/main.py` is parcel events end-to-end); this is
  * north-star curation surface per SURVEY §7.6.
  *
  * Everything here is a shuffle-free, codegen'd projection over the URL
  * column: host extraction is one `regexp_extract` + three
  * `regexp_replace`s, the registered domain is array arithmetic over the
  * dot-split labels against a pinned two-level-suffix table (a lite
  * public-suffix list; the full Mozilla PSL would ride along the same
  * way, as a literal `isin` set or a broadcast join for the 10k-entry
  * real list), and the block rules are literal-set membership plus
  * substring tests. At 100 TB this annotates at scan speed — no
  * exchange appears anywhere in the plan — and the boolean gate pushes
  * into the parquet scan as a data filter after annotation columns are
  * projected away.
  *
  * Determinism/orcale discipline: both engines compute host, domain, and
  * TLD from the same RE2-safe regexes (no backreferences, no lookaround)
  * so the DuckDB twin replays character-for-character.
  */
object Urls {

  /** Two-level public suffixes the registered-domain rule treats as TLDs
    * (lite PSL subset — enough to pin the semantics; swap in the full
    * list as data at production scale).
    */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "com.tr", "com.ar",
    "co.in", "co.kr", "co.za", "co.nz")

  /** Default blocked registered domains (matched on the www-stripped
    * registered domain, so every subdomain of a blocked site is blocked).
    */
  val BlockedDomains: Seq[String] = Seq(
    "tracker-network.com", "spam-mill.net", "contentfarm.example")

  /** Default blocked top-level domains. */
  val BlockedTlds: Seq[String] = Seq("zip", "mov", "country")

  /** Default blocked host substrings (Dolma-style keyword rule — matched
    * anywhere in the lowercased host, subdomains included).
    */
  val BlockedHostSubstrings: Seq[String] = Seq("casino", "porn", "xxx")

  /** Lowercased host of a URL: the `://`-authority with userinfo, port,
    * and any trailing dot stripped. Empty string when the value has no
    * scheme-authority shape (the invalid-URL signal — kept as `''` not
    * null so downstream label arithmetic stays total).
    */
  def host(url: Column): Column =
    lower(regexp_replace(regexp_replace(regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1),
      "^.*@", ""), ":[0-9]+$", ""), "\\.$", ""))

  /** Host with a leading `www.` label removed — the form blocklists and
    * the registered-domain rule match against.
    */
  def hostNorm(h: Column): Column = regexp_replace(h, "^www\\.", "")

  /** Last label of the host (`''` for an invalid URL, the whole host for
    * a dotless one like `localhost`).
    */
  def tld(h: Column): Column = element_at(split(h, "\\."), -1)

  /** Registered domain: last two labels, or last three when the last two
    * form a pinned two-level suffix (`example.co.uk`, not `co.uk`).
    * Null for an invalid (empty) host; a dotless host is its own domain.
    * `get` is the 0-based null-safe array accessor, so short hosts never
    * trip ANSI out-of-range errors.
    */
  def registeredDomain(h: Column): Column = {
    val parts = split(h, "\\.")
    val n = size(parts)
    val l1 = element_at(parts, -1)
    val l2 = get(parts, n - 2)
    val l3 = get(parts, n - 3)
    val last2 = concat_ws(".", l2, l1)
    when(h === "", lit(null).cast("string"))
      .when(n <= 2, h)
      .when(last2.isin(TwoLevelSuffixes: _*) && l3.isNotNull,
        concat_ws(".", l3, l2, l1))
      .otherwise(last2)
  }

  /** Annotate a frame with `url_host`, `url_domain` (registered domain of
    * the www-stripped host), `url_tld`, and `url_valid`. One projection,
    * no shuffle; the host subexpression is bound once and reused by the
    * derived columns inside the same whole-stage-codegen span.
    */
  def annotate(docs: DataFrame, urlCol: String): DataFrame = {
    val h = host(col(urlCol))
    docs
      .withColumn("url_host", h)
      .withColumn("url_domain", registeredDomain(hostNorm(col("url_host"))))
      .withColumn("url_tld", tld(hostNorm(col("url_host"))))
      .withColumn("url_valid", col("url_host") =!= "")
  }

  /** The gate predicate over annotated columns: valid URL, domain not
    * blocked, TLD not blocked, no blocked substring anywhere in the
    * www-stripped host. Literal sets compile to hash-set membership
    * (`isin`), substrings to a codegen'd conjunction of `contains`.
    */
  def keepPredicate(
      hostCol: Column,
      domainCol: Column,
      tldCol: Column,
      blockedDomains: Seq[String] = BlockedDomains,
      blockedTlds: Seq[String] = BlockedTlds,
      blockedSubstrings: Seq[String] = BlockedHostSubstrings): Column = {
    val hn = hostNorm(hostCol)
    val noSubstring = blockedSubstrings
      .map(s => !hn.contains(s))
      .reduceOption(_ && _).getOrElse(lit(true))
    hostCol =!= "" &&
      !coalesce(domainCol, lit("")).isin(blockedDomains: _*) &&
      !coalesce(tldCol, lit("")).isin(blockedTlds: _*) &&
      noSubstring
  }

  /** Annotate + gate: adds `url_kept` alongside the annotation columns
    * (audit form — every row survives with its verdict; `filterBlocked`
    * is the cutting form).
    */
  def gate(
      docs: DataFrame,
      urlCol: String,
      blockedDomains: Seq[String] = BlockedDomains,
      blockedTlds: Seq[String] = BlockedTlds,
      blockedSubstrings: Seq[String] = BlockedHostSubstrings): DataFrame =
    annotate(docs, urlCol).withColumn("url_kept",
      keepPredicate(col("url_host"), col("url_domain"), col("url_tld"),
        blockedDomains, blockedTlds, blockedSubstrings))

  /** Keep only rows passing [[keepPredicate]]; annotation columns are
    * dropped so the surviving frame has the caller's schema (the gate
    * collapses to a plain `Filter` the optimizer pushes toward the
    * scan).
    */
  def filterBlocked(
      docs: DataFrame,
      urlCol: String,
      blockedDomains: Seq[String] = BlockedDomains,
      blockedTlds: Seq[String] = BlockedTlds,
      blockedSubstrings: Seq[String] = BlockedHostSubstrings): DataFrame = {
    val h = host(col(urlCol))
    docs.filter(keepPredicate(h, registeredDomain(hostNorm(h)), tld(hostNorm(h)),
      blockedDomains, blockedTlds, blockedSubstrings))
  }
}
