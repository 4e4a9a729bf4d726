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
  def registeredDomain(h: Column): Column =
    // let-bind the host and its label array (round 15): the rule reads
    // `h` twice and `parts` ~8 times — unbound, each read re-runs the
    // whole host-producing regex tree this column is composed over
    graft.Canonical.bindOnce(h) { hh =>
      graft.Canonical.bindOnce(split(hh, "\\.")) { parts =>
        val n = size(parts)
        val l1 = element_at(parts, -1)
        val l2 = get(parts, n - 2)
        val l3 = get(parts, n - 3)
        val last2 = concat_ws(".", l2, l1)
        when(hh === "", lit(null).cast("string"))
          .when(n <= 2, hh)
          .when(last2.isin(TwoLevelSuffixes: _*) && l3.isNotNull,
            concat_ws(".", l3, l2, l1))
          .otherwise(last2)
      }
    }

  /** Annotate a frame with `url_host`, `url_domain` (registered domain of
    * the www-stripped host), `url_tld`, and `url_valid`. One projection,
    * no shuffle; the host subexpression is bound once and reused by the
    * derived columns inside the same whole-stage-codegen span.
    */
  def annotate(docs: DataFrame, urlCol: String): DataFrame =
    // stage url_host behind a plan barrier (round 15): the derived
    // columns reference it 3× and CollapseProject would inline the host
    // regex tree into each — downstream consumers (gate verdicts,
    // grouping keys) multiply it further
    graft.Canonical.stageOnce(docs, Seq("url_host" -> host(col(urlCol))))
      .withColumn("url_domain", registeredDomain(hostNorm(col("url_host"))))
      .withColumn("url_tld", tld(hostNorm(col("url_host"))))
      .withColumn("url_valid", col("url_host") =!= "")

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
    // bind the host and its www-stripped form: every blocked substring
    // reads hn, and unbound each read re-runs hostNorm AND the host
    // expression the caller composed it over (round 15)
    graft.Canonical.bindOnce(hostCol) { hc =>
      val noSubstring = graft.Canonical.bindOnce(hostNorm(hc)) { hn =>
        blockedSubstrings
          .map(s => !hn.contains(s))
          .reduceOption(_ && _).getOrElse(lit(true))
      }
      hc =!= "" &&
        !coalesce(domainCol, lit("")).isin(blockedDomains: _*) &&
        !coalesce(tldCol, lit("")).isin(blockedTlds: _*) &&
        noSubstring
    }
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
    // bind host/hostNorm once: the predicate otherwise re-runs the host
    // regex tree per reference (≈15× counting registeredDomain's label
    // reads before its own binding — round 15)
    docs.filter(graft.Canonical.bindOnce(host(col(urlCol))) { h =>
      graft.Canonical.bindOnce(hostNorm(h)) { hn =>
        keepPredicate(h, registeredDomain(hn), tld(hn),
          blockedDomains, blockedTlds, blockedSubstrings)
      }
    })
  }

  /** Query parameters the canonical form drops — the tracking junk that
    * makes one page present as thousands of distinct URLs (the reason
    * URL-keyed dedup canonicalizes first). Anchored pattern in the
    * Java-regex ∩ RE2 subset; matched against each `name=value` (or bare
    * `name`) pair.
    */
  val TrackingParamRe: String =
    "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|mc_cid|mc_eid|ref)(=.*)?$"

  /** Canonical form of a URL, the identity URL-keyed dedup groups on:
    * fragment dropped; scheme and host lowercased; userinfo, a scheme
    * default port (`:80` http / `:443` https), and a trailing host dot
    * stripped; trailing path slashes removed (`/a/` ≡ `/a`, `/` ≡ ``);
    * tracking parameters ([[TrackingParamRe]]) dropped and the surviving
    * query pairs SORTED (param order never distinguishes pages). A value
    * without scheme-authority shape passes through unchanged, so exact
    * equality still groups malformed records. One codegen'd expression —
    * extraction regexes plus array arithmetic over the split query — no
    * shuffle, no UDF.
    */
  def canonicalize(url: Column): Column =
    // let-bind each reused regex product (round 15): noFrag feeds four
    // extracts, auth/scheme/hostPort/qc are each read 2-3 times — the
    // unbound tree re-ran regexp passes per reference
    graft.Canonical.bindOnce(regexp_replace(url, "#.*$", "")) { noFrag =>
      graft.Canonical.bindOnce(
          lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))) { scheme =>
        graft.Canonical.bindOnce(
            regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)) { auth =>
          graft.Canonical.bindOnce(lower(regexp_replace(auth, "^.*@", ""))) { hostPort =>
            val noDefPort = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
              .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
              .otherwise(hostPort)
            // ALL trailing dots (not just the FQDN-root one): a host like
            // "example.com.." must reach its fixed point in one pass so
            // canonicalize is idempotent (property-tested)
            val hostC = regexp_replace(noDefPort, "\\.+$", "")
            val path = regexp_replace(
              regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
              "/+$", "")
            val q = regexp_extract(noFrag, "\\?([^#]*)", 1)
            val keptParams = array_sort(filter(split(q, "&"),
              p => p =!= "" && !p.rlike(TrackingParamRe)))
            graft.Canonical.bindOnce(array_join(keptParams, "&")) { qc =>
              when(auth === "", url).otherwise(
                concat(scheme, lit("://"), hostC, path,
                  when(qc === "", lit("")).otherwise(concat(lit("?"), qc))))
            }
          }
        }
      }
    }

  /** URL-keyed exact dedup — the cut web pipelines run BEFORE content
    * dedup (recrawls and tracking-param variants of one page are the
    * cheapest duplicates to kill, no content ever hashes). Keep-first on
    * the [[canonicalize]]d URL via [[Dedup.exactKeepFirst]], so the plan
    * is the scale-proven digest aggregate (map-side combine over the
    * canonical-URL hash) + id-keyed semi-join — never a window keyed by
    * URL, which would sort every recrawl of a hot page in one task.
    * Caller's schema is preserved.
    */
  def dedupByUrl(docs: DataFrame, urlCol: String, idCol: String): DataFrame =
    Dedup.exactKeepFirst(
        docs.withColumn("__curl", canonicalize(col(urlCol))), Seq("__curl"), idCol)
      .drop("__curl")
}
