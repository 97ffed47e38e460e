package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL normalization — the key-engineering step in front of every
 * web-corpus dedup: crawls reach the same page through scheme/case/port/
 * tracking-param/trailing-slash variants, and URL-keyed dedup (the tier
 * BEFORE any content hashing: it needs no fetch at all) only works if
 * those variants collapse to one canonical key first. The reference's
 * document pipeline (DAG:94-132) keys documents by source fields the
 * same way; this is that discipline applied to the web-native id.
 *
 * Everything here is a pure COLUMN expression chain (regexp/split/sort/
 * concat built-ins) — zero shuffle, fully inside whole-stage codegen, so
 * canonicalization at 100 TB is a free projection riding the scan. The
 * rules are the conservative RFC-3986-style set every crawler applies:
 *
 *  - scheme and host lowercased (case-insensitive by spec); path and
 *    query left case-sensitive (significant by spec)
 *  - fragment stripped (never sent to the server) — stripped FIRST, so a
 *    `?` inside a fragment (`/a#x?y=1`) is never mistaken for a query
 *  - userinfo (`user[:pass]@`) STRIPPED — crawler convention: credentials
 *    never identify a page, and keeping them would both leak secrets into
 *    dedup keys and split one page across per-user variants
 *  - default ports dropped (`:80` for http, `:443` for https)
 *  - leading `www.` stripped from the host (the classic duplicate host)
 *  - tracking params dropped (`utm_*`, `gclid`, `fbclid`, `ref`) and the
 *    surviving query params SORTED (order is almost never significant,
 *    and unordered-equal queries are the second-biggest variant source)
 *  - trailing slashes collapsed off the path; empty path → `/`
 *
 * Deterministic: one fixed expression chain per rule, replayable
 * verbatim in SQL — the oracle runs the identical surgery.
 */
object UrlOps {

  /** Tracking query params to drop: `utm_*` plus the common click ids. */
  private val TrackingParam = "^(utm_[^=]*|gclid|fbclid|ref)(=.*)?$"

  /** Lowercased scheme (`http`, `https`, …); "" when the value has no
    * `scheme://` prefix. */
  def urlScheme(url: Column): Column =
    lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))

  /** Canonical host: userinfo-stripped, lowercased, default-port-free,
    * `www.`-stripped. */
  def urlHost(url: Column): Column = {
    val hostPort = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    // userinfo ends at the LAST '@' (the host itself cannot contain '@',
    // RFC 3986 §3.2.2) — greedy `^.*@` inside the already-extracted
    // authority strips it even from malformed multi-'@' values
    val noUser = regexp_replace(hostPort, "^.*@", "")
    // ALL leading `www.` repetitions, not just one: one-strip would make
    // canonicalization non-idempotent (www.www.e.com → www.e.com →
    // e.com on a second pass) — and a key function MUST be idempotent,
    // or re-canonicalizing stored keys silently re-partitions them
    // (property spec: canonicalize ∘ canonicalize = canonicalize)
    regexp_replace(
      regexp_replace(lower(noUser), ":[0-9]*$", ""),
      "^(www\\.)+", "")
  }

  /** Path with trailing slashes collapsed; "" / bare host → "/". The
    * path keeps its case (case-SENSITIVE per RFC 3986). */
  def urlPath(url: Column): Column = {
    val afterHost =
      regexp_replace(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    val path = regexp_extract(afterHost, "^([^?#]*)", 1)
    val trimmed = regexp_replace(path, "/+$", "")
    when(trimmed === "", lit("/")).otherwise(trimmed)
  }

  /** Canonical query: tracking params dropped, survivors sorted, ""
    * when nothing survives (no leading `?`). */
  def urlQuery(url: Column): Column = {
    // fragment FIRST: a '?' that only appears inside the fragment
    // (`/a#x?y=1`) is fragment content, not a query — so the query is
    // extracted from the pre-'#' span only
    val raw = regexp_extract(regexp_extract(url, "^([^#]*)", 1), "\\?(.*)$", 1)
    val kept = filter(split(raw, "&"),
      p => p =!= "" && !p.rlike(TrackingParam))
    when(size(kept) > 0, concat(lit("?"), concat_ws("&", array_sort(kept))))
      .otherwise(lit(""))
  }

  /** The full canonical URL (see the object doc for the rule set).
    * Values without a `scheme://` prefix canonicalize to NULL — refusing
    * to guess beats inventing a scheme, and null keys fall out of any
    * downstream dedup groupBy. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = urlScheme(url)
    val host = urlHost(url)
    val port = regexp_extract(
      regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1),
      ":([0-9]+)$", 1)
    val keepPort =
      port =!= "" &&
        !(scheme === "http" && port === "80") &&
        !(scheme === "https" && port === "443")
    when(scheme === "", lit(null).cast("string")).otherwise(
      concat(scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        urlPath(url), urlQuery(url)))
  }
}
