package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X90: URL canonicalization + canonical-URL dedup — the first dedup
  * any web-corpus pipeline runs (CCNet/RefinedWeb dedup by URL before
  * ever touching content): the same page arrives under scheme/host case
  * variants, default ports, `www.` prefixes, trailing slashes,
  * tracking parameters and reordered query strings; canonicalizing
  * collapses them so one fetch/doc survives per logical page.
  *
  * Everything is a single column expression over Spark's codegen'd
  * string/regex/array kernels — zero shuffle for canonicalization
  * itself; the dedup roll-up is one hash-groupBy on the canonical
  * string. The per-element array lambdas (filter/sort over query
  * params) are interpreted, not codegen'd, but URLs carry a handful of
  * params — unlike shingles this never dominates.
  *
  * Normalization rules (RFC 3986 §6 syntax-based normalization plus
  * the standard tracking-param strip, all public knowledge):
  * scheme/host lowercased; `www.` host prefix dropped; default ports
  * (`:80` http, `:443` https) dropped, other ports kept; fragment
  * dropped; `utm_*`/`fbclid`/`gclid`/`ref` params dropped; remaining
  * params sorted byte-lexicographically (both engines sort UTF-8
  * binary); path trailing slashes trimmed with the root path kept as
  * `/`; empty path becomes `/`. Userinfo/percent-encoding/IDN
  * normalization are out of scope and documented as such. */
object Urls {

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Canonical form of `url`; null-safe (null in, null out). Inputs
    * without a `scheme://` prefix canonicalize to themselves minus
    * fragment — garbage stays stable rather than throwing. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, schemeRe, 1))
    val hostport = lower(
      regexp_extract(noFrag, schemeRe + "([^/?#]*)", 2))
    val host = regexp_replace(
      regexp_replace(hostport, ":[0-9]+$", ""), "^www\\.", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val rawPath = regexp_extract(noFrag, schemeRe + "[^/?#]*([^?#]*)", 2)
    val trimmed = regexp_replace(rawPath, "/+$", "")
    val path = when(trimmed === "", lit("/")).otherwise(trimmed)
    val rawQuery = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = array_sort(filter(split(rawQuery, "&"), p =>
      p =!= "" && !p.startsWith("utm_") && !p.startsWith("fbclid=") &&
        !p.startsWith("gclid=") && !p.startsWith("ref=")))
    val queryPart = when(size(params) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(params, "&")))
    when(url.isNull, lit(null))
      .when(scheme === "", noFrag)
      .otherwise(concat(scheme, lit("://"), host, portPart, path,
        queryPart))
  }

  /** Canonical-URL dedup roll-up: every row keeps its canonical URL,
    * the representative (minimum id sharing it) and the variant count
    * — `is_canonical = (id = rep_id)` selects one row per logical
    * page. ONE exchange on the canonical string; null URLs pass
    * through as their own singleton groups (null-safe aggregation
    * keys would conflate them). */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val canon = df.withColumn("canonical_url",
      canonicalizeUrl(col(urlCol)))
    val groups = canon.filter(col("canonical_url").isNotNull)
      .groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as("rep_id"),
        count(lit(1)).as("n_variants"))
    canon.join(groups, Seq("canonical_url"), "left")
      .withColumn("rep_id", coalesce(col("rep_id"), col(idCol)))
      .withColumn("n_variants", coalesce(col("n_variants"), lit(1L)))
      .withColumn("is_canonical", col("rep_id") === col(idCol))
  }
}
