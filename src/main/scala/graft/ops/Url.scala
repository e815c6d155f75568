package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the crawl-side sibling of
  * the content dedup family: a crawler sees the same resource under
  * scheme/host case variants, default ports, fragments, tracking
  * parameters, shuffled query order and sloppy path slashes, and
  * fetching each variant burns crawl budget and plants content dups
  * downstream. The rule set is the standard RFC 3986 §6
  * normalization core plus the tracking-param strip every production
  * crawler adds (Googlebot/Nutch/Heritrix lineage):
  *
  *  1. scheme and host lowercase (RFC 3986 §6.2.2.1);
  *  2. default port stripped (:80 http, :443 https — §6.2.3);
  *  3. fragment dropped (never sent to the server);
  *  4. query: split on '&', drop empty pairs and tracking params
  *     (`utm_*`, `fbclid`, `gclid`, `msclkid`, `ref`), sort the
  *     survivors bytewise by the full `k=v` string (stable), rejoin
  *     — '?' disappears when nothing survives;
  *  5. path: runs of '/' collapse to one (the '//' typo class),
  *     trailing '/' dropped on non-root paths, empty path → '/';
  *  6. leading/trailing whitespace trimmed.
  *
  * Everything is deterministic string surgery — no IDN/percent
  * decoding (both are content-changing and engine-dependent; a
  * canonicalizer must never merge two GENUINELY different resources).
  * Malformed input (no "://") passes through lowercase-trimmed so
  * garbage still groups stably rather than throwing.
  *
  * Scale shape: the kernel is map-only O(url chars); the dedup
  * report is ONE groupBy on the canonical string with map-side
  * partial aggregation — the q24 exact-dedup shape on a far smaller
  * key.
  */
object Url {

  private val DropParams: Set[String] =
    Set("fbclid", "gclid", "msclkid", "ref")

  private def dropParam(kv: String): Boolean = {
    val k = kv.indexOf('=') match {
      case -1 => kv
      case e => kv.substring(0, e)
    }
    k.startsWith("utm_") || DropParams.contains(k)
  }

  /** The canonicalization kernel — rules in the object Scaladoc. */
  def canonicalize(url: String): String = {
    if (url == null) return ""
    val trimmed = url.trim
    val sep = trimmed.indexOf("://")
    if (sep < 0) return trimmed.toLowerCase(java.util.Locale.ROOT)
    val scheme = trimmed.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    var rest = trimmed.substring(sep + 3)
    // split off fragment first (never part of the resource)
    val hash = rest.indexOf('#')
    if (hash >= 0) rest = rest.substring(0, hash)
    val qMark = rest.indexOf('?')
    val query = if (qMark >= 0) rest.substring(qMark + 1) else ""
    val hostPath = if (qMark >= 0) rest.substring(0, qMark) else rest
    val slash = hostPath.indexOf('/')
    val hostPort =
      (if (slash >= 0) hostPath.substring(0, slash) else hostPath)
        .toLowerCase(java.util.Locale.ROOT)
    val rawPath = if (slash >= 0) hostPath.substring(slash) else ""
    val host = hostPort match {
      case h if scheme == "http" && h.endsWith(":80") =>
        h.substring(0, h.length - 3)
      case h if scheme == "https" && h.endsWith(":443") =>
        h.substring(0, h.length - 4)
      case h => h
    }
    // path: collapse '/'+ runs, strip trailing '/' unless root
    val collapsed = rawPath.replaceAll("/{2,}", "/")
    val path =
      if (collapsed.isEmpty) "/"
      else if (collapsed.length > 1 && collapsed.endsWith("/"))
        collapsed.substring(0, collapsed.length - 1)
      else collapsed
    val keptQuery = query.split("&").iterator
      .filter(_.nonEmpty).filterNot(dropParam).toArray.sorted
    scheme + "://" + host + path +
      (if (keptQuery.isEmpty) "" else keptQuery.mkString("?", "&", ""))
  }

  /** URL-dedup report: per canonical URL the variant-row count, the
    * distinct as-written spellings, and the winning (min) id — the
    * q24 min-id convention, on the canonical string key.
    */
  def dedupReport(df: DataFrame, idCol: String,
                  urlCol: String): DataFrame = {
    val kernel = udf((u: String) => canonicalize(u))
    df.select(col(idCol), col(urlCol).as("__raw"),
        kernel(col(urlCol)).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_variants"),
        countDistinct(col("__raw")).as("n_spellings"),
        min(col(idCol)).as("keep_id"))
  }

  /** Closed-form messy-URL fixture (the q339 asset discipline): four
    * deterministic variant arms per doc_id that all canonicalize to
    *
    *   http://www.example{doc_id%50}.com/path{doc_id%7}?a=1&b=2
    *
    * arm 0: uppercase scheme+host, default :80, fragment, unsorted
    *        query; arm 1: utm_source tracking param; arm 2: :80 +
    *        trailing slash + trailing utm_campaign; arm 3: doubled
    *        path slash + fbclid + unsorted query. The twin states
    *        the canonical form directly and groups the same
    *        arithmetic.
    */
  def testUrl(docId: Long): String = {
    val d = java.lang.Math.floorMod(docId, 50L)
    val p = java.lang.Math.floorMod(docId, 7L)
    java.lang.Math.floorMod(docId, 4L) match {
      case 0 => s"HTTP://WWW.Example$d.COM:80/path$p?b=2&a=1#section"
      case 1 => s"http://www.example$d.com/path$p?utm_source=feed&a=1&b=2"
      case 2 => s"http://www.example$d.com:80/path$p/?a=1&b=2&utm_campaign=x"
      case _ => s"http://www.example$d.com//path$p?fbclid=abc&b=2&a=1"
    }
  }

  /** `url` fixture column over idCol — map-only projection. */
  def withTestUrls(df: DataFrame, idCol: String): DataFrame = {
    val build = udf((id: Long) => testUrl(id))
    df.withColumn("url", build(col(idCol)))
  }
}
