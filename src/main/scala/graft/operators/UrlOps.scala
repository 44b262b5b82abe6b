package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL parsing and domain-level curation — the provenance dimension of
  * web-corpus cleaning (CCNet / RefinedWeb recipe): parse each page's
  * URL, roll pages up to their REGISTRABLE domain (the public-suffix
  * rule: `a.b.example.co.uk` → `example.co.uk`, not `co.uk`), drop
  * blocklisted domains, and cap any one domain's share of the corpus
  * (compose with [[Sampling.perKeyCap]]).
  *
  * Scale shape: [[parseUrl]] is a pure narrow projection — four
  * anchored `regexp_extract`s plus array slicing over the host labels,
  * all codegen'd, no UDF, no shuffle. The public-suffix match unrolls
  * the (tiny, broadcast-by-construction) suffix set into a
  * longest-match `when` chain over the last 1–3 host labels, so the
  * whole parse stays inside one whole-stage-codegen span. Blocklists
  * join as broadcast anti joins; domain caps ride the bounded-heap
  * grouped top-k. Everything scan-scales to 100 TB.
  *
  * The suffix set ships as a small built-in default (the full
  * public-suffix list is a data file, not an algorithm — swap it in
  * via the parameter without touching the plan).
  */
object UrlOps {

  /** Built-in public-suffix subset: enough to make the longest-match
    * rule observable (multi-label suffixes beat single-label ones) —
    * production would pass the full PSL here. */
  val DefaultSuffixes: Seq[String] = Seq(
    "com", "org", "net", "edu", "gov", "io", "dev", "info", "app",
    "co.uk", "org.uk", "ac.uk", "com.au", "co.jp", "co.kr", "com.br",
    "github.io")

  /** Parse `url` into struct(scheme, host, domain, path).
    *
    * - `scheme`: lowercased; '' when the URL has no `://`.
    * - `host`: lowercased authority with userinfo and port stripped.
    * - `domain`: registrable domain under `suffixes` — the shortest
    *   host suffix that is ONE label longer than the longest matching
    *   public suffix; the host itself if it IS a listed suffix or
    *   matches nothing (single-label hosts, IPs: best-effort '' vs
    *   host is a policy knob — this keeps the host, so grouping still
    *   works).
    * - `path`: from the first '/' after the authority up to (not
    *   including) '?' or '#'; '' when absent.
    */
  def parseUrl(url: Column,
               suffixes: Seq[String] = DefaultSuffixes): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    // userinfo ends at the LAST '@' (RFC 3986); port starts at the
    // first ':' after it
    val hostport = element_at(split(auth, "@", -1), -1)
    val host = lower(element_at(split(hostport, ":", 2), 1))
    val path = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val labels = split(host, "\\.", -1)
    val n = size(labels)
    // longest-match over the suffix set, grouped by label count: a
    // k-label suffix matches when the host's last k labels equal it
    // AND at least one label precedes them (else the host IS the
    // suffix and stays whole). Folding in ASCENDING k wraps the
    // largest k outermost, so the when-chain checks longest first —
    // foo.github.io resolves via github.io, never plain io.
    val byLen = suffixes.groupBy(_.count(_ == '.') + 1).toSeq
      .sortBy(_._1)
    val domain = byLen.foldLeft(host) { case (fallback, (k, sfx)) =>
      val lastK = array_join(slice(labels, -k, k), ".")
      when(n > lit(k) &&
        lastK.isin(sfx.map(_.asInstanceOf[Any]): _*),
        array_join(slice(labels, -(k + 1), k + 1), "."))
        .otherwise(fallback)
    }
    struct(scheme.as("scheme"), host.as("host"), domain.as("domain"),
      path.as("path"))
  }

  /** Canonical-URL deduplication — the crawl-pipeline step before any
    * content dedup: the same page arrives as `http://u:p@Host:8080/a?x`
    * and `http://host/a`, and content hashing wastes a fetch+compare
    * on what the URL already says. Canonical form =
    * `scheme://host/path` from [[parseUrl]] (userinfo, port, query,
    * fragment dropped; scheme+host lowercased); per canonical key the
    * fold keeps the MIN id (deterministic survivor) and the duplicate
    * count. One narrow projection + one keyed fold.
    *
    * @return (canonical, n_dups, keep_id) ordered by canonical.
    */
  def canonicalUrlDedup(docs: DataFrame, idCol: String,
                        urlCol: String): DataFrame = {
    val p = parseUrl(col(urlCol))
    docs.select(col(idCol),
        concat(p.getField("scheme"), lit("://"), p.getField("host"),
          p.getField("path")).as("canonical"))
      .groupBy(col("canonical"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keep_id"))
      .orderBy(col("canonical"))
  }

  /** Parse + blocklist + per-domain cap in one call — the standard
    * domain-curation pass. `blockedDomains` drops every page whose
    * registrable domain is listed (broadcast anti join — the blocklist
    * is small by nature); `maxPerDomain` then keeps the lowest
    * `idCol` pages of each surviving domain (deterministic preference,
    * bounded-heap top-k; 0 = uncapped).
    *
    * @return input columns + (scheme, host, domain, path).
    */
  def curateByDomain(docs: DataFrame, idCol: String, urlCol: String,
                     blockedDomains: Seq[String],
                     maxPerDomain: Int,
                     suffixes: Seq[String] = DefaultSuffixes): DataFrame = {
    val parsed = docs
      .withColumn("_u", parseUrl(col(urlCol), suffixes))
      .select((docs.columns.map(col) :+ col("_u.scheme") :+ col("_u.host")
        :+ col("_u.domain") :+ col("_u.path")): _*)
    val unblocked =
      if (blockedDomains.isEmpty) parsed
      else {
        val block = docs.sparkSession
          .createDataFrame(blockedDomains.map(Tuple1(_)))
          .toDF("domain")
        parsed.join(broadcast(block), Seq("domain"), "left_anti")
          // anti join moved the join key first; restore declared order
          .select(parsed.columns.map(col): _*)
      }
    if (maxPerDomain <= 0) unblocked
    else Sampling.perKeyCap(unblocked, "domain", Seq(idCol), maxPerDomain)
  }
}
