package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Web-crawl text operators: URL → domain extraction, URL normalization,
  * and the per-domain document cap every crawl-derived training corpus
  * applies (a handful of template-farm domains otherwise contribute an
  * outsized share of near-identical pages).
  *
  * The regexes stay inside the RE2-compatible subset (no backreferences,
  * no lookaround) so the identical pattern runs on Spark (java.util.regex)
  * and RE2-based engines (DuckDB oracle, or a Go/Rust sidecar) with the
  * same semantics.
  */
object WebText {

  /** Registrable host part of a URL, lowercased, leading `www.` stripped:
    * `https://user@WWW.News.Example.com:8080/a?b#c` → `news.example.com`.
    * Pure codegen'd column — no shuffle, pushdown-eligible.
    */
  def domainOf(url: Column): Column =
    regexp_extract(lower(url),
      "^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?(?:www\\.)?([^/:?#]+)", 1)

  /** URL canonical form for dedup keys: scheme+authority+path only —
    * query string (tracking params, session ids) and fragment dropped.
    */
  def normalizeUrl(url: Column): Column =
    regexp_extract(url, "^([^?#]*)", 1)

  /** Keep at most `cap` documents per domain, deterministically — the
    * first `cap` by `order` (ascending id, a quality rank, ...). Adds
    * `domain` and `domain_rank` (1-based) columns.
    *
    * A window (not min_by) because the contract is top-N per key with N
    * small; the sort per domain is bounded by the domain's doc count, and
    * domains hot enough to matter are exactly the ones the cap truncates.
    * For degenerate single-domain corpora, pre-salt or raise
    * spark.sql.windowExec.buffer.spill.threshold — the cap itself is the
    * skew relief everywhere downstream.
    */
  def capPerDomain(docs: DataFrame, urlCol: String, cap: Int,
                   order: Seq[Column]): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val w = Window.partitionBy(col("domain")).orderBy(order: _*)
    docs.withColumn("domain", domainOf(col(urlCol)))
      .withColumn("domain_rank", row_number().over(w))
      .filter(col("domain_rank") <= cap)
  }
}
