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

  /** Query parameters dropped by [[canonicalizeUrl]]: click/campaign
    * trackers that vary per referral without changing the page.
    */
  val trackingParamPattern = "^(utm_[A-Za-z0-9]*|fbclid|gclid|ref)="

  /** Full URL canonicalization for crawl dedup (RFC 3986 §6 subset):
    * scheme and host lowercased; default port stripped (`:80` for http,
    * `:443` for https — non-default ports kept); empty path → `/`; query
    * params split, tracking params ([[trackingParamPattern]]) and empty
    * segments dropped, the rest SORTED and rejoined (param order never
    * distinguishes pages); fragment dropped. Path case is preserved —
    * paths are case-sensitive, only scheme/host are not.
    *
    * Pure Column chain (regexp_extract / filter / array_sort /
    * array_join), fully codegen'd, no shuffle — canonicalization cost is
    * a per-row map over the crawl, and the dedup that follows
    * (`groupBy(canonical)` or [[Dedup]] keep-first) is the only exchange.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    val rawPath = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val query = regexp_extract(url, "^[^#]*\\?([^#]*)", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(trackingParamPattern)))
    concat(scheme, lit("://"), host, path,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }

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

  /** C4-style sentence-line predicate (Raffel et al. 2020 §2.2's rule
    * set, the RE2-portable subset): the line — right-trimmed — must end
    * in terminal punctuation, carry at least `minWords` space-separated
    * words, and contain no blocklisted boilerplate phrase. Default
    * blocklist = the C4 paper's "lorem ipsum" / javascript / cookie
    * triggers. A pure Column predicate usable inside a `filter` lambda
    * over the split-lines array.
    */
  def c4KeepLine(line: Column, minWords: Int = 5,
                 blocklist: Seq[String] = defaultBlocklist): Column = {
    val l = rtrim(line)
    val base = l.rlike("[.!?\"]$") &&
      size(regexp_extract_all(l, lit("[^ ]+"), lit(0))) >= minWords
    blocklist.foldLeft(base)((acc, b) =>
      acc && !lower(l).contains(lit(b)))
  }

  val defaultBlocklist: Seq[String] =
    Seq("lorem ipsum", "javascript", "cookie policy")

  /** C4-style line-grain cleanup of a document table: split on newlines,
    * keep only lines passing [[c4KeepLine]], reassemble in original order.
    * APPENDS `(n_lines, n_kept, clean_text)` to the input row (the
    * in-place-gate convention of `TextAnalysis.qualityExpr`) — docs whose
    * every line drops stay in the output with `n_kept = 0` and empty
    * `clean_text`, so callers choose the document-level policy (C4 itself
    * then drops pages with < 3 surviving sentences).
    *
    * 100 TB shape: entirely row-local Column expressions (split → filter
    * lambda → array_join) — no explode, no shuffle, no join,
    * whole-stage codegen'd.
    */
  def c4CleanDocs(docs: DataFrame, textCol: String,
                  minWords: Int = 5,
                  blocklist: Seq[String] = defaultBlocklist): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l => c4KeepLine(l, minWords, blocklist))
    docs.withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_kept", size(kept).cast("long"))
      .withColumn("clean_text", array_join(kept, "\n"))
  }

  /** Tags whose content is dropped wholesale by [[htmlToText]] — styling,
    * scripting, and fallback blocks that never carry document text.
    */
  val droppedBlockTags: Seq[String] = Seq("script", "style", "noscript")

  /** Tags that imply a line break when stripped, so block structure
    * survives as newlines (and downstream line-grain ops — [[c4CleanDocs]],
    * `Dedup.dedupLines` — see real line boundaries, not one merged blob).
    */
  val blockTags: Seq[String] = Seq(
    "p", "div", "br", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "tr", "table", "section", "article", "header", "footer", "nav",
    "blockquote", "pre", "form", "hr", "title")

  /** The five entities HTML authors actually write by hand plus nbsp;
    * `&amp;` is decoded LAST so `&amp;lt;` correctly yields `&lt;`, not
    * `<`. Unknown entities (`&copy;` …) pass through untouched — this is
    * crawl cleanup, not a spec-complete entity table.
    */
  private val entityDecodes: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** Raw HTML → visible text: the first stage of every crawl-derived
    * training corpus (CommonCrawl WET-style extraction). Drops
    * comments and script/style/noscript blocks (content included), turns
    * block-level tags into newlines and inline tags into spaces, decodes
    * the common entities, and normalizes whitespace (horizontal runs →
    * one space, newline runs → one newline, ends trimmed).
    *
    * Every pattern stays in the RE2-compatible subset (non-greedy `.*?`
    * and inline `(?is)` flags, but no backreferences or lookaround — the
    * dropped-block patterns are enumerated per tag instead of
    * back-referencing the opening tag), so the identical chain runs on
    * java.util.regex and RE2 engines (DuckDB oracle) with the same
    * output. Pure codegen'd Column — no shuffle, no UDF; downstream
    * quality gates ([[c4CleanDocs]], Gopher rules) compose on top.
    */
  def htmlToText(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", "")
    val noBlocks = droppedBlockTags.foldLeft(noComments)((c, tag) =>
      regexp_replace(c, s"(?is)<$tag\\b[^>]*>.*?</$tag>", ""))
    val breaks = regexp_replace(noBlocks,
      "(?is)</?(" + blockTags.mkString("|") + ")\\b[^>]*/?>", "\n")
    val noTags = regexp_replace(breaks, "(?s)<[^>]*>", " ")
    // entity names are regex-literal-safe ([&a-z#0-9;] only) — the raw
    // string doubles as its own RE2-portable pattern
    val decoded = entityDecodes.foldLeft(noTags)((c, e) =>
      regexp_replace(c, e._1, e._2))
    val oneSpace = regexp_replace(decoded, "[ \\t\\r]+", " ")
    val oneBreak = regexp_replace(oneSpace, " ?\\n ?", "\n")
    val collapsed = regexp_replace(oneBreak, "\\n+", "\n")
    regexp_replace(collapsed, "^\\s+|\\s+$", "")
  }

  /** [[htmlToText]] over a document table: appends `text` (the extracted
    * visible text) and `n_chars` — row-local, shuffle-free.
    */
  def extractHtmlDocs(docs: DataFrame, htmlCol: String): DataFrame =
    docs.withColumn("text", htmlToText(col(htmlCol)))
      .withColumn("n_chars", length(col("text")).cast("long"))
}
