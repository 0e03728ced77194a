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
}
