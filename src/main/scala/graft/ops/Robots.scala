package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** robots.txt politeness filtering — the Robots Exclusion Protocol
  * (RFC 9309) subset crawl pipelines apply when re-filtering fetched
  * corpora: group structure (consecutive `User-agent` lines + following
  * rules), `*` user-agent groups, `Allow`/`Disallow` prefix rules with
  * longest-match precedence and Allow winning length ties. Documented
  * simplifications (the common large-crawl subset): directive names are
  * matched case-insensitively and `#` comments stripped, but path
  * wildcards (`*`, `$`) are treated as literals — pipelines needing full
  * wildcard REP pre-expand those few rules.
  *
  * Reference scope: yaetos has no crawl operators; this composes with
  * `sources.Warc` → [[Robots]] → `WebText.htmlToText` → C4/Gopher into
  * the raw-crawl branch.
  */
object Robots {

  /** Parse a `(domain, robots_txt)` table into per-domain `*`-group
    * rules: `(domain, rule_path, is_allow)` — one row per Allow/Disallow
    * directive governed by a `User-agent: *` group. Empty-path
    * `Disallow:` lines (meaning "allow everything") parse to rule rows
    * with an empty path and `is_allow = true`, which longest-match then
    * treats as the weakest rule — RFC semantics fall out for free.
    *
    * Shape: explode robots lines (bounded per domain — robots files cap
    * at ~500 KiB), per-domain windows to recover group structure, filter
    * to starred groups. Partitioned by domain throughout; no global
    * window, no driver work.
    */
  def parseRules(robots: DataFrame, domainCol: String = "domain",
                 txtCol: String = "robots_txt"): DataFrame = {
    val lines = robots.select(col(domainCol).as("domain"),
        posexplode(split(col(txtCol), "\n")).as(Seq("pos", "raw")))
      // strip comments + whitespace; keep pos for group reconstruction
      .select(col("domain"), col("pos"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .filter(col("line") =!= "")
    val tagged = lines.select(col("domain"), col("pos"), col("line"),
      col("line").rlike("(?i)^user-agent\\s*:").as("is_ua"),
      trim(regexp_replace(col("line"), "(?i)^[a-z-]+\\s*:", "")).as("value"),
      lower(regexp_extract(col("line"), "(?i)^([a-z-]+)\\s*:", 1)).as("directive"))
    val w = Window.partitionBy("domain").orderBy("pos")
    // a group starts at a UA line whose predecessor is not a UA line
    val grouped = tagged
      .withColumn("prev_ua", lag(col("is_ua"), 1, false).over(w))
      .withColumn("grp", sum((col("is_ua") && !col("prev_ua")).cast("long")).over(w))
    val starGroups = grouped.filter(col("is_ua"))
      .groupBy("domain", "grp")
      .agg(max(col("value") === "*").as("has_star"))
      .filter(col("has_star")).drop("has_star")
    grouped.filter(col("directive").isin("allow", "disallow"))
      .join(starGroups, Seq("domain", "grp"))
      .select(col("domain"), col("value").as("rule_path"),
        (col("directive") === "allow" || col("value") === "").as("is_allow"))
      .distinct()
  }

  /** URL path (+query) for rule matching: strip scheme+authority, keep
    * `/path?query`, drop fragments; bare-host URLs match as `/`.
    */
  def pathOf(url: Column): Column = {
    val stripped = regexp_replace(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    val noFrag = regexp_replace(stripped, "#.*$", "")
    when(noFrag === "" || !noFrag.startsWith("/"),
      concat(lit("/"), noFrag)).otherwise(noFrag)
  }

  /** Filter a URL table by robots rules: keep rows whose URL is ALLOWED
    * for `User-agent: *` under longest-match REP (no governing rule =
    * allowed; no robots row for the domain = allowed). Appends nothing;
    * blocked rows drop.
    *
    * Plan shape: rules are exploded per domain and joined on the URL's
    * domain — rule tables are tiny relative to page tables (one row per
    * directive per domain), so the join broadcasts under the gate
    * (`maxBroadcastRules`, count skippable via `ruleRows`) and the page
    * side never shuffles; the longest-match argmax is a `max_by` over
    * matched rules grouped by the page's own key, shuffle-free in the
    * broadcast regime thanks to partial aggregation on the page
    * partitions.
    */
  def filterAllowed(pages: DataFrame, robots: DataFrame,
                    urlCol: String = "url",
                    domainCol: String = "domain",
                    txtCol: String = "robots_txt",
                    maxBroadcastRules: Long = 10000000L,
                    ruleRows: Option[Long] = None): DataFrame = {
    val rules = parseRules(robots, domainCol, txtCol)
    val ruleSide =
      if (ruleRows.getOrElse(rules.count()) <= maxBroadcastRules)
        broadcast(rules)
      else rules
    // a synthetic row id keys the per-page argmax so the aggregation
    // never hashes full page payloads as its group key (page rows carry
    // whole documents); ids are assigned before the join, so each page
    // row groups its own matched rules and nothing else
    val withKey = pages
      .withColumn("_r_rid", monotonically_increasing_id())
      .withColumn("_r_domain", WebText.domainOf(col(urlCol)))
      .withColumn("_r_path", pathOf(col(urlCol)))
    // left join: domains with no robots (or no * rules) keep their pages
    val matched = withKey.join(ruleSide,
      withKey("_r_domain") === ruleSide("domain") &&
        col("_r_path").startsWith(col("rule_path")), "left")
    // verdict per page row: longest matching rule wins, allow wins ties
    // (is_allow sorts after !is_allow in the max struct); no match ->
    // null struct -> allowed. Page columns are constant per rid, so
    // first() carries them deterministically.
    val verdict = matched
      .groupBy("_r_rid")
      .agg(max(when(col("rule_path").isNotNull,
          struct(length(col("rule_path")).as("l"), col("is_allow").as("a"))))
          .as("_r_best"),
        pages.columns.map(c => first(withKey(c)).as(c)): _*)
    verdict.filter(col("_r_best").isNull || col("_r_best.a"))
      .select(pages.columns.map(col): _*)
  }
}
