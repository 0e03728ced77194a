package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** robots.txt REP subset: group reconstruction, `*`-group selection,
  * longest-match Allow/Disallow precedence, and the no-robots defaults.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val robotsTxt =
    """# politeness rules
      |User-agent: Googlebot
      |Disallow: /google-only
      |
      |User-agent: extra-bot
      |User-agent: *
      |Disallow: /private
      |Allow: /private/ok
      |ALLOW: /dup
      |disallow: /dup
      |Disallow:
      |
      |User-agent: other
      |Allow: /""".stripMargin

  private val robots = Seq(("a.example", robotsTxt)).toDF("domain", "robots_txt")

  test("parseRules keeps only *-group directives, case-insensitively") {
    val rules = Robots.parseRules(robots)
      .as[(String, String, Boolean)].collect().toSet
    assert(rules == Set(
      ("a.example", "/private", false),
      ("a.example", "/private/ok", true),
      ("a.example", "/dup", true),
      ("a.example", "/dup", false),
      ("a.example", "", true)))
  }

  test("longest match wins; allow wins length ties; defaults keep pages") {
    val pages = Seq(
      (1L, "https://a.example/"),                    // weakest rule ("") only
      (2L, "https://a.example/private/secret"),      // /private deny
      (3L, "https://a.example/private/ok/page"),     // longer allow overrides
      (4L, "https://a.example/dup/page"),            // exact-length tie -> allow
      (5L, "https://a.example/google-only"),         // non-* group ignored
      (6L, "https://b.example/anything")             // no robots row at all
    ).toDF("id", "url")
    val kept = Robots.filterAllowed(pages, robots)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L, 5L, 6L))
  }

  test("shuffle fallback matches the broadcast path; schema passes through") {
    val pages = Seq(
      (1L, "https://a.example/private/x", "payload"),
      (2L, "https://a.example/open", "payload2")).toDF("id", "url", "body")
    val bc = Robots.filterAllowed(pages, robots)
    val shuf = Robots.filterAllowed(pages, robots, maxBroadcastRules = 0L)
    assert(bc.columns.toSeq == Seq("id", "url", "body"))
    assert(bc.collect().map(_.toSeq).toSet == shuf.collect().map(_.toSeq).toSet)
    assert(bc.select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("bare-host and fragment URLs normalize to matchable paths") {
    val df = Seq("https://x.example", "https://x.example/a/b#frag",
      "http://x.example/?q=1").toDF("u")
    val paths = df.select(Robots.pathOf(col("u"))).as[String].collect().toSeq
    assert(paths == Seq("/", "/a/b", "/?q=1"))
  }
}
