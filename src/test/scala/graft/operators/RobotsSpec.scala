package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Robots Exclusion Protocol (RFC 9309): grouping, agent selection,
  * longest-match decisions, wildcards, and the fail-open contracts. */
class RobotsSpec extends SparkSpec {

  private val robotsTxt =
    """# crawl policy
      |User-agent: alphabot
      |User-agent: betabot
      |Disallow: /private/
      |Allow: /private/press/
      |
      |User-agent: *
      |Disallow: /tmp/
      |Disallow: /search$
      |Allow: /tmp/public*
      |Crawl-delay: 10
      |Sitemap: https://a.com/sitemap.xml
      |
      |User-agent: alphabot
      |Disallow: /alpha-only/
      |""".stripMargin

  private def rules(txts: (String, String)*) = {
    import spark.implicits._
    UrlOps.parseRobots(txts.toSeq.toDF("host", "txt"), "host", "txt")
  }

  private def eval(agent: String, urls: Seq[String],
      txts: (String, String)*) = {
    import spark.implicits._
    UrlOps.evaluateRobots(urls.toDF("url"), "url",
        rules(txts: _*), agent)
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(2), Option(r.getString(3)), Option(r.getString(4)))))
      .toMap
  }

  test("parse: consecutive UA lines share a group, rules bind to the " +
      "group above them, comments and unknown directives drop, agent " +
      "values lowercase, paths keep case") {
    val r = rules("a.com" -> robotsTxt)
      .orderBy("line_no")
      .collect().map(x => (x.getLong(1), x.getString(3), x.getString(4)))
    assert(r.toSeq == Seq(
      (1L, "user-agent", "alphabot"),
      (1L, "user-agent", "betabot"),
      (1L, "disallow", "/private/"),
      (1L, "allow", "/private/press/"),
      (2L, "user-agent", "*"),
      (2L, "disallow", "/tmp/"),
      (2L, "disallow", "/search$"),
      (2L, "allow", "/tmp/public*"),
      (3L, "user-agent", "alphabot"),
      (3L, "disallow", "/alpha-only/")))
  }

  test("evaluate for a named agent: its groups MERGE (both alphabot " +
      "groups apply), the * group does not; longest rule wins and " +
      "allow beats disallow on ties") {
    val got = eval("AlphaBot", Seq(
      "https://a.com/private/x",        // disallow /private/
      "https://a.com/private/press/x",  // allow wins (longer)
      "https://a.com/alpha-only/y",     // second alphabot group merges
      "https://a.com/tmp/anything",     // * group NOT consulted
      "https://a.com/other"),           // no rule -> allowed
      "a.com" -> robotsTxt)
    assert(got("https://a.com/private/x") ==
      ((false, Some("disallow"), Some("/private/"))))
    assert(got("https://a.com/private/press/x") ==
      ((true, Some("allow"), Some("/private/press/"))))
    assert(got("https://a.com/alpha-only/y") ==
      ((false, Some("disallow"), Some("/alpha-only/"))))
    assert(got("https://a.com/tmp/anything") == ((true, None, None)))
    assert(got("https://a.com/other") == ((true, None, None)))
  }

  test("evaluate for an unlisted agent: the * group applies; '*' " +
      "wildcards and the '$' end anchor match per the RFC") {
    val got = eval("gammabot", Seq(
      "https://a.com/tmp/secret",       // disallow /tmp/
      "https://a.com/tmp/public-data",  // allow /tmp/public* (longer)
      "https://a.com/search",           // $-anchored disallow
      "https://a.com/search/results",   // anchor does NOT match deeper
      "https://a.com/private/x"),       // alphabot group not consulted
      "a.com" -> robotsTxt)
    assert(got("https://a.com/tmp/secret")._1 == false)
    assert(got("https://a.com/tmp/public-data")._1 == true)
    assert(got("https://a.com/search") ==
      ((false, Some("disallow"), Some("/search$"))))
    assert(got("https://a.com/search/results") == ((true, None, None)))
    assert(got("https://a.com/private/x") == ((true, None, None)))
  }

  test("fail-open contracts: host without robots.txt allows; an " +
      "unparseable URL allows with NULL host; empty Disallow is no " +
      "restriction; regex metachars in paths stay literal") {
    val got = eval("anybot", Seq(
      "https://no-robots.com/anything",
      "::bad::"),
      "a.com" -> robotsTxt)
    assert(got("https://no-robots.com/anything")._1 == true)
    assert(got("::bad::")._1 == true)
    val meta = eval("anybot", Seq(
      "https://m.com/a.b/c",    // '.' literal: matches the rule
      "https://m.com/aXb/c",    // would match if '.' were regex
      "https://m.com/ok"),
      "m.com" -> "User-agent: *\nDisallow: /a.b/\nDisallow:\n")
    assert(meta("https://m.com/a.b/c")._1 == false)
    assert(meta("https://m.com/aXb/c")._1 == true)
    assert(meta("https://m.com/ok")._1 == true)
  }

  test("CRLF-encoded robots.txt parses identically to the LF form — " +
      "no trailing \\r survives on agents or rule paths") {
    val lf = rules("a.com" -> robotsTxt).orderBy("line_no")
      .collect().map(x => (x.getLong(1), x.getString(3), x.getString(4)))
    val crlf = rules("a.com" -> robotsTxt.replace("\n", "\r\n"))
      .orderBy("line_no")
      .collect().map(x => (x.getLong(1), x.getString(3), x.getString(4)))
    assert(crlf.toSeq == lf.toSeq)
    // the failure mode this pins: a trailing \r on the UA value would
    // stop 'alphabot' from ever matching, fail-opening the host
    val got = eval("alphabot", Seq("https://a.com/private/x"),
      "a.com" -> robotsTxt.replace("\n", "\r\n"))
    assert(got("https://a.com/private/x")._1 == false)
  }

  test("rules match against path?query (RFC 9309/Google): " +
      "'Disallow: /search?q=*' blocks /search?q=x but not /search, " +
      "'/*?sessionid=' fires mid-URL, and a $-anchored '/search$' " +
      "does NOT block a query-bearing /search?q=x") {
    val txt = "User-agent: *\nDisallow: /search?q=*\n" +
      "Disallow: /*?sessionid=\nDisallow: /exact$\n"
    val got = eval("anybot", Seq(
      "https://q.com/search?q=x",       // query rule matches
      "https://q.com/search",           // no query -> rule inert
      "https://q.com/page?sessionid=9", // mid-URL wildcard query rule
      "https://q.com/page?id=9",        // different param: allowed
      "https://q.com/exact",            // $ anchor on the bare path
      "https://q.com/exact?x=1"),       // query breaks the $ anchor
      "q.com" -> txt)
    assert(got("https://q.com/search?q=x") ==
      ((false, Some("disallow"), Some("/search?q=*"))))
    assert(got("https://q.com/search") == ((true, None, None)))
    assert(got("https://q.com/page?sessionid=9")._1 == false)
    assert(got("https://q.com/page?id=9") == ((true, None, None)))
    assert(got("https://q.com/exact")._1 == false)
    assert(got("https://q.com/exact?x=1") == ((true, None, None)))
  }

  test("a bare-host URL evaluates as path '/': 'Disallow: /' blocks " +
      "the whole host including its root") {
    val got = eval("anybot", Seq(
      "https://closed.com",
      "https://closed.com/deep/page"),
      "closed.com" -> "User-agent: *\nDisallow: /\n")
    assert(got.values.forall(!_._1))
  }

  test("robotsCrawlDelay: the agent's merged groups supply the delay " +
      "(largest wins), fractional seconds become integer ms, junk " +
      "values drop, hosts without a delay are absent") {
    import spark.implicits._
    val txts = Seq(
      "a.com" -> ("User-agent: alphabot\nCrawl-delay: 2\n\n" +
        "User-agent: *\nCrawl-delay: 10\n\n" +
        "User-agent: alphabot\nCrawl-delay: 1.5\n"),
      "b.com" -> "User-agent: *\nCrawl-delay: 0.5\n",
      "c.com" -> "User-agent: *\nCrawl-delay: soon\n",
      "d.com" -> "User-agent: *\nDisallow: /x\n")
    def delays(agent: String) =
      UrlOps.robotsCrawlDelay(txts.toDF("host", "txt"), "host", "txt",
          agent)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // alphabot: its two merged groups carry 2 s and 1.5 s -> 2000 ms;
    // the * group's 10 s is NOT consulted
    assert(delays("AlphaBot") == Map("a.com" -> 2000L, "b.com" -> 500L))
    assert(delays("gammabot") == Map("a.com" -> 10000L, "b.com" -> 500L))
  }
}
