package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toSeq.toDF("url")
      .select(UrlOps.canonicalize(col("url")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
  }

  test("contract walk: case, www., default ports, tracking params, " +
      "param order, fragment, trailing slash") {
    assert(canon(
      "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
      "http://user@www.shop.io:80/cart?fbclid=abc&item=7",
      "http://example.com:8080//x?gclid=z",
      "https://example.com/",
      "https://example.com") == Seq(
      "https://example.com/a/b?a=1&b=2",
      "http://shop.io/cart?item=7",
      "http://example.com:8080//x",
      "https://example.com",
      "https://example.com"))
  }

  test("non-default ports survive; https on 80 is explicit, not default") {
    assert(canon("https://h.io:80/x", "http://h.io:443/x") ==
      Seq("https://h.io:80/x", "http://h.io:443/x"))
  }

  test("unparseable and NULL urls canonicalize to NULL; urlDedup " +
      "excludes them instead of colliding on a garbage key") {
    import spark.implicits._
    assert(canon("not a url") == Seq(null))
    val df = Seq((1L, "https://a.io/x"), (2L, "https://A.IO/x"),
      (3L, "not a url"), (4L, "also not one"))
      .toDF("id", "url")
    val got = UrlOps.urlDedup(df, "url", "id").collect()
    assert(got.length == 1)
    assert(got(0).getString(0) == "https://a.io/x")
    assert(got(0).getLong(1) == 1L && got(0).getLong(2) == 2L)
  }

  test("idempotence: canonicalize(canonicalize(u)) == canonicalize(u)") {
    import spark.implicits._
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
      "http://user@www.shop.io:80/cart?fbclid=abc&item=7",
      "http://example.com:8080//x?gclid=z",
      "https://h.io:80/x?z=1&y=2&x=3",
      "https://example.com/")
    val once = urls.toDF("url")
      .select(UrlOps.canonicalize(col("url")).as("c"))
    val twice = once.select(UrlOps.canonicalize(col("c")).as("c2"),
      col("c"))
    assert(twice.where(col("c2") =!= col("c")).count() == 0)
  }

  test("empty query after stripping drops the '?'; bare '?' drops too") {
    assert(canon("https://a.io/p?utm_campaign=1&utm_medium=2",
      "https://a.io/p?") == Seq("https://a.io/p", "https://a.io/p"))
  }

  test("perHostCap: bounded-heap plan (TopKPerGroupExec, no full sort " +
      "of the host partition) and md5-order picks match the window form " +
      "on a hot host") {
    import spark.implicits._
    // a mega-host (200 pages on one domain) + two small hosts
    val rows = (1L to 200L).map(i => (i, s"https://big.example.com/p$i")) ++
      Seq((501L, "https://tiny.io/a"), (502L, "https://tiny.io/b"),
        (503L, "https://tiny.io/c"), (601L, "https://solo.net/x"))
    val df = rows.toDF("id", "url")
    val out = UrlOps.perHostCap(df, "url", "id", n = 2)
    // structural: the cap runs through the bounded-heap operator; the
    // only Sort in the plan is the post-cap rank window (<= n rows per
    // host by construction), never a pre-cap sort of the raw host rows
    val phys = out.queryExecution.executedPlan
    assert(phys.toString.contains("TopKPerGroup"),
      "perHostCap did not plan through TopKPerGroupExec")
    val sorts = phys.collect {
      case s: org.apache.spark.sql.execution.SortExec => s }
    sorts.foreach { s =>
      assert(s.collectFirst {
        case t: graft.plans.TopKPerGroupExec => t }.nonEmpty,
        "found a Sort NOT fed by the bounded-heap cap (full host sort)")
    }
    // functional: identical pick to the reference row_number() form
    val expected = df
      .select(col("id"), UrlOps.canonicalHost(col("url")).as("host"))
      .where(col("host").isNotNull && col("host") =!= "")
      .withColumn("pos", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("host"))
          .orderBy(md5(col("id").cast("string")), col("id"))))
      .where(col("pos") <= 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val got = out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got == expected && got.size == 2 + 2 + 1)
  }

  test("robotsSitemaps: Sitemap directives surface from robots.txt " +
      "(CRLF-safe, comment-stripped, case-insensitive directive, URL " +
      "case preserved); hosts without one yield nothing") {
    import spark.implicits._
    val txts = Seq(
      "a.com" -> ("User-agent: *\r\nDisallow: /x\r\n" +
        "SITEMAP: https://a.com/SiteMap.xml # primary\r\n" +
        "sitemap: https://cdn.a.com/extra.xml\r\n"),
      "b.com" -> "User-agent: *\nDisallow: /\n")
    val got = UrlOps.robotsSitemaps(txts.toDF("host", "txt"),
        "host", "txt")
      .collect().map(r => (r.getString(0), r.getString(2))).toSeq
    assert(got == Seq(
      ("a.com", "https://a.com/SiteMap.xml"),
      ("a.com", "https://cdn.a.com/extra.xml")))
  }

  test("parseSitemap: urlset entries with entity-decoded locs and " +
      "optional lastmod; sitemapindex entries flag is_index; empty " +
      "locs and unclosed entries drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "<?xml version=\"1.0\"?><urlset><url>" +
        "<loc>https://a.com/p1</loc><lastmod>2026-01-02</lastmod></url>" +
        "<url><loc> https://a.com/p2?x=1&amp;y=2 </loc></url></urlset>"),
      (2L, "<sitemapindex><sitemap><loc>https://a.com/s-a.xml</loc>" +
        "</sitemap><sitemap><loc>https://a.com/s-b.xml</loc>" +
        "<lastmod>2026-02-03</lastmod></sitemap></sitemapindex>"),
      (3L, "<urlset><url><loc></loc></url><url>unclosed")).toDF("id", "xml")
    val got = UrlOps.parseSitemap(docs, "id", "xml")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)), r.getBoolean(4))).toSet
    assert(got == Set(
      (1L, 0L, "https://a.com/p1", Some("2026-01-02"), false),
      (1L, 1L, "https://a.com/p2?x=1&y=2", None, false),
      (2L, 0L, "https://a.com/s-a.xml", None, true),
      (2L, 1L, "https://a.com/s-b.xml", Some("2026-02-03"), true)))
  }

  test("registrableDomain: two-level public suffixes keep three " +
      "labels, plain TLDs keep two, IPv4 and bare hosts pass " +
      "through; domainRollup groups hosts into sites") {
    import spark.implicits._
    val hosts = Seq("news.bbc.co.uk", "bbc.co.uk", "co.uk",
      "shop.example.com", "example.com", "10.0.0.7", "localhost",
      "deep.sub.site.com.au")
    val got = hosts.toDF("h")
      .select(UrlOps.registrableDomain(col("h"))).collect()
      .map(_.getString(0)).toSeq
    assert(got == Seq("bbc.co.uk", "bbc.co.uk", "co.uk",
      "example.com", "example.com", "10.0.0.7", "localhost",
      "site.com.au"))
    val urls = Seq(
      (1L, "https://news.bbc.co.uk/one"), (2L, "https://www.bbc.co.uk/two"),
      (3L, "https://shop.example.com/x"), (4L, "https://example.com/y"),
      (5L, "http://10.0.0.7/z"), (6L, "::bad::")).toDF("id", "url")
    val roll = UrlOps.domainRollup(urls, "url")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(roll == Map(
      "bbc.co.uk" -> ((2L, 2L)), "example.com" -> ((2L, 2L)),
      "10.0.0.7" -> ((1L, 1L))))
  }

  test("frontierSchedule: per-host cap rides the bounded heap, " +
      "Crawl-delay spaces fetches, undeclared hosts get the default") {
    import spark.implicits._
    val urls = Seq((1L, "https://a.com/1"), (2L, "https://a.com/2"),
      (3L, "https://a.com/3"), (4L, "https://a.com/4"),
      (5L, "https://b.com/1")).toDF("id", "url")
    val delays = Seq(("a.com", 2000L)).toDF("host", "delay_ms")
    val out = UrlOps.frontierSchedule(urls, "url", "id", delays,
      defaultDelayMs = 700L, cap = 3)
    assert(out.queryExecution.executedPlan.toString
      .contains("TopKPerGroup"),
      "frontierSchedule did not plan through the bounded-heap cap")
    val rows = out.orderBy("host", "pos").collect()
    assert(rows.length == 4) // a.com capped 4 -> 3, b.com 1
    val a = rows.filter(_.getAs[String]("host") == "a.com")
    assert(a.map(_.getAs[Int]("pos")).toSeq == Seq(1, 2, 3))
    assert(a.map(_.getAs[Long]("delay_ms")).forall(_ == 2000L))
    assert(a.map(_.getAs[Long]("fetch_at_ms")).toSeq ==
      Seq(0L, 2000L, 4000L))
    val b = rows.filter(_.getAs[String]("host") == "b.com").head
    assert(b.getAs[Long]("delay_ms") == 700L &&
      b.getAs[Long]("fetch_at_ms") == 0L)
  }

  test("recrawlPlan: new/refetch/keep/gone; same-day or unparseable " +
      "lastmod cannot prove staleness; datetime lastmod compares at " +
      "day grain") {
    import spark.implicits._
    val entries = Seq(
      ("https://s.com/stale", Some("2026-02-02")),
      ("https://s.com/fresh", Some("2026-01-01")),
      ("https://s.com/sameday", Some("2026-01-15T23:59:00+00:00")),
      ("https://s.com/junk", Some("not-a-date")),
      ("https://s.com/nolm", None),
      ("https://s.com/new", Some("2026-03-01"))
    ).toDF("loc", "lastmod")
    val snap = Seq(
      "https://s.com/stale", "https://s.com/fresh",
      "https://s.com/sameday", "https://s.com/junk",
      "https://s.com/nolm", "https://s.com/gone")
      .map((_, "2026-01-15")).toDF("url", "fetched_on")
    val r = UrlOps.recrawlPlan(entries, "loc", "lastmod",
        snap, "url", "fetched_on")
      .collect()
      .map(x => x.getAs[String]("url") -> x.getAs[String]("action"))
      .toMap
    assert(r == Map(
      "https://s.com/stale" -> "refetch",
      "https://s.com/fresh" -> "keep",
      "https://s.com/sameday" -> "keep",
      "https://s.com/junk" -> "keep",
      "https://s.com/nolm" -> "keep",
      "https://s.com/new" -> "new",
      "https://s.com/gone" -> "gone"))
  }
}
