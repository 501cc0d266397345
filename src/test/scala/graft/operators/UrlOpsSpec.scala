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
}
