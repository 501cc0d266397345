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
}
