package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HTML boilerplate extraction: the three shallow-feature gates on
  * hand-built pages, plus the adversarial markup a crawl actually
  * contains — script/style payloads, comments, CDATA, escaped markup,
  * nested inline tags, entities, and all-boilerplate documents. */
class HtmlExtractSpec extends SparkSpec {

  private def run(docs: (Long, String)*) = {
    import spark.implicits._
    HtmlExtract.extractText(docs.toSeq.toDF("id", "html"), "id", "html")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
  }

  private val prose = "The quick brown fox jumped over the lazy dog " +
    "and the dog was not amused by any of it at all."

  test("a realistic page: nav and footer link farms drop, prose " +
      "paragraphs survive, script/style/comment payloads never leak") {
    val html =
      s"""<!DOCTYPE html><html><head>
         |<title>Ignore me too short</title>
         |<style>body { color: red; } .the .and .of {}</style>
         |<script>var the = "of and to in is that for on with";</script>
         |</head><body>
         |<nav><ul><li><a href="/">Home</a></li><li><a href="/x">
         |Products</a></li><li><a href="/y">About us</a></li></ul></nav>
         |<!-- the comment of the year, full of the stopwords -->
         |<div class="content">
         |<p>$prose</p>
         |<p>It is a truth universally acknowledged that a single man in
         |possession of a good fortune must be in want of a wife.</p>
         |</div>
         |<footer><a href="/tos">Terms of service</a> |
         |<a href="/privacy">Privacy</a> | <a href="/jobs">Jobs</a>
         |</footer></body></html>""".stripMargin
    val got = run((1L, html))(1L)
    assert(got._1.contains("quick brown fox"))
    assert(got._1.contains("truth universally acknowledged"))
    assert(!got._1.contains("Home"))          // nav farm gone
    assert(!got._1.contains("Terms"))         // footer farm gone
    assert(!got._1.contains("color: red"))    // style payload gone
    assert(!got._1.contains("stopwords"))     // comment gone
    assert(!got._1.toLowerCase.contains("var ")) // script payload gone
    assert(got._3 == 2L)                      // exactly the two paragraphs
  }

  test("escaped markup stays literal text (entities decode AFTER the " +
      "tag strip); &amp;lt; double-escape yields the literal '&lt;'") {
    val html = "<p>We saw that the &lt;b&gt;tag&lt;/b&gt; of the page " +
      "was in the source and the parser kept it as text.</p>" +
      "<p>The escape of the escape is &amp;lt; and it stays that way " +
      "in the text for all of the readers to see.</p>"
    val got = run((1L, html))(1L)
    assert(got._1.contains("<b>tag</b>"))
    assert(got._1.contains("is &lt; and"))
    assert(got._3 == 2L)
  }

  test("CDATA drops; nested inline tags keep their words; &nbsp; and " +
      "&quot; decode; entity-only separation still word-splits") {
    val html = "<p><![CDATA[the raw cdata of the world]]>" +
      "The <b>bold</b> and the <i>italic</i> words of the text are " +
      "all kept in the flow of the sentence as it was written.</p>"
    val got = run((1L, html))(1L)
    assert(got._1.contains("bold") && got._1.contains("italic"))
    assert(!got._1.contains("cdata"))
    val html2 = "<p>He said &quot;the answer&quot; was&nbsp;in the " +
      "book of the elders and it was a good answer for all of us.</p>"
    assert(run((2L, html2))(2L)._1.contains("\"the answer\" was in"))
  }

  test("an all-boilerplate document comes back empty but VISIBLE " +
      "(n_kept = 0, text = ''), never dropped") {
    val html = "<nav><a href='/'>Home</a> <a href='/a'>A</a></nav>" +
      "<footer>copyright</footer>"
    val got = run((1L, html))(1L)
    assert(got._1 == "" && got._3 == 0L && got._2 > 0L)
  }

  test("the link-density gate: the SAME prose drowns once half its " +
      "characters turn into anchor text") {
    val linky = "<p>" + (1 to 12).map(i =>
      s"""<a href="/$i">the link number $i of the list</a>""")
      .mkString(" and ") + "</p>"
    val got = run((1L, linky))(1L)
    assert(got._3 == 0L, "a block that is mostly anchors must drop")
    // blockMetrics shows WHY: link_ppm past the 200000 default
    import spark.implicits._
    val m = HtmlExtract.blockMetrics(
        Seq((1L, linky)).toDF("id", "html"), "id", "html")
      .collect().head
    assert(m.getAs[Long]("link_ppm") > 200000L)
    assert(!m.getAs[Boolean]("keep"))
  }

  test("the stopword gate: minStopPpm = 0 disables it (the non-English " +
      "knob) and admits stopword-free text that passes the other gates") {
    import spark.implicits._
    val foreign = "<p>zxcv qwer asdf uiop hjkl vbnm tyui ghjk bnmv " +
      "wert sdfg xcvb erty dfgh cvbn rtyu fghj</p>"
    val strict = run((1L, foreign))(1L)
    assert(strict._3 == 0L)
    val relaxed = HtmlExtract.extractText(
        Seq((1L, foreign)).toDF("id", "html"), "id", "html",
        minStopPpm = 0L)
      .collect().head
    assert(relaxed.getLong(3) == 1L)
  }

  test("block-wrapping anchors (<a><div>text</div></a> card markup): " +
      "the anchor text is NOT severed from its chars by the block " +
      "split — a wordy link-card farm still fails the link-density " +
      "gate while sibling prose survives") {
    val html = "<div class=\"cards\">" +
      "<a href=\"/p1\"><div>The tour of the products and the list of " +
      "the plans for the teams</div></a>" +
      "<a href=\"/p2\"><div>The story of the company and the people " +
      "behind it in the press</div></a></div>" +
      s"<p>$prose</p>"
    val got = run((1L, html))(1L)
    // without anchor-block merging the two cards pass every gate
    // (wordy, stopword-dense, seemingly 0 anchor chars) and ship
    assert(!got._1.contains("tour of the products"))
    assert(!got._1.contains("story of the company"))
    assert(got._1.contains("quick brown fox"))
    assert(got._3 == 1L)
    // inline anchors inside prose still keep their block intact
    val inline = run((2L,
      s"<p>$prose See <a href=\"/more\">the notes</a> for more.</p>"))(2L)
    assert(inline._1.contains("quick brown fox") &&
      inline._1.contains("the notes"))
  }

  private def links(url: String, html: String): Seq[String] = {
    import spark.implicits._
    HtmlExtract.extractLinks(Seq((1L, url, html)).toDF("id", "url", "html"),
        "id", "url", "html")
      .collect().head.getSeq[String](2).toSeq
  }

  test("extractLinks resolution: absolute kept, protocol-relative " +
      "takes the base scheme, root-relative and relative resolve " +
      "against the page, ../ and ./ normalize, fragments and " +
      "non-http schemes drop, &amp; decodes") {
    val got = links("https://site.example/dir/page.html",
      "<a href=\"https://other.example/x\">a</a>" +
        "<a href=\"//proto.example/y\">b</a>" +
        "<a href=\"/rooted/z\">c</a>" +
        "<a href=\"sibling.html\">d</a>" +
        "<a href=\"./same/one\">e</a>" +
        "<a href=\"../up/two\">f</a>" +
        "<a href=\"a/../b/./c\">g</a>" +
        "<a href=\"q?x=1&amp;y=2\">h</a>" +
        "<a href=\"#frag\">i</a>" +
        "<a href=\"page.html#sec\">j</a>" +
        "<a href=\"mailto:a@b.c\">k</a>" +
        "<a href=\"javascript:void(0)\">l</a>" +
        "<a href='single.html'>m</a>" +
        "<a href=unquoted.html>n</a>")
    assert(got == Seq(
      "https://other.example/x",
      "https://proto.example/y",
      "https://site.example/rooted/z",
      "https://site.example/dir/sibling.html",
      "https://site.example/dir/same/one",
      "https://site.example/up/two",
      "https://site.example/dir/b/c",
      "https://site.example/dir/q?x=1&y=2",
      "https://site.example/dir/page.html",
      "https://site.example/dir/single.html",
      "https://site.example/dir/unquoted.html"))
  }

  test("extractLinks honors <base href> (first occurrence) for " +
      "relative targets; anchors in script/comment regions never " +
      "count; an unparseable page URL fails closed for relatives " +
      "but still passes absolutes through") {
    val got = links("https://site.example/dir/page.html",
      "<base href=\"https://base.example/assets/\">" +
        "<a href=\"lib/app.js\">a</a><a href=\"/rooted\">b</a>" +
        "<script>var s = '<a href=\"/never\">x</a>';</script>" +
        "<!-- <a href=\"/ghost\">y</a> -->")
    assert(got == Seq("https://base.example/assets/lib/app.js",
      "https://base.example/rooted"))
    val bad = links("::notaurl::",
      "<a href=\"rel/x\">a</a><a href=\"https://abs.example/y\">b</a>")
    assert(bad == Seq("https://abs.example/y"))
  }

  test("determinism + empty/degenerate inputs: empty html, html with " +
      "no tags at all, unclosed tags") {
    val noTags = "The plain text of the document is the whole of the " +
      "content and it has no markup in it at all anywhere."
    val got = run((1L, ""), (2L, noTags), (3L, "<p>the <b>unclosed"))
    assert(got(1L) == (("", 0L, 0L)))
    assert(got(2L)._1 == noTags && got(2L)._3 == 1L)
    // unclosed tag: '<b' eats to the next '>' or end-of-string; the
    // walk never throws
    assert(got(3L)._2 >= 0L)
    assert(run((1L, noTags)) == run((1L, noTags)))
  }
}
