package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text boilerplate extraction — the crawl front-end stage every
  * CommonCrawl-class LLM pipeline runs before anything downstream
  * ([[CorpusOps.unitDedup]], the Gopher gates, language ID all assume
  * EXTRACTED text). The algorithm is the jusText/trafilatura family's
  * core idea re-expressed in the house exact-integer style: segment the
  * document into BLOCKS at block-level tags, score each block by
  * length, link density, and stopword density, and keep only blocks
  * that look like running prose — navigation, footers, and link farms
  * are short and link-heavy; body paragraphs are long, link-light, and
  * stopword-dense (Kohlschütter et al. 2010, "Boilerplate Detection
  * Using Shallow Text Features", establishes exactly these three
  * features as the load-bearing ones).
  *
  * Everything is a pure `Column` pipeline over regexp/array functions —
  * MAP-ONLY (the ideal 100 TB transform: no shuffle, whole-stage
  * codegen, oracle-portable to any engine with RE2-class regexes; no
  * backreferences are used anywhere, so RE2 runs every pattern):
  *   1. drop non-content regions (script/style/noscript/template
  *      elements, comments, CDATA)
  *   2. neutralize block tags INSIDE anchor elements (card/nav markup
  *      wraps blocks in `<a>`; the anchor must survive the split whole
  *      or its text sheds its anchor chars), then split on block-level
  *      tags (p, div, h1-h6, li, td, br, ...)
  *   3. per block: anchor-text length (from `<a>` spans BEFORE tag
  *      strip), then tag-strip → entity-decode → whitespace-normalize,
  *      word count, stopword occurrences
  *   4. integer gates: words ≥ `minWords`, link density ≤ `maxLinkPpm`
  *      (anchor chars ·10⁶ div text chars), stopword density ≥
  *      `minStopPpm` (occurrences ·10⁶ div words; 0 disables — the
  *      knob a non-English corpus turns)
  *
  * Entities decode AFTER the tag strip, so escaped markup (`&lt;b&gt;`)
  * stays literal text instead of becoming strippable tags — the order
  * an extractor must use to not eat user-visible content.
  */
object HtmlExtract {

  /** English function-word core for the stopword-density gate (the
    * jusText signal: running prose is dense in these; boilerplate and
    * link lists are not). Deliberately small and pinned — the list is
    * part of the operator contract, mirrored in oracle twins. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "in", "and", "is", "was", "that",
    "for", "on", "with", "as", "at", "by", "it", "be", "are", "from")

  /** Block-level boundary tags: entering or leaving any of these ends
    * the current text block. Inline markup (a, b, i, em, strong, span,
    * img, code, small, u) stays INSIDE blocks so link density sees it. */
  private val blockSplitRe =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|" +
      "section|article|header|footer|nav|aside|main|figure|figcaption|" +
      "blockquote|pre|address|fieldset|form|hr|br|title|head|body|html)" +
      "(?:\\s[^>]*)?/?>"

  private def dropRegions(html: Column): Column = {
    val noScript = Seq("script", "style", "noscript", "template")
      .foldLeft(html) { (c, tag) =>
        regexp_replace(c, s"(?is)<$tag\\b[^>]*>.*?</$tag>", " ")
      }
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    regexp_replace(noComment, "(?s)<!\\[CDATA\\[.*?\\]\\]>", " ")
  }

  private def stripTags(c: Column): Column =
    regexp_replace(c, "<[^>]*>", " ")

  /** The common five named entities + numeric apostrophe + nbsp;
    * `&amp;` decodes LAST so `&amp;lt;` yields the literal `&lt;`. */
  private def decodeEntities(c: Column): Column = {
    val pairs = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    pairs.foldLeft(c) { case (acc, (e, ch)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(e), ch)
    }
  }

  private def normWs(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  private def blockText(b: Column): Column =
    normWs(decodeEntities(stripTags(b)))

  private val stopRe = "\\b(" + stopwords.mkString("|") + ")\\b"

  private val anchorRe = "(?is)<a\\b[^>]*>.*?</a>"

  /** Anchors that WRAP block content (`<a href=..><div>Products</div>
    * </a>` — the standard modern nav/card markup) would be severed from
    * their text by the block split: the anchor chars land in one block,
    * the text in another, and a link farm in that shape evades the
    * link-density gate. Neutralize block-boundary tags INSIDE each
    * anchor element first (an anchor is one navigation unit — its
    * content reads as one block), so every anchor survives the split
    * whole and its chars count where its text lands. Rebuilt by
    * interleaving the split-around-anchors pieces with the cleaned
    * anchors — pure array functions, still map-only. */
  private def mergeAnchorBlocks(doc: Column): Column = {
    val anchors = regexp_extract_all(doc, lit(anchorRe), lit(0))
    val cleaned = transform(anchors,
      a => regexp_replace(a, blockSplitRe, " "))
    val pieces = split(doc, anchorRe, -1)
    when(size(cleaned) === 0, doc).otherwise(
      aggregate(sequence(lit(1), size(cleaned)), element_at(pieces, 1),
        (acc, i) => concat(acc, element_at(cleaned, i),
          element_at(pieces, i + 1))))
  }

  /** Per-block audit rows: (id, block_idx, text, n_chars, n_words,
    * n_anchor_chars, link_ppm, stop_ppm, keep) — one row per non-empty
    * block. The gates' working is VISIBLE here; [[extractText]] folds
    * the same structs without exploding. */
  def blockMetrics(docs: DataFrame, idCol: String, htmlCol: String,
      minWords: Int = 5, maxLinkPpm: Long = 200000L,
      minStopPpm: Long = 30000L): DataFrame =
    docs.select(col(idCol).as("id"),
        posexplode(blockStructs(col(htmlCol), minWords, maxLinkPpm,
          minStopPpm)).as(Seq("block_idx", "b")))
      .select(col("id"), col("block_idx").cast("long").as("block_idx"),
        col("b.text").as("text"), col("b.n_chars").as("n_chars"),
        col("b.n_words").as("n_words"),
        col("b.n_anchor_chars").as("n_anchor_chars"),
        col("b.link_ppm").as("link_ppm"), col("b.stop_ppm").as("stop_ppm"),
        col("b.keep").as("keep"))

  /** (id, text, n_blocks, n_kept): extracted prose (kept blocks joined
    * by '\n'), total non-empty blocks, kept blocks. Documents whose
    * every block is boilerplate come back with `text = ''` and
    * `n_kept = 0` — attrition-visible, never silently dropped. */
  def extractText(docs: DataFrame, idCol: String, htmlCol: String,
      minWords: Int = 5, maxLinkPpm: Long = 200000L,
      minStopPpm: Long = 30000L): DataFrame = {
    val bs = blockStructs(col(htmlCol), minWords, maxLinkPpm, minStopPpm)
    docs.select(col(idCol).as("id"),
      array_join(transform(filter(bs, b => b.getField("keep")),
        b => b.getField("text")), "\n").as("text"),
      size(bs).cast("long").as("n_blocks"),
      size(filter(bs, b => b.getField("keep"))).cast("long").as("n_kept"))
  }

  /** The shared per-block struct array: non-empty blocks with their
    * three shallow-feature metrics and the gate verdict. Two transform
    * passes (raw counts, then densities + gates) purely for
    * readability — Catalyst collapses them into one projection. */
  private def blockStructs(html: Column, minWords: Int,
      maxLinkPpm: Long, minStopPpm: Long): Column = {
    val blocks = split(mergeAnchorBlocks(dropRegions(html)), blockSplitRe)
    val counted = transform(blocks, b => {
      val anchorLen = aggregate(
        regexp_extract_all(b, lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)),
        lit(0),
        (acc, a) => acc + length(blockText(a)))
      val text = blockText(b)
      val nChars = length(text)
      val nWords = when(nChars === 0, lit(0)).otherwise(
        size(split(text, " ")))
      val nStops = size(regexp_extract_all(lower(text), lit(stopRe),
        lit(0)))
      struct(text.as("text"), nChars.cast("long").as("n_chars"),
        nWords.cast("long").as("n_words"),
        anchorLen.cast("long").as("n_anchor_chars"),
        nStops.cast("long").as("n_stops"))
    })
    filter(transform(counted, s => {
      val nChars = s.getField("n_chars")
      val nWords = s.getField("n_words")
      val linkPpm = when(nChars <= 0, lit(0L)).otherwise(
        floorDiv(s.getField("n_anchor_chars") * lit(1000000L), nChars))
      val stopPpm = when(nWords <= 0, lit(0L)).otherwise(
        floorDiv(s.getField("n_stops") * lit(1000000L), nWords))
      val keep = nWords >= minWords &&
        linkPpm <= maxLinkPpm && stopPpm >= minStopPpm
      struct(s.getField("text").as("text"), nChars.as("n_chars"),
        nWords.as("n_words"),
        s.getField("n_anchor_chars").as("n_anchor_chars"),
        linkPpm.as("link_ppm"), stopPpm.as("stop_ppm"), keep.as("keep"))
    }), s => s.getField("n_chars") > 0)
  }

  /** Exact integer floor division for NON-NEGATIVE operands, usable
    * inside lambda functions (where SQL-string `div` cannot reach):
    * (a − a mod b) is divisible by b, and the quotient here is a ppm
    * value ≤ 10⁶, so the double division is exact. */
  private def floorDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  // ------------------------------------------------------------------
  // Outlink extraction — the stage that closes the crawl loop: WARC →
  // HTML → (page, outlink) edges → [[UrlOps.hostGraph]] →
  // [[GraphRank.pageRank]] → rank-weighted mixture targets. Map-only
  // Column code like the text path: regexp collect + a per-href
  // resolve lambda, no shuffle, no UDF.
  // ------------------------------------------------------------------

  /** RFC 3986 `remove_dot_segments` over a path column: fold the
    * `/`-split segments, dropping `.`, popping one segment per `..`
    * (never past the root). One deviation, documented: a TRAILING
    * `..`/`.` yields `/a` rather than the RFC's `/a/` (link targets,
    * not directory listings — the distinction never survives
    * [[UrlOps.canonicalize]] anyway, which strips trailing slashes). */
  private def removeDotSegments(p: Column): Column = {
    val segs = split(p, "/")
    val folded = aggregate(segs, slice(segs, 1, 0),
      (acc, s) => when(s === ".", acc)
        .when(s === "..",
          when(size(acc) > 1, slice(acc, lit(1), size(acc) - 1))
            .otherwise(acc))
        .otherwise(concat(acc, array(s))))
    val joined = array_join(folded, "/")
    when(joined === "", lit("/")).otherwise(joined)
  }

  /** Resolve one CLEANED href (quote-stripped, entity-decoded,
    * fragment-stripped, trimmed — the caller binds that pipeline to a
    * lambda variable ONCE; inlining it at each of the ~10 uses here
    * was the round-12 13-second-analysis lesson) against an
    * absolute base URL: non-http(s) schemes
    * (mailto:, javascript:, tel:, data:) and empty/fragment-only
    * hrefs yield NULL; protocol-relative `//host/..` takes the base
    * scheme; root-relative and relative paths resolve against the
    * base authority/directory with dot-segment normalization; an
    * href's query string passes through untouched. NULL when the base
    * itself is not absolute http(s) (nothing sound to resolve
    * against — fail closed, the [[UrlOps]] discipline). */
  private def resolveHref(base: Column, href: Column): Column = {
    val scheme = lower(regexp_extract(href,
      "^([a-zA-Z][a-zA-Z0-9+.\\-]*):", 1))
    val baseScheme = lower(regexp_extract(base,
      "^([a-zA-Z][a-zA-Z0-9+.\\-]*)://", 1))
    val baseAuth = regexp_extract(base,
      "^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#]*)", 1)
    val basePath = regexp_extract(base,
      "^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*([^?#]*)", 1)
    val baseDir = when(basePath.contains("/"),
      regexp_replace(basePath, "/[^/]*$", "/")).otherwise(lit("/"))
    val hrefPath = regexp_extract(href, "^([^?]*)", 1)
    val hrefQuery = when(href.contains("?"),
      regexp_replace(href, "^[^?]*", "")).otherwise(lit(""))
    val rootCol = concat(baseScheme, lit("://"), baseAuth)
    val okBase = baseScheme.isin("http", "https") && baseAuth =!= ""
    when(scheme.isin("http", "https"), href)
      .when(scheme =!= "", lit(null))
      .when(!okBase, lit(null))
      .when(href.startsWith("//"), concat(baseScheme, lit(":"), href))
      .when(href.startsWith("/"),
        concat(rootCol, removeDotSegments(hrefPath), hrefQuery))
      .when(href =!= "",
        concat(rootCol, removeDotSegments(concat(baseDir, hrefPath)),
          hrefQuery))
      .otherwise(lit(null))
  }

  /** (id, url, outlinks): every `<a href>` target per page, resolved
    * to an absolute URL honoring `<base href>` (first occurrence, per
    * the HTML spec), in document order, unresolvable/non-http targets
    * dropped. Feeds [[UrlOps.hostGraph]] directly. Anchors inside
    * script/style/comment regions never count ([[dropRegions]] runs
    * first); `&amp;` entities in attribute values decode.
    *
    * Expression-SIZE discipline (the round-12 lesson): the region-
    * dropped document and the resolved base URL bind ONCE into a
    * single-element struct, and every downstream reference goes
    * through the lambda variable. Staged `withColumn`s are NOT
    * enough -- the moment a Generate (hostGraph's explode) lands on
    * top, CollapseProject/ColumnPruning merge the projection chain
    * and re-inline the six-regexp [[dropRegions]] subtree into every
    * reference: measured 205k expression nodes (vs 3.7k bound) and
    * ~13 s of optimizer+codegen on a 9-page fixture. Lambda variables
    * survive the collapse because no optimizer rule substitutes
    * through a higher-order function. */
  def extractLinks(docs: DataFrame, idCol: String, urlCol: String,
      htmlCol: String): DataFrame = {
    val doc = dropRegions(col(htmlCol))
    val baseHref = regexp_extract(doc,
      "(?is)<base\\b[^>]*?\\bhref\\s*=\\s*[\"']?([^\\s>\"']+)", 1)
    val base = when(baseHref =!= "", decodeEntities(baseHref))
      .otherwise(col(urlCol))
    val hrefs = regexp_extract_all(doc,
      lit("(?is)<a\\b[^>]*?\\bhref\\s*=\\s*" +
        "(\"[^\"]*\"|'[^']*'|[^\\s>]+)"),
      lit(1))
    val ctx = array(struct(hrefs.as("hs"), base.as("base")))
    val resolved = element_at(transform(ctx, c =>
      transform(c.getField("hs"), h0 =>
        // the cleaned href binds the same way: its quote-strip/
        // entity-decode/fragment-strip pipeline exists once however
        // many times the resolver references it
        element_at(transform(
          array(trim(regexp_replace(decodeEntities(
            regexp_replace(h0, "^[\"']|[\"']$", "")), "#.*$", ""))),
          h => resolveHref(c.getField("base"), h)), 1))), 1)
    docs.select(col(idCol).as("id"), col(urlCol).as("url"),
      filter(resolved, h => h.isNotNull).as("outlinks"))
  }
}
