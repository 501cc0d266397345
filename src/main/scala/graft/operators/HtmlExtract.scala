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
  *   2. split on block-level tags (p, div, h1-h6, li, td, br, ...)
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
    val blocks = split(dropRegions(html), blockSplitRe)
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
}
