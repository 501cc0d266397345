package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Bpe, CorpusOps}

/** Corpus-preparation queries (q66-q70) over the `documents` table — the
  * training-data assembly stages beyond dedup: repetition quality gates,
  * PII scrubbing, benchmark decontamination, deterministic shard-shuffle,
  * domain rebalancing. Each has an exact DuckDB twin (integer-ratio
  * doubles, portable md5 ordering — see README hash-match discipline).
  */
object CorpusQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.spreadIfSmall(s, dir, "documents")

  /** DuckDB twins of the Spark text primitives (same as DataQueries). */
  private val sqlToks = "regexp_split_to_array(trim(text), '\\s+')"
  private def sqlShingles(n: Int) =
    s"""list_transform(
       |  generate_series(1, greatest(len($sqlToks) - ${n - 1}, 0)),
       |  i -> array_to_string(($sqlToks)[i:i+${n - 1}], ' '))""".stripMargin
  private val sqlHash60 =
    "CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)"

  /** DuckDB twin of [[graft.functions.TextFunctions.hash60b]]: the second,
    * seed-salted 60-bit hash the Bloom/CMS double-hash bucket families
    * consume. */
  private def sqlHash60b(h: String, seed: Long) =
    s"CAST(concat('0x', substr(md5(concat(CAST($h AS VARCHAR), '#$seed'))," +
      " 1, 15)) AS BIGINT)"

  /** q213's Pearson r over exact integer moments — ONE text parsed by both
    * engines (the QaSampling.wilson discipline). */
  private val sqlPearson =
    "round(CAST(n * sxy - sx * sy AS DOUBLE) / " +
      "sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy)), 6)"

  /** The synthetic-PII injection column: the raw documents are letter-only
    * word soup, so q67 appends one email, one IPv4, and one >=9-digit id
    * derived from doc_id — making every regex do real per-row work while
    * staying reproducible in both engines. */
  private def injectedPii(idCol: String, textCol: String) =
    concat(
      col(textCol),
      lit(" contact u"), col(idCol).cast("string"),
      lit("@example.com via 10.0."),
      pmod(col(idCol), lit(256)).cast("string"),
      lit(".7 ref "),
      (col(idCol) * 1000000007L + 123456789L).cast("string"))

  private val sqlInjectedPii =
    """text || ' contact u' || CAST(doc_id AS VARCHAR)
      | || '@example.com via 10.0.' || CAST(doc_id % 256 AS VARCHAR)
      | || '.7 ref ' || CAST(doc_id * 1000000007 + 123456789 AS VARCHAR)"""
      .stripMargin.replace("\n", "")

  /** Pinned HTML fixture for the boilerplate-extraction rows — one
    * realistic page (nav/footer link farms, script/style/comment
    * payloads, two prose paragraphs), one escaped-markup + entities
    * page, one CDATA + inline-tags + link-farm page, one all-boilerplate
    * page (attrition-visible empty output). Single-line, no single
    * quotes, so the SAME literal interpolates into the DuckDB VALUES. */
  private val htmlDocs: Seq[(Long, String)] = Seq(
    (1L, "<html><head><title>Site</title><style>body { color: red; }" +
      "</style><script>var the = \"of and to in is that for on with\";" +
      "</script></head><body><nav><a href=\"/\">Home</a> " +
      "<a href=\"/products\">Products</a> <a href=\"/about\">About us" +
      "</a></nav><!-- the comment of the year, full of the stopwords -->" +
      "<div class=\"content\"><p>The quick brown fox jumped over the " +
      "lazy dog and the dog was not amused by any of it at all.</p>" +
      "<p>It is a truth universally acknowledged that a single man in " +
      "possession of a good fortune must be in want of a wife.</p></div>" +
      "<footer><a href=\"/tos\">Terms of service</a> <a href=\"/privacy\">" +
      "Privacy</a> <a href=\"/jobs\">Jobs</a></footer></body></html>"),
    (2L, "<p>We saw that the &lt;b&gt;tag&lt;/b&gt; of the page was in " +
      "the source and the parser kept it as text for the readers.</p>" +
      "<p>He said &quot;the answer&quot; was&nbsp;in the book of the " +
      "elders and the escape of the escape is &amp;lt; which stays " +
      "literal.</p>"),
    (3L, "<p><![CDATA[the raw cdata of the world]]>The <b>bold</b> and " +
      "the <i>italic</i> words of the text are all kept in the flow of " +
      "the sentence as it was written.</p><div><a href=\"/1\">the link " +
      "one of the list</a> <a href=\"/2\">the link two of the list</a> " +
      "<a href=\"/3\">the link three of the list</a></div>"),
    (4L, "<nav><a href=\"/\">Home</a> <a href=\"/a\">A</a></nav>" +
      "<footer>copyright</footer>"),
    // block-wrapping anchors (the modern nav/card markup): the anchor
    // WRAPS a div whose text is wordy and stopword-dense enough to pass
    // the prose gates — only the merged anchor accounting catches it
    (5L, "<div class=\"cards\"><a href=\"/p1\"><div>The tour of the " +
      "products and the list of the plans for the teams</div></a>" +
      "<a href=\"/p2\"><div>The story of the company and the people " +
      "behind it in the press</div></a></div><p>The careful reader of " +
      "the report will see that the cards above are links and that " +
      "only this paragraph is the prose of the page.</p>"),
    // the charset trio (non-ASCII prose; per-page WARC encodings are
    // pinned in warcPageEncodings): 6 declared latin-1, 7 MISLABELED
    // cp1252-under-utf-8 (curly quote + euro), 8 charset only in meta
    (6L, "<p>The café of the town was the place where the " +
      "décor of the old days was kept for the visitors and the " +
      "friends of the house.</p>"),
    (7L, "<p>The board said it was the company’s plan and the " +
      "café was the venue of the meeting at a cost of €5 " +
      "for each of the guests.</p>"),
    (8L, "<meta charset=\"iso-8859-1\"><p>The résumé of " +
      "the report was the summary of the season and the theme of " +
      "the day for the team.</p>"),
    // outlink page: base-href redirect, absolute, protocol-relative,
    // relative, ../, root-relative, fragment-only and mailto (dropped)
    (9L, "<base href=\"https://base.example/dir/\"><p>The page of the " +
      "links was the last of the set and the prose of it was the " +
      "filler of the test.</p><a href=\"https://beta.example/abs\">x" +
      "</a> <a href=\"//gamma.example/proto\">y</a> " +
      "<a href=\"rel/one\">z</a> <a href=\"../up\">u</a> " +
      "<a href=\"/root\">r</a> <a href=\"#frag\">f</a> " +
      "<a href=\"mailto:a@b.example\">m</a>"))

  private def htmlDf(s: SparkSession): DataFrame = {
    import s.implicits._
    htmlDocs.toDF("id", "html")
  }

  private val htmlValuesSql: String = htmlDocs
    .map { case (i, h) => s"    (CAST($i AS BIGINT), '$h')" }
    .mkString("(VALUES\n", ",\n", ") AS t(id, html)")

  /** DuckDB twin of [[graft.operators.HtmlExtract]]'s block text
    * normalization: tag strip → entity decode (&amp; LAST) → whitespace
    * collapse, applied to `v`. */
  private def sqlHtmlText(v: String): String =
    "trim(regexp_replace(replace(replace(replace(replace(replace(" +
      s"replace(replace(regexp_replace($v, '<[^>]*>', ' ', 'g'), " +
      "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&#39;', chr(39)), " +
      "'&apos;', chr(39)), '&nbsp;', ' '), '&amp;', '&'), " +
      "'\\s+', ' ', 'g'))"

  /** DuckDB twins of the region-drop + block-split stages. */
  private val sqlHtmlClean: String =
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
      "regexp_replace(regexp_replace(html, " +
      "'(?is)<script\\b[^>]*>.*?</script>', ' ', 'g'), " +
      "'(?is)<style\\b[^>]*>.*?</style>', ' ', 'g'), " +
      "'(?is)<noscript\\b[^>]*>.*?</noscript>', ' ', 'g'), " +
      "'(?is)<template\\b[^>]*>.*?</template>', ' ', 'g'), " +
      "'(?s)<!--.*?-->', ' ', 'g'), " +
      "'(?s)<!\\[CDATA\\[.*?\\]\\]>', ' ', 'g')"

  private val sqlHtmlBlockSplit: String =
    "'(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|" +
      "th|section|article|header|footer|nav|aside|main|figure|" +
      "figcaption|blockquote|pre|address|fieldset|form|hr|br|title|" +
      "head|body|html)(?:\\s[^>]*)?/?>'"

  private val sqlHtmlStopRe: String =
    "'\\b(" + graft.operators.HtmlExtract.stopwords.mkString("|") + ")\\b'"

  /** Twin of [[graft.operators.HtmlExtract]]'s mergeAnchorBlocks:
    * block tags inside anchor elements neutralize before the block
    * split (pieces-around-anchors interleaved with cleaned anchors). */
  private val sqlAnchorFull: String = "'(?is)<a\\b[^>]*>.*?</a>'"
  private val sqlHtmlMerged: String =
    s"""CASE WHEN len(regexp_extract_all(c, $sqlAnchorFull)) = 0 THEN c
       |    ELSE regexp_split_to_array(c, $sqlAnchorFull)[1] ||
       |      array_to_string(list_transform(
       |        generate_series(1, len(regexp_extract_all(c, $sqlAnchorFull))),
       |        i -> regexp_replace(
       |               regexp_extract_all(c, $sqlAnchorFull)[i],
       |               $sqlHtmlBlockSplit, ' ', 'g') ||
       |             regexp_split_to_array(c, $sqlAnchorFull)[i + 1]), '')
       |    END""".stripMargin

  /** The scored-blocks CTE both html q-rows share: per doc, the list of
    * non-empty blocks with (txt, n_chars, n_words, n_anchor_chars,
    * link_ppm, stop_ppm, keep) — the literal SQL form of
    * [[graft.operators.HtmlExtract]]'s blockStructs. */
  private val sqlHtmlScored: String =
    s"""WITH src AS (
       |  SELECT * FROM $htmlValuesSql
       |), clean0 AS (
       |  SELECT id, $sqlHtmlClean AS c FROM src
       |), clean AS (
       |  SELECT id, $sqlHtmlMerged AS c FROM clean0
       |), scored AS (
       |  SELECT id, list_transform(list_filter(list_transform(
       |    regexp_split_to_array(c, $sqlHtmlBlockSplit),
       |    b -> struct_pack(
       |      txt := ${sqlHtmlText("b")},
       |      anchor := CAST(coalesce(list_sum(list_transform(
       |        regexp_extract_all(b, '(?is)<a\\b[^>]*>(.*?)</a>', 1),
       |        a -> len(${sqlHtmlText("a")}))), 0) AS BIGINT))),
       |    s0 -> len(s0.txt) > 0),
       |    s1 -> struct_pack(
       |      txt := s1.txt,
       |      n_chars := CAST(len(s1.txt) AS BIGINT),
       |      n_words := CAST(len(str_split(s1.txt, ' ')) AS BIGINT),
       |      n_anchor_chars := s1.anchor,
       |      link_ppm := s1.anchor * 1000000 // len(s1.txt),
       |      stop_ppm := CAST(len(regexp_extract_all(lower(s1.txt),
       |          $sqlHtmlStopRe)) AS BIGINT)
       |        * 1000000 // len(str_split(s1.txt, ' ')),
       |      keep := len(str_split(s1.txt, ' ')) >= 5
       |        AND s1.anchor * 1000000 // len(s1.txt) <= 200000
       |        AND CAST(len(regexp_extract_all(lower(s1.txt),
       |            $sqlHtmlStopRe)) AS BIGINT)
       |          * 1000000 // len(str_split(s1.txt, ' ')) >= 30000)) AS g
       |  FROM clean
       |)""".stripMargin

  /** The q329-q331 WARC fixture: one plain segment (warcinfo + the
    * first two [[htmlDocs]] pages as HTTP responses), one
    * per-record-gzip segment (pages 3-5), and one charset segment
    * (pages 6-8, non-UTF-8 body encodings) — so the composed q330
    * intake produces EXACTLY q327's rows, including the pages only a
    * charset-aware decode extracts. */
  private val warcPageEncodings: Map[Long, (String, String)] = Map(
    6L -> ("text/html; charset=iso-8859-1", "ISO-8859-1"),
    7L -> ("text/html; charset=utf-8", "windows-1252"), // mislabeled
    8L -> ("text/html", "ISO-8859-1")) // only <meta> names it

  private def warcHttpPayload(id: Long, html: String): Array[Byte] = {
    val (ctype, cs) = warcPageEncodings.getOrElse(id,
      ("text/html", "UTF-8"))
    s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n\r\n"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
      html.getBytes(java.nio.charset.Charset.forName(cs))
  }

  private def warcSegOf(id: Long): String =
    if (id <= 2) "seg-00000.warc"
    else if (id <= 5) "seg-00001.warc.gz"
    else "seg-00002.warc"

  private def warcFixtureFiles: Seq[(String, Array[Byte])] = {
    import graft.sources.WarcIO
    def resp(id: Long) = (Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:uuid:$id>",
      "WARC-Target-URI" -> s"https://docs.example/page/$id",
      "WARC-Date" -> "2026-08-16T00:00:00Z",
      "Content-Type" -> "application/http; msgtype=response"),
      warcHttpPayload(id, htmlDocs(id.toInt - 1)._2))
    val info = (Seq("WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> "<urn:uuid:info>"),
      "software: graft".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Seq(
      "seg-00000.warc" -> WarcIO.warcBytes(info +: Seq(resp(1), resp(2))),
      "seg-00001.warc.gz" -> WarcIO.warcGzBytes(
        Seq(resp(3), resp(4), resp(5))),
      "seg-00002.warc" -> WarcIO.warcBytes(
        Seq(resp(6), resp(7), resp(8), resp(9))))
  }

  private def warcFixtureDir(tag: String): String = {
    val dir = graft.sources.SyntheticFixtures.freshDir(tag)
    warcFixtureFiles.foreach { case (n, b) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, n), b) }
    dir
  }

  /** q341 fixture: one segment whose response bodies carry the HTTP
    * encodings older/raw crawls use -- a `Transfer-Encoding: chunked`
    * page and a `Content-Encoding: gzip` page. The connector must
    * hand back the ENTITY bodies (de-chunked, inflated). */
  private val warcEncodedPages: Seq[(Long, String)] = Seq(
    (1L, "<p>The chunked page of the crawl was split into frames on " +
      "the wire and the reader of it must join them into the text " +
      "of the body.</p>"),
    (2L, "<p>The gzipped page of the crawl was deflated on the wire " +
      "and the reader of it must inflate the bytes into the text of " +
      "the body.</p>"))

  private def warcEncodedFixtureDir(tag: String): String = {
    import graft.sources.WarcIO
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    def rec(id: Long, payload: Array[Byte]) = (Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:uuid:enc$id>",
      "WARC-Target-URI" -> s"https://enc.example/page/$id",
      "Content-Type" -> "application/http; msgtype=response"), payload)
    val chunkedBody = warcEncodedPages.head._2.getBytes(utf8)
    val half = chunkedBody.length / 2
    val chunked =
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n" +
        half.toHexString + "\r\n").getBytes(utf8) ++
      chunkedBody.take(half) ++ "\r\n".getBytes(utf8) ++
      ((chunkedBody.length - half).toHexString + "\r\n")
        .getBytes(utf8) ++
      chunkedBody.drop(half) ++ "\r\n0\r\n\r\n".getBytes(utf8)
    val gzBody = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(warcEncodedPages(1)._2.getBytes(utf8)); g.finish()
      bos.toByteArray
    }
    val gzipped =
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "Content-Encoding: gzip\r\n\r\n").getBytes(utf8) ++ gzBody
    val dir = graft.sources.SyntheticFixtures.freshDir(tag)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "seg-enc.warc"),
      WarcIO.warcBytes(Seq(rec(1, chunked), rec(2, gzipped))))
    dir
  }

  /** q342 sitemap seeds over a.com: one plainly-allowed page, two
    * refusals (prefix rule /tmp/, QUERY rule /search?q=), one allowed
    * via the longer /tmp/public* override, one allowed because the
    * alphabot-only group is not consulted for gammabot. */
  private val sitemapSeedLocs: Seq[String] = Seq(
    "https://a.com/page1", "https://a.com/tmp/secret2",
    "https://a.com/search?q=deep", "https://a.com/tmp/public-extra",
    "https://a.com/private/x2")

  /** The q320/q332 link-graph fixture (isomorphic to GraphRankSpec's
    * hand-computed walk: alpha→beta, alpha→gamma, beta→alpha; gamma
    * dangling; dup edge + self-link + hostless row all drop). */
  private def hostPages(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (1L, "https://www.alpha.com/a", Seq("https://beta.com/x",
        "https://beta.com/y", "http://gamma.org/z")),
      (2L, "https://alpha.com/b", Seq("https://beta.com/q",
        "https://ALPHA.com/self")), // dup edge + self-link: both drop
      (3L, "https://beta.com/home", Seq("https://www.alpha.com/")),
      (4L, "::bad::", Seq("https://alpha.com/ignored")) // hostless src
    ).toDF("page_id", "url", "outlinks")
  }

  /** q333's held-out multilingual sentences (same as
    * TextAnalysisSpec's — NONE appear in the profile seeds). */
  private val langFixture: Seq[(Long, String, String)] = Seq(
    (1L, "en", "she walked home slowly carrying three heavy bags"),
    (2L, "en", "birds sing loudly when morning light appears"),
    (3L, "en", "we finished our homework before dinner was ready"),
    (4L, "es", "ella camina despacio hacia su casa cada manana"),
    (5L, "es", "los pajaros cantan cuando llega la luz del dia"),
    (6L, "es", "terminamos nuestra tarea antes de cenar anoche"),
    (7L, "fr", "elle marche lentement vers sa maison chaque matin"),
    (8L, "fr", "les oiseaux chantent quand la lumiere arrive"),
    (9L, "fr", "nous avons fini nos devoirs avant le diner hier soir"),
    (10L, "de", "sie geht jeden morgen langsam zu ihrem haus"),
    (11L, "de", "die vogel singen wenn das licht am morgen kommt"),
    (12L, "de", "wir beendeten unsere hausaufgaben vor dem abendessen"),
    (13L, "pt", "ela caminha devagar para sua casa toda manha"),
    (14L, "pt", "os passaros cantam quando chega a luz do dia"),
    (15L, "pt", "acabamos nossa licao antes do jantar ontem a noite"),
    (16L, "it", "lei cammina lentamente verso la sua casa ogni mattina"),
    (17L, "it", "gli uccelli cantano quando arriva la luce del giorno"),
    (18L, "it", "abbiamo finito i nostri compiti prima di cena ieri sera"),
    (19L, "nl", "zij loopt elke morgen langzaam naar haar huis"),
    (20L, "nl", "de vogels zingen wanneer het licht in de ochtend komt"),
    (21L, "nl", "wij maakten ons huiswerk af voor het avondeten"),
    (22L, "pl", "ona idzie powoli do swojego domu kazdego ranka"),
    (23L, "pl", "ptaki spiewaja kiedy przychodzi swiatlo dnia"),
    (24L, "pl", "skonczylismy nasze zadanie przed kolacja wczoraj"))

  private val langIdDim = 512

  private def langFixtureDf(s: SparkSession): DataFrame = {
    import s.implicits._
    langFixture.toDF("id", "lang", "text")
  }

  /** q334/q335 robots fixture: two hosts, grouped UA lines, comments,
    * unknown directives, wildcards, a $-anchored rule, an agent whose
    * groups merge, QUERY-string rules, and CRLF line endings on a.com
    * (the dominant real-world encoding — a bare-\n split leaves \r on
    * every value and silently fail-opens). No single quotes, so the
    * SAME literal interpolates into the DuckDB VALUES. */
  private val robotsFixture: Seq[(String, String)] = Seq(
    "a.com" -> ("# crawl policy\n" +
      "User-agent: alphabot\nUser-agent: betabot\n" +
      "Disallow: /private/\nAllow: /private/press/\n\n" +
      "User-agent: *\nDisallow: /tmp/\nDisallow: /search$\n" +
      "Allow: /tmp/public*\nCrawl-delay: 10\n" +
      "Disallow: /search?q=\nDisallow: /*?sessionid=\n" +
      "Sitemap: https://a.com/sitemap.xml\n\n" +
      "User-agent: alphabot\nDisallow: /alpha-only/\n")
      .replace("\n", "\r\n"),
    "b.com" -> ("User-agent: *\nDisallow: /\nAllow: /public/\n" +
      "Crawl-delay: 0.5\n"))

  private val robotsEvalUrls: Seq[String] = Seq(
    "https://a.com/tmp/secret", "https://a.com/tmp/public-data",
    "https://a.com/search", "https://a.com/search/results",
    // query-string match targets: the RFC/Google subject is
    // path?query, so /search?q=x hits the query rule while the
    // $-anchored /search$ must not, and /*?sessionid= fires mid-URL
    "https://a.com/search?q=x", "https://a.com/search?lang=en",
    "https://a.com/page?sessionid=zz9", "https://a.com/page?id=1",
    "https://a.com/private/x", "https://a.com",
    "https://b.com/anything", "https://b.com/public/doc",
    "https://no-robots.com/x", "::bad::")

  private def robotsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    robotsFixture.toDF("host", "txt")
  }

  /** q88's Count-Min surprisal chain as CTEs ending in
    * `s88(doc_id, surprisal, n_tokens)` — shared with the q345
    * bucketing twin so the scorer cannot diverge between them. */
  private val sqlSurprisalCtes: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest($sqlToks) AS s FROM documents
       |), h AS (
       |  SELECT doc_id, s, hx, ${sqlHash60b("hx", 7L)} AS hy FROM (
       |    SELECT doc_id, s, $sqlHash60 AS hx FROM toks)
       |), d(j) AS (VALUES (0), (1), (2), (3)
       |), bx AS (
       |  SELECT j, (hx % 16 + j * (1 + hy % 15)) % 16 AS bk
       |  FROM h CROSS JOIN d
       |), cnts AS (
       |  SELECT j, bk, COUNT(*) AS c FROM bx GROUP BY 1, 2
       |), probes AS (
       |  SELECT DISTINCT s, hx, hy FROM h
       |), pb AS (
       |  SELECT s, j, (hx % 16 + j * (1 + hy % 15)) % 16 AS bk
       |  FROM probes CROSS JOIN d
       |), est AS (
       |  SELECT pb.s, MIN(coalesce(c.c, 0)) AS e
       |  FROM pb LEFT JOIN cnts c ON c.j = pb.j AND c.bk = pb.bk
       |  GROUP BY 1
       |), r AS (
       |  SELECT s, CAST(floor(1000000.0 / CAST(e AS DOUBLE)) AS BIGINT) AS rr
       |  FROM est
       |), s88 AS (
       |  SELECT t.doc_id, CAST(SUM(r.rr) AS BIGINT) AS surprisal,
       |    COUNT(*) AS n_tokens
       |  FROM toks t JOIN r ON t.s = r.s
       |  GROUP BY 1
       |)""".stripMargin

  /** The robots fixture's comment-stripped CRLF-safe line walk — the
    * common prefix of every robots twin (rules, sitemaps, delays). */
  private val sqlRobotsLines: String = {
    val values = robotsFixture.map { case (h, t) => s"    ('$h', '$t')" }
      .mkString(",\n")
    s"""WITH src AS (
       |  SELECT * FROM (VALUES
       |$values
       |  ) AS t(host, txt)
       |), rlines AS (
       |  SELECT host, i - 1 AS line_no,
       |    trim(regexp_replace(t[i], '#.*$$', '')) AS line
       |  FROM (SELECT host, regexp_split_to_array(txt, '\\r?\\n') AS t
       |        FROM src),
       |    unnest(generate_series(1, len(t))) AS u(i)
       |)""".stripMargin
  }

  /** The shared parse CTE chain of the two robots twins (through the
    * `rules` table — the literal SQL form of [[graft.operators.UrlOps
    * .parseRobots]]). */
  private val sqlRobotsRules: String = {
    s"""$sqlRobotsLines, typed AS (
       |  SELECT host, line_no,
       |    lower(trim(str_split(line, ':')[1])) AS directive,
       |    trim(substr(line, strpos(line, ':') + 1)) AS value
       |  FROM rlines
       |  WHERE line <> ''
       |    AND lower(trim(str_split(line, ':')[1]))
       |      IN ('user-agent', 'allow', 'disallow')
       |), grp AS (
       |  SELECT *, directive = 'user-agent' AS ua,
       |    (directive = 'user-agent' AND NOT coalesce(
       |      lag(directive = 'user-agent') OVER (
       |        PARTITION BY host ORDER BY line_no), false)) AS gstart
       |  FROM typed
       |), rules AS (
       |  SELECT host,
       |    CAST(SUM(CASE WHEN gstart THEN 1 ELSE 0 END) OVER (
       |      PARTITION BY host ORDER BY line_no
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS group_id,
       |    CAST(line_no AS BIGINT) AS line_no, directive,
       |    CASE WHEN ua THEN lower(value) ELSE value END AS value
       |  FROM grp
       |)""".stripMargin
  }

  /** q339 sitemap fixture: a urlset (entity-escaped loc, optional
    * lastmod), a sitemapindex, and a degenerate doc (empty loc +
    * unclosed entry → zero rows). Single-line, no single quotes. */
  private val sitemapFixture: Seq[(Long, String)] = Seq(
    (1L, "<?xml version=\"1.0\"?><urlset xmlns=\"http://www.sitemaps" +
      ".org/schemas/sitemap/0.9\"><url><loc>https://a.com/page1</loc>" +
      "<lastmod>2026-01-02</lastmod></url><url><loc> " +
      "https://a.com/page2?x=1&amp;y=2 </loc></url><url>" +
      "<loc>https://a.com/page3</loc></url></urlset>"),
    (2L, "<sitemapindex><sitemap><loc>https://a.com/sitemap-a.xml" +
      "</loc><lastmod>2026-02-03</lastmod></sitemap><sitemap>" +
      "<loc>https://a.com/sitemap-b.xml</loc></sitemap></sitemapindex>"),
    (3L, "<urlset><url><loc></loc></url><url>unclosed"))

  /** q347 prior-wave fetch snapshot against the q339 sitemap's page
    * entries: page1 fetched BEFORE its lastmod (stale), page2 fetched
    * after, page4 fetched but no longer listed. */
  private val recrawlSnapshot: Seq[(String, String)] = Seq(
    ("https://a.com/page1", "2025-12-01"),
    ("https://a.com/page2?x=1&y=2", "2026-01-15"),
    ("https://a.com/page4-gone", "2026-01-20"))

  /** q340 registrable-domain fixture: ccTLD second-level registries,
    * plain TLDs, an IPv4 literal, and an unparseable row. */
  private val domainUrls: Seq[(Long, String)] = Seq(
    (1L, "https://news.bbc.co.uk/one"), (2L, "https://www.bbc.co.uk/two"),
    (3L, "https://shop.example.com/x"), (4L, "https://example.com/y"),
    (5L, "http://10.0.0.7/z"), (6L, "https://deep.sub.site.com.au/a"),
    (7L, "::bad::"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Sitemap discovery: the robots.txt directive parseRobots drops,
    // surfaced as crawl seeds — CRLF-safe, comment-stripped, URL case
    // kept; the a.com fixture carries exactly one
    "q338_robots_sitemaps" -> { (s, _) =>
      graft.operators.UrlOps.robotsSitemaps(robotsDf(s), "host", "txt")
    },

    // Sitemap XML parse (urlset + sitemapindex): per-entry loc
    // (XML-unescaped), optional lastmod, is_index flag; degenerate
    // docs contribute nothing — backreference-free regexp walk,
    // replayed entry-for-entry by the twin
    "q339_sitemap_parse" -> { (s, _) =>
      import s.implicits._
      graft.operators.UrlOps.parseSitemap(
        sitemapFixture.toDF("id", "xml"), "id", "xml")
    },

    // Registrable-domain (eTLD+1) rollup: the per-SITE key crawl caps
    // actually budget on (news.bbc.co.uk and www.bbc.co.uk are ONE
    // site) — two-level public-suffix heuristic, IPv4/bare hosts pass
    // through, hostless rows fail closed
    "q340_domain_rollup" -> { (s, _) =>
      import s.implicits._
      graft.operators.UrlOps.domainRollup(
        domainUrls.toDF("id", "url"), "url")
    },

    // HTTP body encodings through the DSv2 connector: a chunked page
    // de-frames and a gzip page inflates INSIDE httpParts, so the
    // body column already carries the entity text — the wire shapes
    // older/raw crawls use, pinned end to end
    "q341_warc_encoded_bodies" -> { (s, _) =>
      s.read.format("warc").load(warcEncodedFixtureDir("q341"))
        .where(col("record_type") === "response")
        .select(regexp_extract(col("target_uri"), "/page/(\\d+)$", 1)
          .cast("long").as("id"), col("body").cast("string").as("html"))
    },

    // Sitemap-SEEDED governed intake, the full admission loop: the
    // sitemap lists candidate URLs, robots governance decides each
    // (path?query matching — the /search?q= seed is refused), the
    // per-host cap bounds what survives. Sitemap walk + decision join
    // + bounded heap in ONE plan
    "q342_sitemap_seeded_intake" -> { (s, _) =>
      import s.implicits._
      val xml = "<urlset>" + sitemapSeedLocs.map(l =>
        s"<url><loc>$l</loc></url>").mkString + "</urlset>"
      val seeds = graft.operators.UrlOps.parseSitemap(
          Seq((1L, xml)).toDF("id", "xml"), "id", "xml")
        .select((col("entry_idx") + 1L).as("id"), col("loc").as("url"))
      val decisions = graft.operators.UrlOps.evaluateRobots(
        seeds, "url",
        graft.operators.UrlOps.parseRobots(robotsDf(s), "host", "txt"),
        agent = "gammabot")
      val allowed = seeds.join(
        decisions.where(col("allowed")).select(col("url")),
        Seq("url"), "left_semi")
      graft.operators.UrlOps.perHostCap(allowed, "url", "id", n = 3)
    },

    // Per-host Crawl-delay for one agent (the politeness knob): group
    // selection as q335, largest delay among merged groups, fractional
    // seconds -> integer ms; a.com keeps its * group delay of 10 s,
    // b.com its 0.5 s
    "q343_crawl_delay" -> { (s, _) =>
      graft.operators.UrlOps.robotsCrawlDelay(robotsDf(s), "host",
        "txt", agent = "gammabot")
    },

    // Cross-document LINE dedup (the RefinedWeb/FineWeb boilerplate
    // sweep) over the corpus wrapped in deterministic chrome: a header
    // and footer line shared by EVERY doc (removed everywhere — the
    // boilerplate case), the unique body line (kept), and the doc's
    // own 20-char prefix repeated twice (kept — distinct-DOC counting
    // means a within-doc refrain is not boilerplate)
    "q344_line_dedup" -> { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"),
        concat(lit("shared promo header\n"), col("text"), lit("\n"),
          substring(col("text"), 1, 20), lit("\n"),
          substring(col("text"), 1, 20),
          lit("\nall rights reserved footer")).as("text"))
      CorpusOps.lineDedup(d, "doc_id", "text", maxDocs = 1)
    },

    // CCNet-style quality bucketing: per-doc surprisal-per-token off
    // the q88 Count-Min rarity scores, split into head/middle/tail
    // TERTILES per declared language — the domain-table cumulative
    // (q185 discipline), never a corpus sort
    "q345_ccnet_buckets" -> { (s, dir) =>
      val d = docs(s, dir)
      val scored = CorpusOps.surprisalScore(d, "doc_id", "text",
          width = 16, depth = 4)
        .withColumn("score", expr("surprisal div n_tokens"))
      CorpusOps.quantileBuckets(
        scored.join(d.select(col("doc_id"), col("lang")), Seq("doc_id")),
        "doc_id", "lang", "score", k = 3)
    },

    // Politeness-respecting frontier schedule, the full loop: robots
    // decision -> allowed -> per-host bounded-heap cap -> Crawl-delay
    // spacing (a.com 10 s from its * group, b.com 0.5 s, hosts with
    // no robots the 1 s default) — fetch_at_ms turns the admitted SET
    // into a fetch TIMELINE
    "q346_frontier_schedule" -> { (s, _) =>
      import s.implicits._
      val urls = robotsEvalUrls.zipWithIndex
        .map { case (u, i) => (i.toLong + 1L, u) }.toDF("id", "url")
      val decisions = graft.operators.UrlOps.evaluateRobots(
        urls, "url",
        graft.operators.UrlOps.parseRobots(robotsDf(s), "host", "txt"),
        agent = "gammabot")
      val allowed = urls.join(
        decisions.where(col("allowed")).select(col("url")),
        Seq("url"), "left_semi")
      graft.operators.UrlOps.frontierSchedule(allowed, "url", "id",
        graft.operators.UrlOps.robotsCrawlDelay(robotsDf(s), "host",
          "txt", agent = "gammabot"),
        defaultDelayMs = 1000L, cap = 3)
    },

    // Recrawl reconciliation: the q339 sitemap's page entries against
    // the prior wave's fetch snapshot — page1's lastmod postdates its
    // fetch (refetch), page2 cannot prove staleness (keep), page3 was
    // never fetched (new), page4 is no longer listed (gone)
    "q347_recrawl_plan" -> { (s, _) =>
      import s.implicits._
      val entries = graft.operators.UrlOps.parseSitemap(
          sitemapFixture.toDF("id", "xml"), "id", "xml")
        .where(!col("is_index"))
      graft.operators.UrlOps.recrawlPlan(entries, "loc", "lastmod",
        recrawlSnapshot.toDF("url", "fetched_on"), "url", "fetched_on")
    },

    // Robots Exclusion Protocol parse (RFC 9309): comment strip, group
    // formation at consecutive UA lines, unknown directives dropped —
    // one per-host window pass, mirrored line-for-line by the twin
    "q334_robots_parse" -> { (s, _) =>
      graft.operators.UrlOps.parseRobots(robotsDf(s), "host", "txt")
    },

    // ... and the per-URL crawl-governance decision for one agent:
    // exact-agent groups (merged) else the * groups, RFC wildcard
    // matching, longest rule wins with allow on ties, fail-open for
    // hosts without robots and unparseable URLs
    "q335_robots_eval" -> { (s, _) =>
      import s.implicits._
      graft.operators.UrlOps.evaluateRobots(
        robotsEvalUrls.toDF("url"), "url",
        graft.operators.UrlOps.parseRobots(robotsDf(s), "host", "txt"),
        agent = "gammabot")
    },

    // The governed-intake composition, end to end: robots decision ->
    // keep only allowed URLs -> bounded per-host cap (the q312 heap) —
    // the admission path a compliant crawl corpus runs before any
    // content ever downloads. IDs are the fixture positions, so the
    // md5-order cap is deterministic and twin-computable
    "q336_governed_host_cap" -> { (s, _) =>
      import s.implicits._
      val urls = robotsEvalUrls.zipWithIndex
        .map { case (u, i) => (i.toLong + 1L, u) }.toDF("id", "url")
      val decisions = graft.operators.UrlOps.evaluateRobots(
        urls, "url",
        graft.operators.UrlOps.parseRobots(robotsDf(s), "host", "txt"),
        agent = "gammabot")
      val allowed = urls.join(
        decisions.where(col("allowed")).select(col("url")),
        Seq("url"), "left_semi")
      graft.operators.UrlOps.perHostCap(allowed, "url", "id", n = 2)
    },
    // HTML -> text boilerplate extraction (the crawl front-end stage):
    // block segmentation at block-level tags, per-block length /
    // link-density / stopword-density gates, kept prose joined by
    // newline — map-only Column pipeline, mirrored block-for-block by
    // the DuckDB twin over the same pinned adversarial fixture
    "q327_html_extract" -> { (s, _) =>
      graft.operators.HtmlExtract.extractText(htmlDf(s), "id", "html")
    },

    // WARC (ISO 28500) crawl intake through the DSv2 connector: one
    // plain segment (warcinfo + 2 responses) + one per-record-gzip
    // segment (2 responses), metadata projection only — the payload
    // columns stay pruned out of the scan
    "q329_warc_read" -> { (s, _) =>
      s.read.format("warc").load(warcFixtureDir("q329"))
        .select(col("warc_name"), col("record_type"), col("target_uri"),
          col("http_status"), col("content_length"))
    },

    // ... and the composed crawl front-end END TO END: WARC responses
    // -> HTTP bodies -> charset-sniffed decode (header param, <meta>,
    // UTF-8-validity fallback; pages 6-8 are latin-1 / mislabeled
    // cp1252 / meta-declared) -> boilerplate extraction. The decoded
    // bodies ARE the q327 fixture pages, so this row is pinned by the
    // SAME DuckDB twin — wire format, decode, and extraction verified
    // as one path
    "q330_warc_html_extract" -> { (s, _) =>
      val pages = s.read.format("warc").load(warcFixtureDir("q330"))
        .where(col("record_type") === "response")
        .select(regexp_extract(col("target_uri"), "/page/(\\d+)$", 1)
          .cast("long").as("id"),
          graft.functions.CharsetDecode.decodeHtml(col("body"),
            col("http_content_type")).as("html"))
      graft.operators.HtmlExtract.extractText(pages, "id", "html")
    },

    // ... and the link-graph leg of the crawl loop, END TO END from
    // the same WARC fixture: responses -> charset decode ->
    // extractLinks (base-href + relative resolution) -> hostGraph
    // host-pair edges — the input PageRank ranks for the q332
    // rank-weighted mixture. Map-only until hostGraph's one distinct
    "q337_warc_link_graph" -> { (s, _) =>
      val pages = s.read.format("warc").load(warcFixtureDir("q337"))
        .where(col("record_type") === "response")
        .select(col("target_uri").as("url"),
          graft.functions.CharsetDecode.decodeHtml(col("body"),
            col("http_content_type")).as("html"))
        .withColumn("id", regexp_extract(col("url"), "/page/(\\d+)$", 1)
          .cast("long"))
      val linked = graft.operators.HtmlExtract.extractLinks(
        pages, "id", "url", "html")
      graft.operators.UrlOps.hostGraph(linked, "url", "outlinks")
        .orderBy("src_host", "dst_host")
    },

    // ... and the STREAMING twin of the intake: segments arrive in two
    // waves through readStream.format("warc") (the SeenFileLog
    // exactly-once loop), metadata lands in a memory sink
    "q331_warc_stream" -> { (s, _) =>
      val dir = graft.sources.SyntheticFixtures.freshDir("q331")
      val ckpt = graft.sources.SyntheticFixtures.freshDir("q331_ckpt")
      val waves = warcFixtureFiles
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, waves.head._1), waves.head._2)
      val q = s.readStream.format("warc").load(dir)
        .select(col("warc_name"), col("record_type"), col("target_uri"))
        .writeStream.format("memory").queryName("q331_sink")
        .option("checkpointLocation", ckpt).start()
      try {
        q.processAllAvailable()
        waves.tail.foreach { case (name, bytes) =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, name), bytes)
          q.processAllAvailable()
        }
      } finally q.stop()
      s.table("q331_sink")
    },

    // ... and the per-block audit rows (the gates' working made
    // visible: every density and the verdict per block)
    "q328_html_blocks" -> { (s, _) =>
      graft.operators.HtmlExtract.blockMetrics(htmlDf(s), "id", "html")
    },

    // Corpus bigram LM: top-3 continuations per context word, exact counts
    // + integer-ppm conditional probability; one (w1,w2) count shuffle, a
    // co-partitioned context roll-up, bounded-heap k-selection
    "q182_bigram_lm" -> { (s, dir) =>
      CorpusOps.bigramTopK(docs(s, dir), "text", k = 3)
    },

    // PMI-lift collocations: support >= 3, global top-20 by lift — one
    // bigram count shuffle + vocabulary-sized marginal roll-ups; TakeOrdered
    "q184_collocations" -> { (s, dir) =>
      CorpusOps.collocationTopK(docs(s, dir), "text", minCount = 3, k = 20)
    },

    // Per-source percentile normalization of document length: the score-
    // calibration step before one global threshold spans sources; window
    // runs on the (source, value) domain table, never the corpus
    "q185_score_normalize" -> { (s, dir) =>
      CorpusOps.groupPercentileRank(docs(s, dir), "doc_id", "source",
        "n_chars")
    },

    // Log-free lexical diversity per source: Simpson concentration of the
    // unigram distribution + token/type counts — one (source, token) count
    // shuffle, group-sized roll-up
    "q188_lexical_diversity" -> { (s, dir) =>
      CorpusOps.lexicalConcentration(docs(s, dir), "source", "text")
    },

    // ROLLUP report: per-(source, lang) corpus volumes WITH source
    // subtotals and the grand total in ONE pass — Spark expands grouping
    // sets in a single aggregation, no union of re-scans; gid
    // disambiguates rollup NULLs from data NULLs
    "q196_rollup_report" -> { (s, dir) =>
      docs(s, dir)
        .rollup(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("n_chars"),
          (grouping(col("source")) * 2 + grouping(col("lang")))
            .cast("int").as("gid"))
        .select(col("source"), col("lang"), col("gid"), col("n_docs"),
          col("n_chars"))
    },

    // Declared-values pivot: language mix per source as a WIDE table —
    // the declared lang list keeps the plan single-pass (no distinct-scan
    // job) and the output width bounded, the q37 EAV discipline
    "q197_lang_pivot" -> { (s, dir) =>
      docs(s, dir)
        .groupBy(col("source"))
        .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("de", "en", "es", "fr", "zh"))
    },

    // Gopher-style repetition gates: type-token ratio + top word/bigram
    // fractions, thresholds picked to split the synthetic corpus
    "q66_repetition_filter" -> { (s, dir) =>
      CorpusOps.repetitionStatsFused(docs(s, dir), "doc_id", "text",
          minDistinctFrac = 0.45, maxTopWordFrac = 0.12,
          maxTopBigramFrac = 0.10)
        .withColumn("keep", col("keep").cast("int"))
    },

    // PII scrub over the injected-PII column (see injectedPii note)
    "q67_pii_scrub" -> { (s, dir) =>
      CorpusOps.piiScrub(
        docs(s, dir).select(col("doc_id"),
          injectedPii("doc_id", "text").as("text")),
        "doc_id", "text")
    },

    // Benchmark decontamination: benchmark = every 50th doc_id, 3-gram
    // overlap (3 beats the classic 13 on the 30-word synthetic vocab —
    // 13-grams never collide there; n is an operator parameter)
    "q68_decontamination" -> { (s, dir) =>
      val d = docs(s, dir)
      CorpusOps.decontaminate(
        d.filter(pmod(col("doc_id"), lit(50)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(50)) === 0),
        "doc_id", "text", n = 3)
    },

    // Bloom-filter decontamination: the q68 semantics through the
    // constant-size broadcast sketch — map-only on the training side (no
    // gram-keyed shuffle of the corpus). m=4096/k=3 over ~950 benchmark
    // grams gives a real, deterministic false-positive rate, so the
    // oracle exhibits flagged-but-not-shared grams alongside true hits
    "q105_bloom_decontaminate" -> { (s, dir) =>
      val d = docs(s, dir)
      CorpusOps.decontaminateBloom(
        d.filter(pmod(col("doc_id"), lit(50)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(50)) === 0),
        "doc_id", "text", n = 3, mBits = 4096, k = 3)
    },

    // Staged decontamination: bloom prefilter -> exact confirm over the
    // flagged subset only. No false negatives -> provably identical to
    // q68's full exact join, so it shares q68's ORACLE VERBATIM — the
    // equivalence is checked cross-engine every round
    "q107_staged_decontaminate" -> { (s, dir) =>
      val d = docs(s, dir)
      CorpusOps.decontaminateStaged(
        d.filter(pmod(col("doc_id"), lit(50)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(50)) === 0),
        "doc_id", "text", n = 3, mBits = 4096, k = 3)
    },

    // DSIR-style targeted data selection: importance weights toward a
    // target domain (every 10th doc as the synthetic target sample) as
    // integer-scaled hashed-unigram likelihood ratios — 64-bucket weight
    // table broadcast, raw corpus scored with one doc-keyed exchange
    "q108_dsir_weights" -> { (s, dir) =>
      val d = docs(s, dir)
      CorpusOps.dsirWeights(
        d.filter(pmod(col("doc_id"), lit(10)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(10)) === 0),
        "doc_id", "text", dim = 64)
    },

    // Deterministic shard-shuffle: 8 shards, md5 epoch-0 order
    "q69_shard_shuffle" -> { (s, dir) =>
      CorpusOps.shardShuffle(docs(s, dir), "doc_id", nShards = 8)
    },

    // Domain rebalance: cap every source at 15 docs, hash-order selection
    "q70_domain_rebalance" -> { (s, dir) =>
      CorpusOps.domainRebalance(docs(s, dir), "doc_id", "source", 15)
        .select(col("doc_id"), col("source"))
    },

    // KMV distinct-count sketch: estimated distinct 5-gram shingles per
    // source (k=64 minima via the TopKPerGroup bounded-heap plan).
    // Estimate-only — the production shape; the n_exact accuracy branch is
    // opt-in (includeExact) and demoed in SketchesSpec, not benched.
    // Per-doc pre-cap: any hash among a group's k smallest DISTINCT values
    // is necessarily among its own document's k smallest distinct (fewer
    // than k hashes are below it anywhere, a fortiori in its doc), so
    // sort+dedup+slice INSIDE the codegen'd array before exploding — the
    // distinct shuffle then carries ≤k rows per doc instead of every
    // shingle occurrence. Same result, ~tokens/k less exchange volume.
    "q71_kmv_distinct" -> { (s, dir) =>
      val k = 64
      val hashed = docs(s, dir).select(col("source"),
        explode(slice(array_sort(array_distinct(
          graft.functions.TextFunctions.shingleHashes60(col("text"), 5))),
          1, k)).as("h"))
      graft.operators.Sketches.kmvDistinct(hashed, Seq("source"), "h", k)
    },

    // Token-length distribution per source: exact type-7 quantiles at
    // dyadic probabilities (0.25/0.5/0.75 are exact in binary, and the
    // interpolation a + g*(b-a) over integer token counts is FP-exact in
    // both engines — arbitrary probabilities would NOT hash-match)
    "q72_length_stats" -> { (s, dir) =>
      docs(s, dir)
        .select(col("source"),
          size(graft.functions.TextFunctions.tokens(col("text"))).as("n_tokens"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          min(col("n_tokens")).as("min_tok"),
          max(col("n_tokens")).as("max_tok"),
          expr("percentile(n_tokens, array(0.25D, 0.5D, 0.75D))").as("__ps"))
        .select(col("source"), col("n_docs"), col("min_tok"), col("max_tok"),
          element_at(col("__ps"), 1).as("p25"),
          element_at(col("__ps"), 2).as("p50"),
          element_at(col("__ps"), 3).as("p75"))
    },

    // Hashing-trick TF vectors: vocabulary-free 16-dim count features
    // (vector rendered as a comma string — the driver comparator hashes
    // scalars, same convention as q38's collect_list output)
    "q73_hashing_tf" -> { (s, dir) =>
      CorpusOps.hashingTf(docs(s, dir), "doc_id", "text", dim = 16)
        .select(col("doc_id"),
          array_join(transform(col("tf_vec"), _.cast("string")), ",")
            .as("tf_vec"))
    },

    // Temperature (T=2) domain mixing weights over sources
    "q74_domain_temperature" -> { (s, dir) =>
      CorpusOps.domainTemperatureWeights(docs(s, dir), "source")
    },

    // Sequence packing: concat-and-chunk positions in 128-token training
    // sequences, 8 shards in the q69 shuffle order
    "q81_sequence_packing" -> { (s, dir) =>
      CorpusOps.packSequences(docs(s, dir), "doc_id", "text",
        nShards = 8, seqLen = 128)
    },

    // Intra-corpus duplicated-span stats: fraction of each doc's distinct
    // 5-grams that appear in >= 2 documents (substring-level dup signal)
    "q82_dup_spans" -> { (s, dir) =>
      CorpusOps.duplicatedNgramStats(docs(s, dir), "doc_id", "text",
        n = 5, minDocFreq = 2)
    },

    // Linear classifier inference over 16 hashed-feature buckets with
    // deterministic integer weights (exact in both engines)
    "q84_classifier_score" -> { (s, dir) =>
      CorpusOps.scoreHashedLinear(docs(s, dir), "doc_id", "text", dim = 16)
    },

    // Count-Min sketch (4x16) per source + point estimates for every
    // distinct token, exact counts alongside — width 16 < the 31-term
    // vocab, so collisions are real and the est >= exact bound shows
    "q86_countmin_freq" -> { (s, dir) =>
      val toks = docs(s, dir).select(col("source"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      val sk = graft.operators.Sketches.countMin(
        toks, Seq("source"), "tok", width = 16, depth = 4)
      val probes = toks.select(col("tok")).distinct()
      val est = graft.operators.Sketches.cmsEstimate(sk, probes, "tok", 16, 4)
      val exact = toks.groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("__n"))
      est.join(exact, Seq("source", "tok"), "left")
        .select(col("source"), col("tok"), col("est_count"),
          coalesce(col("__n"), lit(0L)).as("n_exact"))
    },

    // Sketch-driven selection: top-3 tokens per source by CMS ESTIMATE
    // (not exact counts) through the bounded-heap plan — the "select from
    // the sketch, never re-touch the stream" serving pattern; restricted
    // to tokens actually present in the source (estimates for absent
    // tokens are pure collision noise)
    "q171_cms_topk" -> { (s, dir) =>
      val toks = docs(s, dir).select(col("source"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      val sk = graft.operators.Sketches.countMinSparse(
        toks, Seq("source"), "tok", width = 16, depth = 4)
      val est = graft.operators.Sketches.cmsEstimateSparse(
        sk, toks.select(col("tok")).distinct(), Seq("source"), "tok",
        width = 16, depth = 4)
      val own = est.join(toks.select(col("source"), col("tok")).distinct(),
        Seq("source", "tok"), "left_semi")
      graft.plans.TopKPerGroup(own, Seq(col("source")),
        Seq(col("est_count").desc, col("tok").asc), 3)
    },

    // Apply the q74 temperature weights as an actual per-source sample:
    // n_target = floor(weight * 200) docs per source, md5-order selection
    "q87_apply_mixture" -> { (s, dir) =>
      val d = docs(s, dir)
      val targets = CorpusOps.domainTemperatureWeights(d, "source")
        .select(col("source"),
          floor(col("weight") * 200).cast("int").as("n_target"))
      CorpusOps.applyMixture(d, "doc_id", "source", targets)
        .select(col("doc_id"), col("source"))
    },

    // Surprisal-proxy scoring off a GLOBAL 4x16 Count-Min sketch:
    // rarity = floor(1e6/est), doc score = sum of token rarities
    "q88_surprisal_score" -> { (s, dir) =>
      CorpusOps.surprisalScore(docs(s, dir), "doc_id", "text",
        width = 16, depth = 4)
    },

    // Cross-source overlap matrix: distinct shared 5-grams per source
    // pair — the "how much does dataset A leak into dataset B" analytics.
    // Bounded fan-out: a gram row joins at most (sources sharing it choose
    // 2) pairs, and both shuffles carry 60-bit hashes
    "q92_source_overlap" -> { (s, dir) =>
      val g = docs(s, dir).select(col("source"),
        explode(graft.functions.TextFunctions.shingleHashes60(col("text"), 5))
          .as("gram")).distinct()
      val a = g.select(col("gram"), col("source").as("source_1"))
      val b = g.select(col("gram"), col("source").as("source_2"))
      a.join(b, Seq("gram"))
        .filter(col("source_1") < col("source_2"))
        .groupBy(col("source_1"), col("source_2"))
        .agg(count(lit(1)).as("n_shared_grams"))
    },

    // The full corpus-assembly pipeline as ONE declarative plan:
    // normalize -> exact-dedup (min id per normal form) -> length gate ->
    // benchmark decontamination (3-gram anti-join; benchmark = every 50th
    // doc) -> pack survivors into 64-token training sequences (4 shards).
    // Every stage is an operator proven alone (q45/q59/q68/q81); the point
    // here is the composition Catalyst gets to optimize END TO END.
    "q99_corpus_assembly" -> { (s, dir) =>
      CorpusOps.assembleCorpus(docs(s, dir), "doc_id", "text",
        minTokens = 5, benchEvery = 50, n = 3, nShards = 4, seqLen = 64)
    },

    // The q99 pipeline's attrition audit: one row of per-stage counts —
    // the data-genealogy artifact that makes a silent stage collapse
    // visible before training
    "q200_pipeline_attrition" -> { (s, dir) =>
      CorpusOps.assembleAttrition(docs(s, dir), "doc_id", "text",
        minTokens = 5, benchEvery = 50, n = 3, nShards = 4, seqLen = 64)
    },

    // Effective sample size of the q74 temperature mixture: ESS =
    // (Σw)²/Σw² over the exact integer scaled weights — how many
    // "effective" domains the mixture really spans (≈ n_domains when
    // balanced, → 1 when one domain dominates)
    "q236_mixture_ess" -> { (s, dir) =>
      val sc = docs(s, dir).groupBy(col("source"))
        .agg(count(lit(1)).as("__n"))
        .withColumn("__s",
          floor(sqrt(col("__n").cast("double")) * 1e6).cast("long"))
      sc.agg(count(lit(1)).as("n_domains"),
          sum(col("__s")).as("__ss"),
          sum(col("__s") * col("__s")).as("__ss2"))
        .withColumn("ess",
          round(expr("CAST(__ss * __ss AS DOUBLE) / __ss2"), 6))
        .select(col("n_domains"), col("ess"))
    },

    // Distinctive terms per source (c-TF-IDF flavor): a token's share of
    // its corpus-wide occurrences concentrated in this source, integer
    // ppm, support >= 5 — top-5 per source on the bounded-heap plan
    "q215_distinctive_terms" -> { (s, dir) =>
      val tf = docs(s, dir)
        .select(col("source"),
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val tot = tf.groupBy(col("tok")).agg(sum(col("tf")).as("tf_total"))
      val scored = tf.join(tot, Seq("tok"))
        .filter(col("tf") >= 5)
        .withColumn("share_ppm", expr("(1000000 * tf) div tf_total"))
        .select(col("source"), col("tok"), col("tf"), col("share_ppm"))
      val top = graft.plans.TopKPerGroup(scored, Seq(col("source")),
        Seq(col("share_ppm").desc, col("tf").desc, col("tok").asc), 5)
      top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(col("share_ppm").desc, col("tf").desc, col("tok").asc)))
    },

    // Tokenizer fertility per language: BPE-ish tokens per whitespace
    // token (integer ppm) — the tokenizer-efficiency number that decides
    // whether a language is under-served by the vocab; one agg shuffle
    "q212_tokenizer_fertility" -> { (s, dir) =>
      val d = docs(s, dir).select(col("lang"),
        graft.operators.TextAnalysis.nWords(col("text")).cast("long").as("ws"),
        graft.functions.TextFunctions.bpeTokenCount(col("text")).cast("long")
          .as("bpe"))
      d.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ws")).as("ws_tokens"),
          sum(col("bpe")).as("bpe_tokens"))
        .withColumn("fertility_ppm",
          expr("(1000000 * bpe_tokens) div ws_tokens"))
    },

    // Per-source Pearson correlation of chars vs tokens — exact integer
    // moments, the SAME formula text in plan and oracle (one sqrt of a
    // double product, one division)
    "q213_quality_corr" -> { (s, dir) =>
      val d = docs(s, dir).select(col("source"),
        length(col("text")).cast("long").as("x"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long")
          .as("y"))
      d.groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .withColumn("pearson",
          when(expr("n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0"),
            lit(null).cast("double"))
            .otherwise(expr(sqlPearson)))
        .select(col("source"), col("n"), col("pearson"))
    },

    // Vocabulary-pruned co-occurrence mining: same-document pairs of the
    // top-50 tokens, support >= 5 — market-basket bounded at vocab², not
    // |doc|² (the only shape that survives long documents at scale)
    "q203_cooccurrence" -> { (s, dir) =>
      CorpusOps.cooccurrenceTopK(docs(s, dir), "doc_id", "text",
        vocabSize = 50, minSupport = 5L, k = 20)
    },

    // Robust outlier detection: per-source median/MAD over token counts,
    // flag docs deviating > 3 MAD — the quantile-based quality gate that
    // survives heavy tails (mean/stddev would not). Two tiny grouped
    // medians broadcast back; dyadic 0.5 keeps the interpolation FP-exact
    // in both engines (same argument as q72)
    "q98_robust_outliers" -> { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"), col("source"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("n_tokens"))
      val med = d.groupBy(col("source"))
        .agg(expr("percentile(n_tokens, 0.5D)").as("med"))
      val dev = d.join(broadcast(med), Seq("source"))
        .withColumn("adev", abs(col("n_tokens") - col("med")))
      val mad = dev.groupBy(col("source"))
        .agg(expr("percentile(adev, 0.5D)").as("mad"))
      dev.join(broadcast(mad), Seq("source"))
        .filter(col("adev") > lit(3.0) * col("mad"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("med"), col("mad"))
    },

    // Window-family widening (§2.5): percent_rank + framed trailing sum
    // per source over a TOTAL (n_tokens, doc_id) order — percentile
    // normalization of a quality signal and the rolling-stat frame shape
    "q89_quality_windows" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir).select(col("doc_id"), col("source"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("n_tokens"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_tokens").asc, col("doc_id").asc)
      d.select(col("doc_id"), col("source"), col("n_tokens"),
        round(percent_rank().over(w), 6).as("pr"),
        sum(col("n_tokens"))
          .over(w.rowsBetween(-3, Window.currentRow)).as("trail_sum"))
    },

    // C4-style global unit dedup: 8-token blocks as the unit (the raw docs
    // have no line structure), any block occurring >1 time corpus-wide is
    // boilerplate and every occurrence is deleted. Flagged set broadcasts;
    // counting and removal join on 60-bit unit hashes, never unit text
    "q157_unit_dedup" -> { (s, dir) =>
      val toks = split(trim(col("text")), "\\s+")
      val blocks = when(size(toks) === 0, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), floor((size(toks) - 1) / 8).cast("int")),
          i => array_join(slice(toks, i * 8 + 1, lit(8)), " ")))
      CorpusOps.unitDedup(docs(s, dir), "doc_id", blocks, maxOcc = 1L)
    },

    // Sentence-boundary unit RELATION: exact-integer rule set
    // (terminator run + whitespace + following ASCII uppercase),
    // lookaround-free so RE2 engines reproduce it verbatim. The fixture
    // walks the contract: digit/lowercase continuations do NOT split,
    // ?!-runs stay with their sentence, the documented abbreviation
    // limitation ("Dr." splits), multi-space normalization in n_words,
    // empty text yields no rows
    "q315_sentence_units" -> { (s, _) =>
      import s.implicits._
      val d = Seq(
        (1L, "Hello world. This is graft. It works!"),
        (2L, "Pi is 3.14 not 3. 15 ok"),
        (3L, "e.g. lowercase follows. But Uppercase splits."),
        (4L, "Dr. Smith went home. He slept?! Deeply so."),
        (5L, "No terminator at all"),
        (6L, ""),
        (7L, "Multi   spaces. Next one.")
      ).toDF("doc_id", "text")
      CorpusOps.sentenceUnits(d, "doc_id", "text")
    },

    // T5-style span corruption over the REAL corpus: deterministic
    // hash-driven span starts/lengths (density 15%, mean span 3),
    // merged runs, <extra_id_k> sentinels; the DuckDB twin replays the
    // identical md5-prefix dice, so every (input, target) pair is
    // byte-compared at 500 docs
    "q321_span_corruption" -> { (s, dir) =>
      CorpusOps.spanCorruption(docs(s, dir), "doc_id", "text",
        densityPpm = 150000L, meanSpan = 3)
    },

    // FIM objective prep over the REAL corpus: doc-level md5 dice pick
    // 50% of docs, hash-chosen (prefix, middle, suffix) boundaries,
    // PSM/SPM reorder with sentinels (50/50 among transformed) — all
    // map-only; the twin replays the identical dice and slices
    "q323_fim_transform" -> { (s, dir) =>
      CorpusOps.fimTransform(docs(s, dir), "doc_id", "text",
        fimRatePpm = 500000L, spmRatePpm = 500000L)
    },

    // Data-constrained epoch allocation (Muennighoff-style water-fill):
    // 1M-token budget over four sources at a 2-epoch repetition cap —
    // books and code cap, the excess redistributes over web/wiki
    // proportionally; every number is the hand-computed exact-integer
    // walk (also pinned in CorpusOpsSpec)
    "q326_epoch_allocation" -> { (s, _) =>
      import s.implicits._
      val src = Seq(
        ("web", 600000L, 500000L), ("books", 100000L, 300000L),
        ("code", 50000L, 150000L), ("wiki", 200000L, 50000L)
      ).toDF("source", "n_tokens", "weight_ppm")
      CorpusOps.epochAllocation(src, "source", "n_tokens", "weight_ppm",
        targetTokens = 1000000L, maxEpochsPpm = 2000000L)
    },

    // Content-addressed corpus manifest over the REAL corpus (4 synthetic
    // shards by doc_id mod): order-invariant per-shard digests (md5 over
    // sorted per-doc digests), the dataset-versioning artifact — both
    // engines derive the identical hex
    "q324_corpus_manifest" -> { (s, dir) =>
      CorpusOps.corpusManifest(
        docs(s, dir).withColumn("shard", pmod(col("doc_id"), lit(4))),
        "doc_id", "text", "shard")
    },

    // ... and the one-row corpus root fingerprint over that manifest
    "q325_corpus_root_digest" -> { (s, dir) =>
      CorpusOps.corpusRootDigest(CorpusOps.corpusManifest(
        docs(s, dir).withColumn("shard", pmod(col("doc_id"), lit(4))),
        "doc_id", "text", "shard"))
    },

    // C4-style unit dedup over SENTENCE units (the boundary-aware
    // upgrade of q157's fixed blocks): the shared boilerplate sentence
    // is deleted from every doc carrying it, original content survives
    "q316_sentence_unit_dedup" -> { (s, _) =>
      import s.implicits._
      val d = Seq(
        (1L, "Real content here. Subscribe to our newsletter. More real text!"),
        (2L, "Different content. Subscribe to our newsletter. Unique ending?"),
        (3L, "Totally original thoughts. Nothing shared here!")
      ).toDF("doc_id", "text")
      CorpusOps.unitDedup(d, "doc_id",
        CorpusOps.sentenceArray(col("text")), maxOcc = 1L)
    },

    // BPE round-1 statistic: adjacent-character pair frequencies weighted
    // by word frequency, top-20 merge candidates. Iteration cost rides the
    // distinct-word table (|vocab|), not the corpus — the one corpus scan
    // is wordCounts. The multi-round trainer is pinned in BpeSpec against
    // an in-memory reference fold (not SQL-expressible without recursion)
    "q158_bpe_pairs" -> { (s, dir) =>
      Bpe.pairCounts(Bpe.initialSymbols(Bpe.wordCounts(docs(s, dir), "text")))
        .orderBy(col("pair_n").desc, col("left").asc, col("right").asc)
        .limit(20)
    },

    // ExactSubstr span removal (the q82 stats' enforcement step): 5-token
    // spans in >=2 docs are duplicated; every covered token is deleted
    // from all copies. Flagged-gram tail broadcasts (1.1k of 24k grams at
    // sf0.01); coverage and reassembly shuffle by doc id only
    "q160_span_removal" -> { (s, dir) =>
      CorpusOps.removeDuplicatedSpans(docs(s, dir), "doc_id", "text",
        n = 5, minDocFreq = 2)
    },

    // Content-addressed snapshot diff: the previous snapshot is derived
    // in-query (drop %11=3 -> added; ' OLD'-suffix %7=0 -> changed; shift
    // ids of %13=0 -> moved; tombstone rows -> removed) so both engines
    // diff identical inputs. Orphan rematch by md5 catches the renumbered
    // copies a plain id-diff would misreport as delete+add
    "q163_snapshot_diff" -> { (s, dir) =>
      val d = docs(s, dir)
      val curr = d.select(col("doc_id"), col("text"))
      val prevMain = d.filter(pmod(col("doc_id"), lit(11)) =!= 3)
        .select(
          when(pmod(col("doc_id"), lit(13)) === 0 &&
               pmod(col("doc_id"), lit(7)) =!= 0,
            col("doc_id") + 100000).otherwise(col("doc_id")).as("doc_id"),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("text"), lit(" OLD"))).otherwise(col("text"))
            .as("text"))
      val tomb = d.filter(pmod(col("doc_id"), lit(17)) === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(lit("tombstone "), col("doc_id").cast("string")).as("text"))
      CorpusOps.snapshotDiff(prevMain.unionByName(tomb), curr,
        "doc_id", "text")
    },

    // Quality-filter calibration: confusion counts + ppm precision/recall
    // for 10 cutoffs of the q84 classifier against lang='en' relevance.
    // One histogram shuffle; the sweep itself touches |scores|x10 rows
    "q164_threshold_sweep" -> { (s, dir) =>
      val d = docs(s, dir)
      val scored = CorpusOps.scoreHashedLinear(d, "doc_id", "text", dim = 16)
        .join(d.select(col("doc_id"), (col("lang") === "en").as("rel")),
          Seq("doc_id"))
      CorpusOps.thresholdSweep(scored, "score", "rel",
        thresholds = (-160L to 20L by 20L).toSeq)
    },

    // Mixing-temperature fit: the dyadic τ grid {0,¼,½,¾,1} evaluated in
    // ONE pass against a 40k-token budget and a 2-epoch oversampling cap;
    // `chosen` marks the least-flattening feasible temperature
    "q177_mixture_fit" -> { (s, dir) =>
      CorpusOps.mixtureFit(docs(s, dir), "source", "text",
        budgetTokens = 40000L, maxOversamplePpm = 2000000L)
    },

    // Data-card generation: the per-source corpus summary artifact — doc
    // and token counts, exact-dup ppm, dominant language, mean classifier
    // score (ppm), median length — composed from the pipeline's own
    // primitives in two aggregation shuffles
    "q175_data_card" -> { (s, dir) =>
      val d = docs(s, dir)
      val score = CorpusOps.scoreHashedLinear(d, "doc_id", "text", dim = 16)
        .select(col("doc_id"), col("score"))
      val base = d.join(score, Seq("doc_id"))
        .select(col("source"), col("lang"), col("doc_id"), col("score"),
          size(graft.functions.TextFunctions.tokens(col("text"))).as("nt"),
          md5(col("text").cast("binary")).as("h"))
      val perSource = base.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt").cast("long")).as("n_tokens"),
        countDistinct(col("h")).as("__uniq"),
        sum(col("score")).as("__ssum"),
        expr("percentile(nt, 0.5D)").as("p50_tokens"))
      val topLang = base.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("source"))
        .agg(min(struct((-col("__c")).as("nc"), col("lang").as("lang")))
          .as("__m"))
        .select(col("source"), col("__m.lang").as("top_lang"))
      perSource.join(topLang, Seq("source"))
        .withColumn("dup_ppm",
          expr("(1000000 * (n_docs - __uniq)) div n_docs"))
        .withColumn("mean_score_ppm", expr("(1000000 * __ssum) div n_docs"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("dup_ppm"), col("top_lang"), col("mean_score_ppm"),
          col("p50_tokens"))
    },

    // Quality-aware exact dedup: keep the highest-scoring copy of each
    // identical text (tie -> lowest id) — same one-shuffle plan as q21,
    // the argmax riding the agg as min(struct(-score, id))
    "q176_dedup_keep_best" -> { (s, dir) =>
      val d = docs(s, dir)
      val scored = d.join(
        CorpusOps.scoreHashedLinear(d, "doc_id", "text", dim = 16)
          .select(col("doc_id"), col("score")), Seq("doc_id"))
      graft.operators.Dedup.exactKeepBest(scored, "doc_id", "text", "score")
    },

    // Neyman review-budget allocation: per-source integer score moments →
    // n·σ = sqrt(n·Σx²−(Σx)²) → alloc = budget·w div Σw. One moment
    // shuffle; high-variance sources get the reviewers
    "q173_review_allocation" -> { (s, dir) =>
      val d = docs(s, dir)
      val scored = CorpusOps.scoreHashedLinear(d, "doc_id", "text", dim = 16)
        .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
      graft.operators.QaSampling.neymanAllocation(scored, "source", "score",
        budget = 100L)
    },

    // Delete-a-group jackknife on the mean classifier score: 10 hash
    // buckets, exact integer leave-one-out means (ppm), integer variance
    // numerator — error bars on a pipeline metric with zero FP summation
    "q174_jackknife_mean" -> { (s, dir) =>
      val scored = CorpusOps.scoreHashedLinear(docs(s, dir), "doc_id",
        "text", dim = 16)
      graft.operators.QaSampling.jackknifeVariance(scored, "doc_id",
        "score", buckets = 10)
    },

    // Context-window chunking: documents split into <=32-token training
    // pieces, map-only (array slice + explode, no shuffle)
    "q170_context_chunks" -> { (s, dir) =>
      CorpusOps.chunkDocuments(docs(s, dir), "doc_id", "text",
        maxTokens = 32)
    },

    // Type-growth (Heaps-law) curve over 3-gram types: distinct n-gram
    // count as a function of grams read in (doc_id, pos) order, bucketed
    // every 2000 — the "how fast does novelty saturate" sizing curve
    // (over grams, not raw tokens: the synthetic vocab is 31 words, so
    // the token curve is a single point, while ~16k gram types trace a
    // real saturation path). Global positions come from the two-level
    // PrefixSum scan over per-doc gram counts (never one task); first
    // occurrence is a min-agg per type; the cumulative curve is a second
    // PrefixSum over the tiny bucket table
    "q169_vocab_growth" -> { (s, dir) =>
      import graft.functions.TextFunctions
      val d = docs(s, dir)
      // positional FUSED gram hashes (one codegen pass; round-6 change) —
      // typing by 60-bit hash instead of gram string keeps the
      // first-position shuffle to fixed-width longs and matches the
      // string-typed oracle under the repo-wide no-collision bet (q26/q27)
      val grams = TextFunctions.shingleHashes60All(col("text"), 3)
      val perDoc = d.select(col("doc_id"),
        posexplode(grams).as(Seq("pos", "gram")))
      val lens = d.select(col("doc_id"),
        greatest(size(TextFunctions.tokens(col("text"))) - 2, lit(0))
          .cast("long").as("len"))
      val offs = graft.operators.PrefixSum
        .overKey(lens, "doc_id", "len", "cum", chunkWidth = 64)
        .select(col("doc_id"), (col("cum") - col("len")).as("off"))
      // offsets are one row per DOC (not per gram) — broadcast them so the
      // 200x-larger gram explode never shuffles on doc_id before its
      // gram-keyed aggregation (round-6 change: was a shuffle join)
      val firsts = perDoc.join(broadcast(offs), Seq("doc_id"))
        .groupBy(col("gram"))
        .agg(min(col("off") + col("pos")).as("fp"))
      val buckets = firsts
        .groupBy(expr("fp div 2000").as("bucket"))
        .agg(count(lit(1)).as("n_new_types"))
      graft.operators.PrefixSum
        .overKey(buckets, "bucket", "n_new_types", "cum_types",
          chunkWidth = 32)
        .select(col("bucket"), col("n_new_types"), col("cum_types"))
    },

    // HyperLogLog distinct tokens per source (m=64): the fixed-register
    // dual of q71's KMV — one partial-agg shuffle bounded at m rows per
    // group, exact-integer register state, single-division estimate
    "q159_hll_distinct" -> { (s, dir) =>
      val hashed = docs(s, dir).select(col("source"),
        explode(transform(
          graft.functions.TextFunctions.tokens(col("text")),
          t => graft.functions.TextFunctions.portableHash60(t))).as("h"))
      graft.operators.Sketches.hllDistinct(hashed, Seq("source"), "h",
        log2m = 6)
    },

    // Cross-source shingle overlap from stored KMV sketches (k=64): the
    // union/Jaccard/intersection of every source pair estimated from
    // k-length arrays — no raw-stream join; one bounded sketch build per
    // source (per-doc pre-cap like q71), then broadcast pairwise array math
    "q266_kmv_overlap" -> { (s, dir) =>
      val k = 64
      val hashed = docs(s, dir).select(col("source"),
        explode(slice(array_sort(array_distinct(
          graft.functions.TextFunctions.shingleHashes60(col("text"), 5))),
          1, k)).as("h"))
      val sk = graft.operators.Sketches.kmvSketch(hashed, Seq("source"), "h", k)
      graft.operators.Sketches.kmvOverlapPairs(sk, "source", k)
    },

    // Exact phi-heavy-hitters (phi = 1500 ppm of the bigram stream) with
    // the CMS-gated exchange: the 916-type bigram tail is dropped map-side
    // by the literal-sketch lookup; only gate survivors reach the exact
    // count shuffle; output provably == plain GROUP BY ... HAVING
    "q267_heavy_hitters" -> { (s, dir) =>
      val grams = docs(s, dir).select(
        explode(graft.functions.TextFunctions.shingles(
          graft.functions.TextFunctions.tokens(col("text")), 2)).as("gram"))
      graft.operators.Sketches.heavyHittersExact(
        grams, "gram", phiPpm = 1500L, width = 1024, depth = 4)
    },

    // Frequency spectrum per gram order (1/2/3): types and token mass per
    // power-of-two count band — the Zipf-shape/hapax-rate diagnostic; one
    // text scan emits all orders, one wordcount shuffle, tiny band roll-up
    "q269_freq_spectrum" -> { (s, dir) =>
      graft.operators.CorpusOps.frequencySpectrum(docs(s, dir), "text")
    },

    // Exact TV distance of each source's token distribution from the
    // corpus mixture, integer ppm — absent-token mass folded into one
    // closed-form term, never a group x vocab cross product
    "q272_source_drift" -> { (s, dir) =>
      graft.operators.CorpusOps.tokenDistributionDrift(
        docs(s, dir), "source", "text")
    },

    // Epoch upsampling to a 40-doc target per source: full epochs for
    // every doc plus md5-order remainder copies — exactly target rows per
    // undersized source, deterministic, epoch index exposed for packing
    "q273_upsample_mixture" -> { (s, dir) =>
      val d = docs(s, dir)
      val targets = d.groupBy(col("source"))
        .agg(lit(40L).as("n_target"))
      graft.operators.CorpusOps
        .upsampleMixture(d, "doc_id", "source", targets)
        .select(col("doc_id"), col("source"), col("epoch"))
    },

    // Web-corpus URL canonicalization (the normalization BEFORE any
    // content hash): scheme/host lowercase, www. strip, default-port
    // drop, fragment drop, utm_*/click-id strip, surviving params
    // sorted, trailing-slash strip; unparseable -> NULL (fail closed).
    // Entirely codegen'd built-ins (parse_url + higher-order array
    // functions) — map-only at any scale
    "q289_url_canonicalize" -> { (s, _) =>
      urlFixture(s).select(col("id"),
        graft.operators.UrlOps.canonicalize(col("url")).as("canonical"))
    },

    // URL-keyed dedup on the canonical form: one groupBy — the
    // exact-dedup shuffle shape; min-id survivor + copy count per
    // canonical URL, NULL keys excluded (no shared key to collide on)
    "q290_url_dedup" -> { (s, _) =>
      graft.operators.UrlOps.urlDedup(urlFixture(s), "url", "id")
    },

    // Script-mix audit (the gate BEFORE per-language routing): per-class
    // character counts via codegen'd regexp_count, dominant-script
    // argmax, and the ≥10%-of-letter-mass code-mixed flag by integer
    // cross-multiplication. Multi-script fixture rows are hand-counted
    // in the oracle; the synthetic corpus is ASCII so the interesting
    // scripts need carried-in text
    "q292_script_mix" -> { (s, _) =>
      import s.implicits._
      val d = Seq(
        (1L, "hello world 123"),
        (2L, "Привет hello"),
        (3L, "日本語のテキスト"),
        (4L, "αβγ"),
        (5L, "42 + 17 = 59"),
        (6L, "mixed مرحبا text")
      ).toDF("doc_id", "text")
      graft.operators.TextAnalysis.scriptMix(d, "text")
        .select(col("doc_id"), col("n_latin"), col("n_cyrillic"),
          col("n_greek"), col("n_arabic"), col("n_cjk"), col("n_digit"),
          col("n_letters"), col("dominant_script"), col("is_code_mixed"))
    },

    // Sequence-length capacity planning over the real corpus: for each
    // candidate seq_len the exact bounds every packing strategy lives
    // between (naive per-doc ceil vs perfect-pack ceil) + naive padding
    // waste ppm — one token-count scan serves every candidate
    "q311_packing_efficiency" -> { (s, dir) =>
      CorpusOps.packingEfficiency(docs(s, dir), "text",
        Seq(32, 64, 128, 256))
    },

    // Per-host crawl cap: md5-order top-2 per canonical host — the
    // per-domain quota that stops one sprawling site from dominating a
    // mix; hostless rows excluded (fail-closed, as in urlDedup)
    "q312_per_host_cap" -> { (s, _) =>
      graft.operators.UrlOps.perHostCap(urlFixture(s), "url", "id", n = 2)
    },

    // Crawl-governance composition: hostGraph (canonical-host edges,
    // one vote per distinct pair, self-links/hostless dropped) feeding
    // string-keyed integer-ppm PageRank — the domain-quality weight a
    // training mix samples by. The fixture graph is isomorphic to
    // GraphRankSpec's hand-computed walk (alpha->beta, alpha->gamma,
    // beta->alpha; gamma dangling), so every rank is hand-pinned
    "q320_host_pagerank" -> { (s, _) =>
      graft.operators.GraphRank.pageRank(
          graft.operators.UrlOps.hostGraph(hostPages(s), "url",
            "outlinks"),
          "src_host", "dst_host", iters = 2)
        .withColumnRenamed("id", "host")
    },

    // The link graph's PRODUCTION composition, end to end: hostGraph ->
    // integer-ppm PageRank -> rank-proportional per-host doc budgets
    // (rankWeightedTargets: budget*rank div SUM(rank), DECIMAL-widened)
    // -> applyMixture's deterministic md5-order per-host sample. The
    // crawl-quality prior actually weighting a training mix
    "q332_rank_weighted_mixture" -> { (s, _) =>
      import s.implicits._
      val ranks = graft.operators.GraphRank.pageRank(
          graft.operators.UrlOps.hostGraph(hostPages(s), "url",
            "outlinks"),
          "src_host", "dst_host", iters = 2)
        .withColumnRenamed("id", "host")
      val targets = CorpusOps.rankWeightedTargets(ranks, "host",
        "rank_ppm", budget = 6L)
      val docsByHost = Seq(
        (1L, "alpha.com"), (2L, "alpha.com"), (3L, "alpha.com"),
        (4L, "beta.com"), (5L, "beta.com"), (6L, "beta.com"),
        (7L, "gamma.org"), (8L, "gamma.org"), (9L, "gamma.org")
      ).toDF("doc_id", "host")
      CorpusOps.applyMixture(docsByHost, "doc_id", "host", targets)
    },

    // Hashed char-2+3-gram language ID vs the marker baseline over the
    // HELD-OUT multilingual fixture (8 languages): integer dot of each
    // doc's gram buckets with the broadcast per-language NB-log
    // profiles (built from the bundled seeds), argmax with ties to the
    // earlier language
    "q333_language_id_ngram" -> { (s, _) =>
      val profiles = graft.operators.TextAnalysis.buildLanguageProfiles(
        graft.operators.TextAnalysis.defaultProfileSamples, langIdDim)
      langFixtureDf(s).select(col("id"), col("lang").as("lang_true"),
        graft.operators.TextAnalysis.languageId(col("text"))
          .as("lang_marker"),
        graft.operators.TextAnalysis.languageIdNgram(col("text"),
          profiles, langIdDim).as("lang_ngram"))
    },

    // Post-training data, SFT leg: per-conversation structural
    // validation over parsed message arrays (optional leading system,
    // strict user/assistant alternation, assistant-final, no empty
    // content) — all higher-order array functions, map-only; per-rule
    // booleans kept for attrition. Fixture trips each rule separately
    "q309_chat_validation" -> { (s, _) =>
      import s.implicits._
      val schema = org.apache.spark.sql.types.DataType.fromDDL(
        "array<struct<role:string,content:string>>")
      val df = Seq(
        (1L, """[{"role":"system","content":"be helpful"},""" +
          """{"role":"user","content":"hi"},""" +
          """{"role":"assistant","content":"hello"}]"""),
        (2L, """[{"role":"user","content":"hi"},""" +
          """{"role":"assistant","content":"hello"},""" +
          """{"role":"user","content":"thanks"}]"""),
        (3L, """[{"role":"assistant","content":"hi"}]"""),
        (4L, """[{"role":"user","content":"a"},""" +
          """{"role":"user","content":"b"},""" +
          """{"role":"assistant","content":"c"}]"""),
        (5L, """[{"role":"user","content":"hi"},""" +
          """{"role":"assistant","content":"  "}]"""),
        // missing content field -> NULL after from_json: counts as empty
        (6L, """[{"role":"user","content":"hi"},""" +
          """{"role":"assistant"}]"""),
        // empty conversation: exists() over [] is false (not NULL), so
        // only the size(msgs) > 0 guard fails ok_no_empty here
        (7L, """[]"""),
        // malformed JSON -> NULL array: every rule coalesces to false
        (8L, """not json""")
      ).toDF("conv_id", "raw")
        .select(col("conv_id"), from_json(col("raw"), schema)
          .as("messages"))
      graft.operators.ChatData.validateChats(df, "conv_id", "messages")
    },

    // Post-training data, preference leg: chosen/rejected integrity +
    // prompt copy counts (duplicate prompts leak preference labels
    // between epochs and splits); one prompt-keyed count join
    "q310_preference_pairs" -> { (s, _) =>
      import s.implicits._
      val df = Seq(
        (1L, Some("p1"), "good answer", "bad answer"),
        (2L, Some("p2"), "same", "same"),
        (3L, Some("p3"), "x", ""),
        (4L, Some("p4"), "a", "b"),
        (5L, Some("p4"), "c", "d"),
        // NULL prompt (missing JSONL field): must SURVIVE the count
        // join and be flagged, not vanish
        (6L, None: Option[String], "a", "b")
      ).toDF("pair_id", "prompt", "chosen", "rejected")
      graft.operators.ChatData.validatePreferencePairs(df, "pair_id",
        "prompt", "chosen", "rejected")
    },

    // Vocabulary-coverage / OOV report per source against the corpus
    // top-20 vocabulary (ties word-asc, a total order both engines cut
    // identically): one wordcount shuffle, bounded vocab broadcast back,
    // integer ppm — the tokenizer-fit gate before committing a source
    // to a training mix
    "q303_vocab_coverage" -> { (s, dir) =>
      graft.operators.TextAnalysis.vocabCoverage(docs(s, dir), "source",
        "text", vocabSize = 20)
    },

    // Gopher quality-rule bundle over the real corpus: one map-only
    // projection, every threshold an integer cross-multiplication; the
    // DuckDB twin computes the same counts and the same inequalities
    // (word-count split is real at this corpus: 10-99 words vs the
    // [50, 100000] gate)
    "q298_gopher_rules" -> { (s, dir) =>
      CorpusOps.gopherRules(docs(s, dir), "doc_id", "text")
    }
  )

  /** Surface-form URL zoo: case, default/explicit ports, userinfo,
    * tracking params, fragments, trailing slashes, an unparseable row —
    * each canonical form hand-computed in the oracle. */
  private def urlFixture(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (1L, "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag"),
      (2L, "https://example.com/a/b?b=2&a=1"),
      (3L, "http://example.com:8080//x?gclid=z"),
      (4L, "http://News.Site.org/article/"),
      (5L, "https://example.com/"),
      (6L, "https://example.com"),
      (7L, "not a url"),
      (8L, "http://user@www.shop.io:80/cart?fbclid=abc&item=7")
    ).toDF("id", "url")
  }

  /** The 4-directive reparse + group selection + max-delay chain of
    * [[graft.operators.UrlOps.robotsCrawlDelay]] as appendable CTEs
    * (dl_-prefixed so they compose with [[sqlRobotsRules]]' names in
    * one query), ending in `delays(host, delay_ms)`. Shared by the
    * q343 twin and the q346 schedule twin. */
  private val sqlCrawlDelayCtes: String =
    s""", dl_typed AS (
       |  SELECT host, line_no,
       |    lower(trim(str_split(line, ':')[1])) AS directive,
       |    trim(substr(line, strpos(line, ':') + 1)) AS value
       |  FROM rlines
       |  WHERE line <> ''
       |    AND lower(trim(str_split(line, ':')[1]))
       |      IN ('user-agent', 'allow', 'disallow', 'crawl-delay')
       |), dl_grp AS (
       |  SELECT *, directive = 'user-agent' AS ua,
       |    (directive = 'user-agent' AND NOT coalesce(
       |      lag(directive = 'user-agent') OVER (
       |        PARTITION BY host ORDER BY line_no), false)) AS gstart
       |  FROM dl_typed
       |), dl_rules AS (
       |  SELECT host,
       |    CAST(SUM(CASE WHEN gstart THEN 1 ELSE 0 END) OVER (
       |      PARTITION BY host ORDER BY line_no
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS group_id,
       |    CAST(line_no AS BIGINT) AS line_no, directive,
       |    CASE WHEN ua THEN lower(value) ELSE value END AS value
       |  FROM dl_grp
       |), dl_agents AS (
       |  SELECT host, group_id, value AS ua FROM dl_rules
       |  WHERE directive = 'user-agent'
       |), dl_exact AS (
       |  SELECT DISTINCT host, group_id FROM dl_agents
       |  WHERE ua = 'gammabot'
       |), dl_star AS (
       |  SELECT DISTINCT host, group_id FROM dl_agents
       |  WHERE ua = '*' AND host NOT IN (SELECT host FROM dl_exact)
       |), dl_chosen AS (
       |  SELECT * FROM dl_exact UNION SELECT * FROM dl_star
       |), delays AS (
       |  SELECT r.host,
       |    CAST(max(CAST(round(TRY_CAST(r.value AS DOUBLE) * 1000)
       |      AS BIGINT)) AS BIGINT) AS delay_ms
       |  FROM dl_rules r JOIN dl_chosen c
       |    ON r.host = c.host AND r.group_id = c.group_id
       |  WHERE r.directive = 'crawl-delay'
       |    AND TRY_CAST(r.value AS DOUBLE) >= 0
       |  GROUP BY r.host
       |)""".stripMargin

  /** The governed-intake twin shared by q336 and q342: robots
    * decision CTEs over `urlValues` rows (id, url) + allowed filter
    * + the md5-order per-host cap at `n`. */
  // NOTE: plain concatenation, NOT an interpolating stripMargin — the
  // inner SQL contains `||` concat operators at line starts, which a
  // second stripMargin would eat as margin markers.
  private def sqlGovernedCap(urlValues: String, n: Int): String =
    sqlGovernedCapCte(urlValues, n) + "\nSELECT id, host, pos FROM capped"

  /** ... and the same chain stopping at a `capped(id, url, host, pos)`
    * CTE, so the q346 schedule twin can keep composing. */
  private def sqlGovernedCapCte(urlValues: String, n: Int): String =
    s"""$sqlRobotsRules, agents AS (
         |  SELECT host, group_id, value AS ua FROM rules
         |  WHERE directive = 'user-agent'
         |), exact AS (
         |  SELECT DISTINCT host, group_id FROM agents
         |  WHERE ua = 'gammabot'
         |), star AS (
         |  SELECT DISTINCT host, group_id FROM agents
         |  WHERE ua = '*' AND host NOT IN (SELECT host FROM exact)
         |), chosen AS (
         |  SELECT * FROM exact UNION SELECT * FROM star
         |), paths AS (
         |  SELECT r.host, r.directive, r.value,
         |    '^' || replace(
         |      regexp_replace(
         |        CASE WHEN r.value LIKE '%$$' THEN
         |          substr(r.value, 1, len(r.value) - 1) ELSE r.value END,
         |        '([.\\[\\]{}()+?^$$|\\\\])', '\\\\\\1', 'g'),
         |      '*', '.*')
         |      || CASE WHEN r.value LIKE '%$$' THEN '$$' ELSE '' END AS pat
         |  FROM rules r
         |  JOIN chosen c ON r.host = c.host AND r.group_id = c.group_id
         |  WHERE r.directive IN ('allow', 'disallow') AND r.value <> ''
         |), uu AS (
         |  SELECT * FROM (VALUES
         |$urlValues
         |  ) AS t(id, url)
         |), u AS (
         |  SELECT id, url,
         |    CASE WHEN regexp_extract(url, '^[a-zA-Z]+://([^/:?#]+)', 1)
         |        = '' THEN NULL
         |      ELSE regexp_replace(lower(regexp_extract(url,
         |        '^[a-zA-Z]+://([^/:?#]+)', 1)), '^www\\.', '') END AS host,
         |    CASE WHEN regexp_extract(url,
         |        '^[a-zA-Z]+://[^/?#]+(/[^?#]*)', 1) = '' THEN '/'
         |      ELSE regexp_extract(url,
         |        '^[a-zA-Z]+://[^/?#]+(/[^?#]*)', 1) END
         |      || CASE WHEN regexp_matches(url, '^[a-zA-Z]+://[^#]*\\?')
         |        THEN '?' || regexp_extract(url, '\\?([^#]*)', 1)
         |        ELSE '' END AS path
         |  FROM uu
         |), mm AS (
         |  SELECT u.url, p.directive, p.value,
         |    ROW_NUMBER() OVER (PARTITION BY u.url
         |      ORDER BY len(p.value) DESC,
         |        (p.directive = 'allow') DESC, p.value DESC) AS rn
         |  FROM u JOIN paths p ON u.host = p.host
         |  WHERE regexp_matches(u.path, p.pat)
         |), alw AS (
         |  SELECT u.id, u.url, u.host
         |  FROM u LEFT JOIN (SELECT * FROM mm WHERE rn = 1) m
         |    ON u.url = m.url
         |  WHERE coalesce(m.directive = 'allow', true)
         |    AND u.host IS NOT NULL AND u.host <> ''
         |), capped AS (
         |  SELECT id, url, host, CAST(pos AS INTEGER) AS pos FROM (
         |    SELECT id, url, host, ROW_NUMBER() OVER (PARTITION BY host
         |      ORDER BY md5(CAST(id AS VARCHAR)), id) AS pos
         |    FROM alw)
         |  WHERE pos <= $n
         |)""".stripMargin

  val oracle: Map[String, String] = Map(
    // the same CRLF-safe comment-stripped line walk as the rules twin,
    // filtered to the Sitemap directive (group-independent per RFC)
    "q338_robots_sitemaps" -> {
      val values = robotsFixture.map { case (h, t) => s"    ('$h', '$t')" }
        .mkString(",\n")
      s"""WITH src AS (
         |  SELECT * FROM (VALUES
         |$values
         |  ) AS t(host, txt)
         |), rlines AS (
         |  SELECT host, i - 1 AS line_no,
         |    trim(regexp_replace(t[i], '#.*$$', '')) AS line
         |  FROM (SELECT host, regexp_split_to_array(txt, '\\r?\\n') AS t
         |        FROM src),
         |    unnest(generate_series(1, len(t))) AS u(i)
         |)
         |SELECT host, CAST(line_no AS BIGINT) AS line_no,
         |  trim(substr(line, strpos(line, ':') + 1)) AS sitemap_url
         |FROM rlines
         |WHERE lower(line) LIKE 'sitemap:%'
         |  AND trim(substr(line, strpos(line, ':') + 1)) <> ''""".stripMargin
    },

    // entry lists rebuilt with the same backreference-free extracts
    // (url entries then sitemap entries), unnested with ordinality
    "q339_sitemap_parse" -> {
      val values = sitemapFixture.map { case (i, x) =>
        s"    (CAST($i AS BIGINT), '$x')" }.mkString(",\n")
      val loc = "trim(regexp_extract(es[i].e, '(?is)<loc>(.*?)</loc>', 1))"
      val lm = "regexp_extract(es[i].e, '(?is)<lastmod>(.*?)</lastmod>', 1)"
      s"""WITH src AS (
         |  SELECT * FROM (VALUES
         |$values
         |  ) AS t(id, xml)
         |), ent AS (
         |  SELECT id, list_concat(
         |    list_transform(regexp_extract_all(xml,
         |      '(?is)<url>(.*?)</url>', 1),
         |      e -> struct_pack(e := e, idx := false)),
         |    list_transform(regexp_extract_all(xml,
         |      '(?is)<sitemap>(.*?)</sitemap>', 1),
         |      e -> struct_pack(e := e, idx := true))) AS es
         |  FROM src
         |)
         |SELECT id, CAST(i - 1 AS BIGINT) AS entry_idx,
         |  replace(replace(replace(replace(replace($loc,
         |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         |    '&apos;', chr(39)), '&amp;', '&') AS loc,
         |  CASE WHEN $lm <> '' THEN trim($lm) END AS lastmod,
         |  es[i].idx AS is_index
         |FROM ent, unnest(generate_series(1, len(es))) AS g(i)
         |WHERE $loc <> ''""".stripMargin
    },

    // host → registrable domain via the same pinned two-level-suffix
    // heuristic, rolled up with distinct-host counts
    "q340_domain_rollup" -> {
      val values = domainUrls.map { case (i, u) =>
        s"    (CAST($i AS BIGINT), '$u')" }.mkString(",\n")
      val sfx = graft.operators.UrlOps.twoLevelSuffixes
        .map(x => s"'$x'").mkString(", ")
      s"""WITH src AS (
         |  SELECT * FROM (VALUES
         |$values
         |  ) AS t(id, url)
         |), h AS (
         |  SELECT id,
         |    CASE WHEN regexp_extract(url, '^[a-zA-Z]+://([^/:?#]+)', 1)
         |        = '' THEN NULL
         |      ELSE regexp_replace(lower(regexp_extract(url,
         |        '^[a-zA-Z]+://([^/:?#]+)', 1)), '^www\\.', '') END AS host
         |  FROM src
         |), d AS (
         |  SELECT id, host, str_split(host, '.') AS ls,
         |    len(str_split(host, '.')) AS n
         |  FROM h
         |), r AS (
         |  SELECT id, host,
         |    CASE WHEN host IS NULL
         |        OR regexp_matches(host, '^\\d+\\.\\d+\\.\\d+\\.\\d+$$')
         |        OR n <= 1 THEN host
         |      WHEN array_to_string(ls[n-1:n], '.') IN ($sfx) AND n >= 3
         |        THEN array_to_string(ls[n-2:n], '.')
         |      WHEN array_to_string(ls[n-1:n], '.') IN ($sfx) THEN host
         |      ELSE array_to_string(ls[n-1:n], '.') END AS domain
         |  FROM d
         |)
         |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_urls,
         |  CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
         |FROM r WHERE domain IS NOT NULL AND domain <> ''
         |GROUP BY domain""".stripMargin
    },

    // the 4-directive parse CTEs + q335 group selection + max-delay
    // (the factored chain the q346 schedule twin also composes)
    "q343_crawl_delay" ->
      (sqlRobotsLines + sqlCrawlDelayCtes +
        "\nSELECT host, delay_ms FROM delays"),

    // the same sentence-per-line projection, distinct-doc line counts
    // (grouped on the trimmed line text — the hash-collision-free
    // reading of lineDedup's 60-bit keys, q157's discipline),
    // order-preserving reassembly
    "q344_line_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, 'shared promo header' || chr(10) || text
        |    || chr(10) || substr(text, 1, 20)
        |    || chr(10) || substr(text, 1, 20)
        |    || chr(10) || 'all rights reserved footer' AS text
        |  FROM documents
        |), l AS (
        |  SELECT doc_id, i - 1 AS pos, t[i] AS line, trim(t[i]) AS k
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS t FROM d),
        |    unnest(generate_series(1, len(t))) AS u(i)
        |), f AS (
        |  SELECT k, TRUE AS fl
        |  FROM (SELECT DISTINCT k, doc_id FROM l WHERE k <> '')
        |  GROUP BY k HAVING COUNT(*) > 1
        |)
        |SELECT l.doc_id,
        |  CAST(SUM(CASE WHEN f.fl THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_removed,
        |  coalesce(string_agg(CASE WHEN f.fl IS NULL THEN l.line END,
        |    chr(10) ORDER BY l.pos), '') AS text_clean
        |FROM l LEFT JOIN f ON l.k = f.k
        |GROUP BY l.doc_id""".stripMargin,

    // governed-cap CTEs (cap 3) + the crawl-delay chain + the spacing
    // arithmetic — the whole admission-to-timeline loop in one replay
    "q346_frontier_schedule" -> {
      val urlValues = robotsEvalUrls.zipWithIndex
        .map { case (u, i) => s"    (CAST(${i + 1} AS BIGINT), '$u')" }
        .mkString(",\n")
      sqlGovernedCapCte(urlValues, 3) + sqlCrawlDelayCtes +
        """
          |SELECT c.id, c.url, c.host, c.pos,
          |  coalesce(d.delay_ms, 1000) AS delay_ms,
          |  (c.pos - 1) * coalesce(d.delay_ms, 1000) AS fetch_at_ms
          |FROM capped c LEFT JOIN delays d USING (host)""".stripMargin
    },

    // the q339 <url> entry walk (non-index docs only produce these) +
    // snapshot VALUES + one full-outer reconciliation
    "q347_recrawl_plan" -> {
      val values = sitemapFixture.map { case (i, x) =>
        s"    (CAST($i AS BIGINT), '$x')" }.mkString(",\n")
      val snap = recrawlSnapshot.map { case (u, f) =>
        s"    ('$u', '$f')" }.mkString(",\n")
      val loc = "trim(regexp_extract(es[i].e, '(?is)<loc>(.*?)</loc>', 1))"
      val lm = "regexp_extract(es[i].e, '(?is)<lastmod>(.*?)</lastmod>', 1)"
      s"""WITH src AS (
         |  SELECT * FROM (VALUES
         |$values
         |  ) AS t(id, xml)
         |), ent AS (
         |  SELECT id, list_transform(regexp_extract_all(xml,
         |    '(?is)<url>(.*?)</url>', 1),
         |    x -> struct_pack(e := x)) AS es
         |  FROM src
         |), sm AS (
         |  SELECT
         |    replace(replace(replace(replace(replace($loc,
         |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         |      '&apos;', chr(39)), '&amp;', '&') AS url,
         |    CASE WHEN $lm <> '' THEN trim($lm) END AS lastmod,
         |    TRUE AS listed
         |  FROM ent, unnest(generate_series(1, len(es))) AS g(i)
         |  WHERE $loc <> ''
         |), sn AS (
         |  SELECT * FROM (VALUES
         |$snap
         |  ) AS t(url, fetched_on)
         |)
         |SELECT coalesce(sm.url, sn.url) AS url,
         |  CASE WHEN sn.url IS NULL THEN 'new'
         |    WHEN sm.listed IS NULL THEN 'gone'
         |    WHEN TRY_CAST(substr(sm.lastmod, 1, 10) AS DATE) IS NOT NULL
         |      AND TRY_CAST(sn.fetched_on AS DATE) IS NOT NULL
         |      AND TRY_CAST(substr(sm.lastmod, 1, 10) AS DATE) >
         |        TRY_CAST(sn.fetched_on AS DATE) THEN 'refetch'
         |    ELSE 'keep' END AS action,
         |  sm.lastmod, sn.fetched_on
         |FROM sm FULL OUTER JOIN sn ON sm.url = sn.url""".stripMargin
    },

    "q334_robots_parse" ->
      s"""$sqlRobotsRules
         |SELECT host, group_id, line_no, directive, value FROM rules""".stripMargin,

    // group selection, RFC wildcard translation (escape all metachars
    // except * -> .* and a TRAILING $ -> anchor), longest-match with
    // allow-wins-ties via one ROW_NUMBER, fail-open left join
    "q335_robots_eval" -> {
      val urlValues = robotsEvalUrls.map(u => s"    ('$u')")
        .mkString(",\n")
      s"""$sqlRobotsRules, agents AS (
         |  SELECT host, group_id, value AS ua FROM rules
         |  WHERE directive = 'user-agent'
         |), exact AS (
         |  SELECT DISTINCT host, group_id FROM agents
         |  WHERE ua = 'gammabot'
         |), star AS (
         |  SELECT DISTINCT host, group_id FROM agents
         |  WHERE ua = '*' AND host NOT IN (SELECT host FROM exact)
         |), chosen AS (
         |  SELECT * FROM exact UNION SELECT * FROM star
         |), paths AS (
         |  SELECT r.host, r.directive, r.value,
         |    '^' || replace(
         |      regexp_replace(
         |        CASE WHEN r.value LIKE '%$$' THEN
         |          substr(r.value, 1, len(r.value) - 1) ELSE r.value END,
         |        '([.\\[\\]{}()+?^$$|\\\\])', '\\\\\\1', 'g'),
         |      '*', '.*')
         |      || CASE WHEN r.value LIKE '%$$' THEN '$$' ELSE '' END AS pat
         |  FROM rules r
         |  JOIN chosen c ON r.host = c.host AND r.group_id = c.group_id
         |  WHERE r.directive IN ('allow', 'disallow') AND r.value <> ''
         |), uu AS (
         |  SELECT * FROM (VALUES
         |$urlValues
         |  ) AS t(url)
         |), u AS (
         |  SELECT url,
         |    CASE WHEN regexp_extract(url, '^[a-zA-Z]+://([^/:?#]+)', 1)
         |        = '' THEN NULL
         |      ELSE regexp_replace(lower(regexp_extract(url,
         |        '^[a-zA-Z]+://([^/:?#]+)', 1)), '^www\\.', '') END AS host,
         |    CASE WHEN regexp_extract(url,
         |        '^[a-zA-Z]+://[^/?#]+(/[^?#]*)', 1) = '' THEN '/'
         |      ELSE regexp_extract(url,
         |        '^[a-zA-Z]+://[^/?#]+(/[^?#]*)', 1) END
         |      || CASE WHEN regexp_matches(url, '^[a-zA-Z]+://[^#]*\\?')
         |        THEN '?' || regexp_extract(url, '\\?([^#]*)', 1)
         |        ELSE '' END AS path
         |  FROM uu
         |), mm AS (
         |  SELECT u.url, p.directive, p.value,
         |    ROW_NUMBER() OVER (PARTITION BY u.url
         |      ORDER BY len(p.value) DESC,
         |        (p.directive = 'allow') DESC, p.value DESC) AS rn
         |  FROM u JOIN paths p ON u.host = p.host
         |  WHERE regexp_matches(u.path, p.pat)
         |)
         |SELECT u.url, u.host,
         |  coalesce(m.directive = 'allow', true) AS allowed,
         |  m.directive AS matched_rule, m.value AS matched_path
         |FROM u LEFT JOIN (SELECT * FROM mm WHERE rn = 1) m
         |  ON u.url = m.url""".stripMargin
    },

    // the q335 decision CTEs + allowed filter + the md5-order per-host
    // cap (hostless rows fail closed, as perHostCap documents)
    "q336_governed_host_cap" -> sqlGovernedCap(
      robotsEvalUrls.zipWithIndex
        .map { case (u, i) => s"    (CAST(${i + 1} AS BIGINT), '$u')" }
        .mkString(",\n"), n = 2),

    // entity bodies hand-pinned: the de-chunked and inflated pages
    "q341_warc_encoded_bodies" -> {
      val rows = warcEncodedPages.map { case (i, h) =>
        s"  (CAST($i AS BIGINT), '$h')" }.mkString(",\n")
      s"""SELECT * FROM (VALUES
$rows
) AS t(id, html)"""
    },

    // the sitemap-seeded admission replayed: seed rows (entry order
    // = id), the same decision CTEs, cap 3
    "q342_sitemap_seeded_intake" -> sqlGovernedCap(
      sitemapSeedLocs.zipWithIndex
        .map { case (u, i) => s"    (CAST(${i + 1} AS BIGINT), '$u')" }
        .mkString(",\n"), n = 3),

    // targets hand-derived from q320's pinned ranks (alpha 1122777,
    // beta/gamma 938610; Σ 2999997; budget 6 → floor: 2/1/1); the
    // md5-order per-host sample is COMPUTED, mirroring applyMixture
    "q332_rank_weighted_mixture" ->
      """WITH docs AS (
        |  SELECT * FROM (VALUES
        |    (1, 'alpha.com'), (2, 'alpha.com'), (3, 'alpha.com'),
        |    (4, 'beta.com'), (5, 'beta.com'), (6, 'beta.com'),
        |    (7, 'gamma.org'), (8, 'gamma.org'), (9, 'gamma.org')
        |  ) AS t(doc_id, host)
        |), tg AS (
        |  SELECT * FROM (VALUES
        |    ('alpha.com', 2), ('beta.com', 1), ('gamma.org', 1)
        |  ) AS x(host, n_target)
        |), r AS (
        |  SELECT d.doc_id, d.host, tg.n_target,
        |    ROW_NUMBER() OVER (PARTITION BY d.host
        |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)) ASC,
        |        d.doc_id ASC) AS rk
        |  FROM docs d JOIN tg USING (host)
        |)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, host
        |FROM r WHERE rk <= n_target""".stripMargin,

    // the full 2+3-gram scoring replayed: same normalization, same
    // md5-prefix60 buckets, same NB-log weight arrays (interpolated
    // from the SAME profile build), same earlier-language tie rule —
    // plus the marker argmax next to it (over the 5-language marker
    // roster; the ngram argmax covers all 8 profiled languages)
    "q333_language_id_ngram" -> {
      val profiles = graft.operators.TextAnalysis.buildLanguageProfiles(
        graft.operators.TextAnalysis.defaultProfileSamples, langIdDim)
      val fixtureRows = langFixture.map { case (i, l, t) =>
        s"    (CAST($i AS BIGINT), '$l', '$t')" }.mkString(",\n")
      def score(w: Array[Long]): String =
        s"coalesce(list_sum(list_transform(grams, g1 -> " +
          s"(${w.mkString("[", ", ", "]")})[CAST(" +
          "CAST(concat('0x', substr(md5(g1), 1, 15)) AS BIGINT)" +
          s" % $langIdDim AS INTEGER) + 1])), 0)"
      val scoreCols = profiles.map { case (l, w) =>
        s"    ${score(w)} AS s_$l" }.mkString(",\n")
      val markerCols = graft.operators.TextAnalysis.defaultMarkers
        .map { case (l, ws) =>
          s"    len(regexp_extract_all(lower(text), " +
            s"'\\b(${ws.mkString("|")})\\b')) AS c_$l"
        }.mkString(",\n")
      def argmaxOf(prefix: String, langs: Seq[String]): String = {
        val best = langs.map(l => s"$prefix$l").mkString("greatest(", ", ", ")")
        "CASE WHEN " + best + " <= 0 THEN 'und' " +
          langs.map(l => s"WHEN $prefix$l = $best THEN '$l'")
            .mkString(" ") + " ELSE 'und' END"
      }
      // marker argmax runs over the marker set (5 languages), the
      // ngram argmax over the profile set (8) — two distinct rosters
      def argmax(prefix: String): String =
        if (prefix == "c_")
          argmaxOf(prefix,
            graft.operators.TextAnalysis.defaultMarkers.map(_._1))
        else argmaxOf(prefix, profiles.map(_._1))
      s"""WITH src AS (
         |  SELECT * FROM (VALUES
         |$fixtureRows
         |  ) AS t(id, lang, text)
         |), nm AS (
         |  SELECT id, lang, text,
         |    ' ' || trim(regexp_replace(regexp_replace(lower(text),
         |      '[^\\p{L} ]', ' ', 'g'), ' +', ' ', 'g')) || ' ' AS n
         |  FROM src
         |), gr AS (
         |  SELECT id, lang, text,
         |    list_concat(
         |      CASE WHEN len(n) >= 3 THEN list_transform(
         |        generate_series(1, len(n) - 1), i -> substr(n, i, 2))
         |      ELSE CAST([] AS VARCHAR[]) END,
         |      CASE WHEN len(n) >= 3 THEN list_transform(
         |        generate_series(1, len(n) - 2), i -> substr(n, i, 3))
         |      ELSE CAST([] AS VARCHAR[]) END) AS grams
         |  FROM nm
         |), sc AS (
         |  SELECT id, lang, text,
         |$scoreCols,
         |$markerCols
         |  FROM gr
         |)
         |SELECT id, lang AS lang_true,
         |  ${argmax("c_")} AS lang_marker,
         |  ${argmax("s_")} AS lang_ngram
         |FROM sc""".stripMargin
    },

    // the full extraction pipeline replayed in SQL: same region drops,
    // same block split, same per-block text normalization and integer
    // density gates, kept blocks joined by newline
    "q327_html_extract" ->
      s"""$sqlHtmlScored
         |SELECT id,
         |  array_to_string(list_transform(list_filter(g, s -> s.keep),
         |    s -> s.txt), chr(10)) AS text,
         |  CAST(len(g) AS BIGINT) AS n_blocks,
         |  CAST(len(list_filter(g, s -> s.keep)) AS BIGINT) AS n_kept
         |FROM scored""".stripMargin,

    // record metadata hand-pinned; content_length = the actual payload
    // byte count, computed from the same pinned fixture builder (the
    // charset pages' byte length differs from their char length)
    "q329_warc_read" -> {
      val respRows = htmlDocs.map { case (i, h) =>
        s"  ('${warcSegOf(i)}', 'response', " +
          s"'https://docs.example/page/$i', 200, " +
          s"${warcHttpPayload(i, h).length})"
      }.mkString(",\n")
      s"""SELECT * FROM (VALUES
         |  ('seg-00000.warc', 'warcinfo', CAST(NULL AS VARCHAR),
         |   CAST(NULL AS INTEGER), CAST(15 AS BIGINT)),
         |$respRows
         |) AS t(warc_name, record_type, target_uri, http_status,
         |       content_length)""".stripMargin
    },

    // the composed intake emits exactly the q327 rows (same pages,
    // same twin) — reusing the full-pipeline SQL verbatim
    "q330_warc_html_extract" ->
      s"""$sqlHtmlScored
         |SELECT id,
         |  array_to_string(list_transform(list_filter(g, s -> s.keep),
         |    s -> s.txt), chr(10)) AS text,
         |  CAST(len(g) AS BIGINT) AS n_blocks,
         |  CAST(len(list_filter(g, s -> s.keep)) AS BIGINT) AS n_kept
         |FROM scored""".stripMargin,

    // two arrival waves through the seen-file log: all five records
    "q331_warc_stream" ->
      """SELECT * FROM (VALUES
        |  ('seg-00000.warc', 'warcinfo', CAST(NULL AS VARCHAR)),
        |  ('seg-00000.warc', 'response', 'https://docs.example/page/1'),
        |  ('seg-00000.warc', 'response', 'https://docs.example/page/2'),
        |  ('seg-00001.warc.gz', 'response', 'https://docs.example/page/3'),
        |  ('seg-00001.warc.gz', 'response', 'https://docs.example/page/4'),
        |  ('seg-00001.warc.gz', 'response', 'https://docs.example/page/5'),
        |  ('seg-00002.warc', 'response', 'https://docs.example/page/6'),
        |  ('seg-00002.warc', 'response', 'https://docs.example/page/7'),
        |  ('seg-00002.warc', 'response', 'https://docs.example/page/8'),
        |  ('seg-00002.warc', 'response', 'https://docs.example/page/9')
        |) AS t(warc_name, record_type, target_uri)""".stripMargin,

    // host edges hand-derived from the pinned page-9 link set (pages
    // 1/3/5 emit only same-host links, which hostGraph drops): the
    // base-href redirects relative targets to base.example, the
    // protocol-relative target takes https, the absolute target keeps
    // its host; fragment-only and mailto hrefs never become edges
    "q337_warc_link_graph" ->
      """SELECT * FROM (VALUES
        |  ('docs.example', 'base.example'),
        |  ('docs.example', 'beta.example'),
        |  ('docs.example', 'gamma.example')
        |) AS t(src_host, dst_host)""".stripMargin,

    // the per-block audit unrolled positionally (0-based, matching
    // posexplode over the same filtered list)
    "q328_html_blocks" ->
      s"""$sqlHtmlScored
         |SELECT id, CAST(i - 1 AS BIGINT) AS block_idx,
         |  g[i].txt AS text, g[i].n_chars AS n_chars,
         |  g[i].n_words AS n_words,
         |  g[i].n_anchor_chars AS n_anchor_chars,
         |  g[i].link_ppm AS link_ppm, g[i].stop_ppm AS stop_ppm,
         |  g[i].keep AS keep
         |FROM scored, unnest(generate_series(1, len(g))) AS u(i)""".stripMargin,

    // bigrams as an unnested struct list (i -> (t[i], t[i+1])); counts,
    // context totals, ppm and rank mirror bigramTopK exactly
    "q182_bigram_lm" ->
      s"""WITH tok AS (
         |  SELECT $sqlToks AS t FROM documents
         |  WHERE len($sqlToks) >= 2
         |), bg AS (
         |  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
         |    i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS s
         |  FROM tok
         |), pairs AS (
         |  SELECT s.w1 AS w1, s.w2 AS w2 FROM bg
         |), c AS (
         |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY 1, 2
         |), x AS (
         |  SELECT w1, CAST(SUM(n) AS BIGINT) AS n_ctx FROM c GROUP BY 1
         |), ranked AS (
         |  SELECT c.w1, c.w2, c.n,
         |    CAST((1000000 * c.n) // x.n_ctx AS BIGINT) AS prob_ppm,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY c.w1
         |      ORDER BY c.n DESC, c.w2 ASC) AS INTEGER) AS rank
         |  FROM c JOIN x USING (w1)
         |)
         |SELECT w1, w2, n, prob_ppm, rank FROM ranked WHERE rank <= 3""".stripMargin,

    // same bigram CTEs; lift formed in the identical double order
    // (n12 * Nbg / n1 / n2) so round(..., 6) agrees bit-for-bit
    "q184_collocations" ->
      s"""WITH tok AS (
         |  SELECT $sqlToks AS t FROM documents
         |  WHERE len($sqlToks) >= 2
         |), bg AS (
         |  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
         |    i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS s
         |  FROM tok
         |), pairs AS (
         |  SELECT s.w1 AS w1, s.w2 AS w2 FROM bg
         |), c AS (
         |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n12 FROM pairs GROUP BY 1, 2
         |), l AS (
         |  SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM c GROUP BY 1
         |), r AS (
         |  SELECT w2, CAST(SUM(n12) AS BIGINT) AS n2 FROM c GROUP BY 1
         |), t2 AS (
         |  SELECT CAST(SUM(n12) AS BIGINT) AS nbg FROM c
         |)
         |SELECT c.w1, c.w2, c.n12,
         |  round(CAST(c.n12 AS DOUBLE) * t2.nbg / l.n1 / r.n2, 6) AS lift
         |FROM c JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN t2
         |WHERE c.n12 >= 3
         |ORDER BY lift DESC, c.w1 ASC, c.w2 ASC
         |LIMIT 20""".stripMargin,

    // DuckDB ROLLUP + GROUPING mirror (gid bit order matches Spark's
    // grouping_id: source is the high bit)
    "q196_rollup_report" ->
      """SELECT source, lang,
        |  CAST(GROUPING(source) * 2 + GROUPING(lang) AS INTEGER) AS gid,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(length(text)) AS BIGINT) AS n_chars
        |FROM documents
        |GROUP BY ROLLUP(source, lang)""".stripMargin,

    // conditional aggregation is the portable pivot twin
    "q197_lang_pivot" ->
      """SELECT source,
        |  CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
        |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
        |  CAST(SUM(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
        |  CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
        |  CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
        |FROM documents GROUP BY 1""".stripMargin,

    // unigram counts then Σn²/N/N in the identical double order
    "q188_lexical_diversity" ->
      s"""WITH w AS (
         |  SELECT source, unnest($sqlToks) AS tok FROM documents
         |), w2 AS (
         |  SELECT source, tok FROM w WHERE tok <> ''
         |), c AS (
         |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM w2 GROUP BY 1, 2
         |), m AS (
         |  SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens,
         |    CAST(COUNT(*) AS BIGINT) AS n_types,
         |    CAST(SUM(n * n) AS BIGINT) AS s2
         |  FROM c GROUP BY 1
         |)
         |SELECT source, n_tokens, n_types,
         |  round(CAST(s2 AS DOUBLE) / n_tokens / n_tokens, 6) AS simpson
         |FROM m""".stripMargin,

    // the (source, n_chars) domain table carries the window; docs re-join
    // by (source, value) — mirrors groupPercentileRank
    "q185_score_normalize" ->
      """WITH c AS (
        |  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2
        |), b AS (
        |  SELECT source, n_chars,
        |    COALESCE(CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY n_chars ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS below,
        |    CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM c
        |)
        |SELECT d.doc_id, d.source, d.n_chars,
        |  CAST(CASE WHEN b.n > 1 THEN (1000000 * b.below) // (b.n - 1)
        |    ELSE 0 END AS BIGINT) AS pct_ppm
        |FROM documents d JOIN b USING (source, n_chars)""".stripMargin,

    // Fractions are integer-scaled ppm BIGINTs — FP `round(x, 6)` half-way
    // behavior differs between engines; CAST(SUM(...)) because DuckDB
    // SUM(BIGINT) is HUGEINT whose client-side conversion is
    // version-sensitive (the round-2 driver-gate failure mode)
    "q66_repetition_filter" ->
      s"""WITH w AS (
         |  SELECT doc_id, unnest($sqlToks) AS tok FROM documents
         |), wc AS (
         |  SELECT doc_id, tok, COUNT(*) AS cnt FROM w GROUP BY 1, 2
         |), wd AS (
         |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         |         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         |         CAST(MAX(cnt) AS BIGINT) AS top_word
         |  FROM wc GROUP BY 1
         |), bgx AS (
         |  SELECT doc_id, unnest(${sqlShingles(2)}) AS bg FROM documents
         |), bc AS (
         |  SELECT doc_id, bg, COUNT(*) AS cnt FROM bgx GROUP BY 1, 2
         |), bd AS (
         |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
         |         CAST(MAX(cnt) AS BIGINT) AS top_bigram
         |  FROM bc GROUP BY 1
         |), f AS (
         |  SELECT wd.doc_id, wd.n_tokens,
         |    CAST(floor(1000000.0 * n_distinct / n_tokens) AS BIGINT)
         |      AS distinct_ppm,
         |    CAST(floor(1000000.0 * top_word / n_tokens) AS BIGINT)
         |      AS top_word_ppm,
         |    CAST(floor(1000000.0 * top_bigram / n_bigrams) AS BIGINT)
         |      AS top_bigram_ppm
         |  FROM wd LEFT JOIN bd ON wd.doc_id = bd.doc_id
         |)
         |SELECT doc_id, n_tokens, distinct_ppm, top_word_ppm,
         |  top_bigram_ppm,
         |  CAST(distinct_ppm >= 450000 AND top_word_ppm <= 120000
         |       AND coalesce(top_bigram_ppm <= 100000, FALSE) AS INTEGER)
         |    AS keep
         |FROM f""".stripMargin,

    "q67_pii_scrub" ->
      s"""WITH inj AS (
         |  SELECT doc_id, $sqlInjectedPii AS text FROM documents
         |)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', 0)) AS INTEGER)
         |    AS n_emails,
         |  CAST(len(regexp_extract_all(text,
         |    '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', 0)) AS INTEGER)
         |    AS n_ips,
         |  CAST(len(regexp_extract_all(text, '\\b[0-9]{9,}\\b', 0)) AS INTEGER)
         |    AS n_longnums,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |    '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g'),
         |    '\\b[0-9]{9,}\\b', '<NUM>', 'g')) AS scrub_hash
         |FROM inj""".stripMargin,

    "q68_decontamination" ->
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(${sqlShingles(3)}, s -> $sqlHash60))
         |      AS g
         |  FROM documents
         |), tr AS (
         |  SELECT doc_id, unnest(g) AS gram FROM sh WHERE doc_id % 50 <> 0
         |), b AS (
         |  SELECT DISTINCT unnest(g) AS gram FROM sh WHERE doc_id % 50 = 0
         |)
         |SELECT tr.doc_id, COUNT(*) AS n_shared
         |FROM tr JOIN b ON tr.gram = b.gram
         |GROUP BY 1""".stripMargin,

    "q108_dsir_weights" ->
      s"""WITH rawt AS (
         |  SELECT doc_id, unnest($sqlToks) AS s FROM documents
         |  WHERE doc_id % 10 <> 0
         |), tgtt AS (
         |  SELECT unnest($sqlToks) AS s FROM documents WHERE doc_id % 10 = 0
         |), rawb AS (
         |  SELECT $sqlHash60 % 64 AS b, COUNT(*) AS n FROM rawt GROUP BY 1
         |), tgtb AS (
         |  SELECT $sqlHash60 % 64 AS b, COUNT(*) AS n FROM tgtt GROUP BY 1
         |), bk AS (
         |  SELECT unnest(generate_series(0, 63)) AS b
         |), tab AS (
         |  SELECT bk.b, coalesce(rawb.n, 0) AS raw_n,
         |         coalesce(tgtb.n, 0) AS tgt_n
         |  FROM bk LEFT JOIN rawb ON bk.b = rawb.b
         |  LEFT JOIN tgtb ON bk.b = tgtb.b
         |), tot AS (
         |  SELECT CAST(SUM(raw_n) AS BIGINT) AS rt,
         |         CAST(SUM(tgt_n) AS BIGINT) AS tt FROM tab
         |), w AS (
         |  SELECT b,
         |    CAST(floor(1000000.0 * (CAST(tgt_n + 1 AS DOUBLE) * rt)
         |               / (CAST(raw_n + 1 AS DOUBLE) * tt)) AS BIGINT) AS w
         |  FROM tab, tot
         |), sc AS (
         |  SELECT doc_id, $sqlHash60 % 64 AS b FROM rawt
         |)
         |SELECT sc.doc_id, CAST(SUM(w.w) AS BIGINT) AS dsir_score,
         |  COUNT(*) AS n_tokens
         |FROM sc JOIN w USING (b) GROUP BY 1""".stripMargin,

    // q107 == q68 semantics by the no-false-negative argument: reuse the
    // exact oracle verbatim so the equivalence itself is driver-checked
    "q107_staged_decontaminate" ->
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(${sqlShingles(3)}, s -> $sqlHash60))
         |      AS g
         |  FROM documents
         |), tr AS (
         |  SELECT doc_id, unnest(g) AS gram FROM sh WHERE doc_id % 50 <> 0
         |), b AS (
         |  SELECT DISTINCT unnest(g) AS gram FROM sh WHERE doc_id % 50 = 0
         |)
         |SELECT tr.doc_id, COUNT(*) AS n_shared
         |FROM tr JOIN b ON tr.gram = b.gram
         |GROUP BY 1""".stripMargin,

    "q105_bloom_decontaminate" -> {
      // Kirsch–Mitzenmacher double hashing, mirroring bloomPositions:
      // pos_j = (h1 + j·h2) mod m, h2 = hash60b(h1, seed)
      s"""WITH sh0 AS (
         |  SELECT doc_id,
         |    unnest(list_distinct(list_transform(${sqlShingles(3)},
         |      s -> $sqlHash60))) AS gram
         |  FROM documents
         |), sh AS (
         |  SELECT doc_id, gram, ${sqlHash60b("gram", 11L)} AS g2 FROM sh0
         |), d(j) AS (VALUES (0), (1), (2)
         |), bbits AS (
         |  SELECT DISTINCT (gram % 4096 + j * (1 + g2 % 4095)) % 4096 AS pos
         |  FROM sh CROSS JOIN d WHERE doc_id % 50 = 0
         |), tpos AS (
         |  SELECT doc_id, gram, j,
         |    (gram % 4096 + j * (1 + g2 % 4095)) % 4096 AS pos
         |  FROM sh CROSS JOIN d WHERE doc_id % 50 <> 0
         |), hits AS (
         |  SELECT doc_id, gram, COUNT(bbits.pos) AS nb
         |  FROM tpos LEFT JOIN bbits ON tpos.pos = bbits.pos
         |  GROUP BY 1, 2
         |)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |  CAST(COUNT(CASE WHEN nb = 3 THEN 1 END) AS BIGINT) AS n_flagged,
         |  CAST(COUNT(CASE WHEN nb = 3 THEN 1 END) > 0 AS INTEGER)
         |    AS contaminated
         |FROM hits GROUP BY 1""".stripMargin
    },

    "q69_shard_shuffle" ->
      """SELECT doc_id,
        |  CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |    AS BIGINT) % 8 AS BIGINT) AS shard,
        |  CAST(ROW_NUMBER() OVER (
        |    PARTITION BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) % 8
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS INTEGER)
        |    AS pos
        |FROM documents""".stripMargin,

    "q70_domain_rebalance" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, ROW_NUMBER() OVER (
        |    PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk
        |  FROM documents) t
        |WHERE rk <= 15""".stripMargin,

    "q71_kmv_distinct" ->
      s"""WITH sh AS (
         |  SELECT source,
         |    unnest(list_distinct(list_transform(${sqlShingles(5)},
         |      s -> $sqlHash60))) AS h
         |  FROM documents
         |), d AS (
         |  SELECT DISTINCT source, h FROM sh
         |), r AS (
         |  SELECT source, h,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h ASC) AS rn
         |  FROM d
         |), m AS (
         |  SELECT source, COUNT(*) AS n_seen, MAX(h) AS kth
         |  FROM r WHERE rn <= 64 GROUP BY 1
         |)
         |SELECT source,
         |  CASE WHEN n_seen < 64 THEN n_seen
         |       ELSE CAST(floor(63 * 1152921504606846976.0 / kth) AS BIGINT)
         |  END AS est_distinct
         |FROM m""".stripMargin,

    "q72_length_stats" ->
      s"""WITH t AS (
         |  SELECT source, CAST(len($sqlToks) AS INTEGER) AS nt FROM documents
         |)
         |SELECT source, COUNT(*) AS n_docs,
         |  MIN(nt) AS min_tok, MAX(nt) AS max_tok,
         |  quantile_cont(nt, 0.25) AS p25,
         |  quantile_cont(nt, 0.5) AS p50,
         |  quantile_cont(nt, 0.75) AS p75
         |FROM t GROUP BY 1""".stripMargin,

    // The running sum is CAST to BIGINT (DuckDB window SUM(BIGINT) is
    // HUGEINT — client-conversion is version-sensitive), and floor
    // division is spelled floor(x / k.0) instead of `//` so no
    // version-specific integer-division operator is relied on. st >= 0 and
    // bounded by corpus tokens, so the double quotient is exact-safe.
    "q81_sequence_packing" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len($sqlToks) AS BIGINT) AS n_tokens,
         |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
         |      AS BIGINT) % 8 AS shard,
         |    md5(CAST(doc_id AS VARCHAR)) AS ord
         |  FROM documents
         |), r AS (
         |  SELECT doc_id, shard, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY shard
         |      ORDER BY ord ASC, doc_id ASC
         |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS st
         |  FROM t
         |)
         |SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
         |  CAST(floor(st / 128.0) AS BIGINT) AS seq_id,
         |  CAST(st % 128 AS BIGINT) AS seq_offset
         |FROM r""".stripMargin,

    "q73_hashing_tf" -> {
      val sums = (0 until 16)
        .map(i => s"COUNT(CASE WHEN b = $i THEN 1 END)").mkString(", ")
      s"""WITH w AS (
         |  SELECT doc_id, unnest($sqlToks) AS s FROM documents
         |), h AS (
         |  SELECT doc_id, $sqlHash60 % 16 AS b FROM w
         |)
         |SELECT doc_id, array_to_string([$sums], ',') AS tf_vec
         |FROM h GROUP BY 1""".stripMargin
    },

    "q82_dup_spans" ->
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(${sqlShingles(5)}, s -> $sqlHash60))
         |      AS g
         |  FROM documents
         |), e AS (
         |  SELECT doc_id, unnest(g) AS gram FROM sh
         |), d AS (
         |  SELECT gram, COUNT(*) AS df FROM e GROUP BY 1
         |), pd AS (
         |  SELECT e.doc_id, COUNT(*) AS n,
         |    COUNT(CASE WHEN d.df >= 2 THEN 1 END) AS nd
         |  FROM e JOIN d USING (gram) GROUP BY 1
         |)
         |SELECT doc.doc_id,
         |  coalesce(n, 0) AS n_grams,
         |  coalesce(nd, 0) AS n_dup_grams,
         |  CASE WHEN n IS NULL THEN NULL
         |       ELSE round(CAST(nd AS DOUBLE) / n, 6) END AS dup_frac
         |FROM documents doc LEFT JOIN pd ON doc.doc_id = pd.doc_id""".stripMargin,

    "q84_classifier_score" ->
      s"""WITH w AS (
         |  SELECT doc_id, unnest($sqlToks) AS s FROM documents
         |), h AS (
         |  SELECT doc_id, $sqlHash60 % 16 AS b FROM w
         |), sc AS (
         |  SELECT doc_id,
         |    CAST(SUM(CAST(concat('0x', substr(md5('w' || CAST(b AS VARCHAR)), 1, 15))
         |      AS BIGINT) % 21 - 10) AS BIGINT) AS score
         |  FROM h GROUP BY 1
         |)
         |SELECT doc_id, score, CAST(score >= 0 AS INTEGER) AS keep
         |FROM sc""".stripMargin,

    "q86_countmin_freq" -> {
      // the same seeded double-hash bucket family the Spark side uses
      s"""WITH toks AS (
         |  SELECT source, unnest($sqlToks) AS s FROM documents
         |), h AS (
         |  SELECT source, s, hx, ${sqlHash60b("hx", 7L)} AS hy FROM (
         |    SELECT source, s, $sqlHash60 AS hx FROM toks)
         |), d(j) AS (VALUES (0), (1), (2), (3)
         |), b AS (
         |  SELECT source, j, (hx % 16 + j * (1 + hy % 15)) % 16 AS bk
         |  FROM h CROSS JOIN d
         |), cnts AS (
         |  SELECT source, j, bk, COUNT(*) AS c FROM b GROUP BY 1, 2, 3
         |), probes AS (
         |  SELECT DISTINCT s, hx, hy FROM h
         |), pb AS (
         |  SELECT s, j, (hx % 16 + j * (1 + hy % 15)) % 16 AS bk
         |  FROM probes CROSS JOIN d
         |), srcs AS (
         |  SELECT DISTINCT source FROM documents
         |), est AS (
         |  SELECT srcs.source, pb.s, MIN(coalesce(c.c, 0)) AS est_count
         |  FROM srcs CROSS JOIN pb
         |  LEFT JOIN cnts c
         |    ON c.source = srcs.source AND c.j = pb.j AND c.bk = pb.bk
         |  GROUP BY 1, 2
         |), exact AS (
         |  SELECT source, s, COUNT(*) AS n FROM toks GROUP BY 1, 2
         |)
         |SELECT est.source, est.s AS tok,
         |  CAST(est.est_count AS BIGINT) AS est_count,
         |  coalesce(CAST(exact.n AS BIGINT), 0) AS n_exact
         |FROM est LEFT JOIN exact
         |  ON est.source = exact.source AND est.s = exact.s""".stripMargin
    },

    "q171_cms_topk" -> {
      s"""WITH toks AS (
         |  SELECT source, unnest($sqlToks) AS s FROM documents
         |), h AS (
         |  SELECT source, s, hx, ${sqlHash60b("hx", 7L)} AS hy FROM (
         |    SELECT source, s, $sqlHash60 AS hx FROM toks)
         |), d(j) AS (VALUES (0), (1), (2), (3)
         |), b AS (
         |  SELECT source, j, (hx % 16 + j * (1 + hy % 15)) % 16 AS bk
         |  FROM h CROSS JOIN d
         |), cnts AS (
         |  SELECT source, j, bk, COUNT(*) AS c FROM b GROUP BY 1, 2, 3
         |), probes AS (
         |  SELECT DISTINCT s, hx, hy FROM h
         |), pb AS (
         |  SELECT s, j, (hx % 16 + j * (1 + hy % 15)) % 16 AS bk
         |  FROM probes CROSS JOIN d
         |), srcs AS (
         |  SELECT DISTINCT source FROM documents
         |), est AS (
         |  SELECT srcs.source, pb.s, MIN(coalesce(c.c, 0)) AS est_count
         |  FROM srcs CROSS JOIN pb
         |  LEFT JOIN cnts c
         |    ON c.source = srcs.source AND c.j = pb.j AND c.bk = pb.bk
         |  GROUP BY 1, 2
         |), own AS (
         |  SELECT est.source, est.s AS tok,
         |    CAST(est.est_count AS BIGINT) AS est_count
         |  FROM est
         |  WHERE EXISTS (SELECT 1 FROM toks t
         |    WHERE t.source = est.source AND t.s = est.s)
         |), r AS (
         |  SELECT source, tok, est_count,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY est_count DESC, tok ASC) AS rn
         |  FROM own
         |)
         |SELECT source, tok, est_count FROM r WHERE rn <= 3""".stripMargin
    },

    "q87_apply_mixture" ->
      """WITH c AS (
        |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1
        |), s AS (
        |  SELECT source,
        |    CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT) AS sc
        |  FROM c
        |), t AS (
        |  SELECT CAST(SUM(sc) AS BIGINT) AS tot FROM s
        |), tg AS (
        |  SELECT source,
        |    CAST(floor(round(CAST(sc AS DOUBLE) / tot, 6) * 200) AS INTEGER)
        |      AS n_target
        |  FROM s, t
        |)
        |SELECT doc_id, source FROM (
        |  SELECT d.doc_id, d.source, tg.n_target, ROW_NUMBER() OVER (
        |    PARTITION BY d.source
        |    ORDER BY md5(CAST(d.doc_id AS VARCHAR)) ASC, d.doc_id ASC) AS rk
        |  FROM documents d JOIN tg USING (source)) x
        |WHERE rk <= n_target""".stripMargin,

    "q88_surprisal_score" ->
      s"""$sqlSurprisalCtes
         |SELECT doc_id, surprisal, n_tokens FROM s88""".stripMargin,

    // the q88 chain + per-token score + the lang join + the
    // domain-table tertile (tie groups bucket by where they START in
    // the cumulative, exactly quantileBuckets' integer rule)
    "q345_ccnet_buckets" ->
      s"""$sqlSurprisalCtes, sc AS (
         |  SELECT s88.doc_id, d.lang, s88.surprisal // s88.n_tokens AS score
         |  FROM s88 JOIN documents d USING (doc_id)
         |), dom AS (
         |  SELECT lang, score,
         |    coalesce(SUM(c) OVER (PARTITION BY lang ORDER BY score ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS below,
         |    SUM(c) OVER (PARTITION BY lang) AS n
         |  FROM (SELECT lang, score, COUNT(*) AS c FROM sc GROUP BY 1, 2)
         |)
         |SELECT sc.doc_id, sc.lang, sc.score,
         |  CAST(LEAST(2, (3 * dom.below) // dom.n) AS BIGINT) AS bucket
         |FROM sc JOIN dom USING (lang, score)""".stripMargin,

    "q92_source_overlap" ->
      s"""WITH sh AS (
         |  SELECT source,
         |    unnest(list_distinct(list_transform(${sqlShingles(5)},
         |      s -> $sqlHash60))) AS gram
         |  FROM documents
         |), g AS (
         |  SELECT DISTINCT source, gram FROM sh
         |)
         |SELECT a.source AS source_1, b.source AS source_2,
         |  COUNT(*) AS n_shared_grams
         |FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
         |GROUP BY 1, 2""".stripMargin,

    "q99_corpus_assembly" -> {
      val toksN = "regexp_split_to_array(trim(norm), '\\s+')"
      val grams3N =
        s"""list_distinct(list_transform(
           |    list_transform(generate_series(1, greatest(len($toksN) - 2, 0)),
           |      i -> array_to_string(($toksN)[i:i+2], ' ')),
           |    s -> CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)))"""
          .stripMargin
      s"""WITH n AS (
         |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
         |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
         |  FROM documents
         |), c AS (
         |  SELECT norm, MIN(doc_id) AS doc_id FROM n GROUP BY 1
         |), g AS (
         |  SELECT doc_id, norm, CAST(len($toksN) AS BIGINT) AS n_tokens
         |  FROM c WHERE len($toksN) >= 5
         |), bg AS (
         |  SELECT DISTINCT unnest($grams3N) AS gram
         |  FROM n WHERE doc_id % 50 = 0
         |), tg AS (
         |  SELECT doc_id, unnest($grams3N) AS gram FROM g
         |), cont AS (
         |  SELECT DISTINCT tg.doc_id FROM tg JOIN bg USING (gram)
         |), clean AS (
         |  SELECT * FROM g WHERE doc_id NOT IN (SELECT doc_id FROM cont)
         |), r AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
         |      AS BIGINT) % 4 AS shard,
         |    md5(CAST(doc_id AS VARCHAR)) AS ord
         |  FROM clean
         |), p AS (
         |  SELECT doc_id, shard, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY ord ASC, doc_id ASC
         |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS st
         |  FROM r
         |)
         |SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
         |  CAST(floor(st / 64.0) AS BIGINT) AS seq_id,
         |  CAST(st % 64 AS BIGINT) AS seq_offset
         |FROM p""".stripMargin
    },

    // q74's floor(sqrt·1e6) integer weights; one double division
    "q236_mixture_ess" ->
      """WITH sc AS (
        |  SELECT source, CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1e6)
        |    AS BIGINT) AS s
        |  FROM documents GROUP BY 1
        |), m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_domains,
        |    CAST(SUM(s) AS BIGINT) AS ss,
        |    CAST(SUM(s * s) AS BIGINT) AS ss2
        |  FROM sc
        |)
        |SELECT n_domains, round(CAST(ss * ss AS DOUBLE) / ss2, 6) AS ess
        |FROM m""".stripMargin,

    // tf per (source, token), corpus totals, ppm share, top-5 per source
    "q215_distinctive_terms" ->
      s"""WITH tf AS (
         |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM (
         |    SELECT source, unnest($sqlToks) AS tok FROM documents)
         |  GROUP BY 1, 2
         |), tot AS (
         |  SELECT tok, CAST(SUM(tf) AS BIGINT) AS tf_total FROM tf GROUP BY 1
         |), scored AS (
         |  SELECT tf.source, tf.tok, tf.tf,
         |    CAST((1000000 * tf.tf) // tot.tf_total AS BIGINT) AS share_ppm
         |  FROM tf JOIN tot USING (tok) WHERE tf.tf >= 5
         |), ranked AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source
         |    ORDER BY share_ppm DESC, tf DESC, tok ASC) AS INTEGER) AS rank
         |  FROM scored
         |)
         |SELECT source, tok, tf, share_ppm, rank
         |FROM ranked WHERE rank <= 5""".stripMargin,

    // q23's token twins aggregated per language; integer-ppm fertility
    "q212_tokenizer_fertility" ->
      s"""WITH f AS (
         |  SELECT lang, CAST(len($sqlToks) AS BIGINT) AS ws,
         |    CAST(len(regexp_extract_all(text,
         |      '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]', 0)) AS BIGINT) AS bpe
         |  FROM documents
         |)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(ws) AS BIGINT) AS ws_tokens,
         |  CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
         |  CAST((1000000 * CAST(SUM(bpe) AS BIGINT))
         |    // CAST(SUM(ws) AS BIGINT) AS BIGINT) AS fertility_ppm
         |FROM f GROUP BY 1""".stripMargin,

    // identical moments, identical formula text (sqlPearson)
    "q213_quality_corr" ->
      s"""WITH d AS (
         |  SELECT source, CAST(length(text) AS BIGINT) AS x,
         |    CAST(len($sqlToks) AS BIGINT) AS y
         |  FROM documents
         |), m AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * y) AS BIGINT) AS sxy,
         |    CAST(SUM(x * x) AS BIGINT) AS sxx,
         |    CAST(SUM(y * y) AS BIGINT) AS syy
         |  FROM d GROUP BY 1
         |)
         |SELECT source, n,
         |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
         |    ELSE $sqlPearson END AS pearson
         |FROM m""".stripMargin,

    // top-50 vocab by (count desc, token asc), distinct (doc, tok), pair
    // self-join, support gate, deterministic top-20
    "q203_cooccurrence" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($sqlToks) AS tok FROM documents
         |), v AS (
         |  SELECT tok FROM (
         |    SELECT tok, COUNT(*) AS n FROM toks GROUP BY 1
         |    ORDER BY n DESC, tok ASC LIMIT 50)
         |), kept AS (
         |  SELECT DISTINCT doc_id, tok FROM toks JOIN v USING (tok)
         |), p AS (
         |  SELECT a.tok AS t1, b.tok AS t2
         |  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.tok < b.tok
         |)
         |SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM p GROUP BY 1, 2
         |HAVING COUNT(*) >= 5
         |ORDER BY n_docs DESC, t1 ASC, t2 ASC
         |LIMIT 20""".stripMargin,

    // q99's CTE chain, finishing in scalar stage counts
    "q200_pipeline_attrition" -> {
      val toksN = "regexp_split_to_array(trim(norm), '\\s+')"
      val grams3N =
        s"""list_distinct(list_transform(
           |    list_transform(generate_series(1, greatest(len($toksN) - 2, 0)),
           |      i -> array_to_string(($toksN)[i:i+2], ' ')),
           |    s -> CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)))"""
          .stripMargin
      s"""WITH n AS (
         |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),
         |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
         |  FROM documents
         |), c AS (
         |  SELECT norm, MIN(doc_id) AS doc_id FROM n GROUP BY 1
         |), g AS (
         |  SELECT doc_id, norm, CAST(len($toksN) AS BIGINT) AS n_tokens
         |  FROM c WHERE len($toksN) >= 5
         |), bg AS (
         |  SELECT DISTINCT unnest($grams3N) AS gram
         |  FROM n WHERE doc_id % 50 = 0
         |), tg AS (
         |  SELECT doc_id, unnest($grams3N) AS gram FROM g
         |), cont AS (
         |  SELECT DISTINCT tg.doc_id FROM tg JOIN bg USING (gram)
         |), clean AS (
         |  SELECT * FROM g WHERE doc_id NOT IN (SELECT doc_id FROM cont)
         |), r AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
         |      AS BIGINT) % 4 AS shard,
         |    md5(CAST(doc_id AS VARCHAR)) AS ord
         |  FROM clean
         |), p AS (
         |  SELECT doc_id, shard, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY ord ASC, doc_id ASC
         |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS st
         |  FROM r
         |), seqs AS (
         |  SELECT DISTINCT shard, CAST(floor(st / 64.0) AS BIGINT) AS seq_id
         |  FROM p
         |)
         |SELECT
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_raw,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_unique_norm,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM g) AS n_len_gated,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cont) AS n_contaminated,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM clean) AS n_clean,
         |  (SELECT CAST(SUM(n_tokens) AS BIGINT) FROM clean) AS n_tokens_clean,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM seqs) AS n_sequences""".stripMargin
    },

    "q98_robust_outliers" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, CAST(len($sqlToks) AS INTEGER) AS n_tokens
         |  FROM documents
         |), m AS (
         |  SELECT source, quantile_cont(n_tokens, 0.5) AS med
         |  FROM t GROUP BY 1
         |), d AS (
         |  SELECT t.doc_id, t.source, t.n_tokens, m.med,
         |    abs(n_tokens - med) AS adev
         |  FROM t JOIN m USING (source)
         |), md AS (
         |  SELECT source, quantile_cont(adev, 0.5) AS mad FROM d GROUP BY 1
         |)
         |SELECT doc_id, d.source, n_tokens, med, mad
         |FROM d JOIN md USING (source)
         |WHERE adev > 3 * mad""".stripMargin,

    "q89_quality_windows" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, CAST(len($sqlToks) AS INTEGER) AS n_tokens
         |  FROM documents
         |)
         |SELECT doc_id, source, n_tokens,
         |  round(percent_rank() OVER (PARTITION BY source
         |    ORDER BY n_tokens ASC, doc_id ASC), 6) AS pr,
         |  CAST(SUM(n_tokens) OVER (PARTITION BY source
         |    ORDER BY n_tokens ASC, doc_id ASC
         |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail_sum
         |FROM t""".stripMargin,

    "q74_domain_temperature" ->
      """WITH c AS (
        |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1
        |), s AS (
        |  SELECT source, n_docs,
        |    CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT) AS sc
        |  FROM c
        |), t AS (
        |  SELECT CAST(SUM(sc) AS BIGINT) AS tot FROM s
        |)
        |SELECT source, n_docs,
        |  round(CAST(sc AS DOUBLE) / tot, 6) AS weight
        |FROM s, t""".stripMargin,

    // unit = 8-token block; the oracle counts by unit TEXT where the Spark
    // side counts by the unit's 60-bit md5 prefix — equal absent a 60-bit
    // collision (the standing q21 hash-identity assumption)
    "q157_unit_dedup" ->
      s"""WITH d AS (
         |  SELECT doc_id, $sqlToks AS tk FROM documents
         |), b AS (
         |  SELECT doc_id, tk,
         |    unnest(generate_series(
         |      0, CAST(floor((len(tk) - 1) / 8.0) AS BIGINT))) AS pos
         |  FROM d WHERE len(tk) > 0
         |), u AS (
         |  SELECT doc_id, pos,
         |    array_to_string(tk[pos * 8 + 1 : pos * 8 + 8], ' ') AS unit
         |  FROM b
         |), c AS (
         |  SELECT unit, TRUE AS f FROM u GROUP BY unit HAVING COUNT(*) > 1
         |)
         |SELECT u.doc_id,
         |  CAST(SUM(CASE WHEN c.f THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |  COALESCE(string_agg(CASE WHEN c.f IS NULL THEN u.unit END,
         |    ' ' ORDER BY u.pos), '') AS text_clean
         |FROM u LEFT JOIN c ON u.unit = c.unit
         |GROUP BY u.doc_id""".stripMargin,

    // computed twin over the same carried-in rows: the identical
    // mark-then-split (RE2 regexp_replace with the g flag — DuckDB
    // replaces first-only by default) reproduces the boundary rule
    // byte-for-byte
    "q315_sentence_units" ->
      """WITH t(doc_id, text) AS (VALUES
        |  (CAST(1 AS BIGINT), 'Hello world. This is graft. It works!'),
        |  (2, 'Pi is 3.14 not 3. 15 ok'),
        |  (3, 'e.g. lowercase follows. But Uppercase splits.'),
        |  (4, 'Dr. Smith went home. He slept?! Deeply so.'),
        |  (5, 'No terminator at all'),
        |  (6, ''),
        |  (7, 'Multi   spaces. Next one.')
        |), s AS (
        |  SELECT doc_id,
        |    list_filter(list_transform(
        |      string_split(regexp_replace(text, '([.!?])\s+([A-Z])',
        |        '\1' || chr(1) || '\2', 'g'), chr(1)), x -> trim(x)),
        |      x -> len(x) > 0) AS arr
        |  FROM t
        |), e AS (
        |  SELECT doc_id, arr,
        |    unnest(generate_series(1, len(arr))) AS i
        |  FROM s
        |)
        |SELECT doc_id, CAST(i - 1 AS INTEGER) AS sent_idx,
        |  arr[i] AS sentence,
        |  CAST(len(string_split_regex(arr[i], '\s+')) AS BIGINT)
        |    AS n_words
        |FROM e""".stripMargin,

    // hand-computed water-fill: round 1 caps books (300000->200000) and
    // code (150000->100000); round 2 splits the remaining 700000 over
    // web:wiki = 500000:50000 -> 636363/63636 (floors)
    "q326_epoch_allocation" ->
      """SELECT * FROM (VALUES
        |  ('web', CAST(600000 AS BIGINT), CAST(500000 AS BIGINT),
        |   CAST(636363 AS BIGINT), CAST(1060605 AS BIGINT), false),
        |  ('books', 100000, 300000, 200000, 2000000, true),
        |  ('code', 50000, 150000, 100000, 2000000, true),
        |  ('wiki', 200000, 50000, 63636, 318180, false)
        |) AS t(source, n_tokens, weight_ppm, alloc_tokens, epochs_ppm,
        |       capped)""".stripMargin,

    // the same order-invariant fold: per-doc md5(md5(id)||':'||md5(text))
    // (fixed-width inner digests: no id/text boundary ambiguity), shard
    // digest = md5 of the digests concatenated in lexicographic order
    "q324_corpus_manifest" ->
      """WITH d AS (
        |  SELECT doc_id % 4 AS shard,
        |    md5(md5(CAST(doc_id AS VARCHAR)) || ':'
        |        || COALESCE(md5(text), 'null')) AS dg,
        |    len(text) AS l
        |  FROM documents
        |)
        |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(l) AS BIGINT) AS sum_chars,
        |  md5(string_agg(dg, '' ORDER BY dg)) AS shard_digest
        |FROM d GROUP BY shard""".stripMargin,

    "q325_corpus_root_digest" ->
      """WITH d AS (
        |  SELECT doc_id % 4 AS shard,
        |    md5(md5(CAST(doc_id AS VARCHAR)) || ':'
        |        || COALESCE(md5(text), 'null')) AS dg
        |  FROM documents
        |), m AS (
        |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    md5(string_agg(dg, '' ORDER BY dg)) AS shard_digest
        |  FROM d GROUP BY shard
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
        |  CAST(SUM(n_docs) AS BIGINT) AS n_docs,
        |  md5(string_agg(shard_digest, '' ORDER BY shard_digest))
        |    AS root_digest
        |FROM m""".stripMargin,

    // the identical doc-level dice and token slices replayed: a =
    // h(id:a) % (n+1), b = a + h(id:b) % (n-a+1); empty segments drop
    // before joining exactly as the Spark filter does
    "q323_fim_transform" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, tk, len(tk) AS n,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':fim'), 1, 15)) AS BIGINT) % 1000000 < 500000 AS is_fim,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':spm'), 1, 15)) AS BIGINT) % 1000000 < 500000 AS is_spm,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':a'), 1, 15)) AS BIGINT) AS ha,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':b'), 1, 15)) AS BIGINT) AS hb
        |  FROM d
        |), s AS (
        |  SELECT doc_id, tk, n, is_fim, is_spm,
        |    ha % (n + 1) AS a,
        |    ha % (n + 1) + hb % (n - ha % (n + 1) + 1) AS b
        |  FROM h
        |), p AS (
        |  SELECT doc_id, is_fim, is_spm, a, b, n,
        |    array_to_string(tk[1:a], ' ') AS pre,
        |    array_to_string(tk[a+1:b], ' ') AS mid,
        |    array_to_string(tk[b+1:n], ' ') AS suf,
        |    array_to_string(tk, ' ') AS plain
        |  FROM s
        |)
        |SELECT doc_id AS id,
        |  CASE WHEN NOT is_fim THEN 'plain'
        |       WHEN is_spm THEN 'spm' ELSE 'psm' END AS mode,
        |  CASE WHEN NOT is_fim THEN plain
        |       WHEN is_spm THEN array_to_string(list_filter(
        |         ['<fim_suffix>', suf, '<fim_prefix>', pre,
        |          '<fim_middle>', mid], x -> x <> ''), ' ')
        |       ELSE array_to_string(list_filter(
        |         ['<fim_prefix>', pre, '<fim_suffix>', suf,
        |          '<fim_middle>', mid], x -> x <> ''), ' ') END AS text_out,
        |  CAST(CASE WHEN is_fim THEN a ELSE 0 END AS BIGINT) AS n_prefix,
        |  CAST(CASE WHEN is_fim THEN b - a ELSE 0 END AS BIGINT) AS n_middle,
        |  CAST(CASE WHEN is_fim THEN n - b ELSE 0 END AS BIGINT) AS n_suffix
        |FROM p""".stripMargin,

    // the identical md5-prefix dice replayed: start iff
    // h(id:pos) % 1e6 < 150000/3, len = 1 + (h//1e6) % 5; string_agg
    // skips the NULL pieces exactly as the Spark filter does
    "q321_span_corruption" ->
      s"""WITH tt AS (
         |  SELECT doc_id, $sqlToks AS tk FROM documents
         |), t1 AS (
         |  SELECT doc_id, unnest(generate_series(1, len(tk))) AS i, tk
         |  FROM tt
         |), tok AS (
         |  SELECT doc_id, i - 1 AS pos, tk[i] AS tok,
         |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':'
         |      || CAST(i - 1 AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
         |  FROM t1
         |), starts AS (
         |  SELECT doc_id, pos AS s, (hv // 1000000) % 5 AS ext
         |  FROM tok WHERE hv % 1000000 < 50000
         |), covered AS (
         |  SELECT DISTINCT doc_id, s + u AS pos
         |  FROM starts, unnest(generate_series(0, ext)) AS g(u)
         |), m0 AS (
         |  SELECT tok.doc_id, tok.pos, tok.tok,
         |    covered.pos IS NOT NULL AS m
         |  FROM tok LEFT JOIN covered
         |    ON tok.doc_id = covered.doc_id AND tok.pos = covered.pos
         |), m1 AS (
         |  SELECT *, m AND NOT coalesce(
         |    lag(m) OVER (PARTITION BY doc_id ORDER BY pos), false)
         |    AS run_start
         |  FROM m0
         |), m2 AS (
         |  SELECT *, CAST(SUM(CASE WHEN run_start THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS INTEGER)
         |    AS run_idx
         |  FROM m1
         |)
         |SELECT doc_id AS id,
         |  COALESCE(string_agg(CASE WHEN NOT m THEN tok
         |    WHEN run_start THEN '<extra_id_' || run_idx || '>' END,
         |    ' ' ORDER BY pos), '') AS input_text,
         |  COALESCE(string_agg(CASE WHEN run_start
         |      THEN '<extra_id_' || run_idx || '> ' || tok
         |    WHEN m THEN tok END, ' ' ORDER BY pos), '') AS target_text,
         |  CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
         |  CAST(SUM(CASE WHEN run_start THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_spans
         |FROM m2 GROUP BY doc_id""".stripMargin,

    // hand-pinned: 'Subscribe to our newsletter.' occurs twice corpus-
    // wide (> maxOcc 1) and is deleted from both carriers
    "q316_sentence_unit_dedup" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(1 AS BIGINT),
        |   'Real content here. More real text!'),
        |  (2, 1, 'Different content. Unique ending?'),
        |  (3, 0, 'Totally original thoughts. Nothing shared here!')
        |) AS t(doc_id, n_removed, text_clean)""".stripMargin,

    "q158_bpe_pairs" ->
      s"""WITH w AS (
         |  SELECT unnest($sqlToks) AS word FROM documents
         |), wc AS (
         |  SELECT word, COUNT(*) AS n FROM w
         |  WHERE length(word) > 0 GROUP BY 1
         |), e AS (
         |  SELECT word, n,
         |    unnest(generate_series(1, length(word) - 1)) AS i
         |  FROM wc WHERE length(word) >= 2
         |)
         |SELECT substr(word, i, 1) AS "left",
         |  substr(word, i + 1, 1) AS "right",
         |  CAST(SUM(n) AS BIGINT) AS pair_n
         |FROM e GROUP BY 1, 2
         |ORDER BY pair_n DESC, "left" ASC, "right" ASC
         |LIMIT 20""".stripMargin,

    "q163_snapshot_diff" ->
      """WITH prev AS (
        |  SELECT CASE WHEN doc_id % 13 = 0 AND doc_id % 7 <> 0
        |              THEN doc_id + 100000 ELSE doc_id END AS pid,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' OLD' ELSE text END
        |      AS ptext
        |  FROM documents WHERE doc_id % 11 <> 3
        |  UNION ALL
        |  SELECT doc_id + 200000, 'tombstone ' || CAST(doc_id AS VARCHAR)
        |  FROM documents WHERE doc_id % 17 = 0
        |), p AS (
        |  SELECT pid AS id, md5(ptext) AS oh FROM prev
        |), c AS (
        |  SELECT doc_id AS id, md5(text) AS nh FROM documents
        |), j AS (
        |  SELECT COALESCE(p.id, c.id) AS id, oh, nh
        |  FROM p FULL JOIN c ON p.id = c.id
        |), gone AS (
        |  SELECT id AS old_id, oh AS h,
        |    ROW_NUMBER() OVER (PARTITION BY oh ORDER BY id) AS rn
        |  FROM j WHERE nh IS NULL
        |), nw AS (
        |  SELECT id AS new_id, nh AS h,
        |    ROW_NUMBER() OVER (PARTITION BY nh ORDER BY id) AS rn
        |  FROM j WHERE oh IS NULL
        |)
        |SELECT id AS old_id, id AS new_id, 'unchanged' AS status
        |FROM j WHERE oh = nh
        |UNION ALL
        |SELECT id, id, 'changed' FROM j
        |WHERE oh IS NOT NULL AND nh IS NOT NULL AND oh <> nh
        |UNION ALL
        |SELECT old_id, new_id, 'moved' FROM gone JOIN nw USING (h, rn)
        |UNION ALL
        |SELECT old_id, CAST(-1 AS BIGINT), 'removed' FROM gone
        |WHERE NOT EXISTS (SELECT 1 FROM nw
        |  WHERE nw.h = gone.h AND nw.rn = gone.rn)
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT), new_id, 'added' FROM nw
        |WHERE NOT EXISTS (SELECT 1 FROM gone
        |  WHERE gone.h = nw.h AND gone.rn = nw.rn)""".stripMargin,

    "q164_threshold_sweep" ->
      s"""WITH w AS (
         |  SELECT doc_id, unnest($sqlToks) AS s FROM documents
         |), h AS (
         |  SELECT doc_id, $sqlHash60 % 16 AS b FROM w
         |), sc AS (
         |  SELECT doc_id,
         |    CAST(SUM(CAST(concat('0x',
         |      substr(md5('w' || CAST(b AS VARCHAR)), 1, 15))
         |      AS BIGINT) % 21 - 10) AS BIGINT) AS score
         |  FROM h GROUP BY 1
         |), lab AS (
         |  SELECT sc.doc_id, score, (lang = 'en') AS rel
         |  FROM sc JOIN documents USING (doc_id)
         |), th AS (
         |  SELECT CAST(t AS BIGINT) AS threshold FROM (VALUES (-160),
         |    (-140), (-120), (-100), (-80), (-60), (-40), (-20), (0),
         |    (20)) v(t)
         |), agg AS (
         |  SELECT threshold,
         |    CAST(SUM(CASE WHEN score >= threshold AND rel
         |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(SUM(CASE WHEN score >= threshold AND NOT rel
         |      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(SUM(CASE WHEN score < threshold AND rel
         |      THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |    CAST(SUM(CASE WHEN score < threshold AND NOT rel
         |      THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM lab CROSS JOIN th GROUP BY 1
         |)
         |SELECT threshold, tp, fp, fn, tn,
         |  CASE WHEN tp + fp = 0 THEN NULL
         |       ELSE (1000000 * tp) // (tp + fp) END AS precision_ppm,
         |  CASE WHEN tp + fn = 0 THEN NULL
         |       ELSE (1000000 * tp) // (tp + fn) END AS recall_ppm
         |FROM agg""".stripMargin,

    "q160_span_removal" ->
      s"""WITH d AS (
         |  SELECT doc_id, $sqlToks AS tk FROM documents
         |), sh AS (
         |  SELECT doc_id, tk,
         |    unnest(generate_series(1, len(tk) - 4)) AS i
         |  FROM d WHERE len(tk) >= 5
         |), g AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    array_to_string(tk[i : i + 4], ' ') AS gram
         |  FROM sh
         |), fl AS (
         |  SELECT gram FROM (
         |    SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY 1
         |  ) WHERE df >= 2
         |), cov0 AS (
         |  SELECT doc_id, pos + unnest(generate_series(0, 4)) AS cv
         |  FROM g WHERE gram IN (SELECT gram FROM fl)
         |), cov AS (
         |  SELECT DISTINCT doc_id, cv FROM cov0
         |), t AS (
         |  SELECT doc_id, unnest(tk) AS tok,
         |    unnest(generate_series(0, len(tk) - 1)) AS tpos
         |  FROM d
         |), a AS (
         |  SELECT t.doc_id, t.tpos, t.tok,
         |    (cov.cv IS NOT NULL) AS rm
         |  FROM t LEFT JOIN cov
         |    ON t.doc_id = cov.doc_id AND t.tpos = cov.cv
         |)
         |SELECT doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |  COALESCE(string_agg(CASE WHEN NOT rm THEN tok END,
         |    ' ' ORDER BY tpos), '') AS text_clean
         |FROM a GROUP BY 1""".stripMargin,

    "q177_mixture_fit" ->
      s"""WITH m AS (
         |  SELECT source, CAST(SUM(len($sqlToks)) AS BIGINT) AS tok
         |  FROM documents GROUP BY 1 HAVING SUM(len($sqlToks)) > 0
         |), g AS (
         |  SELECT source, tok, 0 AS tau_idx,
         |    CAST(floor(1.0 * 1000000.0) AS BIGINT) AS w_int FROM m
         |  UNION ALL
         |  SELECT source, tok, 1,
         |    CAST(floor(sqrt(sqrt(CAST(tok AS DOUBLE))) * 1000000.0)
         |      AS BIGINT) FROM m
         |  UNION ALL
         |  SELECT source, tok, 2,
         |    CAST(floor(sqrt(CAST(tok AS DOUBLE)) * 1000000.0) AS BIGINT)
         |  FROM m
         |  UNION ALL
         |  SELECT source, tok, 3,
         |    CAST(floor(sqrt(CAST(tok AS DOUBLE))
         |      * sqrt(sqrt(CAST(tok AS DOUBLE))) * 1000000.0) AS BIGINT)
         |  FROM m
         |  UNION ALL
         |  SELECT source, tok, 4,
         |    CAST(floor(CAST(tok AS DOUBLE) * 1000000.0) AS BIGINT) FROM m
         |), t AS (
         |  SELECT tau_idx, CAST(SUM(w_int) AS BIGINT) AS tw
         |  FROM g GROUP BY 1
         |), j AS (
         |  SELECT g.tau_idx,
         |    (1000000 * ((40000 * w_int) // tw)) // tok AS over_ppm
         |  FROM g JOIN t USING (tau_idx)
         |), mx AS (
         |  SELECT tau_idx, CAST(MAX(over_ppm) AS BIGINT)
         |    AS max_oversample_ppm
         |  FROM j GROUP BY 1
         |), f AS (
         |  SELECT tau_idx, max_oversample_ppm,
         |    max_oversample_ppm <= 2000000 AS feasible
         |  FROM mx
         |), b AS (
         |  SELECT MAX(CASE WHEN feasible THEN tau_idx END) AS best FROM f
         |)
         |SELECT tau_idx, max_oversample_ppm, feasible,
         |  COALESCE(tau_idx = best, FALSE) AS chosen
         |FROM f, b""".stripMargin,

    "q175_data_card" ->
      s"""WITH w AS (
         |  SELECT doc_id, unnest($sqlToks) AS s FROM documents
         |), hb AS (
         |  SELECT doc_id, $sqlHash60 % 16 AS b FROM w
         |), sc AS (
         |  SELECT doc_id,
         |    CAST(SUM(CAST(concat('0x',
         |      substr(md5('w' || CAST(b AS VARCHAR)), 1, 15))
         |      AS BIGINT) % 21 - 10) AS BIGINT) AS score
         |  FROM hb GROUP BY 1
         |), b AS (
         |  SELECT d.source, d.lang, d.doc_id, sc.score,
         |    CAST(len($sqlToks) AS INTEGER) AS nt, md5(text) AS h
         |  FROM documents d JOIN sc USING (doc_id)
         |), ps AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(nt) AS BIGINT) AS n_tokens,
         |    CAST(COUNT(DISTINCT h) AS BIGINT) AS uniq,
         |    CAST(SUM(score) AS BIGINT) AS ssum,
         |    quantile_cont(nt, 0.5) AS p50_tokens
         |  FROM b GROUP BY 1
         |), lc AS (
         |  SELECT source, lang, COUNT(*) AS c FROM b GROUP BY 1, 2
         |), tl AS (
         |  SELECT source, lang AS top_lang FROM (
         |    SELECT source, lang, ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY c DESC, lang ASC) AS rn
         |    FROM lc) x
         |  WHERE rn = 1
         |)
         |SELECT ps.source, n_docs, n_tokens,
         |  (1000000 * (n_docs - uniq)) // n_docs AS dup_ppm,
         |  top_lang,
         |  (1000000 * ssum) // n_docs AS mean_score_ppm,
         |  p50_tokens
         |FROM ps JOIN tl ON ps.source = tl.source""".stripMargin,

    "q176_dedup_keep_best" ->
      s"""WITH w AS (
         |  SELECT doc_id, unnest($sqlToks) AS s FROM documents
         |), hb AS (
         |  SELECT doc_id, $sqlHash60 % 16 AS b FROM w
         |), sc AS (
         |  SELECT doc_id,
         |    CAST(SUM(CAST(concat('0x',
         |      substr(md5('w' || CAST(b AS VARCHAR)), 1, 15))
         |      AS BIGINT) % 21 - 10) AS BIGINT) AS score
         |  FROM hb GROUP BY 1
         |), j AS (
         |  SELECT d.doc_id, sc.score, md5(text) AS content_hash
         |  FROM documents d JOIN sc USING (doc_id)
         |), r AS (
         |  SELECT content_hash, doc_id, score,
         |    ROW_NUMBER() OVER (PARTITION BY content_hash
         |      ORDER BY score DESC, doc_id ASC) AS rn,
         |    COUNT(*) OVER (PARTITION BY content_hash) AS nc
         |  FROM j
         |)
         |SELECT content_hash, doc_id AS canonical_id,
         |  score AS canonical_score, CAST(nc AS BIGINT) AS n_copies
         |FROM r WHERE rn = 1""".stripMargin,

    "q173_review_allocation" ->
      s"""WITH w AS (
         |  SELECT doc_id, unnest($sqlToks) AS s FROM documents
         |), h AS (
         |  SELECT doc_id, $sqlHash60 % 16 AS b FROM w
         |), sc AS (
         |  SELECT doc_id,
         |    CAST(SUM(CAST(concat('0x',
         |      substr(md5('w' || CAST(b AS VARCHAR)), 1, 15))
         |      AS BIGINT) % 21 - 10) AS BIGINT) AS score
         |  FROM h GROUP BY 1
         |), j AS (
         |  SELECT source, score FROM sc JOIN documents USING (doc_id)
         |), m AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(score) AS BIGINT) AS s1,
         |    CAST(SUM(score * score) AS BIGINT) AS s2
         |  FROM j GROUP BY 1
         |), ww AS (
         |  SELECT source, n_docs, n_docs * s2 - s1 * s1 AS var_num,
         |    CAST(floor(sqrt(CAST(n_docs * s2 - s1 * s1 AS DOUBLE)))
         |      AS BIGINT) AS w
         |  FROM m
         |), t AS (
         |  SELECT CAST(SUM(w) AS BIGINT) AS tw FROM ww
         |)
         |SELECT source, n_docs, var_num, w,
         |  CASE WHEN tw = 0 THEN 0 ELSE (100 * w) // tw END AS alloc
         |FROM ww, t""".stripMargin,

    "q174_jackknife_mean" ->
      s"""WITH w AS (
         |  SELECT doc_id, unnest($sqlToks) AS s FROM documents
         |), h AS (
         |  SELECT doc_id, $sqlHash60 % 16 AS b FROM w
         |), sc AS (
         |  SELECT doc_id,
         |    CAST(SUM(CAST(concat('0x',
         |      substr(md5('w' || CAST(b AS VARCHAR)), 1, 15))
         |      AS BIGINT) % 21 - 10) AS BIGINT) AS score
         |  FROM h GROUP BY 1
         |), bk AS (
         |  SELECT CAST(concat('0x',
         |      substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10
         |      AS b,
         |    score
         |  FROM sc
         |), g AS (
         |  SELECT b, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(score) AS BIGINT) AS s
         |  FROM bk GROUP BY 1
         |), t AS (
         |  SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(s) AS BIGINT) AS ts
         |  FROM g
         |), m AS (
         |  SELECT tn, (1000000 * (ts - s)) // (tn - n) AS m FROM g, t
         |)
         |SELECT CAST(MAX(tn) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) AS BIGINT) AS n_buckets,
         |  CAST(SUM(m) AS BIGINT) AS sum_m,
         |  CAST(SUM(m * m) AS BIGINT) AS sum_m2,
         |  CAST(COUNT(*) * SUM(m * m) - SUM(m) * SUM(m) AS BIGINT)
         |    AS var_num
         |FROM m""".stripMargin,

    "q170_context_chunks" ->
      s"""WITH d AS (
         |  SELECT doc_id, $sqlToks AS tk FROM documents
         |), c AS (
         |  SELECT doc_id, tk,
         |    unnest(generate_series(
         |      0, CAST(floor((len(tk) - 1) / 32.0) AS BIGINT))) AS chunk_idx
         |  FROM d WHERE len(tk) > 0
         |)
         |SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
         |  array_to_string(tk[chunk_idx * 32 + 1 : chunk_idx * 32 + 32], ' ')
         |    AS chunk_text,
         |  CAST(least(len(tk) - chunk_idx * 32, 32) AS BIGINT) AS n_tokens
         |FROM c""".stripMargin,

    "q169_vocab_growth" ->
      s"""WITH d AS (
         |  SELECT doc_id, ${sqlShingles(3)} AS tk FROM documents
         |), t AS (
         |  SELECT doc_id, unnest(tk) AS tok,
         |    unnest(generate_series(0, len(tk) - 1)) AS pos
         |  FROM d
         |), l AS (
         |  SELECT doc_id, len(tk) AS len FROM d
         |), o AS (
         |  SELECT doc_id,
         |    SUM(len) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - len
         |      AS off
         |  FROM l
         |), f AS (
         |  SELECT tok, MIN(o.off + t.pos) AS fp
         |  FROM t JOIN o USING (doc_id) GROUP BY 1
         |), b AS (
         |  SELECT CAST(fp // 2000 AS BIGINT) AS bucket,
         |    CAST(COUNT(*) AS BIGINT) AS n_new_types
         |  FROM f GROUP BY 1
         |)
         |SELECT bucket, n_new_types,
         |  CAST(SUM(n_new_types) OVER (ORDER BY bucket
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
         |FROM b""".stripMargin,

    // register rank via exact hex bit-length (the printf('%x') twin of
    // Sketches.bitLength); estimate divides the ONE shared double literal
    // (shortest-round-trip repr parses to identical bits in both engines)
    "q159_hll_distinct" -> {
      val num = graft.operators.Sketches.hllNumerator(6).toString
      s"""WITH tok AS (
         |  SELECT source, unnest($sqlToks) AS t FROM documents
         |), h AS (
         |  SELECT source,
         |    CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h
         |  FROM tok
         |), r AS (
         |  SELECT source, h % 64 AS idx, h // 64 AS w FROM h
         |), bl AS (
         |  SELECT source, idx,
         |    CASE WHEN w = 0 THEN 0
         |         ELSE (length(printf('%x', w)) - 1) * 4 +
         |           CASE WHEN substr(printf('%x', w), 1, 1) = '1' THEN 1
         |                WHEN substr(printf('%x', w), 1, 1) IN ('2', '3')
         |                  THEN 2
         |                WHEN substr(printf('%x', w), 1, 1)
         |                  IN ('4', '5', '6', '7') THEN 3
         |                ELSE 4 END
         |    END AS b
         |  FROM r
         |), reg AS (
         |  SELECT source, idx, MIN(b) AS mb FROM bl GROUP BY 1, 2
         |), g AS (
         |  SELECT source,
         |    CAST(SUM(CAST(1 AS BIGINT) << mb) AS BIGINT) AS s,
         |    COUNT(*) AS present
         |  FROM reg GROUP BY 1
         |)
         |SELECT source,
         |  64 - present AS n_zero_registers,
         |  s + (64 - present) * 36028797018963968 AS reg_sum,
         |  CAST(floor($num /
         |    CAST(s + (64 - present) * 36028797018963968 AS DOUBLE))
         |    AS BIGINT) AS est_distinct
         |FROM g""".stripMargin
    },

    "q266_kmv_overlap" ->
      s"""WITH sh AS (
         |  SELECT source,
         |    unnest(list_distinct(list_transform(${sqlShingles(5)},
         |      s -> $sqlHash60))) AS h
         |  FROM documents
         |), d AS (
         |  SELECT DISTINCT source, h FROM sh
         |), r AS (
         |  SELECT source, h,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h ASC) AS rn
         |  FROM d
         |), sk AS (
         |  SELECT source, list(h ORDER BY h ASC) AS kmv
         |  FROM r WHERE rn <= 64 GROUP BY 1
         |), p AS (
         |  SELECT a.source AS source_a, b.source AS source_b,
         |    a.kmv AS ka, b.kmv AS kb
         |  FROM sk a JOIN sk b ON a.source < b.source
         |), c AS (
         |  SELECT source_a, source_b,
         |    (list_sort(list_distinct(ka || kb)))[1:64] AS m,
         |    list_intersect(ka, kb) AS common
         |  FROM p
         |), e AS (
         |  SELECT source_a, source_b,
         |    CAST(len(m) AS DOUBLE) AS nu,
         |    CAST(len(list_intersect(m, common)) AS DOUBLE) AS nb,
         |    CASE WHEN len(m) < 64 THEN CAST(len(m) AS BIGINT)
         |         ELSE CAST(floor(63.0 * 1152921504606846976.0
         |                         / CAST(m[len(m)] AS DOUBLE)) AS BIGINT)
         |    END AS est_union
         |  FROM c
         |)
         |SELECT source_a, source_b, est_union,
         |  CAST(floor(1000000.0 * nb / nu) AS BIGINT) AS jaccard_ppm,
         |  CAST(floor(CAST(est_union AS DOUBLE) * nb / nu) AS BIGINT)
         |    AS est_intersection
         |FROM e""".stripMargin,

    "q267_heavy_hitters" ->
      s"""WITH g AS (
         |  SELECT unnest(${sqlShingles(2)}) AS gram FROM documents
         |), t AS (
         |  SELECT greatest(1, (COUNT(*) * 1500 + 999999) // 1000000) AS th
         |  FROM g
         |)
         |SELECT gram, COUNT(*) AS cnt
         |FROM g
         |GROUP BY 1
         |HAVING COUNT(*) >= (SELECT th FROM t)""".stripMargin,

    "q269_freq_spectrum" ->
      s"""WITH g0 AS (
         |  SELECT 1 AS n, unnest(${sqlShingles(1)}) AS s FROM documents
         |  UNION ALL
         |  SELECT 2 AS n, unnest(${sqlShingles(2)}) AS s FROM documents
         |  UNION ALL
         |  SELECT 3 AS n, unnest(${sqlShingles(3)}) AS s FROM documents
         |), g AS (
         |  SELECT n, $sqlHash60 AS gh FROM g0
         |), c AS (
         |  SELECT n, gh, COUNT(*) AS cnt FROM g GROUP BY 1, 2
         |), b AS (
         |  SELECT n, cnt,
         |    (length(printf('%x', cnt)) - 1) * 4 +
         |      CASE WHEN substr(printf('%x', cnt), 1, 1) = '1' THEN 1
         |           WHEN substr(printf('%x', cnt), 1, 1) IN ('2', '3')
         |             THEN 2
         |           WHEN substr(printf('%x', cnt), 1, 1)
         |             IN ('4', '5', '6', '7') THEN 3
         |           ELSE 4 END AS freq_band
         |  FROM c
         |)
         |SELECT n, freq_band, CAST(COUNT(*) AS BIGINT) AS n_types,
         |  CAST(SUM(cnt) AS BIGINT) AS n_grams,
         |  MIN(cnt) AS min_cnt, MAX(cnt) AS max_cnt
         |FROM b GROUP BY 1, 2""".stripMargin,

    "q272_source_drift" ->
      s"""WITH toks AS (
         |  SELECT source AS g, unnest($sqlToks) AS tok FROM documents
         |), cgt AS (
         |  SELECT g, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2
         |), ct AS (
         |  SELECT tok, CAST(SUM(c) AS BIGINT) AS ct FROM cgt GROUP BY 1
         |), ng AS (
         |  SELECT g, CAST(SUM(c) AS BIGINT) AS ng FROM cgt GROUP BY 1
         |), n AS (
         |  SELECT CAST(SUM(ct) AS BIGINT) AS n FROM ct
         |), terms AS (
         |  SELECT cgt.g,
         |    abs(CAST(cgt.c AS HUGEINT) * n.n - CAST(ct.ct AS HUGEINT)
         |      * ng.ng) AS term,
         |    ct.ct AS ct
         |  FROM cgt JOIN ct USING (tok) JOIN ng USING (g) CROSS JOIN n
         |), a AS (
         |  SELECT g, SUM(term) AS pres, CAST(SUM(ct) AS HUGEINT) AS sg
         |  FROM terms GROUP BY 1
         |)
         |SELECT a.g AS source, ng.ng AS n_tokens,
         |  CAST((pres + (n.n - sg) * CAST(ng.ng AS HUGEINT)) * 1000000
         |       // (2 * CAST(ng.ng AS HUGEINT) * n.n) AS BIGINT) AS tv_ppm
         |FROM a JOIN ng USING (g) CROSS JOIN n""".stripMargin,

    "q273_upsample_mixture" ->
      """WITH c AS (
        |  SELECT source, COUNT(*) AS cnt FROM documents GROUP BY 1
        |), r AS (
        |  SELECT doc_id, source, ROW_NUMBER() OVER (
        |    PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk
        |  FROM documents
        |), x AS (
        |  SELECT r.doc_id, r.source,
        |    greatest(1, 40 // cnt +
        |      CASE WHEN rk <= 40 % cnt THEN 1 ELSE 0 END) AS copies
        |  FROM r JOIN c USING (source)
        |)
        |SELECT doc_id, source, CAST(e AS BIGINT) AS epoch
        |FROM x, LATERAL (
        |  SELECT unnest(generate_series(0, CAST(copies - 1 AS BIGINT)))
        |    AS e) g""".stripMargin,

    // canonical forms hand-computed per the documented contract; the
    // dedup groups follow from them (min id survives, copies counted)
    "q289_url_canonicalize" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'https://example.com/a/b?a=1&b=2'),
        |  (2, 'https://example.com/a/b?a=1&b=2'),
        |  (3, 'http://example.com:8080//x'),
        |  (4, 'http://news.site.org/article'),
        |  (5, 'https://example.com'),
        |  (6, 'https://example.com'),
        |  (7, CAST(NULL AS VARCHAR)),
        |  (8, 'http://shop.io/cart?item=7')
        |) AS t(id, canonical)""".stripMargin,

    "q290_url_dedup" ->
      """SELECT * FROM (VALUES
        |  ('https://example.com/a/b?a=1&b=2', CAST(1 AS BIGINT),
        |   CAST(2 AS BIGINT)),
        |  ('http://example.com:8080//x', 3, 1),
        |  ('http://news.site.org/article', 4, 1),
        |  ('https://example.com', 5, 2),
        |  ('http://shop.io/cart?item=7', 8, 1)
        |) AS t(canonical, keep_id, n_copies)""".stripMargin,

    // hand-counted characters per script class; row 2 and row 6 cross
    // the 10%-of-letter-mass second-script threshold
    "q292_script_mix" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(10 AS BIGINT), CAST(0 AS BIGINT),
        |   CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |   CAST(3 AS BIGINT), CAST(10 AS BIGINT), 'latin', false),
        |  (2, 5, 6, 0, 0, 0, 0, 11, 'cyrillic', true),
        |  (3, 0, 0, 0, 0, 8, 0, 8, 'cjk', false),
        |  (4, 0, 0, 3, 0, 0, 0, 3, 'greek', false),
        |  (5, 0, 0, 0, 0, 0, 6, 0, 'none', false),
        |  (6, 9, 0, 0, 5, 0, 0, 14, 'latin', true)
        |) AS t(doc_id, n_latin, n_cyrillic, n_greek, n_arabic, n_cjk,
        |       n_digit, n_letters, dominant_script, is_code_mixed)""".stripMargin,

    // same ceil identities ((n + L - 1) div L) and integer ppm
    "q311_packing_efficiency" ->
      s"""WITH c AS (
         |  SELECT len($sqlToks) AS n FROM documents
         |), e AS (
         |  SELECT n, unnest([32, 64, 128, 256]) AS seq_len FROM c
         |)
         |SELECT seq_len,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n) AS BIGINT) AS total_tokens,
         |  CAST(sum((n + seq_len - 1) // seq_len) AS BIGINT)
         |    AS naive_sequences,
         |  CAST((sum(n) + seq_len - 1) // seq_len AS BIGINT)
         |    AS ideal_sequences,
         |  CAST((sum((n + seq_len - 1) // seq_len) * seq_len - sum(n))
         |    * 1000000 // (sum((n + seq_len - 1) // seq_len) * seq_len)
         |    AS BIGINT) AS naive_waste_ppm
         |FROM e GROUP BY seq_len""".stripMargin,

    // md5-order per-host pick: md5('6') < md5('1') < md5('2') <
    // md5('5') < md5('3') puts ids 6,1 in example.com's quota (the
    // :8080 row shares the host — canonicalHost ignores ports);
    // unparseable id 7 is excluded
    "q312_per_host_cap" ->
      """SELECT * FROM (VALUES
        |  (CAST(6 AS BIGINT), 'example.com', 1),
        |  (1, 'example.com', 2),
        |  (8, 'shop.io', 1),
        |  (4, 'news.site.org', 1)
        |) AS t(id, host, pos)""".stripMargin,

    // hand-pinned from the GraphRankSpec walk (the host graph is
    // isomorphic to its 3-node fixture): 2 exact-integer iterations
    "q320_host_pagerank" ->
      """SELECT * FROM (VALUES
        |  ('alpha.com', CAST(1122777 AS BIGINT)),
        |  ('beta.com', 938610),
        |  ('gamma.org', 938610)
        |) AS t(host, rank_ppm)""".stripMargin,

    // each conversation trips exactly one rule (conv 1 is clean;
    // conv 6's missing content field is NULL -> counts as empty;
    // conv 7 is an EMPTY array — size guard fails ok_no_empty; conv 8
    // is malformed JSON -> NULL array, every rule false, n_turns NULL)
    "q309_chat_validation" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(3 AS INTEGER), true, true, true, true, true),
        |  (2, 3, true, true, false, true, false),
        |  (3, 1, false, false, true, true, false),
        |  (4, 3, true, false, true, true, false),
        |  (5, 2, true, true, true, false, false),
        |  (6, 2, true, true, true, false, false),
        |  (7, 0, false, false, false, false, false),
        |  (8, NULL, false, false, false, false, false)
        |) AS t(conv_id, n_turns, ok_opening, ok_alternation,
        |       ok_ends_assistant, ok_no_empty, is_valid)""".stripMargin,

    // pair 2 identical sides, pair 3 empty side, pairs 4/5 share a
    // prompt, pair 6 NULL prompt (kept by the null-safe join, flagged)
    "q310_preference_pairs" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), true, true, true, CAST(1 AS BIGINT), true),
        |  (2, true, true, false, 1, false),
        |  (3, true, false, true, 1, false),
        |  (4, true, true, true, 2, false),
        |  (5, true, true, true, 2, false),
        |  (6, false, true, true, 1, false)
        |) AS t(pair_id, ok_prompt, ok_nonempty, ok_distinct,
        |       n_prompt_copies, is_train_ready)""".stripMargin,

    // same top-20 cut (count desc, word asc) and integer ppm
    "q303_vocab_coverage" ->
      s"""WITH w AS (
         |  SELECT source AS grp, unnest($sqlToks) AS word FROM documents
         |), w2 AS (
         |  SELECT grp, word FROM w WHERE word <> ''
         |), v AS (
         |  SELECT word FROM (
         |    SELECT word, count(*) AS c FROM w2 GROUP BY word
         |    ORDER BY c DESC, word ASC LIMIT 20)
         |)
         |SELECT grp AS source,
         |  CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(count(*) FILTER (WHERE word NOT IN (SELECT word FROM v))
         |    AS BIGINT) AS n_oov,
         |  CAST(count(*) FILTER (WHERE word NOT IN (SELECT word FROM v))
         |    * 1000000 // count(*) AS BIGINT) AS oov_ppm
         |FROM w2 GROUP BY grp""".stripMargin,

    // same integer counts, same cross-multiplied inequalities
    "q298_gopher_rules" ->
      s"""WITH t AS (
         |  SELECT doc_id, $sqlToks AS toks,
         |    len(regexp_replace(trim(text), '\\s+', '', 'g'))
         |      AS sum_word_len,
         |    len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS n_symbols
         |  FROM documents
         |), c AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_words,
         |    CAST(sum_word_len AS BIGINT) AS sum_word_len,
         |    CAST(n_symbols AS BIGINT) AS n_symbols,
         |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
         |      AS BIGINT) AS n_alpha_words,
         |    CAST((CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END)
         |      + (CASE WHEN list_contains(toks, 'be') THEN 1 ELSE 0 END)
         |      + (CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END)
         |      + (CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END)
         |      + (CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END)
         |      + (CASE WHEN list_contains(toks, 'that') THEN 1 ELSE 0 END)
         |      + (CASE WHEN list_contains(toks, 'have') THEN 1 ELSE 0 END)
         |      + (CASE WHEN list_contains(toks, 'with') THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_stopwords
         |  FROM t
         |)
         |SELECT doc_id, n_words, sum_word_len, n_symbols, n_alpha_words,
         |  n_stopwords,
         |  n_words BETWEEN 50 AND 100000 AS ok_word_count,
         |  (3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words)
         |    AS ok_mean_word_len,
         |  10 * n_symbols <= n_words AS ok_symbol_ratio,
         |  5 * n_alpha_words >= 4 * n_words AS ok_alpha_words,
         |  n_stopwords >= 2 AS ok_stopwords,
         |  (n_words BETWEEN 50 AND 100000
         |    AND 3 * n_words <= sum_word_len
         |    AND sum_word_len <= 10 * n_words
         |    AND 10 * n_symbols <= n_words
         |    AND 5 * n_alpha_words >= 4 * n_words
         |    AND n_stopwords >= 2) AS passes_all
         |FROM c""".stripMargin
  )
}
