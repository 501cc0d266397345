package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Charset detection + decode for crawled HTTP/HTML bodies — the step
  * between a WARC `body: binary` column and any text operator. Real
  * crawls are double-digit-percent non-UTF-8, so `cast(body as string)`
  * (which assumes UTF-8 and silently replaces every non-UTF-8 byte with
  * U+FFFD) loses exactly the pages a multilingual corpus wants.
  *
  * Detection order (the WHATWG/browser precedence, relationally):
  *   1. the `charset=` parameter of the HTTP `Content-Type` header
  *   2. `<meta charset=...>` / `<meta http-equiv Content-Type ...>` in
  *      the document prefix (sniffed over the UTF-8 cast — meta tags
  *      are ASCII, which every supported charset encodes identically)
  *   3. UTF-8 by default; a page CLAIMING utf-8 whose bytes are not
  *      structurally valid UTF-8 falls back to windows-1252,
  *      the browsers' mislabeled-page default
  *
  * Decoders are all codegen'd built-ins: UTF-8 via `cast` (replacing,
  * never throwing — Spark 4's `decode(..., 'UTF-8')` RAISES on
  * malformed input, which one bad page must not do to a 100 TB scan),
  * ISO-8859-1 via `decode` (total — every byte sequence is valid), and
  * windows-1252 as ISO-8859-1 plus a `translate` of the 27 C1 code
  * points cp1252 remaps (curly quotes, €, em-dash, ...). The result
  * composes [[TextFunctions.repairMojibake]], so a page declared
  * latin-1 whose bytes were really UTF-8 round-trips back losslessly.
  */
object CharsetDecode {

  /** ISO-8859-1 decodes 0x80-0x9F to the C1 controls; cp1252 maps them
    * to printable punctuation. `translate` bridges the two (the 5
    * unassigned cp1252 slots keep their C1 identity). */
  private val c1From: String = (0x80 to 0x9f).map(_.toChar).mkString
  private val c1To: String =
    "\u20ac\u0081\u201a\u0192\u201e\u2026\u2020\u2021" +
    "\u02c6\u2030\u0160\u2039\u0152\u008d\u017d\u008f" +
    "\u0090\u2018\u2019\u201c\u201d\u2022\u2013\u2014" +
    "\u02dc\u2122\u0161\u203a\u0153\u009d\u017e\u0178"

  /** Decode a binary column as windows-1252. */
  def cp1252(body: Column): Column =
    translate(decode(body, "ISO-8859-1"), c1From, c1To)

  private val charsetParamRe =
    "(?i)charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9_\\-]+)"

  /** Collapse charset aliases onto the three decode paths; unknown
    * labels yield '' (detection falls through to the next source). */
  private def normalizeCharset(cs: Column): Column = {
    val l = lower(cs)
    when(l.isin("utf-8", "utf8", "us-ascii", "ascii"), "utf-8")
      .when(l.isin("iso-8859-1", "iso8859-1", "latin-1", "latin1",
        "iso-8859-15", "l1"), "iso-8859-1")
      .when(l.isin("windows-1252", "cp1252", "win-1252", "x-cp1252"),
        "windows-1252")
      .otherwise(lit(""))
  }

  /** The charset label [[decodeHtml]] resolves for a body — exposed so
    * an intake audit can histogram it. `contentType` is the HTTP
    * Content-Type header value (nullable). */
  def resolvedCharset(body: Column, contentType: Column): Column = {
    val utf8 = body.cast("string")
    val declared = normalizeCharset(regexp_extract(
      coalesce(contentType, lit("")), charsetParamRe, 1))
    val meta = normalizeCharset(regexp_extract(
      substring(utf8, 1, 4096),
      "(?is)<meta\\b[^>]*?" + charsetParamRe, 1))
    val cs = when(declared =!= "", declared)
      .when(meta =!= "", meta)
      .otherwise(lit("utf-8"))
    // mislabeled-utf8 guard: claimed/defaulted utf-8 over bytes that
    // are NOT structurally valid UTF-8 → the browsers' cp1252
    // fallback. The check reads the bytes through a latin-1 decode
    // (chars-are-bytes) — a binary cast keeps invalid bytes RAW
    // inside UTF8String, so a U+FFFD probe would never fire
    when(cs === "utf-8" &&
        !TextFunctions.isUtf8Bytes(decode(body, "ISO-8859-1")),
      lit("windows-1252")).otherwise(cs)
  }

  /** Decode an HTML body to text per the resolved charset, then repair
    * the declared-latin-1-but-really-UTF-8 mojibake class. */
  def decodeHtml(body: Column, contentType: Column): Column = {
    val cs = resolvedCharset(body, contentType)
    val out = when(cs === "iso-8859-1", decode(body, "ISO-8859-1"))
      .when(cs === "windows-1252", cp1252(body))
      .otherwise(body.cast("string"))
    TextFunctions.repairMojibake(out)
  }
}
