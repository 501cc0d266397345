package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Charset detection + decode for crawled bodies: header param, meta
  * sniff, UTF-8-validity fallback, and the mojibake-repair compose. */
class CharsetDecodeSpec extends SparkSpec {

  private def decodeAll(rows: (Long, Array[Byte], String)*)
      : Map[Long, (String, String)] = {
    import spark.implicits._
    val df = rows.toSeq.toDF("id", "body", "ctype")
    df.select(col("id"),
        CharsetDecode.resolvedCharset(col("body"), col("ctype")).as("cs"),
        CharsetDecode.decodeHtml(col("body"), col("ctype")).as("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2)))).toMap
  }

  test("header charset param wins: latin-1 bytes declared iso-8859-1 " +
      "decode exactly; a plain utf-8 page stays itself") {
    val latin = "the café décor"
    val got = decodeAll(
      (1L, latin.getBytes("ISO-8859-1"), "text/html; charset=iso-8859-1"),
      (2L, "the plain café page".getBytes("UTF-8"), "text/html"))
    assert(got(1L) == (("iso-8859-1", latin)))
    assert(got(2L) == (("utf-8", "the plain café page")))
  }

  test("mislabeled utf-8 (cp1252 bytes under a utf-8 label) falls back " +
      "to windows-1252 — curly quote and euro decode, never U+FFFD") {
    val text = "the company’s plan costs €5"
    val got = decodeAll(
      (1L, text.getBytes("windows-1252"), "text/html; charset=utf-8"),
      // same bytes with NO declaration at all: same fallback
      (2L, text.getBytes("windows-1252"), null))
    assert(got(1L) == (("windows-1252", text)))
    assert(got(2L) == (("windows-1252", text)))
  }

  test("meta charset sniffs from the document prefix when the header " +
      "has no charset param (ASCII meta survives any supported " +
      "charset's cast)") {
    val html = "<html><head><meta charset=\"iso-8859-1\"></head>" +
      "<body>the résumé text</body></html>"
    val got = decodeAll((1L, html.getBytes("ISO-8859-1"), "text/html"))
    assert(got(1L)._1 == "iso-8859-1")
    assert(got(1L)._2.contains("résumé"))
    // http-equiv form with the charset inside the content attribute
    val equiv = "<meta http-equiv=\"Content-Type\" content=\"text/html; " +
      "charset=iso-8859-1\"><p>the façade</p>"
    val got2 = decodeAll((1L, equiv.getBytes("ISO-8859-1"), null))
    assert(got2(1L)._2.contains("façade"))
  }

  test("declared latin-1 over bytes that were really UTF-8: the " +
      "decode yields the mojibake signature and repairMojibake " +
      "round-trips it back losslessly") {
    val real = "the café of the quartier"
    val got = decodeAll(
      (1L, real.getBytes("UTF-8"), "text/html; charset=iso-8859-1"))
    assert(got(1L)._1 == "iso-8859-1")
    assert(got(1L)._2 == real)
  }

  test("unknown charset labels fall through to the default chain; " +
      "ascii aliases ride the utf-8 path; null body stays null") {
    import spark.implicits._
    val got = decodeAll(
      (1L, "plain ascii".getBytes("UTF-8"), "text/html; charset=koi8-r"),
      (2L, "seven bit".getBytes("UTF-8"), "text/html; charset=US-ASCII"))
    assert(got(1L) == (("utf-8", "plain ascii")))
    assert(got(2L) == (("utf-8", "seven bit")))
    val n = Seq((1L, null: Array[Byte], "text/html"))
      .toDF("id", "body", "ctype")
      .select(CharsetDecode.decodeHtml(col("body"), col("ctype")))
      .collect()
    assert(n(0).isNullAt(0))
  }
}
