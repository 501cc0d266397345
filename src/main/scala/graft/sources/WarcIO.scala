package graft.sources

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

/** WARC (ISO 28500) record walk + writer — the crawl-native container
  * a CommonCrawl-class intake reads before
  * [[graft.operators.HtmlExtract]] sees any markup. Format shape per
  * record:
  *
  *   WARC/1.0\r\n
  *   <name>: <value>\r\n ...        (WARC named fields)
  *   \r\n
  *   <Content-Length payload bytes>
  *   \r\n\r\n                       (record boundary)
  *
  * `.warc.gz` files are per-record gzip MEMBERS concatenated — the JDK
  * inflater consumes concatenated members in one pass, so the walk
  * below runs on the inflated image either way (the
  * [[TarArchive.gunzip]] bound applies: decompression-bomb-guarded).
  *
  * Tolerance contract (the house source discipline): a malformed
  * header, a Content-Length overrunning the buffer, or a truncated
  * tail ENDS the walk with the records collected so far — a partial
  * file yields partial rows, never a failed stage.
  */
object WarcIO {

  final case class Record(headers: Map[String, String],
      payload: Array[Byte]) {
    /** Case-insensitive named-field lookup (WARC field names are
      * defined case-insensitive). */
    def field(name: String): Option[String] =
      headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }
  }

  private val CrLf = "\r\n".getBytes(ISO_8859_1)

  private def indexOfCrLf(buf: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < buf.length) {
      if (buf(i) == '\r' && buf(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Walk every record in an (already-inflated) WARC image. */
  def parseAll(buf: Array[Byte]): Seq[Record] = {
    val out = Seq.newBuilder[Record]
    var pos = 0
    var ok = true
    while (ok && pos < buf.length) {
      // seek the version line; leading record-boundary CRLFs are legal
      while (pos < buf.length && (buf(pos) == '\r' || buf(pos) == '\n'))
        pos += 1
      if (pos >= buf.length) ok = false
      else {
        val vEnd = indexOfCrLf(buf, pos)
        if (vEnd < 0 ||
          !new String(buf, pos, vEnd - pos, ISO_8859_1).startsWith("WARC/"))
          ok = false
        else {
          var p = vEnd + 2
          val hdrs = Map.newBuilder[String, String]
          var blank = false
          var malformed = false
          while (!blank && !malformed) {
            val e = indexOfCrLf(buf, p)
            if (e < 0) malformed = true
            else if (e == p) { blank = true; p = e + 2 }
            else {
              val line = new String(buf, p, e - p, UTF_8)
              val colon = line.indexOf(':')
              if (colon <= 0) malformed = true
              else {
                hdrs += line.substring(0, colon).trim ->
                  line.substring(colon + 1).trim
                p = e + 2
              }
            }
          }
          if (malformed) ok = false
          else {
            val rec = Record(hdrs.result(), Array.emptyByteArray)
            val len = rec.field("Content-Length")
              .flatMap(s => s.toLongOption)
            len match {
              case Some(n) if n >= 0 && p + n <= buf.length =>
                out += rec.copy(
                  payload = java.util.Arrays.copyOfRange(buf, p,
                    p + n.toInt))
                pos = p + n.toInt
              case _ => ok = false
            }
          }
        }
      }
    }
    out.result()
  }

  /** Serialize records the ISO 28500 way (writer twin for fixtures and
    * sinks): Content-Length is (re)computed from the payload, the rest
    * of the named fields pass through in order. */
  def warcBytes(records: Seq[(Seq[(String, String)], Array[Byte])])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (hdrs, payload) =>
      out.write("WARC/1.0\r\n".getBytes(ISO_8859_1))
      (hdrs.filterNot(_._1.equalsIgnoreCase("Content-Length")) :+
        ("Content-Length" -> payload.length.toString))
        .foreach { case (k, v) =>
          out.write(s"$k: $v\r\n".getBytes(UTF_8))
        }
      out.write(CrLf)
      out.write(payload)
      out.write(CrLf); out.write(CrLf)
    }
    out.toByteArray
  }

  /** Gzip each record as its OWN member and concatenate — the
    * `.warc.gz` convention (per-record members are what make the format
    * range-seekable; the sequential reader consumes them as one
    * stream). */
  def warcGzBytes(records: Seq[(Seq[(String, String)], Array[Byte])])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(warcBytes(Seq(r)))
      gz.finish()
    }
    out.toByteArray
  }

  /** Split an HTTP message payload (response records carry one) into
    * (status, headers, body): status from the `HTTP/x.y NNN` start
    * line, body after the first blank line. A payload that is not an
    * HTTP message yields (None, empty, full payload). */
  def httpParts(payload: Array[Byte])
      : (Option[Int], Map[String, String], Array[Byte]) = {
    val head = new String(payload, 0,
      math.min(payload.length, 16), ISO_8859_1)
    if (!head.startsWith("HTTP/")) return (None, Map.empty, payload)
    var p = 0
    var boundary = -1
    while (boundary < 0 && p + 3 < payload.length) {
      if (payload(p) == '\r' && payload(p + 1) == '\n' &&
        payload(p + 2) == '\r' && payload(p + 3) == '\n') boundary = p
      else p += 1
    }
    val headerEnd = if (boundary < 0) payload.length else boundary
    val lines = new String(payload, 0, headerEnd, UTF_8).split("\r\n")
    val status = lines.headOption.flatMap { l =>
      val parts = l.split(" ")
      if (parts.length >= 2) parts(1).toIntOption else None
    }
    val hdrs = lines.drop(1).flatMap { l =>
      val c = l.indexOf(':')
      if (c <= 0) None
      else Some(l.substring(0, c).trim.toLowerCase ->
        l.substring(c + 1).trim)
    }.toMap
    val body = if (boundary < 0) Array.emptyByteArray
      else java.util.Arrays.copyOfRange(payload, boundary + 4,
        payload.length)
    (status, hdrs, body)
  }
}
