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

  /** Walk every record in an (already-inflated) WARC image — the
    * in-memory twin of [[streamRecords]] (one implementation: the
    * array wraps into a stream, so the two can never drift). */
  def parseAll(buf: Array[Byte]): Seq[Record] =
    streamRecords(new java.io.ByteArrayInputStream(buf)).toSeq

  /** Incremental record walk over an (inflating) stream — the scale
    * path: memory is bounded by ONE record, never one file, so a
    * CommonCrawl segment (~1 GiB gzipped, 4-5 GiB inflated) reads
    * without ever materializing the inflated image. Per-record gzip
    * members inflate transparently when the caller wraps the raw
    * stream in a `GZIPInputStream` (the JDK inflater consumes
    * concatenated members in one pass).
    *
    * Tolerance contract (same as [[parseAll]]): a malformed header or
    * a truncated payload ENDS the walk with the records yielded so
    * far. A record whose Content-Length exceeds `maxRecordBytes` (the
    * per-record decompression-bomb bound) has its payload SKIPPED,
    * not buffered: the record still surfaces — headers intact, empty
    * payload — so the anomaly is attrition-visible downstream, and
    * the walk continues behind it. */
  def streamRecords(in: java.io.InputStream,
      maxRecordBytes: Long = 1L << 30): Iterator[Record] =
    new Iterator[Record] {
      private val bound = math.min(maxRecordBytes, Int.MaxValue - 8L)
      private var nextRec: Record = _
      private var done = false

      /** One CRLF-terminated line, UTF-8 (header lines; the version
        * line is ASCII). null at EOF before any CRLF. */
      private def readLine(): String = {
        val bytes = new java.io.ByteArrayOutputStream(64)
        var prev = -1
        var c = in.read()
        while (c >= 0) {
          if (prev == '\r' && c == '\n') {
            val a = bytes.toByteArray
            return new String(a, 0, a.length - 1, UTF_8)
          }
          bytes.write(c)
          prev = c
          c = in.read()
        }
        null
      }

      private def readFully(n: Int): Array[Byte] = {
        val buf = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = in.read(buf, off, n - off)
          if (r < 0) return null
          off += r
        }
        buf
      }

      private def skipFully(n: Long): Boolean = {
        var left = n
        val buf = new Array[Byte](64 * 1024)
        while (left > 0) {
          val r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
          if (r < 0) return false
          left -= r
        }
        true
      }

      private def advance(): Unit = {
        nextRec = null
        if (done) return
        // seek the version line; record-boundary CRLFs read as empty
        // lines here
        var line = readLine()
        while (line != null && line.isEmpty) line = readLine()
        if (line == null || !line.startsWith("WARC/")) { done = true; return }
        val hdrs = Map.newBuilder[String, String]
        var ok = true
        var blank = false
        while (ok && !blank) {
          val l = readLine()
          if (l == null) ok = false
          else if (l.isEmpty) blank = true
          else {
            val colon = l.indexOf(':')
            if (colon <= 0) ok = false
            else hdrs += l.substring(0, colon).trim ->
              l.substring(colon + 1).trim
          }
        }
        if (!ok) { done = true; return }
        val rec = Record(hdrs.result(), Array.emptyByteArray)
        rec.field("Content-Length").flatMap(_.toLongOption) match {
          case Some(n) if n >= 0 && n <= bound =>
            val payload = readFully(n.toInt)
            if (payload == null) done = true // truncated tail
            else nextRec = rec.copy(payload = payload)
          case Some(n) if n > bound =>
            if (skipFully(n)) nextRec = rec // visible, payload skipped
            else done = true
          case _ => done = true
        }
      }

      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): Record = {
        if (nextRec == null) throw new NoSuchElementException
        val r = nextRec; advance(); r
      }
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
    * HTTP message yields (None, empty, full payload).
    *
    * Body encodings older/raw crawls carry are undone here, so the
    * returned bytes are the ENTITY body: `Transfer-Encoding: chunked`
    * framing strips ([[dechunk]] — malformed framing degrades to the
    * chunks decoded so far), then a `Content-Encoding: gzip` body
    * inflates ([[TarArchive.gunzip]], decompression-bomb-bounded; a
    * body that does not actually start with the gzip magic passes
    * through untouched). */
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
    val raw = if (boundary < 0) Array.emptyByteArray
      else java.util.Arrays.copyOfRange(payload, boundary + 4,
        payload.length)
    val unchunked =
      if (hdrs.get("transfer-encoding")
          .exists(_.toLowerCase.contains("chunked"))) dechunk(raw)
      else raw
    val body =
      if (hdrs.get("content-encoding").map(_.toLowerCase.trim)
          .exists(ce => ce == "gzip" || ce == "x-gzip") &&
        TarArchive.isGzip(unchunked)) TarArchive.gunzip(unchunked)
      else unchunked
    (status, hdrs, body)
  }

  /** Strip `Transfer-Encoding: chunked` framing: `<hex-size>[;ext]
    * CRLF <data> CRLF` repeating until the `0` terminal chunk
    * (trailers ignored). Malformed framing — no CRLF, a non-hex size,
    * a chunk overrunning the buffer — ends decoding with the chunks
    * recovered so far (the house tolerance contract: partial data,
    * never a failed stage). */
  private[sources] def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var pos = 0
    var ok = true
    while (ok) {
      val e = indexOfCrLf(b, pos)
      if (e < 0) ok = false
      else {
        val sizeLine = new String(b, pos, e - pos, ISO_8859_1).trim
        val semi = sizeLine.indexOf(';')
        val hex = (if (semi >= 0) sizeLine.substring(0, semi)
          else sizeLine).trim
        val n = try java.lang.Long.parseLong(hex, 16)
          catch { case _: NumberFormatException => -1L }
        if (n <= 0 || e + 2 + n > b.length) ok = false
        else {
          out.write(b, e + 2, n.toInt)
          pos = (e + 2 + n + 2).toInt // skip data + its CRLF
        }
      }
    }
    out.toByteArray
  }
}
