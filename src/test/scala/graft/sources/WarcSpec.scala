package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WARC record walk, writer twin, HTTP split, and the DSv2 connector
  * (batch + streaming): the fixture in the first test is HAND-BUILT
  * byte-by-byte (not via [[WarcIO.warcBytes]]), so the parser is pinned
  * against the ISO 28500 wire shape, not against its own writer. */
class WarcSpec extends SparkSpec {

  private def httpPayload(body: String, ctype: String = "text/html")
      : Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n" +
      s"Content-Length: ${body.getBytes(UTF_8).length}\r\n\r\n" + body)
      .getBytes(UTF_8)

  test("parseAll on a HAND-BUILT wire image: headers, payload slicing, " +
      "record boundaries; a truncated tail yields the records before it") {
    val p1 = httpPayload("<p>the page one of the crawl</p>")
    val raw = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = raw.write(s.getBytes(UTF_8))
    w("WARC/1.0\r\n")
    w("WARC-Type: warcinfo\r\nWARC-Record-ID: <urn:uuid:aaa>\r\n")
    w("Content-Length: 9\r\n\r\n")
    w("info: yes")
    w("\r\n\r\n")
    w("WARC/1.0\r\n")
    w("WARC-Type: response\r\nWARC-Record-ID: <urn:uuid:bbb>\r\n")
    w("WARC-Target-URI: https://example.com/one\r\n")
    w("WARC-Date: 2026-08-16T00:00:00Z\r\n")
    w(s"Content-Length: ${p1.length}\r\n\r\n")
    raw.write(p1)
    w("\r\n\r\n")
    val recs = WarcIO.parseAll(raw.toByteArray)
    assert(recs.length == 2)
    assert(recs(0).field("WARC-Type").contains("warcinfo"))
    assert(new String(recs(0).payload, UTF_8) == "info: yes")
    assert(recs(1).field("warc-target-uri") // case-insensitive lookup
      .contains("https://example.com/one"))
    assert(recs(1).payload.sameElements(p1))
    // truncate INSIDE record 2's payload: record 1 still comes back
    val cut = raw.toByteArray.dropRight(20)
    val partial = WarcIO.parseAll(cut)
    assert(partial.length == 1 &&
      partial(0).field("WARC-Type").contains("warcinfo"))
  }

  test("writer twin roundtrip, plain and per-record-gzip-member; " +
      "Content-Length is recomputed from the payload") {
    val recs = Seq(
      (Seq("WARC-Type" -> "response", "WARC-Record-ID" -> "<urn:uuid:1>",
        "WARC-Target-URI" -> "https://a.com/x",
        "Content-Length" -> "999999"), // lies; writer must recompute
        httpPayload("<p>alpha</p>")),
      (Seq("WARC-Type" -> "request", "WARC-Record-ID" -> "<urn:uuid:2>"),
        "GET /x HTTP/1.1\r\n\r\n".getBytes(UTF_8)))
    for (img <- Seq(WarcIO.warcBytes(recs),
        TarArchive.gunzip(WarcIO.warcGzBytes(recs)))) {
      val back = WarcIO.parseAll(img)
      assert(back.length == 2)
      assert(back(0).payload.sameElements(recs(0)._2))
      assert(back(1).field("WARC-Type").contains("request"))
    }
  }

  test("httpParts: status + lowercased headers + body; a non-HTTP " +
      "payload comes back whole with no status") {
    val (st, h, b) = WarcIO.httpParts(httpPayload("the body text"))
    assert(st.contains(200))
    assert(h("content-type") == "text/html")
    assert(new String(b, UTF_8) == "the body text")
    val (st2, h2, b2) = WarcIO.httpParts("not http at all".getBytes(UTF_8))
    assert(st2.isEmpty && h2.isEmpty &&
      new String(b2, UTF_8) == "not http at all")
  }

  test("chunked transfer-encoding strips its framing (extensions and " +
      "trailers ignored); malformed framing degrades to the chunks " +
      "decoded so far") {
    val chunked = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n" +
      "6;ext=1\r\nthe fi\r\n" +
      "9\r\nrst chunk\r\n" +
      "A\r\n and more.\r\n" +
      "0\r\nX-Trailer: t\r\n\r\n"
    val (st, _, b) = WarcIO.httpParts(chunked.getBytes(UTF_8))
    assert(st.contains(200))
    assert(new String(b, UTF_8) == "the first chunk and more.")
    val broken = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "4\r\ngood\r\nZZ\r\njunk"
    val (_, _, b2) = WarcIO.httpParts(broken.getBytes(UTF_8))
    assert(new String(b2, UTF_8) == "good")
  }

  test("content-encoding gzip inflates the body (also composed AFTER " +
      "de-chunking); a body without the gzip magic passes through") {
    val text = "the gzipped page body of the crawl"
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(text.getBytes(UTF_8)); g.finish(); bos.toByteArray
    }
    val plainGz = ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n")
      .getBytes(UTF_8) ++ gz
    val (_, _, b) = WarcIO.httpParts(plainGz)
    assert(new String(b, UTF_8) == text)
    // chunked + gzipped: framing strips first, THEN the inflate
    val chunkedGz =
      ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
        s"Content-Encoding: gzip\r\n\r\n${gz.length.toHexString}\r\n")
        .getBytes(UTF_8) ++ gz ++ "\r\n0\r\n\r\n".getBytes(UTF_8)
    val (_, _, b2) = WarcIO.httpParts(chunkedGz)
    assert(new String(b2, UTF_8) == text)
    // declared gzip but NOT gzip bytes: untouched
    val lying = ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" +
      "not actually compressed").getBytes(UTF_8)
    assert(new String(WarcIO.httpParts(lying)._3, UTF_8) ==
      "not actually compressed")
  }

  test("streamRecords walks a multi-member segment incrementally: " +
      "total inflated size far above maxRecordBytes reads fine " +
      "(memory bounds per record, not per file); an over-bound record " +
      "surfaces with headers intact and its payload skipped, and the " +
      "walk continues behind it") {
    // 40 records of 1 KiB under a 4 KiB per-record bound: total 40 KiB
    // > bound proves the bound is per record
    val big = "x" * 1024
    val recs = (0 until 40).map(i =>
      (Seq("WARC-Type" -> "resource",
        "WARC-Record-ID" -> s"<urn:uuid:m$i>"), big.getBytes(UTF_8)))
    val gz = WarcIO.warcGzBytes(recs)
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(gz))
    val got = WarcIO.streamRecords(in, maxRecordBytes = 4096).toSeq
    assert(got.length == 40 && got.forall(_.payload.length == 1024))
    // one 10 KiB record between two small ones, bound 4 KiB: the big
    // record is VISIBLE (headers, empty payload), neighbors intact
    val mixed = WarcIO.warcBytes(Seq(
      (Seq("WARC-Type" -> "resource", "WARC-Record-ID" -> "<urn:uuid:a>"),
        "small one".getBytes(UTF_8)),
      (Seq("WARC-Type" -> "resource", "WARC-Record-ID" -> "<urn:uuid:b>"),
        ("y" * 10240).getBytes(UTF_8)),
      (Seq("WARC-Type" -> "resource", "WARC-Record-ID" -> "<urn:uuid:c>"),
        "small two".getBytes(UTF_8))))
    val walked = WarcIO.streamRecords(
      new java.io.ByteArrayInputStream(mixed), maxRecordBytes = 4096).toSeq
    assert(walked.map(_.field("WARC-Record-ID").get) ==
      Seq("<urn:uuid:a>", "<urn:uuid:b>", "<urn:uuid:c>"))
    assert(walked(1).payload.isEmpty)
    assert(new String(walked(2).payload, UTF_8) == "small two")
    // parseAll is the same walk over an array: identical records
    val viaParse = WarcIO.parseAll(mixed)
    assert(viaParse.map(_.field("WARC-Record-ID").get) ==
      Seq("<urn:uuid:a>", "<urn:uuid:b>", "<urn:uuid:c>"))
  }

  private def writeFixtureDir(): String = {
    val dir = Files.createTempDirectory("graft_warc").toString
    val f1 = Seq(
      (Seq("WARC-Type" -> "warcinfo",
        "WARC-Record-ID" -> "<urn:uuid:info>"),
        "software: graft".getBytes(UTF_8)),
      (Seq("WARC-Type" -> "response",
        "WARC-Record-ID" -> "<urn:uuid:r1>",
        "WARC-Target-URI" -> "https://a.com/page",
        "WARC-Date" -> "2026-08-16T00:00:00Z",
        "Content-Type" -> "application/http; msgtype=response"),
        httpPayload("<p>the first page of the little crawl set</p>")))
    val f2 = Seq(
      (Seq("WARC-Type" -> "response",
        "WARC-Record-ID" -> "<urn:uuid:r2>",
        "WARC-Target-URI" -> "https://b.com/page",
        "Content-Type" -> "application/http; msgtype=response"),
        httpPayload("<p>the second page of the little crawl set</p>",
          ctype = "text/html; charset=utf-8")))
    Files.write(Paths.get(dir, "seg-00000.warc"), WarcIO.warcBytes(f1))
    Files.write(Paths.get(dir, "seg-00001.warc.gz"), WarcIO.warcGzBytes(f2))
    dir
  }

  test("DSv2 batch read: both containers (plain + gz) under one dir, " +
      "all metadata columns; http split only on response records") {
    val dir = writeFixtureDir()
    val df = spark.read.format("warc").load(dir)
    val got = df.select("warc_name", "record_type", "target_uri",
        "http_status", "http_content_type")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), Option(r.get(3)), r.getString(4))).toSet
    assert(got == Set(
      ("seg-00000.warc", "warcinfo", null, None, null),
      ("seg-00000.warc", "response", "https://a.com/page", Some(200),
        "text/html"),
      ("seg-00001.warc.gz", "response", "https://b.com/page", Some(200),
        "text/html; charset=utf-8")))
    // body only for responses; a warcinfo record has no HTTP message
    val bodies = df.where(col("record_type") === "response")
      .select(col("target_uri"), col("body").cast("string"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(bodies("https://a.com/page")
      .contains("first page of the little crawl"))
    // non-response records surface NULL body (their raw WARC payload is
    // not an HTTP message body) — a consumer filtering on body alone
    // never ingests warcinfo/request payloads as page content
    val infoBody = df.where(col("record_type") === "warcinfo")
      .select(col("body")).collect()
    assert(infoBody.length == 1 && infoBody(0).isNullAt(0))
  }

  test("column pruning: a metadata-only projection reads no payload " +
      "columns (the scan description names only what was asked)") {
    val dir = writeFixtureDir()
    val plan = spark.read.format("warc").load(dir)
      .select("target_uri", "content_length")
      .queryExecution.executedPlan.toString
    assert(plan.contains("target_uri"))
    assert(!plan.toLowerCase.contains("body"))
  }

  test("readStream: two arrival waves, per-file exactly-once; a " +
      "RESTART from the same checkpoint re-reads nothing") {
    val dir = Files.createTempDirectory("graft_warcstream").toString
    val ckpt = Files.createTempDirectory("graft_warcstream_ck").toString
    def segBytes(n: Int): Array[Byte] = WarcIO.warcBytes(Seq(
      (Seq("WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:uuid:s$n>",
        "WARC-Target-URI" -> s"https://w$n.com/"),
        httpPayload(s"<p>the wave $n page of the stream</p>"))))
    val out = Files.createTempDirectory("graft_warcstream_out").toString
    Files.write(Paths.get(dir, "w-0.warc"), segBytes(0))
    def start() = spark.readStream.format("warc").load(dir)
      .select("warc_name", "target_uri")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    val q = start()
    try {
      q.processAllAvailable()
      Files.write(Paths.get(dir, "w-1.warc"), segBytes(1))
      q.processAllAvailable()
      val got = spark.read.parquet(out)
        .collect().map(_.getString(1)).sorted.toSeq
      assert(got == Seq("https://w0.com/", "https://w1.com/"))
    } finally q.stop()
    // restart on the SAME checkpoint: the committed seen-file log
    // survives, nothing replays, a NEW arrival still lands
    Files.write(Paths.get(dir, "w-2.warc"), segBytes(2))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(out)
        .collect().map(_.getString(1)).sorted.toSeq
      assert(got == Seq("https://w0.com/", "https://w1.com/",
        "https://w2.com/"))
    } finally q2.stop()
  }
}
