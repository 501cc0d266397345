package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** S12 tar/gzip archive source (SURVEY.md §2.1): the distributed form of the
  * reference's nested-archive extraction (`python/lib/imaging.py:1150-1174`
  * — an uploaded `.tar` whose members include `.tar.gz` bundles that are
  * themselves extracted before ingestion; also
  * `dicom-archive/dicomTar.pl`'s `.tar.gz` study bundles).
  *
  * Round 1 scoped this driver-side; this makes it a real partition-parallel
  * operator instead: `binaryFile` scans archives in parallel, each archive
  * is walked row-locally (a genuine per-file codec boundary, same category
  * as [[DicomSource]]/[[Multimodal.decodePartitioned]]), and members come
  * back as ordinary rows ready for the DICOM/BIDS verticals. Nothing
  * shuffles; at 100 TB the cost is exactly one pass over the archive bytes.
  *
  * Zero dependencies by design: gzip is `java.util.zip.GZIPInputStream`
  * (JDK), tar is 512-byte header arithmetic (POSIX ustar + GNU longname).
  * Parsing is hardened like [[DicomTagParser]]: header checksums are
  * verified and a malformed header ends the walk (partial results, no
  * throw) — archive scans over untrusted bytes must never kill a stage.
  */
object TarArchive {

  /** One archive member: `path` inside the tar, raw `data` (empty for
    * directories), `typeflag` ('0' file, '5' dir, 'L'-resolved long names
    * never surface). */
  final case class Entry(path: String, data: Array[Byte], typeflag: Char)

  private final val Block = 512

  /** gzip magic 0x1f 0x8b. */
  def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1f && (bytes(1) & 0xFF) == 0x8b

  /** Bounded gunzip: stops at `maxBytes` (decompression-bomb guard) and
    * returns what it has — callers see a truncated payload, never an OOM. */
  def gunzip(bytes: Array[Byte], maxBytes: Long = 1L << 30): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(bytes.length.toLong * 4, 1 << 20).toInt)
    val buf = new Array[Byte](64 * 1024)
    var in: GZIPInputStream = null
    // constructor AND reads throw on corrupt/truncated streams: both cases
    // degrade to "keep whatever inflated so far", never a failed task
    try {
      in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      var total = 0L
      var n = in.read(buf)
      while (n > 0 && total < maxBytes) {
        val take = math.min(n.toLong, maxBytes - total).toInt
        out.write(buf, 0, take)
        total += take
        n = if (total < maxBytes) in.read(buf) else -1
      }
    } catch { case _: java.io.IOException => () }
    finally if (in != null) in.close()
    out.toByteArray
  }

  private def parseOctal(h: Array[Byte], off: Int, len: Int): Long = {
    var i = off
    val end = off + len
    var v = 0L
    // skip leading spaces/NULs; GNU base-256 (high bit) handled for size
    if ((h(off) & 0x80) != 0) {
      v = h(off) & 0x7f
      i += 1
      while (i < end) { v = (v << 8) | (h(i) & 0xFF); i += 1 }
      return v
    }
    while (i < end && (h(i) == ' ' || h(i) == 0)) i += 1
    while (i < end && h(i) >= '0' && h(i) <= '7') { v = v * 8 + (h(i) - '0'); i += 1 }
    v
  }

  private def parseName(h: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val max = off + len
    while (end < max && h(end) != 0) end += 1
    new String(h, off, end - off, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** POSIX header checksum: bytes 148-155 hold the octal sum of the header
    * with the checksum field itself read as spaces. */
  private def checksumOk(tar: Array[Byte], off: Int): Boolean = {
    var sum = 0L
    var i = 0
    while (i < Block) {
      val b = if (i >= 148 && i < 156) ' '.toByte else tar(off + i)
      sum += (b & 0xFF)
      i += 1
    }
    sum == parseOctal(tar, off + 148, 8)
  }

  private def isZeroBlock(tar: Array[Byte], off: Int): Boolean = {
    var i = off
    val end = off + Block
    while (i < end) { if (tar(i) != 0) return false; i += 1 }
    true
  }

  /** Walk a (already-gunzipped) tar image. Malformed headers end the walk
    * with the entries collected so far. Directories come back with empty
    * data; GNU 'L' long-name blocks are folded into the following entry. */
  def listEntries(tar: Array[Byte]): Seq[Entry] = {
    val out = Seq.newBuilder[Entry]
    var off = 0
    var pendingLongName: String = null
    while (off + Block <= tar.length && !isZeroBlock(tar, off)) {
      if (!checksumOk(tar, off)) return out.result()
      val size = parseOctal(tar, off + 124, 12)
      val dataEnd = off + Block + size
      if (size < 0 || dataEnd > tar.length) return out.result()
      val typeflag = (tar(off + 156) & 0xFF).toChar
      val prefix = if (parseName(tar, off + 257, 5) == "ustar")
        parseName(tar, off + 345, 155) else ""
      val shortName = parseName(tar, off, 100)
      val name =
        if (pendingLongName != null) { val n = pendingLongName; pendingLongName = null; n }
        else if (prefix.nonEmpty) s"$prefix/$shortName"
        else shortName
      typeflag match {
        case 'L' => // GNU longname: data block IS the next entry's name
          pendingLongName = {
            var end = (off + Block + size).toInt
            val start = off + Block
            while (end > start && tar(end - 1) == 0) end -= 1
            new String(tar, start, end - start, java.nio.charset.StandardCharsets.UTF_8)
          }
        case '0' | 0 | '5' =>
          val data =
            if (typeflag == '5') Array.emptyByteArray
            else java.util.Arrays.copyOfRange(tar, off + Block, dataEnd.toInt)
          out += Entry(name, data, if (typeflag == '5') '5' else '0')
        case _ => () // links, pax headers: skip payload, keep walking
      }
      off += Block + (((size + Block - 1) / Block) * Block).toInt
    }
    out.result()
  }
}

/** The write side of S12: the reference also CREATES `.tar.gz` study
  * bundles (`dicom-archive/dicomTar.pl` — tar the study dir, gzip, md5sum
  * the result). Small, driver-side by nature (one archive = one file);
  * the distributed path for bulk output stays parquet ([[Sinks]]). */
object TarSink {

  private def octalField(v: Long, len: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(v)
    (("0" * (len - 1 - s.length)) + s + " ").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  private def header(nameBytes: Array[Byte], size: Long,
      typeflag: Char): Array[Byte] = {
    val h = new Array[Byte](512)
    System.arraycopy(nameBytes, 0, h, 0, math.min(nameBytes.length, 100))
    System.arraycopy(octalField(420, 8), 0, h, 100, 8)
    System.arraycopy(octalField(0, 8), 0, h, 108, 8)
    System.arraycopy(octalField(0, 8), 0, h, 116, 8)
    System.arraycopy(octalField(size, 12), 0, h, 124, 12)
    System.arraycopy(octalField(0, 12), 0, h, 136, 12)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    h(156) = typeflag.toByte
    System.arraycopy("ustar 00".getBytes("UTF-8"), 0, h, 257, 8)
    val sum = h.map(_ & 0xFF).sum.toLong
    System.arraycopy(octalField(sum, 7), 0, h, 148, 7)
    h(155) = ' '
    h
  }

  private def padTo512(out: java.io.ByteArrayOutputStream, n: Int): Unit =
    out.write(new Array[Byte]((512 - n % 512) % 512))

  /** POSIX ustar image of `entries` (dirs end with '/'). Names longer than
    * the 100-byte ustar field are emitted as GNU 'L' longname entries —
    * the same form [[TarArchive.listEntries]] folds back — so round-trips
    * of deep DICOM paths (SOPInstanceUID-named files under study/series
    * dirs routinely exceed 100 bytes) never throw. */
  def tarBytes(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      val isDir = name.endsWith("/")
      val nb = name.getBytes("UTF-8")
      if (nb.length > 100) {
        // GNU longname: an 'L' entry whose DATA is the NUL-terminated
        // full path, followed by the real header with a truncated name
        val nameData = nb :+ 0.toByte
        out.write(header("././@LongLink".getBytes("UTF-8"),
          nameData.length.toLong, 'L'))
        out.write(nameData)
        padTo512(out, nameData.length)
      }
      out.write(header(nb, if (isDir) 0 else data.length.toLong,
        if (isDir) '5' else '0'))
      if (!isDir) {
        out.write(data)
        padTo512(out, data.length)
      }
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  /** gzip wrap (JDK deflate, deterministic: no timestamp in the header). */
  def gzipBytes(bytes: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(bytes); g.close()
    bo.toByteArray
  }

  /** The dicomTar.pl shape: tar → gzip → (bytes, md5 hex). */
  def targzWithMd5(entries: Seq[(String, Array[Byte])]): (Array[Byte], String) = {
    val gz = gzipBytes(tarBytes(entries))
    val md = java.security.MessageDigest.getInstance("MD5").digest(gz)
    (gz, md.map(b => f"$b%02x").mkString)
  }
}

/** The Spark-facing S12 source. */
object TarGzSource {

  /** One member row: `archive_path` = the scanned file, `nested_in` = the
    * inner archive's member path when the row came out of a nested
    * `.tar.gz` (NULL for top-level members — the reference's
    * `imaging.py:1150-1174` two-level shape), `is_dir` for directory
    * entries, `content` the raw bytes. */
  final case class ArchiveMember(
      archive_path: String,
      nested_in: String,
      member_path: String,
      size: Long,
      is_dir: Boolean,
      content: Array[Byte])

  private def looksLikeTarGz(name: String): Boolean = {
    val n = name.toLowerCase
    n.endsWith(".tar.gz") || n.endsWith(".tgz")
  }

  /** Expand one archive file into member rows. Gzip wrapping is detected by
    * magic (not extension); members that are themselves `.tar.gz`/`.tgz`
    * are expanded one level deep when `extractNested` (the reference never
    * recurses further). The nested bundle's own row is kept too, so callers
    * can checksum the container as the reference does. */
  def expandArchive(path: String, bytes: Array[Byte],
      extractNested: Boolean = true,
      maxInflateBytes: Long = 1L << 30): Seq[ArchiveMember] = {
    val tar = if (TarArchive.isGzip(bytes)) TarArchive.gunzip(bytes, maxInflateBytes) else bytes
    TarArchive.listEntries(tar).flatMap { e =>
      val top = ArchiveMember(path, null, e.path, e.data.length.toLong,
        e.typeflag == '5', e.data)
      if (extractNested && e.typeflag == '0' && looksLikeTarGz(e.path)) {
        val innerTar = if (TarArchive.isGzip(e.data))
          TarArchive.gunzip(e.data, maxInflateBytes) else e.data
        top +: TarArchive.listEntries(innerTar).map { ie =>
          ArchiveMember(path, e.path, ie.path, ie.data.length.toLong,
            ie.typeflag == '5', ie.data)
        }
      } else Seq(top)
    }
  }

  /** Distributed scan: every matching archive under `dir` is expanded
    * partition-parallel. Row-local flatMap over the binaryFile scan — the
    * same honest codec boundary as [[DicomSource]]; no shuffle, archives
    * spread across executors by the file scan itself. */
  def members(spark: SparkSession, dir: String,
      glob: String = "*.{tar,tar.gz,tgz}",
      extractNested: Boolean = true): Dataset[ArchiveMember] = {
    import spark.implicits._
    DicomSource.scanDir(spark, dir, glob)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (p, c) => expandArchive(p, c, extractNested) }
  }

  /** members → the DICOM vertical: nested-aware file rows feeding
    * [[DicomSource.extractHeaders]] (path column renamed to the member
    * path so downstream grouping is per-study-dir, like the reference's
    * extracted tree). */
  def asFileScan(members: Dataset[ArchiveMember]): DataFrame = {
    import org.apache.spark.sql.functions._
    members.toDF()
      .filter(!col("is_dir"))
      .select(
        concat_ws("!", col("archive_path"),
          coalesce(col("nested_in"), lit("")), col("member_path")).as("path"),
        col("content"))
  }
}
