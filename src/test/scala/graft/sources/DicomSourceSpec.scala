package graft.sources

import graft.SparkSpec
import java.io.ByteArrayOutputStream
import java.nio.file.Files

/** Synthetic-byte DICOM fixtures: hand-assembled Part-10 streams (explicit
  * and implicit VR little-endian, with sequences) asserting the real tag
  * walker field by field — no codec, no external files. */
class DicomSourceSpec extends SparkSpec {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def pad(s: String): Array[Byte] = {
    val b = s.getBytes("ISO-8859-1")
    if (b.length % 2 == 0) b else b :+ ' '.toByte
  }

  private def explicitElem(group: Int, elem: Int, vr: String, value: String): Array[Byte] = {
    val v = pad(value)
    val o = new ByteArrayOutputStream()
    o.write(le16(group)); o.write(le16(elem)); o.write(vr.getBytes("US-ASCII"))
    if (Set("OB", "OW", "SQ", "UT", "UN").contains(vr)) {
      o.write(Array(0.toByte, 0.toByte)); o.write(le32(v.length))
    } else o.write(le16(v.length))
    o.write(v)
    o.toByteArray
  }

  private def implicitElem(group: Int, elem: Int, value: String): Array[Byte] = {
    val v = pad(value)
    val o = new ByteArrayOutputStream()
    o.write(le16(group)); o.write(le16(elem)); o.write(le32(v.length)); o.write(v)
    o.toByteArray
  }

  /** preamble + DICM + file meta declaring `ts`, followed by `body`. */
  private def part10(ts: String, body: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(new Array[Byte](128)); o.write("DICM".getBytes)
    o.write(explicitElem(0x0002, 0x0010, "UI", ts))
    o.write(body)
    o.toByteArray
  }

  private val ExplicitLE = "1.2.840.10008.1.2.1"
  private val ImplicitLE = "1.2.840.10008.1.2"

  test("explicit-VR: all 26 summary fields parse; sequences skipped; stop before pixel groups") {
    val o = new ByteArrayOutputStream()
    o.write(explicitElem(0x0008, 0x0020, "DA", "20240131"))
    o.write(explicitElem(0x0008, 0x0060, "CS", "MR"))
    o.write(explicitElem(0x0008, 0x0070, "LO", "SIEMENS"))
    o.write(explicitElem(0x0008, 0x0080, "LO", "MNI"))
    o.write(explicitElem(0x0008, 0x1090, "LO", "Prisma"))
    o.write(explicitElem(0x0008, 0x103E, "LO", "t1_mprage"))
    // defined-length SQ between wanted tags: content must be skipped wholesale
    val inner = explicitElem(0x0008, 0x0100, "SH", "SHOULD-NOT-LEAK")
    val item = le16(0xFFFE) ++ le16(0xE000) ++ le32(inner.length) ++ inner
    o.write(le16(0x0008)); o.write(le16(0x1110)); o.write("SQ".getBytes)
    o.write(Array(0.toByte, 0.toByte)); o.write(le32(item.length)); o.write(item)
    o.write(explicitElem(0x0010, 0x0010, "PN", "DOE^JOHN"))
    o.write(explicitElem(0x0010, 0x0020, "LO", "DCC0001_123456_V1"))
    o.write(explicitElem(0x0010, 0x0030, "DA", "19900515"))
    o.write(explicitElem(0x0010, 0x0040, "CS", "M"))
    o.write(explicitElem(0x0018, 0x0024, "SH", "*tfl3d1_16ns"))
    o.write(explicitElem(0x0018, 0x0050, "DS", "1.000000"))
    o.write(explicitElem(0x0018, 0x0080, "DS", "2300.007"))
    o.write(explicitElem(0x0018, 0x0081, "DS", "2.981"))
    o.write(explicitElem(0x0018, 0x0082, "DS", "900"))
    o.write(explicitElem(0x0018, 0x0086, "IS", "1"))
    o.write(explicitElem(0x0018, 0x1000, "LO", "SN123456"))
    o.write(explicitElem(0x0018, 0x1020, "LO", "syngo MR E11"))
    o.write(explicitElem(0x0018, 0x1312, "CS", "ROW"))
    o.write(explicitElem(0x0020, 0x000D, "UI", "1.2.840.113619.2.1"))
    o.write(explicitElem(0x0020, 0x000E, "UI", "1.2.840.113619.2.1.1"))
    o.write(explicitElem(0x0020, 0x0011, "IS", "2"))
    o.write(explicitElem(0x0020, 0x0013, "IS", "42"))
    val bytes = part10(ExplicitLE, o.toByteArray)

    val tags = DicomTagParser.parse(bytes)
    assert(tags("study_uid") == "1.2.840.113619.2.1")
    assert(tags("series_uid") == "1.2.840.113619.2.1.1")
    assert(tags("series_number") == "2")
    assert(tags("instance_number") == "42")
    assert(tags("echo_number") == "1")
    assert(tags("repetition_time") == "2300.007")
    assert(tags("echo_time") == "2.981")
    assert(tags("inversion_time") == "900")
    assert(tags("study_date") == "20240131")
    assert(tags("patient_name") == "DOE^JOHN")
    assert(tags("patient_dob") == "19900515")
    assert(tags("patient_id") == "DCC0001_123456_V1")
    assert(tags("series_description") == "t1_mprage")
    assert(tags("patient_sex") == "M")
    assert(tags("scanner_model") == "Prisma")
    assert(tags("software_version") == "syngo MR E11")
    assert(tags("institution") == "MNI")
    assert(tags("sequence_name") == "*tfl3d1_16ns")
    assert(tags("slice_thickness") == "1.000000")
    assert(tags("phase_encoding") == "ROW")
    assert(tags("manufacturer") == "SIEMENS")
    assert(tags("scanner_serial") == "SN123456")
    assert(tags("modality") == "MR")
    assert(!tags.values.exists(_.contains("SHOULD-NOT-LEAK")))
  }

  test("implicit-VR transfer syntax parses the same text tags") {
    val o = new ByteArrayOutputStream()
    o.write(implicitElem(0x0008, 0x0060, "PT"))
    o.write(implicitElem(0x0010, 0x0020, "SUBJ42"))
    o.write(implicitElem(0x0020, 0x000D, "9.8.7"))
    o.write(implicitElem(0x0020, 0x0011, "7"))
    val tags = DicomTagParser.parse(part10(ImplicitLE, o.toByteArray))
    assert(tags("modality") == "PT")
    assert(tags("patient_id") == "SUBJ42")
    assert(tags("study_uid") == "9.8.7")
    assert(tags("series_number") == "7")
  }

  test("undefined-length SQ with nested undefined-length item is skipped") {
    val o = new ByteArrayOutputStream()
    o.write(explicitElem(0x0008, 0x0060, "CS", "MR"))
    // SQ len=FFFFFFFF > item len=FFFFFFFF > elem > item delim > seq delim
    o.write(le16(0x0008)); o.write(le16(0x1115)); o.write("SQ".getBytes)
    o.write(Array(0.toByte, 0.toByte)); o.write(le32(0xFFFFFFFFL))
    o.write(le16(0xFFFE)); o.write(le16(0xE000)); o.write(le32(0xFFFFFFFFL))
    o.write(explicitElem(0x0008, 0x0100, "SH", "NESTED"))
    o.write(le16(0xFFFE)); o.write(le16(0xE00D)); o.write(le32(0))
    o.write(le16(0xFFFE)); o.write(le16(0xE0DD)); o.write(le32(0))
    o.write(explicitElem(0x0020, 0x0011, "IS", "3"))
    val tags = DicomTagParser.parse(part10(ExplicitLE, o.toByteArray))
    assert(tags("modality") == "MR")
    assert(tags("series_number") == "3")
  }

  test("fuzz: random and mutated byte streams never crash or hang the walker") {
    val rnd = new scala.util.Random(99)
    // pure random garbage behind a valid magic
    for (_ <- 1 to 200) {
      val len = rnd.nextInt(600)
      val b = new Array[Byte](132 + len)
      rnd.nextBytes(b)
      System.arraycopy("DICM".getBytes, 0, b, 128, 4)
      val out = DicomTagParser.parse(b) // must terminate, never throw
      assert(out != null)
    }
    // mutations of a valid stream: flip random bytes after the preamble
    val o = new ByteArrayOutputStream()
    o.write(explicitElem(0x0008, 0x0060, "CS", "MR"))
    o.write(explicitElem(0x0020, 0x0011, "IS", "3"))
    val valid = part10(ExplicitLE, o.toByteArray)
    for (_ <- 1 to 300) {
      val b = valid.clone()
      for (_ <- 0 to rnd.nextInt(4)) {
        b(132 + rnd.nextInt(b.length - 132)) = rnd.nextInt(256).toByte
      }
      DicomTagParser.parse(b) // any partial result is fine; no crash/hang
    }
  }

  test("non-DICOM bytes -> null map; truncated file returns partial without crashing") {
    assert(DicomTagParser.parse("not a dicom at all".getBytes) == null)
    val o = new ByteArrayOutputStream()
    o.write(explicitElem(0x0008, 0x0060, "CS", "MR"))
    val full = part10(ExplicitLE, o.toByteArray)
    val truncated = full.dropRight(3)
    val tags = DicomTagParser.parse(truncated)
    assert(tags != null && !tags.contains("modality")) // header ok, value cut off
  }

  test("END-TO-END: dir scan -> real tag parse -> DicomSummary study tables") {
    val dir = Files.createTempDirectory("dicom_study")
    def file(series: Int, instance: Int, echoTime: String): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(explicitElem(0x0008, 0x0020, "DA", "20240131"))
      o.write(explicitElem(0x0008, 0x0060, "CS", "MR"))
      o.write(explicitElem(0x0008, 0x0070, "LO", "SIEMENS"))
      o.write(explicitElem(0x0008, 0x1090, "LO", "Prisma"))
      o.write(explicitElem(0x0010, 0x0010, "PN", "DOE^JANE"))
      o.write(explicitElem(0x0010, 0x0020, "LO", "DCC0001_123456_V1"))
      o.write(explicitElem(0x0010, 0x0030, "DA", "19900515"))
      o.write(explicitElem(0x0010, 0x0040, "CS", "F"))
      o.write(explicitElem(0x0018, 0x0081, "DS", echoTime))
      o.write(explicitElem(0x0020, 0x000D, "UI", "1.2.3.study"))
      o.write(explicitElem(0x0020, 0x000E, "UI", s"1.2.3.series.$series"))
      o.write(explicitElem(0x0020, 0x0011, "IS", series.toString))
      o.write(explicitElem(0x0020, 0x0013, "IS", instance.toString))
      part10(ExplicitLE, o.toByteArray)
    }
    // series 1: two files; series 2: one file (distinct echo); plus a
    // non-DICOM stray — the reference's "other file" branch
    Files.write(dir.resolve("s1_i1.dcm"), file(1, 1, "2.98"))
    Files.write(dir.resolve("s1_i2.dcm"), file(1, 2, "2.98"))
    Files.write(dir.resolve("s2_i1.dcm"), file(2, 1, "10.5"))
    Files.write(dir.resolve("notes.txt"), "not dicom".getBytes)

    val scanned = DicomSource.toSummaryInput(
      DicomSource.extractHeaders(DicomSource.scanDir(spark, dir.toString)))
    val tables = graft.operators.DicomSummary.summarize(scanned)

    val t = tables.tarchive.collect()(0)
    assert(t.getAs[String]("DicomArchiveID") == "1.2.3.study")
    assert(t.getAs[Int]("DicomFileCount") == 3)
    assert(t.getAs[Int]("NonDicomFileCount") == 1)
    assert(t.getAs[Int]("AcquisitionCount") == 2)
    assert(t.getAs[String]("PatientName") == "DOE^JANE")
    assert(t.getAs[String]("ScannerManufacturer") == "SIEMENS")
    // 2024-01-31 minus 1990-05-15: 34y -4m +16d -> N=4380*34-365*4+12*16 =
    // 147652; floor((14765200+2190)/4380)/100 = 33.71
    assert(math.abs(t.getAs[Double]("AgeAtScan") - 33.71) < 1e-9)

    val series = tables.series.collect()
    assert(series.length == 2)
    assert(series.map(_.getAs[Int]("NumberOfFiles")).sorted.toSeq == Seq(1, 2))
    // TE parsed and nearest(0.01)-rounded from the DS tag
    assert(series.map(_.getAs[Double]("EchoTime")).sorted.toSeq == Seq(2.98, 10.5))
  }

  test("binaryFile scan + typed extractHeaders over a mixed directory") {
    val dir = Files.createTempDirectory("dicom")
    val sub = Files.createDirectory(dir.resolve("series1"))
    val o = new ByteArrayOutputStream()
    o.write(explicitElem(0x0008, 0x0060, "CS", "MR"))
    o.write(explicitElem(0x0018, 0x0081, "DS", "2.984"))
    o.write(explicitElem(0x0020, 0x0011, "IS", "5"))
    o.write(explicitElem(0x0020, 0x0013, "IS", "17"))
    Files.write(sub.resolve("img1.dcm"), part10(ExplicitLE, o.toByteArray))
    Files.write(dir.resolve("README.txt"), "not a dicom".getBytes)

    val out = DicomSource.extractHeaders(DicomSource.scanDir(spark, dir.toString))
      .collect().map(r => r.getAs[String]("file_path").split("/").last -> r).toMap
    assert(out.size == 2)
    val img = out("img1.dcm")
    assert(img.getAs[Boolean]("is_dicom"))
    assert(img.getAs[String]("modality") == "MR")
    assert(img.getAs[Int]("series_number") == 5)
    assert(img.getAs[Int]("instance_number") == 17)
    // DS 2.984 -> nearest(0.01) = 2.98 like DCMSUM.pm:806-809
    assert(math.abs(img.getAs[Double]("echo_time") - 2.98) < 1e-9)
    val txt = out("README.txt")
    assert(!txt.getAs[Boolean]("is_dicom"))
    assert(txt.isNullAt(txt.fieldIndex("modality")))
  }
}
