package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** dcmodify --insert semantics over the Part-10 walker: modify in place,
  * insert in tag order, padding rules, implicit VR, non-DICOM gate. */
class DicomTagWriterSpec extends AnyFunSuite {

  private def fixture: Array[Byte] = SyntheticFixtures.dicomBytes(Seq(
    SyntheticFixtures.dicomElem(0x0008, 0x0020, "DA", "20240102"),
    SyntheticFixtures.dicomElem(0x0010, 0x0010, "PN", "OLD^NAME"),
    SyntheticFixtures.dicomElem(0x0020, 0x000D, "UI", "1.2.3"),
    SyntheticFixtures.dicomElem(0x0020, 0x0011, "IS", "2")))

  test("modify existing value, shorter and longer") {
    val shorter = DicomTagWriter.setTags(fixture,
      Map(0x00100010 -> "AB"))
    assert(DicomTagParser.parse(shorter)("patient_name") == "AB")
    val longer = DicomTagWriter.setTags(fixture,
      Map(0x00100010 -> "A MUCH LONGER NAME THAN BEFORE"))
    val p = DicomTagParser.parse(longer)
    assert(p("patient_name") == "A MUCH LONGER NAME THAN BEFORE")
    // neighbours undisturbed
    assert(p("study_date") == "20240102")
    assert(p("series_number") == "2")
  }

  test("insert places the element in ascending tag order") {
    val out = DicomTagWriter.setTags(fixture,
      Map(0x00080080 -> "BIC",         // between 0008,0020 and 0010,0010
        0x0008103E -> "t1 mprage",     // same gap
        0x0020000E -> "9.9.9.1"))      // after 0020,000D
    val p = DicomTagParser.parse(out)
    assert(p("institution") == "BIC")
    assert(p("series_description") == "t1 mprage")
    assert(p("series_uid") == "9.9.9.1")
    // ascending-order structural proof: a second writer pass still walks it
    val again = DicomTagWriter.setTags(out, Map(0x00080080 -> "MNI"))
    assert(DicomTagParser.parse(again)("institution") == "MNI")
    // tag bytes really are sorted
    def tagAt(b: Array[Byte], pos: Int): Long =
      (((b(pos) & 0xFF) | ((b(pos + 1) & 0xFF) << 8)).toLong << 16) |
        ((b(pos + 2) & 0xFF) | ((b(pos + 3) & 0xFF) << 8)).toLong
    var pos = 132
    // skip file meta (single UI element in the fixture builder)
    pos += 8 + 20
    var last = -1L
    while (pos + 8 <= out.length) {
      val t = tagAt(out, pos)
      assert(t > last, s"tags out of order at $pos")
      last = t
      val len = (out(pos + 6) & 0xFF) | ((out(pos + 7) & 0xFF) << 8)
      pos += 8 + len
    }
  }

  test("odd-length values pad: space for text, NUL for UI") {
    val out = DicomTagWriter.setTags(fixture,
      Map(0x00100010 -> "ODD", 0x0020000D -> "1.2.3.4.5"))
    val p = DicomTagParser.parse(out)
    assert(p("patient_name") == "ODD")     // trailing space stripped by trim
    assert(p("study_uid") == "1.2.3.4.5")  // trailing NUL stripped
    // even total length: the full stream stays walkable
    assert(out.length % 2 == 0)
  }

  test("append at end when tag is greater than all existing") {
    val out = DicomTagWriter.setTags(fixture, Map(0x00200013 -> "7"))
    assert(DicomTagParser.parse(out)("instance_number") == "7")
  }

  test("implicit-VR dataset: modify and insert without VR bytes") {
    import java.io.ByteArrayOutputStream
    import java.nio.charset.StandardCharsets.US_ASCII
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def implicitElem(group: Int, elem: Int, value: String): Array[Byte] = {
      val v0 = value.getBytes(US_ASCII)
      val v = if (v0.length % 2 == 0) v0 else v0 :+ ' '.toByte
      val o = new ByteArrayOutputStream()
      o.write(le16(group)); o.write(le16(elem))
      o.write(le16(v.length)); o.write(le16(0))
      o.write(v); o.toByteArray
    }
    val o = new ByteArrayOutputStream()
    o.write(new Array[Byte](128)); o.write("DICM".getBytes(US_ASCII))
    o.write(SyntheticFixtures.dicomElem(0x0002, 0x0010, "UI",
      "1.2.840.10008.1.2"))
    o.write(implicitElem(0x0010, 0x0010, "OLD^NAME"))
    o.write(implicitElem(0x0020, 0x000D, "1.2.3"))
    val in = o.toByteArray
    val out = DicomTagWriter.setTags(in,
      Map(0x00100010 -> "NEW^NAME", 0x00100020 -> "PID42"))
    val p = DicomTagParser.parse(out)
    assert(p("patient_name") == "NEW^NAME")
    assert(p("patient_id") == "PID42")
    assert(p("study_uid") == "1.2.3")
  }

  test("non-DICOM input returns null (the fileIsDicom gate)") {
    assert(DicomTagWriter.setTags("not dicom".getBytes, Map(1 -> "x")) == null)
  }

  test("tag spec parsing: both script spellings") {
    assert(DicomTagWriter.parseTagSpec("(0008,0080)").contains(0x00080080))
    assert(DicomTagWriter.parseTagSpec("PatientName").contains(0x00100010))
    assert(DicomTagWriter.parseTagSpec("NoSuchField").isEmpty)
  }
}
