package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class JpegExifSpec extends AnyFunSuite {

  private val leApp1 = JpegCodec.exifApp1(le = true, Seq(
    (0x0112, 3, Seq(6)),                       // orientation: rotate 90 CW
    (0x010F, 2, Seq("ACME")),                  // make (5 bytes -> offset)
    (0x0110, 2, Seq("X100")),                  // model
    (0x0132, 2, Seq("2020:01:02 03:04:05")),   // datetime
    (0x011A, 5, Seq(72, 1))))                  // XResolution 72/1 rational
  private val beApp1 = JpegCodec.exifApp1(le = false, Seq(
    (0x0112, 3, Seq(1)),
    (0x010F, 2, Seq("MMCO"))))
  private val leJpeg = JpegCodec.jpegBytesWithExif(33, 21, leApp1)
  private val beJpeg = JpegCodec.jpegBytesWithExif(8, 8, beApp1)

  test("round-trip: little-endian IFD0 renders every entry (inline " +
      "SHORT, offset ASCII, rational)") {
    val es = JpegCodec.exifEntries(leJpeg).get
    assert(es.map(e => (e.tag, e.tpe, e.count, e.value)) == Seq(
      (0x0112, 3, 1L, "6"),
      (0x010F, 2, 5L, "ACME"),
      (0x0110, 2, 5L, "X100"),
      (0x0132, 2, 20L, "2020:01:02 03:04:05"),
      (0x011A, 5, 1L, "72/1")))
    assert(JpegCodec.exifSummary(leJpeg).get ==
      ((6, "ACME", "X100", "2020:01:02 03:04:05")))
    // the spliced APP1 also flips the walker's has_exif flag
    assert(JpegCodec.decode(leJpeg).get.hasExif)
    assert(JpegCodec.decode(leJpeg).get.width == 33)
  }

  test("big-endian (MM) IFD0 parses identically; absent tags are null " +
      "in the summary") {
    val es = JpegCodec.exifEntries(beJpeg).get
    assert(es.map(e => (e.tag, e.value)) ==
      Seq((0x0112, "1"), (0x010F, "MMCO")))
    assert(JpegCodec.exifSummary(beJpeg).get ==
      ((1, "MMCO", null, null)))
  }

  test("no-EXIF files (incl. the JDK ImageIO encoder's output) return " +
      "None, not a throw") {
    assert(JpegCodec.exifEntries(JpegCodec.jpegBytes(4, 4, 8, 1,
      progressive = false, nQuant = 1, huffClasses = Seq(0))).isEmpty)
    assert(JpegCodec.exifEntries(JpegCodec.imageIoJpeg(5, 5)).isEmpty)
    assert(JpegCodec.exifEntries("junk".getBytes("US-ASCII")).isEmpty)
  }

  test("hardening: every truncation prefix and a lying IFD entry count " +
      "abort to None, never throw or overread") {
    (0 until leJpeg.length).foreach(k => JpegCodec.exifEntries(
      leJpeg.take(k)))
    val rnd = new scala.util.Random(23)
    (0 until 300).foreach { _ =>
      val c = leJpeg.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      JpegCodec.exifEntries(c)
      JpegCodec.exifSummary(c)
    }
  }
}
