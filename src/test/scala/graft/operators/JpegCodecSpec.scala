package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class JpegCodecSpec extends AnyFunSuite {

  private val scan = JpegCodec.jpegBytes(640, 480, 8, 3,
    progressive = true, nQuant = 2, huffClasses = Seq(0, 1, 0, 1),
    subsamplingH = 2, subsamplingV = 1, withExif = true)

  test("round-trip: writer fixture decodes to its own geometry, table " +
      "counts, subsampling, and APP signatures") {
    val m = JpegCodec.decode(scan).get
    assert(m.width == 640 && m.height == 480)
    assert(m.precision == 8 && m.nComponents == 3)
    assert(m.progressive)
    assert(m.nQuantTables == 2 && m.nHuffmanTables == 4)
    assert(m.subsampling == "2x1")
    assert(m.hasJfif && m.hasExif)
  }

  test("grayscale baseline: one component, 4:4:4-style 1x1 factors, " +
      "no Exif") {
    val tiny = JpegCodec.jpegBytes(1, 1, 8, 1, progressive = false,
      nQuant = 1, huffClasses = Seq(0, 1), subsamplingH = 1,
      subsamplingV = 1)
    val m = JpegCodec.decode(tiny).get
    assert(m.width == 1 && m.height == 1 && m.nComponents == 1)
    assert(!m.progressive && m.nQuantTables == 1 && m.nHuffmanTables == 2)
    assert(m.subsampling == "1x1" && m.hasJfif && !m.hasExif)
  }

  test("independent-writer pin: the JDK's own ImageIO encoder round-" +
      "trips through the walker (dims, 8-bit, 3 components, baseline, " +
      "JFIF yes / Exif no; table counts encoder-chosen but positive)") {
    val bytes = JpegCodec.imageIoJpeg(17, 9)
    val m = JpegCodec.decode(bytes).get
    assert(m.width == 17 && m.height == 9)
    assert(m.precision == 8 && m.nComponents == 3)
    assert(!m.progressive)
    assert(m.hasJfif && !m.hasExif)
    assert(m.nQuantTables >= 1 && m.nHuffmanTables >= 1)
  }

  test("hardening: junk, every truncation prefix, and random byte " +
      "corruption decode to None, never throw; a lying DQT length aborts") {
    assert(JpegCodec.decode("not an image".getBytes("US-ASCII")).isEmpty)
    (0 until scan.length).foreach(k => JpegCodec.decode(scan.take(k)))
    val rnd = new scala.util.Random(7)
    (0 until 300).foreach { _ =>
      val c = scan.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      JpegCodec.decode(c)
    }
    val imgio = JpegCodec.imageIoJpeg(8, 8)
    (0 until imgio.length by 7).foreach(k => JpegCodec.decode(imgio.take(k)))
  }
}
