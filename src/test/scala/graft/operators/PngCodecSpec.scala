package graft.operators

import graft.SparkSpec
import graft.sources.SyntheticFixtures.pngBytes

/** [[PngCodec]] — the hand-rolled chunk-walk/inflate/defilter decoder,
  * cross-checked against the JDK's independent ImageIO encoder (its own
  * filter heuristics and zlib stream), plus hardening: truncation,
  * out-of-scope formats, and the raster-bounded inflate. */
class PngCodecSpec extends SparkSpec {

  private val rng = new scala.util.Random(7)

  test("ImageIO round trip: random RGB images decode pixel-exact") {
    for (_ <- 1 to 5) {
      val w = 1 + rng.nextInt(40)
      val h = 1 + rng.nextInt(40)
      val img = Seq.fill(h)(Seq.fill(w)(rng.nextInt(1 << 24)))
      val out = PngCodec.decode(pngBytes(img)).get
      assert(out.width == w && out.height == h && out.colorType == 2)
      assert(out.pixels.map(_.toSeq).toSeq == img)
    }
  }

  test("large gradient image (exercises Sub/Up/Average/Paeth filter rows)") {
    // smooth gradients make ImageIO's filter heuristic pick non-None
    // filters; a 200x80 ramp covers every direction of prediction
    val img = (0 until 80).map(y => (0 until 200).map(x =>
      (((x * 255 / 199) << 16) | ((y * 255 / 79) << 8) | ((x + y) & 0xFF))))
    val out = PngCodec.decode(pngBytes(img)).get
    assert(out.pixels.map(_.toSeq).toSeq == img)
  }

  test("grayscale replicates into RGB; alpha channel is dropped") {
    val g = Seq(Seq(0, 128), Seq(255, 7))
    val og = PngCodec.decode(pngBytes(g, gray = true)).get
    assert(og.colorType == 0)
    assert(og.pixels(0)(1) == 0x808080 && og.pixels(1)(0) == 0xFFFFFF &&
      og.pixels(1)(1) == 0x070707)
    val a = Seq(Seq(0x123456, 0x00FF00))
    val oa = PngCodec.decode(pngBytes(a, alpha = true)).get
    assert(oa.colorType == 6)
    assert(oa.pixels(0).toSeq == Seq(0x123456, 0x00FF00))
  }

  test("hardening: junk, truncation, and out-of-scope formats fail closed") {
    assert(PngCodec.decode("not a png".getBytes("US-ASCII")).isEmpty)
    assert(PngCodec.decode(Array.emptyByteArray).isEmpty)
    val good = pngBytes(Seq(Seq(0x112233, 0x445566), Seq(0x778899, 0xAABBCC)))
    // truncate inside the IDAT stream
    assert(PngCodec.decode(good.take(good.length - 15)).isEmpty)
    // corrupt the zlib payload (flip bytes mid-IDAT)
    val corrupt = good.clone()
    val idat = {
      var i = 8
      var found = -1
      while (found < 0 && i + 8 < corrupt.length) {
        if (new String(corrupt, i + 4, 4, "US-ASCII") == "IDAT") found = i
        else i += 12 + (((corrupt(i) & 0xFF) << 24) | ((corrupt(i + 1) & 0xFF) << 16) |
          ((corrupt(i + 2) & 0xFF) << 8) | (corrupt(i + 3) & 0xFF))
      }
      found
    }
    assert(idat > 0)
    corrupt(idat + 10) = (~corrupt(idat + 10)).toByte
    corrupt(idat + 11) = (~corrupt(idat + 11)).toByte
    assert(PngCodec.decode(corrupt).isEmpty)
    // palette PNG (TYPE_BYTE_INDEXED) is out of scope -> None
    val indexed = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    val o = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(indexed, "png", o)
    assert(PngCodec.decode(o.toByteArray).isEmpty)
  }

  test("decode harness: per-partition decoder yields stats + NULL row for junk") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Seq(
      ("a.png", pngBytes(Seq(Seq(0xFF0000)))),
      ("bad.png", "zzz".getBytes("US-ASCII"))
    ).toDF("name", "content")
    val out = Multimodal.decodeRowsPartitioned(rows, "content",
        PngCodec.PngStatsDecoder)
      .select(col("name"), col("magic"), col("sum_r"))
      .collect().map(r => r.getString(0) ->
        ((Option(r.getString(1)), Option(r.get(2))))).toMap
    assert(out("a.png") == ((Some("PNG"), Some(255L))))
    assert(out("bad.png") == ((None, None)))
  }
}
