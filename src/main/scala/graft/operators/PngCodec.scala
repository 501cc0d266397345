package graft.operators

import org.apache.spark.sql.types._

/** A REAL pure-JVM PNG decoder for the multimodal column harness
  * ([[Multimodal.decodeRowsPartitioned]]): signature + chunk walk (length /
  * type / data / crc), IHDR geometry, zlib-inflated concatenated IDAT
  * stream (`java.util.zip.Inflater` — in the JDK, no external library),
  * and ALL FIVE scanline filters (None/Sub/Up/Average/Paeth), which a real
  * encoder mixes per row. Scope: 8-bit depth, color types 0 (gray),
  * 2 (RGB) and 6 (RGBA), non-interlaced — the shapes ImageIO and most
  * screenshot/export pipelines emit. Everything else (16-bit, palette,
  * Adam7) decodes to NULLs: untrusted bytes never kill a scan stage.
  *
  * Chunk CRCs are not verified (a flipped pixel bit is the consumer's
  * concern; a malformed structure still fails closed), and the inflater is
  * bounded by the IHDR-declared raster size — a zip bomb cannot allocate
  * past width·height·bpp+height bytes.
  *
  * The spec twin writes fixtures with `javax.imageio.ImageIO` — an
  * independent encoder whose filter choices exercise the decode paths.
  */
object PngCodec {

  final case class PngImage(
      width: Int,
      height: Int,
      bitDepth: Int,
      colorType: Int,
      /** pixels(y)(x) = packed 0xRRGGBB (alpha dropped, gray replicated). */
      pixels: Array[Array[Int]])

  private val Signature: Array[Int] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  private def i32be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
      ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)

  /** Hardened decode: 8-bit gray/RGB/RGBA non-interlaced PNG → top-first
    * 0xRRGGBB grid; None for anything else. */
  def decode(bytes: Array[Byte]): Option[PngImage] = {
    if (bytes == null || bytes.length < 8 + 25) return None
    var i = 0
    while (i < 8) { if ((bytes(i) & 0xFF) != Signature(i)) return None; i += 1 }

    var width = 0; var height = 0; var bitDepth = 0; var colorType = 0
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    var off = 8
    while (!sawIend && off + 8 <= bytes.length) {
      val len = i32be(bytes, off)
      if (len < 0 || off + 12L + len > bytes.length) return None
      val ctype = new String(bytes, off + 4, 4, "US-ASCII")
      ctype match {
        case "IHDR" =>
          if (len != 13) return None
          width = i32be(bytes, off + 8)
          height = i32be(bytes, off + 12)
          bitDepth = bytes(off + 16) & 0xFF
          colorType = bytes(off + 17) & 0xFF
          val interlace = bytes(off + 20) & 0xFF
          if (width <= 0 || height <= 0 || width > 65536 || height > 65536 ||
            bitDepth != 8 || interlace != 0 ||
            (colorType != 0 && colorType != 2 && colorType != 6)) return None
          sawIhdr = true
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks skipped
      }
      off += 12 + len
    }
    if (!sawIhdr || idat.size() == 0) return None

    val bpp = colorType match { case 0 => 1; case 2 => 3; case _ => 4 }
    val stride = width.toLong * bpp
    val rasterLen = (stride + 1) * height // +1 filter byte per row
    if (rasterLen > Int.MaxValue - 8) return None
    val raster = new Array[Byte](rasterLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raster.length && !inf.finished()) {
        val n = inf.inflate(raster, got, raster.length - got)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        got += n
      }
      if (got < raster.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()

    // defilter in place, row by row (each filter references the PREVIOUS
    // defiltered row — process top to bottom)
    val w3 = stride.toInt
    def rawAt(pos: Int): Int = raster(pos) & 0xFF
    var y = 0
    while (y < height) {
      val rowStart = y * (w3 + 1)
      val filter = rawAt(rowStart)
      val data = rowStart + 1
      val prev = data - (w3 + 1)
      filter match {
        case 0 => ()
        case 1 => // Sub
          var x = bpp
          while (x < w3) {
            raster(data + x) = ((rawAt(data + x) + rawAt(data + x - bpp)) & 0xFF).toByte
            x += 1
          }
        case 2 => // Up
          if (y > 0) {
            var x = 0
            while (x < w3) {
              raster(data + x) = ((rawAt(data + x) + rawAt(prev + x)) & 0xFF).toByte
              x += 1
            }
          }
        case 3 => // Average
          var x = 0
          while (x < w3) {
            val a = if (x >= bpp) rawAt(data + x - bpp) else 0
            val b = if (y > 0) rawAt(prev + x) else 0
            raster(data + x) = ((rawAt(data + x) + (a + b) / 2) & 0xFF).toByte
            x += 1
          }
        case 4 => // Paeth
          var x = 0
          while (x < w3) {
            val a = if (x >= bpp) rawAt(data + x - bpp) else 0
            val b = if (y > 0) rawAt(prev + x) else 0
            val c = if (x >= bpp && y > 0) rawAt(prev + x - bpp) else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            raster(data + x) = ((rawAt(data + x) + pred) & 0xFF).toByte
            x += 1
          }
        case _ => return None
      }
      y += 1
    }

    val px = Array.ofDim[Int](height, width)
    y = 0
    while (y < height) {
      val data = y * (w3 + 1) + 1
      var x = 0
      while (x < width) {
        val o = data + x * bpp
        val p = colorType match {
          case 0 =>
            val v = rawAt(o); (v << 16) | (v << 8) | v
          case _ =>
            (rawAt(o) << 16) | (rawAt(o + 1) << 8) | rawAt(o + 2)
        }
        px(y)(x) = p
        x += 1
      }
      y += 1
    }
    Some(PngImage(width, height, bitDepth, colorType, px))
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("magic", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("color_type", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("top_left_rgb", IntegerType)))

  object PngStatsDecoder extends Multimodal.RowDecoder {
    val schema: StructType = statsSchema
    def decode(bytes: Array[Byte]): Seq[Any] = PngCodec.decode(bytes) match {
      case None => Seq(null, null, null, null, null, null, null, null)
      case Some(img) =>
        var r = 0L; var g = 0L; var b = 0L
        var y = 0
        while (y < img.height) {
          val row = img.pixels(y)
          var x = 0
          while (x < img.width) {
            val p = row(x)
            r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; b += p & 0xFF
            x += 1
          }
          y += 1
        }
        Seq("PNG", img.width, img.height, img.colorType,
          r, g, b, img.pixels(0)(0))
    }
  }
}
