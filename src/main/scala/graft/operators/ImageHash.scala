package graft.operators

import org.apache.spark.sql.types._

/** Perceptual image hashing for multimodal dedup — the bridge between
  * the raster codecs ([[BmpCodec]], [[PngCodec]]) and the dedup family:
  * a 64-bit difference hash (dHash) per image turns image near-dup
  * detection into EXACTLY the banded-hamming machinery the engine
  * already runs for 64-bit SimHash ([[Dedup.hammingNearDupPairs]]) —
  * one (band, sig) shuffle, pigeonhole recall contract, popcount-XOR
  * verify. This is the image-side analogue of text MinHash: re-encoded,
  * resized, or slightly-retouched copies of one image land within a few
  * hamming bits of each other while distinct images scatter.
  *
  * Everything is exact integer arithmetic so the hash is
  * engine-portable and oracle-pinnable: BT.601 luma as
  * (299·r + 587·g + 114·b) div 1000, area downsample to a 9×8 grid by
  * integer mean (sum div count) over each cell's pixel block, bit
  * (row·8 + col) set when cell(row,col) > cell(row,col+1) — 8 rows × 8
  * adjacent-column comparisons = 64 bits. No FP, no external image
  * library; the decode legs are the container's own pure-JVM codecs.
  */
object ImageHash {

  /** BT.601 integer luma of a packed 0xRRGGBB pixel. */
  private def luma(px: Int): Int = {
    val r = (px >> 16) & 0xFF
    val g = (px >> 8) & 0xFF
    val b = px & 0xFF
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** 64-bit dHash of a top-row-first packed-RGB raster. Cells are the
    * 9×8 integer-boundary partition (cell (i,j) covers x ∈
    * [j·W/9, (j+1)·W/9), y ∈ [i·H/8, (i+1)·H/8), both floored, widened
    * to at least one pixel for tiny images); cell value = integer mean
    * luma. */
  def dhash64(pixels: Array[Array[Int]]): Long = {
    val h = pixels.length
    if (h == 0) return 0L
    val w = pixels(0).length
    if (w == 0) return 0L
    val grid = Array.ofDim[Long](8, 9)
    var i = 0
    while (i < 8) {
      val y0 = i * h / 8
      val y1 = math.max(y0 + 1, (i + 1) * h / 8)
      var j = 0
      while (j < 9) {
        val x0 = j * w / 9
        val x1 = math.max(x0 + 1, (j + 1) * w / 9)
        var sum = 0L
        var n = 0L
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            sum += luma(pixels(y)(x))
            n += 1
            x += 1
          }
          y += 1
        }
        grid(i)(j) = if (n == 0) 0L else sum / n
        j += 1
      }
      i += 1
    }
    var hash = 0L
    i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        if (grid(i)(j) > grid(i)(j + 1)) hash |= 1L << (i * 8 + j)
        j += 1
      }
      i += 1
    }
    hash
  }

  /** dHash via the BMP leg; None when the payload is not a decodable
    * BMP. */
  def dhash64Bmp(bytes: Array[Byte]): Option[Long] =
    BmpCodec.decode(bytes).map(img => dhash64(img.pixels))

  /** dHash via the PNG leg; None when the payload is not a decodable
    * PNG. */
  def dhash64Png(bytes: Array[Byte]): Option[Long] =
    PngCodec.decode(bytes).map(img => dhash64(img.pixels))

  /** dHash of whichever raster leg recognizes the payload (magic-byte
    * dispatch, cheap reject before any decode work). */
  def dhash64Auto(bytes: Array[Byte]): Option[Long] =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')
      dhash64Bmp(bytes)
    else if (bytes.length >= 8 && (bytes(0) & 0xFF) == 0x89 &&
      bytes(1) == 'P') dhash64Png(bytes)
    else None

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("dhash", LongType)))

  /** [[Multimodal.RowDecoder]] emitting (width, height, dhash) for BMP
    * or PNG payloads; NULL row otherwise. */
  object DhashDecoder extends Multimodal.RowDecoder {
    val schema: StructType = metaSchema
    def decode(bytes: Array[Byte]): Seq[Any] = {
      val img: Option[(Int, Int, Array[Array[Int]])] =
        if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')
          BmpCodec.decode(bytes).map(i => (i.width, i.height, i.pixels))
        else PngCodec.decode(bytes).map(i => (i.width, i.height, i.pixels))
      img match {
        case None => Seq(null, null, null)
        case Some((w, h, px)) => Seq[Any](w, h, dhash64(px))
      }
    }
  }
}
