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

  // ---------------------------------------------------------------- pHash
  // Fixed-point DCT-II basis for the 32-point transform: Q(u,x) =
  // round(cos((2x+1)·u·π/64) · 2^14), built with StrictMath (bit-exact on
  // every JVM) — the coefficient table is therefore a fixed integer
  // constant and every pHash below is exact integer arithmetic.
  private val dctBasis: Array[Array[Long]] = Array.tabulate(32, 32) {
    (u, x) => Math.round(
      StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 64.0) * 16384.0)
  }

  /** 32×32 integer-mean luma grid of a packed-RGB raster (same
    * integer-boundary partition rule as the dHash 9×8 grid: cell (i,j)
    * covers y ∈ [i·H/32, (i+1)·H/32), x ∈ [j·W/32, (j+1)·W/32), floored,
    * widened to at least one pixel for tiny images). */
  private def lumaGrid32(pixels: Array[Array[Int]]): Array[Array[Long]] = {
    val h = pixels.length
    val w = pixels(0).length
    val g = Array.ofDim[Long](32, 32)
    var i = 0
    while (i < 32) {
      val y0 = i * h / 32
      val y1 = math.max(y0 + 1, (i + 1) * h / 32)
      var j = 0
      while (j < 32) {
        val x0 = j * w / 32
        val x1 = math.max(x0 + 1, (j + 1) * w / 32)
        var sum = 0L; var n = 0L
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            sum += luma(pixels(y)(x)); n += 1; x += 1
          }
          y += 1
        }
        g(i)(j) = if (n == 0) 0L else sum / n
        j += 1
      }
      i += 1
    }
    g
  }

  /** 64-bit DCT perceptual hash (pHash) of a top-row-first packed-RGB
    * raster — the robust sibling of [[dhash64]] for the recompression/
    * resize cases a difference hash is brittle under (dHash's documented
    * invariance stops at exact 2× scale; JPEG re-encode perturbs cell
    * means enough to flip gradient bits, while the low-frequency DCT
    * block it perturbs only at the quantization floor).
    *
    * Exact-integer contract (engine-portable, oracle-pinnable):
    *   1. 32×32 integer-mean luma grid ([[lumaGrid32]])
    *   2. separable 2D DCT-II over the fixed 2^14 fixed-point basis —
    *      UNSCALED sums S(u,v) = Σ_y Σ_x g(y,x)·Q(u,x)·Q(v,y) (the
    *      orthonormal α(u)α(v) factors are irrational; leaving them out
    *      keeps every coefficient an exact Long and changes only the
    *      relative weight of the u=0/v=0 edge rows — a documented,
    *      deterministic variant, not an approximation)
    *   3. keep the low-frequency 8×8 block u,v ∈ [0,8)
    *   4. med = exact integer median (32nd smallest) of the 63 AC
    *      coefficients (DC excluded — it is raw brightness, not shape)
    *   5. bit (u·8+v) set when S(u,v) > med (DC bit included in the
    *      layout under the same rule)
    * All magnitudes fit a Long with >2^17 headroom:
    * |S| ≤ 255·2^28·1024 < 2^47. */
  def phash64(pixels: Array[Array[Int]]): Long = {
    val h = pixels.length
    if (h == 0) return 0L
    if (pixels(0).length == 0) return 0L
    val g = lumaGrid32(pixels)
    // T(u,y) = Σ_x g(y,x)·Q(u,x) — the row-direction pass, 8 needed rows
    val t = Array.ofDim[Long](8, 32)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 32) {
        var acc = 0L
        var x = 0
        while (x < 32) { acc += g(y)(x) * dctBasis(u)(x); x += 1 }
        t(u)(y) = acc
        y += 1
      }
      u += 1
    }
    // S(u,v) = Σ_y T(u,y)·Q(v,y) — the column-direction pass
    val s = new Array[Long](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0L
        var y = 0
        while (y < 32) { acc += t(u)(y) * dctBasis(v)(y); y += 1 }
        s(u * 8 + v) = acc
        v += 1
      }
      u += 1
    }
    val ac = new Array[Long](63)
    System.arraycopy(s, 1, ac, 0, 63)
    java.util.Arrays.sort(ac)
    val med = ac(31)
    var hash = 0L
    var k = 0
    while (k < 64) {
      if (s(k) > med) hash |= 1L << k
      k += 1
    }
    hash
  }

  /** pHash of whichever raster leg recognizes the payload. */
  def phash64Auto(bytes: Array[Byte]): Option[Long] =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')
      BmpCodec.decode(bytes).map(img => phash64(img.pixels))
    else if (bytes.length >= 8 && (bytes(0) & 0xFF) == 0x89 &&
      bytes(1) == 'P') PngCodec.decode(bytes).map(img => phash64(img.pixels))
    else None

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

  /** [[Multimodal.RowDecoder]] emitting BOTH perceptual keys
    * (width, height, dhash, phash) in one decode — an admission pipeline
    * that wants the robust DCT key next to the cheap gradient key pays
    * one raster decode, not two. */
  object PerceptualDecoder extends Multimodal.RowDecoder {
    val schema: StructType = StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("dhash", LongType),
      StructField("phash", LongType)))
    def decode(bytes: Array[Byte]): Seq[Any] = {
      val img: Option[(Int, Int, Array[Array[Int]])] =
        if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')
          BmpCodec.decode(bytes).map(i => (i.width, i.height, i.pixels))
        else PngCodec.decode(bytes).map(i => (i.width, i.height, i.pixels))
      img match {
        case None => Seq(null, null, null, null)
        case Some((w, h, px)) =>
          Seq[Any](w, h, dhash64(px), phash64(px))
      }
    }
  }

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
