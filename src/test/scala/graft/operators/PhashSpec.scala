package graft.operators

import graft.SparkSpec
import graft.sources.SyntheticFixtures

/** DCT pHash: exact-integer contract, container invariance, and the
  * robustness claims that justify it next to dHash — survival under a
  * real JPEG-style lossy luma roundtrip (blockwise DCT → Annex-K
  * quantization → reconstruction) and under non-integer resize, the two
  * transforms the dHash doc explicitly scopes OUT of its invariance.
  * Fixtures are [[SyntheticFixtures.richRaster]] spectrally-dense
  * synthetic photos — every threshold below is a MEASURED value on the
  * deterministic fixtures (StrictMath + seeded LCG: bit-identical on
  * every JVM), with headroom noted. */
class PhashSpec extends SparkSpec {

  private val rich1 = SyntheticFixtures.richRaster(64, 64, 1)
  private val rich2 = SyntheticFixtures.richRaster(64, 64, 2)
  private val rich3 = SyntheticFixtures.richRaster(64, 64, 3)

  private def phashOf(img: Seq[Seq[Int]]): Long =
    ImageHash.phash64Auto(SyntheticFixtures.bmpBytes(img)).get

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** JPEG's lossy luma pipeline, emulated exactly as an encoder applies
    * it: per 8×8 block, level-shift, orthonormal 2D DCT-II, quantize by
    * the JPEG Annex-K luminance table, dequantize, inverse DCT, clamp.
    * (The repo has no JPEG pixel decoder by design — this applies the
    * SAME transform a re-encode applies to the raster.) */
  private val annexK = Array(
    Array(16, 11, 10, 16, 24, 40, 51, 61),
    Array(12, 12, 14, 19, 26, 58, 60, 55),
    Array(14, 13, 16, 24, 40, 57, 69, 56),
    Array(14, 17, 22, 29, 51, 87, 80, 62),
    Array(18, 22, 37, 56, 68, 109, 103, 77),
    Array(24, 35, 55, 64, 81, 104, 113, 92),
    Array(49, 64, 78, 87, 103, 121, 120, 101),
    Array(72, 92, 95, 98, 112, 100, 103, 99))

  private def jpegRoundtrip(img: Seq[Seq[Int]]): Seq[Seq[Int]] = {
    val h = img.length; val w = img.head.length
    val g = Array.tabulate(h, w)((y, x) => (img(y)(x) & 0xFF) - 128.0)
    def alpha(u: Int) = if (u == 0) StrictMath.sqrt(0.125) else 0.5
    val out = Array.ofDim[Int](h, w)
    var by = 0
    while (by < h) {
      var bx = 0
      while (bx < w) {
        val f = Array.ofDim[Double](8, 8)
        for (u <- 0 until 8; v <- 0 until 8) {
          var acc = 0.0
          for (y <- 0 until 8; x <- 0 until 8)
            acc += g(by + y)(bx + x) *
              StrictMath.cos((2 * x + 1) * v * StrictMath.PI / 16) *
              StrictMath.cos((2 * y + 1) * u * StrictMath.PI / 16)
          f(u)(v) = alpha(u) * alpha(v) * acc
        }
        // the lossy step: quantize / dequantize
        for (u <- 0 until 8; v <- 0 until 8)
          f(u)(v) = StrictMath.round(f(u)(v) / annexK(u)(v)).toDouble *
            annexK(u)(v)
        for (y <- 0 until 8; x <- 0 until 8) {
          var acc = 0.0
          for (u <- 0 until 8; v <- 0 until 8)
            acc += alpha(u) * alpha(v) * f(u)(v) *
              StrictMath.cos((2 * x + 1) * v * StrictMath.PI / 16) *
              StrictMath.cos((2 * y + 1) * u * StrictMath.PI / 16)
          val c = math.max(0, math.min(255, (acc + 128.0).round.toInt))
          out(by + y)(bx + x) = (c << 16) | (c << 8) | c
        }
        bx += 8
      }
      by += 8
    }
    out.map(_.toSeq).toSeq
  }

  private def resize(img: Seq[Seq[Int]], nw: Int, nh: Int): Seq[Seq[Int]] =
    (0 until nh).map(y => (0 until nw).map(x =>
      img(y * img.length / nh)(x * img.head.length / nw)))

  test("container invariance + determinism: the same raster pHashes " +
      "identically through BMP and PNG, twice") {
    for (img <- Seq(rich1, rich2)) {
      val bmp = ImageHash.phash64Auto(SyntheticFixtures.bmpBytes(img))
      val png = ImageHash.phash64Auto(SyntheticFixtures.pngBytes(img))
      assert(bmp == png && bmp.isDefined)
      assert(phashOf(img) == bmp.get)
    }
  }

  test("JPEG recompression invariance: the Annex-K quantization " +
      "roundtrip moves the pHash by at most 10 bits (measured 6/2/4) " +
      "while distinct photos stay >= 20 apart (measured 28-36)") {
    for (img <- Seq(rich1, rich2, rich3)) {
      val d = hamming(phashOf(img), phashOf(jpegRoundtrip(img)))
      assert(d <= 10, s"pHash moved $d bits under JPEG roundtrip")
    }
    for ((a, b) <- Seq((rich1, rich2), (rich1, rich3), (rich2, rich3))) {
      val d = hamming(phashOf(a), phashOf(b))
      assert(d >= 20, s"distinct photos only $d apart")
    }
    // and cross: a roundtripped copy is still far from OTHER photos
    assert(hamming(phashOf(jpegRoundtrip(rich1)), phashOf(rich2)) >= 20)
  }

  test("non-integer resize invariance: nearest-neighbor 64->48, " +
      "64->80, 64->96 move the pHash by at most 13 bits " +
      "(measured 4-12; the case dHash's doc scopes out)") {
    for (img <- Seq(rich1, rich2, rich3);
         (nw, nh) <- Seq((48, 48), (80, 80), (96, 96))) {
      val d = hamming(phashOf(img), phashOf(resize(img, nw, nh)))
      assert(d <= 13, s"pHash moved $d bits under resize to ${nw}x$nh")
    }
  }

  test("brightness shift robustness: +10 luma everywhere only touches " +
      "near-median bits (AC coefficients shift by basis-rounding " +
      "residues only)") {
    def brighten(img: Seq[Seq[Int]], d: Int): Seq[Seq[Int]] =
      img.map(_.map { p =>
        val c = math.min(255, (p & 0xFF) + d); (c << 16) | (c << 8) | c
      })
    for (img <- Seq(rich1, rich2)) {
      val d = hamming(phashOf(img), phashOf(brighten(img, 10)))
      assert(d <= 8, s"pHash moved $d bits under +10 brightness")
    }
  }

  test("degenerate inputs: constant image is deterministic; junk -> " +
      "None; 1x1 decodes") {
    val blank = Seq.fill(16)(Seq.fill(16)(0x808080))
    assert(phashOf(blank) == phashOf(blank))
    assert(ImageHash.phash64Auto("junk".getBytes("US-ASCII")).isEmpty)
    assert(ImageHash.phash64Auto(
      SyntheticFixtures.bmpBytes(Seq(Seq(0xFFFFFF)))).isDefined)
  }

  test("hammingNearDupPairs over pHash keys: the JPEG-roundtripped copy " +
      "pairs with its original through the banded machinery, distinct " +
      "photos do not (bands=16 geometry for the deeper lossy " +
      "perturbation; pigeonhole exact at maxHamming <= 15)") {
    import spark.implicits._
    val hashes = Seq(
      (1L, phashOf(rich1)),
      (2L, phashOf(jpegRoundtrip(rich1))),
      (3L, phashOf(rich2))
    ).toDF("id", "h")
    val got = Dedup.hammingNearDupPairs(hashes, "id", "h",
        bands = 16, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }
}
