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

  /** Delegates to the shared deterministic Annex-K luma roundtrip
    * fixture (also consumed by MultimodalAssemblySpec's admission
    * test). */
  private def jpegRoundtrip(img: Seq[Seq[Int]]): Seq[Seq[Int]] =
    SyntheticFixtures.jpegRoundtrip(img)

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
