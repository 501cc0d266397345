package graft.operators

import graft.SparkSpec
import graft.sources.SyntheticFixtures

class ImageHashSpec extends SparkSpec {

  // 18x8 x-gradients: luma(v,v,v) = v exactly, so every cell mean is
  // hand-computable ((4j+1) div 2 = 2j ascending; 16-2j descending)
  private def gradient(f: Int => Int): Seq[Seq[Int]] =
    (0 until 8).map(_ => (0 until 18).map { x =>
      val v = f(x); (v << 16) | (v << 8) | v
    })

  private val asc = gradient(identity)
  private val desc = gradient(x => 17 - x)
  private val ascTweak = asc.updated(0, asc(0).updated(0, 0x050505))

  test("pinned gradients: ascending cells never exceed their right " +
      "neighbor (hash 0), descending always do (all 64 bits), one " +
      "tweaked pixel flips exactly bit 0") {
    assert(ImageHash.dhash64Bmp(SyntheticFixtures.bmpBytes(asc)).get == 0L)
    assert(ImageHash.dhash64Bmp(SyntheticFixtures.bmpBytes(desc)).get == -1L)
    assert(ImageHash.dhash64Bmp(
      SyntheticFixtures.bmpBytes(ascTweak)).get == 1L)
  }

  test("container invariance: the same raster hashes identically " +
      "through the BMP and PNG legs (and via dhash64Auto dispatch)") {
    for (img <- Seq(asc, desc, ascTweak)) {
      val bmp = ImageHash.dhash64Bmp(SyntheticFixtures.bmpBytes(img))
      val png = ImageHash.dhash64Png(SyntheticFixtures.pngBytes(img))
      assert(bmp == png && bmp.isDefined)
      assert(ImageHash.dhash64Auto(SyntheticFixtures.bmpBytes(img)) == bmp)
      assert(ImageHash.dhash64Auto(SyntheticFixtures.pngBytes(img)) == png)
    }
  }

  test("scale invariance under exact 2x duplication: doubling every " +
      "pixel row and column leaves every cell mean — and the hash — " +
      "unchanged") {
    for (img <- Seq(asc, desc, ascTweak)) {
      val doubled = img.flatMap(row => Seq(row, row))
        .map(row => row.flatMap(p => Seq(p, p)))
      assert(ImageHash.dhash64Bmp(SyntheticFixtures.bmpBytes(doubled)) ==
        ImageHash.dhash64Bmp(SyntheticFixtures.bmpBytes(img)))
    }
  }

  test("degenerate inputs: 1x1 image hashes (single repeated cell -> " +
      "0), junk bytes -> None") {
    assert(ImageHash.dhash64Bmp(
      SyntheticFixtures.bmpBytes(Seq(Seq(0xFFFFFF)))).get == 0L)
    assert(ImageHash.dhash64Auto("junk".getBytes("US-ASCII")).isEmpty)
    assert(ImageHash.dhash64Bmp("BMjunk".getBytes("US-ASCII")).isEmpty)
  }

  test("hammingNearDupPairs over the pinned hashes: the tweak pair at " +
      "hamming 1, the cross-container identical pair at 0, the " +
      "inverted gradient isolated") {
    import spark.implicits._
    val hashes = Seq((1L, 0L), (2L, 1L), (3L, -1L), (4L, 0L))
      .toDF("id", "h")
    val got = Dedup.hammingNearDupPairs(hashes, "id", "h",
        bands = 4, maxHamming = 3)
      .orderBy("id_1", "id_2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 2L, 1), (1L, 4L, 0), (2L, 4L, 1)))
  }
}
