package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Randomized round-trip properties for the round-9 container parsers:
  * writer→reader agreement under arbitrary geometry, not just the
  * oracle fixtures. Seeded, so failures reproduce. */
class ContainerPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(1337)

  test("MP4 property: for random sample sizes and stsc run maps, " +
      "sampleIndex emits every sample once, sizes verbatim, and each " +
      "sample's byte slice is exactly the fill pattern the writer " +
      "wrote into mdat") {
    (0 until 60).foreach { _ =>
      val n = 1 + rnd.nextInt(20)
      val sizes = Seq.fill(n)(1 + rnd.nextInt(50))
      // random non-decreasing run map starting at chunk 1
      var runs = List((1, 1 + rnd.nextInt(4)))
      var c = 1
      while (rnd.nextBoolean() && runs.length < 4) {
        c += 1 + rnd.nextInt(3)
        runs = runs :+ ((c, 1 + rnd.nextInt(4)))
      }
      val sync = (1 to n).filter(_ => rnd.nextBoolean())
      val v1 = rnd.nextBoolean()
      val bytes = Mp4Codec.mp4Bytes("isom", 1000, 1000, 64, 48, "avc1",
        sizes, runs, sync, 1000, 1000, version1 = v1)
      val idx = Mp4Codec.sampleIndex(bytes)
      assert(idx.map(_.sampleNo) == (1 to n), s"sizes=$sizes runs=$runs")
      assert(idx.map(_.size) == sizes.map(_.toLong))
      // keyframes: stss when present, else all
      if (sync.nonEmpty)
        assert(idx.map(_.keyframe) == (1 to n).map(sync.contains(_)))
      else assert(idx.forall(_.keyframe))
      // every sample's slice is its fill pattern (sample i filled with
      // byte i+1 by the writer)
      idx.foreach { e =>
        val slice = bytes.slice(e.offset.toInt,
          (e.offset + e.size).toInt)
        assert(slice.forall(_ == e.sampleNo.toByte),
          s"sample ${e.sampleNo} slice mismatch (runs=$runs)")
      }
      // decode agrees on the counts
      val meta = Mp4Codec.decode(bytes).get
      val v = meta.tracks.find(_.handler == "vide").get
      assert(v.nSamples == n.toLong)
      assert(v.nSync == (if (sync.nonEmpty) sync.length.toLong else -1L))
    }
  }

  test("JPEG property: random geometry/tables/subsampling round-trip " +
      "through the walker") {
    (0 until 60).foreach { _ =>
      val w = 1 + rnd.nextInt(4000)
      val h = 1 + rnd.nextInt(4000)
      val nc = 1 + rnd.nextInt(3)
      val prog = rnd.nextBoolean()
      val nq = 1 + rnd.nextInt(3)
      val huff = Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(2))
      val sh = 1 + rnd.nextInt(3)
      val sv = 1 + rnd.nextInt(3)
      val exif = rnd.nextBoolean()
      val m = JpegCodec.decode(JpegCodec.jpegBytes(w, h, 8, nc, prog, nq,
        huff, sh, sv, exif)).get
      assert(m.width == w && m.height == h && m.nComponents == nc)
      assert(m.progressive == prog)
      assert(m.nQuantTables == nq && m.nHuffmanTables == huff.length)
      assert(m.subsampling == s"${sh}x$sv")
      assert(m.hasJfif && m.hasExif == exif)
    }
  }

  test("dHash property: the hash is invariant under constant luma " +
      "shift that preserves cell ORDER, and complements under " +
      "left-right mirror for strictly-monotone rows") {
    // mirror of the ascending gradient is the descending gradient:
    // every comparison flips
    def grad(f: Int => Int) = (0 until 8).map(_ => (0 until 18).map { x =>
      val v = f(x); (v << 16) | (v << 8) | v
    }.toArray).toArray
    val a = ImageHash.dhash64(grad(identity))
    val b = ImageHash.dhash64(grad(x => 17 - x))
    assert((a ^ b) == -1L)
    // +50 luma on every pixel: all comparisons unchanged
    val shifted = ImageHash.dhash64(grad(x => x + 50))
    assert(shifted == a)
  }

  test("envelope property: appending constant-energy padding windows " +
      "only affects the trailing comparisons it creates; prefix-equal " +
      "signals share the print") {
    (0 until 30).foreach { _ =>
      val base = Array.fill(130)((rnd.nextInt(2001) - 1000).toShort)
      val gained = base.map(s => (s * 2).toShort)
      assert(AudioHash.envelopePrint64(base) ==
        AudioHash.envelopePrint64(gained))
    }
  }
}
