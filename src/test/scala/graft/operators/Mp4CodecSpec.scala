package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class Mp4CodecSpec extends AnyFunSuite {

  private val movie = Mp4Codec.mp4Bytes(
    brand = "isom", timescale = 1000, duration = 2500,
    width = 640, height = 360, videoFormat = "avc1",
    sampleSizes = Seq(10, 20, 30, 40, 50),
    stscRuns = Seq((1, 2), (3, 1)),
    syncSamples = Seq(1, 4),
    mediaTimescale = 30000, mediaDuration = 75075,
    audioFormat = Some("mp4a"))

  private val hires = Mp4Codec.mp4Bytes(
    brand = "mp42", timescale = 90000, duration = 90090,
    width = 1920, height = 1080, videoFormat = "hvc1",
    sampleSizes = Seq(100, 100),
    stscRuns = Seq((1, 1)),
    syncSamples = Nil,
    mediaTimescale = 600, mediaDuration = 600,
    version1 = true)

  test("round-trip: writer fixture decodes to its own brand, clocks, " +
      "geometry, and sample-table counts") {
    val m = Mp4Codec.decode(movie).get
    assert(m.brand == "isom")
    assert(m.timescale == 1000L && m.duration == 2500L)
    assert(m.tracks.length == 2)
    val v = m.tracks.find(_.handler == "vide").get
    assert(v.format == "avc1" && v.width == 640 && v.height == 360)
    assert(v.timescale == 30000L && v.duration == 75075L)
    assert(v.nSamples == 5L && v.nSync == 2L)
    val a = m.tracks.find(_.handler == "soun").get
    assert(a.format == "mp4a" && a.width == 0 && a.height == 0)
  }

  test("version-1 paths: 64-bit mvhd/tkhd/mdhd times and co64 offsets " +
      "decode identically; absent stss reports nSync = -1 (all sync)") {
    val m = Mp4Codec.decode(hires).get
    assert(m.brand == "mp42")
    assert(m.timescale == 90000L && m.duration == 90090L)
    val v = m.tracks.head
    assert(v.width == 1920 && v.height == 1080 && v.format == "hvc1")
    assert(v.nSamples == 2L && v.nSync == -1L)
    val row = Mp4Codec.Mp4MetaDecoder.decode(hires)
    assert(row(6) == 1001L)  // 90090*1000 div 90000
    assert(row(7) == 1000L)  // 600*1000 div 600
    assert(row(9) == 2L)     // no stss -> every sample is a keyframe
  }

  test("sampleIndex resolves the stsc run map: chunk sizes 2,2,1 place " +
      "five samples at hand-computed absolute offsets") {
    // ftyp is 20 bytes, mdat payload starts at 28
    val idx = Mp4Codec.sampleIndex(movie)
    assert(idx.map(e => (e.sampleNo, e.chunkNo, e.offset, e.size,
      e.keyframe)) == Seq(
      (1, 1, 28L, 10L, true),
      (2, 1, 38L, 20L, false),
      (3, 2, 58L, 30L, false),
      (4, 2, 88L, 40L, true),
      (5, 3, 128L, 50L, false)))
    // co64 path: one sample per chunk, all keyframes
    assert(Mp4Codec.sampleIndex(hires).map(e =>
      (e.sampleNo, e.chunkNo, e.offset, e.size, e.keyframe)) == Seq(
      (1, 1, 28L, 100L, true),
      (2, 2, 128L, 100L, true)))
  }

  test("decoder row: exact-integer movie duration (2500ms) and the " +
      "2502ms NTSC-style media clock (75075*1000 div 30000)") {
    val row = Mp4Codec.Mp4MetaDecoder.decode(movie)
    assert(row == Seq("isom", 2, 640, 360, "avc1", "mp4a", 2500L, 2502L,
      5L, 2L))
  }

  test("hardening: junk, every truncation prefix, and lying entry " +
      "counts decode to None/Nil, never throw") {
    assert(Mp4Codec.decode("not a video".getBytes("US-ASCII")).isEmpty)
    assert(Mp4Codec.sampleIndex(Array[Byte](0, 0, 0, 8, 'f', 't')).isEmpty)
    (0 until movie.length).foreach { k =>
      val t = movie.take(k)
      Mp4Codec.decode(t)
      Mp4Codec.sampleIndex(t)
    }
    // stss entry_count lying beyond its box must abort, not allocate:
    // find the stss box and inflate its count field
    val lying = movie.clone()
    val at = indexOfTag(lying, "stss")
    assert(at > 0)
    // box layout: [size 4][stss][version+flags 4][entry_count 4]
    lying(at + 12) = 0x7F.toByte // count high byte -> huge
    assert(Mp4Codec.decode(lying).isEmpty)
    assert(Mp4Codec.sampleIndex(lying).isEmpty)
    // random single-byte corruption never throws
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val c = movie.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      Mp4Codec.decode(c)
      Mp4Codec.sampleIndex(c)
    }
  }

  private def indexOfTag(b: Array[Byte], t: String): Int = {
    val pat = t.getBytes("US-ASCII")
    (0 until b.length - 4).find(i => (0 until 4).forall(j =>
      b(i + j) == pat(j))).map(_ - 4).getOrElse(-1)
  }
}
