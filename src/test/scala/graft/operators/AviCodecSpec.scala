package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class AviCodecSpec extends AnyFunSuite {

  private val clip = AviCodec.aviBytes(320, 240, scale = 1, rate = 30,
    handler = "MJPG",
    frames = (0 until 10).map(i => Array.fill[Byte](10 * (i + 1))(i.toByte)),
    keyEvery = 4)

  test("round-trip: writer fixture decodes to its own geometry, stream " +
      "header, and frame index") {
    val m = AviCodec.decode(clip).get
    assert(m.width == 320 && m.height == 240)
    assert(m.totalFrames == 10L && m.nStreams == 1)
    assert(m.microSecPerFrame == 1000000L / 30)
    assert(m.streams == Seq(("vids", "MJPG", 1L, 30L, 10L)))
    val idx = AviCodec.frameIndex(clip)
    assert(idx.length == 10)
    assert(idx.forall(_.ckid == "00dc"))
    // keyframes every 4th; offsets movi-relative starting at 4, each next
    // +8+size (sizes even, no pad)
    assert(idx.zipWithIndex.forall { case (e, i) => e.keyframe == (i % 4 == 0) })
    assert(idx.map(_.size) == (1 to 10).map(i => 10L * i))
    assert(idx.head.offset == 4L)
    assert(idx.zip(idx.tail).forall { case (a, b) =>
      b.offset == a.offset + 8 + a.size })
  }

  test("NTSC integer fps: 30000/1001 -> 29970029 ppm via the decoder row") {
    val ntsc = AviCodec.aviBytes(640, 480, scale = 1001, rate = 30000,
      handler = "dvsd", frames = Seq(Array[Byte](1, 2)), keyEvery = 1)
    val row = AviCodec.AviMetaDecoder.decode(ntsc)
    assert(row(6) == 29970029L) // fps_ppm
  }

  test("hardening: junk and every truncation prefix decode to None/Nil, " +
      "never throw; a lying RIFF size clamps") {
    assert(AviCodec.decode("not a video".getBytes("US-ASCII")).isEmpty)
    assert(AviCodec.frameIndex("RIFFxxxxAVI ".getBytes("US-ASCII")).isEmpty)
    (0 until clip.length).foreach { k =>
      val t = clip.take(k)
      AviCodec.decode(t)
      AviCodec.frameIndex(t)
    }
    // RIFF size field claiming less than the real bytes: walker must stop
    // at the declared end without reading past it
    val lying = clip.clone()
    lying(4) = 16; lying(5) = 0; lying(6) = 0; lying(7) = 0
    assert(AviCodec.decode(lying).isEmpty ||
      AviCodec.frameIndex(lying).isEmpty)
  }

  test("moviOffset anchors the idx1 offsets: every frame's payload " +
      "slice at base+offset+8 equals the bytes the writer put there") {
    val base = AviCodec.moviOffset(clip).get
    AviCodec.frameIndex(clip).zipWithIndex.foreach { case (e, i) =>
      val start = base + e.offset.toInt + 8
      val payload = clip.slice(start, start + e.size.toInt)
      assert(payload.toSeq == Array.fill[Byte](10 * (i + 1))(i.toByte).toSeq)
    }
    assert(AviCodec.moviOffset("junk".getBytes("US-ASCII")).isEmpty)
  }
}
