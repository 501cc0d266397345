package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SyntheticFixtures

/** [[WavCodec]] — decode against the independent sequential writer,
  * chunk-walk hardening, and out-of-scope rejection. */
class WavCodecSpec extends AnyFunSuite {

  test("round-trip: interleaved PCM16 de-interleaves exactly") {
    val c0 = Seq(0, 1000, -1000, 32767, -32768)
    val c1 = Seq(7, -7, 300, -400, 12345)
    val a = WavCodec.decode(
      SyntheticFixtures.wavBytes(Seq(c0, c1), 44100)).get
    assert(a.nChannels == 2 && a.sampleRate == 44100 &&
      a.bitsPerSample == 16)
    assert(a.samples(0).toSeq == c0.map(_.toShort))
    assert(a.samples(1).toSeq == c1.map(_.toShort))
  }

  test("unknown chunks are skipped, not fatal") {
    val bytes = SyntheticFixtures.wavBytes(Seq(Seq(5, -5)), 8000,
      withListChunk = true)
    val a = WavCodec.decode(bytes).get
    assert(a.samples(0).toSeq == Seq(5.toShort, (-5).toShort))
  }

  test("malformed and out-of-scope payloads decode to None") {
    val good = SyntheticFixtures.wavBytes(Seq(Seq(1, 2, 3)), 8000)
    assert(WavCodec.decode(good).isDefined)
    // wrong magic
    val bad = good.clone(); bad(0) = 'X'.toByte
    assert(WavCodec.decode(bad).isEmpty)
    // non-PCM audio format
    val comp = good.clone(); comp(20) = 3 // IEEE float tag
    assert(WavCodec.decode(comp).isEmpty)
    // truncated mid-data: declared chunk runs past the buffer
    assert(WavCodec.decode(good.dropRight(3)).isEmpty)
    // too short / junk
    assert(WavCodec.decode("RIFF".getBytes("US-ASCII")).isEmpty)
    assert(WavCodec.decode(Array.empty[Byte]).isEmpty)
  }

  test("samples decoder exposes the first channel for SQL-side features") {
    val r = WavCodec.WavSamplesDecoder.decode(
      SyntheticFixtures.wavBytes(Seq(Seq(1, -2, 3), Seq(9, 9, 9)), 8000))
    assert(r(0) == 2 && r(1) == 8000)
    assert(r(2).asInstanceOf[Seq[Int]] == Seq(1, -2, 3))
    assert(WavCodec.WavSamplesDecoder.decode(Array.empty[Byte])
      .forall(_ == null))
  }

  test("stats decoder: duration is integer ms, energy exact") {
    val r = WavCodec.WavStatsDecoder.decode(
      SyntheticFixtures.wavBytes(Seq(Seq(0, 1000, -1000, 32767)), 1000))
    assert(r == Seq("RIFF", 1, 1000, 16, 4L, 4L, 34767L, 32767, 1075676289L))
    assert(WavCodec.WavStatsDecoder.decode("junk".getBytes("US-ASCII"))
      .forall(_ == null))
  }
}
