package graft.sources

import graft.SparkSpec
import graft.operators.BmpCodec

/** Randomized round-trip properties for the round-3 binary parsers: for
  * random inputs, decode(independent-write(x)) == x. Seeded and
  * deterministic; 100 cases per format cover the dimension/row-order/
  * depth/trial-count lattice far beyond the hand-picked fixtures. */
class ParserRoundTripSpec extends SparkSpec {

  test("BMP: decode(write(pixels)) == pixels over random images") {
    val rnd = new scala.util.Random(77L)
    (1 to 100).foreach { i =>
      val w = rnd.nextInt(9) + 1
      val h = rnd.nextInt(9) + 1
      val bpp = if (rnd.nextBoolean()) 24 else 32
      val topDown = rnd.nextBoolean()
      val img = Seq.fill(h)(Seq.fill(w)(rnd.nextInt(1 << 24)))
      val decoded = BmpCodec.decode(
        SyntheticFixtures.bmpBytes(img, bpp, topDown)).get
      assert(decoded.width == w && decoded.height == h, s"case $i")
      assert(decoded.bitsPerPixel == bpp && decoded.topDown == topDown)
      assert(decoded.pixels.map(_.toSeq).toSeq == img, s"case $i ($w x $h)")
    }
  }

  test("EEGLAB: parse(write(traces)) == traces over random recordings") {
    val rnd = new scala.util.Random(78L)
    (1 to 100).foreach { i =>
      val nChan = rnd.nextInt(4) + 1
      val trials = rnd.nextInt(3) + 1
      val pnts = rnd.nextInt(6) + 1
      // integer-valued doubles: exact in float64 AND float32 (fdt case)
      val traces = Seq.fill(nChan)(
        Array.fill(trials * pnts)(rnd.nextInt(20001).toDouble - 10000))
      val labels = (1 to nChan).map(c => s"CH$c")
      val asFdt = if (rnd.nextBoolean()) Some("x.fdt") else None
      val (set, fdt) = SyntheticFixtures.eeglabBytes(
        labels, traces, srateHz = 128.0, trials = trials, asFdt = asFdt)
      val r = EeglabReader.parseSet(set).get
      assert(r.channelNames == labels && r.sampleRateHz == 128.0, s"case $i")
      val got = if (asFdt.isEmpty) r.data
        else EeglabReader.fdtTraces(nChan, fdt)
      assert(got.map(_.toSeq) == traces.map(_.toSeq), s"case $i")
    }
  }

  test("CTF: traces(write(samples)) == samples x cal over random datasets") {
    val rnd = new scala.util.Random(79L)
    (1 to 100).foreach { i =>
      val nChan = rnd.nextInt(4) + 1
      val trials = rnd.nextInt(3) + 1
      val nSamp = rnd.nextInt(6) + 1
      // power-of-two gains: cal is exact, raw*cal round-trips exactly
      val gain = 1 << rnd.nextInt(4)
      val chans = (1 to nChan).map(c =>
        SyntheticFixtures.CtfChan(s"M$c-123", gain.toDouble, 1.0))
      val data = Seq.fill(trials)(Seq.fill(nChan)(
        Array.fill(nSamp)(rnd.nextInt(2000001) - 1000000)))
      val (res4, meg4) = SyntheticFixtures.ctfBytes(chans, data, 600.0)
      val h = CtfReader.parseRes4(res4).get
      assert(h.nChannels == nChan && h.nTrials == trials, s"case $i")
      val got = CtfReader.traces(h, meg4).map(x => x._1 -> x._3.toSeq).toMap
      (0 until nChan).foreach { c =>
        val expected = (0 until trials)
          .flatMap(t => data(t)(c).map(_ / gain.toDouble))
        assert(got(s"M${c + 1}") == expected, s"case $i chan $c")
      }
    }
  }
}
