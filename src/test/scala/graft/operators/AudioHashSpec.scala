package graft.operators

import graft.SparkSpec
import graft.sources.SyntheticFixtures

class AudioHashSpec extends SparkSpec {

  // 130 samples, window w = samples {2w, 2w+1}: energies 2w² ascending
  private val asc: Seq[Int] = (0 until 130).map(i => i / 2)
  private val desc: Seq[Int] = asc.map(64 - _)

  test("pinned envelopes: monotone-up energy sets all 64 bits, " +
      "monotone-down none") {
    assert(AudioHash.envelopePrint64(asc.map(_.toShort).toArray) == -1L)
    assert(AudioHash.envelopePrint64(desc.map(_.toShort).toArray) == 0L)
  }

  test("gain invariance: scaling every sample by a constant preserves " +
      "every energy comparison, so the print is identical") {
    val rnd = new scala.util.Random(11)
    val base = Array.fill(500)((rnd.nextInt(2001) - 1000).toShort)
    val scaled = base.map(s => (s * 3).toShort)
    assert(AudioHash.envelopePrint64(base) ==
      AudioHash.envelopePrint64(scaled))
  }

  test("exact 2x-resample invariance: duplicating every sample doubles " +
      "every window energy pairwise-equally") {
    val rnd = new scala.util.Random(12)
    val base = Array.fill(260)((rnd.nextInt(2001) - 1000).toShort)
    val doubled = base.flatMap(s => Array(s, s))
    assert(AudioHash.envelopePrint64(base) ==
      AudioHash.envelopePrint64(doubled))
  }

  test("degenerate inputs: under 65 samples -> 0 (no stable envelope); " +
      "junk bytes -> None through the WAV leg") {
    assert(AudioHash.envelopePrint64(Array.fill[Short](64)(5)) == 0L)
    assert(AudioHash.envelopePrintWav("junk".getBytes("US-ASCII")).isEmpty)
    assert(AudioHash.envelopePrintWav(
      SyntheticFixtures.wavBytes(Seq(asc), 8000)).get == -1L)
  }

  test("hammingNearDupPairs over the prints: the re-gained copy pairs " +
      "at hamming 0, the inverted envelope stays isolated") {
    import spark.implicits._
    val prints = Seq((1L, -1L), (2L, -1L), (3L, 0L)).toDF("id", "p")
    val got = Dedup.hammingNearDupPairs(prints, "id", "p",
        bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 2L, 0)))
  }
}
