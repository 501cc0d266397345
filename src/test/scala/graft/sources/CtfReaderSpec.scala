package graft.sources

import graft.SparkSpec
import graft.sources.SyntheticFixtures.{CtfChan, ctfBytes}

/** S14 CTF reader: [[SyntheticFixtures.ctfBytes]] writes the res4/meg4
  * pair SEQUENTIALLY (field after field) while [[CtfReader]] parses by
  * ABSOLUTE offset — two independent expressions of the published layout.
  * The offset-pinning test below anchors both to the documented constants
  * (general setup at 1288, sample rate at 1296, run metadata at 1360,
  * run-description size at 1776), so writer and reader cannot drift
  * together away from the format. */
class CtfReaderSpec extends SparkSpec {

  private def beF64At(b: Array[Byte], o: Int): Double = {
    var bits = 0L
    (0 until 8).foreach(i => bits = (bits << 8) | (b(o + i) & 0xFFL))
    java.lang.Double.longBitsToDouble(bits)
  }
  private def beI32At(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
      ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)

  private val twoChan = Seq(
    CtfChan("MLC11-2805", 0.5, 4.0), CtfChan("MZC01-2805", 0.5, 4.0))
  private val twoTrials = Seq(
    Seq(Array(2, 4, 6, 8, 10), Array(20, 40, 60, 80, 100)),
    Seq(Array(12, 14, 16, 18, 20), Array(120, 140, 160, 180, 200)))

  test("sequential writer lands fields at the documented absolute offsets") {
    val (res4, meg4) = ctfBytes(twoChan, twoTrials, sampleRateHz = 4.0)
    assert(new String(res4, 0, 7, "US-ASCII") == "MEG41RS")
    assert(beI32At(res4, 1288) == 5)                 // no_samples per trial
    assert(((res4(1292) << 8) | (res4(1293) & 0xFF)) == 2) // no_channels
    assert(beF64At(res4, 1296) == 4.0)               // sample_rate
    assert(((res4(1312) << 8) | (res4(1313) & 0xFF)) == 2) // no_trials
    assert(new String(res4, 1360, 4, "US-ASCII") == "run1")
    assert(beI32At(res4, 1776) == "synthetic run description".length)
    assert(new String(meg4, 0, 7, "US-ASCII") == "MEG41CP")
  }

  test("res4 parse: header fields, filter navigation, clean_names, gains") {
    val (res4, _) = ctfBytes(twoChan, twoTrials)
    val h = CtfReader.parseRes4(res4).get
    assert(h.samplesPerTrial == 5 && h.nChannels == 2 && h.nTrials == 2)
    assert(h.sampleRateHz == 4.0)
    // suffix stripped (ctf_to_chunks clean_names), gains read per channel
    assert(h.sensors.map(_.name) == Seq("MLC11", "MZC01"))
    assert(h.sensors.forall(s => s.properGain == 0.5 && s.qGain == 4.0))
    assert(h.sensors.forall(_.cal == 0.5))
  }

  test("meg4 decode: trial-major concat, calibration, truncated trial drop") {
    val (res4, meg4) = ctfBytes(twoChan, twoTrials)
    val h = CtfReader.parseRes4(res4).get
    val t = CtfReader.traces(h, meg4).map(x => x._1 -> x._3.toSeq).toMap
    assert(t("MLC11") == (1 to 10).map(_.toDouble))
    assert(t("MZC01") == (1 to 10).map(_ * 10.0))
    // cut the second trial in half: it must be dropped whole
    val cut = meg4.take(8 + (2 * 5 * 4) + (1 * 5 * 4) / 2)
    val tc = CtfReader.traces(h, cut).map(x => x._1 -> x._3.toSeq).toMap
    assert(tc("MLC11") == (1 to 5).map(_.toDouble))
    assert(tc("MZC01") == (1 to 5).map(_ * 10.0))
  }

  test("hardened: malformed inputs yield None/empty, never throw") {
    val (res4, meg4) = ctfBytes(twoChan, twoTrials)
    assert(CtfReader.parseRes4(Array.emptyByteArray).isEmpty)
    assert(CtfReader.parseRes4(res4.take(1000)).isEmpty)
    val badMagic = res4.clone(); badMagic(0) = 'X'.toByte
    assert(CtfReader.parseRes4(badMagic).isEmpty)
    val badChan = res4.clone(); badChan(1292) = 0x7F.toByte // 32k channels
    assert(CtfReader.parseRes4(badChan).isEmpty)
    val h = CtfReader.parseRes4(res4).get
    assert(CtfReader.traces(h, Array.emptyByteArray).isEmpty)
    assert(CtfReader.traces(h, "MEG41XX".getBytes("US-ASCII")).isEmpty)
    assert(CtfReader.traces(h, meg4.take(7)).isEmpty)
  }

  test("fuzz: random bytes, truncations and mutations never throw") {
    val rnd = new scala.util.Random(20260813L)
    val (res4, meg4) = ctfBytes(twoChan, twoTrials)
    val h = CtfReader.parseRes4(res4).get
    (1 to 200).foreach { _ =>
      val junk = new Array[Byte](rnd.nextInt(4096))
      rnd.nextBytes(junk)
      CtfReader.parseRes4(junk)                    // must not throw
      CtfReader.traces(h, junk)
      val cut = java.util.Arrays.copyOfRange(res4, 0,
        rnd.nextInt(res4.length + 1))
      CtfReader.parseRes4(cut)
      val mut = res4.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      CtfReader.parseRes4(mut).foreach(hm => CtfReader.traces(hm, meg4))
      val mcut = java.util.Arrays.copyOfRange(meg4, 0,
        rnd.nextInt(meg4.length + 1))
      CtfReader.traces(h, mcut)
    }
  }

  test("distributed scan pairs res4 with sibling meg4, one row per channel") {
    val (res4, meg4) = ctfBytes(twoChan, twoTrials)
    val dir = SyntheticFixtures.materialize("ctf_spec", "rec1.res4", res4)
    SyntheticFixtures.materialize("ctf_spec", "rec1.meg4", meg4)
    val rows = CtfReader.channels(spark, dir).collect()
      .map(c => (c.channel, c.sampling_rate_hz, c.n_samples)).sortBy(_._1)
    assert(rows.toSeq == Seq(("MLC11", 4.0, 10L), ("MZC01", 4.0, 10L)))
  }

  test("2 GB continuation files: .meg4 + .1_meg4 == the single-file read") {
    val (res4, meg4) = ctfBytes(twoChan, twoTrials)
    val h = CtfReader.parseRes4(res4).get
    // split after trial 1: each file carries its own 8-byte magic
    val perTrial = h.nChannels * h.samplesPerTrial * 4
    val magic = java.util.Arrays.copyOfRange(meg4, 0, 8)
    val file1 = java.util.Arrays.copyOfRange(meg4, 0, 8 + perTrial)
    val file2 = magic ++ java.util.Arrays.copyOfRange(
      meg4, 8 + perTrial, meg4.length)
    val whole = CtfReader.traces(h, meg4)
      .map { case (n, r, v) => (n, r, v.toSeq) }
    val multi = CtfReader.tracesMulti(h, Iterator(file1, file2))
      .map { case (n, r, v) => (n, r, v.toSeq) }
    assert(multi == whole)
    // distributed scan picks the continuation up by naming convention
    val dir = SyntheticFixtures.freshDir("ctf_split")
    def put(n: String, b: Array[Byte]) =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, n), b)
    put("rec1.res4", res4)
    put("rec1.meg4", file1)
    put("rec1.1_meg4", file2)
    val rows = CtfReader.channels(spark, dir).collect()
      .map(c => (c.channel, c.n_samples)).sortBy(_._1)
    assert(rows.toSeq == Seq(("MLC11", 10L), ("MZC01", 10L)))
  }

  test("scanAudit surfaces parse failures instead of a silent empty ingest") {
    val (res4, meg4) = ctfBytes(twoChan, twoTrials)
    val dir = SyntheticFixtures.materialize("ctf_audit", "good.res4", res4)
    SyntheticFixtures.materialize("ctf_audit", "good.meg4", meg4)
    // a res4 whose layout diverges from the fixed offsets (truncated here)
    SyntheticFixtures.materialize("ctf_audit", "diverged.res4",
      java.util.Arrays.copyOfRange(res4, 0, 500))
    // a valid res4 with no readable sibling meg4
    SyntheticFixtures.materialize("ctf_audit", "orphan.res4", res4)
    val audit = CtfReader.scanAudit(spark, dir).collect()
      .map(a => (new java.io.File(a.file_path).getName, a.status, a.n_channels))
      .sortBy(_._1)
    assert(audit.toSeq == Seq(
      ("diverged.res4", "res4_parse_failed", 0),
      ("good.res4", "ok", 2),
      ("orphan.res4", "meg4_unreadable", 2)))
  }
}
