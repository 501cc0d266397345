package graft.sources

import graft.SparkSpec
import graft.sources.SyntheticFixtures.{eeglabBytes, eeglabRecordingBytes}

/** S14 EEGLAB `.set` reader: [[SyntheticFixtures.eeglabBytes]] writes the
  * MAT Level-5 structure sequentially from the published layout while
  * [[EeglabReader]] re-walks it element by element — independent
  * expressions of the format, cross-checked here over the in-file numeric
  * case, the `.fdt` sibling case, trial reshaping, and malformed input. */
class EeglabReaderSpec extends SparkSpec {

  private val labels = Seq("Fz", "Pz")
  private val traces = Seq(
    (1 to 10).map(_.toDouble).toArray, (1 to 10).map(_ * 10.0).toArray)

  test("in-file numeric data: names, srate, column-major trial concat") {
    val (set, _) = eeglabBytes(labels, traces, srateHz = 4.0, trials = 2)
    val r = EeglabReader.parseSet(set).get
    assert(r.channelNames == IndexedSeq("Fz", "Pz"))
    assert(r.sampleRateHz == 4.0)
    assert(r.fdtFile.isEmpty)
    assert(r.data(0).toSeq == (1 to 10).map(_.toDouble))
    assert(r.data(1).toSeq == (1 to 10).map(_ * 10.0))
  }

  test("single-trial layout parses identically") {
    val (set, _) = eeglabBytes(labels, traces, srateHz = 4.0, trials = 1)
    val r = EeglabReader.parseSet(set).get
    assert(r.data(0).toSeq == (1 to 10).map(_.toDouble))
  }

  test("data-as-filename defers to the .fdt sibling (float32, chan-fastest)") {
    val (set, fdt) = eeglabBytes(labels, traces, srateHz = 4.0, trials = 2,
      asFdt = Some("rec1.fdt"))
    val r = EeglabReader.parseSet(set).get
    assert(r.fdtFile.contains("rec1.fdt"))
    val t = EeglabReader.fdtTraces(2, fdt)
    assert(t(0).toSeq == (1 to 10).map(_.toDouble))
    assert(t(1).toSeq == (1 to 10).map(_ * 10.0))
  }

  test("MAT v7 (zlib-compressed elements) parses identically to v6") {
    val (v6, _) = eeglabBytes(labels, traces, srateHz = 4.0, trials = 2)
    val v7 = SyntheticFixtures.matV7Of(v6)
    assert(v7.length < v6.length) // actually compressed
    val r6 = EeglabReader.parseSet(v6).get
    val r7 = EeglabReader.parseSet(v7).get
    assert(r7.channelNames == r6.channelNames)
    assert(r7.sampleRateHz == r6.sampleRateHz)
    assert(r7.data.map(_.toSeq) == r6.data.map(_.toSeq))
    // corrupted deflate stream fails closed
    val broken = v7.clone()
    broken(200) = (broken(200) ^ 0x55).toByte
    val parsed = EeglabReader.parseSet(broken)
    assert(parsed.isEmpty || parsed.get.data.isEmpty)
  }

  test("multi-variable v7: consecutive miCOMPRESSED elements are UNPADDED") {
    // fields-as-top-level-variables layout: six separate compressed
    // elements back-to-back; any 8-byte padding assumption between them
    // drops every variable after the first.
    val v6 = SyntheticFixtures.eeglabTopLevelBytes(labels, traces, srateHz = 4.0)
    val r6 = EeglabReader.parseSet(v6).get
    val v7 = SyntheticFixtures.matV7Of(v6)
    val r7 = EeglabReader.parseSet(v7).get
    assert(r7.channelNames == IndexedSeq("Fz", "Pz"))
    assert(r7.sampleRateHz == 4.0)
    assert(r7.data.map(_.toSeq) == r6.data.map(_.toSeq))
    assert(r7.data(0).toSeq == (1 to 10).map(_.toDouble))
    // at least one compressed element must have a non-multiple-of-8 size
    // for this test to prove anything about padding
    val b = java.nio.ByteBuffer.wrap(v7)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.position(128)
    var sawOdd = false
    while (b.remaining() >= 8) {
      val _ = b.getInt(); val size = b.getInt()
      if (size % 8 != 0) sawOdd = true
      b.position(b.position() + math.min(size, b.remaining()))
    }
    assert(sawOdd, "fixture compressed sizes all 8-aligned; test is vacuous")
  }

  test("hardened: malformed/out-of-scope inputs yield None, never throw") {
    val (set, _) = eeglabRecordingBytes()
    assert(EeglabReader.parseSet(Array.emptyByteArray).isEmpty)
    assert(EeglabReader.parseSet(set.take(100)).isEmpty)
    val bigEndian = set.clone()
    bigEndian(126) = 'M'.toByte; bigEndian(127) = 'I'.toByte
    assert(EeglabReader.parseSet(bigEndian).isEmpty)
    // truncated mid-element: header valid, elements cut
    assert(EeglabReader.parseSet(set.take(200)).toSeq
      .flatMap(_.data).isEmpty || EeglabReader.parseSet(set.take(200)).isEmpty)
    // miCOMPRESSED wrapper holding garbage (not a zlib stream) fails closed
    val badZ = set.take(128) ++ Array[Byte](15, 0, 0, 0, 16, 0, 0, 0) ++
      new Array[Byte](16)
    assert(EeglabReader.parseSet(badZ).isEmpty)
  }

  test("fuzz: random bytes, truncations and mutations never throw") {
    val rnd = new scala.util.Random(20260813L)
    val (set, fdt) = eeglabRecordingBytes()
    (1 to 200).foreach { _ =>
      val junk = new Array[Byte](rnd.nextInt(4096))
      rnd.nextBytes(junk)
      EeglabReader.parseSet(junk)                  // must not throw
      EeglabReader.fdtTraces(2, junk)
      val cut = java.util.Arrays.copyOfRange(set, 0,
        rnd.nextInt(set.length + 1))
      EeglabReader.parseSet(cut)
      val mut = set.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      EeglabReader.parseSet(mut)
      EeglabReader.fdtTraces(2,
        java.util.Arrays.copyOfRange(fdt, 0, rnd.nextInt(fdt.length + 1)))
    }
  }

  test("distributed scan: one row per channel; fdt sibling streamed") {
    val (set, fdt) = eeglabRecordingBytes(asFdt = Some("rec2.fdt"))
    val dir = SyntheticFixtures.materialize("eeglab_spec", "rec2.set", set)
    SyntheticFixtures.materialize("eeglab_spec", "rec2.fdt", fdt)
    val rows = EeglabReader.channels(spark, dir).collect()
      .map(c => (c.channel, c.sampling_rate_hz, c.n_samples)).sortBy(_._1)
    assert(rows.toSeq == Seq(("Fz", 4.0, 10L), ("Pz", 4.0, 10L)))
  }

  test("scanAudit flags v7.3/HDF5 with a reason instead of silent None") {
    val (set, _) = eeglabRecordingBytes()
    val dir = SyntheticFixtures.materialize("eeglab_audit", "good.set", set)
    // v7.3 shape: "MATLAB 7.3" header text + HDF5 signature at 512
    val v73 = new Array[Byte](1024)
    val txt = "MATLAB 7.3 MAT-file".getBytes("US-ASCII")
    System.arraycopy(txt, 0, v73, 0, txt.length)
    val sig = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n')
    System.arraycopy(sig, 0, v73, 512, 8)
    SyntheticFixtures.materialize("eeglab_audit", "modern.set", v73)
    SyntheticFixtures.materialize("eeglab_audit", "junk.set",
      "not matlab".getBytes("US-ASCII"))
    val audit = EeglabReader.scanAudit(spark, dir).collect()
      .map(a => (new java.io.File(a.file_path).getName, a.status, a.n_channels))
      .sortBy(_._1)
    assert(audit.toSeq == Seq(
      ("good.set", "ok", 2),
      ("junk.set", "parse_failed", 0),
      ("modern.set", "hdf5_v73_unreadable", 0)))
  }

  test("sibling resolution survives percent-encoded scan paths (spaces)") {
    // binaryFile reports "sub 01" as "sub%2001"; building the .fdt path
    // from the raw URI string used to resolve to a nonexistent file and
    // silently skip every channel row (ADVICE r3)
    val (set, fdt) = eeglabRecordingBytes(asFdt = Some("rec3.fdt"))
    val dir = SyntheticFixtures.materialize("eeglab sp dir", "rec3.set", set)
    SyntheticFixtures.materialize("eeglab sp dir", "rec3.fdt", fdt)
    val rows = EeglabReader.channels(spark, dir).collect()
      .map(c => (c.channel, c.n_samples)).sortBy(_._1)
    assert(rows.toSeq == Seq(("Fz", 10L), ("Pz", 10L)))
  }
}
