package graft.sources

import graft.SparkSpec

/** MAT v7.3 (HDF5) path: the golden fixtures were written by
  * `tools/make_v73_fixtures.py` — a from-scratch python struct.pack
  * writer of the HDF5 spec subset (no h5py/libhdf5) — while [[Hdf5Lite]]
  * walks the same spec from the Scala side: independent twins, like
  * every other binary format here. */
class Hdf5LiteSpec extends SparkSpec {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    try in.readAllBytes() finally in.close()
  }

  test("EEG-struct layout: chunked+deflate data, chanlocs object refs") {
    val bytes = resource("v73_struct.set")
    assert(EeglabReader.isHdf5V73(bytes))
    val r = EeglabReader.parseSet(bytes).get
    assert(r.channelNames == IndexedSeq("Fz", "Pz"))
    assert(r.sampleRateHz == 4.0)
    assert(r.data(0).toSeq == (1 to 10).map(_.toDouble))
    assert(r.data(1).toSeq == (1 to 10).map(_ * 10.0))
  }

  test("fields-as-top-level layout with contiguous data") {
    val r = EeglabReader.parseSet(resource("v73_toplevel.set")).get
    assert(r.channelNames == IndexedSeq("Fz", "Pz"))
    assert(r.data(0).toSeq == (1 to 10).map(_.toDouble))
  }

  test("data-as-filename defers to the .fdt sibling") {
    val r = EeglabReader.parseSet(resource("v73_fdt.set")).get
    assert(r.fdtFile.contains("rec9.fdt"))
    assert(r.channelNames == IndexedSeq("Fz", "Pz"))
  }

  test("SIGNED int16 data decodes as numbers (incl. negatives), not text") {
    // MATLAB char is UNSIGNED u16; numeric int16 is SIGNED — the sign bit
    // is the only distinguisher without attribute parsing
    val r = EeglabReader.parseSet(resource("v73_int16.set")).get
    assert(r.channelNames == IndexedSeq("Fz", "Pz"))
    assert(r.fdtFile.isEmpty) // NOT misread as an .fdt filename
    assert(r.data(0).toSeq == (1 to 10).map(_ - 5.0))
    assert(r.data(1).toSeq == (1 to 10).map(_ * 10.0 - 50.0))
  }

  test("v7.3 parses identically to the same recording in v6") {
    val (v6, _) = SyntheticFixtures.eeglabBytes(
      Seq("Fz", "Pz"),
      Seq((1 to 10).map(_.toDouble).toArray, (1 to 10).map(_ * 10.0).toArray),
      srateHz = 4.0, trials = 1)
    val r6 = EeglabReader.parseSet(v6).get
    val r73 = EeglabReader.parseSet(resource("v73_struct.set")).get
    assert(r73.channelNames == r6.channelNames)
    assert(r73.sampleRateHz == r6.sampleRateHz)
    assert(r73.data.map(_.toSeq) == r6.data.map(_.toSeq))
  }

  test("scanAudit reports a parseable v7.3 as ok") {
    val dir = SyntheticFixtures.freshDir("v73_audit")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "modern.set"), resource("v73_struct.set"))
    val audit = EeglabReader.scanAudit(spark, dir).collect()
    assert(audit.map(a => (a.status, a.n_channels)).toSeq == Seq(("ok", 2)))
  }

  test("distributed scan ingests a v7.3 recording end to end") {
    val dir = SyntheticFixtures.freshDir("v73_scan")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "rec1.set"), resource("v73_struct.set"))
    val rows = EeglabReader.channels(spark, dir).collect()
      .map(c => (c.channel, c.sampling_rate_hz, c.n_samples)).sortBy(_._1)
    assert(rows.toSeq == Seq(("Fz", 4.0, 10L), ("Pz", 4.0, 10L)))
  }

  test("hardened: truncations and mutations of real HDF5 never throw") {
    val bytes = resource("v73_struct.set")
    val rnd = new scala.util.Random(20260813L)
    (1 to 300).foreach { _ =>
      val cut = java.util.Arrays.copyOfRange(bytes, 0,
        rnd.nextInt(bytes.length + 1))
      EeglabReader.parseSet(cut)       // must not throw
      val mut = bytes.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      EeglabReader.parseSet(mut)
      Hdf5Lite.parse(mut)
    }
    // a junk file with only the signature fails closed
    val sig = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n',
      0x1A, '\n')
    assert(Hdf5Lite.parse(sig ++ Array.fill[Byte](16)('x')).isEmpty)
    // random bytes BEHIND a valid signature stress the deep walkers
    // (object headers, B-trees, heaps, refs) — never a throw
    (1 to 200).foreach { _ =>
      val junk = new Array[Byte](rnd.nextInt(2048) + 64)
      rnd.nextBytes(junk)
      System.arraycopy(sig, 0, junk, 0, 8)
      Hdf5Lite.parse(junk)
      EeglabReader.parseSet(junk)
      // and behind a plausible v0 superblock prefix
      junk(8) = 0; junk(13) = 8; junk(14) = 8
      Hdf5Lite.parse(junk)
      EeglabReader.parseSet(junk)
    }
  }
}
