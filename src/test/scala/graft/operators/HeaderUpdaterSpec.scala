package graft.operators

import graft.SparkSpec
import graft.sources.{SyntheticFixtures, TarSink}

/** [[HeaderUpdater]] batch mode — `tools/updateHeadersBatch.pl`:
  * spec-file parse quirks and the key-hash-driven per-file update. */
class HeaderUpdaterSpec extends SparkSpec {

  test("parseSpecFile: key latch, comment/blank skip, odd-field drop") {
    val spec = HeaderUpdater.parseSpecFile(Seq(
      "# comment",
      "",
      "(0020,0011)\t2\tPatientName\tA\t(0008,0080)\tB",
      // later lines cannot extend the key tag list ($madeKeyList latch),
      // and the trailing odd ORPHAN field is dropped ($i<$#bits)
      "(0020,0011)\t3\tPatientID\tC\tORPHAN"), keyCols = 1)
    assert(spec.keyTags == Seq((0x0020, 0x0011)))
    assert(spec.setTable == Map(
      "2---" -> Seq("PatientName" -> "A", "(0008,0080)" -> "B"),
      "3---" -> Seq("PatientID" -> "C")))
  }

  test("parseSpecFile: non-tag key column contributes nothing to the hash") {
    val spec = HeaderUpdater.parseSpecFile(Seq(
      "notatag\t2\tPatientName\tA"), keyCols = 1)
    assert(spec.keyTags.isEmpty)
    assert(spec.setTable == Map("" -> Seq("PatientName" -> "A")))
  }

  test("parseSpecFile: tag pattern is an unanchored substring match") {
    // Perl `$bits[$i] =~ /\(..\)/` matches anywhere in the field, so a
    // decorated key column like 'x(0020,0011)y' is still a valid key.
    val spec = HeaderUpdater.parseSpecFile(Seq(
      "x(0020,0011)y\t7\tPatientName\tA"), keyCols = 1)
    assert(spec.keyTags == Seq((0x0020, 0x0011)))
    assert(spec.setTable == Map("7---" -> Seq("PatientName" -> "A")))
  }

  test("parseSpecFile: trailing key tag with no value appends empty seg") {
    // Perl: $bits[$i+1] is undef past the end, so `undef . "---"` still
    // contributes a '---' segment to the key.
    val spec = HeaderUpdater.parseSpecFile(Seq(
      "(0020,0011)\t2\t(0010,0020)"), keyCols = 2)
    assert(spec.keyTags == Seq((0x0020, 0x0011), (0x0010, 0x0020)))
    assert(spec.setTable == Map("2------" -> Seq()))
  }

  test("updateArchivesBatch rejects a spec with fewer key tags than keyCols") {
    // mirrors the Perl find handler dying on `@{$keys[$i]}` when the
    // first spec line's key columns don't all parse as (XXXX,YYYY) —
    // without this an empty keyTags list matches the '' spec row and
    // mass-rewrites every file.
    val dir = SyntheticFixtures.freshDir("huspec3")
    intercept[IllegalArgumentException] {
      HeaderUpdater.updateArchivesBatch(spark, dir,
        Seq("notatag\t2\tPatientName\tA"), keyCols = 1)
    }
  }

  test("two-key batch update matches on (series, patient id) jointly") {
    val dir = SyntheticFixtures.freshDir("huspec")
    def slice(series: Int, pid: String): Array[Byte] =
      SyntheticFixtures.dicomBytes(Seq(
        SyntheticFixtures.dicomElem(0x0010, 0x0010, "PN", "ORIG^NAME"),
        SyntheticFixtures.dicomElem(0x0010, 0x0020, "LO", pid),
        SyntheticFixtures.dicomElem(0x0020, 0x000D, "UI", "1.2.3.42"),
        SyntheticFixtures.dicomElem(0x0020, 0x0011, "IS", series.toString)))
    val inner = TarSink.tarBytes(Seq(
      "st/" -> Array.emptyByteArray,
      "st/a.dcm" -> slice(1, "P1"),
      "st/b.dcm" -> slice(1, "P2"), // same series, other patient: no match
      "st/c.dcm" -> slice(2, "P1"))) // other series: no match
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "DCM.tar"),
      TarSink.tarBytes(Seq("up/st.tar.gz" -> TarSink.gzipBytes(inner))))
    val out = HeaderUpdater.reparse(
      HeaderUpdater.updateArchivesBatch(spark, dir,
        Seq("(0020,0011)\t1\t(0010,0020)\tP1\tPatientName\tNEW^NAME"),
        keyCols = 2, glob = "*.tar"))
      .collect()
      .map(r => r.getAs[String]("member_path") ->
        r.getAs[String]("patient_name")).toMap
    assert(out == Map(
      "st/a.dcm" -> "NEW^NAME",
      "st/b.dcm" -> "ORIG^NAME",
      "st/c.dcm" -> "ORIG^NAME"))
  }

  test("unknown set field name throws up front") {
    val dir = SyntheticFixtures.freshDir("huspec2")
    intercept[IllegalArgumentException] {
      HeaderUpdater.updateArchivesBatch(spark, dir,
        Seq("(0020,0011)\t1\tNoSuchDicomField\tX"), keyCols = 1)
    }
  }

  test("gz outer archives rebuild gzip-compressed; flat top-level DICOM " +
      "members are rewritten and reparsed; Perl numeric coercion never throws") {
    val dir = SyntheticFixtures.freshDir("huspec3")
    def slice(series: String): Array[Byte] =
      SyntheticFixtures.dicomBytes(Seq(
        SyntheticFixtures.dicomElem(0x0010, 0x0010, "PN", "ORIG^NAME"),
        SyntheticFixtures.dicomElem(0x0020, 0x000D, "UI", "1.2.3.43"),
        SyntheticFixtures.dicomElem(0x0020, 0x0011, "IS", series)))
    // FLAT archive: DICOM files at tar top level, gz-compressed outer,
    // one member with the Perl-coercible series string "1-2" (leading 1)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "FLAT.tar.gz"),
      TarSink.gzipBytes(TarSink.tarBytes(Seq(
        "a.dcm" -> slice("1"),
        "b.dcm" -> slice("1-2"),   // old takeWhile+toLong THREW here
        "c.dcm" -> slice("2")))))
    val rebuilt = HeaderUpdater.updateArchives(spark, dir,
      Seq(("PatientName", "NEW^NAME")), targetSeries = Some(1))
    val arcs = rebuilt.collect()
    assert(arcs.length == 1)
    // the .tar.gz path must hold GZIP bytes, not a bare tar
    val c = arcs.head.content
    assert((c(0) & 0xFF) == 0x1f && (c(1) & 0xFF) == 0x8b,
      "rebuilt .tar.gz is not gzip-compressed")
    // reparse covers TOP-LEVEL members now: a and b (series 1 via
    // coercion) renamed, c untouched
    val out = HeaderUpdater.reparse(rebuilt).collect()
      .map(r => r.getAs[String]("member_path") ->
        r.getAs[String]("patient_name")).toMap
    assert(out == Map(
      "a.dcm" -> "NEW^NAME",
      "b.dcm" -> "NEW^NAME",
      "c.dcm" -> "ORIG^NAME"), out.toString)
  }

  test("names past the 100-byte ustar field round-trip via GNU longname") {
    val long = "deep/" + ("d" * 60) + "/" + ("f" * 60) + ".dcm"
    val img = TarSink.tarBytes(Seq(long -> Array[Byte](1, 2, 3)))
    val back = graft.sources.TarArchive.listEntries(img)
    assert(back.map(_.path) == Seq(long))
    assert(back.head.data.toSeq == Seq[Byte](1, 2, 3))
  }
}
