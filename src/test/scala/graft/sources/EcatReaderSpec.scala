package graft.sources

import graft.SparkSpec
import graft.sources.SyntheticFixtures.ecatBytes

/** HRRT ECAT7 reader: [[SyntheticFixtures.ecatBytes]] writes the 512-byte
  * main header sequentially from the published layout while [[EcatReader]]
  * re-reads it by absolute offsets — independent expressions of the
  * format, cross-checked here plus BIC rules, the archive summary, and
  * malformed input. */
class EcatReaderSpec extends SparkSpec {

  private val epoch = 1704164645L // 2024-01-02T03:04:05Z

  test("main header fields land at the documented absolute offsets") {
    val v = ecatBytes("SUB001", "PET001", "Johns Hopkins Univ", 328, epoch, 2)
    val h = EcatReader.parseMainHeader(v).get
    assert(h.magic == "MATRIX72v")
    assert(h.systemType == 328)
    assert(h.fileType == 7)
    assert(h.scanStartTime == epoch)
    assert(h.isotopeName == "F-18")
    assert(h.patientId == "PET001")
    assert(h.patientName == "SUB001")
    assert(h.facilityName == "Johns Hopkins Univ")
    assert(h.studyDescription == "resting state FDG")
    assert(h.numPlanes == 207)
    assert(h.numFrames == 2)
  }

  test("hardened: malformed inputs yield None, never throw") {
    val v = ecatBytes("P", "ID", "F", 1, epoch)
    assert(EcatReader.parseMainHeader(Array.emptyByteArray).isEmpty)
    assert(EcatReader.parseMainHeader(v.take(100)).isEmpty)
    val badMagic = v.clone(); badMagic(0) = 'X'.toByte
    assert(EcatReader.parseMainHeader(badMagic).isEmpty)
    val rnd = new scala.util.Random(20260813L)
    (1 to 100).foreach { _ =>
      val junk = new Array[Byte](rnd.nextInt(2048))
      rnd.nextBytes(junk)
      EcatReader.parseMainHeader(junk) // must not throw
    }
  }

  test("scan applies BIC rules: test*.v demoted, facility overridden") {
    val dir = SyntheticFixtures.freshDir("ecat_spec")
    def put(n: String, b: Array[Byte]) =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, n), b)
    put("scan1.v", ecatBytes("SUB001", "PET001", "JHU", 328, epoch))
    put("testscan.v", ecatBytes("QC", "QC", "JHU", 328, epoch))
    put("broken.v", Array.fill[Byte](600)('x'))
    put("notes.txt", "x".getBytes("UTF-8"))
    val bic = EcatReader.files(spark, dir, bic = true).collect()
      .map(f => (f.file_name, f.is_ecat, f.parse_failed, f.facility_name))
      .sortBy(_._1)
    assert(bic.toSeq == Seq(
      ("broken.v", true, true, None),   // extension-counted, flagged
      ("notes.txt", false, false, None),
      ("scan1.v", true, false, Some("BIC-MNI_MCGILL")),
      ("testscan.v", false, false, None)))
    val nonBic = EcatReader.files(spark, dir, bic = false).collect()
      .map(f => (f.file_name, f.is_ecat, f.parse_failed, f.facility_name))
      .sortBy(_._1)
    assert(nonBic.toSeq == Seq(
      ("broken.v", true, true, None),
      ("notes.txt", false, false, None),
      ("scan1.v", true, false, Some("JHU")),
      ("testscan.v", true, false, Some("JHU"))))
  }

  test("matlabParams: key = value; lines, trailing semicolon+CR stripped") {
    val dir = SyntheticFixtures.freshDir("ecat_m")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "params.m"),
      "PROTOCOL = FDG_STATIC;\r\nDOSE = 5.2;\ncomment line\n".getBytes("UTF-8"))
    val rows = EcatReader.matlabParams(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2))).sortBy(_._1)
    assert(rows.toSeq == Seq(("DOSE", "5.2"), ("PROTOCOL", "FDG_STATIC")))
  }

  test("archive summary: first-ECAT study info, counts, dedup guard") {
    import org.apache.spark.sql.functions._
    val dir = SyntheticFixtures.freshDir("ecat_sum")
    def put(n: String, b: Array[Byte]) =
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, n), b)
    // scan2 sorts FIRST by path but scan_start differs: study info must
    // come from the path-sorted first file, not min/max of fields
    put("a_scan2.v", ecatBytes("SUB001", "PET001", "JHU", 328, epoch + 100))
    put("b_scan1.v", ecatBytes("SUB001", "PET001", "JHU", 328, epoch))
    put("readme.md", "x".getBytes("UTF-8"))
    val files = EcatReader.files(spark, dir).toDF()
      .withColumn("archive", lit("s1"))
    val row = graft.operators.HrrtSummary.archive(files).collect().head
    assert(row.getAs[String]("PatientName") == "SUB001")
    assert(row.getAs[String]("DateAcquired") == "2024-01-02")
    assert(row.getAs[Int]("EcatFileCount") == 2)
    assert(row.getAs[Int]("NonEcatFileCount") == 1)
    // an archive with zero ECAT files still surfaces (audit discipline)
    val withEmpty = files.withColumn("archive", lit("s1"))
      .unionByName(files.filter(!col("is_ecat"))
        .withColumn("archive", lit("s2")))
    val rows = graft.operators.HrrtSummary.archive(withEmpty)
      .orderBy("archive").collect()
    assert(rows.length == 2)
    assert(rows(1).getAs[Int]("EcatFileCount") == 0)
    assert(rows(1).isNullAt(rows(1).fieldIndex("PatientName")))
    val arch = graft.operators.HrrtSummary.archive(files)
    // guard: same archive already in the catalog -> rejected; empty
    // catalog -> admitted
    assert(graft.operators.HrrtSummary
      .guardNewArchives(arch, arch.select(col("Blake2bArchive"))).count() == 0)
    assert(graft.operators.HrrtSummary
      .guardNewArchives(arch,
        arch.select(lit("other").as("Blake2bArchive"))).count() == 1)
  }
}
