package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** tarchive_validation.pl vertical: gate order, getPSC fallback ladder,
  * scanner get-or-create incl. the serial-only re-probe, and the
  * mismatch-does-not-block-validation quirk. */
class TarchiveValidationSpec extends SparkSpec {

  private def psc: DataFrame = {
    import spark.implicits._
    Seq((1, "Montreal Neuro", "MTL"), (2, "Ottawa General", "OTT"))
      .toDF("CenterID", "Alias", "MRI_alias")
  }
  private def candidates: DataFrame = {
    import spark.implicits._
    Seq((11L, 300001L, "MTL0001"), (13L, 300003L, "OTT0001"))
      .toDF("ID", "CandID", "PSCID")
  }
  private def sessions: DataFrame = {
    import spark.implicits._
    Seq((11L, 1, "V1")).toDF("CandidateID", "CenterID", "Visit_label")
  }
  private def scanners: DataFrame = {
    import spark.implicits._
    Seq(
      (501L, "SIEMENS", "Prisma", "SN100", "VE11C", Some(900001L)),
      // serial exists but scanner has NO candidate link → re-probe misses
      (502L, "SIEMENS", "Skyra", "SN200", "VE11E", None),
      // serial-only re-probe target: different model, linked candidate
      (503L, "GE", "MR750", "SN300", "DV26", Some(900003L)))
      .toDF("ID", "Manufacturer", "Model", "Serial_number", "Software",
        "CandidateID")
  }

  test("getPSC: session lookup wins over alias regex; UNKN when neither") {
    import spark.implicits._
    val decoded = Seq(
      // session (MTL0001, V1) exists at center 1 — even though the name
      // also matches the OTT alias, session wins (MRI.pm:1117-1129)
      (1L, "OTT_then_MTL0001_300001_V1", "MTL0001", "V1"),
      // no session → alias regex: OTT matches case-insensitively
      (2L, "ott9999_999999_V9", "ott9999", "V9"),
      (3L, "nothing_matches_here", "nothing", "here"))
      .toDF("upload_id", "patient_name", "pscid", "visit_label")
    val out = TarchiveValidation
      .resolveCenter(decoded, psc, sessions, candidates)
      .orderBy("upload_id").collect()
    assert(out(0).getAs[Int]("center_id") == 1)
    assert(out(0).getAs[String]("mri_alias") == "MTL")
    assert(out(1).getAs[Int]("center_id") == 2)
    assert(out(1).getAs[String]("mri_alias") == "OTT")
    assert(out(2).getAs[Int]("center_id") == 0)
    assert(out(2).getAs[String]("mri_alias") == "UNKN")
  }

  test("scanner: exact tuple, serial re-probe needs candidate link, create") {
    import spark.implicits._
    val uploads = Seq(
      (1L, "SIEMENS", "Prisma", "SN100", "VE11C"), // exact → 501
      // 4-tuple miss (software upgraded), serial SN300 linked → 503
      (2L, "GE", "MR750", "SN300", "DV27"),
      // 4-tuple miss, serial SN200 exists but unlinked → NEW scanner
      (3L, "SIEMENS", "Skyra", "SN200", "VE12"),
      // totally new serial → NEW scanner
      (4L, "PHILIPS", "Achieva", "SN400", "R5"))
      .toDF("upload_id", "manufacturer", "model", "serial", "software")
    val out = TarchiveValidation.resolveScanner(uploads, scanners)
      .orderBy("upload_id").collect()
    assert(out(0).getAs[Long]("scanner_id") == 501L)
    assert(!out(0).getAs[Boolean]("scanner_is_new"))
    assert(out(1).getAs[Long]("scanner_id") == 503L)
    assert(!out(1).getAs[Boolean]("scanner_is_new"))
    // new ids continue above max(503), ordered by tuple: PHILIPS < SIEMENS
    assert(out(3).getAs[Long]("scanner_id") == 504L)
    assert(out(2).getAs[Long]("scanner_id") == 505L)
    assert(out(2).getAs[Boolean]("scanner_is_new"))
    assert(out(3).getAs[Boolean]("scanner_is_new"))
  }

  test("gate order and the mismatch-does-not-block quirk") {
    import spark.implicits._
    val tarchive = Seq(
      (21L, "a.tar", "aaa  /t/a.tar", "MTL0001_300001_V1"),
      (22L, "b.tar", "bbb  /t/b.tar", "MTL0009_300009_V1"))
      .toDF("TarchiveID", "ArchiveLocation", "md5sumArchive", "PatientName")
      .withColumn("ScannerManufacturer", lit("SIEMENS"))
      .withColumn("ScannerModel", lit("Prisma"))
      .withColumn("ScannerSerialNumber", lit("SN100"))
      .withColumn("ScannerSoftwareVersion", lit("VE11C"))
    val uploads = Seq((70L, 21L, "a.tar"), (71L, 22L, "b.tar"))
      .toDF("UploadID", "TarchiveID", "ArchiveLocation")
    val fsMd5 = Seq(("a.tar", "aaa  /d/a.tar"), ("b.tar", "bbb  /d/b.tar"))
      .toDF("archive_location", "fs_md5")
    import spark.implicits._
    val vw = Seq("V1").toDF("Visit_label")
    val out = TarchiveValidation.validateUploads(uploads, tarchive, fsMd5,
      psc, sessions, candidates, vw, scanners)
      .orderBy("upload_id").collect()
    assert(out(0).getAs[String]("status") == "validated")
    assert(out(0).getAs[String]("cand_mismatch_error") == null)
    // unknown candidate: error is reported AND the archive still validates
    assert(out(1).getAs[String]("status") == "validated")
    assert(out(1).getAs[String]("cand_mismatch_error") ==
      "CandID does not exist")
    assert(out(1).getAs[Boolean]("is_tarchive_validated"))
  }

  test("createVisitLabel suppresses the visit-window mismatch") {
    import spark.implicits._
    val tarchive = Seq(
      (21L, "a.tar", "aaa  /t/a.tar", "MTL0001_300001_V9"))
      .toDF("TarchiveID", "ArchiveLocation", "md5sumArchive", "PatientName")
      .withColumn("ScannerManufacturer", lit("SIEMENS"))
      .withColumn("ScannerModel", lit("Prisma"))
      .withColumn("ScannerSerialNumber", lit("SN100"))
      .withColumn("ScannerSoftwareVersion", lit("VE11C"))
    val uploads = Seq((70L, 21L, "a.tar"))
      .toDF("UploadID", "TarchiveID", "ArchiveLocation")
    val fsMd5 = Seq(("a.tar", "aaa  /d/a.tar"))
      .toDF("archive_location", "fs_md5")
    val vw = Seq("V1").toDF("Visit_label")
    def run(create: Boolean) = TarchiveValidation.validateUploads(
      uploads, tarchive, fsMd5, psc, sessions, candidates, vw, scanners,
      createVisitLabel = create).collect()(0)
    assert(run(create = false).getAs[String]("cand_mismatch_error") ==
      "Visit label V9 does not exist in Visit_Windows")
    assert(run(create = true).getAs[String]("cand_mismatch_error") == null)
  }
}
