package graft.operators

import graft.SparkSpec

/** tarchiveLoader completion + upload validation: cases beyond the
  * q149/q150 oracle fixtures. */
class LoaderCompletionSpec extends SparkSpec {

  private val cols = Seq("upload_id", "tarchive_id", "archive_path",
    "date_acquired", "cand_id", "pscid", "is_phantom", "mri_alias",
    "temp_suffix", "mcount", "n_inserted", "old_inserted",
    "resolved_session_id", "create_visit_label")

  test("inserted count ACCUMULATES while created OVERWRITES") {
    import spark.implicits._
    val up = Seq((1L, 2L, "/t/inbox/a.tar", Some("2024-01-01"),
      Some("42"), "P1", false, "AL", "t", 7L, 3L, Some(10L), Some(9L),
      false)).toDF(cols: _*)
    val r = TarchiveLoader.complete(up, "/t").collect()(0)
    assert(r.getAs[Long]("number_of_minc_inserted") == 13L) // 10 + 3
    assert(r.getAs[Long]("number_of_minc_created") == 7L)   // this run only
  }

  test("the year-dir gate is case-insensitive on the library path") {
    import spark.implicits._
    val up = Seq((1L, 2L, "/T/2024/a.tar", Some("2024-01-01"),
      Some("42"), "P1", false, "AL", "t", 2L, 1L, Option.empty[Long],
      Some(9L), false)).toDF(cols: _*)
    val r = TarchiveLoader.complete(up, "/t").collect()(0)
    assert(r.getAs[String]("new_tarchive_location") == null) // /i match
  }

  test("missing CandID falls back to the tmpdir-suffix logfile") {
    import spark.implicits._
    val up = Seq((1L, 2L, "/t/inbox/a.tar", Some("2024-01-01"),
      Option.empty[String], "P1", false, "AL", "xyz", 2L, 1L,
      Option.empty[Long], Some(9L), false)).toDF(cols: _*)
    val r = TarchiveLoader.complete(up, "/t").collect()(0)
    assert(r.getAs[String]("final_logfile") == "AL_xyz.log.gz")
  }

  test("upload validation rejects a bad lookupCenterNameUsing") {
    import spark.implicits._
    val up = Seq((1L, Some("P"), Option.empty[Long], Option.empty[Long],
      "N")).toDF("UploadID", "PatientName", "TarchiveID",
      "number_of_mincCreated", "IsPhantom")
    val files = Seq.empty[(Long, String, Boolean, String, String)]
      .toDF("upload_id", "file_path", "is_dicom", "header_pname",
        "header_pid")
    intercept[IllegalArgumentException] {
      UploadValidation.isCandidateInfoValid(up, files,
        lookupCenterNameUsing = "StudyDate")
    }
  }

  test("PatientID lookup field is honored") {
    import spark.implicits._
    val up = Seq((1L, Some("PID42"), Option.empty[Long],
      Option.empty[Long], "N")).toDF("UploadID", "PatientName",
      "TarchiveID", "number_of_mincCreated", "IsPhantom")
    val files = Seq((1L, "d/x.dcm", true, "WRONG", "PID42_suffix"))
      .toDF("upload_id", "file_path", "is_dicom", "header_pname",
        "header_pid")
    val r = UploadValidation.isCandidateInfoValid(up, files,
      lookupCenterNameUsing = "PatientID").collect()(0)
    assert(r.getAs[String]("status") == "validated")
  }
}
