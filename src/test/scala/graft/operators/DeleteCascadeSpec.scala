package graft.operators

import graft.SparkSpec

class DeleteCascadeSpec extends SparkSpec {
  import spark.implicits._

  /** Fixture: two uploads/archives. Upload 1 → tarchive 100 with files
    * 1,2 (direct), intermediary output 3 (from 1), and per-file dependents;
    * upload 2 → tarchive 200 with file 4 — must be untouched. */
  private lazy val tables: Map[String, org.apache.spark.sql.DataFrame] = Map(
    "mri_upload" -> Seq((1L, 100L), (2L, 200L)).toDF("UploadID", "TarchiveID"),
    "tarchive" -> Seq((100L, "study1"), (200L, "study2")).toDF("TarchiveID", "DicomArchiveID"),
    "tarchive_series" -> Seq((100L, 1), (100L, 2), (200L, 1)).toDF("TarchiveID", "SeriesNumber"),
    "tarchive_files" -> Seq((100L, "a.dcm"), (200L, "b.dcm")).toDF("TarchiveID", "FileName"),
    "files" -> Seq(
      (1L, Some(100L), Option.empty[Long], 10L),
      (2L, Some(100L), Option.empty[Long], 11L),
      (3L, Option.empty[Long], Some(1L), 10L), // intermediary output of 1
      (4L, Some(200L), Option.empty[Long], 10L)
    ).toDF("FileID", "TarchiveSource", "SourceFileID", "MriScanTypeID"),
    "files_intermediary" -> Seq((50L, 1L, 3L)).toDF("IntermedID", "Input_FileID", "Output_FileID"),
    "parameter_file" -> Seq((1000L, 1L), (1001L, 2L), (1002L, 3L), (1003L, 4L))
      .toDF("ParameterFileID", "FileID"),
    "files_qcstatus" -> Seq((1L, "Pass"), (4L, "Pass")).toDF("FileID", "QCStatus"),
    "feedback_mri_comments" -> Seq((2L, "c")).toDF("FileID", "Comment"),
    "mri_protocol_violated_scans" -> Seq((100L, "v1"), (200L, "v2")).toDF("TarchiveID", "x"),
    "mri_violations_log" -> Seq((100L, "w")).toDF("TarchiveID", "y"),
    "MRICandidateErrors" -> Seq((200L, "e")).toDF("TarchiveID", "z"),
    "mri_scan_type" -> Seq((10L, "t1w"), (11L, "flair")).toDF("MriScanTypeID", "MriScanTypeName")
  )

  test("cascade for upload 1: direct + intermediary files, per-file and per-archive dependents") {
    val out = DeleteCascade.deleteImagingUpload(tables, uploadId = 1L)
    def ids(t: String, c: String): Set[Long] =
      out(t).select(c).collect().map(_.getLong(0)).toSet
    assert(ids("mri_upload", "UploadID") == Set(1L))
    assert(ids("tarchive", "TarchiveID") == Set(100L))
    assert(out("tarchive_series").count() == 2)
    assert(out("tarchive_files").count() == 1)
    assert(ids("files", "FileID") == Set(1L, 2L, 3L)) // 3 via lineage
    assert(ids("files_intermediary", "IntermedID") == Set(50L))
    assert(ids("parameter_file", "ParameterFileID") == Set(1000L, 1001L, 1002L))
    assert(ids("files_qcstatus", "FileID") == Set(1L))
    assert(ids("feedback_mri_comments", "FileID") == Set(2L))
    assert(out("mri_protocol_violated_scans").count() == 1)
    assert(out("mri_violations_log").count() == 1)
    assert(out("MRICandidateErrors").count() == 0) // belongs to tarchive 200
  }

  test("scan-type restriction: only t1w files (and their lineage) selected") {
    val out = DeleteCascade.deleteImagingUpload(tables, 1L, scanTypesToDelete = Seq("t1w"))
    val fids = out("files").select("FileID").collect().map(_.getLong(0)).toSet
    assert(fids == Set(1L, 3L)) // file 2 is flair; 3 is 1's output
    val pids = out("parameter_file").select("ParameterFileID")
      .collect().map(_.getLong(0)).toSet
    assert(pids == Set(1000L, 1002L))
  }

  test("missing optional tables are simply absent from the result") {
    val minimal = Map("mri_upload" -> tables("mri_upload"), "files" -> tables("files"))
    val out = DeleteCascade.deleteImagingUpload(minimal, 1L)
    assert(out.keySet == Set("mri_upload", "files"))
    assert(out("files").count() == 2) // no files_intermediary -> direct only
  }
}
