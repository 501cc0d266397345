package graft.operators

import graft.SparkSpec

/** EEG-BIDS uploader pair: subject-resolution precedence and pinning
  * cases beyond the q146/q147 oracle fixtures. */
class EegBidsUploadsSpec extends SparkSpec {

  test("sub-<CandID> wins over a pscid dir when both exist") {
    import spark.implicits._
    val uploads = Seq((1L, 41L, "Extracted"))
      .toDF("UploadID", "SessionID", "Status")
    val sessions = Seq((41L, 11L, "V1")).toDF("ID", "CandidateID",
      "Visit_label")
    val cands = Seq((11L, 300001L, "ABC001")).toDF("ID", "CandID", "PSCID")
    val dirs = Seq("sub-300001/ses-V1/eeg", "sub-ABC001/ses-V1/eeg")
      .toDF("dir_path")
    val physio = Seq.empty[(Long, Long)]
      .toDF("PhysiologicalFileID", "SessionID")
    val r = EegBidsUploads.planIngestion(uploads, sessions, cands, dirs,
      physio).collect()(0)
    assert(r.getAs[String]("subject_id") == "sub-300001")
  }

  test("case-insensitive pscid match pins the lexicographically smallest") {
    import spark.implicits._
    val uploads = Seq((1L, 41L, "Extracted"))
      .toDF("UploadID", "SessionID", "Status")
    val sessions = Seq((41L, 11L, "V1")).toDF("ID", "CandidateID",
      "Visit_label")
    val cands = Seq((11L, 300001L, "abc001")).toDF("ID", "CandID", "PSCID")
    // two dirs differing only by case, both matching sub-abc001 CI
    val dirs = Seq("sub-ABC001/ses-V1/eeg", "sub-Abc001/ses-V1/eeg")
      .toDF("dir_path")
    val physio = Seq.empty[(Long, Long)]
      .toDF("PhysiologicalFileID", "SessionID")
    val r = EegBidsUploads.planIngestion(uploads, sessions, cands, dirs,
      physio).collect()(0)
    assert(r.getAs[String]("subject_id") == "sub-ABC001") // min("ABC","Abc")
  }

  test("non-pending statuses are excluded from both plans") {
    import spark.implicits._
    val uploads = Seq((1L, "a.tar.gz", "Extracted"),
      (2L, "b.tar.gz", "Failed Extraction"))
      .toDF("UploadID", "UploadLocation", "Status")
    val members = Seq.empty[(String, String, String, Long, Boolean, Array[Byte])]
      .toDF("archive_path", "nested_in", "member_path", "size", "is_dir",
        "content")
    assert(EegBidsUploads.planExtraction(uploads, members).count() == 0L)
  }
}
