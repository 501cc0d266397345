package graft.operators

import graft.SparkSpec

/** delete_imaging_upload.pl composed: the QC gate must see intermediary
  * outputs, and the footprint honors the reference's duplicate-output and
  * path semantics (those two are also oracle-pinned by q122/q123). */
class DeleteUploadSpec extends SparkSpec {

  test("QC on an intermediary OUTPUT blocks the upload") {
    import spark.implicits._
    val uploads = Seq((1L, 100L)).toDF("UploadID", "TarchiveID")
    val files = Seq(
      (10L, "raw.mnc", Some(100L), None),
      (11L, "proc.mnc", None, Some(10L)))
      .toDF("FileID", "File", "TarchiveSource", "SourceFileID")
    val intermed = Seq((1L, 10L, 11L))
      .toDF("IntermedID", "Input_FileID", "Output_FileID")
    val qcOnOutput = Seq(11L).toDF("FileID") // QC on the PROCESSED file
    val none = Seq.empty[Long].toDF("FileID")
    val gate = DeleteUpload.qcGate(uploads, files, intermed,
      qcOnOutput, none).collect()(0)
    assert(gate.getAs[Long]("n_qc") == 1L)
    assert(!gate.getAs[Boolean]("deletable"))
    // and the footprint excludes the blocked upload entirely
    val fp = DeleteUpload.footprint(uploads, files, intermed,
      Seq.empty[(Long, Long, String)]
        .toDF("ParameterFileID", "FileID", "Value"),
      Seq.empty[(Long, Long, String)]
        .toDF("ID", "TarchiveID", "minc_location"),
      Seq.empty[(Long, Long, String)]
        .toDF("LogID", "TarchiveID", "MincFile"),
      Seq.empty[(Long, Long, String)]
        .toDF("ID", "TarchiveID", "MincFile"),
      qcOnOutput, none, dataDir = "/d")
    assert(fp.count() == 0)
  }

  test("a derived file NOT in files_intermediary is no QC obstacle") {
    import spark.implicits._
    val uploads = Seq((1L, 100L)).toDF("UploadID", "TarchiveID")
    val files = Seq(
      (10L, "raw.mnc", Some(100L), None),
      (11L, "side.mnc", None, Some(10L))) // derived, NOT an intermediary
      .toDF("FileID", "File", "TarchiveSource", "SourceFileID")
    val intermed = Seq.empty[(Long, Long, Long)]
      .toDF("IntermedID", "Input_FileID", "Output_FileID")
    val qcOnSide = Seq(11L).toDF("FileID")
    val none = Seq.empty[Long].toDF("FileID")
    val gate = DeleteUpload.qcGate(uploads, files, intermed,
      qcOnSide, none).collect()(0)
    assert(gate.getAs[Boolean]("deletable"))
  }
}
