package graft.operators

import graft.SparkSpec

/** batch_uploads_imageuploader.pl intake quirks. */
class BatchUploaderSpec extends SparkSpec {

  private def run(lines: Seq[(Int, String, String, String)]) = {
    import spark.implicits._
    BatchUploader.intake(
      lines.toDF("line_no", "full_path", "phantom", "patient_name"),
      Seq(10L).toDF("UploadID"), "u", "p")
      .collect().map(r => r.getAs[Int]("line_no") -> r).toMap
  }

  test("extension is everything from the FIRST dot (fileparse quirk)") {
    val out = run(Seq(
      (1, "/d/a.b.tgz", "N", "a"),     // type .b.tgz -> rejected
      (2, "/d/ok.tgz", "N", "ok"),
      (3, "/d/x.tar.gz", "N", "x")))   // .tar.gz allowed as a whole
    assert(out(1).getAs[String]("status") == "file_type_check_failure")
    assert(out(2).getAs[String]("status") == "submitted")
    assert(out(3).getAs[String]("status") == "submitted")
  }

  test("phantom rows need a blank name and store the literal 'NULL'") {
    val out = run(Seq(
      (1, "/d/ph.zip", "Y", null),
      (2, "/d/ph2.zip", "Y", "x")))
    assert(out(1).getAs[String]("status") == "submitted")
    assert(out(1).getAs[String]("PatientName") == "NULL")
    assert(out(2).getAs[String]("status") == "pname_filename_mismatch")
  }

  test("ids continue from max(mri_upload) in line order, skipping rejects") {
    val out = run(Seq(
      (1, "/d/A_1_V1.tgz", "N", "A_1"),
      (2, "/d/bad.mnc", "N", "bad"),
      (3, "/d/B_2_V1.tgz", "N", "B_2")))
    assert(out(1).getAs[Long]("UploadID") == 11L)
    assert(out(2).isNullAt(out(2).fieldIndex("UploadID")))
    assert(out(3).getAs[Long]("UploadID") == 12L)
    assert(out(3).getAs[String]("command")
      == "imaging_upload_file.pl -profile p -upload_id 12 /d/B_2_V1.tgz")
  }
}
