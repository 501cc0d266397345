package graft.operators

import graft.SparkSpec

/** minc_to_bids_converter.pl naming quirks not already oracle-pinned by
  * q124: subcategory entity override, the "00$i" literal past run 9, and
  * -defaced sharing its base type's run numbering. */
class BidsExportSpec extends SparkSpec {

  private def names(files: Seq[(Long, Long, String, String, Int)],
      rel: Seq[(String, String, Option[String], String, Option[Int])]) = {
    import spark.implicits._
    BidsExport.exportNames(
      files.toDF("FileID", "candID", "visitLabel", "lorisScanType",
        "seriesNumber"),
      rel.toDF("ScanType", "BIDSCategoryName", "BIDSScanTypeSubCategory",
        "BIDSScanType", "BIDSEchoNumber"), "/b")
      .collect().map(r => r.getAs[Long]("FileID") -> r).toMap
  }

  test("subcategory entities OVERRIDE base entities (Perl hash order)") {
    // a subcategory declaring run-02 wins over the computed run number
    val out = names(
      Seq((1L, 5L, "V1", "special", 10)),
      Seq(("special", "anat", Some("acq-highres_run-02"), "T1w", None)))
    assert(out(1L).getAs[String]("nifti_name")
      == "sub-5_ses-V1_acq-highres_run-02_T1w.nii")
  }

  test("the literal \"00$i\" makes the tenth run run-0010") {
    val files = (1 to 10).map(i => (i.toLong, 5L, "V1", "t1", i))
    val out = names(files, Seq(("t1", "anat", None, "T1w", None)))
    assert(out(10L).getAs[String]("run_number") == "0010")
    assert(out(10L).getAs[String]("nifti_name")
      == "sub-5_ses-V1_run-0010_T1w.nii")
  }

  test("-defaced scans share the base type's run numbering") {
    val out = names(
      Seq((1L, 5L, "V1", "t1", 10), (2L, 5L, "V1", "t1-defaced", 20)),
      Seq(("t1", "anat", None, "T1w", None),
        ("t1-defaced", "anat", None, "T1w", None)))
    assert(out(1L).getAs[String]("run_number") == "001")
    assert(out(2L).getAs[String]("run_number") == "002") // same group
  }
}
