package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BidsPathSpec extends SparkSpec {

  private def name(entities: Map[String, String], suffix: String,
      ext: String = ".nii.gz"): String = {
    import spark.implicits._
    Seq(1).toDF("x").select(
      BidsPath.bidsFilename(
        map(entities.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*),
        lit(suffix), lit(ext)).as("f"))
      .first().getString(0)
  }

  test("canonical entity order with skips") {
    assert(name(Map("sub" -> "123456", "ses" -> "V1", "run" -> "2",
      "acq" -> "mprage"), "T1w") ==
      "sub-123456_ses-V1_acq-mprage_run-2_T1w.nii.gz")
  }

  test("entities render in fixed order regardless of map order") {
    assert(name(Map("echo" -> "2", "sub" -> "s", "task" -> "rest"), "bold") ==
      "sub-s_task-rest_echo-2_bold.nii.gz")
  }

  test("magnitude-echo fold: echo entity folds into suffix") {
    assert(name(Map("sub" -> "s", "ses" -> "V1", "echo" -> "1"), "magnitude") ==
      "sub-s_ses-V1_magnitude1.nii.gz")
  }

  test("niftiExt extracts .nii and .nii.gz") {
    import spark.implicits._
    val out = Seq("a/b.nii.gz", "c.nii", "d.txt").toDF("p")
      .select(BidsPath.niftiExt(col("p"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq(".nii.gz", ".nii", ""))
  }

  test("s3PathRewrite swaps the local prefix") {
    import spark.implicits._
    val out = Seq("/data/loris/bids/sub-1/a.nii.gz").toDF("p")
      .select(BidsPath.s3PathRewrite(col("p"), "/data/loris", "s3://bucket"))
      .first().getString(0)
    assert(out == "s3://bucket/bids/sub-1/a.nii.gz")
  }

  test("decodePatientName splits PSCID_CandID_Visit") {
    import spark.implicits._
    val d = Seq("DCC001_123456_V01").toDF("n")
      .select(BidsPath.decodePatientName(col("n")).as("d"))
      .select("d.pscid", "d.cand_id", "d.visit_label").first()
    assert((d.getString(0), d.getString(1), d.getString(2)) ==
      ("DCC001", "123456", "V01"))
  }
}
