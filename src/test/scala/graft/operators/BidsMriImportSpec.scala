package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.SyntheticFixtures.niftiBytes

/** [[BidsMriImport]] — the `import_bids_dataset` MRI vertical
  * (`loris_bids_importer/mri/main.py`). */
class BidsMriImportSpec extends SparkSpec {
  import spark.implicits._

  private val prefix = "bids_imports/DS_BIDSVersion_1.0"

  private def acq(id: Long, name: String, dt: String, suffix: Option[String],
      psc: String, content: Array[Byte],
      sidecar: Option[String] = None): (Long, String, String,
      Option[String], String, String, Array[Byte], Option[String],
      Option[String], Option[String], Option[String], Option[String],
      Option[String], Option[Double]) =
    (id, name, dt, suffix, psc, "V1", content, sidecar, None, None, None,
      None, None, None)

  private val acqCols = Seq("acq_id", "bids_name", "data_type", "suffix",
    "psc_id", "visit_label", "nifti_content", "sidecar_json", "bval_path",
    "bvec_path", "physio_path", "events_path", "scan_acquisition_time",
    "age_at_scan")

  private val emptyFiles = Seq.empty[(Long, String, String)]
    .toDF("FileID", "File", "file_blake2b_hash")
  private val scanTypes = Seq((10L, "T1w")).toDF("MriScanTypeID",
    "MriScanTypeName")
  private val fileTypes = Seq("nii").toDF("type")
  private val noAlias = Seq.empty[(String, String)]
    .toDF("bids_name", "loris_name")

  test("loris path strips sub-/ses- entities and re-prefixes") {
    val c = niftiBytes(Seq(4, 4, 4), Seq(1f, 1f, 1f))
    val out = BidsMriImport.importPlan(
      Seq(acq(1L, "sub-XY_ses-02_acq-a_T1w.nii", "anat", Some("T1w"),
        "AAA001", c)).toDF(acqCols: _*),
      emptyFiles, scanTypes, fileTypes, noAlias, prefix)
    val row = out.select("status", "loris_path").as[(String, String)]
      .collect().head
    assert(row == ("imported",
      s"$prefix/sub-AAA001/ses-V1/anat/sub-AAA001_ses-V1_acq-a_T1w.nii"))
  }

  test("grouped-check order: file type before hash before scan type") {
    val c = niftiBytes(Seq(4, 4, 4), Seq(1f, 1f, 1f))
    val dupFiles = Seq((1L, "x",
      graft.functions.expressions.Blake2bCore.hexDigest(c)))
      .toDF("FileID", "File", "file_blake2b_hash")
    // bad extension AND duplicate hash AND unknown suffix → file type wins
    val out = BidsMriImport.importPlan(
      Seq(acq(1L, "sub-A_ses-01_zzz.xyz", "anat", Some("zzz"), "P1", c))
        .toDF(acqCols: _*),
      dupFiles, scanTypes, fileTypes, noAlias, prefix)
    assert(out.select("status").as[String].collect().head ==
      "unknown_file_type")
  }

  test("failed earlier batch-mate does not register its hash") {
    val c = niftiBytes(Seq(4, 4, 4), Seq(1f, 1f, 1f))
    // acq1 has an unknown suffix (fails scan-type check) with the same
    // bytes as acq2 — acq2 must import: the reference only inserts the
    // hash on successful registration
    val out = BidsMriImport.importPlan(
      Seq(
        acq(1L, "sub-A_ses-01_zzz.nii", "anat", Some("zzz"), "P1", c),
        acq(2L, "sub-B_ses-01_T1w.nii", "anat", Some("T1w"), "P2", c))
        .toDF(acqCols: _*),
      emptyFiles, scanTypes, fileTypes, noAlias, prefix)
    val byId = out.select("acq_id", "status").as[(Long, String)]
      .collect().toMap
    assert(byId(1L) == "unknown_suffix")
    assert(byId(2L) == "imported")
  }

  test("scan-type get-or-create continues ids from max(existing)") {
    val c1 = niftiBytes(Seq(4, 4, 4), Seq(1f, 1f, 1f))
    val c2 = niftiBytes(Seq(5, 5, 5), Seq(1f, 1f, 1f))
    val c3 = niftiBytes(Seq(6, 6, 6), Seq(1f, 1f, 1f))
    val out = BidsMriImport.importPlan(
      Seq(
        acq(1L, "sub-A_ses-01_bold.nii", "func", Some("bold"), "P1", c1),
        acq(2L, "sub-B_ses-01_epi.nii", "fmap", Some("epi"), "P2", c2),
        acq(3L, "sub-C_ses-01_T1w.nii", "anat", Some("T1w"), "P3", c3))
        .toDF(acqCols: _*),
      emptyFiles, scanTypes, fileTypes, noAlias, prefix)
    val rows = out
      .select("acq_id", "scan_type_id", "scan_type_new")
      .as[(Long, Long, Boolean)].collect()
      .map { case (k, v, n) => k -> ((v, n)) }.toMap
    assert(rows(1L) == (11L, true))  // bold created: max(10) + 1
    assert(rows(2L) == (12L, true))  // epi created next in acq order
    assert(rows(3L) == (10L, false)) // T1w existed
  }

  test("real NIfTI header drives spatial parameters") {
    val c = niftiBytes(Seq(64, 32, 16, 8), Seq(0.5f, 1f, 2f))
    val out = BidsMriImport.importPlan(
      Seq(acq(1L, "sub-A_ses-01_T1w.nii", "anat", Some("T1w"), "P1", c))
        .toDF(acqCols: _*),
      emptyFiles, scanTypes, fileTypes, noAlias, prefix)
    val r = out.select("xspace", "yspace", "zspace", "xstep")
      .as[(Int, Int, Int, Double)].collect().head
    assert(r == (64, 32, 16, 0.5))
  }

  test("parameter count: sidecar + aliases + spatial + hash + aux") {
    val c = niftiBytes(Seq(4, 4, 4), Seq(1f, 1f, 1f))
    val alias = Seq(("EchoTime", "acquisition:echo_time"))
      .toDF("bids_name", "loris_name")
    val out = BidsMriImport.importPlan(
      Seq((1L, "sub-A_ses-01_dwi.nii", "dwi", Option("dwi"), "P1", "V1",
        c, Option("""{"EchoTime":"0.1","FlipAngle":"90"}"""),
        Option("d.bval"), Option("d.bvec"), Option.empty[String],
        Option.empty[String], Option("2024-01-01T00:00:00"),
        Option(20.0))).toDF(acqCols: _*),
      emptyFiles, scanTypes, fileTypes, alias, prefix)
    val r = out.select("n_parameters", "n_files_to_copy")
      .as[(Long, Long)].collect().head
    // 2 sidecar keys + 1 alias + 2 json + 7 spatial + 1 hash + 4 scans
    // + 2×2 aux = 21; copies: nifti + json + bval + bvec = 4
    assert(r == (21L, 4L))
  }
}
