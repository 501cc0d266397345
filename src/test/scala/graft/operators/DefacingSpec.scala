package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** run_defacing_script.pl plan: selection gates, the Perl string-sort t1
  * reference quirk, per-session skip, get-or-create scan types. */
class DefacingSpec extends SparkSpec {

  private def dicts = {
    import spark.implicits._
    val scanTypes = Seq((301, "t1w"), (302, "flair"), (303, "fieldmap"),
      (305, "t1w-defaced")).toDF("MriScanTypeID", "MriScanTypeName")
    val paramType = Seq((901, "acquisition:image_type"), (902, "other"))
      .toDF("ParameterTypeID", "Name")
    (scanTypes, paramType)
  }

  test("selection: image_type gate, special LIKE filter, modality list") {
    import spark.implicits._
    val (scanTypes, paramType) = dicts
    val files = Seq(
      (1L, 41L, 301, "a/t1.mnc"),      // standard, param ok → in
      (2L, 41L, 303, "a/fm_mag.mnc"),  // special, magnitude → in
      (3L, 41L, 303, "a/fm_pha.mnc"),  // special, phase → OUT (LIKE)
      (4L, 41L, 301, "a/t1_nop.mnc"),  // no image_type row → OUT
      (5L, 41L, 305, "a/t1_def.mnc"))  // type not in modality list → OUT
      .toDF("FileID", "SessionID", "MriScanTypeID", "File")
    val params = Seq(
      (1L, 901, "ORIGINAL PRIMARY M ND"),
      (2L, 901, "ORIGINAL PRIMARY M ND"),
      (3L, 901, "ORIGINAL PRIMARY P ND"),
      (4L, 902, "ORIGINAL PRIMARY M ND"), // wrong parameter type
      (5L, 901, "ORIGINAL PRIMARY M ND"))
      .toDF("FileID", "ParameterTypeID", "Value")
    val out = Defacing.selectFiles(files, scanTypes, params, paramType,
      modalities = Seq("t1w", "fieldmap"),
      specialFilters = Map("fieldmap" -> "%PRIMARY M ND"))
      .orderBy("FileID").collect()
    assert(out.map(_.getAs[Long]("FileID")).toSeq == Seq(1L, 2L))
  }

  test("sessionIds restriction applies after the gates") {
    import spark.implicits._
    val (scanTypes, paramType) = dicts
    val files = Seq(
      (1L, 41L, 301, "a/t1.mnc"), (2L, 42L, 301, "b/t1.mnc"))
      .toDF("FileID", "SessionID", "MriScanTypeID", "File")
    val params = Seq((1L, 901, "x"), (2L, 901, "x"))
      .toDF("FileID", "ParameterTypeID", "Value")
    val out = Defacing.selectFiles(files, scanTypes, params, paramType,
      Seq("t1w"), Map.empty, sessionIds = Some(Seq(42L))).collect()
    assert(out.map(_.getAs[Long]("FileID")).toSeq == Seq(2L))
  }

  test("t1 reference is the first FileID by STRING sort (Perl quirk)") {
    import spark.implicits._
    val (scanTypes, _) = dicts
    val selected = Seq(
      (41L, 999L, "t1w", "a/t1_001.mnc"),
      (41L, 1001L, "t1w", "a/t1_002.mnc"),
      (41L, 1003L, "flair", "a/fl_001.mnc"))
      .toDF("SessionID", "FileID", "ScanType", "File")
    val files = selected.select(col("SessionID"), col("FileID"))
      .withColumn("MriScanTypeID", lit(301))
    val sessions = Seq((41L, 11L, "V1")).toDF("ID", "CandidateID",
      "Visit_label")
    val cands = Seq((11L, 300001L)).toDF("ID", "CandID")
    val plan = Defacing.planDefacing(selected, files, scanTypes, sessions,
      cands).collect()
    val ref = plan.filter(_.getAs[String]("role") == "ref")
    assert(ref.length == 1)
    assert(ref(0).getAs[Long]("file_id") == 1001L) // "1001" < "999"
    assert(plan.filter(_.getAs[String]("role") == "other")
      .map(_.getAs[Long]("file_id")).toSet == Set(999L, 1003L))
  }

  test("newScanTypes: only the missing '-defaced' types are created") {
    import spark.implicits._
    val (scanTypes, _) = dicts
    val plan = Seq("t1w-defaced", "flair-defaced", "t1w-defaced")
      .toDF("defaced_scan_type")
    val created = Defacing.newScanTypes(plan, scanTypes).collect()
    assert(created.map(_.getString(0)).toSeq == Seq("flair-defaced"))
  }
}
