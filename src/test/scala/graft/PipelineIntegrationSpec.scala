package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators._
import graft.sources.Sinks

/** SURVEY.md §7.2 minimum end-to-end slice, as one test: DICOM file rows →
  * study summary → protocol identification → extra checks → three-way
  * routing → catalog insert with ids → AcqOrderPerModality write-back →
  * upload summary counts. Assertions mirror the reference integration test
  * (`test_run_dicom_archive_loader.py:103-110`: routing counts + post-state
  * of the files catalog).
  */
class PipelineIntegrationSpec extends SparkSpec {

  private def df(schema: StructType, rows: Row*): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  test("full vertical: summary -> identify -> checks -> route -> insert -> rank -> report") {
    import spark.implicits._

    // --- scans (one per acquisition produced by dcm2niix) ---
    val scans = ProtocolMatcher.padScanCols(Seq(
      // scan_id, desc, TR s, time
      (1L, "t1_mprage", Some(2.3), None: Option[Double], 10),
      (2L, "t2 spc weighted", None, None, 20),
      (3L, "rest fmri", None, Some(200.0), 30),
      (4L, "mystery seq", Some(9.9), None, 40),   // matches nothing
      (5L, "t1_mprage slice", Some(2.3), None, 50) // excluded by checks below
    ).toDF("scan_id", "SeriesDescription", "RepetitionTime", "time", "SeriesNumber"))

    val protocols = ProtocolMatcher.padProtocolCols(Seq(
      (1, 1, 101, None: Option[String], Some(2000.0), Some(3000.0), None: Option[Double]),
      (2, 1, 102, Some("t2.*weighted"), None, None, None),
      (3, 1, 103, None, None, None, Some(100.0))
    ).toDF("MriProtocolID", "MriProtocolGroupID", "MriScanTypeID",
      "series_description_regex", "TR_min", "TR_max", "time_min"))

    // --- protocol identification + routing ---
    val identified = ProtocolMatcher.identify(scans, protocols)
    val checks = Seq(
      (1, 10, 101, "SliceThickness", "exclude", Some(1.0), Some(3.0), None: Option[String])
    ).toDF("ID", "MriProtocolChecksGroupID", "MriScanTypeID", "Header",
      "Severity", "ValidMin", "ValidMax", "ValidRegex")
      .withColumn("ProjectID", lit(null).cast("int"))
      .withColumn("CohortID", lit(null).cast("int"))
      .withColumn("Visit_label", lit(null).cast("string"))
    val params = Seq((1L, "SliceThickness", "2.0"), (5L, "SliceThickness", "9.0"))
      .toDF("scan_id", "header", "value")
    val violations = ProtocolMatcher.runExtraChecks(
      identified.filter(col("protocol_status") === "identified")
        .select("scan_id", "MriScanTypeID", "ProjectID", "CohortID", "Visit_label"),
      params, checks)
    val routed = ProtocolMatcher.route(identified, violations)

    // routing counts (the reference's integration assertion shape)
    assert(routed.files.count() == 3)          // scans 1,2,3
    assert(routed.violatedScans.count() == 1)  // scan 4 unknown
    assert(routed.excluded.count() == 1)       // scan 5 thickness 9.0
    assert(routed.violationsLog.count() == 1)

    // --- insert accepted files into the catalog with assigned ids ---
    val existing = Seq((100L, 0L, 0, 0)).toDF("FileID", "scan_id", "MriScanTypeID", "SeriesNumber")
    val catalog = Sinks.appendWithIds(
      existing,
      routed.files.select(col("scan_id"), col("MriScanTypeID"), col("SeriesNumber")),
      Seq("scan_id"), "FileID")
    assert(catalog.count() == 4)
    assert(catalog.agg(max("FileID")).first().getLong(0) == 103L)

    // --- AcqOrderPerModality write-back over the inserted files ---
    val ranked = Catalog.acqOrderPerModality(
      catalog.filter(col("scan_id") =!= 0)
        .withColumn("TarchiveSource", lit(7L)),
      scanTypeCol = "MriScanTypeID", tieBreak = "FileID")
    assert(ranked.filter(col("AcqOrderPerModality") === 1).count() == 3) // 3 distinct types

    // --- upload summary (A9) ---
    val summary = identified
      .agg(
        count(when(col("protocol_status") === "identified", 1)).as("n_id"),
        count(when(col("protocol_status") === "unknown", 1)).as("n_unknown"))
      .first()
    assert(summary.getLong(0) == 4 && summary.getLong(1) == 1)
  }
}
