package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** J8+J10 composition: register_processed_data.pl as per-row dataflow —
  * guard order, lineage inheritance, id continuation, intermediary rows. */
class ProcessedRegistrationSpec extends SparkSpec {

  private def fixtures = {
    import spark.implicits._
    val files = Seq(
      (1001L, 11L, 21L, "md5raw1"),
      (1002L, 12L, 22L, "md5raw2"))
      .toDF("FileID", "SessionID", "ScannerID", "md5hash")
    val scanTypes = Seq((601, "QCedDTI"), (602, "RGBqc"))
      .toDF("MriScanTypeID", "ScanType")
    val candidates = Seq(
      ("out_a.mnc", 1001L, Seq(1001L), "p", "t1", "2024-02-01", "native",
        "QCedDTI", "QCed", "mA"),
      ("out_b.mnc", 1002L, Seq(1001L, 1002L), "p", "t1", "2024-02-01",
        "native", "RGBqc", "processed", "mB"),
      ("out_dup.mnc", 1001L, Seq(1001L), "p", "t1", "2024-02-01", "native",
        "QCedDTI", "QCed", "md5raw1"))
      .toDF("file_path", "source_file_id", "input_file_ids",
        "source_pipeline", "tool", "pipeline_date", "coordinate_space",
        "scan_type", "output_type", "md5hash")
    (files, scanTypes, candidates)
  }

  test("lineage inherit, id continuation, md5 guard") {
    val (files, scanTypes, candidates) = fixtures
    val out = ProcessedRegistration.register(candidates, files, scanTypes)
      .orderBy("file_path").collect()
    val a = out(0)
    assert(a.getAs[String]("status") == "registered")
    assert(a.getAs[Long]("FileID") == 1003L)      // continues from 1002
    assert(a.getAs[Long]("SessionID") == 11L)     // inherited from 1001
    assert(a.getAs[Long]("ScannerID") == 21L)
    val b = out(1)
    assert(b.getAs[String]("status") == "registered")
    assert(b.getAs[Long]("FileID") == 1004L)
    assert(b.getAs[Long]("SessionID") == 12L)     // inherited from 1002
    val dup = out(2)
    assert(dup.getAs[String]("status") == "duplicate_md5")
    assert(dup.isNullAt(dup.fieldIndex("FileID")))
  }

  test("guard order: a missing source wins over a bad input list") {
    import spark.implicits._
    val (files, scanTypes, _) = fixtures
    val c = Seq(("x.mnc", 9999L, Seq(8888L), "p", "t", "d", "native",
      "QCedDTI", "QCed", "mX"))
      .toDF("file_path", "source_file_id", "input_file_ids",
        "source_pipeline", "tool", "pipeline_date", "coordinate_space",
        "scan_type", "output_type", "md5hash")
    val st = ProcessedRegistration.register(c, files, scanTypes)
      .select("status").first().getString(0)
    assert(st == "missing_source")
  }

  test("within-batch md5 duplicates: first by path registers, rest reject") {
    import spark.implicits._
    val (files, scanTypes, _) = fixtures
    val c = Seq(
      ("a_out.mnc", 1001L, Seq(1001L), "p", "t", "d", "native",
        "QCedDTI", "QCed", "mSAME"),
      ("b_out.mnc", 1001L, Seq(1001L), "p", "t", "d", "native",
        "QCedDTI", "QCed", "mSAME"))
      .toDF("file_path", "source_file_id", "input_file_ids",
        "source_pipeline", "tool", "pipeline_date", "coordinate_space",
        "scan_type", "output_type", "md5hash")
    val out = ProcessedRegistration.register(c, files, scanTypes)
      .orderBy("file_path").collect()
    assert(out(0).getAs[String]("status") == "registered")
    assert(out(1).getAs[String]("status") == "duplicate_md5")
  }

  test("a REJECTED batch-mate's md5 does not block a later candidate") {
    import spark.implicits._
    val (files, scanTypes, _) = fixtures
    // A fails missing_source (never inserts its hash); B with the SAME
    // md5 must register, as the sequential reference would
    val c = Seq(
      ("a_bad.mnc", 9999L, Seq(1001L), "p", "t", "d", "native",
        "QCedDTI", "QCed", "mX"),
      ("b_good.mnc", 1001L, Seq(1001L), "p", "t", "d", "native",
        "QCedDTI", "QCed", "mX"))
      .toDF("file_path", "source_file_id", "input_file_ids",
        "source_pipeline", "tool", "pipeline_date", "coordinate_space",
        "scan_type", "output_type", "md5hash")
    val out = ProcessedRegistration.register(c, files, scanTypes)
      .orderBy("file_path").collect()
    assert(out(0).getAs[String]("status") == "missing_source")
    assert(out(1).getAs[String]("status") == "registered")
  }

  test("intermediaries: one row per (output, input) with the tool") {
    val (files, scanTypes, candidates) = fixtures
    val reg = ProcessedRegistration.register(candidates, files, scanTypes)
    val inter = ProcessedRegistration.intermediaries(reg, candidates)
      .orderBy("FileID", "Input_FileID").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(inter.toSeq == Seq(
      (1003L, 1001L, "t1"), (1004L, 1001L, "t1"), (1004L, 1002L, "t1")))
  }
}
