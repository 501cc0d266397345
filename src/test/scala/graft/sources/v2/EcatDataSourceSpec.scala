package graft.sources.v2

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkSpec
import graft.sources.{EcatReader, SyntheticFixtures}

/** The ECAT connector must agree with [[EcatReader.files]] on every
  * header field (shared parser), prune down to the planning listing for
  * path-only projections, and stream arrivals exactly once through the
  * shared seen-file log. */
class EcatDataSourceSpec extends SparkSpec {

  private def fixture(): String = {
    val dir = SyntheticFixtures.freshDir("dsv2_ecat")
    Files.write(Paths.get(dir, "a.v"), SyntheticFixtures.ecatBytes(
      "SUB001", "PET001", "Johns Hopkins Univ", 328, 1704164645L, 2))
    Files.write(Paths.get(dir, "bad.v"), Array.fill[Byte](700)(0x41))
    dir
  }

  test("format(\"ecat\") matches EcatReader.files on header fields") {
    val dir = fixture()
    val got = spark.read.format("ecat").load(dir).collect()
      .map(r => (r.getAs[String]("file_name"),
        r.getAs[Boolean]("parse_failed"),
        Option(r.getAs[String]("patient_id")),
        Option(r.getAs[Any]("scan_start_time")))).toSet
    val want = EcatReader.files(spark, dir, glob = "*.v").collect()
      .map(f => (f.file_name, f.parse_failed, f.patient_id,
        f.scan_start_time.map(x => x: Any))).toSet
    assert(got == want && got.size == 2)
  }

  test("path-only projection plans a scan with no header columns") {
    val dir = fixture()
    val df = spark.read.format("ecat").load(dir)
      .select("file_name", "file_size")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toList
    }
    assert(scans == List(List("file_name", "file_size")))
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("a.v", "bad.v"))
    assert(rows("bad.v") == 700L) // size from the listing, file not opened
  }

  test("micro-batch stream: PET uploads arrive exactly once") {
    val dir = SyntheticFixtures.freshDir("dsv2_ecat_stream")
    val ckpt = SyntheticFixtures.freshDir("dsv2_ecat_stream_ckpt")
    Files.write(Paths.get(dir, "u1.v"), SyntheticFixtures.ecatBytes(
      "SUB001", "PET001", "BIC", 328, 1704164645L, 1))
    val q = spark.readStream.format("ecat").load(dir)
      .select("file_name", "patient_id")
      .writeStream.format("memory").queryName("ecatstream")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("ecatstream").count() == 1)
      Files.write(Paths.get(dir, "u2.v"), SyntheticFixtures.ecatBytes(
        "SUB002", "PET002", "BIC", 328, 1704168000L, 1))
      q.processAllAvailable()
      val rows = spark.table("ecatstream").collect()
        .map(_.getString(0)).sorted
      assert(rows.toSeq == Seq("u1.v", "u2.v"))
    } finally q.stop()
  }
}
