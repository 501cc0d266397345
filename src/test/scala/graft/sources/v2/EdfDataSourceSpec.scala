package graft.sources.v2

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkSpec
import graft.sources.{EdfReader, SyntheticFixtures}

/** The V2 connector must agree with the `binaryFile`-based
  * [[EdfReader.channels]] on every column (shared parser, so drift would
  * mean a connector plumbing bug), and must actually prune: a values-less
  * projection plans a scan whose read schema has no `values` column. */
class EdfDataSourceSpec extends SparkSpec {

  private def fixtureDir(): String =
    SyntheticFixtures.materialize(
      "dsv2_edf", "r1.edf", SyntheticFixtures.recordingBytes())

  test("format(\"edf\") matches EdfReader.channels on all columns") {
    val dir = fixtureDir()
    val got = spark.read.format("edf").load(dir)
      .collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getLong(3),
        r.getSeq[Double](4).toList)).toSet
    val want = EdfReader.channels(spark, dir).collect()
      .map(c => (c.channel, c.sampling_rate_hz, c.n_samples,
        c.values.toList)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("column pruning reaches the scan: no values column read") {
    val dir = fixtureDir()
    val df = spark.read.format("edf").load(dir)
      .select("channel", "n_samples")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toList
    }
    assert(scans == List(List("channel", "n_samples")))
    // header-only counts agree with the full decode
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = EdfReader.channels(spark, dir).collect()
      .map(c => (c.channel, c.n_samples)).toSet
    assert(got == want)
  }

  test("channel predicate: correct rows survive the residual filter") {
    val dir = fixtureDir()
    val rows = spark.read.format("edf").load(dir)
      .where("channel = 'C3'").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("C3"))
    assert(rows.head.getSeq[Double](4).take(4) == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("micro-batch stream: arrivals processed exactly once") {
    val dir = SyntheticFixtures.freshDir("dsv2_edf_stream")
    val ckpt = SyntheticFixtures.freshDir("dsv2_edf_stream_ckpt")
    Files.write(Paths.get(dir, "r1.edf"), SyntheticFixtures.recordingBytes())
    val q = spark.readStream.format("edf").load(dir)
      .select("file_path", "channel", "n_samples")
      .writeStream.format("memory").queryName("edfstream")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("edfstream").count() == 2) // C3 + C4
      q.processAllAvailable() // no new files -> no new rows
      assert(spark.table("edfstream").count() == 2)
      Files.write(Paths.get(dir, "r2.edf"),
        SyntheticFixtures.recordingBytes())
      q.processAllAvailable()
      val rows = spark.table("edfstream").collect()
      assert(rows.length == 4)
      assert(rows.map(_.getString(0)).distinct.length == 2)
    } finally q.stop()
  }

  test("restart resumes from the seen-file log, not from scratch") {
    val dir = SyntheticFixtures.freshDir("dsv2_edf_restart")
    val ckpt = SyntheticFixtures.freshDir("dsv2_edf_restart_ckpt")
    val out = SyntheticFixtures.freshDir("dsv2_edf_restart_out")
    Files.write(Paths.get(dir, "r1.edf"), SyntheticFixtures.recordingBytes())
    def start() = spark.readStream.format("edf").load(dir)
      .select("file_path", "channel")
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.parquet(out).count() == 2)
    // a file arrives while no query is running
    Files.write(Paths.get(dir, "r3.edf"), SyntheticFixtures.recordingBytes())
    val q2 = start()
    try {
      q2.processAllAvailable()
      // the committed seen-file log survives the restart: r1.edf is NOT
      // reprocessed, r3.edf contributes exactly its two channels
      val byFile = spark.read.parquet(out).collect()
        .groupBy(_.getString(0)).view.mapValues(_.length).toMap
      assert(byFile.size == 2 && byFile.values.forall(_ == 2))
    } finally q2.stop()
  }

  test("malformed and undersized files yield zero rows, not a crash") {
    val dir = SyntheticFixtures.freshDir("dsv2_edf_bad")
    Files.write(Paths.get(dir, "junk.edf"),
      Array.fill[Byte](512)(0x41))
    Files.write(Paths.get(dir, "tiny.edf"), Array[Byte](1, 2, 3))
    assert(spark.read.format("edf").load(dir).count() == 0)
  }
}
