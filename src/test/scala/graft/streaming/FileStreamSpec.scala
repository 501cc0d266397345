package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** The persistent streaming path the MemoryStream suites don't exercise:
  * a real file-source `readStream` over a watched directory, watermarked
  * windowed aggregation, parquet `writeStream` with a checkpoint, and a
  * stream RESTART that must neither lose nor duplicate data (the file
  * source's exactly-once contract comes from the checkpointed file log —
  * the property that makes an interrupted 100 TB ingest resumable). */
class FileStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("file-source stream + checkpoint: windowed counts, restart exactly-once") {
    val root = java.nio.file.Files.createTempDirectory("graft_fstream").toString
    val in = s"$root/in"; val out = s"$root/out"; val chk = s"$root/chk"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))

    def addFile(name: String, rows: Seq[(Timestamp, String)]): Unit = {
      val stage = s"$root/stage_$name"
      rows.toDF("ts", "event_type").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      java.nio.file.Files.move(part,
        java.nio.file.Paths.get(in, s"$name.parquet"))
    }

    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("ts timestamp, event_type string").parquet(in)
      val q = EventStream.windowedCounts(src)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // run 1: two windows of data; nothing can close yet (watermark at max
    // event time 10:07 - 10 min < first window end)
    addFile("b1", Seq(
      (ts(1), "scan"), (ts(2), "scan"), (ts(3), "upload"),
      (ts(6), "scan"), (ts(7), "upload")))
    runOnce()

    // run 2 (RESTART from checkpoint): a late-hour event advances the
    // watermark past both earlier windows, closing them into the sink;
    // b1 must NOT be reprocessed (file log) nor its windows re-emitted
    addFile("b2", Seq((ts(40), "scan")))
    runOnce()

    val got = spark.read.schema(
        "window_start timestamp, window_end timestamp, event_type string, n_events long")
      .parquet(out)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3))).toSet
    assert(got == Set(
      (ts(0), "scan", 2L), (ts(0), "upload", 1L),
      (ts(5), "scan", 1L), (ts(5), "upload", 1L)))

    // run 3: nothing new — a restart with no input emits nothing further
    runOnce()
    val again = spark.read.schema(
        "window_start timestamp, window_end timestamp, event_type string, n_events long")
      .parquet(out).count()
    assert(again == got.size)
  }
}
