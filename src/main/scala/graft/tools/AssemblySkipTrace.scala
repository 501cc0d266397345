package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev tool: per-BATCH job ledger of the streaming multimodal assembly
  * ([[graft.streaming.EventStream.assembleMultimodalIncremental]]) on a
  * three-wave scenario where wave 1 introduces NO new dup pairs (the
  * r13 skip-refresh case) and wave 2 introduces a cross-wave merge (the
  * full-refresh case). The per-wave job counts printed here are the
  * committed evidence that a no-new-dups batch costs O(batch) jobs
  * while a merging batch still re-canonicalizes.
  * Usage: tools/run.sh graft.tools.AssemblySkipTrace
  */
object AssemblySkipTrace {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.expressions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        { jobs.incrementAndGet(); () }
    })
    import graft.sources.SyntheticFixtures
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def gradient(f: Int => Int): Seq[Seq[Int]] =
      (0 until 8).map(_ => (0 until 18).map { x =>
        val v = f(x); (v << 16) | (v << 8) | v
      })
    val asc = gradient(identity)
    val tweak = asc.updated(0, asc(0).updated(0, 0x050505))
    val waves: Seq[(String, Seq[(Long, String, String, Array[Byte], Option[String])])] = Seq(
      "wave0 first batch, two distinct photos (skip: no pairs)" -> Seq(
        (1L, "000001", "s0", SyntheticFixtures.bmpBytes(asc),
          Some("ascending gradient")),
        (2L, "000002", "s0", SyntheticFixtures.bmpBytes(
          SyntheticFixtures.richRaster(18, 8, 2)), Some("textured photo"))),
      "wave1 another distinct photo (skip: NO new dup pairs)" -> Seq(
        (8L, "000008", "s1", SyntheticFixtures.bmpBytes(
          SyntheticFixtures.richRaster(18, 8, 5)),
          Some("another distinct photo"))),
      "wave2 1-bit tweak of wave0's original (FULL refresh: merge)" -> Seq(
        (3L, "000003", "s1", SyntheticFixtures.bmpBytes(tweak),
          Some("tweaked copy"))))
    val root =
      java.nio.file.Files.createTempDirectory("graft_skiptrace").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String, Array[Byte], Option[String])]
    val q = graft.streaming.EventStream.assembleMultimodalIncremental(
      mem.toDF().toDF("id", "sample_id", "shard_name", "content",
        "caption"),
      root, s"$root/ckpt", minWidth = 10)
    try waves.foreach { case (label, w) =>
      val before = jobs.get()
      val t0 = System.nanoTime()
      mem.addData(w.toIndexedSeq); q.processAllAvailable()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[wave] ${jobs.get() - before}%3d jobs  $dt%6.2f s  $label")
    } finally q.stop()
    val kept = spark.read.parquet(s"$root/manifest")
      .select("id").collect().map(_.getLong(0)).toSet
    println(s"[manifest] kept ids = ${kept.toSeq.sorted.mkString(",")}" +
      " (expected 1,2,8 — the tweak merged into 1's component)")
    spark.stop()
  }
}
