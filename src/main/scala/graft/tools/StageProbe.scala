package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev probe: run one query and dump per-stage wall ms + task counts. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nJobs = new AtomicInteger(0)
    val nStages = new AtomicInteger(0)
    val nTasks = new AtomicLong(0L)
    val stageMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        nJobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        nStages.incrementAndGet()
        nTasks.addAndGet(s.stageInfo.numTasks)
        val ms = for {
          a <- s.stageInfo.completionTime; b <- s.stageInfo.submissionTime
        } yield a - b
        stageMs.addAndGet(ms.getOrElse(0L))
        val m = s.stageInfo.taskMetrics
        println(f"[stage] ${s.stageInfo.stageId}%4d tasks=${s.stageInfo.numTasks}%3d ms=${ms.getOrElse(0L)}%5d swMB=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1f srMB=${(m.shuffleReadMetrics.localBytesRead + m.shuffleReadMetrics.remoteBytesRead) / 1e6}%8.1f srRec=${m.shuffleReadMetrics.recordsRead}%10d spillMB=${m.memoryBytesSpilled / 1e6}%7.0f  ${s.stageInfo.name.take(60)}")
      }
    })
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    Thread.sleep(300)
    println("=== warmup done, running " + name)
    nJobs.set(0); nStages.set(0); nTasks.set(0); stageMs.set(0)
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[probe] $name: $dt%.3f s jobs=${nJobs.get} stages=${nStages.get} tasks=${nTasks.get} stageMs=${stageMs.get}")
    spark.stop()
  }
}
