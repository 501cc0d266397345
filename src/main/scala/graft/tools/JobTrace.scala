package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool: trace every job fired by one registered query — id,
  * wall ms, callsite — the per-job ledger for job-count-bound fixture
  * queries (the assembly/star-CC families). Cold-JVM numbers; relative
  * weights are what matter.
  * Usage: tools/run.sh graft.tools.JobTrace <queryName> [sfDir]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: tools/run.sh graft.tools.JobTrace <queryName> [sfDir] " +
          "(sfDir defaults to $SPARK_GRAFT_SF_DIR)")
      sys.exit(2)
    }
    val name = args(0)
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.expressions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val seq = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n'))
          .getOrElse("?")
        t0.put(j.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(t0.get(j.jobId)).foreach { case (t, site) =>
          val ms = (System.nanoTime() - t) / 1e6
          println(f"[job] ${seq.incrementAndGet()}%3d id=${j.jobId}%3d $ms%7.1f ms  $site")
        }
      }
    })
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    val t = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"[total] ${(System.nanoTime() - t) / 1e9}%.3f s")
    Thread.sleep(500)
    spark.stop()
  }
}
