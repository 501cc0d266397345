package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: time a single registered query (same harness shape as
  * [[graft.Bench]] — noop sink, warmup, clearCache) so hot queries can be
  * iterated on without a full 50-query bench run. Prints job / stage /
  * task counts per rep — the first thing to look at for a small-input
  * query that is slow anyway (job-count-bound, not data-bound).
  * Usage: tools/run.sh graft.tools.BenchOne <queryName> [sfDir] [reps]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
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
    spark.sparkContext.setLogLevel("WARN")
    val (jobs, stages, tasks) =
      (new AtomicLong, new AtomicLong, new AtomicLong)
    val bySite = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks.toLong)
        val ms = (for {
          a <- s.stageInfo.completionTime
          b <- s.stageInfo.submissionTime
        } yield a - b).getOrElse(0L)
        bySite.merge(s.stageInfo.name.takeWhile(_ != '\n'), (1L, ms),
          (a, b) => (a._1 + b._1, a._2 + b._2))
      }
    })
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    for (i <- 1 to reps) {
      spark.catalog.clearCache()
      System.gc()
      jobs.set(0); stages.set(0); tasks.set(0); bySite.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a beat to drain
      Thread.sleep(300)
      println(f"[benchone] $name rep$i: $dt%.3f s " +
        s"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
      if (sys.env.contains("BENCHONE_SITES")) {
        import scala.jdk.CollectionConverters._
        bySite.asScala.toSeq.sortBy(-_._2._2).take(15).foreach {
          case (site, (n, ms)) =>
            println(f"[benchone]   $ms%6d ms over $n%3d jobs  $site")
        }
      }
    }
    spark.stop()
  }
}
