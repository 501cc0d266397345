package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-query shuffle-volume telemetry for the bench harnesses: cumulative
  * shuffle read/write bytes from task metrics, sampled before/after each
  * query. Wall time at a small scale factor hides plan regressions that
  * only bite at 100× — a query that quietly starts shuffling the fact
  * table still LOOKS fast on 2 MB of input; shuffle volume does not lie.
  *
  * Task-level metrics (not SQL-node metrics) so intermediate actions an
  * operator runs internally — `localCheckpoint`, seed probes — are
  * counted too. The listener bus is asynchronous, so [[settled]] polls
  * until the counters stop moving before a delta is taken.
  */
final class ShuffleTelemetry {
  private val readB = new AtomicLong
  private val writeB = new AtomicLong
  private val drainsN = new AtomicLong

  def install(sc: SparkContext): Unit = sc.addSparkListener(new SparkListener {
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        readB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        writeB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
      // TopKPerGroup cap-triggered partial drains (its SQLMetric rides the
      // task accumulators): each drain re-emits <= k rows per seen group
      // into the exchange, so a nonzero count here is shuffle INFLATION
      // the byte counters alone would misattribute to data volume.
      if (te.taskInfo != null) te.taskInfo.accumulables.foreach { a =>
        if (a.name.exists(_ == graft.plans.TopKPerGroup.DrainMetricName))
          a.update.foreach {
            case n: Long => drainsN.addAndGet(n)
            case _ => ()
          }
      }
    }
  })

  /** Cumulative cap-triggered TopKPerGroup partial drains. */
  def drains(): Long = drainsN.get

  /** Current (read, write) byte counters without draining the bus — use
    * for the BEFORE sample (the previous settled() left the bus empty). */
  def now(): (Long, Long) = (readB.get, writeB.get)

  /** (read, write) after the async listener bus has gone quiet: poll
    * until two consecutive samples agree (20 ms period, 500 ms cap). */
  def settled(): (Long, Long) = {
    var prev = (-1L, -1L)
    var cur = now()
    var spins = 0
    while (prev != cur && spins < 25) {
      Thread.sleep(20)
      prev = cur
      cur = now()
      spins += 1
    }
    cur
  }
}
