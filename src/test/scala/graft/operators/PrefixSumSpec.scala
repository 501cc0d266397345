package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSpec

/** [[PrefixSum.overKey]] — two-level parallel scan vs the single-window
  * ground truth, across chunk widths, gaps, and negative keys. */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def truth(rows: Seq[(Long, Long)]): Map[Long, Long] =
    rows.sortBy(_._1).scanLeft((0L, 0L)) { case ((_, acc), (k, v)) =>
      (k, acc + v) }.drop(1).toMap

  test("matches a global running sum across widths, gaps, negatives") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 500).map(_ =>
      (rnd.nextInt(4000).toLong - 2000, rnd.nextInt(100).toLong))
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }.toSeq
    val expected = truth(rows)
    Seq(1L, 7L, 64L, 100000L).foreach { width =>
      val got = PrefixSum.overKey(rows.toDF("k", "v"), "k", "v", "cum",
          chunkWidth = width)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == expected, s"chunkWidth=$width")
    }
  }

  test("q94 shape: equals the unpartitioned-window formulation") {
    val daily = Seq((10L, 3L), (11L, 2L), (40L, 5L), (200L, 1L))
      .toDF("first_day", "n_new")
    val viaScan = PrefixSum.overKey(daily, "first_day", "n_new", "cum", 32)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val viaWindow = daily.withColumn("cum",
        sum(col("n_new")).over(Window.orderBy(col("first_day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(viaScan == viaWindow)
  }
}
