package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Fused single-pass chunk statistics (SURVEY.md §2.10 "custom
  * `Aggregator[IN,BUF,OUT]` candidates"): one pass computes what
  * [[EphysChunker.chunkStats]] derives from count/min/max aggregates plus
  * the edge-pad value ([[EphysChunker.chunkArrays]] needs the LAST sample's
  * value for np.pad-'edge' semantics) — without materializing per-chunk
  * arrays. The merge is associative/commutative, so partial (map-side)
  * aggregation applies — the property that makes it shuffle-light at
  * 100 TB. */
object ChunkStatsAggregator {

  case class Sample(sample_index: Long, value: Double)
  case class Buf(n: Long, mn: Double, mx: Double, lastIdx: Long, lastVal: Double)
  case class Stats(n_samples: Int, chunk_min: Double, chunk_max: Double,
      last_value: Double)

  val agg: Aggregator[Sample, Buf, Stats] = new Aggregator[Sample, Buf, Stats] {
    override def zero: Buf =
      Buf(0L, Double.PositiveInfinity, Double.NegativeInfinity, Long.MinValue, 0.0)
    override def reduce(b: Buf, s: Sample): Buf = Buf(
      b.n + 1,
      math.min(b.mn, s.value),
      math.max(b.mx, s.value),
      if (s.sample_index > b.lastIdx) s.sample_index else b.lastIdx,
      if (s.sample_index > b.lastIdx) s.value else b.lastVal)
    override def merge(a: Buf, b: Buf): Buf = Buf(
      a.n + b.n,
      math.min(a.mn, b.mn),
      math.max(a.mx, b.mx),
      math.max(a.lastIdx, b.lastIdx),
      if (a.lastIdx >= b.lastIdx) a.lastVal else b.lastVal)
    override def finish(r: Buf): Stats =
      Stats(r.n.toInt, r.mn, r.mx, r.lastVal)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }

  /** Untyped-UDAF form usable in any groupBy. */
  def chunkStatsUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(agg, Encoders.product[Sample])

  /** [[EphysChunker.chunkStats]] semantics in one fused pass, plus the
    * edge-pad value. */
  def chunkStatsFused(samples: DataFrame, chunkSize: Int): DataFrame = {
    val stats = chunkStatsUdaf(col("sample_index"), col("value"))
    samples
      .withColumn("chunk_index", expr(s"sample_index div $chunkSize"))
      .groupBy(col("channel"), col("chunk_index"))
      .agg(stats.as("s"))
      .select(col("channel"), col("chunk_index"),
        col("s.n_samples").as("n_samples"),
        col("s.chunk_min").as("chunk_min"),
        col("s.chunk_max").as("chunk_max"),
        col("s.last_value").as("last_value"))
      .withColumn("is_last",
        col("chunk_index") === max(col("chunk_index"))
          .over(org.apache.spark.sql.expressions.Window.partitionBy(col("channel"))))
      .withColumn("valid_samples",
        when(col("is_last"), col("n_samples")).otherwise(lit(chunkSize)))
  }
}
