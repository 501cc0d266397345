package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkStatsAggregatorSpec extends SparkSpec {

  private lazy val samples = {
    import spark.implicits._
    ((0L until 70L).map(i => ("A", i, i.toDouble)) ++
      (0L until 16L).map(i => ("B", i, 100.0 + i)))
      .toDF("channel", "sample_index", "value")
      // scramble row order so 'last value' really needs the index compare
      .orderBy(hash(col("sample_index")))
  }

  test("fused aggregator matches the compositional chunkStats") {
    val fused = ChunkStatsAggregator.chunkStatsFused(samples, 8)
      .select("channel", "chunk_index", "n_samples", "chunk_min", "chunk_max",
        "is_last", "valid_samples")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.toSeq.drop(2)).toMap
    val base = EphysChunker.chunkStats(samples, 8)
      .select("channel", "chunk_index", "n_samples", "chunk_min", "chunk_max",
        "is_last", "valid_samples")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.toSeq.drop(2)).toMap
    assert(fused == base)
  }

  test("last_value is the edge-pad value (max sample_index wins)") {
    val out = ChunkStatsAggregator.chunkStatsFused(samples, 8)
      .filter(col("channel") === "A" && col("chunk_index") === 8)
      .first()
    assert(out.getAs[Double]("last_value") == 69.0)
    assert(out.getAs[Int]("valid_samples") == 6)
  }
}
