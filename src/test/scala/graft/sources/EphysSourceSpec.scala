package graft.sources

import graft.SparkSpec
import graft.operators.EphysChunker
import org.apache.spark.sql.functions._

class EphysSourceSpec extends SparkSpec {

  test("channel arrays -> long format -> chunker pipeline round trip") {
    import spark.implicits._
    val recordings = Seq(
      ("ch1", (0 until 20).map(_.toDouble)),
      ("ch2", (100 until 105).map(_.toDouble))
    ).toDF("channel", "values")
    val long = EphysSource.channelArraysToLong(recordings)
    assert(long.count() == 25)
    assert(long.filter(col("channel") === "ch1" && col("sample_index") === 19)
      .first().getDouble(2) == 19.0)
    // feeds the chunker directly
    val chunks = EphysChunker.chunkStats(long, 8)
    assert(chunks.filter(col("channel") === "ch1").count() == 3)
    // and round-trips
    val back = EphysSource.longToChannelArrays(long)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(back("ch1") == (0 until 20).map(_.toDouble))
    assert(back("ch2") == (100 until 105).map(_.toDouble))
  }
}
