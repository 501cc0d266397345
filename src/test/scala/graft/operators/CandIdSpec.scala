package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CandIdSpec extends SparkSpec {

  test("generateCandIds: 6-digit, collision-free vs existing and in-batch, deterministic") {
    import spark.implicits._
    val incoming = (1 to 300).map(i => s"PSC$i").toDF("pscid")
    val existing = Seq(123456L, 654321L).toDF("CandID")
    val out = Catalog.generateCandIds(incoming, "pscid", existing)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.size == 300)
    // all unique, none colliding with existing
    assert(out.values.toSet.size == 300)
    assert(!out.values.exists(Set(123456L, 654321L).contains))
    // EVERY id stays 6-digit — including fallback assignments, which draw
    // from the free values of the domain rather than above-max
    assert(out.values.forall(v => v >= 100000L && v <= 999999L))
    // deterministic across invocations
    val again = Catalog.generateCandIds(incoming, "pscid", existing)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == again)
  }

  test("snrStub is deterministic and scale-sensible") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(10.0, 10.1, 9.9, 10.0)),   // high SNR: tight around 10
      (2L, Seq(10.0, 0.0, 20.0, -10.0))   // low SNR: wild
    ).toDF("id", "v")
    val out = df.select(col("id"),
      graft.functions.Predicates.snrStub(col("v")).as("snr"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > out(2L))
    assert(out(1L) > 30.0) // mean 10, std ~0.07 -> very high
  }
}
