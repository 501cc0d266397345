package graft.operators

import graft.SparkSpec

class ClusterPairsSpec extends SparkSpec {

  test("connected components: chains, triangles, singleton pairs") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("id_1", "id_2")
    val out = Dedup.clusterPairs(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long chain needs multiple propagation rounds") {
    import spark.implicits._
    val chain = (1L until 15L).map(i => (i, i + 1)).toDF("id_1", "id_2")
    val out = Dedup.clusterPairs(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 15)
    assert(out.values.forall(_ == 1L))
  }
}
