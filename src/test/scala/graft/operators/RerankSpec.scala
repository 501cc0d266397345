package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RerankSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(
      (10L, 1L, 900000L, Array(1f, 0f)),
      (10L, 2L, 880000L, Array(1f, 0f)), // duplicate direction of id 1
      (10L, 3L, 500000L, Array(0f, 1f)),
      (10L, 4L, 400000L, Array(3f, 4f)), // cos .6 with x-axis, .8 with y
      (20L, 5L, 100000L, Array(1f, 0f)),
      (20L, 6L, 100000L, Array(0f, 1f))
    ).toDF("q", "id", "rel", "vec")
  }

  test("pinned greedy walk: the redundant near-duplicate is deferred " +
      "behind the diverse lower-relevance candidate") {
    val got = Rerank.mmrRerank(fixture, "q", "id", "rel", "vec",
        k = 3, lambdaPpm = 700000L)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == Seq(
      // step 2: id2 scores .7*880000-.3*1e6 = 316e9 < id3's 350e9
      (10L, 1, 1L, 630000000000L),
      (10L, 2, 3L, 350000000000L),
      (10L, 3, 2L, 316000000000L),
      // rel tie at rank 1 breaks id-asc; diverse id6 keeps full rel
      (20L, 1, 5L, 70000000000L),
      (20L, 2, 6L, 70000000000L)))
  }

  test("lambda = 1e6 degenerates to pure relevance order") {
    val got = Rerank.mmrRerank(fixture.where(col("q") === 10), "q", "id",
        "rel", "vec", k = 4, lambdaPpm = 1000000L)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(got.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("lambda = 0 is pure diversity after the first pick: the " +
      "colinear duplicate goes last") {
    val got = Rerank.mmrRerank(fixture.where(col("q") === 10), "q", "id",
        "rel", "vec", k = 4, lambdaPpm = 0L)
      .orderBy("rank").collect().map(_.getLong(2))
    // first pick is rel-argmax (id1); then sims to {1}: id2 1e6, id3 0,
    // id4 600000 -> id3; then id2 max 1e6, id4 max(.6,.8)=800000 -> id4
    assert(got.toSeq == Seq(1L, 3L, 4L, 2L))
  }

  test("negative cosine to the selected set BOOSTS the candidate " +
      "(true MMR penalty, no clamp at 0)") {
    import spark.implicits._
    // id1 picked first (rel-argmax). id2 is the same direction
    // (sim 1e6), id3 is ANTI-correlated (sim -1e6): with lambda 0.5,
    // id3's score = .5*0 - .5*(-1e6) = +5e11 beats id2's
    // .5*900000 - .5*1e6 = -5e10 despite id2's far higher relevance —
    // exactly the case a clamp-at-0 would invert
    val cand = Seq(
      (1L, 1L, 1000000L, Array(1f, 0f)),
      (1L, 2L, 900000L, Array(1f, 0f)),
      (1L, 3L, 0L, Array(-1f, 0f))
    ).toDF("q", "id", "rel", "vec")
    val got = Rerank.mmrRerank(cand, "q", "id", "rel", "vec", k = 3,
        lambdaPpm = 500000L)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 500000000000L), (3L, 500000000000L),
      (2L, -50000000000L)))
  }

  test("k beyond the group size emits the whole group; k bounds the " +
      "output otherwise") {
    assert(Rerank.mmrRerank(fixture, "q", "id", "rel", "vec", 100,
      700000L).count() == 6)
    assert(Rerank.mmrRerank(fixture, "q", "id", "rel", "vec", 1,
      700000L).count() == 2)
  }
}
