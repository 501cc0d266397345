package graft.operators

import graft.SparkSpec

/** Integer-ppm PageRank: hand-computed fixture values, dangling-mass
  * redistribution, multi-edge weighting, and degenerate damping. */
class GraphRankSpec extends SparkSpec {

  test("hand-computed 2 iterations on a 3-node graph with a dangling " +
      "node (1->2, 2->1, 1->3)") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")
    // iter1: share(1)=500000 each to {2,3}, share(2)=1e6 to 1,
    //        dang=1e6, dang/3=333333
    //   r1(1)=150000+850000*1333333 div 1e6 = 1283333
    //   r1(2)=r1(3)=150000+850000*833333 div 1e6 = 858333
    // iter2: share(1)=641666, share(2)=858333, dang=858333 -> 286111
    //   r2(1)=150000+850000*1144444 div 1e6 = 1122777
    //   r2(2)=r2(3)=150000+850000*927777 div 1e6 = 938610
    val r1 = GraphRank.pageRank(e, "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 1283333L, 2L -> 858333L, 3L -> 858333L))
    val r2 = GraphRank.pageRank(e, "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 1122777L, 2L -> 938610L, 3L -> 938610L))
  }

  test("multi-edges vote with multiplicity; the distinct form differs") {
    import spark.implicits._
    // node 1 votes twice for 2, once for 3
    val multi = Seq((1L, 2L), (1L, 2L), (1L, 3L)).toDF("src", "dst")
    val m = GraphRank.pageRank(multi, "src", "dst", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d = GraphRank.pageRank(multi.distinct(), "src", "dst", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // multi: share = 1e6 div 3; node 2 receives 2 shares
    assert(m(2L) > m(3L))
    assert(d(2L) == d(3L))
  }

  test("dampingPpm = 0 collapses every rank to 1e6 (pure teleport); " +
      "determinism: two runs agree exactly") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val flat = GraphRank.pageRank(e, "src", "dst", 3, dampingPpm = 0L)
      .collect().map(_.getLong(1)).toSet
    assert(flat == Set(1000000L))
    def run() = GraphRank.pageRank(e, "src", "dst", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run() == run())
  }

  test("hits: hand-computed 2 rounds on 1->2, 1->3, 2->3 — node 1 the " +
      "pure hub, node 3 the pure authority, max-normalization exact") {
    import spark.implicits._
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    // round 1: a_raw = {2: 1e6, 3: 2e6} -> a = {2: 500000, 3: 1e6, 1: 0}
    //          h_raw = {1: 1.5e6, 2: 1e6} -> h = {1: 1e6, 2: 666666, 3: 0}
    // round 2: a_raw = {2: 1e6, 3: 1666666} -> a = {2: 600000, 3: 1e6}
    //          h_raw = {1: 1600000, 2: 1e6} -> h = {1: 1e6, 2: 625000}
    val got = GraphRank.hits(e, "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map(
      1L -> ((1000000L, 0L)),
      2L -> ((625000L, 600000L)),
      3L -> ((0L, 1000000L))))
  }

  test("mega-hub at Long-edge magnitudes: 11M full-weight in-neighbors " +
      "(damping*mass product > 2^63 under the naive multiply) rank " +
      "exactly — the divide-before-multiply split and the DECIMAL(38,0) " +
      "HITS normalize never wrap") {
    import org.apache.spark.sql.functions._
    // 11e6 sources each with out_deg 1 pointing at hub 0: the hub's
    // in-mass after one round is 1.1e13 ppm, so the old
    // damping*(x) product is 850000 * 1.1e13 = 9.35e18 > Long.Max —
    // an ANSI ArithmeticException before the fix. Exact expected rank:
    // 150000 + 850000 * 11e6 (x mod 1e6 = 0; dang = hub's 1e6,
    // div n = 0 at n = 11e6 + 1).
    val k = 11000000L
    val e = spark.range(k).select((col("id") + 1L).as("src"),
      lit(0L).as("dst"))
    val hub = GraphRank.pageRank(e, "src", "dst", iters = 1)
      .where(col("id") === 0L).collect().head.getLong(1)
    assert(hub == 150000L + 850000L * k)
    // HITS on the same graph: authority raw at the hub is 1.1e13, so
    // the old raw*1e6 normalize product is 1.1e19 > Long.Max. The hub
    // is THE max, so auth_ppm = exactly 1e6; every source hub-side
    // normalizes to 1e6 too (all equal raws).
    val h = GraphRank.hits(e, "src", "dst", iters = 1)
    val hubRow = h.where(col("id") === 0L).collect().head
    assert(hubRow.getLong(1) == 0L && hubRow.getLong(2) == 1000000L)
    assert(h.where(col("id") =!= 0L && col("hub_ppm") =!= 1000000L)
      .count() == 0L)
  }

  test("a sink-heavy graph keeps total mass bounded: floor division " +
      "leaks at most iters * (n + edges) ppm of the initial mass") {
    import spark.implicits._
    val e = (1L to 50L).map(i => (i, 100L + i % 5)).toDF("src", "dst")
    val total = GraphRank.pageRank(e, "src", "dst", 3)
      .agg(org.apache.spark.sql.functions.sum("rank_ppm"))
      .first().getLong(0)
    val n = 55L
    assert(total <= n * 1000000L && total > n * 1000000L - 3 * (n + 50) * 2)
  }
}
