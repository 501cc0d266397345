package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph ranking for web-corpus curation — the quality-weighting
  * signal a crawl-derived training mix uses next to [[UrlOps]]'s
  * canonicalization and per-host caps (Common-Crawl-style pipelines
  * weight domains by centrality before sampling; see the public
  * PageRank formulation, Brin & Page 1998). The iteration is the star-CC
  * pattern the engine already runs ([[Dedup]]): a fixed number of
  * join+aggregate rounds with `localCheckpoint` lineage truncation —
  * rank state is one (id, out_deg, rank_ppm) row per node (out_deg is
  * static and rides the state so no round re-joins it), contributions
  * are one edge-keyed shuffle per round, nothing driver-side but two
  * 1-row-class scalars (node count; per-round dangling mass rides a
  * broadcast 1-row frame).
  *
  * Exact-integer contract (the house FP-free discipline — ranks are
  * ppm-scaled Longs, every division is floor `div`, so any engine
  * reproduces the values bit-for-bit and ties are deterministic):
  *   - r₀(v) = 10⁶ for every node (nodes = distinct src ∪ dst)
  *   - share(s→d) = r(s) div out_deg(s)
  *   - dangling mass D = Σ r(v) over nodes with no outgoing edge
  *   - r'(v) = (10⁶ − damping) + damping·(Σ_in share + D div n) div 10⁶
  * Multi-edges count with multiplicity (a weighted vote); pass a
  * `.distinct()` edge set for the simple-graph form. Floor division
  * leaks ≤1 ppm per division, so total mass drifts down by parts-per-
  * million per round — the price of exactness, irrelevant to ordering.
  */
object GraphRank {

  /** `iters` rounds of damped PageRank over (srcCol, dstCol) edges →
    * (id, rank_ppm). Node ids keep their input type (long vec ids,
    * string hosts from [[UrlOps.hostGraph]] — anything joinable).
    * `dampingPpm` defaults to the canonical 0.85. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampingPpm: Long = 850000L): DataFrame = {
    require(iters >= 1, "pageRank needs iters >= 1")
    require(dampingPpm >= 0 && dampingPpm <= 1000000L,
      "dampingPpm must be in [0, 1e6]")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    // static per-node frame (id, out_deg — NULL for dangling): joined
    // ONCE before the loop instead of re-joining outDeg against the rank
    // state every round (the r12 job ledger: that per-round join was one
    // broadcast build + one shuffle per iteration for a value that never
    // changes). The rank state carries out_deg through the rounds.
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    val base = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .join(outDeg, col("id") === col("src"), "left")
      .select(col("id"), col("out_deg"))
      .localCheckpoint(true)
    // ONE driver-side scalar for the whole run (1-row-class read, the
    // same justification as the ANN routing reads): n parameterizes the
    // dangling share as a literal
    val n = base.count()
    var rank = base.withColumn("rank_ppm", lit(1000000L))
    for (_ <- 0 until iters) {
      // dangling mass as a BROADCAST 1-row frame — never a collect
      val dang = rank.where(col("out_deg").isNull)
        .agg(coalesce(sum(col("rank_ppm")), lit(0L)).as("__dang"))
      val contrib = rank.where(col("out_deg").isNotNull)
        .select(col("id").as("src"),
          expr("rank_ppm div out_deg").as("__share"))
        .join(e, "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("__share")).as("__in"))
      // floor(damping·x/10⁶) via the exact split
      //   a·(x div 10⁶) + (a·(x mod 10⁶)) div 10⁶
      // (x = q·10⁶ + r ⟹ a·x/10⁶ = a·q + a·r/10⁶ with a·q integral):
      // the naive a·x product wraps Long once ~10¹³ ppm of mass
      // concentrates on one node (≈10⁷ full-weight in-neighbors — a
      // routine mega-hub on a 10⁸-host crawl graph), which under ANSI
      // is a job-killing ArithmeticException on exactly the run this
      // operator exists for. Here a·q ≤ dampingPpm·(Σmass/10⁶) and
      // a·r < 10¹², both safely inside Long for any graph whose total
      // ppm mass itself fits a Long (the operator's standing bound).
      rank = base.join(contrib, Seq("id"), "left")
        .crossJoin(broadcast(dang))
        .withColumn("__x", expr(s"coalesce(__in, 0L) + (__dang div $n)"))
        .select(col("id"), col("out_deg"),
          (lit(1000000L - dampingPpm) +
            expr(s"(__x div 1000000) * $dampingPpm" +
              s" + ($dampingPpm * (__x % 1000000)) div 1000000")
              .cast("long")).as("rank_ppm"))
        .localCheckpoint(true)
    }
    rank.select(col("id"), col("rank_ppm"))
  }

  /** HITS hubs/authorities (Kleinberg 1999, "Authoritative sources in a
    * hyperlinked environment") — the complementary centrality pair for
    * bipartite-ish curation graphs (portal sites vs content sites;
    * customers vs suppliers): `iters` rounds of
    *   auth(v) = Σ_{u→v} hub(u),   hub(u) = Σ_{u→v} auth(v),
    * each side max-normalized to the ppm scale per round
    * (`x·10⁶ div max` — the integer form of HITS' norm step, exact and
    * deterministic; ordering is what HITS is used for, and floor
    * division never reorders). Same iteration scaffold as [[pageRank]]:
    * edge-keyed shuffles, 1-row broadcast max frames, checkpointed
    * rounds. Assumes a non-empty edge set (an empty graph has no max to
    * normalize by). Output: (id, hub_ppm, auth_ppm). */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, "hits needs iters >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(true)
    var hub = nodes.withColumn("h", lit(1000000L))
    var auth = nodes.withColumn("a", lit(1000000L))
    for (_ <- 0 until iters) {
      val aRaw = e.join(hub.select(col("id").as("src"), col("h")), "src")
        .groupBy(col("dst").as("id")).agg(sum(col("h")).as("__raw"))
      val aMax = aRaw.agg(max(col("__raw")).as("__max"))
      // max-normalize exactly without the raw·10⁶ Long product (which
      // wraps past 2⁶³ at in-degree ≈9.2×10⁶ — routine for a crawl-graph
      // hub): widen THIS ONE step to DECIMAL(38,0). raw·10⁶ ≤ mass·10⁶
      // ≈ 9.2×10²⁴ sits far inside decimal-38, `div` on decimals is
      // Spark's IntegralDivide (floor, returns BIGINT) — the value is
      // bit-identical to the all-Long form wherever that form survives.
      // LAZY checkpoints (here and for hub below): the loop itself runs
      // no action, so every round's checkpoint RDD materializes (and
      // persists) within the job cascade of the FINAL hub⋈auth action —
      // what the per-round checkpoint buys is logical-plan truncation at
      // construction time (planning stays O(round), not O(rounds²));
      // two fewer dedicated jobs per round than the eager form
      auth = nodes.join(aRaw, Seq("id"), "left")
        .crossJoin(broadcast(aMax))
        .select(col("id"),
          expr("cast(cast(coalesce(__raw, 0L) as decimal(38,0))" +
            " * 1000000 div __max as long)").as("a"))
        .localCheckpoint(false)
      val hRaw = e.join(auth.select(col("id").as("dst"), col("a")), "dst")
        .groupBy(col("src").as("id")).agg(sum(col("a")).as("__raw"))
      val hMax = hRaw.agg(max(col("__raw")).as("__max"))
      hub = nodes.join(hRaw, Seq("id"), "left")
        .crossJoin(broadcast(hMax))
        .select(col("id"),
          expr("cast(cast(coalesce(__raw, 0L) as decimal(38,0))" +
            " * 1000000 div __max as long)").as("h"))
        .localCheckpoint(false)
    }
    hub.join(auth, Seq("id"))
      .select(col("id"), col("h").as("hub_ppm"), col("a").as("auth_ppm"))
  }
}
