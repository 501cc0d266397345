package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed sketches with engine-portable determinism.
  *
  * [[kmvDistinct]] is the k-minimum-values distinct-count estimator
  * (Bar-Yossef et al. 2002): keep the k smallest distinct hash values per
  * group; if the k-th smallest is `h_k` on a hash space of size `H`, the
  * group has ≈ (k-1)·H/h_k distinct values. Unlike HyperLogLog (whose
  * register layout is engine-specific), KMV on [[
  * graft.functions.TextFunctions.portableHash60]] is bit-reproducible in
  * any engine — so it gets an exact DuckDB oracle, not a tolerance check.
  */
object Sketches {

  /** 2^60 — the size of the portableHash60 space (a power of two, so the
    * double literal is exact and the estimate division is bit-identical
    * across engines). */
  val Hash60Space: Double = 1152921504606846976.0

  /** KMV distinct-count estimate per group over a pre-hashed value column.
    *
    * Output: group columns + `n_exact` (exact distinct hashes — retained so
    * the query itself exhibits the estimator's accuracy) + `est_distinct`
    * (the KMV estimate; groups with fewer than k distinct values fall back
    * to the exact count, the standard small-cardinality regime).
    *
    * 100 TB shape: one shuffle to distinct (group, hash); the k-minima ride
    * [[graft.plans.TopKPerGroup]], whose partial bounded-heap pass caps
    * each partition at k rows per group BEFORE the exchange — the sketch
    * property (fixed k-row state per group) holds end-to-end, which is the
    * point of a sketch. `n_exact` costs one extra count per group on the
    * same pre-distincted frame; drop it at true scale (documented) since
    * the estimate is the product.
    */
  def kmvDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      hashCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 2, "kmv needs k >= 2")
    val g = groupCols.map(col)
    // both output branches (exact count, k-minima) consume the distinct
    // frame: a lazy localCheckpoint computes it once and shares the blocks
    // (lifecycle is the RDD's own — the ContextCleaner frees them, no
    // manual unpersist contract for callers), instead of re-running the
    // upstream hash/explode subtree per branch
    val distinctHashes = df.select((g :+ col(hashCol).as("__h")): _*)
      .distinct().localCheckpoint(false)
    val exact = distinctHashes.groupBy(g: _*)
      .agg(count(lit(1)).as("n_exact"))
    val minima = graft.plans.TopKPerGroup(
      distinctHashes, g, Seq(col("__h").asc), k)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("__n_seen"), max(col("__h")).as("__kth"))
    exact.join(minima, groupCols)
      .withColumn("est_distinct",
        when(col("__n_seen") < k, col("__n_seen"))
          .otherwise(floor(
            lit((k - 1).toDouble) * lit(Hash60Space)
              / col("__kth").cast("double")).cast("long")))
      .drop("__n_seen", "__kth")
  }
}
