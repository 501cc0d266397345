package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic weighted sampling for training-data pipelines.
  *
  * Weighted reservoir sampling (Efraimidis–Spirakis A-ES) keeps the k
  * items with the largest key `u^(1/w)`, `u` uniform in (0,1] — but an
  * FP key (`ln`, `pow`) is not bit-reproducible across engines, which the
  * correctness gate requires. The exact-integer twin used here: the
  * distribution of `max(u_1..u_w)` IS `u^(1/w)`, so for integer weights
  * the key is the MAX of `w` independent 60-bit item hashes — computed
  * inside one codegen'd array expression (`w` is small and bounded), no
  * RNG, no FP, reproducible in any engine with md5.
  *
  * Selection = [[graft.plans.TopKPerGroup]] on the key: a map-side
  * bounded-heap pass caps every partition at k rows per group BEFORE the
  * one clustering exchange — sampling 100 TB moves at most
  * partitions×groups×k rows, never the corpus.
  */
object Sampling {

  /** The A-ES integer key: `max_{r<w} hash60(id || '#' || r)`.
    * `weight` must be a positive integer column (cap it; the per-row cost
    * is `weight` md5 evaluations). */
  def weightedKey(id: Column, weight: Column): Column =
    array_max(transform(
      sequence(lit(0), weight.cast("int") - 1),
      r => TextFunctions.portableHash60(
        concat(id.cast("string"), lit("#"), r.cast("string")))))

  /** Per-group weighted sample without replacement: the k rows of each
    * `group` with the largest [[weightedKey]] (id ascending on ties).
    * Returns the input columns plus `w` and `key`. */
  def weightedSample(df: DataFrame, group: Column, id: Column,
      weight: Column, k: Int): DataFrame = {
    val keyed = df
      .withColumn("w", weight.cast("int"))
      .withColumn("key", weightedKey(id, col("w")))
    graft.plans.TopKPerGroup(keyed, Seq(group),
      Seq(col("key").desc, id.asc), k)
  }
}
