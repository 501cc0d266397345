package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins for 100 TB workloads.
  *
  * AQE's skew-join split handles moderate skew automatically; this utility
  * covers the extreme case it can't: a single hot key whose partition
  * exceeds executor memory even after splitting, in a join whose build side
  * is too large to broadcast. Standard salting: the skewed (large) side
  * gets a random salt in [0, saltFactor); the replicated side is exploded
  * across all salt values; the join key becomes (key, salt). Result
  * equality with the plain join is exact (spec-checked) — only the
  * partitioning changes.
  */
object SkewJoin {

  /** Inner-join `skewed` with `replicated` on `keys`, salting the skewed
    * side `saltFactor` ways. `replicated` grows by ×saltFactor — use when
    * |replicated| ≪ |skewed| but still too big to broadcast. */
  def saltedInnerJoin(
      skewed: DataFrame,
      replicated: DataFrame,
      keys: Seq[String],
      saltFactor: Int
  ): DataFrame = {
    require(saltFactor > 1)
    // salt = hash(non-key columns, partition id): rows of one hot key spread
    // even when they are bit-identical in every column (the degenerate
    // duplicate-row skew case, where a pure column hash is constant).
    // spark_partition_id is stable for a given input partitioning; the join
    // result set is identical for ANY salt value, so plan-level stability is
    // not required for correctness.
    val nonKey = skewed.columns.filterNot(keys.contains).map(col)
    val salted = skewed.withColumn("__salt",
      pmod(hash(nonKey :+ spark_partition_id(): _*), lit(saltFactor)))
    val exploded = replicated.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded, keys :+ "__salt").drop("__salt")
  }
}
