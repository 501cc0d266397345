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
    * is `weight` md5 evaluations). NULL when `weight < 1`: Spark's
    * `sequence(0, w-1)` steps DOWNWARD for w ≤ 0, which would hand a
    * zero-weight row TWO hash draws — a key that stochastically beats
    * legitimate weight-1 rows. A null key sorts to the bottom of the
    * descending selection; [[weightedSample]] drops such rows outright. */
  def weightedKey(id: Column, weight: Column): Column =
    when(weight >= 1,
      array_max(transform(
        sequence(lit(0), weight.cast("int") - 1),
        r => TextFunctions.portableHash60(
          concat(id.cast("string"), lit("#"), r.cast("string"))))))

  /** Per-group weighted sample without replacement: the k rows of each
    * `group` with the largest [[weightedKey]] (id ascending on ties).
    * Rows with `weight < 1` have zero selection probability and are
    * excluded (the natural reading of a zero/negative weight — e.g. an
    * integral-division weight that floored to 0).
    * Returns the input columns plus `w` and `key`. */
  def weightedSample(df: DataFrame, group: Column, id: Column,
      weight: Column, k: Int): DataFrame = {
    val keyed = df
      .withColumn("w", weight.cast("int"))
      .filter(col("w") >= 1)
      .withColumn("key", weightedKey(id, col("w")))
    graft.plans.TopKPerGroup(keyed, Seq(group),
      Seq(col("key").desc, id.asc), k)
  }

  /** Deterministic hash-threshold train/val/test split — the 100 TB
    * default: MAP-ONLY (no shuffle, no state), stable under re-runs and
    * re-partitioning because membership is a pure function of the id, and
    * append-consistent (new rows never move old rows between splits —
    * the property per-stratum quotas cannot have). Proportions are
    * approximate (hash uniformity): each row goes to train/val/test by
    * `md5-hash60(id) % 1e6` against ppm thresholds. The 2^60 % 1e6
    * remainder biases bucket mass by < 1e-12 — far below the sampling
    * noise at any corpus size. */
  def hashSplit(df: DataFrame, id: Column,
      trainPpm: Long, valPpm: Long): DataFrame = {
    require(trainPpm >= 0 && valPpm >= 0 && trainPpm + valPpm <= 1000000L,
      "split ppms must be non-negative and sum to at most 1e6")
    val h = TextFunctions.portableHash60(id.cast("string")) % lit(1000000L)
    df.withColumn("split",
      when(h < lit(trainPpm), lit("train"))
        .when(h < lit(trainPpm + valPpm), lit("val"))
        .otherwise(lit("test")))
  }

  /** Leakage-safe split: near-duplicate CLUSTERS, not documents, are the
    * unit of train/val/test assignment. A document-keyed [[hashSplit]]
    * routinely places two near-duplicates on opposite sides of the
    * train/test boundary — the eval-contamination channel document-level
    * decontamination reports can't close, because the leaked document IS
    * legitimately in the corpus. Here every doc takes `cluster_key` =
    * its near-dup component id (own id for singletons) from the
    * large/small-star components over `pairs`, and the split is a pure
    * function of that key — so a near-dup pair can never straddle splits,
    * and assignment stays append-consistent for clusters the append does
    * not touch (a genuinely new cluster may fuse two old ones; only those
    * reassign).
    *
    * 100 TB shape: [[Dedup.clusterPairsStar]] rounds are bounded by the
    * (shrinking) edge set, the label join back to `docs` is one shuffle
    * keyed by the id, and the split itself is map-only. Output: `docs` +
    * `cluster_key` + `split`. */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      trainPpm: Long, valPpm: Long): DataFrame =
    hashSplit(Dedup.clusterKeys(docs, idCol, pairs),
      col("cluster_key"), trainPpm, valPpm)

  /** EXACT-quota stratified split: within every stratum, rows order by
    * (hash60(id), id) — a deterministic permutation — and the first
    * floor(n·trainPpm/1e6) go to train, the next floor(n·(train+val)Ppm/
    * 1e6) − floor(n·trainPpm/1e6) to val, the rest to test. Quotas are
    * exact per stratum (the report a dataset card states), at the price
    * hash thresholds don't pay: one exchange keyed by the stratum, a
    * whole stratum in one partition (use for BOUNDED strata — domains,
    * languages, label classes; for unbounded strata use [[hashSplit]]),
    * and re-splitting after appends can move rows between splits.
    * Quota arithmetic is integral ([[graft.functions.Predicates.idiv]])
    * so a trillion-row stratum computes the same cuts every engine does. */
  def stratifiedSplitExact(df: DataFrame, id: Column, stratum: Column,
      trainPpm: Long, valPpm: Long): DataFrame = {
    require(trainPpm >= 0 && valPpm >= 0 && trainPpm + valPpm <= 1000000L,
      "split ppms must be non-negative and sum to at most 1e6")
    import graft.functions.Predicates.idiv
    import org.apache.spark.sql.expressions.Window
    val h = TextFunctions.portableHash60(id.cast("string"))
    val w = Window.partitionBy(stratum).orderBy(h.asc, id.asc)
    val cw = Window.partitionBy(stratum)
    val n = count(lit(1)).over(cw)
    val cut1 = idiv(n * lit(trainPpm), lit(1000000L))
    val cut2 = idiv(n * lit(trainPpm + valPpm), lit(1000000L))
    val rn = row_number().over(w)
    df.withColumn("split",
      when(rn <= cut1, lit("train"))
        .when(rn <= cut2, lit("val"))
        .otherwise(lit("test")))
  }
}
