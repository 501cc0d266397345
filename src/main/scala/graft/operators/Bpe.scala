package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (Sennrich et al. 2016) — the
  * tokenizer-training stage of an LLM data pipeline, in the shape real BPE
  * trainers use at corpus scale: all iteration happens on the DISTINCT-WORD
  * frequency table (|vocab| rows), never on the corpus. The corpus is
  * scanned exactly once ([[wordCounts]]); every merge round after that is a
  * job over vocab-sized data, and the learned merge list — the model
  * artifact — is inherently driver-sized (one row per round).
  *
  * Determinism: pair selection breaks ties by (count desc, left asc,
  * right asc); the greedy left-to-right merge application is a pure array
  * fold. No hashing, no floats — bit-identical in any engine, so round-1
  * pair counts carry an exact DuckDB oracle (q158) and the multi-round
  * trainer is pinned against an in-memory reference fold in BpeSpec.
  */
object Bpe {

  /** ONE corpus scan: whitespace-token frequencies. Everything downstream
    * iterates over this table, whose size is the vocabulary — not the
    * corpus. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))

  /** Start state: every word as its character-symbol array. */
  def initialSymbols(words: DataFrame): DataFrame =
    words.withColumn("syms", split(col("word"), ""))

  /** Adjacent-symbol pair frequencies weighted by word frequency — the
    * per-round statistic. One agg over vocab-sized data; pairs explode to
    * at most (word length − 1) rows per distinct word. */
  def pairCounts(segmented: DataFrame): DataFrame =
    segmented
      .filter(size(col("syms")) >= 2)
      .select(col("n"),
        explode(transform(sequence(lit(0), size(col("syms")) - 2), i =>
          struct(
            element_at(col("syms"), (i + 1).cast("int")).as("left"),
            element_at(col("syms"), (i + 2).cast("int")).as("right"))))
          .as("__p"))
      .groupBy(col("__p.left").as("left"), col("__p.right").as("right"))
      .agg(sum(col("n")).as("pair_n"))

  /** Greedy left-to-right application of ONE merge rule (a, b) → ab to a
    * segmentation: a pure `aggregate` fold over each symbol array —
    * "aaa" under (a,a) becomes [aa, a], the standard BPE scan order. */
  def applyMerge(segmented: DataFrame, a: String, b: String): DataFrame = {
    val merged: Column = concat(lit(a), lit(b))
    segmented.withColumn("syms",
      aggregate(col("syms"), array().cast("array<string>"), (acc, x) =>
        when(
          size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
          .otherwise(concat(acc, array(x)))))
  }

  /** Train `rounds` merges over a [[wordCounts]] table; returns the merge
    * list (round, left, right, pair_n) — the tokenizer model. Each round
    * takes the single best pair to the driver (one row — the canonical
    * trainer loop; the merge list IS driver-sized state) and re-segments
    * the vocab table under it. Stops early if no pair remains. The
    * segmentation is locally checkpointed per round so plan depth stays
    * constant across rounds instead of nesting one lambda-fold per merge.
    */
  def train(words: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64, "bpe: 1 <= rounds <= 64")
    val spark = words.sparkSession
    import spark.implicits._
    var seg = initialSymbols(words)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val best = pairCounts(seg)
        .orderBy(col("pair_n").desc, col("left").asc, col("right").asc)
        .limit(1)
        .collect() // TakeOrderedAndProject of 1 row — the model artifact
      if (best.isEmpty) exhausted = true
      else {
        val row = best.head
        val (a, b) = (row.getString(0), row.getString(1))
        merges += ((r, a, b, row.getLong(2)))
        seg = applyMerge(seg, a, b).localCheckpoint(false)
      }
      r += 1
    }
    merges.result().toDF("round", "left", "right", "pair_n")
  }

  /** Segment a corpus under a learned merge list: replays the merges in
    * round order over each document's words. Map-only over the corpus —
    * the merge list is a literal fold chain, no join. */
  def encode(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs.withColumn("__w",
      explode(split(trim(col(textCol)), "\\s+")))
      .filter(length(col("__w")) > 0)
      .withColumn("syms", split(col("__w"), ""))
    merges.foldLeft(words) { case (df, (a, b)) => applyMerge(df, a, b) }
      .drop("__w")
  }
}
