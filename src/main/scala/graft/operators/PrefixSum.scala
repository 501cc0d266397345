package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed running (prefix) sums over a totally-ordered numeric key —
  * without the single-task unpartitioned window AND without the O(n²)
  * triangular self-join round 2 used as a stopgap.
  *
  * Two-level scan (the classic parallel-prefix decomposition):
  *   1. rows chunk by key range (`chunkWidth` key units per chunk); each
  *      chunk computes its LOCAL running sum in a chunk-partitioned
  *      window — parallel across chunks;
  *   2. per-chunk totals (one row per chunk) get exclusive offsets via a
  *      triangular join on the CHUNK table — O(chunks²) pairs where round
  *      2's stopgap paid O(rows²); chunks = key-range / chunkWidth stays
  *      thousands even when rows are billions;
  *   3. final = local + broadcast chunk offset.
  *
  * The key must be numeric with roughly range-uniform mass (calendar
  * days/weeks, grid ticks, sequence numbers); skewed chunks only skew the
  * per-chunk sort, never correctness. Ties within the key sum together
  * before ranking — the caller's frame should already be key-unique
  * (group first, as q94 does). */
object PrefixSum {

  /** Inclusive running sum of `valueCol` over ascending `keyCol`.
    * Output: input columns + `outCol`. */
  def overKey(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      outCol: String,
      chunkWidth: Long = 1024L
  ): DataFrame = {
    require(chunkWidth >= 1)
    val chunked = df.withColumn("__chunk",
      floor(col(keyCol).cast("double") / chunkWidth).cast("long"))
    val local = chunked.withColumn("__local",
      sum(col(valueCol)).over(
        Window.partitionBy(col("__chunk"))
          .orderBy(col(keyCol).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = chunked.groupBy(col("__chunk"))
      .agg(sum(col(valueCol)).as("__t"))
    val offsets = totals
      .join(broadcast(totals.select(col("__chunk").as("__c2"),
        col("__t").as("__t2"))), col("__c2") < col("__chunk"), "left")
      .groupBy(col("__chunk"))
      .agg(coalesce(sum(col("__t2")), lit(0L)).as("__off"))
    local
      .join(broadcast(offsets), Seq("__chunk"))
      .withColumn(outCol, col("__local") + col("__off"))
      .drop("__chunk", "__local", "__off")
  }
}
