package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed global-ordinal assignment — the scale-safe replacement for
  * `row_number().over(Window.orderBy(...))` with no partition spec, which
  * moves ALL rows to a single partition (the WindowExec warning).
  *
  * `orderBy` plans a range-partitioned total sort (distributed), and
  * `zipWithIndex` preserves partition order, with range partitions emitted
  * in ascending key order — so the index IS the global rank. One extra job
  * (zipWithIndex counts per-partition sizes first) buys full parallelism on
  * the sort: the shape that holds when the "new keys" batch is millions of
  * rows instead of a dictionary handful.
  *
  * For input distinct on the sort key, the ordinal equals both
  * `row_number()` and `dense_rank()` over that key.
  */
object Ordinals {

  /** Append a 1-based `name` column holding each row's global ordinal in
    * `sortCols` order. */
  def withGlobalOrdinal(df: DataFrame, sortCols: Seq[Column], name: String): DataFrame = {
    val sorted = df.orderBy(sortCols: _*)
    val schema = sorted.schema.add(name, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
