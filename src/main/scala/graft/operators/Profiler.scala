package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality column profiler: per column — row count, NULL count,
  * exact distinct count, and the lexicographic min/max of the STRING form
  * (a profiling identity for drift diffing, deliberately not a numeric
  * range: FP-to-string formatting is engine-specific, so callers exclude
  * floating-point columns or profile their ranges with typed queries).
  *
  * Shape: one single-column aggregate PER COLUMN, unioned — on columnar
  * storage each pass reads exactly one column (the scan's ReadSchema is a
  * single field), so profiling N columns costs N pruned scans, not one
  * scan carrying every column through an N-way expand (what a single-pass
  * multi-distinct aggregate would plan). Exact distincts are the point;
  * swap in HLL registers ([[Sketches.hllDistinct]]) when approximate is
  * acceptable. */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { c =>
      df.select(col(c).cast("string").as("__v"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("__v")).as("__nn"),
          countDistinct(col("__v")).as("n_distinct"),
          min(col("__v")).as("min_str"),
          max(col("__v")).as("max_str"))
        .select(lit(c).as("col_name"), col("n_rows"),
          (col("n_rows") - col("__nn")).as("n_null"),
          col("n_distinct"), col("min_str"), col("max_str"))
    }.reduce(_ unionAll _)
  }
}
