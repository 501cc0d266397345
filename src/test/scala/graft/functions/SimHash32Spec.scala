package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions._

/** [[graft.functions.expressions.SimHash32Expr]] — the fused codegen'd
  * SimHash must be bit-identical to the declarative
  * `simhash32(tokens(text))` HOF chain (the semantic oracle the q28/q54
  * DuckDB twins are written against). */
class SimHash32Spec extends SparkSpec {

  test("fused simhash32 == declarative HOF chain on crafted strings") {
    import spark.implicits._
    val d = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a a",
      "single",
      "  leading and trailing  ",
      ""
    ).toDF("text")
    val rows = d.select(
      simhash32Fused(col("text")).as("fused"),
      simhash32(tokens(col("text"))).as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("fused simhash32 == declarative on the sf0.001 documents table") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val diff = d.select(
      simhash32Fused(col("text")).as("fused"),
      simhash32(tokens(col("text"))).as("hof"))
      .filter(col("fused") =!= col("hof")).count()
    assert(diff == 0L)
  }

  test("near-identical docs land within small hamming distance") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappaX"),
      (3L, "completely different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
    val h = d.select(col("doc_id"), simhash32Fused(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(2L)) < ham(h(1L), h(3L)))
  }
}
