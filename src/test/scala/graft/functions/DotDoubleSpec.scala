package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Pins the codegen'd [[expressions.DotDoubleExpr]] to the interpreted
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` form — both sum strictly in
  * index order, so the DuckDB `list_sum(list_transform(list_zip(..)))`
  * oracle stays bit-identical.
  */
class DotDoubleSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("codegen dot == interpreted HOF dot bit-for-bit on random vectors") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val bad = df.select(
      Similarity.dot(col("a"), col("b")).as("x"),
      hofDot(col("a"), col("b")).as("y"))
      .filter(not(col("x") <=> col("y")))
    assert(bad.count() === 0)
  }

  test("normalize-then-dot equals DuckDB-twin shape on a known vector") {
    val df = Seq((Seq(3.0, 4.0), Seq(3.0, 4.0))).toDF("a", "b")
    val got = df.select(
      Similarity.dot(Similarity.normalize(col("a")),
        Similarity.normalize(col("b"))).as("c"))
      .as[Double].head()
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("null propagates") {
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val r = df.select(Similarity.dot(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("length mismatch -> null, matching the zip_with twin (never a " +
      "plausible truncated partial score)") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val r = df.select(Similarity.dot(col("a"), col("b")).as("d"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, x) -> s + x)")
        .as("twin")).collect()(0)
    assert(r.isNullAt(0), "truncated dot must be null")
    assert(r.isNullAt(1), "twin sanity: zip_with pads nulls -> null sum")
  }
}
