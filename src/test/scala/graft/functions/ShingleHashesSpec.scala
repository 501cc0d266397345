package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the fused codegen'd [[expressions.ShingleHashesExpr]] to the
  * declarative chain it replaces — the DuckDB oracles for q25/q26/q27/q37/
  * q50 all reproduce the declarative semantics, so equivalence here is what
  * keeps those hash checks green. */
class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  private def declarative(text: org.apache.spark.sql.Column, n: Int) =
    array_distinct(transform(
      TextFunctions.shingles(TextFunctions.tokens(text), n),
      s => TextFunctions.portableHash60(s)))

  test("fused == declarative on varied texts (n=5 and n=2)") {
    val rnd = new scala.util.Random(3)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x1", "θ", "word")
    val texts = Seq.fill(200)(
      Seq.fill(rnd.nextInt(60))(vocab(rnd.nextInt(vocab.size))).mkString(" ")) ++
      Seq("", "   ", "one", "one two", "a  b\tc\nd e", " pad  ded ")
    val df = texts.toDF("t")
    for (n <- Seq(2, 5)) {
      val bad = df.select(
        TextFunctions.shingleHashes60(col("t"), n).as("a"),
        declarative(col("t"), n).as("b"))
        .filter(not(col("a") <=> col("b")))
      assert(bad.count() === 0, s"mismatch at n=$n")
    }
  }

  test("positional variant == non-distinct declarative, index-aligned") {
    val rnd = new scala.util.Random(5)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    val texts = Seq.fill(100)(
      Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" ")) ++
      Seq("", "one", "a b a b a b")
    val df = texts.toDF("t")
    for (n <- Seq(2, 5)) {
      val bad = df.select(
        TextFunctions.shingleHashes60All(col("t"), n).as("a"),
        transform(
          TextFunctions.shingles(TextFunctions.tokens(col("t")), n),
          s => TextFunctions.portableHash60(s)).as("b"))
        .filter(not(col("a") <=> col("b")))
      assert(bad.count() === 0, s"positional mismatch at n=$n")
    }
    // repeats are NOT deduped and positions align with shingle starts
    val all = Seq("a b a b a b").toDF("t")
      .select(TextFunctions.shingleHashes60All(col("t"), 2))
      .as[Seq[Long]].head()
    assert(all.size == 5 && all.distinct.size == 2)
    assert(all(0) == all(2) && all(1) == all(3))
  }

  test("duplicate shingles dedup in first-occurrence order") {
    val df = Seq("a b a b a b").toDF("t")
    val fused = df.select(TextFunctions.shingleHashes60(col("t"), 2))
      .as[Seq[Long]].head()
    val decl = df.select(declarative(col("t"), 2)).as[Seq[Long]].head()
    assert(fused == decl)
    assert(fused.size == 2) // "a b" and "b a"
  }
}
