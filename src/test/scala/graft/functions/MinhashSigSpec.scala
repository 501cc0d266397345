package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the codegen'd single-pass [[expressions.MinhashSig]] to its
  * declarative twin (k × array_min(transform(universalHash))) — the two must
  * stay bit-identical because the DuckDB oracle for q27/q50 reproduces the
  * declarative form.
  */
class MinhashSigSpec extends SparkSpec {
  import spark.implicits._

  private val params = TextFunctions.minhashParams(64)

  test("codegen signature == declarative HOF signature on random 60-bit inputs") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)(
      Seq.fill(rnd.nextInt(40) + 1)(math.abs(rnd.nextLong()) >>> 4))
    val df = rows.toDF("sh")
    val got = df.select(
      TextFunctions.minhashSignature(col("sh"), params).as("a"),
      TextFunctions.minhashSignatureHof(col("sh"), params).as("b"))
    assert(got.filter(not(col("a") <=> col("b"))).count() === 0)
  }

  test("empty shingle array yields NULL signature in both forms") {
    val df = Seq(Seq.empty[Long]).toDF("sh")
    val r = df.select(
      TextFunctions.minhashSignature(col("sh"), params).as("a"),
      TextFunctions.minhashSignatureHof(col("sh"), params).as("b"))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("single-element array: signature is the k universal hashes of that element") {
    val x = 123456789L
    val df = Seq(Seq(x)).toDF("sh")
    val sig = df.select(TextFunctions.minhashSignature(col("sh"), params))
      .as[Seq[Long]].head()
    val p = TextFunctions.MinhashPrime
    val expected = params.map { case (a, b) => (a * (x % p) + b) % p }
    assert(sig === expected)
  }
}
