package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Predicates._

/** Truth-table tests for the reference's `in_range` NULL semantics
  * (`python/lib/imaging.py:1276-1299`) and companion codecs. */
class PredicatesSpec extends SparkSpec {

  private val D = DoubleType
  private def rows(tuples: (java.lang.Double, java.lang.Double, java.lang.Double, Boolean)*) = {
    val schema = StructType(Seq(
      StructField("v", D), StructField("mn", D), StructField("mx", D),
      StructField("expected", BooleanType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(tuples.map(t => Row(t._1, t._2, t._3, t._4)): _*),
      schema)
  }

  test("in_range truth table: NULL bounds unbounded, NULL value fails bounded checks") {
    val df = rows(
      // value, min, max, expected
      (5.0, 1.0, 10.0, true),   // inside
      (0.5, 1.0, 10.0, false),  // below min
      (11.0, 1.0, 10.0, false), // above max
      (1.0, 1.0, 10.0, true),   // inclusive min
      (10.0, 1.0, 10.0, true),  // inclusive max
      (5.0, null, 10.0, true),  // min unbounded
      (5.0, 1.0, null, true),   // max unbounded
      (5.0, null, null, true),  // no constraint
      (null, null, null, true), // no constraint passes NULL value
      (null, 1.0, null, false), // NULL value fails bounded check
      (null, null, 10.0, false),
      (null, 1.0, 10.0, false)
    )
    val out = df.withColumn("got", inRange(col("v"), col("mn"), col("mx"))).collect()
    out.foreach { r =>
      assert(r.getAs[Boolean]("got") == r.getAs[Boolean]("expected"),
        s"in_range(${r.get(0)}, ${r.get(1)}, ${r.get(2)})")
    }
  }

  test("nullifNa maps sentinels to NULL") {
    import spark.implicits._
    val df = Seq("n/a", "N/A", "", "  ", "ok", " x ").toDF("s")
      .withColumn("out", nullifNa(col("s")))
    val got = df.select("out").collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(None, None, None, None, Some("ok"), Some(" x ")))
  }

  test("ynBool codec") {
    import spark.implicits._
    val got = Seq("Y", "n", "1", "0", "meh", null.asInstanceOf[String])
      .toDF("s").withColumn("b", ynBool(col("s")))
      .select("b").collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(got.toSeq == Seq(Some(true), Some(false), Some(true), Some(false), None, None))
  }

  test("nearest rounds to step like Math::Round::nearest(0.01, x)") {
    import spark.implicits._
    val got = Seq(2.456, 2.454, 30.0).toDF("x")
      .withColumn("r", nearest(0.01, col("x"))).select("r")
      .collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 2.46) < 1e-9)
    assert(math.abs(got(1) - 2.45) < 1e-9)
    assert(got(2) == 30.0)
  }

  test("eqOrNullWildcard and naturalKeyMatch null semantics") {
    import spark.implicits._
    val df = Seq(
      (Some(1), Some(1)), (Some(1), Some(2)),
      (None: Option[Int], Some(1)), (None: Option[Int], None: Option[Int])
    ).toDF("p", "s")
    val wild = df.withColumn("w", eqOrNullWildcard(col("p"), col("s")))
      .select("w").collect().map(_.getBoolean(0))
    assert(wild.toSeq == Seq(true, false, true, true))
    val nk = df.withColumn("k", naturalKeyMatch(col("p") -> col("s")))
      .select("k").collect().map(_.getBoolean(0))
    assert(nk.toSeq == Seq(true, false, false, true))
  }
}
