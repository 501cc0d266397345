package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The codegen'd digest-bytes hash must be bit-identical to the hex-parse
  * formula the DuckDB oracles use. */
class Md5Prefix60Spec extends SparkSpec {

  test("Md5Prefix60 == conv(substring(md5,1,15),16,10) on varied inputs") {
    import spark.implicits._
    val df = (Seq("", "a", "abc", "the quick brown fox", "éè字")
      ++ (1 to 200).map(i => s"shingle token run $i"))
      .toDF("s")
    val out = df.select(
      TextFunctions.portableHash60(col("s")).as("fast"),
      conv(substring(md5(col("s").cast("binary")), 1, 15), 16, 10)
        .cast("long").as("ref"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // all non-negative (60-bit)
    out.foreach(r => assert(r.getLong(0) >= 0))
  }

  test("participates in codegen (no fallback exception under wholestage)") {
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val n = Seq("x", "y").toDF("s")
        .select(TextFunctions.portableHash60(col("s")))
        .collect().length
      assert(n == 2)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }
}
