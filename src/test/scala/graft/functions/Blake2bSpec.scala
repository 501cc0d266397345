package graft.functions

import graft.SparkSpec
import graft.functions.expressions.{Blake2b, Blake2bCore}
import org.apache.spark.sql.functions._

/** Vectors generated with Python hashlib.blake2b (the reference's hash
  * implementation, `python/lib/utilities.py:210-234`). */
class Blake2bSpec extends SparkSpec {

  test("core digest matches hashlib vectors") {
    assert(Blake2bCore.hexDigest(Array.emptyByteArray) ==
      "786a02f742015903c6c6fd852552d272912f4740e15847618a86e217f71f5419" +
        "d25e1031afee585313896444934eb04b903a685b1448b755d56f701afe9be2ce")
    assert(Blake2bCore.hexDigest("abc".getBytes("UTF-8")) ==
      "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1" +
        "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923")
    assert(Blake2bCore.hexDigest(
      "The quick brown fox jumps over the lazy dog".getBytes("UTF-8")) ==
      "a8add4bdddfd93e4877d2746e62817b116364a1fa7bc148d95090bc7333b3673" +
        "f82401cf7aa2e4cb1ecd90296e3f14cb5413f8ed77be73045b13914cdcd6a918")
    // multi-block input (768 bytes = 6 full blocks)
    val multi = Array.tabulate(768)(i => (i % 256).toByte)
    assert(Blake2bCore.hexDigest(multi) ==
      "323e97a7a859ee63c9013debb0ca995811e73117a2f574723416e596ebc184e3" +
        "7a59b66d2f597df4a7c1b0d1d41a1a7f28774f46a6864d56c57b9d6c5f7302fb")
    // truncated digest size
    assert(Blake2bCore.hexDigest("abc".getBytes("UTF-8"), 32) ==
      "bddd813c634239723171ef3fee98579b94964e3bb1cb3e427262c8c068d52319")
  }

  test("expression evaluates over a DataFrame column, null-safe") {
    import spark.implicits._
    val out = Seq(Some("abc"), None).toDF("s")
      .withColumn("h", Blake2b.blake2b(col("s")))
      .collect().map(r => Option(r.getString(1)))
    assert(out(0).get.startsWith("ba80a53f981c4d0d"))
    assert(out(1).isEmpty)
  }

  test("SQL registration via GraftExtensions builder") {
    // function registry injection on the live session
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "blake2b",
      exprs => graft.functions.expressions.Blake2b(exprs.head), "scala_udf")
    val h = spark.sql("SELECT blake2b(CAST('abc' AS BINARY)) AS h").first().getString(0)
    assert(h.startsWith("ba80a53f981c4d0d"))
  }
}
