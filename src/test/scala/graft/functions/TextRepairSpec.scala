package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[TextFunctions.repairMojibake]] — round-trip repair, the two safety
  * gates, and idempotence. */
class TextRepairSpec extends SparkSpec {
  import spark.implicits._

  private def mojibake(clean: String): String =
    new String(clean.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)

  private def repair(ss: Seq[String]): Seq[String] =
    ss.toDF("t")
      .select(TextFunctions.repairMojibake(col("t")))
      .collect().map(_.getString(0)).toSeq

  test("UTF-8-as-Latin-1 text round-trips back to the original") {
    val cleans = Seq("Café", "naïve", "grüßen",
      "élève reçu", "Straße 42")
    assert(repair(cleans.map(mojibake)) == cleans)
  }

  test("clean ASCII and genuine Latin-1 prose are never touched") {
    // plain ASCII: no suspicious pair, untouched
    assert(repair(Seq("hello world 123")) == Seq("hello world 123"))
    // genuine accented prose with no lead-byte signature: untouched
    val latin = "résumé déjà vu"
    assert(repair(Seq(latin)) == Seq(latin))
    // suspicious-LOOKING pair plus a stray 0xFF byte: the byte sequence
    // is not structurally valid UTF-8, so the validity gate keeps the
    // original instead of tripping Spark 4's malformed-decode error
    val trap = "Ã© ÿ"
    assert(repair(Seq(trap)) == Seq(trap))
  }

  test("repair is idempotent") {
    val once = repair(Seq(mojibake("Café")))
    assert(repair(once) == once)
  }
}
