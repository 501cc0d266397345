package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChatDataSpec extends SparkSpec {

  private def chats(rows: (Long, String)*) = {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.DataType.fromDDL(
      "array<struct<role:string,content:string>>")
    rows.toSeq.toDF("conv_id", "raw")
      .select(col("conv_id"), from_json(col("raw"), schema).as("messages"))
  }

  test("degenerate conversations never pass and never throw: empty " +
      "array, single system turn, malformed JSON (null array)") {
    val df = chats(
      (1L, "[]"),
      (2L, """[{"role":"system","content":"only"}]"""),
      (3L, "not json at all"))
    val got = ChatData.validateChats(df, "conv_id", "messages")
      .orderBy("conv_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(6)))
    assert(got.toSeq == Seq((1L, false), (2L, false), (3L, false)))
    // per-rule attrition is exact for the degenerate rows too: an EMPTY
    // array fails ok_no_empty (exists() over [] is false, so the size
    // guard — not the coalesce — is what fires), and a NULL array fails
    // every rule
    val rules = ChatData.validateChats(df, "conv_id", "messages")
      .orderBy("conv_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(5)))
    // conv 2's lone system turn has real content, so ITS ok_no_empty
    // holds (it fails on opening/alternation instead)
    assert(rules.toSeq == Seq((1L, false), (2L, true), (3L, false)))
  }

  test("a long strictly-alternating conversation with a system prefix " +
      "is valid; swapping any two adjacent roles breaks exactly the " +
      "alternation rule") {
    val good = """[{"role":"system","content":"s"}""" +
      (0 until 6).map(i => if (i % 2 == 0)
        """,{"role":"user","content":"u"}"""
      else """,{"role":"assistant","content":"a"}""").mkString + "]"
    val bad = good.replaceFirst("""\{"role":"user","content":"u"\}""",
      """{"role":"assistant","content":"a"}""")
    val got = ChatData.validateChats(chats((1L, good), (2L, bad)),
        "conv_id", "messages")
      .orderBy("conv_id")
      .collect().map(r => (r.getBoolean(3), r.getBoolean(6)))
    assert(got(0) == ((true, true)))
    assert(got(1) == ((false, false)))
  }

  test("preference pairs: NULL sides count as empty, null-safe " +
      "distinctness, copy counts by prompt, and NULL prompts survive " +
      "the count join flagged not-train-ready") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("p"), Some("a"), Option.empty[String]),
      (2L, Some("q"), Option.empty[String], Option.empty[String]),
      (3L, Option.empty[String], Some("a"), Some("b")),
      (4L, Option.empty[String], Some("c"), Some("d"))
    ).toDF("pair_id", "prompt", "chosen", "rejected")
    val got = ChatData.validatePreferencePairs(df, "pair_id", "prompt",
        "chosen", "rejected")
      .orderBy("pair_id")
      .collect().map(r => (r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getLong(4), r.getBoolean(5)))
    assert(got.length == 4) // NULL-prompt rows did NOT vanish
    assert(got(0) == ((true, false, true, 1L, false)))  // null rejected
    assert(got(1) == ((true, false, false, 1L, false))) // null <=> null
    // the two NULL prompts count as copies of each other and are
    // flagged ok_prompt = false
    assert(got(2) == ((false, true, true, 2L, false)))
    assert(got(3) == ((false, true, true, 2L, false)))
  }
}
