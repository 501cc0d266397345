package graft.functions

import graft.SparkSpec
import graft.functions.HedParser.HedMember

/** Expected outputs pinned by executing the reference implementation
  * (`python/lib/physio/hed.py:34-121`) on the same inputs. */
class HedParserSpec extends SparkSpec {

  private def flat(s: String): Seq[Seq[(Option[String], Boolean, Int)]] =
    HedParser.parse(s).map(_.map(m => (m.tag, m.hasPairing, m.additionalMembers)))

  test("flat tags: one group per tag, reverse order") {
    assert(flat("Sensory-event, Visual-presentation") == Seq(
      Seq((Some("Visual-presentation"), false, 0)),
      Seq((Some("Sensory-event"), false, 0))))
  }

  test("single parenthesized pair") {
    assert(flat("(Def/Right, Onset)") == Seq(
      Seq((Some("Onset"), false, 0), (Some("Def/Right"), true, 0))))
  }

  test("mixed flat + group") {
    assert(flat("Sensory-event, (Red, Blue), Agent-action") == Seq(
      Seq((Some("Agent-action"), false, 0)),
      Seq((Some("Blue"), false, 0), (Some("Red"), true, 0)),
      Seq((Some("Sensory-event"), false, 0))))
  }

  test("nested group with additional members") {
    assert(flat("(A, (B, C), D)") == Seq(
      Seq((Some("D"), false, 0), (Some("C"), false, 0),
        (Some("B"), true, 0), (Some("A"), true, 1))))
  }

  test("deep nesting fixture") {
    assert(flat("Event, (Intended-effect, (Cue, Target), Offset), End") == Seq(
      Seq((Some("End"), false, 0)),
      Seq((Some("Offset"), false, 0), (Some("Target"), false, 0),
        (Some("Cue"), true, 0), (Some("Intended-effect"), true, 1)),
      Seq((Some("Event"), false, 0))))
  }

  test("empty and null strings produce no groups") {
    assert(HedParser.parse("") == Seq.empty)
    assert(HedParser.parse(null) == Seq.empty)
  }

  test("explodeHedString produces UDTF rows") {
    import spark.implicits._
    val df = Seq((1L, "(A, B)"), (2L, "C")).toDF("event_id", "hed")
    val out = HedParser.explodeHedString(df, "hed")
      .select("event_id", "group_index", "member_index", "tag", "has_pairing")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3), r.getBoolean(4))).toSet
    assert(out == Set(
      (1L, 0, 0, "B", false), (1L, 0, 1, "A", true),
      (2L, 0, 0, "C", false)))
  }
}
