package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** U3 [[HedSchema]] — multi-schema union, first-match-by-id name
  * resolution, parent-chain long names, leaf-split tag resolution with
  * flagged unknowns. */
class HedSchemaSpec extends SparkSpec {
  import spark.implicits._

  private def standard = Seq(
    (1, None: Option[Int], 1, "Event"),
    (2, Some(1), 1, "Sensory-event"),
    (9, Some(2), 1, "Cue")).toDF("id", "parent_id", "schema_id", "name")

  private def library = Seq(
    (101, None: Option[Int], 2, "Score-event"),
    (103, Some(101), 2, "Cue")).toDF("id", "parent_id", "schema_id", "name")

  test("union + resolution: cross-schema name collision takes lowest id") {
    val dict = HedSchema.resolutionDict(
        HedSchema.unionNodes(Seq(standard, library)))
      .collect().map(r => r.getAs[String]("name") ->
        (r.getAs[Int]("hed_tag_id"), r.getAs[Int]("schema_id"))).toMap
    assert(dict("Cue") == ((9, 1)))          // 9 < 103 -> standard wins
    assert(dict("Score-event") == ((101, 2)))
    assert(dict.size == 4)                    // one row per distinct name
  }

  test("withLongNames: parent chains become full paths") {
    val named = HedSchema.withLongNames(standard)
      .collect().map(r => r.getAs[Int]("id") -> r.getAs[String]("long_name"))
      .toMap
    assert(named(1) == "Event")
    assert(named(2) == "Event/Sensory-event")
    assert(named(9) == "Event/Sensory-event/Cue")
  }

  test("withLongNames: a 20-deep chain resolves fully at maxDepth 20") {
    // chain 1 <- 2 <- ... <- 20; node i's path = n1/n2/.../ni
    val chain = (1 to 20).map(i =>
      (i, if (i == 1) None else Some(i - 1), 1, s"n$i"))
      .toDF("id", "parent_id", "schema_id", "name")
    val named = HedSchema.withLongNames(chain, maxDepth = 20)
      .collect().map(r => r.getAs[Int]("id") -> r.getAs[String]("long_name"))
      .toMap
    (1 to 20).foreach { i =>
      assert(named(i) == (1 to i).map(j => s"n$j").mkString("/"), s"node $i")
    }
  }

  test("resolveTags: leaf split, unknown flagged, NULL tag passes through") {
    val members = Seq(
      (1L, Some("Cue")),
      (2L, Some("Event/Sensory-event/Cue")), // leaf resolution
      (3L, Some("Nope")),                    // unknown -> flagged
      (4L, None: Option[String])             // synthetic group member
    ).toDF("event_id", "tag")
    val r = HedSchema.resolveTags(members,
        HedSchema.unionNodes(Seq(standard, library)))
      .orderBy("event_id").collect()
    assert(r(0).getAs[Int]("hed_tag_id") == 9)
    assert(r(1).getAs[Int]("hed_tag_id") == 9)
    assert(r(1).getAs[String]("long_name") == "Event/Sensory-event/Cue")
    assert(r(2).isNullAt(r(2).fieldIndex("hed_tag_id")))
    assert(r(2).getAs[Boolean]("unrecognized"))
    assert(r(3).isNullAt(r(3).fieldIndex("hed_tag_id")))
    assert(!r(3).getAs[Boolean]("unrecognized"))
  }
}
