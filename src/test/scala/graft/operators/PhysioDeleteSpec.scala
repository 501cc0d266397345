package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** delete_physiological_file.py cascade: the sequential-state quirks
  * verified by ID, not just count. */
class PhysioDeleteSpec extends SparkSpec {

  private def tables: Map[String, DataFrame] = {
    import spark.implicits._
    Map(
      "physiological_file" -> Seq(100L, 200L).toDF("PhysiologicalFileID"),
      "physiological_event_file" -> Seq((11L, 100L), (12L, 200L))
        .toDF("EventFileID", "PhysiologicalFileID"),
      "physiological_event_parameter" -> Seq((21L, 11L), (22L, 12L))
        .toDF("EventParameterID", "EventFileID"),
      "physiological_event_parameter_category_level" ->
        Seq((31L, 21L), (32L, 22L))
          .toDF("CategoryLevelID", "EventParameterID"),
      "physiological_channel" -> Seq((41L, 100L), (42L, 200L))
        .toDF("ChannelID", "PhysiologicalFileID"),
      "physiological_coord_system_electrode_rel" ->
        Seq((51L, 61L, 100L), (52L, 62L, 200L))
          .toDF("PhysiologicalCoordSystemID", "PhysiologicalElectrodeID",
            "PhysiologicalFileID"),
      "physiological_coord_system" ->
        Seq(51L, 52L, 53L).toDF("PhysiologicalCoordSystemID"),
      "physiological_coord_system_point_3d_rel" ->
        Seq((51L, 71L), (51L, 73L), (52L, 72L), (52L, 73L))
          .toDF("PhysiologicalCoordSystemID", "Point3DID"),
      "point_3d" -> Seq(71L, 72L, 73L, 74L, 75L, 76L).toDF("Point3DID"),
      "physiological_electrode" -> Seq((61L, 74L), (62L, 75L))
        .toDF("PhysiologicalElectrodeID", "Point3DID"),
      "physiological_parameter_file" -> Seq((81L, 100L), (82L, 200L))
        .toDF("ParameterID", "PhysiologicalFileID"),
      "physiological_archive" -> Seq((91L, 100L))
        .toDF("ArchiveID", "PhysiologicalFileID"),
      "physiological_event_archive" -> Seq((95L, 100L))
        .toDF("EventArchiveID", "PhysiologicalFileID"),
      "physiological_task_event" -> Seq((101L, 100L), (102L, 200L))
        .toDF("PhysiologicalTaskEventID", "PhysiologicalFileID"),
      "physiological_task_event_opt" -> Seq((111L, 101L), (112L, 102L))
        .toDF("OptID", "PhysiologicalTaskEventID"),
      "physiological_task_event_hed_rel" -> Seq((121L, 101L))
        .toDF("HedRelID", "PhysiologicalTaskEventID"))
  }

  test("ordering quirks: electrode-held point and own coord system survive") {
    import spark.implicits._
    val fp = PhysioDelete.deleteFootprint(spark, Seq(100L).toDF("id"),
      tables).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // point 74 is held by electrode 61 (deleted LATER) → only 71
    // (orphaned by the pair delete) and 76 (pre-existing orphan) sweep
    assert(fp("point_3d") == 2L)
    // coord 51 still has electrode_rel rows at sweep time → only the
    // global orphan 53 goes; 51 needs a second run
    assert(fp("physiological_coord_system") == 1L)
    // shared point 73 survives via (52,73)
    assert(fp("physiological_coord_system_point_3d_rel") == 2L)
  }

  test("empty batch deletes nothing") {
    import spark.implicits._
    val fp = PhysioDelete.deleteFootprint(spark,
      Seq.empty[Long].toDF("id"), tables).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the GLOBAL orphan sweeps still collect pre-existing orphans (76 and
    // coord 53) — the script would too, on any invocation
    assert(fp("point_3d") == 1L)
    assert(fp("physiological_coord_system") == 1L)
    assert(fp.filterNot(k => Set("point_3d", "physiological_coord_system")
      .contains(k._1)).values.forall(_ == 0L))
  }

  test("batch of both files lockstep-deletes everything per-file") {
    import spark.implicits._
    val fp = PhysioDelete.deleteFootprint(spark,
      Seq(100L, 200L).toDF("id"), tables).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fp("physiological_file") == 2L)
    assert(fp("physiological_event_file") == 2L)
    assert(fp("physiological_coord_system_point_3d_rel") == 4L)
    // all rel rows gone → every point not electrode-held sweeps
    assert(fp("point_3d") == 4L) // 71, 72, 73, 76 (74/75 electrode-held)
    assert(fp("physiological_coord_system") == 1L) // still only orphan 53
  }
}
