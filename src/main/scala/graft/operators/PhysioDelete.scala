package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physiological-file deletion footprint —
  * `python/scripts/delete_physiological_file.py:110-346` re-expressed as a
  * set-oriented plan over a BATCH of PhysiologicalFileIDs (the script is
  * one process per file; per-table per-row DELETE loops become per-table
  * anti/semi-joins).
  *
  * The script's SEQUENTIAL order is semantically load-bearing and is
  * reproduced exactly:
  *  - the `point_3d` orphan sweep runs AFTER this file's
  *    coord-system/point rel pairs are deleted but BEFORE its electrodes
  *    are — so a point referenced only by this file's electrodes SURVIVES
  *    (it becomes a permanent orphan until some later run's sweep);
  *  - the `physiological_coord_system` orphan sweep runs BEFORE this
  *    file's electrode_rel rows are deleted — so the file's own coord
  *    system always survives the run that deletes the file (it would only
  *    be removed by a SECOND run);
  *  - both sweeps are GLOBAL (`NOT IN` over whole tables): pre-existing
  *    orphans from earlier deletions are collected too.
  *
  * For a multi-file batch the plan equals running the script for all the
  * files "in lockstep" (all rel deletes, then one sweep). For a single
  * file it is byte-for-byte the script's behavior.
  *
  * Scale: every per-file table prunes with one hash semi-join on
  * PhysiologicalFileID (the batch list broadcasts); the two orphan sweeps
  * are anti-joins on Point3DID / PhysiologicalCoordSystemID — dictionary-
  * sized electrode-position tables, no windows, no per-file round trips.
  */
object PhysioDelete {

  /** All table names the cascade touches, in the script's DELETE order. */
  val tableOrder: Seq[String] = Seq(
    "physiological_event_parameter_category_level",
    "physiological_event_parameter",
    "physiological_channel",
    "physiological_coord_system_point_3d_rel",
    "point_3d",
    "physiological_coord_system",
    "physiological_coord_system_electrode_rel",
    "physiological_electrode",
    "physiological_parameter_file",
    "physiological_archive",
    "physiological_event_archive",
    "physiological_task_event_opt",
    "physiological_task_event_hed_rel",
    "physiological_task_event",
    "physiological_event_file",
    "physiological_file")

  /** Deletion footprint: one row per table with the number of rows the
    * script's cascade would delete for `fileIds`.
    *
    * @param fileIds single-column batch of PhysiologicalFileIDs
    * @param tables  name → DataFrame for every entry in [[tableOrder]]
    */
  def deleteFootprint(spark: SparkSession, fileIds: DataFrame,
                      tables: Map[String, DataFrame]): DataFrame = {
    import spark.implicits._
    def t(name: String): DataFrame = tables(name)
    val batch = broadcast(fileIds
      .select(col(fileIds.columns.head).as("PhysiologicalFileID")).distinct())
    def byFile(df: DataFrame): DataFrame =
      df.join(batch, Seq("PhysiologicalFileID"), "left_semi")

    // event_file → event_parameter → category_level chain
    val eventFiles = byFile(t("physiological_event_file"))
    val eventParams = t("physiological_event_parameter")
      .join(eventFiles.select(col("EventFileID")), Seq("EventFileID"),
        "left_semi")
    val catLevels = t("physiological_event_parameter_category_level")
      .join(eventParams.select(col("EventParameterID")),
        Seq("EventParameterID"), "left_semi")

    val channels = byFile(t("physiological_channel"))

    // electrode ids are captured BEFORE any rel delete (script order)
    val electrodeRel = byFile(t("physiological_coord_system_electrode_rel"))
    val electrodeIds = electrodeRel.select(col("PhysiologicalElectrodeID"))

    // rel pairs linked to the batch via coord_system ⋈ electrode_rel
    val pointRel = t("physiological_coord_system_point_3d_rel")
    val delPairs = pointRel.join(
      electrodeRel.select(col("PhysiologicalCoordSystemID")).distinct(),
      Seq("PhysiologicalCoordSystemID"), "left_semi")

    // point_3d sweep AGAINST POST-PAIR-DELETE STATE: remaining rel rows,
    // but the FULL electrode table (electrodes not yet deleted)
    val remainingRel = pointRel.exceptAll(delPairs)
    val delPoints = t("point_3d")
      .join(remainingRel.select(col("Point3DID")), Seq("Point3DID"),
        "left_anti")
      .join(t("physiological_electrode").select(col("Point3DID")),
        Seq("Point3DID"), "left_anti")

    // coord_system sweep: remaining rel rows, FULL electrode_rel table
    val delCoords = t("physiological_coord_system")
      .join(remainingRel.select(col("PhysiologicalCoordSystemID")),
        Seq("PhysiologicalCoordSystemID"), "left_anti")
      .join(t("physiological_coord_system_electrode_rel")
        .select(col("PhysiologicalCoordSystemID")),
        Seq("PhysiologicalCoordSystemID"), "left_anti")

    val delElectrodes = t("physiological_electrode")
      .join(electrodeIds, Seq("PhysiologicalElectrodeID"), "left_semi")

    val taskEvents = byFile(t("physiological_task_event"))
    val taskIds = taskEvents.select(col("PhysiologicalTaskEventID"))
    val delOpts = t("physiological_task_event_opt")
      .join(taskIds, Seq("PhysiologicalTaskEventID"), "left_semi")
    val delHed = t("physiological_task_event_hed_rel")
      .join(taskIds, Seq("PhysiologicalTaskEventID"), "left_semi")

    val counts: Seq[(String, DataFrame)] = Seq(
      "physiological_event_parameter_category_level" -> catLevels,
      "physiological_event_parameter" -> eventParams,
      "physiological_channel" -> channels,
      "physiological_coord_system_point_3d_rel" -> delPairs,
      "point_3d" -> delPoints,
      "physiological_coord_system" -> delCoords,
      "physiological_coord_system_electrode_rel" -> electrodeRel,
      "physiological_electrode" -> delElectrodes,
      "physiological_parameter_file" ->
        byFile(t("physiological_parameter_file")),
      "physiological_archive" -> byFile(t("physiological_archive")),
      "physiological_event_archive" ->
        byFile(t("physiological_event_archive")),
      "physiological_task_event_opt" -> delOpts,
      "physiological_task_event_hed_rel" -> delHed,
      "physiological_task_event" -> taskEvents,
      "physiological_event_file" -> eventFiles,
      "physiological_file" -> byFile(t("physiological_file")))
    counts.map { case (name, df) =>
      df.agg(count(lit(1)).as("n_deleted"))
        .select(lit(name).as("table_name"), col("n_deleted"))
    }.reduce(_ unionByName _)
  }
}
