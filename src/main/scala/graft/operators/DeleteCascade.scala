package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The delete-imaging-upload cascade (`tools/delete_imaging_upload.pl:
  * 885-1146`): given an upload, compute the full set of rows to remove from
  * every dependent catalog table — the reference walks 15+ tables row by
  * row over DBI; the set-oriented form is one semi-join fan-out from the
  * upload's TarchiveID plus the J8 lineage self-join for intermediary
  * files.
  *
  * Scale posture: the seed (one upload → its TarchiveIDs) is a handful of
  * ids — every downstream selection is a BROADCAST left-semi, so no wide
  * table ever shuffles; the only join against big data is parameter_file ⋉
  * file-ids, also broadcast (file sets per archive are bounded).
  *
  * Input tables are addressed by the reference's DB names; each needs only
  * the columns the cascade touches (documented per step below).
  */
object DeleteCascade {

  /** Table names consumed from the `tables` map (absent optional tables are
    * treated as empty). */
  val RequiredTables = Seq("mri_upload", "files")
  val OptionalTables = Seq("tarchive", "tarchive_series", "tarchive_files",
    "files_intermediary", "parameter_file", "files_qcstatus",
    "feedback_mri_comments", "mri_protocol_violated_scans",
    "mri_violations_log", "MRICandidateErrors")

  /** Rows-to-delete per table for `uploadId`.
    *
    * - `mri_upload(UploadID, TarchiveID)` — the seed row(s)
    * - `tarchive{,_series,_files}(TarchiveID)` — archive catalog rows
    * - `files(FileID, TarchiveSource, SourceFileID)` — direct files, plus
    *   intermediary outputs via `files_intermediary(IntermedID,
    *   Output_FileID)` joined on lineage (`getIntermediaryFilesRef`,
    *   delete_imaging_upload.pl:1007-1037)
    * - `parameter_file(FileID)`, `files_qcstatus(FileID)`,
    *   `feedback_mri_comments(FileID)` — per-file EAV/QC rows over the
    *   UNION of direct + intermediary file ids (the tool's union-dedup)
    * - `mri_protocol_violated_scans` / `mri_violations_log` /
    *   `MRICandidateErrors` `(TarchiveID)` — violation sinks
    *
    * `scanTypesToDelete` non-empty restricts direct files to those scan
    * types (needs `files.MriScanTypeID` + a `mri_scan_type(MriScanTypeID,
    * MriScanTypeName)` table in the map), like the tool's -type option.
    */
  def deleteImagingUpload(
      tables: Map[String, DataFrame],
      uploadId: Long,
      scanTypesToDelete: Seq[String] = Nil
  ): Map[String, DataFrame] = {
    def tab(name: String): Option[DataFrame] = tables.get(name)
    def req(name: String): DataFrame = tables(name)

    val upload = req("mri_upload").filter(col("UploadID") === uploadId)
    val tids = upload.select(col("TarchiveID")).na.drop().distinct()

    def byTarchive(df: DataFrame, idCol: String = "TarchiveID"): DataFrame =
      df.join(broadcast(tids.select(col("TarchiveID").as(idCol))), Seq(idCol), "left_semi")

    val directAll = byTarchive(req("files"), "TarchiveSource")
    val direct = if (scanTypesToDelete.isEmpty) directAll else {
      val mst = req("mri_scan_type")
        .filter(col("MriScanTypeName").isin(scanTypesToDelete: _*))
        .select(col("MriScanTypeID"))
      directAll.join(broadcast(mst), Seq("MriScanTypeID"), "left_semi")
    }
    val directIds = direct.select(col("FileID"))

    // J8 lineage: intermediary outputs are files whose SourceFileID is a
    // direct file of this archive
    val intermediary = tab("files_intermediary").map { fi =>
      fi.join(req("files").select(col("FileID").as("Output_FileID"),
          col("SourceFileID")), Seq("Output_FileID"))
        .join(broadcast(directIds.select(col("FileID").as("SourceFileID"))),
          Seq("SourceFileID"), "left_semi")
    }
    val intermedOutIds = intermediary
      .map(_.select(col("Output_FileID").as("FileID")))
      .getOrElse(directIds.limit(0))

    // the tool's UNION dedup (U1): per-file dependents cover BOTH sets
    val allFileIds = directIds.unionByName(intermedOutIds).distinct()
    def byFile(df: DataFrame): DataFrame =
      df.join(broadcast(allFileIds), Seq("FileID"), "left_semi")

    val filesToDelete = req("files")
      .join(broadcast(allFileIds), Seq("FileID"), "left_semi")

    Seq(
      "mri_upload" -> Some(upload),
      "tarchive" -> tab("tarchive").map(byTarchive(_)),
      "tarchive_series" -> tab("tarchive_series").map(byTarchive(_)),
      "tarchive_files" -> tab("tarchive_files").map(byTarchive(_)),
      "files" -> Some(filesToDelete),
      "files_intermediary" -> intermediary,
      "parameter_file" -> tab("parameter_file").map(byFile),
      "files_qcstatus" -> tab("files_qcstatus").map(byFile),
      "feedback_mri_comments" -> tab("feedback_mri_comments").map(byFile),
      "mri_protocol_violated_scans" -> tab("mri_protocol_violated_scans").map(byTarchive(_)),
      "mri_violations_log" -> tab("mri_violations_log").map(byTarchive(_)),
      "MRICandidateErrors" -> tab("MRICandidateErrors").map(byTarchive(_))
    ).collect { case (k, Some(v)) => k -> v }.toMap
  }
}
