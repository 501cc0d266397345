package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Upload deletion footprint (SURVEY.md §2 — the composed form of
  * `tools/delete_imaging_upload.pl`, whose pieces J6/J8/U1/U2 already
  * cover individually): everything the reference's most safety-critical
  * tool would delete and back up for a set of uploads, computed as ONE
  * dataflow instead of its eleven per-table SELECTs.
  *
  * Reference semantics preserved:
  *  - the QC gate (`hasQcOrComment:873-921`): an upload whose archive has
  *    any `files_qcstatus` or `feedback_mri_comments` row (directly or
  *    through `files_intermediary` outputs) is REFUSED — [[qcGate]]
  *    reports the counts, [[footprint]] excludes the upload entirely;
  *  - `files` rows tied by `TarchiveSource` (`getFilesRef:924-961`);
  *  - `files_intermediary` outputs whose `SourceFileID` is an archive
  *    file (`getIntermediaryFilesRef:986-1051`) — duplicate
  *    `Output_FileID` entries yield duplicate file rows, as the
  *    reference's own comment warns;
  *  - `parameter_file` rows for archive files UNION rows for files whose
  *    `SourceFileID` is an archive file (`getParameterFilesRef:1073-1160`,
  *    the U2 union);
  *  - violation tables keyed by `TarchiveID`
  *    (`getMriProtocolViolatedScansFilesRef:1194`,
  *    `getMriViolationsLogFilesRef:1244`,
  *    `getMRICandidateErrorsFilesRef:1302`);
  *  - relative paths get the data-dir prefix, absolute paths pass
  *    through (`FullPath` derivation repeated at `:953-957` et al.).
  *
  * Scope note: the single-file `-basename` mode and `-keepDefaced` are
  * not modeled (pre-filter the inputs for those workflows).
  *
  * Scale posture: `files` is touched once, keyed by TarchiveSource (one
  * shuffle); every derived set (intermediaries, parameters, violations)
  * is a hash join off that set or off the tiny upload list; the QC gate
  * is two semi-join counts. No driver-side loop over tables.
  */
object DeleteUpload {

  /** One row per upload: QC/comment counts over the archive's files
    * (direct + intermediary outputs) and the resulting verdict. */
  def qcGate(uploads: DataFrame, files: DataFrame,
      intermediaries: DataFrame, qcStatus: DataFrame,
      comments: DataFrame): DataFrame = {
    val affected = affectedFiles(uploads, files, intermediaries)
      .select(col("UploadID"), col("FileID"))
    val qc = affected.join(qcStatus.select(col("FileID")).distinct(),
      Seq("FileID"), "left_semi")
      .groupBy(col("UploadID")).agg(count(lit(1)).as("n_qc"))
    val cm = affected.join(comments.select(col("FileID")).distinct(),
      Seq("FileID"), "left_semi")
      .groupBy(col("UploadID")).agg(count(lit(1)).as("n_comments"))
    uploads.select(col("UploadID"), col("TarchiveID"))
      .join(qc, Seq("UploadID"), "left")
      .join(cm, Seq("UploadID"), "left")
      .withColumn("n_qc", coalesce(col("n_qc"), lit(0L)))
      .withColumn("n_comments", coalesce(col("n_comments"), lit(0L)))
      .withColumn("deletable", col("n_qc") === 0 && col("n_comments") === 0)
  }

  /** Archive files (direct) + intermediary outputs, tagged per upload. */
  private def affectedFiles(uploads: DataFrame, files: DataFrame,
      intermediaries: DataFrame): DataFrame = {
    val direct = uploads.select(col("UploadID"), col("TarchiveID"))
      .join(files.select(col("FileID"), col("File"),
        col("TarchiveSource").as("TarchiveID")), Seq("TarchiveID"))
      .select(col("UploadID"), col("FileID"), col("File"))
    val outputs = direct.select(col("UploadID"),
      col("FileID").as("SourceFileID"))
      .join(files.select(col("FileID"), col("File"), col("SourceFileID")),
        Seq("SourceFileID"))
      .join(intermediaries.select(col("Output_FileID").as("FileID"))
        .distinct(), Seq("FileID"), "left_semi")
      .select(col("UploadID"), col("FileID"), col("File"))
    direct.unionByName(outputs)
  }

  private def fullPath(file: org.apache.spark.sql.Column, dataDir: String) =
    when(file.startsWith("/"), file)
      .otherwise(concat(lit(dataDir + "/"), file))

  /** The delete/backup manifest: one row per (upload, table, row id) with
    * the file each row points at, for DELETABLE uploads only.
    * Columns: UploadID, table_name, row_id, FileID, full_path. */
  def footprint(uploads: DataFrame, files: DataFrame,
      intermediaries: DataFrame, parameterFile: DataFrame,
      violatedScans: DataFrame, violationsLog: DataFrame,
      candidateErrors: DataFrame, qcStatus: DataFrame, comments: DataFrame,
      dataDir: String): DataFrame = {
    val ok = qcGate(uploads, files, intermediaries, qcStatus, comments)
      .filter(col("deletable"))
      .select(col("UploadID"), col("TarchiveID"))

    val archFiles = ok
      .join(files.select(col("FileID"), col("File"),
        col("TarchiveSource").as("TarchiveID")), Seq("TarchiveID"))
    val fileRows = archFiles.select(col("UploadID"),
      lit("files").as("table_name"), col("FileID").as("row_id"),
      col("FileID"), fullPath(col("File"), dataDir).as("full_path"))

    // outputs tied through files_intermediary: one row PER intermediary
    // entry (duplicate Output_FileID => duplicate file rows, reference's
    // own documented behavior)
    val intermedRows = archFiles
      .select(col("UploadID"), col("FileID").as("SourceFileID"))
      .join(files.select(col("FileID"), col("File"), col("SourceFileID")),
        Seq("SourceFileID"))
      .join(intermediaries.select(col("IntermedID"),
        col("Output_FileID").as("FileID")), Seq("FileID"))
      .select(col("UploadID"), lit("files_intermediary").as("table_name"),
        col("IntermedID").as("row_id"), col("FileID"),
        fullPath(col("File"), dataDir).as("full_path"))

    // parameter_file: direct archive files UNION SourceFileID-derived
    // files (getParameterFilesRef's two-branch UNION)
    val derivedFiles = archFiles
      .select(col("UploadID"), col("FileID").as("SourceFileID"))
      .join(files.select(col("FileID"), col("SourceFileID")),
        Seq("SourceFileID"))
      .select(col("UploadID"), col("FileID"))
    val paramTargets = archFiles.select(col("UploadID"), col("FileID"))
      .unionByName(derivedFiles).distinct()
    val paramRows = paramTargets
      .join(parameterFile.select(col("ParameterFileID"), col("FileID"),
        col("Value")), Seq("FileID"))
      .select(col("UploadID"), lit("parameter_file").as("table_name"),
        col("ParameterFileID").as("row_id"), col("FileID"),
        fullPath(col("Value"), dataDir).as("full_path"))

    def violationRows(t: DataFrame, name: String, idCol: String,
        pathCol: String) = ok
      .join(t.select(col(idCol).as("row_id"), col("TarchiveID"),
        col(pathCol).as("__p")), Seq("TarchiveID"))
      .select(col("UploadID"), lit(name).as("table_name"), col("row_id"),
        lit(null).cast("long").as("FileID"),
        fullPath(col("__p"), dataDir).as("full_path"))

    fileRows
      .unionByName(intermedRows)
      .unionByName(paramRows)
      .unionByName(violationRows(violatedScans,
        "mri_protocol_violated_scans", "ID", "minc_location"))
      .unionByName(violationRows(violationsLog,
        "mri_violations_log", "LogID", "MincFile"))
      .unionByName(violationRows(candidateErrors,
        "MRICandidateErrors", "ID", "MincFile"))
  }
}
