package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch imaging-upload intake (SURVEY.md §2 — the
  * `uploadNeuroDB/batch_uploads_imageuploader.pl` front door): one line
  * per upload (`full_path phantom patient_name`), validated like the
  * LORIS Imaging Uploader, then `mri_upload` rows with continued ids and
  * the pipeline command each row would launch.
  *
  * Reference semantics preserved, quirks included:
  *  - the "extension" is everything from the FIRST dot of the basename
  *    (`fileparse($fullpath, qr{\..*})`, `:208`), so `a.b.tgz` has type
  *    `.b.tgz` and is REJECTED even though it ends in `.tgz`; allowed
  *    types are exactly `.tgz`, `.tar.gz`, `.zip` (`:209-213`) →
  *    `file_type_check_failure`;
  *  - the phantom flag must be `Y` or `N` (`:214-218`) →
  *    `phantom_entry_failure`;
  *  - non-phantom rows require the patient name to be a PREFIX of the
  *    basename (`substr($base, 0, length($patientname))`, `:219-226`);
  *    a missing name stringifies to `''` and passes trivially, exactly
  *    as Perl's `undef` does → `pname_filename_mismatch`;
  *  - phantom rows must have a BLANK name (`:228-233`), which is then
  *    stored as the literal string `'NULL'` (`:235`, the script inserts
  *    the four-character word, not SQL NULL);
  *  - surviving rows get `mri_upload` entries in line order
  *    (`insertIntoMRIUpload`, `:304-330`) and launch
  *    `imaging_upload_file.pl -profile P -upload_id ID PATH` (`:249-254`).
  *
  * Scale posture: pure map-side validation; the only exchange is the
  * range-sort ordinal over accepted rows (id continuation from a
  * broadcast 1-row max aggregate).
  */
object BatchUploader {

  /** @param lines   (line_no, full_path, phantom, patient_name nullable)
    * @param uploads existing mri_upload (UploadID)
    * @param user    UploadedBy value (the script's `getpwuid`)
    * @param profile -profile argument for the launched command */
  def intake(lines: DataFrame, uploads: DataFrame, user: String,
      profile: String): DataFrame = {
    val base0 = element_at(split(col("full_path"), "/"), -1)
    val typed = lines
      .withColumn("__type", regexp_extract(base0, "(\\..*)$", 1))
      .withColumn("__base", expr(
        "substring(element_at(split(full_path, '/'), -1), 1," +
          " length(element_at(split(full_path, '/'), -1)) - length(__type))"))
      .withColumn("__pname", coalesce(col("patient_name"), lit("")))
      .withColumn("status",
        when(!col("__type").isin(".tgz", ".tar.gz", ".zip"),
          "file_type_check_failure")
          .when(!col("phantom").isin("Y", "N"), "phantom_entry_failure")
          .when(col("phantom") === "N" &&
            expr("left(__base, length(__pname)) != __pname"),
            "pname_filename_mismatch")
          .when(col("phantom") === "Y" && col("__pname") =!= "",
            "pname_filename_mismatch")
          .otherwise("submitted"))
    val maxId = uploads
      .agg(coalesce(max(col("UploadID")), lit(0L)).cast("long").as("__maxu"))
    val ok = graft.functions.Ordinals.withGlobalOrdinal(
      typed.filter(col("status") === "submitted"),
      Seq(col("line_no")), "__ord")
      .crossJoin(broadcast(maxId))
      .withColumn("UploadID", col("__maxu") + col("__ord"))
      .drop("__maxu")
    val rejected = typed.filter(col("status") =!= "submitted")
      .withColumn("__ord", lit(null).cast("long"))
      .withColumn("UploadID", lit(null).cast("long"))
    ok.unionByName(rejected)
      .select(col("line_no"), col("full_path").as("UploadLocation"),
        col("status"), col("UploadID"),
        when(col("status") =!= "submitted", lit(null).cast("string"))
          .when(col("phantom") === "Y", "NULL") // the script's literal
          .otherwise(col("__pname")).as("PatientName"),
        when(col("status") === "submitted", col("phantom"))
          .as("IsPhantom"),
        when(col("status") === "submitted",
          concat(lit("imaging_upload_file.pl -profile "), lit(profile),
            lit(" -upload_id "), col("UploadID"), lit(" "),
            col("full_path"))).as("command"),
        when(col("status") === "submitted", lit(user)).as("UploadedBy"))
  }

  /** `uploadNeuroDB/batch_uploads_tarchive.pl:219-270` — the tarchive
    * batch driver's line intake and command plan.
    *
    * Per stdin line `<ArchiveLocation> <UploadID>` (split on whitespace):
    * the library-dir prefix is stripped with an UNANCHORED global replace
    * (`s/$tarchiveLibraryDir//` — mid-path occurrences strip too, the
    * q127 quirk family), and the command is converter-dispatched:
    * `tarchiveLoader.pl` when the converter matches /dcm2mnc/i,
    * `run_dicom_archive_loader.py` when /dcm2niix/i (case-insensitive
    * substring, `:243-258`). Log names are `tarstdout.log<counter>` with
    * counter = 1-based accepted-line index.
    *
    * Documented divergence: a line missing either field makes the SCRIPT
    * exit MISSING_ARG on the spot, killing the remainder of the batch;
    * set form flags the bad line (`missing_arg`) and still plans the
    * rest — aborting a million-line batch on line 3 is the per-row
    * mindset this library replaces.
    *
    * Map-side except the accepted-line ordinal (the q121 discipline).
    */
  def batchTarchiveCommands(lines: DataFrame, libraryDir: String,
      profile: String, converter: String, isQsub: Boolean,
      dataDir: String): DataFrame = {
    val dir = libraryDir.stripSuffix("/")
    val parts = split(trim(col("line")), "\\s+")
    val parsed = lines
      .withColumn("__arch0", get(parts, lit(0))) // null OOB under ANSI
      .withColumn("__arch", regexp_replace(
        regexp_replace(col("__arch0"), java.util.regex.Pattern.quote(dir + "/"), ""),
        java.util.regex.Pattern.quote(dir), ""))
      .withColumn("__uid", get(parts, lit(1)))
      .withColumn("status",
        when(col("__arch").isNull || col("__arch") === "" ||
          col("__uid").isNull || col("__uid") === "", "missing_arg")
          .otherwise("submitted"))
    val counted = graft.functions.Ordinals.withGlobalOrdinal(
      parsed.filter(col("status") === "submitted"),
      Seq(col("line_no")), "__ctr")
      .unionByName(parsed.filter(col("status") =!= "submitted")
        .withColumn("__ctr", lit(null).cast("long")))
    val tarchivePath = concat(lit(dir + "/"), col("__arch"))
    val command =
      if (converter.toLowerCase.contains("dcm2mnc"))
        concat(lit(s"tarchiveLoader.pl -profile $profile -uploadID "),
          col("__uid"), lit(" "), tarchivePath)
      else if (converter.toLowerCase.contains("dcm2niix"))
        concat(lit("run_dicom_archive_loader.py -p python_config -t "),
          tarchivePath)
      else lit(null).cast("string")
    counted.select(
      col("line_no"),
      col("__arch").as("archive_location"),
      col("__uid").as("upload_id"),
      col("status"),
      when(col("status") === "submitted", command).as("command"),
      when(col("status") === "submitted",
        concat(lit(s"$dataDir/batch_output/tarstdout.log"), col("__ctr")))
        .as("stdout_log"),
      when(col("status") === "submitted",
        concat(lit(s"$dataDir/batch_output/tarstderr.log"), col("__ctr")))
        .as("stderr_log"),
      when(col("status") === "submitted", lit(isQsub)).as("queued_via_qsub"))
  }

  /** Perl `quotemeta`: backslash-escape every non-word character. */
  private def quoteMeta(c: org.apache.spark.sql.Column) =
    regexp_replace(c, "([^A-Za-z0-9_])", "\\\\$1")

  /** `tools/batch_run_pipeline_qc_face_script.pl:175-205` — the deface-QC
    * 3D-rendering batch driver.
    *
    * Per stdin line (one MINC path each, no validation in the script):
    * counter-indexed `defaceqcstdout.log<N>` / `defaceqcstderr.log<N>`
    * under `<dataDir>/batch_output`, output JPEG =
    * `<outBasedir>/<basename minus .mnc>.jpg`, and the command
    * `pipeline_qc_face.pl <quotemeta in> <quotemeta out>` — Perl
    * `quotemeta` escapes preserved. qsub mode wraps with the
    * `process_qc_deface_<N>` job name.
    *
    * Pure map-side except the line-order counter ordinal. */
  def qcFaceCommands(lines: DataFrame, dataDir: String, outBasedir: String,
      isQsub: Boolean): DataFrame = {
    val base = element_at(split(col("file_in"), "/"), -1)
    val out = concat(lit(outBasedir.stripSuffix("/") + "/"),
      regexp_replace(base, "\\.mnc$", ""), lit(".jpg"))
    graft.functions.Ordinals.withGlobalOrdinal(lines,
        Seq(col("line_no")), "__ctr")
      .select(
        col("line_no"),
        col("file_in"),
        out.as("file_out"),
        concat(lit("pipeline_qc_face.pl "), quoteMeta(col("file_in")),
          lit(" "), quoteMeta(out)).as("command"),
        concat(lit(s"$dataDir/batch_output/defaceqcstdout.log"),
          col("__ctr")).as("stdout_log"),
        concat(lit(s"$dataDir/batch_output/defaceqcstderr.log"),
          col("__ctr")).as("stderr_log"),
        when(lit(isQsub),
          concat(lit("process_qc_deface_"), col("__ctr")))
          .as("qsub_job_name"))
  }
}
