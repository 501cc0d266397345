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
}
