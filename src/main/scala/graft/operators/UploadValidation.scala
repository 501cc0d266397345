package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `imaging_upload_file.pl`'s candidate-info validation —
  * `NeuroDB/ImagingUpload.pm IsCandidateInfoValid (:153-340)` — over a
  * BATCH of uploads, with the DICOM patient-name extraction done by the
  * REAL header walker instead of shelling `dcmdump +P` per file.
  *
  * The ladder, in the reference's order:
  *  1. unknown UploadID → invalid (`upload_not_found`);
  *  2. already-run guard: TarchiveID set OR number_of_mincCreated > 0 →
  *     invalid (`already_inserted`; the reference prints the resume
  *     command);
  *  3. file classification: DICOM images by magic; any `.v` ECAT file
  *     flips the upload to the HRRT path; non-DICOM files are WARNED and
  *     IGNORED (counted, never fatal) on the DICOM path;
  *  4. patient-name match per image: non-phantom files must match
  *     `^<PatientName>` on the configured header field
  *     (lookupCenterNameUsing ∈ {PatientName, PatientID}); phantom
  *     uploads must match `(lego|living)` phantom regexes; HRRT matches
  *     the FILENAME (dashes folded to underscores, case-insensitive)
  *     with the exclude list of label-less files
  *     (`HrrtPatientNameMatch:655-668`);
  *  5. any unmatched file → invalid (`patient_name_mismatch` + count);
  *     else `IsCandidateInfoValidated = 1`.
  *
  * Scale: the file scan is the binaryFile source (headers only — the
  * DICOM walk stops at group 0x0020); per-upload verdicts are one keyed
  * aggregation over (upload, file) rows. The uploads table broadcasts.
  */
object UploadValidation {

  private val HrrtExclude =
    "(?i)blank|phantom|temp|test|tar|noisytx|script|ini|directnorm|" +
      "up_mask|To_Archive|mask_input"

  /** @param uploads (UploadID, PatientName, TarchiveID nullable,
    *                number_of_mincCreated nullable, IsPhantom 'Y'/'N')
    * @param files   scanned upload files: (upload_id, file_path,
    *                is_dicom, header_pname, header_pid) — the DicomSource
    *                vertical's output mapped per upload; header_* NULL
    *                for non-DICOM files
    * @param lookupCenterNameUsing config: PatientName | PatientID
    * @param phantomRegex the combined `(lego)|(living)` phantom regex
    */
  def isCandidateInfoValid(uploads: DataFrame, files: DataFrame,
                           lookupCenterNameUsing: String = "PatientName",
                           phantomRegex: String = "(?i)phantom"): DataFrame = {
    require(lookupCenterNameUsing.matches("(?i)PatientName|PatientID"),
      s"lookupCenterNameUsing must be PatientName or PatientID, " +
        s"got $lookupCenterNameUsing") // BAD_CONFIG_SETTING exit
    val headerField =
      if (lookupCenterNameUsing.equalsIgnoreCase("PatientID"))
        col("header_pid")
      else col("header_pname")
    val base = element_at(split(col("file_path"), "/"), -1)
    val isEcat = lower(col("file_path")).endsWith(".v")
    // per-file match verdicts against the owning upload's expectations
    val joined = files.join(
      uploads.select(col("UploadID").as("upload_id"),
        col("PatientName").as("__pname"), col("TarchiveID").as("__tid"),
        col("number_of_mincCreated").as("__n_minc"),
        col("IsPhantom").as("__phantom")),
      Seq("upload_id"), "right")
    val perFile = joined
      .withColumn("__is_ecat", coalesce(isEcat, lit(false)))
      .withColumn("__dicom_match",
        when(!col("is_dicom"), lit(null).cast("boolean"))
          .when(col("__phantom") === "Y",
            regexp_like(coalesce(headerField, lit("")), lit(phantomRegex)))
          .otherwise(regexp_like(coalesce(headerField, lit("")),
            concat(lit("^"), col("__pname")))))
      .withColumn("__hrrt_match",
        regexp_like(base, lit(HrrtExclude)) ||
          regexp_like(regexp_replace(base, "-", "_"),
            concat(lit("(?i)"), col("__pname"))))
    val verdicts = perFile.groupBy(col("upload_id"), col("__pname"),
        col("__tid"), col("__n_minc"), col("__phantom"))
      .agg(
        count(col("file_path")).as("n_files"),
        sum(when(col("__is_ecat"), 1).otherwise(0)).as("n_ecat"),
        sum(when(col("is_dicom") === false && !col("__is_ecat"), 1)
          .otherwise(0)).as("n_non_dicom"),
        // DICOM-path mismatches (only counted when NOT hrrt)
        sum(when(col("is_dicom") && !col("__dicom_match"), 1).otherwise(0))
          .as("__dicom_misses"),
        // HRRT-path mismatches: EVERY file's name is checked (:296-300)
        sum(when(col("file_path").isNotNull && !col("__hrrt_match"), 1)
          .otherwise(0)).as("__hrrt_misses"))
    val status =
      when(col("__pname").isNull, "upload_not_found")
        .when(col("__tid").isNotNull ||
          coalesce(col("__n_minc"), lit(0L)) > 0, "already_inserted")
        .when(col("n_unmatched") > 0, "patient_name_mismatch")
        .otherwise("validated")
    // the script returns before classifying files on the first two
    // statuses — classification fields are nulled there (exit-order
    // masking, the TarchiveValidation discipline)
    val classified = !status.isin("upload_not_found", "already_inserted")
    verdicts
      .withColumn("is_hrrt", col("n_ecat") > 0)
      .withColumn("n_unmatched",
        when(col("is_hrrt"), col("__hrrt_misses"))
          .otherwise(col("__dicom_misses")))
      .select(
        col("upload_id"),
        status.as("status"),
        when(classified, col("is_hrrt")).as("is_hrrt"),
        when(classified, col("n_files")).as("n_files"),
        when(classified && !col("is_hrrt"), col("n_non_dicom"))
          .as("n_non_dicom_ignored"),
        when(classified, col("n_unmatched")).as("n_unmatched"),
        (status === "validated").as("is_candidate_info_validated"))
  }
}
