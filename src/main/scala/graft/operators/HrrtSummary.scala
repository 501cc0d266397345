package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.expressions.Blake2b

/** HRRT PET archive summarization (SURVEY.md §2.1 HRRT vertical): the
  * batch dataflow form of `uploadNeuroDB/NeuroDB/HRRT.pm` — the PET twin
  * of [[DicomSummary]]'s tarchive path.
  *
  * Semantics preserved:
  *  - study info comes from the FIRST ECAT file in sorted file order
  *    (`HRRT.pm:257-283` `determine_study_info` over the sorted
  *    `hrrt_content_list`), expressed as one `min_by(struct)` — no
  *    driver-side loop;
  *  - `EcatFileCount` / `NonEcatFileCount` mirror `ecat_count` /
  *    `nonecat_count` (`HRRT.pm:85-87`);
  *  - acquisition date = `scan_start_time` → `%Y-%m-%d` and the
  *    year-partitioned target dir (`HRRT.pm:264-271, 98`);
  *  - manufacturer/model hardcoded Siemens/HRRT (`HRRT.pm:278-280`);
  *  - `Blake2bArchive` dedup guard: an archive whose hash already exists
  *    in `hrrt_archive` is rejected (`HRRT.pm:344-361`), the J7 anti-join;
  *  - per-file rows (Filename, Blake2bHash) mirror `hrrt_archive_files`
  *    (`HRRT.pm:398-408`).
  *
  * The reference hashes the single uploaded tarball; a distributed scan
  * has no tarball, so `Blake2bArchive` is the blake2b of the comma-joined
  * SORTED per-ECAT-file blake2b hashes — content-equivalent identity, the
  * same discipline as [[DicomSummary]]'s `md5sumDicomOnly`.
  *
  * Scale posture: everything is per-archive groupBy — millions of HRRT
  * studies parallelize by the archive key with one shuffle; the dedup
  * guard is a broadcast-able anti-join against the (small) catalog of
  * archive hashes.
  */
object HrrtSummary {

  /** `hrrt_archive`: one summary row per archive (groupCol). Input is
    * [[graft.sources.EcatReader.files]] plus an archive grouping column. */
  def archive(files: DataFrame, groupCol: String = "archive"): DataFrame = {
    // counts are extension-based like grep_ecat_files_only; study info
    // and hashes come from PARSED headers only, and ParseFailedCount
    // surfaces the difference (the scanAudit discipline)
    val ecat = files.filter(col("is_ecat") && !col("parse_failed"))
    val counts = files.groupBy(col(groupCol))
      .agg(
        sum(col("is_ecat").cast("int")).cast("int").as("EcatFileCount"),
        sum((!col("is_ecat")).cast("int")).cast("int").as("NonEcatFileCount"),
        sum(col("parse_failed").cast("int")).cast("int")
          .as("ParseFailedCount"))
    val study = ecat.groupBy(col(groupCol))
      .agg(
        min_by(
          struct(col("patient_name"), col("patient_id"),
            col("facility_name"), col("system_type"),
            col("scan_start_time")),
          col("file_path")).as("first"),
        // blake2b over the sorted per-file hashes (see scaladoc)
        Blake2b.blake2b(
          concat_ws(",", array_sort(collect_list(col("blake2b_hash")))))
          .as("Blake2bArchive"))
    // LEFT join: an upload with zero ECAT files still surfaces as a row
    // (null study info, EcatFileCount=0) instead of vanishing — the
    // reference would die in determine_study_info; the batch form keeps
    // the countable-audit discipline (see CtfReader.scanAudit)
    counts.join(study, Seq(groupCol), "left")
      .select(
        col(groupCol),
        col("first.patient_name").as("PatientName"),
        col("first.patient_id").as("PatientID"),
        col("first.facility_name").as("CenterName"),
        col("first.system_type").as("SystemType"),
        date_format(
          timestamp_seconds(col("first.scan_start_time")), "yyyy-MM-dd")
          .as("DateAcquired"),
        date_format(
          timestamp_seconds(col("first.scan_start_time")), "yyyy")
          .as("YearAcquired"),
        lit("Siemens").as("Manufacturer"),
        lit("HRRT").as("ScannerModel"),
        col("EcatFileCount"), col("NonEcatFileCount"),
        col("ParseFailedCount"), col("Blake2bArchive"))
  }

  /** `hrrt_archive_files`: one row per parsed ECAT file with its blake2b
    * hash. */
  def archiveFiles(files: DataFrame, groupCol: String = "archive"): DataFrame =
    files.filter(col("is_ecat") && !col("parse_failed"))
      .select(col(groupCol), col("file_name").as("Filename"),
        col("blake2b_hash").as("Blake2bHash"))

  /** The `HRRT.pm:344-361` already-archived rejection as a set operation:
    * candidates whose `Blake2bArchive` is present in the existing catalog
    * are dropped (left_anti; broadcast — the hash catalog is one short row
    * per archived study). */
  def guardNewArchives(candidates: DataFrame, existing: DataFrame): DataFrame =
    candidates.join(
      broadcast(existing.select(col("Blake2bArchive").as("existing_hash"))),
      candidates("Blake2bArchive") === col("existing_hash"), "left_anti")
}
