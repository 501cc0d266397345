package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The electrophysiology-uploader pipeline pair —
  * `python/scripts/extract_eeg_bids_archive.py:22-235` and
  * `python/scripts/ingest_eeg_bids_datasets.py:16-188` — as set-oriented
  * plans over a BATCH of uploads (the scripts loop one upload at a time).
  *
  * Both scripts are state-machine steps over
  * `electrophysiology_uploader.Status`:
  * `Not Started → (extract) → Extracted → (ingest) → Complete`, with
  * `Failed Extraction` / `Failed` branches. The extraction walk, BIDS
  * structure checks, destination naming and the previous-upload purge are
  * the script-owned semantics modeled here; the external boundaries are
  * the archive inflation side effects and `import-bids-dataset` itself
  * (whose catalog effects are the q113/q102 EEGLAB vertical).
  *
  * Fidelity notes (extract):
  *  - the session dir is ANY dir whose basename starts with `ses-`; the
  *    session-relative path is the regex `sub-.+$` capture on that dir's
  *    path — a ses- dir outside a sub- tree is the script's
  *    "no subject folder" error;
  *  - `.set` files in each modality dir are counted for the internal
  *    path-info rewrite (`update_set_file_path_info`), with the `.fdt`
  *    sibling's presence recorded — the MAT rewrite itself rides the
  *    EEGLAB vertical's codec boundary;
  *  - the destination modality dir is DELETED before copy (re-upload
  *    semantics) — emitted as `replaces_existing`.
  *
  * Fidelity notes (ingest):
  *  - BIDS subject resolution tries `sub-<CandID>` EXACTLY, then
  *    `sub-<PSCID>` CASE-INSENSITIVELY against the directory listing
  *    (`os.listdir` order is unspecified — pinned to the
  *    lexicographically smallest match, documented divergence);
  *  - a missing session row is the script's hard exit (INVALID_ARG);
  *    missing subject/visit dirs are per-upload skips;
  *  - ALL previous physiological files of the session are deleted before
  *    re-ingestion — the n_previous_files column is the
  *    [[PhysioDelete]] batch for the survivors.
  *
  * Scale: uploads join dictionary-sized catalogs broadcast; the archive
  * walk is the member table of the S12 source (one row per entry, no
  * inflation on the driver). Directory listings are data
  * (`bidsDirs`/member paths), so every existence probe the scripts do
  * with the filesystem becomes a hash join.
  */
object EegBidsUploads {

  /** Extraction plan for `Status = 'Not Started'` uploads.
    *
    * @param uploads        (UploadID, UploadLocation, Status)
    * @param archiveMembers member rows of the incoming dir's archives:
    *                       (archive_path, member_path, is_dir) — the
    *                       TarGzSource.members shape
    * @return one row per (upload, modality) — or one error row per upload
    */
  def planExtraction(uploads: DataFrame, archiveMembers: DataFrame): DataFrame = {
    val pending = uploads.filter(col("Status") === "Not Started")
      .select(col("UploadID").as("upload_id"),
        col("UploadLocation").as("upload_location"))
    val members = archiveMembers.select(
      element_at(split(col("archive_path"), "/"), -1).as("upload_location"),
      col("member_path"), col("is_dir"))
    // ses- dirs with their sub-relative path (NULL capture = no sub- tree)
    val sesDirs = members
      .filter(col("is_dir") &&
        element_at(split(regexp_replace(col("member_path"), "/$", ""), "/"),
          -1).startsWith("ses-"))
      .select(col("upload_location"),
        regexp_replace(col("member_path"), "/$", "").as("ses_path"),
        nullif(regexp_extract(
          regexp_replace(col("member_path"), "/$", ""), "sub-.+$", 0),
          lit("")).as("session_rel_path"))
    // modality dirs: immediate children of a ses- dir
    val modDirs = members.filter(col("is_dir"))
      .select(col("upload_location").as("m_loc"),
        regexp_replace(col("member_path"), "/$", "").as("mod_path"))
    val mods = sesDirs.join(modDirs,
      col("m_loc") === col("upload_location") &&
        col("mod_path").startsWith(concat(col("ses_path"), lit("/"))) &&
        !col("mod_path").substr(length(col("ses_path")) + lit(2),
          lit(1000)).contains("/"))
      .withColumn("modality",
        element_at(split(col("mod_path"), "/"), -1))
    // .set files per modality dir + .fdt sibling presence
    val files = members.filter(!col("is_dir"))
      .select(col("upload_location").as("f_loc"),
        col("member_path").as("file_path"))
    val setFiles = files.filter(col("file_path").endsWith(".set"))
      .join(files.select(col("f_loc").as("fdt_loc"),
        col("file_path").as("fdt_path")),
        col("fdt_loc") === col("f_loc") &&
          col("fdt_path") === regexp_replace(col("file_path"),
            "\\.set$", ".fdt"),
        "left")
      .select(col("f_loc"), col("file_path"),
        regexp_replace(col("file_path"), "/[^/]+$", "").as("file_dir"),
        col("fdt_path").isNotNull.as("has_fdt"))
    val setCounts = setFiles.groupBy(col("f_loc"), col("file_dir"))
      .agg(count(lit(1)).as("n_set_files"),
        sum(when(col("has_fdt"), 1).otherwise(0)).as("n_with_fdt"))
    val planned = pending
      .join(mods.drop("m_loc"), Seq("upload_location"), "left")
      .join(setCounts,
        col("f_loc") === col("upload_location") &&
          col("file_dir") === col("mod_path"), "left")
      .select(col("upload_id"), col("upload_location"),
        when(col("ses_path").isNull, "failed_extraction_no_session")
          .when(col("session_rel_path").isNull,
            "failed_extraction_no_subject")
          .otherwise("extracted").as("status"),
        col("session_rel_path"), col("modality"),
        when(col("session_rel_path").isNotNull,
          concat(col("session_rel_path"), lit("/"), col("modality")))
          .as("dest_rel_path"),
        coalesce(col("n_set_files"), lit(0L)).as("n_set_files"),
        coalesce(col("n_with_fdt"), lit(0L)).as("n_set_with_fdt"))
    planned
  }

  /** Ingestion plan for `Status = 'Extracted'` uploads.
    *
    * @param uploads    (UploadID, SessionID, Status)
    * @param sessions   (ID, CandidateID, Visit_label)
    * @param candidates (ID, CandID, PSCID)
    * @param bidsDirs   the assembly_bids directory listing as data:
    *                   (dir_path) relative to the assembly root, e.g.
    *                   "sub-300001/ses-V1/eeg"
    * @param physioFiles (PhysiologicalFileID, SessionID) — previous
    *                   uploads to purge before re-ingesting
    */
  def planIngestion(uploads: DataFrame, sessions: DataFrame,
                    candidates: DataFrame, bidsDirs: DataFrame,
                    physioFiles: DataFrame): DataFrame = {
    val pending = uploads.filter(col("Status") === "Extracted")
      .select(col("UploadID").as("upload_id"),
        col("SessionID").as("session_id"))
    val sess = sessions.select(col("ID").as("session_id"),
      col("CandidateID"), col("Visit_label"))
    val cand = candidates.select(col("ID").as("CandidateID"),
      col("CandID"), col("PSCID"))
    val withIds = pending
      .join(broadcast(sess), Seq("session_id"), "left")
      .join(broadcast(cand), Seq("CandidateID"), "left")
    // top-level subject dirs from the listing
    val subjects = bidsDirs
      .select(split(col("dir_path"), "/").getItem(0).as("subject_dir"))
      .distinct()
    // sub-<CandID> exact
    val byCand = subjects.select(col("subject_dir").as("cand_dir"))
    // sub-<PSCID> case-insensitive, pinned to the smallest match
    val byPscid = subjects
      .select(col("subject_dir"), lower(col("subject_dir")).as("__lc"))
      .groupBy(col("__lc"))
      .agg(min(col("subject_dir")).as("pscid_dir"))
    val resolved = withIds
      .join(broadcast(byCand),
        col("cand_dir") === concat(lit("sub-"), col("CandID")), "left")
      .join(broadcast(byPscid),
        col("__lc") === lower(concat(lit("sub-"), col("PSCID"))), "left")
      .withColumn("subject_id", coalesce(col("cand_dir"), col("pscid_dir")))
    // visit dir existence: sub/ses-<visit> prefix present in the listing
    val sesDirs = bidsDirs
      .select(concat_ws("/", split(col("dir_path"), "/").getItem(0),
        split(col("dir_path"), "/").getItem(1)).as("ses_dir"))
      .distinct()
    val prevCounts = physioFiles
      .groupBy(col("SessionID").as("session_id"))
      .agg(count(lit(1)).as("n_previous_files"))
    resolved
      .join(broadcast(sesDirs),
        col("ses_dir") === concat(col("subject_id"), lit("/ses-"),
          col("Visit_label")), "left")
      .join(broadcast(prevCounts), Seq("session_id"), "left")
      .select(col("upload_id"), col("session_id"),
        col("CandID").as("cand_id"), col("PSCID").as("pscid"),
        col("Visit_label").as("visit_label"),
        when(col("CandidateID").isNull, "session_not_found")
          .when(col("subject_id").isNull, "no_bids_subject")
          .when(col("ses_dir").isNull, "no_bids_visit")
          .otherwise("ingest").as("status"),
        when(col("ses_dir").isNotNull, col("subject_id")).as("subject_id"),
        when(col("ses_dir").isNotNull,
          concat(col("subject_id"), lit("/ses-"), col("Visit_label"),
            lit("/eeg"))).as("eeg_path"),
        when(col("ses_dir").isNotNull,
          coalesce(col("n_previous_files"), lit(0L)))
          .as("n_previous_files"))
  }
}
