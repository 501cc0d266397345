package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Defacing pipeline planning — `tools/run_defacing_script.pl` (and its
  * batch driver `tools/batch_run_defacing_script.pl`) re-expressed as one
  * set-oriented plan over ALL sessions instead of one process per session.
  *
  * The defacing algorithm itself (`deface_minipipe.pl`, a MINC tool chain)
  * is explicitly out of scope — like the SNR estimator in
  * [[Maintenance.backpopulateSnr]], the operator owns the parts whose
  * semantics live in the reference script: acquisition selection
  * (`grep_FileIDs_to_deface:320-390`), the per-session already-defaced
  * skip (`check_if_deface_files_already_in_db:437-461`), the t1 reference
  * pick (`grep_t1_ref_file:478-496`), output naming
  * (`determine_output_dir_and_basename:517-537`,
  * `fetch_defaced_files:614-645`) and the registration plan
  * (`register_defaced_files:658-690` — the rows here feed
  * [[ProcessedRegistration]] with sourcePipeline=MINC_deface exactly as
  * the script shells out to `register_processed_data.pl`).
  *
  * Fidelity notes:
  *  - The t1 reference is the FIRST FileID by PERL STRING SORT
  *    (`sort(keys %t1_files)` — so FileID 1001 wins over 999); kept,
  *    documented, and pinned by the spec.
  *  - Special acquisitions (fieldmap, MP2RAGE inversions, qT2star echoes)
  *    are gated by a LIKE filter on the `acquisition:image_type`
  *    parameter — pattern-as-data, a residual on the hash join.
  *  - A session with any `<type>-defaced` file already registered is
  *    skipped WHOLE (the script's early `next`); a session whose
  *    selection has no reference-t1 row cannot name its outputs — the
  *    script would die on an undefined basename; batch form reports
  *    `no_t1_reference` instead of crashing the whole sweep.
  *  - Output rows for skipped sessions keep their selection fields but
  *    null the defacing plan (same masking discipline as
  *    [[TarchiveValidation]]).
  *
  * Scale: scan-type/parameter-type dictionaries broadcast; the selection
  * is one hash-join chain on FileID. Per-session work (skip bit, ref
  * pick) is keyed aggregation + one window partitioned BY SESSION — the
  * problem's own key, each partition is one session's handful of
  * anatomical scans. No driver-side loops; a million-session sweep is a
  * few exchanges on SessionID.
  */
object Defacing {

  /** `grep_FileIDs_to_deface`: acquisitions eligible for defacing.
    *
    * @param files          (FileID, SessionID, MriScanTypeID, File)
    * @param scanTypes      (MriScanTypeID, MriScanTypeName)
    * @param paramFile      (FileID, ParameterTypeID, Value)
    * @param paramType      (ParameterTypeID, Name)
    * @param modalities     scan types to deface (`-modalities` /
    *                       config `modalities_to_deface`)
    * @param specialFilters special-modality key → LIKE pattern over the
    *                       `acquisition:image_type` value (the
    *                       %SPECIAL_ACQUISITIONS_FILTER table); a modality
    *                       is special when it REGEX-matches a key (the
    *                       script's `grep(/$special/, @modalities)`)
    * @param sessionIds     optional `-sessionIDs` restriction
    */
  def selectFiles(files: DataFrame, scanTypes: DataFrame,
                  paramFile: DataFrame, paramType: DataFrame,
                  modalities: Seq[String],
                  specialFilters: Map[String, String],
                  sessionIds: Option[Seq[Long]] = None): DataFrame = {
    val (special, standard) = modalities.partition(m =>
      specialFilters.keys.exists(k => k.r.findFirstIn(m).isDefined))
    val imageTypeParam = paramType
      .filter(col("Name") === "acquisition:image_type")
      .select(col("ParameterTypeID"))
    val withType = files
      .join(broadcast(scanTypes), Seq("MriScanTypeID"))
      .join(paramFile.join(broadcast(imageTypeParam), Seq("ParameterTypeID"))
        .select(col("FileID"), col("Value").as("image_type")), Seq("FileID"))
    val standardCond: Column =
      if (standard.isEmpty) lit(false)
      else col("MriScanTypeName").isin(standard: _*)
    val specialCond: Column = special.foldLeft(lit(false)) { (acc, m) =>
      val pattern = specialFilters.collectFirst {
        case (k, v) if k.r.findFirstIn(m).isDefined => v
      }.get
      acc || (col("MriScanTypeName") === m && col("image_type").like(pattern))
    }
    val gated = withType.filter(standardCond || specialCond)
    sessionIds.fold(gated)(ids => gated.filter(col("SessionID").isin(ids: _*)))
      .select(col("SessionID"), col("FileID"),
        col("MriScanTypeName").as("ScanType"), col("File"))
  }

  /** The composed per-session plan: skip bit, t1 reference, output names,
    * registration-ready rows.
    *
    * @param selected   output of [[selectFiles]]
    * @param files      full catalog (FileID, SessionID, MriScanTypeID)
    * @param scanTypes  (MriScanTypeID, MriScanTypeName)
    * @param sessions   (ID, CandidateID, Visit_label)
    * @param candidates (ID, CandID)
    * @param refT1Type  config `reference_t1_scan_type` (default t1w)
    * @param rootDir    output root (the script's tempdir stand-in)
    */
  def planDefacing(selected: DataFrame, files: DataFrame,
                   scanTypes: DataFrame, sessions: DataFrame,
                   candidates: DataFrame, refT1Type: String = "t1w",
                   rootDir: String = "deface"): DataFrame = {
    // session → scan types present in its selection
    val sessionTypes = selected.groupBy(col("SessionID"))
      .agg(collect_set(col("ScanType")).as("__types"))
    // sessions with an already-registered '<type>-defaced' file
    val defacedInDb = files
      .join(broadcast(scanTypes.filter(col("MriScanTypeName")
        .endsWith("-defaced"))), Seq("MriScanTypeID"))
      .select(col("SessionID").as("__d_sid"),
        regexp_replace(col("MriScanTypeName"), "-defaced$", "")
          .as("__d_base"))
    val skipSessions = sessionTypes
      .join(defacedInDb, col("SessionID") === col("__d_sid") &&
        array_contains(col("__types"), col("__d_base")), "left_semi")
      .select(col("SessionID").as("__skip_sid"))
    // Perl string-sorted first t1: FileID CAST TO STRING (quirk kept)
    val withRef = selected
      .withColumn("__t1_rank",
        when(col("ScanType") === refT1Type,
          row_number().over(Window.partitionBy(col("SessionID"))
            .orderBy(when(col("ScanType") === refT1Type, 0).otherwise(1),
              col("FileID").cast("string")))))
      .withColumn("role",
        when(col("ScanType") === refT1Type && col("__t1_rank") === 1, "ref")
          .otherwise("other"))
    val hasRef = selected.filter(col("ScanType") === refT1Type)
      .select(col("SessionID")).distinct()
      .withColumn("__has_ref", lit(true))
    val named = withRef
      .join(broadcast(sessions.select(col("ID").as("SessionID"),
        col("CandidateID"), col("Visit_label"))), Seq("SessionID"))
      .join(broadcast(candidates.select(col("ID").as("CandidateID"),
        col("CandID"))), Seq("CandidateID"))
      .join(broadcast(skipSessions),
        col("SessionID") === col("__skip_sid"), "left")
      .join(broadcast(hasRef), Seq("SessionID"), "left")
      .withColumn("status",
        when(col("__skip_sid").isNotNull, "skip_already_defaced")
          .when(col("__has_ref").isNull, "no_t1_reference")
          .otherwise("deface"))
    // fetch_defaced_files naming: root/CandID/visit/<base>_defaced.mnc
    val base = element_at(split(col("File"), "/"), -1)
    val defacedPath = concat(lit(rootDir + "/"), col("CandID"), lit("/"),
      col("Visit_label"), lit("/"),
      regexp_replace(base, "\\.mnc$", "_defaced.mnc"))
    val active = col("status") === "deface"
    named.select(
      col("SessionID").as("session_id"), col("CandID").as("cand_id"),
      col("Visit_label").as("visit_label"), col("FileID").as("file_id"),
      col("ScanType").as("scan_type"),
      when(active, col("role")).as("role"),
      col("status"),
      when(active, concat(col("ScanType"), lit("-defaced")))
        .as("defaced_scan_type"),
      when(active, defacedPath).as("defaced_path"),
      when(active, lit("MINC_deface")).as("source_pipeline"),
      when(active, lit("defaced")).as("output_type"),
      when(active, lit("native")).as("coordinate_space"),
      when(active, col("FileID")).as("source_file_id"))
  }

  /** `create_defaced_scan_type`: which '-defaced' scan types the plan
    * needs that are not yet in `mri_scan_type` (the get-or-create set). */
  def newScanTypes(plan: DataFrame, scanTypes: DataFrame): DataFrame =
    plan.filter(col("defaced_scan_type").isNotNull)
      .select(col("defaced_scan_type")).distinct()
      .join(scanTypes.select(
        col("MriScanTypeName").as("defaced_scan_type")),
        Seq("defaced_scan_type"), "left_anti")
}
