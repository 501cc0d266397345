package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Processed-data registration (SURVEY.md §2 J8/J10 composition): the batch
  * dataflow form of `uploadNeuroDB/register_processed_data.pl` /
  * `DTIPrep/DTIPrepRegister.pl` — registering pipeline OUTPUTS (QCed DTI,
  * RGB maps, QC reports) into the same `files` catalog as their raw
  * sources, with lineage.
  *
  * Reference semantics preserved, re-expressed as per-row dataflow (the
  * script aborts per file; a set-oriented engine carries a status column):
  *  - `-sourceFileID` must exist in `files`
  *    (`register_processed_data.pl:160-165`) → `missing_source`;
  *  - every `-inputFileIDs` entry must exist (`:169-175`) →
  *    `missing_input`;
  *  - SessionID and (non-minc path) ScannerID are INHERITED from the
  *    source file (`getSessionID:398-441`, `getScannerID:443-477`) — the
  *    J8 self-join lineage;
  *  - `-scanType` resolves through `mri_scan_type` (`getAcqProtID:478-511`)
  *    → `unknown_scan_type`;
  *  - the md5 uniqueness guard (`is_unique_hash`, `:352-357`) →
  *    `duplicate_md5`, the J7 anti pattern;
  *  - surviving rows get FileIDs continuing from max(existing) in
  *    deterministic file-path order (`register_db`), and
  *    `files_intermediary` rows link each registered output to its
  *    exploded input list with the tool name (`insert_intermedFiles:634-681`).
  *
  * Scale posture: `files` is keyed by FileID — the source-inherit join
  * shuffles on that key once; the scan-type dictionary broadcasts; the md5
  * guard is one hash semi-join; id assignment is the distributed
  * range-sort + zipWithIndex ordinal (no single-partition window).
  */
object ProcessedRegistration {

  /** One row per candidate with `status` ∈ {registered, missing_source,
    * missing_input, unknown_scan_type, duplicate_md5} (first failing check
    * in the reference's own order wins); registered rows carry inherited
    * SessionID/ScannerID, resolved MriScanTypeID, and a fresh FileID.
    *
    * @param candidates (file_path, source_file_id, input_file_ids
    *                   Array[Long], source_pipeline, tool, pipeline_date,
    *                   coordinate_space, scan_type, output_type, md5hash)
    * @param files      existing catalog (FileID, SessionID, ScannerID,
    *                   md5hash)
    * @param scanTypes  (MriScanTypeID, ScanType) dictionary
    */
  def register(candidates: DataFrame, files: DataFrame,
      scanTypes: DataFrame): DataFrame = {
    val src = files.select(
      col("FileID").as("src_id"), col("SessionID").as("src_session"),
      col("ScannerID").as("src_scanner"))
    // per-candidate count of input ids absent from the catalog
    val missingInputs = candidates
      .select(col("file_path"), explode(col("input_file_ids")).as("in_id"))
      .join(files.select(col("FileID").as("in_id")), Seq("in_id"), "left_anti")
      .groupBy(col("file_path"))
      .agg(count(lit(1)).as("n_missing_inputs"))
    val dupHashes = files.select(col("md5hash")).distinct()
      .withColumn("dup_md5", lit(true))
    // the reference registers files ONE AT A TIME, so a batch-mate that
    // already REGISTERED the same md5 also triggers is_unique_hash. Only
    // candidates that pass every earlier guard can have inserted their
    // hash — a batch-mate rejected for a missing source never reaches
    // the insert, so it must NOT block a later same-md5 candidate. The
    // rank therefore counts passing rows only, in file-path order.
    val batchDupW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("md5hash")).orderBy(col("file_path"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val passesEarlier =
      col("src_id").isNotNull &&
        coalesce(col("n_missing_inputs"), lit(0L)) === 0 &&
        col("MriScanTypeID").isNotNull &&
        !coalesce(col("dup_md5"), lit(false))
    val checked = candidates
      .join(src, col("source_file_id") === col("src_id"), "left")
      .join(missingInputs, Seq("file_path"), "left")
      .join(broadcast(scanTypes.select(col("MriScanTypeID"),
        col("ScanType").as("scan_type"))), Seq("scan_type"), "left")
      .join(broadcast(dupHashes), Seq("md5hash"), "left")
      .withColumn("__ok_rank",
        sum(when(passesEarlier, 1).otherwise(0)).over(batchDupW))
      .withColumn("status",
        when(col("src_id").isNull, "missing_source")
          .when(coalesce(col("n_missing_inputs"), lit(0L)) > 0, "missing_input")
          .when(col("MriScanTypeID").isNull, "unknown_scan_type")
          .when(col("dup_md5") || col("__ok_rank") > 1, "duplicate_md5")
          .otherwise("registered"))
      .drop("__ok_rank")
    val maxId = files
      .select(coalesce(max(col("FileID")), lit(0L)).cast("long"))
      .first().getLong(0)
    val ok = graft.functions.Ordinals
      .withGlobalOrdinal(checked.filter(col("status") === "registered"),
        Seq(col("file_path")), "__ord")
      .withColumn("FileID", lit(maxId) + col("__ord"))
      .drop("__ord")
    val rejected = checked.filter(col("status") =!= "registered")
      .withColumn("FileID", lit(null).cast("long"))
    ok.unionByName(rejected)
      .select(col("file_path"), col("status"), col("FileID"),
        when(col("status") === "registered", col("src_session"))
          .as("SessionID"),
        when(col("status") === "registered", col("src_scanner"))
          .as("ScannerID"),
        when(col("status") === "registered", col("MriScanTypeID"))
          .as("MriScanTypeID"),
        col("source_file_id").as("SourceFileID"),
        col("source_pipeline").as("SourcePipeline"),
        col("pipeline_date").as("PipelineDate"),
        col("coordinate_space").as("CoordinateSpace"),
        col("output_type").as("OutputType"),
        size(col("input_file_ids")).as("n_inputs"))
  }

  /** `files_intermediary` (`insert_intermedFiles:634-681`): one row per
    * (registered output, input file), with the processing tool. */
  def intermediaries(registered: DataFrame, candidates: DataFrame): DataFrame =
    registered.filter(col("status") === "registered")
      .select(col("file_path"), col("FileID"))
      .join(candidates.select(col("file_path"), col("tool"),
        explode(col("input_file_ids")).as("Input_FileID")), Seq("file_path"))
      .select(col("FileID"), col("Input_FileID"), col("tool").as("Tool"))
}
