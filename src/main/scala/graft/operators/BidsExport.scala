package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MINC→BIDS export naming (SURVEY.md §2 — the catalog side of
  * `tools/minc_to_bids_converter.pl`): for each registered file, the
  * BIDS-compliant NIfTI/JSON names and target directory, with the
  * script's own skip/error ladder. (The mnc2nii pixel conversion itself
  * is external tooling — documented scope cut, like nifti_pic.)
  *
  * Reference semantics preserved:
  *  - run numbers per scan type ordered by SeriesNumber, with
  *    `-defaced` stripped for GROUPING and the literal `"00$i"`
  *    formatting — the 10th run is `run-0010`
  *    (`determine_run_number:529-572`);
  *  - files whose scan type has no `bids_mri_scan_type_rel` row are
  *    skipped with a warning (`makeNIIAndHeader:619`) →
  *    `skipped_no_bids_mapping`;
  *  - `magnitude*` BIDS scan types are deferred to the phasediff
  *    fieldmap pass (`:629`) → `deferred_magnitude`;
  *  - `func` files must have a BIDSScanTypeSubCategory
  *    (`determine_bids_nifti_file_name:834-841`) →
  *    `error_func_needs_subcategory` (the script exits; the dataflow
  *    carries it);
  *  - entity assembly in the fixed BIDS order (sub, ses, task, acq, ce,
  *    rec, dir, run, mod, echo, flip, inv, mt, part, recording) with
  *    the subcategory string parsed `key-value` per `_`-segment and
  *    OVERRIDING the base entities (Perl hash assignment, `:853-860`);
  *  - visit labels lose their underscores (`:829-830`);
  *  - the JSON name is the NIfTI name with EVERY `nii` substring
  *    replaced (`s/nii/json/g`, `:1190`) — quirk preserved;
  *  - the published file is gzipped (`$nifti_filename.gz`, `:661`).
  *
  * Scale posture: one broadcast join to the (tiny) BIDS mapping
  * dictionary and one window partitioned by (candidate, visit, scan
  * type) — the same key the run-number semantics require, so the
  * shuffle is irreducible and bounded per session.
  */
object BidsExport {

  private val EntityOrder = Seq("sub", "ses", "task", "acq", "ce", "rec",
    "dir", "run", "mod", "echo", "flip", "inv", "mt", "part", "recording")

  /** @param files   (FileID, candID, visitLabel, lorisScanType,
    *                seriesNumber)
    * @param bidsRel bids_mri_scan_type_rel joined to its dictionaries:
    *                (ScanType, BIDSCategoryName, BIDSScanTypeSubCategory
    *                nullable, BIDSScanType, BIDSEchoNumber nullable)
    * @param bidsRoot destination root directory */
  def exportNames(files: DataFrame, bidsRel: DataFrame,
      bidsRoot: String): DataFrame = {
    val runW = Window
      .partitionBy(col("candID"), col("visitLabel"),
        regexp_replace(col("lorisScanType"), "-defaced", ""))
      .orderBy(col("seriesNumber"))
    val withRun = files
      .withColumn("run_number",
        concat(lit("00"), row_number().over(runW))) // the "00$i" literal
      .join(broadcast(bidsRel
        .withColumnRenamed("ScanType", "lorisScanType")),
        Seq("lorisScanType"), "left")
      .withColumn("__visit", regexp_replace(col("visitLabel"), "_", ""))
      .withColumn("__subcat", coalesce(
        expr("str_to_map(BIDSScanTypeSubCategory, '_', '-')"),
        expr("map()")))

    def fromSubcat(e: String): Column = element_at(col("__subcat"), e)
    // base entities; the subcategory map OVERRIDES them (Perl hash
    // assignment order)
    val base: Map[String, Column] = Map(
      "sub" -> col("candID").cast("string"),
      "ses" -> col("__visit"),
      "run" -> col("run_number"),
      "echo" -> col("BIDSEchoNumber").cast("string"))
    val parts: Seq[Column] = EntityOrder.map { e =>
      val value = base.get(e)
        .map(b => coalesce(fromSubcat(e), b))
        .getOrElse(fromSubcat(e))
      val defined = e match {
        case "sub" | "ses" | "run" => lit(true)
        case "echo" => fromSubcat(e).isNotNull ||
          col("BIDSEchoNumber").isNotNull
        case _ => fromSubcat(e).isNotNull
      }
      val sep = if (e == "sub") "" else "_"
      when(defined, concat(lit(s"$sep$e-"), value)).otherwise(lit(""))
    }
    val niftiName = concat(
      concat(parts: _*), lit("_"), col("BIDSScanType"), lit(".nii"))
    val bidsDir = concat(lit(bidsRoot + "/sub-"), col("candID"),
      lit("/ses-"), col("__visit"), lit("/"), col("BIDSCategoryName"))

    val status =
      when(col("BIDSScanType").isNull, "skipped_no_bids_mapping")
        .when(col("BIDSScanType").contains("magnitude"),
          "deferred_magnitude")
        .when(col("BIDSCategoryName") === "func" &&
          col("BIDSScanTypeSubCategory").isNull,
          "error_func_needs_subcategory")
        .otherwise("exported")

    withRun
      .withColumn("status", status)
      .withColumn("nifti_name",
        when(col("status") === "exported", niftiName))
      .select(col("FileID"), col("status"), col("run_number"),
        col("nifti_name"),
        when(col("status") === "exported",
          concat(bidsDir, lit("/"), col("nifti_name"), lit(".gz")))
          .as("nii_path"),
        when(col("status") === "exported", concat(bidsDir, lit("/"),
          regexp_replace(col("nifti_name"), "nii", "json"))) // s///g quirk
          .as("json_path"))
  }
}
