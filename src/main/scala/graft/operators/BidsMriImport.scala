package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.Blake2b
import graft.sources.ImagingHeaders

/** MRI-side BIDS dataset import (SURVEY.md §2 — the
  * `import_bids_dataset` MRI vertical the EEG half of which is
  * [[EegBidsUploads]]).
  *
  * Reference: `python/loris_bids_importer/src/loris_bids_importer/mri/
  * main.py:1-214` with `sidecar.py:43-51`, `acquisitions.py:13-43`,
  * `copy_files.py:47-91`, `file_type.py:9-33`, `scans.py:7-21`, and
  * `lib/imaging_lib/nifti.py:7-31`; integration contract in
  * `python/tests/integration/scripts/test_import_bids_dataset.py`.
  *
  * Per acquisition the reference runs, in order:
  *  1. LORIS path construction (`copy_files.py:80-91`): strip the `sub-` /
  *     `ses-` entities from the BIDS file name and re-prefix with the LORIS
  *     PSCID + visit label, under
  *     `<dataset>/sub-<PSCID>/ses-<visit>/<data_type>/`;
  *  2. already-registered guard by LORIS path (`main.py:88-92`) — counted
  *     as ignored, not an error;
  *  3. the grouped checks (`group_errors_tuple`, `main.py:96-101` — ALL
  *     evaluated, first failure in lambda order reported here):
  *     file-type-by-extension with `.gz` stripped (`file_type.py:9-21`),
  *     blake2b hash-dedup against registered files (`main.py:182-194`),
  *     and scan-type resolution: existing `mri_scan_type` row wins, else a
  *     standard suffix for the data type (`KNOWN_SUFFIXES_PER_MRI_DATA_TYPE`,
  *     `main.py:28-42`) is get-or-created, else error (`main.py:197-214`);
  *  4. parameter assembly: sidecar keys + BIDS→LORIS alias mapping
  *     (originals kept, `file_parameter.py:68-79`), `bids_json_file` +
  *     its blake2b, REAL NIfTI spatial params (xstep/ystep/zstep from
  *     pixdim, xspace/yspace/zspace/time from dim — parsed here from the
  *     actual header bytes, `nifti.py:7-31`), `file_blake2b_hash`, the
  *     `scans.tsv` row params (`scans.py:7-21`), and two params per
  *     auxiliary file (bval/bvec/physio/events, `main.py:144-149`);
  *  5. registration (`main.py:157-175`): SeriesInstanceUID / EchoTime /
  *     EchoNumber / PhaseEncodingDirection lifted from the parameters;
  *     FileIDs continue from max(existing).
  *
  * The reference imports acquisitions one at a time (`acquisitions.py`),
  * so an earlier batch-mate with the same hash makes a later duplicate
  * reject — preserved via a per-hash window, the same sequential-insert
  * semantics as [[NonMincRegistration.register]].
  *
  * Scale posture: every dictionary (existing files by path/hash, scan
  * types, file types, parameter aliases) is catalog-sized and broadcast;
  * the acquisition stream never shuffles on data volume except the
  * bounded per-hash dedup window and the range-sort ordinal for new ids.
  */
object BidsMriImport {

  /** `KNOWN_SUFFIXES_PER_MRI_DATA_TYPE` (`mri/main.py:28-42`). */
  val knownSuffixes: Map[String, Seq[String]] = Map(
    "anat" -> Seq("T1w", "T2w", "T1rho", "T1map", "T2map", "T2star",
      "FLAIR", "FLASH", "PD", "PDmap", "PDT2", "inplaneT1", "inplaneT2",
      "angio"),
    "func" -> Seq("bold", "cbv", "phase"),
    "dwi" -> Seq("dwi", "sbref"),
    "fmap" -> Seq("phasediff", "magnitude1", "magnitude2", "phase1",
      "phase2", "fieldmap", "epi"))

  /** `get_loris_bids_file_name` (`copy_files.py:80-91`): drop existing
    * sub-/ses- entities, re-prefix with the LORIS identifiers. */
  def lorisBidsFileName(fileName: Column, pscId: Column,
      visitLabel: Column): Column = {
    val stripped = regexp_replace(
      regexp_replace(fileName, "sub-[a-zA-Z0-9]+_?", ""),
      "ses-[a-zA-Z0-9]+_?", "")
    concat(lit("sub-"), pscId, lit("_ses-"), visitLabel, lit("_"), stripped)
  }

  /** One row per acquisition with `status` ∈ {already_registered,
    * unknown_file_type, duplicate_hash, no_suffix, unknown_suffix,
    * imported}.
    *
    * @param acqs       (acq_id, bids_name, data_type, suffix (nullable),
    *                   psc_id, visit_label, nifti_content (binary),
    *                   sidecar_json (nullable string), bval_path,
    *                   bvec_path, physio_path, events_path (nullable),
    *                   scan_acquisition_time (nullable),
    *                   age_at_scan (nullable))
    * @param files      registered files (FileID, File (LORIS path),
    *                   file_blake2b_hash)
    * @param scanTypes  mri_scan_type (MriScanTypeID, MriScanTypeName)
    * @param fileTypes  ImagingFileTypes (type)
    * @param paramAlias BIDS→LORIS parameter-name map (bids_name,
    *                   loris_name) — `get_bids_to_loris_parameter_types_dict`
    * @param datasetPrefix LORIS BIDS dataset dir, e.g.
    *                   `bids_imports/DS01_BIDSVersion_1.0.2`
    */
  def importPlan(acqs: DataFrame, files: DataFrame, scanTypes: DataFrame,
      fileTypes: DataFrame, paramAlias: DataFrame,
      datasetPrefix: String): DataFrame = {

    val lorisPath = concat(lit(datasetPrefix + "/sub-"), col("psc_id"),
      lit("/ses-"), col("visit_label"), lit("/"), col("data_type"),
      lit("/"),
      lorisBidsFileName(col("bids_name"), col("psc_id"), col("visit_label")))

    // file_type.py:9-21 — extension with a trailing .gz stripped
    val ext = regexp_extract(
      regexp_replace(col("bids_name"), "\\.gz$", ""), "\\.([^.]+)$", 1)

    val withChecks = acqs
      .withColumn("loris_path", lorisPath)
      .withColumn("file_type", nullif(ext, lit("")))
      .withColumn("file_blake2b_hash", Blake2b.blake2b(col("nifti_content")))
      // main.py:88-92 — path guard against the registered catalog
      .join(broadcast(files.select(col("File").as("loris_path"))
        .withColumn("__path_dup", lit(true))), Seq("loris_path"), "left")
      // file_type.py — the extension must be a known imaging file type
      .join(broadcast(fileTypes.select(col("type").as("file_type"))
        .distinct().withColumn("__ft_ok", lit(true))),
        Seq("file_type"), "left")
      // main.py:182-194 — hash guard against the registered catalog
      .join(broadcast(files.select(
        col("file_blake2b_hash"), lit(true).as("__hash_dup"))
        .where(col("file_blake2b_hash").isNotNull).distinct()),
        Seq("file_blake2b_hash"), "left")
      // main.py:197-214 — existing scan type by suffix name
      .join(broadcast(scanTypes.select(
        col("MriScanTypeName").as("suffix"),
        col("MriScanTypeID").as("__existing_scan_type"))),
        Seq("suffix"), "left")

    // standard-suffix gate for scan-type creation (main.py:211-214)
    val knownPairs = knownSuffixes.toSeq
      .flatMap { case (dt, sufs) => sufs.map(dt -> _) }
    val known = acqs.sparkSession.createDataFrame(knownPairs)
      .toDF("data_type", "suffix").withColumn("__suffix_known", lit(true))

    // Sequential semantics: only an import that SUCCEEDS registers its
    // hash, so a later same-hash batch-mate rejects only if an earlier
    // acquisition passed every other check (a path-rejected or otherwise
    // failing earlier file never inserts the hash).
    val eligible = col("__path_dup").isNull && col("__ft_ok").isNotNull &&
      col("__hash_dup").isNull && col("suffix").isNotNull &&
      (col("__existing_scan_type").isNotNull ||
        col("__suffix_known").isNotNull)
    val firstOfHash = Window.partitionBy(col("file_blake2b_hash"))
      .orderBy(col("acq_id"))
    val seqChecked = withChecks
      .join(broadcast(known), Seq("data_type", "suffix"), "left")
      .withColumn("__first_acq",
        first(when(eligible, col("acq_id")), ignoreNulls = true)
          .over(firstOfHash))
      .withColumn("__batch_dup",
        eligible && col("__first_acq") =!= col("acq_id"))

    val statused = seqChecked
      .withColumn("status",
        when(col("__path_dup").isNotNull, lit("already_registered"))
          // group_errors_tuple lambda order: file type, hash, scan type
          .when(col("__ft_ok").isNull, lit("unknown_file_type"))
          .when(col("__hash_dup").isNotNull || col("__batch_dup"),
            lit("duplicate_hash"))
          .when(col("suffix").isNull, lit("no_suffix"))
          .when(col("__existing_scan_type").isNull &&
            col("__suffix_known").isNull, lit("unknown_suffix"))
          .otherwise(lit("imported")))

    // Scan-type get-or-create: new standard suffixes get ids continuing
    // from max(existing), in first-use (data_type, suffix) order.
    val maxScanType = scanTypes
      .agg(coalesce(max(col("MriScanTypeID")), lit(0L)).as("__max_st"))
    val newTypes = statused
      .where(col("status") === "imported" &&
        col("__existing_scan_type").isNull)
      .groupBy(col("suffix")).agg(min(col("acq_id")).as("__first_use"))
    val newTypeIds = graft.functions.Ordinals.withGlobalOrdinal(
        newTypes, Seq(col("__first_use")), "__ord")
      .crossJoin(broadcast(maxScanType))
      .select(col("suffix"),
        (col("__max_st") + col("__ord")).as("__new_scan_type"))

    val typed = statused
      .join(broadcast(newTypeIds), Seq("suffix"), "left")
      .withColumn("scan_type_id",
        when(col("status") === "imported",
          coalesce(col("__existing_scan_type"), col("__new_scan_type"))))
      .withColumn("scan_type_new",
        when(col("status") === "imported",
          col("__existing_scan_type").isNull))

    // Parameter assembly (main.py:121-149) — real header bytes + sidecar
    val sidecarMap = from_json(col("sidecar_json"),
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.StringType))
    val aliases = paramAlias
      .groupBy().agg(map_from_arrays(
        collect_list(col("bids_name")),
        collect_list(col("loris_name"))).as("__alias"))
    val dims = ImagingHeaders.niftiDims(col("nifti_content"))
    val nAux = Seq("bval_path", "bvec_path", "physio_path", "events_path")
      .map(c => when(col(c).isNotNull, 1).otherwise(0).cast("long"))
      .reduce(_ + _)

    val withParams = typed
      .crossJoin(broadcast(aliases))
      .withColumn("__sidecar", sidecarMap)
      .withColumn("__sidecar_keys",
        coalesce(map_keys(col("__sidecar")), array()))
      // alias mapping adds one key per sidecar key with a LORIS alias,
      // unless the alias collides with a name already present
      .withColumn("__alias_added",
        size(array_except(
          array_distinct(filter(
            transform(col("__sidecar_keys"),
              k => element_at(col("__alias"), k)),
            x => x.isNotNull)),
          col("__sidecar_keys"))).cast("long"))
      .withColumn("n_parameters",
        when(col("status") =!= "imported", lit(null).cast("long"))
          .otherwise(
            size(col("__sidecar_keys")).cast("long") + col("__alias_added") +
              // bids_json_file + bids_json_file_blake2b_hash
              when(col("sidecar_json").isNotNull, 2L).otherwise(0L) +
              // xstep/ystep/zstep + xspace/yspace/zspace + time
              lit(7L) +
              // file_blake2b_hash
              lit(1L) +
              // scans.tsv row params (scans.py:7-21): acquisition time,
              // age, file path, file hash
              when(col("scan_acquisition_time").isNotNull, 4L)
                .otherwise(0L) +
              nAux * 2L))
      // failed/ignored acquisitions copy nothing — the grouped checks
      // raise before the copy loop (`main.py:151-153`)
      .withColumn("n_files_to_copy",
        when(col("status") =!= "imported", lit(null).cast("long"))
          .otherwise(lit(1L) +
            when(col("sidecar_json").isNotNull, 1L).otherwise(0L) + nAux))

    // register_mri_file args lifted from the parameters (main.py:157-175)
    val registered = withParams
      .withColumn("series_uid",
        when(col("status") === "imported",
          element_at(col("__sidecar"), "SeriesInstanceUID")))
      .withColumn("echo_time",
        when(col("status") === "imported",
          element_at(col("__sidecar"), "EchoTime").cast("double")))
      .withColumn("xspace", when(col("status") === "imported",
        dims.getField("xspace")))
      .withColumn("yspace", when(col("status") === "imported",
        dims.getField("yspace")))
      .withColumn("zspace", when(col("status") === "imported",
        dims.getField("zspace")))
      .withColumn("xstep", when(col("status") === "imported",
        ImagingHeaders.niftiPixdim(col("nifti_content"))
          .getField("xstep").cast("double")))

    // FileIDs continue from max(existing) in acquisition order
    val maxFile = files
      .agg(coalesce(max(col("FileID")), lit(0L)).as("__max_fid"))
    val newIds = graft.functions.Ordinals.withGlobalOrdinal(
        registered.where(col("status") === "imported")
          .select(col("acq_id")),
        Seq(col("acq_id")), "__ford")
      .crossJoin(broadcast(maxFile))
      .select(col("acq_id"), (col("__max_fid") + col("__ford")).as("file_id"))

    registered
      .join(newIds, Seq("acq_id"), "left")
      .select(col("acq_id"), col("bids_name"), col("status"),
        col("loris_path"),
        col("file_type"), col("scan_type_id"), col("scan_type_new"),
        col("file_id"), col("series_uid"), col("echo_time"),
        col("xspace"), col("yspace"), col("zspace"), col("xstep"),
        col("n_parameters"), col("n_files_to_copy"))
  }
}
