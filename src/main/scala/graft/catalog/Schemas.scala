package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed schemas for the load-bearing catalog tables (SURVEY.md §1.3; one
  * `StructType` per reference model from `python/lib/db/models/ (one file per table)`,
  * DB-native column names). These are the shapes a user ingesting
  * LORIS-shaped exports (CSV/TSV/JDBC dumps → parquet) targets, replacing
  * the reference's SQLAlchemy ORM layer with schema-on-read.
  *
  * Decorator codecs ride along as Column transforms (the reference's
  * `YNBool`/`TrueFalseBool`/`IntBool`/`IntDatetime` column decorators,
  * `python/lib/db/decorators/`): apply with [[Codecs.decode]] after a raw
  * text read, or write already-typed parquet and skip them.
  */
object Schemas {

  private def f(name: String, t: DataType, nullable: Boolean = true) =
    StructField(name, t, nullable)

  /** `candidate` (`candidate.py:16-45`; CandID contract
    * `candidate.py:105-115`). */
  val candidate: StructType = StructType(Seq(
    f("ID", LongType, nullable = false),
    f("CandID", IntegerType, nullable = false),
    f("PSCID", StringType, nullable = false),
    f("ExternalID", StringType),
    f("DoB", DateType),
    f("DoD", DateType),
    f("EDC", DateType),
    f("Sex", StringType),
    f("RegistrationCenterID", IntegerType, nullable = false),
    f("RegistrationProjectID", IntegerType, nullable = false),
    f("Ethnicity", StringType),
    f("Active", BooleanType, nullable = false), // YNBool
    f("Date_active", DateType),
    f("RegisteredBy", StringType),
    f("UserID", StringType, nullable = false),
    f("Date_registered", DateType),
    f("flagged_caveatemptor", BooleanType), // TrueFalseBool
    f("flagged_reason", IntegerType),
    f("flagged_other", StringType),
    f("flagged_other_status", StringType),
    f("Testdate", TimestampType, nullable = false),
    f("Entity_type", StringType, nullable = false),
    f("ProbandSex", StringType),
    f("ProbandDoB", DateType)))

  /** `session` (`session.py:15-50`). */
  val session: StructType = StructType(Seq(
    f("ID", LongType, nullable = false),
    f("CandidateID", LongType, nullable = false),
    f("CenterID", IntegerType, nullable = false),
    f("ProjectID", IntegerType, nullable = false),
    f("VisitNo", IntegerType),
    f("Visit_label", StringType, nullable = false),
    f("CohortID", IntegerType),
    f("Submitted", BooleanType, nullable = false), // YNBool
    f("Current_stage", StringType, nullable = false),
    f("Date_stage_change", DateType),
    f("Screening", StringType),
    f("Date_screening", DateType),
    f("Visit", StringType),
    f("Date_visit", DateType),
    f("Date_status_change", DateType),
    f("Approval", StringType),
    f("Date_approval", DateType),
    f("Active", BooleanType, nullable = false), // YNBool
    f("Date_active", DateType),
    f("RegisteredBy", StringType),
    f("UserID", StringType, nullable = false),
    f("Date_registered", DateType),
    f("Testdate", TimestampType, nullable = false),
    f("Hardcopy_request", StringType, nullable = false),
    f("BVLQCStatus", StringType),
    f("BVLQCType", StringType),
    f("BVLQCExclusion", StringType),
    f("QCd", StringType)))

  /** `files` (`file.py:16-42`; natural key SeriesUID+EchoTime+EchoNumber+
    * PhaseEncodingDirection). */
  val files: StructType = StructType(Seq(
    f("FileID", LongType, nullable = false),
    f("SessionID", LongType, nullable = false),
    f("File", StringType, nullable = false), // StringPath
    f("SeriesUID", StringType),
    f("EchoTime", DoubleType),
    f("PhaseEncodingDirection", StringType),
    f("EchoNumber", StringType),
    f("CoordinateSpace", StringType),
    f("OutputType", StringType, nullable = false),
    f("MriScanTypeID", LongType),
    f("FileType", StringType),
    f("InsertedByUserID", StringType, nullable = false),
    f("InsertTime", LongType, nullable = false), // IntDatetime (epoch s)
    f("SourcePipeline", StringType),
    f("PipelineDate", DateType),
    f("SourceFileID", LongType),
    f("ProcessProtocolID", LongType),
    f("Caveat", BooleanType), // IntBool
    f("TarchiveSource", LongType),
    f("HrrtArchiveID", LongType),
    f("ScannerID", LongType),
    f("AcqOrderPerModality", IntegerType),
    f("AcquisitionDate", DateType)))

  /** `parameter_file` EAV rows (`file_parameter.py:12-24`). */
  val parameterFile: StructType = StructType(Seq(
    f("ParameterFileID", LongType, nullable = false),
    f("FileID", LongType, nullable = false),
    f("ParameterTypeID", LongType, nullable = false),
    f("Value", StringType),
    f("InsertTime", LongType, nullable = false)))

  /** `parameter_type` dictionary (`parameter_type.py:8-23`). */
  val parameterType: StructType = StructType(Seq(
    f("ParameterTypeID", LongType, nullable = false),
    f("Name", StringType, nullable = false),
    f("Alias", StringType),
    f("Type", StringType),
    f("Description", StringType),
    f("RangeMin", DoubleType),
    f("RangeMax", DoubleType),
    f("SourceField", StringType),
    f("SourceFrom", StringType),
    f("SourceCondition", StringType),
    f("Queryable", BooleanType), // IntBool
    f("IsFile", BooleanType))) // IntBool

  /** `tarchive` (`dicom_archive.py:20-56`). */
  val tarchive: StructType = StructType(Seq(
    f("TarchiveID", LongType, nullable = false),
    f("DicomArchiveID", StringType, nullable = false), // study UID
    f("PatientID", StringType, nullable = false),
    f("PatientName", StringType, nullable = false),
    f("PatientDoB", DateType),
    f("PatientSex", StringType),
    f("neurodbCenterName", StringType),
    f("CenterName", StringType, nullable = false),
    f("LastUpdate", TimestampType),
    f("DateAcquired", DateType),
    f("DateFirstArchived", TimestampType),
    f("DateLastArchived", TimestampType),
    f("AcquisitionCount", IntegerType, nullable = false),
    f("DicomFileCount", IntegerType, nullable = false),
    f("NonDicomFileCount", IntegerType, nullable = false),
    f("md5sumDicomOnly", StringType),
    f("md5sumArchive", StringType),
    f("CreatingUser", StringType, nullable = false),
    f("sumTypeVersion", IntegerType, nullable = false),
    f("tarTypeVersion", IntegerType),
    f("ScannerManufacturer", StringType, nullable = false),
    f("ScannerModel", StringType, nullable = false),
    f("ScannerSerialNumber", StringType, nullable = false),
    f("ScannerSoftwareVersion", StringType, nullable = false),
    f("SessionID", LongType),
    f("uploadAttempt", IntegerType, nullable = false),
    f("CreateInfo", StringType),
    f("AcquisitionMetadata", StringType, nullable = false),
    f("DateSent", TimestampType),
    f("PendingTransfer", BooleanType, nullable = false), // IntBool
    f("SourceLocation", StringType, nullable = false)))

  /** `tarchive_series` (`dicom_archive_series.py:10-24`). */
  val tarchiveSeries: StructType = StructType(Seq(
    f("TarchiveSeriesID", LongType, nullable = false),
    f("TarchiveID", LongType, nullable = false),
    f("SeriesNumber", IntegerType, nullable = false),
    f("SeriesDescription", StringType),
    f("SequenceName", StringType),
    f("EchoTime", DoubleType),
    f("RepetitionTime", DoubleType),
    f("InversionTime", DoubleType),
    f("SliceThickness", DoubleType),
    f("PhaseEncoding", StringType),
    f("NumberOfFiles", IntegerType, nullable = false),
    f("SeriesUID", StringType),
    f("Modality", StringType)))

  /** `tarchive_files` (`dicom_archive_file.py:12-24`). */
  val tarchiveFiles: StructType = StructType(Seq(
    f("TarchiveFileID", LongType, nullable = false),
    f("TarchiveID", LongType, nullable = false),
    f("TarchiveSeriesID", LongType),
    f("SeriesNumber", IntegerType),
    f("SeriesDescription", StringType),
    f("FileNumber", IntegerType),
    f("EchoNumber", IntegerType),
    f("Md5Sum", StringType, nullable = false),
    f("FileName", StringType, nullable = false)))

  /** `mri_upload` state machine (`mri_upload.py:17-35`). */
  val mriUpload: StructType = StructType(Seq(
    f("UploadID", LongType, nullable = false),
    f("UploadedBy", StringType, nullable = false),
    f("UploadDate", TimestampType),
    f("UploadLocation", StringType, nullable = false),
    f("DecompressedLocation", StringType, nullable = false),
    f("InsertionComplete", BooleanType, nullable = false), // IntBool
    f("Inserting", BooleanType), // IntBool
    f("PatientName", StringType, nullable = false),
    f("number_of_mincInserted", IntegerType),
    f("number_of_mincCreated", IntegerType),
    f("TarchiveID", LongType),
    f("SessionID", LongType),
    f("IsCandidateInfoValidated", BooleanType), // IntBool
    f("IsTarchiveValidated", BooleanType, nullable = false), // IntBool
    f("IsPhantom", BooleanType, nullable = false))) // YNBool

  /** `mri_scanner` get-or-create 4-tuple (`mri_scanner.py:8-17`,
    * `python/lib/db/queries/mri_scanner.py:20-24`). */
  val mriScanner: StructType = StructType(Seq(
    f("ID", LongType, nullable = false),
    f("Manufacturer", StringType),
    f("Model", StringType),
    f("Serial_number", StringType),
    f("Software", StringType),
    f("CandidateID", LongType)))

  /** `mri_protocol` range rows (`MRI.pm:436-457`; min/max per scan
    * parameter, NULL = unbounded). */
  val mriProtocol: StructType = StructType(Seq(
    f("MriProtocolID", LongType, nullable = false),
    f("MriProtocolGroupID", LongType, nullable = false),
    f("MriScanTypeID", LongType, nullable = false),
    f("TR_min", DoubleType), f("TR_max", DoubleType),
    f("TE_min", DoubleType), f("TE_max", DoubleType),
    f("TI_min", DoubleType), f("TI_max", DoubleType),
    f("slice_thickness_min", DoubleType), f("slice_thickness_max", DoubleType),
    f("xspace_min", DoubleType), f("xspace_max", DoubleType),
    f("yspace_min", DoubleType), f("yspace_max", DoubleType),
    f("zspace_min", DoubleType), f("zspace_max", DoubleType),
    f("xstep_min", DoubleType), f("xstep_max", DoubleType),
    f("ystep_min", DoubleType), f("ystep_max", DoubleType),
    f("zstep_min", DoubleType), f("zstep_max", DoubleType),
    f("time_min", DoubleType), f("time_max", DoubleType),
    f("series_description_regex", StringType)))

  /** `mri_protocol_group` (`mri_protocol_group.py:8-13`). */
  val mriProtocolGroup: StructType = StructType(Seq(
    f("MriProtocolGroupID", LongType, nullable = false),
    f("Name", StringType, nullable = false)))

  /** `mri_protocol_checks` (`mri_protocol_check.py:12-24`). */
  val mriProtocolChecks: StructType = StructType(Seq(
    f("ID", LongType, nullable = false),
    f("MriScanTypeID", LongType),
    f("Severity", StringType),
    f("Header", StringType),
    f("ValidMin", DoubleType),
    f("ValidMax", DoubleType),
    f("ValidRegex", StringType),
    f("MriProtocolChecksGroupID", LongType, nullable = false)))

  /** `physiological_file` core columns (`physio_file.py`). */
  val physiologicalFile: StructType = StructType(Seq(
    f("PhysiologicalFileID", LongType, nullable = false),
    f("PhysiologicalModalityID", LongType),
    f("PhysiologicalOutputTypeID", LongType, nullable = false),
    f("SessionID", LongType, nullable = false),
    f("InsertTime", TimestampType, nullable = false),
    f("FileType", StringType),
    f("AcquisitionTime", TimestampType),
    f("InsertedByUser", StringType, nullable = false),
    f("FilePath", StringType, nullable = false)))

  /** `physiological_channel` core columns (`physio_channel.py`). */
  val physiologicalChannel: StructType = StructType(Seq(
    f("PhysiologicalChannelID", LongType, nullable = false),
    f("PhysiologicalFileID", LongType, nullable = false),
    f("PhysiologicalChannelTypeID", LongType, nullable = false),
    f("PhysiologicalStatusTypeID", LongType),
    f("Name", StringType, nullable = false),
    f("Description", StringType),
    f("SamplingFrequency", IntegerType),
    f("LowCutoff", DoubleType),
    f("HighCutoff", DoubleType),
    f("ManualFlag", BooleanType),
    f("Notch", DoubleType),
    f("StatusDescription", StringType),
    f("Unit", StringType),
    f("Reference", StringType)))

  /** `physiological_task_event` (`physio_task_event.py`). */
  val physiologicalTaskEvent: StructType = StructType(Seq(
    f("PhysiologicalTaskEventID", LongType, nullable = false),
    f("PhysiologicalFileID", LongType, nullable = false),
    f("Onset", DoubleType, nullable = false),
    f("Duration", DoubleType, nullable = false),
    f("EventCode", StringType),
    f("EventValue", StringType),
    f("EventSample", DoubleType),
    f("EventType", StringType),
    f("TrialType", StringType),
    f("ResponseTime", StringType)))

  /** `psc` sites. */
  val psc: StructType = StructType(Seq(
    f("CenterID", IntegerType, nullable = false),
    f("Name", StringType, nullable = false),
    f("Alias", StringType, nullable = false),
    f("MRI_alias", StringType, nullable = false)))

  /** `Project`. */
  val project: StructType = StructType(Seq(
    f("ProjectID", IntegerType, nullable = false),
    f("Name", StringType, nullable = false),
    f("Alias", StringType, nullable = false),
    f("recruitmentTarget", IntegerType)))

  /** `Visit_Windows` (visit-label gate). */
  val visitWindows: StructType = StructType(Seq(
    f("ID", LongType, nullable = false),
    f("Visit_label", StringType),
    f("WindowMinDays", IntegerType),
    f("WindowMaxDays", IntegerType),
    f("OptimumMinDays", IntegerType),
    f("OptimumMaxDays", IntegerType),
    f("WindowMidpointDays", IntegerType)))

  /** All declared tables by DB name. */
  val all: Map[String, StructType] = Map(
    "candidate" -> candidate,
    "session" -> session,
    "files" -> files,
    "parameter_file" -> parameterFile,
    "parameter_type" -> parameterType,
    "tarchive" -> tarchive,
    "tarchive_series" -> tarchiveSeries,
    "tarchive_files" -> tarchiveFiles,
    "mri_upload" -> mriUpload,
    "mri_scanner" -> mriScanner,
    "mri_protocol" -> mriProtocol,
    "mri_protocol_group" -> mriProtocolGroup,
    "mri_protocol_checks" -> mriProtocolChecks,
    "physiological_file" -> physiologicalFile,
    "physiological_channel" -> physiologicalChannel,
    "physiological_task_event" -> physiologicalTaskEvent,
    "psc" -> psc,
    "Project" -> project,
    "Visit_Windows" -> visitWindows)

  /** Schema-enforced parquet read: schema-on-read projection (missing
    * columns fail analysis, extra columns are pruned at the scan). */
  def readTable(spark: SparkSession, path: String, table: String): DataFrame = {
    val schema = all(table)
    spark.read.parquet(path).select(schema.fieldNames.map(col): _*)
  }
}

/** The reference's column decorators as Column codecs
  * (`python/lib/db/decorators/`): apply when ingesting raw text/SQL dumps
  * where booleans arrive as 'Y'/'N', 'true'/'false', 0/1 and datetimes as
  * epoch ints. */
object Codecs {
  /** YNBool: 'Y'/'N' (case-insensitive) → boolean, else NULL. */
  def ynBool(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(upper(c) === "Y", lit(true)).when(upper(c) === "N", lit(false))

  /** TrueFalseBool: 'true'/'false' → boolean, else NULL. */
  def trueFalseBool(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(lower(c) === "true", lit(true)).when(lower(c) === "false", lit(false))

  /** IntBool: 0/1 → boolean. */
  def intBool(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c.cast("int") === 1, lit(true)).when(c.cast("int") === 0, lit(false))

  /** IntDatetime: epoch seconds → timestamp. */
  def intDatetime(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    timestamp_seconds(c.cast("long"))
}
