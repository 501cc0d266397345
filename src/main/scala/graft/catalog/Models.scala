package graft.catalog

import java.sql.{Date, Timestamp}

/** Typed row models for the core catalog tables — case classes whose fields
  * mirror [[Schemas]] column-for-column (DB-native names), so
  * `df.as[Candidate]` works directly on a schema-conformant DataFrame and
  * `Seq(...).toDS` round-trips through parquet. The Dataset counterpart of
  * the reference's SQLAlchemy models (`python/lib/db/models/ (one file per table)`). */
object Models {

  /** `candidate` (`candidate.py:16-45`). */
  final case class Candidate(
      ID: Long,
      CandID: Int,
      PSCID: String,
      ExternalID: Option[String],
      DoB: Option[Date],
      DoD: Option[Date],
      EDC: Option[Date],
      Sex: Option[String],
      RegistrationCenterID: Int,
      RegistrationProjectID: Int,
      Ethnicity: Option[String],
      Active: Boolean,
      Date_active: Option[Date],
      RegisteredBy: Option[String],
      UserID: String,
      Date_registered: Option[Date],
      flagged_caveatemptor: Option[Boolean],
      flagged_reason: Option[Int],
      flagged_other: Option[String],
      flagged_other_status: Option[String],
      Testdate: Timestamp,
      Entity_type: String,
      ProbandSex: Option[String],
      ProbandDoB: Option[Date])

  /** `session` (`session.py:15-50`). */
  final case class Session(
      ID: Long,
      CandidateID: Long,
      CenterID: Int,
      ProjectID: Int,
      VisitNo: Option[Int],
      Visit_label: String,
      CohortID: Option[Int],
      Submitted: Boolean,
      Current_stage: String,
      Date_stage_change: Option[Date],
      Screening: Option[String],
      Date_screening: Option[Date],
      Visit: Option[String],
      Date_visit: Option[Date],
      Date_status_change: Option[Date],
      Approval: Option[String],
      Date_approval: Option[Date],
      Active: Boolean,
      Date_active: Option[Date],
      RegisteredBy: Option[String],
      UserID: String,
      Date_registered: Option[Date],
      Testdate: Timestamp,
      Hardcopy_request: String,
      BVLQCStatus: Option[String],
      BVLQCType: Option[String],
      BVLQCExclusion: Option[String],
      QCd: Option[String])

  /** `files` (`file.py:16-42`). */
  final case class FileRow(
      FileID: Long,
      SessionID: Long,
      File: String,
      SeriesUID: Option[String],
      EchoTime: Option[Double],
      PhaseEncodingDirection: Option[String],
      EchoNumber: Option[String],
      CoordinateSpace: Option[String],
      OutputType: String,
      MriScanTypeID: Option[Long],
      FileType: Option[String],
      InsertedByUserID: String,
      InsertTime: Long,
      SourcePipeline: Option[String],
      PipelineDate: Option[Date],
      SourceFileID: Option[Long],
      ProcessProtocolID: Option[Long],
      Caveat: Option[Boolean],
      TarchiveSource: Option[Long],
      HrrtArchiveID: Option[Long],
      ScannerID: Option[Long],
      AcqOrderPerModality: Option[Int],
      AcquisitionDate: Option[Date])

  /** `parameter_file` (`file_parameter.py:12-24`). */
  final case class ParameterFileRow(
      ParameterFileID: Long,
      FileID: Long,
      ParameterTypeID: Long,
      Value: Option[String],
      InsertTime: Long)

  /** `parameter_type` (`parameter_type.py:8-23`). */
  final case class ParameterTypeRow(
      ParameterTypeID: Long,
      Name: String,
      Alias: Option[String],
      Type: Option[String],
      Description: Option[String],
      RangeMin: Option[Double],
      RangeMax: Option[Double],
      SourceField: Option[String],
      SourceFrom: Option[String],
      SourceCondition: Option[String],
      Queryable: Option[Boolean],
      IsFile: Option[Boolean])

  /** `tarchive_series` (`dicom_archive_series.py:10-24`). */
  final case class TarchiveSeriesRow(
      TarchiveSeriesID: Long,
      TarchiveID: Long,
      SeriesNumber: Int,
      SeriesDescription: Option[String],
      SequenceName: Option[String],
      EchoTime: Option[Double],
      RepetitionTime: Option[Double],
      InversionTime: Option[Double],
      SliceThickness: Option[Double],
      PhaseEncoding: Option[String],
      NumberOfFiles: Int,
      SeriesUID: Option[String],
      Modality: Option[String])

  /** `tarchive_files` (`dicom_archive_file.py:12-24`). */
  final case class TarchiveFileRow(
      TarchiveFileID: Long,
      TarchiveID: Long,
      TarchiveSeriesID: Option[Long],
      SeriesNumber: Option[Int],
      SeriesDescription: Option[String],
      FileNumber: Option[Int],
      EchoNumber: Option[Int],
      Md5Sum: String,
      FileName: String)

  /** `mri_upload` (`mri_upload.py:17-35`). */
  final case class MriUploadRow(
      UploadID: Long,
      UploadedBy: String,
      UploadDate: Option[Timestamp],
      UploadLocation: String,
      DecompressedLocation: String,
      InsertionComplete: Boolean,
      Inserting: Option[Boolean],
      PatientName: String,
      number_of_mincInserted: Option[Int],
      number_of_mincCreated: Option[Int],
      TarchiveID: Option[Long],
      SessionID: Option[Long],
      IsCandidateInfoValidated: Option[Boolean],
      IsTarchiveValidated: Boolean,
      IsPhantom: Boolean)

  /** `mri_scanner` (`mri_scanner.py:8-17`). */
  final case class MriScannerRow(
      ID: Long,
      Manufacturer: Option[String],
      Model: Option[String],
      Serial_number: Option[String],
      Software: Option[String],
      CandidateID: Option[Long])

  /** `mri_protocol_checks` (`mri_protocol_check.py:12-24`). */
  final case class MriProtocolCheckRow(
      ID: Long,
      MriScanTypeID: Option[Long],
      Severity: Option[String],
      Header: Option[String],
      ValidMin: Option[Double],
      ValidMax: Option[Double],
      ValidRegex: Option[String],
      MriProtocolChecksGroupID: Long)
}
