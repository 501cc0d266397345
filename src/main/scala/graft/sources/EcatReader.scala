package graft.sources

import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.functions.expressions.Blake2bCore

/** HRRT PET ECAT7 reader (SURVEY.md §2.1, HRRT vertical): the reference
  * reads ECAT7 (`.v`) headers by shelling out to `lmhdr`
  * (`uploadNeuroDB/NeuroDB/HRRT.pm:194-213`) and greps `key := value`
  * lines; here the format itself is parsed — ECAT7's main header is a
  * single fixed-layout big-endian 512-byte block (the public CTI/Siemens
  * ECAT 7 layout as implemented by the open nibabel/ecat readers), the
  * same zero-dep byte-arithmetic class as [[CtfReader]].
  *
  * Fields surfaced are the ones the HRRT insertion pipeline consumes
  * (`HRRT.pm:257-283` `determine_study_info`): patient name/id, facility
  * name, system type, scan start time (uint32 epoch seconds → acquisition
  * date), plus identification metadata. BIC-dataset semantics preserved:
  * `test*.v` files are excluded from the ECAT set
  * (`HRRT.pm:156-173` `grep_ecat_files_only`) and the facility name is
  * overridden to `BIC-MNI_MCGILL` (`HRRT.pm:210`).
  *
  * Distribution shape: one `binaryFile` scan over the study tree; header
  * parse and blake2b hashing are map-only (the reference hashes each ECAT
  * file for `hrrt_archive_files`, `HRRT.pm:398-408`) — zero shuffle until
  * the archive summary's groupBy.
  */
object EcatReader {

  final case class EcatMainHeader(
      magic: String,
      originalFileName: String,
      swVersion: Int,
      systemType: Int,
      fileType: Int,
      serialNumber: String,
      scanStartTime: Long,
      isotopeName: String,
      radiopharmaceutical: String,
      patientId: String,
      patientName: String,
      studyDescription: String,
      facilityName: String,
      numPlanes: Int,
      numFrames: Int)

  // --- big-endian primitives over an absolute offset ---
  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
  private def str(b: Array[Byte], o: Int, len: Int): String = {
    val end = math.min(o + len, b.length)
    var nul = o
    while (nul < end && b(nul) != 0) nul += 1
    new String(b, o, nul - o, US_ASCII).trim
  }

  // ECAT7 main-header absolute offsets (fixed 512-byte block)
  private val OffMagic = 0            // char[14], "MATRIX72v"
  private val OffOriginalFileName = 14 // char[32]
  private val OffSwVersion = 46       // u16
  private val OffSystemType = 48      // u16
  private val OffFileType = 50        // u16
  private val OffSerialNumber = 52    // char[10]
  private val OffScanStartTime = 62   // u32 epoch seconds
  private val OffIsotopeName = 66     // char[8]
  private val OffRadiopharmaceutical = 78 // char[32]
  private val OffPatientId = 166      // char[16] (after char[12] study_type)
  private val OffPatientName = 182    // char[32]
  private val OffStudyDescription = 296 // char[32]
  private val OffFacilityName = 332   // char[20] (after 2×u16 acq/orient)
  private val OffNumPlanes = 352      // u16
  private val OffNumFrames = 354      // u16
  private val MainHeaderBytes = 512

  /** Hardened ECAT7 main-header parse: None on anything malformed (wrong
    * magic, short file) — untrusted bytes never kill a scan stage. */
  def parseMainHeader(bytes: Array[Byte]): Option[EcatMainHeader] = {
    if (bytes.length < MainHeaderBytes) return None
    val magic = str(bytes, OffMagic, 14)
    if (!magic.startsWith("MATRIX")) return None
    Some(EcatMainHeader(
      magic = magic,
      originalFileName = str(bytes, OffOriginalFileName, 32),
      swVersion = u16(bytes, OffSwVersion),
      systemType = u16(bytes, OffSystemType),
      fileType = u16(bytes, OffFileType),
      serialNumber = str(bytes, OffSerialNumber, 10),
      scanStartTime = u32(bytes, OffScanStartTime),
      isotopeName = str(bytes, OffIsotopeName, 8),
      radiopharmaceutical = str(bytes, OffRadiopharmaceutical, 32),
      patientId = str(bytes, OffPatientId, 16),
      patientName = str(bytes, OffPatientName, 32),
      studyDescription = str(bytes, OffStudyDescription, 32),
      facilityName = str(bytes, OffFacilityName, 20),
      numPlanes = u16(bytes, OffNumPlanes),
      numFrames = u16(bytes, OffNumFrames)))
  }

  /** One scanned HRRT study file. `is_ecat` is EXTENSION-based — the
    * reference greps `.v` files (`grep_ecat_files_only`) and counts them
    * as ECAT regardless of header health — while `parse_failed` flags an
    * eligible `.v` whose 512-byte main header did not parse (the lmhdr
    * failure the reference would swallow into an empty header hash);
    * header fields are populated only for parsed rows. Every file
    * carries its blake2b hash (the per-file `hrrt_archive_files` hash,
    * `HRRT.pm:405`). */
  final case class HrrtFile(
      file_path: String,
      file_name: String,
      is_ecat: Boolean,
      parse_failed: Boolean,
      blake2b_hash: String,
      patient_name: Option[String],
      patient_id: Option[String],
      facility_name: Option[String],
      system_type: Option[Int],
      scan_start_time: Option[Long],
      num_frames: Option[Int])

  /** BIC HRRT datasets ship a Matlab `.m` parameter file whose
    * `key = value;` lines carry the study parameters used to build the
    * ECAT7 files (`HRRT.pm:298-320` `read_matlab_file`: split on ` = `,
    * strip the trailing `;` + CR). One (file_path, key, value) row per
    * parameter — the PROTOCOL key drives acquisition-protocol resolution
    * in the insertion pipeline (`HRRT_PET_insertion.pl:377`). */
  def matlabParams(spark: SparkSession, dir: String,
      glob: String = "*.m"): DataFrame = {
    import org.apache.spark.sql.functions._
    DicomSource.scanDir(spark, dir, glob)
      .select(col("path").as("file_path"),
        col("content").cast("string").as("txt"))
      .select(col("file_path"),
        explode(split(col("txt"), "\n")).as("line"))
      .filter(col("line").contains(" = "))
      .select(col("file_path"),
        trim(substring_index(col("line"), " = ", 1)).as("key"),
        regexp_replace(
          trim(substring_index(col("line"), " = ", -1)), ";\\s*$", "")
          .as("value"))
  }

  /** Distributed scan of an HRRT study tree: every file hashed, `.v` files
    * header-parsed. `bic` applies the BIC-dataset rules (`test*.v`
    * demoted to non-ECAT, facility override). */
  def files(spark: SparkSession, dir: String, bic: Boolean = false,
      glob: String = "*"): Dataset[HrrtFile] = {
    import spark.implicits._
    DicomSource.scanDir(spark, dir, glob)
      .select("path", "content").as[(String, Array[Byte])]
      .map { case (p, bytes) =>
        val name = DicomSource.pathOf(p).getName
        val eligible = name.toLowerCase.endsWith(".v") &&
          !(bic && name.toLowerCase.startsWith("test"))
        val hdr = if (eligible) parseMainHeader(bytes) else None
        HrrtFile(
          file_path = p,
          file_name = name,
          is_ecat = eligible,
          parse_failed = eligible && hdr.isEmpty,
          blake2b_hash = Blake2bCore.hexDigest(bytes),
          patient_name = hdr.map(_.patientName),
          patient_id = hdr.map(_.patientId),
          facility_name = hdr.map(h =>
            if (bic) "BIC-MNI_MCGILL" else h.facilityName),
          system_type = hdr.map(_.systemType),
          scan_start_time = hdr.map(_.scanStartTime),
          num_frames = hdr.map(_.numFrames))
      }
  }
}
