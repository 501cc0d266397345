package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Maintenance

/** Catalog-maintenance tool family under the driver's correctness gate
  * (one query per [[graft.operators.Maintenance]] operator).
  *
  * q127 derives its tarchive rows from `orders.parquet` so the oracle is
  * COMPUTED in DuckDB (two nested global literal `replace`s — the exact
  * twin of the operator's quoted-literal `regexp_replace` pair). The other
  * seven run catalog verticals whose quirky Perl semantics (case-fold
  * first-occurrence strips, `$#paths > 1` skip gates, Perl string
  * truthiness) are pinned as constant oracle rows over deterministic
  * inline fixtures — the q117-q125 discipline. */
object MaintQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MakeArchiveLocationRelative.pl over real table data: the oracle
    // recomputes the global dir strip, so the replace semantics (prefix,
    // already-relative passthrough, mid-path quirk) are cross-checked
    // rather than pinned
    "q127_relativize_archive" -> { (s, dir) =>
      val o = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderkey") < 200)
      val loc = when(col("o_orderkey") % 3 === 0,
          concat(lit("/data/tarchive/"), col("o_custkey").cast("string"),
            lit("/DCM_"), col("o_orderkey").cast("string"), lit(".tar")))
        .when(col("o_orderkey") % 3 === 1,
          concat(lit("DCM_"), col("o_orderkey").cast("string"), lit(".tar")))
        .otherwise(concat(lit("x/data/tarchive/DCM_"),
          col("o_orderkey").cast("string"), lit(".tar")))
      Maintenance.relativizeArchiveLocation(
        o.select(col("o_orderkey").as("TarchiveID"),
          loc.as("ArchiveLocation")),
        "/data/tarchive")
    },

    // database_files_update.pl: LIKE '%dir%' gate (CI) + FIRST-occurrence
    // CI strip across files + two parameter_file parameter names. Rows 3/4
    // of each fixture prove the gate (no-match filtered, wrong param name
    // filtered); file 5 is the gate-passes-strip-misses quirk (`/database`
    // contains `/data` but not `/data/`)
    "q128_relativize_db_paths" -> { (s, _) =>
      import s.implicits._
      val files = Seq(
        (1L, "/data/assembly/t1.mnc"),
        (2L, "/DATA/assembly/t2.mnc"),
        (3L, "assembly/t3.mnc"),
        (4L, "/data/sub/data/x.mnc"),
        (5L, "/database/y.mnc")).toDF("FileID", "File")
      val params = Seq(
        (1L, "check_pic_filename", "/data/pic/t1.png"),
        (2L, "tarchiveLocation", "/DATA/tarchive/a.tar"),
        (3L, "check_pic_filename", "pic/rel.png"),
        (4L, "other_param", "/data/zz.png"))
        .toDF("FileID", "Name", "Value")
      Maintenance.relativizeDbPaths(files, params, "/data")
    },

    // cleanupTarchives.pl classification: real-file match, cross-year
    // duplicate removal, md5-mismatch keep, missing-on-disk, and the
    // `_\d` basename normalization that groups DCM_D_1/DCM_D_2
    "q129_tarchive_cleanup" -> { (s, _) =>
      import s.implicits._
      val db = Seq(
        ("2024/DCM_A.tar", "aaa  /tank/2024/DCM_A.tar"),
        ("2024/DCM_B.tar", "ccc  /tank/2024/DCM_B.tar"),
        ("2024/DCM_C.tar", "eee  /tank/2024/DCM_C.tar"),
        ("2024/DCM_D_1.tar", "fff  /tank/2024/DCM_D_1.tar"))
        .toDF("ArchiveLocation", "md5sumArchive")
      val fs = Seq(
        ("/tank/2024/DCM_A.tar", "aaa"),
        ("/tank/2023/DCM_A.tar", "bbb"),
        ("/tank/2024/DCM_B.tar", "ddd"),
        ("/tank/2024/DCM_D_1.tar", "fff"),
        ("/tank/2024/DCM_D_2.tar", "ggg")).toDF("fs_path", "fs_md5")
      Maintenance.tarchiveDuplicates(db, fs, "/tank")
    },

    // create_nifti_bval_bvec.pl: the `.,` / trailing-dot bval cleanup,
    // the quote/comma bvec cleanup, and Perl truthiness gates ('' and '0'
    // both block; '0' direction blocks bvec while bval still writes)
    "q130_dwi_sidecars" -> { (s, _) =>
      import s.implicits._
      val files = Seq(
        (1L, "a/dwi25.mnc"), (2L, "a/dwi65.mnc"),
        (3L, "a/noscan.mnc"), (4L, "a/dwi0.mnc")).toDF("FileID", "File")
      val params = Seq(
        (1L, "acquisition:bvalues", "0. 1000. 2000."),
        (1L, "acquisition:direction_x", "\"0.1,0.2\""),
        (1L, "acquisition:direction_y", "0.3"),
        (1L, "acquisition:direction_z", "0.5,"),
        (2L, "acquisition:bvalues", "5.,"),
        (2L, "acquisition:direction_x", "0"),
        (2L, "acquisition:direction_y", "1"),
        (2L, "acquisition:direction_z", "1"),
        (3L, "acquisition:bvalues", ""),
        (4L, "acquisition:bvalues", "0"))
        .toDF("FileID", "Name", "Value")
      Maintenance.dwiBvalBvec(files, params)
    },

    // BackPopulateSNRAndAcquisitionOrder.pl: modality gate, empty-output
    // skip, changed-value notification vs fresh set
    "q131_snr_backpopulate" -> { (s, _) =>
      import s.implicits._
      val files = Seq(
        (1L, "t1w", "52.1"), (2L, "t1w", "48.0"), (3L, "t2w", "33.0"),
        (4L, "t1w", ""), (5L, "dwi", "20.0"))
        .toDF("FileID", "ScanType", "snr_value")
      val old = Seq((2L, "47.0"), (3L, "33.0")).toDF("FileID", "Value")
      Maintenance.backpopulateSnr(files, old, Seq("t1w", "t2w"))
    },

    // cleanup_paths_of_violation_tables.pl: trashbin re-point for the two
    // plain tables; the violations-log ladder — registered file at 1
    // match, lowest-FileID file at exactly 2 (the `$#paths > 1` quirk),
    // skip at 3+, trashbin at 0
    "q132_violation_trashbin" -> { (s, _) =>
      import s.implicits._
      val candErrors = Seq((101L, "assembly/s1/v1.mnc"))
        .toDF("ID", "MincFile")
      val violatedScans = Seq((201L, "assembly/s2/v2.mnc"))
        .toDF("ID", "minc_location")
      val vlog = Seq(
        (301L, "uidA", "assembly/s3/v3.mnc"),
        (302L, "uidB", "assembly/s4/v4.mnc"),
        (303L, "uidC", "assembly/s5/v5.mnc"),
        (304L, "uidD", "assembly/s6/v6.mnc"))
        .toDF("LogID", "SeriesUID", "MincFile")
      val files = Seq(
        (9001L, "reg/a.mnc", "uidA"),
        (9010L, "reg/b1.mnc", "uidB"), (9011L, "reg/b2.mnc", "uidB"),
        (9012L, "reg/b3.mnc", "uidB"),
        (9021L, "reg/d_hi.mnc", "uidD"), (9020L, "reg/d_lo.mnc", "uidD"))
        .toDF("FileID", "File", "SeriesUID")
      Maintenance.violationTrashbinPaths(candErrors, violatedScans, vlog,
        files)
    },

    // seriesuid2fileid.pl report: full row, localizer exclude, all-empty,
    // patient+description violation match, multi-violation count with
    // lowest-ID pick, zspace*time with Perl undef arithmetic defaults
    "q133_seriesuid_report" -> { (s, _) =>
      import s.implicits._
      val in = Seq("U1", "U2", "U3", "U4", "U5").toDF("series_uid")
      val ts = Seq(
        ("U1", 10L, "ep2d_dti", 60),
        ("U2", 11L, "AAHScout localizer", 12),
        ("U4", 12L, "t1_mprage", 176),
        ("U5", 13L, "dwi_b1000", 60))
        .toDF("SeriesUID", "TarchiveID", "SeriesDescription",
          "NumberOfFiles")
      val tar = Seq(
        (10L, "AAA_111111_V1"), (11L, "AAA_111111_V1"),
        (12L, "BBB_222222_V2"), (13L, "CCC_333333_V1"))
        .toDF("TarchiveID", "PatientName")
      val files = Seq(
        (9001L, "reg/a/u1.mnc", "U1"), (9002L, "reg/b/u4.mnc", "U4"),
        (9003L, "reg/c/u5a.mnc", "U5"), (9004L, "reg/c/u5b.mnc", "U5"))
        .toDF("FileID", "File", "SeriesUID")
      val viol = Seq(
        (21L, "U1", "ZZZ_999999_V9", "something"),
        (22L, "UX", "BBB_222222_V2", "t1_mprage"),
        (31L, "U5", "nobody", "none"), (32L, "U5", "nobody", "none"))
        .toDF("ID", "SeriesUID", "PatientName", "series_description")
      val vlog = Seq((41L, "U1", "warning"))
        .toDF("LogID", "SeriesUID", "Severity")
      val params = Seq(
        (9001L, "zspace", "30"), (9001L, "time", "2"),
        (9003L, "zspace", "10")).toDF("FileID", "Name", "Value")
      Maintenance.seriesUidReport(in, files, ts, tar, viol, vlog, params)
    },

    // get_dicom_files.pl: patient LIKE + scan-type EXISTS tarchive
    // selection, the seconds-vs-ms EchoTime tolerance residual on the
    // SeriesUID join, and the `_([^_]+_\d+).mnc$` out-dir capture
    "q134_dicom_file_select" -> { (s, _) =>
      import s.implicits._
      val candidate = Seq((1001L, 111111L, "AAA001"),
        (1002L, 222222L, "BBB001")).toDF("ID", "CandID", "PSCID")
      val session = Seq((501L, 1001L, "V1"), (502L, 1002L, "V1"))
        .toDF("ID", "CandidateID", "Visit_label")
      val tarchive = Seq(
        (10L, 501L, "AAA001_111111_V1", "2024-01-05"),
        (11L, 502L, "BBB001_222222_V1", "2024-01-06"),
        (12L, 501L, "AAA001_111111_V1", "2024-02-01"))
        .toDF("TarchiveID", "SessionID", "PatientName", "DateAcquired")
      val files = Seq(
        ("assembly/1/AAA001_111111_V1_t1w_001.mnc", "S1", 0.0025, 301, 10L),
        ("assembly/1/AAA001_111111_V1_dwi65_002.mnc", "S2", 0.08, 302, 10L),
        ("assembly/2/BBB001_222222_V1_t1w_001.mnc", "S3", 0.0025, 301, 11L),
        ("assembly/3/AAA001_111111_V1_pd_003.mnc", "S4", 0.01, 302, 12L))
        .toDF("File", "SeriesUID", "EchoTime", "MriScanTypeID",
          "TarchiveSource")
      val scanTypes = Seq((301, "t1w"), (302, "dwi65b"))
        .toDF("MriScanTypeID", "MriScanTypeName")
      val series = Seq(
        (7001L, "S1", 2.5, "t1 mprage"), (7002L, "S2", 80.0, "dwi"),
        (7003L, "S3", 2.5, "t1"))
        .toDF("TarchiveSeriesID", "SeriesUID", "EchoTime",
          "SeriesDescription")
      val tfiles = Seq(
        (7001L, "IM-0001.dcm", "m1"), (7001L, "IM-0002.dcm", "m2"),
        (7002L, "IM-0003.dcm", "m3"), (7003L, "IM-0004.dcm", "m4"))
        .toDF("TarchiveSeriesID", "FileName", "md5sum")
      Maintenance.dicomFileSelection(tarchive, session, candidate, files,
        scanTypes, series, tfiles,
        namePatterns = Seq("AAA%"), typePatterns = Seq("t1%"))
    },

    // updateHeaders.pl -series 2 -set: PatientName MODIFIED in place,
    // InstitutionName INSERTED (tag absent in the fixture), series 3
    // untouched, the stray text member carried through — all read back
    // from the REBUILT archive (write → tar → gzip → tar → parse)
    "q136_update_headers" -> { (s, _) =>
      import graft.sources.{SyntheticFixtures, TarSink}
      val dir = graft.sources.SyntheticFixtures.freshDir("q136")
      def slice(series: Int, instance: Int): Array[Byte] =
        SyntheticFixtures.dicomBytes(Seq(
          SyntheticFixtures.dicomElem(0x0008, 0x0020, "DA", "20240102"),
          SyntheticFixtures.dicomElem(0x0008, 0x0060, "CS", "MR"),
          SyntheticFixtures.dicomElem(0x0010, 0x0010, "PN", "SUB^ONE"),
          SyntheticFixtures.dicomElem(0x0010, 0x0020, "LO", "SUB001"),
          SyntheticFixtures.dicomElem(0x0020, 0x000D, "UI", "1.2.3.9000"),
          SyntheticFixtures.dicomElem(0x0020, 0x000E, "UI",
            s"1.2.3.9000.$series"),
          SyntheticFixtures.dicomElem(0x0020, 0x0011, "IS", series.toString),
          SyntheticFixtures.dicomElem(0x0020, 0x0013, "IS",
            instance.toString)))
      val inner = TarSink.tarBytes(Seq(
        "study/" -> Array.emptyByteArray,
        "study/001.dcm" -> slice(2, 1),
        "study/002.dcm" -> slice(2, 2),
        "study/003.dcm" -> slice(3, 1)))
      val outer = TarSink.tarBytes(Seq(
        "upload/notes.txt" -> "operator log".getBytes("US-ASCII"),
        "upload/study.tar.gz" -> TarSink.gzipBytes(inner)))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "DCM_q136.tar"), outer)
      graft.operators.HeaderUpdater.reparse(
        graft.operators.HeaderUpdater.updateArchives(s, dir,
          sets = Seq("PatientName" -> "FOO^BAR", "(0008,0080)" -> "BIC"),
          targetSeries = Some(2), glob = "*.tar"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q127_relativize_archive" ->
      """WITH t AS (
        |  SELECT o_orderkey AS tarchive_id,
        |    CASE WHEN o_orderkey % 3 = 0
        |      THEN '/data/tarchive/' || CAST(o_custkey AS VARCHAR)
        |        || '/DCM_' || CAST(o_orderkey AS VARCHAR) || '.tar'
        |    WHEN o_orderkey % 3 = 1
        |      THEN 'DCM_' || CAST(o_orderkey AS VARCHAR) || '.tar'
        |    ELSE 'x/data/tarchive/DCM_' || CAST(o_orderkey AS VARCHAR)
        |      || '.tar' END AS archive_location
        |  FROM orders WHERE o_orderkey < 200)
        |SELECT tarchive_id, archive_location,
        |  replace(replace(archive_location, '/data/tarchive/', ''),
        |          '/data/tarchive', '') AS new_archive_location
        |FROM t""".stripMargin,

    "q128_relativize_db_paths" ->
      """SELECT * FROM (VALUES
        |  ('files', CAST(1 AS BIGINT), CAST(NULL AS VARCHAR),
        |   '/data/assembly/t1.mnc', 'assembly/t1.mnc'),
        |  ('files', 2, NULL, '/DATA/assembly/t2.mnc', 'assembly/t2.mnc'),
        |  ('files', 4, NULL, '/data/sub/data/x.mnc', 'sub/data/x.mnc'),
        |  ('files', 5, NULL, '/database/y.mnc', '/database/y.mnc'),
        |  ('parameter_file', 1, 'check_pic_filename', '/data/pic/t1.png',
        |   'pic/t1.png'),
        |  ('parameter_file', 2, 'tarchiveLocation', '/DATA/tarchive/a.tar',
        |   'tarchive/a.tar')
        |) AS t(table_name, file_id, param_name, old_path, new_path)""".stripMargin,

    "q129_tarchive_cleanup" ->
      """SELECT * FROM (VALUES
        |  ('2024/DCM_A.tar', '/tank/2024/DCM_A.tar', 'match'),
        |  ('2024/DCM_A.tar', '/tank/2023/DCM_A.tar', 'remove_duplicate'),
        |  ('2024/DCM_B.tar', '/tank/2024/DCM_B.tar', 'keep_no_real'),
        |  ('2024/DCM_C.tar', CAST(NULL AS VARCHAR), 'no_fs_match'),
        |  ('2024/DCM_D_1.tar', '/tank/2024/DCM_D_1.tar', 'match'),
        |  ('2024/DCM_D_1.tar', '/tank/2024/DCM_D_2.tar', 'remove_duplicate')
        |) AS t(archive_location, fs_path, status)""".stripMargin,

    "q130_dwi_sidecars" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'a/dwi25.mnc', 'a/dwi25.bval',
        |   '0. 1000. 2000', 'a/dwi25.bvec',
        |   '0.10.2' || chr(10) || '0.3' || chr(10) || '0.5' || chr(10)),
        |  (2, 'a/dwi65.mnc', 'a/dwi65.bval', '5', CAST(NULL AS VARCHAR),
        |   CAST(NULL AS VARCHAR)),
        |  (3, 'a/noscan.mnc', NULL, NULL, NULL, NULL),
        |  (4, 'a/dwi0.mnc', NULL, NULL, NULL, NULL)
        |) AS t(file_id, file, bval_filename, bval_content, bvec_filename,
        |       bvec_content)""".stripMargin,

    "q131_snr_backpopulate" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 't1w', '52.1', 'snr_set'),
        |  (2, 't1w', '48.0', 'snr_updated'),
        |  (3, 't2w', '33.0', 'snr_set'),
        |  (4, 't1w', CAST(NULL AS VARCHAR), 'snr_empty'),
        |  (5, 'dwi', NULL, 'unsupported_modality')
        |) AS t(file_id, scan_type, snr, action)""".stripMargin,

    "q132_violation_trashbin" ->
      """SELECT * FROM (VALUES
        |  ('MRICandidateErrors', CAST(101 AS BIGINT), 'assembly/s1/v1.mnc',
        |   'trashbin/s1/v1.mnc'),
        |  ('mri_protocol_violated_scans', 201, 'assembly/s2/v2.mnc',
        |   'trashbin/s2/v2.mnc'),
        |  ('mri_violations_log', 301, 'assembly/s3/v3.mnc', 'reg/a.mnc'),
        |  ('mri_violations_log', 302, 'assembly/s4/v4.mnc',
        |   CAST(NULL AS VARCHAR)),
        |  ('mri_violations_log', 303, 'assembly/s5/v5.mnc',
        |   'trashbin/s5/v5.mnc'),
        |  ('mri_violations_log', 304, 'assembly/s6/v6.mnc', 'reg/d_lo.mnc')
        |) AS t(table_name, row_id, old_path, new_path)""".stripMargin,

    "q133_seriesuid_report" ->
      """SELECT * FROM (VALUES
        |  ('U1', 'ep2d_dti', '10 (60)', '21 (1)', 'warning', '9001 (60)',
        |   'u1.mnc'),
        |  ('U2', 'AAHScout localizer', '11 (12)', '', '', 'exclude', ''),
        |  ('U3', '', '', '', '', '', ''),
        |  ('U4', 't1_mprage', '12 (176)', '22 (1)', '', '9002 (0)',
        |   'u4.mnc'),
        |  ('U5', 'dwi_b1000', '13 (60)', '31 (2)', '', '9003 (10)',
        |   'u5a.mnc')
        |) AS t(series_uid, series_description, tarchive_id, m_p_v_s_id,
        |       mri_v_log, file_id, file_name)""".stripMargin,

    "q134_dicom_file_select" ->
      """SELECT * FROM (VALUES
        |  (CAST(10 AS BIGINT), 'assembly/1/AAA001_111111_V1_t1w_001.mnc',
        |   'IM-0001.dcm', 'm1', '111111/V1/2024-01-05/t1w_001_t1 mprage'),
        |  (10, 'assembly/1/AAA001_111111_V1_t1w_001.mnc', 'IM-0002.dcm',
        |   'm2', '111111/V1/2024-01-05/t1w_001_t1 mprage')
        |) AS t(tarchive_id, minc_file, dicom_file, md5sum, out_dir)""".stripMargin,

    "q136_update_headers" ->
      """SELECT * FROM (VALUES
        |  ('study/001.dcm', '2', 'FOO^BAR', 'SUB001', 'BIC'),
        |  ('study/002.dcm', '2', 'FOO^BAR', 'SUB001', 'BIC'),
        |  ('study/003.dcm', '3', 'SUB^ONE', 'SUB001', CAST(NULL AS VARCHAR))
        |) AS t(member_path, series_number, patient_name, patient_id,
        |       institution)""".stripMargin
  )
}
