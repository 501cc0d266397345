package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.EphysChunker
import graft.sources.{DicomSource, EdfReader, SyntheticFixtures, TarGzSource}

/** Binary-ingest verticals under the driver's correctness gate.
  *
  * The tar/DICOM and EDF sources have no parquet inputs in the testdata
  * dirs (they read raw archives/recordings), so these queries synthesize
  * byte-exact fixtures ([[SyntheticFixtures]]) at run time and pin the
  * verticals' outputs as constant oracle rows — the same pinning discipline
  * as the HED parser, giving the end-to-end ingest paths a three-check
  * CORRECTNESS row instead of spec-only coverage. Outputs carry only
  * relative member paths and exactly-representable numerics, so the rows
  * are environment- and float-stable. */
object IngestQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S12 + S1/S2 end to end: upload .tar -> nested .tar.gz -> DICOM tag
    // parse (imaging.py:1150-1174 into DCMSUM.pm:751-817)
    "q61_archive_ingest" -> { (s, _) =>
      val dir = SyntheticFixtures.materialize(
        "q61", "upload.tar", SyntheticFixtures.studyArchiveBytes())
      val files = TarGzSource.members(s, dir, glob = "*.tar").toDF()
        .filter(!col("is_dir"))
        .select(col("member_path"), col("nested_in"),
          col("member_path").as("path"), col("content"))
      DicomSource.extractHeaders(files.select(col("path"), col("content")))
        .join(files.select(col("member_path"), col("nested_in"),
          col("path").as("file_path")), Seq("file_path"))
        .select(col("member_path"), col("nested_in"), col("is_dicom"),
          col("study_uid"), col("series_number"), col("instance_number"),
          col("patient_id"), col("echo_time"), col("modality"))
    },

    // S14 end to end: EDF bytes -> calibrated channels -> long format ->
    // T1 chunk stats (edf_to_chunks.py into chunking.py)
    "q62_edf_ingest" -> { (s, _) =>
      val dir = SyntheticFixtures.materialize(
        "q62", "r1.edf", SyntheticFixtures.recordingBytes())
      EphysChunker.chunkStats(
        EdfReader.asLongFormat(EdfReader.channels(s, dir)), chunkSize = 4)
    }
  )

  val oracle: Map[String, String] = Map(
    "q61_archive_ingest" ->
      """SELECT * FROM (VALUES
        |  ('upload/notes.txt',   CAST(NULL AS VARCHAR),  false, CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER), CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR)),
        |  ('upload/study.tar.gz', CAST(NULL AS VARCHAR), false, CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER), CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR)),
        |  ('study/001.dcm', 'upload/study.tar.gz', true, '1.2.3.9000', 2, 1, 'SUB001', 25.5, 'MR'),
        |  ('study/002.dcm', 'upload/study.tar.gz', true, '1.2.3.9000', 2, 2, 'SUB001', 25.5, 'MR'),
        |  ('study/003.dcm', 'upload/study.tar.gz', true, '1.2.3.9000', 2, 3, 'SUB001', 50.0, 'MR')
        |) AS t(member_path, nested_in, is_dicom, study_uid, series_number,
        |       instance_number, patient_id, echo_time, modality)""".stripMargin,

    "q62_edf_ingest" ->
      """SELECT * FROM (VALUES
        |  ('C3', CAST(0 AS BIGINT), 4,  1.0,  4.0, false, 4),
        |  ('C3', CAST(1 AS BIGINT), 4,  5.0,  8.0, false, 4),
        |  ('C3', CAST(2 AS BIGINT), 4,  9.0, 12.0, true,  4),
        |  ('C4', CAST(0 AS BIGINT), 4,  5.0, 20.0, false, 4),
        |  ('C4', CAST(1 AS BIGINT), 2, 25.0, 30.0, true,  2)
        |) AS t(channel, chunk_index, n_samples, chunk_min, chunk_max,
        |       is_last, valid_samples)""".stripMargin
  )
}
