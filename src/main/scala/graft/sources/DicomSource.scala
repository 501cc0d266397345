package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DICOM directory source (SURVEY.md §2.1 S1/S2): the distributed form of
  * the reference's recursive per-file header scan
  * (`dicom-archive/DICOM/DCMSUM.pm:722-817`,
  * `python/loris_dicom_importer/.../summary_get.py:21-63`).
  *
  * `spark.read.format("binaryFile")` gives (path, modificationTime, length,
  * content) partition-parallel; header extraction is the STUB boundary —
  * this container carries no DICOM codec, so [[extractHeaderStub]] derives
  * deterministic pseudo-headers from the byte stream (magic check at offset
  * 128 is real DICOM structure: "DICM" preamble). A production build swaps
  * the stub for a real tag parser inside the same projection; everything
  * else (scan parallelism, md5, schema) is final.
  */
object DicomSource {

  /** Recursive binary scan of a directory tree. */
  def scanDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)

  /** Real part: DICM magic at offset 128 (DICOM Part 10 preamble). */
  def isDicomMagic(content: Column): Column =
    length(content) >= 132 &&
      substring(content, 129, 4).cast("string") === "DICM"

  /** STUB header extraction: deterministic pseudo-values from content bytes
    * (md5-derived). Swap for a real tag parser in production. */
  def extractHeaderStub(df: DataFrame): DataFrame = {
    val h = md5(col("content"))
    df.select(
      col("path").as("file_path"),
      md5(col("content")).as("md5"),
      isDicomMagic(col("content")).as("is_dicom"),
      lit("1.2.3.stub.study").as("study_uid"),
      (conv(substring(h, 1, 4), 16, 10).cast("int") % 16 + 1).as("series_number"),
      (conv(substring(h, 5, 4), 16, 10).cast("int") % 512 + 1).as("instance_number"),
      lit("MR").as("modality"))
  }
}
