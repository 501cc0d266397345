package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class DicomSourceSpec extends SparkSpec {

  test("binaryFile scan + DICM magic detection + stub extraction") {
    val dir = Files.createTempDirectory("dicom")
    val sub = Files.createDirectory(dir.resolve("series1"))
    // a real DICOM Part 10 shape: 128-byte preamble + "DICM"
    val dicom = new Array[Byte](200)
    System.arraycopy("DICM".getBytes, 0, dicom, 128, 4)
    Files.write(sub.resolve("img1.dcm"), dicom)
    Files.write(dir.resolve("README.txt"), "not a dicom".getBytes)

    val scanned = DicomSource.scanDir(spark, dir.toString)
    assert(scanned.count() == 2) // recursive
    val out = DicomSource.extractHeaderStub(scanned).collect()
      .map(r => (r.getAs[String]("file_path").split("/").last,
        r.getAs[Boolean]("is_dicom"))).toMap
    assert(out("img1.dcm"))
    assert(!out("README.txt"))
  }
}
