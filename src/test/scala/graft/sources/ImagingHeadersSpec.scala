package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

class ImagingHeadersSpec extends SparkSpec {

  /** Build a real NIfTI-1 header: 348 bytes, dim[] at offset 40 LE,
    * magic "n+1\0" at 344. */
  private def niftiHeader(x: Int, y: Int, z: Int, t: Int,
      steps: (Float, Float, Float) = (1.0f, 1.0f, 1.0f)): Array[Byte] = {
    val b = ByteBuffer.allocate(360).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(0, 348) // sizeof_hdr
    b.putShort(40, 4.toShort)
    b.putShort(42, x.toShort)
    b.putShort(44, y.toShort)
    b.putShort(46, z.toShort)
    b.putShort(48, t.toShort)
    b.putFloat(80, steps._1) // pixdim[1..3]
    b.putFloat(84, steps._2)
    b.putFloat(88, steps._3)
    b.put(344, 'n'.toByte); b.put(345, '+'.toByte); b.put(346, '1'.toByte)
    b.array()
  }

  test("niftiDims + pixdim voxel steps parse the real NIfTI-1 header bytes") {
    val dir = Files.createTempDirectory("nifti")
    Files.write(dir.resolve("scan.nii"),
      niftiHeader(192, 256, 160, 1, (0.8f, 0.8f, 1.25f)))
    Files.write(dir.resolve("other.bin"), Array.fill[Byte](400)(7))
    val out = ImagingHeaders.readNiftiHeaders(
      DicomSource.scanDir(spark, dir.toString))
      .collect().map(r => (r.getString(0).split("/").last, r)).toMap
    val scan = out("scan.nii")
    assert(scan.getBoolean(1))
    val dims = scan.getStruct(2)
    assert((dims.getInt(1), dims.getInt(2), dims.getInt(3),
      dims.getInt(4)) == (192, 256, 160, 1))
    // float32 round-trip: 0.8f widens to the exact double of that float bit
    // pattern, like nibabel's float32 read (nifti.py:7-31)
    assert(scan.getAs[Double]("xstep") == 0.8f.toDouble)
    assert(scan.getAs[Double]("ystep") == 0.8f.toDouble)
    assert(scan.getAs[Double]("zstep") == 1.25f.toDouble)
    assert(!out("other.bin").getBoolean(1))
  }

  test("mincField greps numeric fields from header text") {
    import spark.implicits._
    val txt = "xspace:step = 1.5\nyspace:step = -0.97\nacquisition:echo_time = 0.012"
    val row = Seq(txt).toDF("h").select(
      ImagingHeaders.mincField(col("h"), "xspace:step").as("x"),
      ImagingHeaders.mincField(col("h"), "yspace:step").as("y"),
      ImagingHeaders.mincField(col("h"), "acquisition:echo_time").as("te"))
      .first()
    assert(row.getDouble(0) == 1.5 && row.getDouble(1) == -0.97 &&
      row.getDouble(2) == 0.012)
  }
}
