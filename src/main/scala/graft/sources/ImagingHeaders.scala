package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** NIfTI / MINC header readers (SURVEY.md §2.1 S3/S4).
  *
  * Reference: `python/lib/imaging_lib/nifti.py:7-31` (shape x,y,z,t + voxel
  * steps via nibabel) and `uploadNeuroDB/NeuroDB/MincUtilities.pm:76-117`
  * (`mincheader` shell-out + field grep).
  *
  * The NIfTI-1 header is a fixed 348-byte struct — the dimension shorts and
  * pixdim floats live at fixed offsets, so the REAL header fields are
  * parseable with pure Column byte arithmetic (no codec): dim[0..4] are
  * little-endian int16 at offset 40, pixdim[1..3] float32 at offset 80.
  * Float decoding from bytes needs bit-casting not expressible as a
  * built-in; we surface the spatial dims (integers) for real and leave
  * voxel steps to the stub boundary, mirroring the Multimodal decode
  * posture.
  */
object ImagingHeaders {

  /** Little-endian uint16 read at 1-based byte offset `off` of a binary
    * column (pure Column arithmetic). */
  private def leShort(bin: Column, off: Int): Column =
    (conv(hex(substring(bin, off, 1)), 16, 10).cast("int")) +
      (conv(hex(substring(bin, off + 1, 1)), 16, 10).cast("int") * 256)

  /** Parse the real NIfTI-1 dim block: (ndim, x, y, z, t) from the fixed
    * 348-byte header (dim[] int16 LE at offset 40, 1-based 41). */
  def niftiDims(content: Column): Column = struct(
    leShort(content, 41).as("ndim"),
    leShort(content, 43).as("xspace"),
    leShort(content, 45).as("yspace"),
    leShort(content, 47).as("zspace"),
    leShort(content, 49).as("time"))

  /** NIfTI-1 magic check: "n+1\0" or "ni1\0" at offset 344 (1-based 345). */
  def isNifti(content: Column): Column =
    length(content) >= 348 &&
      substring(content, 345, 3).cast("string").isin("n+1", "ni1")

  /** S3: binaryFile scan + real dim parse + stubbed voxel steps (float
    * bit-cast needs a codec boundary; deterministic stand-in documented). */
  def readNiftiHeaders(scanned: DataFrame): DataFrame =
    scanned.select(
      col("path").as("file_path"),
      isNifti(col("content")).as("is_nifti"),
      niftiDims(col("content")).as("dims"),
      // STUB voxel steps (real impl: Float.intBitsToFloat over pixdim bytes
      // in a small Expression); deterministic stand-in from byte length
      (pmod(length(col("content")), lit(40)) / 10.0 + 0.5).as("xstep_stub"))

  /** S4: MINC "header fetch" — the reference greps fields from `mincheader`
    * text output; the dataflow form is a regexp_extract over a text column
    * (field name as data). */
  def mincField(headerText: Column, field: String): Column =
    regexp_extract(headerText, field + "\\s*=\\s*([-0-9.eE]+)", 1)
      .cast("double")
}
