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
  * Float decoding from bytes needs a bit-cast not expressible as a
  * built-in — [[graft.functions.expressions.Float32LEExpr]] supplies it, so
  * voxel steps (pixdim[1..3], float32 LE at 0-based offsets 80/84/88) are
  * parsed for real alongside the integer dims.
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

  /** Float32 LE read at 0-based offset (NIfTI floats are packed LE on every
    * modern producer; the dim-endianness probe of nifti.py applies to
    * byte-swapped legacy files, detectable via dim[0] ∉ [1,7]). */
  private def leFloat(bin: Column, off0: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.expressions.Float32LEExpr(
      GraftColumnBridge.expression(bin), off0))
  }

  /** REAL voxel steps: pixdim[1..3] float32 LE at 0-based offsets 80/84/88
    * (`python/lib/imaging_lib/nifti.py:14-18`). */
  def niftiPixdim(content: Column): Column = struct(
    leFloat(content, 80).as("xstep"),
    leFloat(content, 84).as("ystep"),
    leFloat(content, 88).as("zstep"))

  /** S3: binaryFile scan + real dim parse + REAL voxel steps — pixdim[1..3]
    * float32 bit-cast from the fixed header offsets
    * (`python/lib/imaging_lib/nifti.py:7-31`). */
  def readNiftiHeaders(scanned: DataFrame): DataFrame =
    scanned.select(
      col("path").as("file_path"),
      isNifti(col("content")).as("is_nifti"),
      niftiDims(col("content")).as("dims"),
      leFloat(col("content"), 80).as("xstep"),
      leFloat(col("content"), 84).as("ystep"),
      leFloat(col("content"), 88).as("zstep"))

  /** S4: MINC "header fetch" — the reference greps fields from `mincheader`
    * text output; the dataflow form is a regexp_extract over a text column
    * (field name as data). */
  def mincField(headerText: Column, field: String): Column =
    // try_cast: a header without the field extracts "" — under ANSI mode a
    // plain cast would fail the whole scan stage instead of yielding NULL
    regexp_extract(headerText, field + "\\s*=\\s*([-0-9.eE]+)", 1)
      .try_cast(org.apache.spark.sql.types.DoubleType)
}
