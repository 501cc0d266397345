package graft.sources

import scala.collection.mutable

/** Minimal DICOM Part-10 tag walker for the 26 summary fields the reference
  * reads per file (`dicom-archive/DICOM/DCMSUM.pm:751-817`,
  * `python/loris_dicom_importer/.../summary_get.py:21-63`). Pure byte
  * arithmetic — no codec dependency — so it runs inside an executor task
  * over the `binaryFile` content column.
  *
  * Supported encodings: explicit-VR little-endian (1.2.840.10008.1.2.1) and
  * implicit-VR little-endian (1.2.840.10008.1.2); every wanted tag has a
  * text VR (UI/IS/DS/DA/PN/LO/SH/CS), so values decode as ASCII either way.
  * Sequences (incl. undefined-length) are skipped structurally; the walk
  * stops at group 0x0020 (all wanted tags live at or below it), so pixel
  * data is never touched — per-file cost is the header bytes only,
  * regardless of image size.
  */
object DicomTagParser {

  /** tag (group << 16 | element) -> output field name; the DCMSUM element
    * list in its order. */
  val wantedTags: Map[Int, String] = Map(
    0x0020000D -> "study_uid",
    0x00200011 -> "series_number",
    0x00180086 -> "echo_number",
    0x00200013 -> "instance_number",
    0x00180080 -> "repetition_time",
    0x00180081 -> "echo_time",
    0x00180082 -> "inversion_time",
    0x00080020 -> "study_date",
    0x00100010 -> "patient_name",
    0x00100030 -> "patient_dob",
    0x00100020 -> "patient_id",
    0x0008103E -> "series_description",
    0x00100040 -> "patient_sex",
    0x00081090 -> "scanner_model",
    0x00181020 -> "software_version",
    0x00080080 -> "institution",
    0x00180024 -> "sequence_name",
    0x00180050 -> "slice_thickness",
    0x00181312 -> "phase_encoding",
    0x00080070 -> "manufacturer",
    0x00181000 -> "scanner_serial",
    0x0020000E -> "series_uid",
    0x00080060 -> "modality"
  )

  private val LongLenVRs = Set("OB", "OW", "OF", "OD", "OL", "SQ", "UT", "UN", "UC", "UR")

  private def u16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], p: Int): Long =
    (u16(b, p).toLong) | (u16(b, p + 2).toLong << 16)

  /** True when the Part-10 "DICM" magic is present at offset 128. */
  def hasMagic(b: Array[Byte]): Boolean =
    b.length >= 132 && b(128) == 'D' && b(129) == 'I' && b(130) == 'C' && b(131) == 'M'

  /** DICOM `trimwhitespace` + padding strip: text values are space-padded,
    * UIDs NUL-padded, to even length. */
  private def trimValue(b: Array[Byte], from: Int, len: Int): String = {
    var end = from + len
    while (end > from && (b(end - 1) == 0 || b(end - 1) == ' ')) end -= 1
    var start = from
    while (start < end && b(start) == ' ') start += 1
    new String(b, start, end - start, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** Skip the body of an undefined-length sequence starting at `pos`
    * (just after the 0xFFFFFFFF length field). Returns the position after
    * the (FFFE,E0DD) sequence delimiter, or -1 on structural overrun.
    * Items with undefined length recurse (nested sequences re-enter here
    * when encountered inside item datasets — handled by scanning nested
    * element structure would require full dataset parsing; instead items
    * and sequences both delimit with FFFE tags, and nesting is tracked by
    * depth counting over delimiter tags, which is sound because FFFE group
    * tags cannot appear inside element VALUES we skip by length). */
  private def skipUndefinedSequence(b: Array[Byte], pos0: Int, explicitVr: Boolean): Int = {
    var pos = pos0
    while (pos + 8 <= b.length) {
      val group = u16(b, pos)
      val elem = u16(b, pos + 2)
      if (group == 0xFFFE) {
        val len = u32(b, pos + 4)
        pos += 8
        if (elem == 0xE0DD) return pos // end of this sequence
        if (elem == 0xE000) {
          if (len == 0xFFFFFFFFL) {
            // undefined-length item: its content is a normal dataset — walk
            // elements until the (FFFE,E00D) item delimiter
            var p = pos
            var done = false
            while (!done && p + 8 <= b.length) {
              if (u16(b, p) == 0xFFFE && u16(b, p + 2) == 0xE00D) {
                p += 8; done = true
              } else {
                p = skipElement(b, p, explicitVr)
                if (p < 0) return -1
              }
            }
            pos = p
          } else {
            pos += len.toInt // defined-length item: content skipped wholesale
          }
        }
      } else {
        return -1 // malformed: non-item tag directly inside sequence body
      }
    }
    -1
  }

  /** Advance past one element starting at `pos`; returns next position or
    * -1 on overrun/malformed. */
  private def skipElement(b: Array[Byte], pos0: Int, explicitVr: Boolean): Int = {
    if (pos0 + 8 > b.length) return -1
    var pos = pos0 + 4 // past group/element
    var len = 0L
    var isSeqLike = false
    if (explicitVr) {
      val vr = new String(b, pos, 2, java.nio.charset.StandardCharsets.US_ASCII)
      if (LongLenVRs.contains(vr)) {
        if (pos + 8 > b.length) return -1
        len = u32(b, pos + 4); pos += 8
        isSeqLike = true
      } else {
        len = u16(b, pos + 2).toLong; pos += 4
      }
    } else {
      len = u32(b, pos); pos += 4
      isSeqLike = true // implicit VR: any element may carry undefined length
    }
    if (len == 0xFFFFFFFFL) {
      if (!isSeqLike) return -1
      skipUndefinedSequence(b, pos, explicitVr)
    } else {
      val next = pos + len
      if (next > b.length || next < pos) -1 else next.toInt
    }
  }

  /** Structural sequence skip, shared with [[DicomTagWriter]]. */
  private[sources] def skipUndefined(b: Array[Byte], pos: Int,
                                     explicitVr: Boolean): Int =
    skipUndefinedSequence(b, pos, explicitVr)

  /** Parse the wanted tags; null when the DICM magic is absent (caller
    * records the file as non-DICOM, like the reference's `$fileIsDicom`). */
  /** One described element: tag pair, VR ("" under implicit encoding),
    * value length (-1 for undefined-length sequences), the decoded text
    * value for text VRs (null for binary/sequence payloads), and the
    * DCMSUM field name when the tag is one of the 26 summary tags. */
  final case class DescribedElement(group: Int, element: Int, vr: String,
      vl: Long, value: String, field_name: String)

  private val TextVRs = Set("AE", "AS", "CS", "DA", "DS", "DT", "IS", "LO",
    "LT", "PN", "SH", "ST", "TM", "UI", "UT", "UC", "UR")

  /** `tools/dicomDescribe.pl` — `DICOM::DICOM::printContents`: the FULL
    * element walk of one file (file-meta group 0002 included), one row
    * per header element in tag order. Unlike [[parse]], this does not
    * stop at group 0x0020; it walks to end-of-bytes, skipping sequence
    * and pixel payloads structurally. Returns Nil for non-DICOM bytes
    * (the CLI would print nothing). */
  def describe(b: Array[Byte]): Seq[DescribedElement] = {
    if (!hasMagic(b)) return Nil
    val out = mutable.ArrayBuffer.empty[DescribedElement]
    var pos = 132
    var datasetExplicit = true
    // file-meta group (0002): always explicit LE
    while (pos + 8 <= b.length && u16(b, pos) == 0x0002) {
      val elem = u16(b, pos + 2)
      val vr = new String(b, pos + 4, 2, java.nio.charset.StandardCharsets.US_ASCII)
      val (len, vpos) =
        if (LongLenVRs.contains(vr)) (u32(b, pos + 8), pos + 12)
        else (u16(b, pos + 6).toLong, pos + 8)
      if (vpos + len > b.length) return out.toSeq
      val value = if (TextVRs.contains(vr)) trimValue(b, vpos, len.toInt)
        else null
      out += DescribedElement(0x0002, elem, vr, len, value, null)
      if (elem == 0x0010)
        datasetExplicit = trimValue(b, vpos, len.toInt) != "1.2.840.10008.1.2"
      pos = (vpos + len).toInt
    }
    while (pos + 8 <= b.length) {
      val group = u16(b, pos)
      val elem = u16(b, pos + 2)
      if (group == 0xFFFE) { pos += 8 } // stray item/delimiter header
      else {
        var vpos = pos + 4
        var len = 0L
        var vr = ""
        var longForm = false
        if (datasetExplicit) {
          vr = new String(b, vpos, 2, java.nio.charset.StandardCharsets.US_ASCII)
          if (LongLenVRs.contains(vr)) { len = u32(b, vpos + 4); vpos += 8; longForm = true }
          else { len = u16(b, vpos + 2).toLong; vpos += 4 }
        } else {
          len = u32(b, vpos); vpos += 4; longForm = true
        }
        val tag = (group << 16) | elem
        val name = wantedTags.get(tag).orNull
        if (len == 0xFFFFFFFFL) {
          if (!longForm) return out.toSeq
          out += DescribedElement(group, elem, vr, -1L, null, name)
          val next = skipUndefinedSequence(b, vpos, datasetExplicit)
          if (next < 0) return out.toSeq
          pos = next
        } else {
          if (vpos + len > b.length) return out.toSeq
          val value =
            if (datasetExplicit && TextVRs.contains(vr))
              trimValue(b, vpos, len.toInt)
            else if (!datasetExplicit && name != null)
              // implicit VR: decode the known text tags, as parse() does
              trimValue(b, vpos, len.toInt)
            else null
          out += DescribedElement(group, elem, vr, len, value, name)
          pos = (vpos + len).toInt
        }
      }
    }
    out.toSeq
  }

  def parse(b: Array[Byte]): Map[String, String] = {
    if (!hasMagic(b)) return null
    val out = mutable.Map.empty[String, String]
    var pos = 132
    var explicitVr = true // file meta group (0002) is always explicit LE
    var datasetExplicit = true
    // file meta: read (0002,0000) group length + (0002,0010) transfer syntax
    while (pos + 8 <= b.length && u16(b, pos) == 0x0002) {
      val elem = u16(b, pos + 2)
      val vr = new String(b, pos + 4, 2, java.nio.charset.StandardCharsets.US_ASCII)
      val (len, vpos) =
        if (LongLenVRs.contains(vr)) (u32(b, pos + 8), pos + 12)
        else (u16(b, pos + 6).toLong, pos + 8)
      if (vpos + len > b.length) return out.toMap
      if (elem == 0x0010) {
        val ts = trimValue(b, vpos, len.toInt)
        datasetExplicit = ts != "1.2.840.10008.1.2" // implicit LE; all else explicit
      }
      pos = (vpos + len).toInt
    }
    explicitVr = datasetExplicit
    var remaining = wantedTags.size
    while (pos + 8 <= b.length && remaining > 0) {
      val group = u16(b, pos)
      if (group > 0x0020 && group != 0xFFFE) return out.toMap // tags are ascending; done
      val elem = u16(b, pos + 2)
      val tag = (group << 16) | elem
      // resolve value position/length for the wanted-text-VR case
      var vpos = pos + 4
      var len = 0L
      var longForm = false
      if (group == 0xFFFE) {
        // stray item/delimiter at top level: skip its 8-byte header
        pos += 8
      } else {
        if (explicitVr) {
          val vr = new String(b, vpos, 2, java.nio.charset.StandardCharsets.US_ASCII)
          if (LongLenVRs.contains(vr)) { len = u32(b, vpos + 4); vpos += 8; longForm = true }
          else { len = u16(b, vpos + 2).toLong; vpos += 4 }
        } else {
          len = u32(b, vpos); vpos += 4; longForm = true
        }
        if (len == 0xFFFFFFFFL) {
          if (!longForm) return out.toMap
          val next = skipUndefinedSequence(b, vpos, explicitVr)
          if (next < 0) return out.toMap
          pos = next
        } else {
          if (vpos + len > b.length) return out.toMap
          wantedTags.get(tag).foreach { name =>
            out(name) = trimValue(b, vpos, len.toInt)
            remaining -= 1
          }
          pos = (vpos + len).toInt
        }
      }
    }
    out.toMap
  }
}
