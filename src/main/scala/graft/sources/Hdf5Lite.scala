package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Minimal HDF5 reader for MATLAB v7.3 MAT-files (SURVEY.md §2.1 S14):
  * the subset MATLAB's `-v7.3` writer (and `mne.io.read_raw_eeglab` via
  * h5py) actually exercises, parsed from the published HDF5 File Format
  * Specification with zero native dependencies — the same
  * byte-arithmetic class as [[CtfReader]]/[[EcatReader]]:
  *
  *  - superblock v0 behind a user block (MATLAB: 512 bytes of MAT header
  *    text; all file addresses are RELATIVE TO the base address),
  *  - version-1 object headers with continuation blocks,
  *  - old-style groups: symbol-table message → B-tree v1 + local heap +
  *    SNOD leaves,
  *  - dataspace v1 / datatype (fixed-point, float, reference classes) /
  *    data layout v3 (contiguous and chunked) / filter pipeline
  *    (deflate only) messages,
  *  - chunked data via B-tree v1 type-1 nodes, zlib-inflated with the
  *    JDK ([[EeglabReader.MaxInflatedBytes]]-style bounding),
  *  - object references (8-byte header addresses, MATLAB's struct-array
  *    field encoding).
  *
  * Out of scope (→ None, never a throw): superblock v2/v3, v2 object
  * headers, fractal-heap "new style" groups, non-deflate filters,
  * variable-length / compound datatypes. MATLAB does not emit these for
  * `.set` structs; a file that does fails CLOSED and
  * [[EeglabReader.scanAudit]] reports it.
  *
  * Everything is bounds-checked against the image and recursion-bounded:
  * untrusted bytes never kill a scan stage (same hardening contract as
  * the MAT v6 walker).
  */
object Hdf5Lite {

  /** Parsed dataset: HDF5 row-major dims + raw little-endian payload.
    * `dtypeClass` ∈ 0 fixed / 1 float / 7 reference; `elemSize` bytes;
    * `signed` is the fixed-point sign bit (datatype bit field bit 3) —
    * MATLAB writes char data as UNSIGNED 2-byte fixed-point and numeric
    * int16 as SIGNED, so the flag is what distinguishes them. */
  final case class HDataset(dims: Seq[Long], dtypeClass: Int, elemSize: Int,
      signed: Boolean, data: Array[Byte])
  final case class HGroup(children: Map[String, HObject])
  sealed trait HObject
  final case class HGroupObj(g: HGroup) extends HObject
  final case class HDatasetObj(d: HDataset) extends HObject

  private val Undef = -1L // 0xFFFF... reads as -1 in a signed long
  private val MaxObjects = 100000
  private val MaxDepth = 32
  private val MaxBytes = 512 << 20

  final class Img private[sources] (val bytes: Array[Byte], val base: Int) {
    // overflow-safe: every operand is first bounded by the image length,
    // so the subtraction below cannot wrap (a crafted 0x7FFF… address
    // must fail here, not truncate into a valid in-image index)
    def ok(addr: Long, len: Long): Boolean =
      addr >= 0 && len >= 0 && len <= bytes.length &&
        addr <= bytes.length.toLong - base - len
    def u8(a: Long): Int = bytes(base + a.toInt) & 0xFF
    def u16(a: Long): Int = u8(a) | (u8(a + 1) << 8)
    def u32(a: Long): Long =
      u16(a).toLong | (u16(a + 2).toLong << 16)
    def u64(a: Long): Long = u32(a) | (u32(a + 4) << 32)
    def ascii(a: Long, maxLen: Int): String = {
      val sb = new StringBuilder
      var i = 0L
      while (i < maxLen && ok(a + i, 1) && u8(a + i) != 0) {
        sb.append(u8(a + i).toChar); i += 1
      }
      sb.toString
    }
    def slice(a: Long, len: Int): Array[Byte] = {
      val out = new Array[Byte](len)
      System.arraycopy(bytes, base + a.toInt, out, 0, len)
      out
    }
  }

  /** Find the superblock: signature at the start of any power-of-two
    * offset (0, 512, 1024, …) per spec; MATLAB puts it at 512. */
  private def findSuperblock(bytes: Array[Byte]): Option[Int] = {
    val sig = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1A, '\n')
    def sigAt(off: Int): Boolean =
      bytes.length >= off + 8 && (0 until 8).forall(i => bytes(off + i) == sig(i))
    var off = 0
    while (off <= bytes.length - 8) {
      if (sigAt(off)) return Some(off)
      off = if (off == 0) 512 else off * 2
    }
    None
  }

  private final case class Message(mtype: Int, body: Long, size: Int)

  /** Collect a v1 object header's messages, following continuations. */
  private def messages(img: Img, addr: Long): Option[Seq[Message]] = {
    if (!img.ok(addr, 16)) return None
    if (img.u8(addr) != 1) return None // v1 headers only
    val nMsgs = img.u16(addr + 2)
    if (nMsgs < 0 || nMsgs > 4096) return None
    val out = Seq.newBuilder[Message]
    // blocks of (start, length); first block starts after prefix+4 pad
    var blocks = List((addr + 16, img.u32(addr + 8)))
    var read = 0
    while (blocks.nonEmpty && read < nMsgs) {
      val (start, len) = blocks.head
      blocks = blocks.tail
      var p = start
      val end = start + len
      while (read < nMsgs && p + 8 <= end) {
        if (!img.ok(p, 8)) return None
        val mtype = img.u16(p)
        val msize = img.u16(p + 2)
        if (!img.ok(p + 8, msize)) return None
        if (mtype == 0x0010 && msize >= 16) { // continuation
          blocks = blocks :+ (img.u64(p + 8), img.u64(p + 16))
        } else {
          out += Message(mtype, p + 8, msize)
        }
        read += 1
        p += 8 + msize
      }
    }
    Some(out.result())
  }

  private def inflate(in: Array[Byte]): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(in)
      val out = new java.io.ByteArrayOutputStream(math.min(in.length * 4, 1 << 20))
      val buf = new Array[Byte](64 * 1024)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) return None
        out.write(buf, 0, n)
        if (out.size() > MaxBytes) return None
      }
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** Walk a type-1 (raw data chunk) B-tree, collecting
    * (chunk origin coords, address, stored size). `budget` bounds TOTAL
    * node visits — depth alone would admit a crafted self-referencing
    * internal node with 65535^depth visits. */
  private def chunkEntries(img: Img, addr: Long, rank1: Int,
      depth: Int, budget: Array[Int]): Option[Seq[(Seq[Long], Long, Long)]] = {
    if (depth > MaxDepth || !img.ok(addr, 24)) return None
    budget(0) -= 1
    if (budget(0) < 0) return None
    if (img.ascii(addr, 4) != "TREE" || img.u8(addr + 4) != 1) return None
    val level = img.u8(addr + 5)
    val entries = img.u16(addr + 6)
    if (entries > 65535) return None
    val keySz = 8L + 8L * rank1
    val out = Seq.newBuilder[(Seq[Long], Long, Long)]
    var i = 0
    while (i < entries) {
      val keyAt = addr + 24 + i * (keySz + 8)
      val childAt = keyAt + keySz
      if (!img.ok(keyAt, keySz + 8)) return None
      val child = img.u64(childAt)
      if (level == 0) {
        val csize = img.u32(keyAt)
        val coords = (0 until rank1 - 1).map(d => img.u64(keyAt + 8 + 8L * d))
        out += ((coords, child, csize))
      } else {
        chunkEntries(img, child, rank1, depth + 1, budget) match {
          case Some(sub) => out ++= sub
          case None => return None
        }
      }
      i += 1
    }
    Some(out.result())
  }

  /** Read one dataset object given its parsed messages. */
  private def readDataset(img: Img, msgs: Seq[Message],
      budget: Array[Int]): Option[HDataset] = {
    var dims: Seq[Long] = null
    var dtClass = -1
    var elemSize = 0
    var signed = false
    var deflated = false
    var layout: Message = null
    msgs.foreach { m =>
      m.mtype match {
        case 0x0001 => // dataspace v1
          if (img.u8(m.body) == 1) {
            val rank = img.u8(m.body + 1)
            if (rank <= 8 && m.size >= 8 + 8 * rank)
              dims = (0 until rank).map(d => img.u64(m.body + 8 + 8L * d))
          } else if (img.u8(m.body) == 2) {
            // v2 (h5py default): version, rank, flags, type, dims
            val rank = img.u8(m.body + 1)
            if (rank <= 8 && m.size >= 4 + 8 * rank)
              dims = (0 until rank).map(d => img.u64(m.body + 4 + 8L * d))
          }
        case 0x0003 => // datatype
          dtClass = img.u8(m.body) & 0x0F
          signed = (img.u8(m.body + 1) & 0x08) != 0 // fixed-point sign bit
          elemSize = img.u32(m.body + 4).toInt
        case 0x000B => // filter pipeline: accept deflate-only
          val version = img.u8(m.body)
          val n = img.u8(m.body + 1)
          if (version != 1 && version != 2) return None
          // conservatively require every filter to be deflate (id 1);
          // ids live at varying offsets — scan the first filter only for
          // v1 (MATLAB writes exactly one) and fail closed otherwise
          if (n != 1) return None
          val id = if (version == 1) img.u16(m.body + 8) else img.u16(m.body + 2)
          if (id != 1) return None
          deflated = true
        case 0x0008 => layout = m
        case _ => ()
      }
    }
    if (dims == null || layout == null || elemSize <= 0 || elemSize > 64)
      return None
    val total = dims.product * elemSize
    if (total < 0 || total > MaxBytes) return None
    val v = img.u8(layout.body)
    if (v != 3) return None
    img.u8(layout.body + 1) match {
      case 1 => // contiguous: addr, size
        val addr = img.u64(layout.body + 2)
        val size = img.u64(layout.body + 10)
        if (addr == Undef)
          return Some(HDataset(dims, dtClass, elemSize, signed,
            new Array[Byte](total.toInt)))
        if (!img.ok(addr, math.min(size, total))) return None
        Some(HDataset(dims, dtClass, elemSize, signed,
          img.slice(addr, math.min(size, total).toInt)))
      case 2 => // chunked: rank+1, btree addr, chunk dims (u32 each)
        val rank1 = img.u8(layout.body + 2)
        if (rank1 != dims.length + 1) return None
        val btree = img.u64(layout.body + 3)
        val chunkDims = (0 until rank1 - 1)
          .map(d => img.u32(layout.body + 11 + 4L * d))
        if (chunkDims.exists(c => c <= 0 || c > Int.MaxValue)) return None
        val out = new Array[Byte](total.toInt)
        chunkEntries(img, btree, rank1, 0, budget) match {
          case None => return None
          case Some(entries) =>
            entries.foreach { case (origin, caddr, csize) =>
              if (!img.ok(caddr, csize)) return None
              val stored = img.slice(caddr, csize.toInt)
              val raw =
                if (deflated) inflate(stored).getOrElse(return None)
                else stored
              // scatter row-major chunk into row-major dataset
              val nElems = chunkDims.map(_.toLong).product
              if (raw.length < nElems * elemSize) return None
              var e = 0L
              while (e < nElems) {
                // element coords inside the chunk → global coords; edge
                // chunks carry out-of-bounds padding that is skipped
                var rem = e
                var inBounds = true
                val coord = new Array[Long](chunkDims.length)
                var dd = chunkDims.length - 1
                while (dd >= 0) {
                  coord(dd) = rem % chunkDims(dd) + origin(dd)
                  if (coord(dd) >= dims(dd)) inBounds = false
                  rem /= chunkDims(dd)
                  dd -= 1
                }
                if (inBounds) {
                  var l = 0L
                  var k = 0
                  while (k < dims.length) {
                    l = l * dims(k) + coord(k)
                    k += 1
                  }
                  System.arraycopy(raw, (e * elemSize).toInt, out,
                    (l * elemSize).toInt, elemSize)
                }
                e += 1
              }
            }
        }
        Some(HDataset(dims, dtClass, elemSize, signed, out))
      case _ => None
    }
  }

  /** Read an old-style group: B-tree v1 of SNOD leaves + local heap. */
  private def readGroup(img: Img, btree: Long, heap: Long, depth: Int,
      budget: Array[Int]): Option[HGroup] = {
    if (depth > MaxDepth || !img.ok(heap, 32)) return None
    if (img.ascii(heap, 4) != "HEAP") return None
    val heapData = img.u64(heap + 24)
    val children = Map.newBuilder[String, HObject]
    def walkTree(addr: Long, d: Int): Boolean = {
      if (d > MaxDepth || !img.ok(addr, 24)) return false
      budget(0) -= 1
      if (budget(0) < 0) return false
      if (img.ascii(addr, 4) != "TREE" || img.u8(addr + 4) != 0) return false
      val level = img.u8(addr + 5)
      val entries = img.u16(addr + 6)
      var i = 0
      while (i < entries) {
        if (!img.ok(addr + 24 + i * 16L, 24)) return false
        val child = img.u64(addr + 24 + 8 + i * 16L)
        if (level == 0) {
          if (!img.ok(child, 8) || img.ascii(child, 4) != "SNOD") return false
          val nSyms = img.u16(child + 6)
          var s = 0
          while (s < nSyms) {
            val ste = child + 8 + 40L * s
            if (!img.ok(ste, 40)) return false
            val nameOff = img.u64(ste)
            val objAddr = img.u64(ste + 8)
            val name = img.ascii(heapData + nameOff, 255)
            if (name != "#refs#") { // MATLAB's ref pool: resolved lazily
              readObject(img, objAddr, depth + 1, budget) match {
                case Some(o) => children += name -> o
                case None => return false
              }
            }
            s += 1
          }
        } else if (!walkTree(child, d + 1)) return false
        i += 1
      }
      true
    }
    if (!walkTree(btree, 0)) return None
    Some(HGroup(children.result()))
  }

  /** Read the object (group or dataset) whose v1 header is at `addr`. */
  def readObject(img: Img, addr: Long, depth: Int,
      budget: Array[Int]): Option[HObject] = {
    if (depth > MaxDepth) return None
    budget(0) -= 1
    if (budget(0) < 0) return None
    messages(img, addr).flatMap { msgs =>
      msgs.find(_.mtype == 0x0011) match {
        case Some(st) if st.size >= 16 =>
          readGroup(img, img.u64(st.body), img.u64(st.body + 8), depth, budget)
            .map(HGroupObj(_))
        case _ =>
          readDataset(img, msgs, budget).map(HDatasetObj(_))
      }
    }
  }

  /** Parse an HDF5 image into its root group. Any structural problem →
    * None. */
  def parse(bytes: Array[Byte]): Option[HGroup] = {
    try {
      findSuperblock(bytes).flatMap { sbOff =>
        val img = new Img(bytes, sbOff)
        if (img.u8(8) != 0) return None // superblock v0 only
        if (img.u8(13) != 8 || img.u8(14) != 8) return None // 8B offsets
        // root STE: after 24B fixed + 4×8B addresses; header addr at +8
        val rootHdr = img.u64(24 + 32 + 8)
        val budget = Array(MaxObjects)
        readObject(img, rootHdr, 0, budget) match {
          case Some(HGroupObj(g)) => Some(g)
          case _ => None
        }
      }
    } catch {
      case _: IndexOutOfBoundsException | _: ArithmeticException |
          _: NegativeArraySizeException | _: OutOfMemoryError => None
    }
  }

  /** Resolve an object-reference dataset's elements against the image:
    * each element is an 8-byte header address. Hardened HERE (not only in
    * callers): the hardening contract belongs to this layer, so the next
    * consumer cannot forget it. */
  def resolveRefs(img: Img, d: HDataset): Option[Seq[HObject]] = {
    try {
      if (d.dtypeClass != 7 || d.elemSize != 8) return None
      val b = ByteBuffer.wrap(d.data).order(ByteOrder.LITTLE_ENDIAN)
      val n = d.data.length / 8
      val budget = Array(MaxObjects)
      val out = Seq.newBuilder[HObject]
      var i = 0
      while (i < n) {
        readObject(img, b.getLong(i * 8), 0, budget) match {
          case Some(o) => out += o
          case None => return None
        }
        i += 1
      }
      Some(out.result())
    } catch {
      case _: IndexOutOfBoundsException | _: ArithmeticException |
          _: NegativeArraySizeException | _: OutOfMemoryError => None
    }
  }

  /** Parse + expose the image for reference resolution. */
  def parseWithImage(bytes: Array[Byte]): Option[(Img, HGroup)] = {
    try {
      findSuperblock(bytes).flatMap { sbOff =>
        val img = new Img(bytes, sbOff)
        if (img.u8(8) != 0) return None
        if (img.u8(13) != 8 || img.u8(14) != 8) return None
        val rootHdr = img.u64(24 + 32 + 8)
        readObject(img, rootHdr, 0, Array(MaxObjects)) match {
          case Some(HGroupObj(g)) => Some((img, g))
          case _ => None
        }
      }
    } catch {
      case _: IndexOutOfBoundsException | _: ArithmeticException |
          _: NegativeArraySizeException | _: OutOfMemoryError => None
    }
  }

  // numeric decoding helpers for consumers; fixed-point honors the sign
  // bit (int8 -10 must not decode as 246, and uint32 must not go
  // negative — the v6 walker distinguishes MiInt8/MiUInt8 the same way)
  def asDoubles(d: HDataset): Option[Array[Double]] = {
    val b = ByteBuffer.wrap(d.data).order(ByteOrder.LITTLE_ENDIAN)
    (d.dtypeClass, d.elemSize, d.signed) match {
      case (1, 8, _) => Some(Array.fill(d.data.length / 8)(b.getDouble()))
      case (1, 4, _) => Some(Array.fill(d.data.length / 4)(b.getFloat().toDouble))
      case (0, 8, true) => Some(Array.fill(d.data.length / 8)(b.getLong().toDouble))
      case (0, 8, false) => Some(Array.fill(d.data.length / 8) {
        val v = b.getLong()
        if (v >= 0) v.toDouble else v.toDouble + 1.8446744073709552E19
      })
      case (0, 4, true) => Some(Array.fill(d.data.length / 4)(b.getInt().toDouble))
      case (0, 4, false) => Some(Array.fill(d.data.length / 4)((b.getInt().toLong & 0xFFFFFFFFL).toDouble))
      case (0, 2, true) => Some(Array.fill(d.data.length / 2)(b.getShort().toDouble))
      case (0, 2, false) => Some(Array.fill(d.data.length / 2)((b.getShort() & 0xFFFF).toDouble))
      case (0, 1, true) => Some(Array.fill(d.data.length)(b.get().toDouble))
      case (0, 1, false) => Some(Array.fill(d.data.length)((b.get() & 0xFF).toDouble))
      case _ => None
    }
  }

  /** MATLAB chars are UNSIGNED 2-byte fixed-point; a SIGNED 2-byte
    * dataset is int16 numeric data, not text. */
  def isCharLike(d: HDataset): Boolean =
    (d.dtypeClass == 0 && d.elemSize == 2 && !d.signed) || d.dtypeClass == 3

  def asString(d: HDataset): Option[String] =
    if (d.dtypeClass == 0 && d.elemSize == 2 && !d.signed) {
      val b = ByteBuffer.wrap(d.data).order(ByteOrder.LITTLE_ENDIAN)
      Some(new String(Array.fill(d.data.length / 2)(b.getShort().toChar)))
    } else if (d.dtypeClass == 3 || (d.dtypeClass == 0 && d.elemSize == 1)) {
      Some(new String(d.data.takeWhile(_ != 0), US_ASCII))
    } else None

  type Image = Img
}
