package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BLAKE2b (RFC 7693), the reference's file-content hash
  * (`python/lib/utilities.py:210-234`, `nifti_insertion_pipeline.py:52-64`
  * via hashlib.blake2b) — not available as a Spark built-in or in the JDK,
  * hence a custom Catalyst `Expression` (SURVEY.md §7.3).
  *
  * Unkeyed, sequential mode, 64-byte digest (hashlib default); output is
  * the lowercase hex digest, byte-compatible with
  * `hashlib.blake2b(data).hexdigest()` (validated against hashlib vectors
  * in Blake2bSpec).
  */
object Blake2bCore {

  private val IV = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  private val SIGMA: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0))

  @inline private def rotr(x: Long, n: Int): Long = (x >>> n) | (x << (64 - n))

  private def compress(h: Array[Long], block: Array[Byte], off: Int,
      t: Long, last: Boolean): Unit = {
    val m = new Array[Long](16)
    var i = 0
    while (i < 16) {
      var w = 0L
      var j = 7
      while (j >= 0) { w = (w << 8) | (block(off + i * 8 + j) & 0xffL); j -= 1 }
      m(i) = w
      i += 1
    }
    val v = new Array[Long](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV, 0, v, 8, 8)
    v(12) ^= t
    // t is tracked as a Long: inputs > 2^63 bytes are out of scope
    if (last) v(14) = ~v(14)

    @inline def g(a: Int, b: Int, c: Int, d: Int, x: Long, y: Long): Unit = {
      v(a) = v(a) + v(b) + x
      v(d) = rotr(v(d) ^ v(a), 32)
      v(c) = v(c) + v(d)
      v(b) = rotr(v(b) ^ v(c), 24)
      v(a) = v(a) + v(b) + y
      v(d) = rotr(v(d) ^ v(a), 16)
      v(c) = v(c) + v(d)
      v(b) = rotr(v(b) ^ v(c), 63)
    }

    var r = 0
    while (r < 12) {
      val s = SIGMA(r % 10)
      g(0, 4, 8, 12, m(s(0)), m(s(1)))
      g(1, 5, 9, 13, m(s(2)), m(s(3)))
      g(2, 6, 10, 14, m(s(4)), m(s(5)))
      g(3, 7, 11, 15, m(s(6)), m(s(7)))
      g(0, 5, 10, 15, m(s(8)), m(s(9)))
      g(1, 6, 11, 12, m(s(10)), m(s(11)))
      g(2, 7, 8, 13, m(s(12)), m(s(13)))
      g(3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  /** Digest of `input`, `outLen` bytes (1..64). */
  def digest(input: Array[Byte], outLen: Int = 64): Array[Byte] = {
    require(outLen >= 1 && outLen <= 64)
    val h = IV.clone()
    h(0) ^= 0x01010000L ^ outLen.toLong
    var off = 0
    var t = 0L
    while (input.length - off > 128) {
      t += 128
      compress(h, input, off, t, last = false)
      off += 128
    }
    val block = new Array[Byte](128)
    val rem = input.length - off
    if (rem > 0) System.arraycopy(input, off, block, 0, rem)
    t += rem
    compress(h, block, 0, t, last = true)

    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) {
      out(i) = ((h(i / 8) >>> (8 * (i % 8))) & 0xff).toByte
      i += 1
    }
    out
  }

  def hexDigest(input: Array[Byte], outLen: Int = 64): String =
    digest(input, outLen).map(b => f"${b & 0xff}%02x").mkString
}

/** Catalyst scalar expression: blake2b hex digest of a binary column.
  * Interpreted eval (CodegenFallback) — the hash itself dominates cost, and
  * the fallback keeps the surrounding stage in codegen. */
case class Blake2b(child: Expression, outLen: Int = 64)
    extends UnaryExpression with CodegenFallback {
  // fail at construction, not per-row mid-query on the first evaluation
  require(outLen >= 1 && outLen <= 64, s"blake2b outLen 1..64, got $outLen")
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"blake2b requires binary input, got ${child.dataType}")
  }
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Blake2bCore.hexDigest(v.asInstanceOf[Array[Byte]], outLen))
  override protected def withNewChildInternal(c: Expression): Blake2b = copy(child = c)
  override def prettyName: String = "blake2b"
}

object Blake2b {
  /** Column form; accepts string or binary input. */
  def blake2b(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(Blake2b(GraftColumnBridge.expression(c.cast("binary"))))
  }
}
