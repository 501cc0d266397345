package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Static helpers referenced from generated code. */
object HashExprs {
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(bytes) as a non-negative Long — numerically
    * identical to parsing the first 15 hex chars of the digest
    * (big-endian nibbles: first 8 bytes as BE u64, >>> 4). */
  def md5Prefix60(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Full first 64 bits of md5(bytes) as the raw (signed) Long bit
    * pattern — numerically identical to parsing the first 16 hex chars of
    * the digest as an unsigned 64-bit integer. DuckDB twin:
    * `CAST(concat('0x', substr(md5(s), 1, 16)) AS UBIGINT)` (bit-level
    * equal; only the signedness of the container differs, which every
    * consumer masks away). */
  def md5Prefix64(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v
  }
}

/** Codegen'd form of [[graft.functions.TextFunctions.portableHash60]]:
  * computes the 60-bit md5-prefix hash straight from the digest bytes —
  * no hex-string materialization, no base-16 `conv` parse. Semantics are
  * bit-identical to `conv(substring(md5(x),1,15),16,10)` (spec-checked), so
  * DuckDB oracles keep using the hex form.
  *
  * This is the hot inner op of shingle hashing (Dedup/MinHash/SimHash): at
  * 100 TB it runs per shingle per document, so it participates in
  * whole-stage codegen rather than falling back to interpreted eval. */
case class Md5Prefix60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_prefix60 requires binary input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    HashExprs.md5Prefix60(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.HashExprs.md5Prefix60($c)")

  override protected def withNewChildInternal(c: Expression): Md5Prefix60 =
    copy(child = c)
  override def prettyName: String = "md5_prefix60"
}
