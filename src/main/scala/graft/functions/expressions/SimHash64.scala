package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object SimHash64 {
  /** 64-bit SimHash of whitespace tokens in one plain-Java pass — the
    * wide-fingerprint sibling of [[SimHash32.compute]] (same trim, split
    * on `\s+`, md5-prefix hash per token, ±1 vote per bit position, bit
    * set iff sum > 0), but voting all 64 bits of
    * [[HashExprs.md5Prefix64]]. Bit 63 makes the fingerprint SIGNED; the
    * bit pattern is what matters (popcount-XOR hamming and band slicing
    * both mask), and the DuckDB twin assembles the identical two's
    * complement value. Spec-pinned: SimHash64Spec. */
  def compute(text: UTF8String): Long = {
    val toks = text.toString.trim.split("\\s+")
    val sums = new Array[Long](64)
    var i = 0
    while (i < toks.length) {
      val h = HashExprs.md5Prefix64(
        toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var j = 0
      while (j < 64) {
        sums(j) += ((h >>> j) & 1L) * 2L - 1L
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (sums(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }
}

/** Codegen'd `simhash64(text) -> bigint`: the 64-bit scale path of the
  * SimHash near-dup family. The 32-bit form ([[SimHash32Expr]], q54) pins
  * band-signature space at 2^8 per band, so bucket population — and the
  * within-bucket pair scan — grows linearly with the corpus once n
  * outruns ~256·2^8 docs. Doubling the fingerprint to 64 bits keeps the
  * SAME pigeonhole recall contract (exact for hamming ≤ bands−1) while
  * widening per-band signatures to 2^16 at bands=4, pushing the
  * quadratic onset out 256× (reference workload shape: SURVEY §2.11 R10;
  * scale analysis: docs/SCALE.md). */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires string input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.SimHash64.compute($c)")

  override protected def withNewChildInternal(c: Expression): SimHash64Expr =
    copy(child = c)
  override def prettyName: String = "simhash64"
}
