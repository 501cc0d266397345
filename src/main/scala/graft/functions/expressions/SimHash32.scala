package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object SimHash32 {
  /** 32-bit SimHash of whitespace tokens in one plain-Java pass —
    * semantically identical to the declarative
    * `TextFunctions.simhash32(tokens(text))` chain (trim, split on `\s+`,
    * md5-prefix60 per token, ±1 per bit position, bit set iff sum > 0),
    * which evaluates as an interpreted `aggregate` HOF with a 32-element
    * `zip_with` and an md5 sub-eval per token. Spec-pinned equivalence:
    * SimHash32Spec. */
  def compute(text: UTF8String): Long = {
    val toks = text.toString.trim.split("\\s+")
    val sums = new Array[Long](32)
    var i = 0
    while (i < toks.length) {
      val h = HashExprs.md5Prefix60(
        toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var j = 0
      while (j < 32) {
        sums(j) += ((h >>> j) & 1L) * 2L - 1L
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) {
      if (sums(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }
}

/** Codegen'd `simhash32(text) -> bigint`: the fused tokenize→hash→bit-vote
  * pipeline of the SimHash dedup operators (q28 fingerprints, q54 banded
  * near-dup). Fusing matters for the same reason as [[ShingleHashesExpr]]:
  * higher-order functions never enter whole-stage codegen, so the
  * declarative chain runs interpreted per token with a 32-wide array
  * allocation per step — the hot per-document stage at 100 TB. */
case class SimHash32Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires string input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.SimHash32.compute($c)")

  override protected def withNewChildInternal(c: Expression): SimHash32Expr =
    copy(child = c)
  override def prettyName: String = "simhash32"
}
