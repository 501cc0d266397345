package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object ShingleHashes {
  /** Distinct 60-bit hashes of word n-gram shingles of `text`, one pass in
    * plain Java — semantically identical to the declarative
    * `array_distinct(transform(shingles(tokens(text), n), portableHash60))`
    * chain (split on `\s+` after trim, join with single spaces, md5-prefix
    * hash, first-occurrence dedup order), which evaluates as n interpreted
    * higher-order traversals + a per-element interpreted md5 sub-eval.
    * Spec-pinned equivalence: ShingleHashesSpec. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.trim.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(HashExprs.md5Prefix60(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** ALL shingle hashes in position order (no dedup) — for operators that
    * need gram POSITIONS (q160's span coverage), where the distinct form
    * loses the index. Element i is the hash of the shingle starting at
    * token i; semantically identical to the declarative
    * `transform(shingles(tokens(text), n), portableHash60)` (spec-pinned).
    */
  def computeAll(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.trim.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](toks.length - n + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = HashExprs.md5Prefix60(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd `shingle_hashes60(text) -> array<bigint>`: the fused
  * tokenize→shingle→hash→distinct pipeline of every dedup operator
  * (n-gram Jaccard, MinHash-LSH, doc fingerprints). Fusing matters because
  * the declarative chain cannot enter whole-stage codegen (higher-order
  * functions are interpreted) — measured as THE hot stage of the dedup
  * bench at sf0.1, and per-document cost at 100 TB. */
case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes60 requires string input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(c: Expression): ShingleHashesExpr =
    copy(child = c)
  override def prettyName: String = "shingle_hashes60"
}

/** Codegen'd `shingle_hashes60_all(text) -> array<bigint>`: the positional
  * (non-distinct) sibling of [[ShingleHashesExpr]] — element i hashes the
  * shingle at token i, so `posexplode` recovers gram positions for span
  * coverage without the interpreted higher-order chain. */
case class ShingleHashesAllExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes60_all requires string input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.computeAll(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.ShingleHashes.computeAll($c, $n)")

  override protected def withNewChildInternal(c: Expression): ShingleHashesAllExpr =
    copy(child = c)
  override def prettyName: String = "shingle_hashes60_all"
}
