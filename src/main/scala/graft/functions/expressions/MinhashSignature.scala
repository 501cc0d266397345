package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

object MinhashSignature {
  /** p = 2^31 - 1 (Mersenne prime); products a*(x mod p) stay within Long. */
  val Prime: Long = 2147483647L

  /** Single-pass minhash: one traversal of the shingle-hash array updating
    * all `k` per-hash minima — vs `k` separate `array_min(transform(...))`
    * passes (k interpreted traversals + k array allocations per row).
    * Returns null for an empty input (no shingles → no signature), matching
    * the declarative form's `when(size == 0, null)`. */
  def compute(arr: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val k = as.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      // floorMod, not %: the SQL-registered form accepts ANY array<bigint>,
      // and a negative input under plain % would go negative, win every
      // min, and silently diverge from the pmod() declarative twin
      val xm = java.lang.Math.floorMod(arr.getLong(i), Prime)
      var j = 0
      while (j < k) {
        val h = java.lang.Math.floorMod(as(j) * xm + bs(j), Prime)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Codegen'd single-pass MinHash signature over an `array<long>` of shingle
  * hashes (the [[Md5Prefix60]] outputs): element j = min over shingles x of
  * `(a_j * (x mod p) + b_j) mod p`, p = 2^31-1.
  *
  * Bit-identical to the declarative
  * `array(k × array_min(transform(sh, pmod(a*pmod(x,p)+b, p))))` form
  * (spec-checked) but one traversal instead of k interpreted higher-order
  * passes — the hot inner op of MinHash-LSH dedup, executed per document at
  * 100 TB, so it must live inside whole-stage codegen.
  *
  * Reference behavior (what to compute): near-dup detection over document
  * shingle sets; the hash family mirrors the standard universal-hash MinHash
  * construction (Broder '97), not any reference implementation.
  */
case class MinhashSig(child: Expression, as: Seq[Long], bs: Seq[Long])
    extends UnaryExpression {
  require(as.length == bs.length && as.nonEmpty, "as/bs must align, non-empty")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint> input, got $t")
  }

  @transient private lazy val asArr = as.toArray
  @transient private lazy val bsArr = bs.toArray

  override def nullSafeEval(input: Any): Any =
    MinhashSignature.compute(input.asInstanceOf[ArrayData], asArr, bsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", asArr, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bsArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.expressions.MinhashSignature.compute(
         |  $c, $asRef, $bsRef);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MinhashSig =
    copy(child = c)
  override def prettyName: String = "minhash_sig"
}
