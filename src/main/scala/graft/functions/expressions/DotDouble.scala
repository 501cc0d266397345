package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

object DotDouble {
  /** Sequential left-to-right dot product — bit-identical to
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` (IEEE-754 addition is
    * order-sensitive; both forms accumulate in index order, so the two are
    * interchangeable under the repo's cross-engine hash-match discipline)
    * but zero allocation and codegen-resident instead of two interpreted
    * higher-order passes + a materialized product array per row pair. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

/** Codegen'd dot product of two `array<double>` columns. The hot inner op of
  * every embedding operator (cosine KNN, near-dup, IVF probe) — at 100 TB it
  * runs per (corpus row × query) pair, so it must be allocation-free and
  * whole-stage-codegen resident. */
case class DotDoubleExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_double requires array<double> inputs, got ($l, $r)")
    }

  // length mismatch -> NULL, matching the zip_with twin (whose padded
  // nulls null the whole aggregate): a truncated embedding must surface
  // as null, never as a plausible-but-partial score that silently
  // corrupts KNN/near-dup rankings
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) null
    else DotDouble.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.expressions.DotDouble.dot($a, $b); }
       """.stripMargin)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotDoubleExpr = copy(left = l, right = r)
  override def prettyName: String = "dot_double"
}
