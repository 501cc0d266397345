package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

object SrpSignatures {
  /** All SRP-LSH band signatures of one vector in a single plain-Java
    * pass: bit j of band b is set iff vec · plane(b·bitsPerBand + j) > 0.
    * Dot products sum LEFT-TO-RIGHT in index order — bit-identical to the
    * declarative `rpSignature` chain (`DotDoubleExpr` over a constant
    * plane literal), whose per-plane expression tree this fuses.
    * `flatPlanes` is row-major: plane p occupies [p·dim, (p+1)·dim). */
  def compute(vec: ArrayData, flatPlanes: Array[Double], bands: Int,
      bitsPerBand: Int, dim: Int): ArrayData = {
    // a malformed row shorter than the plane dimension must not read past
    // the array end (UnsafeArrayData reads adjacent memory SILENTLY with
    // asserts off; generic arrays throw) — missing coordinates are 0.0,
    // the DotDouble.dot min() discipline
    val lim = math.min(dim, vec.numElements())
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var j = 0
      while (j < bitsPerBand) {
        val off = (b * bitsPerBand + j) * dim
        var d = 0.0
        var i = 0
        while (i < lim) {
          d += vec.getDouble(i) * flatPlanes(off + i)
          i += 1
        }
        if (d > 0) sig |= 1L << j
        j += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** `srp_signatures(vec) -> array<bigint>`: the fused all-bands SRP-LSH
  * signature of [[graft.operators.Similarity]]'s banded candidate
  * generators. The declarative form (bands × bitsPerBand separate
  * `DotDoubleExpr(vec, lit(plane))` trees summed into per-band longs)
  * is semantically identical but generates kilobytes of code per plane —
  * a multi-second janino compile charged to every stage the signature
  * appears in. This fuses the whole matrix–vector sign pass into one
  * call; SimilaritySpec pins the equivalence. */
case class SrpSignaturesExpr(child: Expression, planes: Seq[Seq[Double]],
    bands: Int, bitsPerBand: Int) extends UnaryExpression {

  require(planes.length == bands * bitsPerBand,
    s"need ${bands * bitsPerBand} planes, got ${planes.length}")

  private lazy val dim = planes.head.length
  @transient private lazy val flat: Array[Double] = planes.flatten.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_signatures requires array<double> input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    SrpSignatures.compute(input.asInstanceOf[ArrayData], flat, bands,
      bitsPerBand, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("flatPlanes", flat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.SrpSignatures.compute($c, $flatRef, " +
        s"$bands, $bitsPerBand, $dim)")
  }

  override protected def withNewChildInternal(c: Expression): SrpSignaturesExpr =
    copy(child = c)
  override def prettyName: String = "srp_signatures"
}
