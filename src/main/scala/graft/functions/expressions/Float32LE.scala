package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

object Float32LE {
  /** Decode an IEEE-754 float32 stored little-endian at 0-based `off`;
    * Float.MinValue sentinel is never produced — out-of-bounds yields NaN
    * (mapped to null by the expression). */
  def read(b: Array[Byte], off: Int): Double = {
    // `off > b.length - 4`, not `off + 4 > b.length`: the latter wraps
    // negative for offsets near Int.MaxValue and would pass the check
    if (off < 0 || off > b.length - 4) return Double.NaN
    val bits = (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
    java.lang.Float.intBitsToFloat(bits).toDouble
  }
}

/** Codegen'd `float32_le(binary, offset) -> double`: bit-cast of a packed
  * little-endian float32 — the piece Column arithmetic can't express, needed
  * for the NIfTI-1 `pixdim` voxel steps (`python/lib/imaging_lib/nifti.py:
  * 7-31`; header floats at fixed offsets). Null when the buffer is too
  * short — AND for a genuinely-stored NaN payload (the two are conflated
  * deliberately: a NaN header float is garbage either way, and null keeps
  * the value out of every downstream comparison). */
case class Float32LEExpr(child: Expression, offset: Int) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"float32_le requires binary input, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val d = Float32LE.read(input.asInstanceOf[Array[Byte]], offset)
    if (d.isNaN) null else d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.expressions.Float32LE.read($c, $offset);
         |if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; ${ev.value} = 0.0; }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Float32LEExpr =
    copy(child = c)
  override def prettyName: String = "float32_le"
}
