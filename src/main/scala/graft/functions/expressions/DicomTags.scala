package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{BinaryType, DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object DicomTags {
  /** Bridge for both interpreted and generated code paths: parse the wanted
    * DICOM tags out of the raw file bytes into a Catalyst map. Null (not a
    * Part-10 DICOM) maps to null. */
  def parseToMap(bytes: Array[Byte]): MapData = {
    val m = graft.sources.DicomTagParser.parse(bytes)
    if (m == null) null
    else {
      val keys = new Array[AnyRef](m.size)
      val vals = new Array[AnyRef](m.size)
      var i = 0
      m.foreach { case (k, v) =>
        keys(i) = UTF8String.fromString(k)
        vals(i) = UTF8String.fromString(v)
        i += 1
      }
      new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
    }
  }
}

/** Codegen'd `dicom_tags(content) -> map<string,string>` over the
  * `binaryFile` content column: the 26 per-file summary fields of
  * `dicom-archive/DICOM/DCMSUM.pm:751-817`, parsed by the zero-dependency
  * explicit/implicit-VR walker [[graft.sources.DicomTagParser]]. Returns
  * null for non-DICOM bytes. */
case class DicomTagsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MapType(StringType, StringType, valueContainsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"dicom_tags requires binary input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    DicomTags.parseToMap(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.expressions.DicomTags.parseToMap($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): DicomTagsExpr =
    copy(child = c)
  override def prettyName: String = "dicom_tags"
}
