package graft.catalog

import graft.SparkSpec
import java.nio.file.Files
import java.sql.{Date, Timestamp}
import org.apache.spark.sql.Encoders

/** Model ↔ schema alignment + typed parquet round-trips: the contract that
  * `df.as[T]` works on schema-conformant tables and that the declared
  * StructTypes match the case-class encoders field-for-field. */
class SchemasSpec extends SparkSpec {
  import Models._
  import spark.implicits._

  private def assertAligned[T](schema: org.apache.spark.sql.types.StructType)(
      implicit enc: org.apache.spark.sql.Encoder[T]): Unit = {
    val es = enc.schema
    assert(es.fieldNames.toSeq == schema.fieldNames.toSeq,
      s"field order/name mismatch: ${es.fieldNames.toSeq} vs ${schema.fieldNames.toSeq}")
    es.fields.zip(schema.fields).foreach { case (a, b) =>
      assert(a.dataType == b.dataType, s"${a.name}: ${a.dataType} != ${b.dataType}")
    }
  }

  test("case-class encoders align with declared StructTypes (names, order, types)") {
    assertAligned[Candidate](Schemas.candidate)(Encoders.product[Candidate])
    assertAligned[Session](Schemas.session)(Encoders.product[Session])
    assertAligned[FileRow](Schemas.files)(Encoders.product[FileRow])
    assertAligned[ParameterFileRow](Schemas.parameterFile)(Encoders.product[ParameterFileRow])
    assertAligned[ParameterTypeRow](Schemas.parameterType)(Encoders.product[ParameterTypeRow])
    assertAligned[TarchiveSeriesRow](Schemas.tarchiveSeries)(Encoders.product[TarchiveSeriesRow])
    assertAligned[TarchiveFileRow](Schemas.tarchiveFiles)(Encoders.product[TarchiveFileRow])
    assertAligned[MriUploadRow](Schemas.mriUpload)(Encoders.product[MriUploadRow])
    assertAligned[MriScannerRow](Schemas.mriScanner)(Encoders.product[MriScannerRow])
    assertAligned[MriProtocolCheckRow](Schemas.mriProtocolChecks)(Encoders.product[MriProtocolCheckRow])
  }

  test("typed rows round-trip through parquet and readTable") {
    val dir = Files.createTempDirectory("schemas").toString
    val cand = Candidate(1L, 123456, "DCC0001", None, Some(Date.valueOf("1990-05-15")),
      None, None, Some("Male"), 1, 1, None, Active = true, None, None, "admin",
      Some(Date.valueOf("2024-01-01")), Some(false), None, None, None,
      new Timestamp(1700000000000L), "Human", None, None)
    val ds = Seq(cand).toDS()
    ds.write.mode("overwrite").parquet(s"$dir/candidate")
    val back = Schemas.readTable(spark, s"$dir/candidate", "candidate")
      .as[Candidate].collect()
    assert(back.toSeq == Seq(cand))

    val pf = Seq(
      ParameterFileRow(1, 10, 100, Some("2300.0"), 1700000000L),
      ParameterFileRow(2, 10, 101, None, 1700000000L))
    pf.toDS().write.mode("overwrite").parquet(s"$dir/parameter_file")
    val pfBack = Schemas.readTable(spark, s"$dir/parameter_file", "parameter_file")
      .as[ParameterFileRow].collect()
    assert(pfBack.toSet == pf.toSet)
  }

  test("codecs decode the reference's decorator encodings") {
    val df = Seq(("Y", "true", "1", 1700000000L), ("n", "FALSE", "0", 0L),
      ("x", "?", "7", 5L)).toDF("yn", "tf", "ib", "ts")
    val out = df.select(
      Codecs.ynBool($"yn").as("b1"),
      Codecs.trueFalseBool($"tf").as("b2"),
      Codecs.intBool($"ib").as("b3"),
      Codecs.intDatetime($"ts").as("t")).collect()
    assert(out(0).getBoolean(0) && out(0).getBoolean(1) && out(0).getBoolean(2))
    assert(!out(1).getBoolean(0) && !out(1).getBoolean(1) && !out(1).getBoolean(2))
    assert(out(2).isNullAt(0) && out(2).isNullAt(1) && out(2).isNullAt(2))
    assert(out(0).getTimestamp(3).getTime == 1700000000000L)
  }
}
