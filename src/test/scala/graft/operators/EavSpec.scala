package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EavSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pt = Seq(
    (1L, "acquisition:repetition_time", Some("RepetitionTime")),
    (2L, "acquisition:echo_time", Some("EchoTime")),
    (3L, "acquisition:slice_thickness", Option.empty[String])
  ).toDF("ParameterTypeID", "Name", "Alias")

  test("readParams: left join keeps unknown type ids with NULL name (File.pm:113)") {
    val pf = Seq((10L, 1L, "2300"), (10L, 2L, "2.98"), (11L, 99L, "?"))
      .toDF("FileID", "ParameterTypeID", "Value")
    val out = Eav.readParams(pf, pt).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2))).toSet
    assert(out == Set(
      (10L, Some("acquisition:repetition_time"), "2300"),
      (10L, Some("acquisition:echo_time"), "2.98"),
      (11L, None, "?")))
  }

  test("bidsToLorisRemap ADDS loris-named copies, keeps originals (imaging.py:531-553)") {
    val long = Seq((10L, "RepetitionTime", "2300"), (10L, "Unmapped", "x"))
      .toDF("FileID", "Name", "Value")
    val out = Eav.bidsToLorisRemap(long, pt).collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(out == Set(
      ("RepetitionTime", "2300"),
      ("acquisition:repetition_time", "2300"),
      ("Unmapped", "x")))
  }

  test("pivotParams: declared-set wide rows, missing params NULL") {
    val long = Seq(
      (10L, "acquisition:repetition_time", "2300"),
      (10L, "acquisition:echo_time", "2.98"),
      (11L, "acquisition:echo_time", "3.10"))
      .toDF("FileID", "Name", "Value")
    val out = Eav.pivotParams(long,
      Seq("acquisition:repetition_time", "acquisition:echo_time"))
      .orderBy(col("FileID")).collect()
    assert(out(0).getLong(0) == 10L && out(0).getString(1) == "2300" &&
      out(0).getString(2) == "2.98")
    assert(out(1).getLong(0) == 11L && out(1).isNullAt(1) &&
      out(1).getString(2) == "3.10")
  }
}
