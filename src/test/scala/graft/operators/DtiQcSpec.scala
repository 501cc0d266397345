package graft.operators

import graft.SparkSpec

class DtiQcSpec extends SparkSpec {

  test("parseEntries: nested entry paths, repeated value leaves in " +
      "document order, unparseable XML and DOCTYPE yield no rows") {
    val rows = DtiQc.parseEntries(
      """<p><entry parameter="A"><value>1</value><value>2</value>
        |<entry parameter="B"><processing>X</processing></entry>
        |</entry></p>""".stripMargin)
    assert(rows == Seq(("A", "value", "1"), ("A", "value", "2"),
      ("A/B", "processing", "X")))
    assert(DtiQc.parseEntries("not xml <<<").isEmpty)
    // entity expansion must never run on untrusted report bytes
    assert(DtiQc.parseEntries(
      """<!DOCTYPE p [<!ENTITY x "y">]><p><entry parameter="A">
        |<value>&x;</value></entry></p>""".stripMargin).isEmpty)
  }

  test("rejectedDirections: gradient_0* prefix strip, numeric direction " +
      "order, per-artifact counts; pipelineSummaryHeaders skips " +
      "intergradient and adjusts total for DTIPrepNoReg") {
    import spark.implicits._
    def grad(n: String, st: String) =
      s"""<entry parameter="gradient_$n"><processing>$st</processing></entry>"""
    // gradient 12 sorts after 7 numerically (string sort would say "12"<"7")
    val xml = s"""<r><entry parameter="DWI Check">
      |${grad("0007", "EXCLUDE_SLICECHECK")}
      |${grad("0012", "EXCLUDE_SLICECHECK")}
      |${grad("0001", "INCLUDE")}
      |${grad("0002", "EXCLUDE_GRADIENTCHECK")}
      |</entry></r>""".stripMargin
    val reports = Seq((1, xml, "DTIPrepReg"), (2, xml, "DTIPrepNoReg"))
      .toDF("id", "xml", "st")
    val sum = DtiQc.rejectedDirections(reports.filter($"id" === 1), "id", "xml")
      .collect().head
    assert(sum.getAs[Long]("total_nb") == 4L)
    assert(sum.getAs[Long]("excluded_nb") == 3L)
    assert(sum.getAs[Long]("included_nb") == 1L)
    assert(sum.getAs[String]("slice_txt") == "'Directions 7,12(2)'")
    assert(sum.getAs[String]("intergrad_txt") == "'Directions 2(1)'")
    assert(sum.getAs[String]("interlace_txt") == "'Directions (0)'")
    val hdrs = DtiQc.pipelineSummaryHeaders(reports, "id", "xml", "st")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2))
      .toMap
    assert(hdrs(("1", "processing:total_rejected")) == "3")
    assert(hdrs(("1", "processing:intergradient_rejected")) ==
      "'Directions 2(1)'")
    // NoReg: intergradient header absent, total = 3 - 1
    assert(!hdrs.contains(("2", "processing:intergradient_rejected")))
    assert(hdrs(("2", "processing:total_rejected")) == "2")
    assert(hdrs.size == 4 + 3)
  }
}
