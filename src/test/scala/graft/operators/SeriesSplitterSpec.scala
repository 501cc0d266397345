package graft.operators

import graft.SparkSpec

/** splitMergedSeries.pl break-walk edges beyond q125's oracle. */
class SeriesSplitterSpec extends SparkSpec {

  private def spec(rows: Seq[(String, Int, Double, Option[Int], Int,
      Double)]) = {
    import spark.implicits._
    SeriesSplitter.splitSpec(rows.toDF("StudyInstanceUID", "SeriesNumber",
      "EchoTime", "EchoNumber", "ImageNumber", "SlicePosition"))
      .collect()
  }

  test("repeated dual-echo series become 1,2 then 101,102") {
    val rows = Seq(
      // echo 1 (TE 10): repeat stacks [1,2] and [5,6]
      ("S", 9, 10.0, None, 1, 0.0), ("S", 9, 10.0, None, 2, 2.0),
      ("S", 9, 10.0, None, 5, 0.0), ("S", 9, 10.0, None, 6, 2.0),
      // echo 2 (TE 30): repeat stacks [3,4] and [7,8]
      ("S", 9, 30.0, None, 3, 0.0), ("S", 9, 30.0, None, 4, 2.0),
      ("S", 9, 30.0, None, 7, 0.0), ("S", 9, 30.0, None, 8, 2.0))
    val out = spec(rows)
    val echoRows = out.filter(_.getAs[Any]("image_number") == null)
      .map(r => r.getAs[Double]("echo_time") -> r.getAs[Int]("value"))
      .toMap
    assert(echoRows == Map(10.0 -> 1, 30.0 -> 2))
    val imgRows = out.filter(_.getAs[Any]("image_number") != null)
      .map(r => r.getAs[Int]("image_number") -> r.getAs[Int]("value"))
      .toMap
    assert(imgRows == Map(5 -> 101, 6 -> 101, 7 -> 102, 8 -> 102))
  }

  test("a too-small step (<0.1 thick) starts a new group") {
    val rows = Seq(
      ("S", 1, 5.0, Some(1), 1, 0.0), ("S", 1, 5.0, Some(1), 2, 10.0),
      ("S", 1, 5.0, Some(1), 3, 10.5)) // 0.5 < 0.1*10
    val out = spec(rows)
    assert(out.map(_.getAs[Int]("image_number")).toSet == Set(3))
  }

  test("single-image groups produce no split rows") {
    val rows = Seq(("S", 2, 5.0, Some(1), 1, 0.0))
    assert(spec(rows).isEmpty)
  }
}
