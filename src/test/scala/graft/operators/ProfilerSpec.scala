package graft.operators

import graft.SparkSpec

/** [[Profiler]] — per-column profile rows and the empty-input guard. */
class ProfilerSpec extends SparkSpec {

  test("profile: counts, nulls, distincts, string min/max per column") {
    import spark.implicits._
    val df = Seq((1L, Some("b")), (2L, Some("a")), (3L, None))
      .toDF("id", "s")
    val out = Profiler.profile(df, Seq("id", "s")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(out("id") == ((3L, 0L, 3L, "1", "3")))
    assert(out("s") == ((3L, 1L, 2L, "a", "b")))
  }

  test("profile of zero columns is rejected, not an opaque reduce crash") {
    import spark.implicits._
    val df = Seq(1).toDF("x")
    intercept[IllegalArgumentException] {
      Profiler.profile(df, Nil)
    }
  }
}
