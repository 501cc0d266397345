package graft.streaming

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("gap rule: new session iff gap > threshold; boundaries inclusive") {
    val gap = 100L
    // user 1: events at 0, 50, 150 (gap=100 -> same session), 251 (gap=101 -> new)
    // user 2: single event
    val ev = Seq(
      (1L, 1L, 0L), (1L, 2L, 50L), (1L, 3L, 150L), (1L, 4L, 251L),
      (2L, 5L, 42L))
      .toDF("user_id", "event_id", "us")
    val out = EventStream.sessionize(ev, "user_id", "us", "event_id", gap)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out.size == 3)
    assert(out((1L, 1L)) == (0L, 150L, 3L)) // gap exactly 100 stays
    assert(out((1L, 2L)) == (251L, 251L, 1L))
    assert(out((2L, 1L)) == (42L, 42L, 1L))
  }

  test("matches Spark's native session_window aggregation (the streaming twin)") {
    import org.apache.spark.sql.functions._
    // events in seconds: user 1 sessions {0, 300}, {1200}; user 2 {50}
    val ev = Seq((1L, 1L, 0L), (1L, 2L, 300L), (1L, 3L, 1200L), (2L, 4L, 50L))
      .map { case (u, e, sec) => (u, e, sec * 1000000L) }
      .toDF("user_id", "event_id", "us")
    val mine = EventStream.sessionize(ev, "user_id", "us", "event_id",
        gapMicros = 600L * 1000000)
      .select(col("user_id"), col("session_start"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val native = ev
      .withColumn("ts", timestamp_micros(col("us")))
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(min(col("us")).as("session_start"), count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(mine == native)
    assert(mine.size == 3)
  }

  test("ties on time break deterministically by order column") {
    val ev = Seq((1L, 2L, 10L), (1L, 1L, 10L), (1L, 3L, 500L))
      .toDF("user_id", "event_id", "us")
    val out = EventStream.sessionize(ev, "user_id", "us", "event_id", 100L)
    assert(out.count() == 2)
    val first = out.filter("sess_id = 1").collect()(0)
    assert(first.getLong(2) == 10L && first.getLong(4) == 2L)
  }
}
