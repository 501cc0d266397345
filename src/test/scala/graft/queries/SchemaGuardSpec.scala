package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Input-schema guard: pins the accepted encoding per test table so a
  * regenerated dataset that silently changes a column type fails HERE with
  * a named column, not as a silent driver-side query drop (the round-5
  * failure mode: `events.ts` flipped int64-ns → TIMESTAMP_NTZ and seven
  * queries vanished from the correctness gate without an err entry).
  *
  * Columns the engine does arithmetic on accept a SET of encodings, each
  * normalized at load (see [[ChunkQueries.eventsNs]] /
  * [[CoreQueries.events]]); everything else is pinned exactly.
  */
class SchemaGuardSpec extends SparkSpec {

  private def schemaOf(table: String): Map[String, DataType] =
    spark.read.parquet(s"$sf0001/$table.parquet")
      .schema.fields.map(f => f.name -> f.dataType).toMap

  /** Encodings the loaders normalize; anything else must fail loudly. */
  private val tsEncodings: Set[DataType] =
    Set(LongType, TimestampNTZType, TimestampType)

  test("events: ts is one of the encodings eventsNs accepts") {
    val t = schemaOf("events")
    assert(tsEncodings.contains(t("ts")),
      s"events.ts encoding ${t("ts")} is outside the accepted set " +
        s"$tsEncodings — extend ChunkQueries.eventsNs AND its DuckDB " +
        "oracle twins together")
    assert(t("event_id") == LongType && t("user_id") == LongType)
    assert(t("value") == DoubleType)
    assert(t("event_type") == StringType && t("props") == StringType)
  }

  test("eventsNs normalizes every accepted encoding to the same int64 ns") {
    import spark.implicits._
    val dir = graft.sources.SyntheticFixtures.freshDir("schemaguard")
    // 2024-01-02T03:04:05.123 UTC (whole milliseconds: representable in
    // both the java.sql.Timestamp fixture path and parquet micros)
    val us = 1704164645123000L
    Seq((1L, us * 1000, 7L, "view", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/long/events.parquet")
    Seq((1L, new java.sql.Timestamp(us / 1000), 7L, "view", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")
    val fromLong = ChunkQueries.eventsNs(spark, s"$dir/long")
      .select("ts").as[Long].collect().head
    val fromNtz = ChunkQueries.eventsNs(spark, s"$dir/ntz")
      .select("ts").as[Long].collect().head
    assert(fromLong == us * 1000)
    assert(fromNtz == us * 1000,
      "NTZ wall clock must read as naive-UTC epoch (session tz pinned)")
  }

  test("eventsNs rejects unknown ts encodings loudly, naming the column") {
    import spark.implicits._
    val dir = graft.sources.SyntheticFixtures.freshDir("schemaguard_bad")
    Seq((1L, "2024-01-02", 7L, "view", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] {
      ChunkQueries.eventsNs(spark, dir)
    }
    assert(e.getMessage.contains("events.ts"))
  }

  test("session time zone is pinned to UTC in the test harness") {
    // Verify.scala / Bench.scala / SparkSpec all pin UTC: the NTZ cast
    // and every unix_timestamp/window call depend on it matching the
    // DuckDB oracle's naive-epoch semantics
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
  }

  test("date-typed tables: order/ship dates are timestamps") {
    assert(schemaOf("orders")("o_orderdate") == TimestampType ||
      schemaOf("orders")("o_orderdate") == TimestampNTZType)
    assert(schemaOf("lineitem")("l_shipdate") == TimestampType ||
      schemaOf("lineitem")("l_shipdate") == TimestampNTZType)
  }

  test("key dictionary tables keep their pinned shapes") {
    val lineitem = schemaOf("lineitem")
    assert(lineitem("l_orderkey") == LongType)
    assert(lineitem("l_quantity") == DoubleType)
    val docs = schemaOf("documents")
    assert(docs("doc_id") == LongType && docs("text") == StringType)
    val emb = schemaOf("embeddings")
    assert(emb("vec_id") == LongType)
    assert(emb("embedding") == ArrayType(FloatType, containsNull = true) ||
      emb("embedding") == ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding encoding ${emb("embedding")} — the ANN " +
        "operators assume Array[Float]")
  }
}
