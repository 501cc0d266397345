package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val payloads = Seq(
    (1L, "fakejpegbytes".getBytes("UTF-8")),
    (2L, Array[Byte](0x89.toByte, 'P', 'N', 'G')),
    (3L, Array.empty[Byte])
  ).toDF("id", "payload")

  test("decodePartitioned == the Column stub bit-for-bit (production-swap parity)") {
    val viaHarness = Multimodal.decodePartitioned(payloads, "payload")
      .select(col("id"), col("image_meta"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1).toSeq).toMap
    val viaColumn = Multimodal.withImageMeta(payloads, "payload")
      .select(col("id"), col("image_meta"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1).toSeq).toMap
    assert(viaHarness.keySet == viaColumn.keySet)
    // empty payload: Column substring yields magic "" too — full parity
    viaHarness.foreach { case (k, v) => assert(v == viaColumn(k), s"id $k") }
  }

  test("decoder lifecycle: open/close once per partition, streaming") {
    val opens = spark.sparkContext.longAccumulator("opens")
    val closes = spark.sparkContext.longAccumulator("closes")
    val decoder = new Multimodal.PayloadDecoder {
      override def open(): Unit = opens.add(1)
      override def close(): Unit = closes.add(1)
      def decode(bytes: Array[Byte]): (String, Int, Int, Int) = ("X", 1, 1, 1)
    }
    val n = Multimodal.decodePartitioned(payloads.repartition(2), "payload", decoder)
      .count()
    assert(n == 3)
    assert(opens.value == 2 && closes.value == 2)
  }

  test("sampleFrames explodes stride-sampled frame indices") {
    val out = Multimodal.sampleFrames(payloads.filter(col("id") === 1), "payload", 4)
      .select(col("frame_idx")).collect().map(_.getInt(0)).toSeq
    // 13 bytes -> n_frames = 13 % 24 + 1 = 14; stride 4 -> 0,4,8,12
    assert(out == Seq(0, 4, 8, 12))
  }
}
