package graft.operators

import org.apache.spark.sql.types._

/** A REAL pure-JVM audio codec for the multimodal column harness
  * ([[Multimodal.decodeRowsPartitioned]]) — the audio twin of
  * [[BmpCodec]]: RIFF/WAVE with uncompressed PCM16, the one mainstream
  * audio container that needs no compression library. The chunk walker
  * handles the format as specified — word-aligned chunks in any order,
  * unknown chunks (LIST/INFO metadata, `fact`, …) skipped, `fmt ` and
  * `data` located wherever they sit — so real-world files with metadata
  * blocks decode, not just minimal fixtures.
  *
  * All outputs are exact integers (channel/rate/frame geometry,
  * first-channel abs-sum / peak / energy), so decoded results pin directly
  * as oracle rows. Malformed or out-of-scope payloads (wrong magic,
  * compressed, non-16-bit) decode to NULLs — untrusted bytes never kill a
  * scan stage.
  */
object WavCodec {

  final case class WavAudio(
      nChannels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      /** samples(channel)(frame), de-interleaved. */
      samples: Array[Array[Short]])

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)) & 0xFFFFFFFFL
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Hardened decode: PCM16 RIFF/WAVE → de-interleaved channels; None for
    * anything else. */
  def decode(bytes: Array[Byte]): Option[WavAudio] = {
    if (bytes.length < 44 || tag(bytes, 0) != "RIFF" ||
      tag(bytes, 8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, size)
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(bytes, off)
      val size = u32(bytes, off + 4)
      if (size > Int.MaxValue || off + 8 + size > bytes.length) return None
      val sz = size.toInt
      id match {
        case "fmt " =>
          if (sz < 16) return None
          val audioFormat = u16(bytes, off + 8)
          val ch = u16(bytes, off + 10)
          val rate = u32(bytes, off + 12)
          val bits = u16(bytes, off + 22)
          if (audioFormat != 1 || bits != 16 || ch < 1 || ch > 64 ||
            rate < 1 || rate > 1000000) return None
          fmt = Some((ch, rate.toInt, bits))
        case "data" => data = Some((off + 8, sz))
        case _ => () // LIST/INFO/fact/...: skip
      }
      off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((ch, rate, bits)), Some((dOff, dSize))) =>
        val blockAlign = ch * 2
        val frames = dSize / blockAlign
        val out = Array.ofDim[Short](ch, frames)
        var f = 0
        while (f < frames) {
          var c = 0
          var p = dOff + f * blockAlign
          while (c < ch) {
            out(c)(f) = ((bytes(p) & 0xFF) | (bytes(p + 1) << 8)).toShort
            c += 1
            p += 2
          }
          f += 1
        }
        Some(WavAudio(ch, rate, bits, out))
      case _ => None
    }
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("magic", StringType),
    StructField("n_channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_ms", LongType),
    StructField("c0_sum_abs", LongType),
    StructField("c0_peak", IntegerType),
    StructField("c0_sum_sq", LongType)))

  val samplesSchema: StructType = StructType(Seq(
    StructField("n_channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("c0_samples", ArrayType(IntegerType))))

  /** [[Multimodal.RowDecoder]] exposing the decoded FIRST-CHANNEL sample
    * array for downstream feature extraction (windowed energy, VAD,
    * resampling) — the "decode then explode into the relational engine"
    * half of the audio pipeline, where [[WavStatsDecoder]] is the
    * whole-file summary half. NULL row on decode failure. */
  object WavSamplesDecoder extends Multimodal.RowDecoder {
    val schema: StructType = samplesSchema
    def decode(bytes: Array[Byte]): Seq[Any] = WavCodec.decode(bytes) match {
      case None => Seq(null, null, null)
      case Some(a) =>
        Seq(a.nChannels, a.sampleRate, a.samples(0).map(_.toInt).toSeq)
    }
  }

  /** [[Multimodal.RowDecoder]] emitting exact-integer audio statistics:
    * geometry, integer-division duration, and first-channel abs-sum /
    * peak / energy (the loudness-gate inputs of an audio-corpus quality
    * filter). NULL row on decode failure. */
  object WavStatsDecoder extends Multimodal.RowDecoder {
    val schema: StructType = statsSchema
    def decode(bytes: Array[Byte]): Seq[Any] = WavCodec.decode(bytes) match {
      case None => Seq(null, null, null, null, null, null, null, null, null)
      case Some(a) =>
        val c0 = if (a.samples.nonEmpty) a.samples(0) else Array.empty[Short]
        var sumAbs = 0L; var peak = 0; var sumSq = 0L
        var i = 0
        while (i < c0.length) {
          val v = c0(i).toInt
          val av = math.abs(v)
          sumAbs += av
          if (av > peak) peak = av
          sumSq += v.toLong * v
          i += 1
        }
        val frames = c0.length.toLong
        Seq("RIFF", a.nChannels, a.sampleRate, a.bitsPerSample, frames,
          frames * 1000L / a.sampleRate, sumAbs, peak, sumSq)
    }
  }
}
