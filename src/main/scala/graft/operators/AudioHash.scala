package graft.operators

import org.apache.spark.sql.types._

/** Perceptual audio fingerprinting for multimodal dedup — the audio leg
  * beside [[ImageHash]]'s dHash: a 64-bit ENERGY-ENVELOPE print per
  * clip (the sign of successive window-energy deltas, the core trick of
  * the classic audio-fingerprint family) lets re-encoded, re-gained, or
  * trimmed-silence copies of one clip collide in the same
  * banded-hamming machinery the engine already runs
  * ([[Dedup.hammingNearDupPairs]]): one (band, sig) shuffle, pigeonhole
  * recall, popcount-XOR verify.
  *
  * Exact integer arithmetic throughout: the first channel splits into
  * 65 integer-boundary windows, window energy = Σ sample² (Long — 2³¹
  * max per PCM16 sample² times any realistic window fits), bit k set
  * when energy(k+1) > energy(k). Two invariances fall out of the
  * integer comparisons and are spec-pinned: GAIN (scaling every sample
  * by c scales every energy by c², preserving all comparisons) and
  * exact 2× resampling (sample duplication doubles every window
  * pairwise-equally). No FFT, no FP — engine-portable and
  * oracle-pinnable.
  */
object AudioHash {

  /** 64-bit envelope print of one channel; 0 for fewer than 65
    * samples (no stable envelope to compare). */
  def envelopePrint64(samples: Array[Short]): Long = {
    val n = samples.length
    if (n < 65) return 0L
    val energy = new Array[Long](65)
    var w = 0
    while (w < 65) {
      val s0 = w * n / 65
      val s1 = (w + 1) * n / 65
      var sum = 0L
      var i = s0
      while (i < s1) {
        sum += samples(i).toLong * samples(i).toLong
        i += 1
      }
      energy(w) = sum
      w += 1
    }
    var hash = 0L
    var k = 0
    while (k < 64) {
      if (energy(k + 1) > energy(k)) hash |= 1L << k
      k += 1
    }
    hash
  }

  /** Envelope print via the WAV leg (first channel); None when the
    * payload is not decodable PCM16. */
  def envelopePrintWav(bytes: Array[Byte]): Option[Long] =
    WavCodec.decode(bytes).map(a =>
      envelopePrint64(if (a.samples.nonEmpty) a.samples(0)
        else Array.empty[Short]))

  val metaSchema: StructType = StructType(Seq(
    StructField("n_channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", LongType),
    StructField("envelope_print", LongType)))

  /** [[Multimodal.RowDecoder]] emitting (channels, rate, frames,
    * envelope_print) for WAV payloads; NULL row otherwise. */
  object EnvelopePrintDecoder extends Multimodal.RowDecoder {
    val schema: StructType = metaSchema
    def decode(bytes: Array[Byte]): Seq[Any] =
      WavCodec.decode(bytes) match {
        case None => Seq(null, null, null, null)
        case Some(a) =>
          val c0 = if (a.samples.nonEmpty) a.samples(0)
            else Array.empty[Short]
          Seq[Any](a.nChannels, a.sampleRate, c0.length.toLong,
            envelopePrint64(c0))
      }
  }
}
