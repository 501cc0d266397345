package graft.sources

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** EEG/MEG recording source (SURVEY.md §2.1 S14).
  *
  * The reference reads EDF/CTF/EEGLAB via MNE into per-channel numpy arrays
  * (`python/loris_ephys_chunker/.../scripts/{edf,ctf,eeglab}_to_chunks.py`);
  * the format
  * codecs are out of engine scope (fixtures carry extracted arrays), but
  * the distributed reshape IS in scope: recordings arrive as one row per
  * channel with an `ArrayType(Double)` trace, and chunking wants the long
  * format `(channel, sample_index, value)`.
  *
  * `posexplode` keeps the transformation narrow (no shuffle): each channel
  * row expands within its partition, and downstream `groupBy(channel,
  * chunk)` is the first exchange.
  */
object EphysSource {

  /** (channel id cols..., values: array<double>) → long format
    * (channel, sample_index, value) + recording metadata passthrough. */
  def channelArraysToLong(
      recordings: DataFrame,
      channelCol: String = "channel",
      valuesCol: String = "values"
  ): DataFrame =
    recordings.select(
      col(channelCol).as("channel"),
      posexplode(col(valuesCol)).as(Seq("sample_index", "value")))
      .withColumn("sample_index", col("sample_index").cast("long"))

  /** Round-trip check helper: long format back to bounded arrays (test and
    * sink use; inverse of [[channelArraysToLong]]). */
  def longToChannelArrays(samples: DataFrame): DataFrame =
    samples.groupBy(col("channel"))
      .agg(transform(
        array_sort(collect_list(struct(col("sample_index"), col("value")))),
        s => s.getField("value")).as("values"))
}
