package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed END-TO-END multimodal training-corpus assembly — the
  * image-text twin of [[CorpusOps.assembleCorpus]] (q99's text north
  * star): shard members arrive paired by sample stem, then
  *
  *   1. pairing gate   — an image without a caption is not a training
  *                       sample (audit rows, not silent drops)
  *   2. decode gate    — undecodable payloads fail closed (dHash NULL)
  *   3. geometry gate  — thumbnails below `minWidth` carry no signal
  *   4. near-dup gate  — perceptual dHash components
  *                       ([[Dedup.hammingNearDupPairs]] + star CC),
  *                       min-id canonical per component
  *
  * and the survivors are the training manifest. [[attrition]] emits the
  * one-row per-stage audit (the data-genealogy artifact reviewers ask
  * for first) from the SAME stage frames, so manifest and audit can
  * never disagree.
  *
  * 100 TB shape: stages 1-3 are row-local map work inside the shard
  * scan; the only exchanges are the 8-byte-key banded-hamming shuffle
  * and the component roll-up — payload bytes never survive past stage
  * 2 (the decode emits fixed-width metadata and the content column is
  * dropped immediately).
  */
object MultimodalAssembly {

  private final case class Stages(
      images: DataFrame, paired: DataFrame, decoded: DataFrame,
      gated: DataFrame, kept: DataFrame)

  /** `pairs` columns: (id long, sample_id, shard_name, content binary,
    * caption string nullable). */
  private def stages(pairs: DataFrame, minWidth: Int, bands: Int,
      maxHamming: Int): Stages = {
    val images = pairs
    val paired = images.where(col("caption").isNotNull)
    // eager checkpoint: the frame is re-consumed by the dedup pair join
    // and the counts below; payload bytes are dropped HERE
    val decoded = Multimodal.decodeRowsPartitioned(paired, "content",
        ImageHash.DhashDecoder)
      .where(col("dhash").isNotNull)
      .drop("content")
      .localCheckpoint(true)
    val gated = decoded.where(col("width") >= minWidth)
    val dupPairs = Dedup.hammingNearDupPairs(gated, "id", "dhash",
      bands, maxHamming)
    val labeled = Dedup.clusterKeys(gated, "id", dupPairs)
    val keepIds = labeled.groupBy(col("cluster_key"))
      .agg(min(col("id")).as("id"))
      .select(col("id"))
    val kept = gated.join(keepIds, Seq("id"), "left_semi")
    Stages(images, paired, decoded, gated, kept)
  }

  /** The training manifest: one row per surviving image-text sample. */
  def manifest(pairs: DataFrame, minWidth: Int, bands: Int = 4,
      maxHamming: Int = 3): DataFrame =
    stages(pairs, minWidth, bands, maxHamming).kept
      .select(col("id"), col("sample_id"), col("shard_name"),
        col("width"), col("height"), col("dhash"), col("caption"))

  /** One-row attrition audit over the SAME stage frames. */
  def attrition(pairs: DataFrame, minWidth: Int, bands: Int = 4,
      maxHamming: Int = 3): DataFrame = {
    val st = stages(pairs, minWidth, bands, maxHamming)
    st.images.agg(count(lit(1)).as("n_images"))
      .crossJoin(broadcast(st.paired.agg(count(lit(1)).as("n_paired"))))
      .crossJoin(broadcast(st.decoded.agg(count(lit(1)).as("n_decoded"))))
      .crossJoin(broadcast(st.gated.agg(count(lit(1)).as("n_geometry_ok"))))
      .crossJoin(broadcast(st.kept.agg(count(lit(1)).as("n_kept"))))
  }
}
