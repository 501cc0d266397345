package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** U3 — HED schema union (SURVEY.md §2.7): the multi-schema node catalog
  * feeding tag resolution. The reference loads every `hed_schema_nodes`
  * row across installed schemas (`python/lib/db/queries/hed_schema_node
  * .py:9-14`, used as `hed_union` in `python/lib/physio/events.py:169`)
  * and resolves a tag's LEAF name to the first matching node
  * (`python/lib/physio/hed.py:191-201`).
  *
  * Node shape mirrors the reference's `hed_schema_nodes` table: (id,
  * parent_id, schema_id, name, long_name?, description?).
  *
  * 100 TB posture: schema catalogs are dictionary-sized (thousands of
  * rows) while parsed event members are corpus-sized — so the union, the
  * per-name resolution, and the parent-path derivation all happen on the
  * tiny side, and [[resolveTags]] attaches ids to the member stream with
  * ONE broadcast hash join. No shuffle ever carries the member stream by
  * tag name.
  */
object HedSchema {

  /** `get_all_hed_schema_nodes`: all nodes across schemas, one catalog. */
  def unionNodes(schemas: Seq[DataFrame]): DataFrame = {
    require(schemas.nonEmpty, "need at least one schema")
    schemas.reduce(_.unionByName(_))
  }

  /** Derive each node's full `long_name` (root/…/name) from the parent
    * chain: `maxDepth` broadcast joins against ONE fixed dictionary-sized
    * projection (HED trees are < 10 deep; deeper nodes keep a partial
    * path). Pointer doubling was tried and REVERTED: each round's
    * broadcast re-executed the growing self-joined plan, costing ~2×
    * wall-clock on real catalogs — log-round tricks only pay once a level
    * is expensive to materialize, and a schema dictionary never is. */
  def withLongNames(nodes: DataFrame, maxDepth: Int = 10): DataFrame = {
    val parents = broadcast(nodes.select(
      col("id").as("__pid"), col("name").as("__pname"),
      col("parent_id").as("__pp")))
    var cur = nodes
      .withColumn("long_name", col("name"))
      .withColumn("__p", col("parent_id"))
    var i = 0
    while (i < maxDepth) {
      cur = cur.join(parents, cur("__p") === parents("__pid"), "left")
        .withColumn("long_name",
          when(col("__pname").isNotNull,
            concat(col("__pname"), lit("/"), col("long_name")))
            .otherwise(col("long_name")))
        .withColumn("__p", col("__pp"))
        .drop("__pid", "__pname", "__pp")
      i += 1
    }
    cur.drop("__p")
  }

  /** One row per distinct node NAME: the reference's `find(hed_union,
    * tag.name == leaf)` takes the first match in catalog (id) order, so
    * name collisions across schemas resolve to the lowest id. */
  def resolutionDict(nodes: DataFrame): DataFrame = {
    val named = withLongNames(nodes)
    named
      .groupBy(col("name"))
      .agg(min(col("id")).as("hed_tag_id"))
      .join(named.select(col("id").as("hed_tag_id"),
        col("schema_id"), col("long_name")), Seq("hed_tag_id"))
  }

  /** `get_hed_tag_id_from_name` over a member stream: resolve each tag's
    * leaf name (`split('/').last`) against the union; synthetic group
    * members (NULL tag) stay NULL, unrecognized names are FLAGGED rather
    * than raised (the reference prints and raises — a batch engine reports
    * and lets the caller gate). Resolution side is broadcast. */
  def resolveTags(members: DataFrame, nodes: DataFrame,
      tagCol: String = "tag"): DataFrame = {
    val dict = resolutionDict(nodes)
      .select(col("name").as("__leaf"), col("hed_tag_id"),
        col("schema_id").as("hed_schema_id"), col("long_name"))
    members
      .withColumn("__leaf", element_at(split(col(tagCol), "/"), -1))
      .join(broadcast(dict), Seq("__leaf"), "left")
      .withColumn("unrecognized",
        col(tagCol).isNotNull && col("hed_tag_id").isNull)
      .drop("__leaf")
  }
}
