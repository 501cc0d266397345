package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Predicates.nullifNa

/** BIDS tabular ingest (SURVEY.md §2.1 S5/S6): header-driven TSV with
  * dynamic schemas, `'n/a'`/`''` → NULL normalization, union-of-keys
  * write-out, and keyed merge-append.
  *
  * Reference: `python/loris_bids_utils/src/loris_bids_utils/tsv.py:23-73`,
  * `python/lib/utilities.py:21-84`.
  */
object BidsTabular {

  /** S5: read a TSV with header-driven schema; all string columns get the
    * reference's sentinel normalization (`tsv.py:45`: `''` and `'n/a'` →
    * NULL). Schema inference optional — BIDS readers treat everything as
    * string unless told otherwise (`csv.DictReader` semantics). */
  def readTsv(spark: SparkSession, path: String, inferSchema: Boolean = false): DataFrame = {
    val raw = spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("inferSchema", inferSchema.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      if (f.dataType == org.apache.spark.sql.types.StringType)
        df.withColumn(f.name, nullifNa(col(f.name)))
      else df
    }
  }

  /** S6: union-of-keys combine — rows from heterogeneous TSVs with
    * different header sets merge on the union of columns
    * (`tsv.py:48-59` ordered union-of-keys field list). */
  def unionOfKeys(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Write a DataFrame as TSV with `n/a` for NULLs (BIDS convention).
    *
    * SIZE BOUND: `coalesce(1)` funnels the whole output through one task —
    * correct for the reference's one-TSV-per-dataset semantics
    * (participants.tsv is thousands of rows), a foot-gun for anything
    * bigger. Corpus-scale exports belong in partitioned parquet/TSV
    * (plain `df.write`), not this sink. */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write
      .option("sep", "\t")
      .option("header", "true")
      .option("nullValue", "n/a")
      .mode("overwrite")
      .csv(path)

  /** U4: `append_to_tsv_file` semantics (`python/lib/utilities.py:42-84`):
    * append only the incoming rows whose key is absent from the existing
    * file (anti-join guard). */
  def appendNewRows(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.unionByName(
      incoming.join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti"),
      allowMissingColumns = true)
}
