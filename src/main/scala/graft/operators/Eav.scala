package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EAV parameter-store operators (SURVEY.md §1.3 / hard-part 5): the
  * reference keeps per-file metadata as `parameter_file (FileID,
  * ParameterTypeID, Value)` rows against the `parameter_type` dictionary,
  * reads them back as name→value maps (`uploadNeuroDB/NeuroDB/File.pm:113`)
  * and remaps BIDS JSON names onto LORIS/MINC ones via the dictionary's
  * Alias column (`python/lib/imaging.py:531-553`,
  * `python/lib/database_lib/parameter_type.py:46-69`).
  *
  * Scale posture: `parameter_type` is a dictionary (broadcast); the only
  * wide shuffle is the pivot's groupBy(FileID), which is one pass because
  * the value set is DECLARED — `pivot(col, values)` with an explicit list
  * skips the distinct-scan job AND bounds output width (pivoting 100 TB of
  * EAV rows on an open name set is how pivots die).
  */
object Eav {

  /** The read-all-params join (`File.pm:113`): long (FileID, Name, Value)
    * rows; parameters whose type id is missing from the dictionary keep a
    * NULL name (LEFT JOIN like the reference). */
  def readParams(parameterFile: DataFrame, parameterType: DataFrame): DataFrame =
    parameterFile
      .join(broadcast(parameterType.select(col("ParameterTypeID"), col("Name"))),
        Seq("ParameterTypeID"), "left")
      .select(col("FileID"), col("Name"), col("Value"))

  /** Declared-set pivot: one wide row per file over exactly `names`
    * (missing parameters → NULL). `max` is the aggregate because
    * (FileID, Name) is unique in a well-formed store — and deterministic
    * when it isn't. */
  def pivotParams(longParams: DataFrame, names: Seq[String]): DataFrame =
    longParams.groupBy(col("FileID"))
      .pivot("Name", names)
      .agg(max(col("Value")))

  /** BIDS→LORIS name remap (`imaging.py:531-553`): dictionary rows with a
    * non-null Alias map Alias (the BIDS term) → Name (the LORIS/MINC term).
    * Like the reference, remapped entries are ADDED — the original
    * BIDS-named row is kept alongside the LORIS-named copy. */
  def bidsToLorisRemap(longParams: DataFrame, parameterType: DataFrame): DataFrame = {
    val mapping = parameterType
      .filter(col("Alias").isNotNull)
      .select(col("Alias").as("Name"), col("Name").as("__loris_name"))
    val remapped = longParams
      .join(broadcast(mapping), Seq("Name"))
      .select(col("FileID"), col("__loris_name").as("Name"), col("Value"))
    longParams.unionByName(remapped)
  }
}
