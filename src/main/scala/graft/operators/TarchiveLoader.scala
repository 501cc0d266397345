package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** tarchiveLoader.pl's post-insertion completion semantics
  * (`uploadNeuroDB/tarchiveLoader.pl:416-620`) over a BATCH of uploads.
  *
  * The per-MINC insertion loop itself is the composed q38/q90 vertical
  * (protocol routing + registration); what the loader OWNS — and what is
  * modeled here — is everything around that loop:
  *  - the no-valid-MINC early exit (`:428-443`, mcount < 1);
  *  - `valid_study` = at least one successful minc_insertion (`:495-499`);
  *  - the counter quirk (`:517-531`): `number_of_mincInserted`
  *    ACCUMULATES (old + new) while `number_of_mincCreated` OVERWRITES
  *    with this run's mcount;
  *  - the inbox→library move gate (`:452-467`): already-in-library is
  *    detected by the CASE-INSENSITIVE regex `$tarchivePath/\d\d\d\d/`,
  *    and the destination is `library/<substr(DateAcquired,0,4)>/<base>`
  *    — no DateAcquired means no move (`moveAndUpdateTarchive`,
  *    `MRIProcessingUtility.pm:1079-1100`);
  *  - session linking on valid studies only (tarchive.SessionID +
  *    mri_upload.SessionID), with the two distinct failure exits when
  *    the session cannot be resolved (create vs get, `:567-579`);
  *  - the final-logfile naming ladder (`:609-619`): alias + date +
  *    CandID, with the phantom PSCID splice and the tmpdir-suffix
  *    fallback when date or CandID is missing.
  *
  * Map-side end to end: every row carries its own counters (produced by
  * the insertion vertical's aggregation), so completion is one
  * projection — no exchange at any batch size.
  *
  * Input columns: upload_id, tarchive_id, archive_path, date_acquired
  * (nullable yyyy-mm-dd), cand_id (nullable), pscid, is_phantom,
  * mri_alias, temp_suffix, mcount, n_inserted, old_inserted (nullable),
  * resolved_session_id (nullable), create_visit_label (boolean).
  */
object TarchiveLoader {

  def complete(uploads: DataFrame, tarchiveLibraryDir: String): DataFrame = {
    val dir = tarchiveLibraryDir.stripSuffix("/")
    val valid = col("n_inserted") > 0
    // the CI year-dir gate: m/$tarchivePath\/\d\d\d\d\//i
    val inLibrary = regexp_like(col("archive_path"),
      lit("(?i)" + java.util.regex.Pattern.quote(dir) + "/\\d\\d\\d\\d/"))
    val moved = when(inLibrary || col("date_acquired").isNull,
        col("archive_path"))
      .otherwise(concat(lit(dir + "/"),
        substring(col("date_acquired"), 1, 4), lit("/"),
        element_at(split(col("archive_path"), "/"), -1)))
    val status =
      when(col("mcount") < 1, "no_valid_minc_created")
        .when(!valid, "invalid_study")
        .when(col("resolved_session_id").isNull && col("create_visit_label"),
          "create_session_failure")
        .when(col("resolved_session_id").isNull, "get_session_id_failure")
        .otherwise("completed")
    // final logfile: alias [+ tmpdir suffix | + phantom PSCID + date + cand]
    val logfile =
      when(col("date_acquired").isNull || col("cand_id").isNull,
        concat(col("mri_alias"), lit("_"), col("temp_suffix"),
          lit(".log.gz")))
        .otherwise(concat(col("mri_alias"),
          when(col("is_phantom"), col("pscid")).otherwise(lit("")),
          col("date_acquired"), col("cand_id"), lit(".log.gz")))
    uploads.select(
      col("upload_id"), col("tarchive_id"),
      status.as("status"),
      when(status === "completed" || status.endsWith("_failure"),
        col("mcount")).as("number_of_minc_created"),
      when(status === "completed" || status.endsWith("_failure"),
        col("n_inserted") + coalesce(col("old_inserted"), lit(0L)))
        .as("number_of_minc_inserted"),
      when(status === "completed", col("resolved_session_id"))
        .as("session_id"),
      // the move happens on the FIRST loop iteration, before validity is
      // known — any upload whose loop ran (mcount >= 1) gets moved, even
      // ones later deemed invalid (`:452-467`)
      when(col("mcount") >= 1 && moved =!= col("archive_path"), moved)
        .as("new_tarchive_location"),
      // the rename-to-final-logfile block is only REACHED on the
      // completed and invalid-study paths — every other status exits the
      // script earlier (`:428-443,567-579`)
      when(status.isin("completed", "invalid_study"), logfile)
        .as("final_logfile"))
  }
}
