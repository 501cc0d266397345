package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.BidsPath

/** Session resolution (SURVEY.md §3.2 step 2): patient-name decode →
  * candidate validation → get-or-create session with next visit number —
  * the reference's `python/lib/get_session_info.py:68-163,236-320` and the
  * candidate-mismatch check of
  * `uploadNeuroDB/NeuroDB/MRIProcessingUtility.pm:2056-2080`, as one
  * set-oriented pass over a batch of scans.
  */
/** The reference's config-supplied `get_session_config` hook
  * (`python/lib/get_session_info.py:87-105`) as a strategy trait: sites
  * plug their own patient-name convention; the default is the LORIS
  * `PSCID_CandID_VisitLabel` convention. Implementations return a struct
  * column (pscid, cand_id, visit_label). */
trait PatientIdDecoder extends Serializable {
  def decode(patientName: Column): Column
}

/** Default LORIS convention decoder. */
object LorisPatientIdDecoder extends PatientIdDecoder {
  override def decode(patientName: Column): Column =
    BidsPath.decodePatientName(patientName)
}

object SessionResolver {

  /** Resolve a batch of patient names against the candidate and session
    * catalogs.
    *
    * @param scans      rows with a `patient_name` column
    *                   (`PSCID_CandID_Visit` convention)
    * @param candidates catalog: (CandID int-like string ok, PSCID, ...)
    * @param sessions   catalog: (CandID, Visit_label, VisitNo)
    * @return scans + decoded fields + `resolution` in {resolved,
    *         new_session, candidate_mismatch, unknown_candidate} +
    *         VisitNo (existing or next per candidate)
    */
  def resolve(scans: DataFrame, candidates: DataFrame, sessions: DataFrame,
      decoder: PatientIdDecoder = LorisPatientIdDecoder): DataFrame = {
    val decoded = scans
      .withColumn("__d", decoder.decode(col("patient_name")))
      .withColumn("pscid", col("__d.pscid"))
      .withColumn("cand_id", col("__d.cand_id").cast("int"))
      .withColumn("visit_label", col("__d.visit_label"))
      .drop("__d")

    // J3: LEFT JOIN on CandID; PSCID compared post-join so a mismatch is
    // distinguishable from an absent candidate (MRIProcessingUtility.pm:2056-2080)
    val cand = candidates.select(
      col("CandID").cast("int").as("c_cand_id"), col("PSCID").as("c_pscid"))
    val withCand = decoded.join(broadcast(cand),
      col("cand_id") === col("c_cand_id"), "left")

    // existing session lookup (case-sensitive visit label, P6)
    val sess = sessions.select(
      col("CandID").cast("int").as("s_cand_id"),
      col("Visit_label").as("s_visit"), col("VisitNo").as("existing_visit_no"))
    val withSess = withCand.join(broadcast(sess),
      col("cand_id") === col("s_cand_id") && col("visit_label") === col("s_visit"),
      "left")

    // A4: next visit number per candidate for the new-session path
    val nextNo = Catalog.nextVisitNo(
      sessions.select(col("CandID").cast("int").as("cand_id"), col("VisitNo").as("visit_no")),
      "cand_id", "visit_no")
    withSess.join(broadcast(nextNo), Seq("cand_id"), "left")
      .withColumn("resolution",
        when(col("c_cand_id").isNull, "unknown_candidate")
          .when(col("c_pscid") =!= col("pscid"), "candidate_mismatch")
          .when(col("existing_visit_no").isNotNull, "resolved")
          .otherwise("new_session"))
      .withColumn("VisitNo",
        when(col("resolution") === "resolved", col("existing_visit_no"))
          .when(col("resolution") === "new_session",
            coalesce(col("next_visit_no"), lit(1)))
          .otherwise(lit(null).cast("int")))
      .drop("c_cand_id", "c_pscid", "s_cand_id", "s_visit",
        "existing_visit_no", "next_visit_no")
  }
}
