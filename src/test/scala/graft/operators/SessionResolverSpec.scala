package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Session resolution paths incl. the FIXTURES.md §3 deliberate
  * PSCID-mismatch candidate. */
class SessionResolverSpec extends SparkSpec {

  test("resolve: resolved / new_session / mismatch / unknown paths") {
    import spark.implicits._
    val scans = Seq(
      (1L, "DCC001_300001_V1"),  // existing session -> resolved
      (2L, "DCC001_300001_V2"),  // known candidate, new visit -> next no
      (3L, "WRONG1_300002_V1"),  // PSCID mismatch
      (4L, "DCC003_999999_V1"),  // unknown candidate
      (5L, "DCC002_300002_V9")   // candidate with no sessions -> visit 1
    ).toDF("scan_id", "patient_name")
    val candidates = Seq((300001, "DCC001"), (300002, "DCC002"))
      .toDF("CandID", "PSCID")
    val sessions = Seq((300001, "V1", 1), (300001, "V0", 4))
      .toDF("CandID", "Visit_label", "VisitNo")

    val out = SessionResolver.resolve(scans, candidates, sessions)
      .collect().map(r => r.getAs[Long]("scan_id") ->
        (r.getAs[String]("resolution"), Option(r.getAs[Integer]("VisitNo")))).toMap

    assert(out(1L) == ("resolved", Some(1)))
    assert(out(2L) == ("new_session", Some(5)))  // max(1,4)+1
    assert(out(3L) == ("candidate_mismatch", None))
    assert(out(4L) == ("unknown_candidate", None))
    assert(out(5L) == ("new_session", Some(1)))  // no sessions -> IFNULL path
  }

  test("custom PatientIdDecoder strategy plugs in (dash convention)") {
    import spark.implicits._
    val dashDecoder = new PatientIdDecoder {
      override def decode(n: org.apache.spark.sql.Column) =
        org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.regexp_extract(n, "^([^-]+)-([^-]+)-(.+)$", 1).as("pscid"),
          org.apache.spark.sql.functions.regexp_extract(n, "^([^-]+)-([^-]+)-(.+)$", 2).as("cand_id"),
          org.apache.spark.sql.functions.regexp_extract(n, "^([^-]+)-([^-]+)-(.+)$", 3).as("visit_label"))
    }
    val scans = Seq((1L, "DCC001-300001-V1")).toDF("scan_id", "patient_name")
    val candidates = Seq((300001, "DCC001")).toDF("CandID", "PSCID")
    val sessions = Seq((300001, "V1", 1)).toDF("CandID", "Visit_label", "VisitNo")
    val out = SessionResolver.resolve(scans, candidates, sessions, dashDecoder).first()
    assert(out.getAs[String]("resolution") == "resolved")
  }

  test("visit label matching is case-sensitive (P6 BINARY compare)") {
    import spark.implicits._
    val scans = Seq((1L, "DCC001_300001_v1")).toDF("scan_id", "patient_name")
    val candidates = Seq((300001, "DCC001")).toDF("CandID", "PSCID")
    val sessions = Seq((300001, "V1", 1)).toDF("CandID", "Visit_label", "VisitNo")
    val out = SessionResolver.resolve(scans, candidates, sessions).first()
    // 'v1' != 'V1' -> not resolved; becomes a new session
    assert(out.getAs[String]("resolution") == "new_session")
  }
}
