package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class BidsTabularSpec extends SparkSpec {

  test("readTsv: header-driven schema, n/a and empty -> NULL") {
    val dir = Files.createTempDirectory("tsv").toFile
    val f = new java.io.File(dir, "participants.tsv")
    Files.writeString(f.toPath,
      "participant_id\tsex\tdate_of_birth\nsub-01\tF\t1990-01-01\nsub-02\tn/a\t\n")
    val df = BidsTabular.readTsv(spark, f.getAbsolutePath)
    assert(df.columns.toSeq == Seq("participant_id", "sex", "date_of_birth"))
    val rows = df.orderBy("participant_id").collect()
    assert(rows(0).getString(1) == "F")
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("unionOfKeys merges heterogeneous headers") {
    import spark.implicits._
    val a = Seq(("sub-01", "F")).toDF("participant_id", "sex")
    val b = Seq(("sub-02", "site1")).toDF("participant_id", "site")
    val u = BidsTabular.unionOfKeys(Seq(a, b))
    assert(u.columns.toSet == Set("participant_id", "sex", "site"))
    assert(u.count() == 2)
    assert(u.filter(col("participant_id") === "sub-02").first().isNullAt(1))
  }

  test("appendNewRows: only unseen keys appended") {
    import spark.implicits._
    val existing = Seq(("f1.nii", "2024-01-01")).toDF("filename", "acq_time")
    val incoming = Seq(("f1.nii", "2025-09-09"), ("f2.nii", "2024-02-02"))
      .toDF("filename", "acq_time")
    val out = BidsTabular.appendNewRows(existing, incoming, Seq("filename"))
    assert(out.count() == 2)
    assert(out.filter(col("filename") === "f1.nii").first().getString(1) == "2024-01-01")
  }

  test("writeTsv round-trips with n/a sentinels") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tsvout").resolve("out").toString
    val df = Seq(("sub-01", Some("F")), ("sub-02", None: Option[String]))
      .toDF("participant_id", "sex")
    BidsTabular.writeTsv(df, dir)
    val back = BidsTabular.readTsv(spark, dir)
    assert(back.count() == 2)
    assert(back.filter(col("participant_id") === "sub-02").first().isNullAt(1))
  }
}
