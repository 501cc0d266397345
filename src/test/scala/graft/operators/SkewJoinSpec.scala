package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join == plain join results under a pathological hot key") {
    import spark.implicits._
    // 10k rows of one hot key + scattered others
    val skewed = (Seq.fill(10000)(("hot", scala.util.Random.nextInt(100))) ++
      (1 to 50).map(i => (s"k$i", i))).toDF("key", "payload")
    val dim = (Seq("hot") ++ (1 to 50).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"v$i") }.toDF("key", "dim_val")
    val plain = skewed.join(dim, Seq("key"))
      .groupBy("key", "dim_val").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val salted = SkewJoin.saltedInnerJoin(skewed, dim, Seq("key"), 8)
      .groupBy("key", "dim_val").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(plain == salted)
  }

  test("audit: key stats, hot-key count, heaviest-key ppm share") {
    import spark.implicits._
    val df = (Seq.fill(900)(0L) ++ (1L to 100L)).toDF("k")
    val r = SkewJoin.audit(df, Seq("k")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((101L, 1000L, 900L, 1L, 900000L)))
    // uniform keys: nothing hot
    val uni = (1L to 100L).toDF("k")
    assert(SkewJoin.audit(uni, Seq("k")).collect().head.getLong(3) == 0L)
  }

  test("autoJoin salts the flagged hot key: result equals the plain join " +
      "and no straggler partition exceeds 2x the median") {
    import spark.implicits._
    // shuffle joins only: the dim side must not broadcast, and AQE's own
    // skew split must not mask what the salting does
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // 90% of rows on one key — the Zipfian mega-site shape
      val skewed = spark.range(100000).select(
        when(col("id") < 90000, 0L).otherwise(col("id") % 50 + 1).as("key"),
        col("id").as("payload"))
      val dim = spark.range(51).select(col("id").as("key"),
        concat(lit("d"), col("id")).as("attr"))
      val joined = SkewJoin.autoJoin(skewed, dim, Seq("key"))
      val sizes = joined
        .groupBy(spark_partition_id().as("pid")).count()
        .collect().map(_.getLong(1)).sorted
      val median = sizes(sizes.length / 2)
      assert(sizes.max <= 2 * median,
        s"straggler: ${sizes.mkString(",")}")
      // the UNsalted join does straggle — the audit-driven salt is what
      // removed it
      val plainSizes = skewed.join(dim, Seq("key"))
        .groupBy(spark_partition_id().as("pid")).count()
        .collect().map(_.getLong(1)).sorted
      assert(plainSizes.max > 2 * plainSizes(plainSizes.length / 2))
      // exact result equality
      val joinedAgg = joined.groupBy(col("key"))
        .agg(count(lit(1)).as("n"), sum(col("payload")).as("s")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val plainAgg = skewed.join(dim, Seq("key")).groupBy(col("key"))
        .agg(count(lit(1)).as("n"), sum(col("payload")).as("s")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(joinedAgg == plainAgg)
      // a uniform left side takes the plain-join path (no replication tax)
      val uni = spark.range(10000).select((col("id") % 100).as("key"),
        col("id").as("payload"))
      val uniDim = spark.range(100).select(col("id").as("key"),
        concat(lit("d"), col("id")).as("attr"))
      val auto = SkewJoin.autoJoin(uni, uniDim, Seq("key"))
      assert(auto.columns.toSeq == Seq("key", "payload", "attr"))
      assert(auto.count() == 10000L)
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("autoJoin on an empty skewed side falls back to the plain join") {
    import spark.implicits._
    // zero rows make audit's sum/max NULL — must not NPE, must return
    // the (empty) plain-join result
    val empty = Seq.empty[(Long, Long)].toDF("key", "payload")
    val dim = spark.range(5).select(col("id").as("key"),
      concat(lit("d"), col("id")).as("attr"))
    val out = SkewJoin.autoJoin(empty, dim, Seq("key"))
    assert(out.columns.toSeq == Seq("key", "payload", "attr"))
    assert(out.count() == 0L)
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 1000L).map(i => (i, s"b$i")).toDF("k", "vb")
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bucketed_a")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bucketed_b")
    try {
      val joined = spark.table("bucketed_a")
        .join(spark.table("bucketed_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed join: no shuffle exchange on either side
      assert(!plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle in:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }
}
