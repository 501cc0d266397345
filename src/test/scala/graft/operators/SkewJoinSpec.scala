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
