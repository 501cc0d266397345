package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proves the bucketed co-location contract: joining two tables bucketed on
  * the join key plans NO shuffle exchange (the write-once pre-shuffle that
  * makes repeated 100 TB fact-table joins cheap). */
class BucketedJoinSpec extends SparkSpec {

  test("join of co-bucketed tables plans without ShuffleExchange") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val customer = spark.read.parquet(s"$sf0001/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_customer")
    Sinks.writeBucketed(orders, "bkt_orders", 8, Seq("o_custkey"))
    Sinks.writeBucketed(customer, "bkt_customer", 8, Seq("c_custkey"))

    // force the non-broadcast path so the exchange question is real
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bkt_orders")
        .join(spark.table("bkt_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      assert(j.count() > 0)
      val plan = j.queryExecution.executedPlan.toString
      // the join itself must not shuffle; the only exchange allowed is the
      // (tiny) post-join groupBy on c_mktsegment
      val joinSection = plan.split("SortMergeJoin").last
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!joinSection.contains("Exchange hashpartitioning(o_custkey"),
        s"join input was re-shuffled:\n$plan")
      assert(!joinSection.contains("Exchange hashpartitioning(c_custkey"),
        s"join input was re-shuffled:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_customer")
    }
  }
}
