package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** [[RankFilterToTopK]] — the window-rank-filter → bounded-heap rewrite.
  * Registered on an ISOLATED newSession() so the shared suite session's
  * plans stay untouched. */
class RankFilterToTopKSpec extends SparkSpec {

  // separate session: experimental rules/strategies are per-SessionState
  private lazy val s = {
    val s2 = spark.newSession()
    RankFilterToTopK.register(s2)
    s2
  }

  private def orders = s.read.parquet(s"$sf0001/orders.parquet")
    .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))

  private def ranked(k: Int) = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  test("rewrite fires: TopKPerGroup execs appear under the Window") {
    val df = ranked(2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerGroup \\[".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("Window"), plan) // rank column still produced
  }

  test("rewritten output == un-rewritten output (total order), rank intact") {
    val expected = {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      spark.read.parquet(s"$sf0001/orders.parquet")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    }
    val got = ranked(3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("rn = 1 and literal-first comparisons also rewrite") {
    val eq = {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    }
    eq.collect()
    assert(eq.queryExecution.executedPlan.toString.contains("TopKPerGroup"))

    val flipped = {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      orders.withColumn("rn", row_number().over(w)).filter(lit(2) >= col("rn"))
    }
    flipped.collect()
    assert(flipped.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
  }

  test("does NOT rewrite: rank()/extra window cols/conjunctions/no filter") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)

    val rankFn = orders.withColumn("rn", rank().over(w)).filter(col("rn") <= 2)
    rankFn.collect()
    assert(!rankFn.queryExecution.executedPlan.toString.contains("TopKPerGroup"))

    val twoCols = orders
      .withColumn("rn", row_number().over(w))
      .withColumn("mx", max(col("o_totalprice")).over(
        Window.partitionBy(col("o_custkey"))))
      .filter(col("rn") <= 2)
    twoCols.collect()
    assert(!twoCols.queryExecution.executedPlan.toString.contains("TopKPerGroup"))

    val conj = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2 && col("o_totalprice") > 0)
    conj.collect()
    assert(!conj.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
  }

  test("shared session is unaffected (no global rewrite leak)") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val df = spark.read.parquet(s"$sf0001/orders.parquet")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    df.collect()
    assert(!df.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
  }

  test("Spark's InferWindowGroupLimit node is stripped, not doubled") {
    // the main optimizer's InferWindowGroupLimit runs BEFORE
    // extraOptimizations and inserts a WindowGroupLimit under the same
    // Window this rule matches; keeping both would re-sort every raw
    // partition locally under the heap node
    val df = ranked(2)
    df.collect()
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("TopKPerGroup"), optimized)
    assert(!optimized.contains("WindowGroupLimit"),
      s"redundant WindowGroupLimit kept under the heap node:\n$optimized")
  }
}
