package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class TopKPerGroupSpec extends SparkSpec {

  test("custom plan == window-rank formulation on orders (total order)") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val custom = TopKPerGroup(o, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val windowed = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(custom == windowed)
    assert(custom.nonEmpty)
  }

  test("plans partial + final execs around one exchange; no Sort of the table") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val df = TopKPerGroup(o, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerGroup \\[".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("Exchange hashpartitioning(o_custkey"), plan)
    assert(!plan.contains("SortExec"), plan)
  }

  test("ties within k and groups smaller than k") {
    import spark.implicits._
    val df = Seq((1, 10, "a"), (1, 10, "b"), (1, 5, "c"), (2, 7, "z"))
      .toDF("g", "v", "tag")
    // total order via tag tiebreak
    val out = TopKPerGroup(df, Seq(col("g")),
      Seq(col("v").desc, col("tag").asc), k = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(out == Set((1, 10, "a"), (1, 10, "b"), (2, 7, "z")))
  }

  test("distinct mode == distinct().then-top-k, duplicates across partitions") {
    import spark.implicits._
    // duplicates both within and across partitions; repartition(4) spreads
    // copies so the FINAL pass must also dedup (partial sets union with
    // overlaps)
    val rows = for { g <- 1 to 3; v <- Seq(5, 5, 3, 3, 8, 1, 1, 9) } yield (g, v)
    val df = rows.toDF("g", "v").repartition(4)
    val custom = TopKPerGroup.distinct(df, Seq(col("g")),
      Seq(col("v").asc), k = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val reference = df.distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").asc)))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(custom == reference)
    assert(custom == (1 to 3).flatMap(g => Seq((g, 1), (g, 3), (g, 5))).toSet)
  }

  test("partial-pass group cap: >131072 distinct groups flush mid-partition " +
      "and the final result is still exact") {
    import spark.implicits._
    // 150k groups x 2 rows in ONE partition forces at least one drain of
    // the partial pass's state map (cap 131072); the flushed per-chunk
    // top-k unions must still reduce to the exact per-group minimum
    val n = 150000
    val df = (0 until n).flatMap(g => Seq((g, g * 2 + 1), (g, g * 2)))
      .toDF("g", "v").coalesce(1)
    val out = TopKPerGroup(df, Seq(col("g")), Seq(col("v").asc), k = 1)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(out.size == n)
    assert((0 until n).forall(g => out(g) == g * 2), "wrong minima")
  }

  test("cap drains are VISIBLE: the numDrains SQLMetric counts exactly " +
      "the cap-triggered flushes (final exhaustion drain uncounted) and " +
      "the conf-shrunk cap still yields exact results") {
    import spark.implicits._
    spark.conf.set(TopKPerGroup.MaxPartialGroupsKey, "100")
    try {
      // 350 groups x 2 rows in ONE partition with cap 100: group #101,
      // #201, #301 each trigger a drain -> expect exactly 3 on the
      // PARTIAL exec's metric; results stay exact
      val n = 350
      val df = (0 until n).flatMap(g => Seq((g, g * 2 + 1), (g, g * 2)))
        .toDF("g", "v").coalesce(1)
      val out = TopKPerGroup(df, Seq(col("g")), Seq(col("v").asc), k = 1)
      val got = out.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      assert(got.size == n && (0 until n).forall(g => got(g) == g * 2))
      // AQE wraps stages; flatten across AdaptiveSparkPlanExec /
      // QueryStageExec boundaries to reach the partial exec's metric
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def flatten(p: SparkPlan): Seq[SparkPlan] =
        p +: (p.children.flatMap(flatten) ++ (p match {
          case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
          case q: QueryStageExec => flatten(q.plan)
          case _ => Seq.empty[SparkPlan]
        }))
      val drains = flatten(out.queryExecution.executedPlan).collect {
        case e: TopKPerGroupExec if e.partial => e.metrics("numDrains").value
      }
      assert(drains == Seq(3L), s"drain metric: $drains")
      // rows arrive grouped (2 per group back-to-back), so each drain
      // emits ~100 groups x 1 row: the shuffle carries ~n rows total and
      // the metric is the witness that flushes (not data volume) shaped it
    } finally spark.conf.unset(TopKPerGroup.MaxPartialGroupsKey)
  }

  test("distinct mode: eviction keeps the k smallest distinct keys") {
    import spark.implicits._
    // descending arrival order forces repeated evictions; duplicates of
    // the current worst must not evict anything
    val df = Seq(9, 8, 8, 7, 6, 6, 5, 4, 3, 2, 1, 1).map(("g", _))
      .toDF("g", "v").coalesce(1)
    val out = TopKPerGroup.distinct(df, Seq(col("g")),
      Seq(col("v").asc), k = 4)
      .collect().map(_.getInt(1)).toSet
    assert(out == Set(1, 2, 3, 4))
  }
}
