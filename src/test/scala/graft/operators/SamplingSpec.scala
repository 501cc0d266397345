package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Sampling]] — deterministic weighted reservoir sampling (A-ES with
  * the exact-integer max-of-w-hashes key). */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("key is the max of the w per-replica hashes, deterministic") {
    val df = Seq(("a", 101L, 3)).toDF("g", "id", "wgt")
    val key = Sampling.weightedSample(df, col("g"), col("id"),
      col("wgt"), k = 1).select("key").as[Long].collect().head
    // recompute locally: md5-prefix hash of "101#r" for r in 0..2
    def h(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    assert(key == (0 to 2).map(r => h(s"101#$r")).max)
    // rerun: identical (no RNG anywhere)
    val again = Sampling.weightedSample(df, col("g"), col("id"),
      col("wgt"), k = 1).select("key").as[Long].collect().head
    assert(again == key)
  }

  test("sampling without replacement: k distinct ids, all from the group") {
    val df = (1L to 100L).map(i => ("g", i, 2)).toDF("g", "id", "wgt")
    val out = Sampling.weightedSample(df, col("g"), col("id"),
      col("wgt"), k = 7).select("id").as[Long].collect()
    assert(out.length == 7 && out.distinct.length == 7)
    assert(out.forall(i => i >= 1 && i <= 100))
  }

  test("weights bias selection: w=8 items beat w=1 items ~8x") {
    // 500 heavy (w=8) + 500 light (w=1) items, sample 100: expectation
    // for the heavy share is ~8/9; accept a generous band — the key
    // construction is deterministic, so this is a fixed outcome, not a
    // flaky statistical draw
    val df = ((1L to 500L).map(i => ("g", i, 8)) ++
      (501L to 1000L).map(i => ("g", i, 1))).toDF("g", "id", "wgt")
    val picked = Sampling.weightedSample(df, col("g"), col("id"),
      col("wgt"), k = 100).select("id").as[Long].collect()
    val heavy = picked.count(_ <= 500L)
    assert(heavy >= 75 && heavy <= 99, s"heavy=$heavy of 100")
  }

  test("equal weights reduce to uniform hash order (w=1 key = hash(id#0))") {
    val df = (1L to 50L).map(i => ("g", i, 1)).toDF("g", "id", "wgt")
    val viaSample = Sampling.weightedSample(df, col("g"), col("id"),
      col("wgt"), k = 5).select("id").as[Long].collect().toSet
    val direct = df.withColumn("k0",
        graft.functions.TextFunctions.portableHash60(
          concat(col("id").cast("string"), lit("#0"))))
      .orderBy(col("k0").desc, col("id").asc).limit(5)
      .select("id").as[Long].collect().toSet
    assert(viaSample == direct)
  }

  test("hashSplit: disjoint+complete, deterministic, append-consistent") {
    val df = (1L to 400L).map(i => (i, s"s${i % 4}")).toDF("id", "st")
    val s1 = Sampling.hashSplit(df, col("id"), 800000L, 100000L)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(s1.size == 400 && s1.values.toSet.subsetOf(
      Set("train", "val", "test")))
    // roughly 80/10/10 (hash uniformity; fixed outcome, not statistical)
    val n = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(n("train") > 280 && n("val") < 80 && n("test") < 80, n.toString)
    // appending rows never moves an existing row's split
    val bigger = (1L to 600L).map(i => (i, s"s${i % 4}")).toDF("id", "st")
    val s2 = Sampling.hashSplit(bigger, col("id"), 800000L, 100000L)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(s1.forall { case (id, sp) => s2(id) == sp })
  }

  test("stratifiedSplitExact: per-stratum quotas are exact floors, " +
      "assignment deterministic in hash order") {
    val df = (1L to 403L).map(i => (i, s"s${i % 4}")).toDF("id", "st")
    val out = Sampling.stratifiedSplitExact(df, col("id"), col("st"),
        800000L, 100000L)
      .select("st", "split").as[(String, String)].collect()
    val byStratum = out.groupBy(_._1).view.mapValues(
      _.groupBy(_._2).view.mapValues(_.length).toMap).toMap
    byStratum.foreach { case (st, m) =>
      val tot = m.values.sum
      assert(m.getOrElse("train", 0) == tot * 800000L / 1000000L,
        s"$st train quota: $m")
      assert(m.getOrElse("train", 0) + m.getOrElse("val", 0) ==
        tot * 900000L / 1000000L, s"$st val quota: $m")
    }
    // deterministic: same input, same assignment
    val again = Sampling.stratifiedSplitExact(df, col("id"), col("st"),
        800000L, 100000L)
      .select("id", "split").as[(Long, String)].collect().toSet
    val first = Sampling.stratifiedSplitExact(df, col("id"), col("st"),
        800000L, 100000L)
      .select("id", "split").as[(Long, String)].collect().toSet
    assert(again == first)
  }

  test("leakageSafeSplit: no near-dup pair straddles two splits; " +
      "singletons match the plain hash split on their own id") {
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // a 3-chain (1-2, 2-3), a 2-cluster (10-11), and a far pair (50-150)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (50L, 150L))
      .toDF("id_1", "id_2")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", pairs,
      800000L, 100000L)
    val m = out.select("doc_id", "split").as[(Long, String)]
      .collect().toMap
    assert(m.size == 200)
    // every pair's endpoints share a split (transitively: the whole chain)
    Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (50L, 150L)).foreach {
      case (a, b) => assert(m(a) == m(b), s"pair ($a,$b) straddles splits")
    }
    // cluster_key is the component minimum; singletons keep their own id
    val keys = out.select("doc_id", "cluster_key").as[(Long, Long)]
      .collect().toMap
    assert(keys(1L) == 1L && keys(2L) == 1L && keys(3L) == 1L)
    assert(keys(10L) == 10L && keys(11L) == 10L && keys(150L) == 50L)
    assert(keys(42L) == 42L)
    // singleton assignment == plain hashSplit on the id (append-consistent
    // with a later doc-keyed split of never-clustered rows)
    val plain = Sampling.hashSplit(docs, col("doc_id"), 800000L, 100000L)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val clustered = Set(1L, 2L, 3L, 10L, 11L, 50L, 150L)
    m.keys.filterNot(clustered).foreach(id => assert(m(id) == plain(id)))
  }

  test("zero/negative weights mean zero selection probability (excluded), " +
      "not a bonus hash draw") {
    // sequence(0, w-1) steps DOWNWARD for w <= 0, which would hand a
    // weight-0 row TWO draws — a key that stochastically beats honest
    // weight-1 rows; weightedSample must exclude such rows instead
    val df = ((1L to 20L).map(i => ("g", i, 1)) ++
      Seq(("g", 100L, 0), ("g", 101L, -3))).toDF("g", "id", "wgt")
    val picked = Sampling.weightedSample(df, col("g"), col("id"),
      col("wgt"), k = 20).select("id").as[Long].collect().toSet
    assert(!picked.contains(100L) && !picked.contains(101L))
    assert(picked == (1L to 20L).toSet) // every positive-weight row kept
  }

  test("leakageSafeSplit: empty pair set degenerates to hashSplit") {
    val docs = (1L to 50L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_1", "id_2")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", noPairs,
        800000L, 100000L)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val plain = Sampling.hashSplit(docs, col("doc_id"), 800000L, 100000L)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out == plain)
  }
}
