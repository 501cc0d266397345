package graft.operators

import graft.SparkSpec

/** [[QaSampling]] — hand-computed Neyman allocation and a pure-Scala
  * jackknife reference (negative scores exercise the truncating integer
  * division both engines share). */
class QaSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("neymanAllocation: variance gets the budget, sigma=0 gets none") {
    // domain a: scores {0, 10} twice -> n=4, s1=20, s2=200,
    //   var_num = 4*200 - 400 = 400, w = 20
    // domain b: constant 7 -> var_num = 0, w = 0
    // domain c: {-5, 5} -> n=2, s1=0, s2=50, var_num = 100, w = 10
    val d = Seq(("a", 0L), ("a", 10L), ("a", 0L), ("a", 10L),
      ("b", 7L), ("b", 7L), ("b", 7L), ("c", -5L), ("c", 5L))
      .toDF("source", "score")
    val r = QaSampling.neymanAllocation(d, "source", "score", budget = 90L)
      .collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))))
      .toMap
    assert(r("a") == ((4L, 400L, 20L, 60L))) // 90*20/30
    assert(r("b") == ((3L, 0L, 0L, 0L)))
    assert(r("c") == ((2L, 100L, 10L, 30L)))
    // all-constant corpus: tw = 0 -> zero allocations, no division error
    val flat = Seq(("a", 1L), ("b", 1L)).toDF("source", "score")
    assert(QaSampling.neymanAllocation(flat, "source", "score", 10L)
      .collect().forall(_.getLong(4) == 0L))
  }

  test("jackknifeVariance matches a pure-Scala reference fold") {
    val rnd = new scala.util.Random(61)
    val rows = (1L to 400L).map(id => id -> (rnd.nextInt(400) - 200).toLong)
    val buckets = 10
    // reference: same hash bucketing, same truncating integer division
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val byB = rows.groupBy { case (id, _) => (h60(id.toString) % buckets) }
    val tn = rows.size.toLong
    val ts = rows.map(_._2).sum
    val ms = byB.values.map { xs =>
      val n = xs.size.toLong
      val s = xs.map(_._2).sum
      (1000000L * (ts - s)) / (tn - n) // JVM division truncates like both engines
    }.toSeq
    val expVar = ms.size.toLong * ms.map(m => m * m).sum -
      ms.sum * ms.sum
    val r = QaSampling.jackknifeVariance(rows.toDF("doc_id", "score"),
      "doc_id", "score", buckets).collect()(0)
    assert(r.getAs[Long]("n_rows") == tn)
    assert(r.getAs[Long]("n_buckets") == byB.size.toLong)
    assert(r.getAs[Long]("sum_m") == ms.sum)
    assert(r.getAs[Long]("sum_m2") == ms.map(m => m * m).sum)
    assert(r.getAs[Long]("var_num") == expVar)
    assert(expVar >= 0)
  }

  test("olsPerGroup: exact line recovered, noisy line matches closed form, constant x is NULL") {
    import spark.implicits._
    val d = Seq(
      // group a: y = 3 + 2x exactly
      ("a", 0L, 3L), ("a", 1L, 5L), ("a", 2L, 7L), ("a", 3L, 9L),
      // group b: (0,0),(1,1),(2,1) -> slope 1/2, intercept 1/6
      ("b", 0L, 0L), ("b", 1L, 1L), ("b", 2L, 1L),
      // group c: constant x -> undefined fit
      ("c", 4L, 1L), ("c", 4L, 9L)
    ).toDF("g", "x", "y")
    val r = QaSampling.olsPerGroup(d, "g", "x", "y").collect()
      .map(row => row.getString(0) ->
        ((row.getLong(1), Option(row.get(2)).map(_.asInstanceOf[Double]),
          Option(row.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(r("a") == ((4L, Some(2.0), Some(3.0))))
    assert(r("b")._2 == Some(0.5))
    assert(r("b")._3 == Some(0.166667))
    assert(r("c") == ((2L, None, None)))
  }

  test("errorRateCi: Wilson bounds bracket the rate, stay in [0,1], minN gate") {
    import spark.implicits._
    val rows =
      (1 to 100).map(i => ("big", i <= 10)) ++   // 10% over 100 trials
      (1 to 50).map(_ => ("clean", false)) ++    // 0% over 50
      (1 to 10).map(_ => ("tiny", true))         // under minN
    val r = QaSampling.errorRateCi(rows.toDF("g", "err"), "g", "err", 50L)
      .collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4)))).toMap
    assert(!r.contains("tiny"))
    val (n, k, lo, hi) = r("big")
    assert(n == 100L && k == 10L)
    assert(lo > 0 && lo < 0.1 && hi > 0.1 && hi < 1.0)
    // Wilson 95% for 10/100: ~[0.0552, 0.1744]
    assert(math.abs(lo - 0.055207) < 1e-4, s"lo $lo")
    assert(math.abs(hi - 0.174409) < 1e-4, s"hi $hi")
    val (_, k0, lo0, hi0) = r("clean")
    assert(k0 == 0L && lo0 == 0.0 && hi0 > 0 && hi0 < 0.1)
  }

  test("timeWeightedAvg: step function integrates exactly, zero span is NULL") {
    import spark.implicits._
    // key a: v=10 for 4us, v=20 for 6us -> (40+120)/10 = 16
    val d = Seq(
      ("a", 1L, 0L, 10L), ("a", 2L, 4L, 20L), ("a", 3L, 10L, 99L),
      ("b", 4L, 5L, 7L) // single event: span 0
    ).toDF("k", "event_id", "us", "v")
    val r = graft.streaming.EventStream.timeWeightedAvg(d, "k", "us",
        "event_id", "v")
      .collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2),
          Option(x.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(r("a") == ((3L, 10L, Some(16.0))))
    assert(r("b") == ((1L, 0L, None)))
  }
}
