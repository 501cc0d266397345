package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Sketches

/** [[Sketches.kmvDistinct]] — small-cardinality exactness, estimator
  * accuracy on uniform hashes, and the bounded-state claim. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("groups under k distinct values are counted exactly") {
    val d = (0 until 40).map(i => ("g" + (i % 2), (i % 10).toLong))
      .toDF("g", "h")
    val r = Sketches.kmvDistinct(d, Seq("g"), "h", k = 64, includeExact = true)
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    // 5 distinct h per group (i%10 splits 0,2,4,6,8 / 1,3,5,7,9)
    assert(r == Map("g0" -> ((5L, 5L)), "g1" -> ((5L, 5L))))
    // the default (production) shape is estimate-only — no exact branch
    val est = Sketches.kmvDistinct(d, Seq("g"), "h", k = 64)
    assert(est.columns.toSeq == Seq("g", "est_distinct"))
    assert(est.collect().map(x => x.getString(0) -> x.getLong(1)).toMap ==
      Map("g0" -> 5L, "g1" -> 5L))
  }

  test("estimate lands within 4 standard errors on uniform hashes") {
    // seeded uniform 60-bit hashes: the estimator's model assumption holds,
    // so |est/n - 1| <~ 4/sqrt(k-1) with overwhelming probability
    val rnd = new scala.util.Random(7)
    val n = 20000
    val k = 128
    val d = Seq.fill(n)(math.abs(rnd.nextLong()) % (1L << 60))
      .distinct.map(("g", _)).toDF("g", "h")
    val exact = d.select(col("h")).distinct().count()
    val r = Sketches.kmvDistinct(d, Seq("g"), "h", k = k,
      includeExact = true).collect()(0)
    assert(r.getAs[Long]("n_exact") == exact)
    val est = r.getAs[Long]("est_distinct").toDouble
    val relErr = math.abs(est / exact - 1.0)
    assert(relErr < 4.0 / math.sqrt(k - 1.0), s"relErr=$relErr est=$est n=$exact")
  }

  test("duplicate hashes do not inflate the estimate") {
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(5000)(math.abs(rnd.nextLong()) % (1L << 60)).distinct
    val dup = (base ++ base ++ base).map(("g", _)).toDF("g", "h")
    val once = base.map(("g", _)).toDF("g", "h")
    val a = Sketches.kmvDistinct(dup, Seq("g"), "h", k = 64,
      includeExact = true).collect()(0)
    val b = Sketches.kmvDistinct(once, Seq("g"), "h", k = 64,
      includeExact = true).collect()(0)
    assert(a.getAs[Long]("est_distinct") == b.getAs[Long]("est_distinct"))
    assert(a.getAs[Long]("n_exact") == b.getAs[Long]("n_exact"))
  }

  test("countMin: estimates are upper bounds, exact when width is ample") {
    val items = (0 until 100).map(i => ("g" + (i % 2), "item" + (i % 7)))
      .toDF("g", "item")
    val probes = items.select(col("item")).distinct()
    val exact = items.groupBy("g", "item").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    // narrow sketch: collisions possible, bound must hold
    val narrow = Sketches.cmsEstimate(
        Sketches.countMin(items, Seq("g"), "item", width = 4, depth = 3),
        probes, "item", width = 4, depth = 3)
      .collect().map(r => (r.getString(1), r.getString(0),
        r.getLong(r.fieldIndex("est_count"))))
    narrow.foreach { case (g, item, est) =>
      assert(est >= exact.getOrElse((g, item), 0L), s"($g,$item)")
    }

    // wide sketch: 64 buckets for 7 items at depth 4 — at least one
    // collision-free row per item is near-certain, so est == exact
    val wide = Sketches.cmsEstimate(
        Sketches.countMin(items, Seq("g"), "item", width = 64, depth = 4),
        probes, "item", width = 64, depth = 4)
      .collect().map(r => (r.getString(1), r.getString(0),
        r.getLong(r.fieldIndex("est_count"))))
    wide.foreach { case (g, item, est) =>
      assert(est == exact.getOrElse((g, item), 0L), s"($g,$item)")
    }
  }

  test("bloom: no false negatives; misses are definite; bit_or merge") {
    val rnd = new scala.util.Random(13)
    val inSet = Seq.fill(300)(math.abs(rnd.nextLong()) % (1L << 60)).distinct
    val outSet = Seq.fill(300)(math.abs(rnd.nextLong()) % (1L << 60))
      .distinct.filterNot(inSet.toSet)
    val items = inSet.toDF("h")
    val words = Sketches.bloom(items, "h", mBits = 8192, k = 3)
    // constant-size representation regardless of item count
    assert(words.count() <= 8192 / 64)
    val probes = (inSet.map((_, true)) ++ outSet.map((_, false)))
      .toDF("h", "member")
    val r = Sketches.bloomMightContain(probes, words, "h", 8192, 3)
      .collect().map(x => (x.getBoolean(1), x.getBoolean(2)))
    // every member hits (no false negatives)
    assert(r.filter(_._1).forall(_._2))
    // non-members mostly miss (8192 bits / 300 keys / k=3 -> low FP rate);
    // any hit among them is a false positive, never a correctness error
    val fpRate = r.filterNot(_._1).count(_._2).toDouble /
      r.count(!_._1)
    assert(fpRate < 0.05, s"fpRate=$fpRate")
    // merging two filters = bit_or of their word tables == filter of union
    val (a, b) = inSet.splitAt(150)
    val merged = Sketches.bloom(a.toDF("h"), "h", 8192, 3)
      .union(Sketches.bloom(b.toDF("h"), "h", 8192, 3))
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(word)").as("word"))
    val direct = words.collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    val m2 = merged.collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(direct == m2)
  }

  test("countMinSparse: identical estimates to the dense sketch, grouped " +
      "and global, including empty-cell zero misses") {
    val items = (0 until 100).map(i => ("g" + (i % 2), "item" + (i % 7)))
      .toDF("g", "item")
    // probe a token absent from the corpus too: its cells may be empty
    val probes = items.select(col("item")).distinct()
      .union(Seq("never-seen").toDF("item"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getString(1)) -> r.getLong(r.fieldIndex("est_count"))
    val dense = Sketches.cmsEstimate(
        Sketches.countMin(items, Seq("g"), "item", width = 4, depth = 3),
        probes, "item", width = 4, depth = 3)
      .select(col("g"), col("item"), col("est_count"))
      .collect().map(key).toMap
    val sparse = Sketches.cmsEstimateSparse(
        Sketches.countMinSparse(items, Seq("g"), "item", width = 4, depth = 3),
        probes, Seq("g"), "item", width = 4, depth = 3)
      .select(col("g"), col("item"), col("est_count"))
      .collect().map(key).toMap
    assert(sparse == dense)
    // global (ungrouped) twin — the surprisalScore composition shape
    val denseG = Sketches.cmsEstimate(
        Sketches.countMin(items, Seq.empty, "item", width = 8, depth = 2),
        probes, "item", width = 8, depth = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sparseG = Sketches.cmsEstimateSparse(
        Sketches.countMinSparse(items, Seq.empty, "item", width = 8, depth = 2),
        probes, Seq.empty, "item", width = 8, depth = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sparseG == denseG)
    // sparse handles a production width the dense agg could not codegen
    val wide = Sketches.countMinSparse(items, Seq("g"), "item",
      width = 65536, depth = 4)
    assert(wide.count() <= 2 * 4 * 7) // only occupied cells materialize
  }

  test("countMin: sketches merge by element-wise addition") {
    val half1 = (0 until 30).map(i => ("g", "i" + (i % 5))).toDF("g", "item")
    val half2 = (30 until 60).map(i => ("g", "i" + (i % 5))).toDF("g", "item")
    val all = half1.union(half2)
    def matrix(df: org.apache.spark.sql.DataFrame): Seq[Seq[Long]] =
      Sketches.countMin(df, Seq("g"), "item", width = 8, depth = 2)
        .collect()(0).getSeq[scala.collection.Seq[Long]](1)
        .map(_.toSeq).toSeq
    val full = matrix(all)
    val m1 = matrix(half1)
    val m2 = matrix(half2)
    val summed = m1.zip(m2).map { case (r1, r2) =>
      r1.zip(r2).map { case (a, b) => a + b } }
    assert(full == summed)
  }

  test("bitLength is exact on every boundary floor(log2) misrounds") {
    // reference: 64 - numberOfLeadingZeros; the probe set hits the
    // 2^k / 2^k-1 edges where double log2 rounds the wrong way
    val probes = (0L +: 1L +:
      (1 to 59).flatMap(k => Seq((1L << k) - 1, 1L << k, (1L << k) + 1)) :+
      ((1L << 60) - 1)).distinct
    val got = probes.toDF("x")
      .select(col("x"), Sketches.bitLength(col("x")).as("bl"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    probes.foreach { x =>
      val expect = 64 - java.lang.Long.numberOfLeadingZeros(x)
      assert(got(x) == expect, s"x=$x got=${got(x)} want=$expect")
    }
  }

  test("hll: output is the bit-exact integer-register reference") {
    // pure-Scala twin of the operator's register math — pins the layout
    // (idx = h mod m, payload = h >> log2m, contribution = 2^bitlen) that
    // the DuckDB oracle (q159) reproduces
    val rnd = new scala.util.Random(13)
    val hashes = Seq.fill(3000)(math.abs(rnd.nextLong()) % (1L << 60))
    val log2m = 6
    val m = 1 << log2m
    val regs = hashes.groupBy(h => (h % m).toInt).map { case (idx, hs) =>
      idx -> hs.map(h => 64 - java.lang.Long.numberOfLeadingZeros(h >> log2m))
        .min
    }
    val regSum = regs.values.map(mb => 1L << mb).sum +
      (m - regs.size).toLong * (1L << 55)
    val expectEst =
      math.floor(Sketches.hllNumerator(log2m) / regSum.toDouble).toLong
    val r = Sketches.hllDistinct(hashes.map(("g", _)).toDF("g", "h"),
      Seq("g"), "h", log2m).collect()(0)
    assert(r.getAs[Long]("n_zero_registers") == (m - regs.size).toLong)
    assert(r.getAs[Long]("reg_sum") == regSum)
    assert(r.getAs[Long]("est_distinct") == expectEst)
  }

  test("hll: streaming register maintenance == batch sketch") {
    // the register table is a plain min-agg, so structured streaming in
    // complete mode maintains it incrementally; rolling up the sink after
    // any batch gives exactly the batch sketch over the data so far
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sqlc = spark.sqlContext
    implicit val sq: org.apache.spark.sql.SQLContext = sqlc
    val rnd = new scala.util.Random(31)
    val all = Seq.fill(4000)(math.abs(rnd.nextLong()) % (1L << 60))
      .map(("g", _))
    val mem = MemoryStream[(String, Long)]
    val q = Sketches.hllRegisters(mem.toDF().toDF("g", "h"), Seq("g"), "h",
        log2m = 6)
      .writeStream.format("memory").queryName("hllregs")
      .outputMode("complete").start()
    try {
      val (b1, b2) = all.splitAt(1500)
      mem.addData(b1); q.processAllAvailable()
      val mid = Sketches.hllFromRegisters(spark.table("hllregs"),
        Seq("g"), 6).collect()(0)
      val midBatch = Sketches.hllDistinct(b1.toDF("g", "h"),
        Seq("g"), "h", 6).collect()(0)
      assert(mid.getAs[Long]("reg_sum") == midBatch.getAs[Long]("reg_sum"))
      mem.addData(b2); q.processAllAvailable()
      val fin = Sketches.hllFromRegisters(spark.table("hllregs"),
        Seq("g"), 6).collect()(0)
      val finBatch = Sketches.hllDistinct(all.toDF("g", "h"),
        Seq("g"), "h", 6).collect()(0)
      assert(fin.getAs[Long]("reg_sum") == finBatch.getAs[Long]("reg_sum"))
      assert(fin.getAs[Long]("est_distinct") ==
        finBatch.getAs[Long]("est_distinct"))
    } finally q.stop()
  }

  test("hll: period sketches merge by re-running the register min-agg") {
    val rnd = new scala.util.Random(37)
    val day1 = Seq.fill(2000)(math.abs(rnd.nextLong()) % (1L << 60))
    val day2 = Seq.fill(2000)(math.abs(rnd.nextLong()) % (1L << 60))
    def regs(xs: Seq[Long]) = Sketches.hllRegisters(
      xs.map(("g", _)).toDF("g", "h"), Seq("g"), "h", 6)
    val merged = regs(day1).unionByName(regs(day2))
      .groupBy(col("g"), col("reg_idx"))
      .agg(min(col("reg_mb")).as("reg_mb"))
    val got = Sketches.hllFromRegisters(merged, Seq("g"), 6).collect()(0)
    val want = Sketches.hllDistinct((day1 ++ day2).map(("g", _))
      .toDF("g", "h"), Seq("g"), "h", 6).collect()(0)
    assert(got.getAs[Long]("reg_sum") == want.getAs[Long]("reg_sum"))
    assert(got.getAs[Long]("est_distinct") ==
      want.getAs[Long]("est_distinct"))
  }

  test("hll: estimate lands within 4 standard errors; duplicates free") {
    val rnd = new scala.util.Random(29)
    val n = 30000
    val base = Seq.fill(n)(math.abs(rnd.nextLong()) % (1L << 60)).distinct
    val log2m = 8 // SE ~ 1.04/sqrt(256) = 6.5%
    val est = Sketches.hllDistinct(base.map(("g", _)).toDF("g", "h"),
      Seq("g"), "h", log2m).collect()(0).getAs[Long]("est_distinct")
    val relErr = math.abs(est.toDouble / base.size - 1.0)
    assert(relErr < 4 * 1.04 / math.sqrt(1 << log2m),
      s"relErr=$relErr est=$est n=${base.size}")
    // idempotence: a second copy of every item changes nothing (min-agg)
    val est2 = Sketches.hllDistinct((base ++ base).map(("g", _)).toDF("g", "h"),
      Seq("g"), "h", log2m).collect()(0).getAs[Long]("est_distinct")
    assert(est2 == est)
  }

  test("cms: streaming cell maintenance == batch sketch") {
    // the sparse cell table is a plain count-agg — complete-mode streaming
    // maintains it; after any batch the sink IS the batch sketch so far
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val items = (1 to 500).map(i => s"tok${i % 37}")
    val mem = MemoryStream[String]
    val q = Sketches.countMinSparse(mem.toDF().toDF("item"), Seq.empty,
        "item", 16, 4)
      .writeStream.format("memory").queryName("cmscells")
      .outputMode("complete").start()
    try {
      val (b1, b2) = items.splitAt(200)
      mem.addData(b1: _*); q.processAllAvailable()
      def cells(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      import spark.implicits._
      assert(cells(spark.table("cmscells")) ==
        cells(Sketches.countMinSparse(b1.toDF("item"), Seq.empty, "item", 16, 4)))
      mem.addData(b2: _*); q.processAllAvailable()
      assert(cells(spark.table("cmscells")) ==
        cells(Sketches.countMinSparse(items.toDF("item"), Seq.empty, "item", 16, 4)))
    } finally q.stop()
  }

  test("cmsMergeSparse: day-partitioned sketches sum to the exact whole-stream sketch") {
    import spark.implicits._
    val rows = (1 to 300).map(i => (i % 3, s"item${i % 40}"))
    val df = rows.toDF("day", "item")
    val daily = Sketches.countMinSparse(df, Seq("day"), "item", 16, 4)
    val merged = Sketches.cmsMergeSparse(daily, Seq.empty)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val direct = Sketches.countMinSparse(df.select($"item"), Seq.empty,
        "item", 16, 4)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // linearity: cell-for-cell identical, not merely similar estimates
    assert(merged == direct)
  }

  test("hdrBucket/hdrLowerBound: monotone ids, lb <= v, relative error " +
      "<= 2^-m on every power-of-two boundary") {
    val m = 5
    val vals = (0L to 200L) ++
      (1 to 62).flatMap(e => Seq((1L << e) - 1, 1L << e, (1L << e) + 1)) ++
      Seq(Long.MaxValue)
    val df = vals.distinct.sorted.toDF("v")
    val rows = df.select(col("v"),
        Sketches.hdrBucket(col("v"), m).as("id"))
      .withColumn("lb", Sketches.hdrLowerBound(col("id"), m))
      .orderBy("v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.sliding(2).foreach { case Array((v1, id1, _), (v2, id2, _)) =>
      assert(id1 <= id2, s"ids not monotone at $v1 -> $v2")
    case _ => }
    rows.foreach { case (v, _, lb) =>
      assert(lb <= v, s"lb $lb > v $v")
      assert(v - lb <= math.max(1L, lb >>> m),
        s"v=$v lb=$lb exceeds 2^-$m relative width")
    }
    // small-value regime is EXACT
    rows.filter(_._1 < (1L << (m + 1))).foreach { case (v, _, lb) =>
      assert(lb == v)
    }
  }

  test("hdr: streaming bucket-count maintenance == batch histogram") {
    // the histogram is a plain count-agg keyed (group, bucket), so
    // structured streaming in complete mode maintains the sketch
    // incrementally; any batch's sink state IS the batch histogram over
    // the data so far — the same property the HLL registers have
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = (1L to 3000L).map(i => ("g", i * i % 70001))
    val mem = MemoryStream[(String, Long)]
    val q = Sketches.hdrHistogram(mem.toDF().toDF("g", "v"), Seq("g"),
        col("v"), mBits = 5)
      .writeStream.format("memory").queryName("hdrhist")
      .outputMode("complete").start()
    try {
      val (b1, b2) = all.splitAt(1000)
      def key(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      mem.addData(b1); q.processAllAvailable()
      assert(key(spark.table("hdrhist")) ==
        key(Sketches.hdrHistogram(b1.toDF("g", "v"), Seq("g"),
          col("v"), 5)))
      mem.addData(b2); q.processAllAvailable()
      assert(key(spark.table("hdrhist")) ==
        key(Sketches.hdrHistogram(all.toDF("g", "v"), Seq("g"),
          col("v"), 5)))
    } finally q.stop()
  }

  test("hdrQuantiles: within 2^-m relative of exact; period merge == " +
      "whole-stream histogram") {
    val m = 5
    // two "days" of skewed values, one group
    val d1 = (1L to 700L).map(i => ("g", "d1", i * i % 5000 + 1))
    val d2 = (1L to 300L).map(i => ("g", "d2", i * 37 % 90000 + 1))
    val df = (d1 ++ d2).toDF("g", "day", "v")
    val whole = Sketches.hdrHistogram(df, Seq("g"), col("v"), m)
    val perDay = Sketches.hdrHistogram(df, Seq("g", "day"), col("v"), m)
    val merged = Sketches.hdrMerge(perDay, Seq("g"))
    assert(merged.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).toSet ==
      whole.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).toSet)
    val q = Sketches.hdrQuantiles(whole, Seq("g"), m,
        Seq(500000L, 990000L)).collect().head
    val sortedV = (d1 ++ d2).map(_._3).sorted
    def exact(p: Double) = sortedV((math.ceil(p * sortedV.size) - 1).toInt)
    for ((got, p) <- Seq((q.getLong(1), 0.5), (q.getLong(2), 0.99))) {
      val ex = exact(p)
      assert(got <= ex && ex - got <= math.max(1L, got >>> m),
        s"p=$p got=$got exact=$ex")
    }
  }

  test("cms: streaming sparse-cell maintenance == batch sketch") {
    // the sparse CMS is a plain count-agg keyed (j, bucket), so structured
    // streaming in complete mode maintains the GATE sketch of
    // heavyHittersExact incrementally — the ingest-side story: cells
    // accumulate on the stream, the gated exact confirm runs on demand
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = (0 until 2000).map(i => "w" + (i * i % 97))
    val mem = MemoryStream[String]
    val q = Sketches.countMinSparse(mem.toDF().toDF("item"), Nil, "item",
        width = 32, depth = 3)
      .writeStream.format("memory").queryName("cmscells")
      .outputMode("complete").start()
    try {
      val (b1, b2) = all.splitAt(700)
      def key(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      mem.addData(b1); q.processAllAvailable()
      assert(key(spark.table("cmscells")) ==
        key(Sketches.countMinSparse(b1.toDF("item"), Nil, "item", 32, 3)))
      mem.addData(b2); q.processAllAvailable()
      assert(key(spark.table("cmscells")) ==
        key(Sketches.countMinSparse(all.toDF("item"), Nil, "item", 32, 3)))
    } finally q.stop()
  }

  test("kmv: streaming k-minima state == batch sketch after every batch") {
    // KMV is closed under union, so the mapGroupsWithState artifact after
    // any batch must equal the batch sketch over the data so far — the
    // live-ingest path for the q266 overlap inputs
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val all = Seq.fill(3000)(EventStream.KmvRow(
      "s" + rnd.nextInt(3), math.abs(rnd.nextLong()) % (1L << 60)))
    val got = scala.collection.concurrent.TrieMap.empty[String, Seq[Long]]
    val mem = MemoryStream[EventStream.KmvRow]
    val q = EventStream.maintainKmvSketch(mem.toDS(), k = 16)
      .writeStream.outputMode("update")
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[EventStream.KmvState],
          _: Long) =>
        ds.collect().foreach(s => got(s.g) = s.kmv)
      }
      .start()
    try {
      def batchSketch(rows: Seq[EventStream.KmvRow]) =
        Sketches.kmvSketch(rows.toDF("g", "h"), Seq("g"), "h", 16)
          .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val (b1, b2) = all.splitAt(1100)
      mem.addData(b1); q.processAllAvailable()
      assert(got.toMap == batchSketch(b1))
      mem.addData(b2); q.processAllAvailable()
      assert(got.toMap == batchSketch(all))
    } finally q.stop()
  }

  test("kmvOverlapPairs: exact set arithmetic in the below-k regime") {
    // |A|=6, |B|=5, |A∩B|=3, |A∪B|=8 — all below k, so the sketches ARE
    // the hash sets and every estimate must be the exact value
    val a = Seq(10L, 20L, 30L, 40L, 50L, 60L).map(("a", _))
    val b = Seq(30L, 40L, 50L, 70L, 80L).map(("b", _))
    val sk = Sketches.kmvSketch((a ++ b).toDF("g", "h"), Seq("g"), "h", k = 64)
    val r = Sketches.kmvOverlapPairs(sk, "g", k = 64).collect().head
    assert(r.getAs[String]("g_a") == "a" && r.getAs[String]("g_b") == "b")
    assert(r.getAs[Long]("est_union") == 8L)
    assert(r.getAs[Long]("est_intersection") == 3L)
    assert(r.getAs[Long]("jaccard_ppm") == (1000000L * 3 / 8))
  }

  test("kmvOverlapPairs: union/Jaccard estimates land near truth on " +
      "uniform hashes; sketch union == sketch of unioned stream") {
    val rnd = new scala.util.Random(13)
    val k = 128
    def draw(n: Int) =
      Seq.fill(n)(math.abs(rnd.nextLong()) % (1L << 60)).distinct
    val common = draw(4000)
    val onlyA = draw(6000).filterNot(common.contains)
    val onlyB = draw(6000).filterNot(common.contains)
    val rows = (common ++ onlyA).map(("a", _)) ++
      (common ++ onlyB).map(("b", _))
    val sk = Sketches.kmvSketch(rows.toDF("g", "h"), Seq("g"), "h", k)
    // closure: merging the two per-group sketches gives exactly the
    // sketch of the concatenated stream
    val mergedArr = Sketches.kmvMergeSketches(sk, Seq.empty, k)
      .collect().head.getSeq[Long](0)
    val wholeArr = Sketches.kmvSketch(rows.map(r => ("all", r._2))
      .toDF("g", "h"), Seq("g"), "h", k)
      .collect().head.getSeq[Long](1)
    assert(mergedArr == wholeArr)
    val r = Sketches.kmvOverlapPairs(sk, "g", k).collect().head
    val exactUnion = (common ++ onlyA ++ onlyB).distinct.size.toDouble
    val exactJac = common.size.toDouble / exactUnion
    assert(math.abs(r.getAs[Long]("est_union") / exactUnion - 1.0) <
      4.0 / math.sqrt(k - 1.0))
    // ρ is a k-sample binomial of the true Jaccard — allow 4 binomial SEs
    val se = 4.0 * math.sqrt(exactJac * (1 - exactJac) / k)
    assert(math.abs(r.getAs[Long]("jaccard_ppm") / 1e6 - exactJac) < se,
      s"jac=${r.getAs[Long]("jaccard_ppm")} exact=$exactJac")
    assert(math.abs(r.getAs[Long]("est_intersection").toDouble
      - common.size) < (se + 4.0 / math.sqrt(k - 1.0)) * exactUnion)
  }

  test("heavyHittersExact == GROUP BY HAVING under forced CMS collisions") {
    // width 4 over an 80-type vocabulary: nearly every cell collides, so
    // the gate passes plenty of impostors — the exact confirm must strip
    // every one of them. Frequencies: item i appears (i % 13 + 1) times.
    val rows = (0 until 80).flatMap(i => Seq.fill(i % 13 + 1)(s"w$i"))
    val df = rows.toDF("item")
    val phiPpm = 18000L // threshold = ceil(0.018 * 557) = 11
    val got = Sketches.heavyHittersExact(df, "item", phiPpm,
      width = 4, depth = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = rows.size
    val th = math.max(1L, (n * phiPpm + 999999L) / 1000000L)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= th).toMap
    assert(got == exact, s"threshold=$th got=${got.size} exact=${exact.size}")
    assert(exact.nonEmpty && exact.size < 80) // the gate actually selects
  }

  test("heavyHittersExact plan: join-free literal gate, one exchange") {
    import spark.implicits._
    // a PARQUET scan, not a local Seq: Catalyst's ConvertToLocalRelation
    // pre-evaluates any deterministic filter over a LocalRelation (even
    // under a repartition, after pushdown), which would erase the gate
    // from the physical plan and void the assertion
    val rows = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("item"))
    val df = Sketches.heavyHittersExact(rows, "item", 10000L,
      width = 64, depth = 3)
    df.collect() // materialize so AQE finalizes the adaptive plan
    val s = df.queryExecution.executedPlan.toString
    // the gate probes a LITERAL cell array — no join anywhere in the
    // confirm plan, and the element_at gate filter sits BELOW the lowest
    // exchange (top-down print: after the last Exchange line), so only
    // gate survivors ever cross a shuffle
    assert(!s.contains("Join"), s)
    val tail = s.substring(s.lastIndexOf("Exchange hashpartitioning"))
    assert(tail.contains("Filter") && tail.contains("element_at"),
      s"gate filter not below the lowest exchange:\n$s")
  }

  test("heavyHittersExact: empty input and all-pass regimes") {
    val empty = Seq.empty[String].toDF("item")
    assert(Sketches.heavyHittersExact(empty, "item", 1000L, 8, 2).count() == 0)
    // phi so low every item passes: output == full exact wordcount
    val rows = Seq("a", "a", "b", "c", "c", "c").toDF("item")
    val got = Sketches.heavyHittersExact(rows, "item", 1L, 64, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 1L, "c" -> 3L))
  }

  test("bucket families separate mod-2^31 twins (double hashing, not the " +
      "universal family's mod-p collapse)") {
    // two 60-bit hashes congruent mod 2^31-1: under the (a·(x mod p)+b)
    // family EVERY bloom position and EVERY cms row bucket coincided —
    // flooring bloom FP at ~n/2^31 regardless of provisioned bits
    val p = 2147483647L
    val twins = Seq(12345L, 12345L + p, 12345L + 7L * p).toDF("h")
    val posCols = Sketches.bloomPositions(col("h"), mBits = 4096, k = 5)
    val pos = twins.select(array(posCols: _*).as("pos"))
      .collect().map(_.getSeq[Long](0).toVector)
    assert(pos.distinct.length == 3,
      s"mod-p twins share all bloom positions: ${pos.mkString(" | ")}")
    // same separation for CMS buckets: the sparse cell sets must differ
    // across the twins' single-item sketches (strings hash via
    // portableHash60 internally, so craft twin STRINGS is not needed —
    // feed the hashes through a probe frame and compare bucket vectors)
    val cells = Seq(12345L, 12345L + p).map { h =>
      Sketches.countMinSparse(Seq(h.toString).toDF("item"), Nil,
        "item", width = 1024, depth = 4)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    }
    // twin STRINGS do not hash to mod-p-congruent values, so this pins
    // only that buckets vary with j (K-M double hashing in effect)
    assert(cells.head.map(_._1) == Set(0, 1, 2, 3))
  }

  test("null items/hashes are dropped, not counted (kmv, hll, cms, " +
      "heavy hitters)") {
    val withNull = Seq(Some(100L), Some(200L), Some(300L), None)
      .toDF("h")
    // kmv: null must not occupy a k-minima slot (k=3 → kth would be the
    // null under NULLS-FIRST asc). 3 distinct reals < k+1 → exact count 3
    val kmv = Sketches.kmvDistinct(withNull.withColumn("g", lit("g")),
      Seq("g"), "h", k = 4).collect().head
    assert(kmv.getAs[Long]("est_distinct") == 3L)
    // kmvSketch: array holds only the real hashes
    val arr = Sketches.kmvSketch(withNull.withColumn("g", lit("g")),
      Seq("g"), "h", k = 4).collect().head.getSeq[Long](1)
    assert(arr == Seq(100L, 200L, 300L))
    // hll: no phantom register — present registers == distinct real hashes
    val regs = Sketches.hllRegisters(withNull.withColumn("g", lit("g")),
      Seq("g"), "h", log2m = 4).collect()
    assert(regs.length == 3 && regs.forall(!_.isNullAt(1)))
    // cms sparse: no null-bucket cells
    val items = Seq(Some("a"), Some("b"), None).toDF("item")
    val cells = Sketches.countMinSparse(items, Nil, "item", 16, 2).collect()
    assert(cells.forall(!_.isNullAt(1)))
    assert(cells.map(_.getLong(2)).sum == 4L) // 2 items × 2 rows
    // heavy hitters: a null item must not NPE the driver cell loop
    val hh = Sketches.heavyHittersExact(items, "item", 1L, 16, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == Map("a" -> 1L, "b" -> 1L))
  }
}
