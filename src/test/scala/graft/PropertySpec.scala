package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Property-style tests (SURVEY.md §5 strategy): randomized inputs checked
  * against executable models — in_range vs the reference truth table,
  * collapse (A1) vs brute-force group counts, pyramid level count vs its
  * mathematical definition. */
class PropertySpec extends SparkSpec {

  test("property: inRange matches the reference's Python semantics") {
    // model of python/lib/imaging.py:1276-1299
    def model(v: Option[Double], mn: Option[Double], mx: Option[Double]): Boolean =
      (mn, mx) match {
        case (None, None) => true
        case _ => v.exists(x => mn.forall(x >= _) && mx.forall(x <= _))
      }
    val cases = (for {
      v <- Seq(None, Some(-101.0), Some(0.0), Some(50.0), Some(101.0))
      mn <- Seq(None, Some(-50.0), Some(0.0), Some(50.0))
      mx <- Seq(None, Some(-50.0), Some(0.0), Some(50.0))
    } yield (v, mn, mx)) ++ {
      val rnd = new scala.util.Random(7)
      Seq.fill(200)((
        if (rnd.nextBoolean()) Some(rnd.nextDouble() * 200 - 100) else None,
        if (rnd.nextBoolean()) Some(rnd.nextDouble() * 200 - 100) else None,
        if (rnd.nextBoolean()) Some(rnd.nextDouble() * 200 - 100) else None))
    }
    val schema = StructType(Seq(
      StructField("v", DoubleType), StructField("mn", DoubleType),
      StructField("mx", DoubleType), StructField("exp", BooleanType, false)))
    val rows = cases.map { case (v, mn, mx) =>
      Row(v.map(Double.box).orNull, mn.map(Double.box).orNull,
        mx.map(Double.box).orNull, model(v, mn, mx))
    }
    val out = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
      .withColumn("got",
        graft.functions.Predicates.inRange(col("v"), col("mn"), col("mx")))
      .filter(col("got") =!= col("exp"))
    assert(out.count() == 0)
  }

  test("property: series collapse NumberOfFiles == brute-force group counts") {
    val rnd = new scala.util.Random(11)
    import spark.implicits._
    // random file rows over a small key space to force collisions
    val rows = Seq.tabulate(500)(i => (
      rnd.nextInt(5) + 1,                       // series_number
      s"1.2.3.s${rnd.nextInt(4)}",              // series_uid
      rnd.nextInt(3) + 1,                       // echo bucket -> echo_time
      i))
      .map { case (sn, uid, echo, i) =>
        ("1.2.3.study", sn, uid, echo, i, s"f$i.dcm", echo * 10.0, true, "MR")
      }
    val df = rows.toDF("study_uid", "series_number", "series_uid",
      "echo_number", "instance_number", "file_path", "echo_time",
      "is_dicom", "modality")
      .withColumn("series_description", lit("d"))
      .withColumn("sequence_name", lit("sq"))
      .withColumn("repetition_time", lit(2000.0))
      .withColumn("inversion_time", lit(null).cast("double"))
      .withColumn("slice_thickness", lit(1.0))
      .withColumn("phase_encoding", lit("ROW"))
      .withColumn("md5", col("file_path"))
    val series = graft.operators.DicomSummary.series(df)
      .select("SeriesNumber", "SeriesUID", "EchoTime", "NumberOfFiles")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)) -> r.getInt(3)).toMap
    val brute = rows.groupBy(r => (r._2, r._3, r._7)).map { case (k, v) => k -> v.size }
    assert(series.size == brute.size)
    brute.foreach { case ((sn, uid, te), n) => assert(series((sn, uid, te)) == n) }
  }

  test("property: levelCount(n, cs) == smallest L with cs^L >= n") {
    def mathL(n: Long, cs: Int): Int = {
      var l = 0
      var p = 1L
      while (p < n) { p *= cs; l += 1 }
      l
    }
    val rnd = new scala.util.Random(13)
    val chunkSizes = Seq(2, 5, 8, 32, 5000)
    val cases = for {
      cs <- chunkSizes
      n <- Seq.fill(40)(rnd.nextLong(2000000L) + 1) ++
        Seq(1L, cs.toLong, cs.toLong + 1, cs.toLong * cs, cs.toLong * cs + 1)
    } yield (n, cs)
    import spark.implicits._
    chunkSizes.foreach { cs =>
      val ns = cases.filter(_._2 == cs).map(_._1)
      val got = ns.toDF("n")
        .select(col("n"), graft.operators.EphysChunker.levelCount(col("n"), cs))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      ns.foreach(n => assert(got(n) == mathL(n, cs), s"n=$n cs=$cs"))
    }
  }

  test("property: Count-Min estimate >= exact count on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Seq("a", "bb", "ccc", "dd dd", "é", "0", "tok7", "x")
    val items = Seq.fill(300)(("g" + rnd.nextInt(3),
      vocab(rnd.nextInt(vocab.size)))).toDF("g", "item")
    val exact = items.groupBy("g", "item").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (width <- Seq(2, 5, 16); depth <- Seq(1, 3)) {
      val sk = graft.operators.Sketches.countMin(
        items, Seq("g"), "item", width, depth)
      val est = graft.operators.Sketches.cmsEstimate(
          sk, items.select(col("item")).distinct(), "item", width, depth)
        .collect()
      est.foreach { r =>
        val key = (r.getString(1), r.getString(0))
        assert(r.getLong(r.fieldIndex("est_count")) >=
          exact.getOrElse(key, 0L), s"$key w=$width d=$depth")
      }
    }
  }

  test("property: distinct top-k heap == sorted-distinct-take on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 5) {
      val n = 50 + rnd.nextInt(200)
      val rows = Seq.fill(n)((rnd.nextInt(4), rnd.nextInt(20).toLong))
      val k = 1 + rnd.nextInt(6)
      val df = rows.toDF("g", "v").repartition(3 + rnd.nextInt(3))
      val got = graft.plans.TopKPerGroup.distinct(df, Seq(col("g")),
          Seq(col("v").asc), k)
        .collect().map(r => (r.getInt(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      val want = rows.groupBy(_._1).view
        .mapValues(_.map(_._2).distinct.sorted.take(k).toSeq).toMap
      assert(got == want, s"trial=$trial k=$k")
    }
  }

  test("property: packSequences start offsets are exact prefix sums per shard") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val docs = (0L until 120L).map(i =>
      (i, Seq.fill(rnd.nextInt(9) + 1)("w").mkString(" "))).toDF("doc_id", "text")
    for (seqLen <- Seq(1, 7, 32)) {
      val r = graft.operators.CorpusOps
        .packSequences(docs, "doc_id", "text", nShards = 4, seqLen = seqLen)
        .collect()
        .map(x => (x.getLong(1), x.getLong(3) * seqLen + x.getLong(4),
          x.getLong(2)))
      r.groupBy(_._1).foreach { case (_, rows) =>
        val sorted = rows.sortBy(_._2)
        val expectedStarts = sorted.map(_._3).scanLeft(0L)(_ + _).init
        assert(sorted.map(_._2).toSeq == expectedStarts.toSeq)
      }
    }
  }

  test("property: duplicatedNgramStats fractions bounded, counts consistent") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val words = Seq("p", "q", "r", "s")
    val docs = (0L until 60L).map(i =>
      (i, Seq.fill(rnd.nextInt(8))(words(rnd.nextInt(words.size)))
        .mkString(" "))).toDF("doc_id", "text")
    val r = graft.operators.CorpusOps
      .duplicatedNgramStats(docs, "doc_id", "text", n = 2)
      .collect()
    assert(r.length == 60)
    r.foreach { x =>
      val (n, nd) = (x.getLong(1), x.getLong(2))
      assert(nd >= 0 && nd <= n)
      if (n == 0) assert(x.isNullAt(3))
      else {
        val f = x.getDouble(3)
        assert(f >= 0.0 && f <= 1.0)
        assert(f == BigDecimal(nd.toDouble / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
  }

  private def randomDocs(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta")
    (1L to n).map(id => id ->
      Seq.fill(1 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
  }

  test("property: chunkDocuments reassembles losslessly") {
    import spark.implicits._
    val docs = randomDocs(41L, 60)
    for (maxTokens <- Seq(1, 7, 32, 1000)) {
      val chunks = graft.operators.CorpusOps
        .chunkDocuments(docs.toDF("doc_id", "text"), "doc_id", "text",
          maxTokens)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
        .groupBy(_._1)
      docs.foreach { case (id, text) =>
        val toks = text.trim.split("\\s+").toSeq
        val cs = chunks(id).sortBy(_._2)
        // ordered concatenation is the original token stream
        assert(cs.flatMap(_._3.split(" ")).toSeq == toks)
        // all chunks full except possibly the last; counts consistent
        assert(cs.init.forall(_._4 == maxTokens.toLong))
        assert(cs.map(_._4).sum == toks.length.toLong)
        assert(cs.map(_._2).toSeq == cs.indices.map(identity))
      }
    }
  }

  test("property: unitDedup with an unreachable threshold is identity") {
    import spark.implicits._
    val docs = randomDocs(43L, 40)
      .map { case (id, t) => (id, t.split(" ").toSeq) }
    val r = graft.operators.CorpusOps
      .unitDedup(docs.toDF("doc_id", "units"), "doc_id", col("units"),
        maxOcc = Long.MaxValue)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getString(2))))
      .toMap
    docs.foreach { case (id, units) =>
      assert(r(id) == ((0L, units.mkString(" "))))
    }
  }

  test("property: snapshotDiff of a corpus with itself is all-unchanged") {
    import spark.implicits._
    val d = randomDocs(47L, 50).toDF("doc_id", "text")
    val r = graft.operators.CorpusOps.snapshotDiff(d, d, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    assert(r.length == 50)
    assert(r.forall { case (o, n, s) => o == n && s == "unchanged" })
  }

  test("property: removeDuplicatedSpans at minDocFreq=1 empties gram docs") {
    import spark.implicits._
    val n = 4
    val d = randomDocs(53L, 30).toDF("doc_id", "text")
    val r = graft.operators.CorpusOps
      .removeDuplicatedSpans(d, "doc_id", "text", n, minDocFreq = 1)
      .collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getString(3)))
    // every gram flags itself: docs with >= n tokens lose everything,
    // shorter docs are untouched
    r.foreach { case (nTok, nRem, clean) =>
      if (nTok >= n) assert(nRem == nTok && clean.isEmpty)
      else assert(nRem == 0L && clean.nonEmpty)
    }
  }

  test("property: heavyHittersExact == brute force over random streams " +
      "and sketch shapes") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 6) {
      // random vocab size, Zipf-ish frequencies, random sketch geometry
      val vocab = 20 + rnd.nextInt(120)
      val rows = (0 until 2500).map(_ =>
        "t" + (math.pow(rnd.nextDouble(), 2.5) * vocab).toInt)
      val phi = Seq(2000L, 8000L, 25000L)(trial % 3)
      val width = Seq(4, 32, 256)(trial % 3) // includes collision-heavy
      val got = graft.operators.Sketches.heavyHittersExact(
        rows.toDF("item"), "item", phi, width, depth = 1 + trial % 3)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val th = math.max(1L, (rows.size * phi + 999999L) / 1000000L)
      val exact = rows.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= th).toMap
      assert(got == exact, s"trial=$trial th=$th")
    }
  }

  test("property: kmvOverlapPairs is exact below k for random set pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    for (_ <- 0 until 5) {
      val a = Seq.fill(5 + rnd.nextInt(50))(rnd.nextInt(200).toLong).distinct
      val b = Seq.fill(5 + rnd.nextInt(50))(rnd.nextInt(200).toLong).distinct
      val sk = graft.operators.Sketches.kmvSketch(
        (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "h"),
        Seq("g"), "h", k = 256) // both sets below k -> exact regime
      val r = graft.operators.Sketches.kmvOverlapPairs(sk, "g", 256)
        .collect().head
      val union = (a ++ b).distinct.size
      val inter = a.toSet.intersect(b.toSet).size
      assert(r.getAs[Long]("est_union") == union)
      assert(r.getAs[Long]("est_intersection") == inter)
      assert(r.getAs[Long]("jaccard_ppm") == 1000000L * inter / union)
    }
  }

  test("property: frequencySpectrum band totals == exact gram counts") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val docs = Seq.fill(40)(
      Seq.fill(1 + rnd.nextInt(30))("w" + rnd.nextInt(12)).mkString(" "))
    val out = graft.operators.CorpusOps
      .frequencySpectrum(docs.toDF("text"), "text", orders = Seq(1, 2))
      .collect()
    def grams(n: Int) = docs.flatMap(_.split(" ").sliding(n)
      .filter(_.size == n).map(_.mkString(" ")).toSeq)
    for (n <- Seq(1, 2)) {
      val cnts = grams(n).groupBy(identity).view.mapValues(_.size.toLong)
      val rowsN = out.filter(_.getInt(0) == n)
      assert(rowsN.map(_.getLong(3)).sum == cnts.values.sum) // token mass
      assert(rowsN.map(_.getLong(2)).sum == cnts.size)       // type count
      // band bounds: every band's min/max sit inside [2^(b-1), 2^b - 1]
      rowsN.foreach { r =>
        val b = r.getInt(1)
        assert(r.getLong(4) >= (1L << (b - 1)) && r.getLong(5) < (1L << b))
      }
    }
  }
}
