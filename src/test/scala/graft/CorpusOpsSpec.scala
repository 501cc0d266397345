package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusOps

/** [[CorpusOps]] — repetition gates, PII scrub, decontamination, shard
  * shuffle, domain rebalance. Hand-computed fixtures; the sf-scaled DuckDB
  * twins live in the CORRECTNESS gate (q66-q70). */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats: hand-computed ppm fractions and gate") {
    val d = Seq(
      (1L, "a b c d"),            // 4 tokens, all distinct, top=1
      (2L, "x x x x x y"),        // 6 tokens, 2 distinct, top=5
      (3L, "w")                   // 1 token — no bigrams -> NULL frac
    ).toDF("doc_id", "text")
    val r = CorpusOps.repetitionStats(d, "doc_id", "text",
        minDistinctFrac = 0.45, maxTopWordFrac = 0.5, maxTopBigramFrac = 0.5)
      .orderBy("doc_id").collect()

    assert(r(0).getAs[Long]("n_tokens") == 4L)
    assert(r(0).getAs[Long]("distinct_ppm") == 1000000L)
    assert(r(0).getAs[Long]("top_word_ppm") == 250000L)
    // bigrams of doc 1: "a b","b c","c d" all unique -> floor(1e6/3)
    assert(r(0).getAs[Long]("top_bigram_ppm") == 333333L)
    assert(r(0).getAs[Boolean]("keep"))

    // doc 2: distinct 2/6 -> 333333 < 450000 -> rejected; top_word 5/6
    assert(r(1).getAs[Long]("distinct_ppm") == 333333L)
    assert(r(1).getAs[Long]("top_word_ppm") == 833333L)
    // bigrams: "x x"*4, "x y" -> top 4/5
    assert(r(1).getAs[Long]("top_bigram_ppm") == 800000L)
    assert(!r(1).getAs[Boolean]("keep"))

    // doc 3: no bigrams -> NULL top_bigram_ppm -> gate fails closed
    assert(r(2).isNullAt(r(2).fieldIndex("top_bigram_ppm")))
    assert(!r(2).getAs[Boolean]("keep"))
  }

  test("repetitionStats: portability fixtures — empty/whitespace docs and " +
      "exact-threshold fractions gate identically in fused and unfused") {
    // the round-2 driver-gate lesson: adversarial inputs must produce the
    // same BIGINT ppm values in the agg twin, the fused expression, and
    // (via q66's oracle) DuckDB — no FP rounding anywhere
    val d = Seq(
      (1L, ""),              // empty -> split yields [""] -> 1 token
      (2L, "   "),           // whitespace-only -> same single "" token
      (3L, "x x y z"),       // top_word 2/4 == threshold 0.5 exactly
      (4L, "a a b"),         // top_word 2/3 -> floor -> 666666
      (5L, "p q p q p q p q")// bigram "q p" 3/7 vs "p q" 4/7 -> 571428
    ).toDF("doc_id", "text")
    val unfused = CorpusOps.repetitionStats(d, "doc_id", "text",
      minDistinctFrac = 0.45, maxTopWordFrac = 0.5, maxTopBigramFrac = 0.6)
    val fused = CorpusOps.repetitionStatsFused(d, "doc_id", "text",
      minDistinctFrac = 0.45, maxTopWordFrac = 0.5, maxTopBigramFrac = 0.6)
    val u = unfused.orderBy("doc_id").collect()
    val f = fused.orderBy("doc_id").collect()
    assert(u.map(_.toSeq).toSeq == f.map(_.toSeq).toSeq)
    // empty & whitespace: one "" token, all distinct, no bigrams
    assert(u(0).getAs[Long]("n_tokens") == 1L)
    assert(u(0).getAs[Long]("distinct_ppm") == 1000000L)
    assert(u(0).isNullAt(u(0).fieldIndex("top_bigram_ppm")))
    assert(u(1).toSeq.drop(1) == u(0).toSeq.drop(1))
    // exact-threshold equality keeps (<= is inclusive), floor is exact
    assert(u(2).getAs[Long]("top_word_ppm") == 500000L)
    assert(u(2).getAs[Boolean]("keep"))
    assert(u(3).getAs[Long]("top_word_ppm") == 666666L)
    assert(u(4).getAs[Long]("top_bigram_ppm") == 571428L)
  }

  test("piiScrub: counts + scrub are exact on crafted text") {
    val d = Seq(
      (1L, "mail a@b.com and c.d+x@e.org ip 10.0.0.1 id 123456789 done"),
      (2L, "clean text only")
    ).toDF("doc_id", "text")
    val r = CorpusOps.piiScrub(d, "doc_id", "text").orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("n_emails") == 2)
    assert(r(0).getAs[Int]("n_ips") == 1)
    assert(r(0).getAs[Int]("n_longnums") == 1)
    // scrub hash == md5 of the fully-redacted string
    val expected = d.sparkSession.sql(
      "SELECT md5(CAST('mail <EMAIL> and <EMAIL> ip <IP> id <NUM> done' AS BINARY))")
      .first().getString(0)
    assert(r(0).getAs[String]("scrub_hash") == expected)
    assert(r(1).getAs[Int]("n_emails") == 0)
    assert(r(1).getAs[Int]("n_ips") == 0)
    assert(r(1).getAs[Int]("n_longnums") == 0)
  }

  test("piiScrub: short digit runs and bare words are not PII") {
    val d = Seq((1L, "v 1.2.3.4567 at 12345678 x99")).toDF("doc_id", "text")
    val r = CorpusOps.piiScrub(d, "doc_id", "text").collect()(0)
    assert(r.getAs[Int]("n_ips") == 0)      // 4-digit octet breaks IPv4
    assert(r.getAs[Int]("n_longnums") == 0) // 8 digits < 9
  }

  test("decontaminate: overlap counts are distinct shared n-grams") {
    val train = Seq(
      (10L, "a b c d e"),   // shares "a b c","b c d" with bench -> 2... plus "c d e"
      (11L, "z z z z")      // no overlap
    ).toDF("doc_id", "text")
    val bench = Seq((1L, "a b c d q"), (2L, "c d e f")).toDF("doc_id", "text")
    val r = CorpusOps.decontaminate(train, bench, "doc_id", "text", n = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // doc 10 grams: "a b c","b c d","c d e"; bench has "a b c","b c d","c d q","c d e","d e f"
    assert(r == Map(10L -> 3L))
  }

  test("decontaminateBloom: flags superset of exact overlap, no misses") {
    val train = Seq(
      (10L, "a b c d e"),   // shares 3-grams with bench
      (11L, "z y x w v u")) // no true overlap
      .toDF("doc_id", "text")
    val bench = Seq((1L, "a b c d q")).toDF("doc_id", "text")
    val bloomed = CorpusOps.decontaminateBloom(train, bench,
        "doc_id", "text", n = 3, mBits = 4096, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    val exact = CorpusOps.decontaminate(train, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 10: grams {abc,bcd,cde}, bench has {abc,bcd,cdq} -> 2 exact
    assert(exact == Map(10L -> 2L))
    assert(bloomed(10L)._1 == 3L)
    // no false negatives: flagged >= exact per doc
    assert(bloomed(10L)._2 >= 2L && bloomed(10L)._3 == 1)
    // doc 11 has 4 grams; with 3 bench grams in 4096 bits FPs are ~0
    assert(bloomed(11L)._2 == 0L && bloomed(11L)._3 == 0)
  }

  test("decontaminateStaged == decontaminate exactly (no false negatives)") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val train = (1L to 60L).map(i => (i, doc(8))).toDF("doc_id", "text")
    val bench = (100L to 105L).map(i => (i, doc(8))).toDF("doc_id", "text")
    // tiny filter (high FP rate) so staging is stress-tested, not trivial
    val staged = CorpusOps.decontaminateStaged(train, bench,
        "doc_id", "text", n = 3, mBits = 64, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = CorpusOps.decontaminate(train, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(staged == exact && exact.nonEmpty)
  }

  test("dsirWeights: target-like docs outscore raw-typical docs") {
    // target domain speaks {alpha beta}; raw bulk speaks {x y z}
    val raw = Seq(
      (1L, "x y z x y z"),          // pure raw-typical
      (2L, "alpha beta alpha beta"),// looks like the target
      (3L, "x alpha y beta")        // mixed
    ).toDF("doc_id", "text")
    val target = Seq((100L, "alpha beta alpha beta alpha beta"))
      .toDF("doc_id", "text")
    val r = CorpusOps.dsirWeights(raw, target, "doc_id", "text", dim = 64)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(2L)._1 > r(3L)._1 && r(3L)._1 > r(1L)._1)
    assert(r(1L)._2 == 6L && r(2L)._2 == 4L)
    // per-token weights are scale-free: scoring is deterministic
    val again = CorpusOps.dsirWeights(raw, target, "doc_id", "text", dim = 64)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(again == r.map { case (k, v) => k -> v._1 })
  }

  test("shardShuffle: deterministic, dense per-shard positions") {
    val d = (0L until 100L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val r = CorpusOps.shardShuffle(d, "doc_id", nShards = 4)
    val rows = r.collect()
    assert(rows.length == 100)
    assert(rows.map(_.getLong(0)).toSet.size == 100)
    // positions within each shard are 1..count(shard)
    val byShard = rows.groupBy(_.getLong(1))
    byShard.foreach { case (_, g) =>
      assert(g.map(_.getInt(2)).sorted.toSeq == (1 to g.length))
    }
    // two runs produce the identical assignment
    val again = CorpusOps.shardShuffle(d, "doc_id", nShards = 4).collect()
    assert(rows.map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet ==
      again.map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet)
  }

  test("hashingTf: dense count vectors — mass preserved, deterministic") {
    val d = Seq((1L, "a b c a"), (2L, "a b c a"), (3L, "z")).toDF("doc_id", "text")
    val r = CorpusOps.hashingTf(d, "doc_id", "text", dim = 16)
      .collect().map(x => x.getLong(0) -> x.getSeq[Long](1)).toMap
    assert(r.values.forall(_.length == 16))
    assert(r(1L).sum == 4L)               // one bucket count per token
    assert(r(1L) == r(2L))                // identical docs -> identical vectors
    assert(r(3L).sum == 1L)
    assert(r(1L).max == 2L)               // "a" twice -> one bucket holds 2
  }

  test("domainTemperatureWeights: sqrt upweights small domains, sums to ~1") {
    val d = ((0 until 100).map(i => (i.toLong, "big")) ++ Seq((900L, "small")))
      .toDF("doc_id", "source")
    val r = CorpusOps.domainTemperatureWeights(d, "source")
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r("big")._1 == 100L && r("small")._1 == 1L)
    // sqrt: 10 vs 1 -> weights 10/11, 1/11; proportional would be 100/101
    assert(math.abs(r("big")._2 - 10.0 / 11) < 1e-5)
    assert(math.abs(r("small")._2 - 1.0 / 11) < 1e-5)
    assert(math.abs(r.values.map(_._2).sum - 1.0) < 1e-5)
  }

  test("packSequences: contiguous offsets, boundary math, determinism") {
    val d = (0L until 50L).map(i => (i, ("w " * (i.toInt % 7 + 1)).trim))
      .toDF("doc_id", "text") // 1..7 tokens per doc
    val r = CorpusOps.packSequences(d, "doc_id", "text",
      nShards = 1, seqLen = 10).collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3), x.getLong(4)))
    assert(r.length == 50)
    // reconstruct the stream: sorted by (seq_id, seq_offset) the absolute
    // starts (seq_id*10+offset) must be the exclusive prefix sums of
    // n_tokens — no gaps, no overlaps
    val ordered = r.sortBy(x => (x._3, x._4))
    val starts = ordered.map(x => x._3 * 10 + x._4)
    val expectedStarts = ordered.map(_._2).scanLeft(0L)(_ + _).init
    assert(starts.toSeq == expectedStarts.toSeq)
    assert(r.forall(x => x._4 >= 0 && x._4 < 10))
    // deterministic across runs
    val again = CorpusOps.packSequences(d, "doc_id", "text", 1, 10)
      .collect().map(x => (x.getLong(0), x.getLong(3), x.getLong(4))).toSet
    assert(again == r.map(x => (x._1, x._3, x._4)).toSet)
  }

  test("duplicatedNgramStats: shared bigram counted, gramless doc NULL") {
    val d = Seq(
      (1L, "a b c"),   // bigrams {a b, b c}
      (2L, "a b x"),   // bigrams {a b, b x}
      (3L, "z")        // no bigrams
    ).toDF("doc_id", "text")
    val r = CorpusOps.duplicatedNgramStats(d, "doc_id", "text",
        n = 2, minDocFreq = 2)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_grams") == 2L)
    assert(r(0).getAs[Long]("n_dup_grams") == 1L)   // "a b" in docs 1+2
    assert(r(0).getAs[Double]("dup_frac") == 0.5)
    assert(r(1).getAs[Long]("n_dup_grams") == 1L)
    assert(r(2).getAs[Long]("n_grams") == 0L)
    assert(r(2).isNullAt(r(2).fieldIndex("dup_frac")))
  }

  test("scoreHashedLinear: score == independent md5 bucket-weight sum") {
    // independent twin of portableHash60 + bucketWeight for the expectation
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map(b => f"$b%02x").mkString.take(15), 16)
    }
    def expected(text: String): Long =
      text.split("\\s+").map { t =>
        val b = (h60(t) % 16).toInt
        h60(s"w$b") % 21L - 10L
      }.sum
    val d = Seq((1L, "alpha alpha beta"), (2L, "gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val r = CorpusOps.scoreHashedLinear(d, "doc_id", "text", dim = 16)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("score") == expected("alpha alpha beta"))
    assert(r(1).getAs[Long]("score") == expected("gamma delta epsilon zeta"))
    assert(r(0).getAs[Int]("keep") ==
      (if (expected("alpha alpha beta") >= 0) 1 else 0))
  }

  test("applyMixture: per-domain dynamic caps, under-target domains whole") {
    val d = ((0L until 5L).map(i => (i, "big")) ++
      (100L until 103L).map(i => (i, "small"))).toDF("doc_id", "source")
    val targets = Seq(("big", 2), ("small", 10)).toDF("source", "n_target")
    val r = CorpusOps.applyMixture(d, "doc_id", "source", targets)
      .groupBy("source").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("big" -> 2L, "small" -> 3L))
    // deterministic selection
    val ids1 = CorpusOps.applyMixture(d, "doc_id", "source", targets)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = CorpusOps.applyMixture(d, "doc_id", "source", targets)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2 && ids1.size == 5)
  }

  test("surprisalScore: rare vocabulary scores higher (collision-free width)") {
    val d = Seq((1L, "x x x x"), (2L, "y z")).toDF("doc_id", "text")
    val r = CorpusOps.surprisalScore(d, "doc_id", "text",
        width = 64, depth = 4)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // freq: x=4 -> rarity 250000; y=z=1 -> rarity 1000000 each
    assert(r.toSeq == Seq((1L, 1000000L, 4L), (2L, 2000000L, 2L)))
  }

  test("domainRebalance: caps each domain, keeps small domains whole") {
    val d = ((0L until 40L).map(i => (i, "big")) ++
      (100L until 103L).map(i => (i, "small"))).toDF("doc_id", "source")
    val r = CorpusOps.domainRebalance(d, "doc_id", "source", 10)
      .groupBy("source").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("big" -> 10L, "small" -> 3L))
    // selection is deterministic
    val ids1 = CorpusOps.domainRebalance(d, "doc_id", "source", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = CorpusOps.domainRebalance(d, "doc_id", "source", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("unitDedup: global boilerplate removal preserves document order") {
    val d = Seq(
      (1L, Seq("alpha beta", "BOILER", "gamma delta")),
      (2L, Seq("BOILER", "epsilon")),
      (3L, Seq("zeta", "BOILER")),
      (4L, Seq("dup", "dup", "eta")), // within-doc repeat counts globally
      (5L, Seq("solo"))
    ).toDF("doc_id", "units")
    val r = CorpusOps.unitDedup(d, "doc_id", col("units"), maxOcc = 1L)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getString(2)))
      .toMap
    // BOILER occurs 3x and dup 2x corpus-wide -> every occurrence removed
    assert(r(1L) == ((1L, "alpha beta gamma delta")))
    assert(r(2L) == ((1L, "epsilon")))
    assert(r(3L) == ((1L, "zeta")))
    assert(r(4L) == ((2L, "eta")))
    assert(r(5L) == ((0L, "solo")))
    // a fully-boilerplate document survives as an empty string, and a
    // higher threshold lets the pair-frequency unit back through
    val all = Seq((1L, Seq("x", "x"), ""), (2L, Seq("x"), "")).toDF(
      "doc_id", "units", "pad")
    val r2 = CorpusOps.unitDedup(all, "doc_id", col("units"), maxOcc = 3L)
      .collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(r2 == Map(1L -> "x x", 2L -> "x"))
    val r3 = CorpusOps.unitDedup(all, "doc_id", col("units"), maxOcc = 2L)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getString(2)))
      .toMap
    assert(r3 == Map(1L -> ((2L, "")), 2L -> ((1L, ""))))
  }

  test("removeDuplicatedSpans: covered tokens cut in every copy") {
    val d = Seq(
      (1L, "a b c d e x"),
      (2L, "z a b c d e"),
      (3L, "q w e r t y"),
      (4L, "a b c d e a b c d e") // two flagged occurrences -> union cover
    ).toDF("doc_id", "text")
    val r = CorpusOps.removeDuplicatedSpans(d, "doc_id", "text",
        n = 5, minDocFreq = 2)
      .collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3))))
      .toMap
    // "a b c d e" appears in docs 1, 2, 4 -> all its tokens go everywhere
    assert(r(1L) == ((6L, 5L, "x")))
    assert(r(2L) == ((6L, 5L, "z")))
    assert(r(3L) == ((6L, 0L, "q w e r t y"))) // unique text untouched
    assert(r(4L) == ((10L, 10L, "")))
    // raising minDocFreq above the df leaves everything intact
    val loose = CorpusOps.removeDuplicatedSpans(d, "doc_id", "text",
        n = 5, minDocFreq = 4)
      .agg(sum(col("n_removed"))).collect()(0).getLong(0)
    assert(loose == 0L)
  }

  test("mixtureFit: flattening temperatures fail the small-domain cap") {
    // a: 10000 tokens, b: 100 tokens, budget 5000, cap 2 epochs.
    // Equal split (tau=0) hands b 2500 tokens -> 25x oversampling; the
    // proportional end stays under cap. Expected feasibility from the
    // operator's own integer formulas, replicated here:
    val toks = Map("a" -> 10000L, "b" -> 100L)
    def w(tau: Int, t: Long): Long = {
      val d = t.toDouble
      val x = tau match {
        case 0 => 1.0
        case 1 => math.sqrt(math.sqrt(d))
        case 2 => math.sqrt(d)
        case 3 => math.sqrt(d) * math.sqrt(math.sqrt(d))
        case 4 => d
      }
      math.floor(x * 1000000.0).toLong
    }
    val expect = (0 to 4).map { tau =>
      val tw = toks.values.map(w(tau, _)).sum
      val over = toks.map { case (_, t) =>
        1000000L * (5000L * w(tau, t) / tw) / t
      }.max
      tau -> ((over, over <= 2000000L))
    }.toMap
    val docs = toks.toSeq.map { case (s, n) =>
      (s, Seq.fill(n.toInt)("w").mkString(" "))
    }.toDF("source", "text")
    val r = CorpusOps.mixtureFit(docs, "source", "text",
        budgetTokens = 5000L, maxOversamplePpm = 2000000L)
      .collect()
      .map(x => x.getInt(0) ->
        ((x.getLong(1), x.getBoolean(2), x.getBoolean(3))))
      .toMap
    (0 to 4).foreach { tau =>
      assert(r(tau)._1 == expect(tau)._1, s"tau=$tau")
      assert(r(tau)._2 == expect(tau)._2, s"tau=$tau feasible")
    }
    // chosen = the largest feasible tau only
    val bestTau = (0 to 4).filter(expect(_)._2).max
    assert(r(bestTau)._3)
    assert(r.count(_._2._3) == 1)
    assert(expect(0)._2 == false && expect(4)._2 == true)
  }

  test("snapshotDiff: id-match first, content rematch for renumbers") {
    val prev = Seq(
      (1L, "kept"), (2L, "edited v1"), (10L, "renumbered"),
      (11L, "twin"), (12L, "twin"), (20L, "dropped")
    ).toDF("doc_id", "text")
    val curr = Seq(
      (1L, "kept"), (2L, "edited v2"), (30L, "renumbered"),
      (31L, "twin"), (40L, "brand new")
    ).toDF("doc_id", "text")
    val r = CorpusOps.snapshotDiff(prev, curr, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
      .toSet
    assert(r == Set(
      (1L, 1L, "unchanged"),
      (2L, 2L, "changed"),
      (10L, 30L, "moved"),       // identical content, new id
      (11L, 31L, "moved"),       // first twin pairs by per-content rank
      (12L, -1L, "removed"),     // 2nd twin has no partner left
      (20L, -1L, "removed"),
      (-1L, 40L, "added")))
  }

  test("thresholdSweep: confusion counts and ppm ratios are exact") {
    // scores 1..6, relevant = odd score (1, 3, 5)
    val d = Seq((1L, true), (2L, false), (3L, true), (4L, false),
      (5L, true), (6L, false)).toDF("score", "rel")
    val r = CorpusOps.thresholdSweep(d, "score", "rel", Seq(0L, 4L, 7L))
      .collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          Option(x.get(5)).map(_.asInstanceOf[Long]),
          Option(x.get(6)).map(_.asInstanceOf[Long]))))
      .toMap
    // t=0: everything predicted positive
    assert(r(0L) == ((3L, 3L, 0L, 0L, Some(500000L), Some(1000000L))))
    // t=4: scores 4,5,6 positive -> tp={5}, fp={4,6}
    assert(r(4L) == ((1L, 2L, 2L, 1L, Some(333333L), Some(333333L))))
    // t=7: nothing positive -> precision undefined (NULL), recall 0
    assert(r(7L) == ((0L, 0L, 3L, 3L, None, Some(0L))))
  }

  test("bigramTopK: exact counts, integer-ppm probabilities, top-k per context") {
    import spark.implicits._
    val d = Seq(
      "a b a b c",   // bigrams: (a,b) x2, (b,a), (b,c)
      "a b a c",     // (a,b), (b,a), (a,c)
      "x",           // single token: no bigrams
      ""             // empty: no bigrams
    ).toDF("text")
    val out = graft.operators.CorpusOps.bigramTopK(d, "text", k = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    // context a: n_ctx = 4 -> (a,b) n=3 ppm=750000 rank 1; (a,c) 1/4 rank 2
    assert(out(("a", "b")) == ((3L, 750000L, 1)))
    assert(out(("a", "c")) == ((1L, 250000L, 2)))
    // context b: n_ctx = 3 -> (b,a) n=2 rank 1; (b,c) 1/3 = 333333 (floor)
    assert(out(("b", "a")) == ((2L, 666666L, 1)))
    assert(out(("b", "c")) == ((1L, 333333L, 2)))
    assert(!out.keys.exists(_._1 == "x"))
    assert(out.size == 4)
  }

  test("collocationTopK: lift rewards exclusive pairs, support gate holds") {
    import spark.implicits._
    // "new york" always together (3x); "the cat"/"the dog" share "the"
    val d = Seq(
      "new york new york new york",
      "the cat sat", "the dog ran", "the cat ran"
    ).toDF("text")
    val out = graft.operators.CorpusOps.collocationTopK(d, "text",
        minCount = 2, k = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // bigrams: (new,york) 3, (york,new) 2, (the,cat) 2, (the,dog) 1,
    // (cat,sat) 1, (dog,ran) 1, (cat,ran) 1 -> Nbg = 11
    // support >= 2 keeps 3 pairs
    assert(out.size == 3)
    val (n, lift) = out(("new", "york"))
    assert(n == 3L)
    // n1(new)=3, n2(york)=3 -> 3*11/3/3
    assert(lift == math.rint(3.0 * 11 / 3 / 3 * 1e6) / 1e6 ||
      math.abs(lift - 3.0 * 11 / 3 / 3) < 1e-6)
    // (the,cat): n12=2, n1(the)=3, n2(cat)=2 -> 2*11/3/2 = 3.666667
    assert(out(("the", "cat"))._1 == 2L)
    assert(math.abs(out(("the", "cat"))._2 - 2.0 * 11 / 3 / 2) < 1e-6)
  }

  test("groupPercentileRank: ppm ranks within group, singleton group is 0") {
    import spark.implicits._
    val d = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 20L), (4L, "a", 30L),
      (5L, "b", 7L)
    ).toDF("doc_id", "source", "n_chars")
    val out = graft.operators.CorpusOps.groupPercentileRank(
        d, "doc_id", "source", "n_chars")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // group a: n=4 -> below/3: 10->0; 20,20->1/3=333333; 30->3/3=1000000
    assert(out(1L) == 0L)
    assert(out(2L) == 333333L && out(3L) == 333333L)
    assert(out(4L) == 1000000L)
    // singleton group
    assert(out(5L) == 0L)
  }

  test("cooccurrenceTopK: doc-level pairs, vocab prune excludes rare tokens") {
    import spark.implicits._
    val d = Seq(
      "a b c", "a b", "a b d", "a c", "rare1 rare2"
    ).toDF("text").withColumn("doc_id",
      org.apache.spark.sql.functions.monotonically_increasing_id())
    // vocab size 4 keeps a(4) b(3) c(2) d(1); rare1/rare2 (1 each) lose
    // the (count desc, token asc) tie against d... a,b,c,d win
    val out = graft.operators.CorpusOps.cooccurrenceTopK(d, "doc_id",
        "text", vocabSize = 4, minSupport = 2L, k = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("a", "b")) == 3L)
    assert(out(("a", "c")) == 2L)
    assert(!out.contains(("a", "d")))        // support 1 < 2
    assert(!out.keys.exists(_._1.startsWith("rare"))) // pruned from vocab
  }

  test("lexicalConcentration: uniform vs degenerate sources, empty text ignored") {
    import spark.implicits._
    val d = Seq(
      ("u", "a b c d"),       // uniform: 4 types, simpson = 4/16 = 0.25
      ("g", "x x x x"),       // degenerate: 1 type, simpson = 1
      ("g", ""),              // empty doc contributes nothing
      ("m", "a a b")          // 3 tokens: (4+1)/9 = 0.555556
    ).toDF("source", "text")
    val r = graft.operators.CorpusOps.lexicalConcentration(d, "source", "text")
      .collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r("u") == ((4L, 4L, 0.25)))
    assert(r("g") == ((4L, 1L, 1.0)))
    assert(r("m") == ((3L, 2L, 0.555556)))
  }

  test("upsampleMixture: exact target via full epochs + md5 remainder") {
    import spark.implicits._
    val docs = (1L to 5L).map(i => (i, "small", "t" + i)) ++
      (1L to 9L).map(i => (100 + i, "big", "t" + i))
    val df = docs.toDF("doc_id", "source", "text")
    val targets = Seq(("small", 12L), ("big", 4L)).toDF("source", "n_target")
    val out = graft.operators.CorpusOps
      .upsampleMixture(df, "doc_id", "source", targets)
      .select("doc_id", "source", "epoch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // small (5 docs, target 12): 12 rows — every doc twice, 2 docs thrice
    val small = out.filter(_._2 == "small")
    assert(small.length == 12)
    val perDoc = small.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perDoc.values.toSeq.sorted == Seq(2, 2, 2, 3, 3))
    // epochs are 0-based contiguous per doc
    small.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // big (9 docs, target 4 < size): NOT downsampled — epoch 0 once each
    val big = out.filter(_._2 == "big")
    assert(big.length == 9 && big.forall(_._3 == 0L))
  }

  test("tokenDistributionDrift: exact TV distance, absent-mass closed form") {
    import spark.implicits._
    // corpus: A = "x x y" (N_A=3), B = "y z" (N_B=2); mixture N=5 with
    // C = {x:2, y:2, z:1}. Exact TV(A) = 1/2(|2/3-2/5|+|1/3-2/5|+|0-1/5|)
    // = 4/15 -> 266666 ppm (floor); TV(B) = 1/2(2/5+1/10+3/10) = 0.4
    // -> 400000 ppm. B's x-term only enters via the absent-mass closed
    // form — the formula never sees a (B, x) row.
    val d = Seq(("A", "x x y"), ("B", "y z")).toDF("source", "text")
    val r = graft.operators.CorpusOps
      .tokenDistributionDrift(d, "source", "text")
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2))))
      .toMap
    assert(r == Map("A" -> ((3L, 266666L)), "B" -> ((2L, 400000L))))
    // identical distributions drift zero
    val same = Seq(("A", "x y"), ("B", "x y")).toDF("source", "text")
    assert(graft.operators.CorpusOps
      .tokenDistributionDrift(same, "source", "text")
      .collect().forall(_.getLong(2) == 0L))
  }

  test("frequencySpectrum: power-of-two bands, hex-digit boundary exact") {
    import spark.implicits._
    // unigram counts: a=16 (band 5 — the 0xF->0x10 hex boundary), b=15
    // (band 4), c=3 (band 2), d=1 (band 1 — hapax)
    val text = (Seq.fill(16)("a") ++ Seq.fill(15)("b") ++
      Seq.fill(3)("c") ++ Seq("d")).mkString(" ")
    val r = graft.operators.CorpusOps
      .frequencySpectrum(Seq(text).toDF("text"), "text", orders = Seq(1))
      .collect()
      .map(x => x.getInt(1) -> ((x.getLong(2), x.getLong(3), x.getLong(4),
        x.getLong(5)))).toMap
    assert(r == Map(
      5 -> ((1L, 16L, 16L, 16L)),
      4 -> ((1L, 15L, 15L, 15L)),
      2 -> ((1L, 3L, 3L, 3L)),
      1 -> ((1L, 1L, 1L, 1L))))
    // multi-order: one pass tags every order; n_grams per order must equal
    // the exact gram totals (35 unigrams, 34 bigrams)
    val multi = graft.operators.CorpusOps
      .frequencySpectrum(Seq(text).toDF("text"), "text", orders = Seq(1, 2))
      .collect().groupBy(_.getInt(0))
      .view.mapValues(_.map(_.getLong(3)).sum).toMap
    assert(multi == Map(1 -> 35L, 2 -> 34L))
  }

  test("null/empty text is zero content, never phantom rows or -1 tokens " +
      "(chunkDocuments, packSequences)") {
    // size(tokens(null)) = -1 and tokens('') = [''] — ungarded, the
    // former drove sequence() DESCENDING (phantom null chunks with
    // n_tokens = -1) and both corrupted packSequences' running offsets
    val d = Seq((1L, "a b c"), (2L, null.asInstanceOf[String]),
      (3L, "   "), (4L, "d e")).toDF("doc_id", "text")
    val chunks = CorpusOps.chunkDocuments(d, "doc_id", "text", maxTokens = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3)))
    // docs 2 and 3 produce NO rows; 1 and 4 chunk normally
    assert(chunks.map(_._1).toSet == Set(1L, 4L))
    assert(chunks.toSet == Set((1L, 0, "a b", 2L), (1L, 1, "c", 1L),
      (4L, 0, "d e", 2L)))
    val packed = CorpusOps.packSequences(d, "doc_id", "text",
        nShards = 1, seqLen = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(packed(2L) == 0L && packed(3L) == 0L)
    assert(packed(1L) == 3L && packed(4L) == 2L)
  }

  test("snapshotDiff: a doc with null text in both snapshots is unchanged," +
      " not removed+added") {
    val prev = Seq((1L, "same"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val curr = Seq((1L, "same"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val r = CorpusOps.snapshotDiff(prev, curr, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    assert(r.toSet == Set((1L, 1L, "unchanged"), (2L, 2L, "unchanged")))
    // null -> set transition is 'changed' (same id, different fingerprint)
    val curr2 = Seq((1L, "same"), (2L, "now set")).toDF("doc_id", "text")
    val r2 = CorpusOps.snapshotDiff(prev, curr2, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getString(2))).toMap
    assert(r2(2L) == "changed")
  }

  test("gopherRules: each rule trips on its own pathology and the " +
      "healthy document passes all") {
    import spark.implicits._
    val healthy = (1 to 60).map(i => s"word$i").mkString(" ") +
      " the and of that"
    val docs = Seq(
      (1L, healthy),                                   // passes everything
      (2L, "the and of that " + (1 to 10).map(i => s"w$i").mkString(" ")),
      (3L, (1 to 60).map(_ => "supercalifragilistic").mkString(" ") +
        " the and"),                                   // mean word len > 10
      (4L, (1 to 60).map(_ => "# ...").mkString(" ") + " the and"),
      (5L, (1 to 60).map(_ => "1234").mkString(" ") + " the and of"),
      (6L, (1 to 64).map(i => s"word$i").mkString(" ")) // no stopwords
    ).toDF("doc_id", "text")
    val got = CorpusOps.gopherRules(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
        "ok_alpha_words", "ok_stopwords", "passes_all")
      .collect().map(r => (0 to 5).map(r.getBoolean))
    assert(got(0) == Seq(true, true, true, true, true, true))
    assert(got(1)(0) == false && got(1)(5) == false) // too few words
    assert(got(2)(1) == false)                        // words too long
    assert(got(3)(2) == false)                        // symbol-heavy
    assert(got(4)(3) == false)                        // digit words
    assert(got(5)(4) == false)                        // stopword-free
  }

  test("sentenceUnits: boundary zoo — digit/lowercase continuations " +
      "never split, ?!-runs stay attached, the documented abbreviation " +
      "split, empty text yields no rows, n_words normalizes multi-space") {
    val d = Seq(
      (1L, "Hello world. This is graft. It works!"),
      (2L, "Pi is 3.14 not 3. 15 ok"),
      (4L, "Dr. Smith went home. He slept?! Deeply so."),
      (6L, ""),
      (7L, "Multi   spaces. Next one.")
    ).toDF("doc_id", "text")
    val got = CorpusOps.sentenceUnits(d, "doc_id", "text")
      .orderBy("doc_id", "sent_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 0, "Hello world.", 2L), (1L, 1, "This is graft.", 3L),
      (1L, 2, "It works!", 2L),
      (2L, 0, "Pi is 3.14 not 3. 15 ok", 7L),
      (4L, 0, "Dr.", 1L), (4L, 1, "Smith went home.", 3L),
      (4L, 2, "He slept?!", 2L), (4L, 3, "Deeply so.", 2L),
      (7L, 0, "Multi   spaces.", 2L), (7L, 1, "Next one.", 2L)))
  }

  test("sentenceArray feeds unitDedup: the corpus-wide boilerplate " +
      "sentence is deleted from every carrier, original content intact") {
    val d = Seq(
      (1L, "Real content here. Subscribe now. More real text!"),
      (2L, "Different content. Subscribe now. Unique ending?"),
      (3L, "Totally original thoughts. Nothing shared!")
    ).toDF("doc_id", "text")
    val got = CorpusOps.unitDedup(d, "doc_id",
        CorpusOps.sentenceArray(col("text")), maxOcc = 1L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, 1L, "Real content here. More real text!"),
      (2L, 1L, "Different content. Unique ending?"),
      (3L, 0L, "Totally original thoughts. Nothing shared!")))
  }

  test("spanCorruption: reconstruction property — splicing each target " +
      "span back over its input sentinel reproduces the original token " +
      "stream; density 0 masks nothing; deterministic across runs") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
      (3L, "one two three"),
      (4L, (1 to 200).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = CorpusOps.spanCorruption(d, "doc_id", "text",
        densityPpm = 300000L, meanSpan = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    val orig = d.collect().map(r => r.getLong(0) ->
      r.getString(1).trim.split("\\s+").toSeq).toMap
    out.foreach { case (id, input, target, nMasked, nSpans) =>
      // parse target into span lists keyed by sentinel index
      val spans = scala.collection.mutable.Map.empty[Int, Vector[String]]
      var cur = -1
      target.split(" ").filter(_.nonEmpty).foreach { t =>
        if (t.startsWith("<extra_id_")) {
          cur = t.stripPrefix("<extra_id_").stripSuffix(">").toInt
          spans(cur) = Vector.empty
        } else spans(cur) = spans(cur) :+ t
      }
      assert(spans.size.toLong == nSpans)
      assert(spans.values.map(_.size).sum.toLong == nMasked)
      val rebuilt = input.split(" ").filter(_.nonEmpty).flatMap { t =>
        if (t.startsWith("<extra_id_"))
          spans(t.stripPrefix("<extra_id_").stripSuffix(">").toInt)
        else Vector(t)
      }.toSeq
      assert(rebuilt == orig(id), s"doc $id failed reconstruction")
      if (id == 4L) assert(nSpans > 1L && nMasked > nSpans)
    }
    // density 0: nothing masked, input == whitespace-normalized text
    val none = CorpusOps.spanCorruption(d, "doc_id", "text", 0L, 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    none.foreach { case (id, input, target, n) =>
      assert(n == 0L && target == "" &&
        input.split(" ").toSeq == orig(id))
    }
    // determinism
    val again = CorpusOps.spanCorruption(d, "doc_id", "text",
        densityPpm = 300000L, meanSpan = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(again.toSeq == out.toSeq)
  }

  test("fimTransform: reconstruction property - prefix+middle+suffix " +
      "reassembles the original token stream for both PSM and SPM; " +
      "plain rows pass through; rate 0 transforms nothing") {
    val d = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val out = CorpusOps.fimTransform(d, "doc_id", "text", 500000L, 500000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val orig = d.collect().map(r => r.getLong(0) ->
      r.getString(1).trim.split("\\s+").toSeq).toMap
    val modes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(modes.keySet == Set("plain", "psm", "spm"))
    assert(modes("plain") > 100 && modes("psm") > 50 && modes("spm") > 50)
    out.foreach { case (id, mode, text, np, nm, ns) =>
      val o = orig(id)
      if (mode == "plain") {
        assert(text.split(" ").toSeq == o && np == 0 && nm == 0 && ns == 0)
      } else {
        assert(np + nm + ns == o.length.toLong)
        // parse sections back out by sentinel
        def section(name: String): Seq[String] = {
          val parts = text.split(" ").toSeq
          val i = parts.indexOf(s"<fim_$name>")
          assert(i >= 0, s"doc $id missing <fim_$name>")
          parts.drop(i + 1).takeWhile(!_.startsWith("<fim_"))
        }
        val rebuilt = section("prefix") ++ section("middle") ++
          section("suffix")
        assert(rebuilt == o, s"doc $id failed FIM reconstruction")
        assert(section("prefix").length.toLong == np)
        assert(section("middle").length.toLong == nm)
      }
    }
    // rate 0: everything plain
    assert(CorpusOps.fimTransform(d, "doc_id", "text", 0L, 500000L)
      .where(col("mode") =!= "plain").count() == 0)
  }

  test("corpusManifest/rootDigest: order-invariant (repartition and " +
      "row order never change digests), content-sensitive (one changed " +
      "char changes the shard digest and the root), NULL text digests " +
      "under the reserved sentinel") {
    val d = spark.read.parquet(s"$sf001/documents.parquet")
      .withColumn("shard", pmod(col("doc_id"), lit(4)))
    def manifest(df: org.apache.spark.sql.DataFrame) =
      CorpusOps.corpusManifest(df, "doc_id", "text", "shard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).sortBy(_._1).toSeq
    val base = manifest(d)
    assert(base.length == 4)
    assert(manifest(d.repartition(17, col("text"))) == base)
    assert(manifest(d.orderBy(col("text").desc)) == base)
    // flip one character in one doc: exactly that shard's digest moves
    val tweaked = d.withColumn("text",
      when(col("doc_id") === 5, concat(col("text"), lit("X")))
        .otherwise(col("text")))
    val tw = manifest(tweaked)
    assert(tw.zip(base).count { case (a, b) => a != b } == 1)
    assert(tw(1) != base(1) && tw(1)._2 == base(1)._2) // shard 1, same n
    def root(df: org.apache.spark.sql.DataFrame) =
      CorpusOps.corpusRootDigest(CorpusOps.corpusManifest(df, "doc_id",
        "text", "shard")).collect().head.getString(2)
    assert(root(d) != root(tweaked))
    assert(root(d) == root(d.repartition(5)))
    // NULL text neither crashes nor collides with empty text
    import spark.implicits._
    val withNull = Seq((1L, Option.empty[String], 0L),
      (2L, Some(""), 0L)).toDF("doc_id", "text", "shard")
    val m = CorpusOps.corpusManifest(withNull, "doc_id", "text", "shard")
      .collect().head
    assert(m.getLong(1) == 2L && m.getLong(2) == 0L)
    // no (id, text) boundary ambiguity: ('a:b','c') vs ('a','b:c')
    // produced IDENTICAL digests under a raw id:text concat — the
    // separately-hashed form must tell them apart
    def sd(id: String, text: String): String =
      CorpusOps.corpusManifest(
        Seq((id, text, 0L)).toDF("doc_id", "text", "shard"),
        "doc_id", "text", "shard").collect().head.getString(3)
    assert(sd("a:b", "c") != sd("a", "b:c"))
    // a text equal to any would-be sentinel cannot collide with NULL
    assert(sd("x", "null") != CorpusOps.corpusManifest(
      Seq(("x", Option.empty[String], 0L)).toDF("doc_id", "text",
        "shard"), "doc_id", "text", "shard").collect().head.getString(3))
  }

  test("epochAllocation: hand-computed water-filling - two sources cap " +
      "at 2 epochs, the excess redistributes proportionally over the " +
      "uncapped pair; floors under-allocate by at most one token per " +
      "source") {
    val src = Seq(
      ("web", 600000L, 500000L), ("books", 100000L, 300000L),
      ("code", 50000L, 150000L), ("wiki", 200000L, 50000L)
    ).toDF("source", "n_tokens", "weight_ppm")
    val got = CorpusOps.epochAllocation(src, "source", "n_tokens",
        "weight_ppm", targetTokens = 1000000L, maxEpochsPpm = 2000000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4),
        r.getBoolean(5)))).toMap
    assert(got("books") == ((200000L, 2000000L, true)))
    assert(got("code") == ((100000L, 2000000L, true)))
    assert(got("web") == ((636363L, 1060605L, false)))
    assert(got("wiki") == ((63636L, 318180L, false)))
    // everything capped: allocation stops at the repetition bound
    val tiny = Seq(("a", 10L, 600000L), ("b", 10L, 400000L))
      .toDF("source", "n_tokens", "weight_ppm")
    val all = CorpusOps.epochAllocation(tiny, "source", "n_tokens",
        "weight_ppm", 1000000L, 3000000L)
      .collect().map(r => (r.getLong(3), r.getBoolean(5)))
    assert(all.forall { case (alloc, capped) => alloc == 30L && capped })
  }

  test("rankWeightedTargets: exact proportional floors from pinned " +
      "ranks; a web-scale budget times a mega-hub rank cannot wrap " +
      "(DECIMAL-widened product)") {
    import spark.implicits._
    val ranks = Seq(("alpha.com", 1122777L), ("beta.com", 938610L),
      ("gamma.org", 938610L)).toDF("host", "rank_ppm")
    val got = CorpusOps.rankWeightedTargets(ranks, "host", "rank_ppm",
        budget = 6L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("alpha.com" -> 2L, "beta.com" -> 1L,
      "gamma.org" -> 1L))
    // overflow posture: budget 10^12 docs, one hub holding 1.1e13 ppm
    // of rank mass — the naive Long product is 1.1e25, far past 2^63
    val big = Seq(("hub", 11000000000000L), ("rest", 1000000L))
      .toDF("host", "rank_ppm")
    val bigGot = CorpusOps.rankWeightedTargets(big, "host", "rank_ppm",
        budget = 1000000000000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bigGot("hub") == 999999909090L) // floor(1e12*1.1e13/1.1000001e13)
    assert(bigGot("rest") == 90909L)
    assert(bigGot.values.sum <= 1000000000000L)
  }

  test("epochAllocation: multi-trillion-token budgets survive (the " +
      "budget*w and cap products overflow Long without BigInt " +
      "widening); negative weights fail descriptively") {
    import spark.implicits._
    // 15T target with full-ppm weights: budget*w ~ 1.5e19 > Long.Max
    val big = Seq(("web", 20000000000000L, 900000L),
      ("code", 5000000000000L, 100000L))
      .toDF("source", "n_tokens", "weight_ppm")
    val got = CorpusOps.epochAllocation(big, "source", "n_tokens",
        "weight_ppm", targetTokens = 15000000000000L,
        maxEpochsPpm = 4000000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4),
        r.getBoolean(5)))).toMap
    // floors: web gets 13.5T (0.675 epochs), code 1.5T (0.3 epochs) —
    // nobody near the 4-epoch cap, every share positive and exact
    assert(got("web") == ((13500000000000L, 675000L, false)))
    assert(got("code") == ((1500000000000L, 300000L, false)))
    // epochs_ppm itself needs the BigInt: alloc*1e6 ~ 1.35e19 > Long.Max
    assert(got.values.forall { case (a, e, _) => a > 0 && e > 0 })
    val bad = Seq(("web", 100L, -5L)).toDF("source", "n_tokens",
      "weight_ppm")
    val ex = intercept[IllegalArgumentException] {
      CorpusOps.epochAllocation(bad, "source", "n_tokens", "weight_ppm",
        1000L, 2000000L)
    }
    assert(ex.getMessage.contains("negative weight_ppm"))
  }

  test("lineDedup: cross-doc boilerplate lines drop everywhere, a " +
      "within-doc refrain survives distinct-doc counting, blank lines " +
      "are immune, trimmed-form matching, order preserved") {
    val d = Seq(
      (1L, "HEADER\nunique body one\n\nrefrain\nrefrain\nFOOTER"),
      (2L, "HEADER\nunique body two\nFOOTER"),
      (3L, "HEADER\n  FOOTER  \nsolo line")
    ).toDF("doc_id", "text")
    val r = CorpusOps.lineDedup(d, "doc_id", "text", maxDocs = 1)
      .orderBy("doc_id").collect()
    // doc 1: HEADER/FOOTER in 3 docs -> removed; "refrain" twice but in
    // ONE doc -> kept; the blank separator is immune
    assert(r(0).getAs[Long]("n_removed") == 2L)
    assert(r(0).getAs[String]("text_clean") ==
      "unique body one\n\nrefrain\nrefrain")
    assert(r(1).getAs[Long]("n_removed") == 2L)
    assert(r(1).getAs[String]("text_clean") == "unique body two")
    // doc 3: "  FOOTER  " trims to the boilerplate form -> removed
    assert(r(2).getAs[Long]("n_removed") == 2L)
    assert(r(2).getAs[String]("text_clean") == "solo line")
  }

  test("lineDedup: NULL text behaves as one empty (kept) line") {
    val d = Seq((1L, null.asInstanceOf[String]), (2L, "x"))
      .toDF("doc_id", "text")
    val r = CorpusOps.lineDedup(d, "doc_id", "text", maxDocs = 1)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_removed") == 0L)
    assert(r(0).getAs[String]("text_clean") == "")
    assert(r(1).getAs[String]("text_clean") == "x")
  }

  test("quantileBuckets: tie groups bucket by where they START in the " +
      "cumulative, groups are independent, top bucket capped at k-1") {
    // group a: 1..6 -> clean tertiles; group b: ties 1,1,1 start at
    // below=0 -> bucket 0, the 9 at below=3 of n=4 -> (3*3) div 4 = 2
    val a = Seq.tabulate(6)(i => (i + 1L, "a", i + 1L))
    val b = Seq((10L, "b", 1L), (11L, "b", 1L), (12L, "b", 1L),
      (13L, "b", 9L))
    val r = CorpusOps.quantileBuckets((a ++ b).toDF("id", "g", "score"),
        "id", "g", "score", k = 3)
      .orderBy("id").collect()
    assert(r.map(_.getAs[Long]("bucket")).toSeq ==
      Seq(0L, 0L, 1L, 1L, 2L, 2L, 0L, 0L, 0L, 2L))
  }
}
