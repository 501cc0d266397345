package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[InvertedIndex]] — postings, integer idf weighting, stopword shedding,
  * top-k ranking. Hand-computed fixture; the sf-scaled DuckDB twin is q85. */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (0L, "rare a a"),
    (1L, "rare a"),
    (2L, "common common a"),
    (3L, "rare")
  ).toDF("doc_id", "text")

  test("postings: (doc, term, tf) wordcount shape") {
    val p = InvertedIndex.postings(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(p((0L, "a", 2L)) && p((0L, "rare", 1L)) && p((2L, "common", 2L)))
    assert(p.size == 7)
  }

  test("tfIdfTopK: maxDf sheds stopwords, scores are exact integers") {
    // df: rare=3, a=3, common=1. maxDf=2 keeps only "common" (w=1e6).
    // query doc2 ("common common a"): only doc with "common" is itself ->
    // no neighbors. maxDf=3 keeps all: rare w=333333, a w=333333, common 1e6.
    val none = InvertedIndex.tfIdfTopK(corpus,
      corpus.filter(col("doc_id") === 2L), "doc_id", "text", 10, maxDf = 2L)
    assert(none.count() == 0L)

    val r = InvertedIndex.tfIdfTopK(corpus,
        corpus.filter(col("doc_id") === 0L), "doc_id", "text", 10, maxDf = 3L)
      .orderBy("rank").collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getInt(3)))
    // query doc0: rare tf=1, a tf=2
    //   doc1: 1*1*333333 + 2*1*333333 = 999999
    //   doc2: a only: 2*1*333333 = 666666
    //   doc3: rare only: 1*1*333333 = 333333
    assert(r.toSeq == Seq((1L, 999999L, 1), (2L, 666666L, 2), (3L, 333333L, 3)))
  }

  test("bm25TopK: matches a driver-side exact-integer reimplementation; " +
      "length normalization and tf saturation behave") {
    // independent BigInt reimplementation of the documented formula
    val texts = Map(0L -> "rare a a", 1L -> "rare a",
      2L -> "common common a", 3L -> "rare")
    val toks = texts.view.mapValues(_.split("\\s+").toSeq).toMap
    val post = toks.toSeq.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, xs) => (id, t, xs.size.toLong) }
    }
    val df = post.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val w = df.collect { case (t, d) if d <= 3L => t -> (1000000L / d) }
    val dl = toks.view.mapValues(_.size.toLong).toMap
    val bigD = BigInt(1000000) * dl.values.sum / dl.size
    def sat(tf: Long, docLen: Long): BigInt =
      (BigInt(1000000) * tf * 22000 * bigD) /
        (BigInt(10000) * bigD * tf + BigInt(3000) * bigD +
          BigInt(9000000000L) * docLen)
    val qTf = post.collect { case (0L, t, tf) if w.contains(t) => t -> tf }
    val expected = (1L to 3L).map { d =>
      d -> qTf.map { case (t, tfq) =>
        post.find(p => p._1 == d && p._2 == t)
          .map(p => BigInt(tfq) * w(t) * sat(p._3, dl(d)))
          .getOrElse(BigInt(0))
      }.sum
    }.filter(_._2 > 0).sortBy { case (d, s) => (-s, d) }
      .map { case (d, s) => (d, s.toLong) }
    val got = InvertedIndex.bm25TopK(corpus,
        corpus.filter(col("doc_id") === 0L), "doc_id", "text", 10,
        maxDf = 3L)
      .orderBy("rank").collect().map(x => (x.getLong(1), x.getLong(2)))
    assert(got.toSeq == expected)
    // length normalization: the same single "rare" scores higher in the
    // 1-token doc3 than in the 2-token doc1
    assert(sat(1L, dl(3L)) > sat(1L, dl(1L)))
    // tf saturation: doubling tf less than doubles the saturated weight
    assert(sat(2L, 3L) < 2 * sat(1L, 3L))
  }

  test("tfIdfTopK: score ties rank by lower neighbor id; k truncates") {
    val tie = Seq((0L, "t"), (1L, "t"), (2L, "t")).toDF("doc_id", "text")
    val r = InvertedIndex.tfIdfTopK(tie, tie.filter(col("doc_id") === 0L),
        "doc_id", "text", k = 1, maxDf = 10L)
      .collect().map(x => (x.getLong(1), x.getInt(3)))
    assert(r.toSeq == Seq((1L, 1)))
  }
}
