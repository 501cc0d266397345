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

  test("tfIdfTopK: score ties rank by lower neighbor id; k truncates") {
    val tie = Seq((0L, "t"), (1L, "t"), (2L, "t")).toDF("doc_id", "text")
    val r = InvertedIndex.tfIdfTopK(tie, tie.filter(col("doc_id") === 0L),
        "doc_id", "text", k = 1, maxDf = 10L)
      .collect().map(x => (x.getLong(1), x.getInt(3)))
    assert(r.toSeq == Seq((1L, 1)))
  }
}
