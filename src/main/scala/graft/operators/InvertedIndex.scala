package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions.tokens

/** Sparse (lexical) top-k similarity via an inverted index — the BM25/TF-IDF
  * complement to [[Similarity]]'s dense ANN: score a small query set against
  * the whole corpus by joining term postings, never materializing document
  * pairs that share no term.
  *
  * Weighting is exact-integer "idf": weight(t) = floor(10⁶ / df(t)), so a
  * (query, doc) score is Σ_t tf_q(t) · tf_d(t) · w(t) — an integer sum,
  * order-independent and bit-identical in any engine (a float ln-idf would
  * not hash-match across engines; the ranking behavior is the same
  * rare-terms-dominate shape).
  *
  * Shape at 100 TB: the corpus side becomes (doc, term, tf) postings via
  * the wordcount aggregation (one shuffle keyed by (doc, term) with
  * map-side combine), document frequencies are one more count shuffle
  * keyed by term, and the scoring join broadcasts the (tiny) query postings
  * so the corpus postings never shuffle again — partial scores combine in a
  * final (query, doc) aggregation whose key space is bounded by matched
  * postings, not |corpus|×|queries|. `maxDf` sheds stopword postings — the
  * skew bound AND the relevance filter in one (a term in half the corpus
  * carries no signal but dominates the join fan-out).
  */
object InvertedIndex {

  /** (id, term, tf) postings from whitespace tokens. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Exact-integer rarity weight per term: floor(10⁶ / df). */
  private def idfWeight(df: Column): Column =
    floor(lit(1000000.0) / df.cast("double")).cast("long")

  /** Top-k corpus documents per query document by the integer TF-IDF
    * score. Self-matches excluded; ties break to the lower neighbor id.
    * Returns (query_id, neighbor_id, score, rank). */
  def tfIdfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, textCol: String,
      k: Int, maxDf: Long
  ): DataFrame = {
    val corpusPost = postings(corpus, idCol, textCol)
    val termW = corpusPost.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("term"), idfWeight(col("df")).as("w"))
    val qPost = postings(queries, idCol, textCol)
      .select(col("id").as("query_id"), col("term"), col("tf").as("tf_q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    corpusPost
      .join(termW, Seq("term"))
      .join(broadcast(qPost), Seq("term"))
      .filter(col("id") =!= col("query_id"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("tf") * col("tf_q") * col("w")).as("score"))
      .withColumn("neighbor_id", col("id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank"))
  }
}
