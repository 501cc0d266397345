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

  /** BM25-style top-k: [[tfIdfTopK]]'s integer rarity weight with the two
    * things BM25 adds over raw tf — TERM-FREQUENCY SATURATION (a term
    * occurring 50× is not 50× as relevant; the k1 asymptote caps it) and
    * DOCUMENT-LENGTH NORMALIZATION (a match in a short doc outranks the
    * same match diluted in a long one; b controls how much).
    *
    * Exact-integer throughout, so the ranking is bit-reproducible across
    * engines: with k1 = k1Pct/100 and b = bPct/100, the saturated tf
    *   tf·(k1+1) / (tf + k1(1−b) + k1·b·dl/avgdl)
    * is evaluated as one integral division of two DECIMAL(38,0)-exact
    * products — both sides scaled by 10⁴·D, where D = (10⁶·Σdl) div N is
    * the integer-ppm average document length:
    *   sat_ppm = 10⁶·tf·(k1Pct+100)·100·D
    *             div (10⁴·D·tf + k1Pct·(100−bPct)·D + k1Pct·bPct·10⁶·dl)
    * score(q, d) = Σ_t tf_q(t) · w(t) · sat_ppm(t, d) — an integer sum.
    * (A float ln-idf/BM25 would not hash-match across engines; the
    * rare-terms-dominate, long-docs-damped ranking shape is the same.)
    *
    * Shape at 100 TB: identical to [[tfIdfTopK]] — postings + df are the
    * two wordcount shuffles, doc lengths ride the postings aggregation's
    * input, the global (Σdl, N) stats row is a broadcast 1-row frame (no
    * driver action), and the scoring join broadcasts the query postings. */
  def bm25TopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, textCol: String,
      k: Int, maxDf: Long, k1Pct: Int = 120, bPct: Int = 75
  ): DataFrame = {
    require(k1Pct >= 0 && bPct >= 0 && bPct <= 100,
      "k1Pct must be >= 0 and bPct within [0, 100]")
    // integral division (SQL `div`): truncating quotient of two exact
    // DECIMAL(38,0) products — both engines truncate positive quotients
    import graft.functions.Predicates.idiv
    val dl = corpus.select(col(idCol).as("id"),
      size(tokens(col(textCol))).cast("long").as("dl"))
    // D = (1e6 * total_tokens) div n_docs, computed wide (DECIMAL(38,0))
    // so a 100 TB corpus's token total cannot overflow the ppm scaling
    val stats = dl.agg(
        sum(col("dl")).cast("decimal(38,0)").as("__lt"),
        count(lit(1)).cast("decimal(38,0)").as("__nd"))
      .select(idiv(col("__lt") * lit(1000000L), col("__nd"))
        .cast("decimal(38,0)").as("__d"))
    // ONE postings subtree shared by the scoring side and the df side —
    // identical subtrees let ReuseExchange serve both from one wordcount
    // shuffle (a second postings() call would tokenize and shuffle the
    // 100 TB corpus twice for the same rows)
    val post = postings(corpus, idCol, textCol)
    val corpusPost = post
      .join(dl, Seq("id"))
      .crossJoin(broadcast(stats))
    val termW = post.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("term"), idfWeight(col("df")).as("w"))
    val qPost = postings(queries, idCol, textCol)
      .select(col("id").as("query_id"), col("term"), col("tf").as("tf_q"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val num = dec(lit(1000000L)) * dec(col("tf")) *
      dec(lit((k1Pct + 100) * 100L)) * col("__d")
    val den = dec(lit(10000L)) * col("__d") * dec(col("tf")) +
      dec(lit(k1Pct.toLong * (100L - bPct))) * col("__d") +
      dec(lit(k1Pct.toLong * bPct * 1000000L)) * dec(col("dl"))
    scoredTopK(corpusPost.withColumn("sat_ppm", idiv(num, den)),
      termW, qPost, sum(col("tf_q") * col("w") * col("sat_ppm")), k)
  }

  /** Shared scoring tail of [[bm25TopK]]/[[tfIdfTopK]]: weight + query
    * joins, self-match exclusion, per-(query, doc) score aggregation, and
    * the top-k window (ties break to the lower neighbor id). */
  private def scoredTopK(posted: DataFrame, termW: DataFrame,
      qPost: DataFrame, scoreExpr: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    posted
      .join(termW, Seq("term"))
      .join(broadcast(qPost), Seq("term"))
      .filter(col("id") =!= col("query_id"))
      .groupBy(col("query_id"), col("id"))
      .agg(scoreExpr.as("score"))
      .withColumn("neighbor_id", col("id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rank"))
  }

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
    scoredTopK(corpusPost, termW, qPost,
      sum(col("tf") * col("tf_q") * col("w")), k)
  }
}
