package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Diversified re-ranking for retrieval serving: Maximal Marginal
  * Relevance (Carbonell & Goldstein, SIGIR'98) over per-query candidate
  * lists. An ANN stage ([[Similarity.bruteTopK]], `ivfTopKFromIndex`,
  * BM25) returns the top-C most RELEVANT candidates; MMR re-picks k of
  * them trading relevance against redundancy, so near-duplicate hits
  * don't crowd out the answer set — the last mile of the retrieval
  * pipeline the rest of the similarity family feeds.
  *
  * Scale contract: the input is an already-bounded candidate table
  * (C ≈ tens per query, the upstream top-k's own bound), so the greedy
  * per-query selection is a `flatMapGroups` over O(C·dim) state and
  * O(k·C) similarity probes — embarrassingly parallel across queries,
  * one keyed shuffle total. It is NOT for unbounded corpora; the
  * pre-bounding stage is what keeps 100 TB out of the group state.
  *
  * Exact-integer scoring (the house FP-free discipline): relevance
  * arrives in ppm, pairwise cosine is floored to ppm, and the MMR
  * objective stays in integer micro²-units —
  * `score = λppm·rel_ppm − (10⁶−λppm)·maxSimPpm` — so ties and ranks
  * are deterministic and oracle-pinnable. First pick has no selected
  * set: maxSim term is 0, i.e. pure relevance. From the second pick on
  * the penalty is the true max-similarity — NEGATIVE cosines count (a
  * candidate anti-correlated with everything selected gets a boost,
  * per the original MMR objective; no clamp at 0). Ties break (score
  * desc, id asc).
  */
object Rerank {

  private val outSchema = StructType(Seq(
    StructField("query_id", LongType),
    StructField("rank", IntegerType),
    StructField("doc_id", LongType),
    StructField("mmr_score", LongType)))

  /** floor(10⁶ · cos(a,b)) as a Long; 0 for a zero-norm side. */
  private def simPpm(a: Array[Float], b: Array[Float]): Long = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
    while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
    if (na == 0.0 || nb == 0.0) 0L
    else math.floor(1e6 * dot / (math.sqrt(na) * math.sqrt(nb))).toLong
  }

  /** MMR top-`k` per query over bounded candidates
    * (queryCol, idCol, relPpmCol, vecCol) → (query_id, rank, doc_id,
    * mmr_score). `lambdaPpm` = 10⁶ is pure relevance; 0 is pure
    * diversity. */
  def mmrRerank(candidates: DataFrame, queryCol: String, idCol: String,
      relPpmCol: String, vecCol: String, k: Int,
      lambdaPpm: Long): DataFrame = {
    require(k > 0, "mmrRerank needs k > 0")
    require(lambdaPpm >= 0 && lambdaPpm <= 1000000L,
      "lambdaPpm must be in [0, 1e6]")
    val in = candidates.select(
      col(queryCol).cast("long").as("q"),
      col(idCol).cast("long").as("id"),
      col(relPpmCol).cast("long").as("rel"),
      col(vecCol).cast(ArrayType(FloatType)).as("vec"))
    implicit val rowEnc = Encoders.row(outSchema)
    in.groupByKey(_.getLong(0))(Encoders.scalaLong)
      .flatMapGroups { (q: Long, it: Iterator[Row]) =>
        // bounded by contract: C candidates per query from an upstream
        // top-k, never the corpus
        val cand = it.map(r => (r.getLong(1), r.getLong(2),
          r.getSeq[Float](3).toArray)).toArray
        val picked = new Array[Boolean](cand.length)
        // running max-sim-to-selected per remaining candidate: O(C)
        // updates per pick instead of O(|S|·C) re-probes. Long.MinValue
        // is the "no selected set yet" sentinel: the first pick scores
        // pure relevance, and from then on the penalty is the TRUE
        // max_{s in S} sim — negative cosines included (an
        // anti-correlated selected set makes a candidate MORE
        // attractive, as Carbonell-Goldstein MMR specifies)
        val maxSim = Array.fill(cand.length)(Long.MinValue)
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        var rank = 1
        val kk = math.min(k, cand.length)
        while (rank <= kk) {
          var best = -1
          var bestScore = Long.MinValue
          var i = 0
          while (i < cand.length) {
            if (!picked(i)) {
              val pen = if (maxSim(i) == Long.MinValue) 0L else maxSim(i)
              val s = lambdaPpm * cand(i)._2 -
                (1000000L - lambdaPpm) * pen
              if (s > bestScore ||
                  (s == bestScore && best >= 0 &&
                    cand(i)._1 < cand(best)._1)) {
                best = i; bestScore = s
              }
            }
            i += 1
          }
          picked(best) = true
          out += Row(q, rank, cand(best)._1, bestScore)
          i = 0
          while (i < cand.length) {
            if (!picked(i)) {
              val s = simPpm(cand(i)._3, cand(best)._3)
              if (s > maxSim(i)) maxSim(i) = s
            }
            i += 1
          }
          rank += 1
        }
        out.iterator
      }.toDF()
  }
}
