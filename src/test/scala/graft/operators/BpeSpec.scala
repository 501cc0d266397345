package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Bpe]] — round-1 statistics on the Sennrich et al. worked example, and
  * the multi-round trainer pinned against an in-memory reference fold with
  * identical greedy scan order and tie-breaks. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val sennrich =
    Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  /** Pure-Scala twin of [[Bpe.applyMerge]]'s left-to-right greedy fold. */
  private def apply1(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    for (x <- syms) {
      if (out.nonEmpty && out.last == a && x == b)
        out(out.length - 1) = a + b
      else out += x
    }
    out.toList
  }

  private def refPairs(seg: Map[List[String], Long]) =
    seg.toSeq.flatMap { case (syms, n) =>
      syms.sliding(2).collect { case List(a, b) => ((a, b), n) }
    }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }

  /** Reference trainer: same statistic, same (count desc, left, right)
    * tie-break, same greedy merge. */
  private def refTrain(words: Seq[(String, Long)], rounds: Int)
      : (Seq[(Int, String, String, Long)], Map[List[String], Long]) = {
    var seg: Map[List[String], Long] =
      words.map { case (w, n) => w.toList.map(_.toString) -> n }.toMap
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val pc = refPairs(seg)
      if (pc.nonEmpty) {
        val ((a, b), n) = pc.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((r, a, b, n))
        seg = seg.map { case (syms, cnt) => apply1(syms, a, b) -> cnt }
      }
    }
    (merges.result(), seg)
  }

  test("round-1 pair counts match the worked example") {
    val wc = sennrich.toDF("word", "n")
    val pc = Bpe.pairCounts(Bpe.initialSymbols(wc))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(pc(("e", "s")) == 9L) // newest 6 + widest 3
    assert(pc(("s", "t")) == 9L)
    assert(pc(("w", "e")) == 8L) // lower 2 + newest 6
    assert(pc(("l", "o")) == 7L) // low 5 + lower 2
    assert(pc == refPairs(
      sennrich.map { case (w, n) => w.toList.map(_.toString) -> n }.toMap))
  }

  test("applyMerge is the left-to-right greedy scan") {
    val seg = Seq(("aaaa", 1L), ("aaa", 1L), ("banana", 1L))
      .toDF("word", "n")
    val out = Bpe.applyMerge(Bpe.initialSymbols(seg), "a", "a")
      .collect().map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(out("aaaa") == List("aa", "aa"))
    assert(out("aaa") == List("aa", "a"))
    assert(out("banana") == List("b", "a", "n", "a", "n", "a"))
  }

  test("trainer matches the reference fold over 5 rounds") {
    val (refMerges, refSeg) = refTrain(sennrich, 5)
    val merges = Bpe.train(sennrich.toDF("word", "n"), rounds = 5)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(merges == refMerges)
    // ties at 9 resolve left-asc: round 1 must merge (e, s)
    assert(merges.head == ((1, "e", "s", 9L)))
    // and encode() replays the learned merges to the reference segmentation
    val docs = Seq((1L, "low lower newest widest")).toDF("doc_id", "text")
    val enc = Bpe.encode(docs, "text",
        merges.map { case (_, a, b, _) => (a, b) })
      .select(col("syms")).collect()
      .map(_.getSeq[String](0).toList).toSet
    assert(enc == refSeg.keySet)
  }

  test("wordCounts is the single corpus scan the trainer iterates on") {
    val docs = Seq((1L, "  to be or "), (2L, "or not to be"), (3L, "be"))
      .toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc == Map("to" -> 2L, "be" -> 3L, "or" -> 2L, "not" -> 1L))
  }

  test("train stops early when no pair remains") {
    val wc = Seq(("ab", 3L)).toDF("word", "n")
    val merges = Bpe.train(wc, rounds = 8).collect()
    assert(merges.length == 1) // one merge exhausts the only word
  }
}
