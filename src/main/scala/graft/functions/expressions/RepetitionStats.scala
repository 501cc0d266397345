package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object RepetitionStats {
  /** Token/bigram repetition counts of one document in one plain-Java pass:
    * (n_tokens, n_distinct, top_word, n_bigrams, top_bigram). Semantically
    * identical to exploding tokens/2-gram shingles and aggregating counts
    * (the declarative twin kept in CorpusOps.repetitionStats's agg path and
    * pinned in RepetitionStatsSpec) — but the stats are row-local, so the
    * explode→shuffle→agg round trip is pure overhead. */
  def compute(text: UTF8String): InternalRow = {
    val toks = text.toString.trim.split("\\s+")
    val wc = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < toks.length) {
      wc.merge(toks(i), 1L, (a, b) => a + b)
      i += 1
    }
    var topWord = 0L
    val wit = wc.values().iterator()
    while (wit.hasNext) { val v = wit.next(); if (v > topWord) topWord = v }
    val bc = new java.util.HashMap[String, Long]()
    i = 0
    while (i + 1 < toks.length) {
      bc.merge(toks(i) + " " + toks(i + 1), 1L, (a, b) => a + b)
      i += 1
    }
    var topBigram = 0L
    val bit = bc.values().iterator()
    while (bit.hasNext) { val v = bit.next(); if (v > topBigram) topBigram = v }
    val nBigrams = math.max(toks.length - 1, 0).toLong
    new GenericInternalRow(Array[Any](
      toks.length.toLong, wc.size.toLong, topWord, nBigrams, topBigram))
  }

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_word", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("top_bigram", LongType, nullable = false)))
}

/** Codegen'd `repetition_stats(text) -> struct`: the per-document
  * repetition-quality counts (Gopher gates) as a single map-only pass —
  * zero shuffle, versus the wordcount-shaped explode→agg→join twin. At
  * 100 TB per-document statistics should never leave their partition. */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires string input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.RepetitionStats.compute($c)")

  override protected def withNewChildInternal(c: Expression): RepetitionStatsExpr =
    copy(child = c)
  override def prettyName: String = "repetition_stats"
}
