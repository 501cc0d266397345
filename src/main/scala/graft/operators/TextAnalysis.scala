package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Text analysis operators: language ID, quality scoring, token counting —
  * all pure `Column` expressions (codegen-friendly, engine-portable).
  */
object TextAnalysis {

  /** Default stopword markers per language for the heuristic language ID.
    * Order matters: ties resolve to the earlier entry (then 'und'). */
  val defaultMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "los", "las", "una", "por"),
    "fr" -> Seq("le", "les", "des", "est", "dans", "pour", "que", "une"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "pt" -> Seq("o", "os", "uma", "com", "para", "em", "das", "dos")
  )

  private def markerCount(text: Column, words: Seq[String]): Column =
    size(regexp_extract_all(lower(text),
      lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))

  /** Heuristic language ID: argmax of per-language marker-stopword counts;
    * all-zero → 'und'; ties go to the earlier language in `markers`
    * (deterministic). */
  def languageId(text: Column,
      markers: Seq[(String, Seq[String])] = defaultMarkers): Column = {
    val counts = markers.map { case (lang, ws) => lang -> markerCount(text, ws) }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldLeft(when(best <= 0, "und")) { case (acc, (lang, c)) =>
      acc.when(c === best, lang)
    }.otherwise("und")
  }

  /** Quality features: character/word/punctuation counts and ratios.
    * Engine-portable integer counts + same-order double divisions. */
  def nWords(text: Column): Column = size(tokens(text))
  def nPunct(text: Column): Column =
    length(regexp_replace(text, "[^.,!?;:]", ""))
  def stopwordCount(text: Column): Column =
    markerCount(text, defaultMarkers.head._2)

  /** Composite quality score in [0,1]: penalizes extreme length, high
    * punctuation density, and stopword-free (unnatural) text. The exact
    * weighting is ours — the operator contract is a deterministic,
    * engine-reproducible scalar. */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val words = nWords(text).cast("double")
    val lengthOk = when(len.between(100, 10000), 1.0).otherwise(0.5)
    val punctRatio = nPunct(text).cast("double") / greatest(len, lit(1.0))
    val stopRatio = stopwordCount(text).cast("double") / greatest(words, lit(1.0))
    round(
      lengthOk * 0.4
        + when(punctRatio <= 0.1, 0.3).otherwise(0.1)
        + least(stopRatio * lit(3.0), lit(0.3)),
      6)
  }

  /** The script classes a multilingual-corpus audit splits on. Each is a
    * (name, Java-regex character class) pair; `script_mix` counts per
    * class with codegen'd `regexp_count` — map-only at any scale. */
  val scriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "\\p{IsLatin}",
    "cyrillic" -> "\\p{IsCyrillic}",
    "greek" -> "\\p{IsGreek}",
    "arabic" -> "\\p{IsArabic}",
    "cjk" -> "[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}]",
    "digit" -> "\\p{Nd}")

  /** Per-document script-mix audit: per-class character counts, the
    * dominant script (argmax over the letter classes, ties to the
    * earlier class, all-zero → 'none'), and a code-mixed flag — a second
    * script holding ≥ `mixedThresholdPpm` of the letter mass. The gate a
    * multilingual pipeline runs BEFORE per-language routing: mislabeled
    * and code-mixed documents poison per-language tokenizers and
    * language-filtered training mixes. Integer counts + one integer
    * cross-multiplication per class — no FP, exact twins. */
  def scriptMix(df: DataFrame, textCol: String,
      mixedThresholdPpm: Long = 100000L): DataFrame = {
    val letterClasses = scriptClasses.filter(_._1 != "digit")
    val counted = letterClasses.foldLeft(
      df.withColumn("n_digit",
        regexp_count(col(textCol), lit("\\p{Nd}")).cast("long"))) {
      case (acc, (name, re)) =>
        acc.withColumn(s"n_$name",
          regexp_count(col(textCol), lit(re)).cast("long"))
    }
    val letterCols = letterClasses.map { case (n, _) => col(s"n_$n") }
    val total = letterCols.reduce(_ + _)
    val best = letterCols.reduce((a, b) => greatest(a, b))
    val dominant = letterClasses.foldLeft(when(best <= 0, "none")) {
      case (acc, (name, _)) => acc.when(col(s"n_$name") === best, name)
    }.otherwise("none")
    // code-mixed: some non-dominant letter class carries >= threshold of
    // the letter mass (integer cross-multiplication, no division)
    val mixed = letterClasses.map { case (name, _) =>
      col(s"n_$name") < best &&
        col(s"n_$name") * lit(1000000L) >= lit(mixedThresholdPpm) * total
    }.reduce(_ || _)
    counted
      .withColumn("n_letters", total)
      .withColumn("dominant_script", dominant)
      .withColumn("is_code_mixed", coalesce(mixed, lit(false)))
  }

  /** Vocabulary-coverage / OOV-rate report per group: the top
    * `vocabSize` corpus words by count (ties word-asc — a total order,
    * so both engines cut the same vocabulary) stand in for a tokenizer
    * vocab; each group reports its token count, OOV count, and integer
    * oov_ppm. The pre-training gate that catches a source whose domain
    * the tokenizer never saw (code, another language) before it wastes
    * sequence length as byte-fallback garbage. One wordcount shuffle +
    * a TakeOrdered vocab (bounded, broadcast back) + one group agg. */
  def vocabCoverage(docs: DataFrame, groupCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val words = docs.select(col(groupCol).as("grp"),
        explode(tokens(col(textCol))).as("word"))
      .where(col("word") =!= "")
    val vocab = words.groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(vocabSize)
      .select(col("word"), lit(1).as("in_vocab"))
    words.join(broadcast(vocab), Seq("word"), "left")
      .groupBy(col("grp").as(groupCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", expr("n_oov * 1000000 div n_tokens"))
  }
}
