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
}
