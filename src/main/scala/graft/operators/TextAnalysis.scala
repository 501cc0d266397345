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

  // ------------------------------------------------------------------
  // Hashed char-n-gram language ID — the upgrade over the marker-word
  // argmax above (the cld/langid.py family's core signal re-expressed
  // in the house integer style): character trigrams carry language
  // identity even when no function word appears (short strings, verb
  // phrases, compounds), which is exactly where marker counting
  // degrades to 'und'.
  // ------------------------------------------------------------------

  /** Shared text normalization for profile building AND scoring —
    * MUST stay byte-identical between the Scala (driver, profile
    * build) and Column/SQL (scoring) forms: lowercase, every
    * non-letter → space, collapse runs, trim, pad one space each side
    * (so word-boundary trigrams exist). */
  private[operators] def normForNgrams(s: String): String = {
    // Locale.ROOT: the scoring path uses Spark's locale-independent
    // lower(); a tr/az default JVM locale would lower 'I' to 'ı' here
    // and silently misalign trigram buckets between build and score
    val collapsed = s.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^\\p{L} ]", " ")
      .replaceAll(" +", " ")
      .trim
    " " + collapsed + " "
  }

  private[operators] def normForNgramsCol(text: Column): Column =
    concat(lit(" "),
      trim(regexp_replace(regexp_replace(lower(text), "[^\\p{L} ]", " "),
        " +", " ")),
      lit(" "))

  /** Build per-language hashed char-n-gram profiles from seed text:
    * every n-gram of each order in `orders` (default the 2+3-gram
    * blend — bigrams generalize where a short string repeats few
    * seed trigrams; trigrams carry the sharper signal) folds into
    * `dim` buckets (`md5-prefix60 mod dim` —
    * [[graft.functions.TextFunctions.portableHash60]]'s exact Scala
    * twin).
    *
    * Weights are scaled ADD-ONE-SMOOTHED LOG-LIKELIHOODS (the
    * multinomial naive-Bayes form every langid.py-class identifier
    * uses): `w[b] = ⌊1024·(ln(c[b]+1) − ln(T+dim) + maxLog)⌋`, where
    * `maxLog = max over languages of ln(T+dim)` shifts every weight
    * ≥ 0 uniformly PER GRAM, so the scorer's argmax equals the NB
    * argmax and its `best ≤ 0 → und` gate still fires on gramless
    * text. Against raw ppm mass this is the difference between 20/24
    * and 24/24 on the held-out fixture: the log damps the shared
    * high-frequency grams that let a sibling Romance language win on
    * bulk, and a gram the language's seed has never produced scores
    * (near) the floor instead of averaging away. `StrictMath.log`
    * keeps the build bit-identical across JVMs; both engines then
    * consume the SAME literal weight arrays, so no FP ever re-runs
    * at scoring time. DRIVER-side over a few KB of seed text — the
    * profile is a broadcast-scale constant, the same artifact class
    * as the mixture tables. */
  def buildLanguageProfiles(samples: Seq[(String, String)], dim: Int,
      orders: Seq[Int] = Seq(2, 3)): Seq[(String, Array[Long])] = {
    val counts = samples.map { case (lang, text) =>
      val n = normForNgrams(text)
      val grams = orders.flatMap(o =>
        (0 to n.length - o).map(i => n.substring(i, i + o)))
      val buckets = new Array[Long](dim)
      grams.foreach { g =>
        val h = graft.functions.expressions.HashExprs.md5Prefix60(
          g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        buckets((h % dim).toInt) = buckets((h % dim).toInt) + 1L
      }
      (lang, buckets, grams.size.toLong)
    }
    val maxLog = counts.map(c => StrictMath.log(c._3 + dim.toDouble)).max
    counts.map { case (lang, c, t) =>
      lang -> c.map(cb => math.floor(1024.0 *
        (StrictMath.log(cb + 1.0) - StrictMath.log(t + dim.toDouble) +
          maxLog)).toLong)
    }
  }

  /** Bundled seed text for the five marker languages (a few sentences
    * of generic prose each — enough trigram mass to separate them; a
    * production deployment passes its own corpus samples). */
  val defaultProfileSamples: Seq[(String, String)] = Seq(
    "en" -> ("the quick brown fox jumps over the lazy dog while the " +
      "children were reading their books in the library and the " +
      "weather outside was getting colder every evening through the " +
      "autumn months with rain falling quietly on the old roof " +
      "yesterday morning she brought fresh bread from the bakery and " +
      "everyone gathered around the kitchen table to share breakfast " +
      "together before walking down the long road towards the little " +
      "school where they would spend most of their day learning about " +
      "history and science and writing short stories about things " +
      "they had seen during their summer holidays by the sea"),
    "es" -> ("el rapido zorro marron salta sobre el perro perezoso " +
      "mientras los ninos leian sus libros en la biblioteca y el " +
      "tiempo afuera se volvia mas frio cada noche durante los meses " +
      "de otono con la lluvia cayendo sobre el viejo tejado ayer por " +
      "la manana ella trajo pan fresco de la panaderia y todos se " +
      "reunieron alrededor de la mesa de la cocina para compartir el " +
      "desayuno juntos antes de caminar por el largo camino hacia la " +
      "pequena escuela donde pasarian la mayor parte del dia " +
      "aprendiendo historia y ciencias y escribiendo cuentos cortos " +
      "sobre las cosas que habian visto durante sus vacaciones de " +
      "verano junto al mar"),
    "fr" -> ("le renard brun rapide saute par dessus le chien " +
      "paresseux pendant que les enfants lisaient leurs livres dans " +
      "la bibliotheque et le temps dehors devenait plus froid chaque " +
      "soir pendant les mois d automne avec la pluie qui tombait " +
      "doucement sur le vieux toit hier matin elle a apporte du pain " +
      "frais de la boulangerie et tout le monde s est reuni autour de " +
      "la table de la cuisine pour partager le petit dejeuner " +
      "ensemble avant de marcher sur la longue route vers la petite " +
      "ecole ou ils passeraient la plus grande partie de leur journee " +
      "a apprendre l histoire et les sciences et a ecrire de courtes " +
      "histoires sur les choses qu ils avaient vues pendant leurs " +
      "vacances d ete au bord de la mer"),
    "de" -> ("der schnelle braune fuchs springt uber den faulen hund " +
      "wahrend die kinder ihre bucher in der bibliothek lasen und das " +
      "wetter draussen jeden abend kalter wurde durch die " +
      "herbstmonate mit regen der leise auf das alte dach fiel " +
      "gestern morgen brachte sie frisches brot von der backerei und " +
      "alle versammelten sich um den kuchentisch um gemeinsam zu " +
      "fruhstucken bevor sie den langen weg zur kleinen schule " +
      "gingen wo sie den grossten teil ihres tages damit verbringen " +
      "wurden geschichte und naturwissenschaften zu lernen und kurze " +
      "geschichten uber die dinge zu schreiben die sie wahrend ihrer " +
      "sommerferien am meer gesehen hatten"),
    "pt" -> ("a rapida raposa marrom pula sobre o cachorro preguicoso " +
      "enquanto as criancas liam seus livros na biblioteca e o tempo " +
      "la fora ficava mais frio a cada noite durante os meses de " +
      "outono com a chuva caindo sobre o velho telhado ontem de " +
      "manha ela trouxe pao fresco da padaria e todos se reuniram ao " +
      "redor da mesa da cozinha para compartilhar o cafe da manha " +
      "juntos antes de caminhar pela longa estrada ate a pequena " +
      "escola onde passariam a maior parte do dia aprendendo " +
      "historia e ciencias e escrevendo contos curtos sobre as " +
      "coisas que tinham visto durante as suas ferias de verao " +
      "junto ao mar"),
    "it" -> ("la rapida volpe marrone salta sopra il cane pigro " +
      "mentre i bambini leggevano i loro libri nella biblioteca e il " +
      "tempo fuori diventava piu freddo ogni sera durante i mesi " +
      "autunnali con la pioggia che cadeva piano sul vecchio tetto " +
      "ieri mattina lei ha portato il pane fresco dal forno e tutti " +
      "si sono riuniti intorno al tavolo della cucina per " +
      "condividere la colazione insieme prima di camminare lungo la " +
      "lunga strada verso la piccola scuola dove avrebbero passato " +
      "la maggior parte della giornata imparando la storia e le " +
      "scienze e scrivendo brevi racconti sulle cose che avevano " +
      "visto durante le vacanze estive al mare"),
    "nl" -> ("de snelle bruine vos springt over de luie hond terwijl " +
      "de kinderen hun boeken in de bibliotheek lazen en het weer " +
      "buiten elke avond kouder werd in de herfstmaanden met regen " +
      "die zacht op het oude dak viel gisteren ochtend bracht zij " +
      "vers brood van de bakker en iedereen kwam samen rond de " +
      "keukentafel om het ontbijt te delen voordat ze de lange weg " +
      "naar de kleine school liepen waar ze het grootste deel van " +
      "hun dag zouden doorbrengen met het leren van geschiedenis en " +
      "wetenschap en het schrijven van korte verhalen over de " +
      "dingen die ze tijdens hun zomervakantie aan zee hadden " +
      "gezien"),
    "pl" -> ("szybki brazowy lis skacze nad leniwym psem podczas gdy " +
      "dzieci czytaly swoje ksiazki w bibliotece a pogoda na " +
      "zewnatrz stawala sie coraz zimniejsza kazdego wieczoru przez " +
      "jesienne miesiace z deszczem cicho padajacym na stary dach " +
      "wczoraj rano przyniosla swiezy chleb z piekarni i wszyscy " +
      "zebrali sie wokol kuchennego stolu aby razem zjesc sniadanie " +
      "zanim poszli dluga droga do malej szkoly gdzie mieli " +
      "spedzic wieksza czesc dnia uczac sie historii i nauk " +
      "przyrodniczych i piszac krotkie opowiadania o rzeczach " +
      "ktore widzieli podczas letnich wakacji nad morzem"))

  /** N-gram language ID: normalize, slice char n-grams (the same
    * `orders` the profile was built with — default 2+3 blend),
    * integer-dot each language's broadcast bucket-weight array
    * (`Σ w[h(g) mod dim]` — the
    * [[graft.operators.CorpusOps.scoreHashedLinear]] shape), argmax
    * with ties to the earlier language; zero total score → 'und'.
    * Pure Column pipeline (transform + aggregate + element_at over
    * array literals): map-only, engine-portable. */
  def languageIdNgram(text: Column,
      profiles: Seq[(String, Array[Long])], dim: Int,
      orders: Seq[Int] = Seq(2, 3)): Column = {
    val norm = normForNgramsCol(text)
    // Two guards share one threshold of max(o, 3): Spark's
    // sequence(1, n) runs DESCENDING for n < 1, which would fabricate
    // junk grams; and a LETTERLESS text normalizes to two pad spaces,
    // whose '  ' bigram would score against collision noise instead
    // of returning 'und' — any real letter makes norm ≥ 3 chars.
    // (DuckDB twins carry the same length conditions.)
    val grams = orders.map { o =>
      when(length(norm) >= math.max(o, 3),
        transform(sequence(lit(1), length(norm) - (o - 1)),
          i => norm.substr(i, lit(o))))
        .otherwise(array_repeat(lit(""), 0))
    }.reduce((a, b) => concat(a, b))
    val scores = profiles.map { case (lang, weights) =>
      val wArr = array(weights.map(lit(_)): _*)
      lang -> aggregate(grams, lit(0L), (acc, g) =>
        acc + element_at(wArr,
          (pmod(graft.functions.TextFunctions.portableHash60(g),
            lit(dim.toLong)) + 1L).cast("int")))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0, "und")) { case (acc, (lang, sc)) =>
      acc.when(sc === best, lang)
    }.otherwise("und")
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
