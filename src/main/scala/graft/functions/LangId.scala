package graft.functions

import java.lang.Character.UnicodeScript

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf

/** Deterministic language identification — the one *justified* scalar UDF in
  * the engine (SURVEY U4): the reference calls Python `langdetect` per
  * review, client-side, 1000 rows at a time
  * (/root/reference/scripts/app/language_detection.py:41-154). Here the same
  * surface is a pure Scala function, applied distributed via `withColumn` —
  * no driver round-trip, no external deps (zero-egress container).
  *
  * Two stages, both deterministic:
  *   1. SCRIPT vote — letters are bucketed by `Character.UnicodeScript`
  *      (JVM built-in Unicode tables). A dominant non-Latin script decides
  *      outright (Hangul → ko, Thai → th, …); Han with any kana → ja, else
  *      zh; Cyrillic and Arabic branch on single characters that exist in
  *      only one orthography (і/ї/є → uk, ы/э → ru, ј/љ/њ → sr, ъ-heavy →
  *      bg; پ/چ/ژ/گ → fa, ٹ/ڈ/ڑ/ے → ur).
  *   2. LATIN profiles — common function words (weight 3) + characteristic
  *      trigrams, highest score wins, first-listed on ties, 'und' when
  *      nothing hits.
  *
  * Coverage (round 6): 55 tags, matching `langdetect`'s profile set except
  * that Han resolves to one `zh` tag (langdetect splits zh-cn/zh-tw by
  * simplified-vs-traditional codepoint tables; both map to `zh` here):
  *
  *   script-decided (24): ko el he th ka hy am km lo my pa gu kn ml si ta
  *                        te bn ja zh  + Devanagari→{hi mr ne}
  *   orthography-branched (7): Cyrillic→{ru uk mk sr bg}, Arabic→{ar fa ur}
  *   Latin profiles (31): en fr es de pt it nl sv da no fi pl cs tr ro hu
  *                        id vi ca hr et lv lt af cy sk sl sq so sw tl
  *
  * Accuracy is heuristic-grade on short snippets (like the original's
  * 100-char `detect(comment[:100])`), and closely related pairs (da/no,
  * cs/sk, es/ca, hi/mr/ne) keep their usual confusability — this is a
  * fidelity bound of the offline constraint, documented, not hidden.
  * On the LangIdSpec sample sentences (one per profiled language) every
  * profiled tag resolves correctly; the fixture `documents` corpus is
  * synthetic English-like text, so corpus-level F1 is not meaningful here.
  */
object LangId {

  /** Latin-script profiles: (lang, marker words, marker trigrams).
    * Ordered — first maximal score wins, 'und' when nothing hits.
    */
  private val profiles: Seq[(String, Set[String], Set[String])] = Seq(
    ("en", Set("the", "and", "of", "to", "is", "in", "it", "you", "that"),
      Set("the", "ing", "ion", "ent", "her")),
    ("fr", Set("le", "la", "les", "et", "est", "une", "que", "pour", "dans"),
      Set("que", "ais", "ent", "eur", "eau")),
    ("es", Set("el", "la", "los", "y", "es", "una", "que", "por", "con"),
      Set("que", "ión", "ada", "los", "ent")),
    ("de", Set("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "sich"),
      Set("der", "ein", "ich", "sch", "und")),
    ("pt", Set("o", "a", "os", "e", "é", "uma", "não", "para", "com"),
      Set("ção", "ada", "que", "com", "par")),
    ("it", Set("il", "lo", "gli", "che", "non", "per", "una", "sono", "di"),
      Set("che", "zio", "gli", "ell", "are")),
    ("nl", Set("de", "het", "een", "van", "ik", "niet", "met", "je", "zijn"),
      Set("een", "aar", "ijk", "sch", "van")),
    ("sv", Set("och", "att", "det", "som", "är", "på", "för", "inte", "med"),
      Set("och", "att", "för", "ång", "ern")),
    ("da", Set("og", "det", "at", "den", "til", "er", "som", "ikke", "af"),
      Set("og ", "det", "ikk", "els", "nde")),
    ("no", Set("og", "det", "at", "er", "som", "på", "ikke", "jeg", "av"),
      Set("og ", "det", "ikk", "kke", "ene")),
    ("fi", Set("ja", "on", "ei", "se", "että", "hän", "oli", "mutta", "kun"),
      Set("ett", "ssa", "ään", "lla", "sta")),
    ("pl", Set("i", "w", "nie", "się", "na", "jest", "że", "z", "do"),
      Set("nie", "rze", "ych", "ego", "owa")),
    ("cs", Set("a", "je", "se", "na", "to", "že", "s", "v", "jak"),
      Set("pře", "ost", "ení", "ick", "sou")),
    ("tr", Set("ve", "bir", "bu", "da", "için", "ile", "olarak", "çok", "değil"),
      Set("lar", "ler", "bir", "iyo", "mak")),
    ("ro", Set("și", "de", "la", "cu", "în", "este", "o", "pentru", "nu"),
      Set("ulu", "are", "ște", "să ", "în ")),
    ("hu", Set("az", "és", "nem", "hogy", "is", "egy", "van", "meg", "csak"),
      Set("egy", "nek", "ség", "ban", "hog")),
    ("id", Set("yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini", "adalah"),
      Set("ang", "kan", "men", "ber", "nya")),
    ("vi", Set("và", "của", "là", "có", "không", "được", "trong", "cho", "một"),
      Set("ông", "ượn", "ủa ", "ột ", "ừa ")),
    ("ca", Set("els", "i", "és", "amb", "per", "dels", "més", "com", "aquest"),
      Set("els", "ent", "què", "açó", "ita")),
    ("hr", Set("i", "je", "se", "u", "na", "da", "su", "za", "što"),
      Set("što", "ije", "ova", "ski", "iti")),
    ("et", Set("ja", "on", "ei", "ta", "et", "see", "oli", "ka", "kui"),
      Set("kui", "ud ", "ise", "sel", "nud")),
    ("lv", Set("un", "ir", "es", "tas", "ka", "viņš", "bija", "arī", "kā"),
      Set("un ", "ais", "iet", "par", "tik")),
    ("lt", Set("ir", "yra", "tai", "kad", "jis", "buvo", "taip", "pat", "su"),
      Set("kad", "ius", "ant", "ial", "uot")),
    // round-6 additions closing the langdetect-set gap; appended so ties
    // keep resolving to the longer-established profiles above
    ("af", Set("die", "het", "nie", "vir", "ek", "wat", "om", "baie", "maar"),
      Set("die", "nie", "vir", "aar", "oed")),
    ("cy", Set("yn", "yr", "ac", "mae", "bod", "gan", "fod", "wedi", "hyn"),
      Set("ydd", "aet", "wed", "mae", "odd")),
    ("sk", Set("som", "ako", "ale", "už", "či", "aj", "sme", "ste", "ktorý"),
      Set("som", "ova", "ích", "ien", "kto")),
    ("sl", Set("in", "ki", "da", "za", "so", "ne", "pa", "tudi", "kot"),
      Set("pri", "anj", "nje", "tud", "kot")),
    ("sq", Set("dhe", "në", "për", "që", "një", "të", "nga", "është", "por"),
      Set("të ", "një", "dhe", "ësh", "jë ")),
    ("so", Set("iyo", "oo", "ay", "waa", "uu", "ku", "si", "aan", "waxaa"),
      Set("iyo", "waa", "yaa", "xaa", "aan")),
    ("sw", Set("na", "ya", "kwa", "ni", "za", "wa", "katika", "hii", "kuwa"),
      Set("kwa", "ika", "uwa", "cha", "wa ")),
    ("tl", Set("ang", "ng", "sa", "ay", "mga", "ako", "ito", "hindi", "naman"),
      Set("ang", "mga", "ito", "aka", "nga")))

  /** Single-script languages: a dominant script IS the answer. */
  private val scriptLang: Map[UnicodeScript, String] = Map(
    UnicodeScript.HANGUL -> "ko", UnicodeScript.GREEK -> "el",
    UnicodeScript.HEBREW -> "he", UnicodeScript.THAI -> "th",
    UnicodeScript.BENGALI -> "bn",
    UnicodeScript.TAMIL -> "ta", UnicodeScript.TELUGU -> "te",
    UnicodeScript.GEORGIAN -> "ka", UnicodeScript.ARMENIAN -> "hy",
    UnicodeScript.ETHIOPIC -> "am", UnicodeScript.KHMER -> "km",
    UnicodeScript.LAO -> "lo", UnicodeScript.MYANMAR -> "my",
    UnicodeScript.GURMUKHI -> "pa", UnicodeScript.GUJARATI -> "gu",
    UnicodeScript.KANNADA -> "kn", UnicodeScript.MALAYALAM -> "ml",
    UnicodeScript.SINHALA -> "si")

  private def containsAny(s: String, chars: String): Boolean =
    s.exists(c => chars.indexOf(c.toInt) >= 0)

  /** Detect the language of (up to the first 100 chars of) `text`;
    * returns a 2-letter tag or "und" — mirroring the reference's
    * `detect(comment[:100])` with default 'und'.
    */
  def detect(text: String): String = {
    if (text == null) return "und"
    val snippet = text.take(100).toLowerCase
    if (snippet.trim.isEmpty) return "und"

    // ---- stage 1: script vote over letter code points
    val counts = scala.collection.mutable.Map.empty[UnicodeScript, Int]
    var letters = 0
    var i = 0
    while (i < snippet.length) {
      val cp = snippet.codePointAt(i)
      if (Character.isLetter(cp)) {
        letters += 1
        val sc = UnicodeScript.of(cp)
        counts.update(sc, counts.getOrElse(sc, 0) + 1)
      }
      i += Character.charCount(cp)
    }
    if (letters == 0) return "und"
    val (domScript, domN) = counts.maxBy(_._2)
    if (domScript != UnicodeScript.LATIN && domN * 2 > letters) {
      scriptLang.get(domScript) match {
        case Some(lang) => return lang
        case None =>
      }
      domScript match {
        case UnicodeScript.HAN =>
          // kanji alone → zh; any kana in the snippet → ja
          val kana = counts.getOrElse(UnicodeScript.HIRAGANA, 0) +
            counts.getOrElse(UnicodeScript.KATAKANA, 0)
          return if (kana > 0) "ja" else "zh"
        case UnicodeScript.HIRAGANA | UnicodeScript.KATAKANA => return "ja"
        case UnicodeScript.DEVANAGARI =>
          // orthography tells the three Devanagari languages apart: ळ is
          // everyday Marathi (rare in Hindi); the छ copula without the
          // Hindi है marks Nepali. Heuristic-grade, like the Cyrillic split.
          if (containsAny(snippet, "ळ")) return "mr"
          if (snippet.contains("छ") && !snippet.contains("है")) return "ne"
          return "hi"
        case UnicodeScript.CYRILLIC =>
          if (containsAny(snippet, "іїєґ")) return "uk"
          // ѓ/ќ/ѕ exist only in the Macedonian alphabet (ј/љ/њ are shared
          // with Serbian, so test these first)
          if (containsAny(snippet, "ѓќѕ")) return "mk"
          if (containsAny(snippet, "јљњћђ")) return "sr"
          if (containsAny(snippet, "ыэ")) return "ru"
          if (containsAny(snippet, "ъ")) return "bg"
          return "ru"
        case UnicodeScript.ARABIC =>
          if (containsAny(snippet, "ٹڈڑے")) return "ur"
          if (containsAny(snippet, "پچژگ")) return "fa"
          return "ar"
        case _ => return "und" // dominant script we carry no profile for
      }
    }

    // ---- stage 2: Latin-script word/trigram profiles
    val words = snippet.split("\\s+").filter(_.nonEmpty)
    val tris = snippet.sliding(3).toSeq
    var best = "und"; var bestScore = 0
    profiles.foreach { case (lang, markers, trigrams) =>
      val w = words.count(markers.contains) * 3
      val t = tris.count(trigrams.contains)
      val score = w + t
      if (score > bestScore) { best = lang; bestScore = score }
    }
    best
  }

  /** Column form (Scala UDF — the justified one; see class doc). */
  val detectUdf = udf(detect _)

  def detectLang(c: Column): Column = detectUdf(c)

  /** SQL registration: SELECT detect_lang(comments) ... */
  def register(spark: SparkSession): Unit =
    spark.udf.register("detect_lang", detect _)
}
