package graft.functions

/** Character-n-gram language identification — langdetect's public
  * algorithm (Nakatani Shuyo's language-detection library, Apache-2.0;
  * used by the reference at src/topic_modeling.py:401-407), re-expressed
  * deterministically:
  *
  *  - normalize: strip URLs and mail addresses (the reference's
  *    LangDetectException cases are exactly "emoji-only and link-only
  *    texts"), lowercase, collapse everything outside the letter set to
  *    single spaces;
  *  - features: padded character trigrams;
  *  - model: per-language trigram profiles scored by naive Bayes with
  *    additive smoothing. Profiles are built at class-init from public
  *    per-language common-word lists (Zipf-ranked weights) through the
  *    SAME trigram extractor used on inputs.
  *
  * Differences from langdetect, by design: no random sampling trials
  * (langdetect's detect() is nondeterministic unless globally seeded —
  * a per-row nondeterministic UDF would poison retries/speculation at
  * scale), and log-probabilities are pre-scaled to integral
  * micro-log-units so scores sum as exact longs: order-independent,
  * overflow-safe, and bit-identical in any engine. [[sqlOracle]] emits
  * the weight tables as SQL VALUES from the same in-memory model, so the
  * DuckDB gate replays the identical computation by construction.
  *
  * Returns None when normalization leaves no letters (link-only input —
  * the reference returns None after catching LangDetectException) or when
  * no trigram hits the model vocabulary (caller may fall back to the
  * stopword heuristic of `text_langid`).
  */
object LangId {

  /** Letter set kept by normalization — ascii + the western-European
    * accents the profiles cover. Shared verbatim with the SQL oracle. */
  val letterClass = "a-zäöüßáéíóúñàâçèêëîïôùû"

  private val urlRe = "https?://\\S+"
  private val mailRe = s"[${letterClass}0-9._-]+@[${letterClass}0-9._-]+"
  private val nonLetterRe = s"[^$letterClass]+"

  def normalize(text: String): String =
    text.toLowerCase
      .replaceAll(urlRe, " ")
      .replaceAll(mailRe, " ")
      .replaceAll(nonLetterRe, " ")
      .trim

  /** Padded character trigrams of a normalized string. */
  def trigrams(norm: String): Seq[String] = {
    if (norm.isEmpty) return Seq.empty
    val p = " " + norm + " "
    (0 to p.length - 3).map(i => p.substring(i, i + 3))
  }

  // Per-language common-word seeds (public stopword/frequency lists),
  // most-frequent first; trigram counts derive from these through the
  // same extractor. Zipf-ranked weight: max(2, 50 - 2*rank).
  private val seeds: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit",
      "sich", "des", "auf", "für", "ist", "im", "dem", "nicht", "ein",
      "eine", "als", "auch", "es", "an", "werden", "aus", "er", "hat",
      "dass", "sie", "nach", "wird", "bei", "einer", "um", "am", "sind",
      "noch", "wie", "einem", "über", "einen", "so", "zum", "war", "haben",
      "nur", "oder", "aber", "vor", "zur", "bis", "mehr", "durch", "man",
      "sein", "wurde", "sei", "hier", "deutscher", "deutsche", "text"),
    "en" -> Seq("the", "and", "is", "in", "to", "of", "it", "you", "that",
      "he", "was", "for", "on", "are", "with", "as", "his", "they", "at",
      "be", "this", "have", "from", "or", "one", "had", "by", "but", "not",
      "what", "all", "were", "we", "when", "your", "can", "there", "an",
      "each", "which", "she", "do", "how", "their", "if", "will", "up",
      "other", "about", "out", "many", "then", "them", "these", "so",
      "some", "her", "would", "make", "like", "him", "into", "time", "has",
      "two", "more", "go", "no", "way", "my", "than", "first", "been",
      "who", "its", "now", "get", "text", "goes", "here", "english"),
    "es" -> Seq("de", "la", "que", "el", "en", "y", "a", "los", "del",
      "se", "las", "por", "un", "para", "con", "no", "una", "su", "al",
      "lo", "como", "más", "pero", "sus", "le", "ya", "o", "este", "sí",
      "porque", "esta", "entre", "cuando", "muy", "sin", "sobre",
      "también", "me", "hasta", "hay", "donde", "quien", "desde", "todo",
      "nos", "durante", "todos", "uno", "les", "ni", "contra", "otros",
      "ese", "eso", "ante", "ellos", "esto", "antes", "algunos", "qué",
      "unos", "yo", "otro", "otras", "otra", "él", "tanto", "esa"),
    "fr" -> Seq("de", "la", "le", "et", "les", "des", "en", "un", "du",
      "une", "que", "est", "pour", "qui", "dans", "a", "par", "plus",
      "pas", "au", "sur", "ne", "se", "ce", "il", "sont", "vous", "je",
      "son", "avec", "ils", "bien", "cette", "ces", "aux", "nous",
      "comme", "mais", "ou", "si", "leur", "y", "dont", "elle", "tout",
      "sans", "peut", "être", "même", "aussi", "quelques", "était",
      "après", "très", "deux", "cela", "entre", "fait", "encore"))

  /** lang → (trigram → count). */
  val profiles: Map[String, Map[String, Long]] = seeds.map { case (lang, words) =>
    val counts = collection.mutable.HashMap.empty[String, Long]
    words.zipWithIndex.foreach { case (w, rank) =>
      val wt = math.max(2L, 50L - 2L * rank)
      trigrams(normalize(w)).foreach(t =>
        counts(t) = counts.getOrElse(t, 0L) + wt)
    }
    lang -> counts.toMap
  }.toMap

  val langs: Seq[String] = seeds.map(_._1)

  /** Union vocabulary — only these trigrams participate in scoring
    * (langdetect likewise drops features absent from every profile). */
  val vocab: Set[String] = profiles.values.flatMap(_.keys).toSet

  private val alpha = 0.5
  private val vSize = vocab.size

  /** Integral micro-log-prob weight per SEEN (lang, trigram):
    * round(ln(P(t|lang)) * 1e6) with P = (count + α) / (total + α·V). */
  val weights: Map[String, Map[String, Long]] = profiles.map {
    case (lang, counts) =>
      val total = counts.values.sum.toDouble
      lang -> counts.map { case (t, c) =>
        t -> math.round(math.log((c + alpha) / (total + alpha * vSize)) * 1e6)
      }
  }

  /** Smoothing floor per lang — the weight of an in-vocabulary trigram
    * the language's profile never saw (count 0). */
  val floors: Map[String, Long] = profiles.map { case (lang, counts) =>
    val total = counts.values.sum.toDouble
    lang -> math.round(math.log(alpha / (total + alpha * vSize)) * 1e6)
  }

  /** Detected language, or None for letter-free / out-of-vocabulary
    * input. Scores sum as exact longs; ties break to the alphabetically
    * first language (langs is sorted; maxBy keeps the first maximum). */
  def detect(text: String): Option[String] = {
    if (text == null) return None
    val hits = trigrams(normalize(text)).filter(vocab.contains)
    if (hits.isEmpty) return None
    Some(langs.map { lang =>
      val w = weights(lang)
      val fl = floors(lang)
      lang -> hits.iterator.map(t => w.getOrElse(t, fl)).sum
    }.maxBy(_._2)._1)
  }

  /** langdetect + heuristic composition: n-gram NB first, stopword-count
    * fallback for out-of-vocabulary text (the engine's pre-round-3
    * text_langid heuristic). */
  def detectOrElse(text: String, fallback: String => String): String =
    detect(text).getOrElse(fallback(text))

  /** The scoring tables as SQL literals — generated from the same model,
    * so a SQL replay is identical by construction. Rows ordered (lang,
    * trigram) for stable oracle text. */
  def sqlWeightValues: String =
    (for {
      lang <- langs
      (t, w) <- weights(lang).toSeq.sortBy(_._1)
    } yield s"('$lang','$t',$w)").mkString(",\n          ")

  def sqlFloorValues: String =
    langs.map(l => s"('$l',${floors(l)})").mkString(",")
}
