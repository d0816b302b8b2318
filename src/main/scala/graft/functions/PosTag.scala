package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic rule-based POS tagger (SURVEY §2.10 N4).
  *
  * The reference tags German museum posts with spaCy
  * (reference src/absa/post_opinion_patterns.py:346-363) and feeds the
  * tag sequence to the opinion-pattern matcher (N5). A neural model is
  * out of engine scope, but the *interface* N5 needs is just
  * token → tag, so this closes the N4 "partial" with the classic
  * rule-cascade tagger: closed-class lexicon first (determiners,
  * prepositions, pronouns, conjunctions, particles, auxiliaries — the
  * word classes that are finite sets in German and English), then
  * German derivational-suffix heuristics for the open classes
  * (-ung/-heit/-keit → NOUN, -ig/-lich/-isch → ADJ, -en/-ern/-eln
  * infinitives → VERB), then NOUN as the default (German's largest open
  * class).
  *
  * Every rule is a pure string predicate, so the tagger has two faces
  * generated from the SAME rule table: a codegen-friendly Catalyst
  * `when`-chain ([[tag]]) and an ANSI CASE expression ([[sqlCase]]) the
  * DuckDB oracle replays — the two cannot drift apart.
  */
object PosTag {
  // Closed-class lexicons (German + English function words; lowercase).
  val det: Seq[String] = Seq(
    "the", "a", "an", "der", "die", "das", "den", "dem", "des",
    "ein", "eine", "einen", "einem", "einer", "eines")
  val adp: Seq[String] = Seq(
    "in", "on", "at", "of", "auf", "mit", "von", "zu", "bei", "nach",
    "für", "über", "unter", "an", "aus", "durch", "gegen", "ohne", "um")
  val pron: Seq[String] = Seq(
    "ich", "du", "er", "sie", "es", "wir", "ihr", "man",
    "i", "you", "he", "she", "it", "we", "they")
  val conj: Seq[String] = Seq(
    "und", "oder", "aber", "denn", "weil", "dass", "wenn",
    "and", "or", "but")
  val part: Seq[String] = Seq("nicht", "kein", "keine", "not", "no")
  val aux: Seq[String] = Seq(
    "ist", "sind", "war", "waren", "hat", "haben", "wird", "werden",
    "kann", "muss", "is", "are", "was", "has", "have", "will")
  // Open-class lexicons for words the suffix rules cannot reach.
  val adjLex: Seq[String] = Seq(
    "fast", "slow", "big", "small", "schnell", "langsam", "gut",
    "schlecht", "schön", "groß", "klein", "neu", "alt")
  val verbLex: Seq[String] = Seq(
    "sort", "merge", "scan", "join", "filter", "group", "stream",
    "geht", "kommt", "sehen", "machen")
  // German derivational suffixes (checked in this order; noun suffixes
  // before the verb -en rule so -chen/-lein diminutives win).
  val nounSuffix: Seq[String] = Seq(
    "ung", "heit", "keit", "schaft", "tion", "tät", "chen", "lein", "ismus")
  val adjSuffix: Seq[String] = Seq(
    "ig", "lich", "isch", "bar", "sam", "haft", "los", "voll")
  val verbSuffix: Seq[String] = Seq("ern", "eln", "en")

  private val numRe = "[0-9]+([.,][0-9]+)?"
  private val punctRe = "[.,;:!?()-]+"

  /** Catalyst face: `w` is a lowercase token column. */
  def tag(w: Column): Column = {
    def anySuffix(ss: Seq[String]): Column =
      ss.map(s => w.endsWith(s)).reduce(_ || _)
    when(w.rlike("^" + numRe + "$"), "NUM")
      .when(w.rlike("^" + punctRe + "$"), "PUNCT")
      .when(w.isin(det: _*), "DET")
      .when(w.isin(adp: _*), "ADP")
      .when(w.isin(pron: _*), "PRON")
      .when(w.isin(conj: _*), "CONJ")
      .when(w.isin(part: _*), "PART")
      .when(w.isin(aux: _*), "AUX")
      .when(w.isin(adjLex: _*), "ADJ")
      .when(w.isin(verbLex: _*), "VERB")
      .when(anySuffix(nounSuffix), "NOUN")
      .when(anySuffix(adjSuffix), "ADJ")
      .when(anySuffix(verbSuffix), "VERB")
      .otherwise("NOUN")
  }

  /** DuckDB face: a CASE expression over the SQL expression `w`,
    * generated from the same rule table as [[tag]]. */
  def sqlCase(w: String): String = {
    def inList(ss: Seq[String]) = ss.map("'" + _ + "'").mkString("(", ", ", ")")
    def anySuffix(ss: Seq[String]) =
      ss.map(s => s"ends_with($w, '$s')").mkString("(", " OR ", ")")
    s"""CASE
       WHEN regexp_full_match($w, '$numRe') THEN 'NUM'
       WHEN regexp_full_match($w, '$punctRe') THEN 'PUNCT'
       WHEN $w IN ${inList(det)} THEN 'DET'
       WHEN $w IN ${inList(adp)} THEN 'ADP'
       WHEN $w IN ${inList(pron)} THEN 'PRON'
       WHEN $w IN ${inList(conj)} THEN 'CONJ'
       WHEN $w IN ${inList(part)} THEN 'PART'
       WHEN $w IN ${inList(aux)} THEN 'AUX'
       WHEN $w IN ${inList(adjLex)} THEN 'ADJ'
       WHEN $w IN ${inList(verbLex)} THEN 'VERB'
       WHEN ${anySuffix(nounSuffix)} THEN 'NOUN'
       WHEN ${anySuffix(adjSuffix)} THEN 'ADJ'
       WHEN ${anySuffix(verbSuffix)} THEN 'VERB'
       ELSE 'NOUN' END"""
  }
}
