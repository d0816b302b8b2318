package graft.sources

import java.time.{Instant, LocalDate, LocalDateTime, ZoneId}

import scala.collection.mutable

/** Small pure parsers shared by the S5 scrape operators
  * ([[graft.bronze.Scrape]]): German dates (the reference funnels every
  * scraped date through `dateparser.parse(..., locales=['de'])`,
  * scrape_gomus.py:45-55), the gomus hovercard `popover({...})` JS object
  * literal (capacities.py:42-50 extracts it by regex and evaluates with
  * js2py — here a direct literal parser, no JS engine), and German
  * decimal prices (scrape_gomus.py:348-352).
  */
object Scrapers {

  /** The reference's scrape cron ran in the museum's timezone; epoch
    * `data-timestamp` cells decode via `datetime.fromtimestamp` = local
    * Berlin time (verified against the reference's own capacities
    * fixtures: 1603699200 → "26. Oktober, 09:00 Uhr"). */
  val zone: ZoneId = ZoneId.of("Europe/Berlin")

  def fromTimestamp(epochSeconds: Long): LocalDateTime =
    Instant.ofEpochSecond(epochSeconds).atZone(zone).toLocalDateTime

  private val months = Map(
    "januar" -> 1, "februar" -> 2, "märz" -> 3, "maerz" -> 3, "april" -> 4,
    "mai" -> 5, "juni" -> 6, "juli" -> 7, "august" -> 8, "september" -> 9,
    "oktober" -> 10, "november" -> 11, "dezember" -> 12,
    // dateparser also accepts German three-letter abbreviations
    "jan" -> 1, "feb" -> 2, "mär" -> 3, "apr" -> 4, "jun" -> 6, "jul" -> 7,
    "aug" -> 8, "sep" -> 9, "okt" -> 10, "nov" -> 11, "dez" -> 12)

  private val weekdays = Set(
    "montag", "dienstag", "mittwoch", "donnerstag", "freitag", "samstag",
    "sonntag", "mo", "di", "mi", "do", "fr", "sa", "so")

  private val numericDate =
    """(\d{1,2})\.(\d{1,2})\.(\d{2,4})(?:,?\s+(\d{1,2}):(\d{2}))?""".r
  private val isoDate =
    """(\d{4})-(\d{2})-(\d{2})(?:[T ](\d{1,2}):(\d{2})(?::(\d{2}))?)?""".r
  private val wordDate =
    """(\d{1,2})\.\s*([\wäöüÄÖÜ]+)\.?(?:\s+(\d{4}))?\s*,?\s*(?:(\d{1,2}):(\d{2}))?\s*(?:uhr)?""".r

  /** German date parse — dateparser(de) parity for the formats the gomus
    * pages actually carry:
    *  - "26.10.2020", "02.10.2019 14:30", "5.10.2019 14:30 Uhr"
    *  - "14. März 2015, 13:41 Uhr"
    *  - "26. Oktober, 09:00 Uhr" (year absent → taken from
    *    `relativeBase`, dateparser RELATIVE_BASE semantics: the missing
    *    FIELD is substituted, even if the result precedes the base)
    *  - optional weekday prefix ("Mi., 02.10.2019")
    *  - ISO "2020-10-26[ 13:41[:00]]"
    * Returns None when nothing matches (reference gets `None` from
    * dateparser the same way). */
  def parseGermanDate(raw: String,
      relativeBase: Option[LocalDate] = None): Option[LocalDateTime] = {
    var s = raw.trim.toLowerCase.replaceAll("\\s+", " ")
    s = s.stripSuffix("uhr").trim
    // strip a leading weekday ("mi., " / "mittwoch, ")
    val wd = """^([a-zäöü]+)\.?,\s*(.*)$""".r
    s = s match {
      case wd(w, rest) if weekdays.contains(w) => rest
      case _ => s
    }
    def mk(y: Int, m: Int, d: Int, h: Int, mi: Int): Option[LocalDateTime] =
      try Some(LocalDateTime.of(y, m, d, h, mi, 0))
      catch { case _: Exception => None }
    s match {
      case isoDate(y, m, d, h, mi, _) =>
        mk(y.toInt, m.toInt, d.toInt,
          Option(h).map(_.toInt).getOrElse(0),
          Option(mi).map(_.toInt).getOrElse(0))
      case numericDate(d, m, y, h, mi) =>
        val year = y.toInt match {
          case y2 if y2 < 100 => 2000 + y2
          case y4 => y4
        }
        mk(year, m.toInt, d.toInt,
          Option(h).map(_.toInt).getOrElse(0),
          Option(mi).map(_.toInt).getOrElse(0))
      case wordDate(d, monthWord, y, h, mi) =>
        months.get(monthWord).flatMap { m =>
          val year = Option(y).map(_.toInt)
            .orElse(relativeBase.map(_.getYear))
          year.flatMap(yy => mk(yy, m, d.toInt,
            Option(h).map(_.toInt).getOrElse(0),
            Option(mi).map(_.toInt).getOrElse(0)))
        }
      case _ => None
    }
  }

  /** German price text → double: "1.234,50 €" / "18,00€" / "5"
    * (scrape_gomus.py:348-352: strip €, comma → dot). The reference does
    * NOT strip thousands dots (prices there never reach 1000); parity
    * kept, documented. */
  def parsePrice(raw: String): Double =
    raw.replace(",", ".").replace("€", "").trim.toDouble

  // ------------------------------------------------------------ popover
  private val popoverRe =
    ("""(?s)<script>\s*\$\("#info-\d+"\)\.popover\((\{.*?\})\);\s*</script>""").r

  /** All `$("#info-…").popover({...})` object literals in a page source,
    * in order (capacities.py:42-50). */
  def popoverLiterals(src: String): Vector[String] =
    popoverRe.findAllMatchIn(src).map(_.group(1)).toVector

  /** Parse one popover object literal — `{ key : 'value', ... }` with
    * single-quoted strings and backslash escapes (`\'`, `\\`, `\/`,
    * `\n`, `\t`). This replaces the reference's js2py evaluation: the
    * hovercard payload is a plain literal, no JS semantics needed. */
  def parseJsObject(src: String): Map[String, String] = {
    val out = mutable.LinkedHashMap.empty[String, String]
    var i = src.indexOf('{') + 1
    val n = src.length
    def skipWs(): Unit =
      while (i < n && (src.charAt(i).isWhitespace || src.charAt(i) == ',')) i += 1
    while (i < n) {
      skipWs()
      if (i >= n || src.charAt(i) == '}') return out.toMap
      // key
      val k0 = i
      while (i < n && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_' ||
        src.charAt(i) == '$')) i += 1
      val key = src.substring(k0, i)
      skipWs()
      if (i < n && src.charAt(i) == ':') i += 1
      skipWs()
      if (i < n && src.charAt(i) == '\'') {
        i += 1
        val sb = new StringBuilder
        while (i < n && src.charAt(i) != '\'') {
          val c = src.charAt(i)
          if (c == '\\' && i + 1 < n) {
            src.charAt(i + 1) match {
              case 'n' => sb.append('\n')
              case 't' => sb.append('\t')
              case 'r' => sb.append('\r')
              case other => sb.append(other) // \' \\ \/ …
            }
            i += 2
          } else { sb.append(c); i += 1 }
        }
        i += 1 // closing quote
        if (key.nonEmpty) out(key) = sb.toString
      } else {
        // bare token value (true, 123) — read to , or }
        val v0 = i
        while (i < n && src.charAt(i) != ',' && src.charAt(i) != '}') i += 1
        if (key.nonEmpty) out(key) = src.substring(v0, i).trim
      }
    }
    out.toMap
  }
}
