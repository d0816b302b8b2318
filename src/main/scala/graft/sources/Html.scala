package graft.sources

import scala.collection.mutable

/** Permissive HTML parser (SURVEY §2.1 S5; reference
  * src/gomus/_utils/scrape_gomus.py:24-56 parses gomus admin pages with
  * `lxml.html.fromstring`). Pure JDK — no external parser dependency.
  *
  * Scope: enough HTML5-style error recovery for machine-generated admin
  * pages and hovercard fragments — NOT a full spec parser. Covered:
  * doctype/comments, raw-text elements (script/style keep their text
  * verbatim, including `<` and quotes), void elements, all four attribute
  * forms (bare, unquoted, single-, double-quoted), named + numeric
  * character references, case-insensitive tag/attribute names
  * (lowercased, lxml-parity), implied end tags for li/td/th/tr/p/dt/dd/
  * option, and stray end-tag recovery (pop to nearest matching open tag,
  * else ignore).
  *
  * The node model is parent-linked so the XPath evaluator ([[Xpath]]) can
  * walk sibling/parent axes. Parsing is driver- or executor-side pure
  * computation over one page's bytes; the distributed entry points in
  * [[graft.bronze.Scrape]] parse one page per `binaryFile` row.
  */
object Html {

  sealed trait HNode {
    var parent: HElem = _
  }

  final class HText(val text: String) extends HNode

  final class HElem(val tag: String) extends HNode {
    val attrs: mutable.LinkedHashMap[String, String] = mutable.LinkedHashMap.empty
    val children: mutable.ArrayBuffer[HNode] = mutable.ArrayBuffer.empty

    def attr(name: String): Option[String] = attrs.get(name)

    def childElems: Seq[HElem] =
      children.collect { case e: HElem => e }.toSeq

    /** All descendant elements, document order. */
    def descendants: Seq[HElem] = {
      val out = mutable.ArrayBuffer.empty[HElem]
      def walk(e: HElem): Unit = e.children.foreach {
        case c: HElem => out += c; walk(c)
        case _ =>
      }
      walk(this)
      out.toSeq
    }

    /** Concatenated descendant text (lxml `tostring(method='text')` /
      * `text_content()` semantics: raw text nodes joined with no
      * separator). */
    def textContent: String = {
      val sb = new StringBuilder
      def walk(n: HNode): Unit = n match {
        case t: HText => sb.append(t.text)
        case e: HElem => e.children.foreach(walk)
      }
      walk(this)
      sb.toString
    }
  }

  private val voidTags = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr")

  private val rawTextTags = Set("script", "style")

  /** When tag X starts, open elements with tags in impliedClose(X) are
    * popped first (transitively — `<tr>` after an open `td` closes the
    * td AND its tr). Minimal HTML5-style recovery: `<li>a<li>b` becomes
    * siblings, bare table rows/cells close each other; a new block never
    * closes anything but an open `p`. */
  private val impliedClose: Map[String, Set[String]] = {
    val closesP = Set("p")
    Map(
      "li" -> Set("li"),
      "td" -> Set("td", "th"),
      "th" -> Set("td", "th"),
      "tr" -> Set("td", "th", "tr"),
      "dt" -> Set("dt", "dd"),
      "dd" -> Set("dt", "dd"),
      "option" -> Set("option"),
      "p" -> closesP, "div" -> closesP, "table" -> closesP,
      "ul" -> closesP, "ol" -> closesP, "dl" -> closesP,
      "h1" -> closesP, "h2" -> closesP, "h3" -> closesP,
      "h4" -> closesP, "h5" -> closesP, "h6" -> closesP,
      "blockquote" -> closesP, "pre" -> closesP, "form" -> closesP)
  }

  private val namedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "auml" -> "ä", "ouml" -> "ö",
    "uuml" -> "ü", "Auml" -> "Ä", "Ouml" -> "Ö", "Uuml" -> "Ü",
    "szlig" -> "ß", "euro" -> "€", "copy" -> "©", "mdash" -> "—",
    "ndash" -> "–", "hellip" -> "…", "raquo" -> "»", "laquo" -> "«")

  /** Decode character references; unknown/malformed ones pass through
    * verbatim (browser-like leniency). */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (body.startsWith("#x") || body.startsWith("#X"))
              try Some(new String(Character.toChars(
                Integer.parseInt(body.substring(2), 16))))
              catch { case _: Exception => None }
            else if (body.startsWith("#"))
              try Some(new String(Character.toChars(
                Integer.parseInt(body.substring(1)))))
              catch { case _: Exception => None }
            else namedEntities.get(body)
          decoded match {
            case Some(d) => sb.append(d); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private val blockTags = Set(
    "p", "div", "footer", "header", "nav", "section", "article", "aside",
    "main", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th", "dt",
    "dd", "blockquote", "pre", "caption", "form", "table", "tbody",
    "thead", "tr", "ul", "ol", "dl")

  /** Descendant text with script/style subtrees excluded — the "visible
    * text" a boilerplate classifier should score (raw-text JS/CSS would
    * drown the stop-word signal). */
  def visibleText(root: HElem): String = {
    val sb = new StringBuilder
    def walk(n: HNode): Unit = n match {
      case t: HText => sb.append(t.text)
      case e: HElem if rawTextTags.contains(e.tag) => ()
      case e: HElem => e.children.foreach(walk)
    }
    root.children.foreach(walk)
    sb.toString
  }

  /** The jusText block model over a parsed page: every LEAF block
    * element — a block-level element with no block-level descendant —
    * in document order, as (whitespace-normalized visible text,
    * link-text chars summed over descendant `<a>` elements). This is
    * the real-markup feed for the boilerplate classifier
    * ([[graft.queries.TextQueries]] `text_boilerplate_html`); the
    * expression-only catalog twin (`text_boilerplate_strip`) computes
    * the same two signals by tag-strip regex on one minted
    * block-per-line page. */
  def leafBlocks(root: HElem): Seq[(String, Int)] = {
    def hasBlockDesc(e: HElem): Boolean =
      e.descendants.exists(d => blockTags.contains(d.tag))
    root.descendants
      .filter(e => blockTags.contains(e.tag) && !hasBlockDesc(e))
      .map { e =>
        val btext = visibleText(e).replaceAll("\\s+", " ").trim
        val linkLen = e.descendants.filter(_.tag == "a")
          .map(a => visibleText(a).length).sum
        (btext, linkLen)
      }
  }

  /** Parse a full document or fragment. Returns a synthetic root element
    * (tag "#document") holding all top-level nodes; XPath absolute paths
    * evaluate from here. */
  def parse(src: String): HElem = {
    val root = new HElem("#document")
    val stack = mutable.ArrayBuffer[HElem](root)
    def top = stack.last
    def append(n: HNode): Unit = { n.parent = top; top.children += n }

    val n = src.length
    var i = 0
    val text = new StringBuilder

    def flushText(): Unit =
      if (text.nonEmpty) {
        append(new HText(decodeEntities(text.toString)))
        text.setLength(0)
      }

    while (i < n) {
      val c = src.charAt(i)
      if (c != '<') { text.append(c); i += 1 }
      else if (src.startsWith("<!--", i)) {
        flushText()
        val end = src.indexOf("-->", i + 4)
        i = if (end < 0) n else end + 3
      } else if (src.startsWith("<![CDATA[", i)) {
        // XML CDATA (RSS feeds): literal text, no entity decoding
        flushText()
        val end = src.indexOf("]]>", i + 9)
        val raw = if (end < 0) src.substring(i + 9)
          else src.substring(i + 9, end)
        if (raw.nonEmpty) append(new HText(raw))
        i = if (end < 0) n else end + 3
      } else if (src.startsWith("<!", i) || src.startsWith("<?", i)) {
        // doctype / processing instruction: skip to '>'
        flushText()
        val end = src.indexOf('>', i)
        i = if (end < 0) n else end + 1
      } else if (src.startsWith("</", i)) {
        flushText()
        val end = src.indexOf('>', i)
        val name = (if (end < 0) src.substring(i + 2)
          else src.substring(i + 2, end)).trim.toLowerCase
        // pop to the nearest matching open tag; ignore stray end tags
        val at = stack.lastIndexWhere(_.tag == name)
        if (at > 0) stack.remove(at, stack.length - at)
        i = if (end < 0) n else end + 1
      } else if (i + 1 < n &&
        (src.charAt(i + 1).isLetter || src.charAt(i + 1) == '_')) {
        flushText()
        // start tag
        var j = i + 1
        while (j < n && (src.charAt(j).isLetterOrDigit ||
          src.charAt(j) == '-' || src.charAt(j) == '_' ||
          src.charAt(j) == ':')) j += 1
        val tag = src.substring(i + 1, j).toLowerCase
        val elem = new HElem(tag)
        // attributes
        var selfClose = false
        var done = false
        while (!done && j < n) {
          while (j < n && src.charAt(j).isWhitespace) j += 1
          if (j < n && src.charAt(j) == '>') { j += 1; done = true }
          else if (j < n && src.startsWith("/>", j)) {
            j += 2; done = true; selfClose = true
          } else if (j < n && src.charAt(j) == '/') j += 1
          else if (j >= n) done = true
          else {
            val a0 = j
            while (j < n && !src.charAt(j).isWhitespace &&
              src.charAt(j) != '=' && src.charAt(j) != '>' &&
              src.charAt(j) != '/') j += 1
            val aname = src.substring(a0, j).toLowerCase
            while (j < n && src.charAt(j).isWhitespace) j += 1
            var avalue = ""
            if (j < n && src.charAt(j) == '=') {
              j += 1
              while (j < n && src.charAt(j).isWhitespace) j += 1
              if (j < n && (src.charAt(j) == '"' || src.charAt(j) == '\'')) {
                val q = src.charAt(j)
                val vEnd = src.indexOf(q, j + 1)
                avalue = if (vEnd < 0) src.substring(j + 1)
                  else src.substring(j + 1, vEnd)
                j = if (vEnd < 0) n else vEnd + 1
              } else {
                val v0 = j
                while (j < n && !src.charAt(j).isWhitespace &&
                  src.charAt(j) != '>') j += 1
                avalue = src.substring(v0, j)
              }
            }
            if (aname.nonEmpty && !elem.attrs.contains(aname))
              elem.attrs(aname) = decodeEntities(avalue)
          }
        }
        // implied end tags
        impliedClose.get(tag).foreach { closers =>
          while (stack.length > 1 && closers.contains(top.tag))
            stack.remove(stack.length - 1)
        }
        append(elem)
        if (!selfClose && !voidTags.contains(tag)) {
          if (rawTextTags.contains(tag)) {
            // raw text: everything until the matching close tag, verbatim
            val closeRe = ("(?i)</" + tag + "\\s*>").r
            closeRe.findFirstMatchIn(src.substring(j)) match {
              case Some(m) =>
                val raw = src.substring(j, j + m.start)
                if (raw.nonEmpty) {
                  val t = new HText(raw) // NO entity decode in raw text
                  t.parent = elem
                  elem.children += t
                }
                j += m.end
              case None =>
                val t = new HText(src.substring(j))
                t.parent = elem
                elem.children += t
                j = n
            }
          } else stack += elem
        }
        i = j
      } else { text.append(c); i += 1 } // lone '<'
    }
    flushText()
    root
  }
}
