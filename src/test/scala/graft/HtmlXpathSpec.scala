package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Html, Scrapers, Xpath}

/** S5 engine internals: permissive HTML parsing and the XPath subset,
  * exercised with every expression shape the reference's scrape layer
  * uses (scrape_gomus.py, quotas.py, capacities.py). */
class HtmlXpathSpec extends AnyFunSuite {

  test("parser: attributes, entities, void and raw-text elements") {
    val dom = Html.parse(
      """<!DOCTYPE html><!-- c --><html><head>
        |<script>if (a < b && c > d) { x = '<div>'; }</script>
        |<meta charset='utf-8'></head>
        |<body class="main" data-x=5 checked>
        |Caf&eacute;&amp; M&uuml;ller &#8364; &#x41;<br>tail
        |</body></html>""".stripMargin)
    val body = Xpath.elems(dom, "//body").head
    assert(body.attr("class").contains("main"))
    assert(body.attr("data-x").contains("5"))
    assert(body.attr("checked").contains(""))
    val text = body.textContent
    assert(text.contains("Café&") == false) // unknown entity passes through
    assert(text.contains("Caf&eacute;& Müller € A"))
    assert(text.contains("tail"))
    val script = Xpath.elems(dom, "//script").head
    assert(script.textContent == "if (a < b && c > d) { x = '<div>'; }")
  }

  test("parser: CDATA sections are literal text, no entity decoding") {
    val dom = Html.parse(
      "<feed><title><![CDATA[5 > 4 &amp; <tags> stay raw]]></title>" +
        "<id><![CDATA[x]]>tail</id></feed>")
    assert(Xpath.elems(dom, "//title").head.textContent ==
      "5 > 4 &amp; <tags> stay raw")
    assert(Xpath.elems(dom, "//id").head.textContent == "xtail")
  }

  test("parser: implied end tags and stray close recovery") {
    val dom = Html.parse(
      "<ul><li>one<li>two</ul><table><tr><td>a<td>b<tr><td>c</table></p>")
    assert(Xpath.elems(dom, "//li").map(_.textContent) == Vector("one", "two"))
    assert(Xpath.elems(dom, "//tr").length == 2)
    assert(Xpath.elems(dom, "//tr[1]/td").map(_.textContent) ==
      Vector("a", "b"))
  }

  test("xpath: positional and nested-path predicates") {
    val dom = Html.parse(
      """<div><p>a</p><p>b</p><p>c</p>
        |<dl><dt>Datum</dt><dd>X</dd><dt>Ort</dt><dd>Y</dd></dl>
        |<dl><dt>Nur</dt><dd>Z</dd></dl></div>""".stripMargin)
    assert(Xpath.elems(dom, "//p[2]").map(_.textContent) == Vector("b"))
    assert(Xpath.elems(dom, "//p[position()>1]").map(_.textContent) ==
      Vector("b", "c"))
    assert(Xpath.elems(dom, "//p[position() mod 2 = 1]").map(_.textContent) ==
      Vector("a", "c"))
    // reference booking xpath shape: dl filtered by a dt's normalized text
    assert(Xpath.elems(dom,
      "//dl[dt[normalize-space(text())='Datum']]//dd[1]")
      .map(_.textContent) == Vector("X"))
    assert(Xpath.elems(dom, "//dl[dt[normalize-space(text())='Nur']]/dd")
      .map(_.textContent) == Vector("Z"))
  }

  test("xpath: preceding-sibling, attribute steps, contains, union") {
    val dom = Html.parse(
      """<div class='ibox-content x'>
        |<dl><dt>Anrede:</dt><dd>Herr</dd>
        |<dt>Sprache:</dt><dd>Deutsch</dd></dl>
        |<input id="start_at" value="26.10.2020"/>
        |<span class='badge badge-primary'> 7 </span>
        |<td><a href='/admin/customers/4242'><div><i title='Ticket'></i>99</div></a></td>
        |<td>leaf</td>
        |</div>""".stripMargin)
    // reference language xpath shape
    assert(Xpath.elems(dom,
      "//dd[contains(preceding-sibling::dt[1]/text(), 'Sprache')]")
      .map(_.textContent) == Vector("Deutsch"))
    assert(Xpath.select(dom, "//input[@id=\"start_at\"]/@value")
      .map(Xpath.itemString) == Vector("26.10.2020"))
    assert(Xpath.parseInt(dom, "//*[contains(@class, \"badge-primary\")]") == 7)
    assert(Xpath.select(dom, "//a/@href").map(Xpath.itemString) ==
      Vector("/admin/customers/4242"))
    // union with attribute result (order-contains article_type shape)
    assert(Xpath.select(dom,
      "//td[1]/div/i/@title|//td[1]/a/div/i/@title|//td[1]/a/i/@title")
      .map(Xpath.itemString) == Vector("Ticket"))
    // count() predicate (order-contains td[3] guard): only the first td
    // has an element child; the positional step composes with count()
    assert(Xpath.elems(dom, "//td[count(*)>0]").length == 1)
    assert(Xpath.elems(dom, "//td[1][count(*)>0]").length == 1)
    assert(Xpath.elems(dom, "//td[2][count(*)>0]").isEmpty)
  }

  test("xpath: parse_text uniqueness guard and extract first-match") {
    val dom = Html.parse("<div><b>one</b><b>two</b></div>")
    assertThrows[IllegalArgumentException](Xpath.parseText(dom, "//b"))
    assert(Xpath.extractText(dom, "//b") == "one")
    assert(Xpath.parseText(dom, "//b[2]") == "two")
  }

  test("german dates: all reference formats") {
    import java.time.{LocalDate, LocalDateTime}
    def p(s: String, base: Option[LocalDate] = None) =
      Scrapers.parseGermanDate(s, base)
    assert(p("26.10.2020").contains(LocalDateTime.of(2020, 10, 26, 0, 0)))
    assert(p("02.10.2019 14:30").contains(LocalDateTime.of(2019, 10, 2, 14, 30)))
    assert(p("Mi., 02.10.2019").contains(LocalDateTime.of(2019, 10, 2, 0, 0)))
    assert(p("14. März 2015, 13:41 Uhr")
      .contains(LocalDateTime.of(2015, 3, 14, 13, 41)))
    assert(p(" 26. Oktober, 09:00 Uhr ", Some(LocalDate.of(2020, 10, 26)))
      .contains(LocalDateTime.of(2020, 10, 26, 9, 0)))
    assert(p("1. November, 13:00 Uhr", Some(LocalDate.of(2020, 10, 26)))
      .contains(LocalDateTime.of(2020, 11, 1, 13, 0)))
    assert(p("1.1.1900").contains(LocalDateTime.of(1900, 1, 1, 0, 0)))
    assert(p("2020-10-26 13:41").contains(LocalDateTime.of(2020, 10, 26, 13, 41)))
    assert(p("kein datum").isEmpty)
  }

  test("popover literal extraction and parsing") {
    val src =
      """<td><script>
        |  $("#info-1603699200").popover({
        |    placement : 'right',
        |    title : '<strong>26. Oktober, 09:00 Uhr</strong>',
        |    html: 'true',
        |    content : '<table>\n<tbody>\n<tr><td>maximal:<\/td><td>75<\/td><\/tr>\n<\/tbody><\/table>'
        |  });
        |</script></td>""".stripMargin
    val lits = Scrapers.popoverLiterals(src)
    assert(lits.length == 1)
    val obj = Scrapers.parseJsObject(lits.head)
    assert(obj("placement") == "right")
    assert(obj("title") == "<strong>26. Oktober, 09:00 Uhr</strong>")
    assert(obj("content").contains("<td>75</td>")) // \/ unescaped
    assert(Scrapers.parsePrice("1,50 €") == 1.5)
    assert(Scrapers.parsePrice("18") == 18.0)
  }

  test("berlin epoch decode matches the reference fixture hovercards") {
    assert(Scrapers.fromTimestamp(1603699200L).toString == "2020-10-26T09:00")
  }
}
