package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Registrable-domain extraction with a public-suffix table (r13 verdict
  * item 8): `example.co.uk` must yield `example.co.uk`, not `co.uk` —
  * the naive last-two-labels slice is wrong for every multi-label public
  * suffix, and a real crawl hits those on day one.
  *
  * The rule is the Public Suffix List algorithm (publicsuffix.org):
  * find the LONGEST suffix of the host that is a public suffix, then
  * registrable domain = that suffix plus one more label. The table here
  * is a FIXTURE slice of the PSL (the common ccTLD second-level
  * registries); a production deployment swaps in the full list — the
  * expression shape is unchanged, because `isin` over a >10-element
  * literal list compiles to Catalyst `InSet` (O(1) hash-set probe per
  * row, codegen'd), which holds at the full PSL's ~9k entries. Map-only:
  * evaluates inside the scan, no join, no shuffle.
  *
  * Fixture scope: suffixes up to two labels (the full PSL has a few
  * three-label entries and wildcard/exception rules; the longest-match
  * loop extends mechanically). Both faces — this Column and
  * [[registrableSql]]'s DuckDB twin — apply the identical rule so the
  * oracle gate checks the extraction end-to-end.
  */
object Domains {

  /** Fixture slice of the public-suffix list: multi-label suffixes only
    * (single-label TLDs need no table — the default branch already
    * keeps two labels). */
  val multiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "ltd.uk", "plc.uk",
    "com.au", "net.au", "org.au", "edu.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.br", "net.br", "org.br",
    "co.in", "co.nz", "co.za", "co.kr", "com.mx", "com.cn", "com.tw",
    "com.sg", "com.ar")

  /** Registrable domain of a host: suffix-match against the PSL fixture,
    * longest suffix + one label. Hosts with fewer labels than the match
    * needs fall back to the whole host. */
  def registrable(host: Column): Column = {
    val labels = split(host, "\\.")
    val last2 = array_join(slice(labels, -2, 2), ".")
    val last3 = array_join(slice(labels, -3, 3), ".")
    when(size(labels) >= lit(3) && last2.isin(multiLabelSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** DuckDB twin of [[registrable]] — interpolate into oracle SQL with
    * the host EXPRESSION (not a value). Kept here so the two faces can
    * only drift in one file. */
  def registrableSql(hostExpr: String): String = {
    val inList = multiLabelSuffixes.map(s => s"'$s'").mkString(", ")
    s"""CASE WHEN len(string_split($hostExpr, '.')) >= 3 AND
       |  array_to_string(string_split($hostExpr, '.')[-2:], '.')
       |    IN ($inList)
       |THEN array_to_string(string_split($hostExpr, '.')[-3:], '.')
       |ELSE array_to_string(string_split($hostExpr, '.')[-2:], '.')
       |END""".stripMargin
  }
}
