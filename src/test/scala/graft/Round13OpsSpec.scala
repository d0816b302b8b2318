package graft

import org.apache.spark.sql.functions._

import graft.queries.TextQueries
import graft.sources.Html

/** Round-13 operators: the real-markup boilerplate path (own-parser DOM
  * leaf blocks feeding the shared jusText classifier) pinned against a
  * REFERENCE fixture page, and the domain-level curation stage.
  */
class Round13OpsSpec extends SparkSpec {

  test("leafBlocks + blockVerdict classify a reference gomus page: " +
      "script text excluded, nav link-dense, detail cells kept") {
    import spark.implicits._
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "/root/reference/tests/test_data/gomus/quotas/quotas_1.html")),
      "UTF-8")
    val blocks = Html.leafBlocks(Html.parse(src))
    assert(blocks.nonEmpty)
    // raw-text exclusion: the page head carries a large rollbar JS blob;
    // none of it may surface as block text
    assert(!blocks.exists(_._1.contains("_rollbarConfig")),
      "script text leaked into a block")
    val classified = blocks.zipWithIndex
      .map { case ((btext, ll), i) => (i, btext, ll) }
      .toDF("bidx", "btext", "link_len")
      .withColumn("v", TextQueries.blockVerdict(col("btext"), col("link_len")))
      .collect()
      .map(r => (r.getAs[String]("btext"), r.getAs[Int]("link_len"),
        r.getAs[String]("v")))
    // golden pins over the real page (311 leaf blocks): the sidebar /
    // navbar menus are link-dense, the quota detail cells are short
    // fragments, and the German date lines land lowstop (the stopword
    // list is English by design — a German page has no content blocks
    // under it, which is exactly what a language-gated curation run
    // wants to see upstream of langid routing)
    assert(classified.length == 311, s"got ${classified.length} blocks")
    val byV = classified.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byV == Map("link" -> 142, "short" -> 160, "lowstop" -> 9), byV)
    // individual pins: a nav item with its true anchor-text length, a
    // detail heading, and a date line
    assert(classified.contains(("Kontingent bearbeiten", 23, "link")))
    assert(classified.contains(("Tausendfüßler-Kontingent", 0, "short")))
    assert(classified.contains(
      ("14. März 2015, 13:41 Uhr", 0, "lowstop")))
    // link-text attribution comes from DOM <a> descendants, not regex:
    // the breadcrumb "Kontingente" anchor carries trailing markup the
    // tag-strip regex form would miscount
    assert(classified.contains(("Kontingente", 13, "link")))
  }
}
