package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** End-to-end drive of [[Curation.crawlIngest]] — each stage of the
  * recipe must bite on a fixture built to trigger exactly it:
  * canonical-declared aliases, tracking-param URL aliases, shared footer
  * boilerplate, a junk page under the quality floor, and one domain over
  * its quota. */
class CrawlIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def page(id: Long, url: String, content: String,
                   canonical: String = ""): (Long, String, String) = {
    val canonTag =
      if (canonical.isEmpty) ""
      else s"""<link rel="canonical" href="$canonical">"""
    (id, url,
      s"""<html lang="en"><head><title>Page $id</title>$canonTag</head>
         |<body><p>$content</p><div>FOOTER NAV ABOUT</div></body></html>""".stripMargin)
  }

  // distinct letter-only content; length controls qualityScore (= len/500
  // for punct- and digit-free text), so site-c ranking is deterministic
  private def words(tag: String, n: Int): String =
    (1 to n).map(i => s"$tag$i word").mkString(" ")

  private lazy val pages = Seq(
    // canonical alias pair: both declare the same canonical → keep id 1
    page(1, "https://site-a.com/art?ref=x", words("alpha", 20),
      canonical = "https://site-a.com/art"),
    page(2, "https://site-a.com/art2", words("beta", 20),
      canonical = "https://site-a.com/art"),
    // tracking-param alias pair: urlNormalize collapses them → keep id 3
    page(3, "http://B.com/x?utm_source=feed", words("gamma", 20)),
    page(4, "http://b.com/x", words("delta", 20)),
    // junk page below the quality floor (digits + punctuation)
    page(5, "https://junk.org/p", "12 345!! 678?? 90."),
    // a normal page on its own domain
    page(6, "https://solo.net/page", words("epsilon", 20)),
    // 5 pages on one domain, quota cap 3 — quality ∝ content length
    page(10, "https://site-c.com/p10", words("cten", 10)),
    page(11, "https://site-c.com/p11", words("celeven", 14)),
    page(12, "https://site-c.com/p12", words("ctwelve", 18)),
    page(13, "https://site-c.com/p13", words("cthirteen", 22)),
    page(14, "https://site-c.com/p14", words("cfourteen", 26))
  ).toDF("doc_id", "url", "html")

  private lazy val out = Curation.crawlIngest(pages,
    domainCap = 3, minQuality = 0.05).orderBy("doc_id")

  test("every stage bites: canonical dedup, URL dedup, quality floor, domain quota") {
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    // 2 lost to canonical alias, 4 to URL alias, 5 to quality, 10/11 to
    // quota (lowest-quality of the 5 site-c pages)
    assert(ids == Set(1L, 3L, 6L, 12L, 13L, 14L))
    val ranks = out.filter(col("domain") === "site-c.com")
      .select("doc_id", "domain_rank").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // best-quality-first within the domain: longest content ranks first
    assert(ranks == Map(14L -> 1, 13L -> 2, 12L -> 3))
  }

  test("boilerplate footer survives in exactly one kept page; metadata rides along") {
    val rows = out.select("doc_id", "text", "title", "lang_decl", "domain").collect()
    val withFooter = rows.filter(_.getString(1).contains("FOOTER NAV ABOUT"))
    assert(withFooter.length == 1 && withFooter.head.getLong(0) == 1L)
    assert(rows.forall(r => r.getString(2) == s"Page ${r.getLong(0)}"))
    assert(rows.forall(_.getString(3) == "en"))
    assert(rows.map(_.getString(4)).toSet ==
      Set("site-a.com", "b.com", "solo.net", "site-c.com"))
  }

  test("url_key is canonical-first, normalized-url fallback") {
    val keys = out.select("doc_id", "url_key").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keys(1L) == "https://site-a.com/art") // the declared canonical
    assert(keys(3L) == "http://b.com/x") // normalized crawl URL (param dropped)
  }
}
