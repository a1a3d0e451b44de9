package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class HtmlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def text(html: String): String =
    Seq(html).toDF("h").select(Html.extractText(col("h"))).head.getString(0)
  private def title(html: String): String =
    Seq(html).toDF("h").select(Html.extractTitle(col("h"))).head.getString(0)
  private def links(html: String): Seq[String] =
    Seq(html).toDF("h").select(Html.extractLinks(col("h")))
      .head.getSeq[String](0)

  test("extractText: full document — head/script/style/comments drop, blocks break") {
    val html =
      """<!DOCTYPE html>
        |<html>
        |<head><title>The Title</title><style>body { color: red; }</style>
        |<meta charset="utf-8"></head>
        |<body>
        |<!-- nav comes from a template -->
        |<script type="text/javascript">if (a < b && c > 2) { go("x"); }</script>
        |<h1>Heading</h1>
        |<p>First para with <b>bold</b> and <i>italics</i>.</p>
        |<p>Second&nbsp;para &amp; entities: 3 &lt; 5 &gt; 1, &quot;q&#39;s&quot;.</p>
        |<ul><li>one</li><li>two</li></ul>
        |<noscript>enable js</noscript>
        |</body></html>""".stripMargin
    assert(text(html) ==
      """Heading
        |First para with bold and italics.
        |Second para & entities: 3 < 5 > 1, "q's".
        |one
        |two""".stripMargin)
  }

  test("extractText: inline tags unwrap without inserting spaces") {
    assert(text("<body>bo<b>ld</b> and <span class=\"x\">span</span>ish</body>") ==
      "bold and spanish")
  }

  test("extractText: whitespace canonicalization — CR/TAB/NBSP, runs, blank lines") {
    val html = "<div>a\t\tb\r\n c d</div><div></div><div></div><div>e</div>"
    // tags → line boundaries; empty divs leave newline runs that collapse;
    // the \r\n INSIDE the first div is source formatting → a space (the
    // HTML whitespace rule), not a paragraph boundary
    assert(text(html) == "a b c d\ne")
  }

  test("extractText: mid-block source newlines fold to spaces (HTML whitespace rule)") {
    // line-wrapped markup is ONE paragraph — paragraph boundaries come
    // from block tags, never from source formatting
    assert(text("<p>foo\nbar</p>") == "foo bar")
    assert(text("<body>plain\nwrapped\ntext</body>") == "plain wrapped text")
    assert(text("<p>a\nb</p>\n<p>c</p>") == "a b\nc")
  }

  test("extractText: <pre> content is NOT whitespace-preserved (contract edge)") {
    // region-scoped preservation needs lookaround/per-match callbacks —
    // outside the Java∩RE2 oracle subset; for curation a code block
    // reading as one paragraph is the documented trade. This pin FAILS
    // the day the contract changes, forcing the oracle to move with it.
    assert(text("<pre>def f():\n  return 1</pre>") == "def f(): return 1")
  }

  test("extractText: double-escaped entities decode one level like a browser") {
    assert(text("<p>use &amp;lt; to write &lt;</p>") == "use &lt; to write <")
  }

  test("extractText: case-insensitive tags, attributes with > inside quotes are out of contract") {
    assert(text("<P CLASS='big'>Hi</P><BR>there") == "Hi\nthere")
  }

  test("extractText: unclosed script leaks as text (truncated-crawl contract)") {
    val t = text("<p>keep</p><script>var x = 1;")
    assert(t.contains("keep") && t.contains("var x = 1;"))
  }

  test("extractText: whitespace before '>' in a close tag still closes the container") {
    assert(text("<p>keep</p><script>track(\"x\");</script >more") == "keep\nmore")
    assert(title("<title>T</title\n>") == "T")
  }

  test("extractText: null in, null out; markup-free text passes through") {
    val df = Seq[(Integer, String)]((1, null), (2, "plain  text"))
      .toDF("id", "h").select(Html.extractText(col("h")).as("t"))
    val rows = df.collect().map(r => Option(r.getString(0)))
    assert(rows.toSeq == Seq(None, Some("plain text")))
  }

  test("extractTitle: entity-decoded, collapsed; empty when absent") {
    assert(title("<head><title>  A &amp;\n B </title></head>") == "A & B")
    assert(title("<TITLE lang='en'>Upper</TITLE>") == "Upper")
    assert(title("<body>no title</body>") == "")
  }

  test("extractLinks: both quote styles, document order, composes with urlNormalize") {
    val html =
      """<a href="HTTP://Example.com:80/p?utm_source=x&page=2#f">one</a>
        |<a class='m' HREF='https://news.site.org/a/'>two</a>
        |<a name="anchor-no-href">three</a>""".stripMargin
    assert(links(html) ==
      Seq("HTTP://Example.com:80/p?utm_source=x&page=2#f", "https://news.site.org/a/"))
    val normed = Seq(html).toDF("h")
      .select(explode(Html.extractLinks(col("h"))).as("u"))
      .select(Web.urlNormalize(col("u")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(normed == Seq("http://example.com/p?page=2", "https://news.site.org/a"))
  }

  test("extractCanonical: both attribute orders, '' when absent") {
    def canon(h: String): String =
      Seq(h).toDF("h").select(Html.extractCanonical(col("h"))).head.getString(0)
    assert(canon("""<link rel="canonical" href="https://ex.com/a">""") == "https://ex.com/a")
    assert(canon("""<LINK href='https://ex.com/b' rel='canonical'>""") == "https://ex.com/b")
    assert(canon("""<link rel="stylesheet" href="https://ex.com/c.css">""") == "")
    assert(canon("no links here") == "")
  }

  test("extractLang: lowercased html lang attribute, '' when absent") {
    def lang(h: String): String =
      Seq(h).toDF("h").select(Html.extractLang(col("h"))).head.getString(0)
    assert(lang("""<html lang="en-US"><body>x</body></html>""") == "en-us")
    assert(lang("""<HTML LANG='pt-br'>""") == "pt-br")
    assert(lang("<html><body>x</body></html>") == "")
  }

  test("extractMeta: both orders, entity decode, name validation") {
    def meta(h: String, n: String = "description"): String =
      Seq(h).toDF("h").select(Html.extractMeta(col("h"), n)).head.getString(0)
    assert(meta("""<meta name="description" content="A &amp; B">""") == "A & B")
    assert(meta("""<meta content='C' name='description'>""") == "C")
    assert(meta("""<meta name="keywords" content="k1,k2">""") == "")
    assert(meta("""<meta name="keywords" content="k1,k2">""", "keywords") == "k1,k2")
    intercept[IllegalArgumentException] {
      meta("<meta>", "desc.*ption") // regex metachars are not a meta name
    }
  }

  test("extractCharset: html5 (quoted/unquoted), legacy content-type, absent") {
    def cs(h: String): String =
      Seq(h).toDF("h").select(Html.extractCharset(col("h"))).head.getString(0)
    assert(cs("""<meta charset="UTF-8">""") == "utf-8")
    assert(cs("""<META CHARSET='Shift_JIS'>""") == "shift_jis")
    assert(cs("<meta charset=windows-1251>") == "windows-1251")
    assert(cs("""<meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-1">""")
      == "iso-8859-1")
    assert(cs("""<META content='text/html; charset=KOI8-R' http-equiv='content-type'>""")
      == "koi8-r") // legacy form, reversed attribute order
    // fully UNQUOTED legacy markup — exactly the old-encoding cohort shape
    assert(cs("<meta http-equiv=Content-Type content=text/html;charset=Shift_JIS>")
      == "shift_jis")
    assert(cs("<meta content=text/html;charset=KOI8-R http-equiv=Content-Type>")
      == "koi8-r")
    // unquoted fallback still demands a real Content-Type meta
    assert(cs("""<meta http-equiv="refresh" content="0;url=/x">""") == "")
    assert(cs("<html><head><title>x</title></head></html>") == "")
    // decoy 'charset=' inside an unrelated attribute VALUE must not win
    assert(cs("""<meta property="og:url" content="https://x.com/?charset=koi8-r">""" +
      """<meta charset="utf-8">""") == "utf-8")
    assert(cs("""<meta name="d" content="how to set charset=utf-16 in html">""") == "")
  }

  test("extractSitemapLocs: loc URLs in order, entity-decoded, whitespace-trimmed") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>https://ex.com/a?x=1&amp;y=2</loc><lastmod>2024-01-01</lastmod></url>
        |  <url><loc>
        |    https://ex.com/b
        |  </loc></url>
        |</urlset>""".stripMargin
    val locs = Seq(xml).toDF("x")
      .select(Html.extractSitemapLocs(col("x"))).head.getSeq[String](0)
    assert(locs == Seq("https://ex.com/a?x=1&y=2", "https://ex.com/b"))
    // sitemap INDEX files use the same <loc> shape
    val idx = "<sitemapindex><sitemap><loc>https://ex.com/s1.xml</loc></sitemap></sitemapindex>"
    assert(Seq(idx).toDF("x").select(Html.extractSitemapLocs(col("x")))
      .head.getSeq[String](0) == Seq("https://ex.com/s1.xml"))
  }

  test("extractAnchors: (href, anchor) pairs with extractText's inline cleaning") {
    val html =
      """<a href="https://a.com/x">  be<b>ta</b>&nbsp;&amp; <i>more</i>
        | 7 </a><p>not an anchor</p>
        |<a class='m' href='/rel'>plain</a>
        |<a name="no-href">skipped</a>
        |<a href="#f"><img src="i.png"></a>""".stripMargin
    val got = Seq(html).toDF("h")
      .select(explode(Html.extractAnchors(col("h"))).as("a"))
      .select(col("a.href"), col("a.anchor"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(
      // nested inline tags unwrap mid-word, entities decode, whitespace
      // runs (incl. the newline and NBSP) collapse, ends trim
      ("https://a.com/x", "beta & more 7"),
      ("/rel", "plain"),
      // image-only anchor → empty text (the href still counts as a link)
      ("#f", "")))
    // null in → null out, no-anchor page → empty array
    val edge = Seq[(java.lang.Integer, String)]((1, "<p>no links</p>"), (2, null))
      .toDF("id", "h").select(col("id"), Html.extractAnchors(col("h")).as("a"))
      .orderBy("id").collect()
    assert(edge(0).getSeq[Any](1).isEmpty)
    assert(edge(1).isNullAt(1))
  }

  test("extractAnchors: a dangling <a> cannot swallow its successors") {
    // the first anchor never closes — its successors must still appear in
    // the anchor table (the tempered inner group stops at the next <a>),
    // and the dangling href stays link-graph-visible via extractLinks
    val html = """<a href="/dangling">oops <a href="/x">ex</a> <a href="/y">why</a>"""
    val df = Seq(html).toDF("h")
    val anchors = df.select(explode(Html.extractAnchors(col("h"))).as("a"))
      .select(col("a.href"), col("a.anchor"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(anchors == Seq(("/x", "ex"), ("/y", "why")))
    val links = df.select(Html.extractLinks(col("h"))).head.getSeq[String](0)
    assert(links == Seq("/dangling", "/x", "/y"))
    // <abbr> is NOT an anchor boundary: the tempered dot's \b keeps
    // tag names that merely START with 'a' inside the anchor text
    val abbr = Seq("""<a href="/z"><abbr>lol</abbr> ok</a>""").toDF("h")
      .select(explode(Html.extractAnchors(col("h"))).as("a"))
      .select(col("a.href"), col("a.anchor")).head
    assert((abbr.getString(0), abbr.getString(1)) == ("/z", "lol ok"))
  }

  test("extraction stays whole-stage codegen (no UDF in the plan)") {
    // spark.range, not a local Seq: ConvertToLocalRelation would fold a
    // literal-backed LocalTableScan and leave no codegen node to assert on
    val df = spark.range(4)
      .select(concat(lit("<p>x"), col("id"), lit("</p>")).as("h"))
      .select(Html.extractText(col("h")), Html.extractTitle(col("h")),
        Html.extractLinks(col("h")))
    // "*(1) Project" = the projection lives inside whole-stage-codegen
    // stage 1 (the simpleString star notation); no UDF/eval node anywhere
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"))
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("udf"))
  }
}
