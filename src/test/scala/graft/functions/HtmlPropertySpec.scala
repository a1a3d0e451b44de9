package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Seeded randomized-markup properties for [[Html]] — the extraction is a
  * regex chain, and regex chains die by edge case, so 300 generated pages
  * (random segment mix of containers, comments, block/inline tags,
  * entities, messy whitespace, links) pin the invariants the operators
  * are trusted for downstream:
  *
  *  - container bodies (script/style) and comment bodies NEVER reach the
  *    extracted text (sentinel tokens);
  *  - every visible word survives, in document order (fixed-width unique
  *    word tokens → substring scan cannot alias);
  *  - whitespace is canonical (no runs, no blank lines, trimmed ends);
  *  - link count is exact;
  *  - for pages without angle-bracket entities: no `<`/`>` survives at
  *    all, and extraction is IDEMPOTENT (re-extracting the output wrapped
  *    in `<p>` is a fixpoint) — the property that makes re-processing an
  *    already-extracted corpus safe.
  *
  * One DataFrame pass evaluates all trials (the operators under test run
  * in codegen, not a per-trial driver loop).
  */
class HtmlPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private case class Gen(html: String, words: Vector[String], nLinks: Int,
                         angleEntities: Boolean)

  private def genDoc(rnd: scala.util.Random): Gen = {
    val sb = new StringBuilder
    val words = Vector.newBuilder[String]
    var links = 0
    var angle = false
    var counter = 0
    def visible(n: Int): String = (1 to n).map { _ =>
      counter += 1
      val w = f"w$counter%03dx" // fixed width + unique → no substring aliasing
      words += w; w
    }.mkString(" ")
    sb ++= "<html><body>"
    val segs = 3 + rnd.nextInt(8)
    for (_ <- 1 to segs) rnd.nextInt(10) match {
      case 0 => sb ++= "<script type='t'>var x = 1 < 2 && \"q\"; SCRIPTBODY</script>"
      case 1 => sb ++= "<style>.c { color: red; } STYLEBODY</style>"
      case 2 => sb ++= s"<!-- COMMENTBODY ${rnd.nextInt(100)} -->"
      case 3 => sb ++= s"<p class='x'> ${visible(1 + rnd.nextInt(5))} </p>"
      case 4 => sb ++= s"<div>${visible(2)}<br>${visible(2)}</div>"
      case 5 => // inline wraps, space-padded so words can't fuse
        sb ++= s" ${visible(1)} <b>${visible(1)}</b> <i> ${visible(2)} </i> "
      case 6 => // non-angle entities
        sb ++= s"<p>${visible(1)} &quot;${visible(1)}&quot; &nbsp; &#39;ok&#39;</p>"
      case 7 => // angle entities: output legitimately contains < > &
        angle = true
        sb ++= s"<p>${visible(1)} &lt;tag&gt; &amp; ${visible(1)}</p>"
      case 8 =>
        links += 1
        sb ++= s"<a href='https://l${rnd.nextInt(50)}.example.org/p?a=${rnd.nextInt(9)}'>${visible(1)}</a> "
      case 9 => // messy whitespace inside a block
        sb ++= s"<p>${visible(1)}\t\t ${visible(1)} \r\n ${visible(1)}</p>"
    }
    sb ++= "</body></html>"
    Gen(sb.toString, words.result(), links, angle)
  }

  test("300 seeded random pages: containment, order, whitespace, links, idempotence") {
    val rnd = new scala.util.Random(4242)
    val gens = Vector.fill(300)(genDoc(rnd))
    val rows = gens.zipWithIndex.map { case (g, i) => (i, g.html) }
      .toDF("i", "h")
      .select(col("i"), Html.extractText(col("h")).as("t"),
        size(Html.extractLinks(col("h"))).as("n"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
      .sortBy(_._1)
    // second pass: re-extract the non-angle outputs with each LINE in its
    // own <p> — the fixpoint property that makes re-processing extracted
    // text safe. One <p> per line, not one around the whole text: source
    // newlines are whitespace per the HTML rule, so a single wrapper would
    // (correctly) merge the blocks the first pass separated
    val fix = rows.collect { case (i, t, _) if !gens(i).angleEntities => (i, t) }
    val fixed = fix.map { case (i, t) =>
      (i, t.split('\n').mkString("<p>", "</p><p>", "</p>")) }.toSeq.toDF("i", "h")
      .select(col("i"), Html.extractText(col("h")).as("t2"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toMap
    for ((i, out, nLinks) <- rows) {
      val g = gens(i)
      assert(!out.contains("SCRIPTBODY") && !out.contains("STYLEBODY") &&
        !out.contains("COMMENTBODY"), s"trial $i leaked a container/comment body:\n$out")
      assert(!out.contains("  ") && !out.contains("\n\n") && !out.contains("\t") &&
        !out.contains("\r") && out == out.trim,
        s"trial $i whitespace not canonical:\n${out.replace("\n", "\\n")}")
      var pos = 0
      for (w <- g.words) {
        val at = out.indexOf(w, pos)
        assert(at >= 0, s"trial $i lost or reordered word $w:\n$out")
        pos = at + w.length
      }
      assert(nLinks == g.nLinks, s"trial $i: ${g.nLinks} links generated, $nLinks extracted")
      if (!g.angleEntities) {
        assert(!out.contains("<") && !out.contains(">"),
          s"trial $i has stray angle brackets:\n$out")
        assert(fixed(i) == out, s"trial $i not a fixpoint:\n$out\nvs\n${fixed(i)}")
      }
    }
  }
}
