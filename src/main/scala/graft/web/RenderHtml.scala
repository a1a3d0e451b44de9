package graft.web

/** Server-side render preview: the HTML document behind both `graft render
  * --html` and the VSCode extension's render webview (reference
  * vscode/extension/src/webviews render panel — there a bundled React app;
  * here one self-contained page). The lineage SVG mirrors the SPA's
  * lineage tab ([[Ui]]): upstream relations boxed left, the model's output
  * columns boxed right, an edge per column-level dependency — generated in
  * Scala so the editor webview and the browser draw the same picture. */
object RenderHtml {

  def escape(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Two-column lineage SVG (same layout as the SPA's lineage tab). */
  def lineageSvg(model: String, upstreams: Seq[String],
                 lineage: Map[String, Set[String]]): String = {
    val cols = lineage.keys.toSeq.sorted
    val ups = upstreams.distinct.sorted
    def y(i: Int) = 30 + i * 28
    val h = math.max(y(math.max(cols.size, ups.size)), 60)
    val sb = new StringBuilder(
      s"<svg xmlns='http://www.w3.org/2000/svg' width='700' height='$h'>")
    def box(x: Int, yy: Int, label: String): String =
      s"<rect x='$x' y='${yy - 16}' width='220' height='22' fill='#fff' stroke='#8899aa'/>" +
        s"<text x='${x + 6}' y='$yy' font-size='12' font-family='monospace'>${escape(label)}</text>"
    ups.zipWithIndex.foreach { case (u, i) => sb.append(box(10, y(i), u)) }
    cols.zipWithIndex.foreach { case (c, i) => sb.append(box(450, y(i), s"$model.$c")) }
    for ((c, srcs) <- lineage.toSeq.sortBy(_._1); src <- srcs.toSeq.sorted) {
      val k = ups.indexWhere(u => src == u || src.startsWith(u + "."))
      val i = cols.indexOf(c)
      if (k >= 0 && i >= 0)
        sb.append(s"<line x1='232' y1='${y(k) - 4}' x2='448' y2='${y(i) - 4}' stroke='#5b9cff'/>")
    }
    sb.append("</svg>").toString
  }

  /** The full preview page: rendered SQL + lineage SVG. */
  def renderPage(model: String, renderedSql: String,
                 upstreams: Seq[String],
                 lineage: Map[String, Set[String]]): String = {
    val svg =
      if (upstreams.isEmpty && lineage.isEmpty) ""
      else s"<h2>Lineage</h2>${lineageSvg(model, upstreams, lineage)}"
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>render ${escape(model)}</title>
       |<style>body{font-family:sans-serif;margin:16px}
       |pre{background:#f4f6f8;border:1px solid #d8dee4;padding:12px;
       |overflow:auto;font-size:13px;color:#111}</style></head>
       |<body><h1>${escape(model)}</h1>
       |<pre>${escape(renderedSql)}</pre>
       |$svg
       |</body></html>
       |""".stripMargin
  }
}
