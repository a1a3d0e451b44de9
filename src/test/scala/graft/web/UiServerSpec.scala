package graft.web

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkTestSession
import graft.core._

/** End-to-end over real HTTP: the UI server's API surface (reference
  * `web/server/api/endpoints/`) against a planned project — catalog,
  * environments, lineage, dag, render/evaluate/fetchdf, plan+apply, files
  * with traversal guard. */
class UiServerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val mapper = new ObjectMapper()
  private val sf = "/root/testdata/sf0.001"
  private val D = 86400000L
  private def day(s: String) = java.time.LocalDate.parse(s).toEpochDay * D

  /** Bearer token attached to every request (set once the server is up);
    * the 403 test clears it temporarily. */
  private var tok: Option[String] = None

  private def http(base: String, method: String, path: String,
                   body: Option[String] = None): (Int, String) = {
    val conn = new java.net.URI(base + path).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod(method)
    tok.foreach(conn.setRequestProperty("X-Graft-Token", _))
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.getOutputStream.write(b.getBytes("UTF-8"))
    }
    val code = conn.getResponseCode
    val in = if (code < 400) conn.getInputStream else conn.getErrorStream
    val text = new String(in.readAllBytes(), "UTF-8")
    conn.disconnect()
    (code, text)
  }

  test("ui server: catalog, lineage, console, plan, environments, files over HTTP") {
    val proj = SparkTestSession.tmpDir("ui-proj")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, "daily.sql"),
      """MODEL (name ui.daily, kind FULL, owner 'dana');
        |SELECT o_orderdate, count(*) AS n FROM raw.orders GROUP BY o_orderdate
        |""".stripMargin)
    val ctx = new graft.GraftContext(spark, SparkTestSession.tmpDir("ws-ui"))
    ctx.addExternal("raw.orders", s"$sf/orders.parquet")
    ctx.addModel(Model(name = "ui.daily",
      body = SqlBody("SELECT o_orderdate, count(*) AS n FROM raw.orders GROUP BY o_orderdate"),
      kind = ModelKind.Full, owner = Some("dana")))
    ctx.addModel(Model(name = "ui.rollup",
      body = SqlBody("SELECT count(*) AS days FROM ui.daily"),
      kind = ModelKind.Full))

    val srv = new UiServer(ctx, port = 0, projectDir = Some(proj)).start()
    val base = srv.address
    try {
      // no token → 403 on every route, including "simple" cross-origin
      // POSTs (the CSRF shape that needs no preflight to execute)
      tok = None
      assert(http(base, "GET", "/api/models")._1 == 403)
      assert(http(base, "POST", "/api/commands/fetchdf",
        Some("""{"sql":"SELECT 1"}"""))._1 == 403)
      // ...and the query-param form alone works (the browser-URL case)
      assert(http(base, "GET", s"/?token=${srv.token}")._1 == 200)
      tok = Some(srv.token)

      // the SPA and the docs page serve as HTML
      val (hc, html) = http(base, "GET", "/")
      assert(hc == 200 && html.contains("<html>") && html.contains("graft"))

      // catalog
      val (mc, models) = http(base, "GET", "/api/models")
      assert(mc == 200)
      val marr = mapper.readTree(models)
      assert(marr.size == 2)
      assert(marr.get(0).get("name").asText == "ui.daily")
      assert(marr.get(0).get("owner").asText == "dana")
      assert(marr.get(1).get("depends_on").get(0).asText == "ui.daily")

      val (dc, det) = http(base, "GET", "/api/models/ui.rollup")
      assert(dc == 200 && mapper.readTree(det).get("definition").asText
        .contains("FROM ui.daily"))
      assert(http(base, "GET", "/api/models/ui.nope")._1 == 404)

      // dag edges
      val dag = mapper.readTree(http(base, "GET", "/api/dag")._2)
      assert(dag.get("edges").get(0).get(0).asText == "ui.daily")
      assert(dag.get("edges").get(0).get(1).asText == "ui.rollup")

      // plan (preview: no apply) then apply, then environments reflect it
      val (pc, ptext) = http(base, "POST", "/api/plan", Some(
        s"""{"environment":"prod","start":${day("1995-01-01")},"end":${day("1995-01-03")}}"""))
      assert(pc == 200)
      val p = mapper.readTree(ptext)
      assert(p.get("has_changes").asBoolean)
      assert(p.get("added").size == 2 && !p.has("applied"))
      assert(ctx.environments.isEmpty) // preview mutated nothing
      val (ac, atext) = http(base, "POST", "/api/commands/apply", Some(
        s"""{"environment":"prod","start":${day("1995-01-01")},"end":${day("1995-01-03")}}"""))
      assert(ac == 200 && mapper.readTree(atext).get("applied").asBoolean)
      val envs = mapper.readTree(http(base, "GET", "/api/environments")._2)
      assert(envs.size == 1 && envs.get(0).get("name").asText == "prod")
      assert(envs.get(0).get("snapshots").size == 2)

      // lineage (needs applied tables for upstream schemas)
      val lin = mapper.readTree(http(base, "GET", "/api/lineage/ui.rollup")._2)
      assert(lin.get("columns").has("days"))
      assert(http(base, "GET", "/api/lineage/ui.rollup/nope")._1 == 404)

      // console: render / evaluate / fetchdf
      val rend = mapper.readTree(http(base, "POST", "/api/commands/render",
        Some("""{"model":"ui.rollup"}"""))._2)
      assert(rend.get("sql").asText.toUpperCase.contains("SELECT"))
      val ev = mapper.readTree(http(base, "POST", "/api/commands/evaluate",
        Some("""{"model":"ui.rollup"}"""))._2)
      assert(ev.get("columns").get(0).asText == "days")
      assert(ev.get("rows").size == 1)
      val fd = mapper.readTree(http(base, "POST", "/api/commands/fetchdf",
        Some("""{"sql":"SELECT days FROM ui.rollup","limit":5}"""))._2)
      assert(fd.get("rows").get(0).get(0).asText.toInt > 0)
      assert(http(base, "POST", "/api/commands/fetchdf", Some("{}"))._1 == 400)

      // files: list, read, write round-trip; traversal refused
      val files = mapper.readTree(http(base, "GET", "/api/files")._2)
      assert(files.size == 1 && files.get(0).asText == "daily.sql")
      val f = mapper.readTree(http(base, "GET", "/api/files/daily.sql")._2)
      assert(f.get("content").asText.contains("MODEL"))
      assert(http(base, "POST", "/api/files/new_model.sql",
        Some("""{"content":"MODEL (name ui.extra, kind FULL);\nSELECT 1 AS x"}"""))._1 == 200)
      assert(java.nio.file.Files.readString(
        java.nio.file.Paths.get(proj, "new_model.sql")).contains("ui.extra"))
      val (tc, ttext) = http(base, "GET", "/api/files/../escape.sql")
      assert(tc == 400 && ttext.contains("escapes"), s"$tc $ttext")

      // plan options thread through: with a LOCAL change to ui.rollup, a
      // selector excluding it keeps the promoted snapshot (no modification
      // planned); selecting it plans the change (select only bites when
      // local state diverges from the promoted env)
      ctx.addModel(Model(name = "ui.rollup",
        body = SqlBody("SELECT count(*) + 0 AS days FROM ui.daily"),
        kind = ModelKind.Full))
      val pKeep = mapper.readTree(http(base, "POST", "/api/plan", Some(
        s"""{"environment":"prod","start":${day("1995-01-01")},"end":${day("1995-01-03")},"select":["ui.daily"]}"""))._2)
      assert(pKeep.get("modified").size == 0, pKeep.toString)
      val pSel = mapper.readTree(http(base, "POST", "/api/plan", Some(
        s"""{"environment":"prod","start":${day("1995-01-01")},"end":${day("1995-01-03")},"select":["ui.rollup"]}"""))._2)
      assert(pSel.get("modified").size == 1 &&
        pSel.get("modified").get(0).get("name").asText == "ui.rollup", pSel.toString)

      // unknown route
      assert(http(base, "GET", "/api/nope")._1 == 404)
    } finally srv.stop()
  }

  test("every /api path the SPA's JS references exists in the router match") {
    // string-level (no JS engine runs in tests): each `/api/...` literal in
    // the SPA source must have a router case — either the exact
    // List("api", ...) pattern, a trailing-parameter variant (the SPA
    // concatenates a name after a trailing slash), or the `:: rest` form
    val page = graft.web.Ui.page
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/web/UiServer.scala")), "UTF-8")
    val refs = """/api/[a-zA-Z/]*""".r.findAllIn(page).toSet
    assert(refs.nonEmpty, "SPA references no /api paths — extraction broke")
    refs.foreach { ref =>
      val trailingParam = ref.endsWith("/")
      val segs = ref.stripPrefix("/api").split('/').filter(_.nonEmpty)
      val listForm = ("""List\("api"""" + segs.map(s => s""", "$s"""").mkString +
        (if (trailingParam) """, [^)]+""" else "") + """\)""").r
      val consForm = (""""api" :: """ + segs.map(s => s""""$s" :: """).mkString +
        "rest").r
      assert(listForm.findFirstIn(src).nonEmpty || consForm.findFirstIn(src).nonEmpty,
        s"SPA references $ref but no router case matches it")
    }
    // the lineage tab wires the COLUMN-level endpoint (two-param route) and
    // renders the graph as inline SVG boxes + edges
    assert(page.contains("""j("/api/lineage/"+m+(c?"/"+encodeURIComponent(c):""))"""),
      "SPA lost the column-lineage endpoint wiring")
    assert(page.contains("<svg") && page.contains("<line") && page.contains("<rect"),
      "SPA lineage tab lost its inline SVG rendering")
    // the dag tab layers models by longest upstream path and draws the
    // project graph from /api/dag
    assert(page.contains("\"dag\"") && page.contains("""j("/api/dag")"""),
      "SPA lost its dag tab")
  }

  test("node syntax-checks the SPA's inline script") {
    // a JS parse error would blank the whole SPA silently — node ships in
    // this container, so the script block is actually parsed
    val p = graft.core.Spawn.start(new ProcessBuilder("node", "--check",
      spaScriptFile.toString).redirectErrorStream(true))
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() == 0, s"SPA script failed node --check:\n$out")
  }

  test("node RUNS the SPA views headlessly: catalog, dag layering, lineage SVG") {
    // micro-DOM + canned API responses (src/test/resources/ui_harness.js):
    // the catalog table renders, the dag tab layers downstream models into
    // later columns with one SVG line per edge, and the lineage tab draws
    // upstream→column edges and hits the two-param endpoint when a column
    // is given — the view code executes, not just parses
    val p = graft.core.Spawn.start(new ProcessBuilder("node",
      "src/test/resources/ui_harness.js", spaScriptFile.toString)
      .redirectErrorStream(true))
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() == 0 && out.contains("UI HEADLESS OK"),
      s"SPA headless run failed:\n$out")
  }

  private lazy val spaScriptFile: java.nio.file.Path = {
    val page = graft.web.Ui.page
    val script = page.substring(
      page.indexOf("<script>") + "<script>".length, page.indexOf("</script>"))
    val f = java.nio.file.Files.createTempFile("ui", ".js")
    java.nio.file.Files.writeString(f, script)
    f
  }
}
