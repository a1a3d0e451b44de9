package graft.lsp

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Drives the language server end-to-end over real JSON-RPC framing
  * (Content-Length headers on piped streams), the same bytes an editor
  * sends: initialize → open/edit (diagnostics) → completion / hover /
  * definition / formatting → shutdown/exit. */
class LspServerSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  /** Frame a message LSP-style. */
  private def frame(json: String): Array[Byte] = {
    val b = json.getBytes("UTF-8")
    (s"Content-Length: ${b.length}\r\n\r\n").getBytes("UTF-8") ++ b
  }

  /** Run a scripted session; returns every server message in order. */
  private def session(project: String, messages: Seq[String],
      runner: Option[(String, String, String) => Seq[(String, Option[String])]] = None): Seq[JsonNode] =
    sessionOpt(Some(project), messages, runner)

  /** Same, but the server may start WITHOUT a --project dir (the plain
    * editor flow: the workspace arrives via initialize rootUri). */
  private def sessionOpt(project: Option[String], messages: Seq[String],
      runner: Option[(String, String, String) => Seq[(String, Option[String])]] = None): Seq[JsonNode] = {
    val in = new java.io.ByteArrayInputStream(
      messages.flatMap(m => frame(m).toSeq).toArray)
    val outBuf = new java.io.ByteArrayOutputStream()
    new LspServer(in, outBuf, project, runner).run()
    // parse the framed responses back out
    val bytes = outBuf.toByteArray
    val out = Seq.newBuilder[JsonNode]
    var i = 0
    while (i < bytes.length) {
      val headEnd = {
        var j = i
        while (!(bytes(j) == '\r' && bytes(j + 1) == '\n' &&
          bytes(j + 2) == '\r' && bytes(j + 3) == '\n')) j += 1
        j
      }
      val head = new String(bytes, i, headEnd - i, "UTF-8")
      val len = head.split(':')(1).trim.toInt
      out += mapper.readTree(new String(bytes, headEnd + 4, len, "UTF-8"))
      i = headEnd + 4 + len
    }
    out.result()
  }

  private def req(id: Int, method: String, params: String): String =
    s"""{"jsonrpc":"2.0","id":$id,"method":"$method","params":$params}"""
  private def note(method: String, params: String): String =
    s"""{"jsonrpc":"2.0","method":"$method","params":$params}"""

  test("initialize, diagnostics, completion, hover, definition, formatting") {
    val proj = graft.SparkTestSession.tmpDir("lsp-proj")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, "daily.sql"),
      """MODEL (name lsp.daily, kind FULL, owner 'dana',
        |  audits (not_null(columns = (n))), description 'daily rollup');
        |SELECT o_orderdate, count(*) AS n FROM raw.orders GROUP BY o_orderdate
        |""".stripMargin)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, "report.sql"),
      """MODEL (name lsp.report, kind FULL, owner 'dana',
        |  audits (not_null(columns = (days))));
        |SELECT count(*) AS days FROM lsp.daily
        |""".stripMargin)
    val uri = "file://" + proj + "/report.sql"
    // a dirty buffer: SELECT * (lint) + no owner (warning)
    val dirty = "MODEL (name lsp.report, kind FULL);\\nSELECT * FROM lsp.daily\\n"

    val msgs = session(proj, Seq(
      req(1, "initialize", s"""{"rootUri":null,"capabilities":{}}"""),
      note("initialized", "{}"),
      note("textDocument/didOpen",
        s"""{"textDocument":{"uri":"$uri","languageId":"sql","version":1,"text":"$dirty"}}"""),
      req(2, "textDocument/completion",
        s"""{"textDocument":{"uri":"$uri"},"position":{"line":1,"character":0}}"""),
      // hover/definition over "lsp.daily" on line 1: "SELECT * FROM lsp.daily"
      req(3, "textDocument/hover",
        s"""{"textDocument":{"uri":"$uri"},"position":{"line":1,"character":17}}"""),
      req(4, "textDocument/definition",
        s"""{"textDocument":{"uri":"$uri"},"position":{"line":1,"character":17}}"""),
      req(5, "textDocument/formatting",
        s"""{"textDocument":{"uri":"$uri"},"options":{}}"""),
      req(6, "shutdown", "null"),
      note("exit", "{}")))

    def byId(id: Int): JsonNode =
      msgs.find(m => m.has("id") && m.get("id").asInt == id).get.get("result")

    // initialize: capabilities advertised
    val caps = byId(1).get("capabilities")
    assert(caps.get("hoverProvider").asBoolean && caps.get("definitionProvider").asBoolean)
    assert(byId(1).get("serverInfo").get("name").asText == "graft-lsp")

    // diagnostics pushed for the dirty buffer: select-star (blocking=error)
    // and missing-owner (warning)
    val diag = msgs.find(m =>
      m.has("method") && m.get("method").asText == "textDocument/publishDiagnostics").get
    assert(diag.get("params").get("uri").asText == uri)
    val ds = diag.get("params").get("diagnostics")
    val texts = (0 until ds.size).map(i => ds.get(i))
    assert(texts.exists(d => d.get("message").asText.contains("noselectstar") &&
      d.get("severity").asInt == 1), ds.toString)
    assert(texts.exists(d => d.get("message").asText.contains("nomissingowner") &&
      d.get("severity").asInt == 2), ds.toString)

    // completion carries project models, macros, and MODEL properties
    val items = byId(2)
    val labels = (0 until items.size).map(i => items.get(i).get("label").asText).toSet
    assert(labels.contains("lsp.daily") && labels.contains("lsp.report"))
    assert(labels.contains("@EACH") && labels.contains("partitioned_by"))

    // hover shows the daily model's summary
    val hov = byId(3)
    assert(hov.get("contents").get("value").asText.contains("lsp.daily"))
    assert(hov.get("contents").get("value").asText.contains("daily rollup"))

    // definition jumps to daily.sql's MODEL header
    val defn = byId(4)
    assert(defn.get("uri").asText.endsWith("daily.sql"))
    assert(defn.get("range").get("start").get("line").asInt == 0)

    // formatting returns a whole-document edit
    val edits = byId(5)
    assert(edits.isArray)
    // shutdown answered null
    assert(byId(6).isNull)
  }

  test("workspace/symbol, references (DAG inverse edge), and quick-fix code actions") {
    val proj = graft.SparkTestSession.tmpDir("lsp-proj2")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, "daily.sql"),
      """MODEL (name lsp2.daily, kind FULL, owner 'dana',
        |  audits (not_null(columns = (n))));
        |SELECT o_orderdate, count(*) AS n FROM raw.orders GROUP BY o_orderdate
        |""".stripMargin)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, "report.sql"),
      """MODEL (name lsp2.report, kind FULL, owner 'dana',
        |  audits (not_null(columns = (days))));
        |SELECT count(*) AS days FROM lsp2.daily
        |""".stripMargin)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, "weekly.sql"),
      """MODEL (name lsp2.weekly, kind FULL, owner 'dana',
        |  audits (not_null(columns = (w))));
        |SELECT count(*) AS w FROM lsp2.daily WHERE o_orderdate > '1995'
        |""".stripMargin)
    val uri = "file://" + proj + "/report.sql"
    // buffer with the cursor target on line 1 ("FROM lsp2.daily") and the
    // two mechanical lint violations: no owner, no audits
    val dirty = "MODEL (name lsp2.report, kind FULL);\\nSELECT days FROM lsp2.daily\\n"

    val msgs = session(proj, Seq(
      req(1, "initialize", s"""{"rootUri":null,"capabilities":{}}"""),
      note("textDocument/didOpen",
        s"""{"textDocument":{"uri":"$uri","languageId":"sql","version":1,"text":"$dirty"}}"""),
      req(2, "workspace/symbol", s"""{"query":"lsp2"}"""),
      req(3, "workspace/symbol", s"""{"query":"WEEK"}"""),
      // references of lsp2.daily (cursor inside the name on line 1)
      req(4, "textDocument/references",
        s"""{"textDocument":{"uri":"$uri"},"position":{"line":1,"character":20},"context":{"includeDeclaration":true}}"""),
      req(5, "textDocument/references",
        s"""{"textDocument":{"uri":"$uri"},"position":{"line":1,"character":20},"context":{"includeDeclaration":false}}"""),
      req(6, "textDocument/codeAction",
        s"""{"textDocument":{"uri":"$uri"},"range":{"start":{"line":0,"character":0},"end":{"line":0,"character":0}},"context":{"diagnostics":[]}}"""),
      req(7, "shutdown", "null"),
      note("exit", "{}")))

    def byId(id: Int): JsonNode =
      msgs.find(m => m.has("id") && m.get("id").asInt == id).get.get("result")

    // capabilities advertise the three new providers
    val caps = byId(1).get("capabilities")
    assert(caps.get("referencesProvider").asBoolean &&
      caps.get("workspaceSymbolProvider").asBoolean &&
      caps.get("codeActionProvider").has("codeActionKinds"))

    // workspace/symbol: all three models; query filter is case-insensitive
    val syms = byId(2)
    val names = (0 until syms.size).map(i => syms.get(i).get("name").asText)
    assert(names == Seq("lsp2.daily", "lsp2.report", "lsp2.weekly"), names)
    assert(syms.get(0).get("location").get("uri").asText.endsWith("daily.sql"))
    val weekOnly = byId(3)
    assert(weekOnly.size == 1 && weekOnly.get(0).get("name").asText == "lsp2.weekly")

    // references: report + weekly read lsp2.daily; includeDeclaration
    // prepends daily.sql's own header
    val refs = byId(4)
    val refFiles = (0 until refs.size).map(i => refs.get(i).get("uri").asText)
    assert(refFiles.head.endsWith("daily.sql"), refFiles)
    assert(refFiles.exists(_.endsWith("report.sql")) &&
      refFiles.exists(_.endsWith("weekly.sql")), refFiles)
    val refsNoDecl = byId(5)
    val ndFiles = (0 until refsNoDecl.size).map(i => refsNoDecl.get(i).get("uri").asText)
    assert(!ndFiles.exists(_.endsWith("daily.sql")), ndFiles)

    // code actions: one quick fix per mechanical violation, and applying
    // the edit yields a buffer the parser+linter accept as fixed
    val actions = byId(6)
    val titles = (0 until actions.size).map(i => actions.get(i).get("title").asText)
    assert(titles.exists(_.contains("owner")) && titles.exists(_.contains("audit")), titles)
    val dirtyText = "MODEL (name lsp2.report, kind FULL);\nSELECT days FROM lsp2.daily\n"
    var patched = dirtyText
    (0 until actions.size).foreach { i =>
      val e = actions.get(i).get("edit").get("changes").get(uri).get(0)
      // both fixes insert at the same zero-width anchor — apply by string
      // insertion at (line 0, char) on the CURRENT patched text
      val ch = e.get("range").get("start").get("character").asInt
      val lines = patched.split("\n", -1)
      lines(0) = lines(0).substring(0, ch) + e.get("newText").asText + lines(0).substring(ch)
      patched = lines.mkString("\n")
    }
    val fixed = graft.loader.ModelLoader.parseAll(patched, "<patched>")
    assert(fixed.head.owner.contains("unknown"), patched)
    assert(fixed.head.audits.nonEmpty, patched)
    val vio = graft.linter.Linter.lint(fixed).map(_.rule)
    assert(!vio.contains("nomissingowner") && !vio.contains("nomissingaudits"), vio)
  }

  test("code actions anchor after the paren even when MODEL and ( split lines") {
    val proj = graft.SparkTestSession.tmpDir("lsp-proj3")
    val uri = "file://" + proj + "/split.sql"
    // the parser accepts `MODEL\n(` (header located by indexOf, not per
    // line) — a per-line header regex would mis-anchor the fix at (0,0),
    // corrupting the file when the client applies it
    val dirty = "MODEL\\n(name lsp3.dirty, kind FULL, " +
      "audits (not_null(columns = (b))));\\nSELECT 2 AS b\\n"
    val msgs = session(proj, Seq(
      req(1, "initialize", s"""{"rootUri":null,"capabilities":{}}"""),
      note("textDocument/didOpen",
        s"""{"textDocument":{"uri":"$uri","languageId":"sql","version":1,"text":"$dirty"}}"""),
      req(2, "textDocument/codeAction",
        s"""{"textDocument":{"uri":"$uri"},"range":{"start":{"line":0,"character":0},"end":{"line":0,"character":0}},"context":{"diagnostics":[]}}"""),
      note("exit", "{}")))
    val actions = msgs.find(m => m.has("id") && m.get("id").asInt == 2).get.get("result")
    val titles = (0 until actions.size).map(i => actions.get(i).get("title").asText)
    // one fix (missing owner), anchored after the paren on LINE 1, char 1
    assert(titles.size == 1 && titles.head.contains("lsp3.dirty"), titles)
    val e = actions.get(0).get("edit").get("changes").get(uri).get(0)
    assert(e.get("range").get("start").get("line").asInt == 1, e.toString)
    assert(e.get("range").get("start").get("character").asInt == 1, e.toString)
    // applying the edit yields a parseable model with the owner set
    val lines = dirty.replace("\\n", "\n").split("\n", -1)
    lines(1) = lines(1).take(1) + e.get("newText").asText + lines(1).drop(1)
    val fixed = graft.loader.ModelLoader.parseAll(lines.mkString("\n"), "<p>")
    assert(fixed.head.owner.contains("unknown"), lines.mkString("\n"))
  }

  test("code actions ignore a MODEL( inside a leading comment or string") {
    val proj = graft.SparkTestSession.tmpDir("lsp-proj-mask")
    val uri = "file://" + proj + "/masked.sql"
    // the decoy `MODEL (` lives in a comment ABOVE the real block — a raw
    // regex over the text would anchor the quick-fix inside the comment and
    // corrupt the real header on apply
    val dirty = "-- wrap in MODEL (name ...) like this\\n" +
      "MODEL (name lspm.dirty, kind FULL, " +
      "audits (not_null(columns = (b))));\\nSELECT 'MODEL (' AS b\\n"
    val msgs = session(proj, Seq(
      req(1, "initialize", s"""{"rootUri":null,"capabilities":{}}"""),
      note("textDocument/didOpen",
        s"""{"textDocument":{"uri":"$uri","languageId":"sql","version":1,"text":"$dirty"}}"""),
      req(2, "textDocument/codeAction",
        s"""{"textDocument":{"uri":"$uri"},"range":{"start":{"line":0,"character":0},"end":{"line":0,"character":0}},"context":{"diagnostics":[]}}"""),
      note("exit", "{}")))
    val actions = msgs.find(m => m.has("id") && m.get("id").asInt == 2).get.get("result")
    assert(actions.size == 1, actions.toString)
    val e = actions.get(0).get("edit").get("changes").get(uri).get(0)
    // anchored after the REAL header's paren on line 1 — not the comment's
    assert(e.get("range").get("start").get("line").asInt == 1, e.toString)
    val lines = dirty.replace("\\n", "\n").split("\n", -1)
    val ch = e.get("range").get("start").get("character").asInt
    lines(1) = lines(1).take(ch) + e.get("newText").asText + lines(1).drop(ch)
    val fixed = graft.loader.ModelLoader.parseAll(lines.mkString("\n"), "<p>")
    assert(fixed.head.owner.contains("unknown"), lines.mkString("\n"))
  }

  /** Apply a WorkspaceEdit's edits for one uri to a text (bottom-up so
    * earlier edits don't shift later ranges). */
  private def applyEdits(text: String, edits: JsonNode): String = {
    val lines = text.split("\n", -1).toBuffer
    val es = (0 until edits.size).map(edits.get).sortBy { e =>
      (-e.get("range").get("start").get("line").asInt,
       -e.get("range").get("start").get("character").asInt)
    }
    es.foreach { e =>
      val l = e.get("range").get("start").get("line").asInt
      val a = e.get("range").get("start").get("character").asInt
      val b = e.get("range").get("end").get("character").asInt
      lines(l) = lines(l).take(a) + e.get("newText").asText + lines(l).drop(b)
    }
    lines.mkString("\n")
  }

  test("rename: CTE aliases in-document, model names across files, both re-lint clean") {
    val proj = graft.SparkTestSession.tmpDir("lsp-rename")
    val dailyText =
      """MODEL (name lspr.daily, kind FULL, owner 'dana',
        |  audits (not_null(columns = (n))));
        |WITH base AS (SELECT o_orderdate, 1 AS one FROM raw.orders)
        |SELECT o_orderdate, count(base.one) AS n FROM base GROUP BY o_orderdate
        |""".stripMargin
    val reportText =
      """MODEL (name lspr.report, kind FULL, owner 'dana',
        |  audits (not_null(columns = (days))));
        |SELECT count(*) AS days FROM lspr.daily
        |""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(proj, "daily.sql"), dailyText)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(proj, "report.sql"), reportText)
    val dailyUri = java.nio.file.Paths.get(proj, "daily.sql").toUri.toString
    val esc = dailyText.replace("\n", "\\n").replace("\"", "\\\"")
    val msgs = session(proj, Seq(
      req(1, "initialize", s"""{"rootUri":"file://$proj","capabilities":{}}"""),
      note("textDocument/didOpen",
        s"""{"textDocument":{"uri":"$dailyUri","languageId":"sql","version":1,"text":"$esc"}}"""),
      // cursor on `base` in `FROM base` (line 3) — a CTE alias
      req(2, "textDocument/prepareRename",
        s"""{"textDocument":{"uri":"$dailyUri"},"position":{"line":3,"character":${dailyText.split('\n')(3).indexOf("FROM base") + 6}}}"""),
      req(3, "textDocument/rename",
        s"""{"textDocument":{"uri":"$dailyUri"},"position":{"line":3,"character":${dailyText.split('\n')(3).indexOf("FROM base") + 6}},"newName":"orders_base"}"""),
      // cursor on `lspr.daily` in the name property (line 0) — a model name
      req(4, "textDocument/prepareRename",
        s"""{"textDocument":{"uri":"$dailyUri"},"position":{"line":0,"character":14}}"""),
      req(5, "textDocument/rename",
        s"""{"textDocument":{"uri":"$dailyUri"},"position":{"line":0,"character":14},"newName":"lspr.daily_v2"}"""),
      // something unrenameable: a bare keyword
      req(6, "textDocument/prepareRename",
        s"""{"textDocument":{"uri":"$dailyUri"},"position":{"line":3,"character":${dailyText.split('\n')(3).indexOf("GROUP") + 1}}}"""),
      note("exit", "{}")))
    def result(id: Int) = msgs.find(m => m.has("id") && m.get("id").asInt == id).get.get("result")
    // CTE prepare: range + placeholder
    assert(result(2).get("placeholder").asText == "base", result(2).toString)
    // CTE rename: in-document, both the definition and the usage
    // 3 edits: the definition, the DOT-QUALIFIED column reference
    // (`base.one` — a rename that missed it would corrupt the document),
    // and the FROM usage
    val cteEdits = result(3).get("changes").get(dailyUri)
    assert(cteEdits.size == 3, cteEdits.toString)
    val renamedCte = applyEdits(dailyText, cteEdits)
    assert(renamedCte.contains("WITH orders_base AS") &&
      renamedCte.contains("count(orders_base.one)") &&
      renamedCte.contains("FROM orders_base") && !renamedCte.contains(" base"),
      renamedCte)
    assert(graft.loader.ModelLoader.parseAll(renamedCte, "<p>").nonEmpty)
    // model prepare + rename: WorkspaceEdit spans BOTH files
    assert(result(4).get("placeholder").asText == "lspr.daily")
    val changes = result(5).get("changes")
    val reportUri = java.nio.file.Paths.get(proj, "report.sql").toUri.toString
    assert(changes.has(dailyUri) && changes.has(reportUri), changes.toString)
    val newDaily = applyEdits(dailyText, changes.get(dailyUri))
    val newReport = applyEdits(reportText, changes.get(reportUri))
    val pd = graft.loader.ModelLoader.parseAll(newDaily, "<p>")
    val pr = graft.loader.ModelLoader.parseAll(newReport, "<p>")
    assert(pd.head.name == "lspr.daily_v2", newDaily)
    assert(pr.head.references.contains("lspr.daily_v2") &&
      !pr.head.references.contains("lspr.daily"), newReport)
    // and the renamed project lints clean (no new violations)
    assert(graft.linter.Linter.lint(pd ++ pr)
      .forall(v => !v.message.contains("lspr.daily")), "rename left a dangling ref")
    // keyword: not renameable
    assert(result(6).isNull, result(6).toString)
  }

  test("inlay hints: declared-schema types after SELECT aliases and bare columns") {
    val proj = graft.SparkTestSession.tmpDir("lsp-hints")
    val uri = "file://" + proj + "/typed.sql"
    val text =
      """MODEL (name lsph.typed, kind FULL, owner 'dana',
        |  columns (d DATE, n BIGINT, amt DOUBLE),
        |  audits (not_null(columns = (n))));
        |SELECT
        |  d,
        |  count(*) AS n,
        |  CAST(sum(x) AS DOUBLE) AS amt
        |FROM raw.t GROUP BY d
        |""".stripMargin
    val esc = text.replace("\n", "\\n").replace("\"", "\\\"")
    val msgs = session(proj, Seq(
      req(1, "initialize", s"""{"rootUri":null,"capabilities":{}}"""),
      note("textDocument/didOpen",
        s"""{"textDocument":{"uri":"$uri","languageId":"sql","version":1,"text":"$esc"}}"""),
      req(2, "textDocument/inlayHint",
        s"""{"textDocument":{"uri":"$uri"},"range":{"start":{"line":3,"character":0},"end":{"line":8,"character":0}}}"""),
      note("exit", "{}")))
    val hints = msgs.find(m => m.has("id") && m.get("id").asInt == 2).get.get("result")
    val got = (0 until hints.size).map { i =>
      val h = hints.get(i)
      (h.get("position").get("line").asInt, h.get("label").asText)
    }.toSet
    // bare `d,` line hints DATE; `AS n` hints BIGINT; the CAST alias line
    // is skipped (type already explicit — reference hints.py skips Cast)
    assert(got.contains((4, ": DATE")), got.toString)
    assert(got.contains((5, ": BIGINT")), got.toString)
    assert(!got.exists(_._1 == 6), s"cast alias should not hint: $got")
  }

  test("code lenses: YAML unit tests surface as runnable graft.test commands") {
    val proj = graft.SparkTestSession.tmpDir("lsp-lens")
    val uri = "file://" + proj + "/tests.yaml"
    val yaml =
      """test_revenue_ok:
        |  model: lspl.rev
        |  outputs:
        |    query:
        |      - n: 1
        |vars_block:
        |  start: 2020-01-01
        |test_rowcount:
        |  model: lspl.rev
        |  outputs:
        |    query:
        |      - n: 2
        |""".stripMargin
    val esc = yaml.replace("\n", "\\n").replace("\"", "\\\"")
    val msgs = session(proj, Seq(
      req(1, "initialize", s"""{"rootUri":null,"capabilities":{}}"""),
      note("textDocument/didOpen",
        s"""{"textDocument":{"uri":"$uri","languageId":"yaml","version":1,"text":"$esc"}}"""),
      req(2, "textDocument/codeLens", s"""{"textDocument":{"uri":"$uri"}}"""),
      note("exit", "{}")))
    val lenses = msgs.find(m => m.has("id") && m.get("id").asInt == 2).get.get("result")
    val got = (0 until lenses.size).map { i =>
      val l = lenses.get(i)
      (l.get("range").get("start").get("line").asInt,
        l.get("command").get("command").asText,
        l.get("command").get("arguments").get(0).asText)
    }
    // the two test_ blocks (model: present) lens; the vars block does not
    assert(got == Seq((0, "graft.test", "test_revenue_ok"),
      (7, "graft.test", "test_rowcount")), got.toString)
  }

  test("documentHighlight lights every occurrence; supportedMethods lists the dispatch") {
    val proj = graft.SparkTestSession.tmpDir("lsp-hl")
    val uri = "file://" + proj + "/hl.sql"
    val text =
      """MODEL (name lsphl.m, kind FULL, owner 'o', audits (number_of_rows(threshold := 0)));
        |WITH base AS (SELECT 1 AS x)
        |SELECT x FROM base JOIN base b ON 1 = 1
        |""".stripMargin
    val esc = text.replace("\n", "\\n").replace("\"", "\\\"")
    val cteCol = text.split('\n')(1).indexOf("base") + 1
    val msgs = session(proj, Seq(
      req(1, "initialize", s"""{"rootUri":null,"capabilities":{}}"""),
      note("textDocument/didOpen",
        s"""{"textDocument":{"uri":"$uri","languageId":"sql","version":1,"text":"$esc"}}"""),
      req(2, "textDocument/documentHighlight",
        s"""{"textDocument":{"uri":"$uri"},"position":{"line":1,"character":$cteCol}}"""),
      req(3, "graft/supportedMethods", "{}"),
      note("exit", "{}")))
    def result(id: Int) = msgs.find(m => m.has("id") && m.get("id").asInt == id).get.get("result")
    // definition + two usages of `base` (the `b` alias is not a match)
    assert(result(2).size == 3, result(2).toString)
    val methods = (0 until result(3).size).map(i => result(3).get(i).get("name").asText)
    assert(methods.contains("textDocument/rename") &&
      methods.contains("textDocument/documentHighlight") &&
      methods.contains("graft/supportedMethods"), methods.toString)
  }

  test("references resolve through unsaved overlays at the usage site") {
    val proj = graft.SparkTestSession.tmpDir("lsp-refs-overlay")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, "a.sql"),
      """MODEL (name lspo.a, kind FULL, owner 'o', audits (number_of_rows(threshold := 0)));
        |SELECT 1 AS x
        |""".stripMargin)
    // on DISK b does not reference a...
    java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, "b.sql"),
      """MODEL (name lspo.b, kind FULL, owner 'o', audits (number_of_rows(threshold := 0)));
        |SELECT 2 AS y
        |""".stripMargin)
    val aUri = java.nio.file.Paths.get(proj, "a.sql").toUri.toString
    val bUri = java.nio.file.Paths.get(proj, "b.sql").toUri.toString
    // ...but the UNSAVED overlay edit makes it reference a
    val bEdited =
      """MODEL (name lspo.b, kind FULL, owner 'o', audits (number_of_rows(threshold := 0)));
        |SELECT count(*) AS y FROM lspo.a
        |""".stripMargin
    val escA =
      """MODEL (name lspo.a, kind FULL, owner 'o', audits (number_of_rows(threshold := 0)));\nSELECT 1 AS x\n"""
    val escB = bEdited.replace("\n", "\\n")
    val msgs = session(proj, Seq(
      req(1, "initialize", s"""{"rootUri":"file://$proj","capabilities":{}}"""),
      note("textDocument/didOpen",
        s"""{"textDocument":{"uri":"$aUri","languageId":"sql","version":1,"text":"$escA"}}"""),
      note("textDocument/didOpen",
        s"""{"textDocument":{"uri":"$bUri","languageId":"sql","version":1,"text":"$escB"}}"""),
      // cursor on lspo.a in a.sql's name property
      req(2, "textDocument/references",
        s"""{"textDocument":{"uri":"$aUri"},"position":{"line":0,"character":13},"context":{"includeDeclaration":false}}"""),
      note("exit", "{}")))
    val refs = msgs.find(m => m.has("id") && m.get("id").asInt == 2).get.get("result")
    assert(refs.size == 1, refs.toString)
    val loc = refs.get(0)
    assert(loc.get("uri").asText == bUri, loc.toString)
    // usage-accurate: line 1 (the FROM), character at `lspo.a`, not line 0
    assert(loc.get("range").get("start").get("line").asInt == 1, loc.toString)
    assert(loc.get("range").get("start").get("character").asInt ==
      bEdited.split('\n')(1).indexOf("lspo.a"), loc.toString)
  }

  test("references list every usage once; rename skips comments and strings") {
    // ADVICE r11: a blueprint file expands to SEVERAL models — each used to
    // re-add the file's FIRST match, yielding duplicate identical locations
    // instead of one per usage site; and rename rewrote occurrences inside
    // comments/strings because matching ran over raw text.
    val proj = graft.SparkTestSession.tmpDir("lsp-refs-dedup")
    val baseText =
      """MODEL (name lspm.base, kind FULL, owner 'o', audits (number_of_rows(threshold := 0)));
        |SELECT 1 AS x
        |""".stripMargin
    val blueText =
      """MODEL (name lspm.@{seg}_agg, kind FULL, owner 'o',
        |  blueprints ((seg = 'retail'), (seg = 'corp')),
        |  audits (number_of_rows(threshold := 0)));
        |-- lspm.base mentioned in a comment is not a reference
        |SELECT count(*) AS n, 'lspm.base' AS tag FROM lspm.base a JOIN lspm.base b ON 1 = 1
        |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, "base.sql"), baseText)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, "blue.sql"), blueText)
    val baseUri = java.nio.file.Paths.get(proj, "base.sql").toUri.toString
    val msgs = session(proj, Seq(
      req(1, "initialize", s"""{"rootUri":"file://$proj","capabilities":{}}"""),
      note("textDocument/didOpen",
        s"""{"textDocument":{"uri":"$baseUri","languageId":"sql","version":1,"text":"${baseText.replace("\n", "\\n")}"}}"""),
      // cursor on lspm.base in base.sql's name property
      req(2, "textDocument/references",
        s"""{"textDocument":{"uri":"$baseUri"},"position":{"line":0,"character":13},"context":{"includeDeclaration":false}}"""),
      req(3, "textDocument/rename",
        s"""{"textDocument":{"uri":"$baseUri"},"position":{"line":0,"character":13},"newName":"lspm.base2"}"""),
      note("exit", "{}")))
    def result(id: Int) = msgs.find(m => m.has("id") && m.get("id").asInt == id).get.get("result")

    // exactly the two FROM/JOIN sites — not 2 models x first-match, and
    // neither the comment (line 3) nor the string literal counts
    val refs = result(2)
    val sites = (0 until refs.size).map { i =>
      val st = refs.get(i).get("range").get("start")
      (st.get("line").asInt, st.get("character").asInt)
    }
    val fromLine = 4
    val lineText = blueText.split('\n')(fromLine)
    val first = lineText.indexOf("FROM lspm.base") + 5
    val second = lineText.indexOf("JOIN lspm.base") + 5
    assert(sites.toSet == Set((fromLine, first), (fromLine, second)), sites.toString)
    assert(sites.size == 2, s"duplicate locations: $sites")

    // rename edits only the two code sites; comment and string survive
    val blueUri = java.nio.file.Paths.get(proj, "blue.sql").toUri.toString
    val changes = result(3).get("changes")
    assert(changes.has(blueUri), changes.toString)
    val renamed = applyEdits(blueText, changes.get(blueUri))
    assert(renamed.contains("-- lspm.base mentioned"), renamed)
    assert(renamed.contains("'lspm.base'"), renamed)
    assert(renamed.contains("FROM lspm.base2 a JOIN lspm.base2 b"), renamed)
  }

  test("custom methods: allModels, renderModel, tests, environments, formatProject") {
    val proj = graft.SparkTestSession.tmpDir("lsp-custom")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, "daily.sql"),
      """MODEL (name lspc.daily, kind FULL, owner 'o', description 'daily rollup',
        |  audits (number_of_rows(threshold := 0)));
        |SELECT o_orderdate, count(*) AS n FROM raw.orders
        |WHERE o_orderdate BETWEEN @start_ds AND @end_ds GROUP BY o_orderdate
        |""".stripMargin)
    // a scruffy file formatProject must rewrite on disk
    val scruffy = java.nio.file.Paths.get(proj, "scruffy.sql")
    java.nio.file.Files.writeString(scruffy,
      "MODEL (name lspc.scruffy, kind FULL, owner 'o', audits (number_of_rows(threshold := 0)));\nselect   o_orderkey,o_totalprice from raw.orders\n")
    val testsDir = java.nio.file.Paths.get(proj, "tests")
    java.nio.file.Files.createDirectories(testsDir)
    val yamlPath = testsDir.resolve("test_daily.yaml")
    java.nio.file.Files.writeString(yamlPath,
      """test_daily_counts:
        |  model: lspc.daily
        |  inputs:
        |    raw.orders:
        |      - o_orderdate: 2020-01-01
        |  outputs:
        |    query:
        |      - o_orderdate: 2020-01-01
        |        n: 1
        |""".stripMargin)
    // a durable state image so getEnvironments has something to read
    val st = new graft.state.FileStateStore(proj + "/.graft/state")
    st.promoteEnvironment(graft.state.EnvironmentRecord(
      "prod", Map("lspc.daily" -> "v1"), finalized = true))

    var ranTest: Option[(String, String, String)] = None
    val runner: (String, String, String) => Seq[(String, Option[String])] = { (p, n, y) =>
      ranTest = Some((p, n, y)); Seq((n, None))
    }
    val dailyUri = java.nio.file.Paths.get(proj, "daily.sql").toUri.toString
    val yamlUri = yamlPath.toUri.toString
    val msgs = session(proj, Seq(
      req(1, "initialize", s"""{"rootUri":"file://$proj","capabilities":{}}"""),
      req(2, "graft/allModels", "{}"),
      req(3, "graft/allModelsForRender", "{}"),
      req(4, "graft/renderModel",
        s"""{"textDocumentUri":"$dailyUri","start":1577836800000,"end":1577923200000}"""),
      req(5, "graft/listWorkspaceTests", "{}"),
      req(6, "graft/listDocumentTests", s"""{"textDocumentUri":"$yamlUri"}"""),
      req(7, "graft/runTest", s"""{"test":"test_daily_counts","uri":"$yamlUri"}"""),
      req(8, "graft/getEnvironments", "{}"),
      req(9, "graft/formatProject", "{}"),
      req(10, "graft/supportedMethods", "{}"),
      req(11, "graft/getModels", "{}"),
      note("exit", "{}")), Some(runner))
    def result(id: Int) = msgs.find(m => m.has("id") && m.get("id").asInt == id).get.get("result")

    // allModels: both models with the declared description, builtin macros
    val am = result(2)
    val amNames = (0 until am.get("models").size)
      .map(i => am.get("models").get(i).get("name").asText)
    assert(amNames == Seq("lspc.daily", "lspc.scruffy"), amNames)
    assert(am.get("models").get(0).get("description").asText == "daily rollup")
    val macroNames = (0 until am.get("macros").size)
      .map(i => am.get("macros").get(i).get("name").asText)
    assert(macroNames.contains("@EACH") && macroNames.contains("@start_ds"), macroNames.take(5))

    // allModelsForRender: fqn + declaring uri
    val afr = result(3)
    val fqns = (0 until afr.get("models").size)
      .map(i => afr.get("models").get(i).get("fqn").asText)
    assert(fqns == Seq("lspc.daily", "lspc.scruffy"), fqns)
    assert(afr.get("models").get(0).get("uri").asText.endsWith("daily.sql"))

    // renderModel: @start_ds/@end_ds rendered to the requested window
    val rm = result(4).get("entries")
    assert(rm.size == 1, rm.toString)
    val definition = rm.get(0).get("definition").asText
    // @end_ds is the INCLUSIVE end date — one-day window renders twice
    assert(definition.contains("BETWEEN '2020-01-01' AND '2020-01-01'"), definition)
    assert(!definition.contains("@start_ds"), definition)

    // workspace + document tests: the YAML entry with its range
    val wt = result(5).get("tests")
    assert(wt.size == 1 && wt.get(0).get("name").asText == "test_daily_counts", wt.toString)
    assert(wt.get(0).get("uri").asText == yamlUri, wt.toString)
    assert(wt.get(0).get("range").get("start").get("line").asInt == 0)
    val dt = result(6).get("tests")
    assert(dt.size == 1 && dt.get(0).get("name").asText == "test_daily_counts")

    // runTest routed through the injected runner, with the project dir
    // resolved from the server's LIVE root at call time
    val rt = result(7)
    assert(rt.get("success").asBoolean, rt.toString)
    assert(ranTest.contains((proj, "test_daily_counts", yamlPath.toString)), ranTest)

    // environments from the durable state image
    val envs = result(8).get("environments")
    assert(envs.size == 1 && envs.get(0).get("name").asText == "prod" &&
      envs.get(0).get("finalized").asBoolean &&
      envs.get(0).get("snapshots").asInt == 1, envs.toString)

    // formatProject rewrote the scruffy file in place
    assert(result(9).get("formatted").asInt >= 1, result(9).toString)
    val formatted = java.nio.file.Files.readString(scruffy)
    assert(formatted != null && formatted.contains("SELECT"), formatted)

    // discovery lists every custom method
    val methods = (0 until result(10).size).map(i => result(10).get(i).get("name").asText)
    Seq("graft/allModels", "graft/renderModel", "graft/formatProject",
      "graft/getModels", "graft/getEnvironments", "graft/listWorkspaceTests",
      "graft/listDocumentTests", "graft/runTest").foreach(m =>
      assert(methods.contains(m), s"$m missing from supportedMethods"))

    // getModels: the table-diff picker list — short name, fqn, description
    val gm = result(11).get("models")
    val gmFqns = (0 until gm.size).map(i => gm.get(i).get("fqn").asText)
    assert(gmFqns == Seq("lspc.daily", "lspc.scruffy"), gmFqns)
    assert(gm.get(0).get("name").asText == "daily")
    assert(gm.get(0).get("description").asText == "daily rollup")
  }

  test("rootUri-only workspace runs tests; formatProject formats open overlays") {
    val proj = graft.SparkTestSession.tmpDir("lsp-proj-rooturi")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, "m.sql"),
      """MODEL (name lspr.m, kind FULL, owner 'o', audits (number_of_rows(threshold := 0)));
        |select   1 as x
        |""".stripMargin)
    val testsDir = java.nio.file.Paths.get(proj, "tests")
    java.nio.file.Files.createDirectories(testsDir)
    val yamlPath = testsDir.resolve("test_m.yaml")
    java.nio.file.Files.writeString(yamlPath,
      "test_m:\n  model: lspr.m\n  outputs:\n    query:\n      - x: 1\n")
    var ran: Option[(String, String, String)] = None
    val runner: (String, String, String) => Seq[(String, Option[String])] = { (p, n, y) =>
      ran = Some((p, n, y)); Seq((n, None))
    }
    val mUri = java.nio.file.Paths.get(proj, "m.sql").toUri.toString
    // an open buffer with UNSAVED edits (x2 exists only in the overlay):
    // formatProject must format THIS text, not the stale disk content
    val overlay =
      "MODEL (name lspr.m, kind FULL, owner 'o', audits (number_of_rows(threshold := 0)));\\nselect   1 as x, 2 as x2\\n"
    // the server starts with NO --project: the workspace arrives via rootUri
    val msgs = sessionOpt(None, Seq(
      req(1, "initialize", s"""{"rootUri":"file://$proj","capabilities":{}}"""),
      note("textDocument/didOpen",
        s"""{"textDocument":{"uri":"$mUri","languageId":"sql","version":1,"text":"$overlay"}}"""),
      req(2, "graft/runTest",
        s"""{"test":"test_m","uri":"${yamlPath.toUri}"}"""),
      req(3, "graft/formatProject", "{}"),
      note("exit", "{}")), Some(runner))
    def result(id: Int) = msgs.find(m => m.has("id") && m.get("id").asInt == id).get.get("result")
    // runTest resolved the project dir from the live root (ADVICE r12 medium)
    assert(result(2).get("success").asBoolean, result(2).toString)
    assert(ran.contains((proj, "test_m", yamlPath.toString)), ran)
    // formatProject formatted the OVERLAY and routed it through a
    // workspace/applyEdit server→client request: the editor buffer gets the
    // formatted text (unsaved x2 edit preserved), and the DISK is left for
    // the client to save — a silent disk write would be clobbered by the
    // still-dirty client buffer's next save
    assert(result(3).get("formatted").asInt >= 1, result(3).toString)
    val applyEdit = msgs.find(m =>
      m.has("method") && m.get("method").asText == "workspace/applyEdit")
    assert(applyEdit.isDefined, msgs.map(_.toString).mkString("\n"))
    val newText = applyEdit.get.get("params").get("edit").get("changes")
      .get(mUri).get(0).get("newText").asText
    assert(newText.contains("x2"), s"unsaved edit lost: $newText")
    assert(newText.contains("SELECT"), s"not formatted: $newText")
    // the edit round-trips via the client's didChange; disk stays stale
    // until the user saves
    val onDisk = java.nio.file.Files.readString(java.nio.file.Paths.get(proj, "m.sql"))
    assert(!onDisk.contains("x2"), s"open-buffer format must not hit disk: $onDisk")
  }

  test("robustness: bad notifications don't kill the loop, unknown methods err, name-after-parens indexes") {
    val proj = graft.SparkTestSession.tmpDir("lsp-proj3")
    // name AFTER a parenthesized property — the parser-backed index must
    // still find it (a naive regex stops at the audits ')')
    java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, "late.sql"),
      """MODEL (audits (not_null(columns = (id))), name lsp.late, kind FULL, owner 'o');
        |SELECT 1 AS id
        |""".stripMargin)
    // a commented-out MODEL must NOT index
    java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, "dead.sql"),
      "-- MODEL (name lsp.ghost, kind FULL);\n-- SELECT 1\n")
    // an unreadable (non-UTF-8) file must not blank the index
    java.nio.file.Files.write(java.nio.file.Paths.get(proj, "latin.sql"),
      Array[Byte]('M', 'O', 'D', 'E', 'L', ' ', 0xff.toByte, 0xfe.toByte))
    val uri = "file://" + proj + "/late.sql"
    val msgs = session(proj, Seq(
      req(1, "initialize", """{"rootUri":null,"capabilities":{}}"""),
      // malformed notification (no text field) — must not kill the server
      note("textDocument/didOpen", s"""{"textDocument":{"uri":"$uri"}}"""),
      // unsupported request — must answer MethodNotFound, not null result
      req(2, "textDocument/semanticTokens/full",
        s"""{"textDocument":{"uri":"$uri"}}"""),
      req(3, "textDocument/completion",
        s"""{"textDocument":{"uri":"$uri"},"position":{"line":0,"character":0}}"""),
      // formatting a doc with trailing blank lines replaces the WHOLE doc
      note("textDocument/didOpen",
        s"""{"textDocument":{"uri":"$uri","text":"MODEL (name lsp.late, kind FULL, owner 'o', audits (not_null(columns = (id))));\\nSELECT 1 AS id\\n\\n\\n"}}"""),
      req(4, "textDocument/formatting",
        s"""{"textDocument":{"uri":"$uri"},"options":{}}"""),
      note("exit", "{}")))
    def byId(id: Int): JsonNode =
      msgs.find(m => m.has("id") && m.get("id").asInt == id).get
    assert(byId(2).has("error") &&
      byId(2).get("error").get("code").asInt == -32601)
    val labels = {
      val items = byId(3).get("result")
      (0 until items.size).map(i => items.get(i).get("label").asText).toSet
    }
    assert(labels.contains("lsp.late"), labels.toString)
    assert(!labels.contains("lsp.ghost"), "commented-out MODEL was indexed")
    val edits = byId(4).get("result")
    if (edits.size > 0) {
      val end = edits.get(0).get("range").get("end")
      assert(end.get("line").asInt == 4 && end.get("character").asInt == 0,
        end.toString) // "...\n\n\n" = 5 split(-1) lines, last empty
    }
  }

  test("parse errors surface as diagnostics; non-model files stay quiet") {
    val proj = graft.SparkTestSession.tmpDir("lsp-proj2")
    val uri = "file://" + proj + "/broken.sql"
    val msgs = session(proj, Seq(
      req(1, "initialize", """{"rootUri":null,"capabilities":{}}"""),
      note("textDocument/didOpen",
        s"""{"textDocument":{"uri":"$uri","text":"MODEL (name broken.x, kind NO_SUCH_KIND);\\nSELECT 1"}}"""),
      note("textDocument/didOpen",
        s"""{"textDocument":{"uri":"file://$proj/plain.sql","text":"SELECT 1 AS x"}}"""),
      note("exit", "{}")))
    val diags = msgs.filter(m =>
      m.has("method") && m.get("method").asText == "textDocument/publishDiagnostics")
    assert(diags.size == 2)
    val broken = diags.find(_.get("params").get("uri").asText == uri).get
    assert(broken.get("params").get("diagnostics").size >= 1)
    assert(broken.get("params").get("diagnostics").get(0).get("source").asText == "graft-parse")
    val plain = diags.find(_.get("params").get("uri").asText.endsWith("plain.sql")).get
    assert(plain.get("params").get("diagnostics").size == 0)
  }
}
