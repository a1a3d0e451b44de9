package graft.lsp

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import java.io.{InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** Language server (reference `sqlmesh/lsp/` — pygls-based; main.py
  * registers completions, hover, go-to-definition, formatting, and
  * diagnostics published on open/save). Re-expressed as a dependency-free
  * JSON-RPC 2.0 loop over the LSP base protocol (`Content-Length` framed
  * messages on stdio), so any LSP-capable editor can drive a graft project:
  *
  *  - diagnostics on didOpen/didChange/didSave: MODEL-block parse errors
  *    plus [[graft.linter.Linter]] violations, anchored to the model header
  *  - completion: project model names, `@MACRO` names, MODEL() property
  *    keywords
  *  - hover: model summary (kind/cron/owner/description) for the name
  *    under the cursor
  *  - definition: model name → the project file whose MODEL block declares
  *    it (the model→file index refreshes on save)
  *  - references: models whose query reads the name under the cursor (the
  *    DAG's inverse edge); workspace/symbol: all models, query-filtered
  *  - code actions: quick fixes for the mechanical linter rules — insert a
  *    missing `owner` / minimal `audits` property into the MODEL block
  *  - formatting: [[graft.loader.SqlFormatter]] over the whole document
  *
  * The loop serves one editor over stdio (`graft lsp`), or any stream pair
  * in tests. State is a document map + a lazily-refreshed project index;
  * nothing touches Spark, so the server starts instantly.
  */
final class LspServer(in: InputStream, out: OutputStream,
                      projectDir: Option[String] = None,
                      /** (projectDir, testName, yamlPath) → per-case
                        * (name, failure) — injected by the CLI host so
                        * `graft/runTest` can run YAML unit tests without
                        * this class touching Spark (reference lsp/custom.py
                        * RUN_TEST_FEATURE). The project directory is passed
                        * PER CALL from the server's live root, so an editor
                        * workspace supplied via initialize rootUri (no
                        * --project flag) runs tests against the right
                        * project. */
                      testRunner: Option[(String, String, String) => Seq[(String, Option[String])]] = None) {

  private val mapper = new ObjectMapper()
  private var running = true
  /** uri → current text (full-document sync). */
  private val docs = scala.collection.mutable.Map[String, String]()
  /** model name → (file path, 0-based line of its MODEL header). */
  private var modelIndex: Map[String, (String, Int)] = Map.empty
  private var root: Option[String] = projectDir

  def run(): Unit = while (running) readMessage() match {
    case None => running = false
    case Some(msg) => handle(msg)
  }

  // --------------------------------------------------------- transport

  private def readMessage(): Option[JsonNode] = {
    var len = -1
    var line = readLine()
    while (line.exists(_.nonEmpty)) {
      line.foreach { l =>
        if (l.toLowerCase.startsWith("content-length:"))
          // a malformed value must not crash the loop; the missing-header
          // case below reports before treating the stream as unusable
          len = l.split(':')(1).trim.toIntOption.getOrElse(-1)
      }
      line = readLine()
    }
    if (line.isEmpty) return None
    if (len < 0) {
      System.err.println("[graft-lsp] header block without a valid Content-Length — closing")
      return None
    }
    val buf = new Array[Byte](len)
    var off = 0
    while (off < len) {
      val n = in.read(buf, off, len - off)
      if (n < 0) return None
      off += n
    }
    Some(mapper.readTree(new String(buf, UTF_8)))
  }

  private def readLine(): Option[String] = {
    val sb = new StringBuilder
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
    Some(sb.toString)
  }

  private def write(node: ObjectNode): Unit = out.synchronized {
    val bytes = node.toString.getBytes(UTF_8)
    out.write(s"Content-Length: ${bytes.length}\r\n\r\n".getBytes(UTF_8))
    out.write(bytes)
    out.flush()
  }

  private def respond(id: JsonNode, result: JsonNode): Unit = {
    val r = mapper.createObjectNode()
    r.put("jsonrpc", "2.0"); r.set[JsonNode]("id", id); r.set[JsonNode]("result", result)
    write(r)
  }

  private def notify(method: String, params: ObjectNode): Unit = {
    val n = mapper.createObjectNode()
    n.put("jsonrpc", "2.0"); n.put("method", method); n.set[JsonNode]("params", params)
    write(n)
  }

  // server→client requests get their own id namespace ("graft-srv-N") so
  // they can never collide with client request ids; responses are accepted
  // and dropped in [[handle]] (fire-and-forget — nothing here blocks on the
  // client's answer)
  private var srvReqId = 0
  private def sendRequest(method: String, params: ObjectNode): Unit = {
    srvReqId += 1
    val n = mapper.createObjectNode()
    n.put("jsonrpc", "2.0"); n.put("id", s"graft-srv-$srvReqId")
    n.put("method", method); n.set[JsonNode]("params", params)
    write(n)
  }

  // ---------------------------------------------------------- dispatch

  private def handle(msg: JsonNode): Unit = {
    val method = Option(msg.get("method")).map(_.asText).getOrElse("")
    val id = msg.get("id")
    val params = Option(msg.get("params")).getOrElse(mapper.createObjectNode())
    // a message with an id but no method is the client's RESPONSE to one of
    // our own requests (workspace/applyEdit) — fire-and-forget, drop it
    // (without this it would fall through to MethodNotFound)
    if (method.isEmpty && id != null) return
    try method match {
      case "initialize" =>
        // rootUri (or CLI --project) anchors the model index
        Option(params.get("rootUri")).filterNot(_.isNull)
          .map(u => uriToPath(u.asText)).foreach(p => root = Some(p))
        refreshIndex()
        val caps = mapper.createObjectNode()
        caps.put("textDocumentSync", 1) // full-document sync
        caps.putObject("completionProvider").putArray("triggerCharacters")
          .add("@").add(".")
        caps.put("hoverProvider", true)
        caps.put("definitionProvider", true)
        caps.put("documentFormattingProvider", true)
        caps.put("referencesProvider", true)
        caps.put("workspaceSymbolProvider", true)
        caps.putObject("codeActionProvider").putArray("codeActionKinds")
          .add("quickfix")
        caps.putObject("renameProvider").put("prepareProvider", true)
        caps.put("inlayHintProvider", true)
        caps.putObject("codeLensProvider").put("resolveProvider", false)
        caps.put("documentHighlightProvider", true)
        val res = mapper.createObjectNode()
        res.set[JsonNode]("capabilities", caps)
        val info = res.putObject("serverInfo")
        info.put("name", "graft-lsp"); info.put("version", "1")
        respond(id, res)
      case "initialized" => ()
      case "shutdown" => respond(id, mapper.nullNode())
      case "exit" => running = false
      case "textDocument/didOpen" =>
        val td = params.get("textDocument")
        val uri = td.get("uri").asText
        docs(uri) = td.get("text").asText
        publishDiagnostics(uri)
      case "textDocument/didChange" =>
        val uri = params.get("textDocument").get("uri").asText
        val changes = params.get("contentChanges")
        if (changes.size > 0) docs(uri) = changes.get(changes.size - 1).get("text").asText
        publishDiagnostics(uri)
      case "textDocument/didSave" =>
        refreshIndex()
        publishDiagnostics(params.get("textDocument").get("uri").asText)
      case "textDocument/didClose" =>
        docs.remove(params.get("textDocument").get("uri").asText); ()
      case "textDocument/completion" => respond(id, completions(params))
      case "textDocument/hover" => respond(id, hover(params))
      case "textDocument/definition" => respond(id, definition(params))
      case "textDocument/formatting" => respond(id, formatting(params))
      case "textDocument/references" => respond(id, references(params))
      case "workspace/symbol" => respond(id, workspaceSymbols(params))
      case "textDocument/codeAction" => respond(id, codeActions(params))
      case "textDocument/prepareRename" => respond(id, prepareRename(params))
      case "textDocument/rename" => respond(id, rename(params))
      case "textDocument/inlayHint" => respond(id, inlayHints(params))
      case "textDocument/codeLens" => respond(id, codeLenses(params))
      case "textDocument/documentHighlight" => respond(id, documentHighlights(params))
      case "graft/supportedMethods" => respond(id, supportedMethods())
      case "graft/allModels" => respond(id, allModels())
      case "graft/allModelsForRender" => respond(id, allModelsForRender())
      case "graft/renderModel" => respond(id, renderModel(params))
      case "graft/formatProject" => respond(id, formatProject())
      case "graft/getModels" => respond(id, getModels())
      case "graft/getEnvironments" => respond(id, getEnvironments())
      case "graft/listWorkspaceTests" => respond(id, listWorkspaceTests())
      case "graft/listDocumentTests" => respond(id, listDocumentTests(params))
      case "graft/runTest" => respond(id, runTest(params))
      case _ if id != null =>
        // JSON-RPC MethodNotFound — a null RESULT would read as "supported,
        // empty answer" and stop clients from falling back
        val r = mapper.createObjectNode()
        r.put("jsonrpc", "2.0"); r.set[JsonNode]("id", id)
        val err = r.putObject("error")
        err.put("code", -32601); err.put("message", s"method not found: $method")
        write(r)
      case _ => ()
    } catch {
      // a handler failure must NEVER kill the server loop: requests get a
      // protocol error; notification failures only log (stderr — stdout is
      // the protocol channel)
      case e: Throwable =>
        if (id != null) {
          val r = mapper.createObjectNode()
          r.put("jsonrpc", "2.0"); r.set[JsonNode]("id", id)
          val err = r.putObject("error")
          err.put("code", -32603); err.put("message", String.valueOf(e.getMessage))
          write(r)
        } else System.err.println(s"[graft-lsp] $method failed: ${e.getMessage}")
    }
  }

  // ---------------------------------------------------------- features

  private def uriToPath(uri: String): String =
    if (uri.startsWith("file://")) java.nio.file.Paths.get(new java.net.URI(uri)).toString
    else uri

  private def refreshIndex(): Unit = modelIndex = root match {
    case None => Map.empty
    case Some(dir) =>
      val d = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.isDirectory(d)) Map.empty
      else scala.util.Try {
        val it = java.nio.file.Files.walk(d)
        try {
          import scala.jdk.CollectionConverters._
          it.iterator().asScala
            .filter(p => p.toString.endsWith(".sql") &&
              java.nio.file.Files.isRegularFile(p))
            .flatMap { p =>
              // per-file tolerance: one unreadable/unparseable file must not
              // blank the whole project's completion/hover/definition
              scala.util.Try {
                val text = java.nio.file.Files.readString(p)
                indexOfModels(text).map { case (name, line) =>
                  name -> ((p.toString, line))
                }
              }.getOrElse(Nil)
            }.toMap
        } finally it.close()
      }.getOrElse(Map.empty)
  }

  /** (model name, 0-based header line) for every MODEL block in a file —
    * names come from the REAL parser (comment stripping, nested-paren
    * properties, blueprints all handled; a `name` after a parenthesized
    * `audits (...)` is found, a commented-out MODEL is not); the line is
    * where the name first appears in the source, falling back to the MODEL
    * header. */
  private def indexOfModels(text: String): Seq[(String, Int)] = {
    val models = scala.util.Try(
      graft.loader.ModelLoader.parseAll(text, "<lsp-index>")).getOrElse(Nil)
    val lines = text.split('\n')
    val headerLine = math.max(0,
      lines.indexWhere(_.matches("(?i)\\s*MODEL\\s*\\(.*")))
    models.map { m =>
      val short = m.name.split('.').last
      val line = lines.indexWhere(l =>
        l.contains(m.name) || l.matches(s"(?i).*\\bname\\s+.*\\b$short\\b.*"))
      m.name -> (if (line >= 0) line else headerLine)
    }
  }

  private def wordAt(params: JsonNode): Option[String] = {
    val uri = params.get("textDocument").get("uri").asText
    val pos = params.get("position")
    val (lineNo, chNo) = (pos.get("line").asInt, pos.get("character").asInt)
    docs.get(uri).flatMap { text =>
      val lines = text.split('\n')
      if (lineNo >= lines.length) None
      else {
        val l = lines(lineNo)
        def isWord(c: Char) = c.isLetterOrDigit || c == '_' || c == '.'
        var a = math.min(chNo, l.length); var b = a
        while (a > 0 && isWord(l(a - 1))) a -= 1
        while (b < l.length && isWord(l(b))) b += 1
        Some(l.substring(a, b)).filter(_.nonEmpty)
      }
    }
  }

  private def publishDiagnostics(uri: String): Unit = {
    val text = docs.getOrElse(uri, "")
    val diags = mapper.createArrayNode()
    def add(line: Int, msg: String, severity: Int, source: String): Unit = {
      val d = diags.addObject()
      val r = d.putObject("range")
      val s = r.putObject("start"); s.put("line", line); s.put("character", 0)
      val e = r.putObject("end"); e.put("line", line); e.put("character", 9999)
      d.put("severity", severity)
      d.put("source", source)
      d.put("message", msg)
    }
    val headerLine = math.max(0,
      text.split('\n').indexWhere(_.matches("(?i)\\s*MODEL\\s*\\(.*")))
    if (text.matches("(?is).*\\bMODEL\\s*\\(.*"))
      try {
        val models = graft.loader.ModelLoader.parseAll(text, uri)
        graft.linter.Linter.lint(models).foreach { v =>
          add(headerLine, s"${v.rule}: ${v.message}",
            if (v.blocking) 1 else 2, "graft-lint")
        }
      } catch {
        case e: Throwable =>
          add(headerLine, String.valueOf(e.getMessage), 1, "graft-parse")
      }
    val p = mapper.createObjectNode()
    p.put("uri", uri)
    p.set[JsonNode]("diagnostics", diags)
    notify("textDocument/publishDiagnostics", p)
  }

  private val modelPropKeywords = Seq("name", "kind", "cron", "owner", "start",
    "audits", "grains", "references", "tags", "description", "partitioned_by",
    "clustered_by", "dialect", "signals", "blueprints")
  // single source of truth next to the dispatch — new macros appear here
  // without touching the LSP
  private val macroNames = graft.macros.MacroEvaluator.builtinNames

  private def completions(params: JsonNode): ArrayNode = {
    val items = mapper.createArrayNode()
    def add(label: String, kind: Int, detail: String): Unit = {
      val i = items.addObject()
      i.put("label", label); i.put("kind", kind); i.put("detail", detail)
    }
    modelIndex.keys.toSeq.sorted.foreach(add(_, 9 /*Module*/, "model"))
    macroNames.foreach(n => add(s"@$n", 3 /*Function*/, "macro"))
    modelPropKeywords.foreach(add(_, 14 /*Keyword*/, "MODEL property"))
    items
  }

  private def hover(params: JsonNode): JsonNode =
    wordAt(params).filter(modelIndex.contains).map { name =>
      val (file, _) = modelIndex(name)
      val text = java.nio.file.Files.readString(java.nio.file.Paths.get(file))
      val summary =
        try {
          val models = graft.loader.ModelLoader.parseAll(text, file)
          models.find(_.name == name).map { m =>
            val owner = m.owner.map(o => s"\n- owner: $o").getOrElse("")
            val desc = m.description.map(d => s"\n\n$d").getOrElse("")
            s"**$name**\n- kind: ${m.kind.name}\n- cron: ${m.cron}$owner$desc"
          }.getOrElse(s"**$name**")
        } catch { case _: Throwable => s"**$name** (defined in $file)" }
      val h = mapper.createObjectNode()
      val c = h.putObject("contents")
      c.put("kind", "markdown"); c.put("value", summary)
      h: JsonNode
    }.getOrElse(mapper.nullNode())

  private def definition(params: JsonNode): JsonNode =
    wordAt(params).flatMap(modelIndex.get).map { case (file, line) =>
      val loc = mapper.createObjectNode()
      loc.put("uri", java.nio.file.Paths.get(file).toUri.toString)
      val r = loc.putObject("range")
      val s = r.putObject("start"); s.put("line", line); s.put("character", 0)
      val e = r.putObject("end"); e.put("line", line); e.put("character", 0)
      loc: JsonNode
    }.getOrElse(mapper.nullNode())

  private def location(file: String, line: Int): ObjectNode = {
    val loc = mapper.createObjectNode()
    loc.put("uri", java.nio.file.Paths.get(file).toUri.toString)
    val r = loc.putObject("range")
    val s = r.putObject("start"); s.put("line", line); s.put("character", 0)
    val e = r.putObject("end"); e.put("line", line); e.put("character", 0)
    loc
  }

  /** workspace/symbol: every project model, filtered by the query
    * (case-insensitive substring — the LSP convention editors expect). */
  private def workspaceSymbols(params: JsonNode): ArrayNode = {
    val q = Option(params.get("query")).map(_.asText.toLowerCase).getOrElse("")
    val arr = mapper.createArrayNode()
    modelIndex.toSeq.sortBy(_._1)
      .filter { case (name, _) => q.isEmpty || name.toLowerCase.contains(q) }
      .foreach { case (name, (file, line)) =>
        val s = arr.addObject()
        s.put("name", name)
        s.put("kind", 5) // SymbolKind.Class — the closest fit for a model
        s.set[JsonNode]("location", location(file, line))
      }
    arr
  }

  /** Current text of a project file: the in-memory overlay when the editor
    * has it open (unsaved didChange edits included), else disk. */
  private def textOf(file: String): String = {
    val uri = java.nio.file.Paths.get(file).toUri.toString
    docs.getOrElse(uri,
      java.nio.file.Files.readString(java.nio.file.Paths.get(file)))
  }

  /** Every usage site of `name` in a file: one (line, startChar..endChar)
    * per non-identifier-bounded occurrence, matched over comment/string-
    * MASKED text (offsets are position-preserving) so a mention in a
    * comment or literal is not a usage; falls back to the given declaration
    * line when the text form differs (quoted, line-split). */
  private def usageLocations(file: String, text: String, name: String,
                             declLine: Int): Seq[ObjectNode] = {
    val re = ("(?<![\\w.])" + java.util.regex.Pattern.quote(name) + "(?!\\w)").r
    val sites = maskNonCode(text).split('\n').iterator.zipWithIndex
      .flatMap { case (l, i) => re.findAllMatchIn(l).map(m => (i, m.start, m.end)) }
      .toSeq
    if (sites.isEmpty) Seq(location(file, declLine))
    else sites.map { case (line, a, b) =>
      val loc = mapper.createObjectNode()
      loc.put("uri", java.nio.file.Paths.get(file).toUri.toString)
      val r = loc.putObject("range")
      val s = r.putObject("start"); s.put("line", line); s.put("character", a)
      val e = r.putObject("end"); e.put("line", line); e.put("character", b)
      loc
    }
  }

  /** textDocument/references: models whose query READS the name under the
    * cursor — the DAG's inverse edge, answered from the same parsed project
    * the definition index uses. Open documents resolve through the overlay
    * (unsaved edits count), and each hit points at the actual usage site in
    * the referencing file, not its declaration line. includeDeclaration
    * prepends the model's own declaration site. */
  private def references(params: JsonNode): ArrayNode = {
    val arr = mapper.createArrayNode()
    wordAt(params).foreach { name =>
      val includeDecl = Option(params.get("context"))
        .exists(_.path("includeDeclaration").asBoolean(false))
      if (includeDecl)
        modelIndex.get(name).foreach { case (f, l) => arr.add(location(f, l)) }
      modelIndex.values.map(_._1).toSeq.distinct.sorted.foreach { file =>
        scala.util.Try {
          val text = textOf(file)
          // all usage sites in the file, reported ONCE — several referencing
          // models in one file must not each re-add the same first match
          val referencing = graft.loader.ModelLoader.parseAll(text, file)
            .filter(m => m.name != name && m.references.contains(name))
          if (referencing.nonEmpty) {
            val declLine = modelIndex.get(referencing.head.name)
              .map(_._2).getOrElse(0)
            // the symbol's own declaration header in a file that ALSO
            // references it is covered by includeDeclaration, not a usage
            val ownDecl = modelIndex.get(name).filter(_._1 == file).map(_._2)
            usageLocations(file, text, name, declLine)
              .filterNot(loc => ownDecl.contains(
                loc.path("range").path("start").path("line").asInt(-1)))
              .foreach(arr.add)
          }
        }
      }
    }
    arr
  }

  /** Quick fixes for the two MECHANICAL linter rules — the ones whose fix
    * is a pure property insertion (nomissingowner / nomissingaudits). The
    * edit lands right after the `name` property (or the MODEL header),
    * growing a trailing comma on that line when it lacks one, so the block
    * stays parseable either way. */
  private def codeActions(params: JsonNode): ArrayNode = {
    val arr = mapper.createArrayNode()
    val uri = params.get("textDocument").get("uri").asText
    val text = docs.getOrElse(uri, "")
    if (!text.matches("(?is).*\\bMODEL\\s*\\(.*")) return arr
    val models = scala.util.Try(
      graft.loader.ModelLoader.parseAll(text, uri)).getOrElse(Nil)
    if (models.isEmpty) return arr
    val violations = scala.util.Try(graft.linter.Linter.lint(models))
      .getOrElse(Nil)
    // zero-width insertion right after the block's `MODEL (` paren:
    // property order is free, so the inserted property is valid in
    // single-line and multi-line blocks alike, with no comma bookkeeping.
    // The header offset comes from a DOTALL regex over the whole text — the
    // parser accepts `MODEL\n(`, so a per-line match would mis-anchor the
    // edit at (0,0) and corrupt the file on apply. The text is MASKED first
    // (comments and string literals blanked, offsets preserved) so a
    // `MODEL (` inside a leading comment or string can't capture the anchor
    // and corrupt the real block on apply. Files hold one MODEL block
    // (blueprints expand N models from that ONE header — a property
    // inserted there fixes every instance, so fixes dedupe per rule).
    val headers = "(?is)\\bMODEL\\s*\\(".r.findAllMatchIn(maskNonCode(text))
      .map(_.end).toSeq
    if (headers.isEmpty) return arr
    def posOf(off: Int): (Int, Int) = {
      val pre = text.substring(0, off)
      val nl = pre.lastIndexOf('\n')
      (pre.count(_ == '\n'), off - (nl + 1))
    }
    def quickfix(title: String, insert: String): Unit = {
      val (line, ch) = posOf(headers.head)
      val a = arr.addObject()
      a.put("title", title)
      a.put("kind", "quickfix")
      val edits = a.putObject("edit").putObject("changes").putArray(uri)
      val e = edits.addObject()
      val r = e.putObject("range")
      val s = r.putObject("start"); s.put("line", line); s.put("character", ch)
      val en = r.putObject("end"); en.put("line", line); en.put("character", ch)
      e.put("newText", insert)
    }
    val byRule = violations.filter(v => models.exists(_.name == v.model))
      .groupBy(_.rule)
    byRule.get("nomissingowner").foreach(vs =>
      quickfix(s"Add an owner property to ${vs.head.model}", "owner unknown, "))
    byRule.get("nomissingaudits").foreach(vs =>
      quickfix(s"Add a minimal audit (number_of_rows) to ${vs.head.model}",
        "audits (number_of_rows(threshold := 0)), "))
    arr
  }

  /** Blank out `--` line comments, `/* */` block comments and quoted
    * string literals with spaces — LENGTH-PRESERVING, so offsets/lines
    * computed over the mask apply verbatim to the original text. */
  private[lsp] def maskNonCode(text: String): String = {
    val out = text.toCharArray
    var i = 0; val n = text.length
    def blankUntil(end: Int): Unit =
      while (i < end) { if (out(i) != '\n') out(i) = ' '; i += 1 }
    while (i < n) text.charAt(i) match {
      case '-' if i + 1 < n && text.charAt(i + 1) == '-' =>
        val nl = text.indexOf('\n', i); blankUntil(if (nl < 0) n else nl)
      case '/' if i + 1 < n && text.charAt(i + 1) == '*' =>
        val close = text.indexOf("*/", i + 2)
        blankUntil(if (close < 0) n else close + 2)
      case q @ ('\'' | '"') =>
        out(i) = ' '; i += 1
        while (i < n && text.charAt(i) != q) { if (out(i) != '\n') out(i) = ' '; i += 1 }
        if (i < n) { out(i) = ' '; i += 1 }
      case _ => i += 1
    }
    new String(out)
  }

  // -------------------------------------------------- rename (CTE + model)

  /** CTE aliases defined in a document: `WITH x AS (` / `, x AS (`. */
  private def cteNames(text: String): Set[String] =
    "(?is)(?:\\bwith|,)\\s+([A-Za-z_]\\w*)\\s+as\\s*\\(".r
      .findAllMatchIn(maskNonCode(text)).map(_.group(1)).toSet

  /** The identifier under the cursor with its exact range. */
  private def wordRangeAt(params: JsonNode): Option[(String, Int, Int, Int)] = {
    val uri = params.get("textDocument").get("uri").asText
    val pos = params.get("position")
    val (lineNo, chNo) = (pos.get("line").asInt, pos.get("character").asInt)
    docs.get(uri).flatMap { text =>
      val lines = text.split('\n')
      if (lineNo >= lines.length) None
      else {
        val l = lines(lineNo)
        def isWord(c: Char) = c.isLetterOrDigit || c == '_' || c == '.'
        var a = math.min(chNo, l.length); var b = a
        while (a > 0 && isWord(l(a - 1))) a -= 1
        while (b < l.length && isWord(l(b))) b += 1
        if (a == b) None else Some((l.substring(a, b), lineNo, a, b))
      }
    }
  }

  /** textDocument/prepareRename (reference lsp/rename.py:21): renameable
    * symbols are CTE aliases (document-local) and project model names
    * (cross-file). Anything else → null, so the editor never opens a
    * rename box it can't honor. */
  private def prepareRename(params: JsonNode): JsonNode =
    wordRangeAt(params).flatMap { case (word, line, a, b) =>
      val uri = params.get("textDocument").get("uri").asText
      val isCte = docs.get(uri).exists(t => cteNames(t).contains(word))
      if (isCte || modelIndex.contains(word)) {
        val res = mapper.createObjectNode()
        val r = res.putObject("range")
        val s = r.putObject("start"); s.put("line", line); s.put("character", a)
        val e = r.putObject("end"); e.put("line", line); e.put("character", b)
        res.put("placeholder", word)
        Some(res: JsonNode)
      } else None
    }.getOrElse(mapper.nullNode())

  /** textDocument/rename: CTE aliases rename every occurrence in the
    * document; model names rename across the project — the declaring file
    * plus every file that references the model (open-document overlays
    * included), as one WorkspaceEdit keyed by uri. */
  private def rename(params: JsonNode): JsonNode = {
    val newName = params.get("newName").asText
    wordRangeAt(params).flatMap { case (word, _, _, _) =>
      val uri = params.get("textDocument").get("uri").asText
      // lookahead admits a following '.' — `base.x` references the CTE/model
      // `base` as a qualifier and must rename with it; a PRECEDING '.' still
      // rejects (`o.base` is a column on another relation, not this symbol)
      val re = ("(?<![\\w.])" + java.util.regex.Pattern.quote(word) + "(?!\\w)").r
      def editsIn(text: String): ArrayNode = {
        val edits = mapper.createArrayNode()
        // match over masked text (position-preserving): occurrences inside
        // comments and string literals are not the symbol and must survive
        maskNonCode(text).split('\n').iterator.zipWithIndex.foreach { case (l, i) =>
          re.findAllMatchIn(l).foreach { m =>
            val e = edits.addObject()
            val r = e.putObject("range")
            val s = r.putObject("start"); s.put("line", i); s.put("character", m.start)
            val en = r.putObject("end"); en.put("line", i); en.put("character", m.end)
            e.put("newText", newName)
          }
        }
        edits
      }
      if (docs.get(uri).exists(t => cteNames(t).contains(word))) {
        val res = mapper.createObjectNode()
        res.putObject("changes").set[JsonNode](uri, editsIn(docs(uri)))
        Some(res: JsonNode)
      } else if (modelIndex.contains(word)) {
        val res = mapper.createObjectNode()
        val changes = res.putObject("changes")
        val files = (modelIndex(word)._1 +:
          modelIndex.values.map(_._1).toSeq).distinct.sorted
        files.foreach { file =>
          scala.util.Try {
            val text = textOf(file)
            if (re.findFirstIn(maskNonCode(text)).isDefined) {
              val furi = java.nio.file.Paths.get(file).toUri.toString
              changes.set[JsonNode](furi, editsIn(text))
            }
          }
        }
        Some(res: JsonNode)
      } else None
    }.getOrElse(mapper.nullNode())
  }

  /** textDocument/documentHighlight (reference lsp/main.py:826): light up
    * every occurrence of the CTE alias or model name under the cursor in
    * this document — the same symbols rename accepts. Kind 1 = Text. */
  private def documentHighlights(params: JsonNode): ArrayNode = {
    val arr = mapper.createArrayNode()
    val uri = params.get("textDocument").get("uri").asText
    wordRangeAt(params).foreach { case (word, _, _, _) =>
      val known = docs.get(uri).exists(t => cteNames(t).contains(word)) ||
        modelIndex.contains(word)
      if (known) {
        val re = ("(?<![\\w.])" + java.util.regex.Pattern.quote(word) + "(?!\\w)").r
        maskNonCode(docs.getOrElse(uri, "")).split('\n').iterator.zipWithIndex.foreach {
          case (l, i) => re.findAllMatchIn(l).foreach { m =>
            val h = arr.addObject()
            val r = h.putObject("range")
            val s = r.putObject("start"); s.put("line", i); s.put("character", m.start)
            val e = r.putObject("end"); e.put("line", i); e.put("character", m.end)
            h.put("kind", 1)
          }
        }
      }
    }
    arr
  }

  /** graft/supportedMethods (reference lsp/custom.py:104
    * sqlmesh/supported_methods): the dispatch table as data, so clients can
    * feature-detect instead of probing with requests that may 404. */
  private def supportedMethods(): ArrayNode = {
    val arr = mapper.createArrayNode()
    Seq("textDocument/completion", "textDocument/hover",
      "textDocument/definition", "textDocument/references",
      "textDocument/formatting", "workspace/symbol",
      "textDocument/codeAction", "textDocument/prepareRename",
      "textDocument/rename", "textDocument/inlayHint",
      "textDocument/codeLens", "textDocument/documentHighlight",
      "graft/supportedMethods", "graft/allModels",
      "graft/allModelsForRender", "graft/renderModel",
      "graft/formatProject", "graft/getModels", "graft/getEnvironments",
      "graft/listWorkspaceTests", "graft/listDocumentTests",
      "graft/runTest").foreach { m =>
      arr.addObject().put("name", m)
    }
    arr
  }

  // ---------------------------------------- custom methods (lsp/custom.py)

  /** Parsed models of every indexed file, overlay-aware, one parse per
    * file per request — the project is editor-sized; tolerant per file. */
  private def projectModels(): Seq[graft.core.Model] =
    modelIndex.values.map(_._1).toSeq.distinct.sorted.flatMap { f =>
      scala.util.Try(
        graft.loader.ModelLoader.parseAll(textOf(f), f)).getOrElse(Nil)
    }

  /** graft/allModels (reference lsp/custom.py:17 sqlmesh/all_models):
    * completion data as DATA — model names with descriptions plus the
    * builtin @-macro names — for clients that render their own pickers. */
  private def allModels(): ObjectNode = {
    val res = mapper.createObjectNode()
    val models = res.putArray("models")
    val parsed = projectModels().map(m => m.name -> m).toMap
    modelIndex.keys.toSeq.sorted.foreach { name =>
      val o = models.addObject()
      o.put("name", name)
      parsed.get(name).flatMap(_.description).foreach(o.put("description", _))
    }
    val macros = res.putArray("macros")
    graft.macros.MacroEvaluator.builtinNames.foreach(n =>
      macros.addObject().put("name", s"@$n"))
    res
  }

  /** graft/allModelsForRender (reference lsp/custom.py:78): the render
    * dropdown's model list — name, fqn, declaring uri. */
  private def allModelsForRender(): ObjectNode = {
    val res = mapper.createObjectNode()
    val arr = res.putArray("models")
    modelIndex.toSeq.sortBy(_._1).foreach { case (name, (file, _)) =>
      val o = arr.addObject()
      o.put("name", name.split('.').last)
      o.put("fqn", name)
      o.put("uri", java.nio.file.Paths.get(file).toUri.toString)
    }
    res
  }

  /** graft/renderModel (reference lsp/custom.py:52 sqlmesh/render_model):
    * macro-expanded SQL for every model in the given document, overlay-
    * aware. Tables keep their LOGICAL names (identity mapping) — the
    * preview shows the query a plan would render, not physical snapshot
    * tables. `start`/`end` (epoch ms) are optional; default one UTC day
    * ending at the request's wall clock. Per-model errors are reported in
    * the entry, never failing the sibling renders. */
  private def renderModel(params: JsonNode): ObjectNode = {
    val res = mapper.createObjectNode()
    val arr = res.putArray("entries")
    val uri = Option(params.get("textDocumentUri")).map(_.asText)
      .orElse(Option(params.get("textDocument")).map(_.path("uri").asText))
      .getOrElse("")
    val text = docs.getOrElse(uri,
      scala.util.Try(java.nio.file.Files.readString(
        java.nio.file.Paths.get(uriToPath(uri)))).getOrElse(""))
    val end = Option(params.get("end")).map(_.asLong)
      .getOrElse(System.currentTimeMillis / 86400000L * 86400000L)
    val start = Option(params.get("start")).map(_.asLong)
      .getOrElse(end - 86400000L)
    val mapping = modelIndex.keys.map(n => n -> n).toMap
    scala.util.Try(graft.loader.ModelLoader.parseAll(text, uri))
      .getOrElse(Nil).foreach { m =>
        val e = arr.addObject()
        e.put("name", m.name.split('.').last)
        e.put("fqn", m.name)
        m.description.foreach(e.put("description", _))
        scala.util.Try(graft.plans.Renderer.render(
            m, start, end, end, mapping + (m.name -> m.name))) match {
          case scala.util.Success(sql) => e.put("definition", sql)
          case scala.util.Failure(ex)  =>
            e.put("response_error", String.valueOf(ex.getMessage))
        }
      }
    res
  }

  /** graft/formatProject (reference lsp/custom.py:131
    * sqlmesh/format_project): [[graft.loader.SqlFormatter]] over every
    * indexed project file. Files with an OPEN editor overlay format the
    * OVERLAY text (unsaved edits are formatted, never discarded for stale
    * disk content) and round-trip through a `workspace/applyEdit` request —
    * the EDITOR BUFFER receives the formatted text and syncs back via
    * didChange — instead of a silent disk write the client's dirty buffer
    * would clobber on its next save. Closed files are rewritten in place. */
  private def formatProject(): ObjectNode = {
    val res = mapper.createObjectNode()
    val changed = res.putArray("files")
    var n = 0
    modelIndex.values.map(_._1).toSeq.distinct.sorted.foreach { f =>
      scala.util.Try {
        val path = java.nio.file.Paths.get(f)
        val furi = path.toUri.toString
        val overlay = docs.get(furi)
        val text = overlay.getOrElse(java.nio.file.Files.readString(path))
        val formatted = graft.loader.SqlFormatter.formatFile(text)
        if (formatted != text) {
          if (overlay.isDefined) {
            // full-document TextEdit: a huge end position is the standard
            // whole-buffer replacement (clients clamp to document end)
            val p = mapper.createObjectNode()
            val edit = p.putObject("edit")
            val te = edit.putObject("changes").putArray(furi).addObject()
            val range = te.putObject("range")
            range.putObject("start").put("line", 0).put("character", 0)
            range.putObject("end").put("line", Int.MaxValue).put("character", 0)
            te.put("newText", formatted)
            sendRequest("workspace/applyEdit", p)
            // the overlay is NOT mutated here: the client applies the edit
            // and echoes it back as didChange, keeping one source of truth.
            // Fire-and-forget by design: the applyEdit response is dropped,
            // so a client that rejects the edit still counts the file in
            // `formatted` — acceptable because the overlay stays authoritative
            // (a rejected edit simply never echoes back as didChange)
          } else java.nio.file.Files.writeString(path, formatted)
          changed.add(f); n += 1
        }
      }
    }
    res.put("formatted", n)
    res
  }

  /** graft/getModels (reference lsp/custom.py:231 sqlmesh/get_models): the
    * model list feeding table-diff pickers — name, fqn, description —
    * from the same overlay-aware index as [[allModels]]. */
  private def getModels(): ObjectNode = {
    val res = mapper.createObjectNode()
    val arr = res.putArray("models")
    val parsed = projectModels().map(m => m.name -> m).toMap
    modelIndex.keys.toSeq.sorted.foreach { name =>
      val o = arr.addObject()
      o.put("name", name.split('.').last)
      o.put("fqn", name)
      parsed.get(name).flatMap(_.description).foreach(o.put("description", _))
    }
    res
  }

  /** graft/getEnvironments (reference lsp/custom.py:161
    * sqlmesh/get_environments): environment records from the project's
    * default durable state root (`<project>/.graft/state` — the CLI's
    * --workspace default); absent state → empty list, never an error. */
  private def getEnvironments(): ObjectNode = {
    val res = mapper.createObjectNode()
    val arr = res.putArray("environments")
    root.map(r => s"$r/.graft/state").foreach { stateDir =>
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(stateDir)))
        scala.util.Try(new graft.state.FileStateStore(stateDir).environments)
          .getOrElse(Nil).sortBy(_.name).foreach { e =>
            val o = arr.addObject()
            o.put("name", e.name)
            o.put("finalized", e.finalized)
            o.put("snapshots", e.snapshots.size)
            e.expirationTs.foreach(o.put("expiration_ts", _))
          }
    }
    res
  }

  /** Top-level YAML test entries of one file: (name, 0-based line), the
    * same scan the code-lens feature uses — keys whose block has `model:`. */
  private def testEntriesIn(text: String): Seq[(String, Int)] = {
    val lines = text.split('\n')
    val keyRe = "^([A-Za-z_]\\w*):\\s*$".r
    val tops = lines.iterator.zipWithIndex
      .flatMap { case (l, i) => keyRe.findFirstMatchIn(l).map(m => (m.group(1), i)) }
      .toSeq
    tops.zipWithIndex.collect { case ((name, line), idx)
        if lines.slice(line, tops.lift(idx + 1).map(_._2).getOrElse(lines.length))
          .exists(_.matches("\\s+model:.*")) =>
      (name, line)
    }
  }

  private def testEntryNode(arr: ArrayNode, file: String, name: String,
                            line: Int): Unit = {
    val o = arr.addObject()
    o.put("name", name)
    o.put("uri", java.nio.file.Paths.get(file).toUri.toString)
    val r = o.putObject("range")
    val st = r.putObject("start"); st.put("line", line); st.put("character", 0)
    val en = r.putObject("end"); en.put("line", line); en.put("character", name.length)
  }

  /** graft/listWorkspaceTests (reference lsp/custom.py:150): every YAML
    * unit test under `<project>/tests` with its range (the CLI's test-dir
    * convention; reference tests_ranges.py walks the same way). */
  private def listWorkspaceTests(): ObjectNode = {
    val res = mapper.createObjectNode()
    val arr = res.putArray("tests")
    root.map(r => java.nio.file.Paths.get(r, "tests")).foreach { d =>
      if (java.nio.file.Files.isDirectory(d)) {
        val it = java.nio.file.Files.walk(d)
        try {
          import scala.jdk.CollectionConverters._
          it.iterator().asScala
            .filter(p => (p.toString.endsWith(".yaml") || p.toString.endsWith(".yml")) &&
              java.nio.file.Files.isRegularFile(p))
            .toSeq.sortBy(_.toString).foreach { p =>
              scala.util.Try(testEntriesIn(textOf(p.toString))).getOrElse(Nil)
                .foreach { case (name, line) => testEntryNode(arr, p.toString, name, line) }
            }
        } finally it.close()
      }
    }
    res
  }

  /** graft/listDocumentTests (reference lsp/custom.py:186): the same
    * entries for ONE document (overlay-aware). */
  private def listDocumentTests(params: JsonNode): ObjectNode = {
    val res = mapper.createObjectNode()
    val arr = res.putArray("tests")
    val uri = Option(params.get("textDocumentUri")).map(_.asText)
      .orElse(Option(params.get("textDocument")).map(_.path("uri").asText))
      .getOrElse("")
    val file = uriToPath(uri)
    scala.util.Try(testEntriesIn(textOf(file))).getOrElse(Nil)
      .foreach { case (name, line) => testEntryNode(arr, file, name, line) }
    res
  }

  /** graft/runTest (reference lsp/custom.py:197 sqlmesh/run_test): run one
    * YAML unit test through the host-injected runner (the CLI host wires
    * [[graft.testing.YamlModelTest]] behind a lazily-started Spark
    * session); a server without a runner reports response_error rather
    * than pretending the test passed. */
  private def runTest(params: JsonNode): ObjectNode = {
    val res = mapper.createObjectNode()
    val name = Option(params.get("test")).orElse(Option(params.get("name")))
      .map(_.asText).getOrElse("")
    val uri = Option(params.get("textDocumentUri")).map(_.asText)
      .orElse(Option(params.get("uri")).map(_.asText)).getOrElse("")
    testRunner.zip(root) match {
      case None =>
        res.put("response_error",
          if (testRunner.isEmpty)
            "test running is not available in this server (no Spark host)"
          else "test running needs a project root (initialize rootUri or --project)")
      case Some((run, proj)) =>
        scala.util.Try(run(proj, name, uriToPath(uri))) match {
          case scala.util.Failure(ex) =>
            res.put("response_error", String.valueOf(ex.getMessage))
          case scala.util.Success(results) =>
            val arr = res.putArray("results")
            results.foreach { case (n, failure) =>
              val o = arr.addObject()
              o.put("name", n)
              o.put("success", failure.isEmpty)
              failure.foreach(o.put("failure", _))
            }
            res.put("success", results.nonEmpty && results.forall(_._2.isEmpty))
        }
    }
    res
  }

  // ------------------------------------------------------- inlay hints

  /** textDocument/inlayHint (reference lsp/hints.py:15): type hints for
    * SELECT output columns of a model with a DECLARED `columns (...)`
    * schema — after `AS alias` aliases and after bare column names that
    * are select-list items on their own line. Alias hints skip lines with
    * an explicit cast (the type is already on screen — the reference skips
    * exp.Cast the same way). */
  private def inlayHints(params: JsonNode): ArrayNode = {
    val arr = mapper.createArrayNode()
    val uri = params.get("textDocument").get("uri").asText
    val text = docs.getOrElse(uri, "")
    if (text.isEmpty) return arr
    val range = Option(params.get("range"))
    val (from, to) = (
      range.map(_.path("start").path("line").asInt(0)).getOrElse(0),
      range.map(_.path("end").path("line").asInt(Int.MaxValue))
        .getOrElse(Int.MaxValue))
    val declared: Map[String, String] = scala.util.Try(
      graft.loader.ModelLoader.parseAll(text, uri)).getOrElse(Nil)
      .flatMap(_.columns).map { case (c, t) => c.toLowerCase -> t }.toMap
    if (declared.isEmpty) return arr
    def add(line: Int, ch: Int, tpe: String): Unit = {
      val h = arr.addObject()
      val p = h.putObject("position"); p.put("line", line); p.put("character", ch)
      h.put("label", s": $tpe"); h.put("kind", 1); h.put("paddingLeft", true)
    }
    val aliasRe = "(?i)\\bAS\\s+([A-Za-z_]\\w*)".r
    val bareRe = "^\\s*([A-Za-z_]\\w*)\\s*,?\\s*$".r
    val masked = maskNonCode(text).split('\n')
    masked.iterator.zipWithIndex
      .filter { case (_, i) => i >= from && i <= to }
      .foreach { case (l, i) =>
        if (!l.toLowerCase.contains("cast(") && !l.toLowerCase.contains("cast ("))
          aliasRe.findAllMatchIn(l).foreach { m =>
            declared.get(m.group(1).toLowerCase).foreach(add(i, m.end, _)) }
        bareRe.findFirstMatchIn(l).foreach { m =>
          declared.get(m.group(1).toLowerCase)
            .foreach(add(i, m.end(1), _)) }
      }
    arr
  }

  // -------------------------------------------------------- code lenses

  /** textDocument/codeLens (reference lsp/tests_ranges.py:13): each test in
    * a YAML unit-test file surfaces as a runnable lens — top-level keys
    * whose block declares a `model:`, with a `graft.test <name>` command
    * the client binds to `graft test` (the vscode extension does). */
  private def codeLenses(params: JsonNode): ArrayNode = {
    val arr = mapper.createArrayNode()
    val uri = params.get("textDocument").get("uri").asText
    if (!uri.endsWith(".yml") && !uri.endsWith(".yaml")) return arr
    val text = docs.get(uri).orElse(scala.util.Try(
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(uriToPath(uri)))).toOption).getOrElse("")
    val lines = text.split('\n')
    val keyRe = "^([A-Za-z_]\\w*):\\s*$".r
    val tops = lines.iterator.zipWithIndex
      .flatMap { case (l, i) => keyRe.findFirstMatchIn(l).map(m => (m.group(1), i)) }
      .toSeq
    tops.zipWithIndex.foreach { case ((name, line), idx) =>
      val blockEnd = tops.lift(idx + 1).map(_._2).getOrElse(lines.length)
      val block = lines.slice(line, blockEnd)
      if (block.exists(_.matches("\\s+model:.*"))) {
        val lens = arr.addObject()
        val r = lens.putObject("range")
        val s = r.putObject("start"); s.put("line", line); s.put("character", 0)
        val e = r.putObject("end"); e.put("line", line); e.put("character", name.length)
        val c = lens.putObject("command")
        c.put("title", s"Run test $name")
        c.put("command", "graft.test")
        c.putArray("arguments").add(name).add(uriToPath(uri))
      }
    }
    arr
  }

  private def formatting(params: JsonNode): JsonNode = {
    val uri = params.get("textDocument").get("uri").asText
    val text = docs.getOrElse(uri, "")
    val formatted = graft.loader.SqlFormatter.formatFile(text)
    val edits = mapper.createArrayNode()
    if (formatted != text) {
      val e = edits.addObject()
      val r = e.putObject("range")
      val s = r.putObject("start"); s.put("line", 0); s.put("character", 0)
      // exact end-of-document: split with limit -1 keeps trailing empty
      // lines (plain split drops them, leaving stray newlines outside the
      // replaced range on every format pass)
      val lines = text.split("\n", -1)
      val en = r.putObject("end")
      en.put("line", lines.length - 1); en.put("character", lines.last.length)
      e.put("newText", formatted)
    }
    edits
  }
}
