package graft.lsp

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The in-repo VSCode extension (vscode/package.json + extension.js —
  * reference surface: vscode/extension in the reference repo) is plain
  * JavaScript against the host-provided `vscode` module with a hand-rolled
  * stdio LSP client. No VSCode host runs here, but node does: this spec
  * pins the manifest's JSON shape, the command-registry wiring, that every
  * LSP method the client sends is one the graft server dispatches,
  * `node --check` parses of both JS files, and a headless END-TO-END where
  * a stubbed `vscode` module activates the extension against the REAL
  * `graft lsp` and lint diagnostics round-trip over real stdio framing. */
class VscodeExtensionSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()
  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")

  private lazy val pkg = mapper.readTree(read("vscode/package.json"))
  private lazy val js = read("vscode/extension.js")
  private lazy val serverSrc = read("src/main/scala/graft/lsp/LspServer.scala")

  test("manifest parses, main exists, activation + engines declared") {
    assert(pkg.get("name").asText == "graft")
    val main = pkg.get("main").asText.stripPrefix("./")
    assert(main == "extension.js" &&
      java.nio.file.Files.exists(java.nio.file.Paths.get("vscode", main)))
    assert(pkg.get("engines").has("vscode"))
    assert(pkg.get("activationEvents").toString.contains("onLanguage:sql"))
  }

  test("every contributed command registers a handler in extension.js") {
    val cmds = pkg.get("contributes").get("commands")
    assert(cmds.size >= 4)
    (0 until cmds.size).foreach { i =>
      val c = cmds.get(i).get("command").asText
      assert(js.contains(s"""registerCommand("$c""""),
        s"command $c has no registerCommand handler")
    }
    // menus only reference contributed commands
    val declared = (0 until cmds.size).map(cmds.get(_).get("command").asText).toSet
    val menus = pkg.get("contributes").get("menus")
    menus.properties().forEach { e =>
      e.getValue.forEach(m => assert(declared(m.get("command").asText)))
    }
  }

  test("the client speaks only methods the graft LSP server dispatches") {
    // every method string the JS sends must appear as a dispatch case in
    // LspServer.handle — a client request the server 404s would surface as
    // a broken editor feature, not a test failure, without this pin
    val sent = "\"(textDocument/[A-Za-z]+|workspace/[A-Za-z]+|initialize|initialized|exit)\"".r
      .findAllMatchIn(js).map(_.group(1)).toSet
    assert(sent.contains("textDocument/completion") &&
      sent.contains("textDocument/references") &&
      sent.contains("workspace/symbol") &&
      sent.contains("textDocument/codeAction"), sent)
    (sent - "textDocument/publishDiagnostics").foreach { m =>
      assert(serverSrc.contains(s""""$m""""),
        s"extension sends $m but LspServer has no dispatch case")
    }
    // ...and the notification the server pushes is handled
    assert(js.contains("textDocument/publishDiagnostics"))
  }

  test("the server spawn line matches the CLI contract") {
    // `graft lsp --project <dir>` is the documented fast path (Main.scala
    // intercepts `lsp` before SparkSession construction)
    assert(js.contains(""""lsp", "--project""""), "server spawn args drifted")
    // CLI helpers pass --project too (render/format/lint verbs accept it)
    assert(js.contains("""concat(["--project""""), "runCli lost --project")
  }

  test("node syntax-checks extension.js and the harness") {
    // node ships in this container: a parse error in either file would
    // otherwise only surface inside a real VSCode host
    Seq("vscode/extension.js", "vscode/test/headless.js").foreach { f =>
      val p = graft.core.Spawn.start(
        new ProcessBuilder("node", "--check", f).redirectErrorStream(true))
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      assert(p.waitFor() == 0, s"node --check $f failed:\n$out")
    }
  }

  test("headless end-to-end: the extension drives the REAL graft lsp in node") {
    // the harness stubs the `vscode` host module, activate() spawns the
    // actual server through a classpath shim, the stub's open buffer flows
    // through didOpen, and real lint diagnostics must come back over real
    // stdio framing — the closest thing to an editor this container can run
    val dir = java.nio.file.Files.createTempDirectory("vsx").toString
    val shim = java.nio.file.Paths.get(dir, "graft-shim.sh")
    val cp = System.getProperty("java.class.path")
    java.nio.file.Files.writeString(shim,
      s"""#!/bin/sh
         |exec java -cp '$cp' graft.Main "$$@"
         |""".stripMargin)
    shim.toFile.setExecutable(true)
    val proj = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "proj"))
    java.nio.file.Files.writeString(proj.resolve("daily.sql"),
      "MODEL (name hx.daily, kind FULL, owner 'dana', " +
        "audits (not_null(columns = (n))));\nSELECT 1 AS n\n")
    val pb = new ProcessBuilder("node", "vscode/test/headless.js")
      .redirectErrorStream(true)
    pb.environment().put("GRAFT_LSP_CMD", shim.toString)
    pb.environment().put("GRAFT_PROJECT", proj.toString)
    val p = graft.core.Spawn.start(pb)
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() == 0 && out.contains("HEADLESS OK"),
      s"headless harness failed:\n$out")
    // phase 2: graft.renderModel opened a webview whose HTML is the
    // server-rendered preview (rendered SQL + lineage SVG) — the harness
    // drives the registered command against the real `graft render --html`
    assert(out.contains("WEBVIEW OK"), s"render webview phase failed:\n$out")
  }

  test("extension.js is balanced (string-level syntax sanity)") {
    // complements node --check: catches corruption even where node is
    // absent. Linear scan, not regex — the alternation-in-loop string
    // pattern recurses ~1 frame/char and overflows on files this size
    val stripped = {
      val sb = new StringBuilder
      var i = 0; var quote: Char = 0
      while (i < js.length) {
        val c = js.charAt(i)
        if (quote != 0) {
          if (c == '\\') i += 1
          else if (c == quote) quote = 0
        } else if (c == '"' || c == '\'') quote = c
        else if (c == '/' && i + 1 < js.length && js.charAt(i + 1) == '/') {
          while (i < js.length && js.charAt(i) != '\n') i += 1
        } else sb.append(c)
        i += 1
      }
      sb.toString
    }
    Seq('{' -> '}', '(' -> ')', '[' -> ']').foreach { case (o, c) =>
      assert(stripped.count(_ == o) == stripped.count(_ == c),
        s"unbalanced $o$c in extension.js")
    }
  }
}
