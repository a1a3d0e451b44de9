package graft.lsp

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The in-repo VSCode extension (vscode/package.json + extension.js —
  * reference surface: vscode/extension in the reference repo) is plain
  * JavaScript against the host-provided `vscode` module with a hand-rolled
  * stdio LSP client, so no JS toolchain exists to compile it here. This
  * spec pins what CAN break silently: the manifest's JSON shape, the
  * command registry wiring, and — crucially — that every LSP method the
  * client sends is one the graft server actually dispatches. */
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

  test("extension.js is balanced (string-level syntax sanity)") {
    // no JS engine in this container: catch the gross corruption classes —
    // unbalanced braces/parens/brackets outside string literals
    val stripped = js.replaceAll("\"(\\\\.|[^\"\\\\])*\"", "\"\"")
      .replaceAll("'(\\\\.|[^'\\\\])*'", "''")
      .replaceAll("(?m)//.*$", "")
    Seq('{' -> '}', '(' -> ')', '[' -> ']').foreach { case (o, c) =>
      assert(stripped.count(_ == o) == stripped.count(_ == c),
        s"unbalanced $o$c in extension.js")
    }
  }
}
