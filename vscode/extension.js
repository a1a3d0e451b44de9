// Graft VSCode extension (reference surface: /root/reference/vscode/extension
// — TypeScript + vscode-languageclient + a bundled React panel). Re-expressed
// dependency-free: plain JavaScript against the host-provided `vscode` module
// only, with a minimal hand-rolled LSP client over stdio (Content-Length
// framing), so the extension needs NO npm install and no bundler — `graft lsp`
// is the server (src/main/scala/graft/lsp/LspServer.scala).
"use strict";
const vscode = require("vscode");
const cp = require("child_process");

let server = null; // child process running `graft lsp`
let nextId = 1;
const pending = new Map(); // request id -> resolve fn
let diagnostics = null; // vscode.DiagnosticCollection
let output = null; // one shared OutputChannel for CLI commands
let buffer = Buffer.alloc(0);

function config() {
  const c = vscode.workspace.getConfiguration("graft");
  const ws = vscode.workspace.workspaceFolders;
  let project = c.get("projectPath");
  if (!project) {
    if (ws && ws.length) project = ws[0].uri.fsPath;
    else {
      // a lone file without a workspace: '.' would be the extension HOST's
      // cwd, not a graft project — say so instead of silently mis-loading
      vscode.window.showWarningMessage(
        "Graft: no workspace folder and graft.projectPath is unset - " +
        "open the project folder or set graft.projectPath.");
      project = ".";
    }
  }
  return { command: c.get("command") || "graft", project: project };
}

/** Settle every in-flight request with null — a dead/restarted server must
  * not leave provider awaits hanging as perpetual spinners. */
function drainPending() {
  pending.forEach((resolve) => resolve(null));
  pending.clear();
}

// ---------------------------------------------------------------- transport

function send(msg) {
  if (!server) return;
  const body = Buffer.from(JSON.stringify(msg), "utf8");
  server.stdin.write("Content-Length: " + body.length + "\r\n\r\n");
  server.stdin.write(body);
}

function request(method, params) {
  const id = nextId++;
  return new Promise((resolve) => {
    pending.set(id, resolve);
    send({ jsonrpc: "2.0", id: id, method: method, params: params });
  });
}

function notify(method, params) {
  send({ jsonrpc: "2.0", method: method, params: params });
}

function onData(chunk) {
  buffer = Buffer.concat([buffer, chunk]);
  for (;;) {
    const headerEnd = buffer.indexOf("\r\n\r\n");
    if (headerEnd < 0) return;
    const header = buffer.slice(0, headerEnd).toString("utf8");
    const m = /Content-Length:\s*(\d+)/i.exec(header);
    if (!m) { buffer = buffer.slice(headerEnd + 4); continue; }
    const len = parseInt(m[1], 10);
    if (buffer.length < headerEnd + 4 + len) return; // wait for the rest
    const body = buffer.slice(headerEnd + 4, headerEnd + 4 + len).toString("utf8");
    buffer = buffer.slice(headerEnd + 4 + len);
    let msg;
    try { msg = JSON.parse(body); } catch (e) { continue; }
    if (msg.id !== undefined && pending.has(msg.id)) {
      const resolve = pending.get(msg.id);
      pending.delete(msg.id);
      resolve(msg.result);
    } else if (msg.method === "workspace/applyEdit") {
      // server->client request (formatProject routes open-buffer formats
      // here so the editor buffer gets the text instead of a disk write
      // the dirty buffer would clobber); apply and answer
      applyWorkspaceEdit(msg.params && msg.params.edit).then((ok) => {
        send({ jsonrpc: "2.0", id: msg.id, result: { applied: ok } });
      });
    } else if (msg.method === "textDocument/publishDiagnostics") {
      publishDiagnostics(msg.params);
    }
  }
}

// ----------------------------------------------------------------- features

function toVsRange(r) {
  return new vscode.Range(r.start.line, r.start.character, r.end.line, r.end.character);
}

async function applyWorkspaceEdit(edit) {
  if (!edit || !edit.changes) return false;
  try {
    const we = new vscode.WorkspaceEdit();
    for (const uri of Object.keys(edit.changes)) {
      for (const te of edit.changes[uri]) {
        we.replace(vscode.Uri.parse(uri), toVsRange(te.range), te.newText);
      }
    }
    return await vscode.workspace.applyEdit(we);
  } catch (e) {
    return false;
  }
}

function publishDiagnostics(params) {
  const ds = (params.diagnostics || []).map((d) => {
    const sev = d.severity === 1
      ? vscode.DiagnosticSeverity.Error
      : vscode.DiagnosticSeverity.Warning;
    const diag = new vscode.Diagnostic(toVsRange(d.range), d.message, sev);
    diag.source = d.source;
    return diag;
  });
  diagnostics.set(vscode.Uri.parse(params.uri), ds);
}

function docPos(document, position) {
  return {
    textDocument: { uri: document.uri.toString() },
    position: { line: position.line, character: position.character },
  };
}

function startServer(context) {
  const cfg = config();
  const child = cp.spawn(cfg.command, ["lsp", "--project", cfg.project], {
    stdio: ["pipe", "pipe", "pipe"],
  });
  server = child;
  child.stdout.on("data", onData);
  child.stderr.on("data", (d) => console.error("[graft-lsp] " + d));
  // only null out OUR OWN slot: after a restart, the old child's async exit
  // must not clobber the freshly spawned server and silence the extension
  child.on("exit", () => {
    if (server === child) { server = null; drainPending(); }
  });
  // a missing/broken `graft` binary must degrade to a message, not crash
  // the extension host (an unhandled 'error' event throws)
  child.on("error", (e) => {
    if (server === child) { server = null; drainPending(); }
    vscode.window.showErrorMessage("Graft: failed to start '" + cfg.command +
      " lsp' - " + e.message);
  });
  child.stdin.on("error", () => {});
  request("initialize", {
    rootUri: vscode.Uri.file(cfg.project).toString(),
    capabilities: {},
  }).then(() => {
    notify("initialized", {});
    // open every visible graft .sql document so diagnostics appear
    vscode.workspace.textDocuments.forEach(openDoc);
  });
}

function openDoc(document) {
  if (document.languageId !== "sql" || !server) return;
  notify("textDocument/didOpen", {
    textDocument: {
      uri: document.uri.toString(),
      languageId: "sql",
      version: document.version,
      text: document.getText(),
    },
  });
}

function stopServer() {
  if (!server) return;
  notify("exit", {});
  server.kill();
  server = null;
  drainPending();
  buffer = Buffer.alloc(0);
}

function runCli(args, title) {
  const cfg = config();
  const out = output; // one shared channel, created at activate()
  out.show(true);
  out.appendLine("$ " + cfg.command + " " + args.join(" "));
  const p = cp.spawn(cfg.command, args.concat(["--project", cfg.project]));
  // same hazard as the LSP spawn: a missing binary emits 'error', and an
  // unhandled 'error' event would crash the command in the extension host
  p.on("error", (e) => out.appendLine(title + " failed to start: " + e.message));
  p.stdout.on("data", (d) => out.append(d.toString()));
  p.stderr.on("data", (d) => out.append(d.toString()));
  p.on("exit", (code) => out.appendLine(title + " exited with " + code));
}

/** Run the CLI capturing stdout (stderr goes to the output channel), then
  * hand the text to `done(code, stdout)` — the webview commands need the
  * payload, not a console dump. */
function runCliCapture(args, title, done) {
  const cfg = config();
  const out = output;
  out.appendLine("$ " + cfg.command + " " + args.join(" "));
  const p = cp.spawn(cfg.command, args.concat(["--project", cfg.project]));
  let stdout = "";
  p.on("error", (e) => {
    out.appendLine(title + " failed to start: " + e.message);
    done(-1, "");
  });
  p.stdout.on("data", (d) => { stdout += d.toString(); });
  p.stderr.on("data", (d) => out.append(d.toString()));
  p.on("exit", (code) => done(code, stdout));
}

function activate(context) {
  diagnostics = vscode.languages.createDiagnosticCollection("graft");
  output = vscode.window.createOutputChannel("Graft");
  context.subscriptions.push(output);
  startServer(context);

  context.subscriptions.push(
    diagnostics,
    vscode.workspace.onDidOpenTextDocument(openDoc),
    vscode.workspace.onDidChangeTextDocument((e) => {
      if (e.document.languageId !== "sql" || !server) return;
      notify("textDocument/didChange", {
        textDocument: { uri: e.document.uri.toString(), version: e.document.version },
        contentChanges: [{ text: e.document.getText() }],
      });
    }),
    vscode.workspace.onDidSaveTextDocument((d) => {
      if (d.languageId !== "sql" || !server) return;
      notify("textDocument/didSave", { textDocument: { uri: d.uri.toString() } });
    }),
    vscode.workspace.onDidCloseTextDocument((d) => {
      if (d.languageId !== "sql" || !server) return;
      notify("textDocument/didClose", { textDocument: { uri: d.uri.toString() } });
      diagnostics.delete(d.uri);
    }),

    vscode.languages.registerCompletionItemProvider({ language: "sql" }, {
      async provideCompletionItems(document, position) {
        const items = await request("textDocument/completion", docPos(document, position));
        return (items || []).map((i) => {
          const kind = i.kind === 3
            ? vscode.CompletionItemKind.Function
            : i.kind === 14
              ? vscode.CompletionItemKind.Keyword
              : vscode.CompletionItemKind.Module;
          const item = new vscode.CompletionItem(i.label, kind);
          item.detail = i.detail;
          return item;
        });
      },
    }, "@", "."),

    vscode.languages.registerHoverProvider({ language: "sql" }, {
      async provideHover(document, position) {
        const h = await request("textDocument/hover", docPos(document, position));
        if (!h || !h.contents) return null;
        return new vscode.Hover(new vscode.MarkdownString(h.contents.value));
      },
    }),

    vscode.languages.registerDefinitionProvider({ language: "sql" }, {
      async provideDefinition(document, position) {
        const loc = await request("textDocument/definition", docPos(document, position));
        if (!loc || !loc.uri) return null;
        return new vscode.Location(vscode.Uri.parse(loc.uri), toVsRange(loc.range));
      },
    }),

    vscode.languages.registerReferenceProvider({ language: "sql" }, {
      async provideReferences(document, position, ctx) {
        const params = docPos(document, position);
        params.context = { includeDeclaration: ctx.includeDeclaration };
        const locs = await request("textDocument/references", params);
        return (locs || []).map((l) =>
          new vscode.Location(vscode.Uri.parse(l.uri), toVsRange(l.range)));
      },
    }),

    vscode.languages.registerWorkspaceSymbolProvider({
      async provideWorkspaceSymbols(query) {
        const syms = await request("workspace/symbol", { query: query || "" });
        return (syms || []).map((s) => new vscode.SymbolInformation(
          s.name, vscode.SymbolKind.Class, "",
          new vscode.Location(vscode.Uri.parse(s.location.uri), toVsRange(s.location.range))));
      },
    }),

    vscode.languages.registerCodeActionsProvider({ language: "sql" }, {
      async provideCodeActions(document, range) {
        const actions = await request("textDocument/codeAction", {
          textDocument: { uri: document.uri.toString() },
          range: {
            start: { line: range.start.line, character: range.start.character },
            end: { line: range.end.line, character: range.end.character },
          },
          context: { diagnostics: [] },
        });
        return (actions || []).map((a) => {
          const action = new vscode.CodeAction(a.title, vscode.CodeActionKind.QuickFix);
          const edit = new vscode.WorkspaceEdit();
          const changes = a.edit && a.edit.changes ? a.edit.changes : {};
          Object.keys(changes).forEach((uri) => {
            changes[uri].forEach((e) => {
              edit.replace(vscode.Uri.parse(uri), toVsRange(e.range), e.newText);
            });
          });
          action.edit = edit;
          return action;
        });
      },
    }),

    vscode.languages.registerDocumentFormattingEditProvider({ language: "sql" }, {
      async provideDocumentFormattingEdits(document) {
        const edits = await request("textDocument/formatting", {
          textDocument: { uri: document.uri.toString() },
          options: {},
        });
        return (edits || []).map((e) =>
          vscode.TextEdit.replace(toVsRange(e.range), e.newText));
      },
    }),

    vscode.commands.registerCommand("graft.renderModel", () => {
      const editor = vscode.window.activeTextEditor;
      if (!editor) return;
      const m = /\bname\s+([A-Za-z0-9_.]+)/.exec(editor.document.getText());
      if (!m) {
        vscode.window.showWarningMessage("Graft: no MODEL name in this file");
        return;
      }
      // render preview panel (reference vscode webviews): the server
      // produces the whole page — rendered SQL + the SPA's lineage SVG —
      // so the webview is a dumb host with no scripts enabled
      runCliCapture(["render", m[1], "--html"], "render", (code, html) => {
        if (code !== 0 || !html.trim()) {
          vscode.window.showErrorMessage("Graft: render " + m[1] + " failed (exit " + code + ")");
          return;
        }
        const panel = vscode.window.createWebviewPanel(
          "graftRender", "render " + m[1],
          vscode.ViewColumn.Beside, {});
        panel.webview.html = html;
      });
    }),
    vscode.commands.registerCommand("graft.formatProject", () =>
      runCli(["format"], "format")),
    vscode.commands.registerCommand("graft.lintProject", () =>
      runCli(["lint"], "lint")),
    vscode.commands.registerCommand("graft.restartServer", () => {
      stopServer();
      startServer(context);
    })
  );
}

function deactivate() {
  stopServer();
}

module.exports = { activate: activate, deactivate: deactivate };
