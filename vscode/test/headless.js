// Headless end-to-end harness for the graft VSCode extension: plain node,
// no VSCode host — a stub `vscode` module records what the extension
// registers, activate() spawns the REAL `graft lsp` (via $GRAFT_LSP_CMD, a
// shim the Scala spec writes with the test JVM's classpath), the stub's one
// open document flows through didOpen, and the test passes when real
// diagnostics for its lint violations come back over real stdio framing.
//
// Usage: GRAFT_LSP_CMD=/path/shim GRAFT_PROJECT=/path/proj node headless.js
"use strict";
const assert = require("assert");
const path = require("path");
const Module = require("module");

const registered = { commands: [], providers: [] };
const handlers = {}; // command id -> handler, so the harness can invoke them
const panels = []; // webview panels the extension opened
let onDiagnostics = null;

function ctor(name) {
  const f = function () { this.__t = name; Array.prototype.push.apply(this.__a = [], arguments); };
  return f;
}
function disposable() { return { dispose() {} }; }
function provider(name) {
  return function () { registered.providers.push(name); return disposable(); };
}

const docUri = "file://" + (process.env.GRAFT_PROJECT || "/tmp") + "/buffer.sql";
// a buffer with two lint violations (no owner, no audits) — the extension
// must didOpen it and route publishDiagnostics back into the collection
const docText = "MODEL (name hx.buffer, kind FULL);\nSELECT 1 AS id\n";
const fakeDoc = {
  languageId: "sql",
  version: 1,
  uri: { toString: () => docUri },
  getText: () => docText,
};

const vscodeStub = {
  workspace: {
    getConfiguration: () => ({
      get: (k) => k === "command" ? process.env.GRAFT_LSP_CMD : (process.env.GRAFT_PROJECT || ""),
    }),
    workspaceFolders: [{ uri: { fsPath: process.env.GRAFT_PROJECT || "/tmp" } }],
    textDocuments: [fakeDoc],
    onDidOpenTextDocument: () => disposable(),
    onDidChangeTextDocument: () => disposable(),
    onDidSaveTextDocument: () => disposable(),
    onDidCloseTextDocument: () => disposable(),
    // server→client workspace/applyEdit lands here (formatProject routes
    // open-buffer formats through it); record and accept
    applyEdit: async (we) => { registered.appliedEdits = (registered.appliedEdits || 0) + 1; return true; },
  },
  window: {
    createOutputChannel: () => ({ append() {}, appendLine() {}, show() {} }),
    showWarningMessage: () => {},
    showErrorMessage: (m) => { console.error("EXT ERROR: " + m); },
    activeTextEditor: null,
    createWebviewPanel: (type, title) => {
      const p = { type: type, title: title, webview: { html: "" } };
      panels.push(p);
      return p;
    },
  },
  languages: {
    createDiagnosticCollection: () => ({
      set: (uri, ds) => { if (onDiagnostics) onDiagnostics(uri, ds); },
      delete() {},
      dispose() {},
    }),
    registerCompletionItemProvider: provider("completion"),
    registerHoverProvider: provider("hover"),
    registerDefinitionProvider: provider("definition"),
    registerReferenceProvider: provider("references"),
    registerWorkspaceSymbolProvider: provider("workspaceSymbol"),
    registerCodeActionsProvider: provider("codeActions"),
    registerDocumentFormattingEditProvider: provider("formatting"),
  },
  commands: {
    registerCommand: (id, fn) => {
      registered.commands.push(id);
      handlers[id] = fn;
      return disposable();
    },
  },
  ViewColumn: { Active: 1, Beside: 2 },
  Uri: {
    file: (p) => ({ toString: () => "file://" + p }),
    parse: (s) => ({ toString: () => s }),
  },
  Range: ctor("Range"),
  Position: ctor("Position"),
  Location: ctor("Location"),
  Hover: ctor("Hover"),
  MarkdownString: ctor("MarkdownString"),
  Diagnostic: function (range, message, severity) {
    this.range = range; this.message = message; this.severity = severity;
  },
  DiagnosticSeverity: { Error: 0, Warning: 1 },
  CompletionItem: ctor("CompletionItem"),
  CompletionItemKind: { Function: 1, Keyword: 2, Module: 3 },
  SymbolInformation: ctor("SymbolInformation"),
  SymbolKind: { Class: 4 },
  CodeAction: ctor("CodeAction"),
  CodeActionKind: { QuickFix: "quickfix" },
  WorkspaceEdit: function () { this.edits = []; this.replace = (...a) => this.edits.push(a); },
  TextEdit: { replace: (r, t) => ({ range: r, newText: t }) },
};

// intercept require("vscode")
const origResolve = Module._resolveFilename;
Module._resolveFilename = function (request, ...rest) {
  if (request === "vscode") return "vscode-stub";
  return origResolve.call(this, request, ...rest);
};
require.cache["vscode-stub"] = {
  id: "vscode-stub", filename: "vscode-stub", loaded: true, exports: vscodeStub,
};

const ext = require(path.join(__dirname, "..", "extension.js"));
const subs = [];

const timeout = setTimeout(() => {
  console.error("TIMEOUT: no diagnostics from the real graft lsp within 90s");
  process.exit(1);
}, 90000);

onDiagnostics = (uri, ds) => {
  if (!ds || !ds.length) return;
  try {
    assert.strictEqual(uri.toString(), docUri);
    const msgs = ds.map((d) => d.message).join("; ");
    assert(msgs.includes("nomissingowner"), "expected lint diagnostics, got: " + msgs);
    // registration surface: 4 commands, 7 language providers, disposables kept
    assert(registered.commands.length >= 4 &&
      registered.commands.includes("graft.renderModel"), registered.commands);
    assert.strictEqual(new Set(registered.providers).size, 7, registered.providers);
    assert(subs.length >= 10, "subscriptions not collected: " + subs.length);
    console.log("HEADLESS OK diagnostics=" + ds.length +
      " commands=" + registered.commands.length +
      " providers=" + registered.providers.length);
  } catch (e) {
    console.error("ASSERTION FAILED: " + (e && e.message));
    process.exit(1);
  }
  clearTimeout(timeout);
  onDiagnostics = null;
  // phase 2: the render webview — graft.renderModel must open a panel whose
  // HTML is the server-rendered preview (rendered SQL + lineage SVG) for
  // the model named in the active editor. The render CLI boots a Spark
  // session in this container, so this phase gets its own generous timeout.
  vscodeStub.window.activeTextEditor = {
    document: { getText: () => "MODEL (name hx.daily, kind FULL);" },
  };
  const webviewTimeout = setTimeout(() => {
    console.error("TIMEOUT: no webview HTML from graft render within 240s");
    process.exit(1);
  }, 240000);
  handlers["graft.renderModel"]();
  const poll = setInterval(() => {
    if (!panels.length || !panels[0].webview.html) return;
    clearInterval(poll);
    clearTimeout(webviewTimeout);
    try {
      const html = panels[0].webview.html;
      assert(panels[0].title.includes("hx.daily"), panels[0].title);
      assert(html.includes("hx.daily"), "webview html lacks the model name");
      assert(/SELECT/i.test(html), "webview html lacks the rendered query");
      assert(html.includes("<svg"), "webview html lacks the lineage SVG");
      console.log("WEBVIEW OK bytes=" + html.length);
    } catch (e) {
      console.error("ASSERTION FAILED: " + (e && e.message));
      process.exit(1);
    }
    ext.deactivate();
    process.exit(0);
  }, 250);
};

ext.activate({ subscriptions: subs });
