// Headless harness for the SPA's inline script: a micro-DOM + canned fetch
// responses, so the view functions (catalog / dag / lineage) actually RUN
// in node and their rendered HTML is asserted — not just parsed.
// Usage: node ui_harness.js <extracted-spa-script.js>
"use strict";
const fs = require("fs");
const assert = require("assert");
const script = fs.readFileSync(process.argv[2], "utf8");

const elements = {};
function el(id) {
  if (!elements[id]) {
    elements[id] = {
      id: id, innerHTML: "", value: "", textContent: "", className: "",
      children: [],
      appendChild(c) { this.children.push(c); },
      onclick: null,
    };
  }
  return elements[id];
}

const responses = {};
let anon = 0;
global.location = { search: "?token=test-token" };
global.localStorage = {};
global.document = {
  createElement: () => el("__anon" + (anon++)),
  getElementById: (id) => el(id),
  querySelectorAll: () => [],
};
global.alert = () => {};
global.fetch = async (url, opts) => {
  assert(opts && opts.headers && opts.headers["X-Graft-Token"] === "test-token",
    "fetch lost the bearer token: " + url);
  if (!(url in responses)) throw new Error("unexpected fetch " + url);
  return { ok: true, json: async () => responses[url] };
};

// bootstrap needs the catalog response (setTab("catalog") fires at load)
responses["/api/models"] = [
  { name: "m.daily", kind: "FULL", cron: "@daily", owner: "dana", depends_on: [] },
  { name: "m.rollup", kind: "FULL", cron: "@daily", depends_on: ["m.daily"] },
];
responses["/api/dag"] = {
  models: ["m.daily", "m.mid", "m.rollup"],
  // the self-edge is real: graft supports self-referencing incremental
  // models and dagJson passes the edge through — the layout must neither
  // recurse forever nor draw a degenerate line for it
  edges: [["m.daily", "m.mid"], ["m.mid", "m.rollup"], ["m.daily", "m.rollup"],
    ["m.rollup", "m.rollup"]],
};
responses["/api/lineage/m.rollup"] = {
  model: "m.rollup", columns: { days: ["m.daily.n", "m.daily.d"], note: [] },
};
responses["/api/lineage/m.rollup/days"] = {
  model: "m.rollup", columns: { days: ["m.daily.n", "m.daily.d"] },
};

// direct eval shares this scope; the trailing expression hands the view
// table and handlers back out
const api = eval(script + ";({views: views, lin: lin})");

(async () => {
  // let the bootstrap's async catalog render settle
  await new Promise((r) => setTimeout(r, 20));
  const main = el("main");
  assert(main.innerHTML.includes("m.daily") && main.innerHTML.includes("m.rollup"),
    "catalog table missing models: " + main.innerHTML.slice(0, 200));

  // dag tab: layered SVG — every model boxed, one line per edge, and the
  // downstream model must sit in a LATER column than its upstream
  await api.views.dag();
  const dag = main.innerHTML;
  assert(dag.includes("<svg") && dag.includes("<rect"), "dag lost its SVG");
  ["m.daily", "m.mid", "m.rollup"].forEach((m) =>
    assert(dag.includes(m), "dag missing node " + m));
  assert((dag.match(/<line /g) || []).length === 3, "dag edge count");
  const xOf = (m) => parseInt(new RegExp(
    "x='(\\d+)' y='\\d+' font-size='11' font-family='monospace'>" +
    m.replace(/\./g, "\\.") + "<").exec(dag)[1], 10);
  assert(xOf("m.daily") < xOf("m.mid") && xOf("m.mid") < xOf("m.rollup"),
    "dag layering broke: " + [xOf("m.daily"), xOf("m.mid"), xOf("m.rollup")]);

  // lineage tab: model-level query renders table + SVG with upstream boxes
  await api.views.lineage();
  el("lmodel").value = "m.rollup";
  el("lcol").value = "";
  await api.lin();
  const lout = el("lout").innerHTML;
  assert(lout.includes("<svg") && lout.includes("m.daily.n") &&
    lout.includes("m.rollup.days"), "lineage SVG incomplete");
  assert((lout.match(/<line /g) || []).length === 2, "lineage edge count");

  // column-scoped lineage hits the two-param endpoint
  el("lcol").value = "days";
  await api.lin();
  assert(el("lout").innerHTML.includes("m.daily.d"), "column lineage broke");

  console.log("UI HEADLESS OK");
  process.exit(0);
})().catch((e) => {
  console.error("UI HEADLESS FAILED: " + (e && e.message));
  process.exit(1);
});
