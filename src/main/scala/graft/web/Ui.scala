package graft.web

/** The single-page app served at `/` — self-contained HTML+JS, no external
  * assets (the sandboxed deployments the reference's React bundle can't
  * reach are exactly where a zero-dependency page keeps working). Tabs map
  * to the reference UI's modes: catalog (models + detail), lineage, console
  * (render / evaluate / fetchdf), plan (+apply), environments, tests,
  * files (IDE half). All data comes from the `/api/...` endpoints.
  */
private[web] object Ui {
  val page: String =
    """<!doctype html>
      |<html><head><meta charset="utf-8"><title>graft</title>
      |<style>
      | body{font-family:system-ui,sans-serif;margin:0;background:#f6f7f9;color:#1c2330}
      | header{background:#1c2330;color:#fff;padding:10px 16px;display:flex;gap:16px;align-items:baseline}
      | header h1{font-size:16px;margin:0}
      | nav button{background:none;border:none;color:#aeb8c9;padding:6px 10px;cursor:pointer;font-size:14px}
      | nav button.on{color:#fff;border-bottom:2px solid #5b9cff}
      | main{padding:16px;max-width:1100px;margin:0 auto}
      | table{border-collapse:collapse;width:100%;background:#fff}
      | th,td{border:1px solid #dde2ea;padding:4px 8px;text-align:left;font-size:13px}
      | th{background:#eef1f5}
      | pre{background:#fff;border:1px solid #dde2ea;padding:10px;overflow:auto;font-size:12px}
      | textarea,input,select{font:12px monospace;padding:4px;border:1px solid #c6cdd8}
      | textarea{width:100%;min-height:90px}
      | .row{display:flex;gap:8px;margin:8px 0;flex-wrap:wrap;align-items:center}
      | .btn{background:#2b6cb0;color:#fff;border:none;padding:5px 12px;cursor:pointer}
      | .err{color:#b03030;white-space:pre-wrap}
      | .pass{color:#20803c}.fail{color:#b03030}
      |</style></head><body>
      |<header><h1>graft</h1><nav id="nav"></nav></header>
      |<main id="main"></main>
      |<script>
      |const tabs=["catalog","dag","lineage","console","plan","environments","tests","files"];
      |const $=(h)=>{const d=document.createElement("div");d.innerHTML=h;return d};
      |const esc=s=>String(s==null?"∅":s).replace(/&/g,"&amp;").replace(/</g,"&lt;");
      |const TOKEN=new URLSearchParams(location.search).get("token");
      |async function j(url,opts){const r=await fetch(url,Object.assign({},opts,
      |  {headers:Object.assign({"X-Graft-Token":TOKEN},(opts||{}).headers)}));
      |  const b=await r.json();if(!r.ok)throw new Error(b.error||r.status);return b}
      |function table(cols,rows){return "<table><tr>"+cols.map(c=>"<th>"+esc(c)+"</th>").join("")+
      |  "</tr>"+rows.map(r=>"<tr>"+r.map(v=>"<td>"+esc(v)+"</td>").join("")+"</tr>").join("")+"</table>"}
      |const main=document.getElementById("main");
      |function setTab(t){localStorage.tab=t;
      |  document.querySelectorAll("nav button").forEach(b=>b.className=b.textContent===t?"on":"");
      |  views[t]().catch(e=>main.innerHTML="<p class='err'>"+esc(e.message)+"</p>")}
      |const views={
      | async catalog(){const ms=await j("/api/models");
      |  main.innerHTML=table(["model","kind","cron","owner","depends on"],
      |   ms.map(m=>[m.name,m.kind,m.cron,m.owner||"",(m.depends_on||[]).join(", ")]))+
      |   "<div class='row'><input id='mname' placeholder='model name'>"+
      |   "<button class='btn' onclick='detail()'>detail</button></div><div id='det'></div>";},
      | async dag(){const d=await j("/api/dag");
      |  if(!d.models.length){main.innerHTML="<p>no models</p>";return}
      |  const deps={};d.models.forEach(m=>deps[m]=[]);
      |  d.edges.forEach(e=>{if(e[0]!==e[1])deps[e[1]].push(e[0])});
      |  const lvl={};const L=m=>lvl[m]!==undefined?lvl[m]:
      |   (lvl[m]=deps[m].length?Math.max.apply(null,deps[m].map(L))+1:0);
      |  d.models.forEach(L);
      |  const cols={};d.models.forEach(m=>{(cols[lvl[m]]=cols[lvl[m]]||[]).push(m)});
      |  const pos={};Object.keys(cols).forEach(c=>cols[c].forEach((m,i)=>pos[m]=[20+c*250,24+i*30]));
      |  const ps=Object.values(pos);
      |  const h=Math.max.apply(null,ps.map(p=>p[1]))+30;
      |  const w=Math.max.apply(null,ps.map(p=>p[0]))+240;
      |  let svg="<svg xmlns='http://www.w3.org/2000/svg' width='"+w+"' height='"+h+"'>";
      |  d.edges.forEach(e=>{if(e[0]===e[1])return;const a=pos[e[0]],b=pos[e[1]];
      |   svg+="<line x1='"+(a[0]+210)+"' y1='"+(a[1]-6)+"' x2='"+b[0]+"' y2='"+(b[1]-6)+"' stroke='#5b9cff'/>"});
      |  d.models.forEach(m=>{const p=pos[m];
      |   svg+="<rect x='"+p[0]+"' y='"+(p[1]-16)+"' width='210' height='22' fill='#fff' stroke='#8899aa'/>"+
      |    "<text x='"+(p[0]+5)+"' y='"+p[1]+"' font-size='11' font-family='monospace'>"+esc(m)+"</text>"});
      |  main.innerHTML=svg+"</svg>";},
      | async lineage(){main.innerHTML="<div class='row'><input id='lmodel' placeholder='model'>"+
      |   "<input id='lcol' placeholder='column (optional)'>"+
      |   "<button class='btn' onclick='lin()'>lineage</button></div><div id='lout'></div>";},
      | async console(){main.innerHTML=
      |   "<div class='row'><select id='cmd'><option>render</option><option>evaluate</option>"+
      |   "<option>fetchdf</option></select><input id='cmodel' placeholder='model (or leave blank for sql)'>"+
      |   "<input id='cstart' placeholder='start (1995-01-01)'><input id='cend' placeholder='end'>"+
      |   "<button class='btn' onclick='runCmd()'>run</button></div>"+
      |   "<textarea id='csql' placeholder='SQL for fetchdf'></textarea><div id='cout'></div>";},
      | async plan(){main.innerHTML="<div class='row'><input id='penv' value='prod'>"+
      |   "<input id='pstart' placeholder='start'><input id='pend' placeholder='end'>"+
      |   "<button class='btn' onclick='doPlan(false)'>plan</button>"+
      |   "<button class='btn' onclick='doPlan(true)'>apply</button></div><div id='pout'></div>";},
      | async environments(){const es=await j("/api/environments");
      |  main.innerHTML=table(["environment","finalized","models"],
      |   es.map(e=>[e.name,e.finalized,Object.keys(e.snapshots||{}).length]));},
      | async tests(){const t=await j("/api/commands/test");
      |  main.innerHTML="<p>"+t.total+" tests, <span class='"+(t.failed?"fail":"pass")+"'>"+
      |   t.failed+" failed</span></p>"+table(["test","result","message"],
      |   t.tests.map(x=>[x.name,x.passed?"pass":"FAIL",x.message||""]));},
      | async files(){const fs=await j("/api/files");
      |  main.innerHTML="<div class='row'><select id='fsel'>"+
      |   fs.map(f=>"<option>"+esc(f)+"</option>").join("")+"</select>"+
      |   "<button class='btn' onclick='loadF()'>open</button>"+
      |   "<button class='btn' onclick='saveF()'>save</button></div>"+
      |   "<textarea id='fbody' style='min-height:300px'></textarea>";}
      |};
      |async function detail(){const d=await j("/api/models/"+document.getElementById("mname").value);
      | document.getElementById("det").innerHTML="<h3>"+esc(d.name)+"</h3><p>"+esc(d.kind)+
      |  " · cron "+esc(d.cron)+(d.owner?" · "+esc(d.owner):"")+"</p>"+
      |  "<h4>definition</h4><pre>"+esc(d.definition)+"</pre><h4>rendered</h4><pre>"+esc(d.rendered)+"</pre>"}
      |async function lin(){const m=document.getElementById("lmodel").value;
      | const c=document.getElementById("lcol").value;
      | const d=await j("/api/lineage/"+m+(c?"/"+encodeURIComponent(c):""));
      | const cols=Object.keys(d.columns);
      | const ups=[...new Set(Object.values(d.columns).flat())];
      | const y=i=>24+i*26, h=Math.max(ups.length,cols.length,1)*26+20;
      | const box=(x,yy,t)=>"<rect x='"+x+"' y='"+(yy-14)+"' width='220' height='20' fill='#fff' stroke='#8899aa'/>"+
      |  "<text x='"+(x+5)+"' y='"+yy+"' font-size='11' font-family='monospace'>"+esc(t)+"</text>";
      | let svg="<svg xmlns='http://www.w3.org/2000/svg' width='700' height='"+h+"'>";
      | ups.forEach((u,i)=>svg+=box(10,y(i),u));
      | cols.forEach((cc,i)=>svg+=box(450,y(i),m+"."+cc));
      | cols.forEach((cc,i)=>(d.columns[cc]||[]).forEach(u=>{const k=ups.indexOf(u);
      |  svg+="<line x1='232' y1='"+(y(k)-4)+"' x2='448' y2='"+(y(i)-4)+"' stroke='#5b9cff'/>"}));
      | svg+="</svg>";
      | document.getElementById("lout").innerHTML=table(["column","derives from"],
      |  Object.entries(d.columns).map(([cc,u])=>[cc,u.join(", ")]))+svg}
      |async function runCmd(){const cmd=document.getElementById("cmd").value;
      | const body={model:document.getElementById("cmodel").value,
      |  sql:document.getElementById("csql").value,
      |  start:document.getElementById("cstart").value||undefined,
      |  end:document.getElementById("cend").value||undefined};
      | const out=document.getElementById("cout");
      | try{const d=await j("/api/commands/"+cmd,{method:"POST",body:JSON.stringify(body)});
      |  out.innerHTML=d.sql?"<pre>"+esc(d.sql)+"</pre>":table(d.columns,d.rows)}
      | catch(e){out.innerHTML="<p class='err'>"+esc(e.message)+"</p>"}}
      |async function doPlan(apply){const body={environment:document.getElementById("penv").value,
      |  start:document.getElementById("pstart").value||undefined,
      |  end:document.getElementById("pend").value||undefined};
      | const out=document.getElementById("pout");
      | try{const d=await j(apply?"/api/commands/apply":"/api/plan",
      |   {method:"POST",body:JSON.stringify(body)});
      |  out.innerHTML="<pre>"+esc(d.describe)+(d.applied?"\n\nAPPLIED":"")+"</pre>"}
      | catch(e){out.innerHTML="<p class='err'>"+esc(e.message)+"</p>"}}
      |async function loadF(){const f=document.getElementById("fsel").value;
      | const d=await j("/api/files/"+f);document.getElementById("fbody").value=d.content}
      |async function saveF(){const f=document.getElementById("fsel").value;
      | await j("/api/files/"+f,{method:"POST",
      |  body:JSON.stringify({content:document.getElementById("fbody").value})});alert("saved")}
      |const nav=document.getElementById("nav");
      |tabs.forEach(t=>{const b=document.createElement("button");b.textContent=t;
      | b.onclick=()=>setTab(t);nav.appendChild(b)});
      |setTab(localStorage.tab&&tabs.includes(localStorage.tab)?localStorage.tab:"catalog");
      |</script></body></html>
      |""".stripMargin
}
