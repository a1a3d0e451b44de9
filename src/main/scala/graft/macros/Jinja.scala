package graft.macros

/** Minimal Jinja template support for dbt-style model bodies (reference:
  * sqlmesh core/dialect.py:57-66 jinja block grammar + utils/jinja.py
  * environment). Covers the common dbt idioms:
  *
  *  - `{{ var('name') }}` / `{{ var('name', default) }}` — project variables
  *  - `{{ ref('model') }}` / `{{ source('src', 'table') }}` — dbt relation
  *    references: `ref` resolves through the caller-supplied resolver (short
  *    dbt names → full model names, then the physical table at render);
  *    `source` is the external table `src.table`
  *  - `{{ this }}` — the physical table under evaluation
  *  - `{{ name }}` — loop/set bindings and project variables
  *  - `{% if c %} … {% elif c %} … {% else %} … {% endif %}` (nestable)
  *  - `{% for x in [a, 'b', 1] %} … {% endfor %}` with `{{ x }}`/`loop.index`
  *  - `{% set name = expr %}`
  *
  * Conditions evaluate through [[ConstEval]] (SQL-ish: `=`/`==`, AND/OR/NOT,
  * strings, numbers). Everything else — full python expressions, custom dbt
  * macros — is out of scope; the `@` macro system is the native surface.
  */
object Jinja {

  def hasJinja(s: String): Boolean = s.contains("{{") || s.contains("{%")

  sealed trait Node
  private final case class Text(s: String) extends Node
  private final case class Out(expr: String) extends Node
  private final case class If(branches: Seq[(String, Seq[Node])], orElse: Seq[Node]) extends Node
  /** `{% for a[, b] in expr %}` — multiple vars = python tuple unpacking
    * (`for k, v in d.items()`). */
  private final case class For(vs: Seq[String], list: String, body: Seq[Node]) extends Node
  private final case class SetVar(name: String, expr: String) extends Node
  /** `{% set name %} body {% endset %}` — bind the RENDERED body (jinja block
    * assignment; dbt materializations/packages build SQL fragments with it). */
  private final case class SetBlock(name: String, body: Seq[Node]) extends Node
  private final case class MacroNode(defn: MacroDef) extends Node
  /** `{% call name(args) %} body {% endcall %}` — the macro runs with the
    * rendered body available as `{{ caller() }}` (jinja call blocks, used by
    * dbt's `statement`/logging idioms). */
  private final case class CallBlock(call: String, body: Seq[Node]) extends Node

  /** `{% do expr %}` — evaluate for effect, emit nothing. */
  private final case class DoStmt(expr: String) extends Node

  /** A `{% macro name(a, b='x') %} … {% endmacro %}` definition: params with
    * optional defaults and the parsed body, invoked as `{{ name(...) }}`
    * (reference utils/jinja.py MacroExtractor / dbt project `macros/`). */
  final case class MacroDef(name: String,
                            params: Seq[(String, Option[String])],
                            body: Seq[Node])

  private sealed trait Tok
  private final case class TText(s: String) extends Tok
  private final case class TExpr(s: String) extends Tok
  private final case class TStmt(s: String) extends Tok

  def render(template: String, vars: Map[String, String],
             thisModel: Option[String] = None,
             refResolver: String => String = identity,
             macros: Map[String, MacroDef] = Map.empty,
             columnValues: Option[(String, String, Int) => Seq[String]] = None,
             schemaOf: String => Seq[(String, String)] = _ => Nil,
             runQuery: Option[String => (Seq[String], Seq[Seq[Any]])] = None): String = {
    refs.set(refResolver)
    valuesHook.set(columnValues)
    schemaHook.set(schemaOf)
    queryHook.set(runQuery)
    statementResults.set(Map.empty)
    try renderImpl(template, vars, thisModel, macros)
    catch { case MacroReturn(_) => throw new IllegalArgumentException(
      "return() outside a macro (dbt allows it only inside {% macro %}/{% test %} bodies)") }
    finally { refs.remove(); valuesHook.remove(); schemaHook.remove()
              queryHook.remove(); statementResults.remove() }
  }

  /** Extract the `{% macro %}` definitions from a source file WITHOUT
    * rendering it — how a dbt project's macro files load. */
  def parseMacros(source: String): Map[String, MacroDef] = {
    val (nodes, rest) = parseNodes(tokenize(source), Nil)
    require(rest.isEmpty, s"unexpected ${rest.head} outside a block")
    nodes.collect { case MacroNode(d) => d.name -> d }.toMap
  }

  /** dbt `ref()` resolution for the current render (threaded via a
    * ThreadLocal so the recursive evaluators don't all grow a parameter). */
  private val refs = new ThreadLocal[String => String] {
    override def initialValue(): String => String = identity
  }

  /** User macros visible to the current render (same threading rationale). */
  private val macroEnv = new ThreadLocal[Map[String, MacroDef]] {
    override def initialValue(): Map[String, MacroDef] = Map.empty
  }

  /** Render-time introspection for dbt_utils.get_column_values:
    * (relation, column, maxRecords) → distinct values. None outside a live
    * catalog (pure-text renders) — using the macro then fails loudly. */
  private val valuesHook = new ThreadLocal[Option[(String, String, Int) => Seq[String]]] {
    override def initialValue(): Option[(String, String, Int) => Seq[String]] = None
  }

  /** Live schema for `adapter.get_columns_in_relation`: relation name →
    * (column, dataType) in table order. Defaults to empty (pure-text
    * renders), which makes the adapter call fail loudly instead of
    * rendering an empty column list into wrong SQL. */
  private val schemaHook = new ThreadLocal[String => Seq[(String, String)]] {
    override def initialValue(): String => Seq[(String, String)] = _ => Nil
  }

  /** Rendered bodies of enclosing `{% call %}` blocks — `caller()` inside a
    * macro reads the top of this stack. */
  private val callerStack = new ThreadLocal[List[String]] {
    override def initialValue(): List[String] = Nil
  }

  /** Render-time query execution for dbt `run_query` / `statement`:
    * SQL → (column names, rows of raw cell values: null | Number | other
    * .toString-able). None outside a live engine (pure-text renders) —
    * using run_query then fails loudly, matching dbt where these only
    * work at execution. */
  private val queryHook = new ThreadLocal[Option[String => (Seq[String], Seq[Seq[Any]])]] {
    override def initialValue(): Option[String => (Seq[String], Seq[Seq[Any]])] = None
  }

  /** Results of `{% call statement('name', fetch_result=true) %}` blocks in
    * the current render, for `load_result('name')`. */
  private val statementResults = new ThreadLocal[Map[String, (Seq[String], Seq[Seq[Any]])]] {
    override def initialValue(): Map[String, (Seq[String], Seq[Seq[Any]])] = Map.empty
  }

  /** Render a query result as the agate-shaped jinja value packages read:
    * `columns` = list of {'name', 'values'} dicts (`.values()` on a dict
    * returns its values — the agate Column read works through plain dict
    * semantics), `rows` = list of per-row dicts keyed by column (so
    * `row['col']`, `row.col`, and `row.values()[0]` all work), `data` =
    * list of plain value lists (the `| map(attribute=0)` form), plus
    * `column_names`. Cells: null → none, numbers bare, everything else a
    * quoted string. */
  private def resultTableLiteral(cols: Seq[String], rows: Seq[Seq[Any]]): String = {
    def cell(v: Any): String = v match {
      case null                 => "none"
      case n: java.lang.Number  => n.toString
      case b: java.lang.Boolean => if (b) "True" else "False"
      case other =>
        "'" + other.toString.replace("\\", "\\\\").replace("'", "\\'") + "'"
    }
    val colNames = cols.map(c => s"'$c'").mkString("[", ", ", "]")
    val columns = cols.zipWithIndex.map { case (c, i) =>
      s"{'name': '$c', 'values': ${rows.map(r => cell(r(i))).mkString("[", ", ", "]")}}"
    }.mkString("[", ", ", "]")
    val rowDicts = rows.map(r =>
      cols.zipWithIndex.map { case (c, i) => s"'$c': ${cell(r(i))}" }
        .mkString("{", ", ", "}")).mkString("[", ", ", "]")
    val data = rows.map(_.map(cell).mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
    s"{'column_names': $colNames, 'columns': $columns, 'rows': $rowDicts, 'data': $data}"
  }

  private def renderImpl(template: String, vars: Map[String, String],
                         thisModel: Option[String],
                         macros: Map[String, MacroDef]): String = {
    val toks = tokenize(template)
    val (nodes, rest) = parseNodes(toks, Nil)
    require(rest.isEmpty, s"unexpected ${rest.head} outside a block")
    // definitions in the template itself join the supplied environment
    // (local definitions shadow supplied ones)
    macroEnv.set(macros ++ nodes.collect { case MacroNode(d) => d.name -> d })
    // dbt's `execute` flag: True during real rendering (dbt sets False only
    // in its parse-only pass, which this renderer doesn't have). Same for
    // `flags.WHICH`: always the run-mode value (dotted vars resolve as
    // whole tokens, so the literal key works like loop.index does).
    val varsWithExec = Seq("execute" -> "True", "flags.WHICH" -> "run")
      .foldLeft(vars)((v, kv) => if (v.contains(kv._1)) v else v + kv)
    try {
      val out = new StringBuilder
      evalNodes(nodes, out, scala.collection.mutable.Map[String, String](),
        varsWithExec, thisModel)
      out.toString
    } finally macroEnv.remove()
  }

  private def evalNodes(ns: Seq[Node], out: StringBuilder,
                        bindings: scala.collection.mutable.Map[String, String],
                        vars: Map[String, String],
                        thisModel: Option[String]): Unit = ns.foreach {
    case Text(s) => out.append(s)
    case Out(e)  =>
      // a relation OBJECT interpolated into output prints its name —
      // dbt's BaseRelation __str__ (see [[relationArg]])
      out.append(relationNameOf(value(e, vars, bindings.toMap, thisModel)))
    case SetVar(n, e) =>
      val nsRe = "(?s)^namespace\\s*\\((.*)\\)$".r
      e.trim match {
        // `{% set ns = namespace(found=false) %}` — jinja's mutable scope
        // carrier: each kwarg binds as `ns.k`, which `{% set ns.k = v %}`
        // rewrites and `{{ ns.k }}` reads (dotted names are single bindings
        // here, so namespace attrs survive for-loop scopes exactly like
        // jinja's — the loop save/restore only touches the loop var)
        case nsRe(argSrc) if balancedArgs(argSrc) =>
          bindings(n) = "__graft_namespace__"
          splitArgs(argSrc).foreach { a =>
            val kv = "(?s)^([A-Za-z_]\\w*)\\s*=\\s*(.+)$".r
            kv.findFirstMatchIn(a) match {
              case Some(m) =>
                bindings(s"$n.${m.group(1)}") =
                  value(m.group(2).trim, vars, bindings.toMap, thisModel)
              case None => throw new IllegalArgumentException(
                s"namespace() takes keyword args, got: $a")
            }
          }
        // list/dict literals bind RAW — iterables for a later {% for %} /
        // mutation targets for {% do xs.append(...) %} — but a literal
        // feeding a FILTER PIPELINE (`[...] | map('lower') | list`) must
        // evaluate now, else the binding holds unrenderable pipe text
        case t if (t.startsWith("[") || t.startsWith("{")) &&
                  splitPipes(t).length == 1 => bindings(n) = t
        case _ => bindings(n) = value(e, vars, bindings.toMap, thisModel)
      }
    case SetBlock(n, body) =>
      val inner = new StringBuilder
      evalNodes(body, inner, bindings, vars, thisModel)
      bindings(n) = inner.toString.trim
    case MacroNode(_) => () // definitions emit nothing
    case DoStmt(e) =>
      // list mutation (`{% do out.append(line) %}` — THE dbt package idiom
      // for building SQL fragments in a loop): the binding holds the list
      // as a literal; append/extend rebind it grown. Everything else
      // evaluates for effect only (log, macro calls).
      val mutRe = "(?s)^([A-Za-z_][\\w.]*)\\.(append|extend|update)\\s*\\((.*)\\)$".r
      e.trim match {
        case mutRe(n, op, argSrc) if bindings.contains(n) && balancedArgs(argSrc) &&
            (bindings(n).trim.startsWith("[") || bindings(n).trim.startsWith("{")) =>
          val cur = ConstEval.eval(substitute(bindings(n), vars, bindings.toMap, thisModel))
            .getOrElse(throw new IllegalArgumentException(s"cannot parse container binding $n"))
          val argV = ConstEval.eval(substitute(argSrc, vars, bindings.toMap, thisModel))
            .getOrElse(ConstEval.S(value(argSrc, vars, bindings.toMap, thisModel)))
          val next = (cur, op, argV) match {
            case (ConstEval.L(xs), "append", v)               => ConstEval.L(xs :+ v)
            case (ConstEval.L(xs), "extend", ConstEval.L(ys)) => ConstEval.L(xs ++ ys)
            case (ConstEval.D(es), "update", ConstEval.D(ys)) =>
              ConstEval.D(es.filterNot(e0 => ys.exists(_._1 == e0._1)) ++ ys)
            case other => throw new IllegalArgumentException(s"bad $op on $n: $other")
          }
          bindings(n) = ConstEval.show(next)
        case _ =>
          value(e, vars, bindings.toMap, thisModel); () // effect only
      }
    case CallBlock(call, body) =>
      val inner = new StringBuilder
      evalNodes(body, inner, bindings, vars, thisModel)
      call.trim match {
        // `{% call statement('name', fetch_result=true) %} sql {% endcall %}`
        // — dbt's lower-level run_query: execute the rendered body, stash
        // the result for load_result('name'), emit nothing. A MacroReturn
        // thrown INSIDE the body (get_column_values' missing-relation
        // default path) propagates — that is dbt's own control flow.
        case statementRe(name, opts) =>
          val sql = inner.toString.trim
          if (sql.nonEmpty) {
            val hook = queryHook.get().getOrElse(throw new IllegalArgumentException(
              s"statement('$name'): no live engine is wired into this render"))
            val fetch = opts.toLowerCase.contains("fetch_result")
            val res = hook(sql)
            if (fetch) statementResults.set(statementResults.get + (name -> res))
          }
        case _ =>
          callerStack.set(inner.toString.trim :: callerStack.get)
          try out.append(value(call, vars, bindings.toMap, thisModel))
          finally callerStack.set(callerStack.get.tail)
      }
    case If(branches, orElse) =>
      branches.find { case (c, _) => truthy(c, vars, bindings.toMap, thisModel) } match {
        case Some((_, body)) => evalNodes(body, out, bindings, vars, thisModel)
        case None            => evalNodes(orElse, out, bindings, vars, thisModel)
      }
    case For(vs, listExpr, body) =>
      // structured path first: the substituted expression const-evaluates to
      // a list (literals, range(), dict.items(), a list-valued binding) —
      // required for tuple unpacking; the legacy string path stays for
      // iterables holding raw SQL fragments ConstEval can't parse
      val structured: Option[Vector[ConstEval.V]] =
        ConstEval.eval(substitute(listExpr, vars, bindings.toMap, thisModel)) match {
          case Some(ConstEval.L(xs)) => Some(xs)
          case _ => None
        }
      // each item → one binding per loop var (raw render: strings unquoted,
      // containers as round-trippable literals)
      val items: Seq[Seq[String]] = structured match {
        case Some(xs) => xs.map {
          case it if vs.length == 1 => Seq(it match {
            case l @ ConstEval.L(_) => ConstEval.show(l)
            case d @ ConstEval.D(_) => ConstEval.show(d)
            case v => ConstEval.raw(v)
          })
          case ConstEval.L(tup) if tup.length >= vs.length =>
            vs.indices.map(j => tup(j) match {
              case l @ ConstEval.L(_) => ConstEval.show(l)
              case d @ ConstEval.D(_) => ConstEval.show(d)
              case v => ConstEval.raw(v)
            })
          case other => throw new IllegalArgumentException(
            s"cannot unpack ${ConstEval.show(other)} into (${vs.mkString(", ")})")
        }
        case None =>
          require(vs.length == 1,
            s"tuple unpacking needs a structured iterable: $listExpr")
          val src =
            if (listExpr.trim.startsWith("[")) listExpr
            else try value(listExpr, vars, bindings.toMap, thisModel)
            catch { case _: IllegalArgumentException => listExpr }
          parseList(src).map(it => Seq(value(it, vars, bindings.toMap, thisModel)))
      }
      val loopKeys = Seq("loop.index", "loop.index0", "loop.first", "loop.last", "loop.length")
      val saved = (vs ++ loopKeys).map(k => k -> bindings.get(k))
      items.zipWithIndex.foreach { case (it, idx) =>
        vs.zip(it).foreach { case (v, x) => bindings(v) = x }
        bindings("loop.index") = (idx + 1).toString
        bindings("loop.index0") = idx.toString
        bindings("loop.first") = if (idx == 0) "True" else "False"
        bindings("loop.last") = if (idx == items.length - 1) "True" else "False"
        bindings("loop.length") = items.length.toString
        evalNodes(body, out, bindings, vars, thisModel)
      }
      saved.foreach { case (k, old) =>
        old.fold(bindings.remove(k): Unit)(bindings(k) = _)
      }
  }

  /** Invoke a user macro: bind positional/keyword args over the params (with
    * defaults), render the body in a FRESH scope — caller bindings are not
    * visible inside the macro, exactly like Jinja's. */
  private def callMacro(d: MacroDef, args: Seq[String], vars: Map[String, String],
                        outerBindings: Map[String, String],
                        thisModel: Option[String]): String = {
    val kwRe = "(?s)^([A-Za-z_]\\w*)\\s*=\\s*(.+)$".r
    val isKw = (a: String) => kwRe.findFirstMatchIn(a)
      .exists(m => d.params.exists(_._1 == m.group(1)))
    val (kw, positional) = args.partition(isKw)
    val kwMap = kw.map { a =>
      val m = kwRe.findFirstMatchIn(a).get; m.group(1) -> m.group(2).trim
    }.toMap
    val scope = scala.collection.mutable.Map[String, String]()
    d.params.zipWithIndex.foreach { case ((p, default), i) =>
      val raw = kwMap.get(p)
        .orElse(if (i < positional.length) Some(positional(i)) else None)
        .orElse(default)
        .getOrElse(throw new IllegalArgumentException(
          s"macro ${d.name}: missing argument '$p'"))
      // args that aren't evaluable expressions are SQL fragments — dbt
      // macros routinely take raw snippets (`guard(d > 5)`); pass verbatim.
      // A ref()/source()/this arg binds as a RELATION OBJECT (a dict with
      // dbt's BaseRelation attribute surface) — packages type-check and
      // introspect these (`obj is mapping`, `.identifier`, `.metadata`);
      // [[Out]] rendering and ConstEval string coercion collapse it back
      // to the relation name, so `FROM {{ rel }}` and `'from ' ~ rel`
      // still emit plain SQL.
      scope(p) = relationArg(raw, thisModel).getOrElse(
        try value(raw, vars, outerBindings, thisModel)
        catch { case _: IllegalArgumentException => raw })
    }
    val out = new StringBuilder
    // {{ return(v) }} anywhere in the body makes the CALL evaluate to v,
    // discarding text accumulated so far AND skipping the rest of the body
    // — dbt's return() raises internally to halt the macro, and a
    // conditional-early-return macro would otherwise render the return
    // value concatenated with its fallback path's output (corrupt SQL)
    try {
      evalNodes(d.body, out, scope, vars, thisModel)
      out.toString.trim
    } catch { case MacroReturn(v) => v }
  }

  /** Control-flow carrier for `{{ return(expr) }}` — caught by the nearest
    * enclosing [[callMacro]]; reaching a render's top level means return()
    * was used outside a macro, which dbt also rejects. */
  private final case class MacroReturn(value: String)
    extends RuntimeException(null, null, false, false)

  // ------------------------------------------------------------- parsing

  private def tokenize(s: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    // jinja whitespace control: `{%- tag -%}` / `{{- expr -}}` strip the
    // whitespace touching the tag on that side (dbt templates use this to
    // keep generated SQL single-spaced)
    var trimNextLeading = false
    def addText(t0: String): Unit = {
      val t = if (trimNextLeading) { trimNextLeading = false; t0.replaceAll("^\\s+", "") } else t0
      if (t.nonEmpty) out += TText(t)
    }
    while (i < s.length) {
      val e = s.indexOf("{{", i); val t = s.indexOf("{%", i)
      val c = s.indexOf("{#", i)
      val next = Seq(e, t, c).filter(_ >= 0) match {
        case Nil => -1
        case xs  => xs.min
      }
      if (next < 0) { addText(s.substring(i)); i = s.length }
      else if (next == c && c != e && c != t) {
        // `{# comment #}` — emitted nowhere; `{#- -#}` whitespace control
        // works like the other tags (dbt packages comment liberally)
        val close = s.indexOf("#}", next)
        require(close > 0, "unclosed {#")
        val content = s.substring(next + 2, close)
        var text = s.substring(i, next)
        if (content.startsWith("-")) text = text.replaceAll("\\s+$", "")
        addText(text)
        if (content.endsWith("-")) trimNextLeading = true
        i = close + 2
      } else {
        val isExpr = s.startsWith("{{", next)
        val closeTag = if (isExpr) "}}" else "%}"
        val close = s.indexOf(closeTag, next)
        require(close > 0, s"unclosed ${if (isExpr) "{{" else "{%"}")
        var content = s.substring(next + 2, close)
        var text = s.substring(i, next)
        if (content.startsWith("-")) { text = text.replaceAll("\\s+$", ""); content = content.drop(1) }
        // emit the preceding text BEFORE arming the trailing trim — addText
        // consumes the flag, which belongs to the NEXT text, not this one
        addText(text)
        if (content.endsWith("-")) { trimNextLeading = true; content = content.dropRight(1) }
        out += (if (isExpr) TExpr(content.trim) else TStmt(content.trim))
        i = close + 2
      }
    }
    out.result()
  }

  /** Parse until a terminator statement (elif/else/endif/endfor); returns the
    * nodes and the remaining tokens INCLUDING the terminator. */
  private def parseNodes(toks: List[Tok], terminators: Seq[String]): (Seq[Node], List[Tok]) = {
    val nodes = Seq.newBuilder[Node]
    var rest = toks
    while (rest.nonEmpty) {
      rest.head match {
        case TText(s) => nodes += Text(s); rest = rest.tail
        case TExpr(e) => nodes += Out(e); rest = rest.tail
        case TStmt(st) =>
          val kw = st.split("\\s+", 2).head.toLowerCase
          if (terminators.contains(kw)) return (nodes.result(), rest)
          kw match {
            case "if" =>
              val branches = Seq.newBuilder[(String, Seq[Node])]
              var cond = st.stripPrefix("if").trim
              rest = rest.tail
              var done = false
              var orElse: Seq[Node] = Nil
              while (!done) {
                val (body, r) = parseNodes(rest, Seq("elif", "else", "endif"))
                r.head match {
                  case TStmt(s2) if s2.toLowerCase.startsWith("elif") =>
                    branches += ((cond, body)); cond = s2.stripPrefix("elif").trim; rest = r.tail
                  case TStmt(s2) if s2.toLowerCase == "else" =>
                    branches += ((cond, body))
                    val (eb, r2) = parseNodes(r.tail, Seq("endif"))
                    orElse = eb; rest = r2.tail; done = true
                  case _ => // endif
                    branches += ((cond, body)); rest = r.tail; done = true
                }
              }
              nodes += If(branches.result(), orElse)
            case "for" =>
              val m = "(?is)for\\s+([A-Za-z_]\\w*(?:\\s*,\\s*[A-Za-z_]\\w*)*)\\s+in\\s+(.+)".r
              st match {
                case m(vsSrc, listExpr) =>
                  val vs = vsSrc.split(",").map(_.trim).toSeq
                  val (body, r) = parseNodes(rest.tail, Seq("endfor"))
                  nodes += For(vs, listExpr.trim, body); rest = r.tail
                case _ => throw new IllegalArgumentException(s"bad for: {% $st %}")
              }
            case "set" =>
              val m = "(?is)set\\s+([A-Za-z_][\\w.]*)\\s*=\\s*(.+)".r
              val blockM = "(?is)set\\s+([A-Za-z_][\\w.]*)\\s*".r
              st match {
                case m(n, e) => nodes += SetVar(n, e.trim); rest = rest.tail
                case blockM(n) => // `{% set x %} … {% endset %}` block form
                  val (body, r) = parseNodes(rest.tail, Seq("endset"))
                  nodes += SetBlock(n, body); rest = r.tail
                case _ => throw new IllegalArgumentException(s"bad set: {% $st %}")
              }
            case "call" =>
              val call = st.stripPrefix("call").trim
              val (body, r) = parseNodes(rest.tail, Seq("endcall"))
              nodes += CallBlock(call, body); rest = r.tail
            case "do" =>
              // `{% do expr %}` — evaluate for effect, discard the output
              // (dbt uses it for log()/list mutation; here the effectful
              // surface is log/raise_compiler_error/macro calls)
              nodes += DoStmt(st.stripPrefix("do").trim); rest = rest.tail
            case "macro" =>
              val m = "(?is)macro\\s+([A-Za-z_]\\w*)\\s*\\((.*)\\)\\s*".r
              st match {
                case m(name, paramSrc) =>
                  val params = parseList(paramSrc).map { p =>
                    p.indexOf('=') match {
                      case -1 => (p.trim, None)
                      case i  => (p.take(i).trim, Some(p.drop(i + 1).trim))
                    }
                  }
                  val (body, r) = parseNodes(rest.tail, Seq("endmacro"))
                  nodes += MacroNode(MacroDef(name, params, body)); rest = r.tail
                case _ => throw new IllegalArgumentException(s"bad macro: {% $st %}")
              }
            case "test" =>
              // dbt GENERIC TEST definition: `{% test t(model, column_name) %}`
              // is sugar for a macro named `test_t` (dbt's own desugaring) whose
              // body is the violation query — rows returned = rows failing
              val m = "(?is)test\\s+([A-Za-z_]\\w*)\\s*\\((.*)\\)\\s*".r
              st match {
                case m(name, paramSrc) =>
                  val params = parseList(paramSrc).map { p =>
                    p.indexOf('=') match {
                      case -1 => (p.trim, None)
                      case i  => (p.take(i).trim, Some(p.drop(i + 1).trim))
                    }
                  }
                  val (body, r) = parseNodes(rest.tail, Seq("endtest"))
                  nodes += MacroNode(MacroDef(s"test_$name", params, body)); rest = r.tail
                case _ => throw new IllegalArgumentException(s"bad test: {% $st %}")
              }
            case other => throw new IllegalArgumentException(s"unsupported jinja tag: $other")
          }
      }
    }
    (nodes.result(), rest)
  }

  private def parseList(s: String): Seq[String] = {
    val t = s.trim
    val inner = if (t.startsWith("[") && t.endsWith("]")) t.substring(1, t.length - 1) else t
    splitTop(inner)
  }

  /** Split a CALL's argument source on top-level commas WITHOUT unwrapping
    * brackets — `(['a','b'], x)` has two args, the first a list literal. */
  private def splitArgs(s: String): Seq[String] =
    if (s.trim.isEmpty) Nil else splitTop(s)

  private def splitTop(inner: String): Seq[String] = {
    val out = Seq.newBuilder[String]; val cur = new StringBuilder
    var depth = 0; var q = ' '
    inner.foreach {
      case c @ ('\'' | '"') if q == ' '  => q = c; cur.append(c)
      case c if c == q                   => q = ' '; cur.append(c)
      case c if q != ' '                 => cur.append(c)
      case c @ ('(' | '[')               => depth += 1; cur.append(c)
      case c @ (')' | ']')               => depth -= 1; cur.append(c)
      case ',' if depth == 0             => out += cur.toString.trim; cur.clear()
      case c                             => cur.append(c)
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result()
  }

  // ----------------------------------------------------------- evaluation

  /** General call syntax `name(args)` / `pkg.name(args)` — user macros and
    * the dbt_utils builtins. */
  private val callRe = "(?s)^([A-Za-z_][\\w.]*)\\s*\\((.*)\\)$".r

  /** `return(expr)` — dbt macro early-return sugar. */
  private val returnRe = "(?s)^return\\s*\\((.*)\\)$".r

  /** `log(msg[, info=...])` — dbt logging builtin. */
  private val logRe = "(?s)^log\\s*\\((.*)\\)$".r
  private val printRe = "(?s)^print\\s*\\((.*)\\)$".r

  /** `exceptions.raise_compiler_error(msg)` — dbt's guard-clause throw. */
  private val raiseRe =
    "(?s)^exceptions\\s*\\.\\s*raise_compiler_error\\s*\\((.*)\\)$".r

  /** `adapter.get_columns_in_relation(rel)` — dbt's schema introspection. */
  private val getColsRe =
    "(?s)^adapter\\s*\\.\\s*get_columns_in_relation\\s*\\((.*)\\)$".r

  /** `adapter.quote(identifier)` — engine-native identifier quoting
    * (backticks for Spark SQL). */
  private val adapterQuoteRe =
    "(?s)^adapter\\s*\\.\\s*quote\\s*\\((.*)\\)$".r

  /** `run_query(sql)` — dbt's render-time query execution. */
  private val runQueryRe = "(?s)^run_query\\s*\\((.*)\\)$".r

  /** `load_result('name')` — the result of an earlier
    * `{% call statement('name', fetch_result=true) %}` block. */
  private val loadResultRe =
    "(?s)^load_result\\s*\\(\\s*['\"]([\\w]+)['\"]\\s*\\)$".r

  /** Split `name(args).post.fix[0]` into (args, postfix) by scanning the
    * balanced argument list — the regex form can't, its greedy capture eats
    * the postfix. Returns None when `e` isn't `prefix(...)...`. */
  private def splitCallPostfix(e: String, prefix: String): Option[(String, String)] = {
    val m = s"^$prefix\\s*\\(".r.findFirstMatchIn(e).getOrElse(return None)
    var i = m.end; var depth = 1; var q = ' '
    while (i < e.length && depth > 0) {
      val c = e.charAt(i)
      if (q != ' ') { if (c == q) q = ' ' }
      else c match {
        case '\'' | '"' => q = c
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case _ =>
      }
      i += 1
    }
    if (depth != 0) None
    else Some((e.substring(m.end, i - 1), e.substring(i)))
  }

  /** The `statement('name', fetch_result=true)` call-block target. */
  private val statementRe =
    "(?s)^statement\\s*\\(\\s*['\"]([\\w]+)['\"](.*)\\)$".r

  /** `adapter.dispatch('m'[, 'pkg'])(args)`: group 1 = macro name,
    * group 2 = optional namespace package, group 3 = the outer arg list. */
  private val dispatchRe =
    ("(?s)^adapter\\s*\\.\\s*dispatch\\s*\\(\\s*['\"]([\\w]+)['\"]\\s*" +
      "(?:,\\s*(?:macro_namespace\\s*=\\s*)?['\"]([\\w]+)['\"]\\s*)?\\)\\s*\\((.*)\\)$").r

  /** `name(...)` is only a call when the captured argSrc is one balanced
    * argument list: callRe's greedy (.*) would otherwise bind
    * `{{ money(a) > money(b) }}` as money("a) > money(b") and silently
    * render wrong SQL. Depth going negative = the first ')' closed the
    * call mid-expression — fall through to ConstEval/error instead. */
  private def balancedArgs(argSrc: String): Boolean = {
    var depth = 0; var q = ' '; var ok = true
    argSrc.foreach { c =>
      if (q != ' ') { if (c == q) q = ' ' }
      else c match {
        case '\'' | '"' => q = c
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1; if (depth < 0) ok = false
        case _ =>
      }
    }
    ok && depth == 0
  }

  /** Whether `pkg.name` is a natively-rendered builtin (the dbt_utils
    * subset below). DbtLoader consults this so a VENDORED dbt_utils copy
    * doesn't shadow the native rendering — the vendored macros dispatch on
    * `adapter.*`, which a pure-text render can't satisfy. */
  def hasBuiltin(name: String): Boolean = dbtUtils.contains(name)

  /** The dbt_utils subset (reference sqlmesh_dbt compatibility surface;
    * dbt-labs/dbt-utils cross-db macros re-expressed as Spark SQL). Args
    * arrive RAW (quoted strings / `[list, literals]`) — each builtin does
    * its own unwrapping because several take list arguments. */
  private val dbtUtils: Map[String, Seq[String] => String] = {
    def strip(s: String): String = {
      val t = s.trim
      if ((t.startsWith("'") && t.endsWith("'") && t.length >= 2) ||
          (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2))
        t.substring(1, t.length - 1)
      else t
    }
    def listOf(arg: String): Seq[String] = parseList(arg).map(strip)
    Map(
      // mirrors @GENERATE_SURROGATE_KEY (MacroEvaluator) / dbt_utils
      // generate_surrogate_key: md5 of null-safe '|'-joined casts
      "dbt_utils.generate_surrogate_key" -> { args =>
        val fields = listOf(args.head)
          .map(f => s"COALESCE(CAST($f AS STRING), '_graft_null_')")
        s"MD5(CONCAT(${fields.mkString(", '|', ")}))"
      },
      "dbt_utils.safe_divide" -> { args =>
        s"(${strip(args(0))}) / NULLIF((${strip(args(1))}), 0)"
      },
      "dbt_utils.hash" -> { args => s"MD5(CAST(${strip(args.head)} AS STRING))" },
      "dbt_utils.star" -> { args =>
        // star(from=ref('m'), except=[...]) — Spark's analyzer expands
        // `* EXCEPT (...)` natively, so emit exactly that
        val kw = args.map { a =>
          a.indexOf('=') match {
            case -1 => ("from", a.trim)
            case i  => (a.take(i).trim, a.drop(i + 1).trim)
          }
        }.toMap
        kw.get("except").map(listOf) match {
          case Some(ex) if ex.nonEmpty => s"* EXCEPT (${ex.mkString(", ")})"
          case _                       => "*"
        }
      },
      "dbt_utils.concat" -> { args =>
        s"CONCAT(${listOf(args.head).mkString(", ")})"
      },
      // date_spine(datepart, start_date, end_date) — one row per datepart in
      // [start, end), column `date_<datepart>` (dbt-utils date_spine; same
      // sequence+explode shape as the native @DATE_SPINE macro)
      "dbt_utils.date_spine" -> { args =>
        val pos = args.filterNot(_.trim.matches("(?s)^[A-Za-z_]\\w*\\s*=.*"))
        val kw = args.flatMap { a =>
          "(?s)^\\s*([A-Za-z_]\\w*)\\s*=\\s*(.+)$".r.findFirstMatchIn(a)
            .map(m => m.group(1) -> m.group(2).trim)
        }.toMap
        def kwOr(i: Int, k: String): String = kw.getOrElse(k, pos(i))
        val part = strip(kwOr(0, "datepart")).toLowerCase
        val start = strip(kwOr(1, "start_date"))
        val end = strip(kwOr(2, "end_date"))
        s"SELECT explode(sequence(CAST($start AS TIMESTAMP), " +
          s"CAST($end AS TIMESTAMP) - INTERVAL 1 $part, INTERVAL 1 $part)) AS date_$part"
      },
      // pivot(column, values, agg='sum', then_value=1, else_value=0,
      // prefix='', suffix='') — the CASE-per-value projection list
      "dbt_utils.pivot" -> { args =>
        val pos = args.filterNot(_.trim.matches("(?s)^[A-Za-z_]\\w*\\s*=.*"))
        val kw = args.flatMap { a =>
          "(?s)^\\s*([A-Za-z_]\\w*)\\s*=\\s*(.+)$".r.findFirstMatchIn(a)
            .map(m => m.group(1) -> m.group(2).trim)
        }.toMap
        val column = strip(pos.head)
        val values = listOf(kw.getOrElse("values", pos(1)))
        val agg = strip(kw.getOrElse("agg", "'sum'"))
        val thenV = strip(kw.getOrElse("then_value", "1"))
        val elseV = strip(kw.getOrElse("else_value", "0"))
        val prefix = strip(kw.getOrElse("prefix", "''"))
        val suffix = strip(kw.getOrElse("suffix", "''"))
        values.map { v =>
          val alias = (prefix + v + suffix).replaceAll("[^A-Za-z0-9_]", "_")
          s"$agg(CASE WHEN $column = '$v' THEN $thenV ELSE $elseV END) AS $alias"
        }.mkString(", ")
      },
      // union_relations(relations) — UNION ALL by position (the schema-
      // aligning variant needs catalog introspection; Spark's unionByName
      // lives in the DataFrame layer, so this macro documents the
      // positional subset dbt projects on one warehouse actually rely on)
      "dbt_utils.union_relations" -> { args =>
        val rels = listOf(args.head)
        rels.map(r => s"SELECT * FROM $r").mkString(" UNION ALL ")
      },
      // deduplicate(relation, partition_by, order_by) — first row per key
      // (Spark has no QUALIFY, so the row_number subquery form; `* EXCEPT`
      // drops the helper column in the analyzer)
      "dbt_utils.deduplicate" -> { args =>
        val (pos, kw) = posKw(args)
        def kwOr(k: String, i: Int): String = kw.getOrElse(k, pos(i))
        val rel = resolveRelation(kwOr("relation", 0))
        val part = strip(kwOr("partition_by", 1))
        val ord = strip(kwOr("order_by", 2))
        s"SELECT * EXCEPT (_graft_rn) FROM (SELECT *, ROW_NUMBER() OVER " +
          s"(PARTITION BY $part ORDER BY $ord) AS _graft_rn FROM $rel) " +
          "WHERE _graft_rn = 1"
      },
      // get_column_values(table, column, max_records, default) — render-time
      // catalog introspection producing a jinja LIST literal, so the result
      // feeds {% for %} loops and pivot(values=...) exactly like dbt. Needs
      // the live-catalog hook (wired by the renderer); ordering is dbt's
      // default count(*) desc with a value tie-break for determinism.
      "dbt_utils.get_column_values" -> { args =>
        val (pos, kw) = posKw(args)
        def kwOr(k: String, i: Int): String = kw.getOrElse(k, pos(i))
        val table = resolveRelation(kwOr("table", 0))
        val column = strip(kwOr("column", 1))
        val max = kw.get("max_records").map(strip).filter(_.matches("\\d+"))
          .map(_.toInt).getOrElse(10000)
        val hook = valuesHook.get().getOrElse(throw new IllegalArgumentException(
          "dbt_utils.get_column_values needs a live catalog (render-time introspection)"))
        val vs = hook(table, column, max)
        val chosen = if (vs.nonEmpty) vs else kw.get("default").map(strip).toSeq
        "[" + chosen.map(v => "'" + v.replace("'", "\\'") + "'").mkString(", ") + "]"
      })
  }

  /** Positional/keyword split shared by the kw-accepting dbt_utils macros. */
  private def posKw(args: Seq[String]): (Seq[String], Map[String, String]) = {
    val pos = args.filterNot(_.trim.matches("(?s)^[A-Za-z_]\\w*\\s*=.*"))
    val kw = args.flatMap { a =>
      "(?s)^\\s*([A-Za-z_]\\w*)\\s*=\\s*(.+)$".r.findFirstMatchIn(a)
        .map(m => m.group(1) -> m.group(2).trim)
    }.toMap
    (pos, kw)
  }

  /** A relation argument may be `ref('m')` / `source('a','b')` / a quoted or
    * bare name — resolve exactly as `value()` would. */
  private def resolveRelation(raw: String): String = raw.trim match {
    case refCall(name)       => refs.get()(name)
    case sourceCall(db, tab) => s"$db.$tab"
    case other =>
      val t = other.trim
      if ((t.startsWith("'") && t.endsWith("'") && t.length >= 2) ||
          (t.startsWith("\"") && t.endsWith("\"") && t.length >= 2))
        t.substring(1, t.length - 1)
      else t
  }

  private val varCall =
    "(?is)^var\\(\\s*['\"]([^'\"]+)['\"]\\s*(?:,\\s*(.+?)\\s*)?\\)$".r
  private val refCall =
    "(?is)^ref\\(\\s*['\"]([^'\"]+)['\"]\\s*\\)$".r
  private val sourceCall =
    "(?is)^source\\(\\s*['\"]([^'\"]+)['\"]\\s*,\\s*['\"]([^'\"]+)['\"]\\s*\\)$".r

  /** Raw string value of an output/set expression. */
  private def value(expr: String, vars: Map[String, String],
                    bindings: Map[String, String], thisModel: Option[String]): String = {
    // jinja inline conditional `X if C [else Y]` (`{{ ',' if not loop.last }}`
    // — the dbt separator idiom). Engages ONLY when the condition actually
    // const-evaluates: keyword match is lowercase + top-level, and a raw SQL
    // fragment's ` IF `/non-constant condition falls through untouched.
    inlineIf(expr) match {
      case Some((lhs, cond, els)) =>
        ConstEval.eval(substitute(cond, vars, bindings, thisModel)) match {
          case Some(cv) =>
            return if (ConstEval.truthy(cv)) value(lhs, vars, bindings, thisModel)
            else els.map(value(_, vars, bindings, thisModel)).getOrElse("")
          case None => // not a constant condition — not an inline-if
        }
      case None =>
    }
    // Jinja filter pipeline `expr | f1 | f2(args)`: split on top-level pipes
    // (outside quotes/brackets), evaluate the head, fold filters left-to-right
    val segments = splitPipes(expr)
    if (segments.length > 1)
      return segments.tail.foldLeft(
        value(segments.head, vars, bindings, thisModel))(
        (v, f) => applyFilter(v, f.trim, vars, bindings, thisModel))
    val e = expr.trim
    e match {
      case varCall(name, default) =>
        vars.get(name).orElse(Option(default).map(d => value(d, vars, bindings, thisModel)))
          .getOrElse(throw new IllegalArgumentException(s"undefined jinja var('$name')"))
      case "this" =>
        thisModel.getOrElse(throw new IllegalArgumentException("{{ this }} outside evaluation"))
      // dbt relation references (reference sqlmesh/dbt/: ref() → upstream
      // model, source() → external table). The resolver maps short dbt names
      // to full model names; physical-table mapping happens later in render.
      case refCall(name)       => refs.get()(name)
      case sourceCall(db, tab) => s"$db.$tab"
      // dbt incremental guard: true when the evaluator is running an
      // incremental (non-first) insert — threaded via the "is_incremental"
      // variable (reference sqlmesh/dbt/basemodel.py incremental handling)
      case _ if e.equalsIgnoreCase("is_incremental()") =>
        vars.getOrElse("is_incremental", "false")
      // the enclosing {% call %} block's rendered body
      case "caller()" =>
        callerStack.get.headOption.getOrElse(
          throw new IllegalArgumentException("caller() outside a {% call %} block"))
      // dbt `log('msg'[, info=true])` — stderr line, renders to nothing
      // (packages call it liberally; silently failing on it would reject
      // whole vendored macro files)
      case logRe(argSrc) if balancedArgs(argSrc) && !macroEnv.get.contains("log") =>
        val msg = splitArgs(argSrc).headOption
          .map(a => value(a, vars, bindings, thisModel)).getOrElse("")
        System.err.println(s"[graft] dbt log: $msg")
        ""
      // jinja `print(msg)` — same contract as log (dbt packages use both)
      case printRe(argSrc) if balancedArgs(argSrc) && !macroEnv.get.contains("print") =>
        val msg = splitArgs(argSrc).headOption
          .map(a => value(a, vars, bindings, thisModel)).getOrElse("")
        System.err.println(s"[graft] dbt print: $msg")
        ""
      // dbt `exceptions.raise_compiler_error('msg')` — the package
      // guard-clause idiom (bad arguments, unsupported adapters): a named
      // error carrying the rendered message
      case raiseRe(argSrc) if balancedArgs(argSrc) =>
        val msg = splitArgs(argSrc).headOption
          .map(a => value(a, vars, bindings, thisModel)).getOrElse("")
        throw new IllegalArgumentException(s"dbt compiler error: $msg")
      // dbt `{{ return(expr) }}`: evaluate the inner expression, then HALT
      // the enclosing macro with it as the call's value (thrown to the
      // nearest callMacro — dbt's own control-flow shape; see MacroReturn)
      case returnRe(inner) if balancedArgs(inner) =>
        throw MacroReturn(value(inner, vars, bindings, thisModel))
      // `adapter.get_columns_in_relation(rel)` — dbt's live schema
      // introspection (dbt-adapters base relation API; the reference runs
      // these through real dbt jinja against the warehouse). The relation
      // resolves like every relation arg (ref()/source()/this/a bound macro
      // parameter), the catalog answers through the same schemaOf seam the
      // native @STAR macro uses, and the result renders as a jinja list of
      // column dicts carrying the attribute subset packages actually read
      // (.name/.column/.dtype/.data_type/.quoted) — dict attr access and
      // {% for %} over list-of-dicts are already ConstEval-native. Fails
      // loudly when no live catalog is wired (pure-text renders) or the
      // relation has no columns: an empty expansion would render into
      // silently-wrong SQL.
      // `run_query(sql)` — dbt's render-time query execution (dbt-core
      // core/dbt/context/providers.py run_query; the reference renders dbt
      // jinja against the live warehouse). The SQL evaluates in scope (a
      // string literal, a bound {% set %}/{% endset %} body, a ~ concat),
      // runs through the queryHook (the engine seam — wired to spark.sql
      // with the model's table mapping at evaluation time), and returns
      // the agate-shaped table literal (see resultTableLiteral). Fails
      // loudly with no live engine: dbt's own run_query is execute-time
      // only, and silently returning empty would render wrong SQL.
      case _ if e.startsWith("run_query") && splitCallPostfix(e, "run_query").isDefined =>
        val (argSrc, postfix) = splitCallPostfix(e, "run_query").get
        val sql = splitArgs(argSrc).headOption
          .map(a => value(a, vars, bindings, thisModel)).getOrElse(
            throw new IllegalArgumentException("run_query needs a SQL argument"))
        val hook = queryHook.get().getOrElse(throw new IllegalArgumentException(
          "run_query: no live engine is wired into this render " +
            "(run_query only works during evaluation, like dbt's)"))
        val (cols, rows) = hook(sql)
        applyPostfix(resultTableLiteral(cols, rows), postfix, e)
      // `load_result('name')` — dbt's companion to {% call statement %}:
      // {'response', 'data', 'table'} for a fetched statement, none if the
      // name was never run (dbt returns None then too). A postfix chain
      // (`load_result('x').table.columns[0].values()` — the get_single_value
      // idiom) evaluates over the literal.
      case _ if e.startsWith("load_result") && splitCallPostfix(e, "load_result").isDefined =>
        val (argSrc, postfix) = splitCallPostfix(e, "load_result").get
        val name = argSrc.trim.stripPrefix("'").stripSuffix("'")
          .stripPrefix("\"").stripSuffix("\"")
        statementResults.get.get(name) match {
          case Some((cols, rows)) =>
            val table = resultTableLiteral(cols, rows)
            val data = rows.map(_.map {
              case null                 => "none"
              case n: java.lang.Number  => n.toString
              case b: java.lang.Boolean => if (b) "True" else "False"
              case o => "'" + o.toString.replace("\\", "\\\\").replace("'", "\\'") + "'"
            }.mkString("[", ", ", "]")).mkString("[", ", ", "]")
            applyPostfix(s"{'response': 'OK', 'data': $data, 'table': $table}",
              postfix, e)
          case None =>
            require(postfix.trim.isEmpty, s"load_result('$name') is None " +
              s"(no fetched statement by that name) — cannot apply '$postfix'")
            "None"
        }
      // `adapter.quote(ident)` — Spark SQL identifier quoting. The arg
      // evaluates in scope (a bound loop var, a string literal, a `~`
      // concat); already-backticked identifiers pass through unchanged.
      case adapterQuoteRe(argSrc) if balancedArgs(argSrc) =>
        val ident = splitArgs(argSrc).headOption
          .map(a => value(a, vars, bindings, thisModel)).getOrElse(
            throw new IllegalArgumentException("adapter.quote needs an identifier"))
        if (ident.startsWith("`") && ident.endsWith("`")) ident
        else "`" + ident.replace("`", "``") + "`"
      case getColsRe(argSrc) if balancedArgs(argSrc) =>
        val argRaw = splitArgs(argSrc).headOption.map(_.trim).getOrElse(
          throw new IllegalArgumentException(
            "adapter.get_columns_in_relation needs a relation argument"))
        val rel = relationNameOf(argRaw match {
          case "this" => thisModel.getOrElse(throw new IllegalArgumentException(
            "get_columns_in_relation(this) outside a model render"))
          case other if bindings.contains(other) => bindings(other)
          case other => resolveRelation(other)
        })
        val cols = schemaHook.get()(rel)
        require(cols.nonEmpty,
          s"adapter.get_columns_in_relation: no columns for '$rel' — " +
            "either no live catalog is wired into this render or the " +
            "relation does not exist yet")
        cols.map { case (n, t) =>
          val dt = t.toLowerCase
          s"{'name': '$n', 'column': '$n', 'dtype': '$dt', " +
            s"'data_type': '$dt', 'quoted': '`$n`'}"
        }.mkString("[", ", ", "]")
      // `adapter.dispatch('m'[, 'pkg'])(args)` — the dbt cross-database
      // fallback chain (dbt-core dispatch semantics): resolve to the most
      // specific implementation macro visible in this render, preferring
      // the engine-specific `spark__m` over `default__m`, and the project's
      // over the package's namespaced copies (DbtLoader renames package
      // macros to `pkg__name`, so a package-internal `default__m` is
      // registered as `pkg__default__m`).
      case dispatchRe(mname, pkg, argSrc) if balancedArgs(argSrc) =>
        // dbt search order: the ADAPTER-specific name across the whole
        // namespace path (project first, then the package) beats default__
        // anywhere — a project's default__m must not shadow the package's
        // spark__m. Without an explicit namespace, EVERY loaded package's
        // implementations are candidates (dbt's macro namespace is global;
        // DbtLoader renames package copies to `pkg__spark__m`, which would
        // otherwise be unreachable from a bare dispatch('m')).
        val env = macroEnv.get
        def pkgScoped(adapter: String): Seq[String] = Option(pkg) match {
          case Some(p) => Seq(s"${p}__${adapter}__$mname")
          case None => env.keys.filter(_.endsWith(s"__${adapter}__$mname")).toSeq.sorted
        }
        val cands =
          (Seq(s"spark__$mname") ++ pkgScoped("spark") ++
           Seq(s"default__$mname") ++ pkgScoped("default"))
        cands.find(macroEnv.get.contains) match {
          case Some(target) =>
            callMacro(macroEnv.get()(target), splitArgs(argSrc), vars, bindings, thisModel)
          case None => throw new IllegalArgumentException(
            s"adapter.dispatch('$mname'): no spark__$mname or default__$mname " +
              "implementation is visible")
        }
      // user {% macro %} invocation, then the dbt_utils builtin subset
      case callRe(name, argSrc) if macroEnv.get.contains(name) && balancedArgs(argSrc) =>
        callMacro(macroEnv.get()(name), splitArgs(argSrc), vars, bindings, thisModel)
      case callRe(name, argSrc) if dbtUtils.contains(name) && balancedArgs(argSrc) =>
        // jinja evaluates call args in scope; here only bare bound
        // identifiers substitute (raw SQL fragments must pass through) —
        // `pivot('cat', segs)` with {% set segs = get_column_values(...) %}
        val kwRe = "(?s)^\\s*([A-Za-z_]\\w*)\\s*=\\s*(.+)$".r
        val resolved = splitArgs(argSrc).map { a =>
          kwRe.findFirstMatchIn(a) match {
            case Some(m) if bindings.contains(m.group(2).trim) =>
              s"${m.group(1)}=${bindings(m.group(2).trim)}"
            case None if bindings.contains(a.trim) => bindings(a.trim)
            case _ => a
          }
        }
        dbtUtils(name)(resolved)
      case _ if bindings.contains(e) => bindings(e)
      case _ if vars.contains(e)     => vars(e)
      case _ if isAtomicStringLit(e) =>
        unescape(e.substring(1, e.length - 1))
      // bare identifier with no binding: itself (column names in for-lists)
      // — UNLESS a dotted prefix binds to a container literal, which makes
      // it jinja attribute access (`col.name` over the column dicts
      // get_columns_in_relation returns) and routes to ConstEval below
      case _ if e.matches("[A-Za-z_][\\w.]*") &&
                !containerAttrAccess(e, vars, bindings) => e
      case _ =>
        ConstEval.eval(substitute(e, vars, bindings, thisModel)) match {
          case Some(ConstEval.N(n)) => if (n.isWhole) n.toBigInt.toString else n.toString
          case Some(ConstEval.S(s)) => s
          case Some(ConstEval.B(b)) => b.toString.toUpperCase
          case Some(l @ ConstEval.L(_)) => ConstEval.show(l) // jinja prints container literals
          case Some(d @ ConstEval.D(_)) => ConstEval.show(d)
          case Some(ConstEval.Null)     => "None"
          case None => throw new IllegalArgumentException(s"cannot evaluate jinja expr: $e")
        }
    }
  }

  /** A ref()/source()/this macro argument as a dbt BaseRelation-shaped
    * dict: the attribute subset packages read (identifier/schema/database/
    * is_cte/metadata.type) plus `__relation__` + `name` for the coercions
    * back to a plain relation string. None for non-relation args. */
  private def relationArg(raw: String, thisModel: Option[String]): Option[String] = {
    val name = raw.trim match {
      case "this" => thisModel
      case refCall(n) => Some(refs.get()(n))
      case sourceCall(db, tab) => Some(s"$db.$tab")
      case _ => None
    }
    name.map { n =>
      val (sch, ident) = n.lastIndexOf('.') match {
        case -1 => ("", n)
        case i  => (n.take(i), n.drop(i + 1))
      }
      s"{'__relation__': True, 'name': '$n', 'identifier': '$ident', " +
        s"'schema': '$sch', 'database': none, 'is_cte': False, " +
        "'metadata': {'type': 'BaseRelation'}}"
    }
  }

  /** Collapse a relation dict back to its name; identity otherwise. */
  private def relationNameOf(v: String): String =
    if (!v.trim.startsWith("{'__relation__'")) v
    else ConstEval.eval(v) match {
      case Some(ConstEval.D(es)) => es.collectFirst {
        case (ConstEval.S("name"), ConstEval.S(n)) => n
      }.getOrElse(v)
      case _ => v
    }

  /** Evaluate a ConstEval postfix chain (`.table.columns[0].values()`)
    * over a rendered literal; identity when there is no postfix. */
  private def applyPostfix(literal: String, postfix: String, orig: String): String =
    if (postfix.trim.isEmpty) literal
    else ConstEval.eval(literal + postfix) match {
      case Some(ConstEval.S(s))     => s
      case Some(ConstEval.N(n))     => if (n.isWhole) n.toBigInt.toString else n.toString
      case Some(ConstEval.B(b))     => b.toString.toUpperCase
      case Some(l @ ConstEval.L(_)) => ConstEval.show(l)
      case Some(d @ ConstEval.D(_)) => ConstEval.show(d)
      case Some(ConstEval.Null)     => "None"
      case None => throw new IllegalArgumentException(
        s"cannot evaluate jinja expr: $orig")
    }

  /** Whether `e` is ONE string literal spanning the whole token — the
    * guard that keeps `'a' ~ 'b'` (concat of two literals) out of the
    * strip-outer-quotes path, which silently rendered it as the inside of
    * a single string. Honors backslash escapes AND SQL-style doubled
    * quotes (`'it''s'` — the form DbtLoader emits for embedded quotes). */
  private def isAtomicStringLit(e: String): Boolean = {
    if (e.length < 2) return false
    val q = e.charAt(0)
    if ((q != '\'' && q != '"') || e.charAt(e.length - 1) != q) return false
    var i = 1
    while (i < e.length - 1) {
      val c = e.charAt(i)
      if (c == '\\') i += 2
      else if (c == q) {
        if (i + 1 < e.length - 1 && e.charAt(i + 1) == q) i += 2 // doubled
        else return false // literal closes before the end
      } else i += 1
    }
    i == e.length - 1
  }

  /** Whether a dotted identifier is attribute access on a container-valued
    * binding (`col.quoted` with `col` bound to a dict literal) rather than
    * a raw SQL fragment (`t.order_col` with nothing bound): true when the
    * LONGEST bound proper prefix holds a list/dict literal. */
  private def containerAttrAccess(e: String, vars: Map[String, String],
                                  bindings: Map[String, String]): Boolean = {
    val parts = e.split('.')
    (parts.length - 1 to 1 by -1).iterator
      .map(k => parts.take(k).mkString("."))
      .flatMap(p => bindings.get(p).orElse(vars.get(p)))
      .nextOption()
      .exists { v => val t = v.trim; t.startsWith("{") || t.startsWith("[") }
  }

  /** Locate a python-style ternary: the FIRST top-level lowercase ` if `
    * keyword, then the first top-level ` else ` after it (right-associative
    * like python's — the else-branch may itself be a ternary). Lowercase +
    * word-boundary matching keeps SQL's ` IF(`/` ELSE ` out. */
  private def inlineIf(s: String): Option[(String, String, Option[String])] = {
    def topLevelKw(str: String, kw: String): Int = {
      var depth = 0; var q = ' '; var i = 0
      while (i < str.length) {
        val c = str.charAt(i)
        if (q != ' ') { if (c == q) q = ' ' }
        else c match {
          case '\'' | '"'      => q = c
          case '(' | '[' | '{' => depth += 1
          case ')' | ']' | '}' => depth -= 1
          // kw carries its surrounding spaces — those ARE the word boundaries
          case _ if depth == 0 && str.startsWith(kw, i) => return i
          case _ =>
        }
        i += 1
      }
      -1
    }
    val at = topLevelKw(s, " if ")
    if (at <= 0) return None
    val lhs = s.substring(0, at).trim
    val rest = s.substring(at + 4)
    if (lhs.isEmpty || rest.trim.isEmpty) return None
    val elseAt = topLevelKw(rest, " else ")
    if (elseAt < 0) Some((lhs, rest.trim, None))
    else Some((lhs, rest.substring(0, elseAt).trim,
      Some(rest.substring(elseAt + 6).trim)))
  }

  /** Split on top-level single `|` (outside quotes and brackets/parens) —
    * the Jinja filter separator. `||` is SQL concat inside raw fragments
    * and never splits. A single segment means no filters. */
  private def splitPipes(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]; val cur = new StringBuilder
    var depth = 0; var q = ' '; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != ' ') { if (c == q) q = ' '; cur.append(c) }
      else c match {
        case '\'' | '"'          => q = c; cur.append(c)
        case '(' | '['           => depth += 1; cur.append(c)
        case ')' | ']'           => depth -= 1; cur.append(c)
        case '|' if depth == 0 && i + 1 < s.length && s.charAt(i + 1) == '|' =>
          cur.append("||"); i += 1
        case '|' if depth == 0   => out += cur.toString; cur.clear()
        case other               => cur.append(other)
      }
      i += 1
    }
    out += cur.toString
    out.result()
  }

  /** The common Jinja/dbt filter subset (jinja2 builtin filters), applied to
    * the already-evaluated string value. */
  private def applyFilter(v: String, filter: String, vars: Map[String, String],
                          bindings: Map[String, String],
                          thisModel: Option[String]): String = {
    val call = "(?s)^([A-Za-z_]\\w*)\\s*(?:\\((.*)\\))?$".r
    filter match {
      case call(name, argSrc) =>
        // lazy: kwarg-form filters (map(attribute=...)) must not push their
        // raw kwarg through value()
        lazy val args = Option(argSrc).map(a =>
          splitArgs(a).map(x => value(x, vars, bindings, thisModel))).getOrElse(Nil)
        // container-aware filters parse the (literal-rendered) value back
        def asList: Option[Vector[ConstEval.V]] =
          if (!v.trim.startsWith("[")) None
          else ConstEval.eval(v) match {
            case Some(ConstEval.L(xs)) => Some(xs); case _ => None
          }
        name match {
          case "upper"   => v.toUpperCase
          case "lower"   => v.toLowerCase
          case "trim"    => v.trim
          case "length"  => asList.map(_.length).getOrElse(v.length).toString
          case "title"   => v.split(" ").map(w =>
            if (w.isEmpty) w else w.head.toUpper + w.tail.toLowerCase).mkString(" ")
          case "replace" => v.replace(args(0), args(1))
          case "default" => if (v.nonEmpty) v else args.headOption.getOrElse("")
          case "truncate" => v.take(args.headOption.map(_.toInt).getOrElse(255))
          case "int"     => BigDecimal(v).toBigInt.toString
          case "round"   =>
            val d = args.headOption.map(_.toInt).getOrElse(0)
            BigDecimal(v).setScale(d, BigDecimal.RoundingMode.HALF_UP).toString
          case "join"    => // list → string with separator (jinja join filter)
            val sep = args.headOption.getOrElse("")
            asList.map(_.map(ConstEval.raw).mkString(sep)).getOrElse(v)
          case "first"   => asList.flatMap(_.headOption).map(ConstEval.raw).getOrElse(v.take(1))
          case "last"    => asList.flatMap(_.lastOption).map(ConstEval.raw).getOrElse(v.takeRight(1))
          case "list"    => v // lists already render as literals
          case "unique"  =>
            asList.map(xs => ConstEval.show(ConstEval.L(xs.distinct))).getOrElse(v)
          case "sort"    =>
            asList.map(xs => ConstEval.show(ConstEval.L(
              xs.sortBy(ConstEval.raw)))).getOrElse(v)
          case "string"  => v
          case "map"     =>
            // `xs | map('lower') | list` — apply a NAMED filter to each
            // element (the dbt-package normalization idiom). Attribute
            // form `map(attribute='name')` plucks a dict key per element.
            val attrRe = "(?s)^attribute\\s*=\\s*(.+)$".r
            val plucked = Option(argSrc).map(splitArgs(_).map(_.trim)) match {
              case Some(Seq(attrRe(a))) =>
                val key = value(a, vars, bindings, thisModel)
                val idx = scala.util.Try(key.trim.toInt).toOption
                asList.map(_.map {
                  case ConstEval.D(es) => es.collectFirst {
                    case (ConstEval.S(k), x) if k == key => x
                  }.getOrElse(ConstEval.Null)
                  // `data | map(attribute=0)` — integer attribute over
                  // list-shaped rows (the load_result('..')['data'] idiom)
                  case ConstEval.L(xs) if idx.exists(i => i >= 0 && i < xs.length) =>
                    xs(idx.get)
                  case other => other
                })
              case _ =>
                val f = args.headOption.getOrElse(throw new
                    IllegalArgumentException("map filter needs a filter name"))
                asList.map(_.map(x => ConstEval.S(
                  applyFilter(ConstEval.raw(x), f, vars, bindings, thisModel))))
            }
            plucked.map(xs => ConstEval.show(ConstEval.L(xs)))
              .getOrElse(throw new IllegalArgumentException(
                s"map filter needs a list, got: $v"))
          case other => throw new IllegalArgumentException(s"unsupported jinja filter: $other")
        }
      case _ => throw new IllegalArgumentException(s"bad jinja filter: $filter")
    }
  }

  private def truthy(cond: String, vars: Map[String, String],
                     bindings: Map[String, String], thisModel: Option[String]): Boolean =
    ConstEval.truthy(substitute(cond, vars, bindings, thisModel))

  /** Replace var() calls and known identifiers with literals so ConstEval
    * (which speaks SQL constants + the jinja container/ops subset) can run
    * the expression. */
  private def substitute(expr: String, vars: Map[String, String],
                         bindings: Map[String, String], thisModel: Option[String]): String = {
    var e = expr
    // `f(args) is [not] none` / `(f(args)) is [not] none` — the call form
    // (dbt's `load_relation(rel) is not none` / `load_result('x') is none`
    // guards): evaluate the call, test its value. Handled before the
    // identifier form, which only sees bare names.
    val callIsRe =
      "\\(?\\s*([A-Za-z_][\\w.]*\\([^()]*\\))\\s*\\)?\\s+is\\s+(not\\s+)?none\\b".r
    e = callIsRe.replaceAllIn(e, m => {
      val v = value(m.group(1), vars, bindings, thisModel)
      val isNone = v.isEmpty || v.equalsIgnoreCase("none")
      if (isNone != (m.group(2) != null)) "TRUE" else "FALSE"
    })
    // `X is [not] mapping` — jinja's dict type test (dbt_utils._is_relation
    // guards every relation-taking macro with it)
    val mapRe = "([A-Za-z_][\\w.]*)\\s+is\\s+(not\\s+)?mapping\\b".r
    e = mapRe.replaceAllIn(e, m => {
      val isMap = bindings.get(m.group(1)).orElse(vars.get(m.group(1)))
        .exists(_.trim.startsWith("{"))
      if (isMap != (m.group(2) != null)) "TRUE" else "FALSE"
    })
    // `X is [not] defined` / `X is [not] none` resolve BEFORE identifier
    // substitution — they ask about the NAME's existence, not its value
    // (dbt's `{% if sqlmesh_incremental is defined %}` guard idiom)
    val isRe = "([A-Za-z_][\\w.]*)\\s+is\\s+(not\\s+)?(defined|none)\\b".r
    e = isRe.replaceAllIn(e, m => {
      val tok = m.group(1); val neg = m.group(2) != null
      val bound = bindings.get(tok).orElse(vars.get(tok))
        .orElse(if (tok == "this") thisModel else None)
      val defined = bound.isDefined || tok == "execute"
      val base = m.group(3) match {
        case "defined" => defined
        case _ /* none */ =>
          !defined || bound.exists(v => v.isEmpty || v.equalsIgnoreCase("none"))
      }
      if (base != neg) "TRUE" else "FALSE"
    })
    e = "(?i)is_incremental\\(\\s*\\)".r.replaceAllIn(e,
      if (vars.get("is_incremental").exists(_.equalsIgnoreCase("true"))) "TRUE" else "FALSE")
    // ref()/source() INSIDE expressions resolve to their relation names as
    // string literals — the package idiom of concatenating relations into
    // run_query SQL (`'select ... from ' ~ source('a', 'b')`) needs them
    // evaluable by ConstEval; in plain {{ }} output context value() renders
    // them bare before ever reaching here.
    e = "(?is)\\bref\\(\\s*['\"]([^'\"]+)['\"]\\s*\\)".r
      .replaceAllIn(e, m => java.util.regex.Matcher.quoteReplacement(
        "'" + refs.get()(m.group(1)) + "'"))
    e = "(?is)\\bsource\\(\\s*['\"]([^'\"]+)['\"]\\s*,\\s*['\"]([^'\"]+)['\"]\\s*\\)".r
      .replaceAllIn(e, m => java.util.regex.Matcher.quoteReplacement(
        "'" + m.group(1) + "." + m.group(2) + "'"))
    // filter chains inside the expression (`cols|length <= 0`,
    // `col.column | lower not in except` — jinja binds `|` tighter than
    // comparisons) evaluate through value() and substitute their result —
    // ConstEval has no `|`, so leaving them in made the whole condition
    // unevaluable and SILENTLY FALSY (r17 fix: the empty-columns branch of
    // dbt_utils.star never fired). `||` stays untouched (the name after a
    // lone pipe must be a letter); an unknown filter leaves the text as-is.
    val filterChainRe = ("([A-Za-z_][\\w.]*(?:\\[[^\\]]*\\])?" +
      "(?:\\s*\\|\\s*[A-Za-z_]\\w*(?:\\([^()]*\\))?)+)").r
    e = filterChainRe.replaceAllIn(e, m =>
      try java.util.regex.Matcher.quoteReplacement(
        quoteIfNeeded(value(m.group(1), vars, bindings, thisModel)))
      catch { case _: Exception => java.util.regex.Matcher.quoteReplacement(m.group(1)) })
    e = "(?is)var\\(\\s*['\"]([^'\"]+)['\"]\\s*(?:,\\s*([^)]+?)\\s*)?\\)".r
      .replaceAllIn(e, m => {
        val v = vars.get(m.group(1)).orElse(Option(m.group(2)).map(_.trim))
          .getOrElse(throw new IllegalArgumentException(s"undefined jinja var('${m.group(1)}')"))
        java.util.regex.Matcher.quoteReplacement(quoteIfNeeded(v))
      })
    // identifier substitution, skipping quoted string literals
    val keywords = Set("and", "or", "not", "true", "false", "in",
      "is", "defined", "none", "null", "if", "else", "range")
    val sb = new StringBuilder
    var i = 0
    while (i < e.length) {
      val c = e.charAt(i)
      if (c == '\'' || c == '"') {
        // skip string literals of either quote style, honoring \-escapes
        // (show() emits them; a naive indexOf would split mid-string)
        var j = i + 1
        while (j < e.length && e.charAt(j) != c) {
          if (e.charAt(j) == '\\' && j + 1 < e.length) j += 2 else j += 1
        }
        val stop = if (j >= e.length) e.length else j + 1
        sb.append(e.substring(i, stop)); i = stop
      } else if (c.isLetter || c == '_') {
        var j = i + 1
        while (j < e.length && (e.charAt(j).isLetterOrDigit || e.charAt(j) == '_' || e.charAt(j) == '.')) j += 1
        val tok = e.substring(i, j)
        // resolve the LONGEST bound dotted prefix: full token first (dotted
        // bindings like `ns.found`/`loop.index` are single keys), then
        // shorter prefixes so `cfg.items()` substitutes `cfg`'s dict literal
        // and leaves `.items()` as a ConstEval postfix
        val resolved: Option[(String, Int)] =
          if (keywords.contains(tok.toLowerCase)) None
          else {
            val parts = tok.split('.')
            (parts.length to 1 by -1).iterator.map(_ match {
              case k => parts.take(k).mkString(".")
            }).map { p =>
              val v =
                if (p == "this") thisModel
                else bindings.get(p).orElse(vars.get(p))
              v.map(x => (x, p.length))
            }.collectFirst { case Some(hit) => hit }
          }
        resolved match {
          case Some((v, len)) => sb.append(quoteIfNeeded(v)); i = i + len
          case None           => sb.append(tok); i = j
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Python/jinja string-literal escapes (`'\n'` is a newline in a template
    * expression, unlike SQL's literal backslash-n). */
  private def unescape(s: String): String = {
    if (!s.contains('\\')) return s
    val sb = new StringBuilder; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); case 't' => sb.append('\t')
          case x   => sb.append(x)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def quoteIfNeeded(v: String): String = {
    val t = v.trim
    // only an actually-parseable number stays bare: date-like values
    // ('2024-01-01') and versions ('1.2.3') must quote, or ConstEval would
    // silently do arithmetic on them. Booleans/none and container literals
    // stay bare too — quoting 'false' would make it a TRUTHY string.
    if (t.startsWith("'")) t
    else if (t.startsWith("[") || t.startsWith("{")) t
    else if (t.equalsIgnoreCase("true") || t.equalsIgnoreCase("false") ||
             t.equalsIgnoreCase("none")) t
    else if (scala.util.Try(BigDecimal(t)).isSuccess) t
    else "'" + t.replace("\\", "\\\\").replace("'", "\\'") + "'"
  }
}
