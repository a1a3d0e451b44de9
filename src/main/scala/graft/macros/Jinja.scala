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

  private sealed trait Node
  private final case class Text(s: String) extends Node
  private final case class Out(expr: String) extends Node
  private final case class If(branches: Seq[(String, Seq[Node])], orElse: Seq[Node]) extends Node
  private final case class For(v: String, list: String, body: Seq[Node]) extends Node
  private final case class SetVar(name: String, expr: String) extends Node

  private sealed trait Tok
  private final case class TText(s: String) extends Tok
  private final case class TExpr(s: String) extends Tok
  private final case class TStmt(s: String) extends Tok

  def render(template: String, vars: Map[String, String],
             thisModel: Option[String] = None,
             refResolver: String => String = identity): String = {
    refs.set(refResolver)
    try renderImpl(template, vars, thisModel)
    finally refs.remove()
  }

  /** dbt `ref()` resolution for the current render (threaded via a
    * ThreadLocal so the recursive evaluators don't all grow a parameter). */
  private val refs = new ThreadLocal[String => String] {
    override def initialValue(): String => String = identity
  }

  private def renderImpl(template: String, vars: Map[String, String],
                         thisModel: Option[String]): String = {
    val toks = tokenize(template)
    val (nodes, rest) = parseNodes(toks, Nil)
    require(rest.isEmpty, s"unexpected ${rest.head} outside a block")
    val out = new StringBuilder
    val bindings = scala.collection.mutable.Map[String, String]()
    def evalNodes(ns: Seq[Node]): Unit = ns.foreach {
      case Text(s) => out.append(s)
      case Out(e)  => out.append(value(e, vars, bindings.toMap, thisModel))
      case SetVar(n, e) => bindings(n) = value(e, vars, bindings.toMap, thisModel)
      case If(branches, orElse) =>
        branches.find { case (c, _) => truthy(c, vars, bindings.toMap, thisModel) } match {
          case Some((_, body)) => evalNodes(body)
          case None            => evalNodes(orElse)
        }
      case For(v, listExpr, body) =>
        val items = parseList(listExpr).map(it => value(it, vars, bindings.toMap, thisModel))
        items.zipWithIndex.foreach { case (it, idx) =>
          val saved = (bindings.get(v), bindings.get("loop.index"))
          bindings(v) = it; bindings("loop.index") = (idx + 1).toString
          evalNodes(body)
          saved._1.fold(bindings.remove(v): Unit)(bindings(v) = _)
          saved._2.fold(bindings.remove("loop.index"): Unit)(bindings("loop.index") = _)
        }
    }
    evalNodes(nodes)
    out.toString
  }

  // ------------------------------------------------------------- parsing

  private def tokenize(s: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val e = s.indexOf("{{", i); val t = s.indexOf("{%", i)
      val next = (e, t) match {
        case (-1, -1) => -1
        case (-1, x)  => x
        case (x, -1)  => x
        case (a, b)   => math.min(a, b)
      }
      if (next < 0) { out += TText(s.substring(i)); i = s.length }
      else {
        if (next > i) out += TText(s.substring(i, next))
        if (s.startsWith("{{", next)) {
          val close = s.indexOf("}}", next)
          require(close > 0, "unclosed {{")
          out += TExpr(s.substring(next + 2, close).trim)
          i = close + 2
        } else {
          val close = s.indexOf("%}", next)
          require(close > 0, "unclosed {%")
          out += TStmt(s.substring(next + 2, close).trim)
          i = close + 2
        }
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
              val m = "(?is)for\\s+([A-Za-z_][\\w]*)\\s+in\\s+(.+)".r
              st match {
                case m(v, listExpr) =>
                  val (body, r) = parseNodes(rest.tail, Seq("endfor"))
                  nodes += For(v, listExpr.trim, body); rest = r.tail
                case _ => throw new IllegalArgumentException(s"bad for: {% $st %}")
              }
            case "set" =>
              val m = "(?is)set\\s+([A-Za-z_][\\w.]*)\\s*=\\s*(.+)".r
              st match {
                case m(n, e) => nodes += SetVar(n, e.trim); rest = rest.tail
                case _ => throw new IllegalArgumentException(s"bad set: {% $st %}")
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

  private val varCall =
    "(?is)^var\\(\\s*['\"]([^'\"]+)['\"]\\s*(?:,\\s*(.+?)\\s*)?\\)$".r
  private val refCall =
    "(?is)^ref\\(\\s*['\"]([^'\"]+)['\"]\\s*\\)$".r
  private val sourceCall =
    "(?is)^source\\(\\s*['\"]([^'\"]+)['\"]\\s*,\\s*['\"]([^'\"]+)['\"]\\s*\\)$".r

  /** Raw string value of an output/set expression. */
  private def value(expr: String, vars: Map[String, String],
                    bindings: Map[String, String], thisModel: Option[String]): String = {
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
      case _ if bindings.contains(e) => bindings(e)
      case _ if vars.contains(e)     => vars(e)
      case _ if (e.startsWith("'") && e.endsWith("'") && e.length >= 2) ||
                (e.startsWith("\"") && e.endsWith("\"") && e.length >= 2) =>
        e.substring(1, e.length - 1)
      // bare identifier with no binding: itself (column names in for-lists)
      case _ if e.matches("[A-Za-z_][\\w.]*") => e
      case _ =>
        ConstEval.eval(substitute(e, vars, bindings, thisModel)) match {
          case Some(ConstEval.N(n)) => if (n.isWhole) n.toBigInt.toString else n.toString
          case Some(ConstEval.S(s)) => s
          case Some(ConstEval.B(b)) => b.toString.toUpperCase
          case None => throw new IllegalArgumentException(s"cannot evaluate jinja expr: $e")
        }
    }
  }

  private def truthy(cond: String, vars: Map[String, String],
                     bindings: Map[String, String], thisModel: Option[String]): Boolean =
    ConstEval.truthy(substitute(cond, vars, bindings, thisModel))

  /** Replace var() calls and known identifiers with literals so ConstEval
    * (which speaks SQL constants) can run the expression. */
  private def substitute(expr: String, vars: Map[String, String],
                         bindings: Map[String, String], thisModel: Option[String]): String = {
    var e = expr.replaceAll("==", "=")
    e = "(?i)is_incremental\\(\\s*\\)".r.replaceAllIn(e,
      if (vars.get("is_incremental").exists(_.equalsIgnoreCase("true"))) "TRUE" else "FALSE")
    e = "(?is)var\\(\\s*['\"]([^'\"]+)['\"]\\s*(?:,\\s*([^)]+?)\\s*)?\\)".r
      .replaceAllIn(e, m => {
        val v = vars.get(m.group(1)).orElse(Option(m.group(2)).map(_.trim))
          .getOrElse(throw new IllegalArgumentException(s"undefined jinja var('${m.group(1)}')"))
        java.util.regex.Matcher.quoteReplacement(quoteIfNeeded(v))
      })
    // identifier substitution, skipping quoted string literals
    val keywords = Set("and", "or", "not", "true", "false", "in")
    val sb = new StringBuilder
    var i = 0
    while (i < e.length) {
      val c = e.charAt(i)
      if (c == '\'') {
        val close = e.indexOf('\'', i + 1)
        val stop = if (close < 0) e.length else close + 1
        sb.append(e.substring(i, stop)); i = stop
      } else if (c.isLetter || c == '_') {
        var j = i + 1
        while (j < e.length && (e.charAt(j).isLetterOrDigit || e.charAt(j) == '_' || e.charAt(j) == '.')) j += 1
        val tok = e.substring(i, j)
        val resolved =
          if (keywords.contains(tok.toLowerCase)) None
          else if (tok == "this") thisModel
          else bindings.get(tok).orElse(vars.get(tok))
        sb.append(resolved.fold(tok)(quoteIfNeeded))
        i = j
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def quoteIfNeeded(v: String): String = {
    val t = v.trim
    // only an actually-parseable number stays bare: date-like values
    // ('2024-01-01') and versions ('1.2.3') must quote, or ConstEval would
    // silently do arithmetic on them
    if (t.startsWith("'")) t
    else if (scala.util.Try(BigDecimal(t)).isSuccess) t
    else s"'${t}'"
  }
}
