package graft.macros

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

/** The macro/render pipeline (reference: sqlmesh/core/macros.py — evaluator
  * :154, builtins :694-1372; dialect parse of `@name(...)` dialect.py:217).
  *
  * Ours operates on SQL *text* producing Spark SQL: macros expand before the
  * body reaches Catalyst, exactly as the reference expands sqlglot ASTs before
  * transpilation. Time variables follow utils/date.py:224-270 (end-inclusive
  * rendering of half-open interval bounds).
  */
final class MacroEvaluator(
    val start: Long,
    val end: Long,
    val execution: Long,
    val thisModel: Option[String] = None,
    val variables: Map[String, String] = Map.empty,
    val schemaOf: String => Seq[(String, String)] = _ => Nil,
    /** user Scala macros (reference's Python `@macro()` registry,
      * macros.py:592): name -> args => SQL text. */
    val registry: Map[String, Seq[String] => String] = Map.empty,
    /** dbt `{{ ref('x') }}` resolution: short dbt name -> full model name. */
    val refResolver: String => String = identity,
    /** render-time catalog introspection for dbt_utils.get_column_values:
      * (relation, column, maxRecords) -> distinct values. */
    val columnValues: Option[(String, String, Int) => Seq[String]] = None,
    /** render-time query execution for dbt run_query/statement:
      * SQL -> (column names, rows of raw cells). */
    val runQuery: Option[String => (Seq[String], Seq[Seq[Any]])] = None) {

  private val defs = scala.collection.mutable.Map[String, (Seq[String], String)]()
  private lazy val registryUpper = registry.map { case (k, v) => k.toUpperCase -> v }

  private def fmt(ms: Long, p: String) =
    DateTimeFormatter.ofPattern(p).withZone(ZoneOffset.UTC).format(Instant.ofEpochMilli(ms))

  /** Predefined time variables — for each of start|end|execution:
    * _dt,_date,_ds,_ts,_epoch,_millis,_hour (+ legacy latest_*). `end` renders
    * inclusive (end - 1ms), matching make_inclusive (utils/date.py). */
  private def timeVars: Map[String, String] = {
    val incEnd = end - 1
    def group(prefix: String, ms: Long, inclusive: Boolean): Map[String, String] = {
      val m = if (inclusive) ms else ms
      Map(
        s"${prefix}_ds"     -> s"'${fmt(m, "yyyy-MM-dd")}'",
        s"${prefix}_ts"     -> s"'${fmt(m, "yyyy-MM-dd HH:mm:ss.SSS")}'",
        s"${prefix}_tstz"   -> s"'${fmt(m, "yyyy-MM-dd HH:mm:ss.SSS")}+00:00'",
        s"${prefix}_date"   -> s"DATE '${fmt(m, "yyyy-MM-dd")}'",
        s"${prefix}_dt"     -> s"TIMESTAMP '${fmt(m, "yyyy-MM-dd HH:mm:ss.SSS")}'",
        s"${prefix}_dtntz"  -> s"TIMESTAMP '${fmt(m, "yyyy-MM-dd HH:mm:ss.SSS")}'",
        s"${prefix}_epoch"  -> (m / 1000).toString,
        s"${prefix}_millis" -> m.toString,
        s"${prefix}_hour"   -> fmt(m, "H"))
    }
    group("start", start, inclusive = false) ++
      group("end", incEnd, inclusive = true) ++
      group("execution", execution, inclusive = false) ++
      group("latest", execution, inclusive = false)
  }

  def render(sql: String): String = {
    // dbt-compat: jinja blocks expand first (reference dialect.py:57-66 jinja
    // grammar), then the native @-macro pass runs over the result
    val pre =
      if (Jinja.hasJinja(sql))
        Jinja.render(sql, variables ++ timeVars.map { case (k, v) => k -> v }, thisModel,
          refResolver, columnValues = columnValues, schemaOf = schemaOf,
          runQuery = runQuery)
      else sql
    renderDepth(pre, 0)
  }

  private def renderDepth(sql: String, depth: Int): String = {
    if (depth > 16) throw new IllegalStateException("macro recursion too deep")
    val sb = new StringBuilder
    var i = 0
    val n = sql.length
    var inStr = false
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') { inStr = !inStr; sb.append(c); i += 1 }
      else if (inStr || c != '@') { sb.append(c); i += 1 }
      else if (i + 1 < n && sql.charAt(i + 1) == '{') {
        // @{name} raw interpolation (RESOLVE_TEMPLATE-style, macros.py:1372).
        // Unknown names keep their marker: they may be lambda params that a
        // later @EACH/@REDUCE substitution resolves (p_@{q} -> p_25).
        val close = sql.indexOf('}', i + 2)
        val name = sql.substring(i + 2, close)
        sb.append(lookupVar(name).getOrElse(s"@{$name}"))
        i = close + 1
      } else {
        val m = MacroEvaluator.ident.findPrefixMatchOf(sql.substring(i + 1))
        m match {
          case None => sb.append(c); i += 1
          case Some(idm) =>
            val name = idm.matched
            var j = i + 1 + name.length
            if (j < n && sql.charAt(j) == '(') {
              val (args, after) = parseArgs(sql, j)
              val rendered = args.map(a => renderDepth(a, depth + 1))
              sb.append(renderDepth(applyMacro(name, rendered), depth + 1))
              i = after
            } else {
              sb.append(expandVar(name))
              i = j
            }
        }
      }
    }
    sb.toString
  }

  private def lookupVar(name: String): Option[String] =
    timeVars.get(name.toLowerCase).orElse(variables.get(name))

  private def expandVar(name: String): String = name.toLowerCase match {
    case "this_model" =>
      thisModel.getOrElse(throw new IllegalStateException("@this_model outside model scope"))
    case _ => lookupVar(name).getOrElse(s"@$name")
  }

  /** Parse `( … )` starting at `open`; returns top-level comma-split args. */
  private def parseArgs(sql: String, open: Int): (Seq[String], Int) = {
    var depth = 0; var i = open; var inStr = false
    val args = Seq.newBuilder[String]; val cur = new StringBuilder
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') { inStr = !inStr; cur.append(c) }
      else if (inStr) cur.append(c)
      else c match {
        case '(' | '[' => depth += 1; if (depth > 1) cur.append(c)
        case ')' | ']' =>
          depth -= 1
          if (depth == 0 && c == ')') {
            val a = cur.toString.trim; if (a.nonEmpty) args += a
            return (args.result(), i + 1)
          } else cur.append(c)
        case ',' if depth == 1 =>
          args += cur.toString.trim; cur.clear()
        case other => cur.append(other)
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced macro call at $open in: $sql")
  }

  private def parseList(s: String): Seq[String] = {
    val t = s.trim
    val inner = if (t.startsWith("[") && t.endsWith("]")) t.substring(1, t.length - 1) else t
    // split on top-level commas
    var depth = 0; var inStr = false
    val out = Seq.newBuilder[String]; val cur = new StringBuilder
    inner.foreach {
      case '\'' => inStr = !inStr; cur.append('\'')
      case c if inStr => cur.append(c)
      case c @ ('(' | '[') => depth += 1; cur.append(c)
      case c @ (')' | ']') => depth -= 1; cur.append(c)
      case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) out += cur.toString.trim
    out.result()
  }

  private def lambda(s: String): (Seq[String], String) = {
    val idx = s.indexOf("->")
    require(idx > 0, s"expected lambda, got: $s")
    val params = s.substring(0, idx).replaceAll("[()]", "").split(",").map(_.trim).toSeq
    (params, s.substring(idx + 2).trim)
  }

  private def substitute(body: String, params: Seq[String], values: Seq[String]): String =
    params.zip(values).foldLeft(body) { case (b, (p, v)) =>
      val vq = java.util.regex.Matcher.quoteReplacement(v)
      val pq = java.util.regex.Pattern.quote(p)
      // `@{param}` interpolates inside identifiers (p_@{q} -> p_25);
      // bare whole-identifier occurrences substitute directly.
      b.replaceAll("@\\{" + pq + "\\}", vq)
        .replaceAll("(?i)@?\\b" + pq + "\\b", vq)
    }

  private val nullToken = "'_sqlmesh_surrogate_key_null_'"

  /** Builtin @-macros (macros.py:694-1372). */
  private def applyMacro(name: String, args: Seq[String]): String = name.toUpperCase match {
    case "EACH" =>
      val items = parseList(args.head); val (ps, body) = lambda(args(1))
      items.map(it => substitute(body, ps, Seq(it))).mkString(", ")
    case "IF" =>
      if (ConstEval.truthy(args.head)) args(1)
      else if (args.length > 2) args(2) else ""
    case "REDUCE" =>
      val items = parseList(args.head); val (ps, body) = lambda(args(1))
      items.reduceLeft((a, b) => ConstEval.tryEval(substitute(body, ps, Seq(a, b))))
    case "FILTER" =>
      val items = parseList(args.head); val (ps, body) = lambda(args(1))
      "[" + items.filter(it => ConstEval.truthy(substitute(body, ps, Seq(it)))).mkString(", ") + "]"
    case "EVAL" => ConstEval.tryEval(args.head)
    case "STAR" =>
      // @STAR(relation[, alias[, except_cols[, prefix[, suffix]]]])
      // (macros.py:853: typed expansion with casts, exclusions, affixes)
      val table = unquote(args.head)
      val alias = if (args.length > 1 && args(1).trim.nonEmpty) unquote(args(1))
        else table.split('.').last
      val except = if (args.length > 2) parseList(args(2)).map(unquote).map(_.toLowerCase).toSet
        else Set.empty[String]
      val prefix = if (args.length > 3) unquote(args(3)) else ""
      val suffix = if (args.length > 4) unquote(args(4)) else ""
      val cols = schemaOf(table)
      require(cols.nonEmpty, s"@STAR needs known schema for $table")
      cols.filterNot { case (c, _) => except(c.toLowerCase) }
        .map { case (c, tpe) => s"CAST(`$alias`.`$c` AS $tpe) AS `$prefix$c$suffix`" }
        .mkString(", ")
    case "GENERATE_SURROGATE_KEY" =>
      val fields = args.map(f => s"COALESCE(CAST($f AS STRING), $nullToken)")
      s"MD5(CONCAT(${fields.mkString(", '|', ")}))"
    case "SAFE_ADD" => safeArith(args, "+")
    case "SAFE_SUB" => safeArith(args, "-")
    case "SAFE_DIV" => s"(${args.head}) / NULLIF((${args(1)}), 0)"
    case "UNION" =>
      // @UNION('distinct'|'all', t1, t2, …) by-name with casts (macros.py:1028)
      val (kind, tables) =
        if (args.head.startsWith("'")) (unquote(args.head).toUpperCase, args.tail)
        else ("DISTINCT", args)
      val base = schemaOf(unquote(tables.head))
      val selects = tables.map { tbl =>
        val cols = schemaOf(unquote(tbl)).toMap
        val proj = base.map { case (c, tpe) => s"CAST(`$c` AS $tpe) AS `$c`" }.mkString(", ")
        require(base.forall { case (c, _) => cols.contains(c) }, s"@UNION: $tbl missing columns")
        s"SELECT $proj FROM ${unquote(tbl)}"
      }
      selects.mkString(if (kind == "ALL") " UNION ALL " else " UNION ")
    case "HAVERSINE_DISTANCE" =>
      // parenthesize: substituted args may be compound expressions and the
      // formula subtracts them (precedence hazard: a - b * c - d)
      val Seq(lat1, lon1, lat2, lon2) = args.take(4).map(a => s"($a)")
      val rate = if (args.length > 4 && unquote(args(4)) == "km") "1.60934" else "1.0"
      s"2 * 3961 * ASIN(SQRT(POWER(SIN(RADIANS(($lat2 - $lat1) / 2)), 2) + " +
        s"COS(RADIANS($lat1)) * COS(RADIANS($lat2)) * POWER(SIN(RADIANS(($lon2 - $lon1) / 2)), 2))) * $rate"
    case "PIVOT" =>
      val column = args.head
      val values = parseList(args(1))
      val kw = args.drop(2).flatMap { a =>
        val p = a.split(":=", 2); if (p.length == 2) Some(p(0).trim.toLowerCase -> p(1).trim) else None
      }.toMap
      val agg = unquote(kw.getOrElse("agg", "'SUM'"))
      val thenV = kw.getOrElse("then_value", "1"); val elseV = kw.getOrElse("else_value", "0")
      val prefix = unquote(kw.getOrElse("prefix", "''")); val suffix = unquote(kw.getOrElse("suffix", "''"))
      values.map { v =>
        s"$agg(CASE WHEN $column = $v THEN $thenV ELSE $elseV END) AS `$prefix${unquote(v)}$suffix`"
      }.mkString(", ")
    case "AND" =>
      val conds = args.filterNot(_.equalsIgnoreCase("NULL"))
      if (conds.isEmpty) "TRUE" else conds.map(c => s"($c)").mkString(" AND ")
    case "OR" =>
      val conds = args.filterNot(_.equalsIgnoreCase("NULL"))
      if (conds.isEmpty) "TRUE" else conds.map(c => s"($c)").mkString(" OR ")
    case "DEDUPLICATE" =>
      // @DEDUPLICATE(relation, [partition cols], [order exprs]) (macros.py:1240)
      val rel = args.head
      val partCols = parseList(args(1)).mkString(", ")
      val orderCols = if (args.length > 2) parseList(args(2)).mkString(", ") else "1"
      s"""(SELECT * EXCEPT (__graft_rn) FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY $partCols ORDER BY $orderCols) AS __graft_rn
         |  FROM $rel) WHERE __graft_rn = 1)""".stripMargin
    case "DATE_SPINE" =>
      // @DATE_SPINE(unit, start, end) inclusive both ends (macros.py:1297);
      // Spark: sequence+explode, DuckDB oracle analog: generate_series
      val unit = unquote(args.head)
      s"(SELECT explode(sequence(DATE ${args(1)}, DATE ${args(2)}, INTERVAL 1 $unit)) AS date_$unit)"
    case "VAR" | "BLUEPRINT_VAR" =>
      variables.get(unquote(args.head)).orElse(args.lift(1)).getOrElse("NULL")
    case "DEF" =>
      val (ps, body) = lambda(args(1)); defs(unquote(args.head).toUpperCase) = (ps, body); ""
    case "RESOLVE_TEMPLATE" =>
      substitute(unquote(args.head), Seq("this_model"), Seq(thisModel.getOrElse("@this_model")))
    case other if defs.contains(other) =>
      val (ps, body) = defs(other)
      substitute(body, ps, args)
    case other if registryUpper.contains(other) => registryUpper(other)(args)
    case other =>
      throw new IllegalArgumentException(s"unknown macro @$other")
  }

  private def safeArith(args: Seq[String], op: String): String = {
    val allNull = args.map(a => s"$a IS NULL").mkString(" AND ")
    val expr = args.map(a => s"COALESCE($a, 0)").mkString(s" $op ")
    s"CASE WHEN $allNull THEN NULL ELSE $expr END"
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.startsWith("'") && t.endsWith("'")) t.substring(1, t.length - 1) else t
  }
}

object MacroEvaluator {
  private[macros] val ident = "^[A-Za-z_][A-Za-z0-9_]*".r

  /** Every builtin @-macro name `applyMacro` dispatches on, plus the
    * predefined time variables — keep in lockstep with the match above (the
    * LSP's completion list reads THIS, so a macro added to the dispatch
    * without a name here is invisible to editors). */
  val builtinNames: Seq[String] = Seq(
    "EACH", "IF", "REDUCE", "FILTER", "EVAL", "STAR", "UNION", "AND", "OR",
    "VAR", "BLUEPRINT_VAR", "DEF", "DEDUPLICATE", "DATE_SPINE", "PIVOT",
    "GENERATE_SURROGATE_KEY", "HAVERSINE_DISTANCE",
    "SAFE_ADD", "SAFE_SUB", "SAFE_DIV", "RESOLVE_TEMPLATE") ++
    (for (base <- Seq("start", "end", "execution");
          suffix <- Seq("ds", "ts", "tstz", "date", "dt", "epoch", "millis", "hour"))
      yield s"${base}_$suffix")
}

/** Constant evaluator for macro-time arithmetic/conditions (reference @eval,
  * macros.py:838) and the jinja expression subset dbt packages lean on
  * (reference renders through real jinja2, utils/jinja.py — here the
  * python-ish value surface is re-implemented): numbers, strings, booleans,
  * `none`, LIST (`[...]`) and DICT (`{'k': v}`) literals, comparison /
  * arithmetic (incl. `//` floor-div) / logic operators, `~` string concat,
  * `in` / `not in` membership, indexing (`xs[0]`, negative ok), method calls
  * (`.items()/.keys()/.values()/.get()` on dicts; `.upper()/.split()/
  * .join()/...` on strings), and `range()`. Non-constant input is returned
  * verbatim by `tryEval` (it is SQL, not macro math). */
object ConstEval {
  sealed trait V
  final case class N(v: BigDecimal) extends V
  final case class S(v: String) extends V
  final case class B(v: Boolean) extends V
  final case class L(items: Vector[V]) extends V
  final case class D(entries: Vector[(V, V)]) extends V
  case object Null extends V

  def truthy(s: String): Boolean = eval(s) match {
    case Some(v) => truthy(v)
    case None    => false
  }

  def truthy(v: V): Boolean = v match {
    case B(b)  => b
    case N(n)  => n != 0
    case S(x)  => x.nonEmpty
    case L(xs) => xs.nonEmpty
    case D(es) => es.nonEmpty
    case Null  => false
  }

  def tryEval(s: String): String = eval(s) match {
    case Some(N(n)) => if (n.isWhole) n.toBigInt.toString else n.toString
    case Some(S(x)) => s"'$x'"
    case Some(B(b)) => b.toString.toUpperCase
    case Some(v)    => show(v)
    case None       => s
  }

  /** Round-trippable literal: `eval(show(v)) == Some(v)`. Containers render
    * in jinja's own output form (`['a', 'b']`), so a rendered list can be
    * re-bound and re-parsed (the string-typed binding environment's
    * container transport). */
  def show(v: V): String = v match {
    case N(n)  => if (n.isWhole) n.toBigInt.toString else n.toString
    case S(x)  => "'" + x.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case B(b)  => b.toString.toUpperCase
    case L(xs) => xs.map(show).mkString("[", ", ", "]")
    case D(es) => es.map { case (k, v2) => show(k) + ": " + show(v2) }.mkString("{", ", ", "}")
    case Null  => "NONE"
  }

  /** The RAW string a value renders as in template output (jinja semantics:
    * strings unquoted, containers as literals). A relation object (a dict
    * carrying the `__relation__` marker — see Jinja.relationArg) coerces to
    * its name, dbt BaseRelation `__str__` semantics: `'from ' ~ rel` must
    * emit SQL, not a dict literal. */
  def raw(v: V): String = v match {
    case S(x) => x
    case B(b) => b.toString.capitalize // jinja prints True/False
    case D(es) if es.exists(_._1 == S("__relation__")) =>
      es.collectFirst { case (S("name"), S(n)) => n }.getOrElse(show(v))
    case other => show(other)
  }

  def eval(input: String): Option[V] =
    try { val p = new P(input.trim); val v = p.orExpr(); if (p.done) Some(v) else None }
    catch { case _: Exception => None }

  private final class P(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def done: Boolean = { ws(); i >= s.length }
    private def peek(tok: String): Boolean = {
      ws()
      s.regionMatches(true, i, tok, 0, tok.length) &&
        (!tok.head.isLetter || i + tok.length >= s.length ||
          { val c = s.charAt(i + tok.length); !c.isLetterOrDigit && c != '_' })
    }
    private def eat(tok: String): Boolean = { if (peek(tok)) { i += tok.length; true } else false }

    /** Jinja/python AND/OR SHORT-CIRCUIT: once the result is decided, the
      * remaining operands still PARSE (the cursor must advance) but their
      * semantic errors are suppressed (`dead` mode) — `x is mapping and
      * x.get('metadata')` must not blow up on a string x, that is the whole
      * point of the dbt guard idiom. Structural errors (unclosed brackets)
      * always throw. */
    private var dead = 0
    def orExpr(): V = {
      var l = andExpr()
      while (eat("OR")) {
        val skip = asB(l)
        if (skip) dead += 1
        val r = andExpr()
        if (skip) dead -= 1
        l = B(asB(l) || (!skip && asB(r)))
      }
      l
    }
    private def andExpr(): V = {
      var l = cmpExpr()
      while (eat("AND")) {
        val skip = !asB(l)
        if (skip) dead += 1
        val r = cmpExpr()
        if (skip) dead -= 1
        l = B(asB(l) && !skip && asB(r))
      }
      l
    }
    private def cmpExpr(): V = {
      val l = addExpr()
      val ops = Seq("==", ">=", "<=", "!=", "<>", "=", ">", "<")
      ops.find(peek) match {
        case Some(op) =>
          eat(op); val r = addExpr()
          val res = (l, r) match {
            case (N(a), N(b)) => cmp(a.compare(b), op)
            case (S(a), S(b)) => cmp(a.compare(b), op)
            case (B(a), B(b)) => cmp(a.compareTo(b), op)
            case (Null, Null) => cmp(0, op)
            case (Null, _) | (_, Null) => cmp(1, op) // none == x is false, != true
            case (a, b) if op == "==" || op == "=" => cmp(if (a == b) 0 else 1, op)
            case (a, b) if op == "!=" || op == "<>" => cmp(if (a == b) 0 else 1, op)
            case _ if dead > 0 => false
            case _            => throw new IllegalArgumentException("type mismatch")
          }
          B(res)
        case None =>
          // membership: `x in xs` / `x not in xs` (list items, dict keys,
          // substring) — python/jinja's operator, absent from SQL ConstEval
          if (peek("NOT")) {
            val save = i
            eat("NOT")
            if (eat("IN")) B(!isIn(l, addExpr())) else { i = save; l }
          }
          else if (eat("IN")) B(isIn(l, addExpr()))
          else l
      }
    }
    private def isIn(x: V, coll: V): Boolean = coll match {
      case L(xs) => xs.contains(x)
      case D(es) => es.exists(_._1 == x)
      case S(str) => x match {
        case S(sub) => str.contains(sub)
        case _ if dead > 0 => false
        case _ => throw new IllegalArgumentException("`in <string>` needs a string")
      }
      case _ if dead > 0 => false
      case _ => throw new IllegalArgumentException("`in` needs a collection")
    }
    private def cmp(c: Int, op: String): Boolean = op match {
      case "=" | "==" => c == 0; case "!=" | "<>" => c != 0
      case ">"  => c > 0;  case "<"  => c < 0
      case ">=" => c >= 0; case "<=" => c <= 0
    }
    private def addExpr(): V = {
      var l = mulExpr()
      var go = true
      while (go) {
        if (eat("~")) l = S(asS(l) + asS(mulExpr())) // jinja string concat
        else if (peek("+")) { eat("+"); (l, mulExpr()) match {
          case (L(a), L(b)) => l = L(a ++ b) // python list concat
          case (S(a), S(b)) => l = S(a + b)  // python string concat
          case (a, b)       => l = N(asN(a) + asN(b))
        }}
        else if (peek("-") && { ws(); true } && s.charAt(i) == '-') { i += 1; l = N(asN(l) - asN(mulExpr())) }
        else go = false
      }
      l
    }
    private def mulExpr(): V = {
      var l = unary()
      var go = true
      while (go) {
        if (eat("*")) l = N(asN(l) * asN(unary()))
        else if (eat("//")) l = N((asN(l) / asN(unary())).setScale(0, BigDecimal.RoundingMode.FLOOR))
        else if (eat("/")) l = N(asN(l) / asN(unary()))
        else if (eat("%")) l = N(asN(l) % asN(unary()))
        else go = false
      }
      l
    }
    private def unary(): V = {
      ws()
      if (eat("NOT")) return B(!asB(unary()))
      if (eat("-")) return N(-asN(unary()))
      postfix(primary())
    }
    private def primary(): V = {
      ws()
      if (eat("(")) {
        val v = orExpr(); ws()
        if (eat(")")) return v
        // `(a, b, ...)` — python tuple, modeled as a list
        val items = Vector.newBuilder[V]; items += v
        while (eat(",")) { ws(); if (peek(")")) () else items += orExpr() }
        require(eat(")"), "unclosed tuple")
        return L(items.result())
      }
      if (i < s.length && s.charAt(i) == '[') { // list literal
        i += 1; ws()
        val items = Vector.newBuilder[V]
        if (!eat("]")) {
          items += orExpr()
          while (eat(",")) { ws(); if (peek("]")) () else items += orExpr() }
          require(eat("]"), "unclosed list")
        }
        return L(items.result())
      }
      if (i < s.length && s.charAt(i) == '{') { // dict literal
        i += 1; ws()
        val entries = Vector.newBuilder[(V, V)]
        if (!eat("}")) {
          def entry(): Unit = { val k = orExpr(); ws(); require(eat(":")); entries += (k -> orExpr()) }
          entry()
          while (eat(",")) { ws(); if (peek("}")) () else entry() }
          require(eat("}"), "unclosed dict")
        }
        return D(entries.result())
      }
      if (eat("TRUE")) return B(true)
      if (eat("FALSE")) return B(false)
      if (eat("NONE") || eat("NULL")) return Null
      if (peek("RANGE")) { // python range(stop) / range(start, stop[, step])
        eat("RANGE"); ws(); require(eat("("), "range needs (")
        val args = Vector.newBuilder[BigDecimal]
        args += asN(orExpr())
        while (eat(",")) args += asN(orExpr())
        require(eat(")"), "unclosed range")
        val a = args.result()
        val (st, en, step) = a.length match {
          case 1 => (BigDecimal(0), a(0), BigDecimal(1))
          case 2 => (a(0), a(1), BigDecimal(1))
          case _ => (a(0), a(1), a(2))
        }
        require(step != 0, "range step 0")
        val items = Vector.newBuilder[V]
        var x = st
        while (if (step > 0) x < en else x > en) { items += N(x); x += step }
        return L(items.result())
      }
      ws()
      if (i < s.length && (s.charAt(i) == '\'' || s.charAt(i) == '"')) {
        val q = s.charAt(i)
        val sb = new StringBuilder; i += 1
        while (i < s.length && s.charAt(i) != q) {
          if (s.charAt(i) == '\\' && i + 1 < s.length) { // \' \\ \n \t escapes
            s.charAt(i + 1) match {
              case 'n' => sb.append('\n'); case 't' => sb.append('\t')
              case c   => sb.append(c)
            }
            i += 2
          } else { sb.append(s.charAt(i)); i += 1 }
        }
        require(i < s.length, "unclosed string"); i += 1
        return S(sb.toString)
      }
      val start = i
      while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
      require(i > start, s"cannot const-eval at '$s'")
      N(BigDecimal(s.substring(start, i)))
    }
    /** Postfix chain: indexing and method/attribute access. */
    @annotation.tailrec
    private def postfix(v: V): V = {
      ws()
      if (i < s.length && s.charAt(i) == '[') {
        i += 1; val idx = orExpr(); ws(); require(eat("]"), "unclosed index")
        postfix(index(v, idx))
      } else if (i < s.length && s.charAt(i) == '.' && i + 1 < s.length &&
                 (s.charAt(i + 1).isLetter || s.charAt(i + 1) == '_')) {
        i += 1
        val start = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        val name = s.substring(start, i)
        ws()
        if (i < s.length && s.charAt(i) == '(') {
          i += 1; ws()
          val args = Vector.newBuilder[V]
          if (!eat(")")) {
            args += orExpr()
            while (eat(",")) args += orExpr()
            require(eat(")"), "unclosed call")
          }
          postfix(method(v, name, args.result()))
        } else postfix(attr(v, name))
      } else v
    }
    private def index(v: V, idx: V): V = (v, idx) match {
      case (L(xs), N(n)) =>
        val j = n.toInt; xs(if (j < 0) xs.length + j else j)
      case (S(x), N(n)) =>
        val j = n.toInt; S(x((if (j < 0) x.length + j else j)).toString)
      case (D(es), k) =>
        es.find(_._1 == k).map(_._2).getOrElse(throw new IllegalArgumentException(s"missing key ${show(k)}"))
      case _ if dead > 0 => Null
      case _ => throw new IllegalArgumentException("bad index")
    }
    private def attr(v: V, name: String): V = v match {
      case D(es) => es.find(_._1 == S(name)).map(_._2)
        .getOrElse(throw new IllegalArgumentException(s"missing attr $name"))
      case _ if dead > 0 => Null
      case _ => throw new IllegalArgumentException(s"no attr $name")
    }
    private def method(v: V, name: String, args: Vector[V]): V = (v, name) match {
      case (D(es), "items")  => L(es.map { case (k, x) => L(Vector(k, x)) })
      case (D(es), "keys")   => L(es.map(_._1))
      // agate shim: a dict carrying a literal 'values' entry is a column
      // object from run_query/get_columns_in_relation — `.values()` reads
      // that entry (how packages consume agate Columns). Plain dicts keep
      // python semantics (all values).
      case (D(es), "values") =>
        es.collectFirst { case (S("values"), x) => x }.getOrElse(L(es.map(_._2)))
      case (D(es), "get")    =>
        es.find(_._1 == args(0)).map(_._2).getOrElse(if (args.length > 1) args(1) else Null)
      case (S(x), "upper")      => S(x.toUpperCase)
      case (S(x), "lower")      => S(x.toLowerCase)
      case (S(x), "strip")      => S(x.trim)
      case (S(x), "title")      => S(x.split(" ").map(w =>
        if (w.isEmpty) w else w.head.toUpper + w.tail.toLowerCase).mkString(" "))
      case (S(x), "replace")    => S(x.replace(asS(args(0)), asS(args(1))))
      case (S(x), "startswith") => B(x.startsWith(asS(args(0))))
      case (S(x), "endswith")   => B(x.endsWith(asS(args(0))))
      case (S(x), "split")      =>
        val sep = if (args.nonEmpty) java.util.regex.Pattern.quote(asS(args(0))) else "\\s+"
        L(x.split(sep, -1).toVector.map(S(_)))
      case (S(sep), "join")     => args(0) match {
        case L(xs) => S(xs.map(raw).mkString(sep))
        case other => throw new IllegalArgumentException(s"join needs a list, got ${show(other)}")
      }
      case (L(xs), "count") => N(BigDecimal(xs.count(_ == args(0))))
      case (L(xs), "index") => N(BigDecimal(xs.indexOf(args(0))))
      case _ if dead > 0 => Null
      case _ => throw new IllegalArgumentException(s"unsupported method .$name on ${show(v)}")
    }
    private def asN(v: V): BigDecimal = v match {
      case N(n) => n
      case _ if dead > 0 => BigDecimal(0)
      case _ => throw new IllegalArgumentException("expected number")
    }
    private def asS(v: V): String = raw(v)
    private def asB(v: V): Boolean = v match {
      case B(b) => b; case N(n) => n != 0; case S(x) => x.nonEmpty
      case L(xs) => xs.nonEmpty; case D(es) => es.nonEmpty; case Null => false
    }
  }
}
