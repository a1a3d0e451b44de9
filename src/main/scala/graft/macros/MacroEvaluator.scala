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
    val columnValues: Option[(String, String, Int) => Seq[String]] = None) {

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
          refResolver, columnValues = columnValues)
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

/** Tiny constant evaluator for macro-time arithmetic/conditions
  * (reference @eval, macros.py:838). Handles numbers, strings, booleans,
  * comparison/arith/logic operators. Non-constant input is returned verbatim
  * by `tryEval` (it is SQL, not macro math). */
object ConstEval {
  sealed trait V
  final case class N(v: BigDecimal) extends V
  final case class S(v: String) extends V
  final case class B(v: Boolean) extends V

  def truthy(s: String): Boolean = eval(s) match {
    case Some(B(b)) => b
    case Some(N(n)) => n != 0
    case Some(S(x)) => x.nonEmpty
    case None       => false
  }

  def tryEval(s: String): String = eval(s) match {
    case Some(N(n)) => if (n.isWhole) n.toBigInt.toString else n.toString
    case Some(S(x)) => s"'$x'"
    case Some(B(b)) => b.toString.toUpperCase
    case None       => s
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
        (!tok.head.isLetter || i + tok.length >= s.length || !s.charAt(i + tok.length).isLetterOrDigit)
    }
    private def eat(tok: String): Boolean = { if (peek(tok)) { i += tok.length; true } else false }

    def orExpr(): V = {
      var l = andExpr()
      while (eat("OR")) { val r = andExpr(); l = B(asB(l) || asB(r)) }
      l
    }
    private def andExpr(): V = {
      var l = cmpExpr()
      while (eat("AND")) { val r = cmpExpr(); l = B(asB(l) && asB(r)) }
      l
    }
    private def cmpExpr(): V = {
      val l = addExpr()
      val ops = Seq(">=", "<=", "!=", "<>", "=", ">", "<")
      ops.find(peek) match {
        case Some(op) =>
          eat(op); val r = addExpr()
          val res = (l, r) match {
            case (N(a), N(b)) => cmp(a.compare(b), op)
            case (S(a), S(b)) => cmp(a.compare(b), op)
            case (B(a), B(b)) => cmp(a.compareTo(b), op)
            case _            => throw new IllegalArgumentException("type mismatch")
          }
          B(res)
        case None => l
      }
    }
    private def cmp(c: Int, op: String): Boolean = op match {
      case "="  => c == 0; case "!=" | "<>" => c != 0
      case ">"  => c > 0;  case "<"  => c < 0
      case ">=" => c >= 0; case "<=" => c <= 0
    }
    private def addExpr(): V = {
      var l = mulExpr()
      var go = true
      while (go) {
        if (eat("+")) l = N(asN(l) + asN(mulExpr()))
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
      if (eat("(")) { val v = orExpr(); ws(); require(eat(")")); return v }
      if (eat("TRUE")) return B(true)
      if (eat("FALSE")) return B(false)
      ws()
      if (i < s.length && s.charAt(i) == '\'') {
        val close = s.indexOf('\'', i + 1); require(close > 0)
        val v = S(s.substring(i + 1, close)); i = close + 1; return v
      }
      val start = i
      while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
      require(i > start, s"cannot const-eval at '$s'")
      N(BigDecimal(s.substring(start, i)))
    }
    private def asN(v: V): BigDecimal = v match {
      case N(n) => n; case _ => throw new IllegalArgumentException("expected number")
    }
    private def asB(v: V): Boolean = v match {
      case B(b) => b; case N(n) => n != 0; case S(x) => x.nonEmpty
    }
  }
}
