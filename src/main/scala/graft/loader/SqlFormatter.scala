package graft.loader

/** Canonical SQL formatter — the `graft format` verb (reference `sqlmesh
  * format`, cli/main.py:343 + core/config/format.py): deterministic
  * pretty-printing of model files. Output is a pure function of the token
  * stream, so `format(format(x)) == format(x)` by construction.
  *
  * Layout rules: MODEL/AUDIT/METRIC headers get one property per line;
  * query text breaks before major clause keywords (SELECT / FROM / WHERE /
  * GROUP BY / HAVING / ORDER BY / set ops / JOINs / LIMIT), indents by
  * subquery depth, uppercases keywords, and normalizes token spacing. */
object SqlFormatter {

  // ------------------------------------------------------------ tokens ----

  /** Atomic lexemes: words, numbers, strings (with '' escapes), quoted
    * identifiers, comments, multi-char operators, punctuation. */
  private[loader] def tokens(sql: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val n = sql.length
    var i = 0
    while (i < n) {
      val c = sql(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && sql(i + 1) == '-') {
        val j = sql.indexOf('\n', i); val end = if (j < 0) n else j
        out += sql.substring(i, end).trim; i = end
      } else if (c == '/' && i + 1 < n && sql(i + 1) == '*') {
        val j = sql.indexOf("*/", i); val end = if (j < 0) n else j + 2
        out += sql.substring(i, end); i = end
      } else if (c == '\'') {
        var j = i + 1; var open = true
        while (j < n && open) {
          if (sql(j) == '\'') {
            if (j + 1 < n && sql(j + 1) == '\'') j += 2 else { open = false; j += 1 }
          } else j += 1
        }
        out += sql.substring(i, j); i = j
      } else if (c == '"' || c == '`') {
        val j = sql.indexOf(c, i + 1); val end = if (j < 0) n else j + 1
        out += sql.substring(i, end); i = end
      } else if (c.isLetter || c == '_' || c == '@') {
        var j = i
        while (j < n && (sql(j).isLetterOrDigit || "_@{}$".contains(sql(j)))) j += 1
        out += sql.substring(i, j); i = j
      } else if (c.isDigit) {
        var j = i
        while (j < n && (sql(j).isLetterOrDigit || sql(j) == '.')) j += 1
        out += sql.substring(i, j); i = j
      } else {
        val two = if (i + 1 < n) sql.substring(i, i + 2) else ""
        if (Set("<=", ">=", "<>", "!=", "||", "->", "=>", "::", "<=>").exists(_ == two)) {
          out += two; i += 2
        } else { out += c.toString; i += 1 }
      }
    }
    out.result()
  }

  private val keywords: Set[String] = Set(
    "SELECT", "FROM", "WHERE", "GROUP", "BY", "HAVING", "ORDER", "LIMIT",
    "OFFSET", "UNION", "EXCEPT", "INTERSECT", "ALL", "DISTINCT", "AS", "ON",
    "JOIN", "LEFT", "RIGHT", "FULL", "INNER", "OUTER", "CROSS", "NATURAL",
    "SEMI", "ANTI", "LATERAL", "WITH", "RECURSIVE", "AND", "OR", "NOT", "IN",
    "EXISTS", "BETWEEN", "LIKE", "RLIKE", "ILIKE", "IS", "NULL", "TRUE",
    "FALSE", "CASE", "WHEN", "THEN", "ELSE", "END", "CAST", "TRY_CAST",
    "INTERVAL", "VALUES", "INSERT", "INTO", "OVERWRITE", "UPDATE", "SET",
    "DELETE", "MERGE", "USING", "MATCHED", "CREATE", "TABLE", "VIEW", "DROP",
    "ALTER", "PARTITION", "OVER", "ROWS", "RANGE", "UNBOUNDED", "PRECEDING",
    "FOLLOWING", "CURRENT", "ROW", "WINDOW", "QUALIFY", "PIVOT", "UNPIVOT",
    "FOR", "TABLESAMPLE", "TIMESTAMP", "DATE", "ASC", "DESC", "NULLS",
    "FIRST", "LAST", "GROUPING", "SETS", "ROLLUP", "CUBE", "ANY", "SOME",
    "ESCAPE", "DIV", "LIMIT", "SORT", "CLUSTER", "DISTRIBUTE")

  /** Tokens that start a new line at clause level. */
  private val lineStarters: Set[String] = Set(
    "SELECT", "FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET",
    "UNION", "EXCEPT", "INTERSECT", "JOIN", "LEFT", "RIGHT", "FULL", "INNER",
    "CROSS", "NATURAL", "WINDOW", "QUALIFY")
  /** JOIN modifiers — no break between e.g. LEFT and JOIN. */
  private val joinWords: Set[String] = Set(
    "LEFT", "RIGHT", "FULL", "INNER", "OUTER", "CROSS", "NATURAL", "SEMI",
    "ANTI", "JOIN", "LATERAL")

  // ------------------------------------------------------------ render ----

  /** Format one SQL statement (no trailing semicolon). */
  def format(sql: String): String = formatTokens(tokens(sql))

  private def formatTokens(ts: Vector[String]): String = {
    val sb = new StringBuilder
    // paren stack: true = subquery paren (newline-indented contents)
    var stack = List.empty[Boolean]
    var atLineStart = true
    def depth = stack.count(identity)
    def indent(): Unit = { sb.append("  " * depth); atLineStart = false }
    def newline(): Unit = if (!atLineStart) { sb.append('\n'); atLineStart = true }

    var prev = ""
    var i = 0
    while (i < ts.length) {
      val raw = ts(i)
      val up = raw.toUpperCase
      val word = keywords.contains(up)
      val tok = if (word) up else raw
      val next = if (i + 1 < ts.length) ts(i + 1).toUpperCase else ""
      // clause breaks only at query level — never inside function args or
      // window specs (any enclosing non-subquery paren suppresses them)
      val inPlainParen = stack.contains(false)

      if (raw.startsWith("--")) {
        if (!atLineStart) sb.append(' ')
        sb.append(raw); newline()
      } else if (tok == "(") {
        val sub = next == "SELECT" || next == "WITH"
        if (atLineStart) indent()
        else if (needSpace(prev, tok)) sb.append(' ')
        sb.append('(')
        stack ::= sub
        if (sub) newline()
      } else if (tok == ")") {
        val sub = stack.headOption.getOrElse(false)
        stack = stack.drop(1)
        if (sub) { newline(); indent() }
        else if (atLineStart) indent()
        sb.append(')')
      } else if (word && !inPlainParen && lineStarters.contains(up) &&
                 !(joinWords.contains(up) && joinWords.contains(prev))) {
        newline(); indent()
        sb.append(tok)
      } else {
        if (atLineStart) indent()
        else if (needSpace(prev, tok)) sb.append(' ')
        sb.append(tok)
      }
      if (!raw.startsWith("--")) prev = tok
      i += 1
    }
    sb.toString.replaceAll("\\s+$", "")
  }

  /** Token-pair spacing: no space before , ) . ;, none after ( . and none
    * between a function name and its '('. */
  private def needSpace(prev: String, tok: String): Boolean = {
    if (prev.isEmpty) false
    else if (tok == "," || tok == ";" || tok == "." || tok == ")") false
    else if (prev == "(" || prev == ".") false
    else if (tok == "(") {
      // identifier( → attach; keyword ( → space (IN (...), VALUES (...))
      val w = prev.nonEmpty && (prev.head.isLetter || prev.head == '_' || prev.head == '@')
      !(w && !keywords.contains(prev)) // attach only to non-keyword words
    } else if (prev == "::" || tok == "::") false
    else true
  }

  // ------------------------------------------------------- model files ----

  /** Format a whole model/audit/metric file: the header block gets one
    * property per line; every other statement goes through [[format]].
    * Statements stay `;`-terminated; the file ends with a newline. */
  def formatFile(text: String): String = {
    val ts = tokens(text)
    if (ts.isEmpty) return ""
    val headerIdx = ts.indexWhere(t =>
      Seq("MODEL", "AUDIT", "METRIC").contains(t.toUpperCase))
    val sb = new StringBuilder

    // leading comments before the header survive verbatim, one per line
    var i = 0
    while (i < ts.length && ts(i).startsWith("--")) { sb.append(ts(i)).append('\n'); i += 1 }

    if (headerIdx >= i && headerIdx < ts.length &&
        headerIdx + 1 < ts.length && ts(headerIdx + 1) == "(") {
      // re-find the matching close paren in TOKEN space
      var j = headerIdx + 2; var d = 1
      while (j < ts.length && d > 0) {
        if (ts(j) == "(") d += 1 else if (ts(j) == ")") d -= 1
        j += 1
      }
      // comments inside the header block are dropped: they can't round-trip
      // through one-prop-per-line layout without breaking idempotency
      val inner = ts.slice(headerIdx + 2, j - 1).filterNot(_.startsWith("--"))
      sb.append(ts(headerIdx).toUpperCase).append(" (\n")
      // split properties on top-level commas
      val props = Vector.newBuilder[Vector[String]]
      var cur = Vector.newBuilder[String]; var pd = 0
      inner.foreach { t =>
        if (t == "(") pd += 1 else if (t == ")") pd -= 1
        if (t == "," && pd == 0) { props += cur.result(); cur = Vector.newBuilder }
        else cur += t
      }
      val last = cur.result(); if (last.nonEmpty) props += last
      // a header prop is `name value...` — the space after the prop NAME is
      // load-bearing (the prop parser splits on it), so emit it explicitly
      // even when the value starts with '('
      val rendered = props.result().map {
        case p if p.length >= 2 => "  " + p.head + " " + renderInline(p.tail)
        case p                  => "  " + renderInline(p)
      }
      sb.append(rendered.mkString(",\n")).append("\n);\n")
      // statements after the header: skip the token right after ')' if ';'
      var k = j
      if (k < ts.length && ts(k) == ";") k += 1
      val restStatements = splitStatements(ts.drop(k))
      restStatements.filter(_.nonEmpty).foreach { st =>
        sb.append('\n').append(formatTokens(st)).append(";\n")
      }
      sb.toString
    } else {
      // no header: format each statement
      val sts = splitStatements(ts.drop(i))
      sts.filter(_.nonEmpty).map(st => formatTokens(st) + ";\n")
        .mkString("\n") match {
        case "" => sb.toString
        case s  => sb.toString + s
      }
    }
  }

  private def splitStatements(ts: Vector[String]): Vector[Vector[String]] = {
    val out = Vector.newBuilder[Vector[String]]
    var cur = Vector.newBuilder[String]
    ts.foreach { t =>
      if (t == ";") { out += cur.result(); cur = Vector.newBuilder }
      else cur += t
    }
    val last = cur.result(); if (last.nonEmpty) out += last
    out.result()
  }

  /** Single-line rendering with normal spacing (header property values). */
  private def renderInline(ts: Vector[String]): String = {
    val sb = new StringBuilder
    var prev = ""
    ts.foreach { t =>
      if (sb.nonEmpty && needSpace(prev, t)) sb.append(' ')
      sb.append(t); prev = t
    }
    sb.toString
  }
}
