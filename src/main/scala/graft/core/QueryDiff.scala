package graft.core

/** Change-category detection between two model query texts (reference:
  * sqlmesh/core/model/definition.py:1536-1584 — auto-categorization diffs
  * rendered query ASTs; an edit that ONLY adds projections to the outer
  * SELECT is NON_BREAKING: downstream models keep their tables because
  * existing columns are untouched).
  *
  * Ours operates on [[Fingerprint.canonicalSql]] text: locate the outer
  * SELECT list (skipping a WITH prefix, which must be identical), split it on
  * top-level commas, and require old-items ⊆ new-items with an identical
  * FROM-onward tail. Conservative by construction — anything unparseable is
  * "not additive" and therefore BREAKING, matching the reference's
  * subquery/UDTF guard (:1571).
  */
object QueryDiff {

  /** (with-prefix, outer select items, from-onward tail) or None. */
  def outerProjection(sql: String): Option[(String, Seq[String], String)] = {
    val s = Fingerprint.canonicalSql(sql)
    // find the outer SELECT: at depth 0, skipping a WITH clause
    var i = 0; var depth = 0; var inStr = false
    var selStart = -1
    while (i < s.length && selStart < 0) {
      val c = s.charAt(i)
      if (c == '\'') { inStr = !inStr; i += 1 }
      else if (inStr) i += 1
      else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (depth == 0 && s.regionMatches(i, "select ", 0, 7) &&
        (i == 0 || !s.charAt(i - 1).isLetterOrDigit)) selStart = i
      else i += 1
    }
    if (selStart < 0) return None
    val prefix = s.substring(0, selStart)
    // scan the select list for the matching top-level FROM
    var j = selStart + 7; depth = 0; inStr = false
    var fromAt = -1
    while (j < s.length && fromAt < 0) {
      val c = s.charAt(j)
      if (c == '\'') { inStr = !inStr; j += 1 }
      else if (inStr) j += 1
      else if (c == '(') { depth += 1; j += 1 }
      else if (c == ')') { depth -= 1; j += 1 }
      else if (depth == 0 && s.regionMatches(j, "from ", 0, 5) &&
        !s.charAt(j - 1).isLetterOrDigit) fromAt = j
      else j += 1
    }
    if (fromAt < 0) return None
    val list = s.substring(selStart + 7, fromAt)
    // split on top-level commas
    val items = Seq.newBuilder[String]
    val cur = new StringBuilder; depth = 0; inStr = false
    list.foreach {
      case '\'' => inStr = !inStr; cur.append('\'')
      case c if inStr => cur.append(c)
      case c @ '(' => depth += 1; cur.append(c)
      case c @ ')' => depth -= 1; cur.append(c)
      case ',' if depth == 0 => items += cur.toString.trim; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) items += cur.toString.trim
    Some((prefix, items.result(), s.substring(fromAt)))
  }

  /** True when `newSql` differs from `oldSql` only by ADDED outer-SELECT
    * projections (same WITH prefix, same FROM-onward tail, all old items
    * kept). Star projections disqualify: `*` already absorbs additions. */
  def isAdditiveProjection(oldSql: String, newSql: String): Boolean =
    (outerProjection(oldSql), outerProjection(newSql)) match {
      case (Some((op, oi, ot)), Some((np, ni, nt))) =>
        op == np && ot == nt && ni.size > oi.size &&
          !oi.contains("*") && !ni.contains("*") &&
          oi.diff(ni).isEmpty
      case _ => false
    }
}
