package graft.core

/** Line-level unified diff (the reference renders model text diffs with
  * Python's difflib.unified_diff — `ContextDiff.text_diff`,
  * core/context_diff.py — shown by `sqlmesh diff` / plan previews). LCS
  * alignment; unchanged runs beyond `context` lines collapse to `…`. */
object TextDiff {

  def unified(a: String, b: String, context: Int = 2): String = {
    val la = a.split("\n", -1).toIndexedSeq
    val lb = b.split("\n", -1).toIndexedSeq
    val n = la.length; val m = lb.length
    val dp = Array.ofDim[Int](n + 1, m + 1)
    for (i <- n - 1 to 0 by -1; j <- m - 1 to 0 by -1)
      dp(i)(j) =
        if (la(i) == lb(j)) dp(i + 1)(j + 1) + 1
        else math.max(dp(i + 1)(j), dp(i)(j + 1))
    val ops = Vector.newBuilder[(Char, String)]
    var i = 0; var j = 0
    while (i < n && j < m) {
      if (la(i) == lb(j)) { ops += ((' ', la(i))); i += 1; j += 1 }
      else if (dp(i + 1)(j) >= dp(i)(j + 1)) { ops += (('-', la(i))); i += 1 }
      else { ops += (('+', lb(j))); j += 1 }
    }
    while (i < n) { ops += (('-', la(i))); i += 1 }
    while (j < m) { ops += (('+', lb(j))); j += 1 }
    val all = ops.result()
    val keep = all.indices.filter { k =>
      all(k)._1 != ' ' ||
        (math.max(0, k - context) to math.min(all.size - 1, k + context))
          .exists(x => all(x)._1 != ' ')
    }.toSet
    val out = Seq.newBuilder[String]
    var skipping = false
    all.indices.foreach { k =>
      if (keep(k)) {
        skipping = false
        out += s"${all(k)._1} ${all(k)._2}"
      } else if (!skipping) { skipping = true; out += "  …" }
    }
    out.result().mkString("\n")
  }
}
