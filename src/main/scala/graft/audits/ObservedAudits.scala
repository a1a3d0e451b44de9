package graft.audits

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** One-pass write+audit: audits whose verdict reduces to plain aggregates
  * ride the WRITE action as `Dataset.observe` metrics — when they pass (the
  * overwhelmingly common case) the audited batch costs ZERO extra table
  * scans; only a detected violation re-runs the classic audit query once,
  * to fetch the sample row for the failure message. At 100 TB an audited
  * incremental batch drops from write-scan + N audit-scans to write-scan.
  *
  * Audits with exact aggregate forms participate fully: the
  * [[Audits.rowPredicates]] family (violations = rows matching a
  * predicate → `sum(case when pred then 1 end)`), plus `at_least_one`,
  * `number_of_rows`, and `not_null_proportion` (count algebra). The
  * DISTINCT families can't ride exactly (`count_distinct` is disallowed in
  * observed metrics), and a skip must be PROVABLY sound — the audit verdict
  * the user declared is exact, so a screen may only skip the exact query
  * when no duplicate could possibly exist:
  *
  *  - `not_constant` rides a sound HLL screen: one distinct value occupies
  *    one register whose estimate is deterministically 1, so estimate ≥ 2
  *    PROVES ≥ 2 distinct values (pass); estimate ≤ 1 falls back.
  *  - `unique_values` / `unique_combination_of_columns` ride EXACT counts
  *    only: the skip fires just for the degenerate scopes where uniqueness
  *    is implied by cardinality (≤ 1 in-scope row per group domain);
  *    anything larger runs the classic exact query. An earlier design
  *    gated the skip on two `approx_count_distinct` estimates at different
  *    precisions both equaling the exact count, arguing their errors were
  *    independent — they are NOT (both sketches hash the same fixed-seed
  *    XxHash64, and the low-precision register index is a bit-prefix of
  *    the high-precision one), so a real duplicate could silently pass at
  *    a non-vanishing rate on small batches. Removed; uniqueness verdicts
  *    are now always exact, matching the reference.
  *
  * Audits whose args embed subqueries (`relationships` etc.) keep their
  * own query.
  */
object ObservedAudits {

  /** Aggregates to attach to the written frame + the verdict over the
    * observed metric values (by metric name). */
  final case class Planned(metrics: Seq[Column],
                           failed: Map[String, Any] => Boolean)

  /** `extraCond` is the interval predicate an incremental kind injects —
    * folded into every aggregate so observed counts cover exactly the
    * audit's scope even if the rendered query emits out-of-bounds rows
    * (the materializer filters them away before writing). */
  def plan(idx: Int, name: String, args: Audits.Args,
           extraCond: Option[String]): Option[Planned] = {
    // observed metrics can't evaluate subqueries
    val texts = args.values.toSeq ++ extraCond
    if (texts.exists(t => "(?i)\\(\\s*select\\b".r.findFirstIn(t).nonEmpty))
      return None
    val conds = args.get("condition").toSeq ++ extraCond
    def condExpr: Column =
      conds.map(expr).reduceOption(_ && _).getOrElse(lit(true))
    def counted(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    def metricLong(mm: Map[String, Any], k: String): Long = mm.get(k) match {
      case None | Some(null) => 0L
      case Some(l: java.lang.Long) => l
      case Some(i: java.lang.Integer) => i.toLong
      case Some(other) => other.toString.toLong
    }

    Audits.rowPredicates.get(name).map { predOf =>
      val m = s"__audit_v$idx"
      Planned(Seq(counted(expr(s"(${predOf(args)})") && condExpr).as(m)),
        mm => metricLong(mm, m) > 0)
    }.orElse(name match {
      case "at_least_one" =>
        val m = s"__audit_c$idx"
        Some(Planned(
          Seq(counted(condExpr && expr(args("column")).isNotNull).as(m)),
          mm => metricLong(mm, m) == 0))
      case "number_of_rows" =>
        val m = s"__audit_n$idx"
        val thr = args("threshold").toLong
        Some(Planned(Seq(counted(condExpr).as(m)),
          mm => metricLong(mm, m) <= thr))
      case "not_null_proportion" =>
        val mN = s"__audit_n$idx"; val mNN = s"__audit_nn$idx"
        val thr = args("threshold").toDouble
        Some(Planned(
          Seq(counted(condExpr).as(mN),
            counted(condExpr && expr(args("column")).isNotNull).as(mNN)),
          mm => {
            val n = metricLong(mm, mN)
            // 0-row scope: the query form yields 0/0 = null → no violation
            n > 0 && metricLong(mm, mNN).toDouble / n < thr
          }))
      case "mean_in_range" | "stddev_in_range" =>
        val m = s"__audit_s$idx"
        val c = when(condExpr, expr(args("column")))
        val agg = if (name == "mean_in_range") avg(c) else stddev(c)
        val inclusive = args.getOrElse("inclusive", "true").toBoolean
        val lo = args.get("min_v").map(_.toDouble)
        val hi = args.get("max_v").map(_.toDouble)
        Some(Planned(Seq(agg.as(m)), mm => mm.get(m) match {
          case None | Some(null) => false // empty scope: stat undefined → pass
          case Some(v) =>
            val d = v.toString.toDouble
            lo.exists(x => if (inclusive) d < x else d <= x) ||
              hi.exists(x => if (inclusive) d > x else d >= x)
        }))
      // DISTINCT uniqueness families: the skip must be PROVABLE from exact
      // observed aggregates (HLL equality-gating was unsound — correlated
      // errors, see the object doc). Uniqueness is implied by cardinality
      // alone only in the degenerate scopes below; everything else keeps
      // the classic exact query (failed = true → fall through).
      case "unique_values" =>
        // per column: ≤ 1 non-null in-scope row AND ≤ 1 null row ⇒ no value
        // (the classic query groups NULLs together) can repeat — sound pass
        val cols = Audits.list(args("columns"))
        val ms = cols.zipWithIndex.flatMap { case (c, j) =>
          val v = when(condExpr, expr(c))
          Seq(count(v).as(s"__audit_cn${idx}_$j"),
            counted(condExpr && expr(c).isNull).as(s"__audit_nl${idx}_$j"))
        }
        Some(Planned(ms, mm => cols.indices.exists { j =>
          metricLong(mm, s"__audit_cn${idx}_$j") > 1 ||
            metricLong(mm, s"__audit_nl${idx}_$j") > 1
        }))
      case "unique_combination_of_columns" =>
        // the classic query GROUPs BY the column tuple (NULLs equal); with
        // ≤ 1 in-scope row no tuple can repeat — sound pass
        val mC = s"__audit_cn$idx"
        Some(Planned(Seq(counted(condExpr).as(mC)),
          mm => metricLong(mm, mC) > 1))
      case "not_constant" =>
        // SOUND screen, not just probable: one distinct value occupies one
        // HLL register, whose estimate is deterministically 1 — so
        // estimate ≥ 2 proves ≥ 2 distinct values. estimate ≤ 1 could
        // still be 2 colliding values → classic query decides exactly.
        // An EMPTY scope estimates 0 < 2 → classic query, which fails it
        // exactly (count ≤ 1), as the audit requires.
        val mA = s"__audit_ad$idx"
        val v = when(condExpr, expr(args("column")))
        Some(Planned(Seq(approx_count_distinct(v).as(mA)),
          mm => metricLong(mm, mA) < 2))
      case _ => None
    })
  }
}
