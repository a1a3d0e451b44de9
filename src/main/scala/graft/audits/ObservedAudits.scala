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
  * Only audits with exact aggregate forms participate: the
  * [[Audits.rowPredicates]] family (violations = rows matching a
  * predicate → `sum(case when pred then 1 end)`), plus `at_least_one`,
  * `number_of_rows`, and `not_null_proportion` (count algebra).
  * `unique_values` / `not_constant` need DISTINCT aggregates, which
  * observed metrics disallow — they keep their own query, as do audits
  * whose args embed subqueries (`relationships` etc.).
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
      case _ => None
    })
  }
}
