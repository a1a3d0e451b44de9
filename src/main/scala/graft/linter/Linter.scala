package graft.linter

import graft.core.{Model, ModelKind, SqlBody}

/** Lint rules over model definitions (reference:
  * sqlmesh/core/linter/rules/builtin.py:31-292 — `NoSelectStar`,
  * `AmbiguousOrInvalidColumn`, `InvalidSelectStarExpansion`,
  * `NoMissingAudits`, cron/owner checks). Text-level checks, run at load time;
  * `error` rules block a plan, `warn` rules report. */
object Linter {

  final case class Violation(rule: String, model: String, message: String,
                             blocking: Boolean)

  type Rule = Model => Option[Violation]

  private def sqlOf(m: Model): Option[String] = m.body match {
    case SqlBody(s) => Some(s); case _ => None
  }

  /** noselectstar (builtin.py:66): outer SELECT * makes schema/lineage
    * undecidable and breaks additive-change detection. */
  val noSelectStar: Rule = m => sqlOf(m).flatMap { sql =>
    val canonical = graft.core.Fingerprint.canonicalSql(sql)
    graft.core.QueryDiff.outerProjection(canonical) match {
      case Some((_, items, _)) if items.exists(i => i == "*" || i.endsWith(".*")) =>
        Some(Violation("noselectstar", m.name,
          "outer SELECT * prevents schema inference and change categorization", blocking = true))
      case _ => None
    }
  }

  /** nomissingaudits (builtin.py:241): materialized models should declare at
    * least one audit. */
  val noMissingAudits: Rule = m =>
    if (m.kind.isMaterialized && m.kind != ModelKind.View && m.audits.isEmpty)
      Some(Violation("nomissingaudits", m.name,
        "materialized model declares no audits", blocking = false))
    else None

  /** nomissingowner: governance check from the reference's metadata rules. */
  val noMissingOwner: Rule = m =>
    if (m.owner.isEmpty)
      Some(Violation("nomissingowner", m.name, "model has no owner", blocking = false))
    else None

  /** incremental models must reference the time filter macros — otherwise
    * every run recomputes everything (the reference renderer enforces the
    * predicate; we surface it as a lint). */
  val incrementalMustFilterTime: Rule = m => m.kind match {
    case _: ModelKind.IncrementalByTimeRange =>
      sqlOf(m) match {
        case Some(sql) if !sql.contains("@start") && !sql.contains("@end") =>
          Some(Violation("incrementalmustfiltertime", m.name,
            "INCREMENTAL_BY_TIME_RANGE body never references @start_*/@end_* bounds",
            blocking = true))
        case _ => None
      }
    case _ => None
  }

  val defaultRules: Seq[Rule] =
    Seq(noSelectStar, noMissingAudits, noMissingOwner, incrementalMustFilterTime)

  /** Every rule name the engine can emit — the model-local rules above plus
    * the context-aware ones raised by GraftContext.lint. The "all" sentinel
    * in config rules/warn_rules expands to this set (reference
    * linter/definition.py:19 select_rules). */
  val allRuleNames: Seq[String] = Seq(
    "noselectstar", "nomissingaudits", "nomissingowner",
    "incrementalmustfiltertime", "nomissingexternalmodels",
    "invalidselectstarexpansion", "ambiguousorinvalidcolumn",
    "noambiguousprojections", "nomissingunittest")

  def lint(models: Seq[Model], rules: Seq[Rule] = defaultRules): Seq[Violation] =
    for { m <- models; r <- rules; v <- r(m) } yield v

  /** Throw on blocking violations (plan-gating behavior). */
  def enforce(models: Seq[Model], rules: Seq[Rule] = defaultRules): Seq[Violation] = {
    val vs = lint(models, rules)
    val blocking = vs.filter(_.blocking)
    if (blocking.nonEmpty)
      throw new IllegalStateException(
        "linter: " + blocking.map(v => s"[${v.rule}] ${v.model}: ${v.message}").mkString("; "))
    vs
  }
}
