package graft.cicd

import graft.{GraftContext, Plan}

/** Offline analog of the reference's GitHub CICD bot
  * (sqlmesh/integrations/github/cicd/: command.py:122
  * `update_pr_environment`, :151 `gen_prod_plan`, :184 `deploy_production`,
  * :226 `run_all`; controller.py:367 `pr_environment_name`, :742
  * `update_pr_environment`, :764 `deploy_to_prod`).
  *
  * The GitHub transport — checks API, PR comments, merge-state queries — is
  * out of scope with zero egress; the engine-side state machine is the same:
  *   1. lint + unit tests gate everything (command.py `_run_linter`,
  *      `_run_tests` checks);
  *   2. the PR gets its own virtual environment `<repo>_<pr>` and the PR
  *      plan applies there (reviewers query the PR env's views);
  *   3. a prod plan with `no_gaps` is previewed as a markdown summary — the
  *      "Prod Plan Preview" check — using the stage-level explain;
  *   4. "deploy" applies the prod plan and invalidates the PR environment.
  * Check results accumulate into a markdown report — the offline stand-in
  * for the bot's PR comment (`update_sqlmesh_comment_info`).
  */
class CicdBot(
    ctx: GraftContext,
    repo: String,
    prNumber: Int,
    start: Long,
    end: Long,
    /** reference BotConfig.skip_pr_backfill (config.py): PR envs default to
      * virtual-only; `false` backfills the PR window so reviewers see data. */
    skipPrBackfill: Boolean = true,
    /** reference BotConfig.pr_min_intervals: when the PR backfills, every
      * model covers at least this many intervals even in a narrow window. */
    prMinIntervals: Int = 0) {

  /** controller.py:367 — `<name-or-repo>_<pr>`, sanitized. */
  val prEnvironmentName: String =
    (repo + "_" + prNumber).toLowerCase.replaceAll("[^a-z0-9_]", "_")

  private val report = new StringBuilder
  private def check(name: String, ok: Boolean, detail: String = ""): Boolean = {
    report ++= s"| $name | ${if (ok) ":white_check_mark: success" else ":x: failure"} |\n"
    if (detail.nonEmpty) report ++= detail.stripLineEnd + "\n"
    ok
  }

  /** The accumulated markdown — the bot's PR-comment body. */
  def comment: String =
    s"## graft CICD bot — PR #$prNumber\n\n| check | result |\n|---|---|\n" + report.result()

  /** `_run_linter` + `_run_tests` (command.py:74,:94). */
  def runChecks(): Boolean = {
    val lintBlockers = ctx.lint().filter(_.blocking)
    val lintOk = check("linter", lintBlockers.isEmpty,
      lintBlockers.map(v => s"  - [${v.rule}] ${v.model}: ${v.message}").mkString("\n"))
    val failures = ctx.runTests().filter(_.failure.nonEmpty)
    val testsOk = check("unit tests", failures.isEmpty,
      failures.map(r => s"  - ${r.name}: ${r.failure.get}").mkString("\n"))
    lintOk && testsOk
  }

  /** controller.py:742 — apply the PR's plan into the PR environment. */
  def updatePrEnvironment(): Plan = {
    val p = ctx.plan(prEnvironmentName, start, end, skipBackfill = skipPrBackfill,
      createFrom = "prod", minIntervals = prMinIntervals)
    ctx.apply(p)
    check("PR environment", ok = true,
      s"- :eyes: To **review** this PR's changes, use virtual data environment:\n" +
        s"  - `$prEnvironmentName`")
    p
  }

  /** command.py:151 `gen_prod_plan` — the "Prod Plan Preview" check: what
    * deploying this PR would do to prod, stage by stage, without applying. */
  def prodPlanPreview(): String = {
    val p = ctx.plan("prod", start, end, noGaps = true)
    val summary = "```\n" + p.describe + "\n" + ctx.explain(p) + "\n```"
    check("prod plan preview", ok = true, summary)
    summary
  }

  /** controller.py:764 `deploy_to_prod` + `try_invalidate_pr_environment`:
    * apply the prod plan (no_gaps — a PR env that backfilled only a window
    * must not promote holes) and retire the PR environment. */
  def deployProduction(): Plan = {
    val p = ctx.plan("prod", start, end, noGaps = true)
    ctx.apply(p)
    ctx.run("prod", start, end)
    check("deploy production", ok = true)
    if (ctx.state.getEnvironment(prEnvironmentName).nonEmpty) {
      ctx.invalidateEnvironment(prEnvironmentName, sync = true)
      ctx.janitor()
      check("invalidate PR environment", ok = true)
    }
    p
  }

  /** command.py:226 `run_all` — the per-push entry point: checks → PR env →
    * prod preview; deploy only when explicitly requested (the `/deploy`
    * comment or merge event). Returns success. */
  def runAll(autoDeploy: Boolean = false): Boolean = {
    if (!runChecks()) return false
    updatePrEnvironment()
    prodPlanPreview()
    if (autoDeploy) deployProduction()
    true
  }
}
