package graft.shell

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.GraftContext
import graft.core.Interval

/** Interactive-shell entry point — the Spark-native analog of the
  * reference's Jupyter magics (`/root/reference/sqlmesh/magics.py`:
  * %context, %plan, %run_dag, %evaluate, %render, %fetchdf, %table_diff,
  * %table_name, %diff, %invalidate, %janitor, %audit, %info,
  * %create_test, %run_test). The reference targets IPython; the idiomatic
  * Spark equivalent is the `spark-shell` / Almond session, where "magics"
  * are plain imported functions over a session-held context:
  *
  * {{{
  * import graft.shell.Magics._
  * context("/path/to/project")           // %context — load + hold
  * plan("dev")                           // %plan    — print the plan
  * plan("dev", apply = true)             // %plan + confirm
  * runDag("dev")                         // %run_dag
  * evaluate("mart.daily", "2024-01-01", "2024-01-08").show()
  * println(render("mart.daily"))         // %render
  * fetchdf("SELECT * FROM mart.daily LIMIT 5").show()
  * tableDiff("mart.daily", "prod", "dev")
  * }}}
  *
  * Dates are `yyyy-MM-dd` strings (UTC midnight), the reference magics'
  * argument shape; everything returns values (DataFrame/String) rather
  * than only printing, because a Scala REPL renders returned values — the
  * display half of IPython's magic contract comes for free. */
object Magics {

  private var held: Option[GraftContext] = None

  private def c: GraftContext = held.getOrElse(throw new IllegalStateException(
    "no context loaded — call Magics.context(<project dir>) first (the %context magic)"))

  private val D = 86400000L
  /** `yyyy-MM-dd` → epoch ms at UTC midnight; ISO timestamps (with or
    * without seconds, with or without a trailing `Z`) parse as UTC. */
  private def ms(s: String): Long =
    if (s.contains("T")) {
      val base = s.stripSuffix("Z")
      // Instant.parse demands seconds — pad minute-precision input
      val withSecs = if (base.count(_ == ':') == 1) base + ":00" else base
      java.time.Instant.parse(withSecs + "Z").toEpochMilli
    } else java.time.LocalDate.parse(s).toEpochDay * D
  private def today: Long = (System.currentTimeMillis() / D) * D

  /** %context — load (or reload) a project directory into a held context.
    * Extra knobs mirror the GraftContext constructor; the active Spark
    * session is picked up from the shell. */
  def context(projectDir: String,
              spark: SparkSession = SparkSession.active,
              dbt: Boolean = false): GraftContext = {
    val ctx = new GraftContext(spark, projectDir)
    if (dbt) ctx.loadDbtProject(projectDir) else ctx.loadModels(projectDir)
    held = Some(ctx)
    println(ctx.info)
    ctx
  }

  /** Hold an already-built context (programmatic projects, tests). */
  def use(ctx: GraftContext): GraftContext = { held = Some(ctx); ctx }

  /** %plan — build a plan, PRINT the apply preview, and (only with
    * `apply = true` — the shell analog of the magic's confirmation
    * prompt) apply it. Returns the plan for further inspection. */
  def plan(env: String = "prod",
           start: String = "1970-01-01", end: String = "",
           apply: Boolean = false,
           select: Seq[String] = Nil,
           forwardOnly: Boolean = false,
           skipBackfill: Boolean = false): graft.Plan = {
    val e = if (end.isEmpty) today + D else ms(end)
    val p = c.plan(env, ms(start), e, select = select,
      forwardOnly = forwardOnly, skipBackfill = skipBackfill)
    println(c.explain(p))
    if (apply) { c.apply(p); println(s"applied plan to '$env'") }
    p
  }

  /** %run_dag — run the scheduler for an environment's missing intervals. */
  def runDag(env: String = "prod",
             start: String = "1970-01-01", end: String = ""): Unit = {
    val e = if (end.isEmpty) today + D else ms(end)
    c.run(env, ms(start), e)
    println(s"run complete: ${c.lastRunReport.size} batch(es)")
    c.lastRunReport.foreach(b => println(s"  $b"))
  }

  /** %evaluate — render a model's query for a window and execute it
    * WITHOUT materializing (the reference's preview semantics). */
  def evaluate(model: String, start: String, end: String): DataFrame =
    c.evaluate(model, ms(start), ms(end))

  /** %render — the fully-rendered SQL for a model over a window. */
  def render(model: String, start: String = "1970-01-01",
             end: String = ""): String = {
    val e = if (end.isEmpty) today + D else ms(end)
    c.renderSql(model, ms(start), e)
  }

  /** %fetchdf — ad-hoc SQL through the session (virtual layer included). */
  def fetchdf(sql: String): DataFrame = c.fetch(sql)

  /** %table_name — the environment view a model resolves to. */
  def tableName(model: String, env: String = "prod"): String =
    c.envTable(model, env)

  /** %table_diff — schema + row diff of one model across two envs. */
  def tableDiff(model: String, sourceEnv: String, targetEnv: String): DataFrame =
    c.tableDiff(model, sourceEnv, targetEnv)

  /** %diff — models whose snapshot version differs between two envs. */
  def diff(sourceEnv: String, targetEnv: String): Seq[String] = {
    val changed = c.changedModelsBetween(sourceEnv, targetEnv)
    if (changed.isEmpty) println(s"no differences between '$sourceEnv' and '$targetEnv'")
    else changed.foreach(m => println(s"  ~ $m"))
    changed
  }

  /** %audit — run a model's audits against its current prod snapshot. */
  def audit(model: String, env: String = "prod"): Unit =
    c.audit(model, env).foreach { case (name, violations) =>
      println(f"$name%-40s ${if (violations == 0) "PASS" else s"FAIL ($violations violations)"}")
    }

  /** %run_test — the project's YAML model tests. */
  def runTests(): Unit = c.runTests().foreach { r =>
    println(f"${r.name}%-40s ${r.failure.map("FAIL: " + _).getOrElse("PASS")}")
  }

  /** %invalidate / %janitor — environment lifecycle. */
  def invalidate(env: String, sync: Boolean = false): Unit =
    c.invalidateEnvironment(env, sync)
  def janitor(): Unit = c.janitor()

  /** %info — project summary. */
  def info(): Unit = println(c.info)

  /** restatement plan in one call (the `%plan --restate-model` form). */
  def restate(model: String, start: String, end: String,
              env: String = "prod", apply: Boolean = false): graft.Plan = {
    val p = c.plan(env, ms(start), ms(end),
      restate = Map(model -> Interval(ms(start), ms(end))))
    println(c.explain(p))
    if (apply) { c.apply(p); println(s"restated $model in '$env'") }
    p
  }
}
