package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftContext, SparkTestSession}
import graft.core._

/** Render cache (reference snapshot/cache.py): repeated plan/run cycles must
  * not re-render bodies whose render inputs are unchanged — ≤1 render per
  * key — while interval-sensitive and catalog-introspective bodies keep
  * rendering fresh exactly when their output could differ. */
class RenderCacheSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val D = 86400000L
  private def dayMs(s: String): Long = java.time.LocalDate.parse(s).toEpochDay * D

  private def newCtx() = {
    val ctx = new GraftContext(spark, SparkTestSession.tmpDir("rc-ws"), concurrency = 2)
    ctx.addExternal("raw.orders", s"$sf/orders.parquet")
    ctx
  }

  test("interval-insensitive FULL model renders once across run cycles") {
    val ctx = newCtx()
    ctx.addModel(Model(
      name = "rc.count_all",
      body = SqlBody("SELECT count(*) AS n FROM raw.orders"),
      kind = ModelKind.Full))
    val p = ctx.plan("prod", dayMs("1995-01-01"), dayMs("1995-01-15"))
    ctx.apply(p)
    val misses0 = ctx.evaluator.renderCache.misses
    val renders0 = Renderer.renders.get()
    // extended window → FULL refreshes again, but the rendered text can't
    // have changed (no time vars) → cache hit, zero fresh renders
    ctx.run("prod", dayMs("1995-01-01"), dayMs("1995-01-20"))
    assert(ctx.evaluator.renderCache.misses == misses0,
      "second cycle re-rendered an unchanged body")
    assert(ctx.evaluator.renderCache.hits > 0)
    assert(Renderer.renders.get() == renders0)
  }

  test("interval-sensitive body renders per new interval, hits on repeat") {
    val ctx = newCtx()
    ctx.addModel(Model(
      name = "rc.daily",
      body = SqlBody(
        """SELECT o_orderdate, count(*) AS n FROM raw.orders
          |WHERE o_orderdate BETWEEN @start_dt AND @end_dt
          |GROUP BY o_orderdate""".stripMargin),
      kind = ModelKind.IncrementalByTimeRange(timeColumn = "o_orderdate"),
      start = Some(dayMs("1995-01-01"))))
    ctx.apply(ctx.plan("prod", dayMs("1995-01-01"), dayMs("1995-01-10")))
    val misses0 = ctx.evaluator.renderCache.misses
    // a NEW interval must render fresh (its time vars differ)
    ctx.run("prod", dayMs("1995-01-01"), dayMs("1995-01-12"))
    assert(ctx.evaluator.renderCache.misses > misses0)
    // re-running an already-complete window evaluates nothing and renders nothing
    val misses1 = ctx.evaluator.renderCache.misses
    val renders1 = Renderer.renders.get()
    ctx.run("prod", dayMs("1995-01-01"), dayMs("1995-01-12"))
    assert(ctx.evaluator.renderCache.misses == misses1)
    assert(Renderer.renders.get() == renders1)
  }

  test("catalog-introspective bodies (@STAR) bypass the cache") {
    val ctx = newCtx()
    ctx.addModel(Model(
      name = "rc.star",
      body = SqlBody("SELECT @STAR(raw.orders) FROM raw.orders AS orders LIMIT 5"),
      kind = ModelKind.Full))
    ctx.apply(ctx.plan("prod", dayMs("1995-01-01"), dayMs("1995-01-10")))
    val renders0 = Renderer.renders.get()
    ctx.run("prod", dayMs("1995-01-01"), dayMs("1995-01-20"))
    // the FULL refresh re-rendered: @STAR output tracks live catalog state
    assert(Renderer.renders.get() > renders0)
  }

  test("re-registering a custom macro under the same name invalidates the cache") {
    val ctx = newCtx()
    ctx.addMacro("PICK")(_ => "1")
    ctx.addModel(Model(
      name = "rc.macro",
      body = SqlBody("SELECT @PICK() AS v FROM raw.orders LIMIT 1"),
      kind = ModelKind.Full))
    ctx.apply(ctx.plan("prod", dayMs("1995-01-01"), dayMs("1995-01-10")))
    assert(spark.table("rc.macro").select("v").head.get(0).toString == "1")
    // same name, new behavior: the registry version must bust the key — a
    // names-only key would serve the stale "1" render (r7 advisor finding)
    ctx.addMacro("PICK")(_ => "2")
    // extended window → the FULL model refreshes (same trigger as test 1);
    // the refresh must render with the NEW macro, not the cached text
    ctx.run("prod", dayMs("1995-01-01"), dayMs("1995-01-20"))
    assert(spark.table("rc.macro").select("v").head.get(0).toString == "2")
  }

  test("cacheable/sensitivity classification") {
    assert(RenderCache.cacheable("SELECT a FROM t"))
    assert(!RenderCache.cacheable("SELECT @STAR(x) FROM x"))
    assert(!RenderCache.cacheable("SELECT {{ dbt_utils.star(ref('x')) }} FROM x"))
    assert(!RenderCache.cacheable(
      "SELECT {{ dbt_utils.get_column_values(ref('x'), 'c') }}"))
    // time variables are NOT introspection — the r7 near-miss: "@start_dt"
    // contains the substring "@star"
    assert(RenderCache.cacheable("SELECT x FROM t WHERE d BETWEEN @start_dt AND @end_dt"))
  }
}
