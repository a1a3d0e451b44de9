package graft.audits

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.core._

/** One-pass write+audit (ObservedAudits): verdict parity with the query
  * templates, zero extra scans on the all-pass path, and the classic
  * fallback (sample row + WAP rollback) on violation. */
class ObservedAuditsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def observedVerdict(name: String, args: Map[String, String],
                              df: org.apache.spark.sql.DataFrame): Boolean = {
    val p = ObservedAudits.plan(0, name, args, None)
      .getOrElse(fail(s"$name not observable"))
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, p.metrics.head, p.metrics.tail: _*).write
      .mode("overwrite").parquet(SparkTestSession.tmpDir("obs_sink"))
    p.failed(obs.get)
  }

  test("observed verdicts match the audit-query semantics") {
    val df = Seq((1, "a", 5), (2, null, 50), (3, "c", 7))
      .toDF("id", "name", "v")
    assert(observedVerdict("not_null", Map("columns" -> "name"), df))
    assert(!observedVerdict("not_null", Map("columns" -> "id"), df))
    assert(observedVerdict("accepted_range",
      Map("column" -> "v", "min_v" -> "0", "max_v" -> "10"), df))
    assert(!observedVerdict("accepted_range",
      Map("column" -> "v", "min_v" -> "0", "max_v" -> "100"), df))
    // condition scopes the check: the null name sits at id=2, excluded
    assert(!observedVerdict("not_null",
      Map("columns" -> "name", "condition" -> "id <> 2"), df))
    assert(observedVerdict("number_of_rows", Map("threshold" -> "5"), df))
    assert(!observedVerdict("number_of_rows", Map("threshold" -> "2"), df))
    assert(!observedVerdict("at_least_one", Map("column" -> "name"), df))
    assert(observedVerdict("at_least_one",
      Map("column" -> "name", "condition" -> "id = 99"), df))
    assert(observedVerdict("not_null_proportion",
      Map("column" -> "name", "threshold" -> "0.9"), df))
    assert(!observedVerdict("not_null_proportion",
      Map("column" -> "name", "threshold" -> "0.5"), df))
    // regex / like / length / stat families are observable too
    assert(observedVerdict("valid_email", Map("column" -> "name"), df))
    assert(!observedVerdict("match_like_pattern_list",
      Map("column" -> "name", "patterns" -> "'%a%', '%c%'"), df))
    assert(observedVerdict("string_length_equal",
      Map("column" -> "name", "v" -> "5"), df))
    // v values: 5, 50, 7 → mean ≈ 20.67
    assert(!observedVerdict("mean_in_range",
      Map("column" -> "v", "min_v" -> "0", "max_v" -> "100"), df))
    assert(observedVerdict("mean_in_range",
      Map("column" -> "v", "max_v" -> "10"), df))
    assert(observedVerdict("stddev_in_range",
      Map("column" -> "v", "max_v" -> "1"), df))
    // non-observable families stay on the query path
    assert(ObservedAudits.plan(0, "relationships",
      Map("column" -> "id", "to" -> "t", "field" -> "f"), None).isEmpty)
    assert(ObservedAudits.plan(0, "sequential_values",
      Map("column" -> "id"), None).isEmpty)
    // args embedding a subquery are rejected even for observable names
    assert(ObservedAudits.plan(0, "forall",
      Map("criteria" -> "v < (SELECT max(x) FROM t)"), None).isEmpty)
  }

  test("DISTINCT-family screens: only provably-sound passes skip the query") {
    val df = Seq((1, "a", 5), (2, null, 50), (3, "c", 7)).toDF("id", "name", "v")
    // uniqueness can NOT be proven by HLL estimates (both sketches hash the
    // same fixed-seed XxHash64 — correlated errors): any scope with more
    // than one row falls back to the exact classic query, duplicates or not
    assert(observedVerdict("unique_values", Map("columns" -> "id"), df))
    val dup = Seq((1, "a"), (1, "b"), (2, "c")).toDF("id", "name")
    assert(observedVerdict("unique_values", Map("columns" -> "id"), dup))
    // NULL duplicates (violations to the classic query — NULLs group
    // together) force the fallback too
    val nulls = Seq((Some(1), "a"), (None, "b"), (None, "c"))
      .toDF("id", "name")
    assert(observedVerdict("unique_values", Map("columns" -> "id"), nulls))
    // degenerate scopes are provably unique from EXACT counts alone:
    // ≤ 1 non-null row and ≤ 1 null row ⇒ no group can repeat — sound skip
    assert(!observedVerdict("unique_values",
      Map("columns" -> "id", "condition" -> "name = 'a'"), dup))
    val oneEach = Seq((Some(1), "a"), (None, "b")).toDF("id", "name")
    assert(!observedVerdict("unique_values", Map("columns" -> "id"), oneEach))
    // unique_combination_of_columns: only the ≤ 1-in-scope-row case passes
    val comb = Seq((1, "x"), (1, "y"), (2, "x")).toDF("a", "b")
    assert(observedVerdict("unique_combination_of_columns",
      Map("columns" -> "a, b"), comb))
    assert(!observedVerdict("unique_combination_of_columns",
      Map("columns" -> "a, b", "condition" -> "b = 'y'"), comb))
    // not_constant: ≥2 occupied registers PROVES ≥2 distinct → pass;
    // single value or empty scope → fallback (which fails them exactly)
    assert(!observedVerdict("not_constant", Map("column" -> "v"), df))
    assert(observedVerdict("not_constant", Map("column" -> "v"),
      Seq((1, "a", 5), (2, "b", 5)).toDF("id", "name", "v")))
    assert(observedVerdict("not_constant",
      Map("column" -> "v", "condition" -> "id > 99"), df))
  }

  test("stale-partition restatement cannot false-pass an observed audit") {
    // day-partitioned incremental: run 1 backfills day1 (v=5) + day2 (v=50)
    // under accepted_range max 100; the audit is then TIGHTENED to max 30
    // (metadata-only — same version, same physical table) and the source
    // loses day2. Restating [day1, day3) in one batch rewrites only the
    // day1 partition — day2's stale v=50 rows sit INSIDE the audited
    // interval but OUTSIDE the batch, so batch-scoped observed metrics
    // would pass; the partition-metadata freshness gate must force the
    // classic query, which fails.
    def day(s: String) = java.time.LocalDate.parse(s).toEpochDay * 86400000L
    val srcDir = SparkTestSession.tmpDir("obs-stale-src")
    def writeSrc(days: Seq[(String, Int)]): Unit =
      days.flatMap { case (d, v) =>
        (1 to 5).map(i => (i.toLong, java.sql.Timestamp.valueOf(s"$d 00:00:00"), v))
      }.toDF("id", "ts", "v").write.mode("overwrite").parquet(srcDir)
    writeSrc(Seq("2024-01-01" -> 5, "2024-01-02" -> 50))
    val ws = SparkTestSession.tmpDir("ws-obs-stale")
    def ctx(maxV: String) = {
      val c = new graft.GraftContext(spark, ws)
      c.addExternal("raw.obsev", srcDir)
      c.addModel(Model("obs.daily",
        SqlBody("SELECT id, ts, v FROM raw.obsev WHERE ts BETWEEN @start_ts AND @end_ts"),
        kind = ModelKind.IncrementalByTimeRange(timeColumn = "ts", batchSize = Some(31)),
        cron = "@daily", start = Some(day("2024-01-01")),
        audits = Seq("accepted_range" -> Map("column" -> "v", "max_v" -> maxV))))
      c
    }
    val c1 = ctx("100")
    c1.apply(c1.plan("prod", day("2024-01-01"), day("2024-01-03")))
    assert(spark.table("obs.daily").count() == 10)
    writeSrc(Seq("2024-01-01" -> 5))
    val c2 = ctx("30")
    val p = c2.plan("prod", day("2024-01-01"), day("2024-01-03"),
      restate = Map("obs.daily" ->
        graft.core.Interval(day("2024-01-01"), day("2024-01-03"))))
    val ex = intercept[Exception](c2.apply(p))
    assert(ex.getMessage.contains("accepted_range"), ex.getMessage)
  }

  test("all-pass observable audits add zero post-write queries; failure keeps WAP") {
    val sf = "/root/testdata/sf0.001"
    def newCtx() = {
      val c = new graft.GraftContext(spark, SparkTestSession.tmpDir("ws-obs"))
      c.addExternal("raw.orders", s"$sf/orders.parquet")
      c
    }
    def countQueries(f: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger
      val l = new org.apache.spark.sql.util.QueryExecutionListener {
        def onSuccess(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
                      d: Long): Unit = n.incrementAndGet()
        def onFailure(fn: String, qe: org.apache.spark.sql.execution.QueryExecution,
                      e: Exception): Unit = ()
      }
      spark.listenerManager.register(l)
      try { f; Thread.sleep(500) } // let the async listener bus drain
      finally spark.listenerManager.unregister(l)
      n.get
    }
    def model(audits: Seq[(String, Map[String, String])]) = Model(
      name = "obs.orders_copy",
      body = SqlBody("SELECT o_orderkey, o_totalprice FROM raw.orders"),
      kind = ModelKind.Full, audits = audits)

    // same model, observable (riding the write) vs query-backed audits: the
    // observable run must plan strictly fewer queries. unique_values rides
    // the write but (soundly) falls back to ONE exact query for any
    // multi-row scope; not_null and not_constant skip theirs entirely.
    val observable = Seq(
      "not_null" -> Map("columns" -> "o_orderkey"),
      "unique_values" -> Map("columns" -> "o_orderkey"),
      "not_constant" -> Map("column" -> "o_totalprice"))
    val queryBacked = Seq(
      "relationships" -> Map("column" -> "o_orderkey", "to" -> "raw.orders",
        "field" -> "o_orderkey"),
      "sequential_values" -> Map("column" -> "o_orderkey"),
      "mutually_exclusive_ranges" -> Map(
        "lower_bound_column" -> "o_orderkey", "upper_bound_column" -> "o_orderkey"))
    val c1 = newCtx(); c1.addModel(model(observable))
    val nObs = countQueries(c1.apply(c1.plan("prod", 0, 86400000L)))
    val c2 = newCtx()
    c2.addModel(model(queryBacked).copy(name = "obs.orders_copy"))
    val nQry = countQueries(c2.apply(c2.plan("prod", 0, 86400000L)))
    assert(nObs < nQry, s"observed audits should skip audit queries ($nObs vs $nQry)")

    // a unique_values VIOLATION goes fallback → classic query → exact
    // verdict with a sample row and WAP rollback
    val c4 = newCtx()
    c4.addModel(Model(name = "obs.orders_dup",
      body = SqlBody("SELECT o_orderkey % 2 AS k, o_totalprice FROM raw.orders"),
      kind = ModelKind.Full,
      audits = Seq("unique_values" -> Map("columns" -> "k"))))
    val exDup = intercept[Exception](c4.apply(c4.plan("prod", 0, 86400000L)))
    assert(exDup.getMessage.contains("unique_values") && exDup.getMessage.contains("e.g."))

    // failing observed audit: fallback query supplies the sample, WAP rolls back
    val c3 = newCtx()
    c3.addModel(model(Seq(
      "accepted_range" -> Map("column" -> "o_totalprice", "max_v" -> "0"))))
    val ex = intercept[Exception](c3.apply(c3.plan("prod", 0, 86400000L)))
    assert(ex.getMessage.contains("accepted_range") && ex.getMessage.contains("e.g."))
    val snap = c3.state.latestSnapshot("obs.orders_copy").get
    assert(c3.materializer.currentDataDir(c3.evaluator.physicalTable(snap)).isEmpty)
  }
}
