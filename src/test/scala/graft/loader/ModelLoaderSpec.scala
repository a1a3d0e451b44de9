package graft.loader

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.core._

class ModelLoaderSpec extends AnyFunSuite {

  test("parses the full MODEL header surface") {
    val m = ModelLoader.parse(
      """/* file comment */
        |MODEL (
        |  name mart.daily_revenue,
        |  kind INCREMENTAL_BY_TIME_RANGE (
        |    time_column ds,
        |    time_format 'date',
        |    batch_size 10,
        |    lookback 2,
        |    forward_only true,
        |    auto_restatement_cron '@monthly',
        |    auto_restatement_intervals 3
        |  ),
        |  cron '@daily',
        |  start '2024-01-01',
        |  owner team_data,
        |  description 'daily revenue rollup',
        |  tags (finance, daily),
        |  grains (ds),
        |  audits (not_null(columns = (ds, rev)), accepted_range(column = rev, min_v = 0)),
        |  partitioned_by (ds),
        |  clustered_by (cust_id),
        |  storage_format parquet
        |);
        |
        |-- a pre-statement
        |SET spark.sql.shuffle.partitions = 8;
        |
        |SELECT ds, cust_id, sum(amount) AS rev
        |FROM raw.orders WHERE ds BETWEEN @start_ds AND @end_ds
        |GROUP BY ds, cust_id;
        |
        |ANALYZE TABLE @this_model COMPUTE STATISTICS
        |""".stripMargin)

    assert(m.name == "mart.daily_revenue")
    m.kind match {
      case k: ModelKind.IncrementalByTimeRange =>
        assert(k.timeColumn == "ds" && k.timeFormat == "date")
        assert(k.batchSize.contains(10) && k.lookback == 2 && k.forwardOnly)
        assert(k.autoRestatementCron.contains("@monthly") &&
          k.autoRestatementIntervals.contains(3))
      case other => fail(s"wrong kind $other")
    }
    assert(m.cron == "@daily")
    assert(m.start.contains(java.time.LocalDate.parse("2024-01-01").toEpochDay * 86400000L))
    assert(m.owner.contains("team_data"))
    assert(m.description.contains("daily revenue rollup"))
    assert(m.tags == Seq("finance", "daily") && m.grains == Seq("ds"))
    assert(m.audits == Seq(
      "not_null" -> Map("columns" -> "ds, rev"),
      "accepted_range" -> Map("column" -> "rev", "min_v" -> "0")))
    assert(m.partitionedBy == Seq("ds") && m.clusteredBy == Seq("cust_id"))
    assert(m.preStatements.size == 1 && m.preStatements.head.startsWith("SET"))
    assert(m.postStatements.size == 1 && m.postStatements.head.startsWith("ANALYZE"))
    assert(m.body.asInstanceOf[SqlBody].sql.startsWith("SELECT ds"))
    assert(m.references.contains("raw.orders"))
  }

  test("ON_VIRTUAL_UPDATE block parses separately from pre/post statements") {
    val m = ModelLoader.parse(
      """MODEL (name mart.v, kind FULL);
        |SET spark.sql.shuffle.partitions = 8;
        |SELECT 1 AS one;
        |ANALYZE TABLE @this_model COMPUTE STATISTICS;
        |ON_VIRTUAL_UPDATE_BEGIN;
        |GRANT SELECT ON @this_model TO ROLE analysts;
        |CREATE OR REPLACE VIEW mart.v_alias AS SELECT * FROM @this_model;
        |ON_VIRTUAL_UPDATE_END;
        |""".stripMargin)
    assert(m.preStatements.size == 1 && m.preStatements.head.startsWith("SET"))
    assert(m.postStatements.size == 1 && m.postStatements.head.startsWith("ANALYZE"))
    assert(m.onVirtualUpdate.size == 2 && m.onVirtualUpdate.head.startsWith("GRANT"))
    assert(m.body.asInstanceOf[SqlBody].sql == "SELECT 1 AS one")
  }

  test("parses every kind header") {
    def kindOf(k: String): ModelKind =
      ModelLoader.parse(s"MODEL (name m.x, kind $k); SELECT 1 AS a").kind
    assert(kindOf("FULL") == ModelKind.Full)
    assert(kindOf("VIEW") == ModelKind.View)
    assert(kindOf("EMBEDDED") == ModelKind.Embedded)
    assert(kindOf("INCREMENTAL_BY_UNIQUE_KEY (unique_key (a, b))") ==
      ModelKind.IncrementalByUniqueKey(Seq("a", "b")))
    assert(kindOf("INCREMENTAL_BY_PARTITION (partitioned_by (p))") ==
      ModelKind.IncrementalByPartition(Seq("p")))
    assert(kindOf("INCREMENTAL_UNMANAGED") == ModelKind.IncrementalUnmanaged())
    assert(kindOf("SCD_TYPE_2_BY_TIME (unique_key (id))") ==
      ModelKind.ScdType2ByTime(Seq("id")))
    assert(kindOf("SCD_TYPE_2_BY_COLUMN (unique_key (id), columns (c1, c2))") ==
      ModelKind.ScdType2ByColumn(Seq("id"), Seq("c1", "c2")))
    assert(kindOf("SEED (path 'data/x.csv')") == ModelKind.Seed("data/x.csv"))
    assert(kindOf("MANAGED (target_lag '10 minutes')") ==
      ModelKind.Managed("10 minutes"))
    assert(kindOf("MANAGED") == ModelKind.Managed())
  }

  test("stamp busts the data hash; enabled=false models are skipped at load") {
    val m = ModelLoader.parse(
      "MODEL (name m.s, stamp 'v2', enabled false); SELECT 1 AS a")
    assert(m.stamp.contains("v2") && !m.enabled)
    val base = ModelLoader.parse("MODEL (name m.s); SELECT 1 AS a")
    assert(base.enabled)
    // same body, different stamp → different version (new physical table)
    val f0 = Fingerprint.of(base, "SELECT 1 AS a", Nil)
    val f1 = Fingerprint.of(m.copy(enabled = true), "SELECT 1 AS a", Nil)
    assert(f0.version != f1.version)
  }

  test("MANAGED target_lag parses duration specs") {
    assert(ModelKind.Managed.lagMs("30 seconds") == 30000L)
    assert(ModelKind.Managed.lagMs("10 minutes") == 600000L)
    assert(ModelKind.Managed.lagMs("2 hours") == 7200000L)
    assert(ModelKind.Managed.lagMs("1 day") == 86400000L)
    assert(ModelKind.Managed.lagMs("downstream") == 0L)
  }

  test("VIEW (materialized true) parses to the materialized-view kind") {
    val m = ModelLoader.parse(
      """MODEL (name mart.mv, kind VIEW (materialized true));
        |SELECT 1 AS one""".stripMargin)
    assert(m.kind == ModelKind.MaterializedView)
    assert(ModelLoader.parse("MODEL (name mart.v, kind VIEW);\nSELECT 1 AS one")
      .kind == ModelKind.View)
  }

  test("AUDIT files parse into standalone audits and load alongside models") {
    val a = ModelLoader.parseStandaloneAudit(
      """-- catch bad rows project-wide
        |AUDIT (
        |  name assert_positive_ids,
        |  blocking false,
        |  description 'ids must be positive'
        |);
        |SELECT * FROM mart.orders WHERE id <= 0""".stripMargin)
    assert(a.name == "assert_positive_ids" && !a.blocking)
    assert(a.description.contains("ids must be positive"))
    assert(a.sql.startsWith("SELECT"))

    val proj = graft.SparkTestSession.tmpDir("proj_audit")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, "m.sql"),
      "MODEL (name am.m, kind FULL);\nSELECT 1 AS one")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, "check.sql"),
      "AUDIT (name am_check);\nSELECT * FROM am.m WHERE one < 0")
    val (models, audits, _) = ModelLoader.loadProject(proj)
    assert(models.map(_.name) == Seq("am.m"))
    assert(audits.map(_.name) == Seq("am_check") && audits.head.blocking)
  }

  test("a file-based project loads and runs end-to-end") {
    val spark = SparkTestSession.spark
    val proj = SparkTestSession.tmpDir("proj")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, "daily.sql"),
      """MODEL (
        |  name filemart.daily,
        |  kind INCREMENTAL_BY_TIME_RANGE (time_column o_orderdate),
        |  start '1995-01-01'
        |);
        |SELECT o_orderdate, count(*) AS n, round(sum(o_totalprice), 2) AS rev
        |FROM raw.orders WHERE o_orderdate BETWEEN @start_dt AND @end_dt
        |GROUP BY o_orderdate
        |""".stripMargin)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, "stats.sql"),
      """MODEL (name filemart.stats, kind VIEW);
        |SELECT count(*) AS days, round(sum(rev), 2) AS total FROM filemart.daily
        |""".stripMargin)

    val ctx = new graft.GraftContext(spark, SparkTestSession.tmpDir("ws"), 2)
    ctx.addExternal("raw.orders", "/root/testdata/sf0.001/orders.parquet")
    ctx.loadModels(proj)
    val D = 86400000L
    val start = java.time.LocalDate.parse("1995-01-01").toEpochDay * D
    ctx.apply(ctx.plan("prod", start, start + 10 * D))
    assert(spark.table("filemart.stats").head().getLong(0) > 0)
    // renderSql shows resolved upstream + time bounds
    val rendered = ctx.renderSql("filemart.daily", start, start + D)
    assert(rendered.contains("parquet.") && rendered.contains("1995-01-01"))
  }

  test("config.yaml model_defaults apply when the header omits a prop") {
    // reference core/config/root.py:91 Config + config/model.py
    // ModelDefaultsConfig: file-level defaults, header always wins
    val proj = SparkTestSession.tmpDir("proj_cfg")
    def w(name: String, text: String): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, name), text)
    w("config.yaml",
      """model_defaults:
        |  kind: VIEW
        |  cron: '@hourly'
        |  owner: team_cfg
        |  start: '2023-06-01'
        |  storage_format: parquet
        |  tags: [managed]
        |  audits: (not_null(columns = (n)))
        |variables:
        |  cutoff: '1995-01-01'
        |linter:
        |  ignored_rules: [nomissingowner]
        |""".stripMargin)
    w("bare.sql", "MODEL (name cfg.bare);\nSELECT 1 AS n\n")
    w("annotated.sql",
      """MODEL (name cfg.annotated, kind FULL, cron '@daily', owner me,
        |       tags (custom), audits (at_least_one(column = n)));
        |SELECT 2 AS n
        |""".stripMargin)
    val (ms, _, _) = ModelLoader.loadProject(proj)
    val byName = ms.map(m => m.name -> m).toMap
    val bare = byName("cfg.bare")
    assert(bare.kind == ModelKind.View)          // default changed it from FULL
    assert(bare.cron == "@hourly")
    assert(bare.owner.contains("team_cfg"))
    assert(bare.start.contains(java.time.LocalDate.parse("2023-06-01").toEpochDay * 86400000L))
    assert(bare.tags == Seq("managed"))
    assert(bare.audits.map(_._1) == Seq("not_null"))
    val ann = byName("cfg.annotated")
    assert(ann.kind == ModelKind.Full && ann.cron == "@daily") // header wins
    assert(ann.owner.contains("me"))
    assert(ann.tags == Seq("custom", "managed")) // default tags APPEND
    assert(ann.audits.map(_._1) == Seq("at_least_one")) // header audits win
    // context picks up variables + linter ignores from the same file
    val ctx = new graft.GraftContext(SparkTestSession.spark,
      SparkTestSession.tmpDir("ws_cfg"), 2)
    ctx.loadModels(proj)
    assert(ctx.allVariables.get("cutoff").contains("1995-01-01"))
    assert(!ctx.lint().exists(_.rule == "nomissingowner"))
  }

  test("ProjectConfig parses TTL specs and linter toggles") {
    assert(ProjectConfig.parseTtl("7 days") == 7L * 24 * 3600 * 1000)
    assert(ProjectConfig.parseTtl("1 week") == 7L * 24 * 3600 * 1000)
    assert(ProjectConfig.parseTtl("12 hours") == 12L * 3600 * 1000)
    assert(ProjectConfig.parseTtl("30 minutes") == 30L * 60 * 1000)
    assert(ProjectConfig.parseTtl("86400000") == 86400000L)
    val c = ProjectConfig.parse(
      """environment_ttl: 2 days
        |default_target_environment: dev
        |environment_suffix_target: table
        |state_dir: custom/.state
        |concurrency: 8
        |before_all: ["SET a=1"]
        |linter:
        |  enabled: false
        |""".stripMargin)
    assert(c.environmentTtlMs.contains(2L * 24 * 3600 * 1000))
    assert(c.defaultTargetEnvironment.contains("dev"))
    assert(c.environmentSuffixTarget.contains("table"))
    assert(c.stateDir.contains("custom/.state"))
    assert(c.concurrency.contains(8))
    assert(c.beforeAll == Seq("SET a=1"))
    assert(!c.linterEnabled)
  }

  test("blueprints expand one template into per-mapping models, end-to-end") {
    val ms = ModelLoader.parseAll(
      """MODEL (
        |  name mart.@{segment}_rev,
        |  kind FULL,
        |  blueprints ((segment = 'retail', floor = 10),
        |              (segment = 'corp', floor = 100)),
        |  owner team_data
        |);
        |SELECT count(*) AS n, @BLUEPRINT_VAR('floor') AS floor_v
        |FROM raw.orders WHERE o_totalprice > @BLUEPRINT_VAR('floor')
        |""".stripMargin)
    assert(ms.map(_.name) == Seq("mart.retail_rev", "mart.corp_rev"))
    assert(ms.forall(_.owner.contains("team_data")))
    val bodies = ms.map(_.body.asInstanceOf[SqlBody].sql)
    assert(bodies.head.contains("o_totalprice > 10") &&
      bodies(1).contains("o_totalprice > 100"))
    // distinct fingerprint inputs → independent snapshots/tables
    assert(bodies.distinct.size == 2)
    // a blueprint-less file parses exactly one model
    assert(ModelLoader.parseAll(
      "MODEL (name a.b, kind FULL);\nSELECT 1 AS x\n").map(_.name) == Seq("a.b"))
    // load-time errors, not plan-time Spark mysteries: empty blueprints,
    // a mapping that leaves a template var unbound, a mixed mapping list
    assert(intercept[IllegalArgumentException](ModelLoader.parseAll(
      "MODEL (name a.c, kind FULL, blueprints ());\nSELECT 1 AS x\n"))
      .getMessage.contains("empty"))
    assert(intercept[IllegalArgumentException](ModelLoader.parseAll(
      """MODEL (name a.d, kind FULL, blueprints ((x = '1'), (y = '2')));
        |SELECT @BLUEPRINT_VAR('x') AS v
        |""".stripMargin)).getMessage.contains("unbound"))
    assert(intercept[IllegalArgumentException](ModelLoader.parseAll(
      "MODEL (name a.e, kind FULL, blueprints ((x = '1'), x = '2'));\nSELECT 1 AS v\n"))
      .getMessage.contains("mixes"))
    // case-insensitive interpolation: lowercased key binds @{Seg} too
    val ci = ModelLoader.parseAll(
      "MODEL (name m.@{Seg}_x, kind FULL, blueprints (SEG = 'a'));\nSELECT 1 AS v\n")
    assert(ci.map(_.name) == Seq("m.a_x"))
    // end-to-end: the expanded instances plan + materialize independently
    val proj = SparkTestSession.tmpDir("proj-blueprint")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, "tpl.sql"),
      """MODEL (name bp.@{lang}_docs, kind FULL,
        |       blueprints ((lang = 'en'), (lang = 'de')));
        |SELECT count(*) AS n FROM raw.docs WHERE lang = @BLUEPRINT_VAR('lang')
        |""".stripMargin)
    val ctx = new graft.GraftContext(SparkTestSession.spark,
      SparkTestSession.tmpDir("ws-bp"), 2)
    ctx.addExternal("raw.docs", "/root/testdata/sf0.001/documents.parquet")
    ctx.loadModels(proj)
    ctx.apply(ctx.plan("prod", 0, 86400000L))
    val en = SparkTestSession.spark.table("bp.en_docs").head().getLong(0)
    val de = SparkTestSession.spark.table("bp.de_docs").head().getLong(0)
    assert(en > 0 && de > 0 && en != de)
  }
}
