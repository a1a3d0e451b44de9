package graft.loader

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.{GraftContext, SparkTestSession}

/** dbt project loading (reference sqlmesh/dbt/): layout parsing, config →
  * kind mapping, sources, seeds, snapshots, and the is_incremental() guard
  * running through a real plan/apply cycle. */
class DbtLoaderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val D = 86400000L
  private def dayMs(s: String): Long = java.time.LocalDate.parse(s).toEpochDay * D

  private def write(p: java.nio.file.Path, text: String): Unit = {
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, text)
  }

  /** A small dbt project over the driver testdata. */
  private def makeProject(): String = {
    val root = java.nio.file.Files.createTempDirectory("dbt_proj")
    write(root.resolve("dbt_project.yml"),
      """name: analytics
        |vars:
        |  cutoff: '1995-02-01'
        |""".stripMargin)
    write(root.resolve("models/schema.yml"),
      """sources:
        |  - name: raw
        |    tables:
        |      - name: orders
        |      - name: customer
        |        identifier: customer
        |models:
        |  - name: stg_orders
        |    columns:
        |      - name: o_orderkey
        |        tests: [unique, not_null]
        |  - name: seg_revenue
        |    columns:
        |      - name: c_mktsegment
        |        tests:
        |          - not_null
        |          - accepted_values:
        |              values: ['AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD', 'MACHINERY']
        |  - name: order_log
        |    columns:
        |      - name: o_orderkey
        |        tests:
        |          - relationships:
        |              to: ref('stg_orders')
        |              field: o_orderkey
        |""".stripMargin)
    write(root.resolve("models/staging/stg_orders.sql"),
      """{{ config(materialized='view', schema='dbtstg') }}
        |SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
        |FROM {{ source('raw', 'orders') }}
        |WHERE o_orderdate < TIMESTAMP '{{ var("cutoff") }}'
        |""".stripMargin)
    write(root.resolve("models/marts/seg_revenue.sql"),
      """{{ config(materialized='table', schema='dbtmart', tags=['finance']) }}
        |SELECT c.c_mktsegment, count(*) AS n, round(sum(o.o_totalprice), 2) AS rev
        |FROM {{ ref('stg_orders') }} o
        |JOIN {{ source('raw', 'customer') }} c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment
        |""".stripMargin)
    write(root.resolve("models/marts/order_log.sql"),
      """{{ config(materialized='incremental', unique_key='o_orderkey', schema='dbtmart') }}
        |SELECT o_orderkey, o_orderdate, o_totalprice
        |FROM {{ source('raw', 'orders') }}
        |WHERE o_orderdate BETWEEN @start_dt AND @end_dt
        |{% if is_incremental() %}
        |  AND o_orderkey NOT IN (SELECT o_orderkey FROM {{ this }})
        |{% endif %}
        |""".stripMargin)
    write(root.resolve("models/disabled.sql"),
      "{{ config(enabled=false) }}\nSELECT 1 AS x\n")
    write(root.resolve("seeds/segments.csv"),
      "seg_code,seg_name\nBUILDING,Construction\nMACHINERY,Industrial\n")
    write(root.resolve("snapshots/cust_snap.sql"),
      """{% snapshot customer_snapshot %}
        |{{ config(strategy='timestamp', unique_key='c_custkey', updated_at='c_updated') }}
        |SELECT c_custkey, c_mktsegment, c_acctbal,
        |       TIMESTAMP '1995-01-01 00:00:00' AS c_updated
        |FROM raw.customer
        |{% endsnapshot %}
        |""".stripMargin)
    root.toString
  }

  test("config blocks map to the reference's kinds (dbt model.py:272)") {
    val p = DbtLoader.loadProject(makeProject())
    assert(p.name == "analytics")
    val byName = p.models.map(m => m.name -> m).toMap
    assert(byName("dbtstg.stg_orders").kind == ModelKind.View)
    assert(byName("dbtmart.seg_revenue").kind == ModelKind.Full)
    assert(byName("dbtmart.seg_revenue").tags == Seq("finance"))
    assert(byName("dbtmart.order_log").kind ==
      ModelKind.IncrementalByUniqueKey(uniqueKey = Seq("o_orderkey")))
    assert(byName("analytics.segments").kind.isInstanceOf[ModelKind.Seed])
    byName("analytics.customer_snapshot").kind match {
      case k: ModelKind.ScdType2ByTime =>
        assert(k.uniqueKey == Seq("c_custkey") && k.updatedAtCol == "c_updated")
      case other => fail(s"expected SCD2-by-time, got $other")
    }
    assert(!byName.contains("analytics.disabled"))
    assert(p.sources.map(_.relation).toSet == Set("raw.orders", "raw.customer"))
    assert(p.vars("cutoff") == "1995-02-01")
    // schema.yml column tests became audits (dbt test → builtin mapping)
    assert(byName("dbtstg.stg_orders").audits.toSet == Set(
      "unique_values" -> Map("columns" -> "o_orderkey"),
      "not_null" -> Map("columns" -> "o_orderkey")))
    val segAudits = byName("dbtmart.seg_revenue").audits.toMap[String, Map[String, String]]
    assert(segAudits("accepted_values")("column") == "c_mktsegment")
    assert(segAudits("accepted_values")("is_in").contains("'AUTOMOBILE'"))
    // relationships `to: ref(...)` resolved to the full model name
    assert(byName("dbtmart.order_log").audits.toMap[String, Map[String, String]].apply("relationships") ==
      Map("column" -> "o_orderkey", "to" -> "dbtstg.stg_orders", "field" -> "o_orderkey"))
  }

  test("dbt project plans and applies end-to-end; is_incremental() guards") {
    val ctx = new GraftContext(spark, SparkTestSession.tmpDir("dbtws"), concurrency = 2)
    ctx.addExternal("raw.orders", s"$sf/orders.parquet")
    ctx.addExternal("raw.customer", s"$sf/customer.parquet")
    val srcs = ctx.loadDbtProject(makeProject())
    assert(srcs.nonEmpty)

    ctx.apply(ctx.plan("prod", dayMs("1995-01-01"), dayMs("1995-01-15")))

    // staging view + mart: equal to the direct query
    val expected = spark.sql(
      s"""SELECT c.c_mktsegment, count(*) AS n, round(sum(o.o_totalprice), 2) AS rev
         |FROM parquet.`$sf/orders.parquet` o
         |JOIN parquet.`$sf/customer.parquet` c ON o.o_custkey = c.c_custkey
         |WHERE o.o_orderdate < TIMESTAMP '1995-02-01'
         |GROUP BY c.c_mktsegment""".stripMargin).collect().toSet
    assert(spark.table("dbtmart.seg_revenue").collect().toSet == expected)

    // seed loaded
    assert(spark.table("analytics.segments").count() == 2)

    // SCD2 snapshot materialized with managed validity columns
    val snapCols = spark.table("analytics.customer_snapshot").columns.toSet
    assert(snapCols.contains("valid_from") && snapCols.contains("valid_to"))

    // incremental guard: first window inserted; a second run over a window
    // overlapping the first must not duplicate keys (NOT IN {{ this }})
    val after1 = spark.table("dbtmart.order_log").count()
    assert(after1 > 0)
    ctx.run("prod", dayMs("1995-01-01"), dayMs("1995-01-25"))
    val log = spark.table("dbtmart.order_log")
    assert(log.count() == log.select("o_orderkey").distinct().count())
    assert(log.count() >= after1)
  }

  test("project {% macro %}s and dbt_utils render through plan/apply") {
    val root = java.nio.file.Files.createTempDirectory("dbt_macros")
    write(root.resolve("dbt_project.yml"), "name: macroproj\n")
    write(root.resolve("macros/util.sql"),
      """{% macro money(col, scale=2) %}round({{ col }}, {{ scale }}){% endmacro %}
        |{% macro seg_filter(seg) %}c_mktsegment = '{{ seg }}'{% endmacro %}
        |""".stripMargin)
    write(root.resolve("models/cust_keys.sql"),
      """{{ config(materialized='table', schema='dbtm') }}
        |SELECT {{ dbt_utils.generate_surrogate_key(['c_custkey', 'c_nationkey']) }} AS sk,
        |  {{ money(c_acctbal) }} AS bal
        |FROM {{ source('raw', 'customer') }}
        |WHERE {{ seg_filter('BUILDING') }}
        |""".stripMargin)
    val ctx = new GraftContext(spark, SparkTestSession.tmpDir("dbtws-m"), concurrency = 2)
    ctx.addExternal("raw.customer", s"$sf/customer.parquet")
    ctx.loadDbtProject(root.toString)
    ctx.apply(ctx.plan("prod", 0L, D))

    val got = spark.table("dbtm.cust_keys")
    val expected = spark.sql(
      s"""SELECT MD5(CONCAT(COALESCE(CAST(c_custkey AS STRING), '_graft_null_'), '|',
         |    COALESCE(CAST(c_nationkey AS STRING), '_graft_null_'))) AS sk,
         |  round(c_acctbal, 2) AS bal
         |FROM parquet.`$sf/customer.parquet`
         |WHERE c_mktsegment = 'BUILDING'""".stripMargin)
    assert(got.count() > 0)
    assert(got.collect().toSet == expected.collect().toSet)
  }

  test("macros: whitespace calls detected; only referenced defs prepended") {
    // ADVICE r05: `{{ money (x) }}` must still find the macro, and editing an
    // UNRELATED macro must not change this model's body (fingerprint) — the
    // reference hashes only referenced macros into the data hash
    val root = java.nio.file.Files.createTempDirectory("dbt_macro_refs")
    write(root.resolve("dbt_project.yml"), "name: refproj\n")
    write(root.resolve("macros/money.sql"),
      "{% macro money(col, scale=2) %}round({{ col }}, {{ scale }}){% endmacro %}\n" +
      "{% macro money_usd(col) %}{{ money(col, 2) }}{% endmacro %}\n")
    write(root.resolve("macros/unrelated.sql"),
      "{% macro unrelated(x) %}upper({{ x }}){% endmacro %}\n")
    write(root.resolve("models/bal.sql"),
      """{{ config(materialized='table', schema='dbtm2') }}
        |SELECT {{ money_usd (c_acctbal) }} AS bal FROM {{ source('raw', 'customer') }}
        |""".stripMargin)
    def bodyOf(p: DbtLoader.DbtProject): String =
      p.models.find(_.name == "dbtm2.bal").get.body match {
        case SqlBody(sql) => sql
        case other        => fail(s"expected SqlBody, got $other")
      }
    val b1 = bodyOf(DbtLoader.loadProject(root.toString))
    // transitive: money_usd calls money, both prepended; unrelated is not
    assert(b1.contains("macro money(") && b1.contains("macro money_usd("))
    assert(!b1.contains("unrelated"))
    // editing the unreferenced macro leaves the model body byte-identical
    write(root.resolve("macros/unrelated.sql"),
      "{% macro unrelated(x) %}lower({{ x }}){% endmacro %}\n")
    assert(bodyOf(DbtLoader.loadProject(root.toString)) == b1)
    // and the whitespace call renders through plan/apply
    val ctx = new GraftContext(spark, SparkTestSession.tmpDir("dbtws-r"), concurrency = 2)
    ctx.addExternal("raw.customer", s"$sf/customer.parquet")
    ctx.loadDbtProject(root.toString)
    ctx.apply(ctx.plan("prod", 0L, D))
    assert(spark.table("dbtm2.bal").count() > 0)
  }

  test("schema.yml tests for one model MERGE across files (no last-wins drop)") {
    val root = java.nio.file.Files.createTempDirectory("dbt_twofiles")
    write(root.resolve("dbt_project.yml"), "name: twoproj\n")
    write(root.resolve("models/m.sql"),
      """{{ config(materialized='table', schema='twom') }}
        |SELECT 1 AS id, 'x' AS v
        |""".stripMargin)
    write(root.resolve("models/a_tests.yml"),
      """models:
        |  - name: m
        |    columns:
        |      - name: id
        |        tests: [not_null]
        |""".stripMargin)
    write(root.resolve("models/b_tests.yml"),
      """models:
        |  - name: m
        |    columns:
        |      - name: v
        |        tests: [not_null]
        |""".stripMargin)
    val ctx = new GraftContext(spark, SparkTestSession.tmpDir("dbtws-t"))
    ctx.loadDbtProject(root.toString)
    val audits = ctx.model("twom.m").audits
    val cols = audits.collect { case ("not_null", args) => args("columns") }.toSet
    assert(cols == Set("id", "v"), s"expected both files' tests, got $audits")
  }

  test("vendored dbt_utils: the INSTALLED package wins over the native builtin") {
    // r17 precedence flip (dbt semantics): a vendored package macro IS the
    // implementation — qualified calls rewrite onto it even when a native
    // builtin shares the name; natives remain the no-package fallback
    // (mk_dbt_utils_spine_pivot et al. exercise that path). The r11 concern
    // stands in its new form: the bare pass must not re-capture the already
    // rewritten call and emit dbt_utils__dbt_utils__...( broken SQL.
    val root = java.nio.file.Files.createTempDirectory("dbt_vendored_utils")
    write(root.resolve("dbt_project.yml"), "name: vproj\n")
    write(root.resolve("dbt_packages/dbt_utils/dbt_project.yml"), "name: dbt_utils\n")
    write(root.resolve("dbt_packages/dbt_utils/macros/surrogate_key.sql"),
      "{% macro generate_surrogate_key(flds) %}'vendored_ran' {% endmacro %}\n" +
      "{% macro star(rel) %}vendored_star{% endmacro %}\n")
    write(root.resolve("models/keys.sql"),
      """{{ config(materialized='table', schema='dbtv') }}
        |SELECT {{ dbt_utils.generate_surrogate_key(['c_custkey', 'c_nationkey']) }} AS sk
        |FROM {{ source('raw', 'customer') }}
        |""".stripMargin)
    write(root.resolve("models/schema.yml"),
      "sources:\n  - name: raw\n    tables:\n      - name: customer\n")
    val proj = DbtLoader.loadProject(root.toString)
    val body = proj.models.find(_.name == "dbtv.keys").get.body match {
      case SqlBody(sql) => sql
      case other        => fail(s"expected SqlBody, got $other")
    }
    assert(body.contains("dbt_utils__generate_surrogate_key("), body)
    assert(!body.contains("dbt_utils__dbt_utils__"),
      s"bare pass re-captured an already-qualified call: $body")
    assert(!body.contains("dbt_utils.generate_surrogate_key("), body)
    // and the VENDORED implementation renders end-to-end
    val ctx = new GraftContext(spark, SparkTestSession.tmpDir("dbtws-v"), concurrency = 2)
    ctx.addExternal("raw.customer", s"$sf/customer.parquet")
    ctx.loadDbtProject(root.toString)
    ctx.apply(ctx.plan("prod", 0L, D))
    val got = spark.table("dbtv.keys")
    assert(got.count() > 0)
    assert(got.filter(!org.apache.spark.sql.functions
      .col("sk").contains("vendored_ran")).isEmpty,
      "native builtin ran instead of the installed package's macro")
  }

  test("package seeds land in the profile's target schema; cross-pkg qualified calls survive") {
    val root = java.nio.file.Files.createTempDirectory("dbt_pkg_seed")
    write(root.resolve("dbt_project.yml"), "name: sproj\nprofile: sproj\n")
    write(root.resolve("profiles.yml"),
      """sproj:
        |  target: dev
        |  outputs:
        |    dev:
        |      type: spark
        |      schema: tgt
        |""".stripMargin)
    write(root.resolve("dbt_packages/util_a/dbt_project.yml"), "name: util_a\n")
    // util_a's macro calls util_b's QUALIFIED — the intra-package bare
    // rename must leave `util_b.twice(` intact for the qualified pass
    // (ADVICE r11: \\b matched after the '.', mangling it to util_b.util_a__…;
    // util_a ALSO defines its own `twice` to force the collision)
    write(root.resolve("dbt_packages/util_a/macros/quad.sql"),
      "{% macro twice(c) %}({{ c }} * 2){% endmacro %}\n" +
      "{% macro quad(c) %}{{ util_b.twice(c) }} * 2{% endmacro %}\n")
    write(root.resolve("dbt_packages/util_a/seeds/rates.csv"), "code,rate\nUS,2\n")
    write(root.resolve("dbt_packages/util_b/dbt_project.yml"), "name: util_b\n")
    write(root.resolve("dbt_packages/util_b/macros/twice.sql"),
      "{% macro twice(c) %}({{ c }} + {{ c }}){% endmacro %}\n")
    write(root.resolve("models/quads.sql"),
      """{{ config(materialized='table') }}
        |SELECT {{ util_a.quad(3) }} AS q
        |""".stripMargin)
    val proj = DbtLoader.loadProject(root.toString)
    // dbt materializes package seeds into the target schema, like project seeds
    assert(proj.models.exists(m => m.name == "tgt.rates" &&
      m.kind.isInstanceOf[ModelKind.Seed]),
      s"package seed not in target schema: ${proj.models.map(_.name)}")
    val body = proj.models.find(_.name == "tgt.quads").get.body match {
      case SqlBody(sql) => sql
      case other        => fail(s"expected SqlBody, got $other")
    }
    assert(body.contains("util_b__twice("), body)
    assert(!body.contains("util_b.util_a__"), s"cross-pkg qualified call mangled: $body")
    // and the chain renders: util_b's twice (3 + 3), quad'd * 2 = 12
    val ctx2 = new GraftContext(spark, SparkTestSession.tmpDir("dbtws-x"), concurrency = 2)
    ctx2.loadDbtProject(root.toString)
    ctx2.apply(ctx2.plan("prod", 0L, D))
    assert(spark.table("tgt.quads").head.getInt(0) == 12)
  }

  test("aliased models keep their file-stem unique_id in dbt artifacts") {
    // ADVICE r11: dbt's unique_id/name use the RESOURCE (file-stem) name;
    // alias only changes the relation. An aliased model must cross-reference
    // dbt-generated artifacts by stem, with the alias in the alias field.
    val root = java.nio.file.Files.createTempDirectory("dbt_alias_art")
    write(root.resolve("dbt_project.yml"), "name: aproj\n")
    write(root.resolve("models/orders_base.sql"),
      """{{ config(materialized='table', schema='dbta', alias='orders_current') }}
        |SELECT 1 AS one
        |""".stripMargin)
    val proj = DbtLoader.loadProject(root.toString)
    val m = proj.models.find(_.name == "dbta.orders_current").get
    assert(proj.stemOf == Map("dbta.orders_current" -> "orders_base"), proj.stemOf)
    val dir = SparkTestSession.tmpDir("dbt-alias-art")
    DbtArtifacts.writeManifest(dir, proj.name, proj.models, Nil,
      proj.pkgOf, proj.stemOf)
    val mf = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, "target", "manifest.json")))
    val node = mf.path("nodes").path("model.aproj.orders_base")
    assert(!node.isMissingNode, mf.path("nodes").toString.take(300))
    assert(node.path("name").asText == "orders_base")
    assert(node.path("alias").asText == "orders_current")
    assert(node.path("schema").asText == "dbta")
    assert(mf.path("nodes").path("model.aproj.orders_current").isMissingNode,
      "alias leaked into the node id")
  }

  test("generic-test kwargs: YAML lists/objects become jinja literals, not ''") {
    // ADVICE r16: Jackson asText() is "" for container nodes — a custom
    // accepted_values-style test with `values: [a, b]` must receive the list
    val root = java.nio.file.Files.createTempDirectory("dbt_listargs")
    write(root.resolve("dbt_project.yml"), "name: laproj\n")
    write(root.resolve("macros/tests.sql"),
      """{% test in_set(model, column_name, values) %}
        |SELECT * FROM {{ model }} WHERE {{ column_name }} NOT IN (
        |{% for v in values %}'{{ v }}'{{ ',' if not loop.last }}{% endfor %})
        |{% endtest %}
        |""".stripMargin)
    write(root.resolve("models/schema.yml"),
      """models:
        |  - name: statuses
        |    columns:
        |      - name: st
        |        tests:
        |          - in_set:
        |              values: [F, O, P]
        |""".stripMargin)
    write(root.resolve("models/statuses.sql"),
      "{{ config(materialized='table', schema='la') }}\nSELECT 'F' AS st\n")
    val proj = DbtLoader.loadProject(root.toString)
    val sql = proj.models.head.audits.collectFirst {
      case ("generic_sql", args) => args("sql") }.get
    assert(sql.contains("'F'") && sql.contains("'O'") && sql.contains("'P'"), sql)
    assert(sql.replaceAll("\\s+", " ").contains("NOT IN ( 'F','O','P')"), sql)
  }

  test("generic-test column binds as a literal, immune to var-name collision") {
    // ADVICE r16: an unquoted column arg resolves through the evaluator's
    // var lookup first — a column named like a project var substitutes the
    // var's value and renders the test against the wrong expression
    val root = java.nio.file.Files.createTempDirectory("dbt_colcollide")
    write(root.resolve("dbt_project.yml"),
      "name: ccproj\nvars:\n  rev: some_other_column\n")
    write(root.resolve("macros/tests.sql"),
      """{% test positive(model, column_name) %}
        |SELECT * FROM {{ model }} WHERE {{ column_name }} <= 0
        |{% endtest %}
        |""".stripMargin)
    write(root.resolve("models/schema.yml"),
      """models:
        |  - name: m1
        |    columns:
        |      - name: rev
        |        tests: [positive]
        |""".stripMargin)
    write(root.resolve("models/m1.sql"),
      "{{ config(materialized='table', schema='cc') }}\nSELECT 1.0 AS rev\n")
    val proj = DbtLoader.loadProject(root.toString)
    val sql = proj.models.head.audits.collectFirst {
      case ("generic_sql", args) => args("sql") }.get
    assert(sql.contains("WHERE rev <= 0"), sql)
    assert(!sql.contains("some_other_column"), sql)
  }

  test("adapter.dispatch without namespace finds package implementations") {
    // ADVICE r16: dbt's macro namespace is global — a bare dispatch('m')
    // must reach a package's pkg__spark__m, not just project-level spark__m
    val root = java.nio.file.Files.createTempDirectory("dbt_dispatch_global")
    write(root.resolve("dbt_project.yml"), "name: dgproj\n")
    write(root.resolve("dbt_packages/helpers/dbt_project.yml"), "name: helpers\n")
    write(root.resolve("dbt_packages/helpers/macros/money.sql"),
      """{% macro money(x) %}{{ return(adapter.dispatch('money')(x)) }}{% endmacro %}
        |{% macro spark__money(x) %}round({{ x }}, 2){% endmacro %}
        |""".stripMargin)
    write(root.resolve("models/m1.sql"),
      """{{ config(materialized='table', schema='dg') }}
        |SELECT {{ helpers.money('1.2345') }} AS v
        |""".stripMargin)
    val proj = DbtLoader.loadProject(root.toString)
    val body = proj.models.head.body.asInstanceOf[graft.core.SqlBody].sql
    // render the body standalone: the dispatch must resolve to the package's
    // spark__money even though the call names no macro_namespace
    val rendered = graft.macros.Jinja.render(body, proj.vars)
    assert(rendered.contains("round(1.2345, 2)"), rendered)
  }
}
