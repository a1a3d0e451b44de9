package graft.macros

import org.scalatest.funsuite.AnyFunSuite

/** The jinja EXPRESSION subset dbt packages actually use (reference renders
  * through real jinja2, utils/jinja.py; here the python-ish value surface is
  * re-implemented in ConstEval + Jinja): container literals with methods,
  * `~` concat, `in`, arithmetic, indexing, range(), namespace(), tuple
  * unpacking, inline conditionals, loop metadata, `is defined` — pinned by
  * macro files copied BYTE-IDENTICAL from the reference's dbt fixtures
  * (tests/fixtures/dbt/sushi_test/macros/). */
class JinjaExprSpec extends AnyFunSuite {

  private def r(t: String, vars: Map[String, String] = Map.empty): String =
    Jinja.render(t, vars)

  // ------------------------------------------------- verbatim fixture files

  /** Byte-identical copy of the reference fixture
    * tests/fixtures/dbt/sushi_test/macros/incremental.sql — exercises
    * `is defined`, list-literal return with bound identifiers, indexing
    * (`dates[0]`), `==` on strings, and `~` concat in the raise branch. */
  private val incrementalFixture =
    """{% macro incremental_by_time(col, time_type) %}
      |    {% if is_incremental() %}
      |    WHERE
      |        {{ col }} > (select max({{ col }}) from {{ this }})
      |    {% endif %}
      |    {% if sqlmesh_incremental is defined %}
      |    {% set dates = incremental_dates_by_time_type(time_type) %}
      |    WHERE
      |        {{ col }} BETWEEN '{{ dates[0] }}' AND '{{ dates[1] }}'
      |    {% endif %}
      |{% endmacro %}
      |
      |{% macro incremental_dates_by_time_type(time_type) %}
      |    {% if time_type == 'ds' %}
      |        {{ return([start_ds, end_ds]) }}
      |    {% elif time_type == 'ts' %}
      |        {{ return([start_ts, end_ts]) }}
      |    {% elif time_type == 'epoch' %}
      |        {{ return([start_epoch, end_epoch]) }}
      |    {% elif time_type == 'millis' %}
      |        {{ return([start_millis, end_millis]) }}
      |    {% elif time_type == 'date' %}
      |        {{ return([start_date, end_date]) }}
      |    {% else %}
      |        {{ exceptions.raise_compiler_error("Unknown time type: " ~time_type) }}
      |    {% endif %}
      |{% endmacro %}
      |""".stripMargin

  test("verbatim fixture incremental.sql renders (sqlmesh mode: is defined + indexing)") {
    val vars = Map(
      "sqlmesh_incremental" -> "True",
      "start_ds" -> "2024-01-01", "end_ds" -> "2024-01-31",
      "is_incremental" -> "false")
    val out = Jinja.render(
      incrementalFixture + "{{ incremental_by_time('event_ds', 'ds') }}",
      vars, thisModel = Some("db.tbl"))
    val sql = out.replaceAll("\\s+", " ").trim
    assert(sql == "WHERE event_ds BETWEEN '2024-01-01' AND '2024-01-31'", sql)
  }

  test("verbatim fixture incremental.sql: dbt mode (is_incremental, no sqlmesh vars)") {
    val out = Jinja.render(
      incrementalFixture + "{{ incremental_by_time('ds_col', 'ds') }}",
      Map("is_incremental" -> "true"), thisModel = Some("db.t"))
    val sql = out.replaceAll("\\s+", " ").trim
    assert(sql == "WHERE ds_col > (select max(ds_col) from db.t)", sql)
  }

  test("verbatim fixture incremental.sql: unknown time type raises with ~ concat") {
    val ex = intercept[IllegalArgumentException] {
      Jinja.render(
        incrementalFixture + "{{ incremental_by_time('c', 'bogus') }}",
        Map("sqlmesh_incremental" -> "True", "is_incremental" -> "false"),
        thisModel = Some("db.t"))
    }
    assert(ex.getMessage.contains("Unknown time type: bogus"), ex.getMessage)
  }

  /** Byte-identical copy of tests/fixtures/dbt/sushi_test/macros/log_value.sql. */
  test("verbatim fixture log_value.sql renders (~ concat inside log())") {
    val out = r(
      "{% macro log_value(v) %}\n    {{ log(\"Entered value is: \" ~ v) }}\n{% endmacro %}" +
        "{{ log_value(42) }}x")
    assert(out.trim == "x") // log renders to nothing; must not throw
  }

  /** dbt_utils group_by, verbatim from dbt-labs/dbt-utils
    * (macros/sql/groupby.sql) — exercises adapter.dispatch, range() with
    * arithmetic (`n + 1`), and the `{{ ',' if not loop.last }}` inline
    * conditional. */
  test("verbatim dbt_utils group_by(n) renders") {
    val groupBy =
      """{%- macro group_by(n) -%}
        |    {{ return(adapter.dispatch('group_by', 'dbt_utils')(n)) }}
        |{% endmacro %}
        |
        |{%- macro default__group_by(n) -%}
        |    group by {% for i in range(1, n + 1) %}
        |    {{ i }}{{ ',' if not loop.last }} {% endfor %}
        |{%- endmacro -%}
        |""".stripMargin
    val out = r(groupBy + "{{ group_by(3) }}").replaceAll("\\s+", " ").trim
    assert(out == "group by 1, 2, 3", out)
  }

  // ------------------------------------------------------ expression depth

  test("list building: set [] / do append / join filter") {
    val t =
      """{% set out = [] %}
        |{% for m in ['a', 'b', 'c'] %}
        |{% do out.append("select '" ~ m ~ "' as id") %}
        |{% endfor %}
        |{{ out | join('\nunion all\n') }}""".stripMargin
    val sql = r(t).trim
    assert(sql ==
      "select 'a' as id\nunion all\nselect 'b' as id\nunion all\nselect 'c' as id", sql)
  }

  test("empty list is falsy; non-empty truthy") {
    assert(r("{% set xs = [] %}{% if xs %}Y{% else %}N{% endif %}") == "N")
    assert(r("{% set xs = [1] %}{% if xs %}Y{% else %}N{% endif %}") == "Y")
  }

  test("namespace(): attribute set inside a for loop survives the loop") {
    val t =
      """{% set ns = namespace(found=false, hits=0) %}
        |{% for x in [1, 5, 3] %}
        |{% if x > 2 %}{% set ns.found = true %}{% set ns.hits = ns.hits + 1 %}{% endif %}
        |{% endfor %}
        |{{ 'FOUND ' ~ ns.hits if ns.found else 'NONE' }}""".stripMargin
    assert(r(t).trim == "FOUND 2")
  }

  test("dict literals: items() tuple unpacking, keys(), get()") {
    val t = "{% set cfg = {'a': 1, 'b': 2} %}" +
      "{% for k, v in cfg.items() %}{{ k }}={{ v }};{% endfor %}"
    assert(r(t) == "a=1;b=2;")
    assert(r("{% set d = {'x': 'v'} %}{{ d.get('x') }}|{{ d.get('missing', 'dflt') }}") == "v|dflt")
    assert(r("{% set d = {'x': 1, 'y': 2} %}{{ d.keys() | join(',') }}") == "x,y")
  }

  test("in / not in membership") {
    assert(r("{% if 'b' in ['a', 'b'] %}Y{% endif %}") == "Y")
    assert(r("{% if 'z' not in ['a', 'b'] %}Y{% endif %}") == "Y")
    assert(r("{% if 'bc' in 'abcd' %}Y{% endif %}") == "Y")
    assert(r("{% if 'k' in {'k': 1} %}Y{% endif %}") == "Y")
  }

  test("arithmetic, floor division, indexing, negative index") {
    assert(r("{{ 7 // 2 }}") == "3")
    assert(r("{{ (3 + 4) * 2 }}") == "14")
    assert(r("{% set xs = ['x', 'y', 'z'] %}{{ xs[0] }}{{ xs[-1] }}") == "xz")
  }

  test("string methods: upper/split/startswith; ','.join(list)") {
    assert(r("{{ 'ab_cd'.split('_') | join('-') }}") == "ab-cd")
    assert(r("{% if 'events_raw'.startswith('events') %}Y{% endif %}") == "Y")
    assert(r("{% set xs = ['a', 'b'] %}{{ ', '.join(xs) }}") == "a, b")
  }

  test("loop metadata: index0, first, last, length") {
    val t = "{% for x in ['a','b','c'] %}" +
      "{{ loop.index0 }}{{ '<' if loop.first }}{{ '>' if loop.last }}{% endfor %}|" +
      "{% for x in ['q'] %}{{ loop.length }}{% endfor %}"
    assert(r(t) == "0<12>|1")
  }

  test("{% set x %} block form binds the rendered body") {
    val t = "{% set frag %}select {{ 1 + 1 }} as n{% endset %}[{{ frag }}]"
    assert(r(t) == "[select 2 as n]")
  }

  test("inline conditional never swallows raw SQL fragments containing ' if '") {
    // non-constant condition → the ternary does NOT engage
    val raw = "drop table if exists t"
    assert(r(s"{% set x = '$raw' %}{{ x }}") == raw)
  }

  test("is defined / is not defined / is none") {
    assert(r("{% if q is defined %}Y{% else %}N{% endif %}") == "N")
    assert(r("{% set q = 1 %}{% if q is defined %}Y{% endif %}") == "Y")
    assert(r("{% if q is not defined %}Y{% endif %}") == "Y")
    assert(r("{% if q is none %}Y{% endif %}") == "Y")
    assert(r("{% set q = 'v' %}{% if q is not none %}Y{% endif %}") == "Y")
  }

  test("execute is True during render (dbt parse/execute flag)") {
    assert(r("{% if execute %}Y{% endif %}") == "Y")
  }

  test("filters: length/first/last/unique/sort on lists") {
    assert(r("{% set xs = [3, 1, 2, 1] %}{{ xs | length }}") == "4")
    assert(r("{% set xs = ['b', 'a'] %}{{ xs | sort | first }}") == "a")
    assert(r("{% set xs = [1, 1, 2] %}{{ xs | unique | length }}") == "2")
  }

  test("tuple unpacking over a list of pairs") {
    val t = "{% for a, b in [('x', 1), ('y', 2)] %}{{ a }}:{{ b }} {% endfor %}"
    assert(r(t).trim == "x:1 y:2")
  }

  test("list concat with + and string concat with ~ of numbers") {
    assert(r("{% set xs = [1] + [2, 3] %}{{ xs | length }}") == "3")
    assert(r("{{ 'n=' ~ 5 }}") == "n=5")
  }

  // ------------------------- adapter.get_columns_in_relation (r17) --------

  private val fakeSchema: String => Seq[(String, String)] = {
    case "raw.nation" => Seq("n_nationkey" -> "INT", "n_name" -> "STRING")
    case _            => Nil
  }

  test("get_columns_in_relation: column dicts loop with attr access") {
    val t = """{%- set cols = adapter.get_columns_in_relation(source('raw', 'nation')) -%}
              |{% for col in cols %}{{ col.quoted }} AS {{ col.name }}_{{ col.dtype }}{{ ',' if not loop.last }} {% endfor %}""".stripMargin
    val out = Jinja.render(t, Map.empty, schemaOf = fakeSchema)
    assert(out.trim == "`n_nationkey` AS n_nationkey_int, `n_name` AS n_name_string")
  }

  test("get_columns_in_relation: resolves a macro-parameter binding") {
    val t = """{% macro sel(relation) %}{%- set cols = adapter.get_columns_in_relation(relation) -%}{{ cols | length }}{% endmacro %}{{ sel(source('raw', 'nation')) }}"""
    assert(Jinja.render(t, Map.empty, schemaOf = fakeSchema).trim == "2")
  }

  test("get_columns_in_relation: fails loudly without a live catalog") {
    val t = "{{ adapter.get_columns_in_relation(source('raw', 'nation')) }}"
    val e = intercept[IllegalArgumentException] { Jinja.render(t, Map.empty) }
    assert(e.getMessage.contains("no columns"))
  }
}
