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

  // ----------------- adapter.quote / flags.WHICH / map filter (r17) -------

  test("adapter.quote backticks identifiers, idempotently, in loops") {
    assert(r("{{ adapter.quote('order') }}") == "`order`")
    assert(r("{{ adapter.quote('pre_' ~ 'col') }}") == "`pre_col`")
    val t = "{% for c in ['a', 'b'] %}{{ adapter.quote(c) }}{{ ',' if not loop.last }}{% endfor %}"
    assert(r(t) == "`a`,`b`")
    // quoting column dicts' already-backticked .quoted passes through
    val t2 = """{%- set cols = adapter.get_columns_in_relation(source('raw', 'nation')) -%}
               |{{ adapter.quote(cols[0].quoted) }}""".stripMargin
    assert(Jinja.render(t2, Map.empty, schemaOf = fakeSchema).trim == "`n_nationkey`")
  }

  test("flags.WHICH defaults to run and branches like dbt packages expect") {
    assert(r("{{ flags.WHICH }}") == "run")
    assert(r("{% if flags.WHICH == 'compile' %}C{% else %}R{% endif %}") == "R")
    assert(Jinja.render("{{ flags.WHICH }}", Map("flags.WHICH" -> "compile")) == "compile")
  }

  // ------------------- run_query / statement / load_result (r17) ----------

  private val fakeEngine: Option[String => (Seq[String], Seq[Seq[Any]])] =
    Some {
      case sql if sql.toLowerCase.contains("count") =>
        (Seq("status", "n"), Seq(Seq("F", java.lang.Long.valueOf(3L)),
          Seq("O", java.lang.Long.valueOf(7L))))
      case _ => (Seq("v"), Seq(Seq(java.lang.Integer.valueOf(42))))
    }

  test("run_query: agate-shaped table — columns/rows/data all read") {
    def rq(t: String) = Jinja.render(t, Map.empty, runQuery = fakeEngine).trim
    assert(rq("{% set r = run_query('select count(*) from t group by 1') %}" +
      "{{ r.columns[0].values() | join(',') }}") == "F,O")
    assert(rq("{% set r = run_query('select count(*) from t group by 1') %}" +
      "{{ r.rows[0].values()[1] }}") == "3")
    assert(rq("{% set r = run_query('select count(*) from t group by 1') %}" +
      "{{ r.rows[1]['status'] }}:{{ r.rows[1].n }}") == "O:7")
    assert(rq("{% set r = run_query('select 42') %}" +
      "{{ r.data | map(attribute=0) | list | join(';') }}") == "42")
    assert(rq("{% set r = run_query('select count(*) from t group by 1') %}" +
      "{{ r.column_names | join('|') }}") == "status|n")
  }

  test("statement/load_result: the dbt get_column_values shape end-to-end") {
    val t = """{%- call statement('vals', fetch_result=true) %}
              |  select status, count(*) from t group by 1
              |{%- endcall -%}
              |{%- set value_list = load_result('vals') -%}
              |{%- if value_list and value_list['data'] -%}
              |{%- set values = value_list['data'] | map(attribute=0) | list %}
              |{{ values | join(', ') }}
              |{%- endif -%}""".stripMargin
    assert(Jinja.render(t, Map.empty, runQuery = fakeEngine).trim == "F, O")
    // a never-run statement loads as None (dbt parity)
    assert(Jinja.render("{% if load_result('nope') is none %}NONE{% endif %}",
      Map.empty, runQuery = fakeEngine).trim == "NONE")
  }

  test("verbatim dbt_utils get_single_value renders untouched") {
    // byte-identical to dbt-labs/dbt-utils macros/sql/get_single_value.sql
    // (the dispatch wrapper is exercised through the package loader in
    // mk_dbt_run_query; here the default__ impl runs directly)
    val macroSrc =
      """{% macro default__get_single_value(query, default) %}
        |
        |  {# This macro returns the (0, 0) record in a query, i.e. the first row of the first column #}
        |
        |    {%- call statement('get_query_result', fetch_result=True, auto_begin=false) -%}
        |
        |        {{ query }}
        |
        |    {%- endcall -%}
        |
        |    {%- if execute -%}
        |
        |        {% set r = load_result('get_query_result').table.columns[0].values() %}
        |        {% if r | length == 0 %}
        |            {% do print('No records selected from get_single_value statement.') %}
        |            {% set sql_result = default %}
        |        {% else %}
        |            {% set sql_result = r[0] %}
        |        {% endif %}
        |
        |    {%- else -%}
        |
        |        {% set sql_result = default %}
        |
        |    {%- endif -%}
        |
        |    {% do return(sql_result) %}
        |
        |{% endmacro %}
        |""".stripMargin
    val t = macroSrc +
      "{{ default__get_single_value('select max(x) from t', -1) }}"
    assert(Jinja.render(t, Map.empty, runQuery = fakeEngine).trim == "42")
  }

  // --------------- relation objects / filter-in-condition (r17) -----------

  test("relation args are mapping-shaped objects that print as names") {
    val t = """{% macro probe(rel) %}{{ rel is mapping }}|{{ rel.identifier }}|{{ rel.schema }}|{{ rel.metadata.get('type', '') }}|{{ rel }}|{{ 'from ' ~ rel }}{% endmacro %}{{ probe(source('raw', 'nation')) }}"""
    assert(Jinja.render(t, Map.empty).trim ==
      "TRUE|nation|raw|BaseRelation|raw.nation|from raw.nation")
    // the _is_relation guard shape passes on a relation and trips on a string
    val guard = """{% macro g(obj) %}{%- if not (obj is mapping and obj.get('metadata', {}).get('type', '').endswith('Relation')) -%}{{ exceptions.raise_compiler_error('expected a Relation, got: ' ~ obj) }}{%- endif -%}OK{% endmacro %}"""
    assert(Jinja.render(guard + "{{ g(ref('m')) }}", Map.empty).trim == "OK")
    val e = intercept[IllegalArgumentException] {
      Jinja.render(guard + "{{ g('just_a_string') }}", Map.empty)
    }
    assert(e.getMessage.contains("expected a Relation"))
  }

  test("filter chains inside conditions evaluate (both branches)") {
    // before the fix `cols|length <= 0` was unevaluable -> silently FALSE,
    // so the empty branch could never fire
    assert(r("{% set cols = [] %}{% if cols|length <= 0 %}EMPTY{% else %}N{% endif %}") == "EMPTY")
    assert(r("{% set cols = ['a'] %}{% if cols|length <= 0 %}E{% else %}NONEMPTY{% endif %}") == "NONEMPTY")
    assert(r("{% set except = ['N_A'] | map('lower') | list %}" +
      "{% if 'n_a' | lower not in except %}MISS{% else %}HIT{% endif %}") == "HIT")
    // `||` must not be parsed as a filter chain
    assert(r("{{ 'a' if 1 == 1 or 2 == 2 }}") == "a")
  }

  test("run_query without a live engine fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Jinja.render("{{ run_query('select 1') }}", Map.empty)
    }
    assert(e.getMessage.contains("no live engine"))
  }

  test("map filter: named filter per element and attribute pluck") {
    assert(r("{{ ['Ab', 'CD'] | map('lower') | list | join(',') }}") == "ab,cd")
    // the get_filtered_columns_in_relation idiom: lowercase an except-list
    assert(r("{% set except = ['N_NAME'] | map('lower') | list %}" +
      "{% if 'n_name' in except %}HIT{% endif %}") == "HIT")
    val t = """{%- set cols = adapter.get_columns_in_relation(source('raw', 'nation')) -%}
              |{{ cols | map(attribute='name') | list | join(', ') }}""".stripMargin
    assert(Jinja.render(t, Map.empty, schemaOf = fakeSchema).trim == "n_nationkey, n_name")
  }
}
