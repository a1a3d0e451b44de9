package graft.macros

import org.scalatest.funsuite.AnyFunSuite

class MacroSpec extends AnyFunSuite {
  private val D = 86400000L
  // [2024-01-01, 2024-01-03) daily interval, executed 2024-01-05
  private val start = 19723L * D
  private def ev(vars: Map[String, String] = Map.empty) =
    new MacroEvaluator(start, start + 2 * D, start + 4 * D,
      thisModel = Some("phys.tbl"), variables = vars,
      schemaOf = {
        case "src" => Seq("id" -> "BIGINT", "name" -> "STRING")
        case _     => Nil
      })

  test("time variables render reference formats; end is inclusive") {
    val e = ev()
    assert(e.render("@start_ds") == "'2024-01-01'")
    assert(e.render("@end_ds") == "'2024-01-02'") // end-1ms date
    assert(e.render("@start_date") == "DATE '2024-01-01'")
    assert(e.render("@execution_ds") == "'2024-01-05'")
    assert(e.render("@start_epoch") == (start / 1000).toString)
    assert(e.render("@start_millis") == start.toString)
    assert(e.render("x BETWEEN @start_ds AND @end_ds") ==
      "x BETWEEN '2024-01-01' AND '2024-01-02'")
  }

  test("@this_model resolves to the physical table") {
    assert(ev().render("SELECT * FROM @this_model") == "SELECT * FROM phys.tbl")
  }

  test("@EACH maps a lambda over a list") {
    // whole-identifier substitution only (x_int is a distinct identifier,
    // exactly as in the reference's AST-based lambdas)
    assert(ev().render("@EACH([a, b, c], x -> CAST(x AS INT) AS x_int)") ==
      "CAST(a AS INT) AS x_int, CAST(b AS INT) AS x_int, CAST(c AS INT) AS x_int")
    assert(ev().render("@EACH([1, 2], x -> col_x)") == "col_x, col_x")
  }

  test("@IF with const condition keeps/drops branches") {
    assert(ev().render("@IF(1 > 0, keep_me, drop_me)") == "keep_me")
    assert(ev().render("@IF(1 > 2, keep_me, drop_me)") == "drop_me")
    assert(ev().render("@IF(1 > 2, keep_me)") == "")
  }

  test("@REDUCE and @FILTER and @EVAL do macro-time computation") {
    assert(ev().render("@REDUCE([1, 2, 3, 4], (a, b) -> a + b)") == "10")
    assert(ev().render("@FILTER([1, 2, 3], x -> x > 1)") == "[2, 3]")
    assert(ev().render("@EVAL(7 * 6)") == "42")
  }

  test("@STAR expands typed casts from schema") {
    assert(ev().render("SELECT @STAR(src) FROM src") ==
      "SELECT CAST(`src`.`id` AS BIGINT) AS `id`, CAST(`src`.`name` AS STRING) AS `name` FROM src")
  }

  test("@GENERATE_SURROGATE_KEY emits md5(concat(coalesce…)) (macros.py:936)") {
    val got = ev().render("@GENERATE_SURROGATE_KEY(a, b)")
    assert(got == "MD5(CONCAT(COALESCE(CAST(a AS STRING), '_sqlmesh_surrogate_key_null_'), " +
      "'|', COALESCE(CAST(b AS STRING), '_sqlmesh_surrogate_key_null_')))")
  }

  test("@SAFE_ADD/@SAFE_SUB/@SAFE_DIV null semantics (macros.py:978-1026)") {
    assert(ev().render("@SAFE_ADD(a, b)") ==
      "CASE WHEN a IS NULL AND b IS NULL THEN NULL ELSE COALESCE(a, 0) + COALESCE(b, 0) END")
    assert(ev().render("@SAFE_DIV(a, b)") == "(a) / NULLIF((b), 0)")
  }

  test("@PIVOT builds conditional aggregates (macros.py:1145)") {
    assert(ev().render("@PIVOT(status, ['done', 'open'])") ==
      "SUM(CASE WHEN status = 'done' THEN 1 ELSE 0 END) AS `done`, " +
        "SUM(CASE WHEN status = 'open' THEN 1 ELSE 0 END) AS `open`")
  }

  test("@AND/@OR filter NULL branches (macros.py:1194)") {
    assert(ev().render("@AND(a > 1, NULL, b < 2)") == "(a > 1) AND (b < 2)")
    assert(ev().render("@OR(NULL)") == "TRUE")
  }

  test("@DEDUPLICATE emits row_number pattern (macros.py:1240)") {
    val got = ev().render("@DEDUPLICATE(my_tbl, [id], [ts DESC])")
    assert(got.contains("ROW_NUMBER() OVER (PARTITION BY id ORDER BY ts DESC)"))
    assert(got.contains("FROM my_tbl"))
  }

  test("@DATE_SPINE emits sequence+explode (macros.py:1297)") {
    val got = ev().render("@DATE_SPINE(day, '2024-01-01', '2024-01-05')")
    assert(got.contains("sequence(DATE '2024-01-01', DATE '2024-01-05', INTERVAL 1 day)"))
  }

  test("@VAR looks up config variables") {
    assert(ev(Map("answer" -> "42")).render("@VAR('answer')") == "42")
    assert(ev().render("@VAR('missing', 0)") == "0")
  }

  test("@DEF registers a reusable macro") {
    val e = ev()
    val out = e.render("@DEF(plus_one, x -> x + 1) SELECT @plus_one(a)")
    assert(out.trim == "SELECT a + 1")
  }

  test("@HAVERSINE_DISTANCE formula (macros.py:1103)") {
    val got = ev().render("@HAVERSINE_DISTANCE(lat1, lon1, lat2, lon2)")
    assert(got.startsWith("2 * 3961 * ASIN(SQRT("))
  }

  test("@UNION casts by name across tables") {
    val got = ev().render("@UNION('all', src, src)")
    assert(got == "SELECT CAST(`id` AS BIGINT) AS `id`, CAST(`name` AS STRING) AS `name` FROM src" +
      " UNION ALL SELECT CAST(`id` AS BIGINT) AS `id`, CAST(`name` AS STRING) AS `name` FROM src")
  }

  test("macros inside string literals are not expanded") {
    assert(ev().render("SELECT '@start_ds'") == "SELECT '@start_ds'")
  }

  test("@STAR supports except/prefix/suffix (macros.py:853)") {
    val schemaOf: String => Seq[(String, String)] =
      n => if (n == "t") Seq("a" -> "INT", "b" -> "STRING", "c" -> "DOUBLE") else Nil
    val ev = new MacroEvaluator(0, 1, 2, None, Map.empty, schemaOf)
    assert(ev.render("@STAR(t, x, [b], pre_, _suf)") ==
      "CAST(`x`.`a` AS INT) AS `pre_a_suf`, CAST(`x`.`c` AS DOUBLE) AS `pre_c_suf`")
  }

  test("user Scala macros register and expand (the Python @macro() analog)") {
    val ev = new MacroEvaluator(0, 1, 2, None, Map.empty, _ => Nil,
      registry = Map("top_n" -> { args =>
        s"(SELECT * FROM ${args(0)} ORDER BY ${args(1)} DESC LIMIT ${args(2)})"
      }))
    assert(ev.render("SELECT * FROM @TOP_N(orders, o_totalprice, 10)") ==
      "SELECT * FROM (SELECT * FROM orders ORDER BY o_totalprice DESC LIMIT 10)")
  }

  test("jinja: var(), this, if/elif/else, for, set (dbt compat)") {
    val e = ev(Map("env" -> "prod", "limit" -> "10"))
    assert(e.render("SELECT * FROM t LIMIT {{ var('limit') }}") ==
      "SELECT * FROM t LIMIT 10")
    assert(e.render("{{ var('missing', 42) }}") == "42")
    assert(e.render("INSERT INTO {{ this }}") == "INSERT INTO phys.tbl")
    assert(e.render(
      "{% if var('env') == 'prod' %}full{% else %}sampled{% endif %}") == "full")
    assert(e.render(
      "{% if var('env') == 'dev' %}a{% elif var('limit') > 5 %}b{% else %}c{% endif %}") == "b")
    assert(e.render(
      "{% for c in [a, b] %}sum({{ c }}) AS {{ c }}_{{ loop.index }},{% endfor %}") ==
      "sum(a) AS a_1,sum(b) AS b_2,")
    assert(e.render("{% set n = 2 + 3 %}LIMIT {{ n }}") == "LIMIT 5")
    // jinja first, then the native @-macro pass over the expansion
    assert(e.render("{% if var('env') == 'prod' %}@start_ds{% endif %}") == "'2024-01-01'")
    // nested if inside for
    assert(e.render(
      "{% for c in [a, b] %}{% if c == 'a' %}[{{ c }}]{% else %}{{ c }}{% endif %}{% endfor %}") ==
      "[a]b")
  }

  test("jinja: ref()/source() dbt relation references") {
    val e = ev()
    // full names pass through; source() is the external table
    assert(e.render("SELECT * FROM {{ ref('raw.orders') }}") == "SELECT * FROM raw.orders")
    assert(e.render("SELECT * FROM {{ source('raw', 'orders') }}") == "SELECT * FROM raw.orders")
    // short names resolve through the injected resolver
    val withResolver = new MacroEvaluator(start, start + 2 * D, start + 4 * D,
      Some("phys.tbl"),
      refResolver = n => if (n == "orders") "raw.orders" else n)
    assert(withResolver.render("FROM {{ ref('orders') }} o") == "FROM raw.orders o")
    // dependency extraction sees through both call forms
    assert(graft.core.Model.extractTables(
      "SELECT * FROM {{ ref('raw.orders') }} JOIN {{ source('raw', 'nation') }} USING (k)") ==
      Set("raw.orders", "raw.nation"))
  }

  test("jinja: {% macro %} definitions, defaults, kwargs, dbt_utils subset") {
    val e = ev(Map("env" -> "prod"))
    // inline definition + call; definition itself emits nothing
    assert(e.render(
      """{% macro money(col, scale=2) %}round({{ col }}, {{ scale }}){% endmacro %}
        |SELECT {{ money(price) }}, {{ money(qty, 0) }}""".stripMargin).trim ==
      "SELECT round(price, 2), round(qty, 0)")
    // keyword args and nested macro-in-macro calls
    assert(e.render(
      """{% macro tag(v) %}'{{ v }}'{% endmacro %}
        |{% macro pair(a, b='x') %}({{ tag(a) }}, {{ tag(b) }}){% endmacro %}
        |{{ pair(b='z', a='y') }}""".stripMargin).trim == "('y', 'z')")
    // macro body sees vars and control flow
    assert(e.render(
      """{% macro guard(c) %}{% if var('env') == 'prod' %}{{ c }}{% else %}1=1{% endif %}{% endmacro %}
        |WHERE {{ guard(d > 5) }}""".stripMargin).trim == "WHERE d > 5")
    // parseMacros extracts definitions without rendering
    val defs = Jinja.parseMacros(
      "{% macro a(x) %}A{{ x }}{% endmacro %}{% macro b() %}B{% endmacro %}")
    assert(defs.keySet == Set("a", "b"))
    // supplied environment is callable from another template
    assert(Jinja.render("{{ a(1) }}-{{ b() }}", Map.empty, macros = defs) == "A1-B")
    // dbt_utils subset
    assert(e.render("{{ dbt_utils.generate_surrogate_key(['a', 'b']) }}") ==
      "MD5(CONCAT(COALESCE(CAST(a AS STRING), '_graft_null_'), '|', " +
        "COALESCE(CAST(b AS STRING), '_graft_null_')))")
    assert(e.render("{{ dbt_utils.safe_divide(rev, n) }}") == "(rev) / NULLIF((n), 0)")
    assert(e.render("{{ dbt_utils.hash(email) }}") == "MD5(CAST(email AS STRING))")
    assert(e.render("SELECT {{ dbt_utils.star(from=ref('t'), except=['secret']) }} FROM t") ==
      "SELECT * EXCEPT (secret) FROM t")
    assert(e.render("{{ dbt_utils.concat(['a', 'b']) }}") == "CONCAT(a, b)")
  }

  test("jinja: whitespace control strips around {%- -%} and {{- -}}") {
    val e = ev(Map("env" -> "prod"))
    assert(e.render("a   {%- if true %}   b{% endif %}") == "a   b")
    assert(e.render("a {%- if true -%}   b   {%- endif -%}  c") == "abc")
    // loop bodies collapse to single-spaced output, the dbt idiom
    assert(e.render(
      "{% for c in [x, y] %}{{ c }},{%- endfor %}").trim == "x,y,")
    assert(e.render("SELECT {{- ' a ' -}} FROM t") == "SELECT a FROM t")
  }

  test("jinja: {% call %} block body reaches the macro via caller()") {
    val e = ev(Map.empty)
    val src =
      """{% macro wrap(tag) %}<{{ tag }}>{{ caller() }}</{{ tag }}>{% endmacro %}
        |{% call wrap('b') %}hello {{ 'world' }}{% endcall %}""".stripMargin
    assert(e.render(src).trim == "<b>hello world</b>")
    // nested call blocks: inner caller() sees the inner body
    val nested =
      """{% macro w1() %}[{{ caller() }}]{% endmacro %}
        |{% macro w2() %}({{ caller() }}){% endmacro %}
        |{% call w1() %}{% call w2() %}x{% endcall %}{% endcall %}""".stripMargin
    assert(e.render(nested).trim == "[(x)]")
    // caller() outside a call block is an error
    intercept[IllegalArgumentException](e.render(
      "{% macro m() %}{{ caller() }}{% endmacro %}{{ m() }}"))
  }

  test("jinja: dbt_utils date_spine / pivot / union_relations") {
    val e = ev(Map.empty)
    assert(e.render(
      "{{ dbt_utils.date_spine('day', \"CAST('2020-01-01' AS DATE)\", \"CAST('2020-01-04' AS DATE)\") }}") ==
      "SELECT explode(sequence(CAST(CAST('2020-01-01' AS DATE) AS TIMESTAMP), " +
        "CAST(CAST('2020-01-04' AS DATE) AS TIMESTAMP) - INTERVAL 1 day, INTERVAL 1 day)) AS date_day")
    assert(e.render("{{ dbt_utils.pivot('seg', ['A', 'B']) }}") ==
      "sum(CASE WHEN seg = 'A' THEN 1 ELSE 0 END) AS A, " +
        "sum(CASE WHEN seg = 'B' THEN 1 ELSE 0 END) AS B")
    assert(e.render(
      "{{ dbt_utils.pivot('seg', ['A-1'], agg='count', prefix='p_', then_value=seg) }}") ==
      "count(CASE WHEN seg = 'A-1' THEN seg ELSE 0 END) AS p_A_1")
    assert(e.render("{{ dbt_utils.union_relations([raw.a, raw.b]) }}") ==
      "SELECT * FROM raw.a UNION ALL SELECT * FROM raw.b")
    // the emitted spine SQL actually runs on Spark
    val spark = graft.SparkTestSession.spark
    val n = spark.sql(e.render(
      "{{ dbt_utils.date_spine('day', \"DATE'2020-01-01'\", \"DATE'2020-01-04'\") }}")).count()
    assert(n == 3)
  }

  test("jinja: dbt_utils deduplicate and get_column_values") {
    val e = ev(Map.empty)
    assert(e.render(
      "{{ dbt_utils.deduplicate(ref('raw.orders'), partition_by='user_id', order_by='ts desc') }}") ==
      "SELECT * EXCEPT (_graft_rn) FROM (SELECT *, ROW_NUMBER() OVER " +
        "(PARTITION BY user_id ORDER BY ts desc) AS _graft_rn FROM raw.orders) " +
        "WHERE _graft_rn = 1")
    // get_column_values without a catalog hook fails loudly
    intercept[IllegalArgumentException](
      e.render("{{ dbt_utils.get_column_values(ref('m'), 'cat') }}"))
    // with a hook: feeds {% for %} loops and pivot(values=...) like dbt
    val hook = Some((rel: String, col: String, max: Int) => {
      assert(rel == "raw.m" && col == "cat" && max == 2)
      Seq("A", "B")
    })
    val rendered = Jinja.render(
      "{% for v in dbt_utils.get_column_values(ref('m'), 'cat', max_records=2) %}[{{ v }}]{% endfor %}",
      Map.empty, refResolver = n => if (n == "m") "raw.m" else n,
      columnValues = hook)
    assert(rendered == "[A][B]")
    // values drive pivot: the classic get_column_values → pivot pairing
    val piv = Jinja.render(
      """{% set segs = dbt_utils.get_column_values(ref('m'), 'cat', max_records=2) %}
        |SELECT {{ dbt_utils.pivot('cat', segs) }} FROM raw.m""".stripMargin,
      Map.empty, refResolver = n => if (n == "m") "raw.m" else n,
      columnValues = hook).trim
    assert(piv == "SELECT sum(CASE WHEN cat = 'A' THEN 1 ELSE 0 END) AS A, " +
      "sum(CASE WHEN cat = 'B' THEN 1 ELSE 0 END) AS B FROM raw.m")
    // live-catalog path end-to-end: count-desc ordering, value tie-break
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    Seq("x", "y", "y", "z", "z").toDF("cat").createOrReplaceTempView("gcv_t")
    val live = graft.plans.Renderer.catalogColumnValues(spark, Map("m" -> "gcv_t"))
    assert(live.get("m", "cat", 10) == Seq("y", "z", "x"))
    assert(live.get("m", "cat", 2) == Seq("y", "z"))
  }

  test("jinja: unbalanced pseudo-calls fail loudly; whitespace calls work") {
    val e = ev(Map.empty)
    // ADVICE r05: `money(a) > money(b)` starts with a macro name and ends in
    // ')' — the greedy call regex used to bind args from `a) > money(b` and
    // render wrong SQL; now it must fall through to the error path
    val src = "{% macro money(c) %}round({{ c }}, 2){% endmacro %}{{ money(a) > money(b) }}"
    intercept[IllegalArgumentException](e.render(src))
    // a real call still works, including whitespace before the paren
    assert(e.render(
      "{% macro money(c) %}round({{ c }}, 2){% endmacro %}{{ money (a) }}") ==
      "round(a, 2)")
    // nested balanced parens inside args are fine
    assert(e.render(
      "{% macro money(c) %}round({{ c }}, 2){% endmacro %}{{ money(coalesce(a, 0)) }}") ==
      "round(coalesce(a, 0), 2)")
  }

  test("jinja: filter pipeline (upper/lower/replace/default/round/int ...)") {
    val e = ev(Map("env" -> "prod", "name" -> "west coast"))
    assert(e.render("{{ var('env') | upper }}") == "PROD")
    assert(e.render("{{ name | title }}") == "West Coast")
    assert(e.render("{{ var('env') | replace('ro', 'la') }}") == "plad")
    assert(e.render("{{ var('missing', '') | default('fallback') }}") == "fallback")
    assert(e.render("{{ var('env') | default('x') }}") == "prod")
    assert(e.render("{{ name | length }}") == "10")
    assert(e.render("{% set v = 3.14159 %}{{ v | round(2) }}") == "3.14")
    assert(e.render("{% set v = 7.9 %}{{ v | int }}") == "7")
    assert(e.render("{{ var('env') | upper | replace('P', 'B') }}") == "BROD")
    // || is SQL concat, never a filter split
    assert(e.render("{% macro cc(x) %}{{ x }}{% endmacro %}{{ cc(a || b) }}") == "a || b")
  }

  test("jinja: for-loop over a var()-supplied list") {
    val e = ev(Map("cols" -> "[o_orderkey, o_custkey]"))
    assert(e.render("{% for c in var('cols') %}max({{ c }}) AS m_{{ c }},{% endfor %}") ==
      "max(o_orderkey) AS m_o_orderkey,max(o_custkey) AS m_o_custkey,")
    // set-binding as the iterable works the same way
    assert(e.render("{% set xs = ['a', 'b'] %}{% for x in xs %}{{ x }};{% endfor %}") ==
      "a;b;")
  }

  test("jinja: return() halts the macro — conditional early return, body discarded") {
    // dbt's return() makes the CALL evaluate to the returned value and
    // SKIPS the rest of the body: the classic conditional-early-return
    // shape must not concatenate the fallback path's output
    val t = """{% macro m(flag) %}{% if flag == 'y' %}{{ return('*') }}{% endif %}FALLBACK{% endmacro %}"""
    assert(Jinja.render(t + "{{ m('y') }}", Map.empty) == "*")
    assert(Jinja.render(t + "{{ m('n') }}", Map.empty) == "FALLBACK")
    // text accumulated BEFORE the return is discarded — the value IS the call
    assert(Jinja.render(
      "{% macro r() %}garbage {{ return(42) }} more{% endmacro %}{{ r() }}",
      Map.empty) == "42")
    // nested: inner macro's return stops only the inner macro
    assert(Jinja.render(
      "{% macro inner() %}{{ return('I') }}{% endmacro %}" +
        "{% macro outer() %}[{{ inner() }}]{% endmacro %}{{ outer() }}",
      Map.empty) == "[I]")
    // top-level return is a named error, like dbt
    val e2 = intercept[IllegalArgumentException] {
      Jinja.render("{{ return(1) }}", Map.empty)
    }
    assert(e2.getMessage.contains("outside a macro"))
  }

  test("jinja: {% test %} blocks register as test_* macros") {
    val defs = Jinja.parseMacros(
      "{% test positive(model, column_name) %}SELECT * FROM {{ model }} WHERE {{ column_name }} < 0{% endtest %}")
    assert(defs.keySet == Set("test_positive"))
    assert(Jinja.render(
      "{% test positive(model, column_name) %}SELECT * FROM {{ model }} WHERE {{ column_name }} < 0{% endtest %}" +
        "{{ test_positive(t1, amount) }}", Map.empty) ==
      "SELECT * FROM t1 WHERE amount < 0")
  }

  test("jinja: {% do %}, log(), exceptions.raise_compiler_error()") {
    // do: effect only, emits nothing; log: stderr, renders empty
    assert(Jinja.render("a{% do log('hi') %}b", Map.empty) == "ab")
    assert(Jinja.render("x{{ log('msg') }}y", Map.empty) == "xy")
    // raise_compiler_error: the dbt package guard-clause idiom
    val e = intercept[IllegalArgumentException] {
      Jinja.render(
        "{% macro g(x) %}{% if x == 'bad' %}{% do exceptions.raise_compiler_error(x) %}{% endif %}OK{% endmacro %}{{ g('bad') }}",
        Map.empty)
    }
    assert(e.getMessage.contains("bad"))
    assert(Jinja.render(
      "{% macro g(x) %}{% if x == 'bad' %}{% do exceptions.raise_compiler_error('no') %}{% endif %}OK{% endmacro %}{{ g('fine') }}",
      Map.empty) == "OK")
  }

  test("jinja: adapter.dispatch resolves spark__ over default__ across namespaces") {
    val t =
      "{% macro default__money(x) %}round({{ x }}, 1){% endmacro %}" +
        "{% macro spark__money(x) %}CAST(round({{ x }}, 2) AS DOUBLE){% endmacro %}" +
        "{% macro money(x) %}{{ return(adapter.dispatch('money')(x)) }}{% endmacro %}"
    assert(Jinja.render(t + "{{ money('sum(v)') }}", Map.empty) ==
      "CAST(round(sum(v), 2) AS DOUBLE)")
    // default__ only: the fallback chain lands there
    val d = "{% macro default__only(x) %}D:{{ x }}{% endmacro %}"
    assert(Jinja.render(
      d + "{{ adapter.dispatch('only')('q') }}", Map.empty) == "D:q")
    // no implementation at all is a named error
    val e3 = intercept[IllegalArgumentException] {
      Jinja.render("{{ adapter.dispatch('ghost')(1) }}", Map.empty)
    }
    assert(e3.getMessage.contains("ghost"))
  }
}
