package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.macros.MacroEvaluator
import QueryUtil._

/** Macro-system coverage (SURVEY §2.4): each entry renders its body through
  * [[MacroEvaluator]] — the same pipeline model bodies go through — and
  * executes the resulting Spark SQL. Oracles replicate the *expanded* SQL in
  * DuckDB dialect, so a macro-expansion regression shows up as a hash
  * mismatch, not just a unit-test failure.
  */
object MacroQueries {

  private val D = 86400000L
  // fixed interval for deterministic time-variable rendering:
  // [1995-01-01, 1995-02-01), executed 1995-06-01
  private val start = 9131L * D
  private val end = start + 31L * D
  private val exec = start + 151L * D

  private def render(spark: SparkSession, dir: String, body: String): DataFrame = {
    registerAll(spark, dir)
    val schemaOf: String => Seq[(String, String)] = { name =>
      if (tables.contains(name))
        spark.table(name).schema.fields.toSeq.map(f => f.name -> f.dataType.sql)
      else Nil
    }
    val ev = new MacroEvaluator(start, end, exec, None, Map("seg" -> "'BUILDING'"), schemaOf)
    spark.sql(ev.render(body))
  }

  private def entry(body: String, duckSql: String): Entry =
    Entry((s, dir) => render(s, dir, body), Some(duckSql))

  val entries: Map[String, Entry] = Map(

    "m_time_vars" -> entry(
      """SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n, round(sum(o_totalprice), 2) AS rev
        |FROM orders WHERE o_orderdate BETWEEN @start_dt AND @end_dt
        |GROUP BY 1 ORDER BY 1""".stripMargin,
      """SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n, round(sum(o_totalprice), 2) AS rev
        |FROM orders WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
        |  AND TIMESTAMP '1995-01-31 23:59:59.999'
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    "m_surrogate_key" -> entry(
      """SELECT c_custkey, @GENERATE_SURROGATE_KEY(c_custkey, c_name, c_mktsegment) AS sk
        |FROM customer ORDER BY c_custkey LIMIT 100""".stripMargin,
      """SELECT c_custkey, MD5(CONCAT(
        |  COALESCE(CAST(c_custkey AS VARCHAR), '_sqlmesh_surrogate_key_null_'), '|',
        |  COALESCE(CAST(c_name AS VARCHAR), '_sqlmesh_surrogate_key_null_'), '|',
        |  COALESCE(CAST(c_mktsegment AS VARCHAR), '_sqlmesh_surrogate_key_null_'))) AS sk
        |FROM customer ORDER BY c_custkey LIMIT 100""".stripMargin),

    "m_pivot" -> entry(
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
        |  @PIVOT(o_orderstatus, ['F', 'O', 'P'])
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),

    "m_deduplicate" -> entry(
      """SELECT user_id, event_type, event_id
        |FROM @DEDUPLICATE(events, [user_id, event_type], [ts DESC, event_id DESC])
        |ORDER BY user_id, event_type""".stripMargin,
      """SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) d
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin),

    "m_date_spine" -> entry(
      """SELECT spine.date_day AS d, count(o_orderkey) AS n
        |FROM @DATE_SPINE(day, '1995-01-01', '1995-01-31') spine
        |LEFT JOIN orders ON CAST(o_orderdate AS DATE) = spine.date_day
        |GROUP BY 1 ORDER BY 1""".stripMargin,
      """SELECT spine.date_day AS d, count(o_orderkey) AS n
        |FROM (SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-01-31',
        |  INTERVAL 1 DAY)) AS DATE) AS date_day) spine
        |LEFT JOIN orders ON CAST(o_orderdate AS DATE) = spine.date_day
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    "m_safe_math" -> entry(
      """SELECT c_nationkey,
        |  round(@SAFE_DIV(sum(c_acctbal), nullif(count(*), 0)), 2) AS avg_bal,
        |  round(@SAFE_ADD(max(c_acctbal), min(c_acctbal)), 2) AS extremes
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
      """SELECT c_nationkey,
        |  round(sum(c_acctbal) / nullif(nullif(count(*), 0), 0), 2) AS avg_bal,
        |  round(CASE WHEN max(c_acctbal) IS NULL AND min(c_acctbal) IS NULL THEN NULL
        |    ELSE COALESCE(max(c_acctbal), 0) + COALESCE(min(c_acctbal), 0) END, 2) AS extremes
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),

    "m_haversine" -> entry(
      // synthetic coordinates derived from keys — exercises the formula
      """SELECT n_nationkey,
        |  round(@HAVERSINE_DISTANCE(n_nationkey * 2.5 - 30, n_regionkey * 50.0 - 100,
        |    10.5, 42.0), 2) AS dist_mi
        |FROM nation ORDER BY n_nationkey""".stripMargin,
      """SELECT n_nationkey,
        |  round(2 * 3961 * ASIN(SQRT(POWER(SIN(RADIANS((10.5 - (n_nationkey * 2.5 - 30)) / 2)), 2) +
        |    COS(RADIANS(n_nationkey * 2.5 - 30)) * COS(RADIANS(10.5)) *
        |    POWER(SIN(RADIANS((42.0 - (n_regionkey * 50.0 - 100)) / 2)), 2))) * 1.0, 2) AS dist_mi
        |FROM nation ORDER BY n_nationkey""".stripMargin),

    "m_star_union" -> entry(
      """SELECT n_nationkey, n_name, n_regionkey FROM (@UNION('distinct', nation, nation))
        |ORDER BY n_nationkey""".stripMargin,
      """SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey""".stripMargin),

    "m_star" -> entry(
      "SELECT @STAR(nation) FROM nation ORDER BY n_nationkey",
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"),

    "m_var_filter" -> entry(
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE c_mktsegment = @VAR('seg') @IF(1 > 2, AND 1 = 0)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
    "m_reduce_filter" -> entry(
      // @FILTER keeps multiples of 3, @REDUCE folds them at render time, @AND
      // drops NULL branches — all resolved before Catalyst sees the query
      """SELECT c_mktsegment, count(*) AS n,
        |  @REDUCE(@FILTER([3, 6, 9, 12], x -> x % 3 = 0), (a, b) -> a + b) AS const_sum
        |FROM customer WHERE @AND(c_acctbal > -1000, NULL, c_custkey > 0)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      """SELECT c_mktsegment, count(*) AS n, 30 AS const_sum
        |FROM customer WHERE c_acctbal > -1000 AND c_custkey > 0
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    "m_def_macro" -> entry(
      // user-defined @DEF macro (MacroDef; macros.py @DEF registry)
      """@DEF(bucket, x -> CASE WHEN x < 1000 THEN 'low' WHEN x < 5000 THEN 'mid' ELSE 'high' END)
        |SELECT @bucket(c_acctbal) AS tier, count(*) AS n
        |FROM customer GROUP BY 1 ORDER BY tier""".stripMargin,
      """SELECT CASE WHEN c_acctbal < 1000 THEN 'low' WHEN c_acctbal < 5000 THEN 'mid'
        |  ELSE 'high' END AS tier, count(*) AS n
        |FROM customer GROUP BY 1 ORDER BY tier""".stripMargin),

    "m_each_quartiles" -> entry(
      """SELECT o_orderpriority,
        |  @EACH([25, 50, 75], q -> round(percentile(o_totalprice, @EVAL(q / 100.0)), 2) AS p_@{q})
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.25), 2) AS p_25,
        |  round(quantile_cont(o_totalprice, 0.50), 2) AS p_50,
        |  round(quantile_cont(o_totalprice, 0.75), 2) AS p_75
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // jinja blocks (dbt compat, dialect.py:57-66): var() + for + if expand
    // BEFORE the @-macro pass; the interval bound still comes from @start_dt
    "m_jinja" -> entry(
      """SELECT o_orderstatus,
        |  {% for c in [o_totalprice, o_orderkey] %}
        |    {% if c == 'o_totalprice' %}round(sum({{ c }}), 2){% else %}max({{ c }}) {% endif %} AS agg_{{ loop.index }},
        |  {% endfor %}
        |  count(*) AS n
        |FROM orders
        |WHERE o_orderdate >= @start_dt AND o_orderstatus <> {{ var('skip_status', "'X'") }}
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
      """SELECT o_orderstatus,
        |  round(sum(o_totalprice), 2) AS agg_1,
        |  max(o_orderkey) AS agg_2,
        |  count(*) AS n
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderstatus <> 'X'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // @OR drops NULL branches like @AND (macros.py and_/or_); the expansion
    // is what Catalyst sees, so the oracle replicates the expanded predicate
    "m_and_or" -> entry(
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE @OR(c_mktsegment = 'BUILDING', NULL, c_mktsegment = 'MACHINERY')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE c_mktsegment = 'BUILDING' OR c_mktsegment = 'MACHINERY'
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // @RESOLVE_TEMPLATE / @this_model interpolation (macros.py:1372) — the
    // template resolves against the model under evaluation
    "m_resolve_template" -> Entry((s, dir) => {
      registerAll(s, dir)
      val ev = new MacroEvaluator(start, end, exec, thisModel = Some("orders"))
      s.sql(ev.render(
        """SELECT o_orderstatus, count(*) AS n
          |FROM @RESOLVE_TEMPLATE('@this_model')
          |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))
    }, Some(
      """SELECT o_orderstatus, count(*) AS n FROM orders
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // user Scala macro registry (the reference's Python @macro() registry,
    // macros.py:592): a host-language macro generating SQL at render time
    "m_scala_macro" -> Entry((s, dir) => {
      registerAll(s, dir)
      val ev = new MacroEvaluator(start, end, exec, None,
        registry = Map("TOP_N_BY" -> { args =>
          val Seq(table, col0, n) = args.take(3)
          s"(SELECT * FROM $table ORDER BY $col0 DESC, c_custkey LIMIT $n)"
        }))
      s.sql(ev.render(
        """SELECT c_custkey, round(c_acctbal, 2) AS bal
          |FROM @TOP_N_BY(customer, c_acctbal, 5) ORDER BY c_custkey""".stripMargin))
    }, Some(
      """SELECT c_custkey, round(c_acctbal, 2) AS bal
        |FROM (SELECT * FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 5)
        |ORDER BY c_custkey""".stripMargin)),
  )
}
