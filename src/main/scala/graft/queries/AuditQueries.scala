package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.audits.Audits
import QueryUtil._

/** Audit-operator coverage (SURVEY §2.5): each entry renders a built-in audit
  * template via [[Audits]] against real tables (with violations present) and
  * aggregates the violation set deterministically; the oracle replicates the
  * audit SQL in DuckDB. All 29 templates are unit-tested in AuditsSpec; the
  * entries here hash-check the families with data-dependent math (z-score,
  * KL, chi-square, windows, ranges) cross-engine.
  *
  * Dialect note: Spark LOG() is natural log, DuckDB LOG() is log10 — oracles
  * use ln().
  */
object AuditQueries {

  private def audit(name: String, table: String, args: Map[String, String],
                    wrap: DataFrame => DataFrame = identity,
                    prep: (SparkSession, String) => Unit = (s, dir) => registerAll(s, dir))
      : QueryFn = (s, dir) => {
    prep(s, dir)
    wrap(Audits.run(s, name, table, args))
  }

  val entries: Map[String, Entry] = Map(

    "a_regex_patterns" -> Entry(
      // match_regex_pattern_list: docs whose text matches none of the patterns
      audit("match_regex_pattern_list", "documents",
        Map("column" -> "text", "patterns" -> "'^[A-Z]'"),
        _.selectExpr("count(*) AS n_viol", "min(doc_id) AS first_doc")),
      Some(
        """SELECT count(*) AS n_viol, min(doc_id) AS first_doc
          |FROM documents WHERE NOT regexp_matches(text, '^[A-Z]')""".stripMargin)),

    "a_like_patterns" -> Entry(
      audit("not_match_like_pattern_list", "part",
        Map("column" -> "p_type", "patterns" -> "'%BRUSHED%', '%POLISHED%'"),
        _.groupBy("p_type").count().orderBy("p_type")),
      Some(
        """SELECT p_type, count(*) AS count FROM part
          |WHERE p_type LIKE '%BRUSHED%' OR p_type LIKE '%POLISHED%'
          |GROUP BY p_type ORDER BY p_type""".stripMargin)),

    "a_relationships" -> Entry(
      // referential check with REAL violations: every 10th custkey referenced
      // by orders is hidden from the parent side
      audit("relationships", "orders",
        Map("column" -> "o_custkey", "field" -> "c_custkey",
          "to" -> "(SELECT * FROM customer WHERE c_custkey % 10 != 0)"),
        _.selectExpr("count(*) AS n_viol", "min(o_orderkey) AS first_order")),
      Some(
        """SELECT count(*) AS n_viol, min(o_orderkey) AS first_order
          |FROM orders WHERE o_custkey IS NOT NULL AND o_custkey NOT IN
          |  (SELECT c_custkey FROM customer
          |   WHERE c_custkey % 10 != 0 AND c_custkey IS NOT NULL)""".stripMargin)),

    "a_not_constant" -> Entry(
      // passes (distinct > 1) → zero violation rows, shape still hash-checked
      audit("not_constant", "orders", Map("column" -> "o_orderstatus"),
        _.selectExpr("count(*) AS n_viol")),
      Some(
        """SELECT count(*) AS n_viol FROM (
          |  SELECT count(DISTINCT o_orderstatus) AS cnt FROM orders
          |  HAVING count(DISTINCT o_orderstatus) <= 1)""".stripMargin)),

    "a_string_length" -> Entry(
      audit("string_length_between", "nation",
        Map("column" -> "n_name", "min_v" -> "5", "max_v" -> "12"),
        _.orderBy("n_nationkey")),
      Some(
        """SELECT * FROM nation WHERE length(n_name) < 5 OR length(n_name) > 12
          |ORDER BY n_nationkey""".stripMargin)),

    "a_stddev_in_range" -> Entry(
      // stddev outside [0, 10] → the one summary row is the violation
      audit("stddev_in_range", "orders",
        Map("column" -> "o_totalprice", "min_v" -> "0", "max_v" -> "10"),
        _.selectExpr("round(stddev_o_totalprice, 2) AS sd")),
      Some(
        """SELECT round(sd, 2) AS sd FROM (
          |  SELECT stddev(o_totalprice) AS sd FROM orders) WHERE sd < 0 OR sd > 10""".stripMargin)),

    "a_sequential_gap" -> Entry(
      // orderkeys are NOT gap-free → violations are the gap edges
      audit("sequential_values", "orders", Map("column" -> "o_orderkey"),
        _.selectExpr("count(*) AS n_gaps", "min(o_orderkey) AS first_gap_end",
          "max(o_orderkey) AS last_gap_end")),
      Some(
        """SELECT count(*) AS n_gaps, min(o_orderkey) AS first_gap_end,
          |  max(o_orderkey) AS last_gap_end
          |FROM (
          |  SELECT o_orderkey, lag(o_orderkey) OVER (ORDER BY o_orderkey) AS prv
          |  FROM orders)
          |WHERE NOT (o_orderkey = prv + 1)""".stripMargin)),

    "a_accepted_range" -> Entry(
      audit("accepted_range", "customer",
        Map("column" -> "c_acctbal", "min_v" -> "0", "max_v" -> "9000"),
        _.selectExpr("count(*) AS n_viol", "round(min(c_acctbal), 2) AS min_bal",
          "round(max(c_acctbal), 2) AS max_bal")),
      Some(
        """SELECT count(*) AS n_viol, round(min(c_acctbal), 2) AS min_bal,
          |  round(max(c_acctbal), 2) AS max_bal
          |FROM customer WHERE c_acctbal < 0 OR c_acctbal > 9000""".stripMargin)),

    "a_unique_combination" -> Entry(
      audit("unique_combination_of_columns", "lineitem",
        Map("columns" -> "l_partkey, l_suppkey"),
        _.orderBy("l_partkey", "l_suppkey")),
      Some(
        """SELECT l_partkey, l_suppkey FROM lineitem
          |GROUP BY l_partkey, l_suppkey HAVING count(*) > 1
          |ORDER BY l_partkey, l_suppkey""".stripMargin)),

    "a_accepted_values" -> Entry(
      audit("accepted_values", "lineitem",
        Map("column" -> "l_returnflag", "is_in" -> "'A', 'N'"),
        _.groupBy("l_returnflag").count().orderBy("l_returnflag")),
      Some(
        """SELECT l_returnflag, count(*) AS count FROM lineitem
          |WHERE l_returnflag NOT IN ('A', 'N')
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    "a_z_score" -> Entry(
      audit("z_score", "orders",
        Map("column" -> "o_totalprice", "threshold" -> "1.5"),
        _.selectExpr("count(*) AS n_outliers", "round(sum(z_score), 2) AS sum_z")),
      Some(
        """WITH stats AS (
          |  SELECT AVG(o_totalprice) AS m, STDDEV(o_totalprice) AS sd FROM orders)
          |SELECT count(*) AS n_outliers,
          |  round(sum((o_totalprice - m) / NULLIF(sd, 0)), 2) AS sum_z
          |FROM orders, stats
          |WHERE ABS((o_totalprice - m) / NULLIF(sd, 0)) > 1.5""".stripMargin)),

    "a_mutually_exclusive_ranges" -> Entry(
      (s, dir) => {
        registerAll(s, dir)
        s.sql(
          """SELECT o_orderkey, o_totalprice AS lo, round(o_totalprice * 1.05, 2) AS hi
            |FROM orders WHERE o_custkey < 50""".stripMargin)
          .createOrReplaceTempView("ranges_t")
        val out = Audits.run(s, "mutually_exclusive_ranges", "ranges_t",
          Map("lower_bound_column" -> "lo", "upper_bound_column" -> "hi"))
          .selectExpr("count(*) AS n_overlaps")
        // the fixture view resolved at spark.sql time — drop it so the
        // entry leaves the temp catalog as it found it (CacheHygieneSpec)
        s.catalog.dropTempView("ranges_t")
        out
      },
      Some(
        """WITH ranges_t AS (
          |  SELECT o_orderkey, o_totalprice AS lo, round(o_totalprice * 1.05, 2) AS hi
          |  FROM orders WHERE o_custkey < 50
          |), window_functions AS (
          |  SELECT lo AS lower_bound, hi AS upper_bound,
          |    LEAD(lo) OVER (ORDER BY lo, hi) AS next_lower_bound,
          |    row_number() OVER (ORDER BY lo DESC, hi DESC) = 1 AS is_last_record
          |  FROM ranges_t
          |), calc AS (
          |  SELECT *,
          |    COALESCE(lower_bound <= upper_bound, FALSE) AS ok1,
          |    COALESCE(upper_bound <= next_lower_bound, is_last_record, FALSE) AS ok2
          |  FROM window_functions
          |)
          |SELECT count(*) AS n_overlaps FROM calc WHERE NOT (ok1 AND ok2)""".stripMargin)),

    // privacy triad as BUILT-IN audits (beyond the reference registry):
    // declared on models like any builtin; these entries hash-check the
    // rendered templates cross-engine on real data with violations present
    "a_k_anonymity" -> Entry(
      audit("k_anonymity", "documents",
        Map("quasi_identifiers" -> "lang, source", "k" -> "5"),
        _.orderBy("lang", "source")),
      Some(
        """SELECT lang, source, count(*) AS group_size
          |FROM documents GROUP BY lang, source HAVING count(*) < 5
          |ORDER BY lang, source""".stripMargin)),

    "a_l_diversity" -> Entry(
      audit("l_diversity", "documents",
        Map("quasi_identifiers" -> "source", "column" -> "lang", "l" -> "5"),
        _.orderBy("source")),
      Some(
        """SELECT source, count(*) AS group_size,
          |  CAST(count(DISTINCT lang) AS BIGINT) AS distinct_sensitive
          |FROM documents GROUP BY source HAVING count(DISTINCT lang) < 5
          |ORDER BY source""".stripMargin)),

    "a_t_closeness" -> Entry(
      audit("t_closeness", "documents",
        Map("quasi_identifiers" -> "lang", "column" -> "source", "t" -> "0.16"),
        _.orderBy("lang")),
      Some(
        """WITH scoped AS (
          |  SELECT lang, source AS sv FROM documents WHERE source IS NOT NULL
          |), global_p AS (
          |  SELECT sv, COUNT(*) / SUM(COUNT(*)) OVER () AS p_global
          |  FROM scoped GROUP BY sv
          |), grp AS (
          |  SELECT lang, sv, COUNT(*) AS n FROM scoped GROUP BY lang, sv
          |), gtot AS (
          |  SELECT *, SUM(n) OVER (PARTITION BY lang) AS g_n FROM grp
          |)
          |SELECT lang,
          |  ROUND(0.5 * (SUM(ABS(n / g_n - p_global)) + 1 - SUM(p_global)), 6) AS tvd
          |FROM gtot JOIN global_p USING (sv)
          |GROUP BY lang
          |HAVING ROUND(0.5 * (SUM(ABS(n / g_n - p_global)) + 1 - SUM(p_global)), 6) > 0.16
          |ORDER BY lang""".stripMargin)),

    "a_chi_square" -> Entry(
      audit("chi_square", "orders",
        Map("column_a" -> "o_orderstatus", "column_b" -> "o_orderpriority",
          "critical_value" -> "9.48773", "dependent" -> "true"),
        _.selectExpr("degrees_of_freedom", "round(chi_square, 3) AS chi")),
      Some(
        """WITH samples AS (
          |  SELECT o_orderstatus AS x_a, o_orderpriority AS x_b FROM orders
          |  WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
          |), contingency_table AS (
          |  SELECT x_a, x_b, COUNT(*) AS observed,
          |    SUM(COUNT(*)) OVER (PARTITION BY x_a) AS tot_a,
          |    SUM(COUNT(*)) OVER (PARTITION BY x_b) AS tot_b,
          |    SUM(COUNT(*)) OVER () AS g_t
          |  FROM samples GROUP BY x_a, x_b
          |)
          |SELECT CAST((COUNT(DISTINCT x_a) - 1) * (COUNT(DISTINCT x_b) - 1) AS BIGINT)
          |    AS degrees_of_freedom,
          |  round(SUM((observed - tot_a * tot_b / g_t) * (observed - tot_a * tot_b / g_t)
          |    / (tot_a * tot_b / g_t)), 3) AS chi
          |FROM contingency_table
          |HAVING NOT (round(SUM((observed - tot_a * tot_b / g_t) * (observed - tot_a * tot_b / g_t)
          |    / (tot_a * tot_b / g_t)), 3) > 9.48773)""".stripMargin)),

    "a_kl_divergence" -> Entry(
      (s, dir) => {
        registerAll(s, dir)
        s.sql(
          """SELECT event_type AS et_obs,
            |  CASE WHEN value > 10 THEN event_type ELSE 'click' END AS et_exp
            |FROM events""".stripMargin).createOrReplaceTempView("kl_t")
        val out = Audits.run(s, "kl_divergence", "kl_t",
          Map("source_column" -> "et_obs", "target_column" -> "et_exp",
            "threshold" -> "0.02"))
          .selectExpr("round(kl_divergence, 4) AS kl")
        s.catalog.dropTempView("kl_t")
        out
      },
      Some(
        """WITH kl_t AS (
          |  SELECT event_type AS et_obs,
          |    CASE WHEN value > 10 THEN event_type ELSE 'click' END AS et_exp
          |  FROM events
          |), table_a AS (SELECT et_obs AS x, COUNT(*) AS num_rows FROM kl_t GROUP BY 1),
          |table_b AS (SELECT et_exp AS x, COUNT(*) AS num_rows FROM kl_t GROUP BY 1),
          |a_p AS (SELECT x, num_rows, num_rows / SUM(num_rows) OVER () AS p FROM table_a),
          |b_q AS (SELECT x, num_rows, num_rows / SUM(num_rows) OVER () AS q FROM table_b),
          |a_q AS (SELECT a_p.x, p, COALESCE(q, 0) AS q FROM a_p LEFT JOIN b_q ON a_p.x = b_q.x),
          |b_p AS (SELECT b_q.x, q, COALESCE(p, 0) AS p FROM b_q LEFT JOIN a_p ON b_q.x = a_p.x),
          |unioned AS (
          |  SELECT p * LN(p / NULLIF(q, 0)) AS kl FROM a_q
          |  UNION ALL SELECT q * LN(q / NULLIF(p, 0)) AS kl FROM b_p
          |)
          |SELECT round(SUM(kl), 4) AS kl FROM unioned HAVING SUM(kl) > 0.02""".stripMargin)),

    "a_not_null_proportion" -> Entry(
      (s, dir) => {
        registerAll(s, dir)
        s.sql("SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg FROM customer")
          .createOrReplaceTempView("nnp_t")
        val out = Audits.run(s, "not_null_proportion", "nnp_t",
          Map("column" -> "seg", "threshold" -> "0.9"))
          .selectExpr("cnt", "not_null_cnt", "round(not_null_proportion, 4) AS p")
        s.catalog.dropTempView("nnp_t")
        out
      },
      Some(
        """SELECT count(*) AS cnt, count(seg) AS not_null_cnt,
          |  round(count(seg) / count(*), 4) AS p
          |FROM (SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg FROM customer)
          |HAVING count(seg) / count(*) < 0.9""".stripMargin)),

    "a_sequential_values_pass" -> Entry(
      audit("sequential_values", "nation", Map("column" -> "n_nationkey")),
      Some(
        """WITH windowed AS (
          |  SELECT n_nationkey, LAG(n_nationkey) OVER (ORDER BY n_nationkey) AS prv
          |  FROM nation)
          |SELECT * FROM windowed WHERE NOT (n_nationkey = prv + 1)""".stripMargin)),

    "a_forall_string" -> Entry(
      audit("forall", "part",
        Map("criteria" -> "length(p_name) > 30, p_retailprice > 0"),
        _.groupBy("p_brand").count().orderBy("p_brand")),
      Some(
        """SELECT p_brand, count(*) AS count FROM part
          |WHERE NOT (length(p_name) > 30) OR NOT (p_retailprice > 0)
          |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // ------- previously spec-only templates, now oracle-confirmed ---------
    // (violations are manufactured via inline source subqueries so every
    // entry has a non-trivial deterministic violation set)

    "a_not_null" -> Entry(
      audit("not_null",
        "(SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang FROM documents) src",
        Map("columns" -> "lang"), _.orderBy("doc_id")),
      Some(
        """SELECT doc_id, CAST(NULL AS VARCHAR) AS lang FROM documents
          |WHERE doc_id % 7 = 0 ORDER BY doc_id""".stripMargin)),

    "a_unique_values" -> Entry(
      audit("unique_values", "lineitem", Map("columns" -> "l_orderkey"),
        _.orderBy("l_orderkey", "l_orderkey_rank")),
      Some(
        """SELECT l_orderkey, CAST(rn AS INT) AS l_orderkey_rank FROM (
          |  SELECT l_orderkey,
          |    row_number() OVER (PARTITION BY l_orderkey ORDER BY 1) AS rn
          |  FROM lineitem)
          |WHERE rn > 1 ORDER BY l_orderkey, l_orderkey_rank""".stripMargin)),

    "a_number_of_rows" -> Entry(
      // region has 5 rows < threshold 10 → the count row IS the violation
      audit("number_of_rows", "region", Map("threshold" -> "10")),
      Some(
        """SELECT count(*) AS cnt FROM (SELECT 1 FROM region LIMIT 11)
          |HAVING count(*) <= 10""".stripMargin)),

    "a_at_least_one" -> Entry(
      audit("at_least_one", "nation",
        Map("column" -> "n_name", "condition" -> "n_regionkey = 99")),
      Some(
        """SELECT count(n_name) AS cnt FROM nation WHERE n_regionkey = 99
          |HAVING count(n_name) = 0""".stripMargin)),

    "a_not_empty_string" -> Entry(
      audit("not_empty_string",
        "(SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN '' ELSE lang END AS lang FROM documents) src",
        Map("column" -> "lang"), _.orderBy("doc_id")),
      Some(
        """SELECT doc_id, '' AS lang FROM documents
          |WHERE doc_id % 11 = 0 ORDER BY doc_id""".stripMargin)),

    "a_not_accepted_values" -> Entry(
      audit("not_accepted_values", "lineitem",
        Map("column" -> "l_linestatus", "is_in" -> "'F'"),
        _.selectExpr("count(*) AS n_viol", "min(l_orderkey) AS first_key")),
      Some(
        """SELECT count(*) AS n_viol, min(l_orderkey) AS first_key
          |FROM lineitem WHERE l_linestatus IN ('F')""".stripMargin)),

    "a_valid_uuid" -> Entry(
      audit("valid_uuid",
        "(SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN 'not-a-uuid' " +
          "ELSE concat_ws('-', substr(md5(CAST(doc_id AS STRING)), 1, 8), " +
          "substr(md5(CAST(doc_id AS STRING)), 9, 4), " +
          "substr(md5(CAST(doc_id AS STRING)), 13, 4), " +
          "substr(md5(CAST(doc_id AS STRING)), 17, 4), " +
          "substr(md5(CAST(doc_id AS STRING)), 21, 12)) END AS uid FROM documents) src",
        Map("column" -> "uid"),
        _.selectExpr("count(*) AS n_viol", "min(doc_id) AS first_doc")),
      Some(
        """SELECT count(*) AS n_viol, min(doc_id) AS first_doc
          |FROM documents WHERE doc_id % 5 = 0""".stripMargin)),

    "a_valid_email" -> Entry(
      audit("valid_email",
        "(SELECT doc_id, CASE WHEN doc_id % 3 = 0 " +
          "THEN concat('u', doc_id, '@ex.org') ELSE 'not an email' END AS em " +
          "FROM documents) src",
        Map("column" -> "em"),
        _.selectExpr("count(*) AS n_viol", "min(doc_id) AS first_doc")),
      Some(
        """SELECT count(*) AS n_viol, min(doc_id) AS first_doc
          |FROM documents WHERE doc_id % 3 != 0""".stripMargin)),

    "a_valid_url" -> Entry(
      audit("valid_url",
        "(SELECT doc_id, CASE WHEN doc_id % 2 = 0 " +
          "THEN concat('https://ex.org/p/', doc_id) ELSE 'no url here' END AS u " +
          "FROM documents) src",
        Map("column" -> "u"),
        _.selectExpr("count(*) AS n_viol", "min(doc_id) AS first_doc")),
      Some(
        """SELECT count(*) AS n_viol, min(doc_id) AS first_doc
          |FROM documents WHERE doc_id % 2 != 0""".stripMargin)),

    "a_valid_http_method" -> Entry(
      audit("valid_http_method",
        "(SELECT doc_id, CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'GET' " +
          "WHEN 1 THEN 'POST' WHEN 2 THEN 'FETCH' ELSE 'PUT' END AS verb " +
          "FROM documents) src",
        Map("column" -> "verb"),
        _.selectExpr("count(*) AS n_viol", "min(doc_id) AS first_doc")),
      Some(
        """SELECT count(*) AS n_viol, min(doc_id) AS first_doc
          |FROM documents WHERE doc_id % 4 = 2""".stripMargin)),

    "a_mean_in_range" -> Entry(
      // order totals' mean far above [0, 10] → the summary row violates
      audit("mean_in_range", "orders",
        Map("column" -> "o_totalprice", "min_v" -> "0", "max_v" -> "10"),
        _.selectExpr("round(mean_o_totalprice, 2) AS mean_price")),
      Some(
        """SELECT round(m, 2) AS mean_price FROM (
          |  SELECT AVG(o_totalprice) AS m FROM orders) WHERE m < 0 OR m > 10""".stripMargin)),
  )
}
