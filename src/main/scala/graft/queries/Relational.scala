package graft.queries

import org.apache.spark.sql.functions._
import QueryUtil._

/** Plane-A relational surface (SURVEY §2.3): the operator classes model bodies
  * exercise — joins of all types, windows, grouping sets, set ops, CTEs,
  * subqueries, regex/string/date functions. Each entry is the DataFrame/SQL
  * form Catalyst optimizes; oracles are DuckDB ANSI SQL.
  *
  * Scale notes baked in: dimension joins broadcast (nation/region/supplier);
  * fact-fact joins shuffle on the join key only after filters are pushed to
  * the parquet scan.
  */
object Relational {

  val entries: Map[String, Entry] = Map(

    "q2_join_agg" -> Entry((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }, Some(
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    "q3_topn" -> Entry((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(10)
    }, Some(
      """SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin)),

    "q4_window_rank" -> portableSqlEntry(
      """SELECT c_nationkey, c_custkey, rnk FROM (
        |  SELECT c_nationkey, c_custkey,
        |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk
        |  FROM customer) ranked
        |WHERE rnk <= 3 ORDER BY c_nationkey, rnk""".stripMargin),

    "q5_window_running" -> portableSqlEntry(
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev,
        |  round(o_totalprice - lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta
        |FROM orders WHERE o_custkey < 200
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    "q6_filter" -> Entry((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n"))
    }, Some(
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)),

    "q7_setops" -> portableSqlEntry(
      """SELECT 'intersect' AS op, count(*) AS n FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |UNION ALL
        |SELECT 'except' AS op, count(*) AS n FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |UNION ALL
        |SELECT 'union' AS op, count(*) AS n FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  UNION SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY op""".stripMargin),

    "q8_rollup" -> portableSqlEntry(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin),

    "q9_having_subquery" -> portableSqlEntry(
      """SELECT c_nationkey, round(avg(c_acctbal), 2) AS avg_bal, count(*) AS n
        |FROM customer GROUP BY c_nationkey
        |HAVING avg(c_acctbal) > (SELECT avg(c_acctbal) FROM customer)
        |ORDER BY c_nationkey""".stripMargin),

    "q10_semijoin" -> Entry((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    }, Some(
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    "q11_antijoin" -> Entry((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_inactive"))
        .orderBy(col("c_nationkey"))
    }, Some(
      """SELECT c_nationkey, count(*) AS n_inactive FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    "q12_case_expr" -> portableSqlEntry(
      // CASTs: DuckDB sums of integers widen to HUGEINT — pin to BIGINT so
      // both engines agree on the schema
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT) AS big,
        |  CAST(sum(CASE WHEN o_totalprice BETWEEN 100000 AND 300000 THEN 1 ELSE 0 END) AS BIGINT) AS mid,
        |  CAST(sum(CASE WHEN o_totalprice < 100000 THEN 1 ELSE 0 END) AS BIGINT) AS small,
        |  count(DISTINCT COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING')) AS statuses
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    "q13_date_funcs" -> portableSqlEntry(
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
        |  CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    "q14_cte_window" -> portableSqlEntry(
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS rev
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1995-04-01'
        |  GROUP BY CAST(o_orderdate AS DATE)
        |)
        |SELECT d, round(rev, 2) AS rev,
        |  round(avg(rev) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS ma7
        |FROM daily ORDER BY d""".stripMargin),

    "q15_grouping_sets" -> portableSqlEntry(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),

    "q16_distinct_agg" -> portableSqlEntry(
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS parts,
        |  count(DISTINCT l_suppkey) AS supps, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    "q17_values_join" -> portableSqlEntry(
      """SELECT w.tier, count(*) AS n, round(sum(o.o_totalprice * w.weight), 2) AS weighted
        |FROM orders o
        |JOIN (VALUES ('1-URGENT', 'hot', 2.0), ('2-HIGH', 'hot', 1.5),
        |             ('3-MEDIUM', 'warm', 1.0), ('4-NOT SPECIFIED', 'cold', 0.5),
        |             ('5-LOW', 'cold', 0.25)) AS w(prio, tier, weight)
        |  ON o.o_orderpriority = w.prio
        |GROUP BY w.tier ORDER BY w.tier""".stripMargin),

    "q18_correlated" -> portableSqlEntry(
      """SELECT o_orderpriority, count(*) AS n_above
        |FROM orders o1
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders o2
        |                      WHERE o2.o_orderpriority = o1.o_orderpriority)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    "q19_string_funcs" -> portableSqlEntry(
      """SELECT p_brand,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END) AS BIGINT) AS greens,
        |  count(DISTINCT upper(substr(p_type, 1, 5))) AS type_prefixes,
        |  CAST(max(length(replace(p_name, ' ', ''))) AS BIGINT) AS max_sq_len
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin),

    "q20_regex" -> Entry((s, dir) => {
      registerAll(s, dir)
      s.sql(
        """SELECT event_type, count(*) AS n,
          |  CAST(sum(CASE WHEN props RLIKE '"k": [0-9]{2}' THEN 1 ELSE 0 END) AS BIGINT) AS two_digit_k,
          |  max(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT)) AS max_k
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    }, Some(
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN regexp_matches(props, '"k": [0-9]{2}') THEN 1 ELSE 0 END) AS BIGINT) AS two_digit_k,
        |  max(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    "q21_multi_join_star" -> Entry((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val su = t(s, dir, "supplier"); val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      // supplier GROWS with scale factor (SF×10k rows) — no broadcast hint:
      // AQE broadcasts it at small SF and flips to a shuffled join when its
      // runtime size crosses the threshold (a forced hint would OOM at
      // 100×). nation (25 rows) and region (5) are fixed-cardinality, safe
      // to pin. ScaleProbe `q21_inflated_supplier` demonstrates the flip.
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(su, li("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice")), 2).as("volume"))
        .orderBy(col("r_name"), col("n_name"))
    }, Some(
      """SELECT r_name, n_name, round(sum(l_extendedprice), 2) AS volume
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    "q29_range_frame" -> portableSqlEntry(
      // event-time RANGE frame: per-user trailing-hour rolling sum — the
      // windowed-aggregation shape streaming watermark windows approximate
      """SELECT user_id, event_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 2) AS v_1h,
        |  count(*) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_1h
        |FROM events WHERE user_id < 10
        |ORDER BY user_id, event_id""".stripMargin),

    "q30_recursive_cte" -> portableSqlEntry(
      // WITH RECURSIVE (Spark 4 native): series generation + a join back to
      // data — the hierarchy/transitive-closure shape
      """WITH RECURSIVE seq(n) AS (
        |  SELECT 0
        |  UNION ALL
        |  SELECT n + 1 FROM seq WHERE n < 24
        |)
        |SELECT s.n, count(c.c_custkey) AS n_cust,
        |  round(coalesce(sum(c.c_acctbal), 0), 2) AS bal
        |FROM seq s LEFT JOIN customer c ON c.c_nationkey = s.n
        |GROUP BY s.n ORDER BY s.n""".stripMargin),

    "q31_struct_funcs" -> sqlEntry(
      // nested struct build + field access (dialects differ only in the
      // struct literal syntax)
      """SELECT t.s.nm AS nm, t.s.rk AS rk FROM
        |  (SELECT named_struct('nm', n_name, 'rk', n_regionkey) AS s FROM nation) t
        |ORDER BY nm""".stripMargin,
      """SELECT t.s.nm AS nm, t.s.rk AS rk FROM
        |  (SELECT {'nm': n_name, 'rk': n_regionkey} AS s FROM nation) t
        |ORDER BY nm""".stripMargin),

    "q32_sql_hof" -> sqlEntry(
      // higher-order functions in SQL over the embedding arrays
      """SELECT label,
        |  round(avg(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * 2.0),
        |    CAST(0.0 AS DOUBLE), (a, x) -> a + x)), 3) AS avg_2sum,
        |  max(size(filter(embedding, x -> x > 0))) AS max_pos
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
      """SELECT label,
        |  round(avg(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2.0))), 3) AS avg_2sum,
        |  max(len(list_filter(embedding, x -> x > 0))) AS max_pos
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin),

    "q33_interval_arith" -> portableSqlEntry(
      // INTERVAL arithmetic in predicates and projections
      """SELECT count(*) AS n,
        |  CAST(min(o_orderdate + INTERVAL 30 DAY) AS DATE) AS min_due,
        |  CAST(max(o_orderdate - INTERVAL 1 DAY) AS DATE) AS max_prev
        |FROM orders
        |WHERE o_orderdate + INTERVAL 90 DAY < TIMESTAMP '1995-06-01'""".stripMargin),

    "q34_exists_subquery" -> portableSqlEntry(
      // correlated EXISTS / NOT EXISTS
      """SELECT n_name,
        |  (SELECT count(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) AS n_supp
        |FROM nation n
        |WHERE EXISTS (SELECT 1 FROM customer c
        |              WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000)
        |  AND NOT EXISTS (SELECT 1 FROM customer c2
        |                  WHERE c2.c_nationkey = n.n_nationkey AND c2.c_acctbal < -999)
        |ORDER BY n_name""".stripMargin),

    "q36_lateral_subquery" -> portableSqlEntry(
      // LATERAL correlated derived table: per-nation top-2 customers by
      // balance — the decorrelated form compiles to a partitioned window,
      // never a per-row re-scan (same syntax both engines)
      """SELECT n.n_name, t.c_name, t.c_acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_name, round(c_acctbal, 2) AS c_acctbal
        |  FROM customer c WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c.c_acctbal DESC, c_name LIMIT 2
        |) t
        |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin),

    "q35_unpivot" -> sqlEntry(
      // wide→long UNPIVOT (same shape, different dialect syntax)
      """SELECT n_name, metric, val FROM (
        |  SELECT n_name, CAST(n_nationkey AS DOUBLE) AS k, CAST(n_regionkey AS DOUBLE) AS r
        |  FROM nation
        |) UNPIVOT (val FOR metric IN (k, r))
        |ORDER BY n_name, metric""".stripMargin,
      """SELECT n_name, metric, val FROM (
        |  UNPIVOT (SELECT n_name, CAST(n_nationkey AS DOUBLE) AS k, CAST(n_regionkey AS DOUBLE) AS r
        |           FROM nation)
        |  ON k, r INTO NAME metric VALUE val
        |) ORDER BY n_name, metric""".stripMargin),

    "q24_json_funcs" -> Entry((s, dir) => {
      registerAll(s, dir)
      s.sql(
        """SELECT event_type,
          |  CAST(max(get_json_object(props, '$.k')) AS INT) AS max_k,
          |  CAST(min(get_json_object(props, '$.k')) AS INT) AS min_k,
          |  count(DISTINCT get_json_object(props, '$.k')) AS n_k
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    }, Some(
      """SELECT event_type,
        |  CAST(max(props ->> '$.k') AS INT) AS max_k,
        |  CAST(min(props ->> '$.k') AS INT) AS min_k,
        |  count(DISTINCT props ->> '$.k') AS n_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    "q25_array_funcs" -> Entry((s, dir) => {
      val emb = t(s, dir, "embeddings")
      emb.select(col("label"),
          size(col("embedding")).as("dim"),
          round(aggregate(col("embedding"), lit(0.0),
            (a, v) => a + v.cast("double")).cast("double"), 4).as("vsum"),
          round(array_max(col("embedding")).cast("double"), 4).as("vmax"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), max(col("dim")).as("dim"),
          round(avg(col("vsum")), 4).as("avg_sum"),
          round(max(col("vmax")), 4).as("max_max"))
        .orderBy(col("label"))
    }, Some(
      """WITH v AS (
        |  SELECT label, len(embedding) AS dim,
        |    round(CAST(list_sum(CAST(embedding AS DOUBLE[])) AS DOUBLE), 4) AS vsum,
        |    round(CAST(list_max(CAST(embedding AS DOUBLE[])) AS DOUBLE), 4) AS vmax
        |  FROM embeddings
        |)
        |SELECT label, count(*) AS n, max(dim) AS dim,
        |  round(avg(vsum), 4) AS avg_sum, round(max(vmax), 4) AS max_max
        |FROM v GROUP BY label ORDER BY label""".stripMargin)),

    "q26_lateral_explode" -> Entry((s, dir) => {
      registerAll(s, dir)
      s.sql(
        """SELECT word, count(*) AS n FROM (
          |  SELECT explode(filter(split(lower(p_name), ' '), w -> length(w) > 0)) AS word
          |  FROM part
          |) GROUP BY word HAVING count(*) >= 50 ORDER BY n DESC, word""".stripMargin)
    }, Some(
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(list_filter(string_split(lower(p_name), ' '), w -> len(w) > 0)) AS word
        |  FROM part
        |) t GROUP BY word HAVING count(*) >= 50 ORDER BY n DESC, word""".stripMargin)),

    "q27_percentiles" -> Entry((s, dir) => {
      registerAll(s, dir)
      s.sql(
        """SELECT o_orderstatus,
          |  round(percentile(o_totalprice, 0.5), 2) AS median,
          |  round(percentile(o_totalprice, 0.9), 2) AS p90,
          |  round(stddev(o_totalprice), 2) AS sd,
          |  round(corr(o_totalprice, o_custkey), 6) AS silly_corr
          |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    }, Some(
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS median,
        |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
        |  round(stddev(o_totalprice), 2) AS sd,
        |  round(corr(o_totalprice, o_custkey), 6) AS silly_corr
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    "q28_pivot_sql" -> Entry((s, dir) => {
      registerAll(s, dir)
      s.sql(
        """SELECT * FROM (
          |  SELECT c_mktsegment, c_nationkey % 5 AS region_bucket, c_acctbal FROM customer
          |) PIVOT (
          |  round(sum(c_acctbal), 2) FOR region_bucket IN (0 AS r0, 1 AS r1, 2 AS r2)
          |) ORDER BY c_mktsegment""".stripMargin)
    }, Some(
      """SELECT c_mktsegment,
        |  round(sum(CASE WHEN c_nationkey % 5 = 0 THEN c_acctbal END), 2) AS r0,
        |  round(sum(CASE WHEN c_nationkey % 5 = 1 THEN c_acctbal END), 2) AS r1,
        |  round(sum(CASE WHEN c_nationkey % 5 = 2 THEN c_acctbal END), 2) AS r2
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    "q23_selfjoin_shuffle" -> Entry((s, dir) => {
      // fact-fact self-join on a mid-cardinality key: BOTH sides are large, so
      // this exercises the shuffle(-merge/hash) join path that fact joins take
      // at 100 TB, where nothing is broadcastable — row-level join first,
      // aggregation after, deliberately
      val li = t(s, dir, "lineitem")
      val y95 = li.filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .select(col("l_partkey"), col("l_extendedprice").as("p95"))
      val y96 = li.filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_partkey"), col("l_extendedprice").as("p96"))
      y95.join(y96, "l_partkey")
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n_pairs"),
          round(sum(col("p95") + col("p96")), 2).as("vol"))
        .orderBy(col("l_partkey"))
    }, Some(
      """SELECT a.l_partkey, count(*) AS n_pairs,
        |  round(sum(a.l_extendedprice + b.l_extendedprice), 2) AS vol
        |FROM lineitem a JOIN lineitem b ON a.l_partkey = b.l_partkey
        |WHERE a.l_shipdate >= TIMESTAMP '1995-01-01' AND a.l_shipdate < TIMESTAMP '1996-01-01'
        |  AND b.l_shipdate >= TIMESTAMP '1996-01-01' AND b.l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY a.l_partkey ORDER BY a.l_partkey""".stripMargin)),

    "q22_sessionize" -> {
      // gaps-and-islands sessionization: new session when gap > 30 min —
      // the batch analog of streaming session windows
      def sql(epoch: String => String) =
        s"""WITH gaps AS (
           |  SELECT user_id, ts,
           |    CASE WHEN ${epoch("ts")} - ${epoch("lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)")} > 1800
           |      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END AS new_sess
           |  FROM events
           |), sess AS (
           |  SELECT user_id, ts,
           |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_id
           |  FROM gaps
           |)
           |SELECT user_id, CAST(count(DISTINCT sess_id) AS BIGINT) AS n_sessions, count(*) AS n_events
           |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin
      sqlEntry(sql(c => s"CAST($c AS BIGINT)"), sql(c => s"CAST(epoch($c) AS BIGINT)"))
    },
  )
}
