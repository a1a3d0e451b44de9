package graft.queries

import org.apache.spark.sql.functions._
import graft.adapter.TableDiff
import graft.metrics.{Metric, MetricRegistry}
import QueryUtil._

/** Semantic-layer metrics (SURVEY §1.1 Metric / metric rewriter) and table
  * diffing (SURVEY §2.6) coverage. */
object SemanticQueries {

  val entries: Map[String, Entry] = Map(

    // ---------------- METRIC rewrite: __semantic.__table → joins+aggs ------
    "sm_metrics" -> Entry((s, dir) => {
      registerAll(s, dir)
      val registry = new MetricRegistry(Seq(
        Metric("total_order_rev", "ROUND(SUM(o_totalprice), 2)", "orders",
          dims = Map("d" -> "CAST(o_orderdate AS DATE)")),
        Metric("n_orders", "COUNT(*)", "orders",
          dims = Map("d" -> "CAST(o_orderdate AS DATE)")),
        Metric("items_shipped", "COUNT(*)", "lineitem",
          dims = Map("d" -> "CAST(l_shipdate AS DATE)")),
        // derived metric: formula over other metrics (metrics-on-metrics)
        Metric("avg_order_value", "ROUND(total_order_rev / NULLIF(n_orders, 0), 4)", "")))
      val sql = registry.rewrite(
        """SELECT d, total_order_rev, n_orders, items_shipped, avg_order_value
          |FROM __semantic.__table
          |WHERE d >= DATE '1995-01-01' AND d < DATE '1995-02-01'
          |GROUP BY d ORDER BY d""".stripMargin)
      s.sql(sql).orderBy(col("d"))
    }, Some(
      // the rewrite contract: one agg subquery per base model, FULL JOIN on
      // dims, COALESCE'd dimension output
      """WITH o AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, round(sum(o_totalprice), 2) AS total_order_rev,
        |    count(*) AS n_orders
        |  FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
        |    AND CAST(o_orderdate AS DATE) < DATE '1995-02-01' GROUP BY 1
        |), li AS (
        |  SELECT CAST(l_shipdate AS DATE) AS d, count(*) AS items_shipped
        |  FROM lineitem WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1995-02-01' GROUP BY 1
        |)
        |SELECT COALESCE(li.d, o.d) AS d, total_order_rev, n_orders, items_shipped,
        |  round(total_order_rev / nullif(n_orders, 0), 4) AS avg_order_value
        |FROM li FULL JOIN o ON li.d = o.d
        |ORDER BY d""".stripMargin)),

    "sm_metrics_autojoin" -> Entry((s, dir) => {
      // entity auto-join (reference metric/rewriter.py:136-151 via
      // ReferenceGraph): the requested dimension lives on ANOTHER model —
      // the rewriter finds the carrier through grains/references and LEFT
      // JOINs it along the path before aggregating
      registerAll(s, dir)
      val meta = Seq(
        graft.core.Model("orders", graft.core.SqlBody("SELECT 1 AS x"),
          grains = Seq("o_orderkey"), entityReferences = Seq("o_custkey")),
        graft.core.Model("cust_dim", graft.core.SqlBody("SELECT 1 AS x"),
          grains = Seq("o_custkey"),
          columns = Seq("o_custkey" -> "BIGINT", "c_mktsegment" -> "STRING")))
      val registry = new MetricRegistry(
        Seq(Metric("seg_rev", "ROUND(SUM(o_totalprice), 2)", "orders"),
          Metric("seg_orders", "COUNT(*)", "orders")),
        graph = Some(new graft.core.ReferenceGraph(meta)))
      val sql = registry.rewrite(
        """SELECT c_mktsegment, seg_rev, seg_orders FROM __semantic.__table
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
        tableFor = {
          case "cust_dim" => "(SELECT c_custkey AS o_custkey, c_mktsegment FROM customer)"
          case t => t
        })
      s.sql(sql).orderBy(col("c_mktsegment"))
    }, Some(
      """SELECT c.c_mktsegment AS c_mktsegment,
        |  round(sum(o.o_totalprice), 2) AS seg_rev,
        |  count(*) AS seg_orders
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ------------------- RowDiff: source vs target in one job -------------
    "sm_tablediff" -> Entry((s, dir) => {
      val orders = t(s, dir, "orders")
      // target = source with injected drift: some rows dropped, some prices
      // changed, some rows brand-new
      val target = orders.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 13 === 0, round(col("o_totalprice") * 1.1, 2))
            .otherwise(col("o_totalprice")))
      val extra = orders.filter(col("o_orderkey") % 101 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000)
      TableDiff.rowDiff(orders, target.unionByName(extra), Seq("o_orderkey"))
        .select(col("s_only"), col("t_only"), col("full_match"), col("partial_match"),
          col("match_o_totalprice"))
    }, Some(
      """WITH target AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 13 = 0 THEN round(o_totalprice * 1.1, 2)
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_custkey, o_orderstatus, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_totalprice, o_custkey, o_orderstatus,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 101 = 0
        |), j AS (
        |  SELECT s.o_orderkey AS sk, t.o_orderkey AS tk,
        |    CASE WHEN round(CAST(s.o_totalprice AS DECIMAL(38, 9)), 3)
        |      IS NOT DISTINCT FROM round(CAST(t.o_totalprice AS DECIMAL(38, 9)), 3)
        |      THEN 1 ELSE 0 END AS m_price,
        |    CASE WHEN s.o_custkey IS NOT DISTINCT FROM t.o_custkey THEN 1 ELSE 0 END AS m_cust,
        |    CASE WHEN s.o_orderstatus IS NOT DISTINCT FROM t.o_orderstatus THEN 1 ELSE 0 END AS m_status,
        |    CASE WHEN s.o_orderdate IS NOT DISTINCT FROM t.o_orderdate THEN 1 ELSE 0 END AS m_date,
        |    CASE WHEN s.o_orderpriority IS NOT DISTINCT FROM t.o_orderpriority THEN 1 ELSE 0 END AS m_prio
        |  FROM orders s FULL JOIN target t ON s.o_orderkey = t.o_orderkey
        |)
        |SELECT
        |  CAST(sum(CASE WHEN sk IS NOT NULL AND tk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS s_only,
        |  CAST(sum(CASE WHEN sk IS NULL AND tk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS t_only,
        |  CAST(sum(CASE WHEN sk IS NOT NULL AND tk IS NOT NULL
        |    AND m_price + m_cust + m_status + m_date + m_prio = 5 THEN 1 ELSE 0 END) AS BIGINT) AS full_match,
        |  CAST(sum(CASE WHEN sk IS NOT NULL AND tk IS NOT NULL
        |    AND m_price + m_cust + m_status + m_date + m_prio < 5 THEN 1 ELSE 0 END) AS BIGINT) AS partial_match,
        |  CAST(sum(CASE WHEN sk IS NOT NULL AND tk IS NOT NULL AND m_price = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS match_o_totalprice
        |FROM j""".stripMargin)),
  )
}
