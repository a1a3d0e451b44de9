package graft.loader

import org.scalatest.funsuite.AnyFunSuite
import graft._
import graft.core._

/** The remaining project-surface items: SEED csv_settings (reference
  * model/seed.py:27 CsvSettings), METRIC file DDL (metric/definition.py:69,
  * load_metric_ddl :24), and notification targets
  * (core/notification_target.py). */
class ProjectSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val D = 86400000L

  private def write(dir: String, name: String, text: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, name), text)

  test("SEED csv_settings: delimiter/quotechar/na_values map to the csv reader") {
    val dir = SparkTestSession.tmpDir("seed-csv")
    write(dir, "data.csv",
      "id;label;score\n1;|alpha;beta|;10\n2;NA;20\n")
    write(dir, "seed_model.sql",
      s"""MODEL (
         |  name seedcsv.items,
         |  kind SEED (
         |    path '$dir/data.csv',
         |    csv_settings (delimiter ';', quotechar '|', na_values 'NA')
         |  )
         |);
         |""".stripMargin)
    val ctx = new GraftContext(spark, SparkTestSession.tmpDir("ws-seedcsv"))
    ctx.loadModels(dir)
    val kind = ctx.model("seedcsv.items").kind.asInstanceOf[ModelKind.Seed]
    assert(kind.options == Map("sep" -> ";", "quote" -> "|", "nullValue" -> "NA"))
    ctx.apply(ctx.plan("prod", 0L, D))
    val rows = spark.table("seedcsv.items").orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "alpha;beta") // quoted delimiter preserved
    assert(rows(1).isNullAt(1))                  // NA → null
  }

  test("METRIC file DDL loads and answers semantic queries") {
    val dir = SparkTestSession.tmpDir("metric-ddl")
    write(dir, "metrics.sql",
      """METRIC (
        |  name total_rev,
        |  expression round(SUM(o_totalprice), 2),
        |  table raw.orders,
        |  dims (status o_orderstatus)
        |);
        |METRIC (
        |  name n_orders,
        |  expression COUNT(*),
        |  table raw.orders,
        |  dims (status o_orderstatus)
        |);
        |METRIC (
        |  name avg_rev,
        |  expression round(total_rev / NULLIF(n_orders, 0), 2)
        |);
        |""".stripMargin)
    val sf = "/root/testdata/sf0.001"
    val ctx = new GraftContext(spark, SparkTestSession.tmpDir("ws-metric"))
    ctx.addExternal("raw.orders", s"$sf/orders.parquet")
    ctx.loadModels(dir)
    val got = ctx.semanticQuery(
      """SELECT status, total_rev, avg_rev FROM __semantic.__table
        |GROUP BY status ORDER BY status""".stripMargin).collect()
    val expected = spark.sql(
      s"""SELECT o_orderstatus AS status, round(SUM(o_totalprice), 2) AS total_rev,
         |  round(round(SUM(o_totalprice), 2) / NULLIF(COUNT(*), 0), 2) AS avg_rev
         |FROM parquet.`$sf/orders.parquet`
         |GROUP BY o_orderstatus ORDER BY status""".stripMargin).collect()
    assert(got.toSeq == expected.toSeq)
  }

  test("notification targets observe apply/run lifecycle and audit failures") {
    val events = scala.collection.mutable.ArrayBuffer[String]()
    val target = new NotificationTarget {
      override def notifyApplyStart(env: String, planId: String): Unit =
        events += s"apply_start:$env"
      override def notifyApplyEnd(env: String, planId: String): Unit =
        events += s"apply_end:$env"
      override def notifyApplyFailure(env: String, planId: String, e: Throwable): Unit =
        events += s"apply_failure:$env"
      override def notifyRunStart(env: String): Unit = events += s"run_start:$env"
      override def notifyRunEnd(env: String): Unit = events += s"run_end:$env"
      override def notifyAuditFailure(model: String, audit: String, msg: String,
                                      blocking: Boolean): Unit =
        events += s"audit_failure:$model:$audit:$blocking"
    }
    // a throwing target must not break the flow or mute other targets
    val hostile = new NotificationTarget {
      override def notifyApplyStart(env: String, planId: String): Unit =
        throw new RuntimeException("boom")
    }
    val ctx = new GraftContext(spark, SparkTestSession.tmpDir("ws-notify"))
      .addNotificationTarget(hostile).addNotificationTarget(target)
    ctx.addModel(Model("nt.ok", SqlBody("SELECT 1 AS id"), kind = ModelKind.Full))
    ctx.apply(ctx.plan("prod", 0L, D))
    ctx.run("prod", 0L, D)
    assert(events.toSeq == Seq("apply_start:prod", "apply_end:prod",
      "run_start:prod", "run_end:prod"))

    events.clear()
    ctx.addModel(Model("nt.bad", SqlBody("SELECT NULL AS id"), kind = ModelKind.Full,
      audits = Seq("not_null" -> Map("columns" -> "id"))))
    intercept[Exception] { ctx.apply(ctx.plan("prod", 0L, D)) }
    assert(events.contains("audit_failure:nt.bad:not_null:true"))
    assert(events.last == "apply_failure:prod")
  }
}
