package graft.shell

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[Magics]] — the spark-shell analog of the reference's Jupyter magics
  * (magics.py). Exercises the full interactive loop: %context → %plan
  * (preview vs apply) → %run_dag → %evaluate/%render/%fetchdf →
  * %table_name/%diff → %audit → %invalidate. */
class MagicsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def project(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_magics")
    java.nio.file.Files.writeString(dir.resolve("daily.sql"),
      s"""MODEL (name shellm.daily, kind FULL,
         |       audits (not_null(columns = (o_orderdate))));
         |SELECT o_orderdate, count(*) AS n
         |FROM parquet.`$sf/orders.parquet`
         |GROUP BY o_orderdate
         |""".stripMargin)
    dir.toString
  }

  test("context → plan preview (no apply) → plan apply → evaluate/render/fetch") {
    Magics.context(project())
    intercept[Exception] { spark.table("shellm.daily") } // preview must not apply
    val p = Magics.plan("prod", "1995-01-01", "1995-01-08")
    assert(p.added.nonEmpty)
    intercept[Exception] { spark.table("shellm.daily") }
    Magics.plan("prod", "1995-01-01", "1995-01-08", apply = true)
    assert(spark.table("shellm.daily").count() > 0)
    assert(Magics.fetchdf("SELECT count(*) AS n FROM shellm.daily").head.getLong(0) > 0)
    assert(Magics.render("shellm.daily").toLowerCase.contains("group by"))
    assert(Magics.evaluate("shellm.daily", "1995-01-01", "1995-01-08").count() > 0)
    assert(Magics.tableName("shellm.daily") == "`shellm`.`daily`")
    Magics.audit("shellm.daily") // prints PASS; throws on unknown model
    // %diff against a dev env that was never planned errors loudly
    intercept[IllegalArgumentException] { Magics.diff("prod", "ghost_env") }
  }

  test("no context loaded is a named error") {
    val m = Magics.getClass.getDeclaredField("held")
    m.setAccessible(true)
    m.set(Magics, None)
    val e = intercept[IllegalStateException] { Magics.fetchdf("SELECT 1") }
    assert(e.getMessage.contains("%context") || e.getMessage.contains("Magics.context"))
  }
}
