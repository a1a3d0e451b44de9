package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft._
import graft.core._

/** Per-model session_properties must be ISOLATED: the Scheduler evaluates a
  * topo level concurrently, so two models with conflicting confs that
  * set/restored on the shared session would race — one model could render
  * under the other's `spark.sql.session.timeZone` (wrong RESULTS, not just
  * wrong plans), and interleaved restores could clobber the session conf
  * permanently. The evaluator runs such models on `spark.cloneSession()`;
  * this spec pins (a) each model's result reflects its OWN conf even when
  * both run in the same concurrent level, and (b) the parent session's conf
  * is untouched afterwards. */
class SchedulerSessionPropsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("concurrent models with conflicting session timeZones each see their own") {
    val ctx = new GraftContext(spark, SparkTestSession.tmpDir("ws-props"), concurrency = 2)
    // date_format of an instant depends on spark.sql.session.timeZone: the
    // epoch renders 1970-01-01 00:00 in UTC but 1969-12-31 19:00 in New York
    def m(name: String, tz: String) = Model(
      name = name,
      body = SqlBody(
        "SELECT date_format(timestamp_seconds(0), 'yyyy-MM-dd HH:mm') AS t"),
      kind = ModelKind.Full,
      sessionProperties = Map("spark.sql.session.timeZone" -> tz))
    ctx.addModel(m("mart.tz_utc", "UTC"))
    ctx.addModel(m("mart.tz_ny", "America/New_York"))

    val before = spark.conf.get("spark.sql.session.timeZone")
    ctx.apply(ctx.plan("prod", 0L, 86400000L))

    assert(spark.table("mart.tz_utc").collect().map(_.getString(0)).toSeq ==
      Seq("1970-01-01 00:00"))
    assert(spark.table("mart.tz_ny").collect().map(_.getString(0)).toSeq ==
      Seq("1969-12-31 19:00"))
    // the shared session's conf never changed, even transiently observable
    // after the run (the old set/restore path could leave either value here)
    assert(spark.conf.get("spark.sql.session.timeZone") == before)
  }
}
