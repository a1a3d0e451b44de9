package graft.web

import graft.SparkTestSession
import graft.core._

/** Hand-run demo server for eyeballing the SPA:
  * `Test/runMain graft.web.UiDemo [port]` — plans a small project over the
  * sf0.001 fixtures and serves until killed. */
object UiDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val sf = "/root/testdata/sf0.001"
    val proj = SparkTestSession.tmpDir("ui-demo-proj")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(proj, "daily.sql"),
      "MODEL (name demo.daily, kind FULL);\nSELECT o_orderdate, count(*) AS n FROM raw.orders GROUP BY o_orderdate\n")
    val ctx = new graft.GraftContext(spark, SparkTestSession.tmpDir("ws-ui-demo"))
    ctx.addExternal("raw.orders", s"$sf/orders.parquet")
    ctx.addModel(Model(name = "demo.daily",
      body = SqlBody("SELECT o_orderdate, count(*) AS n FROM raw.orders GROUP BY o_orderdate"),
      kind = ModelKind.Full, owner = Some("demo")))
    ctx.addModel(Model(name = "demo.rollup",
      body = SqlBody("SELECT count(*) AS days FROM demo.daily"),
      kind = ModelKind.Full))
    ctx.apply(ctx.plan("prod", 0L, 86400000L))
    val srv = new UiServer(ctx, port = args.headOption.map(_.toInt).getOrElse(8765),
      projectDir = Some(proj)).start()
    println(s"UI demo at ${srv.address}/?token=${srv.token}")
    Thread.currentThread().join()
  }
}
