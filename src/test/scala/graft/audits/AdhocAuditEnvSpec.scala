package graft.audits

import org.scalatest.funsuite.AnyFunSuite
import graft._
import graft.core._

/** The ad-hoc `audit` verb must resolve audit args (e.g. `relationships`
  * `to:`) against the SAME environment it audits: a dev child checked
  * against the PROD parent would report phantom violations for every key a
  * dev plan legitimately added to both sides. Mirrors the evaluator's
  * resolvedArgs behavior (reference cli/main.py:783 audit; dbt
  * relationships test). */
class AdhocAuditEnvSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val D = 86400000L

  test("dev relationships audit checks the dev parent, not prod's") {
    val ctx = new GraftContext(spark, SparkTestSession.tmpDir("ws-audit-env"))
    def parent(keys: Seq[Int]) = Model("mart.aud_parent",
      SqlBody(s"SELECT * FROM VALUES ${keys.map(k => s"($k)").mkString(",")} AS t(id)"),
      kind = ModelKind.Full)
    def child(keys: Seq[Int]) = Model("mart.aud_child",
      SqlBody(s"SELECT * FROM VALUES ${keys.map(k => s"($k)").mkString(",")} AS t(pid)"),
      kind = ModelKind.Full,
      audits = Seq("relationships" ->
        Map("column" -> "pid", "field" -> "id", "to" -> "mart.aud_parent")))

    ctx.addModel(parent(Seq(1, 2)))
    ctx.addModel(child(Seq(1, 2)))
    ctx.apply(ctx.plan("prod", 0L, D))
    assert(ctx.audit("mart.aud_child", "prod") == Map("relationships" -> 0L))

    // dev adds key 3 to BOTH parent and child
    ctx.addModel(parent(Seq(1, 2, 3)))
    ctx.addModel(child(Seq(1, 2, 3)))
    ctx.apply(ctx.plan("dev", 0L, D))

    // against the dev parent: consistent → 0 violations. (The old unresolved
    // behavior read `mart.aud_parent` = the prod view and counted pid=3.)
    assert(ctx.audit("mart.aud_child", "dev") == Map("relationships" -> 0L))
    // prod stayed consistent too, and still lacks key 3
    assert(ctx.audit("mart.aud_child", "prod") == Map("relationships" -> 0L))
    assert(spark.table("mart.aud_parent").count() == 2)
  }
}
