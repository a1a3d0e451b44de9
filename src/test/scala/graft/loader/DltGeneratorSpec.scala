package graft.loader

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{GraftContext, SparkTestSession}

/** dlt-pipeline scaffolding (reference integrations/dlt.py): generation
  * from the persisted schema JSON, nested-table parent joins, and an
  * end-to-end plan/apply of the generated models over synthesized
  * dlt-loaded data. */
class DltGeneratorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture(): String = {
    val dir = SparkTestSession.tmpDir("dlt-pipes")
    val p = java.nio.file.Paths.get(dir, "shop", "schemas")
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.writeString(p.resolve("shop.schema.json"),
      """{
        |  "name": "shop",
        |  "tables": {
        |    "_dlt_version": {"columns": {"version": {"name": "version", "data_type": "bigint"}}},
        |    "orders": {
        |      "columns": {
        |        "order_id": {"name": "order_id", "data_type": "bigint", "primary_key": true},
        |        "amount": {"name": "amount", "data_type": "double"},
        |        "_dlt_load_id": {"name": "_dlt_load_id", "data_type": "text"},
        |        "_dlt_id": {"name": "_dlt_id", "data_type": "text"}
        |      }
        |    },
        |    "orders__items": {
        |      "parent": "orders",
        |      "columns": {
        |        "sku": {"name": "sku", "data_type": "text"},
        |        "qty": {"name": "qty", "data_type": "bigint"},
        |        "_dlt_parent_id": {"name": "_dlt_parent_id", "data_type": "text"},
        |        "_dlt_id": {"name": "_dlt_id", "data_type": "text"}
        |      }
        |    }
        |  }
        |}""".stripMargin)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "shop", "state.json"),
      """{"dataset_name": "shopdata"}""")
    dir
  }

  test("generates incremental models; nested table joins its parent's load id") {
    val pipes = fixture()
    assert(DltGenerator.datasetName(pipes, "shop").contains("shopdata"))
    val gen = DltGenerator.generate(pipes, "shop", "shopdata")
    val byName = gen.map(g => g.name -> g.sql).toMap
    assert(byName.keySet == Set("shopdata_sqlmesh.incremental_orders",
      "shopdata_sqlmesh.incremental_orders__items"))
    val orders = byName("shopdata_sqlmesh.incremental_orders")
    assert(orders.contains("INCREMENTAL_BY_TIME_RANGE"))
    assert(orders.contains("grain (order_id)"))
    assert(orders.contains("to_timestamp(CAST(c._dlt_load_id AS DOUBLE))"))
    val items = byName("shopdata_sqlmesh.incremental_orders__items")
    assert(items.contains("JOIN"))
    assert(items.contains("c._dlt_parent_id = p._dlt_id"))
    assert(items.contains("p._dlt_load_id"))
    // bookkeeping tables skipped
    assert(!byName.keySet.exists(_.contains("_dlt_version")))
  }

  test("generated models plan and backfill over dlt-loaded data") {
    val pipes = fixture()
    val gen = DltGenerator.generate(pipes, "shop", "shopdata")
    // synthesize the dlt destination tables: load ids are epoch-second strings
    val load1 = "1735689600.0" // 2025-01-01
    val load2 = "1735776000.0" // 2025-01-02
    val dataDir = SparkTestSession.tmpDir("dlt-data")
    Seq((1L, 10.0, load1, "r1"), (2L, 20.0, load2, "r2"))
      .toDF("order_id", "amount", "_dlt_load_id", "_dlt_id")
      .write.parquet(s"$dataDir/orders")
    Seq(("a", 1L, "r1", "i1"), ("b", 2L, "r2", "i2"))
      .toDF("sku", "qty", "_dlt_parent_id", "_dlt_id")
      .write.parquet(s"$dataDir/orders__items")
    val ctx = new GraftContext(spark, SparkTestSession.tmpDir("dlt-ws"))
    ctx.addExternal("shopdata.orders", s"$dataDir/orders")
    ctx.addExternal("shopdata.orders__items", s"$dataDir/orders__items")
    val proj = SparkTestSession.tmpDir("dlt-proj")
    DltGenerator.writeModels(proj, gen, Set.empty, force = false)
    ctx.loadModels(proj)
    val D = 86400000L
    val d0 = java.time.LocalDate.parse("2025-01-01").toEpochDay * D
    ctx.apply(ctx.plan("prod", d0, d0 + 2 * D))
    val got = spark.table("shopdata_sqlmesh.incremental_orders")
    assert(got.count() == 2)
    assert(got.schema("amount").dataType.typeName == "double")
    val items = spark.table("shopdata_sqlmesh.incremental_orders__items")
    assert(items.count() == 2)
    // the nested table inherited its parent's load time
    assert(items.filter(col("sku") === "a")
      .select(date_format(col("_dlt_load_time"), "yyyy-MM-dd"))
      .head.getString(0) == "2025-01-01")
  }
}
