package graft.adapter

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** [[EnvCatalog]] — the DSv2 plugin behind cross-catalog virtual
  * environments (reference EnvironmentSuffixTarget.CATALOG and
  * environment_catalog_mapping). The plan/apply integration is covered by
  * mk_env_catalog / mk_env_catalog_mapping; this spec pins the plugin
  * mechanics: registration, zero-copy current-version resolution, managed
  * __graft_* column hiding, pushdown through the pruned table, and the
  * namespace/table surface. */
class EnvCatalogSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshCatalog(name: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(s"envcat_$name").toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[EnvCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  private def writeSnapshot(root: String, version: Int,
                            df: org.apache.spark.sql.DataFrame,
                            partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(s"$root/v$version")
  }

  test("zero-copy handle resolves the CURRENT version at read time") {
    freshCatalog("ec_repoint")
    val root = java.nio.file.Files.createTempDirectory("ec_root").toString
    writeSnapshot(root, 1, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    EnvCatalog.writeEntry(spark, "ec_repoint", "mart", "m", root, None)
    assert(spark.table("ec_repoint.mart.m").count() == 2)
    // a NEW snapshot under the same root is visible with no re-promote —
    // the view-repoint semantics
    writeSnapshot(root, 2, Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    assert(spark.table("ec_repoint.mart.m").count() == 3)
    assert(spark.sql("SELECT v FROM ec_repoint.mart.m WHERE id = 3").head.getString(0) == "c")
  }

  test("fingerprint cache: hits return the memoized table, every change class invalidates") {
    freshCatalog("ec_cache")
    val root = java.nio.file.Files.createTempDirectory("ec_root_c").toString
    writeSnapshot(root, 1, Seq((1L, "a")).toDF("id", "v"))
    EnvCatalog.writeEntry(spark, "ec_cache", "mart", "m", root, None)
    val cat = spark.sessionState.catalogManager.catalog("ec_cache")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    def load() = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("mart"), "m"))
    val t1 = load()
    assert(load() eq t1, "unchanged fingerprint must hit the memoized Table")
    // change class 1: a new version dir under the same root (repoint)
    writeSnapshot(root, 2, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val t2 = load()
    assert(!(t2 eq t1), "new snapshot commit must invalidate")
    assert(spark.table("ec_cache.mart.m").count() == 2)
    // change class 2: entry rewrite to a DIFFERENT root (re-promote)
    val root2 = java.nio.file.Files.createTempDirectory("ec_root_c2").toString
    writeSnapshot(root2, 1, Seq((9L, "z"), (8L, "y"), (7L, "x")).toDF("id", "v"))
    EnvCatalog.writeEntry(spark, "ec_cache", "mart", "m", root2, None)
    assert(spark.table("ec_cache.mart.m").count() == 3,
      "entry repoint to a new root must invalidate")
    // change class 3: dropped entry surfaces NoSuchTable even while cached
    EnvCatalog.dropEntry(spark, "ec_cache", "mart", "m")
    intercept[Exception] { load() }
  }

  test("VERSION AS OF / TIMESTAMP AS OF time travel through the catalog") {
    freshCatalog("ec_tt")
    val root = java.nio.file.Files.createTempDirectory("ec_root_tt").toString
    writeSnapshot(root, 1, Seq((1L, "a")).toDF("id", "v"))
    writeSnapshot(root, 2, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    EnvCatalog.writeEntry(spark, "ec_tt", "mart", "t", root, None)
    assert(spark.table("ec_tt.mart.t").count() == 2) // current = v2
    assert(spark.sql("SELECT * FROM ec_tt.mart.t VERSION AS OF 1").count() == 1)
    assert(spark.sql("SELECT * FROM ec_tt.mart.t VERSION AS OF 2").count() == 2)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM ec_tt.mart.t VERSION AS OF 9").collect()
    }
    assert(e.getMessage.contains("no version 9"))
    // TIMESTAMP AS OF: dir mtime is the commit time in the dir scheme —
    // a far-future timestamp sees the newest snapshot, a far-past one errors
    assert(spark.sql(
      "SELECT * FROM ec_tt.mart.t TIMESTAMP AS OF '2099-01-01'").count() == 2)
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM ec_tt.mart.t TIMESTAMP AS OF '1990-01-01'").collect()
    }
    assert(e2.getMessage.contains("no snapshot at or before"))
  }

  test("managed __graft_* partition columns are hidden; pushdown still works") {
    freshCatalog("ec_pruned")
    val root = java.nio.file.Files.createTempDirectory("ec_root2").toString
    writeSnapshot(root, 1,
      Seq((1L, 10.0, "2024-01-01"), (2L, 20.0, "2024-01-02"), (3L, 30.0, "2024-01-02"))
        .toDF("id", "amt", "__graft_pt"),
      partitionBy = Seq("__graft_pt"))
    EnvCatalog.writeEntry(spark, "ec_pruned", "mart", "p", root, None)
    val t = spark.table("ec_pruned.mart.p")
    assert(t.schema.fieldNames.toSeq == Seq("id", "amt"),
      s"managed column leaked into the catalog schema: ${t.schema.fieldNames.mkString(",")}")
    assert(t.count() == 3)
    // SELECT * never trips over the hidden column, and filters push down
    val plan = t.filter(col("id") === 2L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"), plan)
    assert(t.filter(col("amt") > 15.0).count() == 2)
  }

  test("empty snapshot reads as an empty table via the stored schema") {
    freshCatalog("ec_empty")
    val root = java.nio.file.Files.createTempDirectory("ec_root3").toString
    // no v* dir at all — the promote-time schema DDL carries the shape
    EnvCatalog.writeEntry(spark, "ec_empty", "mart", "e", root,
      Some("id BIGINT, name STRING"))
    val t = spark.table("ec_empty.mart.e")
    assert(t.schema.fieldNames.toSeq == Seq("id", "name"))
    assert(t.count() == 0)
  }

  test("namespace/table surface: list, exists, drop, rename") {
    freshCatalog("ec_surface")
    val root = java.nio.file.Files.createTempDirectory("ec_root4").toString
    writeSnapshot(root, 1, Seq((1L, "x")).toDF("id", "v"))
    EnvCatalog.writeEntry(spark, "ec_surface", "mart", "a", root, None)
    EnvCatalog.writeEntry(spark, "ec_surface", "mart", "b", root, None)
    assert(spark.sql("SHOW TABLES IN ec_surface.mart").collect()
      .map(_.getString(1)).sorted.toSeq == Seq("a", "b"))
    assert(spark.sql("SHOW NAMESPACES IN ec_surface").collect()
      .map(_.getString(0)).toSeq == Seq("mart"))
    // the TO name is catalog-relative (a catalog prefix would be read as a
    // deeper namespace)
    spark.sql("ALTER TABLE ec_surface.mart.b RENAME TO mart.c")
    assert(spark.table("ec_surface.mart.c").count() == 1)
    EnvCatalog.dropEntry(spark, "ec_surface", "mart", "a")
    EnvCatalog.dropEntry(spark, "ec_surface", "mart", "c")
    assert(spark.sql("SHOW TABLES IN ec_surface.mart").count() == 0)
    // dropping an absent entry is harmless (idempotent demote)
    EnvCatalog.dropEntry(spark, "ec_surface", "mart", "a")
  }

  test("ensureRegistered defaults a warehouse and refuses spark_catalog") {
    val wh = EnvCatalog.ensureRegistered(spark, "ec_auto")
    assert(spark.conf.get("spark.sql.catalog.ec_auto") == classOf[EnvCatalog].getName)
    assert(spark.conf.get("spark.sql.catalog.ec_auto.warehouse") == wh)
    intercept[IllegalArgumentException] {
      EnvCatalog.ensureRegistered(spark, "spark_catalog")
    }
    // writes through a name owned by a DIFFERENT plugin class are refused
    spark.conf.set("spark.sql.catalog.ec_foreign", "some.other.Catalog")
    intercept[IllegalArgumentException] {
      EnvCatalog.writeEntry(spark, "ec_foreign", "db", "t", "/tmp/x", None)
    }
  }

  test("envTarget composes catalog, schema and table rules") {
    import SparkMaterializer.envTarget
    // catalog suffix: dev gets its own catalog with BARE names; prod stays home
    assert(envTarget("mart", "m", "dev", "catalog") ==
      ((Some("spark_catalog__dev"), "mart", "m")))
    assert(envTarget("mart", "m", "prod", "catalog") == ((None, "mart", "m")))
    // mapping: prefix-regex on the env name, composes with the schema suffix
    val mapping = Seq("^prod$" -> "prod_cat", "^stage" -> "staging_cat")
    assert(envTarget("mart", "m", "prod", "schema", mapping) ==
      ((Some("prod_cat"), "mart", "m")))
    assert(envTarget("mart", "m", "stage_7", "schema", mapping) ==
      ((Some("staging_cat"), "mart__stage_7", "m")))
    assert(envTarget("mart", "m", "dev", "schema", mapping) ==
      ((None, "mart__dev", "m")))
    // ^prod$ is anchored both ends: 'prod_x' must not match it
    assert(envTarget("mart", "m", "prod_x", "schema", mapping) ==
      ((None, "mart__prod_x", "m")))
    // mutual exclusion (reference config/root.py:254)
    intercept[IllegalArgumentException] {
      envTarget("mart", "m", "dev", "catalog", mapping)
    }
  }
}
