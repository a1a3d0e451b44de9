package graft

import org.apache.spark.sql.SparkSession

/** EnvCatalog metadata-path cost at 10k promoted models (r16 verdict #7):
  * loadTable re-reads the entry JSON and re-lists version dirs PER
  * resolution — the right semantics (view-repoint: a new snapshot under the
  * same root is visible without re-promote), but it is driver-side FS
  * metadata in the analyzer path. This probe measures whether that hurts
  * at 10⁴ entries before anyone builds a cache for it.
  *
  * Shape: 10 namespaces × 1,000 entries, each entry JSON pointing at one of
  * 20 shared physical roots (a v1 snapshot dir with one small parquet).
  * Measured: listTables over a 1k namespace, bare loadTable latency, and
  * end-to-end `SELECT count(*)` through the analyzer. Output: one JSON line.
  *
  * Run: Test/runMain graft.EnvCatalogScaleProbe
  */
object EnvCatalogScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val wh = SparkTestSession.tmpDir("envcat-scale")
    val cat = "envscale"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.adapter.EnvCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)

    // 20 shared physical roots, one v1 snapshot each
    val roots = (0 until 20).map { i =>
      val r = s"$wh/__phys/root$i"
      spark.range(100).selectExpr("id", "id * 2 AS v")
        .coalesce(1).write.mode("overwrite").parquet(s"$r/v1")
      r
    }
    val nNs = 10; val perNs = 1000
    val t0 = System.nanoTime()
    for (ns <- 0 until nNs) {
      val nsDir = java.nio.file.Paths.get(wh, s"ns$ns")
      java.nio.file.Files.createDirectories(nsDir)
      for (m <- 0 until perNs)
        java.nio.file.Files.writeString(nsDir.resolve(s"m_$m.json"),
          s"""{"root": "${roots((ns * perNs + m) % roots.length)}"}""")
    }
    val writeS = (System.nanoTime() - t0) / 1e9

    def time[A](f: => A): Double = {
      val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9
    }

    // listTables over one 1,000-entry namespace
    val listS = time(spark.sql(s"SHOW TABLES IN $cat.ns3").count())

    // bare loadTable: resolve 1,000 random idents through the catalog API
    val catalog = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val rnd = new scala.util.Random(7)
    val warm = catalog.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("ns0"), "m_0")) // fs/codec init off the clock
    require(warm != null)
    val nLoads = 1000
    val loadS = time {
      (0 until nLoads).foreach { _ =>
        catalog.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
          Array(s"ns${rnd.nextInt(nNs)}"), s"m_${rnd.nextInt(perNs)}"))
      }
    }

    // cache-hit path (the steady state: queries re-reference the same
    // promoted models): re-resolve 1000 loads over 50 already-loaded idents
    // — fingerprint check only, no ParquetTable rebuild
    val hot = (0 until 50).map(i =>
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array(s"ns${i % nNs}"), s"m_${i * 13 % perNs}"))
    hot.foreach(catalog.loadTable) // populate
    val hitS = time {
      (0 until nLoads).foreach(i => catalog.loadTable(hot(i % hot.size)))
    }

    // end-to-end analyzer path: 50 single-table counts through SQL
    spark.sql(s"SELECT count(*) FROM $cat.ns1.m_1").collect() // warm codegen
    val nSql = 50
    val sqlS = time {
      (0 until nSql).foreach { i =>
        spark.sql(s"SELECT count(*) FROM $cat.ns${i % nNs}.m_${i * 17 % perNs}")
          .collect()
      }
    }
    // SQL with every referenced table already fingerprint-cached
    val sqlWarmS = time {
      (0 until nSql).foreach { i =>
        spark.sql(s"SELECT count(*) FROM $cat.ns${i % nNs}.m_${i * 17 % perNs}")
          .collect()
      }
    }

    println(f"""{"probe":"envcatalog_scale","entries":${nNs * perNs},"write_s":$writeS%.2f,"list_1k_s":$listS%.3f,"load_table_cold_ms":${loadS / nLoads * 1000}%.2f,"load_table_hit_ms":${hitS / nLoads * 1000}%.2f,"sql_count_cold_ms":${sqlS / nSql * 1000}%.1f,"sql_count_warm_ms":${sqlWarmS / nSql * 1000}%.1f}""")
  }
}
