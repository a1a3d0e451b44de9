package graft.adapter

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class DdlOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  lazy val m = new SparkMaterializer(spark)

  private def tbl(name: String, parts: Seq[String] = Nil) =
    PhysicalTable("graft__test", name, SparkTestSession.tmpDir(s"pt_$name"), parts)

  test("createTableLike produces an empty structural copy") {
    val src = tbl("ctl_src"); val dst = tbl("ctl_dst")
    m.replaceQuery(src, Seq((1, "a")).toDF("id", "v"))
    m.createTableLike(dst, src)
    val cloned = spark.table("graft__test.ctl_dst")
    assert(cloned.columns.toSeq == Seq("id", "v") && cloned.count() == 0)
  }

  test("cloneTable is zero-copy and stable across source writes") {
    val src = tbl("cl_src"); val clone = tbl("cl_clone")
    m.replaceQuery(src, Seq((1, "a"), (2, "b")).toDF("id", "v"))
    m.cloneTable(clone, src)
    assert(spark.table("graft__test.cl_clone").count() == 2)
    // source moves on; the clone still sees the version it was cut from
    m.replaceQuery(src, Seq((9, "z")).toDF("id", "v"))
    assert(spark.table("graft__test.cl_src").count() == 1)
    assert(spark.table("graft__test.cl_clone").count() == 2)
  }

  test("renameTable moves the catalog entry, keeps data") {
    val t = tbl("rn_old")
    m.replaceQuery(t, Seq((1, "a")).toDF("id", "v"))
    val renamed = m.renameTable(t, "rn_new")
    assert(spark.table("graft__test.rn_new").count() == 1)
    assert(!spark.catalog.tableExists("graft__test.rn_old"))
    assert(m.read(renamed).count() == 1)
  }

  test("migrate evolves schema in place: add null-backfilled, cast, drop") {
    val t = tbl("mig")
    m.replaceQuery(t, Seq((1, "a", 1.5), (2, "b", 2.5)).toDF("id", "v", "x"))
    val target = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, v STRING, extra STRING")
    m.migrate(t, target)
    val got = spark.table("graft__test.mig")
    assert(got.schema.fields.map(f => f.name -> f.dataType.sql).toSeq ==
      Seq("id" -> "BIGINT", "v" -> "STRING", "extra" -> "STRING"))
    assert(got.filter(col("extra").isNull).count() == 2)
  }

  test("updateWhere rewrites only matching rows") {
    val t = tbl("upd")
    m.replaceQuery(t, Seq((1, 10.0), (2, 20.0)).toDF("id", "v"))
    m.updateWhere(t, col("id") === 2, Map("v" -> lit(99.0)))
    val got = spark.table("graft__test.upd").as[(Int, Double)].collect().toSet
    assert(got == Set((1, 10.0), (2, 99.0)))
  }

  test("rollbackTo drops newer versions and restores the view") {
    val t = tbl("rb")
    m.replaceQuery(t, Seq((1, "a")).toDF("id", "v"))
    val v0 = m.currentDataDir(t)
    m.replaceQuery(t, Seq((2, "b")).toDF("id", "v"))
    assert(spark.table("graft__test.rb").as[(Int, String)].head() == ((2, "b")))
    m.rollbackTo(t, v0)
    assert(spark.table("graft__test.rb").as[(Int, String)].head() == ((1, "a")))
    // rollback to nothing drops the table entirely
    m.rollbackTo(t, None)
    assert(!spark.catalog.tableExists("graft__test.rb"))
  }

  test("clusteredBy writes sorted, key-co-located files; content unchanged") {
    val t = tbl("clu").copy(clusteredBy = Seq("k"))
    val df = (1 to 100).map(i => (s"k${i % 5}", i)).toDF("k", "v")
    m.replaceQuery(t, df)
    val got = spark.table("graft__test.clu")
    assert(got.count() == 100)
    assert(got.select("k", "v").collect().toSet == df.collect().toSet)
    // all rows of a cluster key land in ONE file (hash co-location) …
    val filesPerKey = got.select(col("k"),
        org.apache.spark.sql.functions.input_file_name().as("f"))
      .groupBy("k").agg(countDistinct("f").as("nf")).collect()
    assert(filesPerKey.forall(_.getAs[Long]("nf") == 1L))
    // … and each file is sorted by the cluster key (row-group pruning)
    val dir = m.currentDataDir(t).get
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    files.foreach { f =>
      val ks = spark.read.parquet(f.getAbsolutePath).select("k").collect().map(_.getString(0))
      assert(ks.sameElements(ks.sorted), s"file ${f.getName} not sorted")
    }
  }

  test("versions + readVersion time-travel across full replaces") {
    val t = tbl("tt")
    m.replaceQuery(t, Seq((1, "v0")).toDF("id", "s"))
    m.replaceQuery(t, Seq((1, "v1"), (2, "v1")).toDF("id", "s"))
    m.replaceQuery(t, Seq((3, "v2")).toDF("id", "s"))
    assert(m.versions(t) == Seq(0, 1, 2))
    assert(m.readVersion(t, 0).collect().map(_.getString(1)).toSeq == Seq("v0"))
    assert(m.readVersion(t, 1).count() == 2)
    // current read == latest version
    assert(m.read(t).collect().toSet == m.readVersion(t, 2).collect().toSet)
    intercept[IllegalArgumentException] { m.readVersion(t, 9) }
  }

  test("compact merges accreted small files without changing data") {
    val t = tbl("cmp")
    // simulate an append-heavy table: 20 tiny appends → ≥20 files
    m.replaceQuery(t, Seq((0, "x")).toDF("id", "s"))
    (1 to 19).foreach(i => m.insertAppend(t, Seq((i, "x")).toDF("id", "s")))
    val before = m.read(t).collect().toSet
    val (nBefore, nAfter) = m.compact(t)
    assert(nBefore >= 20 && nAfter < nBefore && nAfter <= 2,
      s"expected big file-count drop, got $nBefore -> $nAfter")
    assert(m.read(t).collect().toSet == before) // data identical
    // compaction is itself a version: the pre-compaction state time-travels
    assert(m.readVersion(t, m.versions(t).dropRight(1).last).collect().toSet == before)
  }

  test("compact honors the file-count target on CLUSTERED tables") {
    val t = PhysicalTable("graft__test", "cmpc",
      graft.SparkTestSession.tmpDir("pt_cmpc"), Nil, clusteredBy = Seq("id"))
    m.replaceQuery(t, (0 until 50).map(i => (i, "x")).toDF("id", "s"))
    (1 to 9).foreach(i =>
      m.insertAppend(t, Seq((100 + i, "x")).toDF("id", "s")))
    val before = m.read(t).collect().toSet
    val (nBefore, nAfter) = m.compact(t)
    // without the clusterFiles pass-through the cluster shuffle re-splits
    // the rewrite into spark.sql.shuffle.partitions (4 in tests) files
    assert(nAfter == 1, s"expected 1 compacted file, got $nBefore -> $nAfter")
    assert(m.read(t).collect().toSet == before)
  }
}
