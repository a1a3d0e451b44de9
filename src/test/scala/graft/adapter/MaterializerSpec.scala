package graft.adapter

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.core.ModelKind

class MaterializerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  lazy val m = new SparkMaterializer(spark)

  private def tbl(name: String, parts: Seq[String] = Nil) =
    PhysicalTable("graft__test", name, SparkTestSession.tmpDir(s"pt_$name"), parts)

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("replaceQuery creates, replaces, and repoints the view") {
    val t = tbl("rq")
    m.replaceQuery(t, Seq((1, "a"), (2, "b")).toDF("id", "v"))
    assert(spark.table(s"graft__test.rq").count() == 2)
    m.replaceQuery(t, Seq((3, "c")).toDF("id", "v"))
    assert(spark.table(s"graft__test.rq").as[(Int, String)].collect().toSet == Set((3, "c")))
  }

  test("insertAppend appends into current version") {
    val t = tbl("ia")
    m.insertAppend(t, Seq((1, "a")).toDF("id", "v"))
    m.insertAppend(t, Seq((2, "b")).toDF("id", "v"))
    assert(m.read(t).count() == 2)
  }

  test("insertOverwriteByTimePartition is idempotent and interval-scoped") {
    val t = tbl("iow", Seq("ds"))
    def rows(day: Int, v: String) = Seq(
      (ts(f"2024-01-$day%02d 05:00:00"), v, f"2024-01-$day%02d")
    ).toDF("ts", "v", "ds")
    val d1 = 19723L * 86400000L // 2024-01-01
    m.insertOverwriteByTimePartition(t, rows(1, "x"), "ts", d1, d1 + 86400000L)
    m.insertOverwriteByTimePartition(t, rows(2, "y"), "ts", d1 + 86400000L, d1 + 2 * 86400000L)
    assert(m.read(t).count() == 2)
    // re-run day 1 with new value: replaces, not duplicates
    m.insertOverwriteByTimePartition(t, rows(1, "x2"), "ts", d1, d1 + 86400000L)
    val got = m.read(t).select("v").as[String].collect().toSet
    assert(got == Set("x2", "y"))
    // out-of-interval rows are filtered (enforced predicate guard)
    m.insertOverwriteByTimePartition(t, rows(3, "z"), "ts", d1, d1 + 86400000L)
    assert(!m.read(t).select("v").as[String].collect().contains("z"))
  }

  test("insertOverwriteByTimePartition works unpartitioned (delete+insert)") {
    val t = tbl("iow_np")
    val d1 = 19723L * 86400000L
    val df1 = Seq((ts("2024-01-01 01:00:00"), "a"), (ts("2024-01-02 01:00:00"), "b"))
      .toDF("ts", "v")
    m.insertOverwriteByTimePartition(t, df1, "ts", d1, d1 + 2 * 86400000L)
    m.insertOverwriteByTimePartition(t,
      Seq((ts("2024-01-01 09:00:00"), "a2")).toDF("ts", "v"), "ts", d1, d1 + 86400000L)
    assert(m.read(t).select("v").as[String].collect().toSet == Set("a2", "b"))
  }

  test("merge upserts on unique key") {
    val t = tbl("mg")
    m.merge(t, Seq((1, "a", 10), (2, "b", 20)).toDF("id", "v", "x"), Seq("id"))
    m.merge(t, Seq((2, "b2", 21), (3, "c", 30)).toDF("id", "v", "x"), Seq("id"))
    val got = m.read(t).as[(Int, String, Int)].collect().toSet
    assert(got == Set((1, "a", 10), (2, "b2", 21), (3, "c", 30)))
  }

  test("merge dedups source by key before upsert") {
    val t = tbl("mg_dup")
    m.merge(t, Seq((1, "a")).toDF("id", "v"), Seq("id"))
    m.merge(t, Seq((1, "new1"), (1, "new2")).toDF("id", "v"), Seq("id"))
    assert(m.read(t).count() == 1)
  }

  test("partition-pruned merge rewrites only source partitions") {
    val t = tbl("mg_part", Seq("ds"))
    m.merge(t, Seq((1, "a", "d1"), (2, "b", "d2")).toDF("id", "v", "ds"), Seq("id"))
    m.merge(t, Seq((2, "b2", "d2")).toDF("id", "v", "ds"), Seq("id"))
    val got = m.read(t).select("id", "v").as[(Int, String)].collect().toSet
    assert(got == Set((1, "a"), (2, "b2")))
  }

  test("pruned merge with mergeFilter keeps out-of-scope rows in touched partitions") {
    // ADVICE r02 (high): the partition-pruned path rewrites whole partitions,
    // so rows of a touched partition that FAIL the mergeFilter must survive
    // the rewrite (they are outside merge scope, not deletable collateral)
    val t = tbl("mg_scope", Seq("ds"))
    m.merge(t, Seq((1, "keep-old", "d1"), (2, "b", "d1"), (3, "c", "d2"))
      .toDF("id", "v", "ds"), Seq("id"))
    // scope = id >= 2 only; partition d1 is touched by the source, and its
    // out-of-scope row id=1 must come through unchanged
    m.merge(t, Seq((2, "b2", "d1")).toDF("id", "v", "ds"), Seq("id"),
      mergeFilter = Some(col("id") >= 2))
    val got = m.read(t).select("id", "v").as[(Int, String)].collect().toSet
    assert(got == Set((1, "keep-old"), (2, "b2"), (3, "c")))
  }

  test("pruned and full merge paths converge identically under random waves") {
    // the partition-pruned path (partition ⊆ key) must be indistinguishable
    // from the plain full-rewrite path for any upsert sequence
    val rnd = new scala.util.Random(7)
    val pruned = tbl("mg_eq_p", Seq("id"))   // partitioned on the key → pruned path
    val full = tbl("mg_eq_f")                // unpartitioned → full rewrite path
    var expected = Map.empty[Int, String]
    for (wave <- 1 to 5) {
      val src = (1 to 50).flatMap { k =>
        if (rnd.nextDouble() < 0.4) Some((k, s"w${wave}_$k")) else None
      }
      val df = src.toDF("id", "v")
      m.merge(pruned, df, Seq("id"))
      m.merge(full, df, Seq("id"))
      expected ++= src.toMap
      val gotP = m.read(pruned).select("id", "v").as[(Int, String)].collect().toMap
      val gotF = m.read(full).select("id", "v").as[(Int, String)].collect().toMap
      assert(gotP == expected, s"wave $wave pruned diverged")
      assert(gotF == expected, s"wave $wave full diverged")
    }
  }

  val scdKind = ModelKind.ScdType2ByTime(uniqueKey = Seq("id"))

  test("SCD2-by-time plan: no mandatory broadcast of the closed history") {
    // VERDICT r5 #1: a forced broadcast(latestDeleted) OOMs at 100 TB — the
    // closed history's key cardinality is unbounded. Pin that the plan carries
    // no broadcast hint (AQE picks the strategy) and that the history side is
    // pruned by a semi-join to the inserted keys before aggregation.
    val t = tbl("scd_plan")
    m.scdType2ByTime(t, Seq((1, "a", ts("2024-01-01 00:00:00"))).toDF("id", "st", "updated_at"),
      scdKind, ts("2024-01-01 12:00:00"))
    m.scdType2ByTime(t, Seq((1, "b", ts("2024-01-02 00:00:00"))).toDF("id", "st", "updated_at"),
      scdKind, ts("2024-01-02 12:00:00")) // closes a row: history is non-empty
    val frame = m.scd2ByTimeFrame(t,
      Seq((2, "c", ts("2024-01-03 00:00:00"))).toDF("id", "st", "updated_at"),
      scdKind, ts("2024-01-03 12:00:00"))
    val analyzed = frame.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"), s"broadcast hint leaked into SCD2 plan:\n$analyzed")
    assert(analyzed.contains("LeftSemi"), s"closed history not semi-join pruned:\n$analyzed")
  }

  test("SCD2-by-time: a legitimately-NULL key column is a real row, not an absence") {
    // ADVICE r02: presence after the full-outer join comes from explicit
    // `_exists` markers, never from key-column nullness
    val t = tbl("scd_nullkey")
    val src1 = Seq((Option(1), "a", ts("2024-01-01 00:00:00")),
      (Option.empty[Int], "nullkey", ts("2024-01-01 00:00:00")))
      .toDF("id", "st", "updated_at")
    m.scdType2ByTime(t, src1, scdKind, ts("2024-01-01 12:00:00"))
    assert(m.read(t).count() == 2) // the NULL-keyed row materialized
    // second run updates the NULL-keyed row: null-safe key join matches it
    val src2 = Seq((Option(1), "a", ts("2024-01-01 00:00:00")),
      (Option.empty[Int], "nullkey-v2", ts("2024-01-03 00:00:00")))
      .toDF("id", "st", "updated_at")
    m.scdType2ByTime(t, src2, scdKind, ts("2024-01-03 12:00:00"))
    val nullRows = m.read(t).filter($"id".isNull).orderBy("valid_from")
      .select("st", "valid_to").as[(String, Option[java.sql.Timestamp])].collect()
    assert(nullRows.toSeq == Seq(
      ("nullkey", Some(ts("2024-01-03 00:00:00"))), ("nullkey-v2", None)))
    // and the non-null key was never misclassified as deleted
    assert(m.read(t).filter($"id" === 1 && $"valid_to".isNull).count() == 1)
  }

  test("SCD2-by-time: brand-new keys on INCREMENTAL runs open at epoch 0 (base.py:1909-1919)") {
    // ADVICE r02: without updated_at_as_valid_from, a key first seen on a
    // later run still opens at epoch 0 (full history assumed), NOT at its
    // updated_at — that rule is reserved for updated_at_as_valid_from
    val t = tbl("scd_newkey")
    m.scdType2ByTime(t, Seq((1, "a", ts("2024-01-01 00:00:00"))).toDF("id", "st", "updated_at"),
      scdKind, ts("2024-01-01 12:00:00"))
    m.scdType2ByTime(t, Seq((1, "a", ts("2024-01-01 00:00:00")),
      (2, "new", ts("2024-01-05 00:00:00"))).toDF("id", "st", "updated_at"),
      scdKind, ts("2024-01-05 12:00:00"))
    val vf = m.read(t).filter($"id" === 2).select("valid_from")
      .as[java.sql.Timestamp].head()
    assert(vf == ts("1970-01-01 00:00:00"))
  }

  test("SCD2-by-time: initial load opens rows at epoch 0 (base.py:1916)") {
    val t = tbl("scd_init")
    val src = Seq((1, "a", ts("2024-01-01 00:00:00"))).toDF("id", "st", "updated_at")
    m.scdType2ByTime(t, src, scdKind, ts("2024-01-05 00:00:00"))
    val row = m.read(t).select("valid_from", "valid_to")
      .as[(java.sql.Timestamp, Option[java.sql.Timestamp])].head()
    assert(row._1 == ts("1970-01-01 00:00:00") && row._2.isEmpty)
  }

  test("SCD2-by-time: update closes old row at new updated_at, opens new") {
    val t = tbl("scd_upd")
    m.scdType2ByTime(t, Seq((1, "a", ts("2024-01-01 00:00:00"))).toDF("id", "st", "updated_at"),
      scdKind, ts("2024-01-01 12:00:00"))
    m.scdType2ByTime(t, Seq((1, "b", ts("2024-01-03 00:00:00"))).toDF("id", "st", "updated_at"),
      scdKind, ts("2024-01-03 12:00:00"))
    val rows = m.read(t).orderBy("valid_from")
      .select("st", "valid_from", "valid_to")
      .as[(String, java.sql.Timestamp, Option[java.sql.Timestamp])].collect()
    assert(rows.length == 2)
    assert(rows(0) == (("a", ts("1970-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")))))
    assert(rows(1) == (("b", ts("2024-01-03 00:00:00"), None)))
  }

  test("SCD2-by-time: stale source rows (updated_at <= target) do not create versions") {
    val t = tbl("scd_stale")
    m.scdType2ByTime(t, Seq((1, "a", ts("2024-01-02 00:00:00"))).toDF("id", "st", "updated_at"),
      scdKind, ts("2024-01-02 12:00:00"))
    m.scdType2ByTime(t, Seq((1, "zzz", ts("2024-01-02 00:00:00"))).toDF("id", "st", "updated_at"),
      scdKind, ts("2024-01-03 12:00:00"))
    val rows = m.read(t).collect()
    assert(rows.length == 1 && rows(0).getAs[String]("st") == "a")
  }

  test("SCD2-by-time: hard delete closes at execution ts; re-insert starts at max(del_ts, updated_at) (base.py:1921)") {
    val t = tbl("scd_del")
    m.scdType2ByTime(t, Seq((1, "a", ts("2024-01-01 00:00:00"))).toDF("id", "st", "updated_at"),
      scdKind, ts("2024-01-01 12:00:00"))
    // key disappears → closed at execution time
    m.scdType2ByTime(t, Seq((2, "other", ts("2024-01-02 00:00:00"))).toDF("id", "st", "updated_at"),
      scdKind, ts("2024-01-02 12:00:00"))
    val closed = m.read(t).filter($"id" === 1).select("valid_to")
      .as[Option[java.sql.Timestamp]].head()
    assert(closed.contains(ts("2024-01-02 12:00:00")))
    // key reappears with updated_at BEFORE the delete ts → valid_from = delete ts
    m.scdType2ByTime(t, Seq((1, "back", ts("2024-01-02 00:00:00")),
      (2, "other", ts("2024-01-02 00:00:00"))).toDF("id", "st", "updated_at"),
      scdKind, ts("2024-01-03 12:00:00"))
    val reborn = m.read(t).filter($"id" === 1 && $"valid_to".isNull)
      .select("st", "valid_from").as[(String, java.sql.Timestamp)].head()
    assert(reborn == (("back", ts("2024-01-02 12:00:00"))))
  }

  test("SCD2-by-column: null-safe change detection on check columns") {
    val t = tbl("scd_col")
    val kind = ModelKind.ScdType2ByColumn(uniqueKey = Seq("id"), checkColumns = Seq("st"))
    m.scdType2ByColumn(t, Seq((1, Option("a"), 100)).toDF("id", "st", "ignored"),
      kind, ts("2024-01-01 00:00:00"))
    // ignored column changes → no new version
    m.scdType2ByColumn(t, Seq((1, Option("a"), 999)).toDF("id", "st", "ignored"),
      kind, ts("2024-01-02 00:00:00"))
    assert(m.read(t).count() == 1)
    // st → null IS a change (null-safe <=>)
    m.scdType2ByColumn(t, Seq((1, Option.empty[String], 999)).toDF("id", "st", "ignored"),
      kind, ts("2024-01-03 00:00:00"))
    val rows = m.read(t).orderBy("valid_from").select("st", "valid_to")
      .as[(Option[String], Option[java.sql.Timestamp])].collect()
    assert(rows.length == 2)
    assert(rows(0) == ((Some("a"), Some(ts("2024-01-03 00:00:00")))))
    assert(rows(1) == ((None, None)))
  }

  test("promote/demote manage environment views") {
    val t = tbl("pv")
    m.replaceQuery(t, Seq((1, "a")).toDF("id", "v"))
    m.promote("test__dev", "pv_view", t)
    assert(spark.table("test__dev.pv_view").count() == 1)
    m.demote("test__dev", "pv_view")
    assert(!spark.catalog.tableExists("test__dev.pv_view"))
  }

  test("deleteWhere removes matching rows copy-on-write") {
    val t = tbl("dw")
    m.replaceQuery(t, Seq((1, "a"), (2, "b")).toDF("id", "v"))
    m.deleteWhere(t, col("id") === 1)
    assert(m.read(t).as[(Int, String)].collect().toSet == Set((2, "b")))
  }

  test("merge honors custom when-matched update clauses (base.py when_matched)") {
    val t = tbl("wm")
    m.replaceQuery(t, Seq((1, 10.0, "keep1"), (2, 20.0, "keep2")).toDF("id", "v", "tag"))
    // matched rows: v accumulates (t.v + s.v), tag keeps the TARGET value;
    // unmatched rows insert as-is
    m.merge(t, Seq((2, 5.0, "newtag"), (3, 30.0, "tag3")).toDF("id", "v", "tag"),
      keys = Seq("id"),
      whenMatchedUpdate = Map("v" -> (col("t_v") + col("s_v"))))
    val got = spark.table("graft__test.wm").as[(Int, Double, String)].collect().toSet
    assert(got == Set((1, 10.0, "keep1"), (2, 25.0, "keep2"), (3, 30.0, "tag3")))
  }

  test("merge honors when-matched DELETE (base.py when_matched then-delete)") {
    val t = tbl("wmd")
    m.replaceQuery(t, Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("id", "v"))
    // source touches 1 (delete: s_v < 0 tombstone), 2 (plain upsert), 4 (insert)
    m.merge(t, Seq((1, -1.0), (2, 25.0), (4, 40.0)).toDF("id", "v"),
      keys = Seq("id"),
      whenMatchedDelete = Some(col("s_v") < 0))
    val got = spark.table("graft__test.wmd").as[(Int, Double)].collect().toSet
    assert(got == Set((2, 25.0), (3, 30.0), (4, 40.0)))
  }

  test("SCD2-by-time: updated_at_as_valid_from opens new keys at their updated_at (base.py:1904)") {
    val t = tbl("scd_uavf")
    val kind = scdKind.copy(updatedAtAsValidFrom = true)
    m.scdType2ByTime(t, Seq((1, "a", ts("2024-01-05 00:00:00"))).toDF("id", "st", "updated_at"),
      kind, ts("2024-01-05 12:00:00"))
    assert(m.read(t).select("valid_from").as[java.sql.Timestamp].head() ==
      ts("2024-01-05 00:00:00"))
    // a later brand-new key also opens at its own updated_at, not epoch 0
    m.scdType2ByTime(t, Seq((1, "a", ts("2024-01-05 00:00:00")),
      (2, "b", ts("2024-01-06 00:00:00"))).toDF("id", "st", "updated_at"),
      kind, ts("2024-01-06 12:00:00"))
    assert(m.read(t).filter($"id" === 2).select("valid_from")
      .as[java.sql.Timestamp].head() == ts("2024-01-06 00:00:00"))
  }

  test("SCD2-by-time: invalidate_hard_deletes=false keeps vanished keys open (base.py:1921)") {
    val t = tbl("scd_keep")
    val kind = scdKind.copy(invalidateHardDeletes = false)
    m.scdType2ByTime(t, Seq((1, "a", ts("2024-01-01 00:00:00"))).toDF("id", "st", "updated_at"),
      kind, ts("2024-01-01 12:00:00"))
    m.scdType2ByTime(t, Seq((2, "b", ts("2024-01-02 00:00:00"))).toDF("id", "st", "updated_at"),
      kind, ts("2024-01-02 12:00:00"))
    // key 1 vanished from the source but stays an open row
    val open1 = m.read(t).filter($"id" === 1).select("valid_to")
      .as[Option[java.sql.Timestamp]].head()
    assert(open1.isEmpty)
  }

  test("rowDiffSamples categorizes s_only/t_only/diff with side-by-side values") {
    val src = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    val tgt = Seq((2, "b"), (3, "CHANGED"), (4, "d")).toDF("id", "v")
    val rows = TableDiff.rowDiffSamples(src, tgt, Seq("id"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSet == Set(("s_only", "1"), ("diff", "3"), ("t_only", "4")))
  }
}
