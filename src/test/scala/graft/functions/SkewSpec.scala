package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedJoin matches a plain join") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i)).toDF("k", "v")
    val small = Seq(("hot", 100), ("k1", 1), ("k2", 2)).toDF("k", "w")
    val plain = big.join(small, Seq("k")).select("k", "v", "w").collect().toSet
    val salted = Skew.saltedJoin(big, small, Seq("k"), buckets = 8)
      .select("k", "v", "w").collect().toSet
    assert(salted == plain && salted.nonEmpty)
  }

  test("saltedJoin left join keeps unmatched big-side rows exactly once") {
    val big = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val small = Seq(("a", 10)).toDF("k", "w")
    val out = Skew.saltedJoin(big, small, Seq("k"), buckets = 4, joinType = "left")
      .select("k", "v", "w").collect().map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2))).toSet
    assert(out == Set(("a", 1, 10), ("b", 2, -1), ("c", 3, -1)))
  }

  test("saltedAgg equals direct aggregation") {
    val df = (1 to 500).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "v")
    val direct = df.groupBy("g").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(df, Seq("g"), buckets = 7,
      partialAggs = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      finalAggs = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salt is deterministic") {
    val df = Seq(("a", 1), ("a", 2)).toDF("k", "v")
    val s1 = df.withColumn("s", Skew.salt(16, Seq(col("v")))).collect().map(_.getInt(2)).toSeq
    val s2 = df.withColumn("s", Skew.salt(16, Seq(col("v")))).collect().map(_.getInt(2)).toSeq
    assert(s1 == s2)
  }

  test("Dedup.clusters finds connected components (chain + separate + isolated-pair)") {
    // chain 1-2-3-4, pair 10-11, pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (21L, 20L))
      .toDF("id_a", "id_b")
    val got = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("Dedup.canonicalize keeps the best-scored member per cluster") {
    val docs = Seq((1L, 10), (2L, 50), (3L, 20), (9L, 7)).toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.canonicalize(docs, pairs, score = col("quality")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // cluster {1,2,3}: doc 2 (quality 50) kept; doc 9 is a singleton, kept
    assert(got == Map(1L -> ((1L, false)), 2L -> ((1L, true)),
      3L -> ((1L, false)), 9L -> ((9L, true))))
  }

  test("Funnel.funnel enforces strict step ordering") {
    def ts(x: String) = java.sql.Timestamp.valueOf(x)
    val ev = Seq(
      // u1 completes all 3 in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "buy"),
      // u2: click BEFORE first view doesn't count; no later click → depth 1
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // u3: never views → absent from the funnel
      (3L, ts("2024-01-01 10:00:00"), "buy")
    ).toDF("u", "ts", "t")
    val out = Funnel.funnel(ev, "u", "ts", "t", Seq("view", "click", "buy"))
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("depth")).toMap
    assert(out == Map(1L -> 3, 2L -> 1))
  }
}
