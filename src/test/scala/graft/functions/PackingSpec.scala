package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("concat-then-chunk packing: offsets accumulate per shard, pack = offset / budget") {
    val docs = Seq(
      ("s1", 1L, 60), ("s1", 2L, 50), ("s1", 3L, 10), ("s1", 4L, 100),
      ("s2", 5L, 99), ("s2", 6L, 2)).toDF("source", "doc_id", "n_tokens")
    val out = Packing.packSequences(docs, "n_tokens", budget = 100,
        shardCol = "source", orderCol = "doc_id")
      .select("doc_id", "token_offset", "pack_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // s1: offsets 0,60,110,120 → packs 0,0,1,1; s2: offsets 0,99 → packs 0,0
    assert(out == Set((1L, 0L, 0L), (2L, 60L, 0L), (3L, 110L, 1L),
      (4L, 120L, 1L), (5L, 0L, 0L), (6L, 99L, 0L)))
  }

  test("packStats summarizes docs, tokens, and id span per pack") {
    val docs = Seq(
      ("s1", 1L, 60), ("s1", 2L, 50), ("s1", 3L, 10)).toDF("source", "doc_id", "n_tokens")
    val out = Packing.packStats(docs, "n_tokens", budget = 100,
        shardCol = "source", orderCol = "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(out == Set(("s1", 0L, 2L, 110L, 1L, 2L), ("s1", 1L, 1L, 10L, 3L, 3L)))
  }

  test("packing shuffles only on the shard key — no global sort") {
    val docs = Seq(("a", 1L, 5), ("b", 2L, 5)).toDF("source", "doc_id", "n_tokens")
    val plan = Packing.packSequences(docs, "n_tokens", 10, "source", "doc_id")
      .queryExecution.executedPlan.toString
    // one hash-partitioned window exchange; nothing range-partitions (a
    // global ORDER BY would show rangepartitioning)
    assert(plan.toLowerCase.contains("hashpartitioning"))
    assert(!plan.toLowerCase.contains("rangepartitioning"))
  }
}
