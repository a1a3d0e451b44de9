package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions._

/** Plan-shape contracts: the properties that decide 100 TB behavior, pinned
  * as tests so a refactor can't silently regress them. Wall-clock at small SF
  * proves nothing about scale; the PLAN (shuffle count, broadcast choice,
  * column pruning, filter pushdown) is what survives a 1000× scale-up, so
  * that is what gets asserted.
  */
class PlanQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Count data shuffles (broadcast exchanges excluded — they're the cheap
    * alternative the assertions exist to protect). */
  private def shuffles(df: DataFrame): Int =
    "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findAllIn(planOf(df)).length

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  test("scan-speed curation ops are shuffle-free projections") {
    // classifier inference, hash sampling, split assignment, PII scrub,
    // quality scoring: one codegen'd pass over the scan, zero exchanges
    val zeroShuffle = Seq(
      docs.select(TextFunctions.classifierScore(col("text"),
        Map("n_words" -> 0.1), bias = 0.0)),
      Sampling.sample(docs, "doc_id", 0.25),
      Sampling.split(docs, "doc_id", Seq("train" -> 0.9, "test" -> 0.1)),
      docs.select(TextFunctions.scrubPii(col("text"))),
      docs.select(TextFunctions.qualityScore(col("text"))),
      docs.select(TextFunctions.fingerprint(col("text"))),
      docs.select(TextFunctions.segmentFilter(col("text"))),
      docs.select(TextFunctions.gopherQuality(col("text"))))
    zeroShuffle.zipWithIndex.foreach { case (df, i) =>
      assert(shuffles(df) == 0, s"op $i shuffles:\n${planOf(df)}")
    }
  }

  test("classifier scan prunes to exactly the referenced columns") {
    val df = docs.select(col("doc_id"),
      TextFunctions.classifierScore(col("text"), Map("n_chars" -> 1.0)))
    val f = formatted(df)
    assert(f.contains("ReadSchema: struct<doc_id:bigint,text:string>"), f)
  }

  test("token-budget mixing broadcasts its per-group rates") {
    val df = Sampling.tokenBudgetMix(docs, "doc_id", "source", col("n_chars"),
      Map("src0" -> 1000L))
    val p = planOf(df)
    assert(p.contains("BroadcastExchange"), p)
    // corpus-side cost: the tiny totals agg shuffles, the corpus never does
    assert(shuffles(df) <= 2, p)
  }

  test("minhash signatures cost exactly one shuffle (the id groupBy)") {
    val df = Dedup.minhash(docs, "text", "doc_id", shingleN = 3, k = 16)
    assert(shuffles(df) == 1, planOf(df))
  }

  test("shard export's only shuffle is the per-shard position window") {
    val df = Sampling.shardAssign(docs.select("doc_id"), "doc_id", nShards = 8)
    assert(shuffles(df) == 1, planOf(df))
  }

  test("q6 pushes its filters into the parquet scan and prunes columns") {
    val f = formatted(SparkEntry.queries("q6_filter")(spark, sf))
    assert(f.contains("PushedFilters: [IsNotNull"), f)
    // the lineitem scan must not read columns the query never touches
    assert(!f.contains("l_comment"), f)
  }

  test("dimension joins in q2 broadcast the small sides") {
    val df = SparkEntry.queries("q2_join_agg")(spark, sf)
    assert(planOf(df).contains("BroadcastExchange"), planOf(df))
  }

  test("exact dedup is one hash-shuffle with map-side partial aggregation") {
    val df = Dedup.exact(docs)
    val p = planOf(df)
    assert(shuffles(df) == 1, p)
    // partial_min/partial_count before the exchange = map-side combine
    assert(p.contains("partial_min") || p.contains("partial_count"), p)
  }

  test("unigramLogProb is one lazy plan with broadcast smoothing constants") {
    val df = graft.functions.TextFunctions.unigramLogProb(docs)
    val p = planOf(df)
    // the smoothing denominator joins in via a BROADCAST of the one-row
    // stats aggregate - no driver-side count() actions (each was a full
    // corpus pass before r5); the whole computation is ONE Spark job
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    // shuffles: vocab groupBy + tok-vocab join + per-doc groupBy + the
    // one-row stats aggregate; anything more means a regression to extra
    // corpus passes
    assert(shuffles(df) <= 5, p)
  }
}
