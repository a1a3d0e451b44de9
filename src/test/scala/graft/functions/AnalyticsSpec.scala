package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Unit-level edge coverage for the event-analytics and corpus-report ops
  * (their end-to-end results are oracle-checked in PipelineQueries; these
  * pin the edge semantics a hash can't explain). */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("retention cohorts by first-seen day; same-day re-activity counts once") {
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00")), (1L, ts("2024-01-01 17:00:00")), // day 0 twice
      (1L, ts("2024-01-03 10:00:00")),                                  // offset 2
      (2L, ts("2024-01-02 08:00:00")), (2L, ts("2024-01-03 08:00:00"))  // cohort Jan 2
    ).toDF("user_id", "ts")
    val r = Funnel.retention(events, "user_id", "ts", "day").collect()
      .map(x => (x.getTimestamp(0).toString.take(10), x.getInt(1), x.getLong(2))).toSet
    assert(r == Set(
      ("2024-01-01", 0, 1L), ("2024-01-01", 2, 1L),
      ("2024-01-02", 0, 1L), ("2024-01-02", 1, 1L)))
  }

  test("topPaths orders by event time, breaks ts ties by type, caps at maxLen") {
    val events = Seq(
      (1L, ts("2024-01-01 00:01:00"), "view"),
      (1L, ts("2024-01-01 00:02:00"), "click"),
      (1L, ts("2024-01-01 00:02:00"), "add"),   // tie with click → 'add' first
      (1L, ts("2024-01-01 00:03:00"), "buy"),
      (2L, ts("2024-01-01 00:01:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val paths = Funnel.topPaths(events, "user_id", "ts", "event_type", maxLen = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(paths == Map("view>add>click" -> 1L, "view" -> 1L)) // buy truncated
  }

  test("corpusCard reports size, tokens, quality, dup rate, and group counts") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank", "en", "web"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank", "en", "web"),
      (3L, "completely different content about graph algorithms and sorting", "en", "books")
    ).toDF("doc_id", "text", "lang", "source")
    val card = Profiler.corpusCard(docs, groupCols = Seq("source")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(card(("n_docs", "all")) == 3.0)
    assert(card(("docs_by_source", "web")) == 2.0)
    assert(card(("docs_by_source", "books")) == 1.0)
    // docs 1 and 2 are exact dups → 2 distinct keys of 3 docs
    assert(math.abs(card(("exact_dup_rate", "all")) - 0.3333) < 1e-3)
    assert(card(("total_tokens", "all")) > 0)
  }

  test("piiProfile localizes PII to the column carrying it") {
    val df = Seq(
      ("clean words here", "bob@x.io"),
      ("an ip 10.0.0.1 hides", "also alice@y.org")
    ).toDF("a", "b")
    val prof = Profiler.piiProfile(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(prof == Map(("a", "ips") -> 1L, ("b", "emails") -> 2L))
  }
}
