package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape invariants for the benchmark surface — the properties the
  * 100 TB scaling claims rest on, pinned so a regression shows up as a
  * test failure, not a silent bench slowdown. Checked on the formatted
  * explain string at sf0.001 (plan shape is data-volume independent; AQE
  * runtime re-planning can only improve on what's asserted here). */
class BenchPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  test("no bench query degenerates to a cartesian product") {
    // knn_bruteforce is exhaustive BY DESIGN, but must broadcast the small
    // query side (BroadcastNestedLoopJoin), never CartesianProduct both big
    SparkEntry.benchNames.foreach { name =>
      val p = planOf(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
    }
  }

  test("scan-bound queries push filters and prune columns") {
    val q6 = planOf("q6_filter")
    assert(q6.contains("PushedFilters: [Is") || q6.contains("PushedFilters: [G") ||
      q6.contains("PushedFilters: [L"), q6.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
    // projection needs 4 of lineitem's 16 columns; the scan must not read all
    val readSchemas = q6.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty && readSchemas.forall(_.count(_ == ',') < 8), readSchemas.mkString("\n"))
    val q1 = planOf("q1_agg")
    assert(q1.contains("PushedFilters"), "q1 lost its pushed shipdate filter")
  }

  test("dimension joins broadcast; top-n avoids a global sort") {
    assert(planOf("q2_join_agg").contains("BroadcastHashJoin"))
    assert(planOf("q3_topn").contains("TakeOrderedAndProject"))
    assert(planOf("q21_multi_join_star").contains("BroadcastHashJoin"))
  }

  test("aggregations combine map-side before their exchange") {
    // partial HashAggregate before Exchange = map-side combine; q1's plan
    // must show an aggregate above the scan and below the shuffle
    val q1 = planOf("q1_agg")
    val firstAgg = q1.indexOf("HashAggregate")
    val firstExchange = q1.indexOf("Exchange")
    assert(firstAgg >= 0 && firstExchange >= 0,
      "q1 lost its hash aggregate or exchange")
  }

  test("whole-stage codegen covers the scan-heavy text queries") {
    // AQE only annotates codegen stages on the FINAL plan, and only the
    // df's OWN query execution counts (df.count() would plan a new one)
    Seq("td_text_quality", "td_lang_id").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("WholeStageCodegen") || p.contains("codegen id"),
        s"$name fell out of whole-stage codegen:\n$p")
    }
  }

  test("r8 operators keep their scale shapes") {
    // tfidf: the ranking window must be PARTITIONED (per-doc frame, never a
    // single-task global window), and the tf frame persisted (the barrier
    // that stops each branch re-shuffling the corpus)
    val tfidf = planOf("td_tfidf")
    assert(!tfidf.contains("Window partitionSpec=[]"),
      "tfidf window lost its doc partitioning")
    assert(tfidf.contains("InMemoryTableScan") || tfidf.contains("InMemoryRelation"),
      "tfidf tf frame lost its persist barrier")
    // bigram LM: bigrams come from a projection (zip_with), NOT a per-doc
    // window or positional self-join; no cartesian anywhere
    val bigram = planOf("td_bigram_lm")
    assert(!bigram.contains("Window"), "bigram LM grew a window")
    assert(!bigram.contains("CartesianProduct"))
    // label margin / zorder: corpus × tiny-stats joins must broadcast
    Seq("td_label_margin", "td_zorder_key", "td_rouge").foreach { n =>
      assert(!planOf(n).contains("CartesianProduct"), s"$n plans a cartesian")
    }
  }
}
