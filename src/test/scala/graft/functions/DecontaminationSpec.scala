package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** [[Curation.contamination]] / [[Curation.decontaminate]] — the
  * benchmark n-gram-overlap screen (GPT-3 appendix C / PaLM recipe). */
class DecontaminationSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def words(tag: String, n: Int): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  private val corpus = Seq(
    // doc 1 embeds benchmark item 100's full 13-gram mid-document
    (1L, words("pre", 4) + " " + words("leak", 13) + " " + words("post", 3)),
    // doc 2 embeds the SHORT benchmark item 101 (5 words)
    (2L, words("alpha", 6) + " short one two three four " + words("omega", 4)),
    // doc 3 is clean
    (3L, words("clean", 20)),
    // doc 4 embeds BOTH items
    (4L, words("leak", 13) + " x short one two three four"),
    // doc 5 shares only 12 of the 13 leak words — below the gram size
    (5L, words("leak", 12) + " " + words("tail", 5)))
    .toDF("doc_id", "text")

  private val bench = Seq(
    (100L, words("leak", 13)),
    (101L, "short one two three four"), // sub-n item: full text is the gram
    (102L, words("never", 15))) // matches nothing
    .toDF("bench_id", "text")

  test("contamination: per-doc report with exact gram matching and sub-n items") {
    val rep = Curation.contamination(corpus, bench, n = 13)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rep.toSeq == Seq(
      (1L, 1L, "100"),
      (2L, 1L, "101"),
      (4L, 2L, "100|101")))
  }

  test("decontaminate: flagged docs drop, clean docs survive") {
    val kept = Curation.decontaminate(corpus, bench, n = 13)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(3L, 5L))
  }

  test("tokenization matches the dedup family (case/punct-insensitive)") {
    val c = Seq((1L, "The LEAK1 leak2, leak3; " + (4 to 13).map(i => s"leak$i").mkString(" ")))
      .toDF("doc_id", "text")
    val rep = Curation.contamination(c, bench, n = 13).collect()
    assert(rep.length == 1 && rep.head.getString(2) == "100")
  }

  test("empty / gram-less benchmark set contaminates nothing (no crash)") {
    val empty = bench.filter(col("bench_id") === -999L)
    assert(Curation.contamination(corpus, empty, n = 13).count() == 0)
    assert(Curation.decontaminate(corpus, empty, n = 13).count() == corpus.count())
    // all-punctuation benchmark texts shingle to zero grams: same path
    val punct = Seq((1L, "!!! ??? ...")).toDF("bench_id", "text")
    assert(Curation.contamination(corpus, punct, n = 13).count() == 0)
  }

  test("idCol colliding with benchIdCol is rejected up front") {
    val e = intercept[IllegalArgumentException] {
      Curation.contamination(corpus.withColumnRenamed("doc_id", "id"),
        bench.withColumnRenamed("bench_id", "id"),
        idCol = "id", benchIdCol = "id")
    }
    assert(e.getMessage.contains("must differ"))
  }

  test("benchmark gram join is broadcast; corpus grams never shuffle before the probe") {
    // eager=false: the lazy plan — the production (eager) form checkpoints
    // the same plan, whose trace the returned frame no longer carries
    val plan = Curation.contamination(corpus, bench, n = 13, eager = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"))
  }
}
