package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** AUC/calibration against brute-force ground truth, including the tie and
  * degenerate-label cases the rank algebra must get right. */
class EvalMetricsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bruteAuc(rows: Seq[(Double, Int)]): Double = {
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val u = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    u / (pos.size * neg.size)
  }

  test("AUC matches pairwise ground truth with heavy ties") {
    // quantized scores → many ties across and within classes
    val rows = (1 to 200).map { i =>
      val s = math.round((i % 7) / 7.0 * 10) / 10.0
      (s, if ((i * 31) % 5 < 2) 1 else 0)
    }
    val got = EvalMetrics.auc(rows.toDF("score", "label"), "score", "label")
      .select("auc").as[Double].head()
    assert(math.abs(got - bruteAuc(rows)) < 1e-6, s"$got vs ${bruteAuc(rows)}")
  }

  test("perfect and inverted rankings hit 1.0 and 0.0") {
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))
    assert(EvalMetrics.auc(perfect.toDF("score", "label"), "score", "label")
      .select("auc").as[Double].head() == 1.0)
    val inverted = perfect.map { case (s, y) => (s, 1 - y) }
    assert(EvalMetrics.auc(inverted.toDF("score", "label"), "score", "label")
      .select("auc").as[Double].head() == 0.0)
  }

  test("trained classifier beats hand weights on AUC (the training closes the loop)") {
    // label derived from document length; the trainer sees n_words +
    // mean_word_len (strongly informative), the hand baseline scores on
    // stopword density (uninformative for length) — training must learn a
    // ranking the hand weights can't reach
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val label = when(col("n_chars") >= 300, 1.0).otherwise(0.0)
    val trained = TextFunctions.trainQualityClassifier(
      docs, label, Seq("n_words", "mean_word_len"), iterations = 10, lr = 2.0)
    assert(trained.features == Seq("n_words", "mean_word_len"))
    assert(trained.weights.exists(_ != 0.0), "training moved no weight")
    def aucOf(score: org.apache.spark.sql.Column): Double =
      EvalMetrics.auc(docs.select(score.as("score"),
          label.cast("int").as("label")), "score", "label")
        .select("auc").as[Double].head()
    val aucTrained = aucOf(trained.score(col("text")))
    val aucHand = aucOf(TextFunctions.classifierScore(col("text"),
      Map("stopword_hits" -> 0.3), bias = -0.5))
    assert(aucTrained >= aucHand,
      s"trained AUC $aucTrained < hand AUC $aucHand")
    assert(aucTrained > 0.9, s"trained AUC $aucTrained — label should be learnable")
    // determinism: the same fixed-iteration run reproduces the weights
    val again = TextFunctions.trainQualityClassifier(
      docs, label, Seq("n_words", "mean_word_len"), iterations = 10, lr = 2.0)
    assert(again == trained)
  }

  test("single-class labels yield null AUC (0/0), not a crash") {
    val onlyPos = Seq((0.9, 1), (0.1, 1))
    val row = EvalMetrics.auc(onlyPos.toDF("score", "label"), "score", "label").head()
    assert(row.isNullAt(0) && row.getLong(1) == 2 && row.getLong(2) == 0)
  }

  test("calibration bins cover [0,1] with score 1.0 clamped into the top bin") {
    val rows = Seq((0.0, 0), (0.05, 0), (0.95, 1), (1.0, 1))
    val bins = EvalMetrics.calibration(rows.toDF("score", "label"),
      "score", "label", bins = 10).orderBy("bin").collect()
    assert(bins.map(_.getInt(0)).toSeq == Seq(0, 9))
    assert(bins.last.getLong(1) == 2) // 0.95 and the clamped 1.0
    // weighted |gap| = ECE ingredients present
    assert(bins.forall(r => !r.isNullAt(4)))
  }

  test("averagePrecision: step-integrated PR curve, hand-checked") {
    // scores desc: 0.9(+), 0.8(-), 0.7(+), 0.6(-)
    // thresholds: k1 P=1/1 ΔR=1/2; k3 P=2/3 ΔR=1/2 → AP = 0.5 + 0.3333…
    val rows = Seq((0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0))
    val r = EvalMetrics.averagePrecision(rows.toDF("score", "label"),
      "score", "label").head()
    assert(r.getDouble(0) == 0.833333 && r.getLong(1) == 2 && r.getLong(2) == 2)
    // perfect ranking → AP 1; inverted ranking < 0.5 for balanced classes
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))
    assert(EvalMetrics.averagePrecision(perfect.toDF("score", "label"),
      "score", "label").head().getDouble(0) == 1.0)
    // single-class input: undefined → null, like auc — BOTH directions
    // (an all-positive set must not score a meaningless 1.0)
    val onlyNeg = Seq((0.9, 0), (0.1, 0))
    assert(EvalMetrics.averagePrecision(onlyNeg.toDF("score", "label"),
      "score", "label").head().isNullAt(0))
    val onlyPos = Seq((0.9, 1), (0.1, 1))
    assert(EvalMetrics.averagePrecision(onlyPos.toDF("score", "label"),
      "score", "label").head().isNullAt(0))
  }

  test("ngramOverlap n=1: clipped counts, empty side yields null metric") {
    val pairs = Seq(
      (1L, "the cat sat", "the cat ran"), // overlap {the,cat} = 2/3 each way
      (2L, "a a a", "a b"),               // clipping: min(3,1)=1
      (3L, "", "x y"),                    // no cand grams → precision null
      (4L, "", ""),                       // both empty → row kept, all null
      (5L, "a b", "c d")                  // zero overlap, both non-empty → F1 0
    ).toDF("pair_id", "cand", "ref")
    val out = EvalMetrics.ngramOverlap(pairs, n = 1).orderBy("pair_id").collect()
    val r1 = out(0)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) == ((3L, 3L, 2L)))
    assert(r1.getDouble(4) == 0.6667 && r1.getDouble(5) == 0.6667 &&
      r1.getDouble(6) == 0.6667)
    val r2 = out(1)
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(3)) == ((3L, 2L, 1L)))
    assert(r2.getDouble(4) == 0.3333 && r2.getDouble(5) == 0.5 &&
      r2.getDouble(6) == 0.4)
    val r3 = out(2)
    assert((r3.getLong(1), r3.getLong(2), r3.getLong(3)) == ((0L, 2L, 0L)))
    assert(r3.isNullAt(4) && r3.getDouble(5) == 0.0 && r3.isNullAt(6))
    // both-sides-empty pair still reports (would otherwise vanish and
    // silently shrink corpus means)
    val r4 = out(3)
    assert((r4.getLong(1), r4.getLong(2), r4.getLong(3)) == ((0L, 0L, 0L)))
    assert(r4.isNullAt(4) && r4.isNullAt(5) && r4.isNullAt(6))
    // zero overlap with both sides non-empty is a DEFINED score: F1 = 0
    val r5 = out(4)
    assert((r5.getLong(1), r5.getLong(2), r5.getLong(3)) == ((2L, 2L, 0L)))
    assert(r5.getDouble(4) == 0.0 && r5.getDouble(5) == 0.0 && r5.getDouble(6) == 0.0)
  }

  test("ngramOverlap n=2 forms bigrams; short sides produce no grams") {
    val pairs = Seq(
      (1L, "a b c", "b c d"),  // cand {a b, b c}, ref {b c, c d} → overlap 1
      (2L, "solo", "x y")      // 1-token cand: zero bigrams
    ).toDF("pair_id", "cand", "ref")
    val out = EvalMetrics.ngramOverlap(pairs, n = 2).orderBy("pair_id").collect()
    val r1 = out(0)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) == ((2L, 2L, 1L)))
    assert(r1.getDouble(4) == 0.5 && r1.getDouble(5) == 0.5 && r1.getDouble(6) == 0.5)
    val r2 = out(1)
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(3)) == ((0L, 1L, 0L)))
    assert(r2.isNullAt(4))
  }
}
