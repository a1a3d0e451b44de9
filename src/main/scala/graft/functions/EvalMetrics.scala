package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed classifier-evaluation metrics — the "did my quality filter
  * actually work" step of a training-data pipeline (a trained filter is
  * only as good as its measured ranking quality on held-out labels, and at
  * corpus scale the evaluation itself must be a Spark job).
  *
  * Everything here is rank/aggregate algebra: one sort-shuffle for AUC,
  * one hash-shuffle for the calibration table. No per-row UDFs, no
  * driver-side score vectors.
  */
object EvalMetrics {

  /** ROC AUC via the Mann-Whitney U statistic:
    * AUC = (Σ rank⁺ − P(P+1)/2) / (P·N), with average ranks over score
    * ties (the standard tie correction, identical to sklearn's
    * `roc_auc_score`).
    *
    * Scale shape: the corpus first collapses to its SCORE DISTRIBUTION
    * (one hash-shuffle groupBy on the score — classifier scores are
    * quantized, e.g. [[TextFunctions.classifierScore]] rounds to 4
    * decimals, so this is ≤ ~10⁴ rows regardless of corpus size); the
    * global-order cumulative sum then runs over that tiny frame, never
    * over the corpus. A naive `rank() OVER (ORDER BY score)` on the raw
    * rows would funnel 100 TB through one window task. For unbounded-
    * precision scores, quantize first (round) — the tie-corrected rank
    * algebra stays exact for whatever precision is kept.
    * Returns a 1-row DataFrame (auc, n_pos, n_neg). */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = df.select(
      col(scoreCol).cast("double").as("__s"),
      col(labelCol).cast("int").as("__y"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__p"))
    // cumulative count up to and including each score group; the group's
    // average rank = cum − (n−1)/2 (midpoint of its rank run)
    val cum = g.withColumn("__cum",
      sum(col("__n")).over(Window.orderBy(col("__s"))))
    cum.agg(
      sum(col("__p") * (col("__cum") - (col("__n") - 1) / 2.0)).as("__sum_r_pos"),
      sum(col("__p")).as("n_pos"),
      (sum(col("__n")) - sum(col("__p"))).as("n_neg"))
      .select(
        // try_divide: single-class input (P or N = 0) is undefined AUC →
        // null, not an ANSI divide-by-zero error
        round(try_divide(
          col("__sum_r_pos") - col("n_pos") * (col("n_pos") + 1) / 2.0,
          col("n_pos") * col("n_neg")), 6).as("auc"),
        col("n_pos"), col("n_neg"))
  }

  /** Average precision (area under the precision–recall curve by step
    * integration): `AP = Σ_k ΔR_k · P_k` over distinct score thresholds
    * descending — the ranking metric that, unlike ROC AUC, stays honest
    * under the extreme class imbalance of corpus quality filtering (tiny
    * positive rates make ROC look great while precision is terrible).
    *
    * Same scale shape as [[auc]]: the corpus collapses to its quantized
    * SCORE DISTRIBUTION first (one hash-shuffle, ≤ ~10⁴ rows), the
    * cumulative window then runs over that tiny frame — never a
    * corpus-wide single-task window. Returns (ap, n_pos, n_neg); single
    * class → null AP. */
  def averagePrecision(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = df.select(
      col(scoreCol).cast("double").as("__s"),
      col(labelCol).cast("int").as("__y"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__p"))
    val w = Window.orderBy(col("__s").desc)
    val c = g.select(col("__n"), col("__p"),
      sum(col("__p")).over(w).as("__tp"),
      sum(col("__n")).over(w).as("__cnt"))
    c.agg(
      // Σ (p_k / P) · (tp_k / cnt_k): ΔR at threshold k times precision@k
      sum(col("__p") * col("__tp") / col("__cnt")).as("__num"),
      sum(col("__p")).as("n_pos"),
      (sum(col("__n")) - sum(col("__p"))).as("n_neg"))
      .select(
        // single-class input (P or N = 0) is undefined, like auc: a set
        // with no negatives would otherwise score a meaningless 1.0
        when(col("n_neg") === 0, lit(null).cast("double"))
          .otherwise(round(try_divide(col("__num"), col("n_pos")), 6)).as("ap"),
        col("n_pos"), col("n_neg"))
  }

  /** Reliability (calibration) table: scores bucketed into `bins` equal-width
    * bins over [0,1]; each row reports the bin's mean predicted score vs the
    * observed positive rate and its share of the corpus. The gap column is
    * the per-bin calibration error — weighted-summing |gap| gives ECE.
    * One hash-shuffle on the bin id. */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
                  bins: Int = 10): DataFrame = {
    val s = col(scoreCol).cast("double")
    val bin = least(floor(s * bins).cast("int"), lit(bins - 1))
    df.select(bin.as("bin"), s.as("__s"), col(labelCol).cast("double").as("__y"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("__s")), 6).as("mean_score"),
        round(avg(col("__y")), 6).as("pos_rate"))
      .withColumn("gap", round(col("mean_score") - col("pos_rate"), 6))
  }

  /** ROUGE-N / clipped-BLEU-style n-gram overlap between paired texts —
    * the standard generation-eval primitive (summaries vs references,
    * model outputs vs gold), run as a corpus-scale Spark job. Per pair:
    * `overlap = Σ_g min(count_cand(g), count_ref(g))` (BLEU's clipped
    * match count), `precision = overlap / |cand n-grams|` (BLEU-n modified
    * precision), `recall = overlap / |ref n-grams|` (ROUGE-N recall), and
    * their F1 (ROUGE-N F-measure).
    *
    * Scale design: each side tokenizes once into (pair, gram) counts — the
    * n-gram forming is a pure projection (`transform` over index range →
    * explode), the counts one hash-shuffle per side — then a full-outer
    * join on (pair, gram) and a final per-pair aggregate. Never holds a
    * document's gram multiset in a single row; shuffles ∝ gram postings.
    * Every input pair yields a row: a side with < n tokens has no grams, so
    * its denominator is 0 and precision/recall/F1 are null (undefined, not
    * an error); zero overlap with BOTH sides non-empty is a defined score
    * of 0 — F1 is 0 there, never null, so corpus means don't silently drop
    * the worst pairs. */
  def ngramOverlap(pairs: DataFrame, idCol: String = "pair_id",
                   candCol: String = "cand", refCol: String = "ref",
                   n: Int = 2): DataFrame = {
    def grams(c: String, side: String): DataFrame = {
      val ws = filter(split(lower(col(c)), "[^a-z0-9]+"), w => length(w) > 0)
      // guard: sequence(1, stop) DESCENDS when stop < 1, so short texts
      // must take the empty-array branch (explode then drops the row)
      pairs.select(col(idCol), ws.as("__ws"))
        .select(col(idCol), explode(when(size(col("__ws")) >= n, transform(
            sequence(lit(1), size(col("__ws")) - (n - 1)),
            i => concat_ws(" ", slice(col("__ws"), i, lit(n)))))
          .otherwise(array())).as("gram"))
        .groupBy(col(idCol), col("gram"))
        .agg(count(lit(1)).as(side))
    }
    val c = grams(candCol, "c_cand")
    val r = grams(refCol, "c_ref")
    val perPair = c.join(r, Seq(idCol, "gram"), "full_outer")
      .groupBy(col(idCol))
      .agg(
        coalesce(sum(col("c_cand")), lit(0)).as("n_cand"),
        coalesce(sum(col("c_ref")), lit(0)).as("n_ref"),
        coalesce(sum(least(coalesce(col("c_cand"), lit(0)),
          coalesce(col("c_ref"), lit(0)))), lit(0)).as("overlap"))
    // left-join from the pair universe so both-sides-empty pairs still
    // report (as 0/0/0 with null metrics) instead of vanishing
    val p = col("overlap") / nullif(col("n_cand"), lit(0))
    val rr = col("overlap") / nullif(col("n_ref"), lit(0))
    pairs.select(col(idCol)).distinct()
      .join(perPair, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("overlap"), lit(0L)).as("overlap"))
      .withColumn("precision", round(p, 4))
      .withColumn("recall", round(rr, 4))
      .withColumn("f1", round(
        when(p.isNull || rr.isNull, lit(null).cast("double"))
          .when(p + rr === 0, lit(0.0))
          .otherwise(lit(2) * p * rr / (p + rr)), 4))
  }
}
