package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range join — match left rows whose scalar value falls inside a right-side
  * interval `[lo, hi)`. Spark plans a raw inequality join as a broadcast
  * nested loop (or worse, a cartesian product) — at scale that's a scan per
  * range. The scalable shape is bin bucketing: overlap every range onto
  * fixed-width bins, explode one row per (range, bin), tag each left row with
  * its bin, equi-join on the bin, and re-check the exact predicate. Shuffle
  * volume is rows + Σ(range width / bin width), never |left| × |right|.
  */
object RangeJoin {

  /** @param left     probe side
    * @param leftVal  numeric column on `left`
    * @param right    ranges side with `[lo, hi)` columns
    * @param lo       inclusive lower-bound column on `right`
    * @param hi       exclusive upper-bound column on `right`
    * @param binWidth bin size: ≈ the typical range width is a good choice
    * @param joinType "inner" (default) or "left" (unmatched left rows kept) */
  def binned(left: DataFrame, leftVal: String, right: DataFrame,
             lo: String, hi: String, binWidth: Double,
             joinType: String = "inner"): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val l = left.withColumn("__bin", floor(col(leftVal) / binWidth))
    val r = right.withColumn("__bin",
      explode(sequence(floor(col(lo) / binWidth).cast("long"),
        // hi is exclusive: a range ending exactly on a bin edge doesn't
        // overlap the next bin
        floor((col(hi) - lit(1e-9)) / binWidth).cast("long"))))
    val exact = col(leftVal) >= col(lo) && col(leftVal) < col(hi)
    joinType match {
      case "inner" => l.join(r, Seq("__bin")).filter(exact).drop("__bin")
      case "left" =>
        val matched = l.join(r, Seq("__bin")).filter(exact).drop("__bin")
        val rCols = right.columns.filterNot(left.columns.contains)
        val unmatched = l.drop("__bin")
          .join(matched.select(left.columns.map(col): _*), left.columns.toSeq, "left_anti")
        matched.unionByName(unmatched, allowMissingColumns = true)
      case other => throw new IllegalArgumentException(s"unsupported joinType $other")
    }
  }
}
