package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins and aggregations (100 TB hardening —
  * SURVEY §9 extension). AQE's skew-join split handles sort-merge joins
  * automatically; salting is for when one side must be exploded anyway —
  * a hot key whose single partition would dominate a stage, or a skewed
  * groupBy that overwhelms one reducer.
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from the row's non-key
    * columns — no `rand()`, so retried tasks and restatements reproduce the
    * same placement. */
  def salt(buckets: Int, mixCols: Seq[Column]): Column =
    pmod(hash(mixCols: _*), lit(buckets))

  /** Skew-safe equi-join: the BIG side gets a salt from its own row content;
    * the (relatively) small side is replicated once per salt bucket. Shuffle
    * load for a hot key spreads over `buckets` partitions at the cost of
    * `buckets`× the small side. Use when AQE can't help (broadcast-too-big
    * small side with a few hot keys on the big side). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    val mix = big.columns.filterNot(keys.contains).map(col).toSeq match {
      case Nil  => Seq(monotonically_increasing_id())
      case cols => cols
    }
    val b = big.withColumn("__salt", salt(buckets, mix))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on (keys, salt), then
    * final-aggregate on keys — the classic salted combine. `partialAggs`
    * build the per-salt partials; `finalAggs` fold partials per key. */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    val mix = df.columns.filterNot(keys.contains).map(col).toSeq match {
      case Nil  => Seq(monotonically_increasing_id())
      case cols => cols
    }
    df.withColumn("__salt", salt(buckets, mix))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
