package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional write clustering via Z-order (Morton) interleaving —
  * the layout operator engines expose as `OPTIMIZE ... ZORDER BY` (Delta) /
  * `sort_order` (Iceberg). Single-column clustering (repartition + sort)
  * gives tight min/max on ONE key; bit-interleaving gives useful row-group
  * pruning on EVERY participating column at once, which is what makes
  * multi-predicate scans over 100 TB skip files.
  *
  * All pure `functions._` bit arithmetic — codegen'd, no UDFs.
  */
object Clustering {

  /** Normalize a numeric column to an integer in [0, 2^bits) by min/max
    * range scaling. `lo`/`hi` come from a stats pass (or known bounds). */
  def normalize(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val span = hi.cast("double") - lo.cast("double")
    val scaled = when(span <= 0, lit(0.0))
      .otherwise((c.cast("double") - lo.cast("double")) / span * ((1L << bits) - 1))
    least(greatest(round(scaled).cast("long"), lit(0L)), lit((1L << bits) - 1))
  }

  /** Morton code: interleave `bits` bits of each (already-normalized,
    * [0, 2^bits)) column — column c's bit i lands at position i*k + c. */
  def interleave(normalized: Seq[Column], bits: Int): Column = {
    val k = normalized.size
    require(k >= 1 && k * bits <= 62, s"z-value needs k*bits <= 62, got $k*$bits")
    val terms = for {
      (c, ci) <- normalized.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + ci)
    terms.reduce(_ + _)
  }

  /** Re-layout `df` for multi-column data skipping: compute per-column
    * min/max (one tiny agg, broadcast back), z-value every row, range
    * partition + sort by it. Each output file then holds a compact
    * hyper-rectangle of the key space — min/max indexes prune on any
    * combination of the clustered columns. */
  def clusterByZOrder(df: DataFrame, cols: Seq[String], bits: Int = 16,
                      numPartitions: Option[Int] = None): DataFrame = {
    val statsAggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double").as(s"__lo_$c"), max(col(c)).cast("double").as(s"__hi_$c")))
    val stats = df.agg(statsAggs.head, statsAggs.tail: _*)
    val withStats = df.crossJoin(broadcast(stats))
    val z = interleave(cols.map(c =>
      normalize(col(c), col(s"__lo_$c"), col(s"__hi_$c"), bits)), bits)
    val zdf = withStats.withColumn("__z", z).drop(cols.flatMap(c =>
      Seq(s"__lo_$c", s"__hi_$c")): _*)
    val parts = numPartitions.getOrElse(zdf.sparkSession.sessionState.conf.numShufflePartitions)
    zdf.repartitionByRange(parts, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
