package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** One-pass table profiling: per-column row/null/distinct counts and numeric
  * min/max/mean, emitted long-form as (column, metric, value). The wide
  * aggregation runs as a single job (Catalyst plans the distinct aggregates
  * with one expand), then unpivots driver-free via stack(). For 100 TB use
  * `approxDistinct = true` to swap exact COUNT(DISTINCT) for HLL sketches —
  * same output shape, one pass, no expand blow-up. */
object Profiler {

  def profile(df: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      val distinct = if (approxDistinct) approx_count_distinct(c) else countDistinct(c)
      Seq(
        count(c).as(s"${f.name}__non_null"),
        distinct.as(s"${f.name}__distinct")) ++
        (f.dataType match {
          case _: NumericType => Seq(
            round(min(c).cast("double"), 4).as(s"${f.name}__min"),
            round(max(c).cast("double"), 4).as(s"${f.name}__max"),
            round(avg(c.cast("double")), 4).as(s"${f.name}__mean"))
          case _ => Nil
        })
    } :+ count(lit(1)).as("__rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)

    // unpivot to (column, metric, value) — all doubles for a stable schema
    val metricCols = wide.columns.filterNot(_ == "__rows")
    val stackArgs = metricCols.map { mc =>
      val Array(colName, metric) = mc.split("__", 2)
      s"'$colName', '$metric', CAST(`$mc` AS DOUBLE)"
    }.mkString(", ")
    wide.selectExpr(s"CAST(__rows AS DOUBLE) AS __rows",
        s"stack(${metricCols.length}, $stackArgs) AS (column, metric, value)")
      .select(col("column"), col("metric"), col("value"),
        round(col("value") / col("__rows"), 4).as("ratio"))
  }
}
