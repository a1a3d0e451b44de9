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

  /** Corpus card: the dataset-documentation summary ("model card for
    * data") as one long-form relation (metric, k, v) — corpus size, token
    * volume, mean quality, exact-dup rate, plus doc counts per requested
    * group column. One aggregation pass for the scalars (the text-derived
    * features are computed once, in that same codegen'd pass) and one tiny
    * groupBy per group column — no joins, no collects, corpus-scale safe. */
  def corpusCard(docs: DataFrame, textCol: String = "text",
                 groupCols: Seq[String] = Nil): DataFrame = {
    val base = docs.select(
      (TextFunctions.tokenEstimate(col(textCol)).as("__t") +:
        TextFunctions.qualityScore(col(textCol)).as("__q") +:
        TextFunctions.contentKey(col(textCol)).as("__ck") +:
        groupCols.map(col)): _*)
    val scalars = base.agg(
        count(lit(1)).as("n"), sum(col("__t")).as("toks"),
        round(avg(col("__q")), 4).as("mq"), countDistinct(col("__ck")).as("nck"))
      .select(explode(array(
        struct(lit("n_docs").as("metric"), lit("all").as("k"),
          col("n").cast("double").as("v")),
        struct(lit("total_tokens").as("metric"), lit("all").as("k"),
          col("toks").cast("double").as("v")),
        struct(lit("mean_quality").as("metric"), lit("all").as("k"),
          col("mq").cast("double").as("v")),
        struct(lit("exact_dup_rate").as("metric"), lit("all").as("k"),
          (round(lit(1.0) - col("nck").cast("double") / col("n"), 4)).cast("double").as("v")))).as("r"))
      .select(col("r.metric"), col("r.k"), col("r.v"))
    groupCols.foldLeft(scalars) { (acc, g) =>
      acc.unionByName(base.groupBy(col(g)).agg(count(lit(1)).as("__n"))
        .select(lit(s"docs_by_$g").as("metric"), col(g).cast("string").as("k"),
          col("__n").cast("double").as("v")))
    }
  }

  /** Column-level PII profile: for every string column, total matches per
    * PII kind (email/phone/ssn/card/ip) — the "which columns leak PII"
    * audit that decides where [[TextFunctions.scrubPii]] must run. One
    * aggregation pass over all columns × kinds; long form
    * (column, kind, n) keeps only non-zero cells. */
  def piiProfile(df: DataFrame): DataFrame = {
    val stringCols = df.schema.fields.filter(_.dataType ==
      org.apache.spark.sql.types.StringType).map(_.name).toSeq
    require(stringCols.nonEmpty, "piiProfile: no string columns")
    val cells = for {
      c <- stringCols
      (kind, cnt) <- TextFunctions.piiCounts(col(c))
    } yield sum(coalesce(cnt.cast("long"), lit(0L))).as(s"${c}__$kind")
    val wide = df.agg(cells.head, cells.tail: _*)
    val structs = for {
      c <- stringCols
      (kind, _) <- TextFunctions.piiCounts(col(c))
    } yield struct(lit(c).as("column"), lit(kind.stripPrefix("n_")).as("kind"),
      col(s"${c}__$kind").as("n"))
    wide.select(explode(array(structs: _*)).as("r"))
      .select(col("r.column"), col("r.kind"), col("r.n"))
      .filter(col("n") > 0)
  }
}
