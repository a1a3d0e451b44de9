package graft.adapter

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StructType}

/** Table diffing (reference: sqlmesh/core/table_diff.py — SchemaDiff :30,
  * RowDiff :113, TableDiff.row_diff :340-480).
  *
  * Row diff is ONE distributed job: normalize both sides, FULL OUTER join on
  * the key, emit per-column null-safe match flags, aggregate counts — the
  * reference's CTE pipeline re-expressed as a single DataFrame plan so
  * Catalyst can pick broadcast/SMJ and push the normalization into the scan.
  */
object TableDiff {

  final case class SchemaDelta(added: Seq[(String, String)], removed: Seq[(String, String)],
                               changed: Seq[(String, String, String)])

  def schemaDiff(source: StructType, target: StructType): SchemaDelta = {
    val s = source.fields.map(f => f.name -> f.dataType.sql).toMap
    val t = target.fields.map(f => f.name -> f.dataType.sql).toMap
    SchemaDelta(
      added = t.toSeq.filterNot { case (n, _) => s.contains(n) }.sortBy(_._1),
      removed = s.toSeq.filterNot { case (n, _) => t.contains(n) }.sortBy(_._1),
      changed = s.toSeq.collect { case (n, tp) if t.get(n).exists(_ != tp) => (n, tp, t(n)) }
        .sortBy(_._1))
  }

  /** Decimal-rounded / nested-normalized comparison value (RowDiffMixin
    * normalization: decimals rounded to 3, nested → json). */
  private def normalize(c: org.apache.spark.sql.Column, dt: org.apache.spark.sql.types.DataType,
                        decimals: Int = 3) =
    dt match {
      case _: DecimalType | org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType =>
        round(c.cast(DecimalType(38, 9)), decimals)
      case _: org.apache.spark.sql.types.ArrayType | _: StructType |
           _: org.apache.spark.sql.types.MapType => to_json(c)
      case _ => c
    }

  /** Per-column match stats + row-presence counts. Returns one summary row:
    * s_only, t_only, full_match, partial_match, per-column match counts. */
  def rowDiff(source: DataFrame, target: DataFrame, keys: Seq[String],
              /** `--decimals` (cli/main.py table_diff): float precision. */
              decimals: Int = 3): DataFrame = {
    val dataCols = source.columns.filterNot(keys.contains)
      .filter(target.columns.contains).toSeq
    val sNorm = source.select(
      (keys.map(col) ++ dataCols.map(c => normalize(col(c), source.schema(c).dataType, decimals).as(c))): _*)
    val tNorm = target.select(
      (keys.map(col) ++ dataCols.map(c => normalize(col(c), target.schema(c).dataType, decimals).as(c))): _*)
    val s = sNorm.select(sNorm.columns.map(c => col(c).as(s"s_$c")): _*)
      .withColumn("__in_s", lit(1))
    val t = tNorm.select(tNorm.columns.map(c => col(c).as(s"t_$c")): _*)
      .withColumn("__in_t", lit(1))
    val joinCond = keys.map(k => col(s"s_$k") <=> col(s"t_$k")).reduce(_ && _)
    val j = s.join(t, joinCond, "full_outer")

    val matchFlags = dataCols.map(c =>
      when(col(s"s_$c") <=> col(s"t_$c"), 1).otherwise(0).as(s"m_$c"))
    val flagged = j.select(
      (Seq(coalesce(col("__in_s"), lit(0)).as("in_s"),
        coalesce(col("__in_t"), lit(0)).as("in_t")) ++ matchFlags): _*)

    val allMatch = dataCols.map(c => col(s"m_$c") === 1).reduceOption(_ && _).getOrElse(lit(true))
    val aggs = Seq(
      sum(when(col("in_s") === 1 && col("in_t") === 0, 1).otherwise(0)).as("s_only"),
      sum(when(col("in_s") === 0 && col("in_t") === 1, 1).otherwise(0)).as("t_only"),
      sum(when(col("in_s") === 1 && col("in_t") === 1 && allMatch, 1).otherwise(0)).as("full_match"),
      sum(when(col("in_s") === 1 && col("in_t") === 1 && !allMatch, 1).otherwise(0)).as("partial_match")
    ) ++ dataCols.map(c =>
      sum(when(col("in_s") === 1 && col("in_t") === 1 && col(s"m_$c") === 1, 1).otherwise(0))
        .as(s"match_$c"))
    flagged.agg(aggs.head, aggs.tail: _*)
  }

  /** Sample of mismatching rows (reference table_diff.py row samples): up to
    * `n` per category — source-only keys, target-only keys, and per-column
    * differing pairs with both values side by side. */
  def rowDiffSamples(source: DataFrame, target: DataFrame, keys: Seq[String],
                     n: Int = 20): DataFrame = {
    val dataCols = source.columns.filterNot(keys.contains)
      .filter(target.columns.contains).toSeq
    val s = source.select(source.columns.map(c => col(c).as(s"s_$c")): _*)
      .withColumn("__in_s", lit(1))
    val t = target.select(target.columns.map(c => col(c).as(s"t_$c")): _*)
      .withColumn("__in_t", lit(1))
    val joinCond = keys.map(k => col(s"s_$k") <=> col(s"t_$k")).reduce(_ && _)
    val j = s.join(t, joinCond, "full_outer")
    val inS = col("__in_s").isNotNull; val inT = col("__in_t").isNotNull
    val anyDiff = dataCols.map(c => !(col(s"s_$c") <=> col(s"t_$c"))).reduceOption(_ || _)
      .getOrElse(lit(false))
    val cat = when(inS && !inT, "s_only").when(!inS && inT, "t_only")
      .when(anyDiff, "diff")
    val keyExpr = coalesce((keys.map(k => col(s"s_$k")) ++ keys.map(k => col(s"t_$k")))
      .map(_.cast("string")): _*)
    j.withColumn("category", cat).filter(col("category").isNotNull)
      .withColumn("key", keyExpr)
      .select((Seq(col("category"), col("key")) ++
        dataCols.flatMap(c => Seq(col(s"s_$c"), col(s"t_$c")))): _*)
      .orderBy(col("category"), col("key"))
      .limit(n)
  }

}
