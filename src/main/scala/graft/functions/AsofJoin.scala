package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — for each left row, the most recent right row with
  * `rightTime <= leftTime` per key (the temporal join Spark lacks natively;
  * built by composing existing operators per the custom-operator preference
  * order).
  *
  * Implementation: tag and union both sides, then carry the matched right row
  * forward as ONE struct with `last(_, ignoreNulls = true)` over a per-key
  * window ordered by time (right rows sort before left rows at equal
  * timestamps so `<=` semantics hold; carrying a single struct keeps all
  * right columns from the SAME matched row, including its legitimate NULLs).
  * ONE shuffle on the key — no per-row range probe, no broadcast requirement —
  * so it scales to fact-fact temporal joins where a join+filter+rank plan
  * explodes into a range cross product.
  */
object AsofJoin {

  /** @param keys       equi-join key columns (same names both sides)
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param rightCols  right columns to emit (default: all non-key,
    *                   non-time columns), with their own names
    * @param tieBreaker optional right column: at equal rightTime the greatest
    *                   value wins (otherwise ties are arbitrary) */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightCols: Seq[String] = Nil,
               tieBreaker: Option[String] = None): DataFrame = {
    val carry = if (rightCols.nonEmpty) rightCols
      else right.columns.filterNot(keys.contains).filterNot(_ == rightTime).toSeq
    val leftCols = left.columns.toSeq

    val rightStructType = org.apache.spark.sql.types.StructType(
      right.select(carry.map(col): _*).schema.fields)
    val l = left.select(
      (leftCols.map(col) :+
        col(leftTime).as("__t") :+
        lit(1).as("__side") :+
        lit(null).cast("double").as("__tie") :+
        lit(null).cast(rightStructType).as("__r")): _*)
    val r = right.select(
      (keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)) :+
        col(rightTime).as("__t") :+
        lit(0).as("__side") :+
        tieBreaker.map(col(_).cast("double")).getOrElse(lit(0.0)).as("__tie") :+
        struct(carry.map(col): _*).as("__r")): _*)

    val unioned = l.unionByName(r.select(l.columns.map(col): _*))
    // right rows order BEFORE left rows at equal __t (side 0 < 1) so a right
    // row timestamped exactly at leftTime is visible to that left row; among
    // right ties the last in (__t, __tie) order wins
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        carry.filterNot(leftCols.contains).map(c => col(s"__match.$c").as(c))): _*)
  }
}
