package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream: for each user, the earliest
  * strictly-ordered completion of a step sequence (step N must happen AFTER
  * the user's earliest valid step N-1).
  *
  * Implemented as one filtered aggregation per step — k steps = k small
  * shuffles on the user key, each over only that step's events (the filter
  * prunes at the scan). No per-user event lists are materialized, so a user
  * with millions of events costs the same as one with ten.
  */
object Funnel {

  /** Returns one row per user who completed step 1, with `t1..tk` timestamps
    * (null once the funnel is abandoned) and `depth` = number of completed
    * steps. */
  def funnel(events: DataFrame, userCol: String, tsCol: String, typeCol: String,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    val funneled = steps.zipWithIndex.tail.foldLeft(first) { case (acc, (step, i)) =>
      val prev = s"t$i"; val cur = s"t${i + 1}"
      val stepTimes = events.filter(col(typeCol) === step)
        .select(col(userCol), col(tsCol).as("__ts"))
      acc.join(stepTimes, Seq(userCol), "left")
        .withColumn("__valid", when(col("__ts") > col(prev), col("__ts")))
        .groupBy((col(userCol) +: (1 to i).map(j => col(s"t$j"))): _*)
        .agg(min(col("__valid")).as(cur))
    }
    funneled.withColumn("depth",
      (1 to steps.size).map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
        .reduce(_ + _))
  }

  /** User-journey path analysis: each user's time-ordered event-type
    * sequence (first `maxLen` events; (ts, type) sort = deterministic under
    * timestamp ties), counted across users — "what do users actually do
    * first" as one aggregation. Per-user state is one bounded list (capped
    * at the user's events, emitted as a ≤`maxLen` path), shuffled once on
    * the user key; the path rollup shuffles only distinct paths. */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
               typeCol: String, maxLen: Int = 5): DataFrame = {
    val perUser = events
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col(tsCol), col(typeCol)))).as("__evs"))
    perUser
      .select(concat_ws(">",
        slice(transform(col("__evs"), e => e.getField(typeCol)), 1, maxLen)).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
  }

  /** Cohort retention: users are cohorted by their first-active period
    * (`unit`-truncated first event time); each (cohort, offset) cell counts
    * the distinct users of that cohort active `offset` units later — the
    * standard retention triangle. Two aggregations: first-seen per user
    * (one shuffle on the user key), then distinct (user, period) activity
    * joined back and rolled up. Activity is deduped per (user, period)
    * BEFORE the join, so a user's millionth event in a day adds nothing to
    * the shuffle. */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                unit: String = "day"): DataFrame = {
    val period = date_trunc(unit, col(tsCol))
    val firstSeen = events.groupBy(col(userCol)).agg(min(period).as("cohort"))
    val active = events.select(col(userCol), period.as("__p")).distinct()
    val offset = unit.toLowerCase match {
      case "day"  => datediff(col("__p"), col("cohort"))
      case "week" => (datediff(col("__p"), col("cohort")) / 7).cast("int")
      case _      => months_between(col("__p"), col("cohort")).cast("int")
    }
    active.join(firstSeen, userCol)
      .groupBy(col("cohort"), offset.as("offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }
}
