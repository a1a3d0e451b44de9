package graft.core

import java.time.{Instant, ZonedDateTime, ZoneOffset}
import java.time.temporal.ChronoUnit

/** Cadence unit of a model, inferred from its cron expression — the reference's
  * `IntervalUnit` (sqlmesh/core/node.py:28-59, seconds table :252).
  * All boundary math is UTC (the engine pins spark.sql.session.timeZone=UTC).
  */
sealed abstract class IntervalUnit(val name: String, val approxMillis: Long) {
  def floor(epochMs: Long): Long
  def next(epochMs: Long): Long = add(floor(epochMs), 1)
  def add(alignedMs: Long, n: Int): Long

  protected def zdt(ms: Long): ZonedDateTime =
    Instant.ofEpochMilli(ms).atZone(ZoneOffset.UTC)
}

object IntervalUnit {
  case object Year extends IntervalUnit("year", 365L * 86400000L) {
    def floor(ms: Long): Long =
      zdt(ms).truncatedTo(ChronoUnit.DAYS).withDayOfYear(1).toInstant.toEpochMilli
    def add(ms: Long, n: Int): Long = zdt(ms).plusYears(n.toLong).toInstant.toEpochMilli
  }
  case object Month extends IntervalUnit("month", 30L * 86400000L) {
    def floor(ms: Long): Long =
      zdt(ms).truncatedTo(ChronoUnit.DAYS).withDayOfMonth(1).toInstant.toEpochMilli
    def add(ms: Long, n: Int): Long = zdt(ms).plusMonths(n.toLong).toInstant.toEpochMilli
  }
  case object Day extends IntervalUnit("day", 86400000L) {
    def floor(ms: Long): Long = Math.floorDiv(ms, 86400000L) * 86400000L
    def add(ms: Long, n: Int): Long = ms + n * 86400000L
  }
  case object Hour extends IntervalUnit("hour", 3600000L) {
    def floor(ms: Long): Long = Math.floorDiv(ms, 3600000L) * 3600000L
    def add(ms: Long, n: Int): Long = ms + n * 3600000L
  }
  case object HalfHour extends IntervalUnit("half_hour", 1800000L) {
    def floor(ms: Long): Long = Math.floorDiv(ms, 1800000L) * 1800000L
    def add(ms: Long, n: Int): Long = ms + n * 1800000L
  }
  case object QuarterHour extends IntervalUnit("quarter_hour", 900000L) {
    def floor(ms: Long): Long = Math.floorDiv(ms, 900000L) * 900000L
    def add(ms: Long, n: Int): Long = ms + n * 900000L
  }
  case object FiveMinute extends IntervalUnit("five_minute", 300000L) {
    def floor(ms: Long): Long = Math.floorDiv(ms, 300000L) * 300000L
    def add(ms: Long, n: Int): Long = ms + n * 300000L
  }

  val all: Seq[IntervalUnit] =
    Seq(Year, Month, Day, Hour, HalfHour, QuarterHour, FiveMinute)

  def fromName(n: String): IntervalUnit =
    all.find(_.name == n.toLowerCase).getOrElse(
      throw new IllegalArgumentException(s"unknown interval unit: $n"))

  /** Infer cadence from a cron expression the way the reference does: the unit is
    * the coarsest calendar field the cron fires on (node.py `interval_unit`:
    * smallest gap between consecutive firings bucketed into the enum). We support
    * the 5-field subset sqlmesh projects actually use plus @-aliases. */
  def fromCron(cron: String): IntervalUnit = cron.trim.toLowerCase match {
    case "@yearly" | "@annually"       => Year
    case "@monthly"                    => Month
    case "@daily" | "@midnight"        => Day
    case "@hourly"                     => Hour
    case c =>
      c.split("\\s+") match {
        case Array(min, hour, dom, mon, _) =>
          def fixed(f: String) = f != "*" && !f.contains("/") && !f.contains(",") && !f.contains("-")
          if (mon != "*" && fixed(mon)) Year
          else if (dom != "*" && fixed(dom)) Month
          else if (hour != "*" && fixed(hour)) Day
          else if (min == "*/5") FiveMinute
          else if (min == "*/15") QuarterHour
          else if (min == "*/30") HalfHour
          else if (fixed(min)) Hour
          else Hour
        case _ =>
          throw new IllegalArgumentException(s"unsupported cron: $cron")
      }
  }
}
