package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CronScheduleSpec extends AnyFunSuite {
  private val D = 86400000L
  private val H = 3600000L
  private val M = 60000L
  private def day(s: String): Long = java.time.LocalDate.parse(s).toEpochDay * D

  test("shortcuts and simple fields fire at the expected times") {
    // @daily: last midnight
    assert(CronSchedule.lastTickAtOrBefore("@daily", day("1995-01-05") + 10 * H) ==
      day("1995-01-05"))
    assert(CronSchedule.lastTickAtOrBefore("@daily", day("1995-01-05")) ==
      day("1995-01-05")) // inclusive at the tick itself
    // 30 3 * * * — daily at 03:30
    assert(CronSchedule.lastTickAtOrBefore("30 3 * * *", day("1995-01-05") + H) ==
      day("1995-01-04") + 3 * H + 30 * M)
    assert(CronSchedule.lastTickAtOrBefore("30 3 * * *", day("1995-01-05") + 4 * H) ==
      day("1995-01-05") + 3 * H + 30 * M)
    // @hourly
    assert(CronSchedule.lastTickAtOrBefore("@hourly", day("1995-01-05") + 2 * H + 5 * M) ==
      day("1995-01-05") + 2 * H)
  }

  test("steps, ranges, lists, and the dom/dow OR-rule") {
    // */15: quarter hours
    assert(CronSchedule.lastTickAtOrBefore("*/15 * * * *", day("1995-01-05") + 17 * M) ==
      day("1995-01-05") + 15 * M)
    // weekly on Sunday (1995-01-01 was a Sunday)
    assert(CronSchedule.lastTickAtOrBefore("@weekly", day("1995-01-04")) ==
      day("1995-01-01"))
    // dom/dow OR: "0 0 15 * 1" fires on the 15th OR on Mondays;
    // 1995-01-09 was a Monday, after the 15th of December
    assert(CronSchedule.lastTickAtOrBefore("0 0 15 * 1", day("1995-01-10")) ==
      day("1995-01-09"))
    // monthly on the 1st
    assert(CronSchedule.lastTickAtOrBefore("@monthly", day("1995-02-20")) ==
      day("1995-02-01"))
    // range+list: minute 5 or 50-55, hour 6
    assert(CronSchedule.lastTickAtOrBefore("5,50-55 6 * * *", day("1995-01-05") + 7 * H) ==
      day("1995-01-05") + 6 * H + 55 * M)
  }

  test("cron_tz interprets wall-clock fields in the given zone") {
    // 03:00 America/New_York in January (EST, UTC-5) = 08:00 UTC
    assert(CronSchedule.lastTickAtOrBefore("0 3 * * *",
      day("1995-01-05") + 10 * H, "America/New_York") ==
      day("1995-01-05") + 8 * H)
    // same cron in July (EDT, UTC-4) = 07:00 UTC
    assert(CronSchedule.lastTickAtOrBefore("0 3 * * *",
      day("1995-07-05") + 10 * H, "America/New_York") ==
      day("1995-07-05") + 7 * H)
    // before the zone's fire time, yesterday's tick is the latest:
    // at 07:00 UTC in January (= 02:00 EST) the 03:00 EST tick hasn't fired
    assert(CronSchedule.lastTickAtOrBefore("0 3 * * *",
      day("1995-01-05") + 7 * H, "America/New_York") ==
      day("1995-01-04") + 8 * H)
  }
}
