package graft.core

/** 5-field cron evaluation (reference: croniter via utils/cron.py:36 +
  * node.py cron handling). Supports wildcards, step syntax (slash),
  * single values, ranges, comma lists, and the @shortcuts; standard cron
  * dom/dow OR-rule (when both are restricted a date matching EITHER fires).
  *
  * Used to gate interval readiness: an interval is runnable only once a
  * cron tick at/after its end has actually passed — before the day's
  * "30 3 * * *" fire, yesterday's interval is not yet ready even though
  * the calendar day is over.
  */
object CronSchedule {

  private val shortcuts = Map(
    "@yearly" -> "0 0 1 1 *", "@annually" -> "0 0 1 1 *",
    "@monthly" -> "0 0 1 * *", "@weekly" -> "0 0 * * 0",
    "@daily" -> "0 0 * * *", "@midnight" -> "0 0 * * *",
    "@hourly" -> "0 * * * *")

  final case class Spec(minute: Set[Int], hour: Set[Int], dom: Set[Int],
                        month: Set[Int], dow: Set[Int],
                        domRestricted: Boolean, dowRestricted: Boolean) {
    def matches(t: java.time.ZonedDateTime): Boolean = {
      val dateOk =
        if (domRestricted && dowRestricted)
          dom(t.getDayOfMonth) || dow(t.getDayOfWeek.getValue % 7) // cron OR-rule
        else dom(t.getDayOfMonth) && dow(t.getDayOfWeek.getValue % 7)
      minute(t.getMinute) && hour(t.getHour) && month(t.getMonthValue) && dateOk
    }
  }

  def parse(cron: String): Spec = {
    val c = shortcuts.getOrElse(cron.trim.toLowerCase, cron.trim)
    c.split("\\s+") match {
      case Array(mi, h, dom, mo, dow) =>
        Spec(field(mi, 0, 59), field(h, 0, 23), field(dom, 1, 31),
          field(mo, 1, 12), field(dow, 0, 7).map(_ % 7), // 7 == 0 == Sunday
          domRestricted = dom != "*", dowRestricted = dow != "*")
      case _ => throw new IllegalArgumentException(s"unsupported cron: $cron")
    }
  }

  private def field(f: String, lo: Int, hi: Int): Set[Int] =
    f.split(',').flatMap { part =>
      val (range, step) = part.split('/') match {
        case Array(r)    => (r, 1)
        case Array(r, s) => (r, s.toInt)
        case _ => throw new IllegalArgumentException(s"bad cron field: $f")
      }
      val (a, b) = range match {
        case "*" => (lo, hi)
        case r if r.contains('-') =>
          val Array(x, y) = r.split('-'); (x.toInt, y.toInt)
        case n => val v = n.toInt; (v, if (step == 1) v else hi)
      }
      (a to b by step)
    }.toSet

  /** The latest fire time <= `ts` (epoch ms), or Long.MinValue if none
    * within a ~366-day lookback (a valid spec always fires within that).
    * `tz` is the IANA zone the cron's wall-clock fields are interpreted in
    * (reference node.py:293 `cron_tz`, croniter evaluated in that zone) —
    * "0 3 * * *" with tz America/New_York fires at 08:00/07:00 UTC depending
    * on DST. Default UTC. */
  def lastTickAtOrBefore(cron: String, ts: Long, tz: String = "UTC"): Long = {
    val spec = parse(cron)
    val zone = java.time.ZoneId.of(tz)
    var t = java.time.Instant.ofEpochMilli(ts).atZone(zone)
      .withSecond(0).withNano(0)
    var steps = 0
    val max = 366 * 24 * 60
    while (steps < max) {
      if (spec.matches(t)) return t.toInstant.toEpochMilli
      t = t.minusMinutes(1); steps += 1
    }
    Long.MinValue
  }
}
