package graft.core

import org.scalatest.funsuite.AnyFunSuite

class IntervalSpec extends AnyFunSuite {
  private val D = 86400000L

  test("merge coalesces overlapping and adjacent intervals") {
    assert(IntervalAlgebra.merge(Seq(Interval(0, D), Interval(D, 2 * D))) ==
      Vector(Interval(0, 2 * D)))
    assert(IntervalAlgebra.merge(Seq(Interval(0, D), Interval(2 * D, 3 * D))) ==
      Vector(Interval(0, D), Interval(2 * D, 3 * D)))
    assert(IntervalAlgebra.merge(Seq(Interval(0, 3 * D), Interval(D, 2 * D))) ==
      Vector(Interval(0, 3 * D)))
  }

  test("remove splits intervals") {
    assert(IntervalAlgebra.remove(Seq(Interval(0, 3 * D)), Interval(D, 2 * D)) ==
      Vector(Interval(0, D), Interval(2 * D, 3 * D)))
    assert(IntervalAlgebra.remove(Seq(Interval(0, D)), Interval(0, D)).isEmpty)
    assert(IntervalAlgebra.remove(Seq(Interval(0, D)), Interval(5 * D, 6 * D)) ==
      Vector(Interval(0, D)))
  }

  test("missing = requested minus processed") {
    val missing = IntervalAlgebra.missing(0, 5 * D, Seq(Interval(D, 2 * D), Interval(3 * D, 4 * D)))
    assert(missing == Vector(Interval(0, D), Interval(2 * D, 3 * D), Interval(4 * D, 5 * D)))
  }

  test("expand aligns to unit boundaries; partial units excluded") {
    val got = IntervalAlgebra.expand(Interval(0, 3 * D), IntervalUnit.Day)
    assert(got == Vector(Interval(0, D), Interval(D, 2 * D), Interval(2 * D, 3 * D)))
    // misaligned start/end shrink inward
    val part = IntervalAlgebra.expand(Interval(1000, 2 * D + 1000), IntervalUnit.Day)
    assert(part == Vector(Interval(D, 2 * D)))
  }

  test("expand keepPartial keeps sub-unit fractions at BOTH edges") {
    val D = 86400000L
    val day = IntervalUnit.Day
    // trailing partial
    assert(IntervalAlgebra.expand(Interval(0, D + D / 2), day, keepPartial = true) ==
      Vector(Interval(0, D), Interval(D, D + D / 2)))
    // leading partial: the gap left after a partial run must stay runnable
    assert(IntervalAlgebra.expand(Interval(D / 2, 2 * D), day, keepPartial = true) ==
      Vector(Interval(D / 2, D), Interval(D, 2 * D)))
    // both inside one unit
    assert(IntervalAlgebra.expand(Interval(D / 4, D / 2), day, keepPartial = true) ==
      Vector(Interval(D / 4, D / 2)))
    // default drops partials entirely (whole-unit-only semantics)
    assert(IntervalAlgebra.expand(Interval(D / 2, 2 * D), day) == Vector(Interval(D, 2 * D)))
  }

  test("batch propagates keepPartial (allow_partials + batch_size)") {
    val D = 86400000L
    val day = IntervalUnit.Day
    assert(IntervalAlgebra.batch(Interval(0, 2 * D + D / 2), day, 2, keepPartial = true) ==
      Vector(Interval(0, 2 * D), Interval(2 * D, 2 * D + D / 2)))
    assert(IntervalAlgebra.batch(Interval(0, 2 * D + D / 2), day, 2) ==
      Vector(Interval(0, 2 * D)))
  }

  test("batch chunks contiguous intervals") {
    val got = IntervalAlgebra.batch(Interval(0, 10 * D), IntervalUnit.Day, 4)
    assert(got == Vector(Interval(0, 4 * D), Interval(4 * D, 8 * D), Interval(8 * D, 10 * D)))
  }

  test("cron inference matches reference IntervalUnit buckets") {
    assert(IntervalUnit.fromCron("@daily") == IntervalUnit.Day)
    assert(IntervalUnit.fromCron("0 0 * * *") == IntervalUnit.Day)
    assert(IntervalUnit.fromCron("@hourly") == IntervalUnit.Hour)
    assert(IntervalUnit.fromCron("0 * * * *") == IntervalUnit.Hour)
    assert(IntervalUnit.fromCron("*/5 * * * *") == IntervalUnit.FiveMinute)
    assert(IntervalUnit.fromCron("*/15 * * * *") == IntervalUnit.QuarterHour)
    assert(IntervalUnit.fromCron("*/30 * * * *") == IntervalUnit.HalfHour)
    assert(IntervalUnit.fromCron("0 0 1 * *") == IntervalUnit.Month)
    assert(IntervalUnit.fromCron("0 0 1 1 *") == IntervalUnit.Year)
  }

  private def randIvl(rng: scala.util.Random): Interval = {
    val a = rng.nextInt(100).toLong; val b = rng.nextInt(100).toLong
    Interval(math.min(a, b) * D, (math.max(a, b) + 1) * D)
  }

  test("property: merge output is disjoint, sorted, and idempotent") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val ivls = Seq.fill(rng.nextInt(12))(randIvl(rng))
      val m = IntervalAlgebra.merge(ivls)
      assert(m.sliding(2).forall { case Seq(a, b) => a.end < b.start; case _ => true })
      assert(IntervalAlgebra.merge(m) == m)
      assert(m.map(i => i.end - i.start).sum <= ivls.map(i => i.end - i.start).sum)
    }
  }

  test("property: remove preserves span minus intersection") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val a = randIvl(rng); val r = randIvl(rng)
      val removed = IntervalAlgebra.remove(Seq(a), r)
      val inter = math.max(0L, math.min(a.end, r.end) - math.max(a.start, r.start))
      assert(removed.map(i => i.end - i.start).sum == (a.end - a.start) - inter)
    }
  }

  test("explicit interval_unit refines the cron cadence; coarser is rejected") {
    val m = Model("db.t", SqlBody("SELECT 1"), cron = "@daily",
      intervalUnitName = Some("hour"))
    assert(m.intervalUnit == IntervalUnit.Hour)
    val snap = Snapshot(m, Fingerprint.of(m, "SELECT 1", Nil))
    // a daily-cron model with hour interval_unit backfills hour-by-hour
    assert(snap.missingIntervals(0, D).size == 24)
    // coarser than cron is rejected (node.py validation)
    val bad = Model("db.t", SqlBody("SELECT 1"), cron = "@hourly",
      intervalUnitName = Some("day"))
    intercept[IllegalArgumentException](bad.intervalUnit)
    // interval_unit participates in the DATA hash (definition.py:1139)
    val f1 = Fingerprint.of(m, "SELECT 1", Nil)
    val f2 = Fingerprint.of(m.copy(intervalUnitName = None), "SELECT 1", Nil)
    assert(f1.version != f2.version)
  }

  test("fingerprint stability: whitespace/comments/case do not change version") {
    val m1 = Model("db.t", SqlBody("SELECT a, b FROM src WHERE a > 1"))
    val m2 = Model("db.t", SqlBody("select  a, b\n-- comment\nFROM src  WHERE a > 1"))
    val f1 = Fingerprint.of(m1, (m1.body.asInstanceOf[SqlBody]).sql, Nil)
    val f2 = Fingerprint.of(m2, (m2.body.asInstanceOf[SqlBody]).sql, Nil)
    assert(f1.version == f2.version)
    val m3 = Model("db.t", SqlBody("SELECT a, b, c FROM src WHERE a > 1"))
    val f3 = Fingerprint.of(m3, "SELECT a, b, c FROM src WHERE a > 1", Nil)
    assert(f1.version != f3.version)
  }

  test("metadata changes alter metadata hash only") {
    val base = Model("db.t", SqlBody("SELECT 1 AS x"))
    val owned = base.copy(owner = Some("alice"))
    val f1 = Fingerprint.of(base, "SELECT 1 AS x", Nil)
    val f2 = Fingerprint.of(owned, "SELECT 1 AS x", Nil)
    assert(f1.version == f2.version)
    assert(f1.full != f2.full)
  }
}
