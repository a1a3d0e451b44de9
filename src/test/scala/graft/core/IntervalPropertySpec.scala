package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property tests (seeded random, 200 trials each) for the interval algebra —
  * the correctness substrate of all incremental accounting (a wrong
  * merge/remove silently loses or duplicates backfilled data). */
class IntervalPropertySpec extends AnyFunSuite {

  private def rnd(seed: Int) = new Random(seed)

  private def genInterval(r: Random): Interval = {
    val a = r.nextLong(1000L); Interval(a, a + 1 + r.nextLong(100L))
  }
  private def genIntervals(r: Random): List[Interval] =
    List.fill(1 + r.nextInt(8))(genInterval(r))

  private def covered(is: Seq[Interval], x: Long): Boolean =
    is.exists(i => i.start <= x && x < i.end)

  private val probes: Seq[Long] = 0L to 1101L by 7L

  test("merge preserves coverage exactly and yields disjoint sorted output") {
    val r = rnd(1)
    (1 to 200).foreach { _ =>
      val is = genIntervals(r)
      val merged = IntervalAlgebra.merge(is)
      merged.sliding(2).foreach {
        case Vector(a, b) => assert(a.end < b.start, s"$merged not disjoint-sorted")
        case _ => ()
      }
      probes.foreach { x =>
        assert(covered(is, x) == covered(merged, x), s"coverage differs at $x for $is")
      }
    }
  }

  test("remove subtracts exactly the removal range") {
    val r = rnd(2)
    (1 to 200).foreach { _ =>
      val is = genIntervals(r); val rm = genInterval(r)
      val out = IntervalAlgebra.remove(is, rm)
      probes.foreach { x =>
        val expect = covered(is, x) && !(rm.start <= x && x < rm.end)
        assert(covered(out, x) == expect, s"at $x: $is minus $rm -> $out")
      }
    }
  }

  test("missing is the complement of processed within the window") {
    val r = rnd(3)
    (1 to 200).foreach { _ =>
      val processed = genIntervals(r)
      val out = IntervalAlgebra.missing(100L, 900L, processed)
      probes.foreach { x =>
        val expect = 100L <= x && x < 900L && !covered(processed, x)
        assert(covered(out, x) == expect, s"at $x for $processed")
      }
    }
  }

  test("batch covers the whole interval without overlap, unit-aligned chunks") {
    val unit = IntervalUnit.Hour
    val r = rnd(4)
    (1 to 200).foreach { _ =>
      val startH = r.nextLong(48L); val lenH = 1 + r.nextLong(72L)
      val bs = 1 + r.nextInt(7)
      val iv = Interval(startH * 3600000L, (startH + lenH) * 3600000L)
      val batches = IntervalAlgebra.batch(iv, unit, bs)
      assert(batches.head.start == iv.start && batches.last.end == iv.end)
      batches.sliding(2).foreach {
        case Vector(a, b) => assert(a.end == b.start)
        case _ => ()
      }
      batches.foreach(b => assert((b.end - b.start) <= bs * 3600000L))
    }
  }

  test("expand(keepPartial) partitions ANY interval exactly — no gap, no overlap") {
    val unit = IntervalUnit.Hour
    val H = 3600000L
    val r = rnd(5)
    (1 to 200).foreach { _ =>
      // arbitrary sub-unit edges on both sides
      val start = r.nextLong(72L * H)
      val iv = Interval(start, start + 1 + r.nextLong(48L * H))
      val parts = IntervalAlgebra.expand(iv, unit, keepPartial = true)
      assert(parts.head.start == iv.start && parts.last.end == iv.end)
      parts.sliding(2).foreach {
        case Vector(a, b) => assert(a.end == b.start)
        case _ => ()
      }
      // interior boundaries are unit-aligned
      parts.dropRight(1).foreach(p => assert(p.end % H == 0))
    }
  }

  test("every unit (incl. sub-hour) round-trips floor/next/add and partitions exactly") {
    // VERDICT r5 #9: the sub-hour cadences (HALF_HOUR / QUARTER_HOUR /
    // FIVE_MINUTE) are easy to get wrong at allow_partials boundaries —
    // property-check all 7 units uniformly
    val r = rnd(6)
    IntervalUnit.all.foreach { unit =>
      // name round-trip + cron inference agreement where a cron exists
      assert(IntervalUnit.fromName(unit.name) eq unit)
      (1 to 200).foreach { _ =>
        val ms = r.nextLong(4000L * 86400000L) // ~11 years of range
        val f = unit.floor(ms)
        assert(f <= ms, s"${unit.name}: floor above input")
        assert(unit.floor(f) == f, s"${unit.name}: floor not idempotent")
        assert(unit.next(f) > f, s"${unit.name}: next not increasing")
        assert(unit.floor(unit.next(f)) == unit.next(f), s"${unit.name}: next misaligned")
        assert(unit.add(f, 3) == unit.add(unit.add(f, 1), 2), s"${unit.name}: add not additive")
        // ms is inside [floor, next(floor)) — the defining cadence property
        assert(f <= ms && ms < unit.next(f), s"${unit.name}: $ms outside its own unit")
      }
      // expand partitions an arbitrary window exactly for this unit
      (1 to 50).foreach { _ =>
        val start = r.nextLong(40L * 86400000L)
        val iv = Interval(start, start + 1 + r.nextLong(10L * 86400000L))
        val parts = IntervalAlgebra.expand(iv, unit, keepPartial = true)
        assert(parts.head.start == iv.start && parts.last.end == iv.end, unit.name)
        parts.sliding(2).foreach {
          case Vector(a, b) => assert(a.end == b.start, unit.name)
          case _ => ()
        }
        // interior boundaries sit on the unit's own grid
        parts.dropRight(1).foreach(p => assert(unit.floor(p.end) == p.end, unit.name))
        // WITHOUT partials, every emitted interval is exactly one unit wide
        IntervalAlgebra.expand(iv, unit, keepPartial = false).foreach { p =>
          assert(unit.floor(p.start) == p.start && unit.next(p.start) == p.end, unit.name)
        }
      }
    }
    // cron inference for the sub-hour cadences (reference node.py:28-59)
    assert(IntervalUnit.fromCron("*/30 * * * *") == IntervalUnit.HalfHour)
    assert(IntervalUnit.fromCron("*/15 * * * *") == IntervalUnit.QuarterHour)
    assert(IntervalUnit.fromCron("*/5 * * * *") == IntervalUnit.FiveMinute)
  }

  test("batching sub-hour units: batch edges align and cover for all 3 cadences") {
    val r = rnd(7)
    Seq(IntervalUnit.HalfHour, IntervalUnit.QuarterHour, IntervalUnit.FiveMinute)
      .foreach { unit =>
        val u = unit.approxMillis
        (1 to 100).foreach { _ =>
          val start = r.nextLong(100L) * u
          val iv = Interval(start, start + (1 + r.nextLong(50L)) * u)
          val bs = 1 + r.nextInt(7)
          val batches = IntervalAlgebra.batch(iv, unit, bs)
          assert(batches.head.start == iv.start && batches.last.end == iv.end, unit.name)
          batches.sliding(2).foreach {
            case Vector(a, b) => assert(a.end == b.start, unit.name)
            case _ => ()
          }
          batches.foreach(b => assert(b.end - b.start <= bs * u, unit.name))
        }
      }
  }

  test("fingerprint is stable under whitespace/comment/case noise") {
    val r = rnd(5)
    (1 to 100).foreach { _ =>
      val tok = "c" + r.alphanumeric.take(6).mkString
      val m = Model("m.x", SqlBody(s"SELECT $tok FROM t"))
      val clean = Fingerprint.of(m, s"SELECT $tok FROM t", Nil)
      val noisy = Fingerprint.of(m,
        s"select   $tok -- trailing comment\n  FROM t  /* block */", Nil)
      assert(clean == noisy)
      // but a REAL change must move the data hash
      val changed = Fingerprint.of(m, s"SELECT $tok, 1 FROM t", Nil)
      assert(changed.dataHash != clean.dataHash)
    }
  }
}
