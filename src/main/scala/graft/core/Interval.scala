package graft.core

/** Interval accounting — the unit of incremental work.
  *
  * An interval is a half-open `[start, end)` pair of epoch-millis, exactly as in
  * the reference (sqlmesh/core/snapshot/definition.py:180 `SnapshotIntervals`;
  * merge :1922 `merge_intervals`; removal :1963 `remove_interval`). All algebra is
  * pure driver-side Scala — interval state is tiny (compacted pairs per snapshot),
  * so it never needs to be distributed even at 100 TB data scale.
  */
final case class Interval(start: Long, end: Long) {
  require(start <= end, s"interval start $start > end $end")
  def isEmpty: Boolean = start == end
  def overlapsOrTouches(o: Interval): Boolean = start <= o.end && o.start <= end
  def intersects(o: Interval): Boolean = start < o.end && o.start < end
  def union(o: Interval): Interval = Interval(math.min(start, o.start), math.max(end, o.end))
}

object IntervalAlgebra {

  /** Sort + coalesce overlapping/adjacent intervals into a minimal disjoint set.
    * Mirrors reference `merge_intervals` (snapshot/definition.py:1922). */
  def merge(intervals: Seq[Interval]): Vector[Interval] = {
    val sorted = intervals.filterNot(_.isEmpty).sortBy(i => (i.start, i.end))
    sorted.foldLeft(Vector.empty[Interval]) { (acc, cur) =>
      acc.lastOption match {
        case Some(last) if last.overlapsOrTouches(cur) => acc.init :+ last.union(cur)
        case _                                          => acc :+ cur
      }
    }
  }

  /** Subtract `removal` from each interval (splitting where needed).
    * Mirrors reference `remove_interval` (snapshot/definition.py:1963). */
  def remove(intervals: Seq[Interval], removal: Interval): Vector[Interval] =
    intervals.flatMap { i =>
      if (!i.intersects(removal)) Vector(i)
      else {
        val left  = if (i.start < removal.start) Some(Interval(i.start, removal.start)) else None
        val right = if (removal.end < i.end) Some(Interval(removal.end, i.end)) else None
        Vector(left, right).flatten
      }
    }.toVector

  /** `[start, end)` minus the already-processed set = what still needs backfill. */
  def missing(start: Long, end: Long, processed: Seq[Interval]): Vector[Interval] = {
    if (end <= start) return Vector.empty
    var remaining = Vector(Interval(start, end))
    merge(processed).foreach { p => remaining = remove(remaining, p) }
    remaining
  }

  /** Split a contiguous interval into unit-aligned atomic intervals, then chunk
    * into batches of `batchSize` units (reference scheduler.py:334
    * `batch_intervals`). `keepPartial` propagates allow_partials so sub-unit
    * edges survive batching. */
  def batch(interval: Interval, unit: IntervalUnit, batchSize: Int,
            keepPartial: Boolean = false): Vector[Interval] = {
    val units = expand(interval, unit, keepPartial)
    if (batchSize <= 0) Vector(interval)
    else units.grouped(batchSize).map(g => Interval(g.head.start, g.last.end)).toVector
  }

  /** Expand to one interval per cadence unit, aligned to unit boundaries.
    * `keepPartial` keeps sub-unit fractions at EITHER edge as their own
    * intervals — the `allow_partials` semantics (model definition.py
    * allow_partials; scheduler end-bounding). The leading case matters after
    * a partial run: the gap [partial-end, unit-end) must stay backfillable. */
  def expand(interval: Interval, unit: IntervalUnit,
             keepPartial: Boolean = false): Vector[Interval] = {
    if (interval.isEmpty) return Vector.empty
    val out = Vector.newBuilder[Interval]
    var cur = unit.floor(interval.start)
    if (cur < interval.start) {
      if (keepPartial)
        out += Interval(interval.start, math.min(unit.next(cur), interval.end))
      cur = unit.next(cur)
    }
    while (unit.next(cur) <= interval.end) {
      out += Interval(cur, unit.next(cur))
      cur = unit.next(cur)
    }
    if (keepPartial && cur < interval.end) out += Interval(cur, interval.end)
    out.result()
  }
}
