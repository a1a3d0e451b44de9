package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's sentinel-aware self-healing (r16 verdict #4): a loaded
  * measurement window (post-query sentinel > 1.5× the run-start reference)
  * triggers ONE re-measure, keeps the quieter window's number, and reports
  * the first attempt in raw_first — synthetic-load scenarios below. */
class BenchRetrySpec extends AnyFunSuite {

  test("trigger: sentinel above 1.5x ref retries, at/below does not") {
    assert(!BenchRetry.shouldRetry(0.15, 0.1))
    assert(!BenchRetry.shouldRetry(0.149, 0.1))
    assert(BenchRetry.shouldRetry(0.151, 0.1))
    assert(BenchRetry.shouldRetry(0.45, 0.164)) // the r16 td_decontaminate blip shape
  }

  test("synthetic load on attempt 1: retry runs, quiet attempt 2 wins, raw_first kept") {
    var calls = 0
    // loaded first window: slow median + elevated sentinel; quiet second
    val measure = () => {
      calls += 1
      if (calls == 1) (("detail", calls), 1.91, 0.432) else (("detail", calls), 1.30, 0.150)
    }
    val ((_, median, sentinel), first) = BenchRetry.measureWithRetry(0.164, measure)
    assert(calls == 2)
    assert(median == 1.30 && sentinel == 0.150)
    assert(first.contains(1.91)) // the suspect number stays visible
  }

  test("quiet window: single measurement, no raw_first") {
    var calls = 0
    val measure = () => { calls += 1; ((), 0.5, 0.170) }
    val (chosen, first) = BenchRetry.measureWithRetry(0.164, measure)
    assert(calls == 1 && first.isEmpty && chosen._2 == 0.5)
  }

  test("both windows loaded: the quieter sentinel's number is chosen") {
    var calls = 0
    val measure = () => {
      calls += 1
      if (calls == 1) ((), 2.0, 0.40) else ((), 2.4, 0.55) // retry WORSE
    }
    val ((_, median, sentinel), first) = BenchRetry.measureWithRetry(0.164, measure)
    assert(calls == 2)
    assert(median == 2.0 && sentinel == 0.40) // first kept — it was quieter
    assert(first.contains(2.0))
  }
}
