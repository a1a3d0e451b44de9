package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-gate output contract: the correctness harness sorts each entry's
  * result frame by EVERY column before hashing, and pandas cannot sort cells
  * holding numpy arrays — so a top-level array/map/struct output column
  * passes local checks but errs in the gate (round 14: td_html_extract,
  * td_crawl_pipeline). This spec builds every SparkEntry.queries frame at
  * sf0.001 and rejects any non-scalar top-level column via the SAME
  * predicate graft.Verify enforces at dump time
  * ([[SparkEntry.nonScalarColumns]]). */
class EntrySchemaSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every entry's output schema is flat sortable scalars") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema =
          try fn(spark, sf).schema
          catch { case e: Throwable =>
            fail(s"entry $name failed to build at sf0.001: ${e.getMessage}")
          }
        SparkEntry.nonScalarColumns(schema).map(c => s"$name.$c")
    }
    assert(bad.isEmpty,
      s"non-scalar entry output columns (driver gate rejects):\n  " +
        bad.mkString("\n  "))
  }
}
