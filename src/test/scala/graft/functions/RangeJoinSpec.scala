package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val points = Seq((1, 0.0), (2, 9.99), (3, 10.0), (4, 55.5), (5, 100.0))
    .toDF("id", "v")
  private val ranges = Seq(("a", 0.0, 10.0), ("b", 10.0, 60.0), ("c", 50.0, 70.0))
    .toDF("name", "lo", "hi")

  test("binned matches a plain inequality join (inner), half-open bounds") {
    val expected = points.join(ranges, col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "name").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    // overlapping ranges: point 4 matches both b and c; boundary 10.0 → b only
    assert(expected == Set((1, "a"), (2, "a"), (3, "b"), (4, "b"), (4, "c")))
    for (w <- Seq(1.0, 7.0, 25.0, 1000.0)) {
      val got = RangeJoin.binned(points, "v", ranges, "lo", "hi", w)
        .select("id", "name").collect().map(r => (r.getInt(0), r.getString(1))).toSet
      assert(got == expected, s"binWidth $w")
    }
  }

  test("left join keeps unmatched probe rows with null range columns") {
    val got = RangeJoin.binned(points, "v", ranges, "lo", "hi", 10.0, joinType = "left")
    assert(got.filter(col("id") === 5).count() == 1)
    assert(got.filter(col("id") === 5).head().isNullAt(got.columns.indexOf("name")))
    assert(got.count() == 6) // 5 matches + 1 unmatched
  }
}
