package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("picks the latest right row at or before each left time, per key") {
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:05:00"), 101.0),
      ("A", ts("2024-01-01 10:10:00"), 102.0),
      ("B", ts("2024-01-01 10:02:00"), 50.0)).toDF("sym", "qts", "px")
    val trades = Seq(
      ("A", ts("2024-01-01 10:03:00"), 10),   // matches 10:00 quote
      ("A", ts("2024-01-01 10:05:00"), 20),   // equal ts → matches 10:05 quote
      ("A", ts("2024-01-01 10:30:00"), 30),   // matches 10:10 quote
      ("B", ts("2024-01-01 10:01:00"), 40),   // no quote yet → null
      ("B", ts("2024-01-01 11:00:00"), 50)).toDF("sym", "tts", "qty")

    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "tts", "qts")
      .select("sym", "tts", "qty", "px")
      .collect().map(r => (r.getString(0), r.getInt(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSet
    assert(out == Set(
      ("A", 10, 100.0), ("A", 20, 101.0), ("A", 30, 102.0),
      ("B", 40, -1.0), ("B", 50, 50.0)))
  }

  test("tie-breaker resolves equal right timestamps to the greatest") {
    val right = Seq((1, ts("2024-01-01 00:00:00"), 7, "lo"),
      (1, ts("2024-01-01 00:00:00"), 9, "hi")).toDF("k", "rt", "seq", "v")
    val left = Seq((1, ts("2024-01-02 00:00:00"))).toDF("k", "lt")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "lt", "rt",
      rightCols = Seq("v"), tieBreaker = Some("seq"))
    assert(out.select("v").head().getString(0) == "hi")
  }

  test("matched columns come from one row (null column stays null)") {
    val right = Seq(
      (1, ts("2024-01-01 00:00:00"), Option("old"), Option(5)),
      (1, ts("2024-01-02 00:00:00"), Option.empty[String], Option(9)))
      .toDF("k", "rt", "a", "b")
    val left = Seq((1, ts("2024-01-03 00:00:00"))).toDF("k", "lt")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "lt", "rt").head()
    // the matched (latest) row has a = NULL; a naive per-column carry would
    // leak "old" from the earlier row
    assert(out.isNullAt(out.fieldIndex("a")))
    assert(out.getAs[Int]("b") == 9)
  }
}
