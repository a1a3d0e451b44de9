package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestSession

/** The events table's `ts` is physically parquet TIMESTAMP(NANOS). Spark
  * >=4.1 reads it as TIMESTAMP_NTZ (ns truncated to us); Spark <=4.0 only
  * reads it as LongType under the (since-removed) nanosAsLong conf. The shim
  * must normalize BOTH flavors to an identical TimestampType column — this
  * is what flips the whole events-based oracle surface between green and
  * crashed when the sandbox's Spark version moves (r6 verdict, finding #1).
  */
class EventsTsShimSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val realEvents = "/root/testdata/sf0.001/events.parquet"

  test("real TIMESTAMP(NANOS) testdata reads to TimestampType") {
    assume(new java.io.File(realEvents).exists())
    val df = QueryUtil.readEvents(spark, realEvents)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() > 0)
    // values survive: max(ts) is a sane 20th/21st-century instant, not 1970
    val mx = df.agg(max(unix_micros(col("ts")))).as[Long].head()
    assert(mx > 8e14, s"max ts micros $mx looks like a misread epoch")
  }

  test("LongType nanos flavor normalizes via timestamp_micros(ns div 1000)") {
    val dir = SparkTestSession.tmpDir("evshim_long")
    // 2020-01-01T00:00:00.123456789 in nanos
    val ns = 1577836800L * 1000000000L + 123456789L
    Seq((1L, ns)).toDF("event_id", "ts").write.mode("overwrite").parquet(dir)
    val out = QueryUtil.readEvents(spark, dir)
    assert(out.schema("ts").dataType == TimestampType)
    val us = out.agg(max(unix_micros(col("ts")))).as[Long].head()
    assert(us == 1577836800L * 1000000L + 123456L) // ns truncated to us
  }

  test("TIMESTAMP_NTZ flavor normalizes via cast to session-tz timestamp") {
    val dir = SparkTestSession.tmpDir("evshim_ntz")
    val us = 1577836800L * 1000000L + 123456L
    Seq((1L, us)).toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(dir)
    val out = QueryUtil.readEvents(spark, dir)
    assert(out.schema("ts").dataType == TimestampType)
    // session tz is UTC, so NTZ wall-clock == the original instant
    assert(out.agg(max(unix_micros(col("ts")))).as[Long].head() == us)
  }

  test("already-TimestampType flavor passes through untouched") {
    val dir = SparkTestSession.tmpDir("evshim_tst")
    val us = 1577836800L * 1000000L
    Seq((1L, us)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(dir)
    val out = QueryUtil.readEvents(spark, dir)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.agg(max(unix_micros(col("ts")))).as[Long].head() == us)
  }

  test("registerAll isolates an unreadable table to its own entries") {
    val dir = SparkTestSession.tmpDir("evshim_broken")
    // stage real tables, then corrupt events.parquet
    for (t <- Seq("region", "nation", "lineitem"))
      java.nio.file.Files.createSymbolicLink(
        java.nio.file.Paths.get(s"$dir/$t.parquet"),
        java.nio.file.Paths.get(s"/root/testdata/sf0.001/$t.parquet"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/events.parquet"), "not parquet")
    // other tables absent entirely — registerAll must still succeed
    QueryUtil.registerAll(spark, dir)
    assert(spark.sql("SELECT count(*) FROM lineitem").as[Long].head() > 0)
    // and an entry that only names lineitem runs end-to-end
    val e = QueryUtil.portableSqlEntry(
      "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1")
    assert(e.fn(spark, dir).count() > 0)
  }

  test("referencedTables matches whole words only") {
    val sql = "SELECT p_partkey FROM part JOIN lineitem ON p_partkey = l_partkey"
    assert(QueryUtil.referencedTables(sql) == Seq("part", "lineitem"))
    assert(QueryUtil.referencedTables("SELECT counterpart FROM orders") == Seq("orders"))
  }
}
