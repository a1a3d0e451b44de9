package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Shared plumbing for the driver-facing query inventory. */
object QueryUtil {
  type QueryFn = (SparkSession, String) => DataFrame

  final case class Entry(fn: QueryFn, oracle: Option[String])

  val tables: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The `events` table's `ts` column is physically parquet TIMESTAMP(NANOS).
    * How Spark surfaces that depends on version:
    *  - Spark >= 4.1 reads it natively as TIMESTAMP_NTZ, truncating ns->us
    *    exactly like DuckDB; a cast re-types it as a session-tz (UTC-pinned)
    *    TimestampType with identical field values.
    *  - older Sparks reject the physical type outright unless
    *    `spark.sql.legacy.parquet.nanosAsLong=true`, which yields a LongType
    *    of raw nanos — convert via `timestamp_micros(ns div 1000)`.
    * Branching on the OBSERVED read schema (not the Spark version string)
    * keeps both paths live and spec-testable on any runtime. */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    if (!df.columns.contains("ts")) df
    else df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** Raw read of an events-shaped parquet file, falling back to the legacy
    * nanos-as-long conf only when the runtime can't read TIMESTAMP(NANOS). */
  def rawEvents(spark: SparkSession, path: String): DataFrame =
    try spark.read.parquet(path)
    catch {
      case e: Throwable if Option(e.getMessage).exists(_.contains("NANOS")) =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(path)
    }

  def readEvents(spark: SparkSession, path: String): DataFrame =
    normalizeEventsTs(rawEvents(spark, path))

  /** Inline SQL subquery that normalizes `ts`, for call sites that need the
    * events table as referenceable SQL text (persistent VIEW models can't see
    * temp views). Returns the bare path when the file reads clean. */
  def eventsSubquerySql(spark: SparkSession, path: String): String =
    rawEvents(spark, path).schema("ts").dataType match {
      case LongType =>
        s"(SELECT * EXCEPT (ts), timestamp_micros(ts div 1000) AS ts " +
          s"FROM parquet.`$path`)"
      case TimestampNTZType =>
        s"(SELECT * EXCEPT (ts), CAST(ts AS TIMESTAMP) AS ts " +
          s"FROM parquet.`$path`)"
      case _ => path
    }

  /** Read a base table. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") readEvents(spark, s"$dir/events.parquet")
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Base-table names referenced (word-boundary) in a SQL text. */
  def referencedTables(sql: String): Seq[String] = {
    val lower = sql.toLowerCase
    tables.filter(n => ("\\b" + n + "\\b").r.findFirstIn(lower).isDefined)
  }

  /** Register as temp views only the tables a query actually names, so an
    * unreadable table can't take down unrelated entries (r6 blast radius:
    * one broken events shim crashed every audit/macro/Plane-A entry). */
  def registerReferenced(spark: SparkSession, dir: String, sql: String): Unit =
    referencedTables(sql).foreach(n => t(spark, dir, n).createOrReplaceTempView(n))

  /** Register all base tables as temp views so entries can use spark.sql —
    * the same Plane-A surface users get. Per-table fault isolation: a table
    * that fails to read is skipped (entries referencing it fail with
    * TABLE_OR_VIEW_NOT_FOUND; everything else keeps working). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tables.foreach { n =>
      try t(spark, dir, n).createOrReplaceTempView(n)
      catch { case e: Throwable =>
        System.err.println(s"[graft] skipping unreadable table $n: ${e.getMessage}")
      }
    }

  def sqlEntry(sparkSql: String, duckSql: String): Entry =
    Entry((s, dir) => { registerReferenced(s, dir, sparkSql); s.sql(sparkSql) },
      Some(duckSql))

  /** Same SQL text runs on both engines. */
  def portableSqlEntry(sql: String): Entry = sqlEntry(sql, sql)
}
