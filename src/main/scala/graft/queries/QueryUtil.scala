package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared plumbing for the driver-facing query inventory. */
object QueryUtil {
  type QueryFn = (SparkSession, String) => DataFrame

  final case class Entry(fn: QueryFn, oracle: Option[String])

  val tables: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read a base table. `events.ts` is physically TIMESTAMP(NANOS), which
    * Spark's parquet reader rejects — read it as nanos-long and convert to a
    * proper TimestampType (truncation to micros matches DuckDB's ns→us). */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register all base tables as temp views so entries can use spark.sql —
    * the same Plane-A surface users get. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tables.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))

  def sqlEntry(sparkSql: String, duckSql: String): Entry =
    Entry((s, dir) => { registerAll(s, dir); s.sql(sparkSql) }, Some(duckSql))

  /** Same SQL text runs on both engines. */
  def portableSqlEntry(sql: String): Entry = sqlEntry(sql, sql)
}
