package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for the driver-facing query inventory. */
object QueryUtil {
  type QueryFn = (SparkSession, String) => DataFrame

  final case class Entry(fn: QueryFn, oracle: Option[String])

  val tables: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register all base tables as temp views so entries can use spark.sql —
    * the same Plane-A surface users get. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tables.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))

  def sqlEntry(sparkSql: String, duckSql: String): Entry =
    Entry((s, dir) => { registerAll(s, dir); s.sql(sparkSql) }, Some(duckSql))

  /** Same SQL text runs on both engines. */
  def portableSqlEntry(sql: String): Entry = sqlEntry(sql, sql)
}
