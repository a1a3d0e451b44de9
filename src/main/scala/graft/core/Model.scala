package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A model: named query + metadata — the reference's `_Model`/`SqlModel`/
  * `PythonModel`/`SeedModel` (sqlmesh/core/model/definition.py:99,1353,1646,1876).
  *
  * The body is either Spark SQL (Plane A runs natively on Catalyst) or a Scala
  * function producing a DataFrame (the reference's Python-model analog).
  */
sealed trait ModelBody
final case class SqlBody(sql: String) extends ModelBody
/** (spark, resolved upstream tables, start_ms, end_ms) => DataFrame */
final case class ScalaBody(fn: (SparkSession, Map[String, String], Long, Long) => DataFrame)
    extends ModelBody
final case class SeedBody(csvPath: String) extends ModelBody

final case class Model(
    name: String,                       // fully-qualified "schema.table"
    body: ModelBody,
    kind: ModelKind = ModelKind.Full,
    cron: String = "@daily",
    start: Option[Long] = None,         // default backfill start (epoch ms)
    dependsOn: Set[String] = Set.empty, // explicit upstream names (else extracted)
    grains: Seq[String] = Nil,
    audits: Seq[(String, Map[String, String])] = Nil, // (audit name, args)
    description: Option[String] = None,
    owner: Option[String] = None,
    tags: Seq[String] = Nil,
    storageFormat: String = "parquet",
    partitionedBy: Seq[String] = Nil,
    /** clustered_by (reference model prop → mixins.py:84): rows co-located
      * and sorted by these columns within each written file, so downstream
      * joins/filters on them hit fewer, sorted row groups. */
    clusteredBy: Seq[String] = Nil,
    preStatements: Seq[String] = Nil,
    postStatements: Seq[String] = Nil,
    /** statements executed after the virtual-layer update (promote), with
      * @this_model resolving to the environment VIEW, not the physical table
      * (reference on_virtual_update: model/definition.py:158,1433, executed
      * snapshot/evaluator.py:1284). Metadata-only: editing them never
      * triggers a backfill (definition.py:2620). */
    onVirtualUpdate: Seq[String] = Nil,
    allowPartials: Boolean = false,
    /** declared output schema contract (reference `columns (...)`,
      * model/definition.py columns_to_types): when present, every insert is
      * cast/projected to exactly these columns — a rename or type drift in
      * the body fails loudly instead of silently changing the table. */
    columns: Seq[(String, String)] = Nil,
    /** forward-only migration guard (reference on_destructive_change):
      * "error" (default) aborts a migration that drops/narrows columns,
      * "warn" prints and proceeds, "allow" is silent. */
    onDestructiveChange: String = "error") {

  require(name.nonEmpty)
  def schemaName: String = name.split('.').dropRight(1).mkString(".") match {
    case "" => "default"; case s => s
  }
  def tableName: String = name.split('.').last
  def intervalUnit: IntervalUnit = IntervalUnit.fromCron(cron)

  /** Upstream model/table references: declared, plus extracted from SQL bodies.
    * Extraction mirrors `d.find_tables` (renderer.py:607) at the level we need:
    * FROM/JOIN identifiers that look like qualified names. */
  def references: Set[String] = body match {
    case SqlBody(sql) => dependsOn ++ Model.extractTables(sql)
    case _            => dependsOn
  }
}

object Model {
  private val tableRef =
    """(?is)\b(?:from|join)\s+([a-zA-Z_][\w]*(?:\.[a-zA-Z_][\w]*)*)""".r

  /** Cheap dependency extraction from SQL text; CTE names are excluded. */
  def extractTables(sql: String): Set[String] = {
    val noStrings = sql.replaceAll("'[^']*'", "''")
    val ctes = """(?is)(?:with|,)\s*([a-zA-Z_]\w*)\s+as\s*\(""".r
      .findAllMatchIn(noStrings).map(_.group(1).toLowerCase).toSet
    tableRef.findAllMatchIn(noStrings)
      .map(_.group(1))
      .filterNot(t => ctes.contains(t.toLowerCase))
      .filterNot(t => t.toLowerCase == "values" || t.toLowerCase == "unnest")
      .toSet
  }
}
