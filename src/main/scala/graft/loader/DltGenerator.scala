package graft.loader

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** dlt-pipeline → incremental-model scaffolding (reference
  * sqlmesh/integrations/dlt.py: `generate_dlt_models_and_settings` :11,
  * `generate_incremental_model` :164, `get_start_date` :228, surfaced as
  * the `sqlmesh dlt_refresh` CLI). The reference attaches to the live
  * pipeline via the dlt package; offline we read what dlt persists on
  * disk — `<pipelines_dir>/<pipeline>/schemas/<name>.schema.json` (the
  * default schema's table/column metadata, including `_dlt_load_id` and
  * primary-key hints) — and emit the same MODEL files:
  *
  *   - one `<dataset>_sqlmesh.incremental_<table>` per data table, as
  *     INCREMENTAL_BY_TIME_RANGE on `_dlt_load_time` =
  *     `to_timestamp(CAST(_dlt_load_id AS DOUBLE))` (dlt load ids are
  *     epoch-seconds strings);
  *   - `grain (pk...)` from primary-key columns;
  *   - nested tables (no `_dlt_load_id`, but `_dlt_parent_id` + `parent`)
  *     join their parent to inherit its load id — dlt's documented
  *     nested-table layout;
  *   - dlt bookkeeping tables (`_dlt_*`) are skipped except the loads
  *     table, exactly like the reference's `_dlt_tables_prefix` filter.
  */
object DltGenerator {

  final case class Generated(name: String, sql: String)

  private val mapper = new ObjectMapper()

  /** dlt data_type → Spark SQL type (dlt's documented type set). */
  private def sparkType(t: String): String = t match {
    case "text"      => "STRING"
    case "double"    => "DOUBLE"
    case "bool"      => "BOOLEAN"
    case "timestamp" => "TIMESTAMP"
    case "date"      => "DATE"
    case "bigint"    => "BIGINT"
    case "binary"    => "BINARY"
    case "decimal"   => "DECIMAL(38,9)"
    case "json" | "complex" => "STRING"
    case "time"      => "STRING"
    case other       => other.toUpperCase
  }

  def schemaFile(pipelinesDir: String, pipeline: String): Option[Path] = {
    val dir = Paths.get(pipelinesDir, pipeline, "schemas")
    if (!Files.isDirectory(dir)) None
    else Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json")).toSeq.sortBy(_.toString)
      .headOption
  }

  /** Load-package start date (reference get_start_date): load ids are
    * epoch-seconds strings; the earliest one, minus a day, floors the
    * backfill start. */
  def startDateFromLoads(pipelinesDir: String, pipeline: String): Option[String] = {
    val dir = Paths.get(pipelinesDir, pipeline, "load", "loaded")
    if (!Files.isDirectory(dir)) None
    else Files.list(dir).iterator().asScala.map(_.getFileName.toString)
      .flatMap(s => scala.util.Try(s.takeWhile(c => c.isDigit || c == '.').toDouble).toOption)
      .minOption
      .map(epoch => java.time.LocalDate.ofInstant(
        java.time.Instant.ofEpochSecond(epoch.toLong),
        java.time.ZoneOffset.UTC).minusDays(1).toString)
  }

  /** dlt persists the attached pipeline's `state.json` with its
    * `dataset_name` — the schema the destination tables live in. */
  def datasetName(pipelinesDir: String, pipeline: String): Option[String] = {
    val p = Paths.get(pipelinesDir, pipeline, "state.json")
    if (!Files.isRegularFile(p)) None
    else Option(mapper.readTree(new String(Files.readAllBytes(p), "UTF-8"))
      .get("dataset_name")).map(_.asText)
  }

  def generate(pipelinesDir: String, pipeline: String, dataset: String,
               tables: Seq[String] = Nil): Seq[Generated] = {
    val file = schemaFile(pipelinesDir, pipeline).getOrElse(
      throw new IllegalArgumentException(
        s"no dlt schema found under $pipelinesDir/$pipeline/schemas"))
    val root = mapper.readTree(new String(Files.readAllBytes(file), "UTF-8"))
    val tablesNode = Option(root.get("tables")).getOrElse(
      throw new IllegalArgumentException(s"no tables in dlt schema $file"))
    val names = tablesNode.fieldNames().asScala.toSeq
    val selected = names.filter { n =>
      (!n.startsWith("_dlt") || n == "_dlt_loads") &&
        (tables.isEmpty || tables.contains(n))
    }
    selected.flatMap { tableName =>
      val t = tablesNode.get(tableName)
      val cols: Seq[(String, String, Boolean)] =
        Option(t.get("columns")).toSeq.flatMap(_.fields().asScala.toSeq.map { e =>
          val c = e.getValue
          (e.getKey,
            Option(c.get("data_type")).map(_.asText).getOrElse("text"),
            Option(c.get("primary_key")).exists(_.asBoolean))
        }).filter(_._2.nonEmpty)
      if (cols.isEmpty) None
      else {
        val colNames = cols.map(_._1)
        val loadId = Seq("_dlt_load_id", "load_id").find(colNames.contains)
        val parent = Option(t.get("parent")).map(_.asText)
          .filter(_ => colNames.contains("_dlt_parent_id"))
        val loadKey = loadId.map("c." + _)
          .orElse(parent.map(_ => "p._dlt_load_id"))
        loadKey.map { lk =>
          val timeExpr = s"to_timestamp(CAST($lk AS DOUBLE))"
          val pk = cols.collect { case (n, _, true) => n }
          val grain = if (pk.nonEmpty) s"\n  grain (${pk.mkString(", ")})," else ""
          val selectCols = cols.map { case (n, dt, _) =>
            s"  CAST(c.$n AS ${sparkType(dt)}) AS $n"
          }.mkString(",\n")
          val fromClause = parent match {
            case Some(p) => s"$dataset.$tableName AS c\nJOIN\n  $dataset.$p AS p\nON\n  c._dlt_parent_id = p._dlt_id"
            case None    => s"$dataset.$tableName AS c"
          }
          val name = s"${dataset}_sqlmesh.incremental_$tableName"
          Generated(name,
            s"""MODEL (
               |  name $name,
               |  kind INCREMENTAL_BY_TIME_RANGE (
               |    time_column _dlt_load_time,
               |  ),$grain
               |);
               |
               |SELECT
               |$selectCols,
               |  $timeExpr AS _dlt_load_time
               |FROM
               |  $fromClause
               |WHERE
               |  $timeExpr BETWEEN @start_ds AND @end_ds
               |""".stripMargin)
        }
      }
    }
  }

  /** Write generated models into `<project>/models/` (reference
    * `generate_dlt_models` → `_create_object_files`), skipping names that
    * already exist unless forced. Returns written model names. */
  def writeModels(projectDir: String, generated: Seq[Generated],
                  existing: Set[String], force: Boolean): Seq[String] = {
    val dir = Paths.get(projectDir, "models")
    Files.createDirectories(dir)
    generated.filter(g => force || !existing.contains(g.name)).map { g =>
      Files.writeString(dir.resolve(g.name.split('.').last + ".sql"), g.sql)
      g.name
    }
  }
}
