package graft.loader

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import graft.core._

/** dbt project loader (reference: sqlmesh/dbt/ — loader.py, project.py,
  * model.py `model_kind` :272, basemodel.py `Materialization` :48,
  * source.py, seed.py): loads a dbt-layout project directory into graft
  * [[Model]]s, so an existing dbt repo plans/applies like a native project.
  *
  * Supported surface (the commonly-used core):
  *  - `dbt_project.yml`: `name`, `model-paths`, `seed-paths`,
  *    `snapshot-paths`, `vars`
  *  - `models/` *.sql files: `{{ config(...) }}` header — materialized
  *    table|view|incremental|ephemeral, schema, alias, unique_key,
  *    incremental_strategy, partition_by, cluster_by, tags, enabled —
  *    mapped to ModelKinds exactly as the reference does (model.py:272):
  *    table → FULL, view → VIEW, ephemeral → EMBEDDED, incremental +
  *    time_column-ish (`event_time`) → INCREMENTAL_BY_TIME_RANGE,
  *    incremental + unique_key → INCREMENTAL_BY_UNIQUE_KEY, else
  *    INCREMENTAL_UNMANAGED (insert_overwrite when the strategy says so)
  *  - `models/` *.yml files: `sources:` blocks → external relation names
  *    (what `{{ source('a','b') }}` must resolve to)
  *  - `seeds/` *.csv files → SEED models
  *  - `snapshots/` *.sql files: `{% snapshot name %}…{% endsnapshot %}` with
  *    strategy=timestamp → SCD_TYPE_2_BY_TIME, strategy=check →
  *    SCD_TYPE_2_BY_COLUMN (reference dbt snapshots ↔ sqlmesh SCD2 kinds)
  *
  * Bodies keep their Jinja (`ref`/`source`/`var`/`is_incremental`/`this`) —
  * [[graft.macros.Jinja]] renders at evaluation time.
  */
object DbtLoader {

  /** `loadedAtField` + warn/error staleness thresholds drive `dbt source
    * freshness` (reference dbt source.config: `loaded_at_field`,
    * `freshness.warn_after/error_after`); table-level settings override
    * source-level ones. */
  final case class DbtSource(source: String, table: String, relation: String,
                             loadedAtField: Option[String] = None,
                             warnAfterMs: Option[Long] = None,
                             errorAfterMs: Option[Long] = None)

  final case class DbtProject(
      name: String,
      models: Seq[Model],
      sources: Seq[DbtSource],
      vars: Map[String, String])

  private val mapper = new ObjectMapper(new YAMLFactory())

  def loadProject(dir: String, extraVars: Map[String, String] = Map.empty): DbtProject = {
    val root = Paths.get(dir)
    val projFile = root.resolve("dbt_project.yml")
    require(Files.exists(projFile), s"not a dbt project: $dir (no dbt_project.yml)")
    val proj = mapper.readTree(new String(Files.readAllBytes(projFile), "UTF-8"))
    val projName = Option(proj.get("name")).map(_.asText).getOrElse("dbt")
    def paths(key: String, default: String): Seq[Path] =
      (Option(proj.get(key)).map(_.elements().asScala.map(_.asText).toSeq)
        .getOrElse(Seq(default))).map(root.resolve)
    val vars = Option(proj.get("vars")).map(nodeToVars).getOrElse(Map.empty) ++ extraVars

    val modelFiles = paths("model-paths", "models").flatMap(walk(_, ".sql"))
    val ymlFiles = paths("model-paths", "models").flatMap(p =>
      walk(p, ".yml") ++ walk(p, ".yaml"))
    val seedFiles = paths("seed-paths", "seeds").flatMap(walk(_, ".csv"))
    val snapFiles = paths("snapshot-paths", "snapshots").flatMap(walk(_, ".sql"))

    val models = modelFiles.flatMap(p => parseModel(p, projName))
    val seeds = seedFiles.map { p =>
      Model(s"$projName.${stem(p)}", SeedBody(p.toString),
        kind = ModelKind.Seed(p.toString))
    }
    val snaps = snapFiles.flatMap(p => parseSnapshots(p, projName))
    val sources = ymlFiles.flatMap(parseSources)
    // dbt refs are project-internal SHORT names ({{ ref('stg_orders') }});
    // resolve them here, where the whole registry is known — so both
    // dependency extraction and rendering see the full model name
    val all = models ++ seeds ++ snaps
    val byStem: Map[String, String] =
      all.groupBy(_.name.split('.').last).collect {
        case (stem, ms) if ms.size == 1 => stem -> ms.head.name
      }
    val refRe = "(?is)(?:\\{\\{\\s*)?ref\\(\\s*['\"]([^'\"]+)['\"]\\s*\\)(?:\\s*\\}\\})?".r
    def resolveRefs(sql: String): String =
      refRe.replaceAllIn(sql, mm => java.util.regex.Matcher.quoteReplacement(
        byStem.getOrElse(mm.group(1), mm.group(1))))
    // project-defined {% macro %}s (reference sqlmesh/dbt macro support,
    // utils/jinja.py MacroExtractor): macro sources are PREPENDED to each
    // model body that calls one — definitions emit nothing when rendered,
    // the model stays hermetic (a macro edit changes the model's
    // fingerprint, so plans categorize it as a change — same reason the
    // reference hashes macro references into the data hash)
    val macroFiles = paths("macro-paths", "macros").flatMap(walk(_, ".sql"))
    val macroSrc = macroFiles.sortBy(_.toString)
      .map(p => new String(Files.readAllBytes(p), "UTF-8")).mkString("\n")
    val macroNames: Set[String] =
      if (macroSrc.trim.isEmpty) Set.empty
      else graft.macros.Jinja.parseMacros(macroSrc).keySet
    // per-macro source spans, so a model is prepended ONLY the definitions
    // it (transitively) references — concatenating every macro file would
    // change the fingerprint of all macro-calling models whenever ANY macro
    // is edited, forcing rebuilds of models that never reference it
    // (reference hashes only referenced macros into the data hash)
    val macroDefRe =
      """(?s)\{%-?\s*macro\s+([A-Za-z_]\w*)\s*\(.*?\{%-?\s*endmacro\s*-?%\}""".r
    val macroSrcByName: Map[String, String] =
      macroDefRe.findAllMatchIn(macroSrc).map(m => m.group(1) -> m.matched).toMap
    // call detection tolerates whitespace between name and '(' — jinja
    // allows `{{ money (x) }}`
    def callsIn(text: String): Set[String] = macroNames.filter { n =>
      ("""\b""" + java.util.regex.Pattern.quote(n) + """\s*\(""").r
        .findFirstIn(text).isDefined
    }
    def withMacros(sql: String): String = {
      var seen = Set.empty[String]
      var frontier = callsIn(sql)
      while (frontier.nonEmpty) {
        seen ++= frontier
        frontier = frontier.flatMap(n =>
          callsIn(macroSrcByName.getOrElse(n, ""))) -- seen
      }
      if (seen.isEmpty) sql
      else if (!seen.forall(macroSrcByName.contains)) s"$macroSrc\n$sql" // span extraction missed one: keep old behavior
      else seen.toSeq.sorted.map(macroSrcByName).mkString("\n") + "\n" + sql
    }
    // schema.yml column tests attach as audits (keyed by dbt's short name)
    // MERGE per-model across yml files: several schema.yml files may declare
    // tests for the same model (dbt model names are project-unique by stem,
    // so the stem key is safe, but a bare .toMap would silently drop all but
    // the LAST file's tests)
    val tests = ymlFiles.flatMap(parseModelTests(_).toSeq)
      .groupBy(_._1).map { case (stem, vs) => stem -> vs.flatMap(_._2) }
    val allNames = all.map(_.name).toSet
    val resolved = all.map { m =>
      val withAudits = tests.get(m.name.split('.').last) match {
        case Some(as) =>
          val resolvedAudits = as.map { case (n, args) =>
            n -> args.map { case (k, v) => k -> resolveRefs(v) } // relationships `to:`
          }
          // a relationships parent is a real dependency: it must evaluate
          // first and resolve to its physical table in the audit SQL (dbt
          // adds the same test edge to its DAG)
          val parents = resolvedAudits.collect {
            case ("relationships", args) if allNames(args("to")) => args("to")
          }
          m.copy(audits = m.audits ++ resolvedAudits, dependsOn = m.dependsOn ++ parents)
        case None => m
      }
      withAudits.body match {
        case SqlBody(sql) => withAudits.copy(body = SqlBody(withMacros(resolveRefs(sql))))
        case _ => withAudits
      }
    }
    DbtProject(projName, resolved, sources, vars)
  }

  // ------------------------------------------------------------- models

  private val configBlock =
    "(?is)\\{\\{\\s*config\\s*\\((.*?)\\)\\s*\\}\\}".r

  /** One models/x.sql file → Model (None when config(enabled=false)). */
  def parseModel(p: Path, projName: String): Option[Model] = {
    val text = new String(Files.readAllBytes(p), "UTF-8")
    val cfg = configBlock.findFirstMatchIn(text).map(m => parseConfig(m.group(1)))
      .getOrElse(Map.empty)
    if (cfg.get("enabled").exists(_.equalsIgnoreCase("false"))) return None
    val body = configBlock.replaceAllIn(text, "").trim
    val schema = cfg.getOrElse("schema", projName)
    val name = s"$schema.${cfg.getOrElse("alias", stem(p))}"
    Some(Model(name, SqlBody(body),
      kind = kindOf(cfg, name),
      tags = cfg.get("tags").map(splitList).getOrElse(Nil),
      partitionedBy = cfg.get("partition_by").map(splitList).getOrElse(Nil),
      clusteredBy = cfg.get("cluster_by").map(splitList).getOrElse(Nil)))
  }

  /** Materialization → ModelKind, following reference model.py:272
    * `model_kind` (TABLE→Full, VIEW→View, EPHEMERAL→Embedded; INCREMENTAL
    * splits on event_time / unique_key / neither). */
  private def kindOf(cfg: Map[String, String], name: String): ModelKind =
    cfg.getOrElse("materialized", "view").toLowerCase match {
      case "table"     => ModelKind.Full
      case "view"      => ModelKind.View
      case "ephemeral" => ModelKind.Embedded
      case "incremental" =>
        val strategy = cfg.get("incremental_strategy").map(_.toLowerCase)
        val timeCol = cfg.get("event_time") // microbatch-style time column
          .orElse(cfg.get("time_column"))
        if (timeCol.isDefined)
          ModelKind.IncrementalByTimeRange(
            timeColumn = timeCol.get,
            lookback = cfg.get("lookback").map(_.toInt).getOrElse(0),
            batchSize = cfg.get("batch_size").flatMap(_.toIntOption))
        else cfg.get("unique_key") match {
          case Some(keys) =>
            ModelKind.IncrementalByUniqueKey(uniqueKey = splitList(keys),
              mergeFilter = cfg.get("incremental_predicates"))
          case None =>
            // append by default; insert_overwrite/delete+insert strategies
            // overwrite the partitions present in the increment
            ModelKind.IncrementalUnmanaged(insertOverwrite =
              strategy.exists(s => s == "insert_overwrite" || s == "delete+insert"))
        }
      case other =>
        throw new IllegalArgumentException(s"$name: unsupported materialization '$other'")
    }

  // ----------------------------------------------------------- snapshots

  private val snapshotBlock =
    "(?is)\\{%\\s*snapshot\\s+(\\w+)\\s*%\\}(.*?)\\{%\\s*endsnapshot\\s*%\\}".r

  /** dbt snapshot blocks → SCD2 models (strategy=timestamp → by-time with
    * its updated_at; strategy=check → by-column over check_cols). */
  def parseSnapshots(p: Path, projName: String): Seq[Model] = {
    val text = new String(Files.readAllBytes(p), "UTF-8")
    snapshotBlock.findAllMatchIn(text).toSeq.map { m =>
      val snapName = m.group(1)
      val inner = m.group(2)
      val cfg = configBlock.findFirstMatchIn(inner).map(x => parseConfig(x.group(1)))
        .getOrElse(Map.empty)
      val body = configBlock.replaceAllIn(inner, "").trim
      val keys = splitList(cfg.getOrElse("unique_key",
        throw new IllegalArgumentException(s"snapshot $snapName needs unique_key")))
      val schema = cfg.getOrElse("target_schema", cfg.getOrElse("schema", projName))
      val kind = cfg.getOrElse("strategy", "timestamp").toLowerCase match {
        case "timestamp" => ModelKind.ScdType2ByTime(keys,
          updatedAtCol = cfg.getOrElse("updated_at", "updated_at"))
        case "check" => ModelKind.ScdType2ByColumn(keys,
          checkColumns = cfg.get("check_cols").map(splitList).getOrElse(Seq("*")))
        case other =>
          throw new IllegalArgumentException(s"snapshot $snapName: unknown strategy '$other'")
      }
      Model(s"$schema.$snapName", SqlBody(body), kind = kind)
    }
  }

  // ------------------------------------------------------------ sources

  /** `sources:` blocks in schema yml → relation names `{{ source(a,b) }}`
    * resolves to. Relation = [database.]schema.identifier with dbt's
    * defaulting (schema defaults to the source name, identifier to the
    * table name) — reference sqlmesh/dbt/source.py. */
  def parseSources(p: Path): Seq[DbtSource] = {
    val node = mapper.readTree(new String(Files.readAllBytes(p), "UTF-8"))
    val srcs = Option(node.get("sources")).toSeq.flatMap(_.elements().asScala)
    // freshness thresholds: {count: N, period: minute|hour|day} → millis
    def thresholdMs(node: com.fasterxml.jackson.databind.JsonNode,
                    key: String): Option[Long] =
      Option(node.get("freshness")).flatMap(f => Option(f.get(key))).flatMap { t =>
        val count = t.path("count").asLong(0L)
        val unit = t.path("period").asText("hour") match {
          case "minute" => 60000L
          case "day"    => 86400000L
          case _        => 3600000L // hour (dbt's default period)
        }
        // a malformed block (count missing/zero) must not become a 0 ms
        // threshold that flags every fresh source (r8 review finding)
        if (count > 0) Some(count * unit) else None
      }
    srcs.flatMap { s =>
      val srcName = s.path("name").asText
      val schema = Option(s.get("schema")).map(_.asText).getOrElse(srcName)
      val srcLoadedAt = Option(s.get("loaded_at_field")).map(_.asText)
      val (srcWarn, srcErr) = (thresholdMs(s, "warn_after"), thresholdMs(s, "error_after"))
      Option(s.get("tables")).toSeq.flatMap(_.elements().asScala).map { t =>
        val tab = t.path("name").asText
        val ident = Option(t.get("identifier")).map(_.asText).getOrElse(tab)
        DbtSource(srcName, tab, s"$schema.$ident",
          loadedAtField = Option(t.get("loaded_at_field")).map(_.asText).orElse(srcLoadedAt),
          warnAfterMs = thresholdMs(t, "warn_after").orElse(srcWarn),
          errorAfterMs = thresholdMs(t, "error_after").orElse(srcErr))
      }
    }
  }

  // ----------------------------------------------------- schema.yml tests

  /** `models:` blocks in schema yml → per-model audits (the dbt column-test
    * surface, mapped onto the builtin audit templates):
    * `unique` → unique_values, `not_null` → not_null, `accepted_values` →
    * accepted_values, `relationships` → relationships (referential check;
    * `to: ref('parent')` resolves with the project's ref registry).
    * Returns model-STEM → audits. */
  def parseModelTests(p: Path): Map[String, Seq[(String, Map[String, String])]] = {
    val node = mapper.readTree(new String(Files.readAllBytes(p), "UTF-8"))
    val models = Option(node.get("models")).toSeq.flatMap(_.elements().asScala)
    models.map { m =>
      val name = m.path("name").asText
      val audits = Option(m.get("columns")).toSeq.flatMap(_.elements().asScala).flatMap { c =>
        val colName = c.path("name").asText
        Option(c.get("tests")).orElse(Option(c.get("data_tests"))).toSeq
          .flatMap(_.elements().asScala).flatMap { t =>
            if (t.isTextual) t.asText match {
              case "unique"   => Some("unique_values" -> Map("columns" -> colName))
              case "not_null" => Some("not_null" -> Map("columns" -> colName))
              case other =>
                System.err.println(s"[graft] WARN unsupported dbt test '$other' on $name.$colName")
                None
            } else {
              val fields = t.properties().asScala.toSeq
              fields.headOption.flatMap { e =>
                val args = e.getValue
                e.getKey match {
                  case "accepted_values" =>
                    val vs = Option(args.get("values")).toSeq
                      .flatMap(_.elements().asScala).map { v =>
                        if (v.isNumber || v.isBoolean) v.asText
                        else "'" + v.asText.replace("'", "''") + "'"
                      }
                    Some("accepted_values" ->
                      Map("column" -> colName, "is_in" -> vs.mkString(", ")))
                  case "relationships" =>
                    Some("relationships" -> Map("column" -> colName,
                      "to" -> args.path("to").asText,
                      "field" -> args.path("field").asText))
                  case other =>
                    System.err.println(s"[graft] WARN unsupported dbt test '$other' on $name.$colName")
                    None
                }
              }
            }
          }
      }
      name -> audits
    }.filter(_._2.nonEmpty).toMap
  }

  // ------------------------------------------------------------- helpers

  private def walk(dir: Path, suffix: String): Seq[Path] =
    if (!Files.exists(dir)) Nil
    else Files.walk(dir).iterator().asScala
      .filter(f => f.toString.endsWith(suffix) && Files.isRegularFile(f))
      .toSeq.sortBy(_.toString)

  private def stem(p: Path): String = {
    val f = p.getFileName.toString
    f.substring(0, f.lastIndexOf('.'))
  }

  /** Parse `key=value, key=[a, b], key='str'` config args (python-literal
    * subset: strings, numbers, booleans, flat lists). */
  def parseConfig(args: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var depth = 0; var q = ' '
    val cur = new StringBuilder
    val parts = Seq.newBuilder[String]
    args.foreach {
      case c @ ('\'' | '"') if q == ' '  => q = c; cur.append(c)
      case c if q != ' '                 => if (c == q) q = ' '; cur.append(c)
      case c @ ('[' | '(' | '{')         => depth += 1; cur.append(c)
      case c @ (']' | ')' | '}')         => depth -= 1; cur.append(c)
      case ',' if depth == 0             => parts += cur.toString; cur.clear()
      case c                             => cur.append(c)
    }
    if (cur.nonEmpty) parts += cur.toString
    parts.result().foreach { part =>
      part.split("=", 2) match {
        case Array(k, v) => out += k.trim -> unquote(v.trim)
        case _           => // bare arg — ignore
      }
    }
    out.result()
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && ((s.head == '\'' && s.last == '\'') ||
        (s.head == '"' && s.last == '"'))) s.substring(1, s.length - 1)
    else s

  /** `[a, 'b']` or `a` → Seq(a, b). */
  private def splitList(s: String): Seq[String] = {
    val inner = if (s.startsWith("[") && s.endsWith("]")) s.substring(1, s.length - 1) else s
    inner.split(",").map(x => unquote(x.trim)).filter(_.nonEmpty).toSeq
  }

  private def nodeToVars(n: JsonNode): Map[String, String] =
    n.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap
}
