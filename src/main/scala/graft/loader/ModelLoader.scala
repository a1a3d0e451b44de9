package graft.loader

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import graft.core._

/** Project loader (reference: sqlmesh/core/loader.py:191 `Loader.load` +
  * the `MODEL (...)` header dialect, core/dialect.py:45/:123): glob
  * `models/**/*.sql`, split each file into its MODEL header, optional
  * pre/post statements, and the query body; parse header properties into a
  * [[Model]]. The body stays Spark SQL — Plane A runs on Catalyst untouched.
  *
  * Supported header surface (the reference's commonly-used subset):
  * {{{
  * MODEL (
  *   name mart.daily_revenue,
  *   kind INCREMENTAL_BY_TIME_RANGE (
  *     time_column ds,
  *     batch_size 10,
  *     lookback 2,
  *     forward_only true
  *   ),
  *   cron '@daily',
  *   start '2024-01-01',
  *   owner team_data,
  *   tags (finance, daily),
  *   grains (ds, cust_id),
  *   audits (not_null(columns = (ds)), unique_values(columns = (cust_id))),
  *   partitioned_by (ds),
  *   clustered_by (cust_id),
  *   storage_format parquet
  * );
  * -- optional pre-statements, then the query, then post-statements:
  * SELECT ...;
  * }}}
  */
object ModelLoader {

  def loadDirectory(dir: String): Seq[Model] = loadProject(dir)._1

  /** Load a project directory: `MODEL (...)` files become models,
    * `AUDIT (...)` files become standalone audits (audit/definition.py:559). */
  def loadProject(dir: String): (Seq[Model], Seq[graft.audits.StandaloneAudit],
                                 Seq[graft.metrics.Metric]) = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) return (Nil, Nil, Nil)
    // project-wide defaults from config.yaml (reference core/config/root.py
    // Config.model_defaults): merged UNDER each model's header props
    val config = ProjectConfig.load(dir).getOrElse(ProjectConfig())
    val files = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".sql") && Files.isRegularFile(p))
      .toSeq.sortBy(_.toString)
      .map(p => (new String(Files.readAllBytes(p), "UTF-8"), p.toString))
    // route by FIRST header keyword: METRIC / AUDIT / MODEL files coexist in
    // one project tree (reference loader.py routes models/, audits/, metrics/)
    def headerOf(text: String): String = {
      val up = stripComments(text).toUpperCase
      Seq("METRIC", "AUDIT", "MODEL").map(k => k -> up.indexOf(k))
        .filter(_._2 >= 0).sortBy(_._2).headOption.map(_._1).getOrElse("MODEL")
    }
    val byHeader = files.groupBy { case (t, _) => headerOf(t) }
    def abs(p: String): String = Paths.get(p).toAbsolutePath.normalize.toString
    (byHeader.getOrElse("MODEL", Nil).flatMap { case (t, src) =>
        parseAll(t, src, config).map(_.copy(sourcePath = Some(abs(src)))) },
      byHeader.getOrElse("AUDIT", Nil).map { case (t, src) => parseStandaloneAudit(t, src) },
      byHeader.getOrElse("METRIC", Nil).flatMap { case (t, src) => parseMetrics(t, src) })
  }

  /** `METRIC (name a, expression SUM(x), table raw.orders, dims (d expr, …))`
    * — metric file DDL (reference metric/definition.py:69 MetricMeta,
    * load_metric_ddl :24; several METRIC statements may share a file).
    * `table`/`dims` locate the measure on a base model (the reference infers
    * them from table-qualified column refs; explicit props keep the Spark
    * rewriter's one-subquery-per-base-model expansion unambiguous). Derived
    * metrics (formulas over other metrics) omit `table`. */
  def parseMetrics(text: String, source: String = "<inline>"): Seq[graft.metrics.Metric] = {
    val noComments = stripComments(text)
    val out = Seq.newBuilder[graft.metrics.Metric]
    var rest = noComments
    var idx = rest.toUpperCase.indexOf("METRIC")
    while (idx >= 0) {
      val open = rest.indexOf('(', idx)
      require(open > 0, s"$source: METRIC header missing '('")
      val (headerBody, after) = balanced(rest, open)
      val props = splitTopLevel(headerBody, ',').map(parseProp).toMap
      val name = unq(props.getOrElse("name",
        throw new IllegalArgumentException(s"$source: METRIC needs name"))).toLowerCase
      val expression = props.getOrElse("expression",
        throw new IllegalArgumentException(s"$source: METRIC $name needs expression"))
      val dims = props.get("dims").map { spec =>
        val t = spec.trim
        val inner = if (t.startsWith("(") && t.endsWith(")"))
          t.substring(1, t.length - 1) else t
        splitTopLevel(inner, ',').map(parseProp).map { case (k, v) => k -> v }.toMap
      }.getOrElse(Map.empty)
      out += graft.metrics.Metric(name, expression,
        table = props.get("table").map(unq).getOrElse(""), dims = dims)
      rest = after
      idx = rest.toUpperCase.indexOf("METRIC")
    }
    out.result()
  }

  /** `AUDIT (name ..., blocking ...); SELECT ...` — a standalone audit file. */
  def parseStandaloneAudit(text: String, source: String = "<inline>"): graft.audits.StandaloneAudit = {
    val noComments = stripComments(text)
    val aIdx = noComments.toUpperCase.indexOf("AUDIT")
    require(aIdx >= 0, s"$source: no AUDIT header")
    val open = noComments.indexOf('(', aIdx)
    require(open > 0, s"$source: AUDIT header missing '('")
    val (headerBody, afterHeader) = balanced(noComments, open)
    val props = splitTopLevel(headerBody, ',').map(parseProp).toMap
    val statements = splitTopLevel(afterHeader.dropWhile(c => c == ';' || c.isWhitespace), ';')
      .map(_.trim).filter(_.nonEmpty)
    val qIdx = statements.indexWhere(s =>
      s.toUpperCase.startsWith("SELECT") || s.toUpperCase.startsWith("WITH"))
    require(qIdx >= 0, s"$source: no SELECT/WITH query after AUDIT header")
    graft.audits.StandaloneAudit(
      name = props.getOrElse("name", throw new IllegalArgumentException(s"$source: AUDIT needs name")),
      sql = statements(qIdx),
      blocking = props.get("blocking").forall(_.trim.toBoolean),
      description = props.get("description").map(unq))
  }

  /** Blueprint expansion (reference `blueprints` model property,
    * definition.py:2019 create_models_from_blueprints): ONE template file
    * yields one model per key-value mapping — `@{key}` interpolations
    * (names, identifiers) resolve to the UNQUOTED value and
    * `@BLUEPRINT_VAR('key')` references to the raw value, at LOAD time, so
    * every instance carries a concrete name, body, and fingerprint exactly
    * like a hand-written model. Files without the property parse 1:1. */
  def parseAll(text: String, source: String = "<inline>",
               config: ProjectConfig = ProjectConfig()): Seq[Model] = {
    val noComments = stripComments(text)
    val mIdx = noComments.toUpperCase.indexOf("MODEL")
    val open = if (mIdx < 0) -1 else noComments.indexOf('(', mIdx)
    if (open < 0) return Seq(parse(text, source, config))
    val (headerBody, afterHeader) = balanced(noComments, open)
    val headerProps = splitTopLevel(headerBody, ',')
    val parsedProps = headerProps.map(parseProp)
    parsedProps.find(_._1 == "blueprints").map(_._2) match {
      case None => Seq(parse(text, source, config))
      case Some(spec) =>
        val instances = parseBlueprints(spec, source)
        require(instances.nonEmpty, s"$source: blueprints property is empty")
        val cleanedHeader = headerProps.zip(parsedProps)
          .collect { case (raw, (k, _)) if k != "blueprints" => raw }
          .mkString(", ")
        val prefix = noComments.substring(0, mIdx)
        instances.map { vars =>
          var inst = s"${prefix}MODEL ($cleanedHeader)$afterHeader"
          vars.foreach { case (k, v) =>
            val kq = java.util.regex.Pattern.quote(k)
            // both interpolation forms resolve case-insensitively (mapping
            // keys are lowercased, like the reference's validator)
            inst = inst.replaceAll("(?i)@\\{" + kq + "\\}",
              java.util.regex.Matcher.quoteReplacement(unq(v)))
            inst = inst.replaceAll(
              "(?i)@BLUEPRINT_VAR\\(\\s*'" + kq + "'\\s*\\)",
              java.util.regex.Matcher.quoteReplacement(v))
          }
          // an unbound @BLUEPRINT_VAR in an EXPANDED instance is a mapping
          // that forgot a key — fail at load with the key named, not at
          // plan time inside Spark analysis (the reference raises the same)
          "(?i)@BLUEPRINT_VAR\\(\\s*'([^']*)'\\s*\\)".r.findFirstMatchIn(inst)
            .foreach(m => throw new IllegalArgumentException(
              s"$source: blueprint mapping $vars leaves " +
                s"@BLUEPRINT_VAR('${m.group(1)}') unbound"))
          parse(inst, source, config)
        }
    }
  }

  /** `((k = v, …), (k = v2, …))` — or a single `(k = v, …)` mapping. */
  private def parseBlueprints(spec: String,
                              source: String): Seq[Map[String, String]] = {
    val t = spec.trim
    val inner =
      if (t.startsWith("(") && t.endsWith(")")) t.substring(1, t.length - 1).trim
      else t
    val groups = splitTopLevel(inner, ',').map(_.trim).filter(_.nonEmpty)
    if (groups.isEmpty) Nil
    else if (groups.forall(_.startsWith("(")))
      groups.map(g => splitTopLevel(g.stripPrefix("(").stripSuffix(")"), ',')
        .map(_.trim).filter(_.nonEmpty).map(kv).toMap)
    else {
      // a MIXED list (some mappings parenthesized, some bare) is a typo,
      // not a single flat mapping — reject instead of silently mis-keying
      require(!groups.exists(_.startsWith("(")),
        s"$source: blueprints mixes parenthesized and bare mappings: $spec")
      Seq(groups.map(kv).toMap)
    }
  }

  /** `key = value` (blueprint mappings use '=' like parse_properties). */
  private def kv(p: String): (String, String) = {
    val eq = p.indexOf('=')
    require(eq > 0, s"blueprint mapping needs key = value: $p")
    p.substring(0, eq).trim.toLowerCase -> p.substring(eq + 1).trim
  }

  def parse(text: String, source: String = "<inline>",
            config: ProjectConfig = ProjectConfig()): Model = {
    val noComments = stripComments(text)
    val mIdx = {
      val i = noComments.toUpperCase.indexOf("MODEL")
      require(i >= 0, s"$source: no MODEL header")
      i
    }
    val open = noComments.indexOf('(', mIdx)
    require(open > 0, s"$source: MODEL header missing '('")
    val (headerBody, afterHeader) = balanced(noComments, open)
    // config.yaml model_defaults sit UNDER the header props — a prop stated
    // in the header always wins (reference config/model.py precedence)
    val props = config.modelDefaults ++ splitTopLevel(headerBody, ',').map(parseProp).toMap

    // statements after the header: pre-statements, the query, post-statements,
    // plus an optional ON_VIRTUAL_UPDATE_BEGIN; ...; ON_VIRTUAL_UPDATE_END
    // block (reference dialect.py:848-849) whose statements run at promote
    val allStatements = splitTopLevel(afterHeader.dropWhile(c => c == ';' || c.isWhitespace), ';')
      .map(_.trim).filter(_.nonEmpty)
    val vuBegin = allStatements.indexWhere(_.equalsIgnoreCase("ON_VIRTUAL_UPDATE_BEGIN"))
    val vuEnd   = allStatements.indexWhere(_.equalsIgnoreCase("ON_VIRTUAL_UPDATE_END"))
    require(vuBegin < 0 == vuEnd < 0 && vuEnd >= vuBegin,
      s"$source: unbalanced ON_VIRTUAL_UPDATE_BEGIN/END")
    val onVirtualUpdate =
      if (vuBegin >= 0) allStatements.slice(vuBegin + 1, vuEnd) else Nil
    val statements =
      if (vuBegin >= 0) allStatements.take(vuBegin) ++ allStatements.drop(vuEnd + 1)
      else allStatements
    val kind = parseKind(props.getOrElse("kind", "FULL")) match {
      // relative SEED paths resolve against the model FILE, not the CWD
      // (reference model/kind.py SeedKind path semantics)
      case sk: ModelKind.Seed if source != "<inline>" &&
          !java.nio.file.Paths.get(sk.path).isAbsolute =>
        sk.copy(path = java.nio.file.Paths.get(source).toAbsolutePath
          .getParent.resolve(sk.path).normalize.toString)
      case k => k
    }
    val qIdx = statements.indexWhere(s =>
      s.toUpperCase.startsWith("SELECT") || s.toUpperCase.startsWith("WITH"))
    // SEED models are body-less (the csv IS the body — reference seed files
    // declare only the MODEL header); everything else needs a query
    val body = kind match {
      case sk: ModelKind.Seed if qIdx < 0 => SeedBody(sk.path)
      case _ =>
        require(qIdx >= 0, s"$source: no SELECT/WITH query after MODEL header")
        SqlBody(statements(qIdx))
    }

    val name = props.getOrElse("name", throw new IllegalArgumentException(s"$source: MODEL needs name"))
    Model(
      name = name,
      body = body,
      kind = kind,
      cron = unq(props.getOrElse("cron", "@daily")),
      cronTz = props.get("cron_tz").map(unq),
      intervalUnitName = props.get("interval_unit").map(u => unq(u).toLowerCase),
      start = props.get("start").map(s =>
        java.time.LocalDate.parse(unq(s)).toEpochDay * 86400000L),
      grains = props.get("grains").map(listOf).getOrElse(props.get("grain").map(listOf).getOrElse(Nil)),
      entityReferences = props.get("references").map(listOf).getOrElse(Nil),
      audits = props.get("audits").map(parseAudits)
        .orElse(config.defaultAudits.map(parseAudits)).getOrElse(Nil),
      description = props.get("description").map(unq),
      owner = props.get("owner").map(unq),
      tags = (props.get("tags").map(listOf).getOrElse(Nil) ++ config.defaultTags).distinct,
      storageFormat = unq(props.getOrElse("storage_format", "parquet")),
      partitionedBy = props.get("partitioned_by").map(listOf).getOrElse(Nil),
      clusteredBy = props.get("clustered_by").map(listOf).getOrElse(Nil),
      preStatements = if (qIdx < 0) Nil else statements.take(qIdx),
      postStatements = if (qIdx < 0) statements else statements.drop(qIdx + 1),
      onVirtualUpdate = onVirtualUpdate,
      allowPartials = props.get("allow_partials").exists(_.trim.toBoolean),
      columns = props.get("columns").map(parseColumns).getOrElse(Nil),
      onDestructiveChange = unq(props.getOrElse("on_destructive_change", "error")).toLowerCase,
      onAdditiveChange = unq(props.getOrElse("on_additive_change", "allow")).toLowerCase,
      stamp = props.get("stamp").map(unq),
      enabled = props.get("enabled").forall(_.trim.toBoolean),
      ignoredRules = props.get("ignored_rules")
        .map(listOf(_).map(_.toLowerCase).toSet).getOrElse(Set.empty),
      physicalProperties = props.get("physical_properties").map(parseProps).getOrElse(Map.empty),
      sessionProperties = props.get("session_properties").map(parseProps).getOrElse(Map.empty),
      virtualProperties = props.get("virtual_properties").map(parseProps).getOrElse(Map.empty))
  }

  /** `(k1 = v1, k2 = 'v2', …)` property tuples (reference parse_properties,
    * model/meta.py:107-109). */
  private def parseProps(spec: String): Map[String, String] = {
    val t = spec.trim
    val inner = if (t.startsWith("(") && t.endsWith(")")) t.substring(1, t.length - 1) else t
    if (inner.trim.isEmpty) Map.empty
    else splitTopLevel(inner, ',').map { kv =>
      val eq = kv.indexOf('=')
      require(eq > 0, s"property needs key = value: $kv")
      kv.substring(0, eq).trim -> unq(kv.substring(eq + 1).trim)
    }.toMap
  }

  /** `columns (a INT, b STRING)` — declared schema contract. */
  private def parseColumns(spec: String): Seq[(String, String)] = {
    val t = spec.trim
    val inner = if (t.startsWith("(") && t.endsWith(")")) t.substring(1, t.length - 1) else t
    splitTopLevel(inner, ',').map { cd =>
      val sp = cd.trim.indexWhere(_.isWhitespace)
      require(sp > 0, s"column declaration needs `name TYPE`: $cd")
      (cd.trim.substring(0, sp), cd.trim.substring(sp + 1).trim)
    }
  }

  // ------------------------------------------------------------------ kinds

  private def parseKind(spec: String): ModelKind = {
    val s = spec.trim
    val open = s.indexOf('(')
    val (kindName, args) =
      if (open < 0) (s.toUpperCase, Map.empty[String, String])
      else (s.substring(0, open).trim.toUpperCase,
        splitTopLevel(balanced(s, open)._1, ',').map(parseProp).toMap)
    kindName match {
      case "FULL" => ModelKind.Full
      case "VIEW" =>
        if (args.get("materialized").exists(_.trim.toBoolean)) ModelKind.MaterializedView
        else ModelKind.View
      case "EMBEDDED" => ModelKind.Embedded
      case "EXTERNAL" => ModelKind.External
      case "INCREMENTAL_BY_TIME_RANGE" => ModelKind.IncrementalByTimeRange(
        timeColumn = unq(args.getOrElse("time_column",
          throw new IllegalArgumentException("INCREMENTAL_BY_TIME_RANGE needs time_column"))),
        timeFormat = unq(args.getOrElse("time_format", "timestamp")),
        batchSize = args.get("batch_size").map(_.trim.toInt),
        batchConcurrency = args.get("batch_concurrency").map(_.trim.toInt),
        lookback = args.get("lookback").map(_.trim.toInt).getOrElse(0),
        forwardOnly = args.get("forward_only").exists(_.trim.toBoolean),
        autoRestatementCron = args.get("auto_restatement_cron").map(unq),
        autoRestatementIntervals = args.get("auto_restatement_intervals").map(_.trim.toInt))
      case "INCREMENTAL_BY_UNIQUE_KEY" => ModelKind.IncrementalByUniqueKey(
        uniqueKey = listOf(args.getOrElse("unique_key",
          throw new IllegalArgumentException("INCREMENTAL_BY_UNIQUE_KEY needs unique_key"))),
        whenMatchedDelete = args.get("when_matched_delete").map(unq),
        mergeFilter = args.get("merge_filter"),
        buckets = args.get("buckets").map(_.trim.toInt).getOrElse(0),
        autoRestatementCron = args.get("auto_restatement_cron").map(unq))
      case "INCREMENTAL_BY_PARTITION" =>
        ModelKind.IncrementalByPartition(args.get("partitioned_by").map(listOf).getOrElse(Nil))
      case "INCREMENTAL_UNMANAGED" =>
        ModelKind.IncrementalUnmanaged(args.get("insert_overwrite").exists(_.trim.toBoolean))
      case "SCD_TYPE_2" | "SCD_TYPE_2_BY_TIME" => ModelKind.ScdType2ByTime(
        uniqueKey = listOf(args.getOrElse("unique_key",
          throw new IllegalArgumentException("SCD_TYPE_2_BY_TIME needs unique_key"))),
        updatedAtCol = unq(args.getOrElse("updated_at_name", "updated_at")),
        validFromCol = unq(args.getOrElse("valid_from_name", "valid_from")),
        validToCol = unq(args.getOrElse("valid_to_name", "valid_to")),
        updatedAtAsValidFrom = args.get("updated_at_as_valid_from").exists(_.trim.toBoolean),
        invalidateHardDeletes = args.get("invalidate_hard_deletes").forall(_.trim.toBoolean))
      case "SCD_TYPE_2_BY_COLUMN" => ModelKind.ScdType2ByColumn(
        uniqueKey = listOf(args.getOrElse("unique_key",
          throw new IllegalArgumentException("SCD_TYPE_2_BY_COLUMN needs unique_key"))),
        checkColumns = listOf(args.getOrElse("columns", "*")),
        executionTimeAsValidFrom = args.get("execution_time_as_valid_from").exists(_.trim.toBoolean),
        invalidateHardDeletes = args.get("invalidate_hard_deletes").forall(_.trim.toBoolean))
      case "SEED" =>
        // csv_settings (delimiter ',', quotechar '"', …) — the reference's
        // CsvSettings block (model/seed.py:27), mapped onto Spark's csv
        // reader option names; unknown keys pass through verbatim so any
        // native Spark csv option also works
        val csvNameMap = Map(
          "delimiter" -> "sep", "quotechar" -> "quote", "escapechar" -> "escape",
          "lineterminator" -> "lineSep", "encoding" -> "encoding",
          "na_values" -> "nullValue",
          "skipinitialspace" -> "ignoreLeadingWhiteSpace")
        val csvSettings = args.get("csv_settings").map { spec =>
          val t = spec.trim
          val inner = if (t.startsWith("(") && t.endsWith(")"))
            t.substring(1, t.length - 1) else t
          splitTopLevel(inner, ',').map(parseProp).map { case (k, v) =>
            csvNameMap.getOrElse(k, k) -> unq(v)
          }.toMap
        }.getOrElse(Map.empty)
        ModelKind.Seed(
          unq(args.getOrElse("path", throw new IllegalArgumentException("SEED needs path"))),
          batchSize = args.get("batch_size").map(_.trim.toInt).getOrElse(1000),
          options = csvSettings ++
            (args - "path" - "batch_size" - "csv_settings")
              .map { case (k, v) => k -> unq(v) })
      case "MANAGED" => ModelKind.Managed(
        targetLag = unq(args.getOrElse("target_lag", "downstream")),
        properties = (args - "target_lag").map { case (k, v) => k -> unq(v) })
      case "CUSTOM" => ModelKind.Custom(
        unq(args.getOrElse("materialization",
          throw new IllegalArgumentException("CUSTOM needs materialization"))),
        args - "materialization" - "auto_restatement_cron" map { case (k, v) => k -> unq(v) },
        autoRestatementCron = args.get("auto_restatement_cron").map(unq))
      case other => throw new IllegalArgumentException(s"unknown kind: $other")
    }
  }

  /** audits (not_null(columns = (a, b)), unique_values(columns = (id))) */
  private def parseAudits(spec0: String): Seq[(String, Map[String, String])] = {
    val t = spec0.trim
    // the prop value arrives wrapped in the audits(...) list parens
    val spec = if (t.startsWith("(") && t.endsWith(")")) t.substring(1, t.length - 1) else t
    splitTopLevel(spec.trim, ',').map { a =>
      val s = a.trim
      val open = s.indexOf('(')
      if (open < 0) s -> Map.empty[String, String]
      else {
        val name = s.substring(0, open).trim
        val args = splitTopLevel(balanced(s, open)._1, ',').map { kv =>
          val eq = kv.indexOf('=')
          require(eq > 0, s"audit arg needs key = value: $kv")
          val k = kv.substring(0, eq).trim
          val v = kv.substring(eq + 1).trim
          // (a, b) lists flatten to the comma form the audit templates take
          k -> (if (v.startsWith("(")) listOf(v).mkString(", ") else unq(v))
        }.toMap
        name -> args
      }
    }
  }

  // ------------------------------------------------------------------ lexing

  private def stripComments(s: String): String =
    s.replaceAll("(?s)/\\*.*?\\*/", " ").replaceAll("--[^\n]*", " ")

  /** Content inside the paren opening at `open`, plus the remainder after. */
  private def balanced(s: String, open: Int): (String, String) = {
    var depth = 0; var i = open; var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') inStr = !inStr
      else if (!inStr && c == '(') depth += 1
      else if (!inStr && c == ')') {
        depth -= 1
        if (depth == 0) return (s.substring(open + 1, i), s.substring(i + 1))
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parens from offset $open")
  }

  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]; val cur = new StringBuilder
    var depth = 0; var inStr = false
    s.foreach {
      case '\'' => inStr = !inStr; cur.append('\'')
      case c if inStr => cur.append(c)
      case c @ '(' => depth += 1; cur.append(c)
      case c @ ')' => depth -= 1; cur.append(c)
      case c if c == sep && depth == 0 => out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** `key value-with-possible-spaces` → (key, value) */
  private def parseProp(p: String): (String, String) = {
    val t = p.trim
    val sp = t.indexWhere(_.isWhitespace)
    if (sp < 0) (t.toLowerCase, "")
    else (t.substring(0, sp).toLowerCase, t.substring(sp + 1).trim)
  }

  private def listOf(s: String): Seq[String] = {
    val t = s.trim
    val inner = if (t.startsWith("(") && t.endsWith(")")) t.substring(1, t.length - 1) else t
    splitTopLevel(inner, ',').map(unq)
  }

  private def unq(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.startsWith("'") && t.endsWith("'")) t.substring(1, t.length - 1) else t
  }
}
