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

  /** The resolved profiles.yml output (reference sqlmesh/dbt/profile.py +
    * target.py TargetConfig): the base schema models materialize into, the
    * warehouse type (must be a Spark flavor — graft IS the engine), and
    * threads. Exposed to renders as `{{ target.name }}` etc. */
  final case class DbtTarget(name: String, targetType: String,
                             schema: Option[String], database: Option[String],
                             threads: Int)

  final case class DbtProject(
      name: String,
      models: Seq[Model],
      sources: Seq[DbtSource],
      vars: Map[String, String],
      target: Option[DbtTarget] = None,
      /** model full name → owning vendored package (absent = the project
        * itself); dbt artifact node ids namespace by the owning package */
      pkgOf: Map[String, String] = Map.empty,
      /** model full name → source-file stem where an `alias` config made
        * them differ; dbt's unique_id/name use the RESOURCE (file-stem)
        * name — alias only changes the relation — so artifacts must see
        * the stem or every aliased node mismatches dbt-generated ones */
      stemOf: Map[String, String] = Map.empty)

  private val mapper = new ObjectMapper(new YAMLFactory())

  def loadProject(dir: String, extraVars: Map[String, String] = Map.empty,
                  targetName: Option[String] = None): DbtProject = {
    val root = Paths.get(dir)
    val projFile = root.resolve("dbt_project.yml")
    require(Files.exists(projFile), s"not a dbt project: $dir (no dbt_project.yml)")
    val proj = mapper.readTree(new String(Files.readAllBytes(projFile), "UTF-8"))
    val projName = Option(proj.get("name")).map(_.asText).getOrElse("dbt")
    def paths(key: String, default: String): Seq[Path] =
      (Option(proj.get(key)).map(_.elements().asScala.map(_.asText).toSeq)
        .getOrElse(Seq(default))).map(root.resolve)
    val vars = Option(proj.get("vars")).map(nodeToVars).getOrElse(Map.empty) ++ extraVars

    // profiles.yml / target semantics (reference dbt/profile.py, target.py):
    // the profile keyed by `profile:` (default: project name) selects an
    // output by --target (default: its `target:`); that output's schema is
    // the BASE schema models materialize into, with `+schema` configs
    // SUFFIXED dbt-style (generate_schema_name default: <target>_<custom>).
    // No profiles.yml → the prior graft defaulting (schema config verbatim,
    // else project name), so profile-less projects keep working.
    val profileName = Option(proj.get("profile")).map(_.asText).getOrElse(projName)
    val target = loadProfile(root, profileName, targetName)
    val baseSchema = target.flatMap(_.schema)

    val modelFiles = paths("model-paths", "models").flatMap(walk(_, ".sql"))
    val ymlFiles = paths("model-paths", "models").flatMap(p =>
      walk(p, ".yml") ++ walk(p, ".yaml"))
    val seedFiles = paths("seed-paths", "seeds").flatMap(walk(_, ".csv"))
    val snapFiles = paths("snapshot-paths", "snapshots").flatMap(walk(_, ".sql"))

    val modelPairs = modelFiles.flatMap(p =>
      parseModel(p, projName, baseSchema).map(m => (m, stem(p))))
    val models = modelPairs.map(_._1)
    val seedSchema = baseSchema.getOrElse(projName)
    val seeds = seedFiles.map { p =>
      Model(s"$seedSchema.${stem(p)}", SeedBody(p.toString),
        kind = ModelKind.Seed(p.toString))
    }
    val snaps = snapFiles.flatMap(p => parseSnapshots(p, projName))
    val sources = ymlFiles.flatMap(parseSources)

    // ---- vendored packages (reference sqlmesh/dbt/package.py): every
    // subdirectory of `packages-install-path` (default dbt_packages/) with
    // its own dbt_project.yml is a package — its macros join the Jinja
    // surface (qualified `pkg.m(...)` and, when unambiguous, bare `m(...)`),
    // its models/seeds load like project ones, its global-scoped vars merge
    // UNDER project vars. Unsupported package features fail loudly with the
    // package name rather than rendering wrong SQL.
    val pkgInstall = Option(proj.get("packages-install-path"))
      .map(_.asText).getOrElse("dbt_packages")
    val pkgs = loadPackages(root.resolve(pkgInstall), baseSchema)
    val pkgVars = pkgs.flatMap(_.vars).toMap
    // `{{ target.* }}` render context (reference target.py attribute_dict)
    val targetVars = target.toSeq.flatMap(t => Seq(
      "target.name" -> t.name, "target.type" -> t.targetType,
      "target.schema" -> t.schema.getOrElse(""),
      "target.database" -> t.database.getOrElse(""),
      "target.threads" -> t.threads.toString))
    // project vars win over package vars; the sqlmesh globals mirror the
    // reference's dbt jinja environment (dbt/builtin.py:424-425
    // BUILTIN_GLOBALS sqlmesh=True, sqlmesh_incremental=True) — dbt packages
    // branch on `{% if sqlmesh_incremental is defined %}` to use interval
    // vars instead of the max-lookup incremental pattern
    val allVars = Map("sqlmesh" -> "True", "sqlmesh_incremental" -> "True") ++
      pkgVars ++ vars ++ targetVars
    // dbt refs are project-internal SHORT names ({{ ref('stg_orders') }});
    // resolve them here, where the whole registry is known — so both
    // dependency extraction and rendering see the full model name. Package
    // models join the registry: one-arg refs reach them cross-package (the
    // project's own stem wins a collision, dbt's resolution order), and the
    // two-arg `ref('pkg', 'model')` form pins the package explicitly.
    val projectOwn = models ++ seeds ++ snaps
    val projectSet = projectOwn.map(_.name).toSet
    val all = projectOwn ++ pkgs.flatMap(_.models)
    val byStem: Map[String, String] =
      all.groupBy(_.name.split('.').last).flatMap {
        case (st, ms) if ms.size == 1 => Some(st -> ms.head.name)
        case (st, ms) if ms.count(m => projectSet(m.name)) == 1 =>
          Some(st -> ms.find(m => projectSet(m.name)).get.name)
        case _ => None
      }
    val byPkgStem: Map[(String, String), String] =
      (pkgs.flatMap(p => p.models.map(m =>
        (p.name, m.name.split('.').last) -> m.name)) ++
       projectOwn.map(m => (projName, m.name.split('.').last) -> m.name)).toMap
    val ref2Re = ("(?is)(?:\\{\\{\\s*)?ref\\(\\s*['\"]([^'\"]+)['\"]\\s*,\\s*" +
      "['\"]([^'\"]+)['\"]\\s*\\)(?:\\s*\\}\\})?").r
    val refRe = "(?is)(?:\\{\\{\\s*)?ref\\(\\s*['\"]([^'\"]+)['\"]\\s*\\)(?:\\s*\\}\\})?".r
    def resolveRefs(sql: String): String = {
      // a two-arg ref that misses fails loudly at load time (dbt parse-time
      // behavior) — falling back to the bare stem would emit SQL referencing
      // a nonexistent relation and surface as a confusing run-time error
      val two = ref2Re.replaceAllIn(sql, mm => java.util.regex.Matcher.quoteReplacement(
        byPkgStem.getOrElse((mm.group(1), mm.group(2)),
          throw new IllegalArgumentException(
            s"ref('${mm.group(1)}', '${mm.group(2)}') does not resolve — " +
              s"package '${mm.group(1)}' has no model '${mm.group(2)}'"))))
      refRe.replaceAllIn(two, mm => java.util.regex.Matcher.quoteReplacement(
        byStem.getOrElse(mm.group(1), mm.group(1))))
    }
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
    val macroSrcByName: Map[String, String] =
      (macroDefRe.findAllMatchIn(macroSrc).map(m => m.group(1) -> m.matched) ++
        // {% test t %} blocks register as macros named test_t (dbt's own
        // desugaring), normalized to {% macro %} form so the prepend/render
        // machinery treats them uniformly
        testDefRe.findAllMatchIn(macroSrc).map(m =>
          s"test_${m.group(1)}" -> testSpanToMacro(m.group(1), m.matched))).toMap
    // rewrite package-macro calls onto their namespaced names — ONLY inside
    // Jinja spans ({{ }} / {% %}): macro calls are Jinja constructs, and
    // plain SQL text that shares a name with a vendored macro (packages ship
    // `concat`, `hash`, `split_part`, ...) must not be captured — rewriting
    // a SQL builtin into a nonexistent pkg__ function breaks the query.
    // Qualified `pkg.m(...)` always rewrites (except the builtin dbt_utils
    // surface, which renders natively and wins over a vendored copy); bare
    // `m(...)` when the project doesn't define m and exactly ONE package
    // does (dbt's global macro namespace) — two owners is ambiguous and
    // fails loudly.
    val q = (s: String) => java.util.regex.Pattern.quote(s)
    val stemOwners: Map[String, Seq[String]] = pkgs
      .flatMap(p => p.macroStems.toSeq.map(_ -> p.name))
      .groupBy(_._1).map { case (st, vs) => st -> vs.map(_._2) }
    val jinjaSpan = "(?s)\\{\\{.*?\\}\\}|\\{%.*?%\\}".r
    def rewriteSpan(span: String): String = {
      var out = span
      // an INSTALLED package's macro wins over the native builtin surface
      // (dbt semantics: the vendored implementation IS the macro; natives
      // are the no-package fallback) — so qualified calls always rewrite
      // onto the vendored copy when the package defines the stem
      for (pkg <- pkgs; m <- pkg.macroStems)
        out = (s"\\b${q(pkg.name)}\\s*\\.\\s*${q(m)}\\s*\\(").r
          .replaceAllIn(out, s"${pkg.name}__$m(")
      // (?<![\w.]) not \b: '.' is a word boundary, so \b would re-capture
      // the stem of a qualified call the qualified pass skipped (builtin
      // dbt_utils.m renders natively) and emit pkg.pkg__m( — broken SQL
      for ((m, owners) <- stemOwners if !macroNames.contains(m)) {
        val re = (s"(?<![\\w.])${q(m)}\\s*\\(").r
        if (re.findFirstIn(out).isDefined) {
          if (owners.size > 1) throw new IllegalArgumentException(
            s"macro '$m(' is defined by multiple dbt packages " +
              s"(${owners.sorted.mkString(", ")}) — call it package-qualified")
          out = re.replaceAllIn(out, s"${owners.head}__$m(")
        }
      }
      out
    }
    def rewritePkgCalls(sql: String): String =
      if (pkgs.isEmpty) sql
      else jinjaSpan.replaceAllIn(sql, sp =>
        java.util.regex.Matcher.quoteReplacement(rewriteSpan(sp.matched)))
    // package macros join the registry under their namespaced rename
    // (pkg__name — see loadPackages); call sites in model bodies AND in
    // macro sources themselves (a project macro calling {{ pkg.m(...) }},
    // or one package's macro calling another's) are rewritten so calls land
    // on these names, and the existing prepend machinery handles the rest
    // (a package macro edit re-fingerprints exactly the models that
    // reference it, same as a project macro)
    val allMacroSrcByName = (macroSrcByName ++ pkgs.flatMap(_.macroSrcByName))
      .map { case (n, src) => n -> rewritePkgCalls(src) }
    val allMacroNames = macroNames ++ pkgs.flatMap(_.macroSrcByName.keys)
    // call detection tolerates whitespace between name and '(' — jinja
    // allows `{{ money (x) }}`. adapter.dispatch references count as calls
    // of every CANDIDATE implementation (spark__/default__, project and
    // namespace package): the dispatch target is chosen at render time, so
    // all live candidates must be prepended for the render to find them
    val dispatchRefRe =
      ("""(?is)adapter\s*\.\s*dispatch\s*\(\s*['"](\w+)['"]\s*""" +
        """(?:,\s*(?:macro_namespace\s*=\s*)?['"](\w+)['"]\s*)?\)""").r
    def callsIn(text: String): Set[String] = {
      val direct = allMacroNames.filter { n =>
        ("""(?<![\w.])""" + java.util.regex.Pattern.quote(n) + """\s*\(""").r
          .findFirstIn(text).isDefined
      }
      val dispatched = dispatchRefRe.findAllMatchIn(text).flatMap { dm =>
        val n = dm.group(1); val pkg = Option(dm.group(2))
        // no explicit namespace → every loaded package's implementations are
        // candidates too (dbt's global macro namespace: a package calling
        // adapter.dispatch('m') resolves to ANY package's spark__m/default__m)
        val pkgScoped = pkg match {
          case Some(p) => Seq(s"${p}__spark__$n", s"${p}__default__$n")
          case None => allMacroNames.filter(k =>
            k.endsWith(s"__spark__$n") || k.endsWith(s"__default__$n")).toSeq.sorted
        }
        Seq(s"spark__$n", s"default__$n") ++ pkgScoped
      }.filter(allMacroNames.contains).toSet
      direct ++ dispatched
    }
    def withMacros(sql: String): String = {
      var seen = Set.empty[String]
      var frontier = callsIn(sql)
      while (frontier.nonEmpty) {
        seen ++= frontier
        frontier = frontier.flatMap(n =>
          callsIn(allMacroSrcByName.getOrElse(n, ""))) -- seen
      }
      if (seen.isEmpty) sql
      else if (!seen.forall(allMacroSrcByName.contains)) s"${rewritePkgCalls(macroSrc)}\n$sql" // span extraction missed one: keep old behavior
      else seen.toSeq.sorted.map(allMacroSrcByName).mkString("\n") + "\n" + sql
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
          val resolvedAudits = as.flatMap {
            case ("__dbt_generic__", args) =>
              // custom / package-provided GENERIC tests: resolve the test
              // macro (project test_t, qualified pkg.t, or the single
              // package that owns test_t — dbt's global test namespace),
              // render its body NOW with model bound to the __GRAFT_THIS__
              // placeholder, and attach the violation query as a
              // generic_sql audit (substituted with the physical snapshot
              // name at evaluation)
              val t = args("test")
              val key = t.indexOf('.') match {
                case -1 =>
                  if (allMacroSrcByName.contains(s"test_$t")) Some(s"test_$t")
                  else {
                    val owners = pkgs.filter(p =>
                      allMacroSrcByName.contains(s"${p.name}__test_$t"))
                    if (owners.size > 1) throw new IllegalArgumentException(
                      s"generic test '$t' is defined by multiple dbt packages " +
                        s"(${owners.map(_.name).sorted.mkString(", ")}) — qualify it")
                    owners.headOption.map(p => s"${p.name}__test_$t")
                  }
                case i =>
                  Some(s"${t.take(i)}__test_${t.drop(i + 1)}")
                    .filter(allMacroSrcByName.contains)
              }
              key match {
                case None =>
                  System.err.println(
                    s"[graft] WARN unsupported dbt test '$t' on ${m.name}")
                  Nil
                case Some(k) =>
                  // the column binds as a STRING LITERAL: a bare identifier
                  // would resolve through the evaluator's binding/var lookup
                  // first, so a column named like a project var substitutes
                  // the var's value and tests the wrong expression
                  val callArgs = Seq("model=__GRAFT_THIS__") ++
                    args.get("column").map(c =>
                      s"column_name='${c.replace("'", "''")}'") ++
                    args.collect { case (ak, av) if ak.startsWith("__arg_") =>
                      s"${ak.stripPrefix("__arg_")}=$av" }.toSeq.sorted
                  val callSrc = s"{{ $k(${callArgs.mkString(", ")}) }}"
                  val full = withMacros(rewritePkgCalls(resolveRefs(callSrc)))
                  val sql = graft.macros.Jinja.render(full, allVars).trim
                  Seq("generic_sql" -> Map("sql" -> sql))
              }
            case (n, args) =>
              Seq(n -> args.map { case (k, v) => k -> resolveRefs(v) }) // relationships `to:`
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
      // hooks resolve/namespace/prepend exactly like the body — a hook
      // calling a package macro must render standalone at evaluation time
      val expand = (sql: String) => withMacros(rewritePkgCalls(resolveRefs(sql)))
      val withHooks = withAudits.copy(
        preStatements = withAudits.preStatements.map(expand),
        postStatements = withAudits.postStatements.map(expand))
      withHooks.body match {
        case SqlBody(sql) => withHooks.copy(body = SqlBody(expand(sql)))
        case _ => withHooks
      }
    }
    val pkgOf = pkgs.flatMap(p => p.models.map(_.name -> p.name)).toMap
    val stemOf = (modelPairs.collect {
      case (m, st) if m.name.split('.').last != st => m.name -> st
    } ++ pkgs.flatMap(_.stemOf)).toMap
    DbtProject(projName, resolved, sources, allVars, target, pkgOf, stemOf)
  }

  // ------------------------------------------------------------- models

  private val configBlock =
    "(?is)\\{\\{\\s*config\\s*\\((.*?)\\)\\s*\\}\\}".r

  /** One models/x.sql file → Model (None when config(enabled=false)).
    * With a profile's `baseSchema`, dbt's generate_schema_name default
    * applies: no `+schema` config → the target schema; a custom schema →
    * `<target>_<custom>`. Without a profile the config is used verbatim
    * (else the project name). */
  def parseModel(p: Path, projName: String,
                 baseSchema: Option[String] = None): Option[Model] = {
    val text = new String(Files.readAllBytes(p), "UTF-8")
    val cfg = configBlock.findFirstMatchIn(text).map(m => parseConfig(m.group(1)))
      .getOrElse(Map.empty)
    if (cfg.get("enabled").exists(_.equalsIgnoreCase("false"))) return None
    val body = configBlock.replaceAllIn(text, "").trim
    val schema = baseSchema match {
      case Some(ts) => cfg.get("schema").map(cs => s"${ts}_$cs").getOrElse(ts)
      case None     => cfg.getOrElse("schema", projName)
    }
    val name = s"$schema.${cfg.getOrElse("alias", stem(p))}"
    // pre/post hooks (reference dbt/basemodel.py:138 pre_hook/post_hook,
    // aliases "pre-hook"/"post-hook"; model.py:83 sql_header runs as a
    // pre-hook) → graft pre/postStatements, rendered per evaluation with
    // the same jinja context as the body ({{ this }}, vars, macros)
    def hooks(key: String): Seq[String] =
      cfg.get(key).orElse(cfg.get(key.replace('_', '-'))).toSeq
        .flatMap(splitSqlList)
    Some(Model(name, SqlBody(body),
      kind = kindOf(cfg, name),
      tags = cfg.get("tags").map(splitList).getOrElse(Nil),
      partitionedBy = cfg.get("partition_by").map(splitList).getOrElse(Nil),
      clusteredBy = cfg.get("cluster_by").map(splitList).getOrElse(Nil),
      preStatements = cfg.get("sql_header").toSeq ++ hooks("pre_hook"),
      postStatements = hooks("post_hook"),
      sourcePath = Some(p.toAbsolutePath.normalize.toString)))
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

  /** A schema.yml test kwarg value → the Jinja literal the macro call embeds.
    * Scalars render as themselves (strings quoted); YAML lists/objects recurse
    * into `[...]`/`{...}` literals — Jackson's `asText()` is "" for container
    * nodes, which would silently hand the test macro an empty string. */
  private def jinjaArgLiteral(v: com.fasterxml.jackson.databind.JsonNode): String =
    if (v.isNumber || v.isBoolean) v.asText
    else if (v.isNull) "none"
    else if (v.isArray)
      v.elements().asScala.map(jinjaArgLiteral).mkString("[", ", ", "]")
    else if (v.isObject)
      v.properties().asScala.map(e =>
        "'" + e.getKey.replace("'", "''") + "': " + jinjaArgLiteral(e.getValue))
        .mkString("{", ", ", "}")
    else "'" + v.asText.replace("'", "''") + "'"

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
      // MODEL-level tests (no column binding) — in practice always custom /
      // package generic tests, resolved against the macro registry later
      val modelLevel = Option(m.get("tests")).orElse(Option(m.get("data_tests")))
        .toSeq.flatMap(_.elements().asScala).flatMap { t =>
          if (t.isTextual) Some("__dbt_generic__" -> Map("test" -> t.asText))
          else t.properties().asScala.toSeq.headOption.map { e =>
            val kw = e.getValue.properties().asScala.map { f =>
              s"__arg_${f.getKey}" -> jinjaArgLiteral(f.getValue)
            }.toMap
            "__dbt_generic__" -> (Map("test" -> e.getKey) ++ kw)
          }
        }
      val audits = modelLevel ++ Option(m.get("columns")).toSeq.flatMap(_.elements().asScala).flatMap { c =>
        val colName = c.path("name").asText
        Option(c.get("tests")).orElse(Option(c.get("data_tests"))).toSeq
          .flatMap(_.elements().asScala).flatMap { t =>
            if (t.isTextual) t.asText match {
              case "unique"   => Some("unique_values" -> Map("columns" -> colName))
              case "not_null" => Some("not_null" -> Map("columns" -> colName))
              case other =>
                // a custom/package GENERIC test with no args — resolved
                // against the macro registry in loadProject (where macros
                // are visible); unresolvable ones WARN there
                Some("__dbt_generic__" -> Map("test" -> other, "column" -> colName))
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
                    // custom/package generic test WITH args: carry the raw
                    // arg map for the macro call built in loadProject
                    val kw = args.properties().asScala.map { f =>
                      s"__arg_${f.getKey}" -> jinjaArgLiteral(f.getValue)
                    }.toMap
                    Some("__dbt_generic__" ->
                      (Map("test" -> other, "column" -> colName) ++ kw))
                }
              }
            }
          }
      }
      name -> audits
    }.filter(_._2.nonEmpty).toMap
  }

  // ------------------------------------------------------------- profile

  /** Locate and resolve profiles.yml (reference dbt/profile.py:60-110):
    * search $DBT_PROFILES_DIR, then the project root, then ~/.dbt. Inside
    * the selected output, `{{ env_var('K'[, 'default']) }}` renders from
    * the environment (profile files routinely templatize credentials).
    * Graft is the warehouse, so the output's `type` must be a Spark
    * flavor — anything else fails loudly naming the type and target, the
    * same contract as an unsupported adapter in the reference. Returns
    * None when no profiles.yml exists (profile-less projects keep the
    * plain-graft schema defaulting). */
  def loadProfile(root: Path, profileName: String,
                  targetName: Option[String]): Option[DbtTarget] = {
    val homeFile =
      Paths.get(sys.props.getOrElse("user.home", "/"), ".dbt", "profiles.yml")
    val candidates =
      sys.env.get("DBT_PROFILES_DIR").map(d => Paths.get(d, "profiles.yml")).toSeq ++
        Seq(root.resolve("profiles.yml"), homeFile)
    val parsed = candidates.filter(Files.exists(_)).map(f =>
      f -> mapper.readTree(new String(Files.readAllBytes(f), "UTF-8")))
    if (parsed.isEmpty) return None
    // search every existing candidate for the profile KEY, not just the
    // first file: a machine-level ~/.dbt/profiles.yml written for other
    // projects must not break a profile-less project (it keeps the plain
    // defaulting), while an explicit file ($DBT_PROFILES_DIR or the project
    // root) that lacks the profile is a config error — dbt's behavior
    val (file, node) = parsed
      .find { case (_, n) => Option(n.get(profileName)).isDefined }
      .getOrElse {
        if (parsed.forall(_._1 == homeFile)) return None
        throw new IllegalArgumentException(
          s"profile '$profileName' not found in " +
            parsed.map(_._1).mkString(", "))
      }
    val prof = node.get(profileName)
    val outputs = Option(prof.get("outputs")).getOrElse(throw new IllegalArgumentException(
      s"profile '$profileName' has no outputs in $file"))
    val tname = targetName
      .orElse(Option(prof.get("target")).map(n => renderEnvVars(n.asText)))
      .getOrElse(throw new IllegalArgumentException(
        s"profile '$profileName': no target specified (add `target:` or pass --target)"))
    val out = Option(outputs.get(tname)).getOrElse(throw new IllegalArgumentException(
      s"target '$tname' not in profile '$profileName' — valid: " +
        outputs.properties().asScala.map(_.getKey).mkString(", ")))
    def str(k: String): Option[String] =
      Option(out.get(k)).map(n => renderEnvVars(n.asText)).filter(_.nonEmpty)
    val tpe = str("type").getOrElse("spark")
    if (!Set("spark", "databricks")(tpe.toLowerCase))
      throw new IllegalArgumentException(
        s"profiles.yml target '$tname' has type '$tpe' — graft runs on Spark; " +
          "set type: spark (or databricks) or pick another --target")
    Some(DbtTarget(tname, tpe, str("schema"), str("database").orElse(str("catalog")),
      str("threads").flatMap(_.toIntOption).getOrElse(1)))
  }

  private val envVarRe =
    "\\{\\{\\s*env_var\\(\\s*['\"]([^'\"]+)['\"](?:\\s*,\\s*['\"]([^'\"]*)['\"])?\\s*\\)\\s*\\}\\}".r

  /** `{{ env_var('K', 'default') }}` inside profile values. An unset var
    * with no default fails loudly like dbt's env_var does. */
  private[loader] def renderEnvVars(s: String): String =
    envVarRe.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
      sys.env.get(m.group(1)).orElse(Option(m.group(2))).getOrElse(
        throw new IllegalArgumentException(
          s"profiles.yml: env_var('${m.group(1)}') is unset and has no default"))))

  // ------------------------------------------------------------ packages

  /** per-macro source spans (shared by project and package loading) */
  private val macroDefRe =
    """(?s)\{%-?\s*macro\s+([A-Za-z_]\w*)\s*\(.*?\{%-?\s*endmacro\s*-?%\}""".r

  /** dbt generic-test definition span: `{% test t(model, column_name) %}
    * … {% endtest %}`. */
  private val testDefRe =
    """(?s)\{%-?\s*test\s+([A-Za-z_]\w*)\s*\(.*?\{%-?\s*endtest\s*-?%\}""".r

  /** Normalize a `{% test t %}` span to its macro desugaring
    * (`{% macro test_t %}`) so one registry handles both forms. */
  private def testSpanToMacro(name: String, span: String): String =
    span.replaceFirst("""\{%-?\s*test\s+""" + java.util.regex.Pattern.quote(name),
        java.util.regex.Matcher.quoteReplacement(s"{% macro test_$name"))
      .replaceAll("""\{%-?\s*endtest\s*-?%\}""", "{% endmacro %}")

  /** One vendored package: its models/seeds (loaded like project ones), its
    * macros RENAMED into a flat namespace (`m` in package `p` → `p__m`,
    * applied to the def header and every intra-package call), and its
    * global-scoped vars. The rename keeps the single-namespace prepend /
    * fingerprint machinery intact while making `p.m(...)` and cross-package
    * collisions unambiguous. */
  private[loader] final case class LoadedPackage(
      name: String, models: Seq[Model], macroStems: Set[String],
      macroSrcByName: Map[String, String], vars: Map[String, String],
      stemOf: Map[String, String] = Map.empty)

  /** Load every package vendored under `packages-install-path` (reference
    * sqlmesh/dbt/package.py PackageLoader; project.py:93 discovers the
    * install dir). A package is any subdirectory with its own
    * dbt_project.yml — the layout `dbt deps` produces. Unsupported package
    * features (custom materializations, on-run-start/end hooks) throw with
    * the package name: silently skipping them would materialize wrong. */
  private def loadPackages(installDir: Path,
                           baseSchema: Option[String]): Seq[LoadedPackage] = {
    if (!Files.isDirectory(installDir)) return Nil
    val dirs = Files.list(installDir).iterator().asScala
      .filter(d => Files.isDirectory(d) && Files.exists(d.resolve("dbt_project.yml")))
      .toSeq.sortBy(_.toString)
    dirs.map { pdir =>
      val node = mapper.readTree(new String(
        Files.readAllBytes(pdir.resolve("dbt_project.yml")), "UTF-8"))
      val pname = Option(node.get("name")).map(_.asText)
        .getOrElse(pdir.getFileName.toString)
      for (k <- Seq("on-run-start", "on-run-end") if node.has(k))
        throw new IllegalArgumentException(
          s"dbt package '$pname': $k hooks are not supported")
      def ppaths(key: String, default: String): Seq[Path] =
        Option(node.get(key)).map(_.elements().asScala.map(_.asText).toSeq)
          .getOrElse(Seq(default)).map(pdir.resolve)
      val macroSrc = ppaths("macro-paths", "macros").flatMap(walk(_, ".sql"))
        .sortBy(_.toString)
        .map(p => new String(Files.readAllBytes(p), "UTF-8")).mkString("\n")
      if ("\\{%-?\\s*materialization\\b".r.findFirstIn(macroSrc).isDefined)
        throw new IllegalArgumentException(
          s"dbt package '$pname': custom materializations are not supported")
      val spans = (macroDefRe.findAllMatchIn(macroSrc)
        .map(m => m.group(1) -> m.matched) ++
        // package generic tests join the flat namespace as pkg__test_t
        testDefRe.findAllMatchIn(macroSrc).map(m =>
          s"test_${m.group(1)}" -> testSpanToMacro(m.group(1), m.matched))).toMap
      val stems = spans.keySet
      val qq = (s: String) => java.util.regex.Pattern.quote(s)
      val renamed: Map[String, String] = spans.map { case (m, src0) =>
        var src = src0
        // qualified self-references first, then bare calls — the bare rule
        // also renames the def header itself (`macro m(` → `macro p__m(`)
        for (o <- stems) {
          src = (s"\\b${qq(pname)}\\s*\\.\\s*${qq(o)}\\s*\\(").r
            .replaceAllIn(src, s"${pname}__$o(")
          // (?<![\w.]) keeps cross-package qualified calls (other_pkg.o()
          // intact for rewriteSpan's qualified pass; \b matches after '.'
          src = (s"(?<![\\w.])${qq(o)}\\s*\\(").r
            .replaceAllIn(src, s"${pname}__$o(")
        }
        s"${pname}__$m" -> src
      }
      // global-scope vars only (reference filters package-scoped dicts);
      // entries under the package's own name promote to that scope
      val rawVars = Option(node.get("vars"))
      val flat = rawVars.toSeq.flatMap(_.properties().asScala)
        .filter(!_.getValue.isObject).map(e => e.getKey -> e.getValue.asText)
      val scoped = rawVars.flatMap(v => Option(v.get(pname))).toSeq
        .flatMap(_.properties().asScala)
        .filter(!_.getValue.isObject).map(e => e.getKey -> e.getValue.asText)
      val pmodelPairs = ppaths("model-paths", "models").flatMap(walk(_, ".sql"))
        .flatMap(f => parseModel(f, pname, baseSchema).map(m => (m, stem(f))))
      val pmodels = pmodelPairs.map(_._1)
      // dbt materializes package seeds into the profile's target schema,
      // same as project seeds — only unprofiled projects fall back to pname
      val pseedSchema = baseSchema.getOrElse(pname)
      val pseeds = ppaths("seed-paths", "seeds").flatMap(walk(_, ".csv")).map(f =>
        Model(s"$pseedSchema.${stem(f)}", SeedBody(f.toString),
          kind = ModelKind.Seed(f.toString)))
      LoadedPackage(pname, pmodels ++ pseeds, stems, renamed,
        (flat ++ scoped).toMap,
        pmodelPairs.collect {
          case (m, st) if m.name.split('.').last != st => m.name -> st
        }.toMap)
    }
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

  /** Hook config value → SQL statements: either one quoted statement or a
    * `['stmt1', 'stmt2']` list. Unlike [[splitList]], the element split is
    * quote-aware — hook SQL routinely contains commas. */
  private[loader] def splitSqlList(s: String): Seq[String] = {
    val t = s.trim
    if (!(t.startsWith("[") && t.endsWith("]"))) Seq(unquote(t)).filter(_.nonEmpty)
    else {
      val inner = t.substring(1, t.length - 1)
      val parts = Seq.newBuilder[String]
      val cur = new StringBuilder
      var qch = ' '
      inner.foreach { c =>
        if (qch != ' ') { if (c == qch) qch = ' '; cur.append(c) }
        else c match {
          case '\'' | '"' => qch = c; cur.append(c)
          case ','        => parts += cur.toString; cur.clear()
          case _          => cur.append(c)
        }
      }
      if (cur.nonEmpty) parts += cur.toString
      parts.result().map(x => unquote(x.trim)).filter(_.nonEmpty)
    }
  }

  /** `[a, 'b']` or `a` → Seq(a, b). */
  private def splitList(s: String): Seq[String] = {
    val inner = if (s.startsWith("[") && s.endsWith("]")) s.substring(1, s.length - 1) else s
    inner.split(",").map(x => unquote(x.trim)).filter(_.nonEmpty).toSeq
  }

  private def nodeToVars(n: JsonNode): Map[String, String] =
    n.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap
}
