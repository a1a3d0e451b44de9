package graft.adapter

import java.util
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Cross-catalog virtual environments (reference
  * `EnvironmentSuffixTarget.CATALOG`, config/common.py:33-37, and
  * `environment_catalog_mapping`, config/root.py:120/160): a Spark DSv2
  * `TableCatalog` plugin whose entries are ZERO-COPY handles onto the
  * engine's physical snapshot directories — the multi-catalog analog of
  * the session-catalog `CREATE OR REPLACE VIEW` virtual layer.
  *
  * Why a TableCatalog and not a ViewCatalog: Spark 4.1 ships the
  * `ViewCatalog` API but no analyzer/DDL support for V2 views (no
  * CreateView exec, no view resolution outside the session catalog), so a
  * plugin view catalog would be unreachable from SQL. A TableCatalog IS
  * fully resolvable — `SELECT * FROM env_cat.schema.model` plans a native
  * DSv2 parquet scan (pushdown, pruning, AQE all apply) — and the virtual
  * layer's contract is only "a name that reads the promoted snapshot", so
  * a zero-copy table handle and a view are observationally identical for
  * readers. In a Unity/Glue/Iceberg deployment the same promote call
  * targets that catalog's own view/table DDL instead (this plugin is the
  * vanilla-Spark realization of the seam, like DirVersionFormat is for
  * table formats).
  *
  * Layout: one JSON entry per promoted model at
  * `<warehouse>/<db>/<table>.json` holding the physical table's ROOT (not
  * a resolved data dir): `loadTable` resolves the CURRENT `v<N>` snapshot
  * at read time, so a new snapshot committed under the same physical root
  * is visible immediately — the exact repointing semantics of the view
  * layer. Entries are tiny and written atomically (tmp+rename), and the
  * plugin re-reads them per load, so concurrent promotes behave like
  * concurrent CREATE OR REPLACE VIEW.
  *
  * Scope: requires the dir-version [[TableFormat]] (plain parquet
  * snapshot dirs). Manifest-format tables promote through session-catalog
  * suffix targets — their read path is a multi-commit union no standalone
  * file scan can express; [[SparkMaterializer.promote]] rejects the
  * combination up front.
  *
  * Managed physical columns (`__graft_*` partition keys) are hidden from
  * the catalog schema exactly like the session-catalog view's
  * `* EXCEPT (...)` projection — see [[EnvCatalog.PrunedParquetTable]]. */
final class EnvCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var warehouse: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val wh = options.get("warehouse")
    require(wh != null && wh.nonEmpty,
      s"EnvCatalog '$name' needs spark.sql.catalog.$name.warehouse")
    warehouse = new Path(wh)
  }

  override def name(): String = catalogName

  private def spark = SparkSession.active
  private def fs(p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def nsPath(ns: Array[String]): Path =
    ns.foldLeft(warehouse)((p, n) => new Path(p, n))
  private def entryPath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace()), s"${ident.name()}.json")

  // ------------------------------------------------------------ namespaces

  override def listNamespaces(): Array[Array[String]] = {
    val f = fs(warehouse)
    if (!f.exists(warehouse)) Array.empty
    else f.listStatus(warehouse).filter(_.isDirectory)
      .map(s => Array(s.getPath.getName)).sortBy(_.head)
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace.toSeq)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || fs(nsPath(namespace)).exists(nsPath(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) new util.HashMap[String, String]()
    else throw new NoSuchNamespaceException(namespace.toSeq)

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    fs(nsPath(namespace)).mkdirs(nsPath(namespace))

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("EnvCatalog namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = nsPath(namespace); val f = fs(p)
    if (!f.exists(p)) false
    else {
      if (!cascade && f.listStatus(p).nonEmpty)
        throw new IllegalStateException(s"namespace ${namespace.mkString(".")} is not empty")
      f.delete(p, true)
    }
  }

  // ------------------------------------------------------------ tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace); val f = fs(p)
    if (!f.exists(p)) throw new NoSuchNamespaceException(namespace.toSeq)
    f.listStatus(p).map(_.getPath.getName).filter(_.endsWith(".json"))
      .map(n => Identifier.of(namespace, n.stripSuffix(".json"))).sortBy(_.name)
  }

  override def tableExists(ident: Identifier): Boolean =
    fs(entryPath(ident)).exists(entryPath(ident))

  /** Current-snapshot resolutions memoize the constructed [[Table]] behind
    * an mtime fingerprint. The construction cost is NOT the JSON read (µs)
    * but the DSv2 plumbing behind it — InMemoryFileIndex listing + parquet
    * footer schema inference per [[ParquetTable]] — measured at ~58 ms per
    * resolution at 10k entries (EnvCatalogScaleProbe, r16 verdict task 7):
    * driver-side FS metadata in the analyzer path, per table reference per
    * query. The fingerprint re-checks everything that can change what the
    * load would return — entry JSON status (repoint/re-promote), the root's
    * version listing (new snapshot commit), and the chosen dir's mtime
    * (immutable under rename-publish, guarded anyway) — so a hit costs ~3
    * metadata ops and view-repoint semantics are preserved exactly; any
    * mismatch falls through to a full rebuild. Explicit VERSION/TIMESTAMP
    * AS OF loads stay uncached (cold paths, and timestamp resolution
    * depends on wall-clock-ordered mtimes, not worth fingerprinting). */
  override def loadTable(ident: Identifier): Table = {
    val fp = fingerprint(ident)
    val key = (ident.namespace().toSeq, ident.name())
    cache.get(key) match {
      case Some((cachedFp, t)) if cachedFp == fp => t
      case _ =>
        val t = loadVersion(ident, pickCurrent)
        cache.put(key, (fp, t))
        t
    }
  }

  private val cache =
    new scala.collection.concurrent.TrieMap[(Seq[String], String), (String, Table)]()

  /** Everything a current-snapshot load depends on, as one string: entry
    * file (mtime+len) + version-dir list of the root it points at + chosen
    * dir mtime. Throws NoSuchTableException for a missing entry — same
    * surface as the uncached path. */
  private def fingerprint(ident: Identifier): String = {
    val p = entryPath(ident); val f = fs(p)
    val st =
      try f.getFileStatus(p)
      catch { case _: java.io.FileNotFoundException => throw new NoSuchTableException(ident) }
    // the JSON re-read here is µs and unavoidable anyway: the version list
    // under the CURRENT root must be fresh per load (view-repoint), and the
    // root is only knowable from the entry
    val (root, _) = entryOf(ident)
    val rf = fs(root)
    val versions =
      if (!rf.exists(root)) Nil
      else rf.listStatus(root).map(_.getPath.getName)
        .filter(_.matches("v\\d+")).map(_.drop(1).toInt).sorted.toSeq
    val chosenM = versions.lastOption.map { v =>
      try rf.getFileStatus(new Path(root, s"v$v")).getModificationTime.toString
      catch { case _: java.io.FileNotFoundException => "gone" }
    }.getOrElse("-")
    s"${st.getModificationTime}:${st.getLen}|$root|${versions.mkString(",")}|$chosenM"
  }

  /** `SELECT ... FROM cat.db.t VERSION AS OF <n>` — DSv2 time travel,
    * mapped onto the dir-version scheme's `v<n>` snapshot dirs (the
    * catalog analog of [[graft.GraftContext]]'s `timeTravel`). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = version.stripPrefix("v").toIntOption.getOrElse(
      throw new IllegalArgumentException(
        s"EnvCatalog versions are the physical v<N> snapshot numbers; got '$version'"))
    loadVersion(ident, vs => {
      if (!vs.contains(v)) throw new IllegalArgumentException(
        s"${ident.name()} has no version $v (have: ${vs.mkString(",")})")
      Some(v)
    })
  }

  /** `TIMESTAMP AS OF` — the newest snapshot whose dir was committed at or
    * before the timestamp (micros since epoch per the DSv2 contract). The
    * dir scheme carries no commit log, so dir modification time is the
    * commit time — exact for the rename-published snapshots this engine
    * writes. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    loadVersion(ident, { vs =>
      val (root, _) = entryOf(ident)
      val rf = fs(root)
      val at = vs.filter { v =>
        rf.getFileStatus(new Path(root, s"v$v")).getModificationTime <=
          timestampMicros / 1000L
      }
      if (at.isEmpty) throw new IllegalArgumentException(
        s"${ident.name()}: no snapshot at or before timestamp")
      at.sorted.lastOption
    })

  /** newest version = the current snapshot (view-repoint semantics). */
  private val pickCurrent: Seq[Int] => Option[Int] = _.sorted.lastOption

  private def entryOf(ident: Identifier): (Path, Option[String]) = {
    val p = entryPath(ident); val f = fs(p)
    if (!f.exists(p)) throw new NoSuchTableException(ident)
    val in = f.open(p)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    (new Path(node.get("root").asText()),
      Option(node.get("schema_ddl")).map(_.asText()).filter(_.nonEmpty))
  }

  private def loadVersion(ident: Identifier,
                          pick: Seq[Int] => Option[Int]): Table = {
    val (root, schemaDdl) = entryOf(ident)
    // snapshot resolved NOW (the view-repoint semantics): version dirs are
    // re-listed per load, so a new commit under the same root is visible
    // without a re-promote
    val rf = fs(root)
    val versions =
      if (!rf.exists(root)) Nil
      else rf.listStatus(root).map(_.getPath.getName)
        .filter(_.matches("v\\d+")).map(_.drop(1).toInt).sorted.toSeq
    val chosen = pick(versions).map(v => new Path(root, s"v$v"))
    val hasParquet = chosen.exists { dir =>
      val it = rf.listFiles(dir, true)
      var found = false
      while (!found && it.hasNext)
        if (it.next().getPath.getName.endsWith(".parquet")) found = true
      found
    }
    val fullName = s"$catalogName.${(ident.namespace() :+ ident.name()).mkString(".")}"
    val inner =
      if (hasParquet)
        ParquetTable(fullName, spark, CaseInsensitiveStringMap.empty(),
          Seq(chosen.get.toString), None,
          classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat])
      else {
        // no data yet (or schema-marker-only snapshot): an empty table with
        // the schema captured at promote time
        val st = schemaDdl.map(StructType.fromDDL).getOrElse(
          throw new IllegalStateException(
            s"$fullName has no parquet data and no stored schema"))
        ParquetTable(fullName, spark, CaseInsensitiveStringMap.empty(),
          Nil, Some(st),
          classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat])
      }
    val hidden = inner.schema.fieldNames.filter(_.startsWith("__graft_")).toSet
    if (hidden.isEmpty) inner
    else new EnvCatalog.PrunedParquetTable(inner, hidden)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "EnvCatalog entries are created by promotion (plan apply), not DDL")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("EnvCatalog tables are read-only handles")

  override def dropTable(ident: Identifier): Boolean = {
    val p = entryPath(ident); val f = fs(p)
    f.exists(p) && f.delete(p, false)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = entryPath(oldIdent); val to = entryPath(newIdent); val f = fs(from)
    if (!f.exists(from)) throw new NoSuchTableException(oldIdent)
    fs(to).mkdirs(to.getParent)
    if (!f.rename(from, to))
      throw new IllegalStateException(s"rename $from -> $to failed")
  }
}

object EnvCatalog {

  /** [[ParquetTable]] with the engine's managed `__graft_*` physical
    * columns hidden — the DSv2 equivalent of the session-catalog view's
    * `SELECT * EXCEPT (__graft_*)`. Only `schema()` lies: the scan builder
    * keeps the REAL file/partition schemas, and because Spark's
    * V2ScanRelationPushDown prunes required columns from the relation
    * output (which this schema defines), a hidden column can never be
    * requested — it simply never leaves the directory layout. */
  private[adapter] final class PrunedParquetTable(inner: ParquetTable,
                                                  hidden: Set[String])
      extends Table with SupportsRead {
    override def name(): String = inner.name
    override def schema(): StructType =
      StructType(inner.schema.filterNot(f => hidden(f.name)))
    override def partitioning(): Array[Transform] = inner.partitioning().filter {
      t => !hidden.exists(h => t.references().exists(_.fieldNames().contains(h)))
    }
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
      // inline FileTable.mergedOptions (protected): table-creation options
      // under the scan options
      val merged = new util.HashMap[String, String](inner.options)
      merged.putAll(options)
      ParquetScanBuilder(inner.sparkSession, inner.fileIndex, schema(),
        inner.dataSchema, new CaseInsensitiveStringMap(merged))
    }
  }

  /** Register `catalog` as an [[EnvCatalog]] in the session conf if nothing
    * else already claims the name, defaulting its warehouse under the Spark
    * SQL warehouse dir. Conf-based registration is how Spark discovers V2
    * catalogs; setting it lazily-before-first-use is equivalent to static
    * config. Returns the warehouse path. */
  def ensureRegistered(spark: SparkSession, catalog: String): String = {
    require(catalog != "spark_catalog",
      "spark_catalog is the session catalog — not an environment catalog")
    val key = s"spark.sql.catalog.$catalog"
    spark.conf.getOption(key) match {
      case Some(cls) if cls != classOf[EnvCatalog].getName =>
        () // a real deployment catalog (Unity/Iceberg/...) owns the name;
           // promotion writes through OUR entry API only for EnvCatalog, so
           // reaching here is a configuration error surfaced by writeEntry
      case Some(_) => ()
      case None => spark.conf.set(key, classOf[EnvCatalog].getName)
    }
    val whKey = s"$key.warehouse"
    spark.conf.getOption(whKey).getOrElse {
      val wh = new Path(spark.sessionState.conf.warehousePath,
        s"__graft_env_catalogs/$catalog").toString
      spark.conf.set(whKey, wh)
      wh
    }
  }

  private def requireEnvCatalog(spark: SparkSession, catalog: String): Path = {
    val cls = spark.conf.getOption(s"spark.sql.catalog.$catalog").getOrElse(
      throw new IllegalStateException(s"catalog '$catalog' is not registered"))
    require(cls == classOf[EnvCatalog].getName,
      s"catalog '$catalog' is $cls, not an EnvCatalog — promote through " +
        "that catalog's own DDL instead")
    new Path(spark.conf.get(s"spark.sql.catalog.$catalog.warehouse"))
  }

  /** Write (promote) an entry — atomic tmp+rename, the same publish
    * discipline as the bloom shard cache. */
  def writeEntry(spark: SparkSession, catalog: String, db: String,
                 table: String, physicalRoot: String,
                 schemaDdl: Option[String]): Unit = {
    val wh = requireEnvCatalog(spark, catalog)
    val dir = new Path(wh, db)
    val f = dir.getFileSystem(spark.sessionState.newHadoopConf())
    f.mkdirs(dir)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("root", physicalRoot)
    schemaDdl.foreach(node.put("schema_ddl", _))
    val target = new Path(dir, s"$table.json")
    val tmp = new Path(dir, s"$table.json.tmp${System.nanoTime()}")
    val out = f.create(tmp, true)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
    // OVERWRITE rename (FileContext — the old FileSystem.rename has no
    // overwrite mode): a delete-then-rename would open a window where a
    // continuously-promoted table resolves to NoSuchTable for concurrent
    // readers, and two concurrent re-promotes would race each other's
    // deletes — CREATE OR REPLACE VIEW never behaves that way
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      target.toUri, spark.sessionState.newHadoopConf())
    try fc.rename(fc.makeQualified(tmp), fc.makeQualified(target),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch { case t: Throwable =>
      // don't litter the db dir with uniquely-named orphans across retries
      try f.delete(tmp, false) catch { case _: Throwable => () }
      throw t
    }
  }

  /** Remove (demote) an entry; harmless if absent. Returns whether an
    * entry actually existed — callers use it to surface a
    * possibly-misconfigured warehouse (see
    * [[SparkMaterializer.demoteCatalog]]). */
  def dropEntry(spark: SparkSession, catalog: String, db: String,
                table: String): Boolean = {
    val wh = requireEnvCatalog(spark, catalog)
    val p = new Path(new Path(wh, db), s"$table.json")
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    f.exists(p) && f.delete(p, false)
  }
}
