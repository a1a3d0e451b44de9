package graft.adapter

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Log-backed [[TableFormat]]: commits are immutable data directories plus a
  * versioned JSON manifest naming exactly the (commit dir, partition dir)
  * units that make up each snapshot — the Delta/Iceberg commit-protocol
  * shape with zero dependencies (reference WAP rides Iceberg branches the
  * same way, engine_adapter/spark.py:492-533).
  *
  * Why this beats the dir scheme on object stores at 100 TB:
  *  - EVERY operation — including append and dynamic partition overwrite —
  *    writes only fresh directories and commits by publishing manifest
  *    m(N+1); old snapshots stay byte-identical, so WAP rollback covers all
  *    write paths (the dir scheme's in-place append/overwrite are outside
  *    its rollback guarantee) and readers get snapshot isolation without
  *    staging copies.
  *  - reads/listings never scan the table root: the manifest IS the file
  *    listing (S3 LIST is the classic small-files tax).
  *  - time travel = read manifest k; clones pin a manifest version and are
  *    stable under appends AND replaces.
  *
  * Manifest commit = write temp + rename, atomic on HDFS/local posix; an
  * S3 deployment would put a CAS (DynamoDB-style) behind `publish` — one
  * method, same seam.
  *
  * Layout: `<root>/_manifests/m<N>.json`; data commits under `<root>/c<N>/`
  * (partition subdirs inside). Manifest: schema DDL, partition columns, and
  * entries `[{dir, partitions{col→value}}]` with `dir` relative to root.
  */
final class ManifestFormat(spark: SparkSession) extends TableFormat {
  def name: String = "manifest"

  private val mapper = new ObjectMapper()
  private def fs(p: Path) = p.getFileSystem(spark.sessionState.newHadoopConf())

  private case class Entry(dir: String, partitions: Seq[(String, String)])
  private case class Manifest(version: Int, schema: StructType,
                              partitionedBy: Seq[String], entries: Seq[Entry],
                              /** commit dir → partition-dir count AT WRITE:
                                * a commit whose live-entry count still equals
                                * this is FULLY live and the view reads its
                                * root with partition inference — one UNION
                                * branch per COMMIT, not per partition (the
                                * O(partitions) view-text cliff at daily/
                                * hourly grain). Absent (older manifests) →
                                * per-entry fallback. */
                              commitSizes: Map[String, Int] = Map.empty)

  private def manifestDir(t: PhysicalTable) = new Path(t.root, "_manifests")

  private def unescapePathName(s: String): String =
    TableFormat.unescapePathName(s)

  def versions(t: PhysicalTable): Seq[Int] = {
    val d = manifestDir(t); val f = fs(d)
    if (!f.exists(d)) Nil
    else f.listStatus(d).map(_.getPath.getName)
      .collect { case n if n.matches("m\\d+\\.json") => n.drop(1).dropRight(5).toInt }
      .sorted.toSeq
  }

  def currentDataDir(t: PhysicalTable): Option[String] =
    versions(t).lastOption.map(v => new Path(manifestDir(t), s"m$v.json").toString)

  /** Free for this format: partition values ARE manifest metadata. */
  override def partitionValues(t: PhysicalTable): Option[Seq[Map[String, String]]] =
    Some(current(t).map(_.entries.map(_.partitions.toMap)).getOrElse(Nil))

  private def loadManifest(t: PhysicalTable, version: Int): Manifest = {
    val p = new Path(manifestDir(t), s"m$version.json")
    val in = fs(p).open(p)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val node = mapper.readTree(json)
    Manifest(
      version,
      StructType.fromDDL(node.get("schema").asText),
      node.get("partitionedBy").elements().asScala.map(_.asText).toSeq,
      node.get("entries").elements().asScala.map { e =>
        Entry(e.get("dir").asText,
          e.get("partitions").properties().asScala.toSeq
            .map(kv => kv.getKey -> kv.getValue.asText))
      }.toSeq,
      Option(node.get("commitSizes")).map(_.properties().asScala
        .map(kv => kv.getKey -> kv.getValue.asInt).toMap).getOrElse(Map.empty))
  }

  private def current(t: PhysicalTable): Option[Manifest] =
    versions(t).lastOption.map(loadManifest(t, _))

  /** Atomic publish: temp write + rename. */
  private def publish(t: PhysicalTable, m: Manifest): Unit = {
    val root = mapper.createObjectNode()
    root.put("version", m.version)
    root.put("schema", m.schema.toDDL)
    val pb = root.putArray("partitionedBy"); m.partitionedBy.foreach(pb.add)
    val es = root.putArray("entries")
    m.entries.foreach { e =>
      val n = es.addObject()
      n.put("dir", e.dir)
      val ps = n.putObject("partitions")
      e.partitions.foreach { case (k, v) => ps.put(k, v) }
    }
    val cs = root.putObject("commitSizes")
    m.commitSizes.toSeq.sortBy(_._1).foreach { case (c, n) => cs.put(c, n) }
    val dir = manifestDir(t); val f = fs(dir)
    f.mkdirs(dir)
    val tmp = new Path(dir, s".m${m.version}.json.tmp")
    val out = f.create(tmp, true)
    try out.write(mapper.writeValueAsString(root).getBytes("UTF-8")) finally out.close()
    if (!f.rename(tmp, new Path(dir, s"m${m.version}.json")))
      throw new IllegalStateException(
        s"${t.qualified}: concurrent commit of manifest m${m.version}")
  }

  private def nextCommitDir(t: PhysicalTable): String = {
    val root = new Path(t.root); val f = fs(root)
    val cur =
      if (!f.exists(root)) -1
      else f.listStatus(root).map(_.getPath.getName)
        .collect { case n if n.matches("c\\d+") => n.drop(1).toInt }
        .foldLeft(-1)(math.max)
    s"c${cur + 1}"
  }

  /** Write a commit dir and discover its (partition dir → values) entries. */
  private def writeCommit(t: PhysicalTable, df0: DataFrame,
                          clusterFiles: Option[Int]): (String, Seq[Entry], StructType) = {
    val df = TableFormat.applyClustering(df0, t.clusteredBy, clusterFiles)
    val commit = nextCommitDir(t)
    val dir = new Path(t.root, commit).toString
    var w = df.write.mode("overwrite").options(t.options)
    if (t.partitionedBy.nonEmpty) w = w.partitionBy(t.partitionedBy: _*)
    w.parquet(dir)
    (commit, discoverEntries(t, commit), df.schema)
  }

  /** Partition dirs (relative to root) holding parquet files; "k=v" path
    * segments become partition values. A commit of zero rows yields zero
    * entries — the schema in the manifest keeps the table readable. */
  private def discoverEntries(t: PhysicalTable, commit: String): Seq[Entry] = {
    val base0 = new Path(t.root, commit); val f = fs(base0)
    // listFiles returns scheme-qualified paths; qualify the base the same
    // way or the relative-path strip silently fails
    val base = f.makeQualified(base0)
    val found = scala.collection.mutable.Map[String, Seq[(String, String)]]()
    val it = f.listFiles(base, true)
    while (it.hasNext) {
      val file = it.next().getPath
      if (file.getName.endsWith(".parquet")) {
        val rel = file.getParent.toString.stripPrefix(base.toString).stripPrefix("/")
        val parts = rel.split('/').filter(_.contains('=')).toSeq
          .map { seg =>
            val i = seg.indexOf('=')
            // dir names carry Hive-escaped values (':' → %3A etc.) — store
            // the REAL value so viewSql's literals round-trip (r8 review)
            seg.take(i) -> unescapePathName(seg.drop(i + 1))
          }
        val dir = if (rel.isEmpty) commit else s"$commit/$rel"
        found.getOrElseUpdate(dir, parts)
      }
    }
    found.toSeq.sortBy(_._1).map { case (d, p) => Entry(d, p) }
  }

  private def readManifest(t: PhysicalTable, m: Manifest): DataFrame = {
    if (m.entries.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
    // per commit dir: basePath-anchored read so partition columns infer from
    // the entry paths; snapshots mixing commits union together. Fully-live
    // commits read their ROOT (one listing, inference finds the partitions);
    // partially-superseded ones enumerate the live entry paths explicitly.
    val byCommit = m.entries.groupBy(_.dir.split('/').head)
    val parts = byCommit.toSeq.sortBy(_._1).map { case (commit, entries) =>
      val basePath = new Path(t.root, commit).toString
      val paths =
        if (m.commitSizes.get(commit).contains(entries.size)) Seq(basePath)
        else entries.map(e => new Path(t.root, e.dir).toString)
      // EXPLICIT schema: partition columns take their declared types instead
      // of inferred ones — inference would turn a StringType value like
      // "0001" into int 1 ("1" after cast). Also skips file-schema merging.
      spark.read.schema(m.schema).option("basePath", basePath).parquet(paths: _*)
    }
    val ordered = m.schema.map(f => col(f.name).cast(f.dataType).as(f.name))
    parts.map(_.select(ordered: _*)).reduce(_ unionByName _)
  }

  def read(t: PhysicalTable): DataFrame = current(t) match {
    case Some(m) => readManifest(t, m)
    case None => throw new IllegalStateException(s"table ${t.qualified} has no data")
  }

  def timeTravel(t: PhysicalTable, version: Int): DataFrame = {
    require(versions(t).contains(version),
      s"${t.qualified} has no version $version (have: ${versions(t).mkString(",")})")
    readManifest(t, loadManifest(t, version))
  }

  /** Catalog database for per-commit external tables backing collapsed view
    * branches. A commit dir is immutable, so its helper is created once
    * (CREATE + RECOVER PARTITIONS, one listing) and never touched again;
    * helpers are keyed by the commit dir's absolute path, so clones and
    * renames pointing at the same commit share one helper. */
  private val extDb = "graft_sys"

  private def helperName(absCommitDir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    "c_" + md.digest(absCommitDir.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(16)
  }

  /** Ensure the external table over a fully-live commit exists and return its
    * qualified name. The DECLARED schema (data + partition columns) is what
    * kills partition-type inference: a StringType partition value "0001"
    * reads back as "0001" from a catalog table, where `parquet.`path``
    * inference would coerce it to int 1. */
  /** Helpers known to exist, so register() costs one catalog probe per
    * commit per JVM, not one per commit per publish (O(commits²) over a
    * table's life at daily-commit grain). Safe as a cache: helpers are
    * created once and only dropped when their commit dir is deleted. */
  private val knownHelpers =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def helperFor(t: PhysicalTable, m: Manifest, commit: String): String = {
    val abs = new Path(t.root, commit).toString
    val nm = helperName(abs)
    if (!knownHelpers.contains(nm) && !spark.catalog.tableExists(extDb, nm)) {
      spark.sql(s"CREATE DATABASE IF NOT EXISTS `$extDb`")
      val cols = (m.schema.filterNot(f => m.partitionedBy.contains(f.name)) ++
        m.partitionedBy.map(m.schema(_)))
        .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      // create under a writer-private name and RENAME into place after the
      // partition recovery: a concurrent register() racing on the same
      // commit either wins the rename or sees the winner's fully-recovered
      // helper — never a half-built one, and never a spurious
      // TableAlreadyExists failure of the publish
      val tmp = s"${nm}_w${java.util.UUID.randomUUID().toString.take(8)}"
      spark.sql(
        s"CREATE TABLE `$extDb`.`$tmp` ($cols) USING PARQUET " +
          s"PARTITIONED BY (${m.partitionedBy.map(c => s"`$c`").mkString(", ")}) " +
          s"LOCATION '$abs'")
      // whatever happens, the writer-private tmp entry must not outlive this
      // block: a lost rename race OR any other failure (recovery error,
      // catalog hiccup) would otherwise leak an orphan catalog entry over
      // the commit location in graft_sys — drop it unconditionally and
      // rethrow unless the race was simply lost to a fully-built winner
      try {
        spark.sql(s"ALTER TABLE `$extDb`.`$tmp` RECOVER PARTITIONS")
        spark.sql(s"ALTER TABLE `$extDb`.`$tmp` RENAME TO `$extDb`.`$nm`")
      } catch {
        case e: Throwable =>
          spark.sql(s"DROP TABLE IF EXISTS `$extDb`.`$tmp`")
          if (!spark.catalog.tableExists(extDb, nm)) throw e // not a lost race
      }
    }
    knownHelpers.add(nm)
    s"`$extDb`.`$nm`"
  }

  /** Drop the helper (if any) for a commit dir that is being deleted. */
  private def dropHelper(absCommitDir: String): Unit = {
    val nm = helperName(absCommitDir)
    knownHelpers.remove(nm)
    spark.sql(s"DROP TABLE IF EXISTS `$extDb`.`$nm`")
  }

  /** View text for a snapshot: UNION ALL over entries, partition values
    * rebuilt as typed literals (they live in dir names, not data files);
    * managed `__graft_*` columns stay physical-only like the dir scheme. */
  private def viewSql(t: PhysicalTable, m: Manifest): String = {
    val dataCols = m.schema.filterNot(f => m.partitionedBy.contains(f.name))
      .map(_.name).filterNot(_.startsWith("__graft_"))
    val exposedParts = m.partitionedBy.filterNot(_.startsWith("__graft_"))
    if (m.entries.isEmpty) {
      val proj = m.schema.filterNot(_.name.startsWith("__graft_")).map(fd =>
        s"CAST(NULL AS ${fd.dataType.sql}) AS `${fd.name}`").mkString(", ")
      return s"SELECT $proj WHERE 1 = 0"
    }
    def entrySelect(e: Entry): String = {
      val partLits = exposedParts.map { c =>
        val fd = m.schema(c)
        val raw = e.partitions.toMap.get(c)
        val lit = raw match {
          case None | Some("__HIVE_DEFAULT_PARTITION__") => "NULL"
          case Some(v) => "'" + v.replace("'", "''") + "'"
        }
        s"CAST($lit AS ${fd.dataType.sql}) AS `$c`"
      }
      val cols = (dataCols.map(c => s"`$c`") ++ partLits).mkString(", ")
      val abs = new Path(t.root, e.dir).toString
      s"SELECT $cols FROM parquet.`$abs`"
    }
    // FULLY-live commits (live entries == dirs written) collapse to one
    // SELECT — view text and analysis are O(commits), not O(partitions).
    // The append-only incremental-by-time shape (every batch = new
    // partitions, nothing ever replaced) stays fully live forever;
    // partially-superseded commits fall back to per-entry selects so stale
    // dirs are never resurrected. A SQL view can't pin a read schema, so
    // partitioned commits collapse onto a per-commit EXTERNAL TABLE with the
    // declared schema (helperFor) — partition values keep their declared
    // types with no inference ("0001" stays the string "0001", where
    // `parquet.`path`` inference coerces it to int 1). Unpartitioned commits
    // read `parquet.`path`` directly: data-column types come from parquet
    // footers, which are exact.
    m.entries.groupBy(_.dir.split('/').head).toSeq.sortBy(_._1)
      .flatMap { case (commit, es) =>
        if (m.commitSizes.get(commit).contains(es.size)) {
          val cols = (dataCols.map(c => s"`$c`") ++ exposedParts.map { c =>
            s"CAST(`$c` AS ${m.schema(c).dataType.sql}) AS `$c`"
          }).mkString(", ")
          val src =
            if (exposedParts.isEmpty && m.partitionedBy.isEmpty)
              s"parquet.`${new Path(t.root, commit).toString}`"
            else helperFor(t, m, commit)
          Seq(s"SELECT $cols FROM $src")
        } else es.sortBy(_.dir).map(entrySelect)
      }.mkString(" UNION ALL ")
  }

  def register(t: PhysicalTable): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `${t.database}`")
    current(t).foreach { m =>
      spark.sql(s"CREATE OR REPLACE VIEW ${t.qualified} AS ${viewSql(t, m)}")
    }
  }

  def createOrReplace(t: PhysicalTable, df: DataFrame,
                      clusterFiles: Option[Int] = None): Unit = {
    val (commit, entries, schema) = writeCommit(t, df, clusterFiles)
    val v = versions(t).lastOption.map(_ + 1).getOrElse(0)
    publish(t, Manifest(v, schema, t.partitionedBy, entries,
      Map(commit -> entries.size)))
    register(t)
  }

  def append(t: PhysicalTable, df: DataFrame): Unit = current(t) match {
    case None => createOrReplace(t, df)
    case Some(prev) =>
      // log-structured append: a fresh commit dir joins the manifest — no
      // existing file or directory is touched
      val (commit, entries, _) = writeCommit(t, df, None)
      publish(t, prev.copy(version = prev.version + 1,
        entries = prev.entries ++ entries,
        commitSizes = prev.commitSizes + (commit -> entries.size)))
      register(t)
  }

  def overwritePartitions(t: PhysicalTable, df: DataFrame,
                          staged: Boolean = false): Unit = current(t) match {
    // `staged` is irrelevant here: old snapshots are immutable, so a plan
    // reading snapshot N while committing N+1 is always safe
    case None => createOrReplace(t, df)
    case Some(prev) =>
      require(t.partitionedBy.nonEmpty,
        s"${t.qualified}: dynamic overwrite needs partitioned_by")
      val (commit, entries, _) = writeCommit(t, df, None)
      val replaced = entries.map(_.partitions.toMap).toSet
      val kept = prev.entries.filterNot(e => replaced.contains(e.partitions.toMap))
      publish(t, prev.copy(version = prev.version + 1, entries = kept ++ entries,
        commitSizes = prev.commitSizes + (commit -> entries.size)))
      register(t)
  }

  def drop(t: PhysicalTable): Unit = {
    spark.sql(s"DROP VIEW IF EXISTS ${t.qualified}")
    val root = new Path(t.root); val f = fs(root)
    if (f.exists(root)) {
      // helper names hash the same `new Path(root, commit)` spelling
      // helperFor used — not the scheme-qualified listing path
      f.listStatus(root).map(_.getPath.getName)
        .filter(_.matches("c\\d+"))
        .foreach(n => dropHelper(new Path(t.root, n).toString))
      f.delete(root, true)
    }
  }

  def rollbackTo(t: PhysicalTable, keepDir: Option[String]): Unit = {
    val keep = keepDir.map(_.split('/').last.drop(1).dropRight(5).toInt).getOrElse(-1)
    val d = manifestDir(t); val f = fs(d)
    if (f.exists(d))
      f.listStatus(d).map(_.getPath)
        .filter(p => p.getName.matches("m\\d+\\.json") &&
          p.getName.drop(1).dropRight(5).toInt > keep)
        .foreach(p => f.delete(p, false))
    // orphaned commit dirs stay for the janitor, like the dir scheme's old versions
    if (keep >= 0) register(t)
    else spark.sql(s"DROP VIEW IF EXISTS ${t.qualified}")
  }

  def compact(t: PhysicalTable, targetFileBytes: Long): (Int, Int) = {
    val m = current(t).getOrElse(
      throw new IllegalStateException(s"compact: ${t.qualified} has no data"))
    def countFiles(man: Manifest): Int = man.entries.map { e =>
      val p = new Path(t.root, e.dir)
      fs(p).listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    }.sum
    def bytes(man: Manifest): Long = man.entries.map { e =>
      val p = new Path(t.root, e.dir)
      fs(p).listStatus(p).filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    }.sum
    val before = countFiles(m)
    val nFiles = math.max(1, math.ceil(bytes(m).toDouble / targetFileBytes).toInt)
    val cur = readManifest(t, m)
    val compacted =
      if (t.partitionedBy.nonEmpty) cur.repartition(nFiles, t.partitionedBy.map(col): _*)
      else cur.repartition(nFiles)
    createOrReplace(t, compacted,
      clusterFiles = if (t.clusteredBy.nonEmpty) Some(nFiles) else None)
    (before, countFiles(current(t).get))
  }

  /** Expire old manifests, then delete commit dirs no remaining manifest
    * references — the two-phase shape of Delta VACUUM (log retention, then
    * file GC), safe because live manifests never reference a dir that a
    * newer commit rewrote. */
  def vacuum(t: PhysicalTable, keepLast: Int): Int = {
    require(keepLast >= 1, "vacuum must keep at least the current version")
    val vs = versions(t)
    val cut = vs.dropRight(keepLast)
    val d = manifestDir(t); val f = fs(d)
    cut.foreach(v => f.delete(new Path(d, s"m$v.json"), false))
    val referenced = versions(t).map(loadManifest(t, _))
      .flatMap(_.entries.map(_.dir.split('/').head)).toSet
    val root = new Path(t.root)
    var removed = 0
    if (f.exists(root))
      f.listStatus(root).map(_.getPath)
        .filter(p => p.getName.matches("c\\d+") && !referenced.contains(p.getName))
        .foreach { p =>
          dropHelper(new Path(t.root, p.getName).toString)
          f.delete(p, true); removed += 1
        }
    removed
  }

  /** Zero-copy clone pinning the CURRENT manifest's view text — stable under
    * the source's future appends and replaces alike (the manifest entries it
    * names are immutable). */
  def cloneTable(target: PhysicalTable, source: PhysicalTable): Unit = {
    val m = current(source).getOrElse(
      throw new IllegalStateException(s"clone source ${source.qualified} has no data"))
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `${target.database}`")
    spark.sql(s"CREATE OR REPLACE VIEW ${target.qualified} AS ${viewSql(source, m)}")
  }

  def renameTable(t: PhysicalTable, newTable: String): PhysicalTable = {
    val renamed = t.copy(table = newTable)
    current(t) match {
      case Some(m) =>
        spark.sql(s"CREATE DATABASE IF NOT EXISTS `${renamed.database}`")
        spark.sql(s"CREATE OR REPLACE VIEW ${renamed.qualified} AS ${viewSql(t, m)}")
        spark.sql(s"DROP VIEW IF EXISTS ${t.qualified}")
      case None if spark.catalog.tableExists(s"${t.database}.${t.table}") =>
        spark.sql(s"ALTER VIEW ${t.qualified} RENAME TO " +
          s"`${renamed.database}`.`${renamed.table}`")
      case None =>
        spark.sql(s"DROP VIEW IF EXISTS ${t.qualified}")
    }
    renamed
  }
}
