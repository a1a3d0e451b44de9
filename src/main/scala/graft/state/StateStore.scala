package graft.state

import graft.core._

/** State persistence surface (reference: sqlmesh/core/state_sync/base.py:550;
  * tables `_snapshots`/`_intervals`/`_environments`/`_versions`,
  * state_sync/db). Snapshot/interval/environment records are tiny
  * (driver-side metadata), so state never needs distribution — the parquet
  * implementation exists for durability parity, not scale.
  */
final case class EnvironmentRecord(
    name: String,
    snapshots: Map[String, String], // model name -> snapshot version
    finalized: Boolean = false,
    planId: Option[String] = None,
    /** model name -> snapshot identifier (full fingerprint) — the exact
      * snapshot this environment points at; several snapshots may share a
      * version (forward-only pinning), so the identifier is what a plan must
      * diff against (reference ContextDiff diffs env snapshot ids). */
    identifiers: Map[String, String] = Map.empty,
    /** dev environments expire (reference environment.py expiration_ts,
      * default one week): the janitor demotes + deletes them past this. None
      * for prod — prod never expires. */
    expirationTs: Option[Long] = None,
    /** how this environment's views are named (environment.py:41
      * suffix_target) — recorded so demotes/janitor drop the right objects
      * even if the context's configured target changed since promotion. */
    suffixTarget: String = "schema",
    /** environment-catalog override resolved AT PROMOTE time (the reference
      * stores catalog_name_override on the Environment, environment.py:42)
      * — from the catalog suffix target or environment_catalog_mapping;
      * recorded for the same reason as suffixTarget: demotes must hit the
      * catalog the views actually landed in. */
    catalog: Option[String] = None)

trait StateStore {
  def pushSnapshot(s: Snapshot): Unit
  /** by (name, version): the most recently pushed snapshot of that version —
    * several records may share a version via forward-only pinning */
  def getSnapshot(name: String, version: String): Option[Snapshot]
  /** by exact identity (reference SnapshotId.identifier = full fingerprint) */
  def getSnapshotById(name: String, identifier: String): Option[Snapshot]
  def latestSnapshot(name: String): Option[Snapshot]
  def allSnapshots: Seq[Snapshot]
  def deleteSnapshot(name: String, version: String): Unit

  /** add a processed interval (state_sync add_interval; intervals are
    * compacted on write — `is_compacted`, interval.py:50-66) */
  def addInterval(name: String, version: String, interval: Interval, dev: Boolean = false): Unit
  def removeInterval(name: String, version: String, interval: Interval): Unit

  def promoteEnvironment(env: EnvironmentRecord): Unit
  def getEnvironment(name: String): Option[EnvironmentRecord]
  def finalizeEnvironment(name: String): Unit
  def deleteEnvironment(name: String): Unit

  /** environments past their expiration (environment.py expiration_ts) */
  def expiredEnvironments(now: Long): Seq[EnvironmentRecord] =
    environments.filter(_.expirationTs.exists(_ <= now))

  /** auto-restatement bookkeeping (reference `_auto_restatements` table,
    * state_sync/db/snapshot.py:79-84): last cron firing already applied. */
  def lastAutoRestatement(name: String): Option[Long]
  def setAutoRestatement(name: String, ts: Long): Unit

  /** Run `f` with durable persistence batched: implementations that write
    * state on every mutation may defer the write until `f` completes, so a
    * scheduler wave adding B intervals costs ONE state write instead of B
    * whole-image rewrites (the reference's relational store pays per-row,
    * state_sync/db/interval.py:47 — a blob store must batch to match).
    * Mutations made inside `f` are visible to readers immediately (the
    * in-memory image is always current); only durability is deferred, so a
    * crash mid-scope re-processes at most one wave of idempotent batches.
    * Nests; default is pass-through for stores with cheap writes. */
  def deferPersist[T](f: => T): T = f

  /** janitor: snapshots referenced by no environment (core/janitor.py) */
  def expiredSnapshots: Seq[Snapshot] = {
    val referenced = environments.flatMap(e => e.snapshots.map { case (n, v) => s"$n@$v" }).toSet
    allSnapshots.filterNot(s => referenced.contains(s"${s.model.name}@${s.version}"))
  }
  def environments: Seq[EnvironmentRecord]
}

final class InMemoryStateStore extends StateStore {
  // snapshot records keyed by exact identity (name, full fingerprint) —
  // reference `_snapshots` table keyed by SnapshotId
  private val snapshots = scala.collection.mutable.LinkedHashMap[(String, String), Snapshot]()
  // interval accounting keyed by (name, VERSION): forward-only snapshots
  // share a version and therefore share processed intervals — reference
  // `_intervals` table keyed by (name, version)
  private val ivals =
    scala.collection.mutable.Map[(String, String), (Vector[Interval], Vector[Interval])]()
  private val envs = scala.collection.mutable.LinkedHashMap[String, EnvironmentRecord]()
  private val autoRestatements = scala.collection.mutable.Map[String, Long]()
  // O(1) last-pushed-wins indexes over the scan paths: getSnapshot and
  // latestSnapshot run once per model per scheduler wave, and a full
  // LinkedHashMap scan there makes the wave O(models²) — the 10k-model
  // probe measured 19× (vs linear 5×) over the 2k wave before these
  private val byNameVersion = scala.collection.mutable.Map[(String, String), Snapshot]()
  private val byName = scala.collection.mutable.Map[String, Snapshot]()

  /** Full reset — used by state import to replace contents wholesale. */
  private[state] def clearAll(): Unit = synchronized {
    snapshots.clear(); ivals.clear(); envs.clear(); autoRestatements.clear()
    byNameVersion.clear(); byName.clear()
  }

  def lastAutoRestatement(name: String): Option[Long] =
    synchronized(autoRestatements.get(name))
  def setAutoRestatement(name: String, ts: Long): Unit =
    synchronized { autoRestatements(name) = ts }
  private[state] def allAutoRestatements: Map[String, Long] =
    synchronized(autoRestatements.toMap)

  private def hydrate(s: Snapshot): Snapshot = {
    val (i, d) = ivals.getOrElse((s.model.name, s.version), (Vector.empty, Vector.empty))
    s.copy(intervals = i, devIntervals = d)
  }

  def pushSnapshot(s: Snapshot): Unit = synchronized {
    val key = (s.model.name, s.fingerprint.full)
    if (!snapshots.contains(key)) {
      val stored = s.copy(intervals = Vector.empty, devIntervals = Vector.empty)
      snapshots(key) = stored
      byNameVersion((stored.model.name, stored.version)) = stored
      byName(stored.model.name) = stored
    }
    if (s.intervals.nonEmpty || s.devIntervals.nonEmpty) {
      val cur = ivals.getOrElse((s.model.name, s.version), (Vector.empty, Vector.empty))
      ivals((s.model.name, s.version)) = (
        IntervalAlgebra.merge(cur._1 ++ s.intervals),
        IntervalAlgebra.merge(cur._2 ++ s.devIntervals))
    }
  }
  def getSnapshot(name: String, version: String): Option[Snapshot] =
    synchronized(byNameVersion.get((name, version)).map(hydrate))
  def getSnapshotById(name: String, identifier: String): Option[Snapshot] =
    synchronized(snapshots.get((name, identifier)).map(hydrate))
  def latestSnapshot(name: String): Option[Snapshot] =
    synchronized(byName.get(name).map(hydrate))
  def allSnapshots: Seq[Snapshot] = synchronized(snapshots.values.toSeq.map(hydrate))
  def deleteSnapshot(name: String, version: String): Unit = synchronized {
    snapshots.filterInPlace { case (_, s) => !(s.model.name == name && s.version == version) }
    ivals.remove((name, version))
    // deletes are rare (janitor path): rebuild this name's index entries
    // with one ordered pass so last-pushed-wins semantics survive
    byNameVersion.filterInPlace { case ((n, _), _) => n != name }
    byName.remove(name)
    snapshots.values.foreach { s =>
      if (s.model.name == name) {
        byNameVersion((name, s.version)) = s
        byName(name) = s
      }
    }
  }

  def addInterval(name: String, version: String, interval: Interval, dev: Boolean): Unit =
    synchronized {
      val cur = ivals.getOrElse((name, version), (Vector.empty, Vector.empty))
      ivals((name, version)) =
        if (dev) (cur._1, IntervalAlgebra.merge(cur._2 :+ interval))
        else (IntervalAlgebra.merge(cur._1 :+ interval), cur._2)
    }
  def removeInterval(name: String, version: String, interval: Interval): Unit =
    synchronized {
      val cur = ivals.getOrElse((name, version), (Vector.empty, Vector.empty))
      ivals((name, version)) = (
        IntervalAlgebra.remove(cur._1, interval),
        IntervalAlgebra.remove(cur._2, interval))
    }

  def promoteEnvironment(env: EnvironmentRecord): Unit = synchronized { envs(env.name) = env }
  def getEnvironment(name: String): Option[EnvironmentRecord] = synchronized(envs.get(name))
  def finalizeEnvironment(name: String): Unit = synchronized {
    envs.get(name).foreach(e => envs(name) = e.copy(finalized = true))
  }
  def deleteEnvironment(name: String): Unit = synchronized { envs.remove(name); () }
  def environments: Seq[EnvironmentRecord] = synchronized(envs.values.toSeq)
}
