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
    planId: Option[String] = None)

trait StateStore {
  def pushSnapshot(s: Snapshot): Unit
  def getSnapshot(name: String, version: String): Option[Snapshot]
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

  /** auto-restatement bookkeeping (reference `_auto_restatements` table,
    * state_sync/db/snapshot.py:79-84): last cron firing already applied. */
  def lastAutoRestatement(name: String): Option[Long]
  def setAutoRestatement(name: String, ts: Long): Unit

  /** janitor: snapshots referenced by no environment (core/janitor.py) */
  def expiredSnapshots: Seq[Snapshot] = {
    val referenced = environments.flatMap(e => e.snapshots.map { case (n, v) => s"$n@$v" }).toSet
    allSnapshots.filterNot(s => referenced.contains(s"${s.model.name}@${s.version}"))
  }
  def environments: Seq[EnvironmentRecord]
}

final class InMemoryStateStore extends StateStore {
  private val snapshots = scala.collection.mutable.LinkedHashMap[(String, String), Snapshot]()
  private val envs = scala.collection.mutable.LinkedHashMap[String, EnvironmentRecord]()
  private val autoRestatements = scala.collection.mutable.Map[String, Long]()

  def lastAutoRestatement(name: String): Option[Long] =
    synchronized(autoRestatements.get(name))
  def setAutoRestatement(name: String, ts: Long): Unit =
    synchronized { autoRestatements(name) = ts }
  private[state] def allAutoRestatements: Map[String, Long] =
    synchronized(autoRestatements.toMap)

  def pushSnapshot(s: Snapshot): Unit = synchronized {
    snapshots.get((s.model.name, s.version)) match {
      case Some(old) => // keep accumulated intervals across re-pushes of same version
        snapshots((s.model.name, s.version)) = s.copy(
          intervals = IntervalAlgebra.merge(old.intervals ++ s.intervals))
      case None => snapshots((s.model.name, s.version)) = s
    }
  }
  def getSnapshot(name: String, version: String): Option[Snapshot] =
    synchronized(snapshots.get((name, version)))
  def latestSnapshot(name: String): Option[Snapshot] =
    synchronized(snapshots.collect { case ((n, _), s) if n == name => s }.toSeq.sortBy(_.createdTs).lastOption)
  def allSnapshots: Seq[Snapshot] = synchronized(snapshots.values.toSeq)
  def deleteSnapshot(name: String, version: String): Unit =
    synchronized { snapshots.remove((name, version)); () }

  def addInterval(name: String, version: String, interval: Interval, dev: Boolean): Unit =
    synchronized {
      snapshots.get((name, version)).foreach { s =>
        snapshots((name, version)) =
          if (dev) s.copy(devIntervals = IntervalAlgebra.merge(s.devIntervals :+ interval))
          else s.addInterval(interval)
      }
    }
  def removeInterval(name: String, version: String, interval: Interval): Unit =
    synchronized {
      snapshots.get((name, version)).foreach(s => snapshots((name, version)) = s.removeInterval(interval))
    }

  def promoteEnvironment(env: EnvironmentRecord): Unit = synchronized { envs(env.name) = env }
  def getEnvironment(name: String): Option[EnvironmentRecord] = synchronized(envs.get(name))
  def finalizeEnvironment(name: String): Unit = synchronized {
    envs.get(name).foreach(e => envs(name) = e.copy(finalized = true))
  }
  def environments: Seq[EnvironmentRecord] = synchronized(envs.values.toSeq)
}
