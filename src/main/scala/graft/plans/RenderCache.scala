package graft.plans

import graft.core.{Model, SqlBody}

/** Rendered-query cache (reference: sqlmesh/core/snapshot/cache.py:1-111
  * SnapshotCache and renderer.py:111-116 `self._cache`): rendered SQL text
  * keyed by snapshot fingerprint plus every render input that can alter the
  * output. At hundreds of models a plan/run cycle re-renders each body —
  * macro expansion, jinja, table resolution — once per evaluation; repeated
  * cycles in one context (plan → apply → run → run) redo all of it. The
  * cache collapses identical renders to one.
  *
  * Correctness rules:
  *  - the key starts from the snapshot fingerprint, which already folds in
  *    the body text, kind data, and parent hashes — any model edit misses;
  *  - interval and execution timestamps join the key ONLY when the body can
  *    observe them (any `start_*`/`end_*`/`execution_*`/`latest_*` time-var
  *    substring, conservatively matched) — so a FULL model re-rendered each
  *    run with a fresh executionTs still hits;
  *  - variables (including the per-call `is_incremental` flag), the table
  *    mapping, `@this` and the custom-macro names are always in the key;
  *  - bodies that introspect live catalog state at render time (`@STAR`,
  *    `@UNION`, dbt `star`, `get_column_values`) BYPASS the cache — their
  *    output can change without any key input changing.
  */
final class RenderCache(max: Int = 4096) {
  private val lru = new java.util.LinkedHashMap[String, String](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, String]): Boolean =
      size() > max
  }
  private val hitsN = new java.util.concurrent.atomic.AtomicLong
  private val missesN = new java.util.concurrent.atomic.AtomicLong
  def hits: Long = hitsN.get
  def misses: Long = missesN.get

  def getOrElseUpdate(key: String)(compute: => String): String = {
    val cached = lru.synchronized(Option(lru.get(key)))
    cached match {
      case Some(v) => hitsN.incrementAndGet(); v
      case None =>
        val v = compute // outside the lock: renders may nest (embedded models)
        missesN.incrementAndGet()
        lru.synchronized(lru.put(key, v))
        v
    }
  }
}

object RenderCache {
  /** Render-time catalog introspection: output may change with no key change.
    * Matched as invocations — a bare `@star` substring would false-positive
    * on every `@start_*` time variable. */
  private val introspective = Seq(
    "(?i)@(star|union)\\s*\\(".r,
    "(?i)\\b(star|get_column_values)\\s*\\(".r,
    // live-engine jinja: schema introspection and render-time queries
    // read state no cache key sees (a migration or upstream backfill
    // changes the output under the same fingerprint)
    "(?i)\\b(get_columns_in_relation|run_query|statement|load_result)\\s*\\(".r)
  /** Conservative substring match: false positives only weaken sharing. */
  private val timeSuffixes = "(ds|ts|tstz|date|dt|dtntz|epoch|millis|hour)"
  private val intervalRe = s"(?i)(start|end)_$timeSuffixes".r
  private val execRe = s"(?i)(execution|latest)_$timeSuffixes".r

  def cacheable(body: String): Boolean =
    !introspective.exists(_.findFirstIn(body).isDefined)

  /** Memoizing front-end over [[Renderer.render]] for SQL bodies. */
  def cachedRender(
      cache: RenderCache,
      fingerprint: String,
      model: Model,
      start: Long,
      end: Long,
      execution: Long,
      tableMapping: Map[String, String],
      variables: Map[String, String] = Map.empty,
      thisModel: Option[String] = None,
      schemaOf: String => Seq[(String, String)] = _ => Nil,
      macros: Map[String, Seq[String] => String] = Map.empty,
      /** registry version counter (bumped on every registration, including
        * re-registration under an existing name) — names alone can't see a
        * behavior change behind the same name (r7 advisor finding). */
      macrosVersion: Long = 0L,
      columnValues: Option[(String, String, Int) => Seq[String]] = None,
      runQuery: Option[String => (Seq[String], Seq[Seq[Any]])] = None): String = {
    def run = Renderer.render(model, start, end, execution, tableMapping,
      variables, thisModel, schemaOf, macros, columnValues, runQuery)
    model.body match {
      case SqlBody(sql) if cacheable(sql) =>
        val ivKey =
          if (intervalRe.findFirstIn(sql).isDefined) s"$start,$end" else "-"
        val exKey = if (execRe.findFirstIn(sql).isDefined) execution.toString else "-"
        val key = Seq(
          fingerprint, ivKey, exKey,
          tableMapping.toSeq.sorted.mkString(";"),
          variables.toSeq.sorted.mkString(";"),
          thisModel.getOrElse("-"),
          macros.keys.toSeq.sorted.mkString(","),
          macrosVersion.toString).mkString("\u0001")
        cache.getOrElseUpdate(key)(run)
      case _ => run
    }
  }
}
