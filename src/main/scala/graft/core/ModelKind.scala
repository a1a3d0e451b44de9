package graft.core

/** Materialization strategies — the reference's ModelKind union
  * (sqlmesh/core/model/kind.py:163 enum, :1033 union). Each kind maps to a
  * DataFrame write recipe in [[graft.adapter.SparkMaterializer]]:
  *
  *  - FULL                       → createOrReplace of the whole query
  *  - VIEW                       → (re)create a view over the rendered query
  *  - INCREMENTAL_BY_TIME_RANGE  → dynamic partition overwrite of the interval's
  *                                 time partitions (insert_overwrite_by_time_partition,
  *                                 engine_adapter/base.py:1580)
  *  - INCREMENTAL_BY_UNIQUE_KEY  → merge on key equality (base.py:2203), emulated
  *                                 copy-on-write on parquet (LogicalMergeMixin,
  *                                 mixins.py:35) — partition-pruned when possible
  *  - INCREMENTAL_BY_PARTITION   → dynamic partition overwrite on declared partitions
  *  - INCREMENTAL_UNMANAGED      → plain append
  *  - SCD_TYPE_2_BY_TIME/COLUMN  → slowly-changing-dimension pipeline (base.py:1810)
  *  - SEED                       → CSV shipped with the project
  *  - EMBEDDED                   → no materialization; inlined into consumers
  *  - EXTERNAL                   → pre-existing table, metadata only
  *  - CUSTOM                     → user-supplied Scala materialization
  */
sealed trait ModelKind {
  def name: String
  /** participates in scheduling/backfill (reference: kind.is_materialized) */
  def isMaterialized: Boolean = true
  /** data-hash-relevant fields (fingerprint input), mirroring kind data fields
    * feeding `fingerprint_from_node` (snapshot/definition.py:1861). */
  def dataFields: Seq[String] = Seq(name)
  /** accumulates history interval-by-interval (reference kind.is_incremental)
    * — the kinds for which interval gaps are meaningful */
  def isIncremental: Boolean = name.startsWith("INCREMENTAL")
}

object ModelKind {
  case object Full extends ModelKind { val name = "FULL" }
  case object View extends ModelKind { val name = "VIEW" }

  /** VIEW (materialized true) — reference ViewKind.materialized
    * (model/kind.py ViewKind): queried like a view but physically
    * materialized and refreshed on every evaluated interval. On parquet the
    * Spark analog is a full refresh into the snapshot table (engines with
    * native materialized views map this to CREATE MATERIALIZED VIEW). */
  case object MaterializedView extends ModelKind {
    val name = "VIEW"
    override def dataFields: Seq[String] = Seq(name, "materialized")
  }

  /** @param timeColumn   column holding event time
    * @param timeFormat   how the predicate literal is rendered ("date" | "timestamp" | "epoch")
    * @param batchSize    max unit-intervals per evaluation batch (None = all at once)
    * @param lookback     re-process N extra trailing units each run
    * @param forwardOnly  schema changes never rebuild history */
  final case class IncrementalByTimeRange(
      timeColumn: String,
      timeFormat: String = "timestamp",
      batchSize: Option[Int] = None,
      batchConcurrency: Option[Int] = None,
      lookback: Int = 0,
      forwardOnly: Boolean = false,
      partitionByTime: Boolean = true,
      /** periodically re-process the trailing N unit-intervals (reference
        * kind.py:388 auto_restatement_cron / :470 auto_restatement_intervals) */
      autoRestatementCron: Option[String] = None,
      autoRestatementIntervals: Option[Int] = None) extends ModelKind {
    val name = "INCREMENTAL_BY_TIME_RANGE"
    override def dataFields: Seq[String] =
      Seq(name, timeColumn, timeFormat, lookback.toString)
  }

  /** unique-key upsert; batch_concurrency forced to 1 (kind.py:517).
    * `whenMatchedDelete` = WHEN MATCHED [AND cond] THEN DELETE (base.py:2203
    * when_matched): matched rows satisfying the condition are removed. */
  final case class IncrementalByUniqueKey(
      uniqueKey: Seq[String],
      whenMatchedUpdate: Map[String, String] = Map.empty,
      whenMatchedDelete: Option[String] = None,
      mergeFilter: Option[String] = None,
      /** >0 partitions the physical table into `buckets` hash-of-key
        * directories (a managed `__graft_bk` column): a key's bucket never
        * changes, so merges dynamic-overwrite only the buckets the source
        * touches instead of rewriting the table. The scale knob for big
        * upsert targets. */
      buckets: Int = 0,
      /** periodic full restatement (reference kind.py:388 — on the shared
        * _Incremental base, so unique-key kinds get it too): when the cron
        * fires, ALL processed intervals drop and the table re-merges its
        * whole history on the next run — the "re-sync my upsert table
        * weekly" knob (no per-interval variant here: upserts have no
        * interval-aligned partitions to restate selectively). */
      autoRestatementCron: Option[String] = None) extends ModelKind {
    val name = "INCREMENTAL_BY_UNIQUE_KEY"
    override def dataFields: Seq[String] =
      Seq(name, buckets.toString) ++ uniqueKey ++ mergeFilter.toSeq ++ whenMatchedDelete.toSeq
  }

  final case class IncrementalByPartition(partitionedBy: Seq[String]) extends ModelKind {
    val name = "INCREMENTAL_BY_PARTITION"
    override def dataFields: Seq[String] = Seq(name) ++ partitionedBy
  }

  final case class IncrementalUnmanaged(insertOverwrite: Boolean = false) extends ModelKind {
    val name = "INCREMENTAL_UNMANAGED"
    override def dataFields: Seq[String] = Seq(name, insertOverwrite.toString)
  }

  /** SCD2 driven by an updated_at timestamp (kind.py SCDType2ByTimeKind). */
  final case class ScdType2ByTime(
      uniqueKey: Seq[String],
      updatedAtCol: String = "updated_at",
      validFromCol: String = "valid_from",
      validToCol: String = "valid_to",
      updatedAtAsValidFrom: Boolean = false,
      invalidateHardDeletes: Boolean = true) extends ModelKind {
    val name = "SCD_TYPE_2_BY_TIME"
    override def dataFields: Seq[String] =
      Seq(name, updatedAtCol, validFromCol, validToCol,
        updatedAtAsValidFrom.toString, invalidateHardDeletes.toString) ++ uniqueKey
  }

  /** SCD2 driven by column-value change (kind.py SCDType2ByColumnKind);
    * checkColumns == Seq("*") means all non-managed columns. */
  final case class ScdType2ByColumn(
      uniqueKey: Seq[String],
      checkColumns: Seq[String],
      validFromCol: String = "valid_from",
      validToCol: String = "valid_to",
      executionTimeAsValidFrom: Boolean = false,
      invalidateHardDeletes: Boolean = true) extends ModelKind {
    val name = "SCD_TYPE_2_BY_COLUMN"
    override def dataFields: Seq[String] =
      Seq(name, validFromCol, validToCol, invalidateHardDeletes.toString) ++
        uniqueKey ++ checkColumns
  }

  /** @param options CSV reader settings (reference CsvSettings,
    *                 model/seed.py:27): delimiter, quote, header, … passed to
    *                 Spark's csv reader verbatim */
  final case class Seed(path: String, batchSize: Int = 1000,
                        options: Map[String, String] = Map.empty) extends ModelKind {
    val name = "SEED"
    override def dataFields: Seq[String] =
      Seq(name, path) ++ options.toSeq.sorted.map { case (k, v) => s"$k=$v" }
  }

  case object Embedded extends ModelKind {
    val name = "EMBEDDED"; override def isMaterialized = false
  }
  case object External extends ModelKind {
    val name = "EXTERNAL"; override def isMaterialized = false
  }

  /** user-registered materialization (evaluator.py:2812 CustomMaterialization;
    * auto_restatement_cron on CustomKind per kind.py:966 — fires like the
    * unique-key variant: all processed intervals drop, the strategy re-runs
    * its whole window). */
  final case class Custom(strategyName: String, properties: Map[String, String] = Map.empty,
                          autoRestatementCron: Option[String] = None)
      extends ModelKind {
    val name = "CUSTOM"
    override def dataFields: Seq[String] = Seq(name, strategyName) ++
      properties.toSeq.sorted.map { case (k, v) => s"$k=$v" }
  }

  /** MANAGED (reference kind.py ManagedKind; evaluator.py:3089
    * EngineManagedStrategy): an engine-refreshed table — on Snowflake a
    * dynamic table with `target_lag`. The reference only CREATEs it and lets
    * the warehouse refresh; our engine IS the warehouse, so the scheduler
    * performs the refresh itself: a run fully refreshes the table only when
    * its data watermark lags the requested end by more than `targetLag`
    * ('N seconds|minutes|hours|days', or 'downstream' = always refresh when
    * asked). Within the lag window a run is a no-op — the freshness/cost
    * trade the kind exists to express. `targetLag` is refresh policy, not
    * query identity, so it stays out of the data hash (changing it must not
    * rebuild the table). */
  final case class Managed(targetLag: String = "downstream",
                           properties: Map[String, String] = Map.empty) extends ModelKind {
    val name = "MANAGED"
    override def dataFields: Seq[String] = Seq(name) ++
      properties.toSeq.sorted.map { case (k, v) => s"$k=$v" }
  }
  /** The kinds whose auto-restatement drops ALL intervals (no
    * interval-aligned partial variant): unique-key and custom. */
  def fullAutoRestatementCron(k: ModelKind): Option[String] = k match {
    case u: IncrementalByUniqueKey => u.autoRestatementCron
    case c: Custom                 => c.autoRestatementCron
    case _                         => None
  }

  object Managed {
    private val Lag = """(?i)\s*(\d+)\s*(second|minute|hour|day)s?\s*""".r
    def lagMs(spec: String): Long = spec match {
      case Lag(n, unit) =>
        n.toLong * (unit.toLowerCase match {
          case "second" => 1000L
          case "minute" => 60000L
          case "hour"   => 3600000L
          case "day"    => 86400000L
        })
      case _ => 0L // 'downstream' and unparsable lags refresh on demand
    }
  }
}
