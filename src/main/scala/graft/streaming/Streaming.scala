package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StructField, StructType}

/** Structured Streaming extension (beyond reference parity: sqlmesh emulates
  * streams with batch intervals — SURVEY §2.3 notes streaming is absent there).
  *
  * The mapping onto this engine's concepts: a streaming model is an
  * INCREMENTAL_UNMANAGED-style append whose "processed intervals" live in the
  * streaming checkpoint instead of the state store — `Trigger.AvailableNow`
  * drains whatever arrived since the last run and stops, so each invocation
  * behaves exactly like one scheduler batch, restart-safe and
  * exactly-once-per-file. At scale the same code runs continuously
  * (`Trigger.ProcessingTime`) on a cluster; nothing here is local-mode-only.
  */
object Streaming {

  /** One incremental drain of a file-source stream: readStream(sourceDir) →
    * transform → append to sinkDir, resuming from checkpointDir. Returns rows
    * written this run (from the sink's delta, not the plan). */
  def runAvailableNow(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      transform: DataFrame => DataFrame,
      sinkDir: String,
      checkpointDir: String): Unit = {
    val in = spark.readStream.schema(schema).parquet(sourceDir)
    val q = transform(in).writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Per-micro-batch quality metrics for a stream — the streaming
    * counterpart of the batch one-pass write+audit
    * ([[graft.audits.ObservedAudits]]): `Dataset.observe` aggregates ride
    * every micro-batch for free (no second pass over the stream) and
    * surface in each progress event's `observedMetrics`. Pair with
    * [[drainWithMetrics]] (or any StreamingQueryListener in continuous
    * deployments) to monitor row counts / null rates / bounds violations
    * per batch at any scale. */
  def withMetrics(df: DataFrame, name: String, aggs: Seq[Column]): DataFrame =
    df.observe(name, aggs.head, aggs.tail: _*)

  /** [[runAvailableNow]] + collection of the named observed metrics from
    * every micro-batch this drain processed. Returns one (batchId → metric
    * map) entry per batch that carried the observation.
    *
    * A listener captures every batch — `recentProgress` alone retains only
    * the last `spark.sql.streaming.numRecentProgressUpdates` (default 100)
    * events, which would silently drop the earliest batches of a large
    * backlog drain; the two sources are unioned (dedup on batchId) so the
    * tail is covered even if a listener event is still in flight at
    * termination. */
  def drainWithMetrics(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      transform: DataFrame => DataFrame,
      sinkDir: String,
      checkpointDir: String,
      metricsName: String): Seq[(Long, Map[String, Any])] = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val buf = scala.collection.mutable.ArrayBuffer[(java.util.UUID, Long, Map[String, Any])]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        Option(p.observedMetrics.get(metricsName)).foreach { row =>
          buf.synchronized {
            buf += ((p.id, p.batchId, row.schema.fieldNames.zip(row.toSeq).toMap))
          }
        }
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val in = spark.readStream.schema(schema).parquet(sourceDir)
      val q = transform(in).writeStream
        .format("parquet")
        .option("path", sinkDir)
        .option("checkpointLocation", checkpointDir)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val fromListener = buf.synchronized {
        buf.toSeq.collect { case (id, b, m) if id == q.id => b -> m }
      }
      val fromRecent = q.recentProgress.toSeq.flatMap { p =>
        Option(p.observedMetrics.get(metricsName)).map { row =>
          p.batchId -> row.schema.fieldNames.zip(row.toSeq).toMap
        }
      }
      (fromListener ++ fromRecent).distinctBy(_._1).sortBy(_._1)
    } finally spark.streams.removeListener(listener)
  }

  /** Event-time tumbling-window aggregation with a watermark: the streaming
    * analog of INCREMENTAL_BY_TIME_RANGE — late data within the watermark
    * still lands in its window; beyond it, the window is closed and emitted
    * (append mode only emits closed windows). */
  def windowedAgg(
      df: DataFrame,
      tsCol: String,
      windowDuration: String,
      watermarkDelay: String,
      keys: Seq[Column],
      aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy((window(col(tsCol), windowDuration) +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((col("window.start").as("window_start") +:
        col("window.end").as("window_end") +:
        (keys ++ aggs.map(c => col(extractAlias(c))))): _*)

  private def extractAlias(c: Column): String = {
    val s = c.toString
    val i = s.toUpperCase.lastIndexOf(" AS ")
    if (i >= 0) s.substring(i + 4).stripPrefix("`").stripSuffix("`") else s
  }

  /** Gap-based sessionization over a stream — session_window groups events
    * whose gaps stay under `gap` (the batch analog is the q22 gaps-and-islands
    * query; Spark's native session_window handles state + merging). */
  def sessionize(
      df: DataFrame,
      tsCol: String,
      userCol: String,
      gap: String,
      watermarkDelay: String): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Watermarked stream-stream interval join (the streaming enrichment
    * pattern: left events joined to right events of the same key within
    * `[0, maxDelay]` event-time skew). Both sides carry watermarks and the
    * join condition bounds event time, so per-side join STATE is evicted
    * once the watermark passes the bound — without the bound, stream-stream
    * join state grows forever, the cardinal streaming-join mistake at
    * scale. Inner join: matches emit as soon as both sides arrive.
    * `leftOuter`: additionally, a left row whose match window closes
    * unmatched — watermark past `l_ts + maxDelay` — emits once with null
    * right columns when its state evicts (Spark emits these on the
    * watermark-advancing no-data micro-batch, so a single AvailableNow
    * drain flushes them). Column names collide between the sides, so both
    * are prefixed (`l_`/`r_`). */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      tsCol: String,
      keys: Seq[String],
      maxDelay: String,
      watermarkDelay: String,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(tsCol, watermarkDelay)
      .select(left.columns.map(c => col(c).as(s"l_$c")): _*)
    val r = right.withWatermark(tsCol, watermarkDelay)
      .select(right.columns.map(c => col(c).as(s"r_$c")): _*)
    val keyCond = keys.map(k => col(s"l_$k") === col(s"r_$k")).reduce(_ && _)
    val timeCond = col(s"r_$tsCol") >= col(s"l_$tsCol") &&
      col(s"r_$tsCol") <= col(s"l_$tsCol") + expr(s"INTERVAL $maxDelay")
    l.join(r, keyCond && timeCond, joinType)
  }

  /** Streaming CDC-style upsert into an engine-managed table: each
    * micro-batch MERGEs on the unique key through the materializer (latest
    * row per key wins, recency by `orderCol`) — the standard
    * foreachBatch-upsert pattern, landing in the engine's copy-on-write
    * table format so batch models and env views read the result through the
    * same catalog. `Trigger.AvailableNow` + checkpoint = one exactly-once
    * drain per invocation, the streaming analog of an
    * INCREMENTAL_BY_UNIQUE_KEY scheduler batch; on a cluster the same code
    * runs continuously. */
  def mergeStream(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      target: graft.adapter.PhysicalTable,
      keys: Seq[String],
      orderCol: String,
      checkpointDir: String,
      transform: DataFrame => DataFrame = identity): Unit = {
    val mat = new graft.adapter.SparkMaterializer(spark)
    val in = spark.readStream.schema(schema).parquet(sourceDir)
    val upsert: (DataFrame, Long) => Unit = (batch, _) =>
      mat.merge(target, mat.dedupByKey(batch, keys, Seq(col(orderCol))), keys)
    val q = transform(in).writeStream
      .foreachBatch(upsert)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming CDC into a TYPE-2 HISTORY table: each micro-batch runs the
    * full SCD2-by-time pipeline against the target, so the stream maintains
    * valid_from/valid_to row versions instead of overwriting (the
    * "dimension table fed by a change stream" pattern). Versioning follows
    * the source `updated_at`, so replaying a batch after a crash is
    * idempotent (stale updated_at ⇒ no new versions); within one batch a
    * key keeps only its latest change (standard CDC compaction — drain more
    * often to keep intermediate versions). `invalidate_hard_deletes` must
    * be off: a micro-batch is a partial view of the key space, and an
    * absent key is "no change this batch", never a delete. */
  def scd2Stream(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      target: graft.adapter.PhysicalTable,
      kind: graft.core.ModelKind.ScdType2ByTime,
      checkpointDir: String,
      executionTs: () => java.sql.Timestamp = () =>
        new java.sql.Timestamp(System.currentTimeMillis())): Unit = {
    require(!kind.invalidateHardDeletes,
      "scd2Stream: set invalidateHardDeletes=false — a micro-batch is a " +
        "partial view, an absent key is not a hard delete")
    val mat = new graft.adapter.SparkMaterializer(spark)
    val upsert: (DataFrame, Long) => Unit = (batch, _) =>
      if (!batch.isEmpty) mat.scdType2ByTime(target, batch, kind, executionTs())
    val q = spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .foreachBatch(upsert)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming exact-dedup with custom keyed state
    * (`KeyValueGroupedDataset.flatMapGroupsWithState`): the first event per
    * key is emitted, later duplicates — in the same micro-batch or any later
    * one — are suppressed by a per-key seen-flag. State expires `stateTtlMs`
    * after the watermark passes (event-time timeout), so state size tracks
    * the dedup horizon, not the full stream history. Ties inside a batch
    * resolve to the smallest event time.
    *
    * Rows round-trip through JSON so the operator stays schema-generic; the
    * per-key payload is one row, so state bytes stay bounded at scale. */
  def dedupStream(df: DataFrame, keyCol: String, tsCol: String,
                  watermarkDelay: String, stateTtlMs: Long = 3600000L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    val schema = df.schema
    // the watermark-tagged timestamp column must survive into the grouped
    // Dataset (event-time timeout requires it); micros carried separately for
    // exact tie-breaking (Timestamp.getTime truncates to millis)
    val keyed = df.withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol).cast("string").as("_1"), col(tsCol).as("_2"),
        unix_micros(col(tsCol)).as("_3"),
        to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("_4"))
      .as[(String, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
    val emitted = keyed.flatMapGroupsWithState[Boolean, String](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (_: String, rows: Iterator[(String, java.sql.Timestamp, Long, String)],
       state: GroupState[Boolean]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          val rs = rows.toVector // bounded: one key's rows in one micro-batch
          val seen = state.exists
          state.update(true)
          // TTL anchored to event time (the watermark lags a batch behind and
          // starts at zero) and extended on every sighting — the dedup
          // horizon slides with the stream
          state.setTimeoutTimestamp(
            math.max(state.getCurrentWatermarkMs(), rs.map(_._3 / 1000L).max) + stateTtlMs)
          if (seen) Iterator.empty // duplicate in a later batch
          else Iterator.single(rs.minBy(_._3)._4)
        }
    }
    emitted.toDF("__row")
      .select(from_json(col("__row"), schema).as("r")).select("r.*")
  }

  /** Streaming NEAR-dup screen — the streaming analog of
    * [[graft.functions.Dedup.incrementalMinhashLsh]]: each arriving
    * document's per-row MinHash signature
    * ([[graft.functions.Dedup.minhashColumn]] — aggregation-free, so it
    * runs inside an append-mode micro-batch) is banded, and each band
    * bucket keeps the signatures it has seen in custom keyed state. A new
    * doc colliding with a stored one verifies est-Jaccard in place and
    * emits a pair row (`doc_id`, `corpus_id`, `est_jaccard`, `tsCol`);
    * docs with no emitted pair are novel. Every doc joins its buckets'
    * state (accepted-or-not — that's LSH corpus membership), within-batch
    * in event-time order so earlier batch-mates screen later ones.
    *
    * The same pair can surface from several bands (bounded by `bands` rows
    * per pair; per-bucket emissions are deduped). Chaining a streaming
    * dedup after custom keyed state trips Spark's global-watermark
    * correctness check, so the collapse belongs to the caller's sink —
    * `.dropDuplicates("doc_id","corpus_id")` in a foreachBatch, or a batch
    * `distinct` over the sink table. The duplicates are bit-identical
    * rows, so any collapse point is correct.
    *
    * State is bounded on BOTH axes, which is what lets it run forever:
    * per-bucket entries cap at `maxBucketSize` (a boilerplate bucket stops
    * absorbing new members — the [[graft.functions.Dedup.minhashLsh]]
    * hot-bucket valve; late members of a full bucket still SCREEN against
    * it), and buckets idle past `stateTtlMs` of event time expire wholesale
    * (the dedup horizon slides with the stream). Per-bucket bytes ≈
    * `maxBucketSize × (8 × numHashes + id)`. */
  def nearDupStream(df: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id", tsCol: String = "ts",
                    watermarkDelay: String = "10 minutes",
                    shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
                    threshold: Double = 0.5, maxBucketSize: Int = 64,
                    stateTtlMs: Long = 3600000L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(maxBucketSize >= 1, "maxBucketSize must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .withColumn("__sig",
        graft.functions.Dedup.minhashColumn(col(textCol), shingleN, numHashes))
      // zero-shingle docs have no signature: trivially novel, never stored
      .filter(col("__sig")(0).isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .select(
        explode(graft.functions.Dedup.bandKeyArray(numHashes, bands, "__sig"))
          .as("_1"),
        col(idCol).cast("string").as("_2"), col(tsCol).as("_3"),
        unix_micros(col(tsCol)).as("_4"), col("__sig").as("_5"))
      .as[(Long, String, java.sql.Timestamp, Long, Seq[Long])]
      .groupByKey(_._1)
    val pairs = keyed.flatMapGroupsWithState[
        List[(String, Seq[Long])],
        (String, String, Double, java.sql.Timestamp)](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (_: Long, rows: Iterator[(Long, String, java.sql.Timestamp, Long, Seq[Long])],
       state: GroupState[List[(String, Seq[Long])]]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          // event-time order so earlier batch-mates screen later ones
          val rs = rows.toVector.sortBy(r => (r._4, r._2))
          var bucket = state.getOption.getOrElse(Nil)
          val out = Vector.newBuilder[(String, String, Double, java.sql.Timestamp)]
          rs.foreach { case (_, id, tsv, _, sig) =>
            bucket.foreach { case (cid, csig) =>
              if (cid != id) {
                val matches = sig.iterator.zip(csig.iterator).count { case (a, b) => a == b }
                val est = matches.toDouble / numHashes
                if (est >= threshold) out += ((id, cid, est, tsv))
              }
            }
            // id-guard: an at-least-once redelivery (same id, later ts)
            // must not re-append — it would fill the bucket with copies of
            // one doc and evict capacity for real members
            if (bucket.size < maxBucketSize && !bucket.exists(_._1 == id))
              bucket = (id, sig) :: bucket
          }
          state.update(bucket)
          state.setTimeoutTimestamp(
            math.max(state.getCurrentWatermarkMs(), rs.map(_._4 / 1000L).max) + stateTtlMs)
          out.result().distinct.iterator
        }
    }
    pairs.toDF("__id", "corpus_id", "est_jaccard", tsCol)
      .withColumnRenamed("__id", idCol)
  }

  /** [[nearDupStream]] drained into an emit-ONCE pair sink — the collapse
    * contract as tested code instead of a doc note. The stream can surface
    * one pair several times: once per shared band within a batch (bounded
    * by `bands`), and again on at-least-once REDELIVERY of a doc in a later
    * batch (the id-guard stops state growth but the redelivered doc still
    * re-screens). Chaining a streaming dropDuplicates after custom keyed
    * state trips Spark's global-watermark correctness check, so the
    * collapse runs in `foreachBatch`:
    *
    *  1. `dropDuplicates(idCol, corpus_id)` — multi-band copies inside the
    *     batch are bit-identical rows; any one survives;
    *  2. anti-join against the sink's existing (idCol, corpus_id) keys —
    *     kills cross-batch re-emissions AND makes the append idempotent
    *     under foreachBatch's replay-after-failure semantics (a replayed
    *     batch finds its own rows already present and appends nothing).
    *
    * Scale shape: the anti-join reads the SINK, which holds near-dup pairs
    * (∝ duplicates found, orders of magnitude below corpus); a continuous
    * deployment on a MERGE-capable table replaces step 2 with
    * insert-if-absent on the pair key — the batch-side logic is identical.
    * One call = one `AvailableNow` drain; successive calls share
    * `checkpointDir`, so bucket state and file progress resume exactly. */
  def nearDupStreamToSink(spark: SparkSession, sourceDir: String,
                          schema: StructType, sinkDir: String,
                          checkpointDir: String,
                          textCol: String = "text", idCol: String = "doc_id",
                          tsCol: String = "ts",
                          watermarkDelay: String = "10 minutes",
                          shingleN: Int = 3, numHashes: Int = 16,
                          bands: Int = 4, threshold: Double = 0.5,
                          maxBucketSize: Int = 64,
                          stateTtlMs: Long = 3600000L): Unit = {
    val writer: (DataFrame, Long) => Unit = (batch, _) => {
      val s2 = batch.sparkSession
      val fresh0 = batch.dropDuplicates(idCol, "corpus_id")
      // Hadoop FileSystem probe, NOT java.io.File: the sink can be any
      // hadoop-compatible URI (hdfs://, s3a://, file:/) — a local-File
      // probe would silently report "no sink" there and skip the
      // anti-join, breaking the emit-once contract exactly where the
      // module promises nothing is local-mode-only
      val hasSink = {
        val p = new org.apache.hadoop.fs.Path(sinkDir)
        val fs = p.getFileSystem(s2.sparkContext.hadoopConfiguration)
        fs.exists(p)
      }
      // existence of the DIRECTORY is the probe, not of top-level
      // *.parquet files: a compacted or partition-subdirectoried sink has
      // no direct parquet children, and reading it as "no sink" would skip
      // the anti-join and break emit-once. An existing-but-empty dir (or
      // one holding only a _SUCCESS marker) is the one remaining shape —
      // the read then yields zero rows against an explicit schema, so the
      // anti-join is a correct no-op rather than an AnalysisException
      val fresh =
        if (hasSink)
          fresh0.join(
            s2.read.schema(fresh0.schema).parquet(sinkDir)
              .select(col(idCol), col("corpus_id")),
            Seq(idCol, "corpus_id"), "left_anti")
        else fresh0
      fresh.write.mode("append").parquet(sinkDir)
    }
    val in = spark.readStream.schema(schema).parquet(sourceDir)
    val q = nearDupStream(in, textCol, idCol, tsCol, watermarkDelay,
        shingleN, numHashes, bands, threshold, maxBucketSize, stateTtlMs)
      .writeStream
      .foreachBatch(writer)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming crawl intake — the front half of
    * [[graft.functions.Curation.crawlIngest]] on a page stream: HTML
    * extraction runs STATELESS at scan speed (pure codegen projections —
    * text, title, lang, the canonical-first normalized url_key), then URL
    * dedup runs on keyed state via `dropDuplicatesWithinWatermark` — the
    * first page per url_key within the watermark horizon passes, crawl
    * re-fetches and canonical aliases drop, and state is bounded by
    * event-time TTL (a crawler re-visiting a URL after the horizon
    * re-admits it — steady-state re-crawls are SUPPOSED to refresh
    * content; pair the sink with the incremental screens for
    * corpus-lifetime dedup). Corpus-LEVEL decisions (paragraph dedup,
    * quality floor, quota) stay batch-side over the sink — they need
    * cross-document state no stream should hold.
    *
    * Returns the deduped extracted stream: (`idCol`, `tsCol`, `urlCol`,
    * `url_key`, `title`, `lang_decl`, `text`) — the crawl URL rides along
    * so sink-side consumers compute the quota domain exactly as the batch
    * recipe does (`registeredDomain(urlHost(urlCol))`; deriving it from
    * url_key would diverge on cross-domain canonicals and collapse all
    * self-keyed rows into one '' pseudo-domain). Wire it to a sink with
    * [[runAvailableNow]]-style drains or a continuous trigger. */
  def crawlIngestStream(pages: DataFrame, htmlCol: String = "html",
                        urlCol: String = "url", idCol: String = "doc_id",
                        tsCol: String = "ts",
                        watermarkDelay: String = "10 minutes"): DataFrame =
    pages.select(col(idCol), col(tsCol), col(urlCol),
        graft.functions.Web.canonicalUrlKey(col(urlCol),
          graft.functions.Html.extractCanonical(col(htmlCol)),
          col(idCol)).as("url_key"),
        graft.functions.Html.extractTitle(col(htmlCol)).as("title"),
        graft.functions.Html.extractLang(col(htmlCol)).as("lang_decl"),
        graft.functions.Html.extractText(col(htmlCol)).as("text"))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("url_key")

  /** The per-batch writer behind [[linkGraphStream]], exposed so the spec
    * can drive a REPLAY of one batch directly: each micro-batch's edge
    * aggregate lands as one `batch_id=<id>` partition of the edge store,
    * and `overwrite` + dynamic partition overwrite make a re-delivered
    * batch REWRITE its own partition instead of appending a second copy —
    * the file-sink analog of [[nearDupStreamToSink]]'s anti-join, keyed by
    * foreachBatch's stable batchId. */
  private[graft] def linkGraphBatchWriter(sinkDir: String, urlCol: String,
                                          htmlCol: String): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      graft.functions.Graph.linkGraph(batch, urlCol, htmlCol)
        .withColumn("batch_id", lit(batchId))
        .write
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(sinkDir)

  /** Streaming link-graph intake — [[graft.functions.Graph.linkGraph]]'s
    * append-only maintenance recipe on a page stream: every micro-batch
    * contributes its OWN edge aggregate as one partition of the edge
    * store. foreachBatch, not a streaming aggregation: the edge set grows
    * monotonically, so streaming state would grow without bound for no
    * benefit — per-batch aggregates are exactly the shape the append-only
    * store wants ([[graft.functions.Graph.compactEdges]] and
    * [[graft.functions.Graph.pageRank]] both re-sum duplicate (src, dst)
    * rows by construction, so the store is VALID at every instant and
    * compaction stays a periodic batch job). One call = one AvailableNow
    * drain; successive calls share `checkpointDir`, so file progress and
    * batch ids resume exactly. */
  def linkGraphStream(spark: SparkSession, sourceDir: String,
                      schema: StructType, sinkDir: String,
                      checkpointDir: String,
                      urlCol: String = "url", htmlCol: String = "html"): Unit = {
    val q = spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .foreachBatch(linkGraphBatchWriter(sinkDir, urlCol, htmlCol))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming crawl intake from RAW WARC FILES — the binary front of
    * [[crawlIngestStream]]: WARC containers land in `warcDir`
    * continuously (the shape a fetcher fleet produces), the `binaryFile`
    * streaming source picks up whole files, [[graft.functions.Warc]]
    * splits records in-task, response payloads sniff/decode
    * ([[graft.functions.Html.decodeHtmlBytes]]), and the stateless
    * extraction + watermark-bounded URL dedup run unchanged. Row
    * identity = `src#rec_offset` (unique per record, stable across
    * replays — a file re-read yields the same ids, so the dedup state
    * stays consistent); event time = the record's `WARC-Date`, falling
    * back to the FILE's modification time when a record's date is
    * missing or unparseable — a dateless record must not reach the
    * watermark-keyed dedup with a null event time (it would be silently
    * dropped, violating per-record failure isolation). Everything before
    * the keyed dedup is stateless scan-shaped work. */
  def warcIngestStream(spark: SparkSession, warcDir: String,
                       watermarkDelay: String = "10 minutes",
                       maxFilesPerTrigger: Int = 16): DataFrame = {
    // binaryFile's schema is FIXED, but streaming sources demand it
    // spelled out (no inference on a stream)
    val binaryFileSchema = StructType(Seq(
      StructField("path", org.apache.spark.sql.types.StringType),
      StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      StructField("length", org.apache.spark.sql.types.LongType),
      StructField("content", org.apache.spark.sql.types.BinaryType)))
    val files = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(warcDir)
    val pages = graft.functions.Warc.split(files)
      .filter(col("warc_type") === "response")
      .withColumn("doc_id",
        concat(col("src"), lit("#"), col("rec_offset")))
      .withColumn("html",
        graft.functions.Html.decodeHtmlBytes(col("payload")))
      .withColumn("ts",
        coalesce(to_timestamp(col("fetch_ts")), col("src_mtime")))
      .select(col("doc_id"), col("ts"), col("url"), col("html"))
    crawlIngestStream(pages, watermarkDelay = watermarkDelay)
  }
}
