package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("availableNow drains incrementally with exactly-once file semantics") {
    val src = SparkTestSession.tmpDir("stream_src")
    val sink = SparkTestSession.tmpDir("stream_sink")
    val chk = SparkTestSession.tmpDir("stream_chk")
    val batch1 = Seq((1L, ts("2024-01-01 00:01:00"), 10.0), (2L, ts("2024-01-01 00:02:00"), 20.0))
      .toDF("id", "ts", "v")
    batch1.write.mode("append").parquet(src)

    def drain(): Unit = Streaming.runAvailableNow(spark, src, batch1.schema,
      df => df.filter(col("v") > 0).withColumn("doubled", col("v") * 2),
      sink, chk)

    drain()
    assert(spark.read.parquet(sink).count() == 2)
    // re-run without new data: checkpoint prevents reprocessing
    drain()
    assert(spark.read.parquet(sink).count() == 2)
    // new file: only its rows are appended
    Seq((3L, ts("2024-01-01 00:03:00"), 30.0)).toDF("id", "ts", "v")
      .write.mode("append").parquet(src)
    drain()
    val out = spark.read.parquet(sink)
    assert(out.count() == 3)
    assert(out.filter(col("id") === 3).head().getAs[Double]("doubled") == 60.0)
  }

  test("drainWithMetrics observes per-batch quality counters for free") {
    val src = SparkTestSession.tmpDir("met_src")
    val sink = SparkTestSession.tmpDir("met_sink")
    val chk = SparkTestSession.tmpDir("met_chk")
    val b1 = Seq((1L, "ok"), (2L, null), (3L, "ok")).toDF("id", "tag")
    b1.write.mode("append").parquet(src)
    def drain() = Streaming.drainWithMetrics(spark, src, b1.schema,
      df => Streaming.withMetrics(df, "quality", Seq(
        count(lit(1)).as("rows"),
        sum(when(col("tag").isNull, 1L).otherwise(0L)).as("null_tags"))),
      sink, chk, "quality")
    val m1 = drain()
    assert(m1.nonEmpty)
    val agg1 = m1.map(_._2)
    assert(agg1.map(_("rows").toString.toLong).sum == 3)
    assert(agg1.map(_("null_tags").toString.toLong).sum == 1)
    // second drain sees only the NEW file's rows (metrics are per-batch,
    // checkpoint-resumed like the data itself)
    Seq((4L, Option.empty[String]), (5L, Option.empty[String]))
      .toDF("id", "tag").write.mode("append").parquet(src)
    val m2 = drain()
    assert(m2.map(_._2("rows").toString.toLong).sum == 2)
    assert(m2.map(_._2("null_tags").toString.toLong).sum == 2)
    // the data itself flowed through untouched
    assert(spark.read.parquet(sink).count() == 5)
  }

  test("watermarked windowed aggregation emits closed windows") {
    val src = SparkTestSession.tmpDir("wstream_src")
    val sink = SparkTestSession.tmpDir("wstream_sink")
    val chk = SparkTestSession.tmpDir("wstream_chk")
    val b1 = Seq(
      ("u1", ts("2024-01-01 00:01:00"), 1.0), ("u1", ts("2024-01-01 00:04:00"), 2.0),
      ("u2", ts("2024-01-01 00:02:00"), 5.0)).toDF("user", "ts", "v")
    b1.write.mode("append").parquet(src)

    def drain(): Unit = Streaming.runAvailableNow(spark, src, b1.schema,
      df => Streaming.windowedAgg(df, "ts", "5 minutes", "1 minute",
        keys = Seq(col("user")), aggs = Seq(sum(col("v")).as("total"))),
      sink, chk)

    drain() // watermark hasn't passed the first window yet → nothing emitted
    // an event far in the future closes the earlier windows on the next drain
    Seq(("u1", ts("2024-01-01 01:00:00"), 9.0)).toDF("user", "ts", "v")
      .write.mode("append").parquet(src)
    drain()
    val out = spark.read.parquet(sink)
    val rows = out.collect().map(r =>
      (r.getAs[String]("user"), r.getAs[java.sql.Timestamp]("window_start").toString,
        r.getAs[Double]("total"))).toSet
    assert(rows.contains(("u1", "2024-01-01 00:00:00.0", 3.0)))
    assert(rows.contains(("u2", "2024-01-01 00:00:00.0", 5.0)))
  }

  test("session_window groups events by gap") {
    val src = SparkTestSession.tmpDir("sstream_src")
    val sink = SparkTestSession.tmpDir("sstream_sink")
    val chk = SparkTestSession.tmpDir("sstream_chk")
    // u1 has two sessions (>30min gap); u2 one
    val b1 = Seq(
      ("u1", ts("2024-01-01 00:00:00")), ("u1", ts("2024-01-01 00:10:00")),
      ("u1", ts("2024-01-01 02:00:00")),
      ("u2", ts("2024-01-01 00:05:00"))).toDF("user", "ts")
    b1.write.mode("append").parquet(src)

    def drain(): Unit = Streaming.runAvailableNow(spark, src, b1.schema,
      df => Streaming.sessionize(df, "ts", "user", "30 minutes", "1 minute"),
      sink, chk)

    drain()
    // close remaining sessions with a far-future event
    Seq(("u3", ts("2024-01-02 00:00:00"))).toDF("user", "ts")
      .write.mode("append").parquet(src)
    drain()
    val out = spark.read.parquet(sink)
    val u1Sessions = out.filter(col("user") === "u1").collect()
    assert(u1Sessions.length == 2)
    assert(u1Sessions.map(_.getAs[Long]("n_events")).sorted.toSeq == Seq(1L, 2L))
    assert(out.filter(col("user") === "u2").head().getAs[Long]("n_events") == 1L)
  }

  test("intervalJoin matches pairs within the time bound, streaming") {
    val src = SparkTestSession.tmpDir("sjoin_src")
    val sink = SparkTestSession.tmpDir("sjoin_sink")
    val chk = SparkTestSession.tmpDir("sjoin_chk")
    val events = Seq(
      ("u1", "click",    ts("2024-01-01 00:00:00"), 0.0),
      ("u1", "purchase", ts("2024-01-01 00:10:00"), 9.99),  // within 30 min ✓
      ("u1", "purchase", ts("2024-01-01 00:50:00"), 5.00),  // beyond 30 min ✗
      ("u2", "click",    ts("2024-01-01 00:00:00"), 0.0),   // no purchase ✗
      ("u3", "purchase", ts("2024-01-01 00:05:00"), 1.00)   // no click ✗
    ).toDF("user", "kind", "ts", "v")
    events.write.mode("append").parquet(src)
    def side(kind: String) = spark.readStream.schema(events.schema).parquet(src)
      .where(col("kind") === kind).select("user", "ts", "v")
    val q = Streaming.intervalJoin(side("click"), side("purchase"),
        "ts", Seq("user"), "30 MINUTES", "1 minute")
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", chk)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.read.parquet(sink)
      .select("l_user", "r_v").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.toSeq == Seq(("u1", 9.99)))
  }

  test("dedupStream suppresses duplicates within and across micro-batches") {
    val src = SparkTestSession.tmpDir("dstream_src")
    val sink = SparkTestSession.tmpDir("dstream_sink")
    val chk = SparkTestSession.tmpDir("dstream_chk")
    // k1 duplicated in batch 1 → first (earliest) kept
    val b1 = Seq(
      ("k1", ts("2024-01-01 00:02:00"), "late"),
      ("k1", ts("2024-01-01 00:01:00"), "first"),
      ("k2", ts("2024-01-01 00:03:00"), "only")).toDF("key", "ts", "tag")
    b1.write.mode("append").parquet(src)

    def drain(): Unit = Streaming.runAvailableNow(spark, src, b1.schema,
      df => Streaming.dedupStream(df, "key", "ts", "1 minute"),
      sink, chk)

    drain()
    val out1 = spark.read.parquet(sink)
    assert(out1.count() == 2)
    assert(out1.filter(col("key") === "k1").head().getAs[String]("tag") == "first")
    // batch 2: k1 again (suppressed by cross-batch state), k3 new (emitted)
    Seq(("k1", ts("2024-01-01 00:09:00"), "dup"),
        ("k3", ts("2024-01-01 00:10:00"), "new")).toDF("key", "ts", "tag")
      .write.mode("append").parquet(src)
    drain()
    val out2 = spark.read.parquet(sink)
    assert(out2.count() == 3)
    assert(out2.filter(col("key") === "k1").count() == 1)
    assert(out2.filter(col("key") === "k3").head().getAs[String]("tag") == "new")
  }

  test("nearDupStream emits near-dup pairs within and across micro-batches") {
    val src = SparkTestSession.tmpDir("ndstream_src")
    val sink = SparkTestSession.tmpDir("ndstream_sink")
    val chk = SparkTestSession.tmpDir("ndstream_chk")
    val b1 = Seq(
      (1L, ts("2024-01-01 00:01:00"),
        "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, ts("2024-01-01 00:02:00"),
        "completely different corpus text about spark catalyst optimizer internals"))
      .toDF("doc_id", "ts", "text")
    b1.write.mode("append").parquet(src)

    def drain(): Unit = Streaming.runAvailableNow(spark, src, b1.schema,
      df => Streaming.nearDupStream(df, shingleN = 2, numHashes = 16,
        bands = 8, threshold = 0.3, watermarkDelay = "1 minute"),
      sink, chk)

    drain()
    // two unrelated docs: no pairs
    assert(spark.read.schema(
      "doc_id string, corpus_id string, est_jaccard double, ts timestamp")
      .parquet(sink).count() == 0)
    // batch 2: a near-dup of stored doc 1 (cross-batch state), a novel doc,
    // and a same-batch exact copy of the novel doc (within-batch screen)
    Seq(
      (10L, ts("2024-01-01 00:09:00"),
        "the quick brown fox jumps over the lazy dog near the river shore"),
      (11L, ts("2024-01-01 00:10:00"),
        "structured streaming watermark state semantics explained with examples"),
      (12L, ts("2024-01-01 00:11:00"),
        "structured streaming watermark state semantics explained with examples"))
      .toDF("doc_id", "ts", "text")
      .write.mode("append").parquet(src)
    drain()
    val pairs = spark.read.parquet(sink)
      .select("doc_id", "corpus_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.contains(("10", "1")), s"cross-batch near-dup missed: $pairs")
    assert(pairs.contains(("12", "11")), s"within-batch dup missed: $pairs")
    assert(!pairs.exists(_._1 == "11"), s"novel doc must screen clean: $pairs")
    // cross-band duplicates are bounded by `bands` bit-identical rows per
    // pair (the caller collapses at the sink); per-bucket emission dedupes
    val rows = spark.read.parquet(sink)
      .groupBy("doc_id", "corpus_id").count().collect()
    assert(rows.forall(_.getLong(2) <= 8L), rows.mkString(","))
    assert(spark.read.parquet(sink).select("doc_id", "corpus_id", "est_jaccard")
      .distinct().count() == pairs.size)
  }

  test("nearDupStreamToSink: exactly one sink row per pair under multi-band hits and redelivery") {
    val src = SparkTestSession.tmpDir("ndsink_src")
    val sink = SparkTestSession.tmpDir("ndsink_sink")
    val chk = SparkTestSession.tmpDir("ndsink_chk")
    // docs 1 and 2 are EXACT copies: every one of the 8 bands collides, so
    // the raw stream surfaces pair (2,1) up to 8 times in one batch
    val b1 = Seq(
      (1L, ts("2024-01-01 00:01:00"),
        "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, ts("2024-01-01 00:02:00"),
        "the quick brown fox jumps over the lazy dog near the river bank"),
      (3L, ts("2024-01-01 00:03:00"),
        "completely different corpus text about spark catalyst optimizer internals"))
      .toDF("doc_id", "ts", "text")
    b1.write.mode("append").parquet(src)
    def drain(): Unit = Streaming.nearDupStreamToSink(spark, src, b1.schema,
      sink, chk, shingleN = 2, numHashes = 16, bands = 8, threshold = 0.3,
      watermarkDelay = "1 minute")
    drain()
    val sinkSchema = "doc_id string, corpus_id string, est_jaccard double, ts timestamp"
    def sinkRows() = spark.read.schema(sinkSchema).parquet(sink)
      .select("doc_id", "corpus_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    // multi-band collapse: ONE row for the 8-band pair, nothing else
    assert(sinkRows() == Seq(("2", "1")), sinkRows().mkString(","))
    // at-least-once REDELIVERY of doc 2 in a later batch: it re-screens
    // against stored doc 1 and would re-emit (2,1) — the sink anti-join
    // must drop it; the id-guard keeps it out of state, so no (1,2) either
    Seq((2L, ts("2024-01-01 00:09:00"),
        "the quick brown fox jumps over the lazy dog near the river bank"))
      .toDF("doc_id", "ts", "text")
      .write.mode("append").parquet(src)
    drain()
    assert(sinkRows() == Seq(("2", "1")),
      s"redelivery duplicated a sink pair: ${sinkRows()}")
    // a genuinely new near-dup in a third batch still lands exactly once
    Seq((9L, ts("2024-01-01 00:15:00"),
        "the quick brown fox jumps over the lazy dog near the river shore"))
      .toDF("doc_id", "ts", "text")
      .write.mode("append").parquet(src)
    drain()
    val after = sinkRows().toSet
    assert(after.contains(("9", "1")) && after.contains(("9", "2")),
      s"new near-dup missed: $after")
    assert(sinkRows().size == after.size, "sink grew duplicate pair rows")

    // COMPACTION survival: rewrite the sink partitioned by doc_id — no
    // top-level *.parquet files remain, only subdirectories. A probe that
    // lists direct children would read this as 'no sink', skip the
    // anti-join, and re-emit on the next redelivery
    val sinkSchemaT = org.apache.spark.sql.types.StructType.fromDDL(sinkSchema)
    val compacted = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(
        spark.read.schema(sinkSchemaT).parquet(sink).collect(): _*)),
      sinkSchemaT)
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(sink), true)
    compacted.write.partitionBy("doc_id").parquet(sink)
    // redeliver doc 9 (NOT 2: doc 9 entered state after 2's last screen,
    // so a re-screened 2 would legitimately mint a brand-new (2,9) pair) —
    // 9's re-screen yields only pairs the sink already holds
    Seq((9L, ts("2024-01-01 00:21:00"),
        "the quick brown fox jumps over the lazy dog near the river shore"))
      .toDF("doc_id", "ts", "text")
      .write.mode("append").parquet(src)
    drain()
    // partition columns come back at the END of the read schema — compare
    // sets, and assert the count did not grow (no duplicate pair rows)
    val post = spark.read.parquet(sink).select("doc_id", "corpus_id")
      .collect().map(r => (r.get(0).toString, r.getString(1)))
    assert(post.toSet == after && post.length == after.size,
      s"redelivery against a compacted (partition-subdir) sink duplicated rows: ${post.toSeq}")
  }

  test("mergeStream upserts micro-batches into a managed table by key") {
    val src = SparkTestSession.tmpDir("ms_src")
    val chk = SparkTestSession.tmpDir("ms_chk")
    val target = graft.adapter.PhysicalTable("graft__stream", "cdc_target",
      SparkTestSession.tmpDir("ms_tbl"))
    val b1 = Seq(("k1", ts("2024-01-01 00:01:00"), 10.0),
      ("k2", ts("2024-01-01 00:02:00"), 20.0),
      ("k2", ts("2024-01-01 00:03:00"), 21.0)) // same-batch dup: latest wins
      .toDF("key", "updated", "v")
    b1.write.mode("append").parquet(src)

    def drain(): Unit = Streaming.mergeStream(spark, src, b1.schema, target,
      keys = Seq("key"), orderCol = "updated", checkpointDir = chk)

    drain()
    val mat = new graft.adapter.SparkMaterializer(spark)
    val r1 = mat.read(target).collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(r1 == Map("k1" -> 10.0, "k2" -> 21.0))

    // CDC wave 2: k2 updated again, k3 new; k1 untouched survives the merge
    Seq(("k2", ts("2024-01-01 01:00:00"), 22.0),
        ("k3", ts("2024-01-01 01:01:00"), 30.0)).toDF("key", "updated", "v")
      .write.mode("append").parquet(src)
    drain()
    val r2 = mat.read(target).collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(r2 == Map("k1" -> 10.0, "k2" -> 22.0, "k3" -> 30.0))
    // idempotent: a drain with no new files changes nothing
    drain()
    assert(mat.read(target).count() == 3)
  }

  test("scd2Stream maintains type-2 history from a change stream") {
    val src = SparkTestSession.tmpDir("s2s_src")
    val chk = SparkTestSession.tmpDir("s2s_chk")
    val target = graft.adapter.PhysicalTable("graft__stream", "scd2_target",
      SparkTestSession.tmpDir("s2s_tbl"))
    val kind = graft.core.ModelKind.ScdType2ByTime(uniqueKey = Seq("id"),
      invalidateHardDeletes = false)
    val b1 = Seq((1, "a", ts("2024-01-01 00:00:00")), (2, "x", ts("2024-01-01 00:00:00")))
      .toDF("id", "st", "updated_at")
    b1.write.mode("append").parquet(src)

    def drain(): Unit = Streaming.scd2Stream(spark, src, b1.schema, target, kind, chk,
      executionTs = () => ts("2024-01-10 00:00:00"))

    drain()
    val mat = new graft.adapter.SparkMaterializer(spark)
    assert(mat.read(target).filter(col("valid_to").isNull).count() == 2)

    // change wave: id=1 updated → old row closes at the new updated_at,
    // id=2 absent → stays open (partial view, not a delete)
    Seq((1, "a2", ts("2024-01-03 00:00:00"))).toDF("id", "st", "updated_at")
      .write.mode("append").parquet(src)
    drain()
    val rows = mat.read(target).orderBy("id", "valid_from").collect()
      .map(r => (r.getInt(0), r.getString(1), Option(r.getTimestamp(4)).map(_.toString)))
    assert(rows.toSeq == Seq(
      (1, "a", Some("2024-01-03 00:00:00.0")),
      (1, "a2", None),
      (2, "x", None)))
    // replay-idempotent: an empty drain leaves history untouched
    drain()
    assert(mat.read(target).count() == 3)
    intercept[IllegalArgumentException] {
      Streaming.scd2Stream(spark, src, b1.schema, target,
        kind.copy(invalidateHardDeletes = true), chk)
    }
  }

  test("linkGraphStream: per-batch edge partitions, batch replay rewrites not doubles") {
    val src = SparkTestSession.tmpDir("lgstream_src")
    val sink = SparkTestSession.tmpDir("lgstream_sink")
    val chk = SparkTestSession.tmpDir("lgstream_chk")
    def pages(rows: (String, String)*) = rows.toDF("url", "html")
    val b1 = pages(
      ("https://a.com/1", "<a href=\"https://b.org/\">x</a>"),
      ("https://a.com/2", "<a href=\"https://b.org/p\">x</a><a href='https://c.net/'>y</a>"))
    val b2 = pages(("https://d.io/1", "<a href=\"https://a.com/\">back</a>"))
    b1.write.mode("append").parquet(src)
    def drain(): Unit =
      Streaming.linkGraphStream(spark, src, b1.schema, sink, chk)
    drain()
    b2.write.mode("append").parquet(src)
    drain()
    def edges() = graft.functions.Graph
      .compactEdges(spark.read.parquet(sink).drop("batch_id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = Set(("a.com", "b.org", 2L), ("a.com", "c.net", 1L), ("d.io", "a.com", 1L))
    assert(edges() == want)
    // the store equals the one-shot batch graph after compaction
    assert(edges() == graft.functions.Graph.linkGraph(b1.unionByName(b2))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet)
    // foreachBatch replay-after-failure: re-delivering batch 0 REWRITES
    // its own batch_id partition — weights must not double
    Streaming.linkGraphBatchWriter(sink, "url", "html")(b1, 0L)
    assert(edges() == want)
    // ... and a batch with the id already present but DIFFERENT content
    // (a retried partial write) fully replaces the stale partition
    Streaming.linkGraphBatchWriter(sink, "url", "html")(
      b1.filter(col("url") === "https://a.com/1"), 0L)
    assert(edges() == Set(("a.com", "b.org", 1L), ("d.io", "a.com", 1L)))
  }

  test("warcIngestStream: raw WARC files stream into the crawl intake") {
    val src = SparkTestSession.tmpDir("warcstream_src")
    val sink = SparkTestSession.tmpDir("warcstream_sink")
    val chk = SparkTestSession.tmpDir("warcstream_chk")
    def page(content: String, canonical: String = ""): Array[Byte] = {
      val c = if (canonical.isEmpty) ""
        else s"""<link rel="canonical" href="$canonical">"""
      s"""<html lang="en"><head><title>T</title>$c</head><body><p>$content</p></body></html>"""
        .getBytes("UTF-8")
    }
    def drain(): Unit = {
      val q = Streaming.warcIngestStream(spark, src, watermarkDelay = "1 hour")
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // file 1: a tracking-param alias pair (one normalized key) + a
    // canonical-declaring page
    val f1 = new java.io.ByteArrayOutputStream()
    f1.write(graft.functions.Warc.httpResponse("https://a.com/x?utm_source=f",
      "2024-01-01T00:01:00Z", "text/html; charset=UTF-8", page("alpha words")))
    f1.write(graft.functions.Warc.httpResponse("https://A.com/x",
      "2024-01-01T00:02:00Z", "text/html; charset=UTF-8", page("beta words")))
    f1.write(graft.functions.Warc.httpResponse("https://b.com/art?p=1",
      "2024-01-01T00:03:00Z", "text/html; charset=UTF-8",
      page("gamma words", canonical = "https://b.com/art")))
    java.nio.file.Files.write(java.nio.file.Paths.get(src, "f1.warc"),
      f1.toByteArray)
    drain()
    def keys() = spark.read.parquet(sink).select("url_key").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(keys() == Seq("https://a.com/x", "https://b.com/art"), keys().toString)
    // file 2: a re-fetch (state drops it) + a genuinely new page
    val f2 = new java.io.ByteArrayOutputStream()
    f2.write(graft.functions.Warc.httpResponse("https://a.com/x",
      "2024-01-01T00:09:00Z", "text/html; charset=UTF-8", page("refetch words")))
    f2.write(graft.functions.Warc.httpResponse("https://c.org/new",
      "2024-01-01T00:10:00Z", "text/html; charset=UTF-8", page("delta words")))
    java.nio.file.Files.write(java.nio.file.Paths.get(src, "f2.warc"),
      f2.toByteArray)
    drain()
    assert(keys() == Seq("https://a.com/x", "https://b.com/art",
      "https://c.org/new"), keys().toString)
    // extraction rode along: the new page carries its text and title
    val row = spark.read.parquet(sink)
      .filter(col("url_key") === "https://c.org/new")
      .select("title", "text", "doc_id").head()
    assert(row.getString(0) == "T" && row.getString(1) == "delta words")
    assert(row.getString(2).contains("f2.warc#")) // src#offset identity
  }

  test("crawlIngestStream: stateful URL dedup across drains, stateless extraction") {
    val src = SparkTestSession.tmpDir("crawl_src")
    val sink = SparkTestSession.tmpDir("crawl_sink")
    val chk = SparkTestSession.tmpDir("crawl_chk")
    def html(id: Long, content: String, canonical: String = ""): String = {
      val c = if (canonical.isEmpty) ""
        else s"""<link rel="canonical" href="$canonical">"""
      s"""<html lang="en"><head><title>T$id</title>$c</head><body><p>$content</p></body></html>"""
    }
    // batch 1: 1 and 2 are tracking-param aliases (same normalized key);
    // 3 declares a canonical
    val b1 = Seq(
      (1L, ts("2024-01-01 00:01:00"), "https://a.com/x?utm_source=f", html(1, "alpha words here")),
      (2L, ts("2024-01-01 00:02:00"), "https://A.com/x", html(2, "beta words here")),
      (3L, ts("2024-01-01 00:03:00"), "https://b.com/art?p=1", html(3, "gamma words here",
        canonical = "https://b.com/art")))
      .toDF("doc_id", "ts", "url", "html")
    b1.write.mode("append").parquet(src)
    def drain(): Unit = Streaming.runAvailableNow(spark, src, b1.schema,
      df => Streaming.crawlIngestStream(df, watermarkDelay = "1 hour"),
      sink, chk)
    drain()
    def keys() = spark.read.parquet(sink).select("doc_id", "url_key").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val k1 = keys()
    // one survivor per key: the a.com alias pair collapsed, 3 kept
    assert(k1.size == 2 && k1.values.toSet ==
      Set("https://a.com/x", "https://b.com/art"), k1.toString)
    // batch 2: a re-fetch of a.com/x (state drops it — within watermark),
    // a canonical alias of 3 under a different crawl URL, and a new page
    Seq(
      (4L, ts("2024-01-01 00:09:00"), "https://a.com/x", html(4, "refetch words")),
      (5L, ts("2024-01-01 00:10:00"), "https://b.com/art?print=1", html(5, "alias words",
        canonical = "https://b.com/art")),
      (6L, ts("2024-01-01 00:11:00"), "https://c.org/new", html(6, "delta words here")))
      .toDF("doc_id", "ts", "url", "html")
      .write.mode("append").parquet(src)
    drain()
    val k2 = keys()
    assert(k2.size == 3 && k2.contains(6L), k2.toString)
    assert(!k2.contains(4L) && !k2.contains(5L),
      s"cross-drain URL/canonical dedup state failed: $k2")
    // extraction rode along statelessly; the crawl URL survives so sink
    // consumers can compute the quota domain exactly as the batch recipe
    val row6 = spark.read.parquet(sink).filter(col("doc_id") === 6)
      .select("title", "lang_decl", "text", "url").head()
    assert(row6.getString(0) == "T6" && row6.getString(1) == "en" &&
      row6.getString(2) == "delta words here" &&
      row6.getString(3) == "https://c.org/new")
  }
}
