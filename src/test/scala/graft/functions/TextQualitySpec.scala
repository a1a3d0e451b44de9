package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class TextQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("repetitionSignals: duplicate and top-token fractions at word level") {
    val docs = Seq(
      (1L, "spam spam spam spam"),          // 4 toks, 1 distinct
      (2L, "all words here are unique")).toDF("doc_id", "text")
    val out = TextFunctions.repetitionSignals(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(out == Set(
      (1L, 4L, 1L, 0.75, 1.0),
      (2L, 5L, 5L, 0.0, 0.2)))
  }

  test("repetitionSignals n=2 measures bigram repetition") {
    // "a b a b a" → bigrams: "a b","b a","a b","b a" → 4 toks, 2 distinct
    val docs = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    val Array(r) = TextFunctions.repetitionSignals(docs, n = 2).collect()
    assert((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)) ==
      ((4L, 2L, 0.5, 0.5)))
  }

  test("scrubPii redacts emails, phones, SSNs, cards, and IPv4s; counts match") {
    val text = "mail bob.smith+x@corp.example.org or call +1-555-123-4567 " +
      "ssn 123-45-6789 card 4111-1111-1111-1111 " +
      "from 192.168.0.1 but not v1.2 or 1.2.3.4.5 leftover"
    val df = Seq(text).toDF("text")
      .select(TextFunctions.scrubPii(col("text")).as("s") +:
        TextFunctions.piiCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
    val r = df.collect()(0)
    val scrubbed = r.getString(0)
    assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<PHONE>") &&
      scrubbed.contains("<SSN>") && scrubbed.contains("<CARD>") && scrubbed.contains("<IP>"))
    assert(!scrubbed.contains("@") && !scrubbed.contains("555-123") &&
      !scrubbed.contains("123-45") && !scrubbed.contains("4111"))
    assert(scrubbed.contains("v1.2"))  // not an IP
    // columns: s, n_emails(1), n_phones(2), n_ssns(3), n_cards(4), n_ips(5)
    assert(r.getInt(1) == 1 && r.getInt(2) == 1 && r.getInt(3) == 1 && r.getInt(4) == 1)
    // 1.2.3.4.5: the first four octets match the IPv4 shape — redacted;
    // documented behavior of the \b-bounded pattern ("\b" sits between 4 and .5)
    assert(r.getInt(5) >= 1)
    // a phone tail must never half-match as an SSN (scrub-order mirror)
    val phoneOnly = Seq("call +1-555-123-4567 now").toDF("text")
      .select(TextFunctions.piiCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect()(0)
    assert(phoneOnly.getInt(2) == 0 && phoneOnly.getInt(3) == 0) // ssn, cards
  }

  test("scrubPii leaves clean text untouched") {
    val df = Seq("perfectly ordinary text with numbers 12 34").toDF("text")
      .select(TextFunctions.scrubPii(col("text")).as("s"))
    assert(df.collect()(0).getString(0) ==
      "perfectly ordinary text with numbers 12 34")
  }

  test("chunks: overlapping windows cover the text; short docs get one chunk") {
    val docs = Seq(
      (1L, (1 to 25).map(i => s"w$i").mkString(" ")), // 25 words
      (2L, "just three words"),
      (3L, "")).toDF("doc_id", "text")
    val c = TextFunctions.chunks(docs, chunkWords = 10, overlapWords = 4)
      .orderBy("doc_id", "chunk_idx").collect()
    // doc 1: step 6, last start index = ceil((25-10)/6) = 3 → chunks at 0,6,12,18
    val d1 = c.filter(_.getLong(0) == 1L)
    assert(d1.length == 4)
    assert(d1(0).getString(2).startsWith("w1 w2") && d1(0).getInt(3) == 10)
    // consecutive chunks overlap by 4 words
    assert(d1(1).getString(2).startsWith("w7 w8"))
    assert(d1.last.getInt(3) == 25 - 18) // tail chunk is short
    // short and empty docs: exactly one chunk
    assert(c.count(_.getLong(0) == 2L) == 1)
    assert(c.count(_.getLong(0) == 3L) == 1)
    assert(c.filter(_.getLong(0) == 3L).head.getInt(3) == 0)
  }

  test("classifierScore is sigmoid of the weighted feature sum") {
    val docs = Seq((1L, "the cat and the dog"), (2L, "x")).toDF("doc_id", "text")
    val scored = docs.select(col("doc_id"),
      TextFunctions.classifierScore(col("text"),
        Map("n_words" -> 0.5, "stopword_hits" -> 1.0), bias = -2.0).as("s"))
      .orderBy("doc_id").collect()
    // doc 1: n_words=5, stopword_hits=3 (the, and, the) → z = -2+2.5+3 = 3.5
    assert(math.abs(scored(0).getDouble(1) - 1.0 / (1.0 + math.exp(-3.5))) < 1e-4)
    // doc 2: n_words=1, hits=0 → z = -1.5
    assert(math.abs(scored(1).getDouble(1) - 1.0 / (1.0 + math.exp(1.5))) < 1e-4)
    // monotone: more stopword-y text scores strictly higher
    assert(scored(0).getDouble(1) > scored(1).getDouble(1))
  }

  test("shardAssign is a deterministic balanced permutation") {
    val docs = (1L to 200L).toDF("doc_id")
    val a = Sampling.shardAssign(docs, "doc_id", nShards = 4, salt = "t").collect()
    val b = Sampling.shardAssign(docs, "doc_id", nShards = 4, salt = "t").collect()
    // deterministic: identical assignment across runs
    assert(a.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1).toSeq ==
      b.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1).toSeq)
    // every row lands in exactly one shard; positions are 0..n-1 per shard
    assert(a.length == 200)
    a.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq == (0 until rows.length))
    }
    // hash-balanced: no shard is pathologically empty or dominant
    val sizes = a.groupBy(_.getInt(1)).values.map(_.length)
    assert(sizes.size == 4 && sizes.min > 20 && sizes.max < 80)
  }

  test("minhashLsh maxBucketSize caps hot-bucket pair blowup") {
    // 30 near-identical docs: all land in the same band buckets → 435 pairs
    // unbounded; a bucket cap of 10 suppresses the hot buckets entirely
    val docs = (1L to 30L).map(i =>
      (i, s"the quick brown fox jumps over the lazy dog again and again $i"))
      .toDF("doc_id", "text")
    val unbounded = Dedup.minhashLsh(docs, shingleN = 2, numHashes = 8,
      bands = 2, threshold = 0.1).count()
    val capped = Dedup.minhashLsh(docs, shingleN = 2, numHashes = 8,
      bands = 2, threshold = 0.1, maxBucketSize = Some(10)).count()
    assert(unbounded > 100)
    assert(capped < unbounded)
  }

  test("substringSpans: exact char offsets of maximal cross-doc duplicated regions") {
    val shared = "The quick brown fox jumps over the lazy dog near the river bank today."
    val docs = Seq(
      (1L, s"AAA $shared BBB"),
      (2L, s"CCCCC $shared DDDD"),
      (3L, "totally unrelated text with no duplicated windows at all here"))
      .toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs, minLen = 30).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the shared sentence PLUS its flanking spaces (both docs surround it
    // with " ") is the one duplicated region: exact 0-based offset and
    // length per carrier doc; doc 3 clean
    assert(spans.toSet == Set(
      (1L, 3L, shared.length + 2L),
      (2L, 5L, shared.length + 2L)))
  }

  test("capped LSH on the sf0.01 corpus: subset of uncapped, recall >= 0.7") {
    // pins the 100 TB safety valve's behavior on real data: dropping hot
    // band buckets (cap=3, the td_minhash_lsh_capped config) loses only
    // candidates other bands mostly still catch — never invents pairs
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def pairs(cap: Option[Int]) =
      Dedup.minhashLsh(docs, shingleN = 3, numHashes = 16, bands = 4,
        threshold = 0.3, maxBucketSize = cap)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(None)
    val capped = pairs(Some(3))
    assert(capped.subsetOf(uncapped))
    assert(capped.size >= 0.7 * uncapped.size,
      s"capped recall ${capped.size}/${uncapped.size} below 0.7")
  }

  test("leakSafeSplit co-assigns near-dup pairs to one split") {
    val docs = (1L to 100L).toDF("doc_id")
    // chain 1-2-3 is one component; 10-11 another; rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Sampling.leakSafeSplit(docs, pairs, "doc_id",
      Seq("train" -> 0.5, "test" -> 0.5), salt = "x").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 100)
    assert(out(1L) == out(2L) && out(2L) == out(3L))
    assert(out(10L) == out(11L))
    // both splits actually used across the singletons
    assert(out.values.toSet == Set("train", "test"))
  }

  test("tokenBudgetMix keeps ~budget tokens per group, caps at 1, drops unbudgeted") {
    val rows = (1L to 300L).map(i =>
      (i, if (i <= 100) "a" else if (i <= 200) "b" else "c", 10L))
    val docs = rows.toDF("doc_id", "source", "toks")
    val out = Sampling.tokenBudgetMix(docs, "doc_id", "source", col("toks"),
      Map("a" -> 500L, "b" -> 100000L), salt = "bm")
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // a: budget 500 of 1000 → ~half kept; b: budget exceeds size → all kept
    assert(bySrc("b") == 100L)
    assert(bySrc("a") > 30 && bySrc("a") < 70)
    // c has no budget → dropped entirely
    assert(!bySrc.contains("c"))
  }

  test("winnowing guarantee: shared substrings >= w+k-1 share a fingerprint") {
    import spark.implicits._
    val r = new scala.util.Random(7)
    def randText(n: Int) = (0 until n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    // k=5, w=4: any shared run of >= 8 chars must yield a common fingerprint
    val shared = randText(30)
    val docs = Seq(
      (1L, randText(40) + shared + randText(40)),
      (2L, randText(25) + shared + randText(55)),
      (3L, randText(120))) // no planted overlap
      .toDF("doc_id", "text")
    val fps = docs.select($"doc_id",
        graft.functions.TextFunctions.winnowFingerprints($"text", k = 5, w = 4).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    assert((fps(1L).toSet intersect fps(2L).toSet).nonEmpty,
      "planted 30-char overlap produced no shared fingerprint")
    // fingerprints are sorted distinct
    fps.values.foreach(f => assert(f == f.distinct.sorted))
    // determinism
    val again = docs.select(
        graft.functions.TextFunctions.winnowFingerprints($"text", 5, 4).as("fps"))
      .as[Seq[Long]].collect()
    assert(again.toSeq == docs.select(
      graft.functions.TextFunctions.winnowFingerprints($"text", 5, 4).as("fps"))
      .as[Seq[Long]].collect().toSeq)
  }

  test("incrementalExact keeps only batch docs new to corpus and batch") {
    val corpus = Seq((1L, "seen before"), (2L, "also  seen")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "Seen Before"),       // normalizes to a corpus key → dropped
      (11L, "fresh content"),     // new → kept
      (12L, "fresh content"),     // within-batch dup → only 11 survives
      (13L, "also seen")          // whitespace-normalized corpus dup → dropped
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalExact(corpus, incoming)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(11L))
  }

  test("kAnonymityViolations: groups under k flagged, NULL QIs group together") {
    val rows = Seq(
      (1L, "en", Some("a")), (2L, "en", Some("a")), (3L, "en", Some("a")),
      (4L, "de", Some("b")),                      // singleton → violation
      (5L, "fr", None), (6L, "fr", None)          // NULLs group: size 2
    ).toDF("id", "lang", "src")
    val v3 = Curation.kAnonymityViolations(rows, Seq("lang", "src"), k = 3)
      .collect().map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2))).toSet
    // (en,a) has 3 ≥ k → safe; (de,b)=1 and (fr,NULL)=2 violate
    assert(v3 == Set(("de", Some("b"), 1L), ("fr", None, 2L)))
    assert(Curation.kAnonymityViolations(rows, Seq("lang", "src"), k = 2)
      .count() == 1) // only the singleton
    intercept[IllegalArgumentException](
      Curation.kAnonymityViolations(rows, Nil, k = 3))
    intercept[IllegalArgumentException](
      Curation.kAnonymityViolations(rows, Seq("lang"), k = 1))
  }

  test("lDiversityViolations: homogeneous groups flagged regardless of size") {
    val rows = Seq(
      (1L, "a", "en"), (2L, "a", "en"), (3L, "a", "en"),  // big but homogeneous
      (4L, "b", "en"), (5L, "b", "de"),                   // diverse enough (l=2)
      (6L, "c", null.asInstanceOf[String])                // null ≠ diversity
    ).toDF("id", "src", "lang")
    val v = Curation.lDiversityViolations(rows, Seq("src"), "lang", l = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(v == Set(("a", 3L, 1L), ("c", 1L, 0L)))
  }

  test("incrementalExactBloom is exact for any fpp (Bloom only screens)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter($"doc_id" <= 30)
    val batch = docs.filter($"doc_id" > 30)
    val exact = Dedup.incrementalExact(corpus, batch)
      .collect().map(_.getLong(0)).toSet
    // coarse filter (high fpp → many maybe-dups take the confirm path) and
    // a fine one both land on the exact result
    for (fpp <- Seq(0.5, 0.01)) {
      val got = Dedup.incrementalExactBloom(corpus, batch, fpp = fpp)
        .collect().map(_.getLong(0)).toSet
      assert(got == exact, s"fpp=$fpp diverged from exact")
    }
    // empty corpus: everything in the batch is definitely new
    val none = Dedup.incrementalExactBloom(corpus.limit(0), batch)
      .count()
    assert(none == batch.select(
      graft.functions.TextFunctions.contentKey($"text")).distinct().count())
  }

  test("incrementalExactBloomCached: steady-state batch pays zero corpus passes") {
    import graft.adapter.{DirVersionFormat, PhysicalTable}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // corpus as a TableFormat table — its VERSION is the cache token, so the
    // filter rebuilds exactly when the corpus changes
    val root = java.nio.file.Files.createTempDirectory("bloom_corpus").toString
    val cacheDir = java.nio.file.Files.createTempDirectory("bloom_cache").toString
    val fmt = new DirVersionFormat(spark)
    val t = PhysicalTable("graft__test", "bloom_corpus", root)
    fmt.createOrReplace(t, docs.filter($"doc_id" <= 300))
    def corpus = fmt.read(t)
    def tokenNow = s"${t.root}@v${fmt.versions(t).last}"
    val token = tokenNow
    val corpusRows = corpus.count()
    // expectedKeys from parquet FOOTERS — metadata only, no scan, so a cache
    // miss costs exactly ONE corpus pass (the filter treeAggregate)
    val expected = Dedup.parquetRowCount(spark, fmt.currentDataDir(t).get)
    assert(expected.contains(corpusRows), s"footer count $expected != $corpusRows")

    // records-read listener: the evidence the steady-state batch never
    // rescans the corpus (listener events are async — drain via waitUntilEmpty)
    val recordsRead = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        recordsRead.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    def measured[A](f: => A): (A, Long) = {
      Thread.sleep(300) // drain in-flight listener events from earlier work
      spark.sparkContext.addSparkListener(listener); recordsRead.set(0L)
      try { val r = f; Thread.sleep(300); (r, recordsRead.get()) }
      finally spark.sparkContext.removeSparkListener(listener)
    }

    // batch 1 (cache MISS): builds + persists the filter — one corpus pass
    val batch1 = docs.filter($"doc_id" > 300 && $"doc_id" <= 350)
    val (r1, read1) = measured {
      Dedup.incrementalExactBloomCached(corpus, batch1, cacheDir, token,
        expectedKeys = expected).collect().map(_.getLong(0)).toSet
    }
    assert(r1 == Dedup.incrementalExact(corpus, batch1)
      .collect().map(_.getLong(0)).toSet, "cached diverged from exact on miss")
    // miss cost = filter build (1 corpus pass) + confirm (batch1 has true
    // dups, 1 more pass) + the batch re-reads of the union branches — a few
    // corpus passes, never corpus×batch
    assert(read1 < 8 * corpusRows,
      s"cache miss read $read1 records — not O(corpus)")

    // batch 2 (cache HIT, all-new content): ZERO corpus passes — records
    // read must be bounded by the BATCH, nowhere near the corpus size.
    // Materialized to its own parquet so recordsRead attributes cleanly
    // (filters over the shared documents file read all its row groups).
    val b2dir = java.nio.file.Files.createTempDirectory("bloom_b2").toString
    docs.filter($"doc_id" > 350 && $"doc_id" <= 400)
      .withColumn("text", concat($"text", lit(" entirely-novel-suffix-xyzzy")))
      .write.mode("overwrite").parquet(b2dir)
    val batch2 = spark.read.parquet(b2dir)
    val batch2Rows = batch2.count()
    val (r2, read2) = measured {
      Dedup.incrementalExactBloomCached(corpus, batch2, cacheDir, token,
        expectedKeys = expected).count()
    }
    assert(r2 == batch2.select(TextFunctions.contentKey($"text")).distinct().count())
    assert(read2 <= 3 * batch2Rows,
      s"steady-state batch read $read2 records (corpus=$corpusRows, batch=$batch2Rows) — corpus was rescanned")

    // batch with a TRUE duplicate: the confirm path scans the corpus once
    // and the result is still exact
    val batch3 = docs.filter($"doc_id" > 350 && $"doc_id" <= 400)
    val exact3 = Dedup.incrementalExact(corpus, batch3)
      .collect().map(_.getLong(0)).toSet
    val got3 = Dedup.incrementalExactBloomCached(corpus, batch3, cacheDir, token,
      expectedKeys = expected).collect().map(_.getLong(0)).toSet
    assert(got3 == exact3, "confirm path diverged from exact")

    // corpus version moves → new token → filter rebuilds and stays exact
    fmt.createOrReplace(t, corpus.unionByName(batch1.select(corpus.columns.map(col): _*)))
    val token3 = tokenNow
    assert(token3 != token, "replace must roll the version")
    val exact4 = Dedup.incrementalExact(fmt.read(t), batch3)
      .collect().map(_.getLong(0)).toSet
    val got4 = Dedup.incrementalExactBloomCached(fmt.read(t), batch3, cacheDir, token3,
      expectedKeys = Dedup.parquetRowCount(spark, fmt.currentDataDir(t).get))
      .collect().map(_.getLong(0)).toSet
    assert(got4 == exact4, "rebuilt filter diverged from exact")
    fmt.drop(t)
  }

  test("incrementalExactBloomSharded: S=3 exactness, zero corpus passes on hit") {
    import java.nio.file.Files
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // corpus on its own parquet so listener recordsRead attributes cleanly
    val corpusDir = Files.createTempDirectory("shbloom_corpus").toString
    docs.filter($"doc_id" <= 300).write.mode("overwrite").parquet(corpusDir)
    val corpus = spark.read.parquet(corpusDir)
    val corpusRows = corpus.count()
    val cacheDir = Files.createTempDirectory("shbloom_cache").toString
    val token = "shard-spec@v1"

    val recordsRead = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        recordsRead.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    def measured[A](f: => A): (A, Long) = {
      Thread.sleep(300)
      spark.sparkContext.addSparkListener(listener); recordsRead.set(0L)
      try { val r = f; Thread.sleep(300); (r, recordsRead.get()) }
      finally spark.sparkContext.removeSparkListener(listener)
    }

    // batch 1 (cache MISS): mixed true-dups + new rows — must equal the
    // plain anti-join exactly; the build is ONE corpus pass (plus confirm)
    val batch1 = docs.filter($"doc_id" > 280 && $"doc_id" <= 350)
    val exact1 = Dedup.incrementalExact(corpus, batch1)
      .collect().map(_.getLong(0)).toSet
    val (got1, read1) = measured {
      Dedup.incrementalExactBloomSharded(corpus, batch1, cacheDir, token,
        shards = 3, expectedKeys = Some(corpusRows))
        .collect().map(_.getLong(0)).toSet
    }
    assert(got1 == exact1, "sharded screen diverged from incrementalExact on miss")
    assert(read1 < 8 * corpusRows, s"cache miss read $read1 — not O(corpus)")

    // the published layout: per-shard filter files + meta written last
    val files = new java.io.File(cacheDir).listFiles().map(_.getName).toSet
    assert(files.exists(_.matches(".*\\.s3-\\d+\\.bloom")), files.toString)
    val meta = files.find(_.endsWith(".shardmeta"))
    assert(meta.isDefined, files.toString)
    assert(new String(Files.readAllBytes(
      java.nio.file.Paths.get(cacheDir, meta.get)), "UTF-8").trim == "3")

    // batch 2 (cache HIT, all-new): ZERO corpus passes — reads bounded by
    // the batch, nowhere near corpusRows
    val b2dir = Files.createTempDirectory("shbloom_b2").toString
    docs.filter($"doc_id" > 350 && $"doc_id" <= 400)
      .withColumn("text", concat($"text", lit(" sharded-novel-suffix-qwfp")))
      .write.mode("overwrite").parquet(b2dir)
    val batch2 = spark.read.parquet(b2dir)
    val batch2Rows = batch2.count()
    val (r2, read2) = measured {
      Dedup.incrementalExactBloomSharded(corpus, batch2, cacheDir, token,
        shards = 3, expectedKeys = Some(corpusRows)).count()
    }
    assert(r2 == batch2Rows)
    assert(read2 <= 3 * batch2Rows,
      s"steady-state sharded batch read $read2 records (corpus=$corpusRows) — corpus was rescanned")

    // the GENERIC cached entry point follows the published sharded layout
    // (no shards argument) and stays exact on a true-dup batch
    val batch3 = docs.filter($"doc_id" > 250 && $"doc_id" <= 320)
    val exact3 = Dedup.incrementalExact(corpus, batch3)
      .collect().map(_.getLong(0)).toSet
    val got3 = Dedup.incrementalExactBloomCached(corpus, batch3, cacheDir, token,
      expectedKeys = Some(corpusRows)).collect().map(_.getLong(0)).toSet
    assert(got3 == exact3, "generic entry point diverged on the sharded layout")

    // empty shards: 1-row corpus, S=5 — most shards have no filter file;
    // batch rows routed to fileless shards must come out definitely-new
    val tinyDir = Files.createTempDirectory("shbloom_tiny").toString
    docs.filter($"doc_id" === 1).write.mode("overwrite").parquet(tinyDir)
    val tiny = spark.read.parquet(tinyDir)
    val batch4 = docs.filter($"doc_id" <= 40)
    val exact4 = Dedup.incrementalExact(tiny, batch4)
      .collect().map(_.getLong(0)).toSet
    val got4 = Dedup.incrementalExactBloomSharded(tiny, batch4,
      cacheDir, "shard-spec-tiny@v1", shards = 5, expectedKeys = Some(1L))
      .collect().map(_.getLong(0)).toSet
    assert(got4 == exact4, "fileless shards broke exactness")
  }

  test("tClosenessViolations: single group has TVD 0; null sensitive out of scope") {
    // one QI group = the group IS the global distribution → TVD exactly 0,
    // never flagged at any t
    val single = Seq(("g", "s1"), ("g", "s2"), ("g", "s1")).toDF("q", "sv")
    assert(Curation.tClosenessViolations(single, Seq("q"), "sv", t = 0.001).isEmpty)
    // null sensitive rows don't shift either distribution: group b is all
    // nulls → no in-scope rows → not flagged (and not crashed)
    val nulls = Seq(("a", Option("s1")), ("a", Option("s2")),
      ("b", Option.empty[String]), ("b", Option.empty[String])).toDF("q", "sv")
    val v = Curation.tClosenessViolations(nulls, Seq("q"), "sv", t = 0.1)
    assert(v.isEmpty)
    // agreement with the SQL audit template on a skewed case:
    // global s1=2/3 s2=1/3; a splits 2-2 (TVD 1/6), b is all-s1 (TVD 1/3)
    val skew = Seq(("a", "s1"), ("a", "s2"), ("a", "s1"), ("a", "s2"),
      ("b", "s1"), ("b", "s1")).toDF("q", "sv")
    skew.createOrReplaceTempView("tc_skew")
    val fromSql = graft.audits.Audits.run(spark, "t_closeness", "tc_skew",
      Map("quasi_identifiers" -> "q", "column" -> "sv", "t" -> "0.2"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val fromDf = Curation.tClosenessViolations(skew, Seq("q"), "sv", t = 0.2)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(fromSql == fromDf && fromDf.map(_._1) == Set("b"))
    // empty in-scope corpus flags nothing
    assert(Curation.tClosenessViolations(
      nulls.filter(col("sv").isNull), Seq("q"), "sv", t = 0.1).isEmpty)
  }

  test("tfidfKeywords ranks corpus-weighted terms, rare beats common") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "durian")).toDF("doc_id", "text")
    val out = TextFunctions.tfidfKeywords(docs, topK = 2)
      .orderBy("doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // N=3; idf = ln(4/(df+1)): apple df=1 → ln2, banana df=2 → ln(4/3)
    assert(out.toSeq == Seq(
      (1L, 1, "apple", 2L, 1L, 1.386294),   // 2·ln2
      (1L, 2, "banana", 1L, 2L, 0.287682),  // ln(4/3)
      (2L, 1, "cherry", 1L, 1L, 0.693147),
      (2L, 2, "banana", 1L, 2L, 0.287682),
      (3L, 1, "durian", 1L, 1L, 0.693147)))
  }

  test("bigramLogProb: add-one conditional probs; <2-token docs drop") {
    val docs = Seq((1L, "a b a"), (2L, "b a"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = TextFunctions.bigramLogProb(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // c1: a=3 b=2, V=3 (a,b,solo); c2: (a,b)=1 (b,a)=2
    // p(b|a)=(1+1)/(3+3)=1/3, p(a|b)=(2+1)/(2+3)=0.6
    val l1 = math.log10(1.0 / 3); val l2 = math.log10(0.6)
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(out.toSeq == Seq(
      (1L, 2L, r4((l1 + l2) / 2)), (2L, 1L, r4(l2))))
  }
}
