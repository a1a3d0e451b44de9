package graft

import org.scalatest.funsuite.AnyFunSuite

/** Persisted-RDD hygiene gate (r15 verdict task 1): every SparkEntry entry
  * must leave the block manager and the temp-view catalog exactly as it
  * found them. The steady-state deployment of this engine is a LONG-LIVED
  * driver running ingest rounds forever — any entry that parks a cached
  * frame per call grows the block manager without bound.
  *
  * Two leak classes, distinguished by how they age:
  *
  *  - `Dataset.persist()` without a guaranteed `unpersist`: the session
  *    CacheManager holds a strong reference, so the blocks survive GC
  *    FOREVER. Detected here as cached RDDs that refuse to drain after
  *    the result frame is dropped and the ContextCleaner runs.
  *  - `localCheckpoint` blocks: RDD-level cache, reclaimed by the
  *    ContextCleaner once unreachable. A returned checkpointed result is
  *    legitimate — it must simply DRAIN once the caller drops it, which
  *    is exactly what the GC-poll here proves.
  *
  * The assertion therefore is: after running an entry, dropping its frame,
  * and giving the cleaner a GC'd grace window, `getPersistentRDDs` is
  * empty — a CacheManager-pinned persist can never pass, a GC-managed
  * checkpoint always does. Temp views are snapshot-compared per entry.
  */
class CacheHygieneSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def cachedRdds: Seq[String] =
    spark.sparkContext.getPersistentRDDs.toSeq.sortBy(_._1).map {
      // rdd.name for a checkpointed frame is the full multi-line plan tree —
      // keep the first line only or a single leak floods the report
      case (id, rdd) =>
        val nm = Option(rdd.name).getOrElse(rdd.toString)
          .linesIterator.take(1).mkString.take(120)
        s"rdd#$id($nm)"
    }

  /** The base-table registrations (QueryUtil.registerAll/registerReferenced)
    * are an ALLOWED residue: a fixed set of 10 idempotent
    * createOrReplaceTempView names — the Plane-A SQL surface shared across
    * entries, bounded by construction. Everything else must drop. */
  private val allowedViews = graft.queries.QueryUtil.tables.toSet

  private def tempViews: Set[String] =
    spark.catalog.listTables().collect()
      .filter(_.isTemporary).map(_.name).toSet -- allowedViews

  /** Drop unreachable cached blocks: the ContextCleaner reclaims via weak
    * references, so force collections and poll. Returns true once the
    * block manager holds nothing beyond `baseline`.
    *
    * Why a baseline and not "empty": in a full-suite run, earlier suites
    * in the SAME JVM may hold live references to cached RDDs (running
    * streaming queries, server singletons) that clearCache cannot remove
    * and GC legitimately cannot collect. Those are theirs; this gate is
    * about what THE ENTRIES add — measured as the delta against the
    * baseline snapshot taken after the initial clearCache. Standalone runs
    * have an empty baseline, so the check degrades to "empty" there. */
  private def drained(timeoutMs: Long, baseline: Set[Int] = Set.empty): Boolean = {
    def extra = spark.sparkContext.getPersistentRDDs.keySet -- baseline
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (extra.nonEmpty && System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(200)
    }
    extra.isEmpty
  }

  private def cachedIds: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Run in a method so the frame reference is stack-local and genuinely
    * unreachable when the caller polls the cleaner. collect(), not count():
    * count() lets the optimizer prune every column, skipping the exact
    * expression work (and cache materialization) the driver's Verify dump
    * performs. */
  private def runEntry(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Int =
    fn(spark, sf).collect().length

  test("releaseOnDrop frees a multi-consumer persist once the result drops") {
    import spark.implicits._
    spark.catalog.clearCache()
    drained(10000)
    val baseline = cachedIds
    // run in a method so result/derived are stack-local and collectible
    def run(): Unit = {
      val docs = Seq((1L, "a b. a b. c d"), (2L, "a b. x y")).toDF("doc_id", "text")
      val out = graft.functions.Dedup.paragraphDedup(docs, sep = ". ")
      // a DERIVED frame must keep the cache alive while in use
      val derived = out.filter(org.apache.spark.sql.functions.col("n_kept") >= 0)
      assert(derived.count() == 2)
      assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
        "the paras persist barrier is gone — releaseOnDrop released too early " +
          "or paragraphDedup stopped persisting")
    }
    run()
    assert(drained(20000, baseline),
      s"releaseOnDrop never fired after the result became unreachable: $cachedRdds")
  }

  test("every entry leaves no cached RDDs and no temp views behind") {
    // baseline: clear whatever earlier suites in this JVM left cached;
    // what will not drain is pinned by THEIR live references and is
    // excluded (delta semantics — see drained())
    spark.catalog.clearCache()
    drained(10000)
    val baseline = cachedIds
    if (baseline.nonEmpty)
      info(s"excluding ${baseline.size} baseline RDD(s) pinned by earlier suites: $cachedRdds")
    val baseViews = tempViews
    val leaks = scala.collection.mutable.ArrayBuffer.empty[String]
    // incremental report file: a 250-entry failure message overflows every
    // log window — the full list survives here even if the assert output
    // is truncated
    val report = java.nio.file.Paths.get("target/cache_hygiene_report.txt")
    java.nio.file.Files.createDirectories(report.getParent)
    def note(line: String): Unit = {
      leaks += line
      java.nio.file.Files.write(report, (line + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    java.nio.file.Files.deleteIfExists(report)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // an entry that THROWS here (full-suite session-state interference,
      // or a genuine break) must name itself in the report — correctness
      // is the oracle gate's job, this gate only cares about residue
      try runEntry(fn)
      catch { case e: Throwable =>
        note(s"$name threw in the hygiene sweep: " +
          s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(200)}")
      }
      if ((cachedIds -- baseline).nonEmpty && !drained(15000, baseline))
        note(s"$name left cached RDDs: ${cachedRdds.mkString(", ")}")
      val extraViews = tempViews -- baseViews
      if (extraViews.nonEmpty) {
        note(s"$name left temp views: ${extraViews.mkString(", ")}")
        extraViews.foreach(spark.catalog.dropTempView(_)) // don't cascade the blame
      }
      // a pinned leak poisons every later entry's check — clear so each
      // entry is judged on its own residue
      if ((cachedIds -- baseline).nonEmpty) {
        spark.catalog.clearCache()
        drained(5000, baseline)
      }
    }
    assert(leaks.isEmpty,
      s"cache-hygiene leaks (CacheManager-pinned persists or stray temp views; " +
        s"full list in $report):\n  " + leaks.mkString("\n  "))
  }
}
