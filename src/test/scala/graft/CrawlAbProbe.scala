package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A/B adjudication probe for the r16→r15 td_crawl_ingest delta (VERDICT r16
  * "what's wrong" #1): the hypothesis is that r15's quiet 1.17 s median was
  * CACHE-AIDED — crawlIngest's `ex`/`kept` persists leaked to the session
  * CacheManager (strong refs, GC-immune), so bench reps 2–3 plan-matched
  * rep 1's cached extraction and the median-of-3 reported the cached cost.
  * r16's Barrier.releaseOnDrop frees the helpers once the result is dropped,
  * making every rep pay the true extraction cost.
  *
  * Two arms over the SAME entry (td_crawl_ingest at the given SF):
  *  - HONEST (r16 shape): result dropped after each rep, GC forced so the
  *    Cleaner releases the persists → every rep recomputes.
  *  - LEAK (r15 shape): each rep's result is retained in a buffer, pinning
  *    the Cleaner registrant → the persists stay in the CacheManager and
  *    reps 2–3 read rep 1's cache.
  * Expected signature if the hypothesis holds: HONEST ≈ [T, T, T];
  * LEAK ≈ [T, fast, fast] with fast ≪ T. Output: one JSON line.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 Test/runMain graft.CrawlAbProbe
  */
object CrawlAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries("td_crawl_ingest")

    // codegen/parquet warmup at the smallest SF (Bench.scala convention)
    val warmDir = sfDir.replaceAll("sf[0-9.]+$", "sf0.001")
    if (warmDir != sfDir && new java.io.File(warmDir).exists()) q(spark, warmDir).count()

    def drain(): Unit = {
      // force the Cleaner to run releaseOnDrop actions, then drop whatever
      // is still registered in the CacheManager — a clean slate per arm
      System.gc(); Thread.sleep(400)
      spark.sharedState.cacheManager.clearCache()
    }
    def rep(): (Double, DataFrame) = {
      val t0 = System.nanoTime()
      val df = q(spark, sfDir)
      df.count()
      ((System.nanoTime() - t0) / 1e9, df)
    }
    // honest form: the frame must die with THIS stack frame — returning it
    // (even to a discarded tuple slot) can pin it in an interpreted caller
    // frame's dead local until the slot is overwritten, which reads as a
    // leak-shaped sample
    def repDropped(): Double = rep()._1

    drain()
    val honest = (0 until 3).map { _ =>
      val t = repDropped() // result NOT retained → next GC releases ex/kept
      // poll until the Cleaner actually fires — a single GC+sleep can lose
      // the race and let the next rep read the not-yet-released cache,
      // which would contaminate the honest arm with a leak-shaped sample
      var polls = 0
      while (spark.sparkContext.getPersistentRDDs.nonEmpty && polls < 20) {
        System.gc(); Thread.sleep(250); polls += 1
      }
      require(spark.sparkContext.getPersistentRDDs.isEmpty,
        "honest arm: persists did not drain between reps")
      t
    }

    drain()
    val retained = scala.collection.mutable.Buffer[DataFrame]()
    val leak = (0 until 3).map { _ =>
      val (t, df) = rep()
      retained += df // r15 shape: the persists stay plan-matchable
      System.gc(); Thread.sleep(400) // same GC pressure; Cleaner CAN'T fire
      t
    }
    drain(); retained.clear()

    def j(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    println(s"""{"probe":"crawl_ab","sf":"$sfDir","honest_reps":${j(honest)},"leak_reps":${j(leak)},"honest_median":${f"${honest.sorted.apply(1)}%.3f"},"leak_median":${f"${leak.sorted.apply(1)}%.3f"}}""")
    spark.stop()
  }
}
