package graft

import org.apache.spark.sql.functions._
import graft.functions._

/** Scratch decomposition of the r17 heavy bench queries into sub-chains
  * (test scope): times each stage of a pipeline separately so the per-row
  * CPU vs scheduler-overhead split is measured, not guessed. Each timing
  * is min-of-2 on a warmed session. */
object DecomposeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().count()

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        // noop sink (guide §1.4): computes every column of every row, so a
        // projection-only sub-chain isn't pruned away the way count() would
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"DECOMP $label%-40s min ${runs.min}%.3f s  runs ${runs.map(r => f"$r%.2f").mkString(",")}")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    if (args.isEmpty || args.contains("decontaminate")) {
      // corpus gram stream per length, no join
      time("decon corpus grams n=13")(Dedup.shingles(docs, "text", "doc_id", 13))
      time("decon corpus grams n=5")(Dedup.shingles(docs, "text", "doc_id", 5))
      // bench gram build (the persisted side)
      val tok = filter(split(lower(col("text")), "[^a-z0-9]+"), w => length(w) > 0)
      val benchA = docs.filter(col("doc_id") % 25 === 0)
        .select(col("doc_id").as("bench_id"), array_join(slice(tok, 1, 15), " ").as("text"))
      time("decon bench grams")(Dedup.shingles(benchA, "text", "bench_id", 13))
    }

    if (args.isEmpty || args.contains("hamming")) {
      val media = docs.select(col("doc_id").as("media_id"))
      time("hamming synth only")(Multimodal.synthesizeDhashImages(spark, media))
      time("hamming synth+dhash")(
        Multimodal.imageDHash(spark, Multimodal.synthesizeDhashImages(spark, media)))
      time("hamming full clusters")(
        Dedup.hammingClusters(
          Multimodal.imageDHash(spark, Multimodal.synthesizeDhashImages(spark, media))
            .select(col("media_id"), col("dhash"))))
    }

    if (args.isEmpty || args.contains("pagerank")) {
      val pages = docs
        .withColumn("url", graft.queries.PipelineQueries.synthUrl(col("doc_id")))
        .withColumn("html", graft.queries.PipelineQueries.synthHtml(col("doc_id"), col("text")))
        .select(col("url"), col("html"))
      time("pagerank synth+scan only")(pages)
      time("pagerank linkGraph edges")(Graph.linkGraph(pages))
      time("pagerank full 3 iters")(Graph.pageRank(Graph.linkGraph(pages), 3))
    }

    if (args.contains("plan")) {
      // pure driver-side planning cost: force analysis + optimization +
      // physical planning (pre-AQE) on a FRESH Dataset per rep, no execution
      for (name <- Seq("q2_join_agg", "td_crawl_ingest", "td_pagerank",
        "td_domain_quota", "td_crawl_pipeline", "td_decontaminate",
        "td_hamming_clusters", "td_minhash_lsh", "q21_multi_join_star")) {
        val mx = java.lang.management.ManagementFactory.getThreadMXBean
        val runs = (1 to 3).map { _ =>
          val c0 = mx.getCurrentThreadCpuTime
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
          ((System.nanoTime() - t0) / 1e9, (mx.getCurrentThreadCpuTime - c0) / 1e9)
        }
        println(f"DECOMP plan-only $name%-28s minWall ${runs.map(_._1).min}%.3f minCpu ${runs.map(_._2).min}%.3f  cpuRuns ${runs.map(r => f"${r._2}%.2f").mkString(",")}")
      }
    }

    if (args.contains("phases")) {
      for (name <- Seq("td_crawl_ingest", "q2_join_agg", "td_decontaminate");
           rep <- 1 to 2) {
        val qe = SparkEntry.queries(name)(spark, sfDir).queryExecution
        def t[A](f: => A): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        val ta = t(qe.analyzed)
        val tc = t(qe.withCachedData)
        val to = t(qe.optimizedPlan)
        val ts = t(qe.sparkPlan)
        val te = t(qe.executedPlan)
        println(f"DECOMP phases $name rep$rep analyze $ta%.3f cacheLookup $tc%.3f optimize $to%.3f physical $ts%.3f executed $te%.3f")
      }
    }

    if (args.isEmpty || args.contains("web")) {
      val synthUrl = graft.queries.PipelineQueries.synthUrl(col("doc_id"))
      time("web regDomainOf(url) HOF-bound")(
        docs.select(Web.registeredDomainOf(synthUrl).as("d")))
      time("web regDomain(urlHost(url)) plain")(
        docs.select(Web.registeredDomain(Web.urlHost(synthUrl)).as("d")))
      time("web urlHost(url) plain")(
        docs.select(Web.urlHost(synthUrl).as("h")))
      time("web urlNormalize(url) plain")(
        docs.select(Web.urlNormalize(synthUrl).as("u")))
    }

    if (args.isEmpty || args.contains("decon2")) {
      time("decon ngrams (no distinct) n=13")(Dedup.ngrams(docs, "text", "doc_id", 13))
      time("decon ngrams (no distinct) n=5")(Dedup.ngrams(docs, "text", "doc_id", 5))
    }

    if (args.isEmpty || args.contains("minhash")) {
      time("minhash groupBy sig")(Dedup.minhash(docs, "text", "doc_id", 3, 16))
      time("minhash rowwise col")(docs.select(col("doc_id"),
        Dedup.minhashColumn(col("text"), 3, 16).as("sig")))
    }
    spark.stop()
  }
}
