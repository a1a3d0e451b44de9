package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
import graft.functions._

/** r18 optimization probe (test scope): the per-iteration plan and job/stage
  * cost of the two iterative loops (pageRank rank propagation,
  * Dedup.clusters label propagation) — the evidence base for VERDICT r17's
  * "cut the per-iteration Exchange" item. For each loop it
  *   1. dumps the formatted plan of ONE mid-loop iteration body (the frame
  *      that runs `iterations` times at 100 TB), Exchange count included;
  *   2. runs the full bench-entry query twice (warm) and prints the job /
  *      stage / shuffle-byte totals of the second run.
  * Usage: scripts/runprobe.sh graft.R18IterProbe [pagerank|clusters|bench] \
  *        [planout=/tmp/x.txt]
  */
object R18IterProbe {
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
    val planDir = args.collectFirst { case a if a.startsWith("planout=") =>
      a.stripPrefix("planout=") }.getOrElse("/tmp/r18plans")
    new java.io.File(planDir).mkdirs()
    def dump(name: String, text: String): Unit = {
      val w = new java.io.PrintWriter(s"$planDir/$name.txt")
      w.write(text); w.close()
      val exchanges = "Exchange".r.findAllIn(text).size
      println(s"PLAN $name -> $planDir/$name.txt  (exchange-mentions $exchanges)")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val pages = docs
      .withColumn("url", graft.queries.PipelineQueries.synthUrl(col("doc_id")))
      .withColumn("html", graft.queries.PipelineQueries.synthHtml(col("doc_id"), col("text")))
      .select(col("url"), col("html"))

    val want = args.filterNot(_.startsWith("planout=")).toSet

    if (want.isEmpty || want("pagerank")) {
      // mirror Graph.pageRank's internals for the mid-loop plan: the graph
      // frames exactly as rankGraph builds them, one checkpointed round
      // vector, then the NEXT round's body
      val g = Graph.rankGraph(Graph.linkGraph(pages))
      val n = g.nodes.count()
      val r0 = Barrier.iterCheckpoint(g.nodes.withColumn("rank", lit(1.0 / n)),
        eager = true)
      val r1 = Barrier.iterCheckpoint(
        Graph.pageRankStep(g.nodes, g.shares, g.srcNodes, r0, n, 0.85), eager = true)
      val step2 = Graph.pageRankStep(g.nodes, g.shares, g.srcNodes, r1, n, 0.85)
      dump("pagerank_iteration",
        step2.queryExecution.explainString(ExplainMode.fromString("formatted")))
      // executed (post-AQE) shape of the same body
      step2.write.format("noop").mode("overwrite").save()
      dump("pagerank_iteration_executed",
        step2.queryExecution.explainString(ExplainMode.fromString("formatted")))
      Barrier.release(r0); Barrier.release(r1); g.unpersistAll()
    }

    if (want.isEmpty || want("clusters")) {
      // mirror Dedup.clusters' internals: edges as built there, round-0
      // labels, then one propagation round's stable frame
      val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.35)
      val edges = Dedup.clusterEdges(pairs)
      val labels0 = Barrier.iterCheckpoint(edges.select(col("a").as("id"))
        .distinct().withColumn("cluster", col("id")))
      val stable0 = Barrier.iterCheckpoint(Dedup.clusterRound(edges, labels0))
      val stable = Dedup.clusterRound(edges,
        stable0.select(col("id"), col("cluster")))
      dump("clusters_iteration",
        stable.queryExecution.explainString(ExplainMode.fromString("formatted")))
      stable.write.format("noop").mode("overwrite").save()
      dump("clusters_iteration_executed",
        stable.queryExecution.explainString(ExplainMode.fromString("formatted")))
      Barrier.release(labels0); Barrier.release(stable0); edges.unpersist()
    }

    if (want.isEmpty || want("bench")) {
      // job/stage/shuffle totals of the full bench entries (2nd, warm run)
      import org.apache.spark.scheduler._
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val stages = new java.util.concurrent.atomic.AtomicInteger(0)
      val shuffleW = new java.util.concurrent.atomic.AtomicLong(0L)
      @volatile var collecting = false
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit =
          if (collecting) jobs.incrementAndGet()
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
          if (collecting) {
            stages.incrementAndGet()
            shuffleW.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          }
      })
      for (name <- Seq("td_pagerank", "td_hamming_clusters")) {
        SparkEntry.queries(name)(spark, sfDir).count() // warm
        jobs.set(0); stages.set(0); shuffleW.set(0L); collecting = true
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300); collecting = false
        println(f"BENCH $name%-22s wall $wall%.3f s  jobs ${jobs.get}%3d  " +
          f"stages ${stages.get}%3d  shuffleWrite ${shuffleW.get / 1e6}%.2f MB")
      }
    }
    spark.stop()
  }
}
