package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
import graft.functions._

/** r18: per-iteration plan shape in the AT-SCALE regime — broadcast joins
  * impossible (at 100 TB the edge/share tables and the |V|-sized vectors
  * exceed any broadcast threshold) and AQE partition coalescing inactive
  * (partitions exceed the advisory size). Both simulated per-session here
  * (autoBroadcastJoinThreshold=-1, coalescePartitions.enabled=false) — the
  * PROBE's confs, not engine configuration; they stand in for data volume
  * the sandbox cannot hold.
  *
  * For each loop the probe dumps the SAME iteration body twice:
  *   - before: the iterated vector checkpointed with the STOCK
  *     Dataset.localCheckpoint (records UnknownPartitioning under AQE)
  *   - after: with Barrier.iterCheckpoint (declares the final plan's hash
  *     partitioning/ordering — the r18 change)
  * The diff is the per-iteration Exchange(+Sort) on the vector side.
  * Usage: scripts/runprobe.sh graft.R18ScaleShapeProbe [planout=...]
  */
object R18ScaleShapeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val planDir = args.collectFirst { case a if a.startsWith("planout=") =>
      a.stripPrefix("planout=") }.getOrElse("/tmp/r18plans_scale")
    new java.io.File(planDir).mkdirs()
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // executed (final) plan
      val text = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val w = new java.io.PrintWriter(s"$planDir/$name.txt"); w.write(text); w.close()
      val ex = "\\(\\d+\\) Exchange".r.findAllIn(text).size
      val so = "\\(\\d+\\) Sort".r.findAllIn(text).size
      println(s"PLAN $name: $ex Exchange, $so Sort  -> $planDir/$name.txt")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val pages = docs
      .withColumn("url", graft.queries.PipelineQueries.synthUrl(col("doc_id")))
      .withColumn("html", graft.queries.PipelineQueries.synthHtml(col("doc_id"), col("text")))
      .select(col("url"), col("html"))

    // ---- pageRank iteration body, stock vs declared vector checkpoint ----
    locally {
      val g = Graph.rankGraph(Graph.linkGraph(pages))
      val n = g.nodes.count()
      val uniform = g.nodes.withColumn("rank", lit(1.0 / n))
      val rStock = uniform.localCheckpoint(true)
      dump("pagerank_iter_stock_ckpt",
        Graph.pageRankStep(g.nodes, g.shares, g.srcNodes, rStock, n, 0.85))
      val rDecl = Barrier.iterCheckpoint(uniform)
      dump("pagerank_iter_declared_ckpt",
        Graph.pageRankStep(g.nodes, g.shares, g.srcNodes, rDecl, n, 0.85))
      Barrier.release(rDecl); g.unpersistAll()
    }

    // ---- clusters propagation round, stock vs declared label checkpoint --
    locally {
      val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.35)
      val edges = Dedup.clusterEdges(pairs)
      val init = edges.select(col("a").as("id")).distinct()
        .withColumn("cluster", col("id"))
      val lStock = init.localCheckpoint(true)
      val lDecl = Barrier.iterCheckpoint(init)
      // the r17 edge cache (hash(a,b)-partitioned distinct, no b layout)
      val edgesOld = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
        .unionByName(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
        .distinct().persist()
      // the full 2×2 so each piece's contribution is attributable:
      // r17 (old edges + stock labels) → r18 (b-keyed edges + declared labels)
      dump("clusters_round_before_r17", Dedup.clusterRound(edgesOld, lStock))
      dump("clusters_round_edges_only", Dedup.clusterRound(edges, lStock))
      dump("clusters_round_labels_only", Dedup.clusterRound(edgesOld, lDecl))
      dump("clusters_round_after_r18", Dedup.clusterRound(edges, lDecl))
      edgesOld.unpersist()
      Barrier.release(lDecl); edges.unpersist()
    }
    spark.stop()
  }
}
