package graft

import org.apache.spark.sql.functions._
import graft.functions._

/** r18, VERDICT item 6: A/B the crawlIngest survivors seam — r17's persist
  * vs r18's lineage-truncating checkpoint — alternating in ONE session.
  * Both variants share [[Curation.crawlKeptPlan]] and replicate the
  * recipe's tail verbatim; measured: (a) full-chain noop wall, (b)
  * construction+planning driver-thread CPU of a fresh chain (the quantity
  * the checkpoint exists to cut — every downstream construction re-analyzes
  * the survivors' logical plan, which is the 13-regex forest under persist
  * and a LogicalRDD under checkpoint).
  * Usage: scripts/runprobe.sh graft.R18CrawlAbProbe [reps]
  */
object R18CrawlAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(4)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val pages = docs
      .withColumn("html", graft.queries.PipelineQueries.synthHtml(col("doc_id"), col("text")))
      .withColumn("url", graft.queries.PipelineQueries.synthUrl(col("doc_id")))
      .select(col("doc_id"), col("url"), col("html"))

    // the crawlIngest tail, shared by both variants (mirrors Curation)
    def tail(kept: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val reb = Dedup.paragraphDedup(kept.select(col("doc_id"), col("text")))
      val scored = reb
        .join(kept.drop("text"), Seq("doc_id"))
        .filter(length(col("text")) > 0)
        .withColumn("quality", TextFunctions.qualityScore(col("text")))
        .filter(col("quality") >= 0.0)
        .withColumn("domain", Web.registeredDomain(Web.urlHost(col("url"))))
        .drop("url")
      Web.domainQuota(scored, 5, scoreCol = "quality", idCol = "doc_id", salts = 16)
        .orderBy(col("doc_id"))
    }
    def persistVariant(): (org.apache.spark.sql.DataFrame, () => Unit) = {
      val kept = Curation.crawlKeptPlan(pages, pages, "html", "url", "doc_id").persist()
      (tail(kept), () => { kept.unpersist(); () })
    }
    def checkpointVariant(): (org.apache.spark.sql.DataFrame, () => Unit) = {
      val kept = Barrier.iterCheckpoint(
        Curation.crawlKeptPlan(pages, pages, "html", "url", "doc_id"), eager = false)
      (tail(kept), () => Barrier.release(kept))
    }

    val mx = java.lang.management.ManagementFactory.getThreadMXBean
    def measure(mk: () => (org.apache.spark.sql.DataFrame, () => Unit)): (Double, Double) = {
      // wall spans construction THROUGH the action: the checkpoint variant
      // runs the extraction's shuffle stages at construction time (AQE
      // executes non-result stages eagerly), the persist variant inside the
      // action — only the total is comparable
      val c0 = mx.getCurrentThreadCpuTime
      val t0 = System.nanoTime()
      val (df, rel) = mk()
      val planned = df.queryExecution.executedPlan // construction + planning
      val constructCpu = (mx.getCurrentThreadCpuTime - c0) / 1e9
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      rel()
      (constructCpu, wall)
    }
    measure(persistVariant); measure(checkpointVariant) // warm both paths
    val res = (0 until reps).map { _ =>
      (measure(persistVariant), measure(checkpointVariant))
    }
    def fmt(xs: Seq[Double]) = xs.map(v => f"$v%.3f").mkString(",")
    println(f"PERSIST    construct-cpu min ${res.map(_._1._1).min}%.3f [${fmt(res.map(_._1._1))}]  " +
      f"wall min ${res.map(_._1._2).min}%.3f [${fmt(res.map(_._1._2))}]")
    println(f"CHECKPOINT construct-cpu min ${res.map(_._2._1).min}%.3f [${fmt(res.map(_._2._1))}]  " +
      f"wall min ${res.map(_._2._2).min}%.3f [${fmt(res.map(_._2._2))}]")
    spark.stop()
  }
}
