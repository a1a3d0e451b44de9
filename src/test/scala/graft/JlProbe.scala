package graft

import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** Scratch: native codegen JL projection vs the interpreted HOF form. */
object JlProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20)
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val big = (0 until n).map { i =>
      emb.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"), col("embedding"))
    }.reduce(_ unionByName _)
    val dir = java.nio.file.Files.createTempDirectory("jl_emb").toString
    big.write.mode("overwrite").parquet(dir)
    val d = spark.read.parquet(dir)
    println(s"rows=${d.count()}")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    // warm both paths once
    Similarity.randomProject(emb, 64, 16).agg(sum(element_at(col("projected"), 1))).head
    Similarity.randomProjectHof(emb, 64, 16).agg(sum(element_at(col("projected"), 1))).head
    for (_ <- 1 to 2) {
      time("jl_native") {
        Similarity.randomProject(d, 64, 16).agg(sum(element_at(col("projected"), 1))).head }
      time("jl_hof") {
        Similarity.randomProjectHof(d, 64, 16).agg(sum(element_at(col("projected"), 1))).head }
    }
    spark.stop()
  }
}
