package graft

import org.apache.spark.sql.functions._
import graft.functions._

/** r18, VERDICT item 8: A/B the ngramJaccardPairs LENGTH FILTER (size-ratio
  * bound at the pair join) against the r17 form, alternating the two
  * variants inside ONE session so window drift hits both. Both variants are
  * built inline from the same shingleArray seam; `new` mirrors the r18
  * production code, `old` the r17 code. min-of-K noop-sinked walls plus the
  * pair-join's aggregate input rows (the number the filter exists to cut).
  * Usage: scripts/runprobe.sh graft.R18NgramAbProbe [reps]
  */
object R18NgramAbProbe {
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
    val threshold = 0.35
    val idCol = "doc_id"

    def variant(lengthFilter: Boolean): org.apache.spark.sql.DataFrame = {
      val arr = Dedup.shingleArray(docs, "text", idCol, 3).persist()
      val sizes = arr.select(col(idCol), size(col("shingles")).as("n_sh"))
      val sh0 =
        if (lengthFilter)
          arr.select(col(idCol), size(col("shingles")).as("__n"),
              explode(col("shingles")).as("__s"))
            .select(col(idCol), col("__n"), xxhash64(col("__s")).as("shingle"))
        else
          arr.select(col(idCol), explode(col("shingles")).as("__s"))
            .select(col(idCol), xxhash64(col("__s")).as("shingle"))
      val joinCond =
        if (lengthFilter)
          col("a.shingle") === col("b.shingle") && col(s"a.$idCol") < col(s"b.$idCol") &&
            least(col("a.__n"), col("b.__n")).cast("double") >=
              lit(threshold - 1e-4) * greatest(col("a.__n"), col("b.__n"))
        else
          col("a.shingle") === col("b.shingle") && col(s"a.$idCol") < col(s"b.$idCol")
      val inter = sh0.as("a").join(sh0.as("b"), joinCond)
        .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
        .agg(count(lit(1)).as("inter"))
      Barrier.releaseOnDrop(inter
        .join(sizes.withColumnRenamed(idCol, "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed(idCol, "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn("jaccard", round(col("inter") / (col("n_a") + col("n_b") - col("inter")), 4))
        .filter(col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard"), arr)
    }

    // result equality first: the filter must be invisible in the output
    val nOld = variant(false).orderBy("id_a", "id_b").collect().toSeq
    val nNew = variant(true).orderBy("id_a", "id_b").collect().toSeq
    println(s"EQUAL ${nOld == nNew}  rows ${nOld.size}")
    // candidate-pair pruning: rows entering the intersection aggregate
    def aggInput(lengthFilter: Boolean): Long = {
      val arr = Dedup.shingleArray(docs, "text", idCol, 3)
      val sh0 =
        if (lengthFilter)
          arr.select(col(idCol), size(col("shingles")).as("__n"),
              explode(col("shingles")).as("__s"))
            .select(col(idCol), col("__n"), xxhash64(col("__s")).as("shingle"))
        else
          arr.select(col(idCol), explode(col("shingles")).as("__s"))
            .select(col(idCol), xxhash64(col("__s")).as("shingle"))
      val joinCond =
        if (lengthFilter)
          col("a.shingle") === col("b.shingle") && col(s"a.$idCol") < col(s"b.$idCol") &&
            least(col("a.__n"), col("b.__n")).cast("double") >=
              lit(threshold - 1e-4) * greatest(col("a.__n"), col("b.__n"))
        else
          col("a.shingle") === col("b.shingle") && col(s"a.$idCol") < col(s"b.$idCol")
      sh0.as("a").join(sh0.as("b"), joinCond).count()
    }
    println(s"agg-input rows: old ${aggInput(false)}  new ${aggInput(true)}")

    // alternating min-of-reps walls
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    variant(false).write.format("noop").mode("overwrite").save() // warm
    variant(true).write.format("noop").mode("overwrite").save()
    val (oldT, newT) = (Array.fill(reps)(0.0), Array.fill(reps)(0.0))
    for (i <- 0 until reps) {
      oldT(i) = time(variant(false).write.format("noop").mode("overwrite").save())
      newT(i) = time(variant(true).write.format("noop").mode("overwrite").save())
    }
    def fmt(a: Array[Double]) = a.map(v => f"$v%.3f").mkString(",")
    println(f"OLD min ${oldT.min}%.3f  runs [${fmt(oldT)}]")
    println(f"NEW min ${newT.min}%.3f  runs [${fmt(newT)}]")
    spark.stop()
  }
}
