package graft

import org.apache.spark.sql.functions._

/** Decade-scaling probe (r16 verdict task 5): the 10× ScaleProbe numbers
  * are fixed-overhead dominated — 170 MB of corpus finishes before the
  * shuffle machinery matters, so "flat at 10×" partly measures JVM warm-up.
  * 100× (~1.7 GB docs / 60M-row lineitem) moves the five most expensive
  * bench shapes into shuffle/scan-bound territory where plan differences
  * actually show. This probe times each shape at 1×, 10× and 100× and
  * prints a decade table: the 10×→100× ratio is the number that predicts
  * cluster behavior (linear scan-bound ops → ~10; flat iteration/state
  * costs → ≪10; anything ≫10 is a super-linear bug).
  *
  * Protocol notes (same replication as ScaleProbe so rows stay comparable):
  *  - documents replicate with shifted ids + a per-replica copytag word;
  *    the bench entries run UNCHANGED through an sf-dir facade (symlinks
  *    for every table, replicated parquet for the scaled ones) — what is
  *    measured is the exact SparkEntry plan, not a probe re-formulation.
  *  - td_minhash_lsh runs the capped variant (maxBucketSize=32): replicas
  *    are mutual near-dups by construction, so the uncapped entry would
  *    measure the quadratic pair explosion the cap exists to prevent —
  *    the 100 TB configuration is the capped one (ScaleProbe convention,
  *    r7 judge finding).
  *  - q2 replicates lineitem/orders/customer with key shifts that keep
  *    referential integrity (l_orderkey→shifted orders, o_custkey→shifted
  *    customers, c_nationkey unchanged so the broadcast nation join and
  *    group-key cardinality stay fixed).
  *  - per tier each shape runs twice; both samples print (first carries
  *    any residual JIT/page-cache cold cost, min is the comparable
  *    number). One warm-up of every shape at 1× precedes the clock.
  *
  * Run: SPARK_GRAFT_CPUS=32 Test/runMain graft.DecadeProbe [tiers...]
  * (default tiers: 1 10 100).
  */
object DecadeProbe {
  def main(args: Array[String]): Unit = {
    val tiers = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10, 100)
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"

    /** sf-dir facade: symlink every base table, overwrite the scaled ones. */
    def facade(scaled: Map[String, org.apache.spark.sql.DataFrame]): String = {
      val dir = java.nio.file.Files.createTempDirectory("decade_sf").toString
      for (tbl <- graft.queries.QueryUtil.tables) {
        val srcP = java.nio.file.Paths.get(src, s"$tbl.parquet")
        if (scaled.contains(tbl))
          scaled(tbl).write.mode("overwrite").parquet(s"$dir/$tbl.parquet")
        else if (java.nio.file.Files.exists(srcP))
          java.nio.file.Files.createSymbolicLink(
            java.nio.file.Paths.get(dir, s"$tbl.parquet"), srcP)
      }
      dir
    }

    def replicateDocs(n: Int): org.apache.spark.sql.DataFrame = {
      val docs = spark.read.parquet(s"$src/documents.parquet")
      (0 until n).map { i =>
        docs.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
          (if (i == 0) col("text")
           else concat(col("text"), lit(s" copytag$i"))).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
    }

    def replicateTpch(n: Int): Map[String, org.apache.spark.sql.DataFrame] = {
      val li = spark.read.parquet(s"$src/lineitem.parquet")
      val o = spark.read.parquet(s"$src/orders.parquet")
      val c = spark.read.parquet(s"$src/customer.parquet")
      val oShift = 10000000L; val cShift = 1000000L
      def rep(df: org.apache.spark.sql.DataFrame)(f: (org.apache.spark.sql.DataFrame, Long) => org.apache.spark.sql.DataFrame) =
        (0 until n).map(i => f(df, i.toLong)).reduce(_ unionByName _)
      Map(
        "lineitem" -> rep(li)((d, i) => d.withColumn("l_orderkey",
          col("l_orderkey") + lit(i * oShift))),
        "orders" -> rep(o)((d, i) => d
          .withColumn("o_orderkey", col("o_orderkey") + lit(i * oShift))
          .withColumn("o_custkey", col("o_custkey") + lit(i * cShift))),
        "customer" -> rep(c)((d, i) => d.withColumn("c_custkey",
          col("c_custkey") + lit(i * cShift))))
    }

    // tier → (docs facade dir, tpch facade dir); built once, off the clock
    val dirs: Seq[(Int, String, String)] = tiers.map { n =>
      val docsDir =
        if (n == 1) src
        else {
          // write the replicated corpus to parquet first so the timed scan
          // reads real files, not an in-memory union plan
          val d = java.nio.file.Files.createTempDirectory("decade_docs").toString
          replicateDocs(n).write.mode("overwrite").parquet(d)
          val fd = java.nio.file.Files.createTempDirectory("decade_sf").toString
          for (tbl <- graft.queries.QueryUtil.tables) {
            val srcP = java.nio.file.Paths.get(src, s"$tbl.parquet")
            if (tbl == "documents")
              java.nio.file.Files.createSymbolicLink(
                java.nio.file.Paths.get(fd, "documents.parquet"),
                java.nio.file.Paths.get(d))
            else if (java.nio.file.Files.exists(srcP))
              java.nio.file.Files.createSymbolicLink(
                java.nio.file.Paths.get(fd, s"$tbl.parquet"), srcP)
          }
          fd
        }
      val tpchDir = if (n == 1) src else facade(replicateTpch(n))
      println(s"tier ${n}x: docs=${rows(spark, docsDir, "documents")} rows, " +
        s"lineitem=${rows(spark, tpchDir, "lineitem")} rows")
      (n, docsDir, tpchDir)
    }

    import graft.functions.Dedup
    val shapes: Seq[(String, (String, String) => Long)] = Seq(
      ("td_minhash_lsh_capped", (docsDir: String, _: String) =>
        Dedup.minhashLsh(spark.read.parquet(s"$docsDir/documents.parquet"),
          shingleN = 3, numHashes = 16, bands = 4, threshold = 0.3,
          maxBucketSize = Some(32)).count()),
      ("td_crawl_ingest", (docsDir: String, _: String) =>
        SparkEntry.queries("td_crawl_ingest")(spark, docsDir).count()),
      ("td_pagerank", (docsDir: String, _: String) =>
        SparkEntry.queries("td_pagerank")(spark, docsDir).count()),
      ("td_hamming_clusters", (docsDir: String, _: String) =>
        SparkEntry.queries("td_hamming_clusters")(spark, docsDir).count()),
      ("q2_join_agg", (_: String, tpchDir: String) =>
        SparkEntry.queries("q2_join_agg")(spark, tpchDir).count()))

    // warm-up: one pass of every shape at 1× (codegen + parquet footer
    // caches off the clock, the Bench.scala convention)
    for ((_, f) <- shapes) f(src, src)

    val results = scala.collection.mutable.LinkedHashMap[String, Vector[(Int, Double, Double, Long)]]()
    for ((n, docsDir, tpchDir) <- dirs; (name, f) <- shapes) {
      def one(): (Double, Long) = {
        spark.sharedState.cacheManager.clearCache(); System.gc()
        val t0 = System.nanoTime(); val r = f(docsDir, tpchDir)
        ((System.nanoTime() - t0) / 1e9, r)
      }
      val (t1, r1) = one(); val (t2, r2) = one()
      require(r1 == r2, s"$name at ${n}x: nondeterministic rows $r1 vs $r2")
      println(f"$name%-22s ${n}%3dx  ${math.min(t1, t2)}%8.2f s  (reps $t1%.2f/$t2%.2f, $r1 rows)")
      results(name) = results.getOrElse(name, Vector.empty) :+ ((n, t1, t2, r1))
    }

    // decade table: min-of-2 per tier + the 10→100 ratio
    println("\nname                    " + tiers.map(n => f"${n}%7dx").mkString +
      "   ratio(100/10)")
    for ((name, rs) <- results) {
      val mins = rs.map { case (_, a, b, _) => math.min(a, b) }
      val ratio =
        (rs.find(_._1 == 100), rs.find(_._1 == 10)) match {
          case (Some(h), Some(t)) =>
            f"${math.min(h._2, h._3) / math.min(t._2, t._3)}%.1f"
          case _ => "-"
        }
      println(f"$name%-22s " + mins.map(m => f"$m%7.2f s").mkString(" ") +
        f"   $ratio")
    }
    val json = results.map { case (name, rs) =>
      s""""$name":{${rs.map { case (n, a, b, r) =>
        f""""${n}x":{"min_s":${math.min(a, b)}%.2f,"reps":[$a%.2f,$b%.2f],"rows":$r}"""
      }.mkString(",")}}"""
    }.mkString(",")
    println(s"""{"probe":"decade","tiers":[${tiers.mkString(",")}],$json}""")
    spark.stop()
  }

  private def rows(spark: org.apache.spark.sql.SparkSession, dir: String,
                   tbl: String): Long =
    spark.read.parquet(s"$dir/$tbl.parquet").count()
}
