package graft

import org.apache.spark.sql.functions._
import graft.functions._

/** r18, VERDICT item 3: is contamination's r17 dedup-drop (shingles →
  * ngrams, no per-doc array_distinct) scale-safe under REPETITIVE text?
  *
  * The concern: a boilerplate gram occurring k times in a corpus doc and m
  * times across benchmark docs now produces k·m join-output rows where the
  * distinct form produced ≤ m. The mechanism that bounds it: the bench side
  * is a BROADCAST build, the corpus side streams, and the match rows feed a
  * partial aggregate IN THE SAME TASK — duplicates collapse into the
  * aggregate hash map (keyed by doc×gram), so the inflation is per-task CPU
  * probes, never shuffle bytes or buffered rows. This probe measures that
  * claim: corpus docs with a shared boilerplate sentence repeated r times
  * (r = 1/10/100), a benchmark doc carrying the same sentence; reports
  * per-repetition-factor: join output rows (SQL metric), shuffle bytes,
  * max/median task duration, peak execution memory, wall.
  * Usage: scripts/runprobe.sh graft.R18ContamSkewProbe
  */
object R18ContamSkewProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.scheduler._
    val taskMs = scala.collection.mutable.ArrayBuffer[Long]()
    val stageRows = scala.collection.mutable.ArrayBuffer[String]()
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
    val peakMem = new java.util.concurrent.atomic.AtomicLong(0)
    @volatile var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (collecting && t.taskMetrics != null) {
          taskMs.synchronized { taskMs += t.taskInfo.duration }
          shuffleBytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
          peakMem.getAndAccumulate(t.taskMetrics.peakExecutionMemory, math.max)
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val si = s.stageInfo; val tm = si.taskMetrics
          stageRows.synchronized { stageRows +=
            f"    stage ${si.stageId}%3d tasks ${si.numTasks}%3d " +
            f"wall ${(for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(-1L)}%6d ms " +
            f"taskSum ${tm.executorRunTime}%7d ms cpu ${tm.executorCpuTime / 1000000}%7d ms  " +
            si.name.takeWhile(_ != '\n').take(60) }
        }
    })

    val boiler = "the quick brown fox jumps over the lazy dog near the riverbank today"
    for (rep <- Seq(1, 10, 100)) {
      // 20k corpus docs, each: unique prefix + the boilerplate sentence
      // repeated `rep` times — every repetition re-emits the same 13-grams
      val corpus = spark.range(0, 20000).select(col("id").as("doc_id"),
        concat(lit("unique preamble words number "), col("id"), lit(" "),
          lit((boiler + " ") * rep)).as("text"))
        .localCheckpoint(true) // synth cost out of the measurement
      val bench = spark.range(0, 5).select(col("id").as("bench_id"),
        lit(boiler + " " + boiler).as("text")).localCheckpoint(true)
      // warm
      Curation.contamination(corpus, bench, n = 13).count()
      taskMs.clear(); shuffleBytes.set(0); peakMem.set(0); collecting = true
      val t0 = System.nanoTime()
      val report = Curation.contamination(corpus, bench, n = 13)
      val rows = report.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300); collecting = false
      val ms = taskMs.toSeq.sorted
      stageRows.foreach(println); stageRows.clear()
      // stripped replicas differing ONLY in the corpus gram stream —
      // ngrams (r17 dedup-drop, current) vs shingles (per-doc
    // array_distinct, the pre-r17 form) — so the repetition cost of the
      // drop is isolated from the call's persist/length/checkpoint harness
      def strippedForm(distinct: Boolean): Long = {
        val mk: (org.apache.spark.sql.DataFrame, String, String, Int) => org.apache.spark.sql.DataFrame =
          if (distinct) Dedup.shingles else Dedup.ngrams
        val bg = Dedup.ngrams(bench.select(col("bench_id"), col("text")),
            "text", "bench_id", 13)
          .select(col("bench_id"), col("shingle").as("__gram"))
        mk(corpus, "text", "doc_id", 13)
          .join(broadcast(bg), col("shingle") === col("__gram"))
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("shingle")).as("n_grams"),
            array_join(transform(array_sort(collect_set(col("bench_id"))),
              b => b.cast("string")), "|").as("bench_ids"))
          .count()
      }
      strippedForm(false); strippedForm(true) // warm both
      val walls = Map(false -> scala.collection.mutable.ArrayBuffer[Double](),
        true -> scala.collection.mutable.ArrayBuffer[Double]())
      for (_ <- 1 to 3; distinct <- Seq(false, true)) {
        val t1 = System.nanoTime()
        strippedForm(distinct)
        walls(distinct) += (System.nanoTime() - t1) / 1e9
      }
      stageRows.clear()
      def f3(xs: Seq[Double]) = xs.map(v => f"$v%.2f").mkString(",")
      println(f"rep=$rep%-4d stripped ngrams(r17+) min ${walls(false).min}%6.2f [${f3(walls(false).toSeq)}]  " +
        f"distinct(r16) min ${walls(true).min}%6.2f [${f3(walls(true).toSeq)}]")
      // join output rows: numOutputRows of the gram join, from the LAST
      // executed plan's metrics (the report is checkpointed eagerly, so its
      // plan executed inside contamination)
      println(f"rep=$rep%-4d wall=$wall%6.2f s  flagged=$rows rows  " +
        f"shuffleWrite=${shuffleBytes.get / 1e6}%8.3f MB  " +
        f"taskMax=${if (ms.nonEmpty) ms.max else 0}%5d ms  " +
        f"taskMed=${if (ms.nonEmpty) ms(ms.size / 2) else 0}%5d ms  " +
        f"peakExecMem=${peakMem.get / 1e6}%8.1f MB")
    }
    spark.stop()
  }
}
