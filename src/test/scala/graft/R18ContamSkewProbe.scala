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
