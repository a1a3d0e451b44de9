package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.mutable

/** Per-stage breakdown of one or more bench queries (test scope, r17
  * optimization round): run each named query twice (first run warms
  * codegen/page cache, second is profiled) and print, per stage of the
  * profiled run, wall duration, task-time sum, executor CPU, shuffle
  * read/write and input bytes — the empirical loop of the optimization
  * guide §1.1 without the UI. Usage:
  *   scripts/runprobe.sh graft.StageProfileProbe td_pagerank [more...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object StageProfileProbe {
  case class StageRow(id: Int, name: String, wallMs: Long, taskMs: Long,
                      cpuMs: Long, tasks: Int, inMb: Double, shRdMb: Double,
                      shWrMb: Double, spillMb: Double)

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

    val stages = mutable.ArrayBuffer[StageRow]()
    val jobs = mutable.ArrayBuffer[(Int, Long, String)]() // id, t0, desc
    val jobEnds = mutable.ArrayBuffer[(Int, Long)]()
    var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = if (collecting)
        jobs.synchronized { jobs += ((j.jobId, j.time,
          Option(j.properties.getProperty("spark.job.description")).getOrElse(""))) }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (collecting) jobEnds.synchronized { jobEnds += ((j.jobId, j.time)) }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (collecting) {
        val si = sc.stageInfo; val tm = si.taskMetrics
        stages.synchronized {
          stages += StageRow(si.stageId, si.name.takeWhile(_ != '\n').take(90),
            (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(-1L),
            tm.executorRunTime, tm.executorCpuTime / 1000000,
            si.numTasks, tm.inputMetrics.bytesRead / 1e6,
            tm.shuffleReadMetrics.remoteBytesRead / 1e6 + tm.shuffleReadMetrics.localBytesRead / 1e6,
            tm.shuffleWriteMetrics.bytesWritten / 1e6,
            (tm.memoryBytesSpilled + tm.diskBytesSpilled) / 1e6)
        }
      }
    })
    // session warm-up like Bench
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().count()

    for (name <- args) {
      val q = SparkEntry.queries(name)
      // warm pass (codegen + page cache), not profiled
      q(spark, sfDir).count()
      Thread.sleep(300)
      stages.clear(); jobs.clear(); jobEnds.clear(); collecting = true
      val wallT0 = System.currentTimeMillis()
      val t0 = System.nanoTime()
      q(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val wallT1 = System.currentTimeMillis()
      Thread.sleep(400) // drain listener bus
      collecting = false
      // driver-side gap analysis: wall minus time covered by at least one
      // running job = planning/AQE/result handling on the driver
      val iv = jobs.sortBy(_._1).flatMap { case (id, s, _) =>
        jobEnds.find(_._1 == id).map(e => (s, e._2)) }
      val covered = {
        var t = wallT0; var cov = 0L
        iv.sortBy(_._1).foreach { case (s, e) =>
          val s2 = math.max(s, t); if (e > s2) { cov += e - s2; t = e } }
        cov
      }
      println(f"%n=== $name: warm wall $wall%.3f s, ${jobs.size} jobs, ${stages.size} stages, job-covered ${covered / 1000.0}%.3f s, driver-gap ${(wallT1 - wallT0 - covered) / 1000.0}%.3f s ===")
      println(f"${"stage"}%6s ${"wall_ms"}%8s ${"task_ms"}%8s ${"cpu_ms"}%8s ${"tasks"}%6s ${"in_mb"}%8s ${"shrd_mb"}%8s ${"shwr_mb"}%8s  name")
      stages.sortBy(_.id).foreach { s =>
        println(f"${s.id}%6d ${s.wallMs}%8d ${s.taskMs}%8d ${s.cpuMs}%8d ${s.tasks}%6d ${s.inMb}%8.1f ${s.shRdMb}%8.2f ${s.shWrMb}%8.2f  ${s.name}")
      }
    }
    spark.stop()
  }
}
