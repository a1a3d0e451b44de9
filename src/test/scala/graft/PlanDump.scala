package graft

import org.apache.spark.sql.execution.ExplainMode

/** Scratch: dump formatted plans of the bench surface for assertion authoring. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val sf = "/root/testdata/sf0.001"
    val out = new java.io.File("/tmp/plans"); out.mkdirs()
    SparkEntry.benchNames.foreach { name =>
      val p = SparkEntry.queries(name)(spark, sf).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      val w = new java.io.PrintWriter(s"/tmp/plans/$name.txt")
      w.write(p); w.close()
      println(s"dumped $name")
    }
    spark.stop()
  }
}
