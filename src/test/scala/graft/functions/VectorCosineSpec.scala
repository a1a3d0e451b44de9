package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class VectorCosineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("native VectorCosine is bit-identical to the HOF formulation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib") && col("ib") < col("ia") + 7)
    val diff = pairs.select(
        Similarity.cosine(col("va"), col("vb")).as("native"),
        Similarity.cosineHof(col("va"), col("vb")).as("hof"))
      .filter(col("native") =!= col("hof")) // exact equality, no tolerance
    assert(diff.isEmpty)
  }

  test("VectorCosine participates in whole-stage codegen") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
    val plan = q.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [vector_cosine"))
    // sanity: self-cosine = 1.0 up to fp rounding
    val v = q.head().getDouble(0)
    assert(math.abs(v - 1.0) < 1e-9)
  }

  test("native VectorLshBucket matches the declarative formulation exactly") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val diff = emb.select(
        Similarity.lshBucket(col("embedding"), 4).as("native"),
        Similarity.lshBucketHof(col("embedding"), 4).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.isEmpty)
  }

  test("VectorCosine rejects non-float-array inputs at analysis") {
    val df = Seq((Array(1.0, 2.0), Array(2.0, 1.0))).toDF("a", "b")
    assertThrows[org.apache.spark.sql.AnalysisException](
      df.select(Similarity.cosine(col("a"), col("b"))).collect())
  }
}
