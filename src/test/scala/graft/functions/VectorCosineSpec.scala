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

  test("graft_cosine / graft_lsh_bucket register as SQL functions") {
    GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb_sqlfn")
    val viaSql = spark.sql(
      """SELECT a.vec_id ia, b.vec_id ib, graft_cosine(a.embedding, b.embedding) c,
        |       graft_lsh_bucket(a.embedding, 8) bkt
        |FROM emb_sqlfn a JOIN emb_sqlfn b ON a.vec_id + 1 = b.vec_id
        |WHERE a.vec_id < 20""".stripMargin)
    val viaDf = {
      val e = spark.table("emb_sqlfn")
      val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
      val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"))
      a.join(b, col("ia") + 1 === col("ib")).filter(col("ia") < 20)
        .select(col("ia"), col("ib"), Similarity.cosine(col("va"), col("vb")).as("c"),
          Similarity.lshBucket(col("va"), 8).as("bkt"))
    }
    assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty)
  }
}
