package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class SearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("topTerms ranks by frequency with term tie-break") {
    val docs = Seq((1L, "b b a a a"), (2L, "c b")).toDF("doc_id", "text")
    val out = Search.topTerms(docs, 2).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 3L), ("b", 3L)))
  }

  test("bm25 ranks term-dense short docs above sparse long ones") {
    val docs = Seq(
      (1L, "spark spark spark"),                        // dense, short
      (2L, "spark alpha beta gamma delta eps zeta"),    // one hit, long
      (3L, "alpha beta gamma")).toDF("doc_id", "text")  // no hits
    val out = Search.bm25(docs, Seq("spark"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L))          // doc 3 absent
    assert(out(0)._2 > out(1)._2)                       // saturation + length norm
    assert(out.forall(_._3 == 1L))
  }

  test("bm25 idf weighs rare terms above common ones") {
    val docs = Seq(
      (1L, "common rare"), (2L, "common x"), (3L, "common y"), (4L, "common z"))
      .toDF("doc_id", "text")
    val out = Search.bm25(docs, Seq("common", "rare"), topK = 10).collect()
    // doc 1 has both terms and the rare one — strictly highest score
    assert(out.head.getLong(0) == 1L)
    val s1 = out.head.getDouble(1)
    assert(out.tail.forall(_.getDouble(1) < s1))
  }

  test("kmeansIterate converges to the two obvious cluster means") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.8f, 0.2f)),
      (10L, Array(0.0f, 1.0f)), (11L, Array(0.1f, 0.9f)), (12L, Array(0.2f, 0.8f)))
      .toDF("vec_id", "embedding")
    val init = emb.filter(col("vec_id").isin(0L, 10L))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    val trained = Similarity.kmeansIterate(emb, init, iterations = 2)
    val cents = trained.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toList).toMap
    assert(cents.keySet == Set(0L, 10L))
    // cluster means: (0.9, 0.1) and (0.1, 0.9)
    assert(math.abs(cents(0L).head - 0.9f) < 1e-4 && math.abs(cents(0L)(1) - 0.1f) < 1e-4)
    assert(math.abs(cents(10L).head - 0.1f) < 1e-4 && math.abs(cents(10L)(1) - 0.9f) < 1e-4)
  }

  test("labelMargin flags the vector sitting in the other label's cluster") {
    // label 0 clusters near (1,0), label 1 near (0,1); vec 5 is labeled 0
    // but sits at (0,1) — margin < 0 only for it
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.9f, 0.1f), 0), (5L, Seq(0.0f, 1.0f), 0),
      (3L, Seq(0.0f, 1.0f), 1), (4L, Seq(0.1f, 0.9f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelMargin(rows).orderBy("label").collect()
    assert(out.length == 2)
    val l0 = out(0); val l1 = out(1)
    assert(l0.getInt(0) == 0 && l0.getLong(1) == 3 && l0.getLong(3) == 1)
    assert(l1.getInt(0) == 1 && l1.getLong(1) == 2 && l1.getLong(3) == 0)
    // healthy label's mean margin is positive
    assert(l1.getDouble(2) > 0)
  }
}
