package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** [[Search.rrf]] + [[Similarity.mmr]] — the retrieval-fusion tail of the
  * similarity family (fuse lexical+embedding rankings, then diversify the
  * selected batch). The end-to-end oracle lives in td_rrf / td_mmr; this
  * spec pins the algebra (exact fused sums, greedy objective, tie-breaks,
  * the bounded-candidates guard) on closed-form fixtures. */
class RetrievalFusionSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("rrf: 1/(k0+r) sums, n_lists, and deterministic ordering") {
    val a = Seq(("a", 3.0), ("b", 2.0), ("c", 1.0)).toDF("doc_id", "score")
    val b = Seq(("b", 9.0), ("c", 8.0), ("d", 7.0)).toDF("doc_id", "score")
    val out = Search.rrf(Seq(a, b), k0 = 60, topK = 10, idCol = "doc_id")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    // ranks: a=[1], b=[2,1], c=[3,2], d=[3]
    def s(rs: Int*) = BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(
      ("b", s(2, 1), 2L), ("c", s(3, 2), 2L), ("a", s(1), 1L), ("d", s(3), 1L)))
  }

  test("rrf: equal fused scores break ties by id; topK truncates") {
    // x only in list A at rank 1, y only in list B at rank 1 → same score
    val a = Seq(("x", 1.0)).toDF("doc_id", "score")
    val b = Seq(("y", 1.0)).toDF("doc_id", "score")
    val out = Search.rrf(Seq(a, b), idCol = "doc_id").collect().map(_.getString(0))
    assert(out.toSeq == Seq("x", "y"))
    assert(Search.rrf(Seq(a, b), topK = 1, idCol = "doc_id").count() == 1)
    intercept[IllegalArgumentException] { Search.rrf(Nil) }
    intercept[IllegalArgumentException] { Search.rrf(Seq(a), k0 = 0) }
  }

  // a small embedding fixture with visible structure: two tight clusters
  // plus an outlier, relevance decreasing with id
  private def candFixture = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), 1.00),
    (2L, Array(0.99f, 0.14f, 0.0f), 0.95), // near-copy of 1
    (3L, Array(0.0f, 1.0f, 0.0f), 0.90),
    (4L, Array(0.14f, 0.99f, 0.0f), 0.85), // near-copy of 3
    (5L, Array(0.0f, 0.0f, 1.0f), 0.20)    // diverse outlier
  ).toDF("vec_id", "embedding", "rel")

  test("mmr: first pick is max relevance; diversity beats a near-copy") {
    val out = Similarity.mmr(candFixture, k = 3, lambdaRel = 0.5)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // pick1 = 1 (max rel). pick2: 2 is a near-copy of 1 (cos≈0.99) so its
    // penalty kills it; 3 wins. pick3: both clusters taken — 5 (diverse,
    // low rel) vs 2/4 (high rel, high sim): at λ=0.5, 2 scores
    // 0.5·0.95−0.5·0.99≈−0.02, 5 scores 0.5·0.20−0.5·0=0.10 → 5.
    assert(out.toSeq == Seq((1, 1L), (2, 3L), (3, 5L)))
  }

  test("mmr: matches a naive greedy replay (objective + tie-break) exactly") {
    val got = Similarity.mmr(candFixture, k = 5, lambdaRel = 0.7)
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    // naive replay over the same (rel DESC, id ASC) candidate order
    val rows = candFixture.orderBy(col("rel").desc, col("vec_id")).collect()
    val ids = rows.map(_.getLong(0))
    val vs = rows.map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val rel = rows.map(_.getDouble(2))
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    var sel = Vector.empty[Int]
    val exp = (0 until 5).map { _ =>
      val cand = ids.indices.filterNot(sel.contains)
      val scored = cand.map { i =>
        val pen = if (sel.isEmpty) 0.0 else sel.map(j => cos(vs(i), vs(j))).max
        // (1.0 - 0.7), not literal 0.3: the operator derives the diversity
        // weight from lambda, and the two differ by one ULP
        (i, 0.7 * rel(i) - (1.0 - 0.7) * pen)
      }
      val best = scored.maxBy { case (i, s) => (s, -i) } // earliest on ties
      sel :+= best._1
      (ids(best._1), best._2)
    }
    assert(got.toSeq == exp)
  }

  test("mmr: lambda=1 is pure relevance ranking; candidate cap fails loudly") {
    val out = Similarity.mmr(candFixture, k = 3, lambdaRel = 1.0)
      .collect().map(_.getLong(1))
    assert(out.toSeq == Seq(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      Similarity.mmr(candFixture, k = 2, maxCandidates = 3)
    }
  }
}
