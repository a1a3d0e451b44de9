package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Property tests (seeded trials) for the r8 text/eval operators — the
  * algebraic invariants a user would rely on without re-deriving them:
  * identity and symmetry of the n-gram overlap metrics, rank coherence of
  * TF-IDF, exact bigram accounting, and bijectivity of the Z-order
  * interleave that file-skipping layouts depend on. */
class TextMetricsPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def randTexts(seed: Int, n: Int, vocab: Int = 12,
                        minW: Int = 3, maxW: Int = 30): Seq[(Long, String)] = {
    val r = new scala.util.Random(seed)
    (0 until n).map { i =>
      val len = minW + r.nextInt(maxW - minW)
      (i.toLong, Seq.fill(len)(s"w${r.nextInt(vocab)}").mkString(" "))
    }
  }

  test("ngramOverlap: self-pair scores exactly 1; swapping sides swaps P/R") {
    for (seed <- Seq(1, 2)) {
      val texts = randTexts(seed, 40)
      val self = texts.map { case (id, t) => (id, t, t) }.toDF("pair_id", "cand", "ref")
      EvalMetrics.ngramOverlap(self, n = 2).collect().foreach { row =>
        assert(row.getDouble(4) == 1.0 && row.getDouble(5) == 1.0 &&
          row.getDouble(6) == 1.0, s"self-pair not perfect: $row")
      }
      val r = new scala.util.Random(seed + 100)
      val pairs = texts.map { case (id, t) =>
        (id, t, texts(r.nextInt(texts.size))._2)
      }.toDF("pair_id", "cand", "ref")
      val fwd = EvalMetrics.ngramOverlap(pairs, n = 2)
        .orderBy("pair_id").collect()
      val bwd = EvalMetrics.ngramOverlap(
          pairs.select(col("pair_id"), col("ref").as("cand"), col("cand").as("ref")),
          n = 2)
        .orderBy("pair_id").collect()
      fwd.zip(bwd).foreach { case (f, b) =>
        assert(f.getLong(3) == b.getLong(3), "overlap not symmetric")
        // precision(fwd) == recall(bwd) and vice versa; F1 invariant
        assert(f.get(4) == b.get(5) && f.get(5) == b.get(4))
        assert(f.get(6) == b.get(6), "F1 changed under side swap")
      }
    }
  }

  test("tfidfKeywords: rank-coherent, bounded, deterministic") {
    val docs = randTexts(7, 50, vocab = 40).toDF("doc_id", "text")
    val out = TextFunctions.tfidfKeywords(docs, topK = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    val byDoc = out.groupBy(_._1)
    byDoc.foreach { case (d, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length), s"doc $d ranks not 1..k")
      assert(sorted.length <= 4)
      // scores non-increasing with rank; tf >= 1 (term really occurs)
      assert(sorted.map(_._6).toSeq.reverse.sorted.reverse.sameElements(
        sorted.map(_._6).toSeq), s"doc $d scores not sorted")
      assert(sorted.forall(_._4 >= 1))
    }
    val again = TextFunctions.tfidfKeywords(docs, topK = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(again == out.map(t => (t._1, t._2, t._3)).toSet, "not deterministic")
  }

  test("bigramLogProb: n_bigrams == tokens-1 per doc, scores strictly negative") {
    val texts = randTexts(13, 40)
    val docs = texts.toDF("doc_id", "text")
    val out = TextFunctions.bigramLogProb(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    texts.foreach { case (id, t) =>
      val words = t.split(" ").length
      assert(out(id)._1 == words - 1, s"doc $id bigram count")
      // add-one smoothing keeps every p < 1 → mean log10 p < 0
      assert(out(id)._2 < 0, s"doc $id score not negative")
    }
  }

  test("Z-order interleave is a bijection over the bit range") {
    val bits = 8
    val r = new scala.util.Random(31)
    val pts = (0 until 300).map(_ => (r.nextInt(1 << bits).toLong,
      r.nextInt(1 << bits).toLong)) :+ ((0L, 0L)) :+ (((1L << bits) - 1, (1L << bits) - 1))
    val df = pts.toDF("x", "y").select(
      col("x"), col("y"),
      Clustering.interleave(Seq(col("x"), col("y")), bits).as("z"))
    val got = df.collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z >= 0 && z < (1L << (2 * bits)))
      // de-interleave: even bit positions rebuild x, odd rebuild y
      var dx = 0L; var dy = 0L
      for (i <- 0 until bits) {
        dx |= ((z >> (2 * i)) & 1L) << i
        dy |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(dx == x && dy == y, s"($x,$y) -> $z -> ($dx,$dy)")
    }
    // bijection ⇒ no collisions among distinct inputs
    assert(got.map(_._3).distinct.length == got.map(t => (t._1, t._2)).distinct.length)
  }
}
