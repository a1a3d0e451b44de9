package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Property tests for the rank family against INDEPENDENT in-memory
  * references: the distributed implementations (shuffle joins, broadcast
  * dangling mass, L1 normalizers, persist/checkpoint plumbing) and a
  * 20-line Scala loop must agree on seeded random multigraphs — with
  * duplicate edges, self-loops, dangling nodes and source-only nodes —
  * to 1e-9. This is the adversarial check hand-picked fixtures can't
  * give: the reference shares NO code with the implementation. */
class GraphPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Random multigraph: duplicate (src, dst) rows and self-loops allowed
    * (pageRank's contract totalizes both; linkGraph drops self-loops but
    * the rankers must handle arbitrary edge lists). */
  private def randomEdges(seed: Int): Seq[(String, String, Double)] = {
    val r = new scala.util.Random(seed)
    val nNodes = 4 + r.nextInt(6)
    val nEdges = 3 + r.nextInt(12)
    (0 until nEdges).map { _ =>
      (s"n${r.nextInt(nNodes)}", s"n${r.nextInt(nNodes)}",
        (1 + r.nextInt(5)).toDouble)
    }
  }

  /** Totalized (src, dst, w) list, node set, and out-weight map — the
    * shared prep of all three references. */
  private def prep(edges: Seq[(String, String, Double)])
      : (Seq[(String, String, Double)], Seq[String], Map[String, Double]) = {
    val agg = edges.groupBy(e => (e._1, e._2)).toSeq
      .map { case ((a, b), es) => (a, b, es.map(_._3).sum) }
    val nodes = (agg.map(_._1) ++ agg.map(_._2)).distinct.sorted
    val outW = agg.groupBy(_._1).map { case (k, es) => k -> es.map(_._3).sum }
    (agg, nodes, outW)
  }

  private def refPageRank(edges: Seq[(String, String, Double)], iters: Int,
                          d: Double = 0.85): Map[String, Double] = {
    val (agg, nodes, outW) = prep(edges)
    val n = nodes.size
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val dm = nodes.filterNot(outW.contains).map(rank).sum
      val contrib = scala.collection.mutable.Map.empty[String, Double]
        .withDefaultValue(0.0)
      for ((a, b, w) <- agg) contrib(b) += rank(a) * (w / outW(a))
      rank = nodes.map(v => v -> ((1.0 - d) / n + d * (contrib(v) + dm / n))).toMap
    }
    rank
  }

  private def refTrustRank(edges: Seq[(String, String, Double)],
                           seeds: Set[String], iters: Int,
                           d: Double = 0.85): Map[String, Double] = {
    val (agg, nodes, outW) = prep(edges)
    val present = seeds.intersect(nodes.toSet)
    val jump = nodes.map(v =>
      v -> (if (present(v)) 1.0 / present.size else 0.0)).toMap
    var rank = jump
    for (_ <- 0 until iters) {
      val dm = nodes.filterNot(outW.contains).map(rank).sum
      val contrib = scala.collection.mutable.Map.empty[String, Double]
        .withDefaultValue(0.0)
      for ((a, b, w) <- agg) contrib(b) += rank(a) * (w / outW(a))
      rank = nodes.map(v =>
        v -> ((1.0 - d) * jump(v) + d * (contrib(v) + dm * jump(v)))).toMap
    }
    rank
  }

  private def refHits(edges: Seq[(String, String, Double)],
                      iters: Int): Map[String, (Double, Double)] = {
    val (agg, nodes, _) = prep(edges)
    val n = nodes.size
    var hub = nodes.map(_ -> 1.0 / n).toMap
    var auth = Map.empty[String, Double]
    for (_ <- 0 until iters) {
      val ar = scala.collection.mutable.Map.empty[String, Double]
        .withDefaultValue(0.0)
      for ((a, b, w) <- agg) ar(b) += w * hub(a)
      val at = ar.values.sum
      auth = nodes.map(v => v -> ar(v) / at).toMap
      val hr = scala.collection.mutable.Map.empty[String, Double]
        .withDefaultValue(0.0)
      for ((a, b, w) <- agg) hr(a) += w * auth(b)
      val ht = hr.values.sum
      hub = nodes.map(v => v -> hr(v) / ht).toMap
    }
    nodes.map(v => v -> ((hub(v), auth(v)))).toMap
  }

  test("pageRank agrees with the in-memory reference on random multigraphs") {
    for (seed <- 1 to 5) {
      val e = randomEdges(seed)
      val got = Graph.pageRank(e.toDF("src_domain", "dst_domain", "weight"), 4)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val want = refPageRank(e, 4)
      assert(got.keySet == want.keySet, s"seed $seed: node sets differ")
      for ((k, v) <- want)
        assert(math.abs(got(k) - v) < 1e-9, s"seed $seed node $k: ${got(k)} vs $v")
    }
  }

  test("trustRank agrees with the in-memory reference (random seeds incl. a ghost)") {
    for (seed <- 11 to 14) {
      val e = randomEdges(seed)
      val r = new scala.util.Random(seed * 7)
      val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
      val seedSet = r.shuffle(nodes).take(1 + r.nextInt(2)).toSet
      val got = Graph.trustRank(e.toDF("src_domain", "dst_domain", "weight"),
          (seedSet + "ghost.invalid").toSeq.toDF("node"), 4)
        .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
      val want = refTrustRank(e, seedSet, 4)
      assert(got.keySet == want.keySet, s"seed $seed: node sets differ")
      for ((k, v) <- want)
        assert(math.abs(got(k) - v) < 1e-9, s"seed $seed node $k: ${got(k)} vs $v")
    }
  }

  test("hits agrees with the in-memory reference on random multigraphs") {
    for (seed <- 21 to 24) {
      val e = randomEdges(seed)
      val got = Graph.hits(e.toDF("src_domain", "dst_domain", "weight"), 3)
        .collect()
        .map(x => x.getString(0) -> ((x.getDouble(1), x.getDouble(2)))).toMap
      val want = refHits(e, 3)
      assert(got.keySet == want.keySet, s"seed $seed: node sets differ")
      for ((k, (h, a)) <- want) {
        assert(math.abs(got(k)._1 - h) < 1e-9, s"seed $seed hub $k: ${got(k)._1} vs $h")
        assert(math.abs(got(k)._2 - a) < 1e-9, s"seed $seed auth $k: ${got(k)._2} vs $a")
      }
    }
  }
}
