package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The incremental embedding near-dup screen: equivalence to the batch
  * [[Similarity.lshNearDupPairs]] cross-pairs, multi-band recall, the
  * broadcast one-corpus-scan plan shape, and the hot-bucket valve. */
class IncrementalCosineLshSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
  private lazy val corpus = emb.filter(col("vec_id") % 5 =!= 0)
  private lazy val batch = emb.filter(col("vec_id") % 5 === 0)

  test("incrementalCosineLsh ≡ lshNearDupPairs cross-pairs over corpus∪batch") {
    val inc = Similarity.incrementalCosineLsh(
        Similarity.cosineBuckets(corpus, nPlanes = 4),
        batch, threshold = 0.3, nPlanes = 4)
      .select(col("vec_id"), col("corpus_id"), col("cos"))
    // batch LSH over the union, restricted to (corpus, batch) cross pairs;
    // pair orientation is (id_a < id_b) there, (batch, corpus) here
    val cross = Similarity.lshNearDupPairs(corpus.union(batch),
        threshold = 0.3, nPlanes = 4)
      .filter((col("id_a") % 5 === 0) =!= (col("id_b") % 5 === 0))
      .select(
        when(col("id_a") % 5 === 0, col("id_a")).otherwise(col("id_b")).as("vec_id"),
        when(col("id_a") % 5 === 0, col("id_b")).otherwise(col("id_a")).as("corpus_id"),
        col("cos"))
    assert(inc.exceptAll(cross).isEmpty && cross.exceptAll(inc).isEmpty,
      "incremental screen and batch cross-pairs diverged")
    assert(inc.count() > 0, "fixture must exercise at least one near-dup pair")
  }

  test("nBands multi-table recall: pairs(nBands=3) ⊇ pairs(nBands=1), per-band union") {
    val one = Similarity.incrementalCosineLsh(
        Similarity.cosineBuckets(corpus, nPlanes = 6, nBands = 1),
        batch, threshold = 0.3, nPlanes = 6, nBands = 1)
      .select("vec_id", "corpus_id")
    val three = Similarity.incrementalCosineLsh(
        Similarity.cosineBuckets(corpus, nPlanes = 6, nBands = 3),
        batch, threshold = 0.3, nPlanes = 6, nBands = 3)
      .select("vec_id", "corpus_id")
    assert(one.exceptAll(three).isEmpty, "a single-band pair escaped the 3-band run")
    // nBands=k covers hyperplane families 0..k-1, so the prefix runs'
    // union (k = 1, 2, 3) must equal the 3-band result exactly — each
    // band is an INDEPENDENT hash table, not a re-randomization
    val union = (1 to 3).map { k =>
      Similarity.incrementalCosineLsh(
          Similarity.cosineBuckets(corpus, nPlanes = 6, nBands = k),
          batch, threshold = 0.3, nPlanes = 6, nBands = k)
        .select("vec_id", "corpus_id")
    }.reduce(_ union _).distinct()
    assert(three.exceptAll(union).isEmpty && union.exceptAll(three).isEmpty)
  }

  test("broadcast path: corpus bucket table never shuffles for the screen") {
    val p = Similarity.incrementalCosineLsh(
        Similarity.cosineBuckets(corpus, nPlanes = 4), batch,
        threshold = 0.3, nPlanes = 4)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the screen join must broadcast the batch side — at 100 TB a sort-merge
    // here would shuffle every stored corpus vector per ingest batch
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("SortMergeJoin"), "screen join degraded to sort-merge")
  }

  test("maxBucketSize drops hot corpus buckets; shuffle path matches broadcast") {
    // 6 identical corpus vectors land in one bucket; cap 3 drops the bucket,
    // so an identical incoming vector screens clean — the standard valve
    val hotCorpus = (1L to 6L).map(i => (i, Array(1.0f, 0.5f, 0.25f, 0.125f)))
      .toDF("vec_id", "embedding")
    val incoming = Seq((100L, Array(1.0f, 0.5f, 0.25f, 0.125f)))
      .toDF("vec_id", "embedding")
    val stored = Similarity.cosineBuckets(hotCorpus, nPlanes = 4)
    val capped = Similarity.incrementalCosineLsh(stored, incoming,
      threshold = 0.9, nPlanes = 4, maxBucketSize = Some(3))
    assert(capped.count() == 0)
    val uncapped = Similarity.incrementalCosineLsh(stored, incoming,
      threshold = 0.9, nPlanes = 4)
    assert(uncapped.count() == 6)
    // shuffle-join path (broadcastIncoming=false) gives the identical answer
    val shuffled = Similarity.incrementalCosineLsh(stored, incoming,
      threshold = 0.9, nPlanes = 4, broadcastIncoming = false)
    assert(shuffled.count() == 6)
  }

  test("ingest recipe: accepted vectors append, then re-screen flags them") {
    val pairs = Similarity.incrementalCosineLsh(
      Similarity.cosineBuckets(corpus, nPlanes = 4), batch,
      threshold = 0.3, nPlanes = 4)
    val accepted = batch.join(pairs.select("vec_id").distinct(),
      Seq("vec_id"), "left_anti")
    val grown = Similarity.cosineBuckets(corpus, nPlanes = 4)
      .union(Similarity.cosineBuckets(accepted, nPlanes = 4))
    // every formerly-accepted vector now collides with its own stored row
    // (self-cosine 1.0) — the screen is closed under its own maintenance
    val rescreen = Similarity.incrementalCosineLsh(grown, accepted,
      threshold = 0.3, nPlanes = 4)
    assert(rescreen.select("vec_id").distinct().count() == accepted.count())
  }
}
