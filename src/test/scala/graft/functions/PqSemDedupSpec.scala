package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Product quantization, SemDeDup, stratified sampling, cross-doc spans. */
class PqSemDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("pqSubvectors splits a vector into m contiguous slices") {
    val df = Seq((1L, Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f))).toDF("vec_id", "embedding")
    val sv = Similarity.pqSubvectors(df, m = 4).orderBy("sub")
      .select("sub", "subvec").as[(Int, Array[Float])].collect()
    assert(sv.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(sv.map(_._2.toSeq).toSeq ==
      Seq(Seq(1f, 2f), Seq(3f, 4f), Seq(5f, 6f), Seq(7f, 8f)))
  }

  test("pq round-trip: an exact codebook vector reconstructs distance 0 to itself") {
    val cent = Similarity.pqTrain(emb, m = 4, initStep = 16, iterations = 1)
    val codes = Similarity.pqEncode(emb, cent, m = 4)
    // every vector gets exactly m codes
    val bad = codes.groupBy("vec_id").count().filter(col("count") =!= 4)
    assert(bad.isEmpty)
    // codes reference existing codebook entries
    val orphan = codes.join(cent, Seq("sub", "cid"), "left_anti")
    assert(orphan.isEmpty)
  }

  test("pqTopK ranks a near-identical vector first") {
    // duplicate vec 0 as id 9999: its PQ codes equal vec 0's, so asymmetric
    // distance from query 0 to 9999 is the minimum possible (table lookup sum)
    val dup = emb.filter(col("vec_id") === 0)
      .select(lit(9999L).as("vec_id"), col("embedding"), lit(0).as("label"))
    val corpus = emb.select(col("vec_id"), col("embedding"), col("label")).union(dup)
    val cent = Similarity.pqTrain(corpus, m = 4, initStep = 16, iterations = 1)
    val codes = Similarity.pqEncode(corpus, cent, m = 4)
    val q = corpus.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val top = Similarity.pqTopK(codes, cent, q, k = 1, m = 4).collect().head
    assert(top.getAs[Long]("neighbor_id") == 9999L)
  }

  test("semDedup removes the higher id of a within-cluster near-identical pair") {
    val base = emb.limit(20).select(col("vec_id"), col("embedding"))
    val dup = base.filter(col("vec_id") === 3)
      .select(lit(9999L).as("vec_id"), col("embedding"))
    val df = base.union(dup)
    val cent = base.limit(2)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
    val out = Similarity.semDedup(df, cent, threshold = 0.999)
    // exactly one removal: 9999 (the higher id of the identical pair)
    assert(out.agg(sum("n_removed")).head().getLong(0) == 1L)
    assert(out.agg(sum("n_members")).head().getLong(0) == 21L)
  }

  test("randomProject: deterministic JL projection preserves geometry roughly") {
    val base = emb.limit(50).select(col("vec_id"), col("embedding"))
    val p1 = Similarity.randomProject(base, inDims = 64, outDims = 16)
    // shape + determinism (portable signs: same matrix every run)
    assert(p1.select(size(col("projected"))).distinct().head().getInt(0) == 16)
    val p2 = Similarity.randomProject(base, inDims = 64, outDims = 16)
    assert(p1.select("vec_id", "projected").exceptAll(
      p2.select("vec_id", "projected")).isEmpty)
    // a vector projected twice lands on itself → cosine of projections of
    // IDENTICAL vectors is exactly 1; near-orthogonal originals stay far
    // from ±1 on average (JL distortion is bounded, not zero)
    val dup = base.filter(col("vec_id") === 0)
      .select(lit(9999L).as("vec_id"), col("embedding"))
    val withDup = Similarity.randomProject(base.union(dup), 64, 16)
    val both = withDup.filter(col("vec_id").isin(0L, 9999L))
      .select(col("projected")).collect()
    assert(both(0).getSeq[Float](0) == both(1).getSeq[Float](0))
    // mean |cos_full − cos_proj| over consecutive pairs stays under the
    // ~2/√16 JL ballpark for 16 output dims
    val a = p1.select(col("vec_id"), col("embedding"), col("projected"))
    val errs = a.as("x").join(a.as("y"), col("x.vec_id") + 1 === col("y.vec_id"))
      .select(abs(
        Similarity.cosine(col("x.embedding"), col("y.embedding")) -
          Similarity.cosine(col("x.projected"), col("y.projected"))).as("e"))
      .agg(avg(col("e"))).head().getDouble(0)
    assert(errs < 0.5, s"JL distortion unexpectedly large: $errs")
  }

  test("randomProject: native codegen expression, bit-identical to the HOF form") {
    val base = emb.limit(100).select(col("vec_id"), col("embedding"))
    val native = Similarity.randomProject(base, inDims = 64, outDims = 16)
    val hof = Similarity.randomProjectHof(base, inDims = 64, outDims = 16)
    // bit-identical both ways (exceptAll is bag semantics — empty in both
    // directions means the multisets of (id, projected) rows are equal)
    assert(native.select("vec_id", "projected")
      .exceptAll(hof.select("vec_id", "projected")).isEmpty)
    assert(hof.select("vec_id", "projected")
      .exceptAll(native.select("vec_id", "projected")).isEmpty)
    // the projection must run INSIDE whole-stage codegen — the generated
    // code calls the static round6f helper; an interpreted fallback wouldn't
    val gen = native.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(gen.contains("round6f"),
      "vector_jl_project fell out of whole-stage codegen")
    // width guard unchanged: wrong inDims fails fast, not null-projects
    val err = intercept[Exception] {
      Similarity.randomProject(base, inDims = 63, outDims = 16).collect()
    }
    assert(err.getMessage.contains("randomProject") ||
      err.getCause != null, err.getMessage)
  }

  test("stratified sampling: exact quota per group, deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val s1 = Sampling.stratified(docs, "doc_id", "source", quota = 5, salt = "x")
    val counts = s1.groupBy("source").count().collect()
    assert(counts.forall(_.getLong(1) <= 5))
    val s2 = Sampling.stratified(docs, "doc_id", "source", quota = 5, salt = "x")
    assert(s1.select("doc_id").exceptAll(s2.select("doc_id")).isEmpty)
    // different salt draws a different sample (overwhelmingly likely)
    val s3 = Sampling.stratified(docs, "doc_id", "source", quota = 5, salt = "y")
    assert(!s1.select("doc_id").exceptAll(s3.select("doc_id")).isEmpty)
  }

  test("temperature balancing upweights rare groups (α<1 flattens)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Sampling.temperatureBalance(docs, "doc_id", "lang",
        alpha = 0.3, targetFraction = 0.5, salt = "t")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fracs = byLang.map { case (l, n) => l -> kept.getOrElse(l, 0L).toDouble / n }
    val (biggest, smallest) = (byLang.maxBy(_._2)._1, byLang.minBy(_._2)._1)
    // the rarest language keeps a strictly larger fraction than the most
    // common one, and the overall kept volume is near the 50% target
    assert(fracs(smallest) > fracs(biggest))
    val total = kept.values.sum.toDouble / byLang.values.sum
    assert(total > 0.35 && total < 0.65)
    // deterministic
    val again = Sampling.temperatureBalance(docs, "doc_id", "lang",
      alpha = 0.3, targetFraction = 0.5, salt = "t").count()
    assert(again == kept.values.sum)
  }

  test("crossDocSpans flags only spans shared across distinct documents") {
    val docs = Seq(
      (1L, "a b c d e f g h tail one"),   // shares 9-word prefix with doc 2
      (2L, "a b c d e f g h tail two"),
      (3L, "completely different words that never repeat anywhere at all")
    ).toDF("doc_id", "text")
    val out = Dedup.crossDocSpans(docs, w = 8).orderBy("doc_id").collect()
    // doc 1: 3 spans (10 words → 3 positions); the two spans inside the
    // shared 9-word prefix ("a..h", "b..tail") are duplicated, the one
    // containing the unique last word is not
    assert(out(0).getAs[Long]("n_spans") == 3L)
    assert(out(0).getAs[Long]("dup_spans") == 2L)
    assert(out(2).getAs[Long]("dup_spans") == 0L)
  }
}
