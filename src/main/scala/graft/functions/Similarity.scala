package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query set
  * against a full scan; exact, one pass, no shuffle beyond the final top-k.
  * Scale path: LSH (random hyperplanes) or IVF (k-means-ish coarse quantizer)
  * bucketing so each query probes a small fraction of the corpus.
  */
object Similarity {

  /** Cosine similarity between two `Array[Float]` columns, in double
    * precision — a native codegen'd Catalyst expression ([[VectorCosine]]).
    * The HOF formulation (`zip_with`+`aggregate`) evaluates interpreted,
    * outside whole-stage codegen; same arithmetic, tight generated loop. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      VectorCosine(expression(a), expression(b)))

  /** The interpreted HOF formulation — kept as the cross-check reference for
    * [[VectorCosine]] (SimilaritySpec asserts bit-identical results). */
  private[functions] def cosineHof(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  private def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graft.ColumnBridge.expression(c)

  /** L2 norm of an array column. */
  def norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** Brute-force exact top-k neighbors for each query vector.
    * `queries` is expected to be small (broadcast side). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     queryIdCol: String = "query_id"): DataFrame = {
    val q = broadcast(queries.select(col(queryIdCol), col(vecCol).as("__qvec")))
    val scored = corpus.select(col(idCol), col(vecCol))
      .join(q, col(idCol) =!= col(queryIdCol)) // exclude self-match
      .withColumn("score", round(cosine(col(vecCol), col("__qvec")), 4))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol).as("neighbor_id"), col("score"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane signs for LSH: parity of the
    * first md5 hex digit of "plane,dim" — reproducible across engines and
    * runs (portable analog of seeded ±1 random projections). */
  private def hyperplaneSign(plane: Int, dim: Column): Column =
    when(conv(substring(md5(concat_ws(",", lit(plane), dim)), 1, 1), 16, 10)
      .cast("int") % 2 === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Random-hyperplane LSH bucket id (nPlanes-bit signature) for a vector —
    * native codegen'd expression ([[VectorLshBucket]]: the declarative form
    * hashes per (plane, dim) per ROW, interpreted). The projection is rounded
    * to 6 decimals before the sign test so the bucket decision is identical
    * across engines (floating-point noise can't flip a near-zero
    * projection). */
  def lshBucket(vec: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      VectorLshBucket(expression(vec), nPlanes, planeOffset))

  /** Declarative formulation — the cross-check reference for
    * [[VectorLshBucket]] (spec asserts identical buckets). */
  private[functions] def lshBucketHof(vec: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, transform(sequence(lit(0), size(vec) - 1), i => hyperplaneSign(p, i)),
          (v, s) => v.cast("double") * s),
        lit(0.0), (acc, v) => acc + v)
      when(round(proj, 6) > 0, lit(1L) * (1L << p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: queries only probe their own bucket(s).
    * `nBands` independent hash tables are the recall knob (a pair missed by
    * one band is caught by another — standard multi-table LSH); candidates
    * are the UNION of per-band bucket matches, deduplicated before scoring.
    * At 100 TB this turns a full-scan-per-query into nBands bucket-joins. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nPlanes: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding",
              queryIdCol: String = "query_id", nBands: Int = 1): DataFrame = {
    def banded(df: DataFrame, vc: String): DataFrame =
      df.withColumn("__b", explode(array((0 until nBands).map(b =>
          struct(lit(b).as("band"),
            lshBucket(col(vc), nPlanes, b * nPlanes).as("bucket"))): _*)))
        .withColumn("__band", col("__b.band"))
        .withColumn("__bucket", col("__b.bucket")).drop("__b")
    val c = banded(corpus.select(col(idCol), col(vecCol)), vecCol)
    val q = broadcast(banded(
      queries.select(col(queryIdCol), col(vecCol).as("__qvec")), "__qvec"))
    val cand = c.join(q, Seq("__band", "__bucket"))
      .filter(col(idCol) =!= col(queryIdCol))
      .select(col(queryIdCol), col(idCol), col(vecCol), col("__qvec"))
      .dropDuplicates(queryIdCol, idCol)
    val scored = cand
      .withColumn("score", round(cosine(col(vecCol), col("__qvec")), 4))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol).as("neighbor_id"), col("score"), col("rank"))
  }

  /** Embedding-cosine near-dup pairs, LSH-bucketed: candidates share a
    * random-hyperplane bucket, then verify exact cosine ≥ threshold. The
    * scale path for all-pairs cosine near-dup — shuffle ∝ Σ bucket sizes²
    * bounded by the bucket count (2^nPlanes), never the n² corpus product.
    * Recall < 1 by construction (pairs split across buckets are missed);
    * raise nPlanes for smaller buckets or lower it for higher recall. */
  def lshNearDupPairs(df: DataFrame, threshold: Double, nPlanes: Int = 4,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val b = df.select(col(idCol), col(vecCol))
      .withColumn("__bucket", lshBucket(col(vecCol), nPlanes))
    b.as("a").join(b.as("b"),
        col("a.__bucket") === col("b.__bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("cos", round(cosine(col(s"a.$vecCol"), col(s"b.$vecCol")), 4))
      .filter(col("cos") >= threshold)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"), col("cos"))
  }

  /** Scalar int8 quantization: q[i] = floor(v[i] * scale + 0.5) with
    * scale = 127 / max|v| — 4× smaller vectors, so candidate-generation
    * shuffles move a quarter of the bytes; cosine over quantized vectors is
    * scale-invariant, so ranking survives quantization up to rounding error.
    * floor(x + 0.5) (not round) keeps the arithmetic bit-identical across
    * engines for cross-checking. */
  def quantize(df: DataFrame, vecCol: String = "embedding",
               qCol: String = "q", scaleCol: String = "scale"): DataFrame = {
    val absMax = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    df.withColumn(scaleCol, lit(127.0) / greatest(absMax, lit(1e-12)))
      .withColumn(qCol, transform(col(vecCol),
        x => floor(x.cast("double") * col(scaleCol) + lit(0.5)).cast("int")))
  }

  /** Lloyd iterations for IVF centroid training, as pure DataFrame jobs:
    * assign (broadcast centroids, deterministic argmax) → recompute
    * (dimension-wise member mean via posexplode + two-phase aggregation).
    * Per iteration: one broadcast join + two shuffles on (centroid, dim) /
    * centroid — centroid count is small, so the recompute side is tiny
    * regardless of corpus size; no vector ever reaches the driver. Means are
    * rounded to 6 decimals and assignments are rounded + id-tie-broken, so
    * the whole training trajectory is deterministic and engine-portable.
    * Centroids that lose all members drop out (standard Lloyd behavior). */
  def kmeansIterate(df: DataFrame, init: DataFrame, iterations: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    centIdCol: String = "centroid_id",
                    centVecCol: String = "centroid"): DataFrame = {
    var cent = init
    for (_ <- 1 to iterations) {
      val asg = ivfAssign(df.select(col(idCol), col(vecCol)), cent,
        vecCol, centIdCol, centVecCol)
      cent = asg.select(col(centIdCol), posexplode(col(vecCol)))
        .groupBy(col(centIdCol), col("pos"))
        .agg(avg(col("col").cast("double")).as("m"))
        .groupBy(col(centIdCol))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("__dm"))
        .select(col(centIdCol),
          transform(col("__dm"),
            s => round(s.getField("m"), 6).cast("float")).as(centVecCol))
    }
    cent
  }

  /** IVF-style coarse quantization: assign each vector to its `nProbe`
    * nearest `centroids` (small, broadcast). Corpus vectors use nProbe=1
    * (one inverted list each); queries probe several lists — the standard
    * IVF recall knob (rows = vector × probed list). */
  def ivfAssign(df: DataFrame, centroids: DataFrame, vecCol: String = "embedding",
                centIdCol: String = "centroid_id", centVecCol: String = "centroid",
                nProbe: Int = 1): DataFrame = {
    val c = broadcast(centroids.select(col(centIdCol), col(centVecCol)))
    // similarity rounded to 6 decimals + centroid-id tie-break: the argmax is
    // deterministic and engine-portable (floating-point noise below 1e-6
    // can't flip the assignment)
    val joined = df.crossJoin(c)
      .withColumn("__sim", round(cosine(col(vecCol), col(centVecCol)), 6))
    val w = Window.partitionBy(df.columns.map(col): _*)
      .orderBy(col("__sim").desc, col(centIdCol))
    joined.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= nProbe)
      .drop("__sim", "__rn", centVecCol)
  }
}
