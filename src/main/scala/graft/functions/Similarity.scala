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

  /** The `nBands` 64-bit bucket keys of a vector: key b = xxhash64 of
    * (band index, [[lshBucket]] under band b's hyperplane family). Folding
    * the band index into the key lets the multi-table layout share ONE
    * 8-byte join column (the [[Dedup.bandKeyArray]] convention); the key is
    * only a bucket id — candidates verify exact cosine downstream. */
  private def bucketKeyArray(vec: Column, nPlanes: Int, nBands: Int): Column =
    array((0 until nBands).map(b =>
      xxhash64(lit(b), lshBucket(vec, nPlanes, b * nPlanes))): _*)

  /** The persisted-corpus side of steady-state EMBEDDING near-dup ingest —
    * the [[lshNearDupPairs]] analog of [[Dedup.minhashBands]]: ONE row per
    * vector — (`idCol`, `vecCol`, `bucket_keys` array<long>) — computed
    * once per corpus and stored (parquet), then extended per batch by
    * appending the accepted vectors' own `cosineBuckets` delta. The vector
    * itself rides along because the screen's verify step is EXACT cosine
    * (unlike MinHash, the bucket key alone can't estimate similarity), but
    * the embedding was going to be stored anyway — this is the same bytes
    * organized for screening, not a second copy of anything, and the
    * EMBEDDING MODEL never re-runs over corpus content on later ingests.
    * Parameters must match the later [[incrementalCosineLsh]] call exactly
    * — the key folds the band index and hyperplane family, so a mismatch
    * silently yields no collisions. */
  def cosineBuckets(df: DataFrame, idCol: String = "vec_id",
                    vecCol: String = "embedding", nPlanes: Int = 4,
                    nBands: Int = 1): DataFrame =
    df.select(col(idCol), col(vecCol),
      bucketKeyArray(col(vecCol), nPlanes, nBands).as("bucket_keys"))

  /** Incremental (cross-batch) embedding near-dup screen — completes the
    * steady-state ingest family (exact/Bloom/MinHash/paragraph for text,
    * Hamming for media, THIS for embeddings): a new batch of vectors is
    * screened against the STORED corpus bucket table ([[cosineBuckets]])
    * without re-embedding or re-bucketing a single corpus row. Returns one
    * row per (incoming, corpus) pair with exact cosine ≥ `threshold`:
    * (`idCol`, `corpus_id`, `cos`) — an incoming id with no row is novel;
    * the accept/append recipe is `incoming.join(pairs.select(idCol)
    * .distinct(), Seq(idCol), "left_anti")` then
    * `corpusBuckets union cosineBuckets(accepted)`.
    *
    * Recall matches [[lshNearDupPairs]] by construction (same hyperplane
    * families): < 1, raised by `nBands` independent tables — a pair split
    * by one band's hyperplanes collides in another (the multi-table LSH
    * recall knob, equivalence-pinned per band in SimilaritySpec).
    *
    * Scale shape: only the BATCH is bucketed (∝ batch, not corpus). With
    * `broadcastIncoming` (default — ingest batches are small next to a
    * 100 TB corpus) the stored table is SCANNED once with ZERO shuffle:
    * bucket keys explode in-task, each scan task hash-probes the broadcast
    * batch and verifies cosine IN PLACE, so corpus vectors never leave
    * their scan — only (id, corpus_id, cos) collision rows (∝ true
    * near-dups) exit. For batch-vs-batch scale set it false → plain
    * shuffle join on the 8-byte key. `maxBucketSize` caps per-key CORPUS
    * postings (the hot-bucket valve: a degenerate all-zeros embedding
    * bucket would otherwise emit its whole posting list per colliding
    * incoming vector). */
  def incrementalCosineLsh(corpusBuckets: DataFrame, incoming: DataFrame,
                           threshold: Double, idCol: String = "vec_id",
                           vecCol: String = "embedding", nPlanes: Int = 4,
                           nBands: Int = 1,
                           maxBucketSize: Option[Int] = None,
                           broadcastIncoming: Boolean = true): DataFrame = {
    val incB0raw = incoming.select(col(idCol), col(vecCol).as("__ivec"),
      explode(bucketKeyArray(col(vecCol), nPlanes, nBands)).as("__bkey"))
    // the capped broadcast arm references the batch buckets twice (probe
    // set + screen join); an eager-free localCheckpoint (∝ batch) keeps the
    // hyperplane hashing evaluated once — the [[Dedup.incrementalHamming]]
    // convention
    val incB0 = if (broadcastIncoming && maxBucketSize.isDefined)
      incB0raw.localCheckpoint() else incB0raw
    val incB = if (broadcastIncoming) broadcast(incB0) else incB0
    // one stored row per vector ([[cosineBuckets]]) → per-band rows in-task
    val corp0 = corpusBuckets.select(col(idCol).as("corpus_id"),
      col(vecCol).as("__cvec"), explode(col("bucket_keys")).as("__bkey"))
    def dropHot(banded: DataFrame, cap: Int): DataFrame = {
      val hot = banded.groupBy(col("__bkey"))
        .agg(count(lit(1)).as("__n")).filter(col("__n") > cap)
        .select(col("__bkey"))
      banded.join(broadcast(hot), Seq("__bkey"), "left_anti")
    }
    // keep the one-corpus-scan contract on the capped path too: restrict
    // the scan to the buckets the batch actually probes FIRST (semi-join
    // against the broadcast batch-bucket set — the probed postings are
    // ∝ collisions), then count/cap over THAT. A bucket's postings are
    // either all probed or none, so per-bucket counts — and the cap
    // verdict — are identical to counting the full table, without the
    // corpus-proportional aggregate-and-rescan the naive form pays
    val corp = (broadcastIncoming, maxBucketSize) match {
      case (true, Some(cap)) =>
        val probed = corp0.join(
            broadcast(incB0.select(col("__bkey")).distinct()), Seq("__bkey"))
          .localCheckpoint() // read twice (hot count + anti); ∝ collisions
        dropHot(probed, cap)
      case (true, None) => corp0
      case (false, cap) => cap.fold(corp0)(dropHot(corp0, _))
    }
    corp.join(incB, Seq("__bkey"))
      .withColumn("cos", round(cosine(col("__ivec"), col("__cvec")), 4))
      // one row per (incoming, corpus) pair: collapses multi-band duplicate
      // collisions map-side, and if a corpus id was ever stored under two
      // embeddings (the re-embed/append maintenance case) keeps the BEST
      // similarity, deterministically — the [[Dedup.incrementalMinhashLsh]]
      // max-estimate convention
      .groupBy(col(idCol), col("corpus_id"))
      .agg(max(col("cos")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Johnson–Lindenstrauss ±1 random projection to `outDims` dimensions:
    * out[p] = round(Σ_d sign(p,d)·v[d] / √outDims, 6). Signs reuse the
    * portable md5 parity convention of the LSH hyperplanes, precomputed
    * once; the per-row work is a native codegen'd Catalyst expression
    * ([[VectorJlProject]]) — two primitive nested loops inside the generated
    * stage, no per-row hashing, zero shuffle, scan speed. (The earlier
    * zip_with/aggregate formulation evaluated INTERPRETED — Spark HOFs are
    * CodegenFallback — ~inDims×outDims boxed lambda calls per row; it stays
    * below as [[randomProjectHof]], the bit-identical cross-check.)
    *
    * The 100 TB use: shrink wide embeddings ~8–10× before ANN candidate
    * generation — candidate shuffles and cosine math then scale with the
    * reduced width, while JL keeps pairwise geometry within ~1/√outDims
    * distortion (rank the shortlist by full-width cosine afterwards). */
  def randomProject(df: DataFrame, inDims: Int, outDims: Int,
                    vecCol: String = "embedding",
                    outCol: String = "projected"): DataFrame = {
    require(outDims > 0 && inDims > 0, "dims must be positive")
    val proj = org.apache.spark.sql.graft.ColumnBridge.column(
      VectorJlProject(expression(col(vecCol)), inDims, outDims))
    // fail FAST on a width mismatch: a short vector would silently fold
    // over its prefix and skew the projected geometry
    val guarded = when(
      assert_true(size(col(vecCol)) === inDims,
        lit(s"randomProject: expected $inDims-dim vectors in '$vecCol'")).isNull,
      proj)
    df.withColumn(outCol, guarded)
  }

  /** The interpreted HOF formulation — kept as the cross-check reference for
    * [[VectorJlProject]] (PqSemDedupSpec asserts bit-identical results). */
  private[graft] def randomProjectHof(df: DataFrame, inDims: Int, outDims: Int,
                                          vecCol: String = "embedding",
                                          outCol: String = "projected"): DataFrame = {
    val signsAll = VectorJlProject.signMatrix(inDims, outDims)
    val scale = 1.0 / math.sqrt(outDims.toDouble)
    val comps = (0 until outDims).map { p =>
      val signs = array((0 until inDims).map(d => lit(signsAll(p * inDims + d))): _*)
      round(aggregate(
        zip_with(col(vecCol), signs, (x, s) => x.cast("double") * s),
        lit(0.0d), (acc, v) => acc + v) * lit(scale), 6).cast("float")
    }
    val guarded = when(
      assert_true(size(col(vecCol)) === inDims,
        lit(s"randomProject: expected $inDims-dim vectors in '$vecCol'")).isNull,
      array(comps: _*))
    df.withColumn(outCol, guarded)
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

  /** Label-quality audit (mislabel detection) over an embedding column:
    * per-label centroid (dim-wise mean, quantized like [[kmeansIterate]] so
    * both engines see identical centroids), each vector's cosine to its OWN
    * label's centroid vs the best OTHER label's, and a per-label margin
    * report — `n_mislabeled` counts vectors closer to a foreign centroid
    * (margin < 0), the classic "these examples are probably labeled wrong"
    * curation signal.
    *
    * Scale shape: centroids are a (labels × dims)-row aggregate collapsed
    * to ONE tiny broadcast frame; scoring is the codegen'd [[VectorCosine]]
    * over corpus × |labels| (labels are few by construction — never an
    * all-pairs product); the report is one hash-shuffle on the label. */
  def labelMargin(df: DataFrame, idCol: String = "vec_id",
                  vecCol: String = "embedding",
                  labelCol: String = "label"): DataFrame = {
    val cents = df.select(col(labelCol).as("__lbl"),
        posexplode(col(vecCol)))
      .groupBy(col("__lbl"), col("pos"))
      .agg(avg(col("col").cast("double")).as("m"))
      .groupBy(col("__lbl"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("__dm"))
      .select(col("__lbl"),
        transform(col("__dm"), s => round(s.getField("m"), 6).cast("float"))
          .as("__cv"))
    val scored = df.select(col(idCol), col(labelCol), col(vecCol))
      .crossJoin(broadcast(cents))
      .withColumn("__cos", round(cosine(col(vecCol), col("__cv")), 6))
    // ONE pass over the corpus × labels frame: own and best-other cosines
    // are conditional aggregates of the same groupBy — no self-join, no
    // second evaluation of the scoring crossJoin
    scored.groupBy(col(idCol), col(labelCol))
      .agg(
        max(when(col(labelCol) === col("__lbl"), col("__cos"))).as("own_cos"),
        max(when(col(labelCol) =!= col("__lbl"), col("__cos"))).as("other_cos"),
        sum(when(col(labelCol) =!= col("__lbl"), 1).otherwise(0)).as("__n_other"))
      // single-label corpora have no "other" centroid — no margin (mirrors
      // the inner own⋈other join semantics)
      .filter(col("__n_other") > 0)
      .withColumn("margin", round(col("own_cos") - col("other_cos"), 4))
      .groupBy(col(labelCol))
      .agg(count(lit(1)).as("n"),
        round(avg(col("margin")), 4).as("mean_margin"),
        sum(when(col("margin") < 0, 1L).otherwise(0L)).as("n_mislabeled"))
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

  /** Squared L2 distance between two array columns (sequential HOF fold —
    * deterministic accumulation order on every engine). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  // ------------------------------------------------------------------ PQ --

  /** Explode each vector into its `m` subvectors: (id, sub ∈ [0,m),
    * subvec of dim/m floats). The decomposition step of product quantization
    * (Jégou et al., "Product Quantization for Nearest Neighbor Search"). */
  def pqSubvectors(df: DataFrame, m: Int, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val dsub = (size(col(vecCol)) / m).cast("int")
    df.select(col(idCol), explode(array((0 until m).map(s =>
        struct(lit(s).as("sub"),
          slice(col(vecCol), lit(s) * dsub + 1, dsub).as("subvec"))): _*)).as("__sv"))
      .select(col(idCol), col("__sv.sub").as("sub"), col("__sv.subvec").as("subvec"))
  }

  /** Nearest sub-centroid per (vector, subspace): L2² rounded to 6 decimals +
    * centroid-id tie-break (deterministic, engine-portable — same contract as
    * [[ivfAssign]]). `cent` is (sub, cid, centroid), small, broadcast. */
  def pqAssign(sv: DataFrame, cent: DataFrame, idCol: String = "vec_id"): DataFrame = {
    val c = broadcast(cent.select(col("sub"), col("cid"), col("centroid")))
    val joined = sv.join(c, "sub")
      .withColumn("__d", round(l2sq(col("subvec"), col("centroid")), 6))
    val w = Window.partitionBy(col(idCol), col("sub")).orderBy(col("__d"), col("cid"))
    joined.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn", "__d", "centroid")
  }

  /** PQ codebook training: per-subspace Lloyd iterations over the subvector
    * relation. Init = subvectors of every `initStep`-th id (deterministic).
    * Per iteration: one broadcast join + two small shuffles keyed by
    * (sub, cid[, pos]) — the recompute side is centroid-count-sized
    * regardless of corpus size. Returns (sub, cid, centroid). */
  def pqTrain(df: DataFrame, m: Int, initStep: Int, iterations: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sv = pqSubvectors(df, m, idCol, vecCol)
    var cent = pqSubvectors(df.filter(col(idCol) % initStep === 0), m, idCol, vecCol)
      .select(col("sub"), col(idCol).as("cid"), col("subvec").as("centroid"))
    for (_ <- 1 to iterations) {
      cent = pqAssign(sv, cent, idCol)
        .select(col("sub"), col("cid"), posexplode(col("subvec")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg(avg(col("col").cast("double")).as("m"))
        .groupBy(col("sub"), col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("__dm"))
        .select(col("sub"), col("cid"),
          transform(col("__dm"), s => round(s.getField("m"), 6).cast("float")).as("centroid"))
    }
    cent
  }

  /** PQ encoding: each vector compressed to m centroid codes — (id, sub, cid).
    * At 64 dims × 4 bytes → m=4 single-byte codes this is the 64× memory
    * compression that makes billion-vector ANN fit a cluster's RAM. */
  def pqEncode(df: DataFrame, cent: DataFrame, m: Int,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    pqAssign(pqSubvectors(df, m, idCol, vecCol), cent, idCol)
      .select(col(idCol), col("sub"), col("cid"))

  /** PQ asymmetric-distance top-k: per query, a distance TABLE (query
    * subvector × each sub-centroid — |queries|·m·|cids| rows, broadcast) is
    * summed over the corpus CODES via a (sub, cid) join — the corpus
    * vectors themselves are never touched at query time. Approximate by
    * construction (distances are to centroids, not originals). */
  def pqTopK(codes: DataFrame, cent: DataFrame, queries: DataFrame, k: Int, m: Int,
             idCol: String = "vec_id", vecCol: String = "embedding",
             queryIdCol: String = "query_id"): DataFrame = {
    val qsv = pqSubvectors(queries.select(col(queryIdCol).as("__qid"), col(vecCol)),
      m, "__qid", vecCol)
    val dt = broadcast(qsv.join(cent.select(col("sub"), col("cid"), col("centroid")), "sub")
      .select(col("__qid"), col("sub"), col("cid"),
        round(l2sq(col("subvec"), col("centroid")), 6).as("__d")))
    val scored = codes.join(dt, Seq("sub", "cid"))
      .filter(col(idCol) =!= col("__qid"))
      .groupBy(col("__qid"), col(idCol))
      .agg(round(sum(col("__d")), 6).as("adist"), count(lit(1)).as("__n"))
      .filter(col("__n") === m) // self-exclusion drops whole vectors only
    val w = Window.partitionBy(col("__qid")).orderBy(col("adist"), col(idCol))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("__qid").as(queryIdCol), col(idCol).as("neighbor_id"),
        col("adist"), col("rank"))
  }

  // ------------------------------------------------------------ SemDeDup --

  /** SemDeDup (Abbas et al. 2023): semantic dedup = cluster embeddings, then
    * drop all-but-one of each within-cluster near-identical group. Pairs are
    * confined to a cluster, so the quadratic step is bounded by cluster size
    * (the k-means analog of LSH bucketing); a removed row is any higher-id
    * member of a ≥-threshold pair. Returns per-cluster (centroid_id,
    * n_members, n_removed). */
  def semDedup(df: DataFrame, centroids: DataFrame, threshold: Double,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val asg = ivfAssign(df.select(col(idCol), col(vecCol)), centroids, vecCol)
    val pairs = asg.as("a").join(asg.as("b"),
        col("a.centroid_id") === col("b.centroid_id") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("cos", round(cosine(col(s"a.$vecCol"), col(s"b.$vecCol")), 4))
      .filter(col("cos") >= threshold)
      .select(col("a.centroid_id").as("centroid_id"), col(s"b.$idCol").as(idCol))
      .distinct()
    asg.groupBy(col("centroid_id")).agg(count(lit(1)).as("n_members"))
      .join(pairs.groupBy(col("centroid_id")).agg(count(lit(1)).as("n_removed")),
        Seq("centroid_id"), "left")
      .withColumn("n_removed", coalesce(col("n_removed"), lit(0L)))
  }

  // ----------------------------------------------------------------- MMR --

  /** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR 1998):
    * greedy re-ranking of a retrieval result for relevance AND diversity —
    * pick `k` of the candidates maximizing
    * `λ·rel(d) − (1−λ)·max_{s∈selected} cos(d, s)` at each step (the first
    * pick maximizes bare relevance; its score is `λ·rel`, the empty-set
    * max-sim being 0). The standard tail of retrieval-based data selection:
    * after [[bruteForceTopK]]/IVF/[[Search.rrf]] surface candidates, MMR
    * keeps the selected batch from being k near-copies of the same
    * document.
    *
    * Execution shape: MMR is INHERENTLY sequential (step i+1's scores
    * depend on step i's pick), so it does not distribute — and does not
    * need to: candidates are a retrieval RESULT, bounded by the producer's
    * top-N. The greedy loop runs driver-side over the collected candidate
    * list (the bounded-driver-table pattern of [[Bpe.train]]'s vocab),
    * with a hard `maxCandidates` guard that fails loudly instead of
    * collecting a corpus by mistake. O(k·N) cosines at 64–1024 dims is
    * microseconds-scale work; the expensive part (scoring the corpus)
    * stayed distributed in the producer.
    *
    * Determinism: candidates are ordered by (`relCol` DESC, `idCol` ASC)
    * and ties on the greedy objective break toward that order — the exact
    * unrolled-SQL replay the td_mmr oracle runs. Cosines are computed in
    * double precision, same arithmetic as [[VectorCosine]].
    *
    * Returns one row per pick: (`position` 1..k, `idCol`, `rel`,
    * `mmr_score` — unrounded; callers round for display/compare). */
  def mmr(candidates: DataFrame, k: Int, lambdaRel: Double = 0.7,
          idCol: String = "vec_id", vecCol: String = "embedding",
          relCol: String = "rel", maxCandidates: Int = 100000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaRel >= 0.0 && lambdaRel <= 1.0,
      s"lambda must be in [0,1], got $lambdaRel")
    val spark = candidates.sparkSession
    val idType = candidates.schema(idCol).dataType
    val rows = candidates
      .select(col(idCol), col(vecCol).cast("array<double>").as(vecCol),
        col(relCol).cast("double").as(relCol))
      .orderBy(col(relCol).desc, col(idCol))
      .limit(maxCandidates + 1)
      .collect()
    require(rows.length <= maxCandidates,
      s"mmr collected more than maxCandidates=$maxCandidates rows — " +
        "candidates must be a bounded retrieval result, not a corpus")
    val ids = rows.map(_.get(0))
    val vecs = rows.map(_.getSeq[Double](1).toArray)
    val rels = rows.map(_.getDouble(2))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val n = rows.length
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val taken = new Array[Boolean](n)
    // max cosine vs the selected set so far, maintained incrementally:
    // O(N) updates per pick instead of O(|S|·N) rescans
    val maxSim = Array.fill(n)(0.0)
    while (selected.length < math.min(k, n)) {
      var best = -1; var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          val s = lambdaRel * rels(i) - (1.0 - lambdaRel) * maxSim(i)
          // strict > : ties keep the earliest candidate in (rel DESC, id)
          // order — the oracle's tie-break
          if (s > bestScore) { bestScore = s; best = i }
        }
        i += 1
      }
      taken(best) = true
      selected += ((best, bestScore))
      var j = 0
      while (j < n) {
        if (!taken(j)) {
          val c = cos(vecs(j), vecs(best))
          if (c > maxSim(j)) maxSim(j) = c
        }
        j += 1
      }
    }
    val outRows = selected.zipWithIndex.map { case ((i, s), pos) =>
      org.apache.spark.sql.Row(pos + 1, ids(i), rels(i), s)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("position",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField(idCol, idType),
      org.apache.spark.sql.types.StructField(relCol,
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("mmr_score",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(outRows.toSeq, 1), schema)
  }
}
