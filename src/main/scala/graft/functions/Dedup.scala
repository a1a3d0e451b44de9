package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Scale design: every variant is shuffle-bounded by a *bucket key* (hash,
  * band signature, or shared n-gram), never by an all-pairs product. At 100 TB
  * the only quadratic step — within-bucket pair comparison — is bounded by
  * bucket size, which the band/bucket parameters control.
  */
object Dedup {

  /** Exact dedup: groupBy content hash, keep the smallest id per group.
    * One hash-shuffle; map-side partial aggregation applies. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    docs.withColumn("__key", TextFunctions.contentKey(col(textCol)))
      .groupBy(col("__key"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .drop("__key")
  }

  /** Word n-gram shingles, distinct per document. */
  def shingles(docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    val words = filter(split(regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", " "), " +"),
      w => length(w) > 0)
    docs.select(col(idCol),
      explode(transform(sequence(lit(0), greatest(size(words) - n, lit(0))),
        i => concat_ws(" ", slice(words, i + 1, lit(n))))).as("shingle"))
      .where(length(col("shingle")) > 0)
      .distinct()
  }

  /** MinHash signatures: k permutations approximated by k seeded xxhash64
    * functions; signature = min over shingles per seed. Returns
    * (id, seed, minhash). */
  def minhash(sh: DataFrame, idCol: String, k: Int): DataFrame = {
    val seeds = array((0 until k).map(lit): _*)
    sh.select(col(idCol), explode(seeds).as("seed"),
        xxhash64(col("shingle"), col("seed")).as("h"))
      .groupBy(col(idCol), col("seed"))
      .agg(min(col("h")).as("minhash"))
  }

  /** MinHash + LSH banding: docs sharing any band signature become candidate
    * pairs; candidates are verified with the full signature similarity.
    * Returns candidate pairs (id_a < id_b) with estimated Jaccard. */
  def minhashLsh(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                 shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
                 threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = minhash(shingles(docs, textCol, idCol, shingleN), idCol, numHashes)
      .withColumn("band", (col("seed") / rowsPerBand).cast("int"))
    // band signature: hash of the band's minhashes in seed order
    val bandSig = sig.groupBy(col(idCol), col("band"))
      .agg(xxhash64(concat_ws(",", sort_array(collect_list(
        concat_ws(":", col("seed"), col("minhash"))))), col("band")).as("band_sig"))
    val cand = bandSig.as("a").join(bandSig.as("b"),
        col("a.band_sig") === col("b.band_sig") && col("a.band") === col("b.band") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    // verify candidates against full signatures
    val full = sig.groupBy(col(idCol))
      .agg(map_from_arrays(collect_list(col("seed")), collect_list(col("minhash"))).as("sig"))
    val est = cand
      .join(full.withColumnRenamed(idCol, "id_a").withColumnRenamed("sig", "sig_a"), "id_a")
      .join(full.withColumnRenamed(idCol, "id_b").withColumnRenamed("sig", "sig_b"), "id_b")
      .withColumn("est_jaccard",
        aggregate(sequence(lit(0), lit(numHashes - 1)),
          lit(0), (acc, i) => acc + when(col("sig_a")(i) === col("sig_b")(i), 1).otherwise(0))
          .cast("double") / numHashes)
    est.filter(col("est_jaccard") >= threshold).select("id_a", "id_b", "est_jaccard")
  }

  /** SimHash: 64-bit signature where bit b = sign of the weighted sum of
    * shingle-hash bit b. Near-dups have small Hamming distance. */
  def simhash(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
              shingleN: Int = 2): DataFrame = {
    val sh = shingles(docs, textCol, idCol, shingleN)
      .withColumn("h", xxhash64(col("shingle")))
    val bits = sh.select(col(idCol), explode(sequence(lit(0), lit(63))).as("bit"),
        when(expr("shiftright(h, bit)").bitwiseAND(1) === 1, 1)
          .otherwise(-1).as("vote"))
      .groupBy(col(idCol), col("bit"))
      .agg(sum(col("vote")).as("s"))
    bits.groupBy(col(idCol))
      .agg(sum(when(col("s") > 0, expr("shiftleft(1L, bit)")).otherwise(0L))
        .as("simhash"))
  }

  /** Exact n-gram Jaccard near-dup pairs: inverted index on shingles (the
    * bucket key), intersection counted per pair, |A∪B| = |A|+|B|−|A∩B|.
    * Shuffle ∝ Σ shingle postings, not n². */
  def ngramJaccardPairs(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                        n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = shingles(docs, textCol, idCol, n)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed(idCol, "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(sizes.withColumnRenamed(idCol, "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard", round(col("inter") / (col("n_a") + col("n_b") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
