package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data curation. All variants
  * hash a stable key instead of drawing randoms: the same row lands in the
  * same sample/split on every run, on every engine, at any parallelism — the
  * property dataset curation needs for reproducibility and incremental
  * re-runs (a new batch doesn't reshuffle old rows between splits).
  *
  * Pure projections over [[PortableHash]] — codegen'd, no shuffle, scan
  * speed at 100 TB; and engine-portable, so DuckDB oracles reproduce every
  * sample bit-exactly.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the key — the basis for all
    * variants. Namespaced by `salt` so independent samples of the same data
    * are uncorrelated. */
  def hashBucket(key: Column, buckets: Int = 100, salt: String = ""): Column =
    pmod(PortableHash.h60(concat_ws("", lit(salt), key)), lit(buckets.toLong))

  /** Keep ~`fraction` of rows, deterministically by key. Thresholds FLOOR
    * the rate×buckets product (toLong truncation; mirror with floor() in
    * cross-engine SQL — a bare CAST rounds in some engines and would shift
    * one bucket). */
  def sample(df: DataFrame, keyCol: String, fraction: Double,
             salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    val buckets = 10000
    df.filter(hashBucket(col(keyCol), buckets, salt) < (fraction * buckets).toLong)
  }

  /** Assign each row a split label by cumulative weight ranges over the hash
    * bucket — e.g. Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01).
    * Weights must sum to 1. */
  def split(df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
            salt: String = "", outCol: String = "split"): DataFrame = {
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "split weights must sum to 1")
    val buckets = 10000
    val b = hashBucket(col(keyCol), buckets, salt)
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail.map(f => (f * buckets).toLong)
    val expr = splits.zip(bounds).foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), acc) => when(b < hi, lit(name)).otherwise(acc)
    }
    df.withColumn(outCol, expr)
  }

  /** Per-group sampling rates (dataset mixing): keep ~rates(g) of each
    * group's rows, groups absent from `rates` drop entirely. The curation
    * primitive for re-weighting sources in a training mix. */
  def sampleBy(df: DataFrame, keyCol: String, groupCol: String,
               rates: Map[String, Double], salt: String = ""): DataFrame = {
    val buckets = 10000
    val b = hashBucket(col(keyCol), buckets, salt)
    val rate = rates.foldLeft(lit(0.0)) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    df.filter(b < (rate * buckets).cast("long"))
  }

  /** α-temperature group re-balancing (the multilingual-corpus resampling
    * rule: sample groups ∝ p_g^α, α<1 flattening the distribution so
    * low-resource groups are upweighted). Per-group keep-rate
    * `r_g = min(1, targetFraction · N · p_g^α / (Σ p^α · n_g))`, realized as
    * a deterministic per-row hash draw — same row, same verdict, any engine.
    * One tiny aggregation (|groups| rows) broadcast back; the corpus itself
    * is filtered in one codegen'd pass. Rates are rounded to 9 dp before the
    * bucket threshold so float-sum ordering noise can't flip a boundary
    * between engines. */
  def temperatureBalance(df: DataFrame, keyCol: String, groupCol: String,
                         alpha: Double, targetFraction: Double,
                         salt: String = ""): DataFrame = {
    val buckets = 10000
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val withRate = counts
      .withColumn("__pa", pow(col("__n").cast("double"), alpha))
      .withColumn("__rate", least(lit(1.0),
        lit(targetFraction) * sum(col("__n")).over(w) * col("__pa") /
          (sum(col("__pa")).over(w) * col("__n"))))
      .select(col(groupCol), col("__rate"))
    df.join(broadcast(withRate), Seq(groupCol))
      .filter(hashBucket(col(keyCol), buckets, salt) <
        floor(round(col("__rate"), 9) * buckets).cast("long"))
      .drop("__rate")
  }

  /** Deterministic training-export sharding: shard = hash(key) mod nShards,
    * position = dense rank within the shard in hash order (key tie-break) —
    * the "global shuffle + shard" step that fixes a training data order
    * without rand(). Same corpus → identical shard files on every run and
    * engine. One shuffle (the per-shard window); shards are balanced by the
    * uniform hash. Returns the input plus (shard, pos). */
  def shardAssign(df: DataFrame, keyCol: String, nShards: Int,
                  salt: String = ""): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
      .orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", PortableHash.h60(concat_ws("", lit(salt), col(keyCol))))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w) - 1)
      .drop("__h")
  }

  /** Token-budget mixture sampling: keep ~`budgets(g)` tokens of each group
    * (keep-rate `min(1, budget_g / tokens_g)`, realized as a deterministic
    * per-row hash draw). THE curation step that hits a training-mix spec
    * ("300B tokens web, 50B code, …") from unevenly-sized sources. One tiny
    * per-group aggregation broadcast back; the corpus itself is filtered in
    * a single codegen'd pass. Groups without a budget drop entirely.
    *
    * The keep test is PURE INTEGER cross-multiplication — `hash%B < rate·B`
    * with `rate = budget/toks` is exactly `(hash%B)·toks < budget·B` — so no
    * float division/floor can land on a representability edge and flip a
    * bucket between engines (decimal(38,0) products: no overflow even at
    * 100 TB token totals). The rate=1 cap is implicit: budget ≥ toks ⇒
    * `(hash%B)·toks < B·toks ≤ budget·B` for every row. `tokens` is the
    * per-row token-count column.
    *
    * Boundary convention: the exact comparison keeps the boundary bucket
    * when `rate·B` is fractional (slightly OVERSHOOTING the budget), while
    * the rate-based ops above ([[sample]]/[[sampleBy]]/[[temperatureBalance]])
    * FLOOR `rate·B` (slightly undershooting). Intentional: a budget is a
    * target to hit, a sample rate is a ceiling — and the integer form is
    * what makes the budget predicate engine-exact.
    *
    * Caveat: rows in a group whose token SUM overflows decimal(38,0)
    * (≈1e38 — requires garbage token values, not real corpora) would make
    * the product NULL in non-ANSI mode and be silently dropped; validate
    * token columns upstream if corrupt extremes are possible. */
  def tokenBudgetMix(df: DataFrame, keyCol: String, groupCol: String,
                     tokens: Column, budgets: Map[String, Long],
                     salt: String = ""): DataFrame = {
    val buckets = 10000
    val budget = budgets.foldLeft(lit(0L)) { case (acc, (g, b)) =>
      when(col(groupCol) === g, lit(b)).otherwise(acc)
    }
    val totals = df.groupBy(col(groupCol)).agg(sum(tokens).as("__toks"))
      .withColumn("__budget", budget)
      .select(col(groupCol), col("__toks"), col("__budget"))
    val dec = "decimal(38,0)"
    df.join(broadcast(totals), Seq(groupCol))
      .filter(hashBucket(col(keyCol), buckets, salt).cast(dec) * col("__toks").cast(dec) <
        col("__budget").cast(dec) * lit(buckets.toLong).cast(dec))
      .drop("__toks", "__budget")
  }

  /** Leakage-safe train/val/test split: near-duplicate documents must land
    * in the SAME split, or evaluation leaks through paraphrases of training
    * rows. Splits by the near-dup CLUSTER label (connected components over
    * the pair graph; docs outside any pair are their own singleton) instead
    * of the doc id — one hash draw per cluster, so the whole component moves
    * together. Cost = [[Dedup.clusters]] over the pairs + a broadcast-sized
    * join back; the corpus itself is never shuffled beyond that join. */
  def leakSafeSplit(docs: DataFrame, pairs: DataFrame, idCol: String,
                    splits: Seq[(String, Double)], salt: String = "",
                    outCol: String = "split"): DataFrame = {
    val cl = Dedup.clusters(pairs).withColumnRenamed("id", idCol)
    val labeled = docs.join(cl, Seq(idCol), "left")
      .withColumn("__cluster", coalesce(col("cluster"), col(idCol)))
      .drop("cluster")
    split(labeled, "__cluster", splits, salt, outCol).drop("__cluster")
  }

  /** Stratified EXACT-quota sampling: the first `quota` rows of each group in
    * hash-of-key order (+ key tie-break) — a deterministic uniform draw with
    * a hard per-group cap, unlike rate-based [[sampleBy]] whose group sizes
    * are only proportional in expectation. One shuffle on the group key; the
    * window never sorts more than a group's rows per partition. */
  def stratified(df: DataFrame, keyCol: String, groupCol: String, quota: Int,
                 salt: String = ""): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(PortableHash.h60(concat_ws("", lit(salt), col(keyCol))), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota).drop("__rn")
  }
}
