package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training pipelines: assign documents to
  * fixed-token-budget training sequences ("packs") with the standard
  * concatenate-then-chunk scheme — documents are laid out in a deterministic
  * order, token offsets accumulate, and a document belongs to the pack where
  * its first token lands (`floor(offset / budget)`).
  *
  * Scale design: packing is per-shard (`shardCol`, e.g. the source/dataset
  * column), NOT global — a global order would funnel 100 TB through one sort
  * and make every pack id depend on every row. Per-shard packing is one
  * window over a hash-partitioned shuffle on the shard key, packs are stable
  * under re-runs (deterministic order column, no rand()), and shards pack
  * independently — exactly how multi-source training mixes are laid out.
  */
object Packing {

  /** Per-document pack assignment: adds `token_offset` (tokens before this
    * doc within its shard) and `pack_id` (offset ÷ budget, per shard). */
  def packSequences(docs: DataFrame, tokenCol: String, budget: Int,
                    shardCol: String, orderCol: String): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
    docs
      .withColumn("token_offset",
        (sum(col(tokenCol)).over(w) - col(tokenCol)).cast("long"))
      .withColumn("pack_id", floor(col("token_offset") / budget).cast("long"))
  }

  /** Per-pack summary: document count, token total, and the doc-id span —
    * the shape a packing manifest (or a downstream batcher) consumes. */
  def packStats(docs: DataFrame, tokenCol: String, budget: Int,
                shardCol: String, orderCol: String): DataFrame =
    packSequences(docs, tokenCol, budget, shardCol, orderCol)
      .groupBy(col(shardCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).cast("long").as("pack_tokens"),
        min(col(orderCol)).as("first_doc"),
        max(col(orderCol)).as("last_doc"))
}
