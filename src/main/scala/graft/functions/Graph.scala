package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over web-crawl corpora: build the domain-level
  * endorsement graph from extracted outlinks, then rank domains with
  * PageRank — the classic web-quality prior (CommonCrawl publishes exactly
  * this ranking; RefinedWeb/FineWeb-class pipelines use it as a
  * URL/domain-level quality signal next to the text-level filters in
  * [[TextFunctions]] and [[Curation]]).
  *
  * Scale design: the graph is AGGREGATED — page-level links collapse to
  * (src_domain, dst_domain, weight) before any iteration, so the iterated
  * state is |domains| (millions at 100 TB), not |pages| (hundreds of
  * billions). Each PageRank iteration is ONE shuffle join on the edge list
  * plus a per-destination aggregate; dangling mass rides a 1-row broadcast
  * frame, never a driver collect; lineage is truncated per round the same
  * way [[Dedup.clusters]] does it.
  */
object Graph {

  /** Domain-level link graph from crawled pages: extract `<a href>` links,
    * resolve them against the page URL (RFC 3986), reduce both endpoints to
    * registered domains (PSL), and aggregate to weighted edges
    * `(src_domain, dst_domain, weight)` with intra-domain links dropped —
    * a site linking to itself is navigation, not endorsement.
    *
    * One pass over the corpus: extraction and resolution are codegen'd
    * Column chains ([[Html.extractLinks]], [[Web.resolveUrl]]), the only
    * shuffle is the final edge aggregate, and its map-side combine collapses
    * the per-page fan-out to distinct (src, dst) pairs per task. Hosts are
    * bound as real attributes in a separate projection before the PSL
    * probes — [[Web.registeredDomain]] references its host argument once
    * per suffix-length probe, and inlining [[Web.urlHost]]'s regexp chain
    * into each reference would defeat common-subexpression elimination. */
  def linkGraph(pages: DataFrame, urlCol: String = "url",
                htmlCol: String = "html"): DataFrame = {
    val resolved = pages
      .select(col(urlCol).as("__base"),
        explode(Html.extractLinks(col(htmlCol))).as("__href"))
      .select(col("__base"), Web.resolveUrl(col("__base"), col("__href")).as("__res"))
      .where(col("__res").rlike("(?i)^https?://"))
    val hosts = resolved.select(
      Web.urlHost(col("__base")).as("__sh"),
      Web.urlHost(col("__res")).as("__dh"))
    hosts.select(
        Web.registeredDomain(col("__sh")).as("src_domain"),
        Web.registeredDomain(col("__dh")).as("dst_domain"))
      .where(length(col("src_domain")) > 0 && length(col("dst_domain")) > 0 &&
        col("src_domain") =!= col("dst_domain"))
      .groupBy("src_domain", "dst_domain")
      .agg(count(lit(1)).as("weight"))
  }

  /** Steady-state maintenance of a stored [[linkGraph]]: the recipe is
    * APPEND-ONLY — write `linkGraph(newPages)` rows next to the stored
    * edges and never touch them, because [[pageRank]] re-aggregates
    * duplicate (src, dst) rows by construction (its first groupBy sums
    * weights), so an uncompacted store is semantically identical to a
    * compacted one. At 100 TB that matters: a per-batch merge would
    * shuffle the multi-billion-row stored edge table on every ingest
    * round, while an append moves only the batch. `compactEdges` is the
    * OPTIONAL periodic compaction (one shuffle of the store, run on
    * whatever cadence keeps file counts sane) — equivalence of
    * append-then-compact, compact-every-round, and one-shot batch is
    * pinned in GraphSpec and replayed two-round by the td_link_ingest
    * oracle. */
  def compactEdges(edges: DataFrame): DataFrame =
    edges.groupBy("src_domain", "dst_domain")
      .agg(sum(col("weight")).as("weight"))

  /** PageRank over a weighted edge list, fixed iteration count (the form
    * every published web ranking uses — convergence-tested variants just
    * pick `iterations` ≈ 20–50). Returns `(node, rank)` over the full node
    * set (sources ∪ destinations); ranks sum to exactly 1 each round
    * because dangling mass (nodes with no out-edges) is redistributed
    * uniformly, per the original formulation.
    *
    * Per iteration: one shuffle join (ranks ⋈ out-shares on src) + one
    * per-destination aggregate + a 1-row broadcast of the dangling mass.
    * The out-share table (`weight / Σ out-weight`) is computed ONCE and
    * persisted — the iterated join reuses its partitioning; `|V|` is the
    * single driver-side scalar. `localCheckpoint` truncates the per-round
    * lineage exactly like [[Dedup.clusters]]. Deterministic: no sampling,
    * no rand(), so re-runs (and the DuckDB oracle's unrolled replay)
    * reproduce ranks bit-for-bit modulo float summation order. */
  def pageRank(edges: DataFrame, iterations: Int, damping: Double = 0.85,
               srcCol: String = "src_domain", dstCol: String = "dst_domain",
               weightCol: Option[String] = Some("weight")): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(damping >= 0.0 && damping <= 1.0, s"damping must be in [0,1], got $damping")
    val w = weightCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    // totalize: accept raw (possibly duplicate) edges as well as
    // pre-aggregated ones — re-aggregating an already-distinct list is a
    // map-side-combined no-op
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"), w.as("w"))
      .groupBy("src", "dst").agg(sum("w").as("w"))
    val outw = e.groupBy("src").agg(sum("w").as("ow"))
    val shares = e.join(outw, "src")
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("share"))
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().persist()
    val n = nodes.count() // |V|: the one driver-side scalar
    if (n == 0L) {
      shares.unpersist(); nodes.unpersist()
      return nodes.withColumn("rank", lit(0.0))
    }
    val srcNodes = outw.select(col("src").as("node"))
    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint(true)
    var iter = 0
    while (iter < iterations) {
      // truncate the growing per-round lineage, as Dedup.clusters does
      ranks = pageRankStep(nodes, shares, srcNodes, ranks, n, damping)
        .localCheckpoint(true)
      iter += 1
    }
    shares.unpersist(); nodes.unpersist()
    ranks
  }

  /** One PageRank round, exposed for plan inspection: the spec pins that an
    * iteration is join + aggregate + a 1-row broadcast — no cartesian
    * product, no per-node driver loop — because THIS is the frame that runs
    * `iterations` times at 100 TB. */
  private[graft] def pageRankStep(nodes: DataFrame, shares: DataFrame,
                                  srcNodes: DataFrame, ranks: DataFrame,
                                  n: Long, damping: Double): DataFrame = {
    // mass parked on dangling nodes this round, as a 1-row broadcast
    val dangling = ranks.join(srcNodes, Seq("node"), "left_anti")
      .agg(coalesce(sum("rank"), lit(0.0)).as("__dm"))
    val contrib = shares
      .join(ranks.withColumnRenamed("node", "src"), "src")
      .groupBy(col("dst").as("node"))
      .agg(sum(col("rank") * col("share")).as("__c"))
    nodes.join(contrib, Seq("node"), "left")
      .crossJoin(broadcast(dangling))
      .select(col("node"),
        (lit((1.0 - damping) / n) + lit(damping) *
          (coalesce(col("__c"), lit(0.0)) + col("__dm") / n)).as("rank"))
  }
}
