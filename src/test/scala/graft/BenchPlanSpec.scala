package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape invariants for the benchmark surface — the properties the
  * 100 TB scaling claims rest on, pinned so a regression shows up as a
  * test failure, not a silent bench slowdown. Checked on the formatted
  * explain string at sf0.001 (plan shape is data-volume independent; AQE
  * runtime re-planning can only improve on what's asserted here). Every
  * bench query is pinned individually — join IMPLEMENTATION choices
  * (broadcast vs sort-merge) are only pinned where they're by-design
  * (tiny dim tables, tiny query sides); size-driven choices the optimizer
  * should stay free to re-make at 100× are asserted only as "no cartesian,
  * no lost pushdown". */
class BenchPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  /** Count shuffle exchanges (excludes BroadcastExchange). */
  private def shuffles(p: String): Int =
    "\\(\\d+\\) Exchange".r.findAllIn(p).length

  /** Node id of the first (leaf-most) occurrence of an operator in the
    * formatted tree — ids number leaf→root, so "agg id < exchange id" means
    * the partial aggregate sits BELOW the shuffle (map-side combine). */
  private def nodeId(p: String, op: String): Int =
    ("\\((\\d+)\\) " + op).r.findAllMatchIn(p).map(_.group(1).toInt)
      .minOption.getOrElse(Int.MaxValue)

  private def mapSideCombine(p: String): Boolean =
    nodeId(p, "HashAggregate") < nodeId(p, "Exchange")

  /** Ids of true Window nodes (WindowGroupLimit is the rank-limit
    * pushdown, not a window) — shared by the two quota-shaped pins. */
  private def windowIds(p: String): Set[Int] =
    "\\((\\d+)\\) Window(?!GroupLimit)".r.findAllMatchIn(p)
      .map(_.group(1).toInt).toSet

  private def pushed(p: String): String =
    p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")

  test("no bench query degenerates to a cartesian product") {
    // knn_bruteforce is exhaustive BY DESIGN, but must broadcast the small
    // query side (BroadcastNestedLoopJoin), never CartesianProduct both big
    SparkEntry.benchNames.foreach { name =>
      val p = planOf(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
    }
  }

  test("q1_agg: pushed shipdate filter, map-side combine, 2 shuffles") {
    val p = planOf("q1_agg")
    assert(pushed(p).contains("l_shipdate"), pushed(p))
    // partial HashAggregate must sit BELOW the first exchange (map-side combine)
    assert(mapSideCombine(p), "q1 lost map-side combine")
    // one shuffle of partial-agg rows + one for the output sort — nothing else
    assert(shuffles(p) <= 2, s"q1_agg grew to ${shuffles(p)} shuffles")
  }

  test("q2_join_agg: joins broadcast AT THIS SF, pushdown intact") {
    val p = planOf("q2_join_agg")
    // size-tiered assertion: at sf0.001 every join side is under the
    // broadcast threshold, so the SIZE-BASED planner picks broadcast for
    // all three — the right plan for THIS data volume. customer and orders
    // grow with SF; only fixed-25-row nation carries a hint, and the
    // optimizer must stay free to sort-merge the scaling sides at 100×
    // (asserting "never SortMergeJoin" here would pin an OOM at scale).
    assert("BroadcastHashJoin".r.findAllIn(p).length / 2 >= 3 ||
      p.split("BroadcastHashJoin").length - 1 >= 3,
      "q2 lost a broadcast join at a SF where every side is tiny")
    assert(pushed(p).contains("IsNotNull"), pushed(p))
  }

  test("q3_topn: single TakeOrdered, one agg shuffle, no global sort") {
    val p = planOf("q3_topn")
    assert(p.contains("TakeOrderedAndProject"), "q3 lost its top-n operator")
    // TakeOrdered does per-partition top-n + driver merge: a plan-level
    // global Sort node would mean the limit stopped pushing through
    assert(!"\\(\\d+\\) Sort".r.findAllIn(p).hasNext, "q3 grew a global sort")
    assert(shuffles(p) == 1, s"q3_topn has ${shuffles(p)} shuffles, want 1 (agg)")
    // size-tiered: customer is unhinted (it scales); at sf0.001 the
    // size-based planner broadcasts it, which this asserts — at 100× the
    // optimizer is free to re-make that call
    assert(p.contains("BroadcastHashJoin"), "q3 customer join stopped broadcasting at tiny SF")
  }

  test("q6_filter: full pushdown, narrow scan, single agg shuffle, no join") {
    val p = planOf("q6_filter")
    val pf = pushed(p)
    // the three range predicates must ALL reach the parquet reader
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(pf.contains(c), s"q6 lost pushdown of $c:\n$pf") }
    // projection needs 4 of lineitem's 16 columns; the scan must not read all
    val readSchemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty && readSchemas.forall(_.count(_ == ',') < 8), readSchemas.mkString("\n"))
    assert(!p.contains("Join"), "q6 is scan+agg only")
    assert(shuffles(p) == 1, s"q6_filter has ${shuffles(p)} shuffles, want 1")
    assert(mapSideCombine(p), "q6 lost map-side combine")
  }

  test("q21_multi_join_star: fixed dims broadcast, orderdate pushed, " +
      "scaling supplier left to the size-based planner") {
    val p = planOf("q21_multi_join_star")
    // nation/region are fixed-cardinality (25/5 rows) and hinted — always
    // broadcast. supplier is SF×10k rows and carries NO hint: at sf0.001
    // the size-based planner broadcasts it; at 100× AQE flips it to a
    // shuffled join instead of OOMing the executors (ScaleProbe
    // q21_inflated_supplier exercises the flip). So: broadcasts present,
    // but no "never SortMergeJoin" pin.
    assert("BroadcastHashJoin".r.findAllIn(p).length / 2 >= 3 ||
      p.split("BroadcastHashJoin").length - 1 >= 3,
      "q21 lost a broadcast join at a SF where every dim is tiny")
    assert(pushed(p).contains("o_orderdate"), pushed(p))
  }

  test("q2/q21: scaling tables are UNHINTED — size tier off ⇒ they " +
      "sort-merge while fixed dims stay pinned broadcast") {
    // the direct proof no scaling table carries a forced broadcast: with
    // size-based broadcasting disabled, ONLY hint-pinned joins may remain
    // BroadcastHashJoin. supplier/customer/orders must drop to a shuffled
    // join (what AQE would do at 100× when their runtime size crosses the
    // threshold); fixed-cardinality nation (q2, q21) and region (q21) keep
    // broadcasting because their hints say so at every scale.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      for (name <- Seq("q2_join_agg", "q21_multi_join_star")) {
        val p = planOf(name)
        assert(p.contains("SortMergeJoin"),
          s"$name: a scaling table is still forced-broadcast (no SMJ with size tier off)")
        assert(p.contains("BroadcastHashJoin"),
          s"$name: fixed-dim broadcast hint lost")
      }
    } finally spark.conf.set(key, prev)
  }

  test("q22_sessionize: windows partitioned per-user, bounded shuffles") {
    val p = planOf("q22_sessionize")
    // a window with an empty partitionSpec is a single-task global sort —
    // the sessionization windows must stay keyed by user
    assert(!p.contains("partitionSpec=[]"), "q22 window lost its user partitioning")
    // one shuffle to co-locate by user + one for the output sort
    assert(shuffles(p) <= 2, s"q22 has ${shuffles(p)} shuffles, want <=2")
  }

  test("q23_selfjoin_shuffle: both date ranges pushed, map-side combine") {
    val p = planOf("q23_selfjoin_shuffle")
    val pf = pushed(p)
    // both branches of the self-join push their year filter to the scan
    assert(pf.contains("1995-01-01") && pf.contains("1996-01-01") &&
      pf.contains("1997-01-01"), pf)
    assert(mapSideCombine(p), "q23 lost map-side combine")
    // join impl (broadcast at sf0.001, sort-merge at scale) is AQE's call —
    // only the degenerate shape is forbidden
    assert(!p.contains("NestedLoop"), "q23 degenerated to a nested-loop join")
  }

  test("td_exact_dedup: pure scan+agg, map-side combine, no join") {
    val p = planOf("td_exact_dedup")
    assert(!p.contains("Join"))
    assert(mapSideCombine(p), "dedup lost map-side combine")
    assert(shuffles(p) <= 2, s"td_exact_dedup has ${shuffles(p)} shuffles")
  }

  test("td_minhash_lsh: signature frame persisted once, bucketed join") {
    val p = planOf("td_minhash_lsh")
    // the minhash signature frame is persisted so band-explode branches don't
    // recompute the corpus scan per band
    assert(p.contains("InMemoryRelation") || p.contains("InMemoryTableScan"),
      "minhash lost its persist barrier")
    assert(p.contains("Generate"), "minhash lost its band explode")
    assert(!p.contains("NestedLoop"), "minhash pair join degenerated")
  }

  test("td_ngram_jaccard: postings persisted, join on hashed shingle") {
    val p = planOf("td_ngram_jaccard")
    assert(p.contains("InMemoryRelation") || p.contains("InMemoryTableScan"),
      "ngram postings lost their persist barrier")
    assert(p.contains("Generate"), "ngram lost its shingle explode")
    assert(!p.contains("NestedLoop"), "ngram pair join degenerated")
  }

  test("td_knn_bruteforce: tiny query side broadcast, partial top-k pushdown") {
    val p = planOf("td_knn_bruteforce")
    // exhaustive by design: corpus × k-queries must be a broadcast nested
    // loop (queries broadcast), never a shuffle of the corpus against itself
    assert(p.contains("BroadcastNestedLoopJoin"), "knn lost the broadcast of the query side")
    assert(pushed(p).contains("vec_id"), pushed(p))
    // WindowGroupLimit = per-partition top-k BEFORE the rank shuffle; without
    // it every (query, corpus-row) pair shuffles
    assert(p.contains("WindowGroupLimit"), "knn lost partial top-k pushdown")
  }

  test("td_text_quality / td_lang_id: single-pass scan+agg, codegen end-to-end") {
    Seq("td_text_quality", "td_lang_id").foreach { name =>
      // shuffle/join shape on the pre-execution plan (the executed AQE
      // explain prints BOTH final and initial trees, double-counting nodes)
      val p0 = planOf(name)
      assert(!p0.contains("Join"), s"$name grew a join")
      assert(shuffles(p0) <= 2, s"$name has ${shuffles(p0)} shuffles")
      assert(mapSideCombine(p0), s"$name lost map-side combine")
      // AQE only annotates codegen stages on the FINAL plan, and only the
      // df's OWN query execution counts (df.count() would plan a new one)
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("WholeStageCodegen") || p.contains("codegen id"),
        s"$name fell out of whole-stage codegen:\n$p")
    }
  }

  test("td_cosine_neardup_lsh: hash-bucket equi-join, no pair explosion") {
    val p = planOf("td_cosine_neardup_lsh")
    assert(p.contains("HashJoin"), "neardup lost its bucket equi-join")
    assert(!p.contains("NestedLoop"), "neardup degenerated to all-pairs")
    assert(pushed(p).contains("vec_id"), pushed(p))
  }

  test("td_ann_lsh: band explode then bucket equi-join") {
    val p = planOf("td_ann_lsh")
    assert(p.contains("Generate"), "ann lost its band explode")
    assert(p.contains("HashJoin"), "ann lost its bucket equi-join")
    assert(!p.contains("NestedLoop"), "ann degenerated to all-pairs")
    // the query side is filtered at the scan (vec_id < k)
    assert(pushed(p).contains("LessThan(vec_id"), pushed(p))
  }

  test("td_hash_sample: stateless scan+filter, no shuffle before the sort") {
    val p = planOf("td_hash_sample")
    assert(!p.contains("Join") && !p.contains("HashAggregate"),
      "hash_sample must stay a pure scan+filter")
    assert(shuffles(p) == 1, s"td_hash_sample has ${shuffles(p)} shuffles, want 1 (output sort)")
  }

  test("r8 operators keep their scale shapes") {
    // tfidf: the ranking window must be PARTITIONED (per-doc frame, never a
    // single-task global window), and the tf frame persisted (the barrier
    // that stops each branch re-shuffling the corpus)
    val tfidf = planOf("td_tfidf")
    assert(!tfidf.contains("Window partitionSpec=[]"),
      "tfidf window lost its doc partitioning")
    assert(tfidf.contains("InMemoryTableScan") || tfidf.contains("InMemoryRelation"),
      "tfidf tf frame lost its persist barrier")
    // bigram LM: bigrams come from a projection (zip_with), NOT a per-doc
    // window or positional self-join; no cartesian anywhere
    val bigram = planOf("td_bigram_lm")
    assert(!bigram.contains("Window"), "bigram LM grew a window")
    assert(!bigram.contains("CartesianProduct"))
    // label margin / zorder: corpus × tiny-stats joins must broadcast
    Seq("td_label_margin", "td_zorder_key", "td_rouge").foreach { n =>
      assert(!planOf(n).contains("CartesianProduct"), s"$n plans a cartesian")
    }
  }

  /** Leaf-most id of ANY aggregate flavor (Hash/ObjectHash/Sort — min over
    * struct plans SortAggregate, collect_list plans ObjectHashAggregate). */
  private def anyAggId(p: String): Int =
    "\\((\\d+)\\) \\w*Aggregate".r.findAllMatchIn(p).map(_.group(1).toInt)
      .minOption.getOrElse(Int.MaxValue)

  test("td_paragraph_dedup: map-side-combined hash stats, no Window over the hash") {
    val p = planOf("td_paragraph_dedup")
    // a Window over the paragraph hash would buffer a 10⁹-copy boilerplate
    // key in ONE task — the stats must stay a combinable aggregate (the
    // min-over-struct stats plan as SortAggregate, partial below exchange)
    assert(!p.contains("Window"), "paragraph stats degraded to a window")
    assert(anyAggId(p) < nodeId(p, "Exchange"), "paragraph stats lost map-side combine")
    // paras persisted once (stats + verdict probe both read the cache, not
    // a re-explode of the corpus), verdict table broadcast at this SF
    assert(p.contains("InMemoryTableScan"), "paragraph paras frame lost its persist barrier")
    assert(p.contains("BroadcastHashJoin"), "paragraph verdict join stopped broadcasting")
    // stats groupBy + rebuild groupBy + output sort — nothing else shuffles
    assert(shuffles(p) <= 4, s"td_paragraph_dedup has ${shuffles(p)} shuffles")
  }

  test("td_minhash_rowwise: pure projection — no join, no aggregate, one sort shuffle") {
    val p = planOf("td_minhash_rowwise")
    // the row-wise signature is one Column expression: any join or
    // aggregate here means it fell back to the groupBy formulation
    assert(!p.contains("Join"), "row-wise minhash grew a join")
    assert(!p.contains("HashAggregate"), "row-wise minhash grew an aggregate")
    assert(shuffles(p) <= 1, s"td_minhash_rowwise has ${shuffles(p)} shuffles, want ≤1 (sort)")
  }

  test("td_domain_quota: two-stage salted rank — a mega-domain never sorts in one task") {
    val p = planOf("td_domain_quota")
    // exactly two Window nodes: the (domain, salt)-partitioned local
    // top-cap, then the per-domain rank over the ≤ salts·cap survivors
    // (WindowGroupLimit nodes are NOT windows — they're the rank-limit
    // pushdown, asserted separately)
    val wids = windowIds(p)
    assert(wids.size == 2, s"quota wants 2 Window stages, got $wids")
    // stage 1 must partition by the SALTED key (pmod of the id hash)
    assert(p.contains("pmod(xxhash64("), "quota stage 1 lost its salt")
    // rank ≤ cap pushes into partial WindowGroupLimit BELOW each exchange —
    // only ~cap rows per (domain, salt) ever shuffle, not the full corpus
    val wgl = "\\((\\d+)\\) WindowGroupLimit".r.findAllMatchIn(p)
      .map(_.group(1).toInt).toSet
    assert(wgl.nonEmpty && wgl.min < nodeId(p, "Exchange"),
      s"quota lost partial WindowGroupLimit pushdown (ids $wgl)")
  }

  test("td_hamming_clusters: distinct-hash frame persisted once, broadcast label join") {
    val p = planOf("td_hamming_clusters")
    // the distinct-hash reps frame (groupBy hash, map-side combined inside
    // the cached subtree) is persisted ONCE and re-read by both the band
    // join and the final label join — the band self-join + bit_count verify
    // live behind clusters()'s checkpoint-truncated lineage, so what the
    // final plan must show is: cache scan, not a re-aggregation of raw rows
    assert(p.contains("InMemoryTableScan"), "hamming reps frame lost its persist barrier")
    assert(anyAggId(p) < nodeId(p, "Exchange"), "hamming lost map-side combine")
    // cluster labels are ∝ components — always the broadcast side
    assert(p.contains("BroadcastHashJoin"), "hamming label join stopped broadcasting")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      "hamming degenerated to all-pairs")
  }

  test("td_html_extract: codegen projection at scan speed — no join, no agg, pruned scan") {
    val p = planOf("td_html_extract")
    // extraction is a per-row regex chain: the ONLY shuffle is the output
    // sort; any aggregate or join here means the entry stopped being
    // scan-shaped (at 100 TB this stage must stream WARC bytes once)
    assert(shuffles(p) <= 1, s"html extract grew to ${shuffles(p)} shuffles")
    assert(nodeId(p, "HashAggregate") == Int.MaxValue, "html extract grew an aggregate")
    assert(!p.contains("Join"), "html extract grew a join")
    // every extraction Project sits BELOW the sort exchange: the regex
    // chain runs once on the scan side and only finished rows shuffle
    // (codegen itself is pinned in HtmlSpec on an executed plan — the
    // pre-execution AQE formatted tree carries no codegen ids to assert on)
    val projIds = "\\((\\d+)\\) Project".r.findAllMatchIn(p).map(_.group(1).toInt)
    assert(projIds.nonEmpty && projIds.max < nodeId(p, "Exchange"),
      "extraction re-computed above the sort exchange")
    assert(!p.contains("BatchEvalPython"), "extraction fell out of native eval")
    // scan prunes to the 2 used columns — reading lang/source/n_chars for
    // an extraction projection would be pure wasted IO at crawl scale
    val rs = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(rs.contains("doc_id") && rs.contains("text") && !rs.contains("n_chars"),
      s"scan not pruned: $rs")
  }

  test("td_crawl_pipeline: extraction materialized once, partial aggs below exchanges") {
    val p = planOf("td_crawl_pipeline")
    // the 13-regex extraction chain runs ONCE, behind the checkpoint: the
    // synthHtml fixture literal appearing in the physical plan would mean
    // a consumer re-built + re-extracted the pages instead of reading the
    // materialized RDD
    assert(!p.contains("<!DOCTYPE"),
      "extraction re-built in the plan instead of reading the checkpoint")
    val rddIds = "MapPartitionsRDD\\[(\\d+)\\]".r.findAllMatchIn(p)
      .map(_.group(1).toInt).toSet
    assert(rddIds.size == 1,
      s"both consumers must read ONE materialized extraction RDD, got $rddIds")
    // paragraphDedup's exploded frame is persisted once (its own contract)
    assert(p.contains("InMemoryTableScan"), "paragraph frame lost its persist")
    // every aggregate is two-phase: partial below its exchange
    val aggIds = "\\((\\d+)\\) (?:Sort|ObjectHash|Hash)Aggregate".r
      .findAllMatchIn(p).map(_.group(1).toInt)
    assert(aggIds.nonEmpty && aggIds.min < nodeId(p, "Exchange"),
      "crawl pipeline lost map-side combine")
    assert(shuffles(p) <= 3, s"crawl pipeline grew to ${shuffles(p)} shuffles")
    assert(!p.contains("CartesianProduct") && !p.contains("BatchEvalPython"))
  }

  test("td_warc_ingest: binary scan → record split → map-side combine, no join") {
    val p = planOf("td_warc_ingest")
    // the WHOLE front stage is scan-shaped: one binaryFile scan (a task
    // per WARC file), the mapPartitions splitter directly on top, then a
    // two-phase aggregate — the only shuffles are the agg and output sort
    assert(p.contains("Scan binaryFile"), "WARC read lost its binaryFile scan")
    assert(p.contains("MapPartitions"), "record splitter left the plan")
    assert(shuffles(p) <= 2, s"warc ingest grew to ${shuffles(p)} shuffles")
    assert(!p.contains("Join"), "warc ingest grew a join")
    assert(nodeId(p, "HashAggregate") < nodeId(p, "Exchange"),
      "warc ingest lost map-side combine")
    assert(!p.contains("CartesianProduct") && !p.contains("BatchEvalPython"))
  }

  test("td_decontaminate: broadcast gram probe, no corpus shuffle before the join") {
    val p = planOf("td_decontaminate")
    // benchmark grams are eval-set sized and must BROADCAST; the corpus
    // gram stream probes them in-task — a shuffled (sort-merge) gram
    // join would move corpus-scale data for a tiny benchmark set
    assert(p.contains("BroadcastHashJoin"), "gram probe stopped broadcasting")
    assert(!p.contains("SortMergeJoin"), "gram join went sort-merge")
    assert(!p.contains("CartesianProduct") && !p.contains("BatchEvalPython"))
    // the per-doc report aggregate is two-phase (partial below exchange)
    assert(anyAggId(p) < nodeId(p, "Exchange"),
      "decontamination report lost map-side combine")
  }

  test("td_crawl_ingest: key-only pass, winners-only extraction, two-window quota, no cartesian") {
    // structural pin on the optimized plan (string counts over the
    // formatted output are unstable across SF: InMemoryRelation cached
    // subtrees reprint per consumer and one-line plan strings truncate).
    // Markers: 'noscript' is the distinctive stage of the 13-regex text
    // chain; '<!DOCTYPE' is the fixture's html synthesis.
    val qe = SparkEntry.queries("td_crawl_ingest")(spark, sf).queryExecution
    def litCount(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
                 needle: String): Int = {
      var n = 0
      plan.foreach(node => node.expressions.foreach(_.foreach {
        case l: org.apache.spark.sql.catalyst.expressions.Literal
          if l.value != null && l.value.toString.contains(needle) => n += 1
        case _ => ()
      }))
      n
    }
    val opt = qe.optimizedPlan
    // ALL html work sits behind the survivors CHECKPOINT (r18 — the seam
    // moved from a persist to a lineage-truncating checkpoint, so every
    // downstream construction analyzes a LogicalRDD instead of the
    // 13-regex extraction forest): a regex literal in the outer plan means
    // some consumer re-runs extraction per action
    assert(litCount(opt, "noscript") == 0 && litCount(opt, "<!DOCTYPE") == 0,
      "html extraction leaked outside the checkpoint seam")
    // exactly ONE materialized survivors relation (the LogicalRDD carrying
    // title/url_key/text) feeds both consumers — two distinct RDDs would
    // mean the extraction materialized twice
    val keptRdds = opt.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD
        if l.output.map(_.name).contains("title") => l.rdd.id }.distinct
    assert(keptRdds.size == 1,
      s"expected ONE materialized survivors RDD, got $keptRdds")
    // the two-pass shape lives in the survivors frame's OWN plan now (the
    // checkpoint is opaque from outside): the key-only pass is the
    // semi-join build side (html built there ONCE for the canonical key),
    // the winners-only pass is the probe side (html + full text chain
    // ONCE), and the join broadcasts the aggregated winner ids at bench
    // scale (no html-byte shuffle to reach the second scan)
    val docs = SparkTestSession.spark.read.parquet(s"$sf/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val pages = docs
      .withColumn("html", graft.queries.PipelineQueries.synthHtml(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")))
      .withColumn("url", graft.queries.PipelineQueries.synthUrl(
        org.apache.spark.sql.functions.col("doc_id")))
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("url"),
        org.apache.spark.sql.functions.col("html"))
    val kept = graft.functions.Curation
      .crawlKeptPlan(pages, pages, "html", "url", "doc_id")
      .queryExecution.optimizedPlan.toString
    assert("<!DOCTYPE".r.findAllIn(kept).size == 2,
      "expected exactly the key-pass + winner-pass html subtrees")
    // the strip-stage regex literal names the tag twice (open + close) —
    // count the pattern PREFIX, which appears once per chain instance
    assert("\\(\\?is\\)<noscript".r.findAllIn(kept).size == 1,
      "full text extraction must run only on winners, once")
    assert(kept.contains("LeftSemi"), "winner filter lost the semi-join shape")
    val keptPhysical = graft.functions.Curation
      .crawlKeptPlan(pages, pages, "html", "url", "doc_id")
      .queryExecution.executedPlan.toString
    assert(keptPhysical.contains("BroadcastHashJoin"),
      "winner semi-join should broadcast the aggregated winner ids at bench scale")
    // the quota keeps the skew-safe two-stage rank (domainQuota contract)
    val p = planOf("td_crawl_ingest")
    val wids = windowIds(p)
    assert(wids.size == 2, s"quota wants 2 Window stages, got $wids")
    assert(!p.contains("CartesianProduct") && !p.contains("BatchEvalPython"))
  }

  test("td_link_graph: one pass — extract/resolve/PSL at scan speed, one edge aggregate") {
    val p = planOf("td_link_graph")
    // the whole chain (extractLinks → explode → resolveUrl → urlHost →
    // registeredDomain) is a codegen projection over the scan; the ONLY
    // shuffles are the edge aggregate and the output sort — a join or a
    // third exchange here means link extraction stopped being scan-shaped
    assert(shuffles(p) <= 2, s"link graph grew to ${shuffles(p)} shuffles")
    assert(!p.contains("Join"), "link graph grew a join")
    assert(!p.contains("CartesianProduct") && !p.contains("BatchEvalPython"))
    // the edge aggregate map-side-combines the per-page link fan-out —
    // at crawl scale pages×links rows must collapse per task, not shuffle
    assert(anyAggId(p) < nodeId(p, "Exchange"),
      "edge aggregate lost map-side combine")
    // scan prunes to the 2 columns the fixture needs
    val rs = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(rs.contains("doc_id") && rs.contains("text") && !rs.contains("n_chars"),
      s"scan not pruned: $rs")
  }

  // td_pagerank rides the same scan-shaped link-graph plan; its ITERATION
  // frame (the part that runs k times at 100 TB) is pinned in GraphSpec on
  // pageRankStep — the entry's final frame is a checkpoint scan with no
  // shape left to assert on.
}
