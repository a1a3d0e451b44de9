package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._
import graft.queries.QueryUtil.Entry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each `queries` entry exercises one operator from SURVEY §2 (or a
  * training-data extension); `oracleSql` carries the DuckDB-equivalent SQL.
  *
  * Inventory map:
  *  - [[Relational]]      Plane-A surface (§2.3): joins, windows, grouping
  *    sets, set ops, subqueries, regex/string/date functions
  *  - [[KindQueries]]     Plane-B materialization kinds (§2.1/§2.2) driven
  *    through the full plan→apply→run framework
  *  - [[MacroQueries]]    macro system (§2.4) rendered via MacroEvaluator
  *  - [[AuditQueries]]    audit operators (§2.5)
  *  - [[PipelineQueries]] training-data extensions: dedup, similarity,
  *    multimodal, text analysis
  */
object SparkEntry {

  /** Read one of the driver-generated TPC-H-ish tables. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    QueryUtil.t(spark, dir, name)

  /** Entry-output columns the driver gate cannot handle — its pandas
    * harness sorts the result frame by EVERY column, and numpy array
    * cells (top-level array/map/struct) throw there (round 14:
    * td_html_extract, td_crawl_pipeline). ONE predicate, enforced in
    * BOTH gates (graft.Verify at dump time, EntrySchemaSpec in CI) so
    * they can never diverge. */
  def nonScalarColumns(schema: org.apache.spark.sql.types.StructType): Seq[String] =
    schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
        f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] ||
        f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] =>
        s"${f.name}: ${f.dataType.simpleString}"
    }.toSeq

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  private val q1: Map[String, Entry] = Map(
    "q1_agg" -> Entry((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some(
        """SELECT l_returnflag, l_linestatus,
          |  round(sum(l_quantity), 2) AS sum_qty,
          |  round(sum(l_extendedprice), 2) AS sum_base_price,
          |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
          |  round(avg(l_quantity), 4) AS avg_qty,
          |  count(*) AS count_order
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin))
  )

  /** The full inventory. */
  val all: Map[String, Entry] =
    q1 ++ Relational.entries ++ KindQueries.entries ++ MacroQueries.entries ++
      AuditQueries.entries ++ PipelineQueries.entries ++ SemanticQueries.entries

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, e) => k -> e.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every entry carries one — signature/ANN/stub
    * operators included, via the portable md5-derived hash (PortableHash). */
  def oracleSql: Map[String, String] =
    all.collect { case (k, e) if e.oracle.exists(_.nonEmpty) => k -> e.oracle.get }

  /** Headline subset for Bench: scan/join/agg heavy + the training-data
    * pipeline ops — measured per-round at sf0.1. */
  val benchNames: Seq[String] = Seq(
    "q1_agg", "q2_join_agg", "q3_topn", "q6_filter", "q21_multi_join_star",
    "q22_sessionize", "q23_selfjoin_shuffle", "td_exact_dedup", "td_minhash_lsh",
    "td_ngram_jaccard", "td_knn_bruteforce", "td_text_quality", "td_lang_id",
    "td_cosine_neardup_lsh", "td_ann_lsh", "td_hash_sample",
    // r13 operator family in the headline so a plan regression in the
    // round's additions shows in BENCH, not only in specs
    "td_paragraph_dedup", "td_minhash_rowwise", "td_domain_quota",
    "td_hamming_clusters",
    // r14: HTML extraction — the regex-chain scan is THE per-byte cost of
    // a crawl pipeline's first stage; a non-codegen regression here would
    // multiply across every downstream operator — and the composed
    // crawl-to-corpus recipe (extract → URL dedup → paragraph dedup →
    // quality → quota), so a regression in any stage's plan shows in the
    // headline, not only in the per-stage queries
    "td_html_extract", "td_crawl_ingest",
    // r15: the composed crawl chain (extract → paragraphDedup → outlink
    // domains) — the most representative end-to-end crawl query — the
    // WARC front (container split + envelope strip + payload hashing):
    // front-most ingest throughput bounds everything downstream — and
    // the benchmark-decontamination screen (broadcast gram probe over
    // the full corpus gram stream)
    "td_crawl_pipeline", "td_warc_ingest", "td_decontaminate",
    // r15 (cont.): the domain link graph + PageRank — the web-quality
    // prior every crawl-curation stack ranks domains with; the entry runs
    // the full chain (extract → resolve → PSL domains → edge aggregate →
    // 3 power iterations), so both the scan-shaped extraction AND the
    // iterated join+agg frame are on the bench clock
    "td_pagerank")
}
